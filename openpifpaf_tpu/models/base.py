"""Backbone base definitions and registry.

Reference parity: ``src/openpifpaf/network/basenetworks.py:~20`` —
``BaseNetwork`` carries ``.stride`` and ``.out_features`` so heads and
encoders can do stride arithmetic.  TPU-first differences: modules are
``flax.linen`` (functional, jit/pjit-friendly), activations are NHWC (the
native TPU conv layout) and compute dtype is configurable (bfloat16 by
default on TPU for MXU throughput, float32 params).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

import flax.linen as nn
import jax.numpy as jnp


@dataclasses.dataclass
class BaseNetworkSpec:
    """Static description of a backbone: how to build it and its geometry."""

    name: str
    factory: Callable[..., nn.Module]  # kwargs -> linen module
    stride: int
    out_features: int

    def build(self, **kwargs) -> nn.Module:
        return self.factory(**kwargs)


# name -> BaseNetworkSpec; populated by the model modules at import time
BASE_FACTORIES: Dict[str, BaseNetworkSpec] = {}


def register_basenet(spec: BaseNetworkSpec) -> BaseNetworkSpec:
    BASE_FACTORIES[spec.name] = spec
    return spec


# BatchNorm numerics shared between NormFactory and the fused execution
# plans (models/fused_shufflenet.py) — a single source of truth so the
# plans cannot silently diverge from the baseline module.
BN_EPSILON = 1e-5
BN_MOMENTUM = 0.9


class NormFactory:
    """Configurable normalization layer factory (batch/instance/group norm).

    Reference: the ``--shufflenetv2k-instance-norm`` / group-norm options in
    ``basenetworks.py``.
    """

    def __init__(self, kind: str = 'batchnorm', epsilon: float = BN_EPSILON,
                 momentum: float = BN_MOMENTUM):
        if kind not in ('batchnorm', 'instancenorm', 'groupnorm', 'none'):
            raise ValueError(f'unknown norm kind {kind!r}')
        self.kind = kind
        self.epsilon = epsilon
        self.momentum = momentum

    def __call__(self, module: nn.Module, name: str, x: jnp.ndarray,
                 train: bool) -> jnp.ndarray:
        dtype = x.dtype
        if self.kind == 'batchnorm':
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=self.momentum, epsilon=self.epsilon,
                dtype=dtype, param_dtype=jnp.float32,
                name=name)(x)
        if self.kind == 'instancenorm':
            # affine instance norm over spatial dims (NHWC: axes 1, 2)
            return nn.GroupNorm(
                num_groups=None, group_size=1, epsilon=self.epsilon,
                dtype=dtype, param_dtype=jnp.float32, name=name)(x)
        if self.kind == 'groupnorm':
            return nn.GroupNorm(
                num_groups=32, epsilon=self.epsilon,
                dtype=dtype, param_dtype=jnp.float32, name=name)(x)
        return x


def conv_kwargs(dtype: Any) -> dict:
    """Common Conv settings: NHWC, f32 params, compute in ``dtype``."""
    return dict(dtype=dtype, param_dtype=jnp.float32)
