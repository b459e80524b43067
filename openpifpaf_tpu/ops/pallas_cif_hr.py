"""Pallas TPU kernel: fused CifHr accumulation.

The XLA path (``cif_hr.accumulate``) materializes the per-cell 1D Gaussian
profiles ``gy (F, N, Hh)`` / ``gx (F, N, Wh)`` in HBM before the MXU
contraction.  This kernel fuses profile computation into the contraction:
one program per field builds both profile matrices in VMEM from the tiny
``(F, N)`` inputs and feeds the MXU directly, so HBM only sees the inputs
and the final ``(F, Hh, Wh)`` accumulator.

Status (v5e measurement, batch-8 641px, exact output parity): XLA ~1.8 ms
(near the HBM roofline — XLA's fusion already keeps the profile tensors
cheap), this kernel ~16 ms (Mosaic transcendental codegen dominates).  Off
by default (``CifHrConfig.use_pallas``); kept as the correctness-tested
template for spatially-sharded decode (the per-field program composes with
``shard_map`` tiles) and future Mosaic tuning.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _kernel(v_ref, x_ref, y_ref, inv2s2_ref, trunc_ref, o_ref, *,
            spacing: float, hh_pad: int, wh_pad: int):
    # one program per field: build both profile matrices once in VMEM and
    # contract over cells on the MXU; HBM only sees the (F, N) inputs and
    # the output tile.
    v = v_ref[0, 0, :]           # (N,)
    x = x_ref[0, 0, :]
    y = y_ref[0, 0, :]
    inv2s2 = inv2s2_ref[0, 0, :]
    trunc = trunc_ref[0, 0, :]

    ys = jax.lax.broadcasted_iota(jnp.int32, (hh_pad, 1), 0) \
        .astype(jnp.float32) * spacing        # (Hh, 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, wh_pad), 1) \
        .astype(jnp.float32) * spacing        # (1, Wh)

    # build the row-profile matrix already transposed, (Hh, N), so the
    # contraction is a plain (M, K) @ (K, N) on the MXU (no VMEM transpose)
    dy = ys - y[None, :]                      # (Hh, N)
    gyt = jnp.exp(-dy * dy * inv2s2[None, :])
    gyt = jnp.where(jnp.abs(dy) <= trunc[None, :], gyt, 0.0)
    gyt = gyt * v[None, :]

    dx = xs - x[:, None]                      # (N, Wh)
    gx = jnp.exp(-dx * dx * inv2s2[:, None])
    gx = jnp.where(jnp.abs(dx) <= trunc[:, None], gx, 0.0)

    hr = jnp.dot(gyt, gx, preferred_element_type=jnp.float32)  # (Hh, Wh)
    o_ref[0, :, :] = jnp.clip(hr, 0.0, 1.0)


@functools.partial(jax.jit,
                   static_argnames=('out_hw', 'spacing', 'truncate',
                                    'interpret'))
def accumulate_pallas(v: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                      sigma: jnp.ndarray, *, out_hw, spacing: float,
                      truncate: float = 1.0, interpret: bool = False):
    """Fused splat: inputs (F, N) [v==0 for masked cells] -> (Hh, Wh) grid.

    ``v`` must already carry the neighbor factor and threshold mask;
    ``sigma`` the blob width in px (>= min_sigma).
    """
    f, n = v.shape
    hh, wh = out_hw
    n_pad = _round_up(max(n, 128), 128)
    hh_pad = _round_up(hh, TILE)
    wh_pad = _round_up(wh, TILE)

    def pad_n(a, fill=0.0):
        padded = jnp.pad(a.astype(jnp.float32), ((0, 0), (0, n_pad - n)),
                         constant_values=fill)
        return padded.reshape(f, 1, n_pad)

    v_p = pad_n(v)
    x_p = pad_n(x)
    y_p = pad_n(y)
    inv2s2 = pad_n(0.5 / (sigma * sigma), fill=1.0)
    trunc = pad_n(truncate * sigma, fill=0.0)

    grid = (f,)
    in_spec = pl.BlockSpec((1, 1, n_pad), lambda fi: (fi, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, spacing=float(spacing),
                          hh_pad=hh_pad, wh_pad=wh_pad),
        out_shape=jax.ShapeDtypeStruct((f, hh_pad, wh_pad), jnp.float32),
        grid=grid,
        in_specs=[in_spec] * 5,
        out_specs=pl.BlockSpec((1, hh_pad, wh_pad),
                               lambda fi: (fi, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * f * hh_pad * wh_pad * n_pad,
            bytes_accessed=4 * (5 * f * n_pad + f * hh_pad * wh_pad),
            transcendentals=2 * f * n_pad * (hh_pad + wh_pad),
        ),
        interpret=interpret,
    )(v_p, x_p, y_p, inv2s2, trunc)
    return out[:, :hh, :wh]
