"""Tracking networks: shared-weight frame-pair processing.

Reference parity: ``src/openpifpaf/network/tracking_base.py:~20``
(``TrackingBase`` wraps any backbone to process frame pairs with shared
weights and concatenates the two feature maps) and
``network/tracking_heads.py`` (``TBaseSingleImage`` head adapters that
apply single-frame heads to each frame of the pair).

TPU-first redesign: the frame pair is *folded into the batch axis* for the
backbone pass — one conv program at batch 2B keeps the MXU saturated
instead of two half-size passes — and unfolded only for the paired (TCAF)
heads, which see channel-concatenated features.  For video streaming, the
previous frame's features are cached by the caller and the backbone runs on
the single new frame (``backbone_features`` / ``heads_from_features``
methods expose the two halves of the computation).
"""

from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .shell import Model
from .. import headmeta as headmeta_mod


class TrackingShell(nn.Module):
    """Backbone + heads over interleaved frame pairs.

    Input: ``(2B, H, W, 3)`` with frame pairs adjacent (prev, curr, prev,
    curr, ...) — the layout produced by
    ``datasets.collate.collate_tracking_images_targets_meta``.

    Outputs per head: single-frame heads (CIF/CAF/CifDet metas) return
    ``(2B, F, C, h, w)`` (both frames, interleaved like the input); paired
    heads (Tcaf metas) return ``(B, F, C, h, w)``.
    """

    basenet: nn.Module
    head_nets: Sequence[nn.Module]
    head_paired: Sequence[bool]

    def setup(self):
        pass

    def backbone_features(self, x: jnp.ndarray,
                          train: bool = False) -> jnp.ndarray:
        """Single-frame feature extraction: (N, H, W, 3) -> (N, h, w, C)."""
        return self.basenet(x, train)

    def heads_from_features(self, feats: jnp.ndarray,
                            train: bool = False) -> List[jnp.ndarray]:
        """Apply heads to backbone features of interleaved pairs (2B, h, w, C)."""
        b2, h, w, c = feats.shape
        pair = feats.reshape(b2 // 2, 2, h, w, c)
        paired_feats = jnp.concatenate([pair[:, 0], pair[:, 1]], axis=-1)
        return [
            head(paired_feats if is_paired else feats, train)
            for head, is_paired in zip(self.head_nets, self.head_paired)
        ]

    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        return self.heads_from_features(self.backbone_features(x, train),
                                        train)


class TrackingModel(Model):
    """Model wrapper for tracking shells (frame-pair input)."""

    def init(self, rng: jax.Array, input_hw=(81, 81)):
        dummy = jnp.zeros((2, input_hw[0], input_hw[1], 3), jnp.float32)
        self.variables = self.module.init(rng, dummy, train=False)
        return self.variables

    def _fused_ok(self, variables) -> bool:
        from . import fused_shufflenet  # local: avoid import cycle

        return (self.fused_inference and 'batch_stats' in variables
                and fused_shufflenet.supports(self.module.basenet))

    def apply_fast(self, variables, x):
        """Inference forward honoring the paired (TCAF) heads.

        The generic ``Model.apply_fast`` shell path would feed
        single-frame features to the paired heads (caught by
        ``tests/test_tracking.py::test_tracking_apply_fast``); this
        override runs the fused backbone on the interleaved frame batch
        and dispatches the heads through the tracking shell method."""
        from . import fused_shufflenet

        if self._fused_ok(variables):
            feats = fused_shufflenet.backbone_features(
                self.module.basenet, variables, x)
            return self.module.apply(
                variables, feats, train=False,
                method=TrackingShell.heads_from_features)
        return self.module.apply(variables, x, train=False)

    def backbone_features(self, variables, x, train: bool = False):
        from . import fused_shufflenet

        if not train and self._fused_ok(variables):
            return fused_shufflenet.backbone_features(
                self.module.basenet, variables, x)
        return self.module.apply(variables, x, train=train,
                                 method=TrackingShell.backbone_features)

    def heads_from_features(self, variables, feats, train: bool = False):
        return self.module.apply(variables, feats, train=train,
                                 method=TrackingShell.heads_from_features)


def is_tracking_metas(head_metas) -> bool:
    return any(isinstance(m, headmeta_mod.Tcaf) for m in head_metas)
