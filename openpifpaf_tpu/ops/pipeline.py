"""The full CifCaf decode pipeline as one jit-compiled program.

Reference parity: ``src/openpifpaf/csrc/src/decoder/cifcaf.cpp:~80``
(``CifCaf::call``): CifHr accumulation -> seed selection -> CAF scoring ->
greedy growth -> keypoint NMS.  Here the whole chain is a single XLA
program over static shapes, vmapped over the image batch — fields never
leave the device (the host round-trip in ``decoder/decoder.py:~140`` of the
reference is eliminated by design).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import caf_scored, cif_hr, growth, nms, seeds
from .common import gather_field_grouped
from .. import debug_checks
from ..models.heads import split_fields


@dataclasses.dataclass(frozen=True)
class CifCafConfig:
    """All static decode configuration (jit-hashable)."""

    stride: int = 16
    image_hw: tuple = (641, 641)    # padded input image size
    cifhr: cif_hr.CifHrConfig = cif_hr.CifHrConfig()
    seeds: seeds.SeedsConfig = seeds.SeedsConfig()
    caf: caf_scored.CafScoredConfig = caf_scored.CafScoredConfig()
    # separately thresholded candidate set consumed only by the relaxed
    # force-complete second pass (reference cifcaf.cpp:~380 rebuilds
    # CafScored for that pass); None = reuse the first-pass candidates
    caf_fc: caf_scored.CafScoredConfig = None
    growth: growth.GrowthConfig = growth.GrowthConfig()
    nms: nms.NMSConfig = nms.NMSConfig()

    @property
    def hr_hw(self):
        sp = self.cifhr.spacing
        return ((self.image_hw[0] + sp - 1) // sp,
                (self.image_hw[1] + sp - 1) // sp)


class DecodedPoses(NamedTuple):
    """Static-shape decode result (per image or batched)."""

    xyv: jnp.ndarray           # (..., P, K, 3)
    joint_scales: jnp.ndarray  # (..., P, K) px
    scores: jnp.ndarray        # (..., P)
    valid: jnp.ndarray         # (..., P) bool
    n_dropped_caf: jnp.ndarray  # (...,) overflow counter (observability)
    n_dropped_cif: jnp.ndarray  # (...,) CifHr max_active budget overflow
    n_dropped_poses: jnp.ndarray  # (...,) seeds beyond the max_poses budget


class FrontEnd(NamedTuple):
    """Shared decode front-end outputs (everything before pose growth).

    Both the production parallel growth and the sequential-faithful oracle
    (``ops/sequential_oracle.py``) consume exactly this, so any deviation
    between them is pure growth/occupancy *scheduling* drift — the quantity
    the drift harness (``tests/drift_harness.py``) bounds.
    """

    sds: seeds.Seeds
    cands: caf_scored.CafCandidates
    cands_fc: caf_scored.CafCandidates  # None unless force-complete 2nd set
    scale_px: jnp.ndarray               # (Fk, H, W) CIF scale field, px
    n_dropped_cif: jnp.ndarray
    n_dropped_caf: jnp.ndarray


def decode_front_end(cif_field: jnp.ndarray, caf_field: jnp.ndarray, *,
                     cif_meta, caf_meta, config: CifCafConfig) -> FrontEnd:
    """CifHr accumulation -> seed selection -> CAF candidate scoring.

    Reference parity: the first half of ``CifCaf::call``
    (``src/openpifpaf/csrc/src/decoder/cifcaf.cpp:~80``).
    """
    stride = config.stride
    skeleton = np.asarray(caf_meta.skeleton, np.int32) - 1  # 0-based

    cif = split_fields(cif_field, cif_meta)
    caf = split_fields(caf_field, caf_meta)

    fk, h, w = cif.conf.shape
    jj = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    ii = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    x_px = (ii + cif.vec[:, 0, 0]) * stride
    y_px = (jj + cif.vec[:, 0, 1]) * stride
    scale_px = cif.scale[:, 0] * stride

    # 1) high-res confidence accumulation (MXU splat)
    hr, n_dropped_cif = cif_hr.accumulate(
        cif.conf, x_px, y_px, scale_px, out_hw=config.hr_hw,
        config=config.cifhr, return_overflow=True)

    # 2) seeds
    sds = seeds.select(cif.conf, x_px, y_px, scale_px, hr,
                       hr_spacing=config.cifhr.spacing, config=config.seeds)

    # 3) scored CAF candidates
    conf_scales = (np.asarray(caf_meta.decoder_confidence_scales, np.float32)
                   if caf_meta.decoder_confidence_scales is not None else None)
    cands = caf_scored.score(caf, hr, skeleton, stride=stride,
                             hr_spacing=config.cifhr.spacing,
                             config=config.caf,
                             confidence_scales=conf_scales)
    n_dropped_caf = cands.n_dropped
    cands_fc = None
    if config.growth.force_complete and config.caf_fc is not None:
        cands_fc = caf_scored.score(caf, hr, skeleton, stride=stride,
                                    hr_spacing=config.cifhr.spacing,
                                    config=config.caf_fc,
                                    confidence_scales=conf_scales)
        n_dropped_caf = n_dropped_caf + cands_fc.n_dropped
    return FrontEnd(sds=sds, cands=cands, cands_fc=cands_fc,
                    scale_px=scale_px, n_dropped_cif=n_dropped_cif,
                    n_dropped_caf=n_dropped_caf)


def finalize_poses(poses: jnp.ndarray, placed: jnp.ndarray,
                   pose_valid: jnp.ndarray, scale_px: jnp.ndarray, *,
                   score_weights, config: CifCafConfig,
                   seed_f: jnp.ndarray = None):
    """Joint-scale refinement + keypoint NMS + instance scoring.

    The tail of ``CifCaf::call`` (reference runs NMSKeypoints after the
    seed loop, ``cifcaf.cpp:~180``).  Shared by the production decode and
    the oracle path of the drift harness so both are scored identically.
    ``seed_f`` (P,) enables the exact seed-time occupancy suppression
    (``nms.seed_claim_suppression``) — pass it from the parallel path;
    the sequential oracle already applied occupancy during decode and
    passes None.
    Returns (poses_out (P,K,4), joint_scales (P,K), scores (P,), valid (P,)).
    """
    fk = poses.shape[1]
    if seed_f is not None and config.nms.seed_suppression:
        pose_valid = nms.seed_claim_suppression(
            poses, placed, pose_valid, seed_f,
            image_hw=config.image_hw, config=config.nms)
    # group by keypoint field: transpose (P, K) -> (K, P)
    js_cif = gather_field_grouped(
        scale_px, jnp.arange(fk, dtype=jnp.int32),
        poses[..., 0].T, poses[..., 1].T, spacing=config.stride).T
    joint_scales = jnp.where(js_cif > 0.0, js_cif, poses[..., 3])
    joint_scales = jnp.where(placed, joint_scales, 0.0)

    poses = poses.at[..., 2].set(jnp.where(placed, poses[..., 2], 0.0))
    poses_out, scores, valid = nms.keypoint_nms(
        poses, pose_valid, joint_scales, jnp.asarray(score_weights),
        config.nms)
    return poses_out, joint_scales, scores, valid


def decode_cifcaf_single(cif_field: jnp.ndarray, caf_field: jnp.ndarray, *,
                         cif_meta, caf_meta,
                         config: CifCafConfig) -> DecodedPoses:
    """Decode one image's raw (packed) CIF/CAF head tensors.

    cif_field: (Fk, 5, H, W); caf_field: (Fe, 9, H, W) — raw head outputs
    (activations applied here).
    """
    skeleton = np.asarray(caf_meta.skeleton, np.int32) - 1  # 0-based
    score_weights = np.asarray(
        cif_meta.score_weights if cif_meta.score_weights is not None
        else [1.0] * cif_meta.n_fields, np.float32)

    # 1-3) CifHr -> seeds -> scored CAF candidates
    fe = decode_front_end(cif_field, caf_field, cif_meta=cif_meta,
                          caf_meta=caf_meta, config=config)
    fk = cif_meta.n_fields

    # 4) wave-recycled parallel frontier growth (exact seed-claim fixpoint
    # between waves — claimed seeds never consume max_poses budget, the
    # reference's semantics; r5, closes the wholebody budget deficit)
    edges = growth.directed_edges(skeleton)
    poses, placed, pose_valid, n_dropped_poses, _, _ = growth.grow_waves(
        fe.sds, fe.cands, edges, n_keypoints=fk, image_hw=config.image_hw,
        config=config.growth, nms_config=config.nms,
        force_cand=fe.cands_fc)

    # 5-6) joint scale refinement + keypoint NMS (seed-claim suppression
    # already applied inside the wave loop)
    poses_out, joint_scales, scores, valid = finalize_poses(
        poses, placed, pose_valid, fe.scale_px,
        score_weights=score_weights, config=config, seed_f=None)
    n_dropped_cif = fe.n_dropped_cif
    n_dropped_caf = fe.n_dropped_caf

    return DecodedPoses(
        xyv=poses_out[..., :3],
        joint_scales=joint_scales,
        scores=scores,
        valid=valid,
        n_dropped_caf=n_dropped_caf,
        n_dropped_cif=n_dropped_cif,
        n_dropped_poses=n_dropped_poses,
    )


def make_batch_decoder(*, cif_meta, caf_meta, config: CifCafConfig):
    """Build a jitted batched decoder closure.

    Head metas are captured by closure (they are mutable dataclasses, not
    hashable jit statics).  Returns
    ``decode(cif_fields (B,Fk,5,H,W), caf_fields (B,Fe,9,H,W)) -> DecodedPoses``.
    """
    fn = functools.partial(decode_cifcaf_single, cif_meta=cif_meta,
                           caf_meta=caf_meta, config=config)
    if debug_checks.enabled():
        # checkify does not compose with vmap's batched error payloads;
        # debug mode trades batching for per-image checked programs (the
        # NaN/OOB assertions in ops/common.py become real runtime raises)
        checked = debug_checks.checked_jit(fn)

        def decode_batch(cif_fields, caf_fields):
            outs = [checked(cif_fields[i], caf_fields[i])
                    for i in range(cif_fields.shape[0])]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)
        return decode_batch
    return jax.jit(jax.vmap(fn))
