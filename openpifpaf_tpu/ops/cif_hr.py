"""CifHr: high-resolution confidence accumulation — as MXU matmuls.

Reference parity: ``src/openpifpaf/csrc/src/decoder/utils/cif_hr.cpp:~20``:
every CIF cell above ``v_threshold`` splats a truncated Gaussian blob,
centered at its regressed target (image px) and with width proportional to
its predicted scale, into a high-resolution accumulator; the accumulated
value is clipped at 1.0.

TPU-first redesign: the reference scatters sequentially per cell.  A 2D
Gaussian is separable, so the whole accumulation is two dense contractions:

    hr[f, Y, X] = clip( sum_c  v_c * gy[c, Y] * gx[c, X], 0, 1 )

with ``gy``/``gx`` the per-cell 1D Gaussian row/column profiles.  The
contraction over cells ``c`` runs on the MXU (einsum), no scatter at all.
Per-add clipping in the reference is equivalent to clip-after-sum because
contributions are non-negative and the clip bound is constant.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    return jax.default_backend() == 'tpu'


@dataclasses.dataclass(frozen=True)
class CifHrConfig:
    """Static configuration (reference static class attrs, cif_hr.hpp)."""

    v_threshold: float = 0.1     # min cell confidence to splat
    neighbor_factor: float = 1.0 / 16.0  # 1/(#painted cells per keypoint)
    # lower bound on blob sigma: one hires grid cell (= spacing px), so a
    # low predicted scale can never shrink the blob below grid resolution
    # (the reference's minimum is likewise one hires pixel, cif_hr.cpp)
    min_sigma_px: float = 2.0
    sigma_factor: float = 0.5    # sigma = sigma_factor * predicted scale
    truncate: float = 1.0        # truncate blob at truncate * sigma
    spacing: int = 2             # hires grid spacing in px ("stride/2 res")
    min_scale: float = 0.0       # skip cells with predicted scale below this
    # Active-cell compaction: contract the splat over only the top
    # ``max_active`` cells per field (by confidence) instead of all H*W.
    # Zero-confidence cells cost full MXU FLOPs and HBM traffic in the
    # dense einsum; above the v_threshold the field is sparse (a keypoint
    # activates ~16 cells), so a generous budget is exact in practice —
    # 1024 cells covers ~64 instances per keypoint type.  0 disables
    # (exact dense path); excess active cells drop weakest-first.
    # Engages only when H*W > compaction_ratio * max_active: the top-k
    # sort + gathers cost more than the einsum they save at small ratios
    # (measured on a v5e at 641px/n=1681: compaction +0.86 ms/img vs the
    # exact dense splat).
    max_active: int = 1024
    compaction_ratio: float = 2.0
    # Alternative fused TPU kernel (pallas_cif_hr.py).  Measured on a
    # v5e: the XLA einsum path runs near the HBM roofline (~1.8 ms for a
    # batch-8 641px splat) and beats the Mosaic-compiled kernel (~16 ms,
    # transcendental-bound); the kernel is kept as the template for
    # spatially-sharded decode and future Mosaic tuning.
    use_pallas: bool = False
    # bf16 Gaussian profiles: the (F, N, Hh)/(F, N, Wh) profile tensors
    # dominate the splat's HBM traffic; bf16 halves them while the MXU
    # still accumulates in f32 (preferred_element_type).  Max relative
    # error ~2^-9 on blob values — far below every decode threshold (the
    # reference's own splat uses an approximated exp, cif_hr.cpp utils).
    profile_bf16: bool = True


def accumulate(conf: jnp.ndarray, x_px: jnp.ndarray, y_px: jnp.ndarray,
               scale_px: jnp.ndarray, *, out_hw, config: CifHrConfig,
               extra_mask: jnp.ndarray = None,
               y_offset_px=0.0, clip: bool = True,
               return_overflow: bool = False):
    """Accumulate one CIF head into a hires grid.

    :param conf: (F, H, W) cell confidences in [0, 1]
    :param x_px, y_px: (F, H, W) regressed absolute target positions, px
    :param scale_px: (F, H, W) predicted keypoint scale, px
    :param out_hw: (Hh, Wh) hires grid size (static)
    :param y_offset_px: px offset of the grid's first row — lets a device
        evaluate only its band of output rows (spatially-sharded decode,
        ``parallel/spatial.py``); may be a traced scalar
    :param clip: apply the final clip-to-1.0.  Sharded callers disable it,
        sum halo contributions across devices, then clip (clip-after-sum
        equals the reference's clip-per-add for non-negative contributions)
    :param return_overflow: also return the () int32 count of active cells
        dropped by ``max_active`` compaction (budget-overflow counter)
    :returns: (F, Hh, Wh) accumulated confidence in [0, 1]
        (or ``(hr, n_dropped)`` with ``return_overflow``)
    """
    hh, wh = out_hw
    f, h, w = conf.shape
    n = h * w

    mask = conf > config.v_threshold
    if config.min_scale > 0.0:
        mask = mask & (scale_px >= config.min_scale)
    if extra_mask is not None:
        mask = mask & extra_mask

    v = jnp.where(mask, conf * config.neighbor_factor, 0.0).reshape(f, n)
    x = x_px.reshape(f, n)
    y = y_px.reshape(f, n)
    sigma = jnp.maximum(config.min_sigma_px,
                        config.sigma_factor * scale_px).reshape(f, n)

    n_dropped = jnp.zeros((), jnp.int32)
    if config.max_active and n > config.compaction_ratio * config.max_active:
        from .common import masked_top_k  # local: avoid import cycle

        _, idx, valid = masked_top_k(conf.reshape(f, n), mask.reshape(f, n),
                                     config.max_active)
        take = jnp.take_along_axis
        n_dropped = jnp.maximum(
            0, mask.sum(dtype=jnp.int32) - valid.sum(dtype=jnp.int32))
        v = jnp.where(valid, take(v, idx, 1), 0.0)
        x = take(x, idx, 1)
        y = take(y, idx, 1)
        sigma = take(sigma, idx, 1)
        n = config.max_active

    plain_grid = isinstance(y_offset_px, (int, float)) \
        and y_offset_px == 0.0 and clip
    if config.use_pallas and _on_tpu() and plain_grid:
        from .pallas_cif_hr import accumulate_pallas  # lazy: pallas import

        hr = accumulate_pallas(v, x, y, sigma, out_hw=(hh, wh),
                               spacing=float(config.spacing),
                               truncate=config.truncate)
        return (hr, n_dropped) if return_overflow else hr

    # 1D Gaussian profiles against hires coordinates (in px)
    xs = jnp.arange(wh, dtype=jnp.float32) * config.spacing  # (Wh,)
    ys = jnp.arange(hh, dtype=jnp.float32) * config.spacing \
        + y_offset_px                                        # (Hh,)

    dx = xs[None, None, :] - x[:, :, None]                   # (F, N, Wh)
    dy = ys[None, None, :] - y[:, :, None]                   # (F, N, Hh)
    inv2s2 = 0.5 / (sigma * sigma)
    trunc = config.truncate * sigma
    gx = jnp.exp(-dx * dx * inv2s2[:, :, None])
    gx = jnp.where(jnp.abs(dx) <= trunc[:, :, None], gx, 0.0)
    gy = jnp.exp(-dy * dy * inv2s2[:, :, None])
    gy = jnp.where(jnp.abs(dy) <= trunc[:, :, None], gy, 0.0)

    # fold the value into the row profile, then contract over cells on MXU
    gy = gy * v[:, :, None]
    if config.profile_bf16:
        gy = gy.astype(jnp.bfloat16)
        gx = gx.astype(jnp.bfloat16)
    hr = jnp.einsum('fny,fnx->fyx', gy, gx,
                    preferred_element_type=jnp.float32)
    if clip:
        hr = jnp.clip(hr, 0.0, 1.0)
    return (hr, n_dropped) if return_overflow else hr


def accumulate_from_fields(components, *, stride: int, out_hw,
                           config: CifHrConfig) -> jnp.ndarray:
    """Convenience: accumulate from a FieldComponents view (single image).

    components.conf: (F, H, W); vec: (F, 1, 2, H, W); scale: (F, 1, H, W) —
    offsets/scales in feature-cell units, converted here to px.
    """
    f, h, w = components.conf.shape
    jj = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    ii = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    x_px = (ii + components.vec[:, 0, 0]) * stride
    y_px = (jj + components.vec[:, 0, 1]) * stride
    scale_px = components.scale[:, 0] * stride
    return accumulate(components.conf, x_px, y_px, scale_px,
                      out_hw=out_hw, config=config)
