"""Spatially-sharded CifHr: halo-composed splat over a device mesh.

The reference decodes one image per CPU core
(``src/openpifpaf/csrc/src/decoder/utils/cif_hr.cpp:~20`` runs
single-threaded per image).  For very large images a single chip's HBM and
FLOPs become the limit; this module shards the CifHr accumulation over a
``spatial`` mesh axis the TPU-native way:

- the CIF field rows AND the hires output rows are sharded into bands,
  one per device (``shard_map`` with ``PartitionSpec(None, 'spatial',
  None)``);
- each device splats its local cells into its own output band extended by
  ``halo_px`` on both sides (the einsum formulation in ``ops/cif_hr.py``
  evaluates any row window directly via ``y_offset_px``);
- the two halo strips ride the ICI to the neighbor bands with
  ``jax.lax.ppermute`` and are summed in; clipping happens after the sum
  (equivalent to the reference's clip-per-add for non-negative blobs);
- a psum'd overflow counter reports cells whose blob reach exceeded the
  halo (those contributions are truncated — enlarge ``halo_px`` if
  nonzero), following the static-budget + overflow-counter convention used
  across the decode ops.

Seed selection composes with this for free: ``ops/seeds.select`` is
pointwise over cells + a top-k, so each device selects over its band and a
global ``masked_top_k`` over the all-gathered candidates merges them.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import cif_hr, seeds as seeds_mod
from ..ops.common import gather_field_grouped, masked_top_k


class ShardedCifHr(NamedTuple):
    hr: jnp.ndarray               # (F, Hh, Wh), sharded over rows
    halo_overflow: jnp.ndarray    # () int32: cells whose blob left the halo


@dataclasses.dataclass(frozen=True)
class SpatialConfig:
    """Static configuration for the spatial decomposition."""

    axis: str = 'spatial'
    halo_px: float = 64.0  # one-sided halo, px; must cover offset + reach


def sharded_cif_hr(conf: jnp.ndarray, x_px: jnp.ndarray, y_px: jnp.ndarray,
                   scale_px: jnp.ndarray, *, mesh: Mesh, out_hw,
                   config: cif_hr.CifHrConfig,
                   spatial: SpatialConfig = SpatialConfig()) -> ShardedCifHr:
    """Accumulate a CIF head into a hires grid, rows sharded over a mesh.

    :param conf, x_px, y_px, scale_px: (F, H, W) as in ``cif_hr.accumulate``;
        H and ``out_hw[0]`` must divide by the ``spatial`` mesh axis size
    :param mesh: mesh containing ``spatial.axis``
    :returns: hr with the same values as the single-device *dense* oracle
        (``max_active=0`` — bands never compact, see ``_band``) wherever
        blob reach stays within ``halo_px``, plus the overflow counter
    """
    hh, wh = out_hw
    n_bands = mesh.shape[spatial.axis]
    f, h, w = conf.shape
    if h % n_bands or hh % n_bands:
        raise ValueError(
            f'field rows {h} and hires rows {hh} must divide into '
            f'{n_bands} bands')
    hhb = hh // n_bands
    halo_rows = int(round(spatial.halo_px / config.spacing))
    if halo_rows > hhb:
        raise ValueError(
            f'halo of {halo_rows} hires rows exceeds the band height '
            f'{hhb}; use fewer devices or a smaller halo_px')

    spec = P(None, spatial.axis, None)
    band_fn = functools.partial(
        _band, axis=spatial.axis, n_bands=n_bands, hhb=hhb, wh=wh,
        halo_rows=halo_rows, config=config)
    hr, overflow = shard_map(
        band_fn, mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(spec, P()))(conf, x_px, y_px, scale_px)
    return ShardedCifHr(hr=hr, halo_overflow=overflow)


def _band(conf, x_px, y_px, scale_px, *, axis, n_bands, hhb, wh,
          halo_rows, config):
    """Per-device body: local splat into extended band + halo exchange."""
    band = jax.lax.axis_index(axis)
    spacing = float(config.spacing)
    y0_px = (band * hhb - halo_rows) * spacing

    # compaction off inside bands: a per-band top-k budget would keep a
    # different cell set than the single-device path (breaking the exact
    # halo-parity invariant), and banding already divides the contraction
    local = cif_hr.accumulate(
        conf, x_px, y_px, scale_px,
        out_hw=(hhb + 2 * halo_rows, wh),
        config=dataclasses.replace(config, max_active=0),
        y_offset_px=y0_px, clip=False)

    up_strip = local[:, :halo_rows]            # rows of band - 1
    mid = local[:, halo_rows:halo_rows + hhb]  # own band
    down_strip = local[:, halo_rows + hhb:]    # rows of band + 1

    if n_bands > 1 and halo_rows > 0:
        # devices not named as a destination receive zeros
        from_below = jax.lax.ppermute(
            up_strip, axis, [(i, i - 1) for i in range(1, n_bands)])
        from_above = jax.lax.ppermute(
            down_strip, axis, [(i, i + 1) for i in range(n_bands - 1)])
        mid = mid.at[:, hhb - halo_rows:].add(from_below)
        mid = mid.at[:, :halo_rows].add(from_above)

    # overflow: active cells whose blob rows leave the extended band
    active = conf > config.v_threshold
    sigma = jnp.maximum(config.min_sigma_px, config.sigma_factor * scale_px)
    reach = config.truncate * sigma
    band_lo_px = y0_px
    band_hi_px = (band * hhb + hhb + halo_rows - 1) * spacing
    # rows outside the global grid (above band 0 / below the last band)
    # don't exist, so mass there is not "lost"
    lost_low = (y_px - reach < band_lo_px - spacing) & (band > 0)
    lost_high = (y_px + reach > band_hi_px + spacing) & (band < n_bands - 1)
    escaped = active & (lost_low | lost_high)
    overflow = jax.lax.psum(jnp.sum(escaped, dtype=jnp.int32), axis)

    return jnp.clip(mid, 0.0, 1.0), overflow


def sharded_seeds(conf: jnp.ndarray, x_px: jnp.ndarray, y_px: jnp.ndarray,
                  scale_px: jnp.ndarray, cifhr: jnp.ndarray, *, mesh: Mesh,
                  hr_spacing: float, config: seeds_mod.SeedsConfig,
                  spatial: SpatialConfig = SpatialConfig()
                  ) -> seeds_mod.Seeds:
    """Seed selection over spatially-sharded fields + CifHr bands.

    Each device blends its cells against its CifHr band (extended by
    ``halo_px`` strips fetched from the neighbors over ICI), selects its
    local top-``max_seeds`` and the bands merge with an ``all_gather`` +
    global top-k — the result is replicated and value-identical to
    ``ops.seeds.select`` whenever regressed targets stay within the halo.
    """
    n_bands = mesh.shape[spatial.axis]
    f, h, w = conf.shape
    fhr, hh, wh = cifhr.shape
    if h % n_bands or hh % n_bands:
        raise ValueError(
            f'field rows {h} and hires rows {hh} must divide into '
            f'{n_bands} bands')
    hhb = hh // n_bands
    halo_rows = int(round(spatial.halo_px / hr_spacing))
    if halo_rows > hhb:
        raise ValueError(
            f'halo of {halo_rows} hires rows exceeds the band height {hhb}')

    spec = P(None, spatial.axis, None)
    band_fn = functools.partial(
        _seeds_band, axis=spatial.axis, n_bands=n_bands, hhb=hhb,
        halo_rows=halo_rows, hr_spacing=hr_spacing, config=config)
    # outputs are replicated by construction (all_gather + top_k), which
    # the static vma check cannot infer — disable it for this call
    out = shard_map(
        band_fn, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec),
        out_specs=P(), check_vma=False)(conf, x_px, y_px, scale_px, cifhr)
    return seeds_mod.Seeds(*out)


def _seeds_band(conf, x_px, y_px, scale_px, hr, *, axis, n_bands, hhb,
                halo_rows, hr_spacing, config):
    band = jax.lax.axis_index(axis)
    f, hb, w = conf.shape

    # extend the CifHr band with neighbor strips over ICI
    if n_bands > 1 and halo_rows > 0:
        from_above = jax.lax.ppermute(
            hr[:, -halo_rows:], axis, [(i, i + 1) for i in range(n_bands - 1)])
        from_below = jax.lax.ppermute(
            hr[:, :halo_rows], axis, [(i, i - 1) for i in range(1, n_bands)])
        hr_ext = jnp.concatenate([from_above, hr, from_below], axis=1)
    else:
        hr_ext = jnp.pad(hr, ((0, 0), (halo_rows, halo_rows), (0, 0)))

    # gather the blended value at each cell's regressed target
    y0_px = (band * hhb - halo_rows) * hr_spacing
    y_rel = y_px - y0_px
    # clamp to rows that exist globally (outer bands have no neighbor strip)
    ext_rows = hhb + 2 * halo_rows
    y_lo = jnp.where(band == 0, halo_rows * hr_spacing, 0.0)
    y_hi = jnp.where(band == n_bands - 1, (halo_rows + hhb - 1) * hr_spacing,
                     (ext_rows - 1) * hr_spacing)
    y_rel = jnp.clip(y_rel, y_lo, y_hi)
    hr_v = gather_field_grouped(hr_ext, jnp.arange(f, dtype=jnp.int32),
                                x_px, y_rel, hr_spacing)
    v = (config.cifhr_blend * hr_v
         + (1.0 - config.cifhr_blend) * conf) * config.score_scale
    mask = (v > config.threshold) & (conf > config.min_conf)

    if config.local_max:
        # the 3x3 window crosses band boundaries: exchange one-row strips
        if n_bands > 1:
            v_above = jax.lax.ppermute(
                v[:, -1:], axis, [(i, i + 1) for i in range(n_bands - 1)])
            v_below = jax.lax.ppermute(
                v[:, :1], axis, [(i, i - 1) for i in range(1, n_bands)])
            v_ext = jnp.concatenate([v_above, v, v_below], axis=1)
        else:
            v_ext = jnp.pad(v, ((0, 0), (1, 1), (0, 0)))
        vmax = jax.lax.reduce_window(
            v_ext, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 3, 3), window_strides=(1, 1, 1),
            padding=((0, 0), (0, 0), (1, 1)))
        mask = mask & (v >= vmax)

    # local candidates, then global merge
    vals, idx, _ = masked_top_k(v.reshape(-1), mask.reshape(-1),
                                config.max_seeds)
    cand = (vals,
            (idx // (hb * w)).astype(jnp.int32),
            x_px.reshape(-1)[idx],
            y_px.reshape(-1)[idx],
            scale_px.reshape(-1)[idx])
    cand = jax.tree.map(
        lambda a: jax.lax.all_gather(a, axis, tiled=True), cand)
    all_v, all_f, all_x, all_y, all_s = cand
    top_v, top_i = jax.lax.top_k(all_v, config.max_seeds)
    valid = top_v > jnp.finfo(jnp.float32).min * 0.5
    return (jnp.where(valid, top_v, 0.0), all_f[top_i], all_x[top_i],
            all_y[top_i], all_s[top_i], valid)
