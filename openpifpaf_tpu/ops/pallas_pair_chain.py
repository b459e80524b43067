"""Pallas megakernel pilot: a fused stride-1 pair-plan block chain.

VERDICT r4 #1: the ShuffleNetV2K forward runs at ~17% of its compute
bound because every block's intermediates (``t``/``u``/``v``/``x1`` at
2.3 MB each per image at stage-4 shape) round-trip through HBM between
XLA kernels.  This pilot holds an n-block chain's activations in VMEM:
per block the only HBM traffic is the chain's entry/exit pair instead of
~8 intermediate tensor round-trips.

Design (tpu-first, see ``/opt/skills/guides/pallas_guide.md``):

- the (a, b) parity pair of ``models/fused_shufflenet.py``'s r4 pair plan
  is the carried state; inference BatchNorm is folded to per-channel
  ``scale``/``bias`` vectors outside the kernel (f32 fold, bf16 apply);
- spatial banding WITHOUT manual DMA: the host-side wrapper builds
  pre-haloed row bands with plain XLA slicing (one extra read of the
  entry pair — cheap next to the per-block savings), so BlockSpecs stay
  non-overlapping: grid ``(B, n_bands)``, block ``(1, 1, band+2*halo, W,
  C)``; the kernel computes on the whole tile (zero-padded shifts; the
  invalid frontier creeps inward 2 rows per depthwise conv) and writes
  only the central ``band`` rows, which are exact because ``halo =
  2 * n_blocks`` covers the chain's receptive-field growth;
- 1x1 convs are MXU matmuls on ``(rows*W, C)``; the 5x5 depthwise conv
  is 25 shifted multiply-accumulates on the VPU (the per-channel kernel
  broadcast along lanes); the stride-1 split/interleave uses the same
  0/1 parity matrices as the XLA pair plan, so the math (and its bf16
  rounding profile) matches the production plan op for op.

Reference parity: identical math to ``fused_shufflenet._block_stride1_pair``
(itself exactness-gated against ``src/openpifpaf/network/basenetworks.py:~200``
semantics); gate: ``tests/test_pallas_pair_chain.py`` (interpret mode on
CPU, real Mosaic on TPU via ``tools/megakernel_bench.py``).
"""

from __future__ import annotations

import functools  # noqa: F401  (partial below)
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import BN_EPSILON


class BlockParams(NamedTuple):
    """Folded parameters of one stride-1 pair-plan block (all f32)."""

    w1a: jnp.ndarray   # (q, half)  branch2_conv1 rows 0::2 (even/`a` side)
    w1b: jnp.ndarray   # (q, half)  rows 1::2 (odd/`b` side)
    s1: jnp.ndarray    # (half,)    folded branch2_norm1 scale
    o1: jnp.ndarray    # (half,)    folded branch2_norm1 bias
    dwk: jnp.ndarray   # (5, 5, half) depthwise kernel
    sdw: jnp.ndarray   # (half,)
    odw: jnp.ndarray   # (half,)
    w2: jnp.ndarray    # (half, half) branch2_conv2
    s2: jnp.ndarray    # (half,)
    o2: jnp.ndarray    # (half,)


def fold_bn(params, stats) -> tuple:
    """Inference BatchNorm -> (scale, bias): y = x * scale + bias (f32)."""
    inv = 1.0 / np.sqrt(np.asarray(stats['var'], np.float64) + BN_EPSILON)
    scale = np.asarray(params['scale'], np.float64) * inv
    bias = (np.asarray(params['bias'], np.float64)
            - np.asarray(stats['mean'], np.float64) * scale)
    return scale.astype(np.float32), bias.astype(np.float32)


def block_params(p, s) -> BlockParams:
    """Canonical stride-1 InvertedResidualK variables -> folded params."""
    w1 = np.asarray(p['branch2_conv1']['kernel'])[0, 0]      # (half, half)
    s1, o1 = fold_bn(p['branch2_norm1'], s['branch2_norm1'])
    sdw, odw = fold_bn(p['branch2_dwnorm'], s['branch2_dwnorm'])
    s2, o2 = fold_bn(p['branch2_norm2'], s['branch2_norm2'])
    dwk = np.asarray(p['branch2_dwconv']['kernel'])[:, :, 0, :]  # (5,5,half)
    return BlockParams(
        w1a=jnp.asarray(w1[0::2]), w1b=jnp.asarray(w1[1::2]),
        s1=jnp.asarray(s1), o1=jnp.asarray(o1),
        dwk=jnp.asarray(dwk), sdw=jnp.asarray(sdw), odw=jnp.asarray(odw),
        w2=jnp.asarray(np.asarray(p['branch2_conv2']['kernel'])[0, 0]),
        s2=jnp.asarray(s2), o2=jnp.asarray(o2))


# lane-dim chunk for the depthwise conv inside the kernel: the 25
# shifted reads each materialize a VMEM copy (Mosaic does not fuse
# sublane-offset shifts), so chunks keep peak live VMEM ~25 * chunk
# bytes (measured: the unchunked version compiles to 48x48x256 and OOMs
# the compile at 48x48x512)
_DW_CHUNK = 256


def _chain_math(a, b, blocks: List[BlockParams], dtype,
                row0=None, img_h: int = None, img_w: int = None):
    """The shared chain body: runs unchanged inside the pallas kernel (on
    a VMEM-resident band) and as the XLA reference (on the full image).

    a, b: (R, W, C) channels-last.  Returns the output pair.

    ``row0``/``img_h``/``img_w``: first tile row's image-row index and the
    image height/width — rows below/right of the image (band halo, W
    sublane padding) must be zeroed in ``t`` before every depthwise conv
    (conv SAME pads ``t`` with zeros, but a zero INPUT row does not give a
    zero ``t`` row: the folded BN bias makes ``t = relu(o1)`` there).
    ``None`` = every position valid (the whole-image reference path).
    """
    r, w, c = a.shape
    q = c // 2
    # parity interleave matrices built from iota (no captured constants —
    # pallas kernels must not close over arrays)
    rows = jax.lax.broadcasted_iota(jnp.int32, (q, 2 * q), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (q, 2 * q), 1)
    pe = (cols == 2 * rows).astype(dtype)
    po = (cols == 2 * rows + 1).astype(dtype)

    def mat(x, wt):
        # f32 accumulation: the MXU accumulator is 32-bit (Mosaic rejects
        # a bf16 acc), and XLA's bf16 dots accumulate f32 too
        y = jnp.dot(x.reshape(r * w, x.shape[-1]), wt.astype(dtype),
                    preferred_element_type=jnp.float32)
        return y.astype(dtype).reshape(r, w, wt.shape[-1])

    if row0 is not None:
        img_rows = jax.lax.broadcasted_iota(jnp.int32, (r, w, 1), 0) + row0
        mask = (img_rows >= 0) & (img_rows < img_h)
        if img_w is not None and img_w < w:
            cols = jax.lax.broadcasted_iota(jnp.int32, (r, w, 1), 1)
            mask = mask & (cols < img_w)
        rmask = mask.astype(dtype)
    else:
        rmask = None

    for blk in blocks:
        t = mat(a[:, :, q:], blk.w1a) + mat(b[:, :, q:], blk.w1b)
        t = jnp.maximum(t * blk.s1.astype(dtype) + blk.o1.astype(dtype), 0)
        if rmask is not None:
            t = t * rmask
        # 5x5 depthwise: 25 shifted multiply-accumulates (VPU),
        # lane-chunked to bound peak VMEM (see _DW_CHUNK note)
        u_chunks = []
        for c0 in range(0, c, _DW_CHUNK):
            tc = t[:, :, c0:c0 + _DW_CHUNK]
            tp = jnp.pad(tc, ((2, 2), (2, 2), (0, 0)))
            uc = jnp.zeros_like(tc)
            for dy in range(5):
                for dx in range(5):
                    uc = uc + (tp[dy:dy + r, dx:dx + w]
                               * blk.dwk[dy, dx,
                                         c0:c0 + _DW_CHUNK].astype(dtype))
            u_chunks.append(uc)
        u = (u_chunks[0] if len(u_chunks) == 1
             else jnp.concatenate(u_chunks, axis=-1))
        u = u * blk.sdw.astype(dtype) + blk.odw.astype(dtype)
        v = jnp.maximum(mat(u, blk.w2) * blk.s2.astype(dtype)
                        + blk.o2.astype(dtype), 0)
        x1 = mat(a[:, :, :q], pe) + mat(b[:, :, :q], po)
        a, b = x1, v
    return a, b


def pair_chain_reference(a, b, blocks: List[BlockParams],
                         dtype=jnp.bfloat16):
    """XLA reference of the fused chain (same folded-BN math, per-op
    compilation).  a, b: (B, H, W, C)."""
    fn = functools.partial(_chain_math, blocks=blocks, dtype=dtype)
    out_a, out_b = jax.vmap(lambda aa, bb: fn(aa.astype(dtype),
                                              bb.astype(dtype)))(a, b)
    return out_a, out_b


def _flatten_blocks(blocks: List[BlockParams]):
    flat = []
    for blk in blocks:
        flat.extend(blk)
    return flat


def _unflatten_blocks(refs, n_blocks: int) -> List[BlockParams]:
    n = len(BlockParams._fields)
    return [BlockParams(*refs[i * n:(i + 1) * n]) for i in range(n_blocks)]


def pair_chain_pallas(a, b, blocks: List[BlockParams], *,
                      n_bands: int = 1, dtype=jnp.bfloat16,
                      interpret: bool = False):
    """Fused chain as ONE pallas kernel over ``(B, n_bands)`` grid.

    a, b: (B, H, W, C).  ``halo = 2 * len(blocks)`` rows on each band
    edge; bands are pre-haloed host-side (XLA pad + stack), so in-kernel
    zero-padded shifts reproduce conv SAME semantics exactly on the
    central rows each band commits.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bsz, h, w, c = a.shape
    n_blocks = len(blocks)
    halo = 2 * n_blocks
    band = -(-h // n_bands)
    h_pad = band * n_bands
    # W padded to the sublane tile: Mosaic crashes on the (R*W, C)
    # reshape when W is not a multiple of 8 (measured; the padding
    # columns are masked out of `t` like the row halo)
    w8 = -(-w // 8) * 8

    a = a.astype(dtype)
    b = b.astype(dtype)

    def to_tiles(x):
        # (B, H, W, C) -> (B, n_bands, band + 2*halo, W8, C), zero-padded
        xp = jnp.pad(x, ((0, 0), (halo, halo + h_pad - h),
                         (0, w8 - w), (0, 0)))
        return jnp.stack(
            [xp[:, j * band:j * band + band + 2 * halo] for j in
             range(n_bands)], axis=1)

    a_t = to_tiles(a)
    b_t = to_tiles(b)
    tile_rows = band + 2 * halo

    n_leaf = len(BlockParams._fields)

    def kernel(*refs):
        a_ref, b_ref = refs[0], refs[1]
        blk_refs = [r[:] for r in refs[2:2 + n_blocks * n_leaf]]
        out_a_ref, out_b_ref = refs[-2], refs[-1]
        blks = _unflatten_blocks(blk_refs, n_blocks)
        row0 = pl.program_id(1) * band - halo
        aa, bb = _chain_math(a_ref[0, 0], b_ref[0, 0], blks, dtype,
                             row0=row0, img_h=h, img_w=w)
        out_a_ref[0, 0] = aa[halo:halo + band]
        out_b_ref[0, 0] = bb[halo:halo + band]

    tile_spec = pl.BlockSpec(
        (1, 1, tile_rows, w8, c), lambda i, j: (i, j, 0, 0, 0),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, 1, band, w8, c), lambda i, j: (i, j, 0, 0, 0),
        memory_space=pltpu.VMEM)

    def full_spec(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i, j, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    flat = [x.astype(jnp.float32) for x in _flatten_blocks(blocks)]
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_bands),
        in_specs=[tile_spec, tile_spec] + [full_spec(x) for x in flat],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((bsz, n_bands, band, w8, c), dtype)
                   for _ in range(2)],
        interpret=interpret,
    )(a_t, b_t, *flat)

    def from_tiles(x):
        return x.reshape(bsz, n_bands * band, w8, c)[:, :h, :w]

    return from_tiles(out[0]), from_tiles(out[1])
