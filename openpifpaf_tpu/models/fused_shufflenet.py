"""Fused inference forward for ShuffleNetV2K: routing as MXU matmuls.

Reference parity: identical math to ``shufflenetv2k.py`` /
``src/openpifpaf/network/basenetworks.py:~200`` — this is a pure
*execution-plan* rewrite for inference, consuming the canonical parameter
tree unchanged.

TPU-first rationale (measured on a v5e, ``tools/exp_ops2.py``): the
ShuffleNetV2 block's channel routing — ``split`` into halves, ``concat``,
``channel_shuffle`` — are relayouts on the lane (channel) axis at
non-128-aligned widths (174/348/...).  XLA materializes each as its own
HBM round-trip, and a 4-block stage runs ~2x slower than its convs alone.
Every routing op is a fixed 0/1 channel permutation, and permutations
commute with the elementwise ops (BN, relu), so they fold into the 1x1
convolutions' weight matrices: the split feeding ``branch2_conv1`` widens
its kernel with zero rows, and ``shuffle(concat(x1, b2))`` becomes two
sparse matmuls summed (``x @ Px + b2 @ Po``).  The extra MXU FLOPs are
~3x the baseline's, but the MXU is <7% utilized while HBM is the
bottleneck — measured net effect: stage-2-shaped 4-block chain
1.96 -> 1.05 ms/img (1.9x).

Exactness: the folded matrices contain only 0.0 and 1.0; matmul rows that
route a value compute ``v * 1.0 + sum-of-exact-zeros``, so outputs agree
with the baseline path to bf16 rounding of the shared nonzero products
(bit-equal in f32; see ``tests/test_fused_shufflenet.py``).
"""

from __future__ import annotations

import functools
from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .base import BN_EPSILON, BN_MOMENTUM
from .shufflenetv2k import ShuffleNetV2K


@functools.lru_cache(maxsize=32)
def _routing_matrices(c: int):
    """Px (C, C), Pe/Po (C/2, C) as numpy 0/1 matrices for width ``c``.

    ``channel_shuffle(concat(a, b), 2)[j] = (a if j even else b)[j // 2]``,
    so with ``out = a @ Pe + b @ Po``: ``Pe[i, 2i] = 1``, ``Po[i, 2i+1] = 1``.
    ``Px`` routes the first half of a full-width tensor to even outputs
    (the stride-1 block's passthrough half).
    """
    half = c // 2
    pe = np.zeros((half, c), np.float32)
    po = np.zeros((half, c), np.float32)
    pe[np.arange(half), 2 * np.arange(half)] = 1.0
    po[np.arange(half), 2 * np.arange(half) + 1] = 1.0
    px = np.zeros((c, c), np.float32)
    px[np.arange(half), 2 * np.arange(half)] = 1.0
    return px, pe, po


def _bn(params, stats, x, dtype):
    """Inference BatchNorm with flax numerics (momentum irrelevant here)."""
    return nn.BatchNorm(
        use_running_average=True, epsilon=BN_EPSILON, dtype=dtype,
        param_dtype=jnp.float32).apply(
            {'params': params, 'batch_stats': stats}, x)


def _dw(x, kernel, stride, dtype):
    k = kernel.astype(dtype)
    pad = (k.shape[0] // 2, k.shape[0] // 2)
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), (pad, pad),
        feature_group_count=x.shape[-1],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def _mm(x, w, dtype):
    return x @ w.astype(dtype)


def _kernel2d(p):
    """(1, 1, Cin, Cout) conv kernel -> (Cin, Cout) matmul weight."""
    return p['kernel'][0, 0]


def _block_stride1(x, p, s, dtype):
    """Stride-1 InvertedResidualK with folded routing.  x: (..., C)."""
    c = x.shape[-1]
    half = c // 2
    px, _, po = _routing_matrices(c)
    w1 = _kernel2d(p['branch2_conv1'])                   # (half, half)
    w1pad = jnp.concatenate([jnp.zeros_like(w1), w1], axis=0)  # select x2
    b2 = _mm(x, w1pad, dtype)
    b2 = nn.relu(_bn(p['branch2_norm1'], s['branch2_norm1'], b2, dtype))
    b2 = _dw(b2, p['branch2_dwconv']['kernel'], 1, dtype)
    b2 = _bn(p['branch2_dwnorm'], s['branch2_dwnorm'], b2, dtype)
    b2 = _mm(b2, _kernel2d(p['branch2_conv2']), dtype)
    b2 = nn.relu(_bn(p['branch2_norm2'], s['branch2_norm2'], b2, dtype))
    del half
    return _mm(x, jnp.asarray(px), dtype) + _mm(b2, jnp.asarray(po), dtype)


def _block_stride2(x, p, s, stride, dtype):
    """Stride-2 InvertedResidualK with the concat+shuffle folded."""
    b1 = _dw(x, p['branch1_dwconv']['kernel'], stride, dtype)
    b1 = _bn(p['branch1_dwnorm'], s['branch1_dwnorm'], b1, dtype)
    b1 = _mm(b1, _kernel2d(p['branch1_conv']), dtype)
    b1 = nn.relu(_bn(p['branch1_norm'], s['branch1_norm'], b1, dtype))

    b2 = _mm(x, _kernel2d(p['branch2_conv1']), dtype)
    b2 = nn.relu(_bn(p['branch2_norm1'], s['branch2_norm1'], b2, dtype))
    b2 = _dw(b2, p['branch2_dwconv']['kernel'], stride, dtype)
    b2 = _bn(p['branch2_dwnorm'], s['branch2_dwnorm'], b2, dtype)
    b2 = _mm(b2, _kernel2d(p['branch2_conv2']), dtype)
    b2 = nn.relu(_bn(p['branch2_norm2'], s['branch2_norm2'], b2, dtype))

    c = 2 * b1.shape[-1]
    _, pe, po = _routing_matrices(c)
    return _mm(b1, jnp.asarray(pe), dtype) + _mm(b2, jnp.asarray(po), dtype)


def supports(module) -> bool:
    """The fused plan covers batchnorm ShuffleNetV2K backbones."""
    return isinstance(module, ShuffleNetV2K) and module.norm == 'batchnorm'


# ---------------------------------------------------------------------------
# training plan: identical routing fold, batch-mode BatchNorm.
#
# The 0/1 permutation matmuls are linear, so autodiff through this plan
# yields exactly the baseline gradients routed through the same
# permutations (gradients land on the canonical parameter tree unchanged:
# the fold consumes ``p[...]['kernel']`` directly, and the zero-padded
# rows of the widened branch2_conv1 kernel receive exactly-zero gradient
# contributions).  BatchNorm runs through the flax module in batch mode so
# batch-statistics numerics and running-stat updates are bit-identical to
# the baseline apply (``tests/test_fused_shufflenet.py::TestTrainPlan``).
# ---------------------------------------------------------------------------

def _bn_train(params, stats, x, dtype, momentum):
    bn = nn.BatchNorm(use_running_average=False, momentum=momentum,
                      epsilon=BN_EPSILON, dtype=dtype, param_dtype=jnp.float32)
    y, mut = bn.apply({'params': params, 'batch_stats': stats}, x,
                      mutable=['batch_stats'])
    return y, mut['batch_stats']


def _block_stride1_train(x, p, s, dtype, momentum):
    c = x.shape[-1]
    px, _, po = _routing_matrices(c)
    new_s = {}

    def bn(name, t):
        y, new_s[name] = _bn_train(p[name], s[name], t, dtype, momentum)
        return y

    w1 = _kernel2d(p['branch2_conv1'])
    w1pad = jnp.concatenate([jnp.zeros_like(w1), w1], axis=0)
    b2 = _mm(x, w1pad, dtype)
    b2 = nn.relu(bn('branch2_norm1', b2))
    b2 = _dw(b2, p['branch2_dwconv']['kernel'], 1, dtype)
    b2 = bn('branch2_dwnorm', b2)
    b2 = _mm(b2, _kernel2d(p['branch2_conv2']), dtype)
    b2 = nn.relu(bn('branch2_norm2', b2))
    out = _mm(x, jnp.asarray(px), dtype) + _mm(b2, jnp.asarray(po), dtype)
    return out, new_s


def _block_stride2_train(x, p, s, stride, dtype, momentum):
    new_s = {}

    def bn(name, t):
        y, new_s[name] = _bn_train(p[name], s[name], t, dtype, momentum)
        return y

    b1 = _dw(x, p['branch1_dwconv']['kernel'], stride, dtype)
    b1 = bn('branch1_dwnorm', b1)
    b1 = _mm(b1, _kernel2d(p['branch1_conv']), dtype)
    b1 = nn.relu(bn('branch1_norm', b1))

    b2 = _mm(x, _kernel2d(p['branch2_conv1']), dtype)
    b2 = nn.relu(bn('branch2_norm1', b2))
    b2 = _dw(b2, p['branch2_dwconv']['kernel'], stride, dtype)
    b2 = bn('branch2_dwnorm', b2)
    b2 = _mm(b2, _kernel2d(p['branch2_conv2']), dtype)
    b2 = nn.relu(bn('branch2_norm2', b2))

    c = 2 * b1.shape[-1]
    _, pe, po = _routing_matrices(c)
    out = _mm(b1, jnp.asarray(pe), dtype) + _mm(b2, jnp.asarray(po), dtype)
    return out, new_s


def backbone_apply_train(module: ShuffleNetV2K, variables, x: jnp.ndarray,
                         prefix: str = 'basenet', momentum: float = BN_MOMENTUM):
    """Training forward of the backbone: folded routing + batch-mode BN.

    Returns ``(features, new_backbone_batch_stats)`` with the stats tree
    shaped exactly like ``variables['batch_stats'][prefix]``.
    """
    p = variables['params'][prefix]
    s = variables['batch_stats'][prefix]
    dtype = module.dtype
    new_stats = {}

    x = x.astype(dtype)
    k1 = p['conv1']['kernel'].astype(dtype)
    x = jax.lax.conv_general_dilated(
        x, k1, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    x, new_stats['conv1_norm'] = _bn_train(
        p['conv1_norm'], s['conv1_norm'], x, dtype, momentum)
    x = nn.relu(x)

    for stage_i, repeats in enumerate(module.stages_repeats, start=2):
        name = f'stage{stage_i}_0'
        x, new_stats[name] = _block_stride2_train(
            x, p[name], s[name], 2, dtype, momentum)
        for bi in range(1, repeats):
            name = f'stage{stage_i}_{bi}'
            x, new_stats[name] = _block_stride1_train(
                x, p[name], s[name], dtype, momentum)

    x = _mm(x, _kernel2d(p['conv5']), dtype)
    x, new_stats['conv5_norm'] = _bn_train(
        p['conv5_norm'], s['conv5_norm'], x, dtype, momentum)
    x = nn.relu(x)
    return x, new_stats


def shell_apply_train(model, variables, x: jnp.ndarray):
    """Full training forward through the folded-routing plan.

    Same contract as ``model.apply(..., train=True,
    mutable=['batch_stats'])``: returns ``(fields, {'batch_stats': ...})``.
    Requires ``cross_talk == 0`` and dropout-free heads (the defaults);
    callers gate on :func:`supports_train`.  Uses the r4 pair plan when
    the stage widths allow it.  Tracking shells (``TrackingShell``, with a
    ``head_paired`` attribute) get their paired (TCAF) heads fed the
    channel-concatenated frame-pair features, exactly like
    ``TrackingShell.heads_from_features``.
    """
    shell = model.module
    basenet = shell.basenet
    if supports_pair(basenet):
        features, new_backbone_stats = backbone_apply_pair_train(
            basenet, variables, x)
    else:
        features, new_backbone_stats = backbone_apply_train(
            basenet, variables, x)

    head_paired = getattr(shell, 'head_paired', None)
    if head_paired is not None:
        # TrackingShell.heads_from_features pair fold, train-mode
        b2, h, w, c = features.shape
        pair = features.reshape(b2 // 2, 2, h, w, c)
        paired_feats = jnp.concatenate([pair[:, 0], pair[:, 1]], axis=-1)
    else:
        head_paired = [False] * len(shell.head_nets)
        paired_feats = None
    outs = []
    for i, (head, is_paired) in enumerate(zip(shell.head_nets, head_paired)):
        outs.append(head.apply(
            {'params': variables['params'][f'head_nets_{i}']},
            paired_feats if is_paired else features, train=True))
    return outs, {'batch_stats': {'basenet': new_backbone_stats}}


def supports_train(model, variables) -> bool:
    """Training-plan eligibility: batchnorm ShuffleNetV2K shell with no
    CrossTalk, no head dropout (both reference defaults), and the basenet
    as the only batch-stats-carrying submodule (a future head/shell with
    norm layers must fail loudly here, not train with frozen stats)."""
    return (supports(model.module.basenet)
            and 'batch_stats' in variables
            and set(variables['batch_stats'].keys()) == {'basenet'}
            and getattr(model.module, 'cross_talk', 0.0) == 0.0
            and all(getattr(h, 'dropout_rate', 0.0) == 0.0
                    for h in model.module.head_nets))


def backbone_apply(module: ShuffleNetV2K, variables, x: jnp.ndarray,
                   prefix: str = 'basenet') -> jnp.ndarray:
    """Inference forward of the backbone from the canonical variables."""
    p = variables['params'][prefix]
    s = variables['batch_stats'][prefix]
    dtype = module.dtype

    x = x.astype(dtype)
    k1 = p['conv1']['kernel'].astype(dtype)
    x = jax.lax.conv_general_dilated(
        x, k1, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    x = nn.relu(_bn(p['conv1_norm'], s['conv1_norm'], x, dtype))

    for stage_i, repeats in enumerate(module.stages_repeats, start=2):
        x = _block_stride2(x, p[f'stage{stage_i}_0'], s[f'stage{stage_i}_0'],
                           2, dtype)
        for bi in range(1, repeats):
            x = _block_stride1(x, p[f'stage{stage_i}_{bi}'],
                               s[f'stage{stage_i}_{bi}'], dtype)

    x = _mm(x, _kernel2d(p['conv5']), dtype)
    x = nn.relu(_bn(p['conv5_norm'], s['conv5_norm'], x, dtype))
    return x


def shell_apply(model, variables, x: jnp.ndarray) -> List[jnp.ndarray]:
    """Full inference forward: fused backbone + the unmodified flax heads.

    Call via ``Model.apply_fast`` which falls back to the baseline flax
    apply for unsupported backbones.  Uses the r4 pair plan (symbolic
    routing, ``backbone_apply_pair``) when the stage widths allow it, the
    r3 matmul-routing plan otherwise.
    """
    basenet = model.module.basenet
    if supports_pair(basenet):
        features = backbone_apply_pair(basenet, variables, x)
    else:
        features = backbone_apply(basenet, variables, x)
    outs = []
    for i, head in enumerate(model.module.head_nets):
        outs.append(head.apply(
            {'params': variables['params'][f'head_nets_{i}']},
            features, train=False))
    return outs


# ---------------------------------------------------------------------------
# round-4 "pair plan": the channel interleave stays SYMBOLIC.
#
# Measured (tools/fwd_stage_timing.py, v5e, batch 8 at 641px): the r3 plan's
# routing matmuls (Px/Po per block) cost 1.29 of the forward's 3.6 ms/img.
# They exist only to materialize ``out = channel_shuffle(concat(x1, b2))``.
# But every consumer of ``out`` is foldable if we instead carry the PAIR
# ``(a, b)`` with the invariant ``logical = interleave(a, b)`` (logical
# channel 2i = a[i], 2i+1 = b[i]):
#
# - 1x1 convs: ``logical @ W = a @ W[0::2] + b @ W[1::2]`` — static ROW
#   GATHERS of the kernel at trace time, zero runtime routing;
# - depthwise convs: per-channel, so ``dw(logical) = interleave(
#   dw(a, K[0::2]), dw(b, K[1::2]))`` — two half-width dw convs;
# - BatchNorm/relu: elementwise per-channel — slice params/stats by parity;
# - the stride-1 split: ``x2 = logical[half:]`` touches a[q:], b[q:]
#   (contiguous slices, q = half//2) with kernel rows re-gathered; the new
#   passthrough ``x1' = logical[:half] = interleave(a[:q], b[:q])`` is the
#   ONLY materialization left, at quarter width (two (q, half) 0/1
#   matmuls), and the new state is ``(x1', b2)`` — the invariant holds by
#   construction.
#
# Per stride-1 block the plan replaces 1.5*C^2 routing FLOPs + a full-C
# write with 0.25*C^2 + a half-C write, and stride-2 blocks/conv5 fold for
# free.  Exactness: all folds are index gathers of parameters (no
# arithmetic); matmul sums group differently, so agreement is exact in
# f32 up to summation order and bf16-rounding-scale in bf16
# (tests/test_fused_shufflenet.py::TestPairPlan).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _interleave_matrices(q: int):
    """Pe_q (q, 2q): a[:q] -> even cols; Po_q: b[:q] -> odd cols."""
    pe = np.zeros((q, 2 * q), np.float32)
    po = np.zeros((q, 2 * q), np.float32)
    pe[np.arange(q), 2 * np.arange(q)] = 1.0
    po[np.arange(q), 2 * np.arange(q) + 1] = 1.0
    return pe, po


def _bn_pair(params, stats, pair, dtype):
    """BatchNorm over a logical tensor held as an (a, b) parity pair."""
    a, b = pair

    def side(x, sl):
        return _bn({'scale': params['scale'][sl], 'bias': params['bias'][sl]},
                   {'mean': stats['mean'][sl], 'var': stats['var'][sl]},
                   x, dtype)

    return side(a, slice(0, None, 2)), side(b, slice(1, None, 2))


def _mm_pair(pair, w, dtype):
    """``logical @ w`` with the kernel rows gathered by parity."""
    a, b = pair
    return _mm(a, w[0::2], dtype) + _mm(b, w[1::2], dtype)


def _dw_pair(pair, kernel, stride, dtype):
    """Depthwise conv over a logical pair: parity-sliced kernels."""
    a, b = pair
    return (_dw(a, kernel[:, :, :, 0::2], stride, dtype),
            _dw(b, kernel[:, :, :, 1::2], stride, dtype))


def _block_stride1_pair(pair, p, s, dtype):
    """Stride-1 InvertedResidualK on a parity pair -> parity pair."""
    a, b = pair
    assert a.shape[-1] == b.shape[-1]
    half = a.shape[-1]
    q = half // 2

    # x2 = logical[half:]: even slots a[q:], odd slots b[q:]; fold into W1
    w1 = _kernel2d(p['branch2_conv1'])          # (half, half)
    b2 = (_mm(a[..., q:], w1[0::2], dtype)
          + _mm(b[..., q:], w1[1::2], dtype))
    b2 = nn.relu(_bn(p['branch2_norm1'], s['branch2_norm1'], b2, dtype))
    b2 = _dw(b2, p['branch2_dwconv']['kernel'], 1, dtype)
    b2 = _bn(p['branch2_dwnorm'], s['branch2_dwnorm'], b2, dtype)
    b2 = _mm(b2, _kernel2d(p['branch2_conv2']), dtype)
    b2 = nn.relu(_bn(p['branch2_norm2'], s['branch2_norm2'], b2, dtype))

    # x1' = logical[:half] = interleave(a[:q], b[:q]) — the one remaining
    # materialization, at quarter width
    pe, po = _interleave_matrices(q)
    x1 = (_mm(a[..., :q], jnp.asarray(pe), dtype)
          + _mm(b[..., :q], jnp.asarray(po), dtype))
    return x1, b2


def _block_stride2_pair(pair_or_dense, p, s, stride, dtype):
    """Stride-2 InvertedResidualK; input dense (stage-2 entry) or pair."""
    is_pair = isinstance(pair_or_dense, tuple)

    if is_pair:
        d1 = _dw_pair(pair_or_dense, p['branch1_dwconv']['kernel'], stride,
                      dtype)
        d1 = _bn_pair(p['branch1_dwnorm'], s['branch1_dwnorm'], d1, dtype)
        b1 = _mm_pair(d1, _kernel2d(p['branch1_conv']), dtype)
    else:
        d1 = _dw(pair_or_dense, p['branch1_dwconv']['kernel'], stride, dtype)
        d1 = _bn(p['branch1_dwnorm'], s['branch1_dwnorm'], d1, dtype)
        b1 = _mm(d1, _kernel2d(p['branch1_conv']), dtype)
    b1 = nn.relu(_bn(p['branch1_norm'], s['branch1_norm'], b1, dtype))

    if is_pair:
        b2 = _mm_pair(pair_or_dense, _kernel2d(p['branch2_conv1']), dtype)
    else:
        b2 = _mm(pair_or_dense, _kernel2d(p['branch2_conv1']), dtype)
    b2 = nn.relu(_bn(p['branch2_norm1'], s['branch2_norm1'], b2, dtype))
    b2 = _dw(b2, p['branch2_dwconv']['kernel'], stride, dtype)
    b2 = _bn(p['branch2_dwnorm'], s['branch2_dwnorm'], b2, dtype)
    b2 = _mm(b2, _kernel2d(p['branch2_conv2']), dtype)
    b2 = nn.relu(_bn(p['branch2_norm2'], s['branch2_norm2'], b2, dtype))

    # logical = interleave(b1, b2): the pair IS the state — no routing
    return b1, b2


def supports_pair(module) -> bool:
    """Pair-plan eligibility: every stage half-width must be even."""
    if not supports(module):
        return False
    return all((c // 2) % 2 == 0 for c in module.stages_out_channels[1:4])


def backbone_apply_pair(module: ShuffleNetV2K, variables, x: jnp.ndarray,
                        prefix: str = 'basenet') -> jnp.ndarray:
    """Inference forward with symbolic routing (pair plan)."""
    p = variables['params'][prefix]
    s = variables['batch_stats'][prefix]
    dtype = module.dtype

    x = x.astype(dtype)
    k1 = p['conv1']['kernel'].astype(dtype)
    x = jax.lax.conv_general_dilated(
        x, k1, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    x = nn.relu(_bn(p['conv1_norm'], s['conv1_norm'], x, dtype))

    state = x            # dense into stage 2
    for stage_i, repeats in enumerate(module.stages_repeats, start=2):
        state = _block_stride2_pair(
            state, p[f'stage{stage_i}_0'], s[f'stage{stage_i}_0'], 2, dtype)
        for bi in range(1, repeats):
            state = _block_stride1_pair(
                state, p[f'stage{stage_i}_{bi}'], s[f'stage{stage_i}_{bi}'],
                dtype)

    # conv5 folds the final interleave for free
    x = _mm_pair(state, _kernel2d(p['conv5']), dtype)
    x = nn.relu(_bn(p['conv5_norm'], s['conv5_norm'], x, dtype))
    return x


# ---------------------------------------------------------------------------
# pair TRAINING plan: symbolic routing + batch-mode BN.
#
# BatchNorm statistics are per-channel over (N, H, W), so computing them on
# the parity halves of a logical tensor yields exactly the per-channel
# values of the baseline; running-stat updates are re-interleaved back into
# the canonical stats tensors.  In stride-1 blocks every BN operates on a
# dense canonical-order tensor anyway (the b2 chain), so only the stride-2
# block's branch1_dwnorm needs the pair treatment.
# ---------------------------------------------------------------------------

def _interleave_vec(a, b):
    return jnp.stack([a, b], axis=-1).reshape(-1)


def _bn_train_pair(params, stats, pair, dtype, momentum):
    a, b = pair

    def side(x, sl):
        return _bn_train(
            {'scale': params['scale'][sl], 'bias': params['bias'][sl]},
            {'mean': stats['mean'][sl], 'var': stats['var'][sl]},
            x, dtype, momentum)

    ya, sa = side(a, slice(0, None, 2))
    yb, sb = side(b, slice(1, None, 2))
    merged = {'mean': _interleave_vec(sa['mean'], sb['mean']),
              'var': _interleave_vec(sa['var'], sb['var'])}
    return (ya, yb), merged


def _block_stride1_pair_train(pair, p, s, dtype, momentum):
    a, b = pair
    half = a.shape[-1]
    q = half // 2
    new_s = {}

    def bn(name, t):
        y, new_s[name] = _bn_train(p[name], s[name], t, dtype, momentum)
        return y

    w1 = _kernel2d(p['branch2_conv1'])
    b2 = (_mm(a[..., q:], w1[0::2], dtype)
          + _mm(b[..., q:], w1[1::2], dtype))
    b2 = nn.relu(bn('branch2_norm1', b2))
    b2 = _dw(b2, p['branch2_dwconv']['kernel'], 1, dtype)
    b2 = bn('branch2_dwnorm', b2)
    b2 = _mm(b2, _kernel2d(p['branch2_conv2']), dtype)
    b2 = nn.relu(bn('branch2_norm2', b2))

    pe, po = _interleave_matrices(q)
    x1 = (_mm(a[..., :q], jnp.asarray(pe), dtype)
          + _mm(b[..., :q], jnp.asarray(po), dtype))
    return (x1, b2), new_s


def _block_stride2_pair_train(pair_or_dense, p, s, stride, dtype, momentum):
    is_pair = isinstance(pair_or_dense, tuple)
    new_s = {}

    def bn(name, t):
        y, new_s[name] = _bn_train(p[name], s[name], t, dtype, momentum)
        return y

    if is_pair:
        d1 = _dw_pair(pair_or_dense, p['branch1_dwconv']['kernel'], stride,
                      dtype)
        d1, new_s['branch1_dwnorm'] = _bn_train_pair(
            p['branch1_dwnorm'], s['branch1_dwnorm'], d1, dtype, momentum)
        b1 = _mm_pair(d1, _kernel2d(p['branch1_conv']), dtype)
    else:
        d1 = _dw(pair_or_dense, p['branch1_dwconv']['kernel'], stride, dtype)
        d1 = bn('branch1_dwnorm', d1)
        b1 = _mm(d1, _kernel2d(p['branch1_conv']), dtype)
    b1 = nn.relu(bn('branch1_norm', b1))

    if is_pair:
        b2 = _mm_pair(pair_or_dense, _kernel2d(p['branch2_conv1']), dtype)
    else:
        b2 = _mm(pair_or_dense, _kernel2d(p['branch2_conv1']), dtype)
    b2 = nn.relu(bn('branch2_norm1', b2))
    b2 = _dw(b2, p['branch2_dwconv']['kernel'], stride, dtype)
    b2 = bn('branch2_dwnorm', b2)
    b2 = _mm(b2, _kernel2d(p['branch2_conv2']), dtype)
    b2 = nn.relu(bn('branch2_norm2', b2))

    return (b1, b2), new_s


def backbone_apply_pair_train(module: ShuffleNetV2K, variables,
                              x: jnp.ndarray, prefix: str = 'basenet',
                              momentum: float = BN_MOMENTUM):
    """Training forward with symbolic routing; returns
    ``(features, new_backbone_batch_stats)``."""
    p = variables['params'][prefix]
    s = variables['batch_stats'][prefix]
    dtype = module.dtype
    new_stats = {}

    x = x.astype(dtype)
    k1 = p['conv1']['kernel'].astype(dtype)
    x = jax.lax.conv_general_dilated(
        x, k1, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    x, new_stats['conv1_norm'] = _bn_train(
        p['conv1_norm'], s['conv1_norm'], x, dtype, momentum)
    x = nn.relu(x)

    state = x
    for stage_i, repeats in enumerate(module.stages_repeats, start=2):
        name = f'stage{stage_i}_0'
        state, new_stats[name] = _block_stride2_pair_train(
            state, p[name], s[name], 2, dtype, momentum)
        for bi in range(1, repeats):
            name = f'stage{stage_i}_{bi}'
            state, new_stats[name] = _block_stride1_pair_train(
                state, p[name], s[name], dtype, momentum)

    x = _mm_pair(state, _kernel2d(p['conv5']), dtype)
    x, new_stats['conv5_norm'] = _bn_train(
        p['conv5_norm'], s['conv5_norm'], x, dtype, momentum)
    x = nn.relu(x)
    return x, new_stats


def backbone_features(module: ShuffleNetV2K, variables,
                      x: jnp.ndarray, prefix: str = 'basenet') -> jnp.ndarray:
    """Fastest supported inference backbone forward (pair plan when the
    widths allow, r3 matmul-routing plan otherwise).  Used by the tracking
    shell (``TrackingModel.apply_fast`` / frame-feature caching in
    ``video.py``) where only the backbone is shared-weight fusable."""
    if supports_pair(module):
        return backbone_apply_pair(module, variables, x, prefix)
    return backbone_apply(module, variables, x, prefix)
