"""Pallas pair-chain megakernel pilot: parity gates (interpret mode).

Two gates:

1. ``pair_chain_reference`` (the folded-BN chain math the kernel runs)
   must match the production XLA pair plan
   (``fused_shufflenet._block_stride1_pair``) on real canonical variables
   — validates the BN fold and the parity-matmul semantics.
2. ``pair_chain_pallas`` (interpret mode — the CPU-checkable leg; the
   real-Mosaic leg runs on TPU via ``tools/megakernel_bench.py``) must
   match ``pair_chain_reference`` with banding enabled, which proves the
   halo arithmetic (receptive-field growth 2 rows per depthwise conv).
"""

import numpy as np
import pytest

from openpifpaf_tpu.models.shufflenetv2k import ShuffleNetV2K
from openpifpaf_tpu.ops import pallas_pair_chain as ppc


@pytest.fixture(scope='module')
def chain_setup():
    import jax

    # one real stage worth of canonical variables (small widths for CPU)
    mod = ShuffleNetV2K(stages_repeats=(4,), stages_out_channels=(24, 48, 48))
    variables = mod.init(jax.random.key(0),
                         np.zeros((1, 33, 33, 3), np.float32), False)

    # randomize BN stats so the fold is exercised
    rng = np.random.default_rng(0)

    def perturb(path, x):
        name = path[-1].key if hasattr(path[-1], 'key') else str(path[-1])
        x = np.asarray(x)
        if name == 'mean':
            return x + rng.normal(0, 0.3, x.shape).astype(np.float32)
        if name == 'var':
            return (x * rng.uniform(0.5, 2.0, x.shape)).astype(np.float32)
        return x

    variables = jax.tree_util.tree_map_with_path(perturb, variables)

    blocks = [
        ppc.block_params(variables['params'][f'stage2_{i}'],
                         variables['batch_stats'][f'stage2_{i}'])
        for i in range(1, 4)]
    return variables, blocks


def random_pair(rng, b=2, h=17, w=15, half=24):
    a = rng.normal(size=(b, h, w, half)).astype(np.float32)
    bb = rng.normal(size=(b, h, w, half)).astype(np.float32)
    return np.abs(a), np.abs(bb)   # post-relu activations are nonnegative


def test_reference_matches_production_pair_plan(chain_setup):
    """Gate 1: folded-BN chain math == fused_shufflenet pair plan."""
    import jax.numpy as jnp

    from openpifpaf_tpu.models import fused_shufflenet as fs

    variables, blocks = chain_setup
    rng = np.random.default_rng(1)
    a, b = random_pair(rng)

    ref_a, ref_b = ppc.pair_chain_reference(
        jnp.asarray(a), jnp.asarray(b), blocks, dtype=jnp.float32)

    pair = (jnp.asarray(a), jnp.asarray(b))
    for i in range(1, 4):
        pair = fs._block_stride1_pair(
            pair, variables['params'][f'stage2_{i}'],
            variables['batch_stats'][f'stage2_{i}'], jnp.float32)
    np.testing.assert_allclose(np.asarray(ref_a), np.asarray(pair[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ref_b), np.asarray(pair[1]),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize('n_bands', [1, 2, 3])
def test_pallas_interpret_matches_reference(chain_setup, n_bands):
    """Gate 2: banded kernel (interpret) == whole-image reference."""
    import jax.numpy as jnp

    _, blocks = chain_setup
    rng = np.random.default_rng(2)
    a, b = random_pair(rng)

    ref_a, ref_b = ppc.pair_chain_reference(
        jnp.asarray(a), jnp.asarray(b), blocks, dtype=jnp.float32)
    got_a, got_b = ppc.pair_chain_pallas(
        jnp.asarray(a), jnp.asarray(b), blocks, n_bands=n_bands,
        dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(ref_a),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b),
                               rtol=1e-5, atol=1e-5)
