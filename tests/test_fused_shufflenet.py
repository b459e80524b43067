"""Fused ShuffleNetV2K inference plan vs the baseline flax graph.

The folded-routing forward (``models/fused_shufflenet.py``) must agree
with ``module.apply(train=False)``: the routing matrices are exact 0/1
weights, so any disagreement beyond dtype rounding of the shared nonzero
products is a bug.
"""

import numpy as np
import pytest

from openpifpaf_tpu import headmeta, models
from openpifpaf_tpu.models import fused_shufflenet
from openpifpaf_tpu.plugins.coco import constants


def build(base_name, bf16):
    import jax

    cif = headmeta.Cif('cif', 'cocokp', keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS)
    caf = headmeta.Caf('caf', 'cocokp', keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       skeleton=constants.COCO_PERSON_SKELETON)
    factory = models.Factory(base_name=base_name, bf16=bf16)
    model = factory.from_scratch(base_name, [cif, caf])
    model.init(jax.random.key(0), input_hw=(65, 65))
    return model


def perturb_stats(variables, seed=1):
    """Running BN stats at init are trivial (mean 0, var 1); randomize so
    the comparison actually exercises the normalization folding."""
    import jax

    rngs = iter(jax.random.split(jax.random.key(seed), 4096))

    def perturb(path, x):
        name = path[-1].key if hasattr(path[-1], 'key') else str(path[-1])
        if name == 'mean':
            return x + jax.random.normal(next(rngs), x.shape) * 0.3
        if name == 'var':
            return x * jax.random.uniform(next(rngs), x.shape, minval=0.5,
                                          maxval=2.0)
        return x

    stats = jax.tree_util.tree_map_with_path(
        perturb, variables['batch_stats'])
    return dict(variables, batch_stats=stats)


@pytest.mark.parametrize('bf16', [False, True])
def test_fused_matches_baseline(bf16):
    import jax

    model = build('shufflenetv2k16', bf16)
    assert fused_shufflenet.supports(model.module.basenet)
    variables = perturb_stats(model.variables)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 65, 65, 3)).astype(np.float32)

    base = jax.jit(
        lambda v, x: model.module.apply(v, x, train=False))(variables, x)
    fused = jax.jit(
        lambda v, x: model.apply_fast(v, x))(variables, x)

    assert len(base) == len(fused)
    for b, f in zip(base, fused):
        b, f = np.asarray(b), np.asarray(f)
        assert b.shape == f.shape
        if bf16:
            # shared nonzero products, bf16 rounding differences only
            np.testing.assert_allclose(f, b, rtol=0.02, atol=0.02)
        else:
            np.testing.assert_allclose(f, b, rtol=1e-5, atol=1e-5)


def test_unsupported_backbone_falls_back():
    import jax

    model = build('resnet50', False)
    assert not fused_shufflenet.supports(model.module.basenet)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 65, 65, 3)).astype(np.float32)
    base = model.module.apply(model.variables, x, train=False)
    fast = model.apply_fast(model.variables, x)
    for b, f in zip(base, fast):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(f))


def test_groupnorm_variant_falls_back():
    from openpifpaf_tpu.models.shufflenetv2k import ShuffleNetV2K

    mod = ShuffleNetV2K(stages_repeats=(2,), stages_out_channels=(24, 48),
                        norm='groupnorm')
    assert not fused_shufflenet.supports(mod)
