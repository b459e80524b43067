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


class TestTrainPlan:
    """Folded-routing TRAINING plan (shell_apply_train): fields, updated
    running stats, and gradients on the canonical tree must match the
    baseline ``model.apply(train=True, mutable=['batch_stats'])``."""

    def test_fields_stats_grads_match(self):
        import jax
        import jax.numpy as jnp

        model = build('shufflenetv2k16', bf16=False)
        assert fused_shufflenet.supports_train(model, model.variables)
        variables = perturb_stats(model.variables)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 65, 65, 3)).astype(np.float32)

        def run_baseline(params):
            fields, mutated = model.apply(
                {'params': params,
                 'batch_stats': variables['batch_stats']},
                x, train=True, mutable=['batch_stats'])
            loss = sum(jnp.sum(f ** 2) for f in fields)
            return loss, (fields, mutated['batch_stats'])

        def run_fused(params):
            fields, mutated = fused_shufflenet.shell_apply_train(
                model, {'params': params,
                        'batch_stats': variables['batch_stats']}, x)
            loss = sum(jnp.sum(f ** 2) for f in fields)
            return loss, (fields, mutated['batch_stats'])

        (lb, (fb, sb)), gb = jax.jit(
            jax.value_and_grad(run_baseline, has_aux=True))(
            variables['params'])
        (lf, (ff, sf)), gf = jax.jit(
            jax.value_and_grad(run_fused, has_aux=True))(
            variables['params'])

        for a, b in zip(fb, ff):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-4)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5),
            sb, sf)
        # gradients: the BN backward has heavy cancellation, so baseline
        # f32 carries its own rounding noise (measured against an f64
        # baseline reference: baseline-f32 rel-L2 5.2e-3, fused-f32
        # 1.3e-3 — the fused matmul accumulation is the *more* accurate
        # one).  Gate on relative L2 per leaf and globally.
        flat_b = jax.tree_util.tree_leaves_with_path(gb)
        flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
        assert len(flat_b) == len(flat_f)
        den = sum(float((np.asarray(l) ** 2).sum()) for _, l in flat_b)
        num = 0.0
        for path, leaf in flat_b:
            other = np.asarray(flat_f[path])
            leaf = np.asarray(leaf)
            d2 = float(((leaf - other) ** 2).sum())
            n2 = float((leaf ** 2).sum())
            num += d2
            # leaves far below the global gradient scale are analytically
            # ~zero (e.g. a BN bias feeding another BN: measured f64 norm
            # 7e-4 vs sibling 1952) — baseline f32's own rounding noise
            # there exceeds any tolerance; gate them against the global
            # scale instead
            if n2 > 1e-8 * den:
                assert (d2 / n2) ** 0.5 <= 5e-2, \
                    f'{path}: rel L2 {(d2 / n2) ** 0.5:.2e}'
        assert (num / den) ** 0.5 <= 2e-2, (num / den) ** 0.5

    def test_trainer_uses_fused_plan_and_converges_like_baseline(self):
        """One jitted train step through the Trainer path produces finite
        loss and updated stats with the fused plan active."""
        import tempfile

        from openpifpaf_tpu import losses
        from openpifpaf_tpu.training.optimize import OptimizeFactory
        from openpifpaf_tpu.training.trainer import Trainer

        model = build('shufflenetv2k16', bf16=False)
        loss_fn = losses.Factory().factory(model.head_metas)
        trainer = Trainer(model, loss_fn, OptimizeFactory(),
                          tempfile.mkdtemp() + '/model.npz')
        state = trainer.init_state(steps_per_epoch=2)
        trainer._build_steps()
        rng = np.random.default_rng(0)
        images = rng.normal(size=(2, 65, 65, 3)).astype(np.float32)
        fh = fw = 5
        targets = []
        for meta in model.head_metas:
            f, nv, ns = meta.n_fields, meta.n_vectors, meta.n_scales
            conf = (rng.uniform(0, 1, (2, f, fh, fw)) < 0.05).astype(
                np.float32)
            targets.append({
                'conf': conf,
                'conf_mask': np.ones((2, f, fh, fw), bool),
                'vec': rng.normal(size=(2, f, nv, 2, fh, fw)).astype(
                    np.float32),
                'vec_mask': np.broadcast_to(
                    conf.astype(bool)[:, :, None], (2, f, nv, fh, fw)),
                'scale': np.abs(rng.normal(2.0, 1.0, (2, f, ns, fh, fw))
                                ).astype(np.float32),
                'scale_mask': np.broadcast_to(
                    conf.astype(bool)[:, :, None], (2, f, ns, fh, fw)),
            })
        # snapshot before the call: the train step donates the state
        before = np.asarray(state.batch_stats['basenet']['conv1_norm']['mean'])
        new_state, total, _ = trainer._train_step(state, images, targets)
        assert np.isfinite(float(total))
        # running stats moved (batch mode BN was active)
        after = np.asarray(new_state.batch_stats['basenet']['conv1_norm']['mean'])
        assert float(np.abs(after - before).max()) > 0


class TestTrackingTrainPlan:
    """r5 advisor fix: the fused training plan must honor TrackingShell's
    paired (TCAF) head dispatch — before the fix, shell_apply_train fed
    single-frame features to the 2x-channel Tcaf head and the documented
    tracking warm-start training recipe crashed at the first step."""

    def build_tracking(self):
        import jax

        from openpifpaf_tpu import datasets, models

        dm = datasets.factory('toykpst')
        type(dm).n_images = 4
        type(dm).image_size = 81
        type(dm).batch_size = 2
        model = models.Factory(base_name='tshufflenetv2k16',
                               bf16=False).factory(
            head_metas=dm.head_metas, rng=jax.random.key(0))
        return dm, model

    def test_supports_and_matches_baseline(self):
        import jax

        dm, model = self.build_tracking()
        assert fused_shufflenet.supports_train(model, model.variables)
        variables = perturb_stats(model.variables)
        images, _, _ = next(iter(dm.train_loader()))

        base, base_mut = jax.jit(
            lambda v, x: model.module.apply(v, x, train=True,
                                            mutable=['batch_stats']))(
            variables, images)
        fused, fused_mut = jax.jit(
            lambda v, x: fused_shufflenet.shell_apply_train(model, v, x))(
            variables, images)
        assert len(base) == len(fused)
        for b, f in zip(base, fused):
            assert b.shape == f.shape
            np.testing.assert_allclose(np.asarray(f), np.asarray(b),
                                       atol=2e-4, rtol=1e-4)
        import jax as _jax
        _jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5),
            base_mut['batch_stats'], fused_mut['batch_stats'])

    def test_trainer_step_runs(self):
        """The documented warm-start recipe path: a Trainer-built train
        step on a tracking model (fused plan active) must run."""
        import tempfile

        from openpifpaf_tpu import losses
        from openpifpaf_tpu.training.optimize import OptimizeFactory
        from openpifpaf_tpu.training.trainer import Trainer

        dm, model = self.build_tracking()
        loss_fn = losses.Factory().factory(model.head_metas)
        trainer = Trainer(model, loss_fn, OptimizeFactory(),
                          tempfile.mkdtemp() + '/model.npz')
        state = trainer.init_state(steps_per_epoch=2)
        trainer._build_steps()
        images, targets, _ = next(iter(dm.train_loader()))
        before = np.asarray(
            state.batch_stats['basenet']['conv1_norm']['mean'])
        new_state, total, _ = trainer._train_step(state, images, targets)
        assert np.isfinite(float(total))
        after = np.asarray(
            new_state.batch_stats['basenet']['conv1_norm']['mean'])
        assert float(np.abs(after - before).max()) > 0


class TestPairPlan:
    """r4 symbolic-routing (pair) plan vs baseline and vs the r3 plan."""

    @pytest.mark.parametrize('base_name', ['shufflenetv2k16',
                                           'shufflenetv2x1'])
    def test_pair_matches_baseline_f32(self, base_name):
        import jax

        model = build(base_name, bf16=False)
        assert fused_shufflenet.supports_pair(model.module.basenet)
        variables = perturb_stats(model.variables)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 65, 65, 3)).astype(np.float32)

        base = jax.jit(lambda v, xx: model.module.basenet.apply(
            {'params': v['params']['basenet'],
             'batch_stats': v['batch_stats']['basenet']},
            xx, False))(variables, x)
        pair = jax.jit(lambda v, xx: fused_shufflenet.backbone_apply_pair(
            model.module.basenet, v, xx))(variables, x)
        np.testing.assert_allclose(np.asarray(pair), np.asarray(base),
                                   rtol=1e-5, atol=1e-5)

    def test_pair_matches_r3_plan_bf16(self):
        import jax

        model = build('shufflenetv2k16', bf16=True)
        variables = perturb_stats(model.variables)
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 65, 65, 3)).astype(np.float32)
        r3 = jax.jit(lambda v, xx: fused_shufflenet.backbone_apply(
            model.module.basenet, v, xx))(variables, x)
        r4 = jax.jit(lambda v, xx: fused_shufflenet.backbone_apply_pair(
            model.module.basenet, v, xx))(variables, x)
        np.testing.assert_allclose(
            np.asarray(r4, np.float32), np.asarray(r3, np.float32),
            rtol=0.03, atol=0.03)

    def test_width_gate(self):
        from openpifpaf_tpu.models.shufflenetv2k import ShuffleNetV2K

        # stage width not divisible by 4 -> half odd -> pair plan refuses
        mod = ShuffleNetV2K(stages_repeats=(2, 2, 2),
                            stages_out_channels=(24, 46, 92, 184, 184))
        assert not fused_shufflenet.supports_pair(mod)
