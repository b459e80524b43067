"""Plugin consistency tests.

Mirrors the reference ``tests/test_plugins.py`` (SURVEY.md §4): every
registered datamodule instantiates and its head metas are consistent.
"""

import numpy as np
import pytest

from openpifpaf_tpu import headmeta
from openpifpaf_tpu.datasets import DATAMODULES, factory


EXPECTED = ['animal', 'apollo', 'cifar10', 'cocodet', 'cocokp', 'cocokpst',
            'crowdpose', 'posetrack2018', 'toycrowd', 'toykp', 'toykpst',
            'wholebody']


def test_registry_contains_expected():
    for name in EXPECTED:
        assert name in DATAMODULES, f'{name} not registered'


@pytest.mark.parametrize('name', EXPECTED)
def test_datamodule_instantiates(name):
    dm = factory(name)
    assert dm.head_metas, name
    for meta in dm.head_metas:
        assert meta.dataset == name or name in ('toykp', 'toycrowd'), \
            (name, meta.dataset)


@pytest.mark.parametrize('name', EXPECTED)
def test_head_meta_consistency(name):
    dm = factory(name)
    for meta in dm.head_metas:
        if isinstance(meta, headmeta.Cif):
            assert len(meta.keypoints) == len(meta.sigmas)
            assert meta.n_fields == len(meta.keypoints)
            if meta.pose is not None:
                assert np.asarray(meta.pose).shape == \
                    (len(meta.keypoints), 3)
            if meta.score_weights is not None:
                assert len(meta.score_weights) == len(meta.keypoints)
        elif isinstance(meta, headmeta.Caf):
            assert meta.n_fields == len(meta.skeleton)
            k = len(meta.keypoints)
            for j1, j2 in meta.skeleton:
                assert 1 <= j1 <= k and 1 <= j2 <= k, \
                    (name, j1, j2, k)
        elif isinstance(meta, headmeta.Tcaf):
            assert meta.n_fields == len(meta.keypoints_single_frame)
        elif isinstance(meta, headmeta.CifDet):
            assert meta.n_fields == len(meta.categories)


@pytest.mark.parametrize('name', ['cocokp', 'crowdpose', 'wholebody',
                                  'animal', 'apollo'])
def test_hflip_tables(name):
    dm = factory(name)
    cif = dm.head_metas[0]
    import openpifpaf_tpu.plugins.crowdpose as crowdpose
    import openpifpaf_tpu.plugins.wholebody.constants as wb
    import openpifpaf_tpu.plugins.animalpose as animal
    import openpifpaf_tpu.plugins.apollocar3d as apollo
    from openpifpaf_tpu.plugins.coco import constants as coco

    tables = {'cocokp': coco.HFLIP,
              'crowdpose': crowdpose.constants.HFLIP,
              'wholebody': wb.HFLIP,
              'animal': animal.HFLIP,
              'apollo': apollo.HFLIP}
    hflip = tables[name]
    for a, b in hflip.items():
        assert a in cif.keypoints, (name, a)
        assert b in cif.keypoints, (name, b)
        assert hflip.get(b) == a, (name, a, b)  # involution


def test_wholebody_sizes():
    dm = factory('wholebody')
    cif, caf = dm.head_metas
    assert cif.n_fields == 133
    assert caf.n_fields == len(caf.skeleton) > 120


def test_wholebody_model_decode_stress():
    """133-kp dense skeleton through model + decoder (SURVEY §7 step 9)."""
    import jax
    from openpifpaf_tpu import decoder as decoder_mod, models

    dm = factory('wholebody')
    model = models.Factory(base_name='shufflenetv2k16', bf16=False).factory(
        head_metas=dm.head_metas, rng=jax.random.key(0))
    x = np.zeros((1, 65, 65, 3), np.float32)
    outs = model(x)
    assert outs[0].shape[1] == 133
    dec = decoder_mod.factory(model.head_metas)
    preds = dec.batch_fields(outs)
    assert len(preds) == 1


def test_wholebody_decode_budget_counters():
    """Budget-overflow counters at the 133-kp / 129-edge shape (VERDICT
    r2 #5): untrained-dense random fields must overflow the CAF candidate
    budget *observably* (n_dropped_caf > 0) rather than silently, and the
    decode must stay finite.  Perf numbers: tools/wholebody_bench.py."""
    import dataclasses

    import jax
    from openpifpaf_tpu import models
    from openpifpaf_tpu.ops import caf_scored, pipeline

    dm = factory('wholebody')
    model = models.Factory(base_name='shufflenetv2k16', bf16=False).factory(
        head_metas=dm.head_metas, rng=jax.random.key(0))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 129, 129, 3)).astype(np.float32)
    outs = model(x)

    cif_meta, caf_meta = model.head_metas[0], model.head_metas[1]
    # a candidate budget below the 9x9 grid size so the dense untrained
    # fields provably overflow it (at 641px the production budget of 256
    # overflows instead — tools/wholebody_bench.py counters)
    config = pipeline.CifCafConfig(
        stride=16, image_hw=(129, 129),
        caf=caf_scored.CafScoredConfig(max_candidates=16))
    decoded = pipeline.decode_cifcaf_single(
        outs[0][0], outs[1][0], cif_meta=cif_meta, caf_meta=caf_meta,
        config=config)
    assert int(decoded.n_dropped_caf) > 0     # observable, not silent
    assert np.isfinite(np.asarray(decoded.xyv)).all()
    assert np.isfinite(np.asarray(decoded.scores)).all()


def test_cifar10_loader():
    dm = factory('cifar10')
    type(dm).batch_size = 2
    import jax
    from openpifpaf_tpu import models

    model = models.Factory(base_name='shufflenetv2k16', bf16=False).factory(
        head_metas=dm.head_metas, rng=jax.random.key(0))
    images, targets, metas = next(iter(dm.train_loader()))
    assert images.shape == (2, 33, 33, 3)
    assert targets[0]['conf'].shape[1] == 10


def test_toycrowd_overlap_and_occlusion():
    """The crowd renderer must actually produce overlap (VERDICT r3 #2):
    clustered figures, nearer figures occluding back-figure joints."""
    import numpy as np

    from openpifpaf_tpu.plugins.toykp.crowd import ToyCrowdDataset

    ds = ToyCrowdDataset(16, 161, lambda im, anns, meta: (im, anns, meta),
                         seed=0)
    n_people = n_occluded = 0
    any_close = False
    for i in range(16):
        gt = ds.ground_truth(i)
        n_people += len(gt)
        n_occluded += sum(int((kp[:, 2] == 0).sum()) for kp in gt)
        for a in range(len(gt)):
            for b in range(a + 1, len(gt)):
                ca = gt[a][gt[a][:, 2] > 0, :2].mean(0) \
                    if (gt[a][:, 2] > 0).any() else None
                cb = gt[b][gt[b][:, 2] > 0, :2].mean(0) \
                    if (gt[b][:, 2] > 0).any() else None
                if ca is not None and cb is not None \
                        and np.hypot(*(ca - cb)) < 30.0:
                    any_close = True
        img = ds.render(i, gt)
        assert img.size == (161, 161)
    assert n_people >= 16 * 4
    assert n_occluded > 20, 'no occlusion -> the crowd variant is not crowded'
    assert any_close, 'no overlapping figure pairs generated'


def test_toywb_133kp_end_to_end():
    """ToyWb (r5, VERDICT r4 #2b): wholebody-topology toy — 133 fields /
    129 edges through loader, loss and decode; spread layout resolvable."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from openpifpaf_tpu import losses, models
    from openpifpaf_tpu.plugins.toykp.toywb import TOYWB_POSE, ToyWbDataset

    # layout sanity: every pair of keypoints separated in pose units
    d = np.sqrt(((TOYWB_POSE[:, None, :2]
                  - TOYWB_POSE[None, :, :2]) ** 2).sum(-1))
    np.fill_diagonal(d, 9e9)
    assert d.min() > 0.4, 'spread layout collapsed — blobs unresolvable'
    assert ToyWbDataset.KEYPOINTS[17].endswith('big_toe')

    # pixel-space resolvability at the default 321px (r5 mapping fix:
    # the inherited y-compressed mapping put face rows 1-3 px apart and
    # the fields were unlearnable — lock the full-frame mapping in)
    ds = ToyWbDataset.__new__(ToyWbDataset)
    ds.n_images, ds.image_size, ds.seed = 4, 321, 0
    ds.n_keypoints = 133
    for idx in range(4):
        (kp,) = ds.ground_truth(idx)
        dp = np.sqrt(((kp[:, None, :2] - kp[None, :, :2]) ** 2).sum(-1))
        np.fill_diagonal(dp, 9e9)
        assert dp.min() > 5.0, f'img {idx}: blobs {dp.min():.1f}px apart'
        assert kp[:, :2].min() >= 0 and kp[:, :2].max() < 321

    dm = factory('toywb')
    type(dm).n_images = 4
    type(dm).image_size = 97
    type(dm).batch_size = 2
    model = models.Factory(base_name='shufflenetv2k16', bf16=False).factory(
        head_metas=dm.head_metas, rng=jax.random.key(0))
    images, targets, _ = next(iter(dm.train_loader()))
    outs = model(np.asarray(images))
    assert outs[0].shape[1] == 133
    assert outs[1].shape[1] == 129
    loss_fn = losses.Factory().factory(model.head_metas)
    total, _ = loss_fn([jnp.asarray(o) for o in outs], targets)
    assert np.isfinite(float(total))

    from openpifpaf_tpu import decoder as decoder_mod
    dec = decoder_mod.factory(model.head_metas)
    preds = dec.batch_fields(outs)
    assert len(preds) == 2
