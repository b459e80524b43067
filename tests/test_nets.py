"""Network shape tests.

Mirrors reference ``tests/test_nets.py`` / ``tests/test_forward.py``:
build each backbone tiny, assert head output shapes
``(B, n_fields, n_components, H, W)`` against stride arithmetic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import openpifpaf_tpu as opt
from openpifpaf_tpu import headmeta, models
from openpifpaf_tpu.plugins.coco import constants


def _coco_metas():
    cif = headmeta.Cif('cif', 'cocokp',
                       keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       pose=constants.COCO_UPRIGHT_POSE,
                       draw_skeleton=constants.COCO_PERSON_SKELETON,
                       score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)
    caf = headmeta.Caf('caf', 'cocokp',
                       keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       pose=constants.COCO_UPRIGHT_POSE,
                       skeleton=constants.COCO_PERSON_SKELETON)
    return [cif, caf]


def test_headmeta_channel_math():
    cif, caf = _coco_metas()
    assert cif.n_fields == 17
    assert cif.n_components == 1 + 3 * 1 + 1  # conf, x, y, b, scale
    assert caf.n_fields == 19
    assert caf.n_components == 1 + 3 * 2 + 2  # conf, 2*(x,y,b), 2 scales


@pytest.mark.parametrize('basenet_name', ['shufflenetv2k16', 'resnet50'])
def test_forward_shapes(basenet_name):
    factory = models.Factory(base_name=basenet_name, bf16=False)
    metas = _coco_metas()
    model = factory.from_scratch(basenet_name, metas)
    model.init(jax.random.key(0), input_hw=(65, 97))

    x = jnp.zeros((2, 65, 97, 3), jnp.float32)
    outputs = model(x)
    assert len(outputs) == 2

    stride = model.base_stride
    fh, fw = (65 - 1) // stride + 1, (97 - 1) // stride + 1
    assert outputs[0].shape == (2, 17, 5, fh, fw)
    assert outputs[1].shape == (2, 19, 9, fh, fw)
    assert outputs[0].dtype == jnp.float32


@pytest.mark.parametrize('basenet_name', [
    'mobilenetv2', 'mobilenetv3large', 'squeezenet', 'effnetv2s',
    'swin_t', 'xcit_small_12', 'botnet', 'shufflenetv2x1', 'hrformer_s'])
def test_backbone_zoo_shapes(basenet_name):
    """Every registered backbone produces stride-16 features of the
    declared width (reference test_nets.py builds each --basenet tiny)."""
    from openpifpaf_tpu.models.base import BASE_FACTORIES

    spec = BASE_FACTORIES[basenet_name]
    module = spec.build(norm='batchnorm', dtype=jnp.float32)
    x = jnp.zeros((1, 49, 49, 3), jnp.float32)
    variables = module.init(jax.random.key(0), x, train=False)
    y = module.apply(variables, x, train=False)
    expect_hw = (49 - 1) // spec.stride + 1
    assert y.shape == (1, expect_hw, expect_hw, spec.out_features)


def test_field_split_activations():
    cif, _ = _coco_metas()
    cif.base_stride = 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 17, 5, 5, 7)), jnp.float32)
    comp = models.split_fields(x, cif)
    assert comp.conf.shape == (2, 17, 5, 7)
    assert comp.vec.shape == (2, 17, 1, 2, 5, 7)
    assert comp.spread.shape == (2, 17, 1, 5, 7)
    assert comp.scale.shape == (2, 17, 1, 5, 7)
    assert float(comp.conf.min()) >= 0.0 and float(comp.conf.max()) <= 1.0
    assert float(comp.spread.min()) > 0.0
    assert float(comp.scale.min()) >= 0.0


def test_checkpoint_roundtrip(tmp_path):
    factory = models.Factory(base_name='shufflenetv2k16', bf16=False)
    metas = _coco_metas()
    model = factory.from_scratch('shufflenetv2k16', metas)
    model.init(jax.random.key(0))

    path = str(tmp_path / 'model.npz')
    models.checkpoint.save(
        path, variables=jax.tree.map(np.asarray, model.variables),
        head_metas=model.head_metas, basenet_name='shufflenetv2k16',
        base_stride=16, epoch=7)

    header, variables = models.checkpoint.load(path)
    assert header['epoch'] == 7
    assert header['basenet'] == 'shufflenetv2k16'
    assert len(header['head_metas']) == 2
    assert header['head_metas'][0].keypoints == constants.COCO_KEYPOINTS

    flat_a = models.checkpoint.flatten_tree(jax.tree.map(np.asarray, model.variables))
    flat_b = models.checkpoint.flatten_tree(variables)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])


def test_channel_shuffle_matches_torch_semantics():
    from openpifpaf_tpu.models.shufflenetv2k import channel_shuffle
    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 1, 1, 8)
    out = channel_shuffle(x, 2)
    # torch: view(g=2, c=4).transpose -> [0, 4, 1, 5, 2, 6, 3, 7]
    np.testing.assert_array_equal(
        np.asarray(out).reshape(-1), [0, 4, 1, 5, 2, 6, 3, 7])


def test_version():
    assert opt.__version__


def test_transfer_learning_to_tracking(tmp_path):
    """--checkpoint with new head metas grafts backbone + same-named heads
    (reference network/factory.py:~180), here single-frame -> tracking."""
    import jax
    import numpy as np
    from openpifpaf_tpu import headmeta, models
    from openpifpaf_tpu.models.tracking_base import TrackingModel
    from openpifpaf_tpu.plugins.coco import constants
    from openpifpaf_tpu.plugins.posetrack.cocokpst import tracking_head_metas

    kwargs = dict(keypoints=constants.COCO_KEYPOINTS,
                  sigmas=constants.COCO_PERSON_SIGMAS,
                  pose=constants.COCO_UPRIGHT_POSE)
    cif = headmeta.Cif('cif', 'toykp',
                       draw_skeleton=constants.COCO_PERSON_SKELETON,
                       score_weights=constants.COCO_PERSON_SCORE_WEIGHTS,
                       **kwargs)
    caf = headmeta.Caf('caf', 'toykp',
                       skeleton=constants.COCO_PERSON_SKELETON, **kwargs)
    factory = models.Factory(base_name='shufflenetv2k16', bf16=False)
    single = factory.from_scratch('shufflenetv2k16', [cif, caf])
    single.init(jax.random.key(0), input_hw=(65, 65))
    ckpt = str(tmp_path / 'single.npz')
    models.checkpoint.save(
        ckpt, variables=jax.tree.map(np.asarray, single.variables),
        head_metas=single.head_metas, basenet_name='shufflenetv2k16',
        base_stride=16)

    tracking_metas = tracking_head_metas(
        'toykpst', keypoints=constants.COCO_KEYPOINTS,
        sigmas=constants.COCO_PERSON_SIGMAS,
        pose=constants.COCO_UPRIGHT_POSE,
        skeleton=constants.COCO_PERSON_SKELETON,
        score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)
    transferred = models.Factory(checkpoint=ckpt, bf16=False).factory(
        head_metas=tracking_metas, rng=jax.random.key(1))

    assert isinstance(transferred, TrackingModel)
    assert transferred.epoch == 0
    # backbone grafted exactly
    old_bb = jax.tree.leaves(single.variables['params']['basenet'])
    new_bb = jax.tree.leaves(transferred.variables['params']['basenet'])
    for a, b in zip(old_bb, new_bb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # cif head grafted across the dataset rename (head_nets_0 = cif)
    old_cif = jax.tree.leaves(single.variables['params']['head_nets_0'])
    new_cif = jax.tree.leaves(transferred.variables['params']['head_nets_0'])
    for a, b in zip(old_cif, new_cif):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # tcaf head (head_nets_2) exists and is freshly initialized
    assert 'head_nets_2' in transferred.variables['params']
