"""CI gate on scheduling drift at the WholeBody shape (133 kp / 129 edges).

VERDICT r3 #7: the COCO-17 drift evidence does not cover the regime where
growth ordering and budget interactions differ most — deep limb chains
(wrist -> 21 hand joints, nose -> 68 face contour).  This gate runs the
generalized harness (``drift_harness.SceneSpec``) at the wholebody shape;
the full report is ``tools/drift_report.py --spec wholebody`` ->
DRIFT_wholebody.md.  Reference: ``src/openpifpaf/plugins/wholebody/
constants.py`` (the skeleton whose chains stress the decoder).
"""

import pytest

import drift_harness as dh


@pytest.fixture(scope='module')
def harness():
    spec = dh.wholebody_spec()
    # max_poses 256: even clean wholebody scenes produce duplicate seeds
    # along the dense face/hand chains, which occupy parallel pose slots
    # before seed-claim suppression kills them (the documented asymmetry,
    # harness_config docstring) — the slot budget must not bind first.
    config = dh.harness_config(max_poses=256, max_seeds=4096)
    return dh.Harness(config, spec=spec)


def test_spec_shape(harness):
    assert harness.n_keypoints == 133
    assert len(harness.skeleton) == 129


def test_clean_scenes_exact(harness):
    """Clean painted fields: the parallel decode must match the sequential
    oracle exactly (the r3 seed-claim suppression guarantee must hold at
    133 kp too)."""
    results = dh.run_scenes(harness, [(5000, 3), (5001, 6), (5002, 9)])
    agg = dh.aggregate(results)
    assert agg['detection_f1'] == 1.0, agg
    assert agg['mean_oks'] >= 0.999, agg
    assert agg['mean_score_delta'] <= 1e-4, agg


def test_noisy_scene_within_budget(harness):
    """Field noise at the wholebody shape: near-threshold seeds along the
    face/hand chains.  The COCO-default noise magnitudes sever the deep
    contour chains entirely (both decoders agree on zero poses — measured),
    so this gate uses milder noise that keeps the scenes decodable while
    still jittering candidates across thresholds."""
    noise = dh.FieldNoise(conf_logit_sigma=0.35, peak_conf_range=(0.6, 1.0),
                          offset_sigma=0.08, spurious_blobs=60,
                          spurious_caf=60)
    results = dh.run_scenes(harness, [(6000, 4), (6001, 8)], noise=noise)
    agg = dh.aggregate(results)
    assert agg['n_oracle'] > 0, 'degenerate: no poses decoded at all'
    assert agg['detection_f1'] >= 0.95, agg
    assert agg['mean_oks'] >= 0.97, agg
