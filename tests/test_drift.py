"""CI gate on parallel-vs-oracle scheduling drift at crowd density.

The full 500-scene report is ``tools/drift_report.py`` -> DRIFT.md; this
gate runs a fixed 24-scene subset spanning the density range so a
regression in growth scheduling, seed dedup, or NMS ``dedup_fraction``
fails CI.  Thresholds are set just below the measured round-2 values
(DRIFT.md): detection F1 0.997, mean OKS 0.9996, score delta 0.0008.
"""

import numpy as np
import pytest

import drift_harness as dh


@pytest.fixture(scope='module')
def harness():
    return dh.Harness()


DENSITIES = [5, 9, 14, 19, 24, 29, 34, 39, 44, 49, 54, 60]
JOBS = [(1000 + i, n) for i, n in enumerate(DENSITIES)] \
    + [(2000 + i, n) for i, n in enumerate(DENSITIES)]


def test_crowd_drift_within_budget(harness):
    results = dh.run_scenes(harness, JOBS)
    agg = dh.aggregate(results)
    # 0.5 AP is the whole error budget (BASELINE.md north star); the
    # scheduling deviation must stay a small fraction of it.
    assert agg['detection_f1'] >= 0.98, agg
    assert agg['mean_oks'] >= 0.99, agg
    assert agg['mean_score_delta'] <= 0.01, agg
    assert agg['mean_joint_agreement'] >= 0.98, agg


def test_densest_scene_not_degenerate(harness):
    """At 60-pose density both decoders must still produce a crowd."""
    results = dh.run_scenes(harness, [(3000, 60)])
    r = results[0]
    assert r['n_oracle'] >= 20
    assert r['n_parallel'] >= 20
    assert r['f1'] >= 0.95, r


def test_noisy_field_drift_within_budget(harness):
    """Field-level realism noise: confidence jitter, offset/scale noise,
    spurious blobs, near-threshold seeds (VERDICT r2 weak #2).  Scheduling
    drift must stay within budget in the noisy-candidate regime too."""
    noisy_jobs = [(4000 + i, n) for i, n in enumerate(DENSITIES)]
    results = dh.run_scenes(harness, noisy_jobs, noise=dh.FieldNoise())
    agg = dh.aggregate(results)
    assert agg['detection_f1'] >= 0.97, agg
    assert agg['mean_oks'] >= 0.98, agg
    assert agg['mean_score_delta'] <= 0.02, agg
    assert agg['mean_joint_agreement'] >= 0.97, agg
