"""TCAF tracking decode benchmark (BASELINE config 5, single-chip axis).

Measures the per-frame device cost of the tracking decode hot path —
single-frame CifCaf decode plus the TCAF association step
(``ops/tracking.py``: candidate top-k, (prev x curr) association scores,
greedy id matching) — at the 641px bench shape over 8 vmapped parallel
video streams.  The pose state is carried serially through the scan
chain (frame t's association consumes frame t-1's decoded poses), so
iterations are data-dependent and cannot be memoized by the pool.

Reference contract: the reference associates per-frame poses on the CPU
inside ``src/openpifpaf/decoder/tracking_pose.py:~30``; here the whole
per-frame step is one XLA program.

Run from the repo root on the TPU:  python tools/tracking_bench.py
"""

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

_T0 = time.perf_counter()
B = 8                       # parallel video streams
IMAGE_HW = (641, 641)
N_INNER = 8
N_CALLS = 5


def log(msg):
    print(f'[track +{time.perf_counter() - _T0:7.1f}s] {msg}',
          file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from openpifpaf_tpu import headmeta
    from openpifpaf_tpu.models.heads import split_fields
    from openpifpaf_tpu.ops import pipeline, tracking
    from openpifpaf_tpu.plugins.coco import constants

    cif = headmeta.Cif('cif', 'trackbench',
                       keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)
    caf = headmeta.Caf('caf', 'trackbench',
                       keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       skeleton=constants.COCO_PERSON_SKELETON)
    tcaf = headmeta.Tcaf('tcaf', 'trackbench',
                         keypoints=constants.COCO_KEYPOINTS,
                         sigmas=constants.COCO_PERSON_SIGMAS)
    for m in (cif, caf, tcaf):
        m.base_stride = 16
        m.upsample_stride = 1

    h, w = [(s - 1) // 16 + 1 for s in IMAGE_HW]
    k = len(constants.COCO_KEYPOINTS)
    n_edges = len(constants.COCO_PERSON_SKELETON)

    config = pipeline.CifCafConfig(stride=16, image_hw=IMAGE_HW)
    track_config = tracking.TrackingConfig()

    def decode_one(cf, af):
        return pipeline.decode_cifcaf_single(
            cf, af, cif_meta=cif, caf_meta=caf, config=config)

    def associate_one(tf, prev_xyv, prev_valid, curr_xyv, curr_valid):
        components = split_fields(tf, tcaf)
        cands = tracking.tcaf_candidates(
            components, stride=16, config=track_config)
        scores = tracking.association_scores(
            cands, prev_xyv, prev_valid, curr_xyv, curr_valid, track_config)
        return tracking.greedy_match(scores, track_config.min_match_score)

    def frame_step(cf, af, tf, prev_xyv, prev_valid):
        decoded = decode_one(cf, af)
        curr_valid = decoded.valid.astype(jnp.float32)
        match = associate_one(tf, prev_xyv, prev_valid,
                              decoded.xyv, curr_valid)
        return decoded.xyv, curr_valid, match

    vstep = jax.vmap(frame_step)

    # random dense fields (untrained worst case, like the wholebody bench)
    rng = np.random.default_rng(0)
    cif_f = rng.normal(size=(N_INNER, B, k, 5, h, w)).astype(np.float32)
    caf_f = rng.normal(size=(N_INNER, B, n_edges, 9, h, w)).astype(np.float32)
    tcaf_f = rng.normal(size=(N_INNER, B, k, 9, h, w)).astype(np.float32)
    stacked = jax.device_put((jnp.asarray(cif_f), jnp.asarray(caf_f),
                              jnp.asarray(tcaf_f)))

    max_poses = config.growth.max_poses

    @jax.jit
    def chain(stacked, carry):
        def body(c, x):
            scalar, prev_xyv, prev_valid = c
            cf, af, tf = x
            xyv, valid, match = vstep(cf + scalar * 1e-6, af, tf,
                                      prev_xyv, prev_valid)
            scalar = (scalar * 1.000001
                      + xyv.sum() * 1e-9 + match.sum().astype(jnp.float32))
            return (scalar, xyv, valid), match.sum()

        carry, aux = jax.lax.scan(body, carry, stacked)
        return carry, aux[-1]

    def run_timed(stacked, shape_hint):
        carry = (jnp.zeros((), jnp.float32),
                 jnp.zeros((B, max_poses, shape_hint, 3), jnp.float32),
                 jnp.zeros((B, max_poses), jnp.float32))
        carry, aux = chain(stacked, carry)
        jax.block_until_ready((carry, aux))
        times = []
        for _ in range(N_CALLS):
            start = time.perf_counter()
            carry, aux = chain(stacked, carry)
            s = float(carry[0])
            times.append((time.perf_counter() - start) / N_INNER)
            assert np.isfinite(s)
        return statistics.median(times)

    log('compile + time tracking frame chain (decode + associate)...')
    t = run_timed(stacked, k)

    # noop floor (tunnel RTT amortized over the chain)
    @jax.jit
    def noop_chain(x, c):
        def body(c, xi):
            return c * 1.000001 + xi.sum() * 1e-9, ()
        c, _ = jax.lax.scan(body, c, x)
        return c

    tiny = jax.device_put(jnp.zeros((N_INNER, 4, 4), jnp.float32))
    c = noop_chain(tiny, jnp.zeros((), jnp.float32))
    jax.block_until_ready(c)
    floors = []
    for _ in range(N_CALLS):
        start = time.perf_counter()
        c = noop_chain(tiny, c)
        float(c)
        floors.append((time.perf_counter() - start) / N_INNER)
    t0 = statistics.median(floors)

    # ---- r4: FULL per-frame video hot path ----------------------------
    # fused (pair-plan) backbone on the new frame + heads over the cached
    # (prev, curr) feature pair + decode + TCAF association, all as ONE
    # XLA program per frame across the vmapped streams — the number a
    # video deployment actually sees (reference: per-frame python loop in
    # ``src/openpifpaf/video.py`` + CPU association).
    from openpifpaf_tpu import models
    from openpifpaf_tpu.models import fused_shufflenet
    from openpifpaf_tpu.models.tracking_base import TrackingShell
    from openpifpaf_tpu.plugins.posetrack.cocokpst import tracking_head_metas

    log('building tracking model for the full-frame chain...')
    head_metas = tracking_head_metas(
        'cocokpst', keypoints=constants.COCO_KEYPOINTS,
        sigmas=constants.COCO_PERSON_SIGMAS,
        pose=constants.COCO_UPRIGHT_POSE,
        skeleton=constants.COCO_PERSON_SKELETON,
        score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)
    factory = models.Factory(base_name='tshufflenetv2k16', bf16=True)
    model = factory.from_scratch('tshufflenetv2k16', head_metas)
    model.init(jax.random.key(0), input_hw=(65, 65))
    variables = model.variables
    feat_c = model.module.basenet.stages_out_channels[-1]

    frames_np = rng.normal(size=(N_INNER, B, *IMAGE_HW, 3)).astype(
        np.float32)
    frames = jax.device_put(jnp.asarray(frames_np))

    def frame_decode(cf, af, tf, prev_xyv, prev_valid):
        decoded = decode_one(cf, af)
        curr_valid = decoded.valid.astype(jnp.float32)
        match = associate_one(tf, prev_xyv, prev_valid,
                              decoded.xyv, curr_valid)
        return decoded.xyv, curr_valid, match

    vdecode = jax.vmap(frame_decode)

    @jax.jit
    def full_chain(frames, carry):
        def body(c, frame_b):
            scalar, prev_feats, prev_xyv, prev_valid = c
            frame_b = frame_b + (scalar * 1e-6).astype(frame_b.dtype)
            feats = fused_shufflenet.backbone_features(
                model.module.basenet, variables, frame_b)    # (B, h, w, C)
            pair = jnp.stack([prev_feats, feats], axis=1).reshape(
                2 * B, *feats.shape[1:])
            fields = model.module.apply(
                variables, pair, train=False,
                method=TrackingShell.heads_from_features)
            cf = fields[0].reshape(B, 2, *fields[0].shape[1:])[:, 1]
            af = fields[1].reshape(B, 2, *fields[1].shape[1:])[:, 1]
            tf = fields[2]
            xyv, valid, match = vdecode(cf, af, tf, prev_xyv, prev_valid)
            scalar = (scalar * 1.000001 + xyv.sum().astype(jnp.float32)
                      * 1e-9 + match.sum().astype(jnp.float32))
            return (scalar, feats, xyv, valid), ()

        carry, _ = jax.lax.scan(body, carry, frames)
        return carry

    fh, fw = h, w
    carry = (jnp.zeros((), jnp.float32),
             jnp.zeros((B, fh, fw, feat_c), jnp.bfloat16),
             jnp.zeros((B, max_poses, k, 3), jnp.float32),
             jnp.zeros((B, max_poses), jnp.float32))
    log('compile + time FULL frame chain (backbone+heads+decode+assoc)...')
    carry = full_chain(frames, carry)
    jax.block_until_ready(carry)
    times = []
    for _ in range(N_CALLS):
        start = time.perf_counter()
        carry = full_chain(frames, carry)
        sc = float(carry[0])
        times.append((time.perf_counter() - start) / N_INNER)
        assert np.isfinite(sc)
    t_full = statistics.median(times)

    out = {
        'metric': 'tracking_decode_assoc_ms_per_frame_641px',
        'raw_ms_per_frame': round(t / B * 1e3, 3),
        'floor_ms_per_frame': round(t0 / B * 1e3, 3),
        'ms_per_frame': round((t - t0) / B * 1e3, 3),
        'frames_per_s': round(B / (t - t0), 1),
        'full_frame_raw_ms': round(t_full / B * 1e3, 3),
        'full_frame_ms': round((t_full - t0) / B * 1e3, 3),
        'full_frame_fps_per_stream': round(1e0 / ((t_full - t0) / B), 1),
        'streams': B,
        'budgets': {'max_poses': max_poses,
                    'max_track_candidates': track_config.max_candidates},
    }
    print(json.dumps(out))
    return 0


if __name__ == '__main__':
    sys.exit(main())
