"""Trained-checkpoint drift: production decode vs sequential oracle on
REAL fields (VERDICT r2 next-round item 2, second half).

The synthetic drift reports (DRIFT.md / DRIFT_noise.md) paint fields;
this tool runs a *trained* checkpoint over the deterministic toykp eval
set, decodes every image with both the production parallel decoder and
the sequential-faithful oracle (shared front-end), and reports per-pose
agreement plus the COCO-protocol AP of each path — the AP delta is the
end-metric cost of parallel scheduling on real trained fields.

Usage (CPU-forced, from the repo root):

    python tools/trained_drift.py --checkpoint /tmp/toykp_r2/model.npz
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))

os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=1')

import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402


def decode_paths(model, fields_i):
    """One image's field list -> (parallel anns, oracle anns).

    Decode modes (``--force-complete`` / ``--dense``) are honored through
    the CifCaf class config exactly as the CLI sets them: the decoder is
    built via ``CifCaf.factory`` so a caf25 dense head concatenates into
    the decode skeleton (``decoder/cifcaf.py:~53``)."""
    import jax.numpy as jnp

    from openpifpaf_tpu.decoder.cifcaf import CifCaf
    from openpifpaf_tpu.ops import growth, pipeline, sequential_oracle

    dec = CifCaf.factory(model.head_metas)[0]
    cif_meta, caf_meta = dec.cif_meta, dec.caf_meta
    cif_f = fields_i[cif_meta.head_index]
    caf_f = dec._caf_field(fields_i, axis=0)
    h, w = cif_f.shape[-2:]
    stride = cif_meta.stride
    image_hw = ((h - 1) * stride + 1, (w - 1) * stride + 1)
    config = dec.config_for(image_hw)
    skeleton = np.asarray(caf_meta.skeleton, np.int32) - 1
    score_weights = np.asarray(
        cif_meta.score_weights or [1.0] * cif_meta.n_fields, np.float32)

    fe = pipeline.decode_front_end(
        jnp.asarray(cif_f), jnp.asarray(caf_f), cif_meta=cif_meta,
        caf_meta=caf_meta, config=config)

    # production (r5 wave-recycled growth, exact claim fixpoint inside)
    edges = growth.directed_edges(skeleton)
    poses, placed, alive, n_dropped_poses, _, _ = growth.grow_waves(
        fe.sds, fe.cands, edges, n_keypoints=cif_meta.n_fields,
        image_hw=config.image_hw, config=config.growth,
        nms_config=config.nms, force_cand=fe.cands_fc)
    p_out, _, p_scores, p_valid = pipeline.finalize_poses(
        poses, placed, alive, fe.scale_px,
        score_weights=score_weights, config=config, seed_f=None)

    # oracle
    o_list = sequential_oracle.decode_sequential(
        fe.sds, fe.cands, skeleton, n_keypoints=cif_meta.n_fields,
        image_hw=config.image_hw, config=config.growth,
        force_cand=fe.cands_fc)
    p_budget = config.growth.max_poses
    o_poses = np.zeros((p_budget, cif_meta.n_fields, 4), np.float32)
    o_placed = np.zeros((p_budget, cif_meta.n_fields), bool)
    o_valid = np.zeros(p_budget, bool)
    for i, pose in enumerate(o_list[:p_budget]):
        o_poses[i] = pose
        o_placed[i] = pose[:, 2] > 0
        o_valid[i] = True
    oo_out, _, oo_scores, oo_valid = pipeline.finalize_poses(
        jnp.asarray(o_poses), jnp.asarray(o_placed), jnp.asarray(o_valid),
        fe.scale_px, score_weights=score_weights, config=config)

    def extract(out, scores, valid):
        out, scores, valid = map(np.asarray, (out, scores, valid))
        res = [(out[i, :, :3], float(scores[i]))
               for i in range(len(valid)) if valid[i]]
        res.sort(key=lambda t: -t[1])
        return res

    counters = {'n_dropped_poses': int(n_dropped_poses),
                'n_dropped_caf': int(np.asarray(fe.n_dropped_caf)),
                'n_dropped_cif': int(np.asarray(fe.n_dropped_cif))}
    return (extract(p_out, p_scores, p_valid),
            extract(oo_out, oo_scores, oo_valid), counters)


def ap_of(per_image, metric_factory, loader_batches, cif_meta):
    from openpifpaf_tpu.annotation import Annotation

    metric = metric_factory()
    idx = 0
    for images, anns_gt, metas in loader_batches:
        for gt, meta in zip(anns_gt, metas):
            anns = []
            for xyv, score in per_image[idx]:
                ann = Annotation(cif_meta.keypoints,
                                 cif_meta.draw_skeleton or [],
                                 sigmas=cif_meta.sigmas,
                                 score_weights=cif_meta.score_weights)
                ann.data[:] = xyv
                ann.joint_scales[:] = 4.0
                ann.fixed_score = score
                anns.append(ann)
            metric.accumulate(anns, meta, ground_truth=gt)
            idx += 1
    stats = metric.stats()
    return dict(zip(stats['text_labels'], stats['stats']))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--checkpoint', required=True)
    parser.add_argument('--dataset', default='toykp',
                        help='eval datamodule (toykp, or toycrowd for the '
                             'overlapping-crowd regime, VERDICT r3 #2)')
    parser.add_argument('--n-images', type=int, default=None,
                        help='override the eval-set size')
    parser.add_argument('--force-complete', action='store_true',
                        help='decode with --force-complete-pose semantics '
                             '(relaxed second growth pass, VERDICT r4 #6)')
    parser.add_argument('--dense', type=float, default=None,
                        help='decode with --dense-connections at this '
                             'confidence scale (requires a caf25 head in '
                             'the checkpoint)')
    parser.add_argument('--instance-threshold', type=float, default=None,
                        help='override CifCaf.instance_threshold (same '
                             'knob as the predict/eval CLI)')
    parser.add_argument('--seed-threshold', type=float, default=None,
                        help='override CifCaf.seed_threshold')
    parser.add_argument('--keypoint-threshold', type=float, default=None,
                        help='override CifCaf.keypoint_threshold')
    args = parser.parse_args()

    from drift_harness import scene_agreement

    from openpifpaf_tpu import datasets, models, plugin
    from openpifpaf_tpu.decoder.cifcaf import CifCaf

    plugin.register()
    if args.force_complete:
        CifCaf.force_complete = True
    if args.dense is not None:
        CifCaf.dense_connections = args.dense
    if args.instance_threshold is not None:
        CifCaf.instance_threshold = args.instance_threshold
    if args.seed_threshold is not None:
        CifCaf.seed_threshold = args.seed_threshold
    if args.keypoint_threshold is not None:
        CifCaf.keypoint_threshold = args.keypoint_threshold
    factory = models.Factory(checkpoint=args.checkpoint, bf16=False)
    model = factory.factory()
    if args.n_images is not None:
        datasets.DATAMODULES[args.dataset].n_val_images = args.n_images
    datamodule = datasets.factory(args.dataset)
    for meta, model_meta in zip(datamodule.head_metas, model.head_metas):
        meta.head_index = model_meta.head_index
        meta.base_stride = model_meta.base_stride
    loader = datamodule.eval_loader()

    forward = jax.jit(lambda v, x: model.apply_fast(v, x))
    par_all, ora_all, per_scene, counter_sums = [], [], [], []
    batches = []
    for images, anns_gt, metas in loader:
        images = np.stack([np.asarray(x) for x in images])
        fields = forward(model.variables, images)
        fields = [np.asarray(f, np.float32) for f in fields]
        batches.append((images, anns_gt, metas))
        for i in range(images.shape[0]):
            parallel, oracle, counters = decode_paths(
                model, [f[i] for f in fields])
            par_all.append(parallel)
            ora_all.append(oracle)
            counter_sums.append(counters)
            per_scene.append(scene_agreement(
                parallel, oracle,
                sigmas=np.asarray(model.head_metas[0].sigmas, np.float32)))

    n_o = sum(m['n_oracle'] for m in per_scene)
    n_p = sum(m['n_parallel'] for m in per_scene)
    n_m = sum(m['n_matched'] for m in per_scene)
    finite = [m['mean_oks'] for m in per_scene if np.isfinite(m['mean_oks'])]

    ap_parallel = ap_of(par_all, lambda: datamodule.metrics()[0], batches,
                        model.head_metas[0])
    ap_oracle = ap_of(ora_all, lambda: datamodule.metrics()[0], batches,
                      model.head_metas[0])

    out = {
        'checkpoint': os.path.basename(args.checkpoint),
        'n_images': len(par_all),
        'poses_parallel': n_p, 'poses_oracle': n_o, 'matched': n_m,
        'detection_f1': round(2 * n_m / max(1, n_o + n_p), 4),
        'mean_oks': round(float(np.mean(finite)), 4) if finite else None,
        'AP_parallel': round(ap_parallel['AP'], 4),
        'AP_oracle': round(ap_oracle['AP'], 4),
        'AP_delta': round(ap_parallel['AP'] - ap_oracle['AP'], 4),
        # production budget-overflow counters at the decode defaults
        'n_dropped_poses': sum(c['n_dropped_poses'] for c in counter_sums),
        'n_dropped_caf': sum(c['n_dropped_caf'] for c in counter_sums),
        'n_dropped_cif': sum(c['n_dropped_cif'] for c in counter_sums),
        'dataset': args.dataset,
        'force_complete': bool(args.force_complete),
        'dense_connections': args.dense,
        'instance_threshold': CifCaf.instance_threshold,
        'seed_threshold': CifCaf.seed_threshold,
        'keypoint_threshold': CifCaf.keypoint_threshold,
    }
    print(json.dumps(out))
    return 0


if __name__ == '__main__':
    sys.exit(main())
