"""Generate the golden end-to-end regression fixture (VERDICT r2 #7).

Runs a trained checkpoint on the deterministic toykp eval images and
commits (a) the raw CIF/CAF field tensors for the first eval batch and
(b) the decoded poses, so decode-semantics regressions are caught by
``tests/test_golden.py`` without retraining — mirroring the reference's
golden-output pattern (``tests/test_predict.py:~20``).

Usage (CPU-forced, from the repo root):

    python tools/make_golden_fixture.py --checkpoint /tmp/toykp_r2/model.npz
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=1')

import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--checkpoint', required=True)
    parser.add_argument('--out-dir', default=os.path.join(
        REPO, 'tests', 'fixtures'))
    parser.add_argument('--n-images', type=int, default=4)
    args = parser.parse_args()

    from openpifpaf_tpu import datasets, decoder as decoder_mod, models
    from openpifpaf_tpu import plugin

    plugin.register()
    factory = models.Factory(checkpoint=args.checkpoint, bf16=False)
    model = factory.factory()
    datamodule = datasets.factory('toykp')
    # loaders must be created after the model (head_index/base_stride)
    for meta, model_meta in zip(datamodule.head_metas, model.head_metas):
        meta.head_index = model_meta.head_index
        meta.base_stride = model_meta.base_stride
    loader = datamodule.eval_loader()

    dec = decoder_mod.factory(model.head_metas)
    forward = jax.jit(lambda v, x: model.apply_fast(v, x))

    batch = next(iter(loader))
    images = np.stack([np.asarray(x) for x in batch[0][:args.n_images]])
    fields = forward(model.variables, images)
    cif_f = np.asarray(fields[0], np.float32)
    caf_f = np.asarray(fields[1], np.float32)

    poses = []
    for i in range(args.n_images):
        anns = dec([cif_f[i], caf_f[i]])
        poses.append([{
            'xyv': a.data.round(3).tolist(),
            'joint_scales': a.joint_scales.round(3).tolist(),
            'score': round(float(a.score), 5),
        } for a in anns])

    os.makedirs(args.out_dir, exist_ok=True)
    np.savez_compressed(
        os.path.join(args.out_dir, 'golden_toykp_fields.npz'),
        cif=cif_f, caf=caf_f)
    meta = {
        'checkpoint': os.path.basename(args.checkpoint),
        'note': 'fields from the trained toykp sn2k16 checkpoint '
                '(r2 recipe, eval AP 0.9893 with the r3 decode stack) on '
                'the deterministic toykp eval images (seed 1000); poses '
                'decoded with production CifCaf defaults on CPU',
        'n_images': args.n_images,
        'poses': poses,
    }
    with open(os.path.join(args.out_dir, 'golden_toykp_poses.json'),
              'w') as f:
        json.dump(meta, f, indent=1)
    print('fixture written:', args.out_dir,
          'sizes:', [len(p) for p in poses])
    return 0


if __name__ == '__main__':
    sys.exit(main())
