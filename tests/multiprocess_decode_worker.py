"""Worker for the 2-process DECODE parity test (VERDICT r3 #8).

Each process paints the same deterministic global batch of crowd scenes,
feeds its local slice through the shared-mesh batched decoder
(``ops.make_batch_decoder`` sharded over the global ``data`` axis), and
saves its addressable shard of the decoded poses tagged with global batch
indices.  The pytest asserts that the concatenation across processes
bit-matches the single-process decode of the same batch — the decode
analog of the train-step DDP bit-parity guarantee
(reference: ``src/openpifpaf/train.py:~160``).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out_path = sys.argv[1]

    from openpifpaf_tpu.parallel import mesh as mesh_mod
    mesh_mod.initialize_distributed()

    import jax
    import numpy as np

    from openpifpaf_tpu import ops
    from drift_harness import COCO_SPEC, build_fields, metas_for, random_scene

    cif_meta, caf_meta = metas_for(COCO_SPEC)
    grid = 21
    stride = 16
    image_hw = ((grid - 1) * stride + 1,) * 2
    config = ops.CifCafConfig(stride=stride, image_hw=image_hw)
    decode = ops.make_batch_decoder(cif_meta=cif_meta, caf_meta=caf_meta,
                                    config=config)

    # deterministic global batch of crowd scenes (every process computes
    # the same arrays)
    import dataclasses
    global_batch = 4
    spec = dataclasses.replace(COCO_SPEC, image_hw=image_hw,
                               grid_hw=(grid, grid))
    cifs, cafs = [], []
    for i in range(global_batch):
        rng = np.random.default_rng(100 + i)
        scene = random_scene(rng, 4, spec=spec)
        cif, caf = build_fields(scene, h=grid, w=grid, spec=spec)
        cifs.append(cif)
        cafs.append(caf)
    cif_b = np.stack(cifs)
    caf_b = np.stack(cafs)

    n_proc = jax.process_count()
    per = global_batch // n_proc
    lo = jax.process_index() * per

    mesh = mesh_mod.data_mesh()
    cif_p, caf_p = mesh_mod.shard_batch(
        mesh, (cif_b[lo:lo + per], caf_b[lo:lo + per]))
    decoded = decode(cif_p, caf_p)
    jax.block_until_ready(decoded)

    # every process saves its addressable shards with global indices
    out = {'n_processes': np.int32(n_proc),
           'n_devices': np.int32(jax.device_count())}
    xyv = decoded.xyv            # (B, P, K, 3) global array
    scores = decoded.scores
    valid = decoded.valid
    for arr, name in ((xyv, 'xyv'), (scores, 'scores'), (valid, 'valid')):
        for shard in arr.addressable_shards:
            b0 = shard.index[0].start or 0
            out[f'{name}_b{b0:03d}'] = np.asarray(shard.data)
    np.savez(f'{out_path}.rank{jax.process_index()}.npz', **out)
    print('WORKER_DONE', flush=True)


if __name__ == '__main__':
    main()
