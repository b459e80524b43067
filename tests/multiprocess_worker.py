"""Worker process for tests/test_multiprocess.py.

Runs ONE real Trainer train step over the global (possibly multi-process)
mesh on a deterministic synthetic batch and saves the resulting params and
loss, so the pytest can assert that a 2-process run produces exactly the
same update as the single-process run (the reference's DDP guarantee,
``src/openpifpaf/train.py:~160``).

Launched with env: ``JAX_PLATFORMS=cpu``, ``PALLAS_AXON_POOL_IPS=''``,
``XLA_FLAGS=--xla_force_host_platform_device_count=N`` and, for the
multi-process variant, ``JAX_COORDINATOR``/``JAX_NUM_PROCESSES``/
``JAX_PROCESS_ID`` (consumed by ``parallel.mesh.initialize_distributed``).
"""

import os
import sys

# run as a script by path: make the repo root importable (PYTHONPATH is
# avoided — it breaks the axon jax plugin discovery, see CLAUDE.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1]

    # must run before anything touches a JAX backend
    from openpifpaf_tpu.parallel import mesh as mesh_mod
    mesh_mod.initialize_distributed()

    import jax
    import numpy as np

    from openpifpaf_tpu.parallel.dryrun import build_tiny_model
    from openpifpaf_tpu.training import OptimizeFactory, Trainer

    model, loss_fn = build_tiny_model()
    model.init(jax.random.key(0), input_hw=(33, 33))

    trainer = Trainer(model, loss_fn, OptimizeFactory(), out_path)
    state = trainer.init_state(steps_per_epoch=4)
    trainer._build_steps()  # pylint: disable=protected-access

    # deterministic GLOBAL batch: every process computes the same arrays
    # and feeds only its local slice through the shared-mesh placement
    global_batch = 4
    h = w = 33
    fh = fw = (h - 1) // 16 + 1
    rng = np.random.default_rng(0)
    images = rng.normal(size=(global_batch, h, w, 3)).astype(np.float32)

    def target_for(meta):
        f, nv, ns = meta.n_fields, meta.n_vectors, meta.n_scales
        return {
            'conf': rng.uniform(0, 1, (global_batch, f, fh, fw))
            .astype(np.float32).round(),
            'conf_mask': np.ones((global_batch, f, fh, fw), bool),
            'vec': rng.normal(size=(global_batch, f, nv, 2, fh, fw))
            .astype(np.float32),
            'vec_mask': np.ones((global_batch, f, nv, fh, fw), bool),
            'scale': np.abs(rng.normal(size=(global_batch, f, ns, fh, fw))
                            ).astype(np.float32),
            'scale_mask': np.ones((global_batch, f, ns, fh, fw), bool),
        }

    targets = [target_for(m) for m in model.head_metas]

    n_proc = jax.process_count()
    assert global_batch % n_proc == 0
    per = global_batch // n_proc
    lo = jax.process_index() * per

    def local_slice(x):
        return x[lo:lo + per]

    images_local = local_slice(images)
    targets_local = jax.tree.map(local_slice, targets)

    # the actual production path: shard over the global mesh, one donated
    # jitted train step (grads averaged across processes by XLA)
    images_p, targets_p = trainer._place(  # pylint: disable=protected-access
        images_local, targets_local)
    state, total, _ = trainer._train_step(  # pylint: disable=protected-access
        state, images_p, targets_p)

    if jax.process_index() == 0:
        def host_value(x):
            if hasattr(x, 'addressable_data'):
                return np.asarray(x.addressable_data(0))
            return np.asarray(x)

        out = {'loss': host_value(total),
               'n_processes': np.int32(n_proc),
               'n_devices': np.int32(jax.device_count())}
        for path, leaf in jax.tree_util.tree_leaves_with_path(state.params):
            out['param' + jax.tree_util.keystr(path)] = host_value(leaf)
        np.savez(out_path, **out)
    print('WORKER_DONE', flush=True)


if __name__ == '__main__':
    main()
