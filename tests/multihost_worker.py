"""Worker for the 2-process jax.distributed CPU test (run via subprocess).

Exercises the real multi-host bring-up path (SURVEY §2.7/§5.8): process
coordination through ``init_distributed``, a hybrid DCN x ICI mesh from
``make_pod_mesh``, global-batch assembly with
``jax.make_array_from_process_local_data``, and a jit'd loss+grad whose
data-axis mean compiles to a cross-process all-reduce. Each process
prints ``RESULT <loss> <grad_norm>``; the harness asserts both processes
agree (the all-reduce actually ran) and match a single-process oracle.
"""

import os
import sys


def main():
    coordinator, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")

    from acmil_tpu.parallel import init_distributed
    from acmil_tpu.parallel.mesh import bag_sharding, make_pod_mesh

    init_distributed(coordinator_address=coordinator, num_processes=n_proc,
                     process_id=pid)
    assert jax.process_count() == n_proc, jax.process_count()

    import jax.flatten_util  # not re-exported by the jax package root
    import jax.numpy as jnp
    import numpy as np

    from acmil_tpu.config import Config
    from acmil_tpu.models import build_mil_model

    mesh = make_pod_mesh(seq=1)
    data_size = mesh.shape["data"]
    local_rows = data_size // n_proc

    conf = Config(n_class=2, D_feat=16, D_inner=8, arch="ga", n_token=2,
                  n_masked_patch=0, mask_drop=0.0)
    model, _ = build_mil_model(conf)

    n = 64
    # per-process shard of the global batch (disjoint rows per process)
    rs = np.random.RandomState(100 + pid)
    feats_l = rs.randn(local_rows, n, conf.D_feat).astype(np.float32)
    mask_l = (rs.rand(local_rows, n) < 0.8)
    label_l = rs.randint(0, 2, local_rows).astype(np.int32)

    sh = bag_sharding(mesh)
    with mesh:
        feats = jax.make_array_from_process_local_data(sh["feats"], feats_l)
        mask = jax.make_array_from_process_local_data(sh["mask"], mask_l)
        label = jax.make_array_from_process_local_data(sh["label"], label_l)

        @jax.jit
        def run(feats, mask, label):
            params = model.init({"params": jax.random.PRNGKey(0)},
                                feats, mask)["params"]

            def loss_fn(p):
                sub, slide, attn = model.apply({"params": p}, feats, mask,
                                               deterministic=True)
                logp = jax.nn.log_softmax(slide, axis=-1)
                ce = -jnp.take_along_axis(logp, label[:, None], 1)[:, 0]
                return ce.mean()     # mean over data axis -> all-reduce

            loss, grads = jax.value_and_grad(loss_fn)(params)
            flat, _ = jax.flatten_util.ravel_pytree(grads)
            return loss, jnp.linalg.norm(flat)

        loss, gn = run(feats, mask, label)
        print(f"RESULT {float(loss):.8f} {float(gn):.8f}", flush=True)


if __name__ == "__main__":
    main()
