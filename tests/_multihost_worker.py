"""Worker for the 2-process multi-host test (run via subprocess).

Each process owns 4 virtual CPU devices; the two rendezvous over a local
TCP coordinator (reference env:// init_process_group, train.py:619), build
one 8-device global mesh, and run ONE sharded dual-task train step where
each host contributes only its local half of the global batch.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(pid: int, port: str) -> None:
    import numpy as np
    import jax.numpy as jnp

    from multiyolov5_tpu.parallel.mesh import (host_barrier,
                                               initialize_distributed,
                                               make_mesh, replicate,
                                               shard_batch)

    initialize_distributed(f"127.0.0.1:{port}", num_processes=2,
                           process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == 8

    from multiyolov5_tpu.models.config import load_spec
    from multiyolov5_tpu.train.losses import pad_targets
    from multiyolov5_tpu.train.trainer import (TrainConfig,
                                               create_train_state,
                                               make_train_step)

    hyp = {"box": 0.05, "cls": 0.5, "cls_pw": 1.0, "obj": 1.0, "obj_pw": 1.0,
           "anchor_t": 4.0, "fl_gamma": 0.0, "label_smoothing": 0.1,
           "weight_decay": 0.0005}
    mesh = make_mesh(8)
    spec = load_spec("yolov5s_city_seg")
    B_global, B_local = 8, 4
    cfg = TrainConfig(hyp=hyp, batch_size=B_global, seg_batch_size=B_global,
                      compute_dtype=jnp.float32, max_targets=8)
    ts, groups = create_train_state(spec, cfg, seed=0)
    step = make_train_step(spec, cfg, groups, mesh=mesh, donate=False)

    # every host seeds identically, then slices ITS half of the global
    # batch — the loader shard/num_shards contract
    rng = np.random.RandomState(0)
    imgs = (rng.rand(B_global, 64, 64, 3) * 255).astype(np.uint8)
    labels = []
    for _ in range(B_global):
        l = np.zeros((2, 5), np.float32)
        l[:, 0] = rng.randint(0, spec.nc, 2)
        l[:, 1:3] = rng.rand(2, 2) * 0.6 + 0.2
        l[:, 3:5] = rng.rand(2, 2) * 0.2 + 0.1
        labels.append(l)
    tgts, mask = pad_targets(labels, cfg.max_targets)
    seg_imgs = rng.rand(B_global, 64, 64, 3).astype(np.float32)
    seg_lbls = rng.randint(-1, spec.n_segcls, (B_global, 64, 64))

    lo, hi = pid * B_local, (pid + 1) * B_local
    local = tuple(a[lo:hi] for a in (imgs, tgts, mask, seg_imgs, seg_lbls))

    ts = replicate(mesh, ts)
    args = shard_batch(mesh, local)
    scal = replicate(mesh, (jax.random.PRNGKey(0), jnp.float32(0.01),
                            jnp.float32(0.01), jnp.float32(0.9),
                            jnp.asarray(True)))
    # compile on every host FIRST, then rendezvous: execution may only be
    # ~30s skewed across hosts (gloo first-collective timeout), but CPU
    # compiles of the full step can skew by minutes
    step.lower(ts, *args, *scal).compile()
    host_barrier("step_compiled")
    ts, metrics = step(ts, *args, *scal)
    total = float(metrics["total"])
    assert np.isfinite(total), total
    print(f"RESULT pid={pid} loss={total:.6f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2])
