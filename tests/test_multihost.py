"""Multi-host data parallelism: 2 processes x 4 virtual CPU devices
(round-1 verdict item 7).  Reference analog: DDP world_size=2
(train.py:585-621) + DistributedSampler input sharding
(utils/datasets.py:76)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_train_step():
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "_multihost_worker.py"),
         str(pid), port],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid {pid} failed:\n{out[-4000:]}"
    losses = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert line, out[-2000:]
        losses.append(float(line[0].split("loss=")[1]))
    # both controllers must observe the SAME global loss (psum over the
    # global batch, not per-host means)
    assert abs(losses[0] - losses[1]) < 1e-5, losses


def test_loader_sharding_equal_steps():
    """Per-shard plans: disjoint, equal step counts (collective lockstep)."""
    from multiyolov5_tpu.data.detection import DetectionLoader

    class FakeDS:
        rect = False

        def __len__(self):
            return 17  # odd on purpose

    plans = []
    for shard in range(2):
        ld = DetectionLoader(FakeDS(), batch_size=4, shuffle=False,
                             shard=shard, num_shards=2)
        plans.append(ld._plan())
    assert len(plans[0]) == len(plans[1]) == 2  # (17//2)//4 each
    flat = [i for plan in plans for b in plan for i in b]
    assert len(flat) == len(set(flat))  # disjoint


def test_seg_loader_sharding_equal_steps():
    from multiyolov5_tpu.data.segmentation import SegLoader

    class FakeDS:
        def __len__(self):
            return 21

    plans = []
    for shard in range(2):
        ld = SegLoader(FakeDS(), batch_size=4, shuffle=False,
                       shard=shard, num_shards=2)
        plans.append(ld._plan())
    assert len(plans[0]) == len(plans[1])
    flat = [i for plan in plans for b in plan for i in b]
    assert len(flat) == len(set(flat))
