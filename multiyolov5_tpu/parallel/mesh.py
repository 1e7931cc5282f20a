"""Device mesh + sharding rules.

The reference's distributed backend is NCCL DDP (reference train.py:619,
:242-245) with DistributedSampler input sharding and SyncBN.  TPU-native
equivalent: one ``jax.sharding.Mesh`` with a ``data`` axis spanning all chips
(ICI within a slice); the train step is jitted with batch inputs sharded on
``data`` and params replicated.  Gradient averaging is the psum XLA inserts
for the global-batch loss mean; BatchNorm moments are computed over the
global batch inside jit, so SyncBN semantics come out of GSPMD for free
(no wrapper module like reference --sync-bn).

A ``model`` axis is provisioned for completeness (spatial sharding of the
1024x512 activation maps if ever needed at parity scale it is unused — the
reference has no tensor/pipeline parallelism either, SURVEY.md §2.9).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    need = n_data * n_model
    if need < 1 or len(devices) < need:
        raise ValueError(
            f"make_mesh: need {n_data}x{n_model}={need} devices but only "
            f"{len(devices)} visible ({[d.platform for d in devices[:4]]}"
            f"{'...' if len(devices) > 4 else ''}). For a virtual CPU mesh "
            f"set XLA_FLAGS=--xla_force_host_platform_device_count={need} "
            f"JAX_PLATFORMS=cpu before importing jax.")
    dev = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def round_batch_for_devices(bs: int, n_dev: int) -> int:
    """Round a batch size UP to the next multiple of ``n_dev`` so the batch
    axis shards evenly.  The loud alternative to silently dropping to one
    device (reference analog: DDP total_batch_size // world_size check,
    train.py:585-621)."""
    if n_dev <= 1:
        return bs
    return -(-bs // n_dev) * n_dev


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for inputs."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place host arrays onto the mesh, batch-dim sharded.

    Single-process: plain device_put.  Multi-process (multi-host): each
    process passes only its LOCAL shard of the batch (the loader's
    ``shard``/``num_shards`` sharding — the DistributedSampler analog,
    reference utils/datasets.py:76) and the global array is assembled
    without any host ever materializing the full batch."""
    sh = data_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        tree)


def shard_train_batch(mesh: Mesh, args):
    """Place the train-step batch tuple (det_imgs, det_tgts, det_mask,
    seg_imgs, seg_lbls) to match make_train_step's in_shardings: batch dim
    over 'data' everywhere, plus the image/label H axis over 'model' when
    the mesh carries a non-trivial model axis (dp x sp training)."""
    spatial = "model" in mesh.axis_names and mesh.shape["model"] > 1
    if not spatial:
        return shard_batch(mesh, args)
    det_imgs, det_tgts, det_mask, seg_imgs, seg_lbls = args
    img_sh = NamedSharding(mesh, P("data", "model"))
    sh = data_sharding(mesh)
    if jax.process_count() == 1:
        put = jax.device_put
    else:
        def put(x, s):
            return jax.make_array_from_process_local_data(s, np.asarray(x))
    return (put(det_imgs, img_sh), put(det_tgts, sh), put(det_mask, sh),
            put(seg_imgs, img_sh), put(seg_lbls, img_sh))


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree.map(put, tree)


def host_barrier(name: str, timeout_ms: int = 1_800_000) -> None:
    """Coordination-service barrier — host RPC only, no device collectives.

    Use between per-host compile and first execution: XLA:CPU's gloo
    rendezvous gives a process only ~30s to join the first collective, so
    hosts whose compiles skew by more than that would otherwise die with
    'Gloo context initialization failed: GetKeyValue() timed out'.  No-op
    in single-process mode."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed  # no public barrier API yet
    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host rendezvous (replaces reference env:// init_process_group,
    train.py:619).  No-op in single-process mode."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
