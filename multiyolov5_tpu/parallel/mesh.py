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
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for inputs."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place host arrays onto the mesh, batch-dim sharded."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host rendezvous (replaces reference env:// init_process_group,
    train.py:619).  No-op in single-process mode."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
