"""Device mesh + sharding layout.

TPU-native replacement for the reference's NCCL DDP runtime (SURVEY.md §2.5;
InvPT/main.py:27-29,89): a 1-D ``data`` mesh over ICI carries the batch;
parameters are replicated. Gradients are averaged implicitly by GSPMD when
the loss is a mean over the sharded batch axis — no explicit all-reduce, no
DDP wrapper. BatchNorm statistics computed under jit over the sharded batch
are global (SyncBatchNorm for free).

Multi-host (DCN) attaches via jax.distributed.initialize();
`data_shard_info()` gives each process its shard of the global batch,
mirroring DistributedSampler(drop_last=True).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_shard_info():
    """(num_shards, shard_index) for per-host data loading."""
    return jax.process_count(), jax.process_index()
