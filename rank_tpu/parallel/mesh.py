"""Device mesh + sharding rules.

The reference has zero distributed components (SURVEY.md section 2); this
module is the TPU-native scaling layer mandated by BASELINE.json:

  * mesh axes: ``data`` (batch/data parallel) x ``table`` (embedding-row
    sharding). Dense tower params are replicated; big embedding tables are
    row-sharded over 'table'; per-step batches are sharded over 'data'.
  * GSPMD does collective insertion: params carry logical-axis annotations
    (``nn.with_partitioning`` over the 'table' axis in the embedding
    collection) and jitted steps declare batch/state shardings; XLA inserts
    the gather/all-reduce collectives over ICI.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh``;
per-host data loading uses loader.shard_for_process and
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
TABLE_AXIS = "table"


def make_mesh(
    num_devices: Optional[int] = None, table_parallelism: int = 1
) -> Mesh:
    """A (data x table) mesh over the available devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % table_parallelism:
        raise ValueError(
            f"{n} devices not divisible by table_parallelism={table_parallelism}"
        )
    arr = np.asarray(devices).reshape(n // table_parallelism, table_parallelism)
    return Mesh(arr, (DATA_AXIS, TABLE_AXIS))


