"""Explicit row-sharded embedding lookup via shard_map.

The default training path relies on GSPMD: tables are annotated
P('table', None) and XLA inserts the collectives for ``jnp.take``
(embedding/collection.py). This module is the *explicit* version of that
contract — the RecShard/DreamShard-style pattern named in SURVEY.md
section 5 — for when you want to control the communication schedule:

  * ``mode='psum'`` (default): every table shard gathers the rows it owns
    (masked local gather), then one ``psum`` over the 'table' axis
    combines partial embeddings. Communication: one B x D all-reduce over
    ICI per lookup. Optimal at the WeChat dims (D <= 16, so B x D is tiny)
    and trivially correct for duplicate ids and OOV row 0.
  * ``mode='alltoall'``: the classic id-exchange schedule — ship each id
    to its owner shard, gather locally, ship embeddings back, select by
    owner. Communication: 2 all_to_alls (ids: B ints; embeddings: B x D).
    Wins over psum when the table-axis is large and D is big (payload
    B x D once instead of reduced over every shard).

Both modes differentiate: the backward pass scatter-adds gradients into
the owning shard only (autodiff through the masked gather / all_to_all).

Requires the vocab axis padded to a multiple of the table-axis size
(``pad_vocab``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def pad_vocab(table: jnp.ndarray, num_shards: int) -> jnp.ndarray:
    """Pad rows so the vocab axis divides the table mesh axis."""
    v = table.shape[0]
    vp = ((v + num_shards - 1) // num_shards) * num_shards
    if vp != v:
        table = jnp.pad(table, ((0, vp - v), (0, 0)))
    return table


def sharded_lookup(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    mesh: Mesh,
    table_axis: str = "table",
    data_axis: str = "data",
    mode: str = "psum",
) -> jnp.ndarray:
    """table (V, D) row-sharded over ``table_axis``; ids (B,) sharded over
    ``data_axis``. Returns (B, D) embeddings sharded over ``data_axis``."""
    m = mesh.shape[table_axis]
    if table.shape[0] % m:
        raise ValueError(
            f"vocab {table.shape[0]} not divisible by table axis {m}; "
            "use pad_vocab first"
        )

    def local_psum(table_shard, ids_local):
        rows = table_shard.shape[0]
        offset = jax.lax.axis_index(table_axis) * rows
        local = ids_local - offset
        valid = (local >= 0) & (local < rows)
        gathered = jnp.take(
            table_shard, jnp.clip(local, 0, rows - 1), axis=0
        ) * valid[:, None].astype(table_shard.dtype)
        return jax.lax.psum(gathered, table_axis)

    def local_alltoall(table_shard, ids_local):
        rows = table_shard.shape[0]
        b = ids_local.shape[0]
        # 1) replicate this shard's ids to every owner: (m, B) send buffer
        send_ids = jnp.broadcast_to(ids_local[None, :], (m, b))
        # all_to_all over the table axis: slot j now holds the ids shard j
        # wants us (their owner candidates) to resolve — i.e. every
        # shard's batch ids land on every shard; each resolves only rows
        # it owns.
        recv_ids = jax.lax.all_to_all(
            send_ids, table_axis, split_axis=0, concat_axis=0
        )  # (m, B): row j = ids from table-peer j
        offset = jax.lax.axis_index(table_axis) * rows
        local = recv_ids - offset
        valid = (local >= 0) & (local < rows)
        emb = jnp.take(
            table_shard, jnp.clip(local, 0, rows - 1).reshape(-1), axis=0
        ).reshape(m, b, -1) * valid[..., None].astype(table_shard.dtype)
        # 2) ship resolved embeddings back to the requesting shard
        back = jax.lax.all_to_all(
            emb, table_axis, split_axis=0, concat_axis=0
        )  # (m, B, D): row j = our ids resolved by table-peer j
        # 3) combine: each id was resolved by exactly its owner shard
        return jnp.sum(back, axis=0)

    local = local_psum if mode == "psum" else local_alltoall
    kwargs = {}
    if mode == "alltoall":
        # each table-peer computes the same combined result for its data
        # row, but the replication over 'table' isn't statically
        # inferable through all_to_all — disable the static check.
        kwargs["check_vma"] = False
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(table_axis, None), P(data_axis)),
        out_specs=P(data_axis, None),
        **kwargs,
    )
    return fn(table, ids)
