"""Explicit shard_map row-sharded embedding lookup (psum and all-to-all id
exchange) vs a plain gather oracle, forward and backward, including
duplicate ids and the OOV row."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rank_tpu.embedding.sharded import pad_vocab, sharded_lookup
from rank_tpu.parallel.mesh import make_mesh

V, D, B = 96, 8, 32


def _setup(seed=0):
    mesh = make_mesh(table_parallelism=2)  # data=4 x table=2 over 8 cpus
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    ids = np.concatenate(
        [
            rng.integers(0, V, size=B - 4),
            [0, 0, 5, 5],  # OOV row + duplicates
        ]
    ).astype(np.int32)
    return mesh, table, jnp.asarray(ids)


@pytest.mark.parametrize("mode", ["psum", "alltoall"])
def test_forward_matches_gather(mode):
    mesh, table, ids = _setup()
    want = jnp.take(table, ids, axis=0)
    got = sharded_lookup(table, ids, mesh, mode=mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


@pytest.mark.parametrize("mode", ["psum", "alltoall"])
def test_backward_matches_gather(mode):
    mesh, table, ids = _setup(1)
    g_out = jnp.asarray(
        np.random.default_rng(2).normal(size=(B, D)), jnp.float32
    )

    def loss_sharded(t):
        return jnp.sum(sharded_lookup(t, ids, mesh, mode=mode) * g_out)

    def loss_plain(t):
        return jnp.sum(jnp.take(t, ids, axis=0) * g_out)

    gs = jax.grad(loss_sharded)(table)
    gp = jax.grad(loss_plain)(table)
    # duplicate ids must accumulate, not overwrite
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gp), rtol=1e-5, atol=1e-6)


def test_pad_vocab():
    t = jnp.ones((97, 4))
    p = pad_vocab(t, 8)
    assert p.shape == (104, 4)
    np.testing.assert_allclose(np.asarray(p[97:]), 0.0)


def test_indivisible_vocab_raises():
    mesh, table, ids = _setup()
    with pytest.raises(ValueError):
        sharded_lookup(table[:95], ids, mesh)
