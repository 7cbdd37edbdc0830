"""Pallas kernels vs jnp reference, in interpret mode on the CPU mesh
(SURVEY.md section 4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rank_tpu.ops.pallas import din_attention as pk


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pk, "_INTERPRET", True)


def _setup(b=12, t=10, d=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
    lengths = jnp.asarray(rng.integers(0, t + 1, size=b), jnp.int32)
    params = (
        jnp.asarray(rng.normal(size=(4 * d, 64)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(64,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(64, 32)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(32,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(32, 1)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(1,)) * 0.1, jnp.float32),
    )
    return q, k, lengths, params


@pytest.mark.parametrize("use_softmax", [False, True])
def test_din_kernel_matches_reference(use_softmax):
    q, k, lengths, params = _setup()
    want = pk._reference(q, k, lengths, params, use_softmax)
    got = pk.din_attention_fused(q, k, lengths, params, use_softmax)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_din_kernel_nonaligned_batch():
    q, k, lengths, params = _setup(b=7, t=50)
    want = pk._reference(q, k, lengths, params, True)
    got = pk.din_attention_fused(q, k, lengths, params, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_din_kernel_gradients_match():
    q, k, lengths, params = _setup(b=8, t=12)

    def loss_k(q, k, p):
        return jnp.sum(pk.din_attention_fused(q, k, lengths, p, True) ** 2)

    def loss_r(q, k, p):
        return jnp.sum(pk._reference(q, k, lengths, p, True) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, params)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, params)
    for a, b in zip(jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_module_backends_agree():
    """DINAttention(backend='pallas') == backend='jnp' with shared params."""
    from rank_tpu import ops

    q, k, lengths, _ = _setup(b=8, t=10)
    att_jnp = ops.DINAttention(use_softmax=True, backend="jnp")
    v = att_jnp.init(jax.random.PRNGKey(0), q, k, lengths)
    out_jnp = att_jnp.apply(v, q, k, lengths)
    att_pallas = ops.DINAttention(use_softmax=True, backend="pallas")
    out_pallas = att_pallas.apply(v, q, k, lengths)
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_jnp), rtol=1e-5, atol=1e-5
    )


# ---------------------------------------------------------------- CIN kernel

from rank_tpu.ops.pallas import cin as ck


@pytest.fixture(autouse=True)
def cin_interpret_mode(monkeypatch):
    monkeypatch.setattr(ck, "_INTERPRET", True)


def _cin_setup(b=16, h=12, f=7, d=16, o=10, seed=0):
    rng = np.random.default_rng(seed)
    xk = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)
    x0 = jnp.asarray(rng.normal(size=(b, f, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(o, h, f)) * 0.1, jnp.float32)
    return xk, x0, w


def test_cin_kernel_matches_reference():
    xk, x0, w = _cin_setup()
    want = ck._reference(xk, x0, w)
    got = ck.cin_layer_fused(xk, x0, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_cin_kernel_transposed_layout():
    xk, x0, w = _cin_setup(b=8, h=10, o=6)
    want = ck._reference_t(xk.transpose(0, 2, 1), x0.transpose(0, 2, 1), w)
    got = ck.cin_layer_fused_t(xk.transpose(0, 2, 1), x0.transpose(0, 2, 1), w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_cin_kernel_nonaligned_batch():
    xk, x0, w = _cin_setup(b=7, h=9, o=5)
    want = ck._reference(xk, x0, w)
    got = ck.cin_layer_fused(xk, x0, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_cin_kernel_gradients_match():
    xk, x0, w = _cin_setup(b=8, h=6, o=4)

    def loss_k(xk, x0, w):
        return jnp.sum(ck.cin_layer_fused(xk, x0, w) ** 2)

    def loss_r(xk, x0, w):
        return jnp.sum(ck._reference(xk, x0, w) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(xk, x0, w)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(xk, x0, w)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_cin_module_backends_agree():
    """CIN(backend='pallas') == backend='jnp' with shared params."""
    from rank_tpu import ops

    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.normal(size=(8, 7, 16)), jnp.float32)
    m_jnp = ops.CIN(layer_sizes=(8, 8), backend="jnp")
    v = m_jnp.init(jax.random.PRNGKey(0), x0)
    out_jnp = m_jnp.apply(v, x0)
    m_pallas = ops.CIN(layer_sizes=(8, 8), backend="pallas")
    out_pallas = m_pallas.apply(v, x0)
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_jnp), rtol=1e-5, atol=1e-5
    )
