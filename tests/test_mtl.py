"""PCGrad / GradNorm multi-task strategies (train/mtl.py) — the
reference's MTL-trick to-do list (README.md:58-61).

Unit level: the coefficient-space PCGrad surgery must match an explicit
NumPy implementation of Yu et al. 2020; GradNorm's weight update must
move weights in the paper's direction and keep Sum(w) = T.
End-to-end: MMOE trains under both modes on the synthetic set.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rank_tpu.data.loader import ArrayLoader, split_train_test
from rank_tpu.data.synthetic import make_synthetic_dataset
from rank_tpu.features import tiny_schema
from rank_tpu.models import default_config
from rank_tpu.train import TrainConfig, Trainer
from rank_tpu.train import mtl


def _stack_pytree(vecs):
    """Fake per-task grads: one pytree with two leaves split from (T, P)."""
    v = np.asarray(vecs, np.float32)
    return {
        "a": jnp.asarray(v[:, : v.shape[1] // 2]),
        "b": jnp.asarray(v[:, v.shape[1] // 2 :]).reshape(v.shape[0], -1, 2),
    }


class TestGram:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        v = rng.normal(size=(3, 8)).astype(np.float32)
        gram = np.asarray(mtl.gram_matrix(_stack_pytree(v)))
        np.testing.assert_allclose(gram, v @ v.T, rtol=1e-5)


class TestPCGrad:
    def test_no_conflict_is_identity(self):
        # all pairwise dots >= 0 -> no projection -> plain sum of grads
        v = np.array([[1.0, 0.0, 0.0], [1.0, 1.0, 0.0], [0.5, 0.2, 1.0]], np.float32)
        gram = jnp.asarray(v @ v.T)
        w = np.asarray(mtl.pcgrad_weights(gram, jax.random.PRNGKey(0)))
        np.testing.assert_allclose(w, np.ones(3), atol=1e-6)

    def test_two_task_conflict_matches_numpy(self):
        # T=2: order doesn't matter, result is exact:
        # g1' = g1 - (g1.g2)/|g2|^2 g2 ; g2' = g2 - (g1.g2)/|g1|^2 g1
        rng = np.random.default_rng(1)
        g1 = rng.normal(size=8).astype(np.float32)
        g2 = (-g1 + 0.3 * rng.normal(size=8)).astype(np.float32)  # conflicting
        assert g1 @ g2 < 0
        v = np.stack([g1, g2])
        stacked = _stack_pytree(v)
        gram = mtl.gram_matrix(stacked)
        w = mtl.pcgrad_weights(gram, jax.random.PRNGKey(0))
        # combined leaves, flattened back in the split order
        got = np.concatenate(
            [
                np.asarray(l).ravel()
                for l in jax.tree_util.tree_leaves(
                    mtl.combine_stacked(stacked, w)
                )
            ]
        )
        d = g1 @ g2
        want = (g1 - d / (g2 @ g2) * g2) + (g2 - d / (g1 @ g1) * g1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    def test_three_task_matches_numpy_surgery(self):
        """Replay the exact per-task permutations and check against an
        explicit sequential NumPy surgery."""
        rng = np.random.default_rng(2)
        v = rng.normal(size=(3, 10)).astype(np.float32)
        v[1] = -v[0] + 0.1 * rng.normal(size=10)  # force conflicts
        key = jax.random.PRNGKey(7)
        gram = jnp.asarray(v @ v.T)
        w = np.asarray(mtl.pcgrad_weights(gram, key))
        got = w @ v

        want = np.zeros(10, np.float32)
        for i in range(3):
            perm = np.asarray(jax.random.permutation(jax.random.fold_in(key, i), 3))
            gi = v[i].copy()
            for j in perm:
                if j == i:
                    continue
                d = gi @ v[j]
                if d < 0:
                    gi = gi - d / (v[j] @ v[j]) * v[j]
            want += gi
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestGradNorm:
    def test_weights_renormalized_and_directional(self):
        st = mtl.gradnorm_init(2)
        losses = jnp.array([1.0, 1.0])
        norms = jnp.array([10.0, 1.0])  # task 0 dominates the shared layer
        w_used, st2 = mtl.gradnorm_update(st, losses, norms, alpha=1.5, lr=0.05)
        np.testing.assert_allclose(np.asarray(w_used), [1.0, 1.0])  # pre-update
        w = np.asarray(st2["w"])
        assert w.sum() == pytest.approx(2.0, rel=1e-5)
        assert w[0] < w[1], w  # high-norm task down-weighted toward balance

    def test_initial_losses_captured_once(self):
        st = mtl.gradnorm_init(2)
        _, st2 = mtl.gradnorm_update(
            st, jnp.array([2.0, 4.0]), jnp.ones(2), 1.5, 0.0
        )
        np.testing.assert_allclose(np.asarray(st2["l0"]), [2.0, 4.0])
        _, st3 = mtl.gradnorm_update(
            st2, jnp.array([9.0, 9.0]), jnp.ones(2), 1.5, 0.0
        )
        np.testing.assert_allclose(np.asarray(st3["l0"]), [2.0, 4.0])


class TestSharedMask:
    def test_towers_and_gates_excluded(self):
        params = {
            "tables": {"emb": np.zeros((4, 2))},
            "expert_0": {"Dense_0": {"kernel": np.zeros((2, 2))}},
            "tower_like": {"Dense_0": {"kernel": np.zeros((2, 2))}},
            "gate_like": {"kernel": np.zeros((2, 2))},
        }
        mask = mtl.shared_param_mask(params, mtl.default_task_specific)
        assert mask["tables"]["emb"] is True
        assert mask["expert_0"]["Dense_0"]["kernel"] is True
        assert mask["tower_like"]["Dense_0"]["kernel"] is False
        assert mask["gate_like"]["kernel"] is False


# -- end-to-end ------------------------------------------------------------

SCHEMA = tiny_schema(vocab=128, hist_len=8)
DATA = make_synthetic_dataset(SCHEMA, num_rows=4096, seed=3)
TRAIN, TEST = split_train_test(DATA, test_fraction=0.25)


def _run_mmoe(task_weighting, epochs=3):
    cfg = default_config("mmoe").replace(
        hidden_units=(32, 16), embedding_dim=8, expert_units=(16,),
        tower_units=(8,), task_weighting=task_weighting,
    )
    trainer = Trainer(
        SCHEMA, cfg, TrainConfig(batch_size=512, learning_rate=0.005, log_every=0)
    )
    state = trainer.init_state(next(iter(ArrayLoader(TRAIN, 512))))
    for epoch in range(1, epochs + 1):
        loader = ArrayLoader(TRAIN, 512, shuffle=True, seed=epoch)
        state, _ = trainer.train_epoch(state, loader, epoch)
    stats = trainer.evaluate(state, ArrayLoader(TEST, 512, drop_remainder=False))
    return trainer, state, stats


def test_mmoe_pcgrad_trains():
    _, state, stats = _run_mmoe("pcgrad")
    assert np.isfinite(stats["loss"])
    assert stats["task_aucs"]["like"] > 0.6, stats["task_aucs"]
    assert "mtl" not in state  # pcgrad is stateless


def test_mmoe_gradnorm_trains():
    _, state, stats = _run_mmoe("gradnorm")
    assert np.isfinite(stats["loss"])
    assert stats["task_aucs"]["like"] > 0.6, stats["task_aucs"]
    w = np.asarray(state["mtl"]["w"])
    assert w.sum() == pytest.approx(len(w), rel=1e-4)
    assert not np.allclose(w, 1.0)  # weights actually adapted


def test_esmm_rejects_gradient_strategies():
    cfg = default_config("esmm").replace(task_weighting="pcgrad")
    with pytest.raises(ValueError):
        Trainer(SCHEMA, cfg, TrainConfig(log_every=0))
