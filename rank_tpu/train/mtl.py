"""Multi-task gradient strategies: PCGrad and GradNorm.

These are the remaining items of the reference's own MTL-trick to-do list
(``README.md:58-61``: Uncertainty / GradNorm / PCGrad); Uncertainty
weighting lives in models/multitask.py. The reference has no code for any
of them.

Both strategies need per-task gradients. We get them with ONE
``jax.jacrev`` over a stacked per-task loss vector — a single forward pass
plus T backward passes, each gradient leaf carrying a leading task axis
(T, *param.shape). Everything downstream is cheap linear algebra:

* **PCGrad** (Yu et al., NeurIPS 2020): every surgery update replaces
  g_i with g_i − c·g_j, i.e. the projected gradients always stay in the
  span of the original task gradients. So instead of mutating the huge
  gradient pytrees per projection we run the whole surgery on the T×T
  Gram matrix of task-gradient dot products, tracking a coefficient
  matrix C with g_i^PC = Σ_k C[i,k]·g_k; the final combined gradient is
  a single length-T weighted sum applied once per leaf. Exactly the
  paper's algorithm (random task order per task, sequential projections
  against the ORIGINAL g_j), at scalar cost.

* **GradNorm** (Chen et al., ICML 2018): learned task weights w with
  Σw = T, driven by L_grad = Σ_i |G_i − Ḡ·r_i^α| where G_i = w_i·n_i and
  n_i = ‖∇_shared L_i‖. Since G_i is linear in w_i, the exact weight
  gradient is sign(G_i − target)·n_i — no second autodiff pass. The
  "shared" parameter subset is every parameter not belonging to a
  task-specific tower/gate (the paper uses the last shared layer; using
  the full shared subtree is a documented variant that avoids pinning
  the rule to one model family). L_i(0) is captured at the first step.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-12


def gram_matrix(stacked_grads) -> jnp.ndarray:
    """(T,T) dot-product matrix over gradient pytrees with a leading
    task axis on every leaf."""

    def leaf_gram(g):
        flat = g.reshape(g.shape[0], -1).astype(jnp.float32)
        return flat @ flat.T

    leaves = jax.tree_util.tree_leaves(stacked_grads)
    return sum(leaf_gram(g) for g in leaves)


def pcgrad_weights(gram: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """Run PCGrad surgery in coefficient space.

    Returns w (T,) such that the combined gradient is Σ_k w[k]·g_k.
    """
    T = gram.shape[0]
    sq = jnp.maximum(jnp.diagonal(gram), _EPS)
    C = jnp.eye(T, dtype=jnp.float32)  # C[i] = coeffs of g_i^PC in g-basis
    for i in range(T):
        # the paper samples a fresh random order of the other tasks for
        # every task i; projections are sequential (the dot product uses
        # the CURRENT g_i^PC, the projection target is the original g_j)
        perm = jax.random.permutation(jax.random.fold_in(rng, i), T)
        for pos in range(T):
            j = perm[pos]
            dot_ij = C[i] @ gram[:, j]
            coef = jnp.where(
                (j != i) & (dot_ij < 0.0), dot_ij / sq[j], 0.0
            )
            C = C.at[i, j].add(-coef)
    return jnp.sum(C, axis=0)  # Σ_i g_i^PC = Σ_k (Σ_i C[i,k]) g_k


def combine_stacked(stacked_grads, weights: jnp.ndarray):
    """Collapse the leading task axis with per-task weights."""
    return jax.tree_util.tree_map(
        lambda g: jnp.tensordot(weights.astype(g.dtype), g, axes=1),
        stacked_grads,
    )


def shared_param_mask(params, is_task_specific: Callable[[Tuple[str, ...]], bool]):
    """Pytree of bools: True where the parameter is SHARED across tasks."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    vals = [
        not is_task_specific(
            tuple(getattr(k, "key", getattr(k, "name", str(k))) for k in path)
        )
        for path, _ in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, vals)


def default_task_specific(path: Tuple[str, ...]) -> bool:
    """MMOE/PLE convention: towers and gates are per-task; everything else
    (embedding tables, experts) is shared."""
    return any(
        str(p).startswith(("tower_", "gate_")) or "task_log_var" in str(p)
        for p in path
    )


def shared_grad_norms(stacked_grads, shared_mask) -> jnp.ndarray:
    """n_i = ‖∇_shared L_i‖ per task, over the masked (shared) leaves."""

    def leaf_sq(g, keep):
        if not keep:
            return 0.0
        flat = g.reshape(g.shape[0], -1).astype(jnp.float32)
        return jnp.sum(flat * flat, axis=1)

    leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(leaf_sq, stacked_grads, shared_mask)
    )
    total = sum(l for l in leaves if not isinstance(l, float))
    return jnp.sqrt(jnp.maximum(total, _EPS))


def gradnorm_init(num_tasks: int) -> Dict[str, jnp.ndarray]:
    return {
        "w": jnp.ones((num_tasks,), jnp.float32),
        "l0": jnp.zeros((num_tasks,), jnp.float32),
        "initialized": jnp.zeros((), jnp.bool_),
    }


def gradnorm_update(
    mtl_state: Dict[str, jnp.ndarray],
    task_losses: jnp.ndarray,
    grad_norms: jnp.ndarray,
    alpha: float,
    lr: float,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One GradNorm step. Returns (weights to combine grads with, new state).

    The combining weights are the CURRENT w (pre-update), matching the
    paper's alternating optimization.
    """
    T = task_losses.shape[0]
    l0 = jnp.where(mtl_state["initialized"], mtl_state["l0"], task_losses)
    w = mtl_state["w"]
    g = w * grad_norms  # G_i = ‖∇ w_i L_i‖ = w_i·n_i (w ⊥ the backward pass)
    r = task_losses / jnp.maximum(l0, _EPS)
    r_inv = r / jnp.maximum(jnp.mean(r), _EPS)
    target = jax.lax.stop_gradient(jnp.mean(g) * r_inv**alpha)
    grad_w = jnp.sign(g - target) * grad_norms  # exact d|G_i − tgt|/dw_i
    w_new = w - lr * grad_w
    w_new = jnp.maximum(w_new, 1e-3)
    w_new = T * w_new / jnp.sum(w_new)  # renormalize: Σ w = T
    new_state = {
        "w": w_new,
        "l0": l0,
        "initialized": jnp.ones((), jnp.bool_),
    }
    return w, new_state
