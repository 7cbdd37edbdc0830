"""Flat-packed-parameter train state: the instruction-count hypothesis,
measured and refuted (round 5 close-out of the BYTES_r05 pointer).

`BYTES_r05.json`'s issue fit found a ~1.4 ms batch-independent floor in
the DCN train step and pointed the next optimisation at "instruction
count and batch size". This script measures the instruction-count half
of that pointer directly: repack EVERY param leaf (tables included) into
ONE raveled f32 vector held in the train state — the loss closes over
`jax.flatten_util.ravel_pytree`'s unravel, so the gradient arrives as a
single flat leaf and the whole Adam update is ~6 fused ops instead of
~6 per leaf, and the per-leaf state plumbing (3 trees x ~25 leaves of
get-tuple-element/tuple/copy) collapses to 4 buffers.

Result (v5e through the tunnel, B=8192, interleaved A/B, median of 5
windows x 30 steps, float() fences; first run recorded in
FLATPARAMS_r05.json):

  entry instructions   619 (tree)  ->  259 (flat)   (-58%)
  step time            1.01x / 1.045x across repeated interleaved runs
                       (<= ~4%, inside the tunnel's window-to-window
                       spread; compare the 2x the hypothesis implied)
  1-step param parity  3e-8 max abs delta

i.e. a 58% instruction-count cut moves the step at most a few % — the compiled
step's instruction COUNT is not the binding resource (small fusions
pipeline; they are not serialized at ~5 us each the way a chain of
dependent tiny dispatched ops is). Combined with the forward/backward
split measured alongside (fwd-only ~2.0 ms of the 2.6 ms step at
B=8192, i.e. most of the single-step wall time is the per-dispatch
floor + forward), the remaining single-step gap closes by batching
(bench batch 65536) and by the staged multi-step dispatch
(`train/staged.py`), not by HLO slimming. The flat layout is therefore
NOT adopted in `train/loop.py` — it would complicate checkpoints,
table sharding (one flat vector cannot carry per-table P('table')
shardings), and interop for a measured 1% — and this script stays as
the evidence.

Usage: python scripts/bench_flat_params.py [--batch 8192]
       [--json_out FLATPARAMS_r05.json]
"""

import argparse
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--json_out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from jax.flatten_util import ravel_pytree

    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import WECHAT_SCHEMA
    from rank_tpu.models import default_config
    from rank_tpu.train import TrainConfig, Trainer

    B = args.batch
    trainer = Trainer(
        WECHAT_SCHEMA, default_config("dcn"),
        TrainConfig(batch_size=B, log_every=0),
    )
    data = make_synthetic_dataset(WECHAT_SCHEMA, num_rows=B, seed=0)
    b = {k: v[:B] for k, v in data.items()}
    b["_valid"] = np.ones((B,), np.float32)
    b = trainer._host_to_device(b)
    state = trainer.init_state(b)
    params, extra = state["params"], state["extra"]
    rng = jax.random.PRNGKey(0)
    lr, b1, b2, eps = 5e-3, 0.9, 0.999, 1e-8

    def n_entry_instrs(compiled):
        hlo = compiled.runtime_executable().hlo_modules()[0].to_string()
        entry = re.search(r"ENTRY [^{]+\{(.*?)\n\}", hlo, re.S).group(1)
        return sum(1 for l in entry.split("\n") if l.strip() and "=" in l)

    # -- A: per-leaf tree state (the production shape, bare) --------------
    tx = optax.adam(lr, b1=b1, b2=b2, eps=eps)

    def step_tree(params, opt, extra, batch, rng):
        rng, sub = jax.random.split(rng)
        (loss, _), grads = jax.value_and_grad(
            trainer.loss_fn, has_aux=True
        )(params, extra, batch, sub, True)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        return params, opt, rng, loss

    c_tree = (
        jax.jit(step_tree, donate_argnums=(0, 1))
        .lower(params, tx.init(params), extra, b, rng).compile()
    )

    # -- B: one flat vector for ALL params (tables included) --------------
    flat0, unravel = ravel_pytree(params)

    def loss_flat(flat, extra, batch, rng, train):
        return trainer.loss_fn(unravel(flat), extra, batch, rng, train)

    def step_flat(flat, mu, nu, cnt, extra, batch, rng):
        rng, sub = jax.random.split(rng)
        (loss, _), g = jax.value_and_grad(loss_flat, has_aux=True)(
            flat, extra, batch, sub, True
        )
        cnt = cnt + 1
        mu = b1 * mu + (1 - b1) * g
        nu = b2 * nu + (1 - b2) * (g * g)
        t = cnt.astype(jnp.float32)
        mh = mu / (1 - b1 ** t)
        nh = nu / (1 - b2 ** t)
        flat = flat - lr * mh / (jnp.sqrt(nh) + eps)
        return flat, mu, nu, cnt, rng, loss

    zeros = jnp.zeros_like(flat0)
    cnt0 = jnp.zeros((), jnp.int32)
    c_flat = (
        jax.jit(step_flat, donate_argnums=(0, 1, 2, 3))
        .lower(flat0, zeros, zeros, cnt0, extra, b, rng).compile()
    )

    instrs = {"tree": n_entry_instrs(c_tree), "flat": n_entry_instrs(c_flat)}

    # 1-step numerical parity
    p2, _, _, l2 = c_tree(
        jax.tree.map(jnp.copy, params), tx.init(params), extra, b, rng
    )
    f2, _, _, _, _, l3 = c_flat(
        jnp.copy(flat0), jnp.zeros_like(flat0), jnp.zeros_like(flat0),
        jnp.zeros((), jnp.int32), extra, b, rng,
    )
    delta = float(jnp.max(jnp.abs(
        unravel(f2)["dnn"]["Dense_0"]["kernel"]
        - p2["dnn"]["Dense_0"]["kernel"]
    )))

    def time_tree():
        p = jax.tree.map(jnp.copy, params)
        o, r = tx.init(p), rng
        for _ in range(3):
            p, o, r, l = c_tree(p, o, extra, b, r)
        float(l)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            p, o, r, l = c_tree(p, o, extra, b, r)
        float(l)
        return (time.perf_counter() - t0) / args.steps

    def time_flat():
        f = jnp.copy(flat0)
        m, n = jnp.zeros_like(f), jnp.zeros_like(f)
        c, r = jnp.zeros((), jnp.int32), rng
        for _ in range(3):
            f, m, n, c, r, l = c_flat(f, m, n, c, extra, b, r)
        float(l)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            f, m, n, c, r, l = c_flat(f, m, n, c, extra, b, r)
        float(l)
        return (time.perf_counter() - t0) / args.steps

    ta, tb = [], []
    for _ in range(args.rounds):  # interleaved: tunnel noise >> effect
        ta.append(time_tree())
        tb.append(time_flat())
    med = lambda xs: sorted(xs)[len(xs) // 2]
    ta_ms, tb_ms = med(ta) * 1e3, med(tb) * 1e3

    out = {
        "protocol": (
            f"DCN bare train step (loss+grad+adam, no meters), B={B}, "
            f"interleaved A/B x{args.rounds} windows x{args.steps} steps, "
            "median, float() fences"
        ),
        "entry_instructions": instrs,
        "instr_reduction_pct": round(
            100 * (1 - instrs["flat"] / instrs["tree"]), 1
        ),
        "one_step_max_param_delta": delta,
        "step_ms": {"tree": round(ta_ms, 3), "flat": round(tb_ms, 3)},
        "speedup_flat_over_tree": round(ta_ms / tb_ms, 3),
        "verdict": (
            "REFUTED as a structural lever: -58% entry instructions "
            "moves the step 1.0-1.05x across interleaved runs (inside "
            "window noise, vs the ~2x the issue-count hypothesis "
            "implied) - instruction count is not the binding resource; "
            "the single-step gap is the per-dispatch floor, amortised "
            "by batch (bench DCN B=65536) and staged multi-step dispatch"
        ),
    }
    print(json.dumps(out, indent=2))
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
