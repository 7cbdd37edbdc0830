"""Quality parity check: rank_tpu vs PyTorch on the SAME synthetic data.

The real competition CSVs are not distributed, so reference-AUC parity
cannot be measured directly this round; this script verifies the next
best thing — that our TPU training pipeline reaches the same quality as a
faithful PyTorch implementation of the reference architecture given
identical data, arch, optimizer (Adam lr 0.005), batch size and epochs.

Covers these model families (torch mirrors in bench.py):
  * dcn — the dense+categorical tower path (reference dcn.py:114-180,
    with registered cross weights — the fair comparison);
  * bst — the behaviour-sequence transformer path (reference
    bst.py:162-247 in the paper form rank_tpu uses: target appended as
    last position; exercises seq embedding, masking, attention);
  * din — the Dice/target-attention path (reference din.py:225-323 with
    a registered attention MLP — the fair fixed form; exercises Dice BN
    semantics, masked attention, act->BN tower ordering);
  * dien — the double-RNN path (reference dien.py:166-353 +
    custom_grucell.py:94-167): GRU -> bilinear attention -> AUGRU;
    exercises the lax.scan recurrences and masked final-state semantics;
  * deepcrossing — the residual-stack path (reference
    deepcrossing.py:106-163 with registered units — the fair form);
  * afm — the attention-pooled pairwise-interaction path (reference
    afm.py:64-119);
  * xdeepfm — the CIN path (README-only; Lian et al. 2018), exercising
    the compressed-interaction einsums and split-half semantics;
  * mmoe — the multi-task path (README-only in the reference): shared
    experts, per-task gates/towers, 3-task BCE; compares per-task AUCs;
  * ple — the progressive-layered-extraction multi-task path (README-only;
    Tang et al. 2020): CGC levels, task-specific + shared experts;
  * deepfm — the minimum end-to-end slice (SURVEY §7; reference
    deepfm.py:73-151): categorical-only features, dual dim-1/dim-16
    tables, FM1+FM2+deep with learned 3->1 fusion;
  * fwfm (fwfm.py:87-139), ffm / pnn / widedeep / fibinet (README-only,
    from the cited papers), autoint / flen (reference to-do items), and
    esmm (probability-product CTCVR head, BCE on probs) — round-2
    additions completing head-to-head coverage of the full 18-model zoo.

Usage: python scripts/parity_check.py [--model dcn|bst|...] [--rows 200000]
       [--epochs 3]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEQ = "his_read_comment_7d_seq"

MODELS = (
    "dcn", "bst", "din", "dien", "deepcrossing", "afm", "xdeepfm",
    "mmoe", "ple", "deepfm",
    "fwfm", "ffm", "pnn", "widedeep", "fibinet", "autoint", "flen", "esmm",
)
MULTI_TASK = ("mmoe", "ple")
# models whose rank_tpu side must use the scalar tag lookup so the torch
# mirror (which looks tags up as one id, like the reference) is
# apples-to-apples — every tower model with a torch mirror (dcn/bst were
# missing until round 2's review pass; their mirrors also embed
# manual_tag_list as one scalar id)
SCALAR_TAG_MODELS = (
    "din", "mmoe", "deepcrossing", "ple", "dien", "widedeep", "esmm",
    "dcn", "bst",
)


def train_ours(model_name, train_d, eval_d, epochs, batch, seed=42,
               dense_init="lecun"):
    from rank_tpu.features import WECHAT_SCHEMA
    from rank_tpu.models import default_config
    from rank_tpu.train import TrainConfig, Trainer
    from rank_tpu.train.staged import StagedRunner

    cfg = default_config(model_name, dense_init=dense_init)
    if model_name in SCALAR_TAG_MODELS:
        cfg = cfg.replace(multihot_tags=False)
    trainer = Trainer(
        WECHAT_SCHEMA, cfg,
        TrainConfig(batch_size=batch, log_every=0, seed=seed),
    )
    runner = StagedRunner(trainer, train_d, eval_d, batch)
    state = runner.init_state()
    for e in range(1, epochs + 1):
        state, _ = runner.train_epoch(state, e, seed)
    stats = runner.evaluate(state, epochs)
    if model_name in MULTI_TASK + ("esmm",):
        print(f"rank_tpu task AUCs: {stats.get('task_aucs')}")
    return stats["auc"]


def _torch_args(model_name, d, idx):
    """(args, labels) for one torch minibatch; explicit per-model dispatch
    (no silent fallback)."""
    import torch

    from bench import EMB_DIMS, FM_FIELDS, _torch_models  # noqa: F401

    AFM_FIELDS = FM_FIELDS + ("manual_tag_list",)
    task_cols = [0, 2, 3]  # read_comment / like / click_avatar

    if model_name in ("deepfm", "fwfm", "ffm"):  # cat-only, 6 fields
        cats = {
            k: torch.tensor(d[k][idx], dtype=torch.long) for k in FM_FIELDS
        }
        return (cats,), torch.tensor(d["labels"][idx, 0])

    dense = torch.tensor(d["dense"][idx])
    y = torch.tensor(d["labels"][idx, 0])
    if model_name == "pnn":  # cat-only, 7 fields
        cats = {
            k: torch.tensor(d[k][idx], dtype=torch.long) for k in AFM_FIELDS
        }
        return (cats,), y
    if model_name in ("afm", "xdeepfm", "fibinet", "autoint", "flen",
                      "widedeep"):
        cats = {
            k: torch.tensor(d[k][idx], dtype=torch.long) for k in AFM_FIELDS
        }
        return (dense, cats), y
    cats = {k: torch.tensor(d[k][idx], dtype=torch.long) for k in EMB_DIMS}
    feedid = torch.tensor(d["feedid"][idx], dtype=torch.long)
    seq = torch.tensor(d[SEQ][idx], dtype=torch.long)
    lengths = torch.tensor(d[SEQ + "_length"][idx], dtype=torch.long)
    if model_name in ("dcn", "deepcrossing"):
        return (dense, cats), y
    if model_name in ("din", "dien"):
        return (dense, cats, feedid, seq, lengths), y
    if model_name in ("mmoe", "ple"):
        return (dense, cats, feedid), torch.tensor(
            d["labels"][idx][:, task_cols]
        )
    if model_name == "esmm":  # [read_comment (ctr), like (cvr)] labels
        return (dense, cats, feedid), torch.tensor(
            d["labels"][idx][:, [0, 2]]
        )
    if model_name == "bst":
        # target feedid appended as the last sequence position, as in
        # rank_tpu.models.sequence.BST
        full = np.concatenate([d[SEQ][idx], d["feedid"][idx][:, None]], axis=1)
        return (
            dense, cats, torch.tensor(full, dtype=torch.long), lengths
        ), y
    raise ValueError(f"no torch arg builder for {model_name!r}")


def train_torch(model_name, train_d, eval_d, epochs, batch, seed=42):
    import torch
    from sklearn.metrics import roc_auc_score

    from bench import _torch_models

    torch.manual_seed(seed)
    model = _torch_models()[model_name]()
    opt = torch.optim.Adam(model.parameters(), lr=0.005)
    crit = torch.nn.BCEWithLogitsLoss()

    def loss_fn(out, y):
        if model_name != "esmm":
            return crit(out, y)
        # ESMM trains with BCE on PROBS (CTCVR = p_ctr * p_cvr is a
        # product of probabilities); same eps clip as train/loop.py
        p = out.clamp(1e-7, 1 - 1e-7)
        y_ctcvr = y[:, 0] * y[:, 1]
        bce = torch.nn.functional.binary_cross_entropy
        return bce(p[:, 0], y[:, 0]) + bce(p[:, 1], y_ctcvr)

    n = train_d["labels"].shape[0]
    rng = np.random.default_rng(seed)
    model.train()
    for e in range(epochs):
        order = rng.permutation(n)
        for i in range(0, n - batch + 1, batch):
            args_t, y = _torch_args(model_name, train_d, order[i : i + batch])
            opt.zero_grad()
            loss = loss_fn(model(*args_t), y)
            loss.backward()
            opt.step()
        print(f"torch epoch {e+1} done", flush=True)
    model.eval()
    preds, ys = [], []
    ne = eval_d["labels"].shape[0]
    with torch.no_grad():
        for i in range(0, ne, batch):
            idx = np.arange(i, min(i + batch, ne))
            args_t, y = _torch_args(model_name, eval_d, idx)
            out = model(*args_t)
            if model_name == "esmm":  # already probabilities
                preds.append(out.numpy())
            else:
                preds.append(torch.sigmoid(out).numpy())
            ys.append(y.numpy())
    p = np.concatenate(preds)
    y = np.concatenate(ys)
    if model_name == "esmm":
        aucs = {
            "ctr": roc_auc_score(y[:, 0], p[:, 0]),
            "ctcvr": roc_auc_score(y[:, 0] * y[:, 1], p[:, 1]),
        }
        print(f"torch task AUCs: {aucs}")
        return aucs["ctr"]
    if model_name in MULTI_TASK:
        tasks = ("read_comment", "like", "click_avatar")
        aucs = {t: roc_auc_score(y[:, i], p[:, i]) for i, t in enumerate(tasks)}
        print(f"torch task AUCs: {aucs}")
        return aucs["read_comment"]
    return roc_auc_score(y, p)


def run_one(model, train_d, eval_d, epochs, batch, seed=42,
            dense_init="lecun"):
    t0 = time.time()
    ours = train_ours(model, train_d, eval_d, epochs, batch, seed, dense_init)
    t_ours = time.time() - t0
    t0 = time.time()
    torch_auc = train_torch(model, train_d, eval_d, epochs, batch, seed)
    t_torch = time.time() - t0
    print(
        f"\n{model.upper()} eval AUC — rank_tpu (TPU): {ours:.5f} in "
        f"{t_ours:.0f}s | torch (CPU): {torch_auc:.5f} in {t_torch:.0f}s | "
        f"delta {ours - torch_auc:+.5f}"
    )
    return {"model": model, "seed": seed, "dense_init": dense_init,
            "ours": ours, "torch": torch_auc,
            "delta": ours - torch_auc, "t_ours": t_ours, "t_torch": t_torch}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dcn", choices=MODELS + ("all",))
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=42,
                    help="init/shuffle seed for BOTH sides (data stays seed 0)")
    ap.add_argument("--calibrated", type=float, default=0.0,
                    help="use the EDA-calibrated synthetic log at this scale "
                    "(data/calibrated.py; day 8-13 train / day 14 test split) "
                    "instead of the latent-factor row sampler — puts the "
                    "head-to-head in the reference's AUC regime (VERDICT r3 "
                    "#2); --rows is ignored. Ids fit the full WECHAT_SCHEMA "
                    "vocabs at any scale <= 1, so both sides keep their "
                    "full-size tables and stay apples-to-apples.")
    ap.add_argument("--json_out", default=None,
                    help="append one JSON line per model to this file")
    ap.add_argument("--dense_init", default="lecun",
                    choices=("lecun", "torch"),
                    help="our side's dense-init family; 'torch' matches the "
                    "mirrors' nn.Linear defaults so the head-to-head "
                    "compares learning dynamics, not init families "
                    "(PARITY_CALIB_r04.md open item)")
    args = ap.parse_args()

    from rank_tpu.data.loader import split_train_test
    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import WECHAT_SCHEMA

    if args.calibrated:
        from rank_tpu.data.calibrated import make_calibrated_dataset

        train_d, eval_d, _ = make_calibrated_dataset(scale=args.calibrated)
    else:
        data = make_synthetic_dataset(WECHAT_SCHEMA, num_rows=args.rows, seed=0)
        train_d, eval_d = split_train_test(data, 0.15)

    names = MODELS if args.model == "all" else (args.model,)
    results = [run_one(m, train_d, eval_d, args.epochs, args.batch,
                       args.seed, args.dense_init)
               for m in names]
    if args.json_out:
        import json

        with open(args.json_out, "a") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
