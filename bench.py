"""Benchmark: train-step throughput (examples/s/chip) for DCN + BST.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/s/chip", "vs_baseline": N}

- value: geometric mean of steady-state JAX-on-TPU training throughput for
  the DCN and BST reference configs (WeChat schema, full vocab sizes).
- vs_baseline: geomean speedup vs a PyTorch-CPU implementation of the same
  two models (the reference runs PyTorch on "cuda if available, else CPU",
  deepfm.py:215, and published no hardware numbers — BASELINE.json sets
  the target at >=3x vs PyTorch-CPU).

Run: python bench.py  (uses the real TPU chip; falls back to whatever JAX
default platform is available).
"""

import json
import sys
import time

import numpy as np

BATCH_JAX = 8192   # TPU batch (amortises dispatch latency; quality runs use 1024)
BATCH_TORCH = 1024  # reference default batch size (deepfm.py:304)
JAX_STEPS = 30
JAX_WARMUP = 5
TORCH_STEPS = 6
TORCH_WARMUP = 2
HIST_LEN = 50


def bench_jax(model_name: str) -> float:
    import jax

    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import WECHAT_SCHEMA
    from rank_tpu.models import default_config
    from rank_tpu.train import TrainConfig, Trainer
    from rank_tpu.train import metrics as M

    trainer = Trainer(
        WECHAT_SCHEMA,
        default_config(model_name),
        TrainConfig(batch_size=BATCH_JAX, log_every=0),
    )
    data = make_synthetic_dataset(WECHAT_SCHEMA, num_rows=BATCH_JAX * 4, seed=0)
    batches = []
    for i in range(4):
        b = {k: v[i * BATCH_JAX : (i + 1) * BATCH_JAX] for k, v in data.items()}
        b["_valid"] = np.ones((BATCH_JAX,), np.float32)
        batches.append(trainer._host_to_device(b))

    state = trainer.init_state(batches[0])
    step_fn = trainer._get_compiled("train")
    meters = trainer.meters_init()

    for i in range(JAX_WARMUP):
        state, meters = step_fn(state, meters, batches[i % 4])
    float(meters["loss"])  # true fence: block_until_ready does not wait
    # for still-queued dispatches on this backend (see REPRODUCING.md §5)

    # median of 3 timed repeats — throughput through the shared tunnel is
    # noisy, and a transiently-degraded window shouldn't define the number
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(JAX_STEPS):
            state, meters = step_fn(state, meters, batches[i % 4])
        float(meters["loss"])  # honest end-of-window fence
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1]
    return BATCH_JAX * JAX_STEPS / dt


# ---------------------------------------------------------------------------
# PyTorch-CPU baseline (reference-faithful model structures)
# ---------------------------------------------------------------------------

VOCABS = {
    "userid": 19_627, "feedid": 106_445, "device": 3, "authorid": 18_790,
    "bgm_song_id": 25_160, "bgm_singer_id": 17_501, "manual_tag_list": 351,
}
EMB_DIMS = {
    "userid": 16, "device": 2, "authorid": 4, "bgm_song_id": 4,
    "bgm_singer_id": 4, "manual_tag_list": 4,
}


FM_FIELDS = ("userid", "feedid", "device", "authorid", "bgm_song_id",
             "bgm_singer_id")


def _torch_models():
    import torch
    import torch.nn as nn

    class TorchDeepFM(nn.Module):
        """Reference DeepFM structure (deepfm.py:73-151): 6 categorical
        fields only — no dense features; its low published AUC is a
        feature-subset property (deepfm.py:42-44) — dual dim-1/dim-16
        tables, FM first+second order, deep tower Linear->BN->ReLU->
        Dropout (deepfm.py:100-110), learned 3->1 fusion
        (deepfm.py:112,148-151). Mirrors rank_tpu models/fm_family.py
        DeepFM for the apples-to-apples quality head-to-head."""

        def __init__(self, d=16):
            super().__init__()
            self.first = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], 1) for k in FM_FIELDS}
            )
            self.second = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], d) for k in FM_FIELDS}
            )
            layers, dim = [], d * len(FM_FIELDS)
            for h in (512, 256, 128):
                layers += [
                    nn.Linear(dim, h), nn.BatchNorm1d(h),
                    nn.ReLU(), nn.Dropout(0.1),
                ]
                dim = h
            self.dnn = nn.Sequential(*layers)
            self.deep_out = nn.Linear(dim, 1)
            self.final = nn.Linear(3, 1)

        def forward(self, cats):
            import torch

            fo = torch.cat([self.first[k](cats[k]) for k in FM_FIELDS], dim=1)
            fm1 = fo.sum(1, keepdim=True)
            embs = torch.stack(
                [self.second[k](cats[k]) for k in FM_FIELDS], dim=1
            )  # (B, F, D)
            s = embs.sum(1)
            fm2 = 0.5 * (s.square() - embs.square().sum(1)).sum(-1, keepdim=True)
            deep = self.deep_out(self.dnn(embs.reshape(embs.shape[0], -1)))
            return self.final(torch.cat([fm1, fm2, deep], dim=1)).squeeze(1)

    class TorchDCN(nn.Module):
        """Reference DCN structure (dcn.py:114-180) with *registered* cross
        weights (the fair comparison; the reference's were untrained)."""

        def __init__(self):
            super().__init__()
            self.emb = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], d) for k, d in EMB_DIMS.items()}
            )
            self.input_dim = 16 + sum(EMB_DIMS.values())
            self.cross_w = nn.ParameterList(
                [nn.Parameter(torch.randn(self.input_dim, 1) * 0.02) for _ in range(3)]
            )
            self.cross_b = nn.ParameterList(
                [nn.Parameter(torch.zeros(self.input_dim)) for _ in range(3)]
            )
            layers, d = [], self.input_dim
            for h in (512, 256, 128):
                layers += [nn.Linear(d, h), nn.ReLU()]
                d = h
            self.dnn = nn.Sequential(*layers)
            self.out = nn.Linear(self.input_dim + 128, 1)

        def forward(self, dense, cats):
            embs = [self.emb[k](cats[k]) for k in EMB_DIMS]
            x0 = torch.cat([dense] + embs, dim=1)
            x = x0
            for w, b in zip(self.cross_w, self.cross_b):
                x = x0 * (x @ w) + b + x
            deep = self.dnn(x0)
            return self.out(torch.cat([x, deep], dim=1)).squeeze(1)

    class TorchBST(nn.Module):
        """Reference BST structure (bst.py:162-247): 2 transformer blocks,
        2 heads, mean pooling, LeakyReLU tower with BN+dropout. Mirrors
        rank_tpu's BST exactly (per-block positional embedding added to
        Q/K inputs only, target appended as last position and always
        valid, masked mean pool) so scripts/parity_check.py is an
        apples-to-apples quality comparison."""

        def __init__(self, t=HIST_LEN + 1):
            super().__init__()
            self.emb = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], d) for k, d in EMB_DIMS.items()}
            )
            self.feed_emb = nn.Embedding(VOCABS["feedid"], 16)
            self.blocks = nn.ModuleList()
            for _ in range(2):
                blk = nn.ModuleDict(
                    {
                        "pos": nn.Embedding(t, 16),
                        "wq": nn.Linear(16, 16), "wk": nn.Linear(16, 16),
                        "wv": nn.Linear(16, 16), "wo": nn.Linear(16, 16),
                        "n1": nn.LayerNorm(16), "n2": nn.LayerNorm(16),
                        "ff1": nn.Linear(16, 16), "ff2": nn.Linear(16, 16),
                        "drop": nn.Dropout(0.1),
                    }
                )
                self.blocks.append(blk)
            d = 16 + sum(EMB_DIMS.values()) + 16
            layers = []
            for h in (512, 256, 128):
                layers += [
                    nn.Linear(d, h), nn.BatchNorm1d(h),
                    nn.LeakyReLU(0.01), nn.Dropout(0.1),
                ]
                d = h
            layers.append(nn.Linear(d, 1))
            self.dnn = nn.Sequential(*layers)

        def forward(self, dense, cats, seq, lengths):
            import torch
            import torch.nn.functional as F

            b, t = seq.shape
            h = self.feed_emb(seq)
            pos = torch.arange(t)
            # history prefix valid + appended target (last position) valid
            valid = (pos[None, :] < lengths[:, None]) | (pos[None, :] == t - 1)
            for blk in self.blocks:
                qin = h + blk["pos"](pos)[None]  # pe on Q/K inputs, not V
                q = blk["wq"](qin).view(b, t, 2, 8).transpose(1, 2)
                k = blk["wk"](qin).view(b, t, 2, 8).transpose(1, 2)
                v = blk["wv"](h).view(b, t, 2, 8).transpose(1, 2)
                s = (q @ k.transpose(-2, -1)) / np.sqrt(8.0)
                s = s.masked_fill(~valid[:, None, None, :], -1e9)
                ctx = (F.softmax(s, -1) @ v).transpose(1, 2).reshape(b, t, 16)
                h1 = blk["n1"](qin + blk["drop"](blk["wo"](ctx)))
                ff = blk["drop"](F.leaky_relu(blk["ff1"](h1), 0.01))
                h = blk["n2"](h1 + blk["drop"](blk["ff2"](ff)))
            h = h * valid[..., None]
            pooled = h.sum(1) / valid.sum(1).clamp(min=1)[:, None]
            embs = [self.emb[kk](cats[kk]) for kk in EMB_DIMS]
            x = torch.cat([dense] + embs + [pooled], dim=1)
            return self.dnn(x).squeeze(1)

    class TorchDice(nn.Module):
        """Reference Dice (algorithm/DIN/activations.py:31-68): affine-free
        BN (momentum 0.01) gated sigmoid blend with learned alpha."""

        def __init__(self, dim):
            super().__init__()
            self.alpha = nn.Parameter(torch.zeros(dim))
            self.bn = nn.BatchNorm1d(dim, affine=False, momentum=0.01, eps=1e-5)

        def forward(self, x):
            p = torch.sigmoid(self.bn(x))
            return self.alpha * (1.0 - p) * x + p * x

    class TorchDIN(nn.Module):
        """Reference DIN structure (din.py:225-323) with a REGISTERED
        attention MLP (the reference recreates it inside every forward,
        din.py:61-67, so it never trains — this is the fair fixed form,
        matching rank_tpu's DINAttention) and scalar tag embedding
        (mirrors rank_tpu DIN with multihot_tags=False). Tower: Linear ->
        Dice -> BN -> Dropout per layer (din.py:272-284 ordering)."""

        def __init__(self, use_softmax=True):
            super().__init__()
            self.emb = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], d) for k, d in EMB_DIMS.items()}
            )
            self.feed_emb = nn.Embedding(VOCABS["feedid"], 16)
            self.att = nn.Sequential(
                nn.Linear(64, 64), nn.ReLU(),
                nn.Linear(64, 32), nn.ReLU(), nn.Linear(32, 1),
            )
            self.use_softmax = use_softmax
            d = 16 + sum(EMB_DIMS.values()) + 16 + 16
            layers = []
            for h in (512, 256, 128):
                layers += [
                    nn.Linear(d, h), TorchDice(h),
                    nn.BatchNorm1d(h), nn.Dropout(0.1),
                ]
                d = h
            layers.append(nn.Linear(d, 1))
            self.dnn = nn.Sequential(*layers)

        def forward(self, dense, cats, target, seq, lengths):
            import torch
            import torch.nn.functional as F

            b, t = seq.shape
            q = self.feed_emb(target)  # (B, 16)
            keys = self.feed_emb(seq)  # (B, T, 16) — shared table
            qe = q.unsqueeze(1).expand(-1, t, -1)
            cross = torch.cat([qe, keys, qe - keys, qe * keys], dim=-1)
            w = self.att(cross)  # (B, T, 1)
            mask = (
                torch.arange(t)[None, :] < lengths[:, None]
            ).unsqueeze(-1)
            if self.use_softmax:
                w = torch.where(mask, w, torch.full_like(w, -(2.0**32) + 1))
                w = F.softmax(w / np.sqrt(16.0), dim=1)
            else:
                w = w * mask.float()
            pooled = torch.bmm(w.transpose(1, 2), keys).squeeze(1)  # (B,16)
            embs = [self.emb[kk](cats[kk]) for kk in EMB_DIMS]
            x = torch.cat([dense] + embs + [q, pooled], dim=1)
            return self.dnn(x).squeeze(1)

    class TorchMMOE(nn.Module):
        """rank_tpu's MMOE mirrored in torch (MMOE is README-only in the
        reference, README.md:41 — no code): shared input = [dense | 6
        field embs | target feedid emb], 4 shared experts (256,128 ReLU),
        per-task softmax gates, (64,) ReLU towers; tasks
        read_comment / like / click_avatar. Scalar tag embedding
        (mirrors multihot_tags=False)."""

        def __init__(self, n_tasks=3, n_experts=4):
            super().__init__()
            self.emb = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], d) for k, d in EMB_DIMS.items()}
            )
            self.feed_emb = nn.Embedding(VOCABS["feedid"], 16)
            d0 = 16 + sum(EMB_DIMS.values()) + 16
            self.experts = nn.ModuleList([
                nn.Sequential(nn.Linear(d0, 256), nn.ReLU(),
                              nn.Linear(256, 128), nn.ReLU())
                for _ in range(n_experts)
            ])
            self.gates = nn.ModuleList(
                [nn.Linear(d0, n_experts) for _ in range(n_tasks)]
            )
            self.towers = nn.ModuleList([
                nn.Sequential(nn.Linear(128, 64), nn.ReLU(), nn.Linear(64, 1))
                for _ in range(n_tasks)
            ])

        def forward(self, dense, cats, target):
            import torch
            import torch.nn.functional as F

            embs = [self.emb[k](cats[k]) for k in EMB_DIMS]
            x0 = torch.cat([dense] + embs + [self.feed_emb(target)], dim=1)
            ex = torch.stack([e(x0) for e in self.experts], dim=1)  # (B,E,H)
            outs = []
            for gate, tower in zip(self.gates, self.towers):
                g = F.softmax(gate(x0), dim=-1)  # (B,E)
                mixed = torch.einsum("be,beh->bh", g, ex)
                outs.append(tower(mixed).squeeze(1))
            return torch.stack(outs, dim=1)  # (B, T_tasks)

    return {"dcn": TorchDCN, "bst": TorchBST, "din": TorchDIN,
            "mmoe": TorchMMOE, "deepfm": TorchDeepFM}


def bench_torch(model_name: str) -> float:
    import torch

    torch.manual_seed(0)
    torch.set_num_threads(max(1, (torch.get_num_threads())))
    torch_zoo = _torch_models()
    TorchDCN, TorchBST = torch_zoo["dcn"], torch_zoo["bst"]
    rng = np.random.default_rng(0)
    b = BATCH_TORCH
    dense = torch.tensor(rng.normal(size=(b, 16)).astype(np.float32))
    cats = {
        k: torch.tensor(rng.integers(0, VOCABS[k], size=b), dtype=torch.long)
        for k in EMB_DIMS
    }
    labels = torch.tensor((rng.random(b) < 0.1).astype(np.float32))
    if model_name == "dcn":
        model = TorchDCN()
        args = (dense, cats)
    else:
        seq = torch.tensor(
            rng.integers(0, VOCABS["feedid"], size=(b, HIST_LEN + 1)),
            dtype=torch.long,
        )
        lengths = torch.tensor(
            rng.integers(1, HIST_LEN + 1, size=b), dtype=torch.long
        )
        model = TorchBST()
        args = (dense, cats, seq, lengths)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=0.005)
    crit = torch.nn.BCEWithLogitsLoss()

    def step():
        opt.zero_grad()
        loss = crit(model(*args), labels)
        loss.backward()
        opt.step()

    for _ in range(TORCH_WARMUP):
        step()
    t0 = time.perf_counter()
    for _ in range(TORCH_STEPS):
        step()
    dt = time.perf_counter() - t0
    return b * TORCH_STEPS / dt


def main():
    results = {}
    for model in ("dcn", "bst"):
        jax_eps = bench_jax(model)
        torch_eps = bench_torch(model)
        results[model] = {
            "jax_tpu": jax_eps,
            "torch_cpu": torch_eps,
            "speedup": jax_eps / torch_eps,
        }
        print(
            f"# {model}: jax_tpu={jax_eps:,.0f} ex/s  "
            f"torch_cpu={torch_eps:,.0f} ex/s  x{jax_eps/torch_eps:.1f}",
            file=sys.stderr,
        )
    value = float(np.sqrt(results["dcn"]["jax_tpu"] * results["bst"]["jax_tpu"]))
    vs = float(np.sqrt(results["dcn"]["speedup"] * results["bst"]["speedup"]))
    print(
        json.dumps(
            {
                "metric": "train_examples_per_s_per_chip_dcn_bst_geomean",
                "value": round(value, 1),
                "unit": "examples/s/chip",
                "vs_baseline": round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
