"""Benchmark: train-step throughput (examples/s/chip) for DCN + BST.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/s/chip", "vs_baseline": N,
   "mfu_pct": {"dcn": .., "bst": ..}, "hbm_bw_pct": {"dcn": .., "bst": ..}}

mfu_pct / hbm_bw_pct come from an XLA cost_analysis of the compiled step
against TPU v5e peaks (197 bf16 TFLOP/s, 819 GB/s); see
scripts/mfu_roofline.py for the full per-model roofline artifact.

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
import os
import sys
import time

import numpy as np

# TPU batch per model. The t(B) issue-overhead fit (BYTES_r05.json) shows
# the DCN step is issue/latency-bound with a ~1.4 ms batch-independent
# floor — 52% of the 2.66 ms step at B=8192 — so a bigger batch amortises
# it (B=65536: 17.7 ms -> ~3.7M ex/s, +20%). BST's step is traffic-bound
# and near-optimal at 8192 (B=16384 measured WORSE: 314k vs 332k ex/s).
BATCH_JAX = {"dcn": 65536, "bst": 8192}
BATCH_JAX_DEFAULT = 8192
BATCH_TORCH = 1024  # reference default batch size (deepfm.py:304)
JAX_STEPS = 30
JAX_WARMUP = 5
TORCH_STEPS = 6
TORCH_WARMUP = 2
HIST_LEN = 50


def bench_jax(model_name: str) -> "tuple[float, dict | None]":
    import jax

    from rank_tpu.data.synthetic import make_synthetic_dataset
    from rank_tpu.features import WECHAT_SCHEMA
    from rank_tpu.models import default_config
    from rank_tpu.train import TrainConfig, Trainer
    from rank_tpu.train import metrics as M

    batch_jax = BATCH_JAX.get(model_name, BATCH_JAX_DEFAULT)
    trainer = Trainer(
        WECHAT_SCHEMA,
        default_config(model_name),
        TrainConfig(batch_size=batch_jax, log_every=0),
    )
    data = make_synthetic_dataset(WECHAT_SCHEMA, num_rows=batch_jax * 4, seed=0)
    batches = []
    for i in range(4):
        b = {k: v[i * batch_jax : (i + 1) * batch_jax] for k, v in data.items()}
        b["_valid"] = np.ones((batch_jax,), np.float32)
        batches.append(trainer._host_to_device(b))

    state = trainer.init_state(batches[0])
    meters = trainer.meters_init()
    # AOT-compile so the SAME executable gives both the timing loop and
    # XLA's analytic FLOPs/bytes for the MFU report (scripts/mfu_roofline.py)
    compiled = (
        trainer._get_compiled("train").lower(state, meters, batches[0]).compile()
    )
    from rank_tpu.utils import roofline as R

    costs = R.xla_step_costs(compiled)
    step_fn = compiled

    for i in range(JAX_WARMUP):
        state, meters = step_fn(state, meters, batches[i % 4])
    float(meters["loss"])  # true fence: block_until_ready does not wait
    # for still-queued dispatches on this backend (see REPRODUCING.md §5)

    # median of 5 timed repeats — throughput through the shared tunnel is
    # noisy, and a transiently-degraded window shouldn't define the number
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for i in range(JAX_STEPS):
            state, meters = step_fn(state, meters, batches[i % 4])
        float(meters["loss"])  # honest end-of-window fence
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    eps = batch_jax * JAX_STEPS / dt
    mfu = (
        R.roofline(costs["flops"] / batch_jax, costs["bytes"] / batch_jax, eps)
        if costs
        else None
    )
    return eps, mfu


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

    AFM_FIELDS = FM_FIELDS + ("manual_tag_list",)

    class TorchDeepCrossing(nn.Module):
        """Reference DeepCrossing structure (deepcrossing.py:106-163) with
        REGISTERED residual units (the reference recreates nn.Linear per
        forward, deepcrossing.py:37-39, so they never train — this is the
        fair fixed form matching rank_tpu's ResidualStack): x0 = [dense |
        per-field embs], N x ReLU(x + W2 ReLU(W1 x)), Linear(1)."""

        def __init__(self, internal=256, n_units=2):
            super().__init__()
            self.emb = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], d) for k, d in EMB_DIMS.items()}
            )
            d0 = 16 + sum(EMB_DIMS.values())
            self.units = nn.ModuleList([
                nn.ModuleDict({
                    "w1": nn.Linear(d0, internal), "w2": nn.Linear(internal, d0),
                }) for _ in range(n_units)
            ])
            self.out = nn.Linear(d0, 1)

        def forward(self, dense, cats):
            import torch
            import torch.nn.functional as F

            embs = [self.emb[k](cats[k]) for k in EMB_DIMS]
            x = torch.cat([dense] + embs, dim=1)
            for u in self.units:
                x = F.relu(x + u["w2"](F.relu(u["w1"](x))))
            return self.out(x).squeeze(1)

    class TorchAFM(nn.Module):
        """Reference AFM structure (afm.py:64-119): dense linear + dim-32
        embeddings over 7 fields (incl. scalar manual_tag lookup,
        afm.py:132-134), pairwise hadamard products, MLP attention
        Linear(d,af)->ReLU->Linear(af,1), softmax over the 21 pairs,
        weighted sum, projection p. Mirrors rank_tpu models/fm_family.AFM."""

        def __init__(self, d=32, af=64):
            super().__init__()
            self.emb = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], d) for k in AFM_FIELDS}
            )
            self.dense_layer = nn.Linear(16, 1)
            self.att1 = nn.Linear(d, af)
            self.att2 = nn.Linear(af, 1)
            self.p = nn.Linear(d, 1)
            f = len(AFM_FIELDS)
            idx_i, idx_j = [], []
            for i in range(f):
                for j in range(i + 1, f):
                    idx_i.append(i)
                    idx_j.append(j)
            self.idx_i, self.idx_j = idx_i, idx_j

        def forward(self, dense, cats):
            import torch
            import torch.nn.functional as F

            embs = torch.stack(
                [self.emb[k](cats[k]) for k in AFM_FIELDS], dim=1
            )  # (B, F, D)
            pairs = embs[:, self.idx_i] * embs[:, self.idx_j]  # (B, P, D)
            scores = self.att2(F.relu(self.att1(pairs)))  # (B, P, 1)
            weights = F.softmax(scores, dim=1)
            pooled = (pairs * weights).sum(1)  # (B, D)
            return (self.dense_layer(dense) + self.p(pooled)).squeeze(1)

    class TorchXDeepFM(nn.Module):
        """xDeepFM (README-only, README.md:26; Lian et al. 2018) mirroring
        rank_tpu models/cross_family.XDeepFM: 7 uniform dim-16 fields,
        linear (dim-1 tables + dense Linear), CIN (128,128) with
        split-half, deep tower with BN+dropout; logit = sum of three."""

        def __init__(self, d=16, cin_sizes=(128, 128)):
            super().__init__()
            self.emb = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], d) for k in AFM_FIELDS}
            )
            self.lin = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], 1) for k in AFM_FIELDS}
            )
            self.linear_dense = nn.Linear(16, 1)
            f = len(AFM_FIELDS)
            self.cin_w = nn.ParameterList()
            hk = f
            n_maps = 0
            self.cin_sizes = cin_sizes
            for li, size in enumerate(cin_sizes):
                self.cin_w.append(
                    nn.Parameter(torch.empty(size, hk, f))
                )
                nn.init.xavier_uniform_(self.cin_w[-1])
                last = li == len(cin_sizes) - 1
                n_maps += size if last else size // 2
                hk = size if last else size // 2
            self.cin_out = nn.Linear(n_maps, 1)
            layers, dim = [], 16 + d * f
            for h in (512, 256, 128):
                layers += [
                    nn.Linear(dim, h), nn.BatchNorm1d(h),
                    nn.ReLU(), nn.Dropout(0.1),
                ]
                dim = h
            self.dnn = nn.Sequential(*layers)
            self.deep_out = nn.Linear(dim, 1)

        def forward(self, dense, cats):
            import torch

            embs = torch.stack(
                [self.emb[k](cats[k]) for k in AFM_FIELDS], dim=1
            )  # (B, F, D)
            lin = sum(self.lin[k](cats[k]) for k in AFM_FIELDS)
            lin = lin + self.linear_dense(dense)
            x0, xk, pooled = embs, embs, []
            for li, w in enumerate(self.cin_w):
                z = torch.einsum("bhd,bfd->bhfd", xk, x0)
                xnext = torch.einsum("bhfd,ohf->bod", z, w)
                if li < len(self.cin_w) - 1:
                    next_in, direct = torch.split(
                        xnext, xnext.shape[1] // 2, dim=1
                    )
                else:
                    next_in, direct = xnext, xnext
                pooled.append(direct.sum(-1))
                xk = next_in
            cin_logit = self.cin_out(torch.cat(pooled, dim=1))
            deep_in = torch.cat([dense, embs.reshape(embs.shape[0], -1)], dim=1)
            deep_logit = self.deep_out(self.dnn(deep_in))
            return (lin + cin_logit + deep_logit).squeeze(1)

    class TorchDIEN(nn.Module):
        """DIEN mirroring rank_tpu models/sequence.DIEN and the reference
        semantics (dien.py:166-353, custom_grucell.py:94-167): GRU over
        history (fused-gate form h' = (1-u)h + uc), bilinear attention
        score_t = h_t . (W e_target) with masked softmax (dien.py:205-218),
        AUGRU second pass (u' = a*u), final state + target + field embs
        into a PReLU tower (act->BN order). Padded steps carry state
        through; outputs at padded steps are zero (rnn.py sequence_length
        semantics)."""

        def __init__(self, h_dim=16):
            super().__init__()
            self.emb = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], d) for k, d in EMB_DIMS.items()}
            )
            self.feed_emb = nn.Embedding(VOCABS["feedid"], 16)
            self.h_dim = h_dim

            def make_cell(d_in):
                cell = nn.ModuleDict({
                    "gates": nn.Linear(d_in + h_dim, 2 * h_dim),
                    "cand": nn.Linear(d_in + h_dim, h_dim),
                })
                return cell

            self.gru = make_cell(16)
            self.augru = make_cell(h_dim)
            self.att_w = nn.Parameter(torch.empty(16, h_dim))
            nn.init.xavier_normal_(self.att_w)
            d = 16 + sum(EMB_DIMS.values()) + 16 + h_dim
            layers = []
            for h in (512, 256, 128):
                layers += [
                    nn.Linear(d, h), nn.PReLU(),
                    nn.BatchNorm1d(h), nn.Dropout(0.1),
                ]
                d = h
            layers.append(nn.Linear(d, 1))
            self.dnn = nn.Sequential(*layers)

        def _rnn(self, cell, xs, valid, att=None):
            """xs (B,T,D); valid (B,T) bool; att (B,T) or None (AUGRU vs
            GRU). Returns (outputs (B,T,H), final (B,H))."""
            import torch

            b, t, _ = xs.shape
            h = xs.new_zeros(b, self.h_dim)
            outs = []
            for i in range(t):
                x_t = xs[:, i]
                g = torch.sigmoid(cell["gates"](torch.cat([x_t, h], dim=1)))
                u, r = g.chunk(2, dim=1)
                c = torch.tanh(cell["cand"](torch.cat([x_t, r * h], dim=1)))
                if att is not None:
                    u = att[:, i : i + 1] * u
                h_new = (1.0 - u) * h + u * c
                v = valid[:, i : i + 1].float()
                h = v * h_new + (1.0 - v) * h
                outs.append(h * v)
            return torch.stack(outs, dim=1), h

        def forward(self, dense, cats, target, seq, lengths):
            import torch
            import torch.nn.functional as F

            b, t = seq.shape
            valid = torch.arange(t)[None, :] < lengths[:, None]
            q = self.feed_emb(target)
            keys = self.feed_emb(seq)
            gru_outs, _ = self._rnn(self.gru, keys, valid)
            scores = torch.einsum("bth,bh->bt", gru_outs, q @ self.att_w)
            scores = scores.masked_fill(~valid, -1e9)
            att = F.softmax(scores, dim=1)
            # fully-masked rows: uniform-softmax garbage is harmless — the
            # AUGRU carries h=0 through when valid is all-false
            _, final = self._rnn(self.augru, gru_outs, valid, att)
            embs = [self.emb[k](cats[k]) for k in EMB_DIMS]
            x = torch.cat([dense] + embs + [q, final], dim=1)
            return self.dnn(x).squeeze(1)

    class TorchPLE(nn.Module):
        """PLE (README-only, README.md:42; Tang et al. RecSys'20) mirroring
        rank_tpu models/multitask.PLE: 2 CGC levels, 2 task-specific + 2
        shared experts (256,128 ReLU), per-selector softmax gates, (64,)
        towers; input = [dense | field embs | target feedid emb]."""

        def __init__(self, n_tasks=3, levels=2, spec=2, shared=2):
            super().__init__()
            self.emb = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], d) for k, d in EMB_DIMS.items()}
            )
            self.feed_emb = nn.Embedding(VOCABS["feedid"], 16)
            self.n_tasks, self.levels = n_tasks, levels
            self.spec, self.shared = spec, shared
            d0 = 16 + sum(EMB_DIMS.values()) + 16
            h_out = 128

            def expert(d_in):
                return nn.Sequential(nn.Linear(d_in, 256), nn.ReLU(),
                                     nn.Linear(256, h_out), nn.ReLU())

            self.experts = nn.ModuleList()
            self.gates = nn.ModuleList()
            for level in range(levels):
                d_in = d0 if level == 0 else h_out
                per_level = nn.ModuleDict()
                per_level["task"] = nn.ModuleList([
                    nn.ModuleList([expert(d_in) for _ in range(spec)])
                    for _ in range(n_tasks)
                ])
                per_level["shared"] = nn.ModuleList(
                    [expert(d_in) for _ in range(shared)]
                )
                self.experts.append(per_level)
                g = nn.ModuleDict()
                g["task"] = nn.ModuleList([
                    nn.Linear(d_in, spec + shared) for _ in range(n_tasks)
                ])
                if level < levels - 1:
                    g["shared"] = nn.Linear(d_in, n_tasks * spec + shared)
                self.gates.append(g)
            self.towers = nn.ModuleList([
                nn.Sequential(nn.Linear(h_out, 64), nn.ReLU(), nn.Linear(64, 1))
                for _ in range(n_tasks)
            ])

        def forward(self, dense, cats, target):
            import torch
            import torch.nn.functional as F

            embs = [self.emb[k](cats[k]) for k in EMB_DIMS]
            x0 = torch.cat([dense] + embs + [self.feed_emb(target)], dim=1)
            inputs = [x0] * (self.n_tasks + 1)
            for level in range(self.levels):
                last = level == self.levels - 1
                task_ex = [
                    torch.stack([e(inputs[ti]) for e in
                                 self.experts[level]["task"][ti]], dim=1)
                    for ti in range(self.n_tasks)
                ]
                shared_ex = torch.stack(
                    [e(inputs[-1]) for e in self.experts[level]["shared"]],
                    dim=1,
                )
                new_inputs = []
                for ti in range(self.n_tasks):
                    pool = torch.cat([task_ex[ti], shared_ex], dim=1)
                    g = F.softmax(
                        self.gates[level]["task"][ti](inputs[ti]), dim=-1
                    )
                    new_inputs.append(torch.einsum("be,beh->bh", g, pool))
                if not last:
                    pool = torch.cat(task_ex + [shared_ex], dim=1)
                    g = F.softmax(
                        self.gates[level]["shared"](inputs[-1]), dim=-1
                    )
                    new_inputs.append(torch.einsum("be,beh->bh", g, pool))
                else:
                    new_inputs.append(new_inputs[-1])
                inputs = new_inputs
            outs = [
                tower(inputs[ti]).squeeze(1)
                for ti, tower in enumerate(self.towers)
            ]
            return torch.stack(outs, dim=1)  # (B, n_tasks)

    class TorchFwFM(nn.Module):
        """Reference FwFM structure (fwfm.py:87-139): 6 categorical fields
        (no dense), per-field dim-1 linear tables + per-pair weight
        r_p * <v_i, v_j> + global bias. Mirrors rank_tpu
        models/fm_family.FwFM (ops/fm.py:fwfm_interaction)."""

        def __init__(self, d=16):
            super().__init__()
            self.lin = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], 1) for k in FM_FIELDS}
            )
            self.emb = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], d) for k in FM_FIELDS}
            )
            f = len(FM_FIELDS)
            self.idx_i, self.idx_j = map(
                list, np.triu_indices(f, k=1)
            )
            self.r = nn.Parameter(torch.randn(len(self.idx_i)))
            self.bias = nn.Parameter(torch.zeros(1))

        def forward(self, cats):
            import torch

            lin = sum(self.lin[k](cats[k]) for k in FM_FIELDS)  # (B, 1)
            embs = torch.stack(
                [self.emb[k](cats[k]) for k in FM_FIELDS], dim=1
            )
            dots = (embs[:, self.idx_i] * embs[:, self.idx_j]).sum(-1)  # (B,P)
            quad = (dots * self.r[None]).sum(-1, keepdim=True)
            return (lin + quad + self.bias).squeeze(1)

    class TorchFFM(nn.Module):
        """FFM (README-only, README.md:19; Juan et al. 2016) mirroring
        rank_tpu models/fm_family.FFM: 6 fields, per-field linear + field-
        aware tables vocab x (F*E), pair term <v_{i,f_j}, v_{j,f_i}>."""

        def __init__(self, d=8):
            super().__init__()
            f = len(FM_FIELDS)
            self.d, self.f = d, f
            self.lin = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], 1) for k in FM_FIELDS}
            )
            self.fa = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], f * d) for k in FM_FIELDS}
            )
            self.idx_i, self.idx_j = map(list, np.triu_indices(f, k=1))
            self.bias = nn.Parameter(torch.zeros(1))

        def forward(self, cats):
            import torch

            lin = sum(self.lin[k](cats[k]) for k in FM_FIELDS)
            fa = torch.stack(
                [
                    self.fa[k](cats[k]).view(-1, self.f, self.d)
                    for k in FM_FIELDS
                ],
                dim=1,
            )  # (B, F, F_partner, E)
            vi = fa[:, self.idx_i, self.idx_j, :]
            vj = fa[:, self.idx_j, self.idx_i, :]
            quad = (vi * vj).sum((1, 2)).unsqueeze(1)
            return (lin + quad + self.bias).squeeze(1)

    class TorchPNN(nn.Module):
        """PNN inner mode (README-only, README.md:21; Qu et al. 2016)
        mirroring rank_tpu models/fm_family.PNN: 7 dim-16 fields (no
        dense), [flat embs ; pairwise inner products] -> BN tower."""

        def __init__(self, d=16):
            super().__init__()
            self.emb = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], d) for k in AFM_FIELDS}
            )
            f = len(AFM_FIELDS)
            self.idx_i, self.idx_j = map(list, np.triu_indices(f, k=1))
            layers, dim = [], d * f + len(self.idx_i)
            for h in (512, 256, 128):
                layers += [
                    nn.Linear(dim, h), nn.BatchNorm1d(h),
                    nn.ReLU(), nn.Dropout(0.1),
                ]
                dim = h
            layers.append(nn.Linear(dim, 1))
            self.dnn = nn.Sequential(*layers)

        def forward(self, cats):
            import torch

            embs = torch.stack(
                [self.emb[k](cats[k]) for k in AFM_FIELDS], dim=1
            )
            inner = (embs[:, self.idx_i] * embs[:, self.idx_j]).sum(-1)
            x = torch.cat([embs.reshape(embs.shape[0], -1), inner], dim=1)
            return self.dnn(x).squeeze(1)

    class TorchWideDeep(nn.Module):
        """Wide&Deep (README-only, README.md:22; Cheng et al. 2016)
        mirroring rank_tpu models/fm_family.WideDeep: wide = 7-field dim-1
        linear + Linear(dense); deep = [dense ; per-field-dim embs] -> BN
        tower -> Linear(1); logit = wide + deep. Scalar tag lookup on both
        sides (parity_check SCALAR_TAG_MODELS)."""

        def __init__(self):
            super().__init__()
            self.wide = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], 1) for k in AFM_FIELDS}
            )
            self.wide_dense = nn.Linear(16, 1)
            self.emb = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], d) for k, d in EMB_DIMS.items()}
            )
            layers, dim = [], 16 + sum(EMB_DIMS.values())
            for h in (512, 256, 128):
                layers += [
                    nn.Linear(dim, h), nn.BatchNorm1d(h),
                    nn.ReLU(), nn.Dropout(0.1),
                ]
                dim = h
            self.dnn = nn.Sequential(*layers)
            self.deep_out = nn.Linear(dim, 1)

        def forward(self, dense, cats):
            import torch

            wide = sum(self.wide[k](cats[k]) for k in AFM_FIELDS)
            wide = wide + self.wide_dense(dense)
            embs = [self.emb[k](cats[k]) for k in EMB_DIMS]
            deep = self.deep_out(self.dnn(torch.cat([dense] + embs, dim=1)))
            return (wide + deep).squeeze(1)

    class TorchFiBiNet(nn.Module):
        """FiBiNet (README-only, README.md:30; Huang et al. RecSys 2019)
        mirroring rank_tpu models/cross_family.FiBiNet: 7 dim-16 fields,
        SENET (mean squeeze, F->F//3->F ReLU excitation, no bias),
        per-pair bilinear W_ij on raw + SENET embs, concat with dense into
        the BN tower."""

        def __init__(self, d=16, reduction=3):
            super().__init__()
            self.emb = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], d) for k in AFM_FIELDS}
            )
            f = len(AFM_FIELDS)
            self.idx_i, self.idx_j = map(list, np.triu_indices(f, k=1))
            p = len(self.idx_i)
            mid = max(1, f // reduction)
            self.se1 = nn.Linear(f, mid, bias=False)
            self.se2 = nn.Linear(mid, f, bias=False)
            self.w_raw = nn.Parameter(torch.empty(p, d, d))
            self.w_se = nn.Parameter(torch.empty(p, d, d))
            nn.init.xavier_uniform_(self.w_raw)
            nn.init.xavier_uniform_(self.w_se)
            layers, dim = [], 16 + 2 * p * d
            for h in (512, 256, 128):
                layers += [
                    nn.Linear(dim, h), nn.BatchNorm1d(h),
                    nn.ReLU(), nn.Dropout(0.1),
                ]
                dim = h
            layers.append(nn.Linear(dim, 1))
            self.dnn = nn.Sequential(*layers)

        def _bilinear(self, embs, w):
            import torch

            vi = embs[:, self.idx_i]  # (B, P, D)
            left = torch.einsum("bpd,pde->bpe", vi, w)
            return left * embs[:, self.idx_j]

        def forward(self, dense, cats):
            import torch
            import torch.nn.functional as F

            embs = torch.stack(
                [self.emb[k](cats[k]) for k in AFM_FIELDS], dim=1
            )
            a = F.relu(self.se2(F.relu(self.se1(embs.mean(-1)))))
            se_embs = embs * a.unsqueeze(-1)
            p1 = self._bilinear(embs, self.w_raw).flatten(1)
            p2 = self._bilinear(se_embs, self.w_se).flatten(1)
            return self.dnn(torch.cat([dense, p1, p2], dim=1)).squeeze(1)

    class TorchAutoInt(nn.Module):
        """AutoInt (reference to-do, README.md:61; Song et al. CIKM 2019)
        mirroring rank_tpu models/cross_family.AutoInt + ops/autoint.py:
        7 dim-16 cat fields + 16 numerics embedded as value * learned
        vector; 3 interacting layers (2 heads, d'=32, unscaled softmax per
        the paper, bias-free projections, residual W_res, ReLU); logit =
        Linear(flatten)."""

        def __init__(self, d=16, layers=3, heads=2, da=32):
            super().__init__()
            self.h, self.da = heads, da
            self.emb = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], d) for k in AFM_FIELDS}
            )
            # per-feature numeric standardization, mirroring rank_tpu's
            # AutoInt dense_bn (paper-normalized inputs; unscaled log1p
            # aggregates saturate the interacting softmax at full scale)
            self.dense_bn = nn.BatchNorm1d(16, momentum=0.01)
            self.dense_emb = nn.Parameter(torch.randn(16, d))
            dims = [d] + [heads * da] * layers
            self.wq = nn.ModuleList(
                [nn.Linear(dims[i], heads * da, bias=False) for i in range(layers)]
            )
            self.wk = nn.ModuleList(
                [nn.Linear(dims[i], heads * da, bias=False) for i in range(layers)]
            )
            self.wv = nn.ModuleList(
                [nn.Linear(dims[i], heads * da, bias=False) for i in range(layers)]
            )
            self.wres = nn.ModuleList(
                [nn.Linear(dims[i], heads * da, bias=False) for i in range(layers)]
            )
            f = len(AFM_FIELDS) + 16
            self.out = nn.Linear(f * heads * da, 1)

        def forward(self, dense, cats):
            import torch
            import torch.nn.functional as F

            cat_e = torch.stack(
                [self.emb[k](cats[k]) for k in AFM_FIELDS], dim=1
            )
            dense_e = self.dense_bn(dense).unsqueeze(-1) * self.dense_emb[None]
            e = torch.cat([cat_e, dense_e], dim=1)  # (B, F, D)
            b, f, _ = e.shape
            for wq, wk, wv, wres in zip(self.wq, self.wk, self.wv, self.wres):
                q = wq(e).view(b, f, self.h, self.da)
                k = wk(e).view(b, f, self.h, self.da)
                v = wv(e).view(b, f, self.h, self.da)
                s = torch.einsum("bfhd,bghd->bhfg", q, k)  # unscaled
                w = F.softmax(s, dim=-1)
                o = torch.einsum("bhfg,bghd->bfhd", w, v).reshape(b, f, -1)
                e = F.relu(o + wres(e))
            return self.out(e.flatten(1)).squeeze(1)

    class TorchFLEN(nn.Module):
        """FLEN (reference to-do, README.md:61; Feng et al. 2020)
        mirroring rank_tpu models/fm_family.FLEN: field groups
        (userid,device | feedid,authorid,bgm_song,bgm_singer | tags),
        S = per-field dim-1 linear + Linear(dense); FwBI = r_inter-weighted
        group-sum pair products + r_intra-weighted intra-group
        bi-interaction; MLP = [dense ; flat embs] -> BN tower; logit =
        Linear([h_S ; h_FwBI ; h_MLP])."""

        GROUPS = (
            ("userid", "device"),
            ("feedid", "authorid", "bgm_song_id", "bgm_singer_id"),
            ("manual_tag_list",),
        )

        def __init__(self, d=16):
            super().__init__()
            self.fields = tuple(f for g in self.GROUPS for f in g)
            self.slices, start = [], 0
            for g in self.GROUPS:
                self.slices.append((start, start + len(g)))
                start += len(g)
            self.emb = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], d) for k in self.fields}
            )
            self.lin = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], 1) for k in self.fields}
            )
            self.dense_linear = nn.Linear(16, 1)
            m = len(self.GROUPS)
            self.r_intra = nn.Parameter(torch.ones(m))
            self.r_inter = nn.Parameter(torch.ones(m * (m - 1) // 2))
            self.gi, self.gj = map(list, np.triu_indices(m, k=1))
            layers, dim = [], 16 + d * len(self.fields)
            for h in (512, 256, 128):
                layers += [
                    nn.Linear(dim, h), nn.BatchNorm1d(h),
                    nn.ReLU(), nn.Dropout(0.1),
                ]
                dim = h
            self.dnn = nn.Sequential(*layers)
            self.final = nn.Linear(1 + d + dim, 1)

        def forward(self, dense, cats):
            import torch

            emb = torch.stack(
                [self.emb[k](cats[k]) for k in self.fields], dim=1
            )  # (B, F, D)
            h_s = sum(self.lin[k](cats[k]) for k in self.fields)
            h_s = h_s + self.dense_linear(dense)
            gs = torch.stack(
                [emb[:, a:b].sum(1) for a, b in self.slices], dim=1
            )  # (B, M, D)
            h_mf = (
                gs[:, self.gi] * gs[:, self.gj]
                * self.r_inter[None, :, None]
            ).sum(1)
            h_fm = 0.0
            for m, (a, b) in enumerate(self.slices):
                g = emb[:, a:b]
                bi = 0.5 * (g.sum(1).square() - g.square().sum(1))
                h_fm = h_fm + self.r_intra[m] * bi
            h_mlp = self.dnn(
                torch.cat([dense, emb.flatten(1)], dim=1)
            )
            out = torch.cat([h_s, h_mf + h_fm, h_mlp], dim=1)
            return self.final(out).squeeze(1)

    class TorchESMM(nn.Module):
        """ESMM (README-only, README.md:40; Ma et al. SIGIR'18) mirroring
        rank_tpu models/multitask.ESMM: shared input = [dense ; field
        embs ; target feedid emb]; two plain-ReLU towers (256,128,64);
        returns (B, 2) probs [p_ctr, p_ctcvr = p_ctr * p_cvr] — trained
        with BCE on probs (the CTCVR head is a product of probabilities)."""

        def __init__(self):
            super().__init__()
            self.emb = nn.ModuleDict(
                {k: nn.Embedding(VOCABS[k], d) for k, d in EMB_DIMS.items()}
            )
            self.feed_emb = nn.Embedding(VOCABS["feedid"], 16)
            d0 = 16 + sum(EMB_DIMS.values()) + 16

            def tower():
                return nn.Sequential(
                    nn.Linear(d0, 256), nn.ReLU(),
                    nn.Linear(256, 128), nn.ReLU(),
                    nn.Linear(128, 64), nn.ReLU(),
                    nn.Linear(64, 1),
                )

            self.ctr_tower = tower()
            self.cvr_tower = tower()

        def forward(self, dense, cats, target):
            import torch

            embs = [self.emb[k](cats[k]) for k in EMB_DIMS]
            x0 = torch.cat([dense] + embs + [self.feed_emb(target)], dim=1)
            p_ctr = torch.sigmoid(self.ctr_tower(x0).squeeze(1))
            p_ctcvr = p_ctr * torch.sigmoid(self.cvr_tower(x0).squeeze(1))
            return torch.stack([p_ctr, p_ctcvr], dim=1)

    return {"dcn": TorchDCN, "bst": TorchBST, "din": TorchDIN,
            "mmoe": TorchMMOE, "deepfm": TorchDeepFM,
            "deepcrossing": TorchDeepCrossing, "afm": TorchAFM,
            "xdeepfm": TorchXDeepFM, "dien": TorchDIEN, "ple": TorchPLE,
            "fwfm": TorchFwFM, "ffm": TorchFFM, "pnn": TorchPNN,
            "widedeep": TorchWideDeep, "fibinet": TorchFiBiNet,
            "autoint": TorchAutoInt, "flen": TorchFLEN, "esmm": TorchESMM}


def bench_torch(model_name: str) -> float:
    import torch

    torch.manual_seed(0)
    # pin the thread count: the shared-pool CPU made the baseline swing
    # ~1.7x between rounds (BENCH_r01 93,909 vs BENCH_r02 56,302 ex/s for
    # DCN) when left at torch's load-dependent default (VERDICT r2 weak
    # #6). 2 threads (the actual quota here) measured 55-65k ex/s across
    # fresh processes; oversubscribing (8 threads on 2 cores) tanks it to
    # ~30k — unfair. sched_getaffinity respects cgroup/affinity limits
    # where os.cpu_count reports host logical cores (ADVICE r3).
    try:
        avail = len(os.sched_getaffinity(0)) or 1
    except AttributeError:  # non-Linux fallback
        avail = os.cpu_count() or 1
    torch.set_num_threads(
        int(os.environ.get("BENCH_TORCH_THREADS", str(avail)))
    )
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
    elif model_name == "bst":
        seq = torch.tensor(
            rng.integers(0, VOCABS["feedid"], size=(b, HIST_LEN + 1)),
            dtype=torch.long,
        )
        lengths = torch.tensor(
            rng.integers(1, HIST_LEN + 1, size=b), dtype=torch.long
        )
        model = TorchBST()
        args = (dense, cats, seq, lengths)
    else:
        # explicit dispatch only: silently benchmarking the wrong mirror
        # would corrupt the vs_baseline number (ADVICE r1)
        raise ValueError(
            f"bench_torch has no input builder for {model_name!r}; "
            "supported: dcn, bst (quality mirrors for other models live in "
            "scripts/parity_check.py)"
        )
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
    # median of 5 timed windows: robust to shared-pool scheduling spikes
    # (a single window's baseline is not a stable denominator)
    rates = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(TORCH_STEPS):
            step()
        dt = time.perf_counter() - t0
        rates.append(b * TORCH_STEPS / dt)
    return float(np.median(rates))


def main():
    results = {}
    for model in ("dcn", "bst"):
        jax_eps, mfu = bench_jax(model)
        torch_eps = bench_torch(model)
        results[model] = {
            "jax_tpu": jax_eps,
            "torch_cpu": torch_eps,
            "speedup": jax_eps / torch_eps,
            "mfu": mfu,
        }
        roof = (
            f"  mfu={mfu['mfu_pct']}% xla_hbm_bw={mfu['hbm_bw_pct']}% "
            "(XLA-cost-model bytes overcount real traffic ~12x/2.7x — "
            "the step is issue-bound; BYTES_r05.json, MFU_r05.json)"
            if mfu
            else ""
        )
        print(
            f"# {model}: jax_tpu={jax_eps:,.0f} ex/s  "
            f"torch_cpu={torch_eps:,.0f} ex/s  x{jax_eps/torch_eps:.1f}{roof}",
            file=sys.stderr,
        )
    value = float(np.sqrt(results["dcn"]["jax_tpu"] * results["bst"]["jax_tpu"]))
    vs = float(np.sqrt(results["dcn"]["speedup"] * results["bst"]["speedup"]))
    threads = os.environ.get("BENCH_TORCH_THREADS", str(os.cpu_count() or 1))
    print(
        "# vs_baseline denominator: torch-CPU median-of-5 windows at "
        f"{threads} pinned threads; historical multiplier range across "
        "rounds ~49-65x (BENCH_r01 unpinned 93.9k vs r02 56.3k dcn ex/s — "
        "the shared pool moved the denominator, not the TPU numerator)",
        file=sys.stderr,
    )
    def _mfu_key(key):
        return {
            m: (round(results[m]["mfu"][key], 2) if results[m]["mfu"] else None)
            for m in results
        }

    print(
        json.dumps(
            {
                "metric": "train_examples_per_s_per_chip_dcn_bst_geomean",
                "value": round(value, 1),
                "unit": "examples/s/chip",
                "vs_baseline": round(vs, 2),
                # roofline context: mfu vs the v5e MXU peak; hbm_bw_pct
                # is vs XLA's cost-model bytes, which round 5 showed
                # OVERCOUNT real HBM traffic ~12x (DCN) / 2.7x (BST) by
                # counting fusion-internal tensors — real traffic puts
                # both steps issue-bound, not bandwidth-bound
                # (BYTES_r05.json / MFU_r05.json; scripts/bytes_breakdown.py)
                "mfu_pct": _mfu_key("mfu_pct"),
                "hbm_bw_pct": _mfu_key("hbm_bw_pct"),
            }
        )
    )


if __name__ == "__main__":
    main()
