"""BST transformer block.

Parity target: ``algorithm/BST/bst.py:42-91`` (class variant, the one the
model actually uses — the functional copy ``transformer_layer.py`` has the
fresh-params-per-call bug and is dead code):

  * learned positional embedding of size ``max_len`` added to Q and K
    inputs (not V), ``bst.py:68-71``;
  * multi-head attention with key-padding mask;
  * residual + LayerNorm, then FFN (d -> d with LeakyReLU) + residual +
    LayerNorm.

Divergence from the reference (documented): a fully-padded row would give
torch's softmax NaN (all scores -inf); our masked softmax yields zero
attention output instead, so zero-length histories are well-defined.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .attention import masked_softmax, masked_softmax_lowp
from .mlp import dense_init_kwargs


class BSTTransformerBlock(nn.Module):
    d_model: int
    num_heads: int
    max_len: int
    dropout_rate: float = 0.1
    # activation dtype inside the block. At d_model=16 every (B*T, 16)
    # tensor occupies 16 of 128 lanes, so traffic is ~8x padded and the
    # block is bandwidth-bound; bfloat16 halves the padded bytes
    # (measured: 15.2 -> 9.5 ms/block fwd+bwd at B=8192, T=51).
    # Softmax and LayerNorms stay in float32.
    compute_dtype: str = "bfloat16"
    # attention formulation: 'vpu' computes scores/context as
    # broadcast-multiply + reduce (VPU work) instead of per-(batch, head)
    # batched matmuls — at T=51, d_head=8 the einsum form issues B*h tiny
    # (51x8)@(8x51) MXU ops at <1% utilisation and is issue-rate-bound
    # (measured: vpu 8.7 vs einsum 10.1 ms/block fwd+bwd at B=8192,
    # bit-identical loss; scripts/bench_bst_variants.py). 'einsum' keeps
    # the classic batched-matmul form (better for d_head >= 128).
    attn_impl: str = "vpu"
    # dtype of the (B,T,T)-sized score/weight tensors in the vpu path:
    # 'bfloat16' keeps score STORAGE low-precision with f32 softmax
    # reductions (masked_softmax_lowp) — at T=51 the lane dim pads to 128
    # so these tensors dominate the block's HBM traffic and halving them
    # is the VERDICT-r1 "remaining headroom" lever; 'float32' is the
    # reference-faithful default.
    score_dtype: str = "float32"
    dense_init: str = "lecun"  # lecun | torch (ops/mlp.py dense_init_kwargs)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,          # (B, T, D) sequence embeddings
        key_valid: jnp.ndarray,  # (B, T) True where the position is real
        train: bool = False,
    ) -> jnp.ndarray:
        b, t, d = x.shape
        h = self.num_heads
        assert d % h == 0, f"d_model {d} not divisible by heads {h}"
        dh = d // h
        cdt = jnp.dtype(self.compute_dtype)

        pos_emb = nn.Embed(self.max_len, d, name="position_embedding")
        positions = jnp.arange(t)
        pe = pos_emb(positions)[None, :, :]
        queries = (x + pe).astype(cdt)
        keys = queries
        values = x.astype(cdt)  # positions on Q/K only (bst.py:70-71)

        # every Dense in the block is d -> d, so fan_in is d throughout
        dense = lambda name: nn.Dense(
            d, name=name, dtype=cdt, **dense_init_kwargs(self.dense_init, d)
        )
        q = dense("w_q")(queries)
        k = dense("w_k")(keys)
        v = dense("w_v")(values)
        inv_sqrt_dh = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))

        if self.attn_impl == "vpu2":
            # head-VECTORIZED broadcast-multiply form: one tensor for all
            # heads ((B,T,T,h) scores, heads on the minor axis) instead
            # of the per-head python loop — built to remove the ~2.7
            # GB/step of per-head slice/concat layout copies BYTES_r05
            # attributed to the 'vpu' loop. MEASURED AND REFUTED as a
            # speedup: interleaved A/B at B=8192 gives vpu 327k ex/s,
            # vpu2 277k (0.85x), einsum 290k (ATTNIMPL_r05.json) — the
            # h-minor (B,T,T,h) layout pads h=2 onto 128 lanes, costing
            # more than the removed copies, and the step is issue-bound
            # anyway (MFU_r05.json). Kept as a tested pattern; 'vpu'
            # stays the default. Same math as 'vpu'.
            lowp_scores = self.score_dtype == "bfloat16" and cdt != jnp.float32
            q4 = q.reshape(b, t, h, dh)
            k4 = k.reshape(b, t, h, dh)
            v4 = v.reshape(b, t, h, dh)
            sc = jnp.sum(
                q4[:, :, None, :, :] * k4[:, None, :, :, :], axis=-1
            )  # (B, Tq, Tk, h)
            mask4 = key_valid[:, None, :, None]  # over queries & heads
            if lowp_scores:
                sc = sc * jnp.asarray(inv_sqrt_dh, cdt)
                w = masked_softmax_lowp(
                    sc, jnp.broadcast_to(mask4, sc.shape), axis=2
                )
            else:
                sc = sc.astype(jnp.float32) * inv_sqrt_dh
                w = masked_softmax(
                    sc, jnp.broadcast_to(mask4, sc.shape), axis=2
                ).astype(cdt)
            context = jnp.sum(
                w[..., None] * v4[:, None, :, :, :], axis=2
            )  # (B, Tq, h, dh)
            context = context.reshape(b, t, d)
        elif self.attn_impl == "vpu":
            lowp_scores = self.score_dtype == "bfloat16" and cdt != jnp.float32
            mask2 = key_valid[:, None, :]  # (B, 1, T) over queries
            ctxs = []
            for hh in range(h):
                sl = slice(hh * dh, (hh + 1) * dh)
                sc = jnp.sum(q[:, :, None, sl] * k[:, None, :, sl], axis=-1)
                if lowp_scores:
                    sc = sc * jnp.asarray(inv_sqrt_dh, cdt)
                    w = masked_softmax_lowp(
                        sc, jnp.broadcast_to(mask2, sc.shape)
                    )
                else:
                    sc = sc.astype(jnp.float32) * inv_sqrt_dh
                    w = masked_softmax(
                        sc, jnp.broadcast_to(mask2, sc.shape)
                    ).astype(cdt)
                ctxs.append(
                    jnp.sum(w[..., None] * v[:, None, :, sl], axis=2)
                )
            context = jnp.concatenate(ctxs, axis=-1)
        else:
            q4 = q.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
            k4 = k.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
            v4 = v.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
            scores = jnp.einsum("bhqd,bhkd->bhqk", q4, k4).astype(
                jnp.float32
            ) * inv_sqrt_dh
            mask = key_valid[:, None, None, :]  # broadcast over heads & queries
            weights = masked_softmax(scores, jnp.broadcast_to(mask, scores.shape))
            context = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(cdt), v4)
            context = context.transpose(0, 2, 1, 3).reshape(b, t, d)

        out = dense("w_o")(context)
        out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
        h1 = nn.LayerNorm(name="norm1", dtype=jnp.float32)(
            (queries + out).astype(jnp.float32)
        ).astype(cdt)

        ffn = dense("ffn_1")(h1)
        ffn = nn.leaky_relu(ffn, negative_slope=0.01)
        ffn = nn.Dropout(self.dropout_rate, deterministic=not train)(ffn)
        ffn = dense("ffn_2")(ffn)
        ffn = nn.Dropout(self.dropout_rate, deterministic=not train)(ffn)
        return nn.LayerNorm(name="norm2", dtype=jnp.float32)(
            (h1 + ffn).astype(jnp.float32)
        )
