"""Compressed Interaction Network (xDeepFM).

No reference code exists (xDeepFM is a README-only model, README.md:26);
implemented from Lian et al., KDD 2018.

Layer k maps X^k (B, H_k, D) to X^{k+1} (B, H_{k+1}, D):
    Z^{k+1}_{:,h,f,:} = X^k outer X^0 along fields at each dim d
    X^{k+1}_{:,o,:}   = sum_{h,f} W^{k+1}_{o,h,f} * X^k_{:,h,:} * X^0_{:,f,:}

Written as two einsum contractions so XLA maps them onto the MXU instead of
the per-dim 1x1-conv loop most torch implementations use.

backend: 'jnp' (pure XLA), 'pallas' (fused layer kernel,
ops/pallas/cin.py — avoids materialising the (B,H,F,D) intermediate in
HBM; the whole stack runs in the kernel's transposed (B,D,·) layout so no
per-layer transposes hit HBM), or 'auto' (pallas on TPU with per-layer
size-based dispatch, jnp elsewhere).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class CIN(nn.Module):
    layer_sizes: Sequence[int] = (128, 128)
    split_half: bool = True  # per paper: half of each hidden layer feeds forward
    backend: str = "auto"

    @nn.compact
    def __call__(self, x0: jnp.ndarray) -> jnp.ndarray:
        """x0: (B, F, D) field embeddings -> (B, sum of pooled map counts)."""
        b, f, d = x0.shape
        pooled = []
        xk = x0
        backend = self.backend
        if backend == "auto":
            # pallas only where the fused layer can win (TPU + big enough
            # intermediate — cin_layer_auto re-checks per layer); the axon
            # tunnel backend compiles TPU programs too.
            import jax

            backend = (
                "pallas" if jax.default_backend() in ("tpu", "axon") else "jnp"
            )
        if backend == "pallas":
            from .pallas.cin import cin_layer_auto_t

            # transposed (B, D, ·) layout throughout: feature-map axis on
            # lanes, one small transpose of x0 at entry, none between layers
            x0_t = x0.transpose(0, 2, 1)  # (B, D, F)
            xk_t = x0_t
            for li, size in enumerate(self.layer_sizes):
                hk = xk_t.shape[2]
                w = self.param(
                    f"w_{li}", nn.initializers.xavier_uniform(), (size, hk, f)
                )
                xnext_t = cin_layer_auto_t(xk_t, x0_t, w)  # (B, D, size)
                if self.split_half and li < len(self.layer_sizes) - 1:
                    if size % 2:
                        raise ValueError("split_half requires even CIN layer sizes")
                    next_in, direct = jnp.split(xnext_t, 2, axis=2)
                else:
                    next_in, direct = xnext_t, xnext_t
                pooled.append(jnp.sum(direct, axis=1))  # sum over D -> (B, maps)
                xk_t = next_in
            return jnp.concatenate(pooled, axis=-1)

        for li, size in enumerate(self.layer_sizes):
            hk = xk.shape[1]
            w = self.param(
                f"w_{li}", nn.initializers.xavier_uniform(), (size, hk, f)
            )
            # (B,hk,D) x (B,F,D) -> (B,hk,F,D); contract with (size,hk,F)
            z = jnp.einsum("bhd,bfd->bhfd", xk, x0)
            xnext = jnp.einsum("bhfd,ohf->bod", z, w)
            if self.split_half and li < len(self.layer_sizes) - 1:
                if size % 2:
                    raise ValueError("split_half requires even CIN layer sizes")
                next_in, direct = jnp.split(xnext, 2, axis=1)
            else:
                next_in, direct = xnext, xnext
            pooled.append(jnp.sum(direct, axis=-1))  # sum over D -> (B, maps)
            xk = next_in
        return jnp.concatenate(pooled, axis=-1)
