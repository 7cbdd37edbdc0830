"""GRU / AGRU / AUGRU over behaviour sequences via ``lax.scan``.

Replaces the reference's 1454-line fork of TF1 ``dynamic_rnn``
(``algorithm/DIEN/rnn.py:443-813``) that threads per-step attention scores
through a ``tf.while_loop``, plus the AGRU/AUGRU cells in
``algorithm/DIEN/custom_grucell.py:19-167``:

  * GRU:   u = sigmoid(Wu.[x,h]); r = sigmoid(Wr.[x,h]);
           c = tanh(Wc.[x, r*h]); h' = (1-u)*h + u*c
  * AGRU:  h' = (1-a)*h + a*c           (update gate replaced by the
           scalar attention score a; custom_grucell.py:19-91)
  * AUGRU: u' = a*u; h' = (1-u')*h + u'*c  (custom_grucell.py:94-167)

Padded timesteps (t >= length) carry the previous hidden state through,
matching ``dynamic_rnn``'s sequence_length semantics (rnn.py:443+): outputs
at padded steps are zero and the final state is the state at step
``length-1``.

Parameters are created eagerly with ``self.param`` and the recurrence is a
plain ``jax.lax.scan`` over time — XLA compiles the step once and the gate
matmuls are fused ([update;reset] in one kernel) for the MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class AttentionalGRU(nn.Module):
    """A GRU layer whose update rule can be modulated by attention scores.

    mode: 'gru' (plain), 'agru', or 'augru'. For 'agru'/'augru',
    ``att_scores`` of shape (B, T) must be provided.
    """

    hidden_dim: int
    mode: str = "gru"
    # lax.scan unroll factor: trades compile time/code size for fewer
    # sequential loop iterations (T=50 is latency-bound on TPU)
    unroll: int = 1

    @nn.compact
    def __call__(
        self,
        inputs: jnp.ndarray,                # (B, T, D)
        lengths: jnp.ndarray,               # (B,)
        att_scores: Optional[jnp.ndarray] = None,  # (B, T)
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (outputs (B, T, H), final_state (B, H))."""
        b, t, d = inputs.shape
        h_dim = self.hidden_dim
        if self.mode in ("agru", "augru") and att_scores is None:
            raise ValueError(f"mode {self.mode!r} requires att_scores")

        init = nn.initializers.xavier_uniform()
        # Fused [update; reset] gate kernel + candidate kernel.
        wg = self.param("gates_kernel", init, (d + h_dim, 2 * h_dim))
        bg = self.param("gates_bias", nn.initializers.zeros, (2 * h_dim,))
        wc = self.param("candidate_kernel", init, (d + h_dim, h_dim))
        bc = self.param("candidate_bias", nn.initializers.zeros, (h_dim,))
        mode = self.mode

        def step(h, xs):
            x_t, a_t, valid_t = xs  # (B,D), (B,), (B,)
            gates = jax.nn.sigmoid(jnp.concatenate([x_t, h], axis=-1) @ wg + bg)
            u, r = jnp.split(gates, 2, axis=-1)
            c = jnp.tanh(jnp.concatenate([x_t, r * h], axis=-1) @ wc + bc)
            if mode == "agru":
                a = a_t[:, None]
                h_new = (1.0 - a) * h + a * c
            elif mode == "augru":
                u = a_t[:, None] * u
                h_new = (1.0 - u) * h + u * c
            else:
                h_new = (1.0 - u) * h + u * c
            valid = valid_t[:, None]
            h_new = jnp.where(valid, h_new, h)
            out = jnp.where(valid, h_new, jnp.zeros_like(h_new))
            return h_new, out

        if att_scores is None:
            att_scores = jnp.zeros((b, t), inputs.dtype)
        valid = jnp.arange(t)[None, :] < lengths[:, None]

        h0 = jnp.zeros((b, h_dim), inputs.dtype)
        xs = (
            jnp.moveaxis(inputs, 1, 0),      # (T, B, D)
            jnp.moveaxis(att_scores, 1, 0),  # (T, B)
            jnp.moveaxis(valid, 1, 0),       # (T, B)
        )
        final, outs = jax.lax.scan(step, h0, xs, unroll=self.unroll)
        return jnp.moveaxis(outs, 0, 1), final
