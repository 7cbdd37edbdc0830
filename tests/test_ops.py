"""Unit tests for interaction ops against NumPy oracles.

The reference has no test suite (SURVEY.md section 4); its op files only
carry __main__ smoke tests. Here every op is checked against a
straightforward NumPy implementation, including the zero-length-sequence
edge case the reference's own DIN smoke test exercises
(algorithm/DIN/din_attention.py:60).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rank_tpu import ops

jax.config.update("jax_enable_x64", False)


def _init(module, *args, **kwargs):
    variables = module.init(jax.random.PRNGKey(0), *args, **kwargs)
    return variables


class TestFM:
    def test_second_order_oracle(self):
        rng = np.random.default_rng(0)
        emb = rng.normal(size=(5, 6, 8)).astype(np.float32)
        # oracle: explicit sum over pairs of <v_i, v_j>
        want = np.zeros((5,), np.float32)
        for i in range(6):
            for j in range(i + 1, 6):
                want += np.sum(emb[:, i] * emb[:, j], axis=-1)
        got = ops.fm_second_order(jnp.asarray(emb))[:, 0]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_first_order(self):
        w = np.arange(12, dtype=np.float32).reshape(3, 4)
        got = ops.fm_first_order(jnp.asarray(w))
        np.testing.assert_allclose(got[:, 0], w.sum(axis=1))

    def test_pairwise_hadamard_count(self):
        emb = jnp.ones((2, 7, 3))
        out = ops.pairwise_hadamard(emb)
        assert out.shape == (2, 21, 3)

    def test_fwfm_oracle(self):
        rng = np.random.default_rng(1)
        emb = rng.normal(size=(4, 6, 5)).astype(np.float32)
        r = rng.normal(size=(15,)).astype(np.float32)
        want = np.zeros((4,), np.float32)
        p = 0
        for i in range(6):
            for j in range(i + 1, 6):
                want += r[p] * np.sum(emb[:, i] * emb[:, j], axis=-1)
                p += 1
        got = ops.fwfm_interaction(jnp.asarray(emb), jnp.asarray(r))[:, 0]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_ffm_oracle(self):
        rng = np.random.default_rng(2)
        fa = rng.normal(size=(3, 4, 4, 2)).astype(np.float32)
        want = np.zeros((3,), np.float32)
        for i in range(4):
            for j in range(i + 1, 4):
                want += np.sum(fa[:, i, j] * fa[:, j, i], axis=-1)
        got = ops.ffm_interaction(jnp.asarray(fa))[:, 0]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestCross:
    def test_cross_layer_formula(self):
        """x1 = x0*(x0.w) + b + x0 with registered (trained) params."""
        net = ops.CrossNetwork(num_layers=1)
        x0 = jnp.asarray(np.random.default_rng(0).normal(size=(3, 6)), jnp.float32)
        v = _init(net, x0)
        w = np.asarray(v["params"]["w_0"])
        b = np.asarray(v["params"]["b_0"])
        want = np.asarray(x0) * (np.asarray(x0) @ w) + b + np.asarray(x0)
        got = net.apply(v, x0)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_cross_params_receive_grads(self):
        """Guards against the reference bug (cross_layer.py:16-20) where
        weights were re-created each forward and never trained."""
        net = ops.CrossNetwork(num_layers=2)
        x0 = jnp.ones((4, 6))
        v = _init(net, x0)
        g = jax.grad(lambda p: jnp.sum(net.apply({"params": p}, x0)))(v["params"])
        for l in range(2):
            assert np.abs(np.asarray(g[f"w_{l}"])).sum() > 0

    def test_residual_unit(self):
        unit = ops.ResidualUnit(internal_dim=8)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 5)), jnp.float32)
        v = _init(unit, x)
        p = v["params"]
        w1, b1 = np.asarray(p["Dense_0"]["kernel"]), np.asarray(p["Dense_0"]["bias"])
        w2, b2 = np.asarray(p["Dense_1"]["kernel"]), np.asarray(p["Dense_1"]["bias"])
        h = np.maximum(np.asarray(x) @ w1 + b1, 0.0)
        want = np.maximum(np.asarray(x) + h @ w2 + b2, 0.0)
        got = unit.apply(v, x)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestDINAttention:
    def _run(self, use_softmax):
        rng = np.random.default_rng(0)
        q = rng.normal(size=(2, 4)).astype(np.float32)
        k = rng.normal(size=(2, 3, 4)).astype(np.float32)
        lengths = np.array([0, 2], np.int32)  # includes zero-length row
        att = ops.DINAttention(use_softmax=use_softmax)
        v = _init(att, jnp.asarray(q), jnp.asarray(k), jnp.asarray(lengths))
        out = att.apply(v, jnp.asarray(q), jnp.asarray(k), jnp.asarray(lengths))
        return np.asarray(out), v

    def test_zero_length_is_zero(self):
        out, _ = self._run(False)
        np.testing.assert_allclose(out[0], 0.0, atol=1e-6)
        out, _ = self._run(True)
        assert np.all(np.isfinite(out))
        np.testing.assert_allclose(out[0], 0.0, atol=1e-6)

    def test_softmax_weights_sum_to_one_on_valid(self):
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.normal(size=(3, 4)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 5, 4)), jnp.float32)
        lengths = jnp.asarray([5, 1, 3], jnp.int32)
        att = ops.DINAttention(use_softmax=True)
        v = _init(att, q, k, lengths)
        out = att.apply(v, q, k, lengths)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_masked_positions_ignored(self):
        """Changing key content beyond the valid length must not change
        the output."""
        rng = np.random.default_rng(4)
        q = jnp.asarray(rng.normal(size=(1, 4)), jnp.float32)
        k1 = rng.normal(size=(1, 6, 4)).astype(np.float32)
        k2 = k1.copy()
        k2[:, 3:] = 99.0
        lengths = jnp.asarray([3], jnp.int32)
        att = ops.DINAttention(use_softmax=True)
        v = _init(att, q, jnp.asarray(k1), lengths)
        o1 = att.apply(v, q, jnp.asarray(k1), lengths)
        o2 = att.apply(v, q, jnp.asarray(k2), lengths)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


class TestMaskedSoftmax:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        s = rng.normal(size=(4, 7)).astype(np.float32)
        mask = rng.random((4, 7)) > 0.3
        mask[0] = False  # fully-masked row
        got = np.asarray(ops.masked_softmax(jnp.asarray(s), jnp.asarray(mask)))
        for b in range(4):
            if not mask[b].any():
                np.testing.assert_allclose(got[b], 0.0)
                continue
            e = np.exp(s[b][mask[b]] - s[b][mask[b]].max())
            want = e / e.sum()
            np.testing.assert_allclose(got[b][mask[b]], want, rtol=1e-5)
            np.testing.assert_allclose(got[b][~mask[b]], 0.0)

    def test_lowp_matches_numpy_oracle(self):
        """Direct oracle for masked_softmax_lowp (CLAUDE.md convention:
        every op gets a NumPy-oracle test, not only block-level bf16-vs-f32
        comparisons): in f32 the low-precision path must reproduce the
        exact masked softmax, including zeroed masked slots and
        fully-masked rows -> all-zeros."""
        from rank_tpu.ops.attention import masked_softmax_lowp, softmax_lowp

        rng = np.random.default_rng(1)
        s = rng.normal(size=(5, 9)).astype(np.float32)
        mask = rng.random((5, 9)) > 0.3
        mask[0] = False  # fully-masked row
        got = np.asarray(masked_softmax_lowp(jnp.asarray(s), jnp.asarray(mask)))
        for b in range(5):
            if not mask[b].any():
                np.testing.assert_allclose(got[b], 0.0)
                continue
            e = np.exp(s[b][mask[b]] - s[b][mask[b]].max())
            want = e / e.sum()
            np.testing.assert_allclose(got[b][mask[b]], want, rtol=1e-5)
            np.testing.assert_allclose(got[b][~mask[b]], 0.0)
        # unmasked variant (AutoInt's): plain softmax oracle
        got_u = np.asarray(softmax_lowp(jnp.asarray(s)))
        e = np.exp(s - s.max(axis=-1, keepdims=True))
        np.testing.assert_allclose(
            got_u, e / e.sum(axis=-1, keepdims=True), rtol=1e-5
        )

    def test_lowp_bf16_storage_dtype_and_closeness(self):
        """In bf16 the storage dtype must stay bf16 end-to-end and track
        the f32 oracle to bf16 resolution (f32 reductions inside)."""
        from rank_tpu.ops.attention import masked_softmax_lowp

        rng = np.random.default_rng(2)
        s = rng.normal(size=(4, 8)).astype(np.float32)
        mask = rng.random((4, 8)) > 0.2
        got = masked_softmax_lowp(
            jnp.asarray(s, jnp.bfloat16), jnp.asarray(mask)
        )
        assert got.dtype == jnp.bfloat16
        oracle = np.asarray(
            ops.masked_softmax(jnp.asarray(s), jnp.asarray(mask))
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), oracle, atol=2e-2
        )


class TestRNN:
    def _np_gru_step(self, x, h, wg, bg, wc, bc):
        gates = 1 / (1 + np.exp(-(np.concatenate([x, h], -1) @ wg + bg)))
        u, r = np.split(gates, 2, axis=-1)
        c = np.tanh(np.concatenate([x, r * h], -1) @ wc + bc)
        return u, c

    @pytest.mark.parametrize("mode", ["gru", "agru", "augru"])
    def test_oracle(self, mode):
        rng = np.random.default_rng(0)
        b, t, d, hdim = 3, 5, 4, 6
        x = rng.normal(size=(b, t, d)).astype(np.float32)
        a = rng.random((b, t)).astype(np.float32)
        lengths = np.array([5, 0, 3], np.int32)
        cell = ops.AttentionalGRU(hidden_dim=hdim, mode=mode)
        v = _init(cell, jnp.asarray(x), jnp.asarray(lengths), jnp.asarray(a))
        outs, final = cell.apply(v, jnp.asarray(x), jnp.asarray(lengths), jnp.asarray(a))
        p = v["params"]
        wg, bg = np.asarray(p["gates_kernel"]), np.asarray(p["gates_bias"])
        wc, bc = np.asarray(p["candidate_kernel"]), np.asarray(p["candidate_bias"])
        h = np.zeros((b, hdim), np.float32)
        want_outs = np.zeros((b, t, hdim), np.float32)
        for step in range(t):
            u, c = self._np_gru_step(x[:, step], h, wg, bg, wc, bc)
            if mode == "agru":
                an = a[:, step][:, None]
                h_new = (1 - an) * h + an * c
            elif mode == "augru":
                un = a[:, step][:, None] * u
                h_new = (1 - un) * h + un * c
            else:
                h_new = (1 - u) * h + u * c
            valid = (step < lengths)[:, None]
            h = np.where(valid, h_new, h)
            want_outs[:, step] = np.where(valid, h, 0.0)
        np.testing.assert_allclose(np.asarray(outs), want_outs, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(final), h, rtol=1e-4, atol=1e-4)
        # zero-length row: final state stays zero
        np.testing.assert_allclose(np.asarray(final)[1], 0.0)


class TestCIN:
    def test_oracle_no_split(self):
        rng = np.random.default_rng(0)
        x0 = rng.normal(size=(2, 4, 3)).astype(np.float32)
        cin = ops.CIN(layer_sizes=(5,), split_half=False)
        v = _init(cin, jnp.asarray(x0))
        w = np.asarray(v["params"]["w_0"])  # (5, 4, 4)
        # oracle
        maps = np.zeros((2, 5, 3), np.float32)
        for o in range(5):
            for h in range(4):
                for f in range(4):
                    maps[:, o] += w[o, h, f] * x0[:, h] * x0[:, f]
        want = maps.sum(-1)  # (2, 5)
        got = cin.apply(v, jnp.asarray(x0))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    def test_split_half_shapes(self):
        x0 = jnp.ones((2, 6, 4))
        cin = ops.CIN(layer_sizes=(8, 8), split_half=True)
        v = _init(cin, x0)
        out = cin.apply(v, x0)
        assert out.shape == (2, 4 + 8)  # half of layer1 + all of layer2


class TestSENET:
    def test_senet_reweights(self):
        rng = np.random.default_rng(0)
        emb = jnp.asarray(rng.normal(size=(2, 6, 4)), jnp.float32)
        layer = ops.SENETLayer(reduction_ratio=3)
        v = _init(layer, emb)
        out = layer.apply(v, emb)
        assert out.shape == emb.shape

    @pytest.mark.parametrize("btype", ["all", "each", "interaction"])
    def test_bilinear_shapes(self, btype):
        emb = jnp.ones((2, 5, 4))
        layer = ops.BilinearInteraction(bilinear_type=btype)
        v = _init(layer, emb)
        out = layer.apply(v, emb)
        assert out.shape == (2, 10, 4)

    def test_bilinear_all_oracle(self):
        rng = np.random.default_rng(1)
        emb = rng.normal(size=(2, 3, 4)).astype(np.float32)
        layer = ops.BilinearInteraction(bilinear_type="all")
        v = _init(layer, jnp.asarray(emb))
        w = np.asarray(v["params"]["w"])
        pairs = [(0, 1), (0, 2), (1, 2)]
        want = np.stack([(emb[:, i] @ w) * emb[:, j] for i, j in pairs], 1)
        got = layer.apply(v, jnp.asarray(emb))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


class TestTransformer:
    def test_shapes_and_mask(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 6, 8)), jnp.float32)
        valid = jnp.asarray(np.array([[1, 1, 1, 0, 0, 0], [1] * 6], bool))
        blk = ops.BSTTransformerBlock(d_model=8, num_heads=2, max_len=7)
        v = _init(blk, x, valid)
        out = blk.apply(v, x, valid)
        assert out.shape == x.shape
        assert np.all(np.isfinite(np.asarray(out)))

    def test_masked_keys_ignored(self):
        rng = np.random.default_rng(1)
        x1 = rng.normal(size=(1, 5, 8)).astype(np.float32)
        x2 = x1.copy()
        x2[:, 3:] = 7.0  # perturb only masked positions
        valid = jnp.asarray(np.array([[1, 1, 1, 0, 0]], bool))
        blk = ops.BSTTransformerBlock(d_model=8, num_heads=2, max_len=6)
        v = _init(blk, jnp.asarray(x1), valid)
        o1 = blk.apply(v, jnp.asarray(x1), valid)
        o2 = blk.apply(v, jnp.asarray(x2), valid)
        # valid positions' outputs must agree (masked keys can't leak in)
        np.testing.assert_allclose(
            np.asarray(o1)[:, :3], np.asarray(o2)[:, :3], rtol=1e-4, atol=1e-4
        )

    def test_autoint_vpu_matches_einsum_formulation(self):
        from rank_tpu.ops.autoint import AutoIntLayer

        rng = np.random.default_rng(3)
        e = jnp.asarray(rng.normal(size=(4, 5, 6)), jnp.float32)
        vpu = AutoIntLayer(num_heads=2, att_dim=4, attn_impl="vpu")
        ein = AutoIntLayer(num_heads=2, att_dim=4, attn_impl="einsum")
        v = _init(vpu, e)
        np.testing.assert_allclose(
            np.asarray(vpu.apply(v, e)),
            np.asarray(ein.apply(v, e)),
            rtol=2e-2, atol=2e-2,  # bf16 internals; reduction order differs
        )

    def test_bf16_score_storage_matches_f32(self):
        # score_dtype='bfloat16' (masked_softmax_lowp: bf16 (T,T) storage,
        # f32 reductions) must track the f32-score path closely, including
        # fully-masked rows (zero attention output, not NaN)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(3, 6, 8)), jnp.float32)
        valid = jnp.asarray(np.array([[1, 1, 1, 0, 0, 0], [1] * 6, [0] * 6], bool))
        f32 = ops.BSTTransformerBlock(d_model=8, num_heads=2, max_len=7)
        b16 = ops.BSTTransformerBlock(
            d_model=8, num_heads=2, max_len=7, score_dtype="bfloat16"
        )
        v = _init(f32, x, valid)
        o32 = np.asarray(f32.apply(v, x, valid))
        o16 = np.asarray(b16.apply(v, x, valid))
        assert np.all(np.isfinite(o16))
        np.testing.assert_allclose(o32, o16, rtol=3e-2, atol=3e-2)

    def test_autoint_bf16_score_storage_matches_f32(self):
        from rank_tpu.ops.autoint import AutoIntLayer

        rng = np.random.default_rng(7)
        e = jnp.asarray(rng.normal(size=(4, 5, 6)), jnp.float32)
        f32 = AutoIntLayer(num_heads=2, att_dim=4)
        b16 = AutoIntLayer(num_heads=2, att_dim=4, score_dtype="bfloat16")
        v = _init(f32, e)
        o32 = np.asarray(f32.apply(v, e))
        o16 = np.asarray(b16.apply(v, e))
        assert np.all(np.isfinite(o16))
        np.testing.assert_allclose(o32, o16, rtol=3e-2, atol=3e-2)

    def test_vpu_matches_einsum_formulation(self):
        # same params, both attention formulations -> same outputs
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(3, 6, 8)), jnp.float32)
        valid = jnp.asarray(np.array([[1, 1, 1, 0, 0, 0], [1] * 6, [0] * 6], bool))
        vpu = ops.BSTTransformerBlock(d_model=8, num_heads=2, max_len=7, attn_impl="vpu")
        ein = ops.BSTTransformerBlock(d_model=8, num_heads=2, max_len=7, attn_impl="einsum")
        v = _init(vpu, x, valid)
        np.testing.assert_allclose(
            np.asarray(vpu.apply(v, x, valid)),
            np.asarray(ein.apply(v, x, valid)),
            rtol=2e-2, atol=2e-2,  # bf16 internals; reductions ordered differently
        )


class TestProduct:
    def test_inner(self):
        rng = np.random.default_rng(0)
        emb = rng.normal(size=(2, 4, 3)).astype(np.float32)
        layer = ops.InnerProductLayer()
        v = _init(layer, jnp.asarray(emb))
        got = layer.apply(v, jnp.asarray(emb))
        want = []
        for i in range(4):
            for j in range(i + 1, 4):
                want.append(np.sum(emb[:, i] * emb[:, j], -1))
        np.testing.assert_allclose(np.asarray(got), np.stack(want, 1), rtol=1e-4, atol=1e-4)

    def test_outer_quadratic_form(self):
        rng = np.random.default_rng(0)
        emb = rng.normal(size=(2, 4, 3)).astype(np.float32)
        layer = ops.OuterProductLayer(num_outputs=5)
        v = _init(layer, jnp.asarray(emb))
        w = np.asarray(v["params"]["w"])
        s = emb.sum(1)
        want = np.einsum("bd,kde,be->bk", s, w, s)
        got = layer.apply(v, jnp.asarray(emb))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


class TestActivations:
    def test_leaky_relu_equals_standard(self):
        x = jnp.asarray(np.linspace(-3, 3, 13), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(ops.leaky_relu(x, 0.01)),
            np.where(np.asarray(x) > 0, np.asarray(x), 0.01 * np.asarray(x)),
            rtol=1e-5, atol=1e-6,
        )

    def test_dice_train_eval(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 4)), jnp.float32)
        dice = ops.Dice()
        v = dice.init(jax.random.PRNGKey(0), x, train=True)
        out, mutated = dice.apply(v, x, train=True, mutable=["batch_stats"])
        assert out.shape == x.shape
        # with alpha=0 init, train-mode dice == sigmoid(bn(x)) * x
        mean = np.asarray(x).mean(0)
        var = np.asarray(x).var(0)
        bn = (np.asarray(x) - mean) / np.sqrt(var + 1e-5)
        want = (1 / (1 + np.exp(-bn))) * np.asarray(x)
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-3, atol=1e-3)
        # running stats must move toward batch stats
        ra_mean = np.asarray(mutated["batch_stats"]["BatchNorm_0"]["mean"])
        np.testing.assert_allclose(ra_mean, 0.01 * mean, rtol=1e-3, atol=1e-4)


class TestFLEN:
    def test_fwbi_oracle(self):
        """flen_field_wise_bi_interaction vs explicit per-group loops
        (Feng et al. 2020 eq. 4-8)."""
        rng = np.random.default_rng(5)
        B, D = 4, 6
        slices = ((0, 2), (2, 6), (6, 7))  # groups of 2, 4, 1 fields
        emb = rng.normal(size=(B, 7, D)).astype(np.float32)
        r_intra = rng.normal(size=(3,)).astype(np.float32)
        r_inter = rng.normal(size=(3,)).astype(np.float32)

        sums = [emb[:, a:b].sum(axis=1) for a, b in slices]
        want = np.zeros((B, D), np.float32)
        p = 0
        for m in range(3):
            for n in range(m + 1, 3):
                want += r_inter[p] * sums[m] * sums[n]
                p += 1
        for m, (a, b) in enumerate(slices):
            g = emb[:, a:b]
            want += r_intra[m] * 0.5 * (
                np.square(g.sum(axis=1)) - np.square(g).sum(axis=1)
            )
        got = ops.flen_field_wise_bi_interaction(
            jnp.asarray(emb), slices, jnp.asarray(r_intra), jnp.asarray(r_inter)
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    def test_second_order_vector_sums_to_scalar_form(self):
        rng = np.random.default_rng(6)
        emb = jnp.asarray(rng.normal(size=(3, 5, 4)).astype(np.float32))
        vec = ops.fm_second_order_vector(emb)
        np.testing.assert_allclose(
            np.asarray(vec.sum(axis=-1)),
            np.asarray(ops.fm_second_order(emb))[:, 0],
            rtol=1e-4,
        )


def test_bst_attn_impl_vpu2_matches_vpu_and_einsum():
    """Head-vectorized vpu2 attention (round-5 layout-copy fix) matches
    the per-head vpu loop and the einsum form on identical params."""
    import jax
    import jax.numpy as jnp

    from rank_tpu.ops.transformer import BSTTransformerBlock

    b, t, d, h = 4, 7, 16, 2
    x = jnp.asarray(np.random.default_rng(0).normal(size=(b, t, d)), jnp.float32)
    valid = jnp.asarray(np.arange(t)[None, :] < np.array([[3], [7], [1], [5]]))
    outs = {}
    for impl in ("vpu", "vpu2", "einsum"):
        blk = BSTTransformerBlock(
            d_model=d, num_heads=h, max_len=t, dropout_rate=0.0,
            compute_dtype="float32", score_dtype="float32", attn_impl=impl,
        )
        var = blk.init(jax.random.PRNGKey(0), x, valid)
        outs[impl] = np.asarray(blk.apply(var, x, valid))
    np.testing.assert_allclose(outs["vpu"], outs["vpu2"], rtol=0, atol=1e-5)
    np.testing.assert_allclose(outs["einsum"], outs["vpu2"], rtol=0, atol=1e-5)


def test_bst_attn_impl_vpu2_bf16_close():
    """vpu2 under the production bf16 compute/score dtypes stays close to
    the f32 vpu reference (bf16 tolerance)."""
    import jax
    import jax.numpy as jnp

    from rank_tpu.ops.transformer import BSTTransformerBlock

    b, t, d, h = 4, 7, 16, 2
    x = jnp.asarray(np.random.default_rng(1).normal(size=(b, t, d)), jnp.float32)
    valid = jnp.asarray(np.arange(t)[None, :] < np.array([[3], [7], [1], [5]]))
    ref_blk = BSTTransformerBlock(
        d_model=d, num_heads=h, max_len=t, dropout_rate=0.0,
        compute_dtype="float32", score_dtype="float32", attn_impl="vpu",
    )
    var = ref_blk.init(jax.random.PRNGKey(0), x, valid)
    ref = np.asarray(ref_blk.apply(var, x, valid))
    got_blk = BSTTransformerBlock(
        d_model=d, num_heads=h, max_len=t, dropout_rate=0.0,
        compute_dtype="bfloat16", score_dtype="bfloat16", attn_impl="vpu2",
    )
    got = np.asarray(got_blk.apply(var, x, valid), np.float32)
    np.testing.assert_allclose(ref, got, rtol=0, atol=0.05)
