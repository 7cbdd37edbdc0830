"""Smoke tests for the PyTorch mirror models used by bench.py and
scripts/parity_check.py.

The mirrors are the quality/throughput baselines for every head-to-head
claim in README.md, so a silent breakage (shape drift, renamed field)
would invalidate those comparisons. Each test constructs the mirror,
runs a train step, and checks the loss is finite and parameters update.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# bench.py lives at the repo root (resolve from __file__, not cwd)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import EMB_DIMS, FM_FIELDS, HIST_LEN, VOCABS, _torch_models  # noqa: E402

AFM_FIELDS = FM_FIELDS + ("manual_tag_list",)
B = 16


def _rand_inputs(rng):
    dense = torch.tensor(rng.normal(size=(B, 16)).astype(np.float32))
    cats = {
        k: torch.tensor(rng.integers(0, VOCABS[k], size=B), dtype=torch.long)
        for k in EMB_DIMS
    }
    feedid = torch.tensor(
        rng.integers(0, VOCABS["feedid"], size=B), dtype=torch.long
    )
    seq = torch.tensor(
        rng.integers(0, VOCABS["feedid"], size=(B, HIST_LEN + 1)),
        dtype=torch.long,
    )
    lengths = torch.tensor(rng.integers(0, HIST_LEN + 1, size=B), dtype=torch.long)
    return dense, cats, feedid, seq, lengths


def _args_for(name, inputs):
    dense, cats, feedid, seq, lengths = inputs
    if name in ("dcn", "deepcrossing"):
        return (dense, cats)
    if name == "bst":
        return (dense, cats, seq, lengths)
    if name in ("din", "dien"):
        return (dense, cats, feedid, seq[:, :HIST_LEN], lengths)
    if name in ("mmoe", "ple"):
        return (dense, cats, feedid)
    if name in ("afm", "xdeepfm", "pnn", "widedeep", "fibinet", "autoint",
                "flen"):
        # cats already holds a valid manual_tag_list (EMB_DIMS includes it);
        # feedid fills the one AFM field missing from EMB_DIMS
        afm_cats = {
            k: (cats[k] if k in cats else feedid) for k in AFM_FIELDS
        }
        return (afm_cats,) if name == "pnn" else (dense, afm_cats)
    if name in ("deepfm", "fwfm", "ffm"):
        fm_cats = {
            k: (cats[k] if k in cats else feedid) for k in FM_FIELDS
        }
        return (fm_cats,)
    if name == "esmm":
        return (dense, cats, feedid)
    raise AssertionError(name)


ALL_MIRRORS = ["dcn", "bst", "din", "dien", "deepcrossing", "afm",
               "xdeepfm", "mmoe", "ple", "deepfm",
               "fwfm", "ffm", "pnn", "widedeep", "fibinet", "autoint",
               "flen", "esmm"]


@pytest.mark.parametrize("name", ALL_MIRRORS)
def test_mirror_trains_one_step(name):
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    model = _torch_models()[name]()
    args = _args_for(name, _rand_inputs(rng))

    out = model(*args)
    n_tasks = {"mmoe": 3, "ple": 3, "esmm": 2}.get(name)
    assert out.shape == ((B, n_tasks) if n_tasks else (B,))

    y = torch.tensor((rng.random(out.shape) < 0.1).astype(np.float32))
    opt = torch.optim.Adam(model.parameters(), lr=0.005)
    if name == "esmm":  # probability outputs, BCE on probs
        loss = torch.nn.functional.binary_cross_entropy(
            out.clamp(1e-7, 1 - 1e-7), y
        )
    else:
        loss = torch.nn.functional.binary_cross_entropy_with_logits(out, y)
    before = [p.detach().clone() for p in model.parameters()]
    loss.backward()
    opt.step()
    assert torch.isfinite(loss)
    # at least one parameter must move (guards frozen/fresh-param bugs —
    # the class of bug the reference shipped, SURVEY.md §2.2)
    moved = any(
        not torch.equal(b, p.detach())
        for b, p in zip(before, model.parameters())
    )
    assert moved


def test_deepfm_mirror_fm_identity():
    """TorchDeepFM's ACTUAL fm2 code path must equal the O(F^2) pair-sum
    oracle: isolate fm2 by setting the learned 3->1 fusion to select only
    the fm2 component (weights [0,1,0], bias 0) in eval mode."""
    torch.manual_seed(1)
    rng = np.random.default_rng(1)
    model = _torch_models()["deepfm"]()
    model.eval()
    with torch.no_grad():
        model.final.weight.copy_(torch.tensor([[0.0, 1.0, 0.0]]))
        model.final.bias.zero_()
    cats = {
        k: torch.tensor(rng.integers(0, VOCABS[k], size=B), dtype=torch.long)
        for k in FM_FIELDS
    }
    with torch.no_grad():
        fm2 = model(cats).numpy()
        embs = torch.stack(
            [model.second[k](cats[k]) for k in FM_FIELDS], dim=1
        ).numpy()  # (B, F, D)
    slow = np.zeros(B, np.float32)
    f = len(FM_FIELDS)
    for i in range(f):
        for j in range(i + 1, f):
            slow += (embs[:, i] * embs[:, j]).sum(-1)
    np.testing.assert_allclose(fm2, slow, rtol=1e-4, atol=1e-5)


def test_dien_mirror_padded_steps_carry_state():
    """AUGRU/GRU sequence_length semantics (rnn.py / custom_grucell.py):
    the final state must equal the state at step length-1 — appending
    padded garbage after the valid prefix must not change the output."""
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    model = _torch_models()["dien"]()
    model.eval()
    dense, cats, feedid, seq, _ = _rand_inputs(rng)
    seq = seq[:, :HIST_LEN].clone()
    lengths = torch.full((B,), 7, dtype=torch.long)
    with torch.no_grad():
        out1 = model(dense, cats, feedid, seq, lengths)
        seq2 = seq.clone()
        seq2[:, 7:] = torch.randint(0, VOCABS["feedid"], (B, HIST_LEN - 7))
        out2 = model(dense, cats, feedid, seq2, lengths)
    np.testing.assert_allclose(out1.numpy(), out2.numpy(), rtol=1e-5, atol=1e-6)


def test_bench_torch_rejects_unknown_models():
    """bench_torch must raise on model names it has no input builder for
    instead of silently benchmarking BST (ADVICE r1)."""
    from bench import bench_torch

    with pytest.raises(ValueError, match="no input builder"):
        bench_torch("deepfm")
