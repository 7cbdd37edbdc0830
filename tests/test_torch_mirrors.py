"""Smoke tests for the PyTorch mirror models used by bench.py and
scripts/parity_check.py.

The mirrors are the quality/throughput baselines for every head-to-head
claim in README.md, so a silent breakage (shape drift, renamed field)
would invalidate those comparisons. Each test constructs the mirror,
runs a train step, and checks the loss is finite and parameters update.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, ".")  # bench.py lives at the repo root

from bench import EMB_DIMS, FM_FIELDS, HIST_LEN, VOCABS, _torch_models  # noqa: E402

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
    if name == "dcn":
        return (dense, cats)
    if name == "bst":
        return (dense, cats, seq, lengths)
    if name == "din":
        return (dense, cats, feedid, seq[:, :HIST_LEN], lengths)
    if name == "mmoe":
        return (dense, cats, feedid)
    if name == "deepfm":
        fm_cats = {
            k: (cats[k] if k in cats else feedid) for k in FM_FIELDS
        }
        return (fm_cats,)
    raise AssertionError(name)


@pytest.mark.parametrize("name", ["dcn", "bst", "din", "mmoe", "deepfm"])
def test_mirror_trains_one_step(name):
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    model = _torch_models()[name]()
    args = _args_for(name, _rand_inputs(rng))

    out = model(*args)
    n_tasks = 3 if name == "mmoe" else None
    assert out.shape == ((B, n_tasks) if n_tasks else (B,))

    y = torch.tensor((rng.random(out.shape) < 0.1).astype(np.float32))
    opt = torch.optim.Adam(model.parameters(), lr=0.005)
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
    """The mirror's FM second-order term must equal the O(F^2) pair sum
    (same oracle used for rank_tpu's fm_second_order)."""
    rng = np.random.default_rng(1)
    embs = rng.normal(size=(4, 6, 8)).astype(np.float32)
    s = embs.sum(1)
    fast = 0.5 * (np.square(s) - np.square(embs).sum(1)).sum(-1)
    slow = np.zeros(4, np.float32)
    for i in range(6):
        for j in range(i + 1, 6):
            slow += (embs[:, i] * embs[:, j]).sum(-1)
    np.testing.assert_allclose(fast, slow, rtol=1e-5)
