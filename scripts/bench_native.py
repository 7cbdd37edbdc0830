"""Benchmark the C++ host data plane vs the pure-numpy/Python paths.

Measures the three host-side hot loops on WeChat-shaped data:
  * scalar token encode (vocab dict lookup per row)
  * sequence encode (comma-split + lookup per token, keep-tail 50)
  * batch row-gather (loader's per-step slicing)

Run: python scripts/bench_native.py [--rows 1000000]
"""

import argparse
import time

import numpy as np

from rank_tpu import native
from rank_tpu.data import encode as E
from rank_tpu.features import vocab_index


def timeit(fn, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    args = ap.parse_args()
    n = args.rows
    rng = np.random.default_rng(0)

    assert native.available(), "native library failed to build"

    tokens = [f"feedid_{i}" for i in range(106_444)]  # real feedid vocab size
    index = vocab_index(tokens)
    nv = native.Vocab(tokens)

    # --- scalar tokens ----------------------------------------------------
    tok_ids = rng.integers(0, len(tokens), n)
    rows = [tokens[i] if rng.random() > 0.05 else None for i in tok_ids]
    t_py = timeit(lambda: E._encode_tokens(rows, index), 2)
    t_cc = timeit(lambda: nv.encode_tokens(rows), 3)
    print(f"encode_tokens  {n} rows: python {t_py:.3f}s  native {t_cc:.3f}s  "
          f"speedup {t_py / t_cc:.1f}x")

    # --- sequences (mean history length ~25, up to 60) ----------------------
    seq_rows = []
    lens = rng.integers(0, 60, n // 10)
    flat = rng.integers(0, len(tokens), int(lens.sum()))
    pos = 0
    for L in lens:
        seq_rows.append(",".join(tokens[j] for j in flat[pos:pos + L]))
        pos += L
    t_py = timeit(lambda: E._encode_seq(seq_rows, index, 50), 2)
    t_cc = timeit(lambda: nv.encode_seq(seq_rows, 50), 3)
    print(f"encode_seq     {len(seq_rows)} rows: python {t_py:.3f}s  native {t_cc:.3f}s  "
          f"speedup {t_py / t_cc:.1f}x")

    # --- batch gather -------------------------------------------------------
    big = rng.random((4_000_000, 16)).astype(np.float32)
    idx = rng.integers(0, big.shape[0], 8192)
    t_np = timeit(lambda: big[idx], 20)
    t_cc = timeit(lambda: native.take_rows(big, idx), 20)
    print(f"take_rows      8192x16 f32 from 4M: numpy {t_np * 1e6:.0f}us  "
          f"native {t_cc * 1e6:.0f}us  speedup {t_np / t_cc:.1f}x")


if __name__ == "__main__":
    main()
