"""Entry-HLO buffer-traffic attribution (VERDICT r4 #1).

XLA's ``cost_analysis()`` "bytes accessed" counts every op INSIDE a
fusion — each fused elementwise adds its full tensor size even though it
lives in registers/VMEM — so on deeply-fused programs it overcounts real
HBM traffic by an order of magnitude (11.7x on the DCN train step:
198 KB/example reported vs ~17 KB/example of actual buffer traffic,
BYTES_r05.json; a one-fusion toy already shows 1.97x, see
scripts/bytes_breakdown.py:toy_fusion_overcount).

This module walks the optimized HLO's ENTRY computation instead and
counts only materialised buffer traffic per instruction:

  * output bytes + operand-buffer bytes for ordinary ops/fusions (every
    fusion boundary is a real write + read);
  * gather/dynamic-slice at touched-rows size (2x output + index array),
    not the whole table operand;
  * scatter at ~3x the updates operand (read+write touched target rows +
    read updates);
  * async copy/slice pairs once, at the -done (2x moved bytes — source
    read + destination write; destination may be VMEM, still a real HBM
    read on the way);
  * parameters/constants/bitcasts/tuple plumbing free.

Grouping uses HLO ``metadata op_name`` (the JAX source op), with async
memory-space copies attributed through their -start operand names
(state params/moments vs batch inputs).
"""

from __future__ import annotations

import collections
import re
from typing import List, Tuple

DT_BYTES = {
    "f32": 4, "bf16": 2, "f16": 2, "f64": 8,
    "s32": 4, "u32": 4, "s64": 8, "u64": 8,
    "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}
SHAPE_RE = re.compile(
    r"\b(f32|bf16|f16|f64|s32|u32|s64|u64|s16|u16|s8|u8|pred)\[([0-9,]*)\]"
)
GATHERISH = ("gather", "dynamic-slice")
FREE_OPS = ("parameter", "constant", "get-tuple-element", "tuple",
            "bitcast", "after-all", "partition-id", "replica-id")

Row = Tuple[int, str, str, str, str]  # bytes, opcode, name, op_name, line


def _nbytes(dt: str, dims: str) -> int:
    n = DT_BYTES[dt]
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n


def attribute_bytes(hlo_text: str, index_len: int = 8192) -> List[Row]:
    """Real-buffer-traffic rows for the ENTRY computation."""
    m = re.search(r"ENTRY %?\S+ .*?\{(.*?)\n\}", hlo_text, re.S)
    assert m, "no ENTRY computation found"
    rows: List[Row] = []
    start_lines = {}
    for line in m.group(1).splitlines():
        line = line.strip()
        mm = re.match(r"%?([\w.\-]+) = ", line)
        if not mm:
            continue
        name = mm.group(1)
        op_m = re.search(r"= .*?([a-z][a-z0-9\-]*)\(", line)
        opcode = op_m.group(1) if op_m else "?"
        if opcode.endswith("-start"):
            start_lines[name] = line
            continue
        if opcode in FREE_OPS:
            continue
        if opcode.endswith("-done"):
            ref = re.search(r"\(%([\w.\-]+)\)", line)
            if ref and ref.group(1) in start_lines:
                line = line + " || " + start_lines[ref.group(1)]
        body = line.split(" metadata=")[0]
        shapes = SHAPE_RE.findall(body)
        if not shapes:
            continue
        out_b = _nbytes(*shapes[0])
        opnd_b = sum(_nbytes(dt, dims) for dt, dims in shapes[1:])
        if opcode in GATHERISH:
            b = 2 * out_b + 4 * index_len
        elif opcode == "scatter":
            upd = _nbytes(*shapes[-1]) if len(shapes) > 2 else out_b
            b = 3 * upd
        elif opcode.endswith("-done"):
            b = 2 * out_b
        else:
            b = out_b + opnd_b
        md = re.search(r'op_name="([^"]+)"', line)
        rows.append((b, opcode, name, md.group(1) if md else "", line))
    return rows


_BUCKETS = (
    # order matters: bwd ("transpose(jvp") contains "jvp"
    ("matmul_bwd", ("transpose(jvp", "dot_general")),
    ("matmul_fwd", ("jvp", "dot_general")),
    ("embedding_gather", ("gather",)),
    ("embedding_scatter_grad", ("scatter",)),
    ("attention", ("attention",)),
    ("transformer", ("transformer",)),
    ("optimizer_update", ("state['",)),
    ("batch_unpack", ("unpack",)),
)


def bucket(op_name: str, opcode: str, line: str = "") -> str:
    for label, keys in _BUCKETS:
        if all(k in op_name for k in keys):
            return label
    if "adam" in op_name or "opt_state" in op_name:
        return "optimizer_update"
    if not op_name:
        if "state__" in line:
            return "memspace_copy_state"
        if "batch__" in line:
            return "memspace_copy_batch"
        if opcode.endswith("-done"):
            return "memspace_copy_other"
        return f"unattributed_{opcode}"
    parts = op_name.split("/")
    return "/".join(parts[-2:])[:60]


def real_step_bytes(compiled) -> int:
    """Total real buffer traffic of a compiled executable's entry."""
    return sum(r[0] for r in attribute_bytes(compiled.as_text()))


def grouped(rows: List[Row], top: int = 14):
    g = collections.Counter()
    for b, opcode, name, op_name, line in rows:
        g[bucket(op_name, opcode, line)] += b
    return g.most_common(top)
