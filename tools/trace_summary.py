"""Summarize a jax.profiler trace: top device ops by total duration.

The reference's measurement culture is wall-clock prints and pickles
(``/root/reference/validation.py:282-366``); the modernized harness captures
real profiler traces (``jax.profiler.trace(logdir)``) and this tool reads
the Chrome-trace export back as a table.

Usage:
    python tools/trace_summary.py logs/traces/infer [N]

Capture example:
    with jax.profiler.trace("logs/traces/infer"):
        out = fn(params, batch); jax.block_until_ready(out)
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

HOST_PREFIXES = ("$", "jit_", "Pjit", "copy")  # python/host-side rows


def find_trace_json(root: str) -> str:
    hits = sorted(glob.glob(os.path.join(
        root, "plugins", "profile", "*", "*.trace.json.gz")))
    if not hits:
        raise FileNotFoundError(f"no trace.json.gz under {root}")
    return hits[-1]  # newest capture


def summarize(path: str, top: int = 20):
    with gzip.open(path) as fh:
        trace = json.load(fh)
    total = collections.Counter()
    count = collections.Counter()
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "?")
        if name.startswith(HOST_PREFIXES):
            continue
        total[name] += e["dur"]
        count[name] += 1
    rows = total.most_common(top)
    width = max((len(n) for n, _ in rows), default=10)
    print(f"{'total ms':>10}  {'calls':>5}  op")
    for name, dur in rows:
        print(f"{dur/1e3:10.3f}  {count[name]:5d}  {name[:width]}")
    return rows


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "logs/traces/infer"
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    summarize(find_trace_json(root), top)
