#!/usr/bin/env python
"""Rank device ops in a jax.profiler trace (SURVEY §5.1 observability).

Reads the ``trace.json.gz`` written under ``<out>/plugins/profile/<ts>/`` by
``tools/profile_model.py`` (or any ``jax.profiler.trace`` capture), keeps the
TPU-device events, and prints:

  * a per-category rollup (fusion / custom-call / copy / convolution / ...)
  * the top-N individual ops by device duration

Op names are XLA HLO instruction names (``attn.27``, ``copy.828``, ...); the
category falls back to a name-prefix heuristic when the event carries no
``hlo_category`` arg. Usage:

    python tools/trace_ops.py /tmp/vil_profile_r2c [--top 40] [--like copy]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "plugins/profile/*/*.trace.json.gz")))
    if not hits:
        raise SystemExit(f"no trace.json.gz under {path}")
    return hits[-1]  # newest capture


def device_events(trace_path: str):
    with gzip.open(trace_path, "rt") as f:
        data = json.load(f)
    evs = data.get("traceEvents", [])
    device_pids = {
        e["pid"]
        for e in evs
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    for e in evs:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            yield e


_PREFIX = re.compile(r"^([a-zA-Z_-]+)")


def category(ev) -> str:
    cat = ev.get("args", {}).get("hlo_category")
    if cat:
        return cat.strip()
    m = _PREFIX.match(ev.get("name", ""))
    return m.group(1) if m else "?"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="trace dir or trace.json.gz")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--like", default=None, help="substring filter on op name")
    args = ap.parse_args()

    trace = find_trace(args.path)
    per_op = collections.Counter()
    per_cat = collections.Counter()
    samples = {}
    total = 0.0
    for ev in device_events(trace):
        dur = float(ev.get("dur", 0.0)) / 1e3  # us -> ms
        name = ev["name"]
        if args.like and args.like not in name:
            continue
        per_op[name] += dur
        per_cat[category(ev)] += dur
        samples.setdefault(name, ev.get("args", {}))
        total += dur

    print(f"trace: {trace}")
    print(f"total device time (filtered): {total:.3f} ms\n")
    print("by category:")
    for cat, dur in per_cat.most_common():
        print(f"  {dur:9.3f} ms  {cat}")
    print(f"\ntop {args.top} ops:")
    for name, dur in per_op.most_common(args.top):
        shape = samples[name].get("shape", "")
        print(f"  {dur:9.3f} ms  {name}  {shape}")


if __name__ == "__main__":
    main()
