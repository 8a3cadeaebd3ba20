"""Attribute device time in a jax.profiler trace to repo source lines.

Usage: python scripts/trace_lines.py <trace_dir> [top_n] [--ops]

Reads the trace-viewer json.gz that `jax.profiler.trace(dir)` writes, keeps
TensorCore-line events, and aggregates duration by the `source` metadata XLA
attaches to each fused op (file:line of the jaxpr equation that produced
it). This is the view that found round-4's wins: the BandDownConv strided
slice differentiating into a serial gather and the f32-promoted BN/ASA
tensors both showed up as single hot lines.

--ops groups by normalized HLO op name instead (fusion indices stripped),
matching the older /tmp analyzer.
"""
import collections
import glob
import gzip
import json
import re
import sys


def load_events(trace_dir: str):
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    assert paths, f"no trace json under {trace_dir}"
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    by_ops = "--ops" in sys.argv
    trace_dir = args[0]
    top_n = int(args[1]) if len(args) > 1 else 40

    events = load_events(trace_dir)
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")

    agg = collections.Counter()
    cnt = collections.Counter()
    steps = collections.Counter()  # step markers to normalize per-step
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pn = pid_name.get(e.get("pid"), "")
        if "TPU" not in pn and "Core" not in pn and "/device" not in pn.lower():
            continue
        dur = e.get("dur", 0) / 1000.0  # us -> ms
        if by_ops:
            key = re.sub(r"\.\d+$", "", e["name"])
        else:
            src = (e.get("args") or {}).get("source", "")
            # keep only the repo-relative tail for readability
            key = re.sub(r"^.*/(cruse_tpu|tests|scripts|tools)/", r"\1/", src) or "(no source)"
        agg[key] += dur
        cnt[key] += 1
        total += dur

    print(f"TOTAL device ms: {total:.1f} (all profiled steps)")
    print(f"{'ms':>9s}  {'count':>6s}  source")
    for k, v in agg.most_common(top_n):
        print(f"{v:9.2f}  x{cnt[k]:<5d}  {k[:120]}")


if __name__ == "__main__":
    main()
