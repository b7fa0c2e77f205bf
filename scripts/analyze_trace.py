"""Summarize a jax.profiler device trace: time + MFU per source site.

Usage: python scripts/analyze_trace.py [trace.json.gz] [--n-fwd 2]
Finds the newest /tmp/jaxtrace/**/vm.trace.json.gz when no path given.
Device events are pid=3 through the axon relay; the outer jit_* program
event double-counts its children and is excluded.

v5e ceilings used for MFU: 197 TFLOP/s bf16 (394 with int8), 819 GB/s HBM.
"""

import collections
import glob
import gzip
import json
import sys

PEAK_FLOPS = 197e12
PEAK_BYTES = 819e9


def load_events(path):
    tr = json.load(gzip.open(path))
    return [e for e in tr["traceEvents"]
            if e.get("ph") == "X" and e.get("pid") == 3
            and not e["name"].startswith("jit_")]


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("trace", nargs="?", default=None)
    ap.add_argument("--n-fwd", type=int, default=2)
    ap.add_argument("--min-ms", type=float, default=None,
                    help="itemize EVERY (op-name, source) slice above this "
                    "many ms/fwd — names the residual the site table "
                    "buckets as 'everything else' (r4 verdict #2)")
    ns = ap.parse_args()
    n_fwd = ns.n_fwd
    path = ns.trace or "/tmp/jaxtrace"
    if not path.endswith(".json.gz"):  # a trace dir: find the newest trace in it
        hits = sorted(glob.glob(f"{path}/**/*.trace.json.gz", recursive=True))
        if not hits:
            sys.exit(f"no *.trace.json.gz under {path}")
        path = hits[-1]
    evs = load_events(path)
    total = sum(e["dur"] for e in evs) / n_fwd
    print(f"{path}: {len(evs)} device events, {total/1e3:.1f} ms/fwd busy")

    by_site = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0])
    for e in evs:
        a = e.get("args") or {}
        src = a.get("source", "?")
        cat = a.get("hlo_category", "?")
        key = (src, cat)
        s = by_site[key]
        s[0] += e["dur"]                               # us
        s[1] += float(a.get("model_flops", 0) or 0)
        s[2] += float(a.get("raw_bytes_accessed", 0) or 0)
        s[3] += 1

    print(f"\n{'ms/fwd':>8} {'MFU%':>6} {'BW%':>6} {'calls':>6}  site [category]")
    rows = sorted(by_site.items(), key=lambda kv: -kv[1][0])
    shown = 0.0
    for (src, cat), (us, flops, byts, n) in rows[:40]:
        secs = us / 1e6
        mfu = 100 * flops / (secs * PEAK_FLOPS) if secs else 0
        bw = 100 * byts / (secs * PEAK_BYTES) if secs else 0
        shown += us
        print(f"{us/n_fwd/1e3:8.2f} {mfu:6.1f} {bw:6.1f} {n//n_fwd:6d}  "
              f"{src.replace('/root/repo/', '')} [{cat}]")
    print(f"(top 40 cover {shown/n_fwd/1e3:.1f} of {total/1e3:.1f} ms)")

    by_cat = collections.defaultdict(float)
    for e in evs:
        by_cat[(e.get("args") or {}).get("hlo_category", "?")] += e["dur"]
    print("\nby category:")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {us/n_fwd/1e3:8.2f} ms/fwd  {cat}")

    if ns.min_ms is not None:
        # full itemization: every (base op name, source, category) slice,
        # nothing bucketed — the table that names the residual
        def base_name(name):
            # strip the .N uniquifier suffix xla appends (fusion.123 ->
            # fusion) but keep the descriptive part of custom calls
            head = name.split("(")[0]
            parts = head.rsplit(".", 1)
            return parts[0] if len(parts) == 2 and parts[1].isdigit() else head
        by_op = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0])
        for e in evs:
            a = e.get("args") or {}
            key = (base_name(e["name"]), a.get("source", "?"),
                   a.get("hlo_category", "?"))
            s = by_op[key]
            s[0] += e["dur"]
            s[1] += float(a.get("model_flops", 0) or 0)
            s[2] += float(a.get("raw_bytes_accessed", 0) or 0)
            s[3] += 1
        print(f"\nall slices >= {ns.min_ms} ms/fwd "
              f"({'ms/fwd':>8} {'MFU%':>6} {'BW%':>6} {'calls':>6}):")
        listed = 0.0
        for (name, src, cat), (us, flops, byts, n) in sorted(
                by_op.items(), key=lambda kv: -kv[1][0]):
            ms = us / n_fwd / 1e3
            if ms < ns.min_ms:
                continue
            secs = us / 1e6
            mfu = 100 * flops / (secs * PEAK_FLOPS) if secs else 0
            bw = 100 * byts / (secs * PEAK_BYTES) if secs else 0
            listed += ms
            print(f"{ms:8.2f} {mfu:6.1f} {bw:6.1f} {n//n_fwd:6d}  {name}  "
                  f"{src.replace('/root/repo/', '')} [{cat}]")
        print(f"(itemized {listed:.1f} of {total/1e3:.1f} ms/fwd; "
              f"remainder is slices < {ns.min_ms} ms)")


if __name__ == "__main__":
    main()
