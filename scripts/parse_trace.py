"""Summarise a jax.profiler trace (vm.trace.json.gz) by device-op cost.

Workflow (DEVNOTES.md "Perf findings"): capture a trace with
``bench.py --profile`` or ``jax.profiler.trace(dir)``, then:

  python scripts/parse_trace.py /tmp/cxrmate_trace [--top 30] [--detail NAME]

Prints per-op totals (duration, count, source line, tf_op) sorted by total
device time, with `--detail` dumping an op's full long_name (HLO shapes +
layouts — how the layout pathologies in DEVNOTES were found).
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def load_events(trace_dir: str):
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    )
    if not paths:
        sys.exit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    # pid of the TPU device process (named '/device:TPU:...'); fall back to all
    device_pids = {
        e["pid"]
        for e in data["traceEvents"]
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "device" in str(e.get("args", {}).get("name", "")).lower()
    }
    return [
        e
        for e in data["traceEvents"]
        if e.get("ph") == "X" and (not device_pids or e.get("pid") in device_pids)
    ]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--detail", default=None, help="print long_name of ops matching this prefix")
    args = p.parse_args()

    events = load_events(args.trace_dir)
    agg = collections.Counter()
    cnt = collections.Counter()
    meta = {}
    for e in events:
        n = e["name"]
        if n.startswith(("jit_", "while.")):  # module/loop envelopes double-count
            continue
        agg[n] += e["dur"]
        cnt[n] += 1
        if n not in meta and e.get("args"):
            a = e["args"]
            meta[n] = (
                a.get("source", "").split("/")[-1],
                str(a.get("tf_op", "")).split("/")[-1],
                a.get("long_name", ""),
                a.get("bytes_accessed", 0),
            )

    total = sum(agg.values())
    print(f"device op time: {total / 1e6:.3f} s over {sum(cnt.values())} events")
    for name, dur in agg.most_common(args.top):
        src, tf_op, _, nbytes = meta.get(name, ("", "", "", 0))
        bw = (int(nbytes) * cnt[name] / (dur / 1e6) / 1e9) if dur and nbytes else 0.0
        print(
            f"{dur / 1e3:9.1f} ms x{cnt[name]:5d}  {name[:34]:36s} {src[:24]:26s} "
            f"{tf_op[:34]:36s} {bw:6.0f} GB/s"
        )
    if args.detail:
        for name, (src, tf_op, long_name, _) in meta.items():
            if name.startswith(args.detail):
                print(f"\n== {name} ({src}, {tf_op})\n{long_name}")


if __name__ == "__main__":
    main()
