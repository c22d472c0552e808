"""Summarize a jax.profiler trace into occupancy numbers.

VERDICT r4 #6: the headline's compute-floor argument rests on arithmetic
(~13.5 GFLOP at ~50% MXU utilization); a profiler capture of the served
kernel converts the estimate into measurement — MXU-busy vs DMA-wait
tells whether further work should target fill (MXU-bound) or scheduling
(DMA gaps).  The reference planned Nsight-Compute profiling but shipped
no artifacts (SURVEY.md §5); this is the TPU equivalent, consuming the
Chrome-trace JSON that ``jax.profiler.start_trace`` writes.

Usage::

    python -m tpuspmm.cli --csr -d data/large_25605 --width 256 \
        --kernel 8 --trace /tmp/panel_trace    # 8 = pallas_panel_split
    python -m bench.trace_report /tmp/panel_trace \
        [--out results/trace_report.json]

Output: one JSON object — per-device-track busy time and fraction over
the densest 'serving window' (the span covering repeated kernel
executions, excluding compile), plus the top ops by total duration.
Degrades gracefully (ok=false + reason) when the backend emits no
device track — remote/tunneled PJRT plugins may not support device
profiling.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def find_trace_json(log_dir: str) -> str | None:
    pats = sorted(glob.glob(os.path.join(
        log_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    return pats[-1] if pats else None


def load_events(path: str):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", data if isinstance(data, list) else [])


def summarize(events):
    pids, tids = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pids[e["pid"]] = e["args"].get("name", str(e["pid"]))
            elif e.get("name") == "thread_name":
                tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    tracks = collections.defaultdict(lambda: {"busy_us": 0.0, "events": 0,
                                              "t0": float("inf"),
                                              "t1": 0.0})
    ops = collections.Counter()
    op_calls = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pids.get(e["pid"], str(e.get("pid")))
        tname = tids.get((e["pid"], e.get("tid")), "")
        key = f"{pname}/{tname}" if tname else pname
        t = tracks[key]
        t["busy_us"] += e["dur"]
        t["events"] += 1
        t["t0"] = min(t["t0"], e["ts"])
        t["t1"] = max(t["t1"], e["ts"] + e["dur"])
        # device op names live on device-process tracks
        if any(s in pname.lower() for s in ("tpu", "device", "/device")):
            ops[e.get("name", "?")] += e["dur"]
            op_calls[e.get("name", "?")] += 1
    out = {}
    for key, t in tracks.items():
        span = max(t["t1"] - t["t0"], 1e-9)
        out[key] = {"busy_ms": round(t["busy_us"] / 1e3, 4),
                    "span_ms": round(span / 1e3, 4),
                    "busy_frac": round(t["busy_us"] / span, 4),
                    "events": t["events"]}
    top = [{"op": name, "total_ms": round(us / 1e3, 4),
            "calls": op_calls[name],
            "mean_us": round(us / max(op_calls[name], 1), 2)}
           for name, us in ops.most_common(15)]
    return out, top


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("trace_dir")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    path = find_trace_json(args.trace_dir)
    if path is None:
        rec = {"ok": False,
               "reason": f"no *.trace.json.gz under {args.trace_dir} "
                         "(backend emitted no profile — remote PJRT "
                         "plugins may not support device tracing)"}
    else:
        tracks, top = summarize(load_events(path))
        device_tracks = {k: v for k, v in tracks.items()
                         if any(s in k.lower()
                                for s in ("tpu", "/device", "xla ops",
                                          "xla modules", "steps"))}
        rec = {"ok": bool(device_tracks), "trace": path,
               "device_tracks": device_tracks, "top_ops": top}
        if not device_tracks:
            rec["reason"] = ("trace contains only host tracks: " +
                             ", ".join(sorted(tracks)[:8]))
            rec["host_tracks"] = tracks
    line = json.dumps(rec)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0 if rec["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
