"""Min-merge a committed bench run into BENCH_BASELINE.json.

The baseline is the per-query BEST prior time in BASELINE-HOST units;
a fresh run's times are normalized by the run's calibration ratio
(t / calib_ratio — the same convention bench.py's expected-here scaling
inverts) before merging: existing rows take the min, rows that never
had a baseline are back-filled.  The stream_throughput block is NOT
touched here — it must be re-recorded atomically as a pair by
tools/refresh_tp_baseline.py (r11 finding: a mixed-run pair over- or
under-expects).

RATCHET GUARDS (ADVICE r12 + verdict r12 task 1): normalizing by a
calib ratio that OVERSTATES host slowness divides every time down and
the min keeps it forever, permanently inflating later runs' regression
flags.  Three guards close that vector:

1. **Existing rows are lowered only when the run's parallel-calibration
   ratio is ≈ 1** (the host demonstrably matches the baseline host
   under the bench's own parallelism — so the divisor is ~1 and cannot
   manufacture a speedup).  Runs recorded before the parallel probe
   existed fall back to the single-thread ratio for the same gate.
2. **A minimum improvement margin** (>5%) before an existing row is
   lowered — sub-margin wiggle is measurement noise, not a new best.
3. **Back-fill normalization is clamped**: a brand-new row recorded on
   a slow host is divided by at most MAX_BACKFILL_RATIO so one noisy
   first recording cannot set an unreachably low floor.

Usage: python tools/merge_bench_baseline.py [BENCH_DETAIL.json]
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: parallel-calib parity gate for lowering existing rows (guard 1)
PARITY_MAX_RATIO = 1.05
#: minimum relative improvement before an existing row is lowered (guard 2)
MIN_IMPROVEMENT = 0.05
#: normalization clamp for back-filled rows (guard 3)
MAX_BACKFILL_RATIO = 1.5


def main() -> None:
    detail_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "BENCH_DETAIL.json")
    base_path = os.path.join(ROOT, "BENCH_BASELINE.json")
    with open(detail_path) as f:
        run = json.load(f)
    with open(base_path) as f:
        base = json.load(f)

    calib_ratio = run.get("calib_ratio_vs_baseline") or 1.0
    stream_ratio = run.get("stream_calib_ratio_vs_baseline") or calib_ratio
    par_ratio = run.get("par_calib_ratio_vs_baseline") or calib_ratio
    # parity requires BOTH the parallel probe and the run's own median
    # per-query ratio near 1 — the median is the workload-faithful
    # signal (ALU probes are blind to memory-bandwidth contention)
    median_ratio = run.get("run_median_ratio_vs_baseline") or par_ratio
    # ALL THREE signals must read near 1: lowered rows are normalized by
    # calib_ratio below, so a noisy single-thread probe (calib 1.3 while
    # par/median ~1.0) would otherwise divide every improved row by 1.3
    # and the min-ratchet would keep the overstated lower forever
    # (ADVICE r13 medium).
    at_parity = max(calib_ratio, par_ratio, median_ratio) <= PARITY_MAX_RATIO
    merged = dict(base["queries"])
    lowered = backfilled = held = 0
    for name, t in run["queries"].items():
        if t < 0:
            continue  # failed row: never pollute the baseline
        ratio = stream_ratio if name.startswith("streaming_") else calib_ratio
        if name not in merged:
            # back-fill normalizes by the strongest host-slowness signal
            # (clamped): a new row first recorded on a contended host
            # must not bake that window's slowness into its baseline
            back_ratio = (
                ratio if name.startswith("streaming_")
                else max(ratio, median_ratio)
            )
            merged[name] = round(t / min(back_ratio, MAX_BACKFILL_RATIO), 3)
            backfilled += 1
            continue
        norm = round(t / ratio, 3)
        if norm < merged[name] * (1.0 - MIN_IMPROVEMENT):
            if at_parity:
                merged[name] = norm
                lowered += 1
            else:
                held += 1  # would lower, but the host isn't at parity
    base["queries"] = dict(sorted(merged.items()))
    # anchor the parallel-calib unit on first contact: the first run that
    # carries a parallel probe defines the baseline host's par_calib_sec
    # (later runs compare against it; it is never min-ratcheted)
    if "par_calib_sec" not in base and run.get("par_calib_sec"):
        base["par_calib_sec"] = run["par_calib_sec"]
    with open(base_path, "w") as f:
        json.dump(base, f, indent=1, sort_keys=True)
    print(
        f"merged {len(run['queries'])} run rows into {len(merged)} baseline rows: "
        f"{backfilled} back-filled, {lowered} lowered, {held} held (no parity) "
        f"(calib_ratio {calib_ratio}, stream {stream_ratio}, par {par_ratio}, "
        f"parity={at_parity})"
    )


if __name__ == "__main__":
    main()
