"""Min-merge a committed bench run into BENCH_BASELINE.json.

The baseline is the per-query BEST prior time in BASELINE-HOST units;
a fresh run's times are normalized by the run's calibration ratio
(t / calib_ratio — the same convention bench.py's expected-here scaling
inverts) before merging: existing rows take the min, rows that never
had a baseline are back-filled.  The stream_throughput block is NOT
touched here — it must be re-recorded atomically as a pair by
tools/refresh_tp_baseline.py (r11 finding: a mixed-run pair over- or
under-expects).

Usage: python tools/merge_bench_baseline.py [BENCH_DETAIL.json]
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    detail_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "BENCH_DETAIL.json")
    base_path = os.path.join(ROOT, "BENCH_BASELINE.json")
    with open(detail_path) as f:
        run = json.load(f)
    with open(base_path) as f:
        base = json.load(f)

    calib_ratio = run.get("calib_ratio_vs_baseline") or 1.0
    stream_ratio = run.get("stream_calib_ratio_vs_baseline") or calib_ratio
    merged = dict(base["queries"])
    lowered = backfilled = 0
    for name, t in run["queries"].items():
        if t < 0:
            continue  # failed row: never pollute the baseline
        ratio = stream_ratio if name.startswith("streaming_") else calib_ratio
        norm = round(t / ratio, 3)
        if name not in merged:
            merged[name] = norm
            backfilled += 1
        elif norm < merged[name]:
            merged[name] = norm
            lowered += 1
    base["queries"] = dict(sorted(merged.items()))
    with open(base_path, "w") as f:
        json.dump(base, f, indent=1, sort_keys=True)
    print(
        f"merged {len(run['queries'])} run rows into {len(merged)} baseline rows: "
        f"{backfilled} back-filled, {lowered} lowered "
        f"(calib_ratio {calib_ratio}, stream {stream_ratio})"
    )


if __name__ == "__main__":
    main()
