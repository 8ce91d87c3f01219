"""Snapshot the computed driver-sample order into SAMPLING_ORDER.json.

ADVICE r12: ``plans/history.py`` derives ``queries()`` iteration order
from CORRECTNESS artifacts + git state at load time, so the order the
guard tests certify locally is not guaranteed to be the order the
grading driver sees if its checkout differs (shallow clone, missing
artifacts).  Committing the computed order each round makes divergence
DETECTABLE: if ``CORRECTNESS_r{N}.json``'s sampled head differs from
the committed ``head`` here, the driver ran under a different
degradation path — diagnose from ``degradation`` instead of guessing.

Usage: python tools/snapshot_sampling_order.py   (writes repo-root file)
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    from spark_stream_analyzer_spark.plans import history, registry

    qs = registry.queries()
    order = list(qs)
    snap = {
        "degradation": history.degradation_path(),
        "sample_window": history.SAMPLE_WINDOW,
        "n_queries": len(order),
        "head": order[: history.SAMPLE_WINDOW],
        "order": order,
        "round_commits": {
            str(r): sha for r, sha in sorted(history.round_commits().items())
        },
    }
    out = os.path.join(ROOT, "SAMPLING_ORDER.json")
    with open(out, "w") as f:
        json.dump(snap, f, indent=1)
    print(
        f"wrote {out}: degradation={snap['degradation']}, "
        f"n={snap['n_queries']}, head[:5]={snap['head'][:5]}"
    )


if __name__ == "__main__":
    main()
