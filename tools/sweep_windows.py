"""One-off sweep: find registry queries with single-partition WindowExec.

Parses the `formatted` explain: the header tree gives parent/child
structure by indentation; the numbered sections give per-node arguments.
A Window node is flagged when walking down through Sort/Project nodes
reaches an `Exchange SinglePartition` — unless the node right below that
exchange is a HashAggregate keyed on `_pid` (the bounded offsets window
inside operators.rank.global_rank).
"""
from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")


def parse_formatted(plan: str):
    """Return (tree_edges: {id: [child ids]}, nodes: {id: (name, args)})."""
    lines = plan.splitlines()
    # ---- header tree ----
    tree = []  # list of (indent, node_id, name)
    for ln in lines:
        # Any node line counts — including indented ':-' branch heads;
        # the '(' break already stops at the numbered sections (r10, ADVICE).
        m = re.match(r"^([ +\-:*]*)(\S.*?) \((\d+)\)\s*$", ln)
        if m:
            indent = len(m.group(1))
            tree.append((indent, int(m.group(3)), m.group(2).strip()))
        if ln.startswith("("):
            break
    children: dict[int, list[int]] = {}
    stack: list[tuple[int, int]] = []  # (indent, id)
    for indent, nid, _name in tree:
        while stack and stack[-1][0] >= indent:
            stack.pop()
        if stack:
            children.setdefault(stack[-1][1], []).append(nid)
        stack.append((indent, nid))
    # ---- numbered sections: capture the FULL text block per node ----
    nodes: dict[int, tuple[str, str]] = {}
    cur = None
    for ln in lines:
        m = re.match(r"^\((\d+)\) (\S.*)$", ln)
        if m:
            cur = int(m.group(1))
            nodes[cur] = (m.group(2).strip(), "")
        elif cur is not None and ln.strip():
            name, body = nodes[cur]
            nodes[cur] = (name, body + ln + "\n")
    return children, nodes


PASS_THROUGH = ("Sort", "Project", "Filter", "WindowGroupLimit")


def single_partition_windows(plan: str) -> list[str]:
    children, nodes = parse_formatted(plan)
    hits = []
    for nid, (name, args) in nodes.items():
        if not name.startswith("Window"):
            continue
        # walk down first-child chain through pass-through nodes
        cur = nid
        while True:
            kids = children.get(cur, [])
            if not kids:
                break
            cur = kids[0]
            cname, cargs = nodes.get(cur, ("", ""))
            if cname.startswith("Exchange"):
                if "SinglePartition" in cargs:
                    # allowance: offsets window of global_rank — the input
                    # is a per-physical-partition count (<= #partitions rows)
                    below = children.get(cur, [])
                    bname, bbody = nodes.get(below[0], ("", "")) if below else ("", "")
                    if bname.startswith("HashAggregate") and "_pid" in bbody:
                        hits.append(f"{nid}:allowed-global-rank-offsets")
                    else:
                        hits.append(str(nid))
                break
            if not any(cname.startswith(p) for p in PASS_THROUGH):
                break
    return hits


if __name__ == "__main__":
    from pyspark.sql import SparkSession

    from spark_stream_analyzer_spark.plans.registry import queries

    SKIP = {
        "streaming_snapshot_stats",
        "streaming_windowed_counts",
        "streaming_dedup_events",
        "streaming_session_flush",
        "streaming_interval_join",
    }
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sf = "/root/testdata/sf0.001"
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name, build in sorted(queries().items()):
        if name in SKIP or name.startswith("streaming_"):
            continue
        try:
            df = build(spark, sf)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            continue
        hits = single_partition_windows(plan)
        if hits:
            print(f"{name}: {hits}")
    spark.stop()
