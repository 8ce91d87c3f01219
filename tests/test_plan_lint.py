"""Registry-wide physical-plan lint.

Every one of the ~84 registry queries must be free of the two patterns
that do not survive any scale-up:

* ``CartesianProduct`` — an unconstrained cross product (a broadcast
  nested-loop against a provably tiny side is fine and planned as
  ``BroadcastNestedLoopJoin``, so it is not flagged);
* row-at-a-time Python (``BatchEvalPython``) anywhere, and Arrow-batched
  Python (``ArrowEvalPython`` / ``MapInPandas``) outside the multimodal
  stubs, whose decode step is Python by design (the Spark-side plumbing
  is the product there).

test_plan_shapes.py pins per-query positives (pushdown, broadcast,
partial agg); this file is the registry-wide negative sweep, so a new
query can't quietly ship a scale antipattern.
"""

from __future__ import annotations

import re

import pytest

from spark_stream_analyzer_spark.plans.registry import queries

SF = "/root/testdata/sf0.001"

# Arrow mapInPandas is the designed physical form for binary decode.
ARROW_PYTHON_OK = {
    "multimodal_decode_stats",
    "multimodal_frame_sample",
    "multimodal_resize_stats",
    "multimodal_feature_extract",
    "multimodal_phash_dedup",  # pHash bits derive from the mapInPandas features
    # round-4 REAL codecs: wave/PPM encode+decode are Python by design
    # (the whole point is exercising the Arrow binary-payload path)
    "multimodal_wav_decode_stats",
    "multimodal_ppm_decode_stats",
    "multimodal_bmp_decode_stats",  # round-4b third real codec
    "multimodal_png_decode_stats",  # round-6 compressed codec (zlib)
    "multimodal_gif_decode_stats",  # round-14 compressed codec (LZW)
    # round-8: the UDTF row's Python boundary IS its subject — it exists
    # to pin the extension-API class against the codegen explode twin
    # (test_round8_ops pins the twin's plan has NO Python stage)
    "doc_chunk_windows_udtf",
    # round-12: the production-vocab BPE encoder's Python boundary IS its
    # subject — the row exists to drive the >=64-merge Arrow path against
    # the unrolled chain oracle (the <64 chain form stays Python-free;
    # test_llm_ops::test_bpe_encode_stats_auto_selects_trie_at_gate pins
    # both plan shapes)
    "text_bpe_encode_bigvocab",
    # round-13: same story for the unigram-LM production-vocab encoder —
    # the row exists to drive the >=512-vocab Arrow DP against the
    # recursive-CTE oracle (the <512 expression/join form is Python-free;
    # test_round13_ops pins the two paths bit-identical)
    "text_unigram_lm_encode_bigvocab",
    # round-14: and again for the WordPiece production-vocab encoder —
    # the row exists to drive the >=512-vocab Arrow greedy against the
    # recursive-CTE oracle (the <512 expression/join form is Python-free;
    # test_round14_ops pins the two paths output-identical)
    "text_wordpiece_encode_bigvocab",
    # round-15 (optimization): the scalable-k Lloyd's assignment computes
    # its N x k squared-L2 stream through the Arrow-batched
    # fold-order-exact kernel (functions/veckernels.py) instead of the
    # interpreted HOF fold — bit-identical by construction and
    # property-pinned (test_round15_opt); the join/argmin shape is
    # unchanged, so the Python stage is a deliberate guide-§4.2 batch
    # kernel, not a row-at-a-time escape hatch
    "embedding_kmeans_bigk_assign",
}

# r9: the grouped-agg pandas UDAF class (AggregateInPandas) — allowed
# only where an exact aggregate has no built-in and the group
# cardinality is attribute-bounded (see functions/udafs.py's contract)
PANDAS_AGG_OK = {
    "lineitem_weighted_median_udaf",
}

# Live Structured Streaming queries run their plan through a memory-sink
# round trip; the returned DF is the sink table scan, so there is no
# meaningful batch plan to lint (their physical form is covered by
# streaming tests).
SKIP = {
    "streaming_snapshot_stats",
    "streaming_windowed_counts",
    "streaming_dedup_events",
    "streaming_session_flush",
    "streaming_interval_join",
}


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, build in queries().items():
        if name in SKIP:
            continue
        df = build(spark, SF)
        out[name] = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    return out


def test_no_single_buffer_exact_percentile_anywhere(plans):
    """r11 (verdict task 3): Spark's exact ``percentile()`` aggregate
    buffers every value of a group in ONE aggregation buffer (measured
    linear in SCALING_SWEEP) — banned registry-wide now that the last
    user (approx_quantile_check's check side) runs on the
    functions/median.py bisection. ``percentile_approx`` (bounded GK
    sketch) stays allowed; the regex's lookbehind keeps it and
    ``approx_percentile`` out of scope."""
    import re

    pat = re.compile(r"(?<![\w.])percentile\(")
    offenders = [n for n, p in plans.items() if pat.search(p)]
    assert not offenders, f"single-buffer exact percentile() in: {offenders}"


def test_no_cartesian_product_anywhere(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not offenders, f"unconstrained cross products in: {offenders}"


def test_no_rowwise_python_anywhere(plans):
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not offenders, f"row-at-a-time Python UDFs in: {offenders}"


def test_arrow_python_only_in_multimodal(plans):
    offenders = [
        n
        for n, p in plans.items()
        if n not in ARROW_PYTHON_OK
        and ("ArrowEvalPython" in p or "MapInPandas" in p)
    ]
    assert not offenders, f"unexpected Python stages in: {offenders}"


def test_pandas_aggregates_only_where_declared(plans):
    # grouped-agg pandas UDAFs have no map-side partial — an undeclared
    # one on a fact-scale group key is a 100 TB straggler in waiting
    offenders = [
        n
        for n, p in plans.items()
        if n not in PANDAS_AGG_OK and "AggregateInPandas" in p
    ]
    assert not offenders, f"undeclared pandas aggregates in: {offenders}"


# --------------------------------------------------------------------------
# r9: ban single-partition WindowExec over non-dim-bounded input
# (VERDICT r8 task 4). An unpartitioned ranking window moves its whole
# input through `Exchange SinglePartition` onto ONE task — the plan that
# silently stops working at 100x. Fact-scale rankings must go through
# operators.rank.global_rank / global_ntile / global_dense_rank (range
# shuffle + partitioned windows + broadcast offsets) or an explicit
# orderBy+limit (TakeOrderedAndProject). Structurally allowed: the
# offsets window INSIDE global_rank, whose input is a HashAggregate
# keyed on spark_partition_id (<= #shuffle-partitions rows, by
# construction). Everything else needs a named whitelist entry with a
# provable input bound.
# --------------------------------------------------------------------------

SINGLE_PARTITION_WINDOW_OK = {
    # 15-cell (priority x status) contingency table: the window input is
    # a groupBy over two low-cardinality enum columns — bounded by the
    # attribute domain, not the data volume
    "orders_priority_status_contingency",
    # one row per calendar YEAR of the orders timeline (~7 at any SF)
    "revenue_yoy_growth",
}

_PASS_THROUGH = ("Sort", "Project", "Filter", "WindowGroupLimit")


def _parse_formatted(plan: str):
    """(children: {id: [child ids]}, nodes: {id: (name, section body)})."""
    lines = plan.splitlines()
    tree = []  # (indent, id, name) from the header tree
    for ln in lines:
        # Any node line counts — including indented ':-' branch heads
        # (left children of multi-child joins/unions); the '(' break below
        # already stops before the numbered sections (r10, ADVICE).
        m = re.match(r"^([ +\-:*]*)(\S.*?) \((\d+)\)\s*$", ln)
        if m:
            tree.append((len(m.group(1)), int(m.group(3)), m.group(2).strip()))
        if ln.startswith("("):
            break
    children: dict[int, list[int]] = {}
    stack: list[tuple[int, int]] = []
    for indent, nid, _name in tree:
        while stack and stack[-1][0] >= indent:
            stack.pop()
        if stack:
            children.setdefault(stack[-1][1], []).append(nid)
        stack.append((indent, nid))
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


def _single_partition_windows(plan: str) -> list[int]:
    """Window node ids fed (through Sort/Project/...) by an
    ``Exchange SinglePartition`` whose input is NOT the global_rank
    offsets aggregate."""
    children, nodes = _parse_formatted(plan)
    hits = []
    for nid, (name, _body) in nodes.items():
        if not name.startswith("Window"):
            continue
        cur = nid
        while True:
            kids = children.get(cur, [])
            if not kids:
                break
            cur = kids[0]
            cname, cbody = nodes.get(cur, ("", ""))
            if cname.startswith("Exchange"):
                if "SinglePartition" in cbody:
                    below = children.get(cur, [])
                    bname, bbody = (
                        nodes.get(below[0], ("", "")) if below else ("", "")
                    )
                    if not (bname.startswith("HashAggregate") and "_pid" in bbody):
                        hits.append(nid)
                break
            if not any(cname.startswith(p) for p in _PASS_THROUGH):
                break
    return hits


def test_no_single_partition_window_over_unbounded_input(plans):
    offenders = {
        n: ids
        for n, p in plans.items()
        if n not in SINGLE_PARTITION_WINDOW_OK
        and (ids := _single_partition_windows(p))
    }
    assert not offenders, (
        "single-partition WindowExec over non-dim-bounded input in: "
        f"{offenders} — use operators.rank.global_rank/global_ntile/"
        "global_dense_rank or orderBy+limit, or whitelist with a "
        "provable input bound"
    )


# --------------------------------------------------------------------------
# r10: driver-boundary lint (VERDICT r9 task 5). Every driver-side
# action (`collect` / `toPandas` / `first` / `take` / `head`) in the
# engine package must sit beside a comment containing a bound marker —
# "bounded", "driver-boundary", or "harness boundary" — stating WHY the
# result is small at any SF, or carry a named allowlist entry. This
# turns the collect discipline from convention into structure: a
# fact-scale collect in a new query fails the suite, not a review.
# --------------------------------------------------------------------------

import ast
import io
import os
import tokenize

_ENGINE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark_stream_analyzer_spark",
)
_COLLECT_DIRS = ("plans", "operators", "functions", "sources", "streaming")
_COLLECT_METHODS = {"collect", "toPandas", "first", "take", "head"}
_COLLECT_MARKER = re.compile(
    # a marker either names the discipline or states the bound outright
    # ("# one row", "# 8 rows", "# k rows to the driver")
    r"bounded|driver.boundary|harness.boundary"
    r"|\b(one|a single|\d+|k|kb.sized)\s+rows?\b",
    re.IGNORECASE,
)
# "<relpath>:<function>" sites allowed without an inline marker (each
# needs a provable bound documented at the definition site)
_COLLECT_ALLOWLIST: set[str] = set()
_MARKER_REACH = 4  # marker may sit up to this many lines above the call


def _unmarked_collects(src: str, relpath: str) -> list[str]:
    comments: dict[int, str] = {}
    for tok in tokenize.generate_tokens(io.StringIO(src).readline):
        if tok.type == tokenize.COMMENT:
            comments[tok.start[0]] = tok.string
    tree = ast.parse(src)
    # enclosing function name per line (innermost def wins)
    func_of: dict[int, str] = {}
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for ln in range(node.lineno, (node.end_lineno or node.lineno) + 1):
                func_of[ln] = node.name
    offenders = []
    for node in ast.walk(tree):
        if not (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr in _COLLECT_METHODS
        ):
            continue
        # F.first(...) / functions.first(...) are aggregate EXPRESSIONS,
        # not driver actions
        if isinstance(node.func.value, ast.Name) and node.func.value.id in (
            "F",
            "functions",
        ):
            continue
        lo = node.lineno - _MARKER_REACH
        # +1: chained-call closers often carry the marker on the line
        # after the call ends (")  # 5 rows ...")
        hi = (node.end_lineno or node.lineno) + 1
        if any(
            _COLLECT_MARKER.search(comments.get(i, ""))
            for i in range(lo, hi + 1)
        ):
            continue
        site = f"{relpath}:{func_of.get(node.lineno, '<module>')}"
        if site in _COLLECT_ALLOWLIST:
            continue
        offenders.append(f"{relpath}:{node.lineno} ({node.func.attr})")
    return offenders


def test_driver_boundary_collects_are_marked():
    offenders = []
    for sub in _COLLECT_DIRS:
        root = os.path.join(_ENGINE_ROOT, sub)
        for fname in sorted(os.listdir(root)):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            with open(path) as f:
                src = f.read()
            offenders += _unmarked_collects(src, f"{sub}/{fname}")
    assert not offenders, (
        "driver-side actions without a bound marker (add a comment "
        "within 4 lines saying WHY the result is bounded at any SF, "
        "or an allowlist entry with the proof): "
        f"{offenders}"
    )


def test_collect_lint_catches_planted_fact_scale_collect():
    planted = (
        "def q_bad(spark, sf_dir):\n"
        "    df = spark.read.parquet(sf_dir)\n"
        "    rows = df.collect()\n"
        "    return rows\n"
    )
    assert _unmarked_collects(planted, "plans/q_scratch.py") == [
        "plans/q_scratch.py:3 (collect)"
    ]
    marked = (
        "def q_ok(spark, sf_dir):\n"
        "    # bounded: one aggregate row\n"
        "    n = df.agg(F.count('*')).collect()\n"
        "    return n\n"
    )
    assert _unmarked_collects(marked, "plans/q_scratch.py") == []
