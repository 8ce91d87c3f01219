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
    # round-8: the UDTF row's Python boundary IS its subject — it exists
    # to pin the extension-API class against the codegen explode twin
    # (test_round8_ops pins the twin's plan has NO Python stage)
    "doc_chunk_windows_udtf",
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
