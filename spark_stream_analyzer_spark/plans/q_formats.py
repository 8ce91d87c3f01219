"""Self-describing file-format round trips (EXT — source-format surface).

The reference ingests exactly one wire format: positional CSV lines over
Kafka (`/root/reference/src/main/java/edu/ch/unibas/dis/spark/
SparkStreamingService.java:136-158` splits by index, no quoting, no
malformed-row policy — a blank field is its only error signal). A corpus
engine needs the self-describing formats around that: quoted/escaped CSV
with embedded delimiters and newlines, and JSONL with an explicit
malformed-record policy. These queries exercise Spark's real CSV/JSON
readers on files the query itself wrote, and the DuckDB oracle computes
the expected aggregate straight from the parquet truth — so any
quoting/escaping/PERMISSIVE-mode defect shows up as a hash mismatch, not
a silently different corpus.

Harness boundary (same contract as the streaming replay queries): the
round trip materializes its tiny aggregate eagerly, removes the tmp
files, and returns a local DataFrame — the distributed write/read is
real Spark (``df.write.csv`` / ``spark.read.json`` across all
partitions); only the ≤ |sources| result rows touch the driver.

At 100 TB both shapes stay scan-shaped: the write is
partition-parallel, the read-back is a distributed file scan with the
aggregation pushed into partial aggregates; nothing here is driver-bound
except the final handful of result rows.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_stream_analyzer_spark.functions import texthash as TH
from spark_stream_analyzer_spark.plans.registry import register
from spark_stream_analyzer_spark.sources.tables import load_table

#: modulus keeping per-doc checksum terms small enough that a 100 TB
#: corpus-sized SUM stays far inside int64
_CK_MOD = 1_000_000_007

#: Spark-side gnarly-text injection, keyed on doc_id % 4 — each branch
#: plants a different CSV landmine (delimiter, quote, newline,
#: significant whitespace). The oracle mirrors it in DuckDB verbatim.
_SPARK_GNARLY = (
    "CASE CAST(doc_id % 4 AS INT)"
    " WHEN 0 THEN replace(text, ' ', ', ')"
    " WHEN 1 THEN replace(text, ' ', '\"')"
    " WHEN 2 THEN replace(text, ' ', char(10))"
    " ELSE concat('  ', text, ' ') END"
)

_DUCK_GNARLY = (
    "CASE doc_id % 4"
    " WHEN 0 THEN replace(text, ' ', ', ')"
    " WHEN 1 THEN replace(text, ' ', '\"')"
    " WHEN 2 THEN replace(text, ' ', chr(10))"
    " ELSE concat('  ', text, ' ') END"
)


@register(
    "source_csv_roundtrip",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, source, {_DUCK_GNARLY} AS text FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS sum_len,
           CAST(SUM({TH.duck_hash60("text")} % {_CK_MOD}) AS BIGINT) AS checksum
    FROM g GROUP BY source
    """,
    doc="EXT quoted-CSV round trip: doc text is salted with embedded "
    "delimiters, double quotes, newlines, and significant leading/"
    "trailing whitespace (doc_id % 4 picks the landmine), written with "
    "Spark's CSV writer (RFC-4180 quote-doubling via escape='\"', "
    "whitespace trimming OFF — the write-side default silently trims!) "
    "and read back with multiLine=true. The per-source md5 checksum is "
    "computed from the READ-BACK text, the oracle computes it from the "
    "parquet truth — any character lost or altered in flight mismatches",
)
def q_source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.expr(_SPARK_GNARLY).alias("text")
    )
    workdir = tempfile.mkdtemp(prefix="ssa_csvrt_")
    try:
        (
            docs.write.mode("overwrite")
            .option("header", True)
            .option("escape", '"')
            .option("ignoreLeadingWhiteSpace", False)
            .option("ignoreTrailingWhiteSpace", False)
            .csv(workdir)
        )
        back = (
            spark.read.schema("doc_id long, source string, text string")
            .option("header", True)
            .option("multiLine", True)
            .option("escape", '"')
            .csv(workdir)
        )
        agg = (
            back.select(
                "source",
                F.coalesce("text", F.lit("")).alias("text"),
            )
            .groupBy("source")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum(F.length("text")).alias("sum_len"),
                F.sum(F.expr(f"{TH.spark_hash60('text')} % {_CK_MOD}")).alias(
                    "checksum"
                ),
            )
        )
        rows = agg.collect()  # ≤ |sources| rows — harness boundary
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(
        rows, "source string, n_docs long, sum_len long, checksum long"
    )


@register(
    "source_json_corrupt_tolerance",
    oracle="""
    SELECT
      CAST(COUNT(CASE WHEN event_id % 7 <> 3 THEN 1 END) AS BIGINT) AS n_good,
      CAST(COUNT(CASE WHEN event_id % 7 = 3 THEN 1 END) AS BIGINT) AS n_corrupt,
      CAST(SUM(CASE WHEN event_id % 7 <> 3
               THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS sum_value_good,
      CAST(COUNT(DISTINCT CASE WHEN event_id % 7 <> 3 THEN user_id END)
           AS BIGINT) AS n_users_good
    FROM events
    """,
    doc="EXT JSONL ingestion with a malformed-record policy: every "
    "event_id % 7 == 3 line is deterministically mangled (truncated "
    "mid-object — Jackson tolerates trailing garbage, so a dangling "
    "brace is NOT enough to trip the parser) before the file hits disk; "
    "the PERMISSIVE read routes those "
    "lines into _corrupt_record with all data columns NULL instead of "
    "killing the job — the behavior a 100 TB web-scrape ingest depends "
    "on, where some fraction of lines is ALWAYS broken. Good-row sums "
    "run in DECIMAL so the verdict is exact under any partition/merge "
    "order; the oracle derives the same counts from the parquet truth "
    "using the same id rule",
)
def q_source_json_corrupt_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    line = F.to_json(F.struct("event_id", "user_id", "event_type", "value"))
    mangled = F.when(
        F.col("event_id") % 7 == 3,
        F.expr("substr(l, 1, length(l) - 5)"),
    ).otherwise(F.col("l"))
    workdir = tempfile.mkdtemp(prefix="ssa_jsonrt_")
    try:
        (
            ev.select("event_id", line.alias("l"))
            .select(mangled.alias("value"))
            .write.mode("overwrite")
            .text(workdir)
        )
        back = (
            spark.read.schema(
                "event_id long, user_id long, event_type string,"
                " value double, _corrupt_record string"
            )
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(workdir)
        )
        good = F.col("_corrupt_record").isNull()
        agg = back.agg(
            F.count(F.when(good, 1)).alias("n_good"),
            F.count(F.when(~good, 1)).alias("n_corrupt"),
            F.sum(F.when(good, F.col("value").cast("decimal(18,6)")))
            .cast("double")
            .alias("sum_value_good"),
            F.countDistinct(F.when(good, F.col("user_id"))).alias("n_users_good"),
        )
        rows = agg.collect()  # 1 row — harness boundary
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "n_good long, n_corrupt long, sum_value_good double, n_users_good long",
    )


@register(
    "source_orc_roundtrip",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(floor(epoch(MIN(l_shipdate))) AS BIGINT) AS min_ship_sec,
           CAST(floor(epoch(MAX(l_shipdate))) AS BIGINT) AS max_ship_sec
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="EXT ORC round trip (the OTHER columnar format Spark ships a "
    "native vectorized reader for): a lineitem projection spanning "
    "int64 / double / string / timestamp is written as ORC and read "
    "back; per-flag counts, DECIMAL-exact quantity sums, and min/max "
    "ship timestamps (epoch seconds — timestamp fidelity is where "
    "column formats historically diverge) must equal the parquet truth. "
    "spark-avro's connector jar is absent from this image (same "
    "environment class as the Kafka connector), so ORC is the bound of "
    "in-container format coverage; the read-back scan is vectorized and "
    "predicate-pushdown-capable exactly like the parquet path",
)
def q_source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity", "l_shipdate"
    )
    workdir = tempfile.mkdtemp(prefix="ssa_orcrt_")
    try:
        li.write.mode("overwrite").orc(workdir)
        back = spark.read.orc(workdir)
        agg = back.groupBy("l_returnflag").agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_qty"),
            F.unix_timestamp(F.min("l_shipdate")).alias("min_ship_sec"),
            F.unix_timestamp(F.max("l_shipdate")).alias("max_ship_sec"),
        )
        rows = agg.collect()  # ≤ |returnflags| rows — harness boundary
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "l_returnflag string, n_lines long, sum_qty double,"
        " min_ship_sec long, max_ship_sec long",
    )


#: XML landmines: markup metacharacters that MUST entity-escape in
#: flight (&lt; &amp; &quot;) plus embedded newlines
_SPARK_XML_GNARLY = (
    "CASE CAST(doc_id % 4 AS INT)"
    " WHEN 0 THEN replace(text, ' ', '<')"
    " WHEN 1 THEN replace(text, ' ', '&')"
    " WHEN 2 THEN replace(text, ' ', char(10))"
    " ELSE replace(text, ' ', '\"') END"
)

_DUCK_XML_GNARLY = (
    "CASE doc_id % 4"
    " WHEN 0 THEN replace(text, ' ', '<')"
    " WHEN 1 THEN replace(text, ' ', '&')"
    " WHEN 2 THEN replace(text, ' ', chr(10))"
    " ELSE replace(text, ' ', '\"') END"
)


@register(
    "source_xml_roundtrip",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, source, {_DUCK_XML_GNARLY} AS text FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS sum_len,
           CAST(SUM({TH.duck_hash60("text")} % {_CK_MOD}) AS BIGINT) AS checksum
    FROM g GROUP BY source
    """,
    doc="EXT XML round trip (Spark 4 ships the former spark-xml as a "
    "built-in source): doc text salted with markup metacharacters — "
    "'<', '&', double quotes, newlines — that must entity-escape on "
    "write and un-escape on read; the per-source md5 checksum of the "
    "READ-BACK text must equal the oracle's checksum of the parquet "
    "truth. Same distributed write/read + tiny-aggregate harness "
    "boundary as the CSV/JSON/ORC round trips",
)
def q_source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.expr(_SPARK_XML_GNARLY).alias("text")
    )
    workdir = tempfile.mkdtemp(prefix="ssa_xmlrt_")
    try:
        (
            docs.write.format("xml")
            .option("rootTag", "docs")
            .option("rowTag", "doc")
            .mode("overwrite")
            .save(workdir)
        )
        back = (
            spark.read.format("xml")
            .schema("doc_id long, source string, text string")
            .option("rowTag", "doc")
            .load(workdir)
        )
        agg = (
            back.select("source", F.coalesce("text", F.lit("")).alias("text"))
            .groupBy("source")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum(F.length("text")).alias("sum_len"),
                F.sum(F.expr(f"{TH.spark_hash60('text')} % {_CK_MOD}")).alias(
                    "checksum"
                ),
            )
        )
        rows = agg.collect()  # ≤ |sources| rows — harness boundary
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(
        rows, "source string, n_docs long, sum_len long, checksum long"
    )


@register(
    "source_binaryfile_ingest",
    oracle="""
    SELECT doc_id,
           CAST(3 + doc_id % 5 AS BIGINT) AS width,
           CAST(2 + doc_id % 4 AS BIGINT) AS height,
           ROUND(doc_id % 200 + (2 + doc_id % 4 - 1) / 2.0, 6) AS mean_pixel,
           CAST(2 + doc_id % 4 AS BIGINT) AS n_filters_used
    FROM documents WHERE doc_id % 17 = 3
    """,
    doc="EXT binary-file ingestion source — the canonical way media "
    "corpora enter Spark at 100 TB: real .png FILES on disk read with "
    "``format('binaryFile')`` (path/length/content schema, files "
    "partition-parallel across executors, ``pathGlobFilter`` pushed "
    "into the listing), doc identity recovered from the file name, "
    "payloads decoded by the round-6 PNG decoder. Fixture files are "
    "written executor-side (foreachPartition — the driver never "
    "touches payload bytes); ~6% of docs (doc_id % 17 = 3) keeps "
    "the small-file fixture bounded. Closed-form decode stats prove "
    "the bytes survived the disk round trip body-exact",
)
def q_source_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_analyzer_spark.operators import multimodal as mm

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 17 == 3
    )
    payloads = mm.synth_png_payloads(docs)
    workdir = tempfile.mkdtemp(prefix="ssa_binfile_")

    def _write_part(rows):
        # executor-side file materialization: in local mode this is the
        # same disk; on a cluster this step is the producer's job and
        # the files land in object storage
        for r in rows:
            with open(f"{workdir}/doc_{r['doc_id']}.png", "wb") as f:
                f.write(bytes(r["payload"]))

    try:
        payloads.foreachPartition(_write_part)
        binf = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.png")
            .load(workdir)
        )
        parsed = binf.select(
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.png$", 1)
            .cast("long")
            .alias("doc_id"),
            F.col("content").alias("payload"),
        )
        stats = mm.png_decode_stats(parsed).select(
            "doc_id", "width", "height", "mean_pixel", "n_filters_used"
        )
        rows = stats.collect()  # bounded: ~6% of docs — harness boundary
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "doc_id long, width long, height long, mean_pixel double, "
        "n_filters_used long",
    )


@register(
    "source_python_datasource_wire",
    oracle=f"""
    WITH lines AS (
      SELECT event_id % 8 AS file_idx,
             'e' || CAST(event_id AS VARCHAR) || ','
                 || CAST(CAST(floor(epoch(ts)) AS BIGINT) AS VARCHAR) || ','
                 || event_type AS value
      FROM events WHERE event_id < 20000
    )
    SELECT file_idx,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM({TH.duck_hash60("value")} % {_CK_MOD}) AS BIGINT)
             AS checksum
    FROM lines GROUP BY file_idx
    """,
    doc="EXT custom Python Data Source (Spark 4 pyspark.sql.datasource) "
    "— the engine's demonstrated CONNECTOR-GAP pattern (the same env "
    "class as the absent Kafka jar): the wirelog format declares "
    "schema + one-InputPartition-per-file planning in Python, so a "
    "directory of N log files reads as N parallel tasks and only the "
    "file LIST crosses the driver. Eight replay files are read back "
    "through the source and checksummed per file against the parquet "
    "truth — identity from the source's src_file column, fidelity "
    "from the md5-60bit line checksum. Slow path by design (rows "
    "cross the Python worker): bespoke formats only, never a stand-in "
    "for JVM readers",
)
def q_source_python_datasource_wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_analyzer_spark.plans.q_wire import _base
    from spark_stream_analyzer_spark.sources.wire_datasource import register_wirelog

    b = _base(spark, sf_dir).filter(F.col("event_id") < 20000)
    rows = b.select(
        (F.col("event_id") % 8).alias("file_idx"),
        F.concat_ws(
            ",",
            F.concat(F.lit("e"), F.col("event_id")),
            F.col("sec"),
            F.col("event_type"),
        ).alias("value"),
    ).collect()  # bounded replay fixture — harness boundary
    workdir = tempfile.mkdtemp(prefix="ssa_pyds_")
    by_file: dict[int, list[str]] = {}
    for r in rows:
        by_file.setdefault(r.file_idx, []).append(r.value)
    for idx, lines in by_file.items():
        with open(f"{workdir}/{idx:03d}.txt", "w") as f:
            f.write("\n".join(lines) + "\n")
    register_wirelog(spark)
    try:
        back = spark.read.format("wirelog").options(path=workdir).load()
        agg = (
            back.select(
                F.regexp_extract("src_file", r"^(\d+)\.txt$", 1)
                .cast("long")
                .alias("file_idx"),
                "value",
            )
            .groupBy("file_idx")
            .agg(
                F.count("*").alias("n_lines"),
                F.sum(F.expr(f"{TH.spark_hash60('value')} % {_CK_MOD}")).alias(
                    "checksum"
                ),
            )
        )
        out = agg.collect()  # 8 rows
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(
        out, "file_idx long, n_lines long, checksum long"
    )


@register(
    "sink_python_datasource_roundtrip",
    oracle=f"""
    WITH lines AS (
      SELECT 'e' || CAST(event_id AS VARCHAR) || ','
                 || CAST(CAST(floor(epoch(ts)) AS BIGINT) AS VARCHAR) || ','
                 || event_type AS value
      FROM events WHERE event_id < 20000
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM({TH.duck_hash60("value")} % {_CK_MOD}) AS BIGINT)
             AS checksum,
           1::INT AS files_ok,
           1::INT AS manifest_ok
    FROM lines
    """,
    doc="EXT custom Python Data Source WRITER (r8, verdict task 5) — the "
    "other half of the connector-gap pattern: the wire lines are built "
    "as a DataFrame (no driver collect) and written through the "
    "wirelog sink's partition-parallel two-phase commit (each task "
    "stages part-<uuid>.txt under _staging/, the driver renames + "
    "publishes an atomic manifest — sources/wire_datasource.py: "
    "WireLogWriter), then read back through the wirelog SOURCE and "
    "checksummed against the parquet truth. files_ok bounds the "
    "committed file count to the write's partition count; manifest_ok "
    "pins that the manifest's file list equals exactly the files the "
    "read-back observed (src_file identity) — a commit that leaks a "
    "staged file, loses a partition, or double-publishes flips it. "
    "The abort direction (failed job leaves the committed snapshot "
    "untouched) is pinned by test_round8_ops.py",
)
def q_sink_python_datasource_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os

    from spark_stream_analyzer_spark.plans.q_wire import _base
    from spark_stream_analyzer_spark.sources.wire_datasource import (
        MANIFEST,
        register_wirelog,
    )

    b = _base(spark, sf_dir).filter(F.col("event_id") < 20000)
    lines = b.select(
        F.concat_ws(
            ",",
            F.concat(F.lit("e"), F.col("event_id")),
            F.col("sec"),
            F.col("event_type"),
        ).alias("value")
    )
    register_wirelog(spark)
    workdir = tempfile.mkdtemp(prefix="ssa_pydsw_")
    target = f"{workdir}/out"
    os.makedirs(target)
    try:
        # distributed write: 8 parallel writer tasks, one staged file
        # each, single driver-side manifest publish
        lines.repartition(8).write.format("wirelog").mode("append").option(
            "path", target
        ).save()
        with open(os.path.join(target, MANIFEST)) as f:
            manifest_files = set(_json.load(f)["files"])
        back = spark.read.format("wirelog").options(path=target).load()
        agg = back.agg(
            F.count("*").alias("n_lines"),
            F.sum(F.expr(f"{TH.spark_hash60('value')} % {_CK_MOD}")).alias(
                "checksum"
            ),
            F.countDistinct("src_file").alias("n_files"),
            F.collect_set("src_file").alias("seen_files"),
        )
        row = agg.collect()[0]  # one row
        files_ok = int(1 <= row.n_files <= 8)
        manifest_ok = int(set(row.seen_files) == manifest_files)
        return spark.createDataFrame(
            [(row.n_lines, row.checksum, files_ok, manifest_ok)],
            "n_lines long, checksum long, files_ok int, manifest_ok int",
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


# ---------------------------------------------------------------------------
# round-7: storage-layout maintenance as driver rows
# ---------------------------------------------------------------------------


@register(
    "source_partitioned_pruned_scan",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(user_id) AS BIGINT) AS user_sum,
           1::INT AS pruned
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type
    """,
    doc="EXT partitioned layout + partition pruning as a driver row (r7; "
    "previously tests-only in sources/layout.py): events written "
    "partitionBy(event_type) with repartition-aligned writers (one "
    "file per directory — the anti-small-files discipline) and "
    "user_id clustering, read back through a partition-column filter. "
    "The emitted `pruned` bit comes from the READER'S OWN physical "
    "scan (PartitionFilters non-empty on the executed plan) — at "
    "100 TB this is the difference between opening 2 directories and "
    "scanning the table; a regression that silently drops pruning "
    "(e.g. a cast on the partition column) flips the driver row red. "
    "Aggregate values prove the partitioned round trip is lossless",
)
def q_source_partitioned_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_analyzer_spark.sources.layout import (
        partition_filters_of,
        scan_with_pruning,
        write_partitioned,
    )

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    workdir = tempfile.mkdtemp(prefix="ssa_part_")
    try:
        write_partitioned(ev, workdir, ["event_type"], cluster_by=["user_id"])
        back = scan_with_pruning(spark, workdir).filter(
            F.col("event_type").isin("click", "purchase")
        )
        pruned = int(partition_filters_of(back) != "")
        agg = back.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum("user_id").alias("user_sum"),
            F.lit(pruned).cast("int").alias("pruned"),
        )
        rows = agg.collect()  # bounded: one row per selected partition
        return spark.createDataFrame(rows, agg.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


@register(
    "source_dynamic_partition_overwrite",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(floor(value * 2) AS BIGINT)
                         ELSE CAST(floor(value) AS BIGINT) END) AS BIGINT)
             AS value_sum
    FROM events
    GROUP BY event_type
    """,
    doc="EXT dynamic partition overwrite (r8) — the partition-scoped "
    "rewrite every partitioned 100 TB lake uses for backfills: events "
    "written partitionBy(event_type), then ONE partition's data "
    "(purchase, values doubled) rewritten with "
    "partitionOverwriteMode=dynamic. The aggregate oracle pins all "
    "three failure modes at once: static-overwrite semantics would "
    "DELETE the untouched partitions (their groups vanish → row-count "
    "mismatch), append semantics would double the purchase count, and "
    "a missed rewrite would leave the purchase sum at 1×. INSERT "
    "OVERWRITE of one day/type touching petabytes of siblings is the "
    "classic static-mode incident this mode exists to prevent",
)
def q_source_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    workdir = tempfile.mkdtemp(prefix="ssa_dynpow_")
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try:
        ev.write.partitionBy("event_type").mode("overwrite").parquet(workdir)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # the backfill: rewrite ONLY the purchase partition (2x values);
        # in dynamic mode the overwrite's scope is the partitions the
        # incoming frame actually contains — everything else untouched
        (
            ev.filter(F.col("event_type") == "purchase")
            .withColumn("value", F.col("value") * 2)
            .write.partitionBy("event_type")
            .mode("overwrite")
            .parquet(workdir)
        )
        back = spark.read.parquet(workdir)
        agg = back.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.expr("cast(floor(value) as bigint)")).alias("value_sum"),
        )
        rows = agg.collect()  # bounded: one row per event type
        return spark.createDataFrame(rows, agg.schema)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
        shutil.rmtree(workdir, ignore_errors=True)


@register(
    "source_small_file_compaction",
    oracle=f"""
    SELECT CAST(1 AS INT) AS fragmented,
           CAST(1 AS INT) AS compacted,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND({{msum}}, 6) AS total_price
    FROM lineitem
    """.replace(
        "{msum}",
        "(CAST(SUM(CAST(FLOOR((l_extendedprice) * 1000000 + 0.5) AS BIGINT)"
        " // 1000000) AS DOUBLE)"
        " + CAST(SUM(CAST(FLOOR((l_extendedprice) * 1000000 + 0.5) AS BIGINT)"
        " % 1000000) AS DOUBLE) / 1000000.0)",
    ),
    doc="EXT small-file compaction as a driver row (r7) — the table "
    "maintenance every 100 TB lake runs on a schedule: a fact slice "
    "deliberately written as 64 task-sized fragments (what a 10k-task "
    "job without write repartitioning produces — metadata death at "
    "scale) is compacted by a distributed read → repartition(4) → "
    "rewrite. The verdict bits are BOUNDS derived from the actual "
    "directory listings (fragmented: ≥16 files before; compacted: ≤4 "
    "files after AND fewer than before) rather than exact counts — "
    "r7 pinned n_before=64/n_after=4 exactly, which also encoded the "
    "incidental writer behavior that every round-robin partition is "
    "non-empty and emits exactly one file; a corpus slice under 64 "
    "rows or a writer change would have flipped the row red with no "
    "real regression (r8, ADVICE). Row count + msum6-exact price "
    "still prove the rewrite is lossless — a compaction that drops or "
    "duplicates rows (the classic concurrent-writer bug) flips the "
    "driver row red",
)
def q_source_small_file_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob
    import os

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    workdir = tempfile.mkdtemp(prefix="ssa_compact_")
    small, compact = f"{workdir}/small", f"{workdir}/compact"

    def _nfiles(path: str) -> int:
        return len(_glob.glob(os.path.join(path, "*.parquet")))

    try:
        li.repartition(64).write.mode("overwrite").parquet(small)
        n_before = _nfiles(small)
        spark.read.parquet(small).repartition(4).write.mode("overwrite").parquet(
            compact
        )
        n_after = _nfiles(compact)
        m = "CAST(FLOOR(l_extendedprice * 1000000 + 0.5) AS BIGINT)"
        agg = spark.read.parquet(compact).agg(
            F.lit(int(n_before >= 16)).cast("int").alias("fragmented"),
            F.lit(int(n_after <= 4 and n_after < n_before))
            .cast("int")
            .alias("compacted"),
            F.count("*").alias("n_rows"),
            F.round(
                F.expr(f"CAST(SUM({m} DIV 1000000) AS DOUBLE)")
                + F.expr(f"CAST(SUM({m} % 1000000) AS DOUBLE) / 1000000.0"),
                6,
            ).alias("total_price"),
        )
        rows = agg.collect()  # one row
        return spark.createDataFrame(rows, agg.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


@register(
    "source_schema_evolution_merge",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_v1_rows,
           CAST(SUM(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_v2_rows,
           CAST(SUM(CASE WHEN o_orderkey % 2 = 1
                         THEN length(o_orderpriority) ELSE 0 END) AS BIGINT)
             AS v2_prio_chars
    FROM orders
    """,
    doc="EXT schema evolution via mergeSchema (r7) — the ingestion "
    "reality every long-lived 100 TB table faces: batch 1 lands with "
    "the v1 schema (orderkey, totalprice), batch 2 lands with an ADDED "
    "column (orderpriority), both under one table root as partition "
    "directories. A mergeSchema read must unify them: v1 rows surface "
    "the new column as NULL (n_v1_rows counts them via the null), v2 "
    "rows keep their values (v2_prio_chars checksums the evolved "
    "column's content). Footer-only schema merge — no data rewrite, "
    "the evolution pattern that avoids recasting 100 TB; a reader that "
    "drops the new column, fills wrong defaults, or loses v1 rows "
    "flips the row red",
)
def q_source_schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_totalprice")
    v2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    workdir = tempfile.mkdtemp(prefix="ssa_evolve_")
    try:
        v1.write.mode("overwrite").parquet(f"{workdir}/batch=1")
        v2.write.mode("overwrite").parquet(f"{workdir}/batch=2")
        back = spark.read.option("mergeSchema", "true").parquet(workdir)
        assert "o_orderpriority" in back.columns  # unified schema
        agg = back.agg(
            F.count("*").alias("n_rows"),
            F.sum(
                F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0)
            ).alias("n_v1_rows"),
            F.sum(
                F.when(F.col("o_orderpriority").isNotNull(), 1).otherwise(0)
            ).alias("n_v2_rows"),
            F.sum(
                F.coalesce(F.length("o_orderpriority"), F.lit(0)).cast("long")
            ).alias("v2_prio_chars"),
        )
        rows = agg.collect()  # one row
        return spark.createDataFrame(rows, agg.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


@register(
    "source_zorder_multidim_pruning",
    oracle="""
    SELECT CAST(16 AS INT) AS n_files,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           1::INT AS z_user_ok,
           1::INT AS z_day_ok,
           1::INT AS lin_user_ok,
           1::INT AS lin_day_all
    FROM events
    """,
    doc="EXT Z-order multi-dimensional clustering (r7) — the layout "
    "technique ACID lakehouses expose as ZORDER BY, built from plain "
    "column expressions (sources/layout.py:zorder_key, MSB-aligned "
    "Morton interleave of user_id and day): events are written 16 "
    "range-partitioned files sorted by the interleaved key, and the "
    "verdict bits are computed from the REAL parquet footer min/max "
    "stats — what row-group/file skipping actually consults. Pinned "
    "(3 point probes per dimension, worst case): Z-layout confines "
    "BOTH dimensions to <= 10/16 files (measured <= 8), while the "
    "single-column linear layout is perfect on its sort key "
    "(<= 2/16) but touches ALL 16 files for every day probe — the "
    "asymmetry Z-order exists to fix. At 100 TB this is the "
    "difference between a secondary-dimension query scanning ~60% "
    "vs 100% of a partition's files, with no index structure to "
    "maintain; bounds (not exact counts) keep the row stable under "
    "range-partitioner sampling. Row count pins the round trip",
)
def q_source_zorder_multidim_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from spark_stream_analyzer_spark.sources.layout import (
        file_minmax_ranges,
        zorder_key,
    )

    n_files = 16
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.floor(F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias(
            "day"
        ),
    )
    # bounded one-row bounds fetch (the k-means-centroid discipline)
    b = ev.agg(
        F.min("day").alias("dmin"),
        F.max("day").alias("dmax"),
        F.max("user_id").alias("umax"),
        F.count(F.lit(1)).alias("n_rows"),
    ).collect()[0]
    bu = max(1, math.ceil(math.log2(b.umax + 1)))
    bd = max(1, math.ceil(math.log2(b.dmax - b.dmin + 1)))
    z = zorder_key(
        [(F.col("user_id"), bu), (F.col("day") - F.lit(b.dmin), bd)]
    )
    workdir = tempfile.mkdtemp(prefix="ssa_zorder_")
    zp, lp = f"{workdir}/zorder", f"{workdir}/linear"
    try:
        (
            ev.withColumn("z", z)
            .repartitionByRange(n_files, "z")
            .sortWithinPartitions("z")
            .drop("z")
            .write.mode("overwrite")
            .parquet(zp)
        )
        (
            ev.repartitionByRange(n_files, "user_id")
            .sortWithinPartitions("user_id")
            .write.mode("overwrite")
            .parquet(lp)
        )

        def worst(path: str, column: str, probes) -> tuple[int, int]:
            # (worst files touched, files WITH stats): range partitioning
            # can leave empty partitions -> zero-row-group files with no
            # footer stats (seen at sf0.001: 15 users over 16 ranges), so
            # the every-file comparison must count stat-bearing files,
            # never the requested partition count
            ranges = file_minmax_ranges(path, column)
            return (
                max(sum(1 for lo, hi in ranges if lo <= p <= hi) for p in probes),
                len(ranges),
            )

        u_probes = [b.umax // 4, b.umax // 2, 3 * b.umax // 4]
        # clamp to the actual day span so a shorter-range corpus cannot
        # push a probe past dmax (all files would report 0 touched)
        d_probes = [min(b.dmin + off, b.dmax) for off in (7, 15, 22)]
        zu, _ = worst(zp, "user_id", u_probes)
        zd, _ = worst(zp, "day", d_probes)
        lu, _ = worst(lp, "user_id", u_probes)
        ld, n_lin_files = worst(lp, "day", d_probes)
        n_back = spark.read.parquet(zp).count()
        return spark.createDataFrame(
            [
                (
                    n_files,
                    n_back,
                    int(zu <= 10),
                    int(zd <= 10),
                    int(lu <= 2),
                    int(n_lin_files > 0 and ld == n_lin_files),
                )
            ],
            "n_files int, n_rows long, z_user_ok int, z_day_ok int, "
            "lin_user_ok int, lin_day_all int",
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


@register(
    "source_file_provenance",
    oracle="""
    SELECT o_orderpriority AS priority_from_path,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(1 AS BIGINT) AS n_files
    FROM orders GROUP BY o_orderpriority
    """,
    doc="EXT ingest lineage via input_file_name(): orders written "
    "partitionBy(o_orderpriority) with repartition-aligned writers "
    "(one file per partition), read back, and the priority is "
    "recovered FROM THE FILE PATH alone (url_decode of the Hive "
    "partition segment — '4-NOT SPECIFIED' round-trips through %20), "
    "never from the column — the per-source-file accounting every "
    "ingest pipeline needs (which file contributed which rows, file "
    "counts per partition). input_file_name is a per-row metadata "
    "expression: zero extra I/O, codegen, and the groupBy collapses "
    "map-side. Oracle is the plain priority rollup plus the pinned "
    "one-file-per-partition write geometry",
)
def q_source_file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    workdir = tempfile.mkdtemp(prefix="ssa_prov_")
    try:
        (
            o.repartition(F.col("o_orderpriority"))
            .write.partitionBy("o_orderpriority")
            .parquet(f"{workdir}/t")
        )
        back = spark.read.parquet(f"{workdir}/t")
        prov = back.select(
            F.url_decode(
                F.regexp_extract(
                    F.input_file_name(), r"o_orderpriority=([^/]+)/", 1
                )
            ).alias("priority_from_path"),
            F.input_file_name().alias("path"),
        )
        out = prov.groupBy("priority_from_path").agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("path").alias("n_files"),
        )
        rows = out.collect()  # bounded: one row per priority (5)
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
