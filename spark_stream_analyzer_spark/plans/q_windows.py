"""Oracle-checked event-time window queries (EXT) over the events table.

These run the REAL Spark window operators (``F.window`` /
``F.session_window``) in batch mode — the same builder functions the
streaming tests replay through a file source (stream/batch consistency,
the Structured Streaming paper's core promise). The DuckDB oracles
re-derive window membership arithmetically (epoch-aligned buckets,
generate_series fan-out for sliding, gaps-and-islands for sessions) —
an independent formulation, so alignment/boundary bugs mismatch.

Timestamps: ``ts`` is the µs-truncated event time (see
sources/tables.py); both sides reduce window bounds to epoch
seconds/µs longs for the hash compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_stream_analyzer_spark.functions.scalar import round6
from spark_stream_analyzer_spark.plans.registry import register
from spark_stream_analyzer_spark.sources.tables import load_table
from spark_stream_analyzer_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
)


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@register(
    "events_tumbling_daily",
    oracle="""
    SELECT (epoch_us(ts) // 1000000) // 86400 * 86400 AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 6) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="EXT tumbling window (1 day, epoch-aligned) × event_type — the "
    "canonical streaming windowed agg, checked in its batch form",
)
def q_events_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = tumbling_agg(
        _events(spark, sf_dir),
        "ts",
        "1 day",
        ["event_type"],
        [F.count("*").alias("n_events"), round6(F.sum("value")).alias("sum_value")],
    )
    return out.select(
        F.unix_timestamp("window.start").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


@register(
    "events_sliding_1d_6h",
    oracle="""
    SELECT ((epoch_us(ts) // 1000000) // 21600 - k.k) * 21600 AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k
    GROUP BY 1
    """,
    doc="EXT sliding window (1 day, 6 h slide): every event fans out to "
    "4 overlapping windows; oracle re-derives membership arithmetically",
)
def q_events_sliding_1d_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = sliding_agg(
        _events(spark, sf_dir),
        "ts",
        "1 day",
        "6 hours",
        [],
        [
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        ],
    )
    return out.select(
        F.unix_timestamp("window.start").alias("window_start"),
        "n_events",
        "n_users",
    )


@register(
    "events_session_windows",
    oracle="""
    WITH o AS (
      SELECT user_id, epoch_us(ts) AS tus,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
                  < 86400000000 THEN 0 ELSE 1 END AS new_s
      FROM events),
    s AS (SELECT user_id, tus,
            SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM o)
    SELECT user_id,
           MIN(tus) AS session_start_us,
           MAX(tus) + 86400000000 AS session_end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    doc="EXT session windows (24 h gap) per user via native "
    "session_window; oracle is an independent gaps-and-islands derivation",
)
def q_events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = session_agg(
        _events(spark, sf_dir),
        "ts",
        "24 hours",
        ["user_id"],
        [F.count("*").alias("n_events")],
    )
    return out.select(
        "user_id",
        F.unix_micros("session_window.start").alias("session_start_us"),
        F.unix_micros("session_window.end").alias("session_end_us"),
        "n_events",
    )


@register(
    "events_asof_last_purchase",
    oracle="""
    WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    r AS (SELECT user_id, ts, MAX(value) AS pv FROM events
          WHERE event_type = 'purchase' GROUP BY user_id, ts)
    SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
           ROUND(r.pv, 6) AS last_purchase_value
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND r.ts <= l.ts
    """,
    doc="EXT as-of join (J5 generalized): each click joined to the "
    "user's latest at-or-before purchase via the union+window trick "
    "(one shuffle+sort, no per-row subquery); oracle uses DuckDB's "
    "NATIVE ASOF JOIN — two independent implementations must agree",
)
def q_events_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_analyzer_spark.operators.asof import asof_join_backward

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pv"))
    )
    out = asof_join_backward(
        clicks, purchases, by="user_id", ts_col="ts", value_col="pv",
        out_col="last_purchase_value",
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        round6(F.col("last_purchase_value")).alias("last_purchase_value"),
    )


@register(
    "events_json_props",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_over_50
    FROM events GROUP BY event_type
    """,
    doc="EXT semi-structured extraction: schema-enforced from_json over "
    "the JSON props column (the scalable form — typed struct, no "
    "per-row schema inference), aggregated by event type",
)
def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    k = F.from_json("props", "struct<k:long>").getField("k")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).cast("long").alias("n_over_50"),
        )
    )


@register(
    "events_interarrival_stats",
    oracle="""
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
      FROM events)
    SELECT event_type,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           ROUND(AVG(gap_us / 1000000.0), 6) AS avg_gap_s,
           CAST(MAX(gap_us) // 1000000 AS BIGINT) AS max_gap_s
    FROM g GROUP BY event_type
    """,
    doc="lead/lag window class (SURVEY §2.7 'absent in reference, "
    "available native'): per-user inter-arrival gaps via lag, "
    "aggregated by event type",
)
def q_events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _events(spark, sf_dir).withColumn("tus", F.unix_micros("ts"))
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    g = ev.withColumn("gap_us", F.col("tus") - F.lag("tus").over(w))
    return g.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        round6(F.avg(F.col("gap_us") / 1_000_000.0)).alias("avg_gap_s"),
        F.expr("max(gap_us) DIV 1000000").alias("max_gap_s"),
    )


@register(
    "events_trailing_hour_activity",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER (PARTITION BY user_id
                ORDER BY epoch_us(ts) // 1000000
                RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_last_hour
    FROM events
    """,
    doc="RANGE-frame window class: per-user trailing-1-hour event count "
    "over an event-time range frame (not rows) — the rate-limiter shape",
)
def q_events_trailing_hour_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _events(spark, sf_dir).withColumn(
        "sec", F.expr("unix_micros(ts) DIV 1000000")
    )
    w = Window.partitionBy("user_id").orderBy("sec").rangeBetween(-3600, 0)
    return ev.select(
        "event_id", "user_id", F.count("*").over(w).alias("n_last_hour")
    )


@register(
    "events_purchase_followup_range",
    oracle="""
    SELECT p.event_id AS purchase_id,
           CAST(COUNT(e.event_id) AS BIGINT) AS n_followup,
           ROUND(COALESCE(SUM(e.value), 0), 6) AS followup_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN events e
      ON e.user_id = p.user_id
     AND e.ts >  p.ts
     AND e.ts <= p.ts + INTERVAL 1 HOUR
    GROUP BY p.event_id
    """,
    doc="range/interval join class (SURVEY §2.6 'absent in reference, "
    "available native'): per purchase, activity in the following hour. "
    "The equi key (user_id) keeps this a hash/sort-merge join with a "
    "band residual — never a cross product; at 100 TB both sides "
    "shuffle-partition by user_id and the band predicate evaluates "
    "in-partition (add a coarse time-bucket key to the join if a single "
    "user's history exceeds one partition)",
)
def q_events_purchase_followup_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    e = ev.select("user_id", "ts", "value", "event_id")
    return (
        p.join(
            e,
            (e.user_id == p.p_user)
            & (e.ts > p.p_ts)
            & (e.ts <= p.p_ts + F.expr("INTERVAL 1 HOUR")),
            "left",
        )
        .groupBy("purchase_id")
        .agg(
            F.count("event_id").alias("n_followup"),
            round6(F.coalesce(F.sum("value"), F.lit(0.0))).alias("followup_value"),
        )
    )


@register(
    "events_user_funnel",
    oracle="""
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
    v AS (SELECT user_id, MIN(tus) AS t_view FROM e
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.tus) AS t_click
          FROM e JOIN v ON v.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.tus >= v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.tus) AS t_purchase
          FROM e JOIN c ON c.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.tus >= c.t_click
          GROUP BY e.user_id)
    SELECT v.user_id, CAST(v.t_view AS BIGINT) AS t_view,
           CAST(c.t_click AS BIGINT) AS t_click,
           CAST(p.t_purchase AS BIGINT) AS t_purchase
    FROM v LEFT JOIN c ON c.user_id = v.user_id
           LEFT JOIN p ON p.user_id = v.user_id
    """,
    doc="sequential conversion funnel (view → first click after the "
    "first view → first purchase after that click): ordered multi-stage "
    "pattern matching as cascaded conditional MIN aggregates. Each stage "
    "is one agg + one equi-join on user_id — every join key is the same, "
    "so on a cluster all three stages share one partitioning (no "
    "re-shuffle after the first); never a per-user sort or UDF",
)
def q_events_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).select(
        "user_id",
        "event_type",
        (F.unix_micros("ts")).alias("tus"),
    ).repartition("user_id")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("tus").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("tus") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("tus").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("tus") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("tus").alias("t_purchase"))
    )
    return v.join(c, "user_id", "left").join(p, "user_id", "left").select(
        "user_id", "t_view", "t_click", "t_purchase"
    )


@register(
    "events_variant_shred",
    oracle="""
    SELECT
      CASE event_type WHEN 'click' THEN 'c'
                      WHEN 'purchase' THEN 'p' ELSE 'o' END AS kind,
      CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(CASE WHEN event_type = 'click'
               THEN user_id % 100 END) AS BIGINT) AS sum_x,
      CAST(SUM(CASE WHEN event_type = 'purchase'
               THEN CAST(ROUND(value, 2) AS DECIMAL(18,6)) END) AS DOUBLE)
        AS sum_amount,
      CAST(SUM(CASE WHEN event_type = 'purchase'
               THEN event_id % 5 END) AS BIGINT) AS sum_item0
    FROM events
    GROUP BY 1
    """,
    doc="EXT VariantType semi-structured path (Spark 4's shredded "
    "binary-JSON encoding): heterogeneous per-type JSON documents — "
    "nested object for clicks, array field for purchases, flat note "
    "otherwise — are parse_json'd to VARIANT once and field-extracted "
    "with typed variant_get paths ('$.pos.x', '$.items[0]'), the "
    "schema-on-read form that replaces rigid from_json structs when "
    "documents genuinely vary. The oracle is FIRST-PRINCIPLES "
    "arithmetic over the raw columns (no JSON at all), so the whole "
    "synth→parse→shred→extract chain is checked against closed form; "
    "at 100 TB variant's binary encoding scans ~an order faster than "
    "re-parsing JSON text per query",
)
def q_events_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    j = F.expr(
        "CASE event_type"
        " WHEN 'click' THEN to_json(named_struct('kind', 'c',"
        "   'pos', named_struct('x', user_id % 100, 'y', event_id % 7)))"
        " WHEN 'purchase' THEN to_json(named_struct('kind', 'p',"
        "   'amount', round(value, 2), 'items', array(event_id % 5, event_id % 3)))"
        " ELSE to_json(named_struct('kind', 'o', 'note', event_type)) END"
    )
    v = ev.select(F.parse_json(j).alias("v"))
    return (
        v.select(
            F.expr("variant_get(v, '$.kind', 'string')").alias("kind"),
            F.expr("variant_get(v, '$.pos.x', 'bigint')").alias("x"),
            F.expr("variant_get(v, '$.amount', 'decimal(18,6)')").alias("amount"),
            F.expr("variant_get(v, '$.items[0]', 'bigint')").alias("item0"),
        )
        .groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sum_x"),
            F.sum("amount").cast("double").alias("sum_amount"),
            F.sum("item0").alias("sum_item0"),
        )
    )


@register(
    "events_cep_chain",
    oracle="""
    WITH p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS ps
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT DISTINCT user_id, epoch_us(ts) AS cs
          FROM events WHERE event_type = 'click'),
    v AS (SELECT DISTINCT user_id, epoch_us(ts) AS vs
          FROM events WHERE event_type = 'view'),
    pc AS (SELECT p.*, c.cs FROM p
           ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.cs <= p.ps),
    pcv AS (SELECT pc.*, v.vs FROM pc
            ASOF LEFT JOIN v ON pc.user_id = v.user_id AND v.vs <= pc.cs)
    SELECT purchase_id, user_id,
           CASE WHEN ps - cs <= 3600000000 THEN ps - cs END AS click_gap_us,
           CASE WHEN ps - cs <= 3600000000 AND cs - vs <= 3600000000
                THEN cs - vs END AS view_gap_us,
           CAST(CASE WHEN ps - cs <= 3600000000 AND cs - vs <= 3600000000
                THEN 1 ELSE 0 END AS INT) AS matched
    FROM pcv
    """,
    doc="EXT CEP chain qualification (MATCH_RECOGNIZE's most common "
    "pattern, view→click→purchase, as two chained as-of hops): each "
    "purchase qualifies iff its LATEST preceding click is within 1 h "
    "and that click's latest preceding view is within 1 h of the "
    "click — per-purchase pattern matching (every instance), distinct "
    "from events_user_funnel's global first-conversion. Each hop is "
    "one operators/asof.py union+window pass (one shuffle+sort, no "
    "per-row subquery, no range explosion); hop 2 runs only over "
    "hop-1-matched rows and the unmatched remainder unions back "
    "null-extended. All outputs are CASE-guarded on the full chain "
    "condition, so both engines agree even where DuckDB's ASOF "
    "matches a NULL left timestamp (measured: it does — treated as "
    "+inf) while Spark's split skips it. Oracle = DuckDB's native "
    "ASOF chain — two independent implementations",
)
def q_events_cep_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_analyzer_spark.operators.asof import asof_join_backward

    ev = _events(spark, sf_dir)
    us = F.unix_micros("ts")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", us.alias("tus")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", us.alias("tus"))
        .distinct()
        .select("user_id", "tus", F.col("tus").alias("cts"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", us.alias("tus"))
        .distinct()
        .select("user_id", "tus", F.col("tus").alias("vts"))
    )
    pc = asof_join_backward(p, c, by="user_id", ts_col="tus", value_col="cts")
    hit = pc.filter(F.col("cts").isNotNull())
    miss = pc.filter(F.col("cts").isNull()).withColumn(
        "vts", F.lit(None).cast("long")
    )
    # hop 2 joins on the CLICK's time: re-key the left ts to cts
    hop2 = asof_join_backward(
        hit.select("purchase_id", "user_id", F.col("tus").alias("ps"),
                   F.col("cts").alias("tus")),
        v,
        by="user_id",
        ts_col="tus",
        value_col="vts",
    ).select(
        "purchase_id", "user_id",
        F.col("ps").alias("tus"), F.col("tus").alias("cts"), "vts",
    )
    hour_us = 3600 * 1_000_000
    full = hop2.unionByName(
        miss.select("purchase_id", "user_id", "tus", "cts", "vts")
    )
    chain_ok = (F.col("tus") - F.col("cts") <= hour_us) & (
        F.col("cts") - F.col("vts") <= hour_us
    )
    return full.select(
        "purchase_id",
        "user_id",
        F.when(
            F.col("tus") - F.col("cts") <= hour_us, F.col("tus") - F.col("cts")
        ).alias("click_gap_us"),
        F.when(chain_ok, F.col("cts") - F.col("vts")).alias("view_gap_us"),
        F.coalesce(chain_ok.cast("int"), F.lit(0)).alias("matched"),
    )
