"""Streaming keyed state — the reference's ``mapGroupsWithState`` rebuilt.

Two forms (SURVEY §2.5 A2):

* :func:`running_player_stats_stream` — **native** streaming aggregation:
  the same conditional-aggregate expressions as the batch form, in
  ``update`` output mode with no watermark → Spark maintains unbounded
  running totals itself, exactly the reference's lifetime-state semantics
  (no ``GroupStateTimeout``, ``spark/SparkStreamingService.java:230-234``).
  This is the scale path: state lives in the state store (RocksDB-able),
  partial aggregation before the shuffle, no Python in the loop.

* :func:`snapshot_player_stats_stream` — **exact-parity** variant via
  ``applyInPandasWithState`` (Arrow-vectorized), replicating the
  reference's per-batch quirks (``spark/PlayerStatsUpdater.java:16-51``):
  cumulative counters live in state, but ``second``/``round`` are maxima
  over *only the current micro-batch* and the emitted name is the first
  non-blank name *in the batch* (else the stored one, else blank). One
  snapshot row per key per batch it appears in.

State-schema changelog (checkpoint compatibility):

* **r10 — BREAKING for TTL streams**: ``TTL_STATE_SCHEMA`` gained a
  third field ``last_ms`` (max-ever event time per key; the eviction
  timer is armed from it — see the field's comment). A
  ``ttl_evicting_totals_stream`` query restarted from a pre-r10
  checkpoint fails state deserialization LOUDLY (schema mismatch, no
  silent corruption). Operators must start the TTL stream from a fresh
  checkpoint location after upgrading; all other stateful streams'
  schemas are unchanged.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from spark_stream_analyzer_spark.operators.player_stats import (
    counter_aggs,
    derived_metrics,
)

#: emitted snapshot schema (reference SparkStreamingService.java:216-226)
SNAPSHOT_SCHEMA = StructType(
    [
        StructField("steam_id", StringType()),
        StructField("player_name", StringType()),
        StructField("second", LongType()),
        StructField("kills", LongType()),
        StructField("deaths", LongType()),
        StructField("assists", LongType()),
        StructField("damage", DoubleType()),
        StructField("kd_ratio", DoubleType()),
        StructField("damage_per_round", DoubleType()),
    ]
)

#: persisted per-key state (reference model/PlayerState.java + stored name)
STATE_SCHEMA = StructType(
    [
        StructField("kills", LongType()),
        StructField("deaths", LongType()),
        StructField("assists", LongType()),
        StructField("damage", DoubleType()),
        StructField("name", StringType()),
    ]
)


def running_player_stats_stream(events: DataFrame) -> DataFrame:
    """Native streaming agg over normalized events (scale path).

    Use with ``outputMode("update")``: only keys touched in a batch emit.
    """
    return derived_metrics(events.groupBy("steam_id").agg(*counter_aggs()))


def _make_snapshot_fold():
    """The ONE per-batch fold both stateful APIs wrap (r10 review: it had
    been restated verbatim in each, a drift hazard for the module's
    parity claim). Mirrors reference PlayerStatsUpdater.updatePlayerStats:
    fold the batch's events into carried counters, compute derived
    metrics, return ``(new_state_tuple, emitted_row_dict)``.

    Closure-built so cloudpickle serializes it by value (module-level
    functions pickle by reference and would require this package on
    executor Python workers).
    """
    import pandas as pd  # rebind locally so the closure is self-contained

    def fold(steam_id, pdfs, carried):
        kills, deaths, assists, damage, name = carried
        cur_second = 0
        cur_round = 0
        batch_name = ""
        for pdf in pdfs:
            kills += int((pdf["type"] == "kill").sum())
            deaths += int((pdf["type"] == "death").sum())
            assists += int((pdf["type"] == "assist").sum())
            dmg = pdf.loc[pdf["type"] == "damage", "amount"].sum()
            damage += float(0.0 if pd.isna(dmg) else dmg)
            cur_second = max(cur_second, int(pdf["second"].max()))
            cur_round = max(cur_round, int(pdf["round"].max()))
            if not batch_name:
                nonblank = pdf.loc[pdf["player"] != "", "player"]
                if len(nonblank):
                    batch_name = str(nonblank.iloc[0])
        # batch-first name precedence (reference PlayerStatsUpdater.java:24-30
        # recomputes the first non-blank name per batch; stored name is only
        # the fallback when the whole batch is blank)
        name = batch_name or name
        kd = float(kills) if deaths == 0 else kills / deaths
        dpr = None if cur_round == 0 else damage / cur_round
        row = {
            "steam_id": steam_id,
            "player_name": name,
            "second": cur_second,
            "kills": kills,
            "deaths": deaths,
            "assists": assists,
            "damage": damage,
            "kd_ratio": kd,
            "damage_per_round": dpr,
        }
        return (kills, deaths, assists, damage, name), row

    return fold


def _make_update_snapshots():
    """The applyInPandasWithState wrapper around the shared fold."""
    import pandas as pd

    fold = _make_snapshot_fold()

    def update_snapshots(
        key: tuple, pdfs: Iterable["pd.DataFrame"], state: GroupState
    ) -> Iterable["pd.DataFrame"]:
        (steam_id,) = key
        carried = state.get if state.exists else (0, 0, 0, 0.0, "")
        new_state, row = fold(steam_id, pdfs, carried)
        state.update(new_state)
        yield pd.DataFrame([row])

    return update_snapshots


def snapshot_player_stats_stream(events: DataFrame) -> DataFrame:
    """Exact-parity snapshot stream (reference semantics incl. quirks).

    ``events`` must carry ``player, steam_id, type, second, amount,
    round`` (the wire-parser output). State never times out — parity with
    the reference's missing ``GroupStateTimeout`` (bounded by key count).
    """
    return events.groupBy("steam_id").applyInPandasWithState(
        _make_update_snapshots(),
        outputStructType=SNAPSHOT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _make_snapshot_processor():
    """StatefulProcessor twin of :func:`_make_update_snapshots` for the
    Spark 4.x ``transformWithState`` API (closure-built for the same
    pickle-by-value reason). Same fold, same emitted row."""
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    state_ddl = "kills BIGINT, deaths BIGINT, assists BIGINT, damage DOUBLE, name STRING"

    fold = _make_snapshot_fold()

    class SnapshotProcessor(StatefulProcessor):
        def init(self, handle):
            self._player = handle.getValueState("player", state_ddl)

        def handleInputRows(self, key, rows, timerValues):
            (steam_id,) = key
            carried = (
                self._player.get()
                if self._player.exists()
                else (0, 0, 0, 0.0, "")
            )
            new_state, row = fold(steam_id, rows, carried)
            self._player.update(new_state)
            yield pd.DataFrame([row])

        def close(self):
            pass

    return SnapshotProcessor()


def snapshot_player_stats_stream_tws(events: DataFrame) -> DataFrame:
    """:func:`snapshot_player_stats_stream` on the ``transformWithState``
    API (PySpark ≥ 4.0) — arbitrary named state (value/list/map), timers,
    and TTL, where ``applyInPandasWithState`` offers one value slot.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider``) — which is the right provider
    at scale anyway (state off the JVM heap, incremental checkpoints).

    Transport-gated: the TWS state server speaks protobuf between the JVM
    and the Python worker, and ``google.protobuf`` is not installed in
    every deployment (not in this container). The PROCESSOR LOGIC is
    nonetheless fully tested in-process (tests/test_streaming.py drives
    the StatefulProcessor against a stub state handle and asserts row
    parity with the live-tested ``applyInPandasWithState`` form); only
    the wire transport needs protobuf. Fail loudly up front rather than
    mid-stream in a worker.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "transformWithStateInPandas requires google.protobuf on driver "
            "and workers (the TWS state-server protocol); install protobuf "
            "or use snapshot_player_stats_stream (applyInPandasWithState), "
            "which has identical semantics"
        ) from e
    return events.groupBy("steam_id").transformWithStateInPandas(
        statefulProcessor=_make_snapshot_processor(),
        outputStructType=SNAPSHOT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


#: ttl-evicting per-key totals — emitted on update AND on timer eviction
TTL_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total", LongType()),
        StructField("evicted", LongType()),
    ]
)

TTL_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total", LongType()),
        # max event-time ever seen for the key: the timer must be armed
        # from this, not the current batch's max — a late-but-valid
        # straggler would otherwise REGRESS the timer (early eviction),
        # and a very late one would arm at/below the watermark, which
        # raises and kills the query (r10 review)
        StructField("last_ms", LongType()),
    ]
)


def _make_ttl_update(gap_seconds: int):
    """Closure (see :func:`_make_update_snapshots` for why) implementing
    idle-key eviction with EVENT-TIME TIMERS: each update re-arms the
    key's timer at last_event + gap; when the watermark passes it, the
    group is invoked with ``state.hasTimedOut`` and no rows — it emits a
    final tombstone row (``evicted=1``) and removes its state."""
    import pandas as pd  # self-contained closure (pickled by value)

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            n, tot, _last = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id, "n_events": n, "total": tot, "evicted": 1}]
            )
            return
        n, tot, last_ms = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            n += int(len(pdf))
            tot += int(pdf["val"].sum())
            # epoch ms from the JVM-computed long, NEVER from the pandas
            # datetime64: Arrow renders timestamps in the SESSION
            # timezone, so `.value` on a non-UTC session is wall-clock
            # masquerading as epoch — the timer then lands behind the
            # watermark and the query dies (caught by the r10
            # TZ=America/New_York sweep)
            last_ms = max(last_ms, int(pdf["ts_ms"].max()))
        state.update((n, tot, last_ms))
        # arm from the max ts EVER seen (state-carried), never the
        # current batch alone: a late straggler must not regress the
        # timer; and clamp above the watermark — arbitrary stateful ops
        # do NOT drop late input, and an at-or-below-watermark timestamp
        # raises and kills the query (r10 review)
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last_ms + gap_seconds * 1000, wm + 1))
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "total": tot, "evicted": 0}]
        )

    return update


def ttl_evicting_totals_stream(events: DataFrame, gap_seconds: int = 3600) -> DataFrame:
    """Per-key running totals whose state EXPIRES after ``gap_seconds``
    of event-time inactivity — the state-TTL pattern the reference lacks
    entirely (its 3-arg ``mapGroupsWithState`` overload never configures
    a ``GroupStateTimeout``, so state lives forever; SURVEY §2.9).

    ``events`` must carry ``user_id:long, ts:timestamp, val:long`` and
    ALREADY be watermarked (EventTimeTimeout derives timer firing from
    the watermark). At 100 TB this is how unbounded-keyspace streams
    stay bounded: idle keys emit a final row and leave the store, so
    state size tracks the ACTIVE keyset, not the lifetime keyset.

    Pinned engine subtlety (tests/test_streaming.py): a key that
    receives data in the very batch its timer would fire gets the DATA
    call, not the timeout — Spark only invokes ``hasTimedOut`` for
    dataless groups — so its state resurrects and totals merge; the
    tombstone only ever fires for keys idle through the firing batch.
    """
    from pyspark.sql import functions as F

    # carry the epoch as a JVM-computed long across the Arrow boundary —
    # the timestamp column itself renders in the session timezone on the
    # pandas side (see _make_ttl_update)
    return (
        events.withColumn("ts_ms", F.unix_millis("ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_ttl_update(gap_seconds),
            outputStructType=TTL_OUT_SCHEMA,
            stateStructType=TTL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
