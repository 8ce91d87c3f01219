"""Endurance soak for the streaming core (r10 verdict task 4).

Every other live fixture runs ≤ ~10 micro-batches; the reference's
implicit envelope is a 24/7 1 s trigger
(``spark/SparkStreamingService.java:259``). This drives the full
reference-shaped pipeline — wire kill + damage file streams → columnar
parse → union → TTL-evicting keyed state (``applyInPandasWithState``,
event-time timers) → idempotent JDBC snapshot sink (embedded Derby) —
for MANY driver-controlled micro-batch rounds with a sliding active
keyset, asserting the three things duration can break:

1. **bounded state**: idle keys leave the store (state-store reader row
   count tracks the ACTIVE window, not the lifetime keyset);
2. **stable latency**: per-round wall time must not grow monotonically
   (state growth / listener leaks / sink table bloat would show here);
3. **clean checkpointed restart** at the end, exactly-once rows in the
   sink across it.

The default suite runs a 30-round mini-soak (~60 s); set
``SPARK_GRAFT_SOAK=1`` for the full 200-round version whose numbers are
recorded in SCALING.md.
"""

from __future__ import annotations

import os
import statistics
import time

import pytest
from pyspark.sql import functions as F

from spark_stream_analyzer_spark.operators.events import union_streams
from spark_stream_analyzer_spark.sources.wire import (
    parse_damage_lines,
    parse_kill_lines,
)
from spark_stream_analyzer_spark.streaming.sinks import jdbc_snapshot_batch_writer
from spark_stream_analyzer_spark.streaming.sources import file_lines_stream
from spark_stream_analyzer_spark.streaming.stateful import (
    ttl_evicting_totals_stream,
)

T0 = 1_700_000_000  # event-time epoch anchor (seconds)
STEP_S = 30  # event-time advance per round
WINDOW = 10  # keys active per round (sliding by 1)
GAP_S = 120  # TTL: evict after 120 s of event-time inactivity
# a key is idle after WINDOW rounds; its timer fires once the watermark
# (trailing ~2 steps) passes last_event + GAP_S → live keys ≈ WINDOW +
# GAP_S/STEP_S + watermark lag ≈ 16; assert with slack:
STATE_BOUND = 3 * WINDOW + 10


def _write_round(kdir: str, ddir: str, rnd: int) -> None:
    """One kill file + one damage file for round ``rnd``: keys
    [rnd, rnd+WINDOW) each appear as killer once, victim once (next key,
    wrapping inside the window), damager once."""
    tick = (T0 + rnd * STEP_S) * 128  # parse derives second = tick/128
    with open(f"{kdir}/{rnd:05d}.txt", "w") as f:
        for i in range(WINDOW):
            k = rnd + i
            v = rnd + (i + 1) % WINDOW
            # assister "0" is dropped by the parser's guard → each line
            # yields exactly kill(k) + death(v)
            f.write(f"x,{tick},{rnd},P{k},S{k},x,x,P{v},S{v},x,x,0,S0\n")
    with open(f"{ddir}/{rnd:05d}.txt", "w") as f:
        for i in range(WINDOW):
            k = rnd + i
            f.write(f"x,{tick},{rnd},x,x,10,3,x,x,S{k}\n")  # damage = 7
    for p in (f"{kdir}/{rnd:05d}.txt", f"{ddir}/{rnd:05d}.txt"):
        t = 1_600_000_000 + rnd * 120  # strictly-increasing ms mtimes:
        os.utime(p, (t, t))  # processing order == round index


def _build(spark, kdir: str, ddir: str):
    kills = parse_kill_lines(file_lines_stream(spark, kdir))
    dmg = parse_damage_lines(file_lines_stream(spark, ddir))
    ev = union_streams(kills, dmg)
    keyed = ev.select(
        F.expr("CAST(substring(steam_id, 2) AS LONG)").alias("user_id"),
        F.timestamp_seconds("second").alias("ts"),
        F.col("amount").alias("val"),
    ).withWatermark("ts", "30 seconds")
    return ttl_evicting_totals_stream(keyed, gap_seconds=GAP_S)


def _start(spark, kdir, ddir, url, ckpt):
    return (
        _build(spark, kdir, ddir)
        .writeStream.outputMode("update")
        .foreachBatch(jdbc_snapshot_batch_writer(url, "soak_snapshots"))
        .option("checkpointLocation", ckpt)
        .start()
    )


@pytest.mark.parametrize(
    "n_rounds",
    [
        pytest.param(
            30,
            id="mini",
            marks=pytest.mark.skipif(
                bool(os.environ.get("SPARK_GRAFT_SOAK")),
                reason="full soak requested; mini is redundant",
            ),
        ),
        pytest.param(
            200,
            id="full",
            marks=pytest.mark.skipif(
                not os.environ.get("SPARK_GRAFT_SOAK"),
                reason="soak: set SPARK_GRAFT_SOAK=1 (numbers in SCALING.md)",
            ),
        ),
    ],
)
def test_streaming_soak_bounded_state_stable_latency(spark, tmp_path, n_rounds):
    kdir, ddir = str(tmp_path / "kills"), str(tmp_path / "dmg")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(kdir)
    os.makedirs(ddir)
    url = f"jdbc:derby:{tmp_path}/db;create=true"

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    lat: list[float] = []
    try:
        q = _start(spark, kdir, ddir, url, ckpt)
        try:
            for rnd in range(n_rounds):
                _write_round(kdir, ddir, rnd)
                t0 = time.perf_counter()
                q.processAllAvailable()
                lat.append(time.perf_counter() - t0)
        finally:
            q.stop()

        # ---- 2. latency stability: no monotone growth over the run.
        # median(last fifth) vs median(second fifth) — first rounds are
        # excluded as JIT/warm-up; 2x band tolerates host noise while a
        # leak (state, sink bloat, listener) compounds well past it.
        fifth = max(5, n_rounds // 5)
        early = statistics.median(lat[fifth : 2 * fifth])
        late = statistics.median(lat[-fifth:])
        print(
            f"\nSOAK n_rounds={n_rounds} early_median={early:.2f}s "
            f"late_median={late:.2f}s max={max(lat):.2f}s "
            f"total={sum(lat):.1f}s"
        )
        assert late <= 2.0 * early, (
            f"per-round latency grew: early median {early:.2f}s -> "
            f"late median {late:.2f}s over {n_rounds} rounds ({lat})"
        )

        # ---- 1. bounded state: the store holds ~the active window,
        # not the ~n_rounds+WINDOW lifetime keyset.
        state = spark.read.format("statestore").load(ckpt)
        n_state = state.count()
        print(f"SOAK state_rows={n_state} (bound {STATE_BOUND})")
        assert n_state <= STATE_BOUND, (
            f"state store holds {n_state} keys after {n_rounds} rounds "
            f"(bound {STATE_BOUND}) — TTL eviction is not keeping state "
            "bounded"
        )

        # sink sanity while the stream is down: one row per
        # (user_id, batch_id) — the delete-then-insert sink never dupes
        out = spark.read.jdbc(url, "soak_snapshots")
        assert (
            out.count()
            == out.select("user_id", "batch_id").distinct().count()
        )

        # a mid-run key that lived its full WINDOW rounds saw per round:
        # 1 kill + 1 death + 1 damage = 3 events, val 0+0+7
        mid = n_rounds // 2
        mid_rows = out.filter(F.col("user_id") == mid)
        final = mid_rows.orderBy(F.desc("batch_id")).limit(1).collect()[0]
        assert final.n_events == 3 * WINDOW
        assert final.total == 7 * WINDOW
        assert mid_rows.filter("evicted = 1").count() == 1  # tombstoned

        # ---- 3. clean checkpointed restart: one more round drains
        # through the SAME checkpoint; totals continue, no dupes.
        _write_round(kdir, ddir, n_rounds)
        q = _start(spark, kdir, ddir, url, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out2 = spark.read.jdbc(url, "soak_snapshots")
        assert (
            out2.count()
            == out2.select("user_id", "batch_id").distinct().count()
        )
        # the restarted round's newest key starts its own count
        newest = n_rounds + WINDOW - 1
        got = (
            out2.filter(F.col("user_id") == newest)
            .orderBy(F.desc("batch_id"))
            .limit(1)
            .collect()[0]
        )
        # first round for this key: killer once, victim once (the
        # (i+1)%WINDOW rotation is a bijection), damager once
        assert (got.n_events, got.total) == (3, 7)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


CHAOS_SEED = 0xC4A05  # deterministic crash schedule (r11 verdict task 6)


def _latest_per_user(df):
    """user_id → (n_events, total, evicted) at that user's newest batch —
    the run's observable end state, independent of batch numbering
    (restarts shift batch ids, totals must not care)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("batch_id"))
    rows = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select("user_id", "n_events", "total", "evicted")
        .collect()
    )
    return {r.user_id: (r.n_events, r.total, r.evicted) for r in rows}


@pytest.mark.parametrize(
    "n_rounds,n_crashes",
    [
        pytest.param(
            30,
            3,
            id="mini",
            marks=pytest.mark.skipif(
                bool(os.environ.get("SPARK_GRAFT_SOAK")),
                reason="full soak requested; mini is redundant",
            ),
        ),
        pytest.param(
            200,
            5,
            id="full",
            marks=pytest.mark.skipif(
                not os.environ.get("SPARK_GRAFT_SOAK"),
                reason="soak: set SPARK_GRAFT_SOAK=1 (numbers in SCALING.md)",
            ),
        ),
    ],
)
def test_streaming_soak_midrun_crash_restart_equals_no_crash(
    spark, tmp_path, n_rounds, n_crashes
):
    """Soak × crash matrix (r11 verdict task 6): the SAME input replayed
    through (A) an uninterrupted control run and (B) a chaos run that is
    killed and restarted from checkpoint at ``n_crashes`` deterministic
    mid-soak rounds.  Each kill also TRUNCATES the newest entry of the
    checkpoint commit log — the crash-after-sink-write-before-commit
    point of the connector crash matrix — so the restart REPLAYS that
    micro-batch into the JDBC sink and the delete-batch-then-insert
    idempotence is exercised under state-store recovery, not just in
    isolation.  End-state totals must be identical and the sink must
    hold no duplicated (user_id, batch_id) row."""
    import glob
    import random

    rng = random.Random(CHAOS_SEED)
    crash_after = sorted(rng.sample(range(3, n_rounds - 2), k=n_crashes))

    kdir, ddir = str(tmp_path / "kills"), str(tmp_path / "dmg")
    os.makedirs(kdir)
    os.makedirs(ddir)
    for rnd in range(n_rounds):
        _write_round(kdir, ddir, rnd)

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        # ---- run A: control, straight through (files pre-written, so
        # the file source may batch several rounds together — fine: the
        # comparison is on end-state totals, not batch boundaries)
        url_a = f"jdbc:derby:{tmp_path}/db_a;create=true"
        q = _start(spark, kdir, ddir, url_a, str(tmp_path / "ckpt_a"))
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        control = _latest_per_user(spark.read.jdbc(url_a, "soak_snapshots"))

        # ---- run B: chaos. maxFilesPerTrigger-free file source drains
        # everything available per processAllAvailable call, so the
        # crash schedule is driven by STAGED input visibility: stage
        # rounds up to each crash point, drain, kill, truncate the
        # commit log, restart.
        url_b = f"jdbc:derby:{tmp_path}/db_b;create=true"
        ckpt_b = str(tmp_path / "ckpt_b")
        kb, db = str(tmp_path / "kills_b"), str(tmp_path / "dmg_b")
        os.makedirs(kb)
        os.makedirs(db)
        staged = 0

        def stage_until(rnd_excl: int) -> None:
            nonlocal staged
            while staged < rnd_excl:
                _write_round(kb, db, staged)
                staged += 1

        q = _start(spark, kb, db, url_b, ckpt_b)
        n_replays = 0
        try:
            for cp in crash_after:
                stage_until(cp)
                q.processAllAvailable()
                q.stop()
                q.awaitTermination()  # release the checkpoint before the
                # truncation + restart (stop() returns async)
                # NUMERIC sort: batch ids pass 9 mid-soak and a string
                # sort picks '9' over '10' — truncating a stale commit
                # is a silent no-op (Spark's latest-batch scan still
                # sees the newer commit), so the kill would not force a
                # replay at all (r13 fix; found via the RocksDB twin,
                # where the same off-by-sort DELETED a changelog that
                # later commits still needed)
                commits = sorted(
                    glob.glob(f"{ckpt_b}/commits/[0-9]*"),
                    key=lambda p: int(os.path.basename(p)),
                )
                if commits:  # crash before the commit record landed:
                    os.remove(commits[-1])  # the batch WILL replay
                    crc = (  # the local ChecksumFs sidecar must go too,
                        # or the replay's commit rewrite fails its rename
                        f"{os.path.dirname(commits[-1])}/."
                        f"{os.path.basename(commits[-1])}.crc"
                    )
                    if os.path.exists(crc):
                        os.remove(crc)
                    n_replays += 1
                q = _start(spark, kb, db, url_b, ckpt_b)
            stage_until(n_rounds)
            q.processAllAvailable()
        finally:
            q.stop()
        assert n_replays == n_crashes  # every crash point forced a replay

        sink_b = spark.read.jdbc(url_b, "soak_snapshots")
        # exactly-once under replay: no duplicated (user, batch) row
        n_sink = sink_b.count()
        assert (
            n_sink
            == sink_b.select("user_id", "batch_id").distinct().count()
        )
        chaos = _latest_per_user(sink_b)
        print(
            f"\nSOAK-CHAOS n_rounds={n_rounds} crash_points={crash_after} "
            f"replays={n_replays} sink_rows={n_sink} users={len(chaos)}"
        )
        assert chaos == control, (
            "end-state totals diverged between the crash-restart run and "
            "the uninterrupted control: "
            f"{ {k: (control.get(k), chaos.get(k)) for k in set(control) | set(chaos) if control.get(k) != chaos.get(k)} }"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@pytest.mark.parametrize(
    "n_rounds,n_crashes",
    [
        pytest.param(
            30,
            3,
            id="mini",
            marks=pytest.mark.skipif(
                bool(os.environ.get("SPARK_GRAFT_SOAK")),
                reason="full soak requested; mini is redundant",
            ),
        ),
        pytest.param(
            200,
            5,
            id="full",
            marks=pytest.mark.skipif(
                not os.environ.get("SPARK_GRAFT_SOAK"),
                reason="soak: set SPARK_GRAFT_SOAK=1 (numbers in SCALING.md)",
            ),
        ),
    ],
)
def test_streaming_soak_crash_restart_rocksdb_changelog(
    spark, tmp_path, n_rounds, n_crashes
):
    """Chaos matrix × RocksDB CHANGELOG path (r12 verdict task 7): the
    crash-restart-equals-control contract re-proven under
    ``RocksDBStateStoreProvider`` with changelog checkpointing — the
    production state backend whose recovery path (load last snapshot,
    re-apply changelogs, replay the uncommitted batch) is entirely
    different code from the default HDFS-backed store the test above
    exercises.  Each kill truncates BOTH the newest commit-log entry
    AND that version's RocksDB ``.changelog`` files — the
    crash-DURING-changelog-commit point: the store must recover from
    the prior version and rewrite the changelog on replay.  End-state
    totals must equal an uninterrupted RocksDB control run and the
    JDBC sink must stay exactly-once."""
    import glob
    import random

    rng = random.Random(CHAOS_SEED ^ 0xD0C5)  # distinct schedule from the
    # default-provider matrix — same seed would re-test the same rounds
    crash_after = sorted(rng.sample(range(3, n_rounds - 2), k=n_crashes))

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    prev_changelog = spark.conf.get(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        None,
    )
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", _ROCKSDB_PROVIDER
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )
    try:
        # ---- run A: RocksDB control, straight through
        kdir, ddir = str(tmp_path / "kills"), str(tmp_path / "dmg")
        os.makedirs(kdir)
        os.makedirs(ddir)
        for rnd in range(n_rounds):
            _write_round(kdir, ddir, rnd)
        url_a = f"jdbc:derby:{tmp_path}/db_a;create=true"
        q = _start(spark, kdir, ddir, url_a, str(tmp_path / "ckpt_a"))
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        control = _latest_per_user(spark.read.jdbc(url_a, "soak_snapshots"))

        # ---- run B: chaos under staged input visibility (see the
        # default-provider matrix above for the mechanism)
        url_b = f"jdbc:derby:{tmp_path}/db_b;create=true"
        ckpt_b = str(tmp_path / "ckpt_b")
        kb, db = str(tmp_path / "kills_b"), str(tmp_path / "dmg_b")
        os.makedirs(kb)
        os.makedirs(db)
        staged = 0

        def stage_until(rnd_excl: int) -> None:
            nonlocal staged
            while staged < rnd_excl:
                _write_round(kb, db, staged)
                staged += 1

        q = _start(spark, kb, db, url_b, ckpt_b)
        n_replays = n_changelog_cuts = 0
        try:
            for cp in crash_after:
                stage_until(cp)
                q.processAllAvailable()
                q.stop()
                q.awaitTermination()
                # NUMERIC sort — see the default-provider matrix above:
                # a string sort picks commit '9' once ids reach 10, and
                # here that is not just a weaker kill but a corruption:
                # ver would resolve to 10 and the cut below would delete
                # a changelog that commits 10+ still rely on (recovery
                # then dies with FileNotFoundException unless an async
                # RocksDB snapshot happens to cover it — the flake that
                # exposed this)
                commits = sorted(
                    glob.glob(f"{ckpt_b}/commits/[0-9]*"),
                    key=lambda p: int(os.path.basename(p)),
                )
                if commits:
                    batch_id = os.path.basename(commits[-1])
                    os.remove(commits[-1])
                    crc = (
                        f"{os.path.dirname(commits[-1])}/."
                        f"{os.path.basename(commits[-1])}.crc"
                    )
                    if os.path.exists(crc):
                        os.remove(crc)
                    n_replays += 1
                    # crash DURING changelog commit: the state version a
                    # batch writes is batch_id + 1 — tear out that
                    # version's changelog files so recovery must rebuild
                    # from the prior version, not ride a half-written
                    # changelog that "happens" to be complete
                    ver = int(batch_id) + 1
                    for cl in glob.glob(
                        f"{ckpt_b}/state/*/*/{ver}.changelog"
                    ) + glob.glob(f"{ckpt_b}/state/*/*/.{ver}.changelog.crc"):
                        os.remove(cl)
                        n_changelog_cuts += 1
                q = _start(spark, kb, db, url_b, ckpt_b)
            stage_until(n_rounds)
            q.processAllAvailable()
        finally:
            q.stop()
        assert n_replays == n_crashes
        # the fixture really ran on the changelog path: every crash point
        # had changelog files to cut (8 shuffle partitions → up to 8 per
        # version; at least one must have existed per crash)
        assert n_changelog_cuts >= n_crashes, (
            f"no RocksDB changelog files found to cut "
            f"({n_changelog_cuts} cuts over {n_crashes} crashes) — is "
            f"changelog checkpointing actually on?"
        )

        sink_b = spark.read.jdbc(url_b, "soak_snapshots")
        n_sink = sink_b.count()
        assert (
            n_sink
            == sink_b.select("user_id", "batch_id").distinct().count()
        )
        chaos = _latest_per_user(sink_b)
        print(
            f"\nSOAK-CHAOS-ROCKSDB n_rounds={n_rounds} "
            f"crash_points={crash_after} replays={n_replays} "
            f"changelog_cuts={n_changelog_cuts} sink_rows={n_sink}"
        )
        assert chaos == control, (
            "end-state totals diverged between the RocksDB-changelog "
            "crash-restart run and the uninterrupted control: "
            f"{ {k: (control.get(k), chaos.get(k)) for k in set(control) | set(chaos) if control.get(k) != chaos.get(k)} }"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
        if prev_changelog is None:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.rocksdb."
                "changelogCheckpointing.enabled"
            )
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.rocksdb."
                "changelogCheckpointing.enabled",
                prev_changelog,
            )
