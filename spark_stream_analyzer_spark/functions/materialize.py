"""Cluster-safe DataFrame materialization for fan-out plans.

Several single-fold plans (tfidf/bm25 term folds, unigram/bigram LM
folds, the pagerank/triangle edge lists) compute an intermediate table
once and feed it to 2+ downstream consumers.  Without pinning, each
consumer re-derives the intermediate from the raw fact (round-6 plan
audits measured 3-18 redundant scans; exchange-reuse cannot dedup them
because the consumers' differing parents defeat canonicalization).

Rounds 3-6 pinned these with ``localCheckpoint(eager=True)``.  That is
fast on ``local[*]`` but truncates lineage onto *executor-local*
storage: on a real cluster, losing one executor mid-query makes the
checkpointed partitions unrecoverable — the job dies instead of
recomputing.  At 100 TB the fault-tolerant form is
``persist(StorageLevel.DISK_ONLY)``: blocks live on local disk with the
same one-computation guarantee (BlockManager takes a per-block write
lock, so racing consumers never double-compute), but the lineage
survives, so a lost executor's blocks are recomputed from source.

``materialize`` defaults to the cluster-safe persist path; single-node
deployments that want checkpoint's lineage-cut (slightly cheaper
scheduling for iterative loops) opt in via the argument or the
``SSA_MATERIALIZE=local_checkpoint`` environment variable.  Blocks from
either path are reclaimed by the caller's post-collect sweep
(``session.unpersist_rdds``, called between queries by bench.py /
verify tools).
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_STRATEGIES = ("persist", "local_checkpoint")


def materialize(
    df: DataFrame, strategy: str | None = None, eager: bool = True
) -> DataFrame:
    """Compute ``df`` once and return a pinned handle for fan-out plans.

    strategy: ``persist`` (default — DISK_ONLY, lineage kept, partitions
    recomputable after executor loss) or ``local_checkpoint``
    (single-node opt-in — truncates lineage onto executor-local storage;
    faster for deep iterative plans, unrecoverable on executor loss).
    Resolution order: explicit argument > ``SSA_MATERIALIZE`` env var >
    ``persist``.  ``eager=False`` defers computation to the first action
    (per-block write locks still guarantee one computation even when
    consumers race).
    """
    strategy = strategy or os.environ.get("SSA_MATERIALIZE", "persist")
    if strategy not in _STRATEGIES:
        raise ValueError(
            f"unknown materialize strategy {strategy!r}; expected one of {_STRATEGIES}"
        )
    if strategy == "local_checkpoint":
        return df.localCheckpoint(eager=eager)
    out = df.persist(StorageLevel.DISK_ONLY)
    if eager:
        # populate the cache up front (same job cost
        # localCheckpoint(eager=True) paid)
        out.count()
    return out


_DEEP_CUT_EVERY = 5

#: temp checkpoint dirs lineage_cut provisioned itself (distinct from a
#: deployment-configured dir — see the strategy note below).  Keyed by
#: PATH, process-global: python SparkContext wrapper identity is not
#: stable across SparkSession wrappers, and the paths are unique
#: tempdirs anyway
_SELF_PROVISIONED_DIRS: set = set()


def is_external_checkpoint_dir(sc) -> bool:
    """True iff the session's checkpoint dir was configured by the
    DEPLOYMENT (``sc.setCheckpointDir`` to fault-tolerant storage), not
    self-provisioned by :func:`lineage_cut`'s deep-cut path.

    ``lineage_cut`` mutates global session state when it provisions a
    temp dir for periodic deep cuts, so any call-site keying off
    ``getCheckpointDir().isDefined()`` (user code, a future
    ``df.checkpoint()``) would otherwise mistake that temp dir for
    deployment-configured reliable storage (ADVICE r11).  This helper
    makes the same self-provisioned-vs-deployment distinction
    ``lineage_cut`` applies internally available to other call-sites.

    Compares PATHS, not a session flag: a caller that sets its own dir
    AFTER a self-provisioned one has expressed the deployment intent and
    counts as external again.  ``SparkContext.setCheckpointDir`` stores
    ``<dir>/<random-uuid>``, so match by containment of the path we
    created, not equality/suffix.
    """
    jdir = sc._jsc.sc().getCheckpointDir()
    cur_dir = jdir.get() if jdir.isDefined() else None
    if cur_dir is None:
        return False
    return not any(d in cur_dir for d in _SELF_PROVISIONED_DIRS)


def lineage_cut(
    df: DataFrame, eager: bool = True, chain: int | None = None
) -> DataFrame:
    """Truncate plan lineage — for iterative fixpoint loops only.

    Unlike :func:`materialize`, persist is NOT an option here: an
    iterative loop's logical plan deepens every round, and analysis /
    optimization time compounds even when execution reads cached blocks.
    The cut must replace the plan with a scan of materialized output.

    Strategy (r11): CHAINED ``localCheckpoint`` rounds leak serialized
    lineage state in Spark 4.1 — measured on a 3000-node min-label
    loop, per-round cost is flat until ~10 chained cuts and then grows
    ~4x PER ROUND (0.3s → 86s by round 15) with an IDENTICAL physical
    plan and job count.  A reliable file-backed ``checkpoint()`` resets
    the chain completely (flat rounds), but costs ~2-3x a local cut.
    So loops pass their round index via ``chain`` and get the hybrid:
    local cuts with a reliable cut every ``_DEEP_CUT_EVERY`` rounds —
    chain depth stays below the cliff, reliable cost is amortized
    (measured on the 3000-node loop: 12.2s hybrid vs 16.9s
    all-reliable vs 70s+ all-local).  One-off cuts (``chain=None``)
    keep the original rule: reliable when the deployment configured a
    checkpoint dir itself (``sc.setCheckpointDir`` to fault-tolerant
    storage — the cluster deployment step; a dir this function
    self-provisioned does not count), local otherwise.  A reliable cut
    with no dir configured self-provisions a session-lifetime temp dir
    (covers the grading driver's vanilla session).  NOTE: that
    provisioning mutates GLOBAL session state (``sc.setCheckpointDir``);
    call-sites that need to know whether the configured dir reflects
    deployment intent must use :func:`is_external_checkpoint_dir`
    instead of ``getCheckpointDir().isDefined()``.
    """
    sc = df.sparkSession.sparkContext
    has_dir = sc._jsc.sc().getCheckpointDir().isDefined()
    # a dir WE provisioned below is storage for periodic deep cuts, not
    # a signal the deployment wants every cut reliable — without this
    # distinction the first deep cut would flip all later hybrid rounds
    # to the reliable path.  The distinction is public as
    # is_external_checkpoint_dir so other call-sites can apply it too.
    external_dir = is_external_checkpoint_dir(sc)
    if chain is None:
        reliable = external_dir
    else:
        reliable = external_dir or (
            chain % _DEEP_CUT_EVERY == _DEEP_CUT_EVERY - 1
        )
    if not reliable:
        return df.localCheckpoint(eager=eager)
    if not has_dir:
        if not sc.master.startswith("local"):
            # a driver-local tempdir is NOT a valid checkpoint dir on a
            # multi-node cluster (executors would write part files to
            # their own machines and the read-back fails) — and a
            # cluster deployment that wants reliable cuts must point
            # setCheckpointDir at shared storage anyway.  Deep cuts
            # degrade to local checkpoints here; the chained-local leak
            # is a single-JVM observation and the cluster-correct
            # alternative does not exist without a configured dir.
            return df.localCheckpoint(eager=eager)
        import atexit
        import shutil
        import tempfile

        d = tempfile.mkdtemp(prefix="ssa_ckpt_")
        sc.setCheckpointDir(d)
        _SELF_PROVISIONED_DIRS.add(d)
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    # persist before reliable checkpoint: without it Spark computes
    # the plan twice — once for the action and again when the
    # checkpoint writer re-traverses the RDD (r7 review finding).
    # The reliable path is ALWAYS eager: a lazy checkpoint would
    # need the helper `pinned` cache kept alive until some later
    # action, and dropping that invariant leaked one DISK_ONLY
    # CacheManager entry per loop round (r8, ADVICE). Inside the
    # iterative loops this serves, the caller's next action is
    # immediate anyway, so laziness bought nothing.  Deployments
    # should also set
    # spark.cleaner.referenceTracking.cleanCheckpoints=true so
    # out-of-scope checkpoint files are GC'd from the dir
    pinned = df.persist(StorageLevel.DISK_ONLY)
    out = pinned.checkpoint(eager=True)
    pinned.unpersist()
    return out
