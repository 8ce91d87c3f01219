"""Manifest-based transactional parquet publish — MERGE that can never
expose partial state.

The problem (r8, verdict task 6): ``orders_cdc_merge_apply`` computes a
merged snapshot, but a plain ``df.write.parquet(path)`` replace is NOT
atomic — a failed rewrite leaves a mix of old/new/partial files that a
concurrent reader happily scans. ACID table formats solve this with a
commit log; the minimal Spark-first form is a MANIFEST pointer:

* every snapshot's data is written to a fresh, uniquely-named directory
  under ``<root>/data/`` (immutable once written — never overwritten);
* a single manifest file ``<root>/_manifest.json`` names the currently
  committed snapshot directory;
* readers resolve the manifest first and scan ONLY the directory it
  names; writers publish by writing a temp manifest, ``fsync``-ing it,
  and ``os.replace``-ing it over the live one — the one atomic step.

A merge job that dies mid-write (or completes its data files but dies
before the manifest swap) leaves orphan files under ``data/`` that no
manifest references: readers cannot observe them, and visibility flips
all-or-nothing at the manifest replace. This is exactly the two-phase
shape of ``sources/wire_datasource.py``'s writer commit, applied at the
table level, and the discipline Iceberg/Delta implement with full commit
logs (public designs); at 100 TB the manifest would name the snapshot's
FILE list on fault-tolerant storage (HDFS/S3 rename-or-CAS for the
swap) and keep prior snapshots for time travel / vacuum retention —
the local form here keeps the same commit point and failure contract.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_manifest.json"


def snapshot_dir(root: str) -> str:
    """A fresh, never-reused data directory for one snapshot write."""
    return os.path.join(root, "data", f"snap-{uuid.uuid4().hex}")


def publish(root: str, data_dir: str, version: int) -> None:
    """Atomically commit ``data_dir`` as the table's current snapshot.

    The data must already be fully written (this is the SECOND phase).
    tmp-write + fsync + ``os.replace`` make the pointer swap atomic on
    POSIX: readers see either the old manifest or the new one, never a
    torn mix.
    """
    tmp = os.path.join(root, f".{MANIFEST}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump({"version": version, "dir": data_dir}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(root, MANIFEST))


def read_committed(spark: SparkSession, root: str) -> DataFrame:
    """Scan the committed snapshot — and ONLY it.

    Orphan directories from failed/in-flight writes live under
    ``data/`` beside the committed one; resolving the manifest first is
    what makes them invisible.
    """
    with open(os.path.join(root, MANIFEST)) as f:
        manifest = json.load(f)
    return spark.read.parquet(manifest["dir"])


def committed_version(root: str) -> int | None:
    path = os.path.join(root, MANIFEST)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)["version"]
