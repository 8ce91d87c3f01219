"""``manifesttable`` Python DataSource: STREAM a transactional table.

The lakehouse streaming-ingest shape (what Delta/Iceberg expose as
"streaming from a table"): the stream's OFFSETS are the table's
committed VERSION numbers, discovered by polling the manifest pointer —
so a 24/7 pipeline tails a table other jobs publish to, with
exactly-once delivery for free because every version's data dir is
immutable and manifest-addressed (:mod:`.txn_publish`).

Semantics: each committed version's snapshot rows are emitted exactly
once, tagged ``_version``.  For append-style publishing (each version
adds a new slice) this IS the row stream; for rewrite-style versions
compose downstream with :func:`.txn_publish.version_changes` (the CDF
op) or a keyed dedup.  Offsets live in the streaming checkpoint, so a
restart resumes at the next uncommitted version — a replayed batch
re-reads the same immutable dir and overwrites the same sink epoch.

Parallelism: one input partition PER PARQUET FILE per version (the
publisher controls file counts; a fact-scale snapshot fans out across
the cluster).  Rows are decoded with pyarrow in the Python worker —
the same Arrow path the rest of the Python DataSource family uses.

Schema is discovered at planning time from the committed snapshot's
parquet footer (subset mapping: int32/int64/float32/float64/string/
bool — the types :mod:`.txn_publish` tables use), plus ``_version``.

Reference scope note: the reference has no table-format tailing at all
(its only stream source is Kafka) — this is EXT surface, the
composition target being `publish -> tail -> enrich` pipelines.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_PA_TO_DDL = {
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
}


def _manifest(root: str, version: int | None = None) -> dict | None:
    name = "_manifest.json" if version is None else f"_manifest.v{version}.json"
    path = os.path.join(root, name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


#: Planned-offset sidecar for ``maxcatchup`` (same design as the wirelog
#: source's ``_planned_offset.json`` — see that class docstring for the
#: full contract). Distinct name: it lives beside ``_manifest*.json``.
_PLANNED_SIDECAR = "_planned_version.json"


def _read_planned_sidecar(root: str) -> int | None:
    try:
        with open(os.path.join(root, _PLANNED_SIDECAR)) as f:
            return int(json.load(f)["version"])
    except (OSError, ValueError, KeyError, TypeError):
        return None


def _write_planned_sidecar(root: str, version: int) -> None:
    """Atomic tmp+rename; raises on failure (fail-closed — a silently
    stale sidecar could cap a later restart below a committed offset)."""
    import uuid

    p = os.path.join(root, _PLANNED_SIDECAR)
    tmp = p + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump({"version": int(version)}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, p)


def _snapshot_files(root: str, version: int) -> list[str]:
    m = _manifest(root, version)
    if m is None:
        return []
    d = m["dir"]
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )


class _VersionFilePartition(InputPartition):
    def __init__(self, path: str, version: int):
        self.path = path
        self.version = version


class ManifestTableStreamReader(DataSourceStreamReader):
    """Offsets = committed table versions (the Delta-source shape).

    ``maxversionspertrigger`` (option, default unlimited) is ADMISSION
    CONTROL: a stream restarting into a deep backlog of committed
    versions drains them as bounded micro-batches instead of one giant
    catch-up batch — the same throttle-watermark pattern as the wirelog
    source's ``maxfilespertrigger``.

    Restart safety (r10 code-review finding): the throttle watermark
    ``_planned`` is driver-local, and the Python offset API gives
    ``latestOffset`` no start argument — so after a RESTART the first
    ``latestOffset`` runs before the reader has learned the engine's
    committed offset, and capping there would return an offset BELOW
    the committed one; Spark logs that regressed end and the NEXT batch
    re-reads (re-delivers) versions — an exactly-once violation. The
    throttle therefore only engages once the position is KNOWN — and
    the engine calls ``latestOffset`` BEFORE ``initialOffset`` even on
    a fresh start (measured), so the honest contract under this API is:
    the FIRST batch of any run (fresh or restarted) is unthrottled;
    every later batch throttles. The JVM sources avoid this via
    ``SupportsAdmissionControl.latestOffset(start, limit)``, which the
    Python API does not expose.

    ``maxcatchup`` (option, default off — r11, mirroring the wirelog
    source) closes that first batch: the reader persists its max-ever
    PLANNED version to an atomic sidecar (``_planned_version.json``,
    written BEFORE the offset is returned, so sidecar ≥ anything the
    engine can commit) and caps the first ``latestOffset`` of a run at
    ``sidecar + maxcatchup``, floored at the sidecar — a deep backlog of
    published versions drains as bounded batches from the FIRST trigger
    of a restart, with no regressed-offset redelivery hazard. Same
    operational contract as the wirelog sidecar: retain/delete it
    together with the checkpoint.
    """

    def __init__(self, options):
        self.root = options["path"]
        self.start_version = int(options.get("startingversion", 1))
        self.max_versions = int(options.get("maxversionspertrigger", 0)) or None
        self.max_catchup = int(options.get("maxcatchup", 0)) or None
        self._planned = self.start_version - 1
        self._position_known = False
        self._sidecar_written: int | None = None
        if self.max_catchup is not None:
            side = _read_planned_sidecar(self.root)
            if side is not None:
                self._planned = max(self._planned, side)
                self._sidecar_written = side

    def _persist_planned(self) -> None:
        # active ONLY under maxcatchup: zero behavior/failure-surface
        # change for existing streams
        if self.max_catchup is None:
            return
        if self._sidecar_written is not None and self._planned <= self._sidecar_written:
            return
        _write_planned_sidecar(self.root, self._planned)
        self._sidecar_written = self._planned

    def initialOffset(self):
        # only called on a FRESH start — the position IS the configured
        # start, so throttling is safe from the first batch
        self._position_known = True
        return {"version": self.start_version - 1}

    def latestOffset(self):
        m = _manifest(self.root)
        # Floor at the last planned version: a transiently missing or
        # unreadable manifest (eventually-consistent object store, racing
        # writer) must read as "no new versions", never as an offset
        # REGRESSION below a previously returned/committed offset — the
        # same regressed-offset re-read hazard the throttle path fixes,
        # reintroduced here for the m-is-None branch (r10 ADVICE).
        v = int(m["version"]) if m else self._planned
        if self._position_known:
            if self.max_versions is not None:
                v = min(v, self._planned + self.max_versions)
        elif self.max_catchup is not None:
            # first call of a run: bounded catch-up, floored at the
            # sidecar (= self._planned here) — never below committed
            v = min(v, self._planned + self.max_catchup)
        v = max(v, self._planned)  # never return a regression
        self._planned = v
        self._persist_planned()
        return {"version": v}

    def partitions(self, start, end):
        self._planned = max(
            self._planned, int(start["version"]), int(end["version"])
        )
        self._position_known = True
        self._persist_planned()
        parts = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            for f in _snapshot_files(self.root, v):
                parts.append(_VersionFilePartition(f, v))
        return parts

    def read(self, partition):
        # yield Arrow RecordBatches directly — stays on the Arrow path
        # end-to-end and streams the file in chunks; materializing
        # columns as Python lists and pickling row tuples was measured
        # as the slow path for fact-scale snapshot files (r10 review)
        import pyarrow as pa
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        for batch in pf.iter_batches():
            yield batch.append_column(
                "_version",
                pa.array([partition.version] * batch.num_rows, type=pa.int64()),
            )

    def commit(self, end):
        pass  # snapshot dirs are immutable; vacuum policy is the table's


class ManifestTableDataSource(DataSource):
    @classmethod
    def name(cls):
        return "manifesttable"

    def schema(self):
        import pyarrow.parquet as pq

        root = self.options["path"]
        m = _manifest(root)
        if m is None:
            raise ValueError(
                f"manifesttable: no committed manifest under {root!r}"
            )
        files = _snapshot_files(root, int(m["version"]))
        if not files:
            raise ValueError(
                f"manifesttable: committed version {m['version']} under "
                f"{root!r} has no parquet files (empty-partition write?) — "
                "cannot discover a schema"
            )
        sch = pq.read_schema(files[0])
        fields = []
        for fld in sch:
            ddl = _PA_TO_DDL.get(str(fld.type))
            if ddl is None:
                raise ValueError(
                    f"manifesttable: unsupported parquet type {fld.type} "
                    f"for column {fld.name!r} (supported: {_PA_TO_DDL})"
                )
            fields.append(f"{fld.name} {ddl}")
        fields.append("_version bigint")
        return ", ".join(fields)

    def streamReader(self, schema):
        return ManifestTableStreamReader(self.options)


def register_manifesttable(spark) -> None:
    spark.dataSource.register(ManifestTableDataSource)
