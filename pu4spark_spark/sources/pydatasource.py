"""Custom Python data source (PySpark 4 ``spark.dataSource.register``
API) — the engine's extension point for formats Spark has no built-in
reader for (SURVEY.md §2B sources row; the reference has no I/O at all).

``jsonl_docs`` reads a directory of JSON-lines shards with one input
partition per shard file, so a 1000-shard corpus fans out across the
cluster exactly like a native file source: the driver only lists the
directory; each executor's Python worker streams its own shard and
yields rows that Spark Arrow-batches back to the JVM.  The demo query
round-trips the documents table through JSONL shards written by Spark's
own (distributed) JSON writer and reduces the read-back to a per-lang
aggregate, value-checked against the DuckDB oracle on the original
parquet — proving the custom source is byte-faithful, not just runnable.

Scale note: per-file partitioning is the right 100 TB shape as long as
shards are bounded (the writer bounds them via ``maxRecordsPerFile`` in
production; the demo uses hash repartition).  The reader never touches
the driver: no collect, no shared state, one sequential pass per shard.
"""

from __future__ import annotations

import functools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from pu4spark_spark.sources.tables import load_table

#: documents schema as DDL (the source serves exactly this shape)
DOCS_DDL = "doc_id bigint, text string, lang string, source string, n_chars bigint"
N_SHARDS = 4


def _json_cell(v):
    """``json.dumps(default=...)`` hook for cell types the stdlib
    encoder lacks, in the form Spark's JSON parser reads back EXACTLY:
    Decimal as a quoted string (Jackson parses quoted decimals at full
    precision — a float round-trip would shear >15 digits), datetime /
    date as ISO strings, binary as base64 (Spark's BinaryType JSON
    form)."""
    import base64
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode()
    raise TypeError(f"unserializable lake cell type {type(v).__name__}")


class JsonlDocsDataSource(DataSource):
    """``format("jsonl_docs")``: directory of *.json / *.jsonl shards."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_docs"

    def schema(self) -> str:
        # SCHEMA EVOLUTION: the table's schema is a property of the
        # COMMIT, not the format — resolve the read's effective
        # manifest (honoring version / as_of_ts pins) and serve its
        # recorded ``_schema``, so time travel to a pre-evolution
        # version reads the OLD shape.  Legacy / manifest-less
        # directories serve the documents DDL.
        ddl = _effective_schema_ddl(self.options)
        if self.options.get("read_change_feed", "").lower() == "true":
            # the change-feed stream's rows carry the CDF tags
            ddl += ", _change_type string, _commit_version bigint"
        return ddl

    def reader(self, schema) -> "JsonlDocsReader":
        if self.options.get("read_change_feed", "").lower() == "true":
            # Delta serves batch readChangeFeed; this source's batch
            # twin is table_changes_jsonl_dir() (a DataFrame builder —
            # CDF pre-image derivation needs joins a DataSourceReader
            # partition cannot express).  Refuse loudly rather than
            # return a plain reader whose row tuples would be two
            # fields short of the CDF schema declared above.
            raise ValueError(
                "read_change_feed is not supported for BATCH reads of "
                "format('jsonl_docs'); use "
                "pu4spark_spark.sources.table_changes_jsonl_dir(spark, "
                "path, starting_version=...) for the batch change feed, "
                "or readStream for the streaming feed"
            )
        return JsonlDocsReader(self.options)

    def streamReader(self, schema) -> "DataSourceStreamReader":
        if self.options.get("read_change_feed", "").lower() == "true":
            return JsonlDocsChangeFeedStreamReader(self.options)
        if self.options.get("versioned", "").lower() == "true":
            return JsonlDocsVersionStreamReader(self.options)
        return JsonlDocsStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> "JsonlDocsWriter":
        return JsonlDocsWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return JsonlDocsStreamWriter(self.options, schema)


#: serializes first registration per session — re-registering is not
#: just wasteful, it is a RACE: Spark's "replace a previously
#: registered data source" path has a window where a concurrent lookup
#: fails DATA_SOURCE_NOT_FOUND, so two threads each calling
#: register_pyds() could fail each other's save()/load() (observed
#: under the threaded DML stress)
_REGISTER_LOCK = __import__("threading").Lock()


def ensure_active_session(spark: SparkSession) -> None:
    """Pin ``spark`` as the JVM active session for the CURRENT thread.

    PySpark's pinned-thread mode maps each Python thread to its own
    JVM thread, and a JVM thread created on demand has NO active
    session — so ``save()``/``load()`` name resolution, which consults
    the ACTIVE session's Python data-source registry
    (DataSourceManager), silently falls through to the classpath and
    dies with DATA_SOURCE_NOT_FOUND for a source that IS registered
    (reproduced: 4 threads round-tripping jsonl_docs, ~50% failure).
    Concurrent writers are the point of the OCC commit protocol, so
    every session-taking DML entry point pins first via
    :func:`register_pyds`; code driving ``df.write`` directly from a
    worker thread should call this (or ``register_pyds``) once at
    thread start.  Idempotent, one py4j call."""
    try:
        jvm_cls = spark._jvm.org.apache.spark.sql.classic.SparkSession
        jvm_cls.setActiveSession(spark._jsparkSession)
    except Exception:
        # Spark Connect sessions have no JVM handle — and no
        # thread-local active-session resolution either
        pass


def register_pyds(spark: SparkSession) -> None:
    """Register the custom source AND enable Python-datasource filter
    pushdown in the same breath: a reader that overrides
    ``pushFilters`` hard-fails in any session where
    ``spark.sql.python.filterPushdown.enabled`` is false (dynamic SQL
    conf, so setting it here covers harness-built sessions too) —
    keeping the two together makes that failure mode impossible.
    Idempotent and thread-safe: one registration per session object,
    ever (the done-marker lives ON the session, so a stopped-and-
    recreated session registers afresh) — re-registering is a race in
    its own right (Spark's replace path has a lookup-miss window).
    Always pins the active session for the calling thread first
    (:func:`ensure_active_session`), so every DML entry point that
    calls this is safe to drive from worker threads."""
    ensure_active_session(spark)
    if getattr(spark, "_pu4spark_pyds_registered", False):
        return
    with _REGISTER_LOCK:
        if getattr(spark, "_pu4spark_pyds_registered", False):
            return
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        spark.dataSource.register(JsonlDocsDataSource)
        spark._pu4spark_pyds_registered = True


class JsonlDocsWriter(DataSourceWriter):
    """Executor-side JSONL shard writer with TRANSACTIONAL commit: each
    task streams its rows to an underscore-prefixed temp shard (hidden
    from every reader by the metadata-file convention), and only the
    driver-side ``commit`` renames the shards named in the task commit
    messages to their final ``part-*.jsonl`` names and writes the
    ``_MANIFEST`` commit log.  A failed, retried, or speculatively
    executed task therefore leaves at most an orphan ``_tmp-*`` file —
    swept by ``commit``/``abort`` and invisible to readers either way —
    never a duplicate visible shard (the exactly-once contract the
    round-trip query value-checks).  ``overwrite`` mode clears the
    target directory driver-side before the job starts."""

    def __init__(self, options, schema, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_docs writer requires option 'path'")
        self.fields = [f.name for f in schema.fields]
        #: written shape as DDL — recorded as the table schema when an
        #: overwrite creates a non-documents table (appends instead
        #: carry the base manifest's _schema; evolve_jsonl_schema is
        #: the path that CHANGES a live table's shape)
        self.ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
        )
        self.overwrite = overwrite
        # optimistic-concurrency declaration: "this job planned against
        # table version N and commits N+1".  When set, commit() claims
        # exactly v{N+1} and FAILS (ManifestCommitConflict) if another
        # writer claimed it first — the Iceberg/Delta base-snapshot
        # contract.  Unset → the version is derived from a fresh listing
        # at commit time (the claim still guarantees a unique winner).
        bv = options.get("base_version")
        self.base_version = int(bv) if bv is not None else None
        # Hive-style partitioned write, metadata-tracked: each task
        # writes ONE shard per distinct value of the partition
        # column(s) and the commit records the values in
        # _STATS["_parts"] so the reader prunes whole shards on
        # partition-column equality/IN filters.  Unlike Hive the
        # column STAYS in the row data (no directory-name encoding —
        # the manifest, not the path, is the metadata authority, the
        # Iceberg position).  Callers should repartition by the
        # partition column first: per-task shard count (and open file
        # handles) is the task's value cardinality.
        pb = options.get("partition_by")
        self.partition_by = (
            [c.strip() for c in pb.split(",") if c.strip()] if pb else []
        )
        # CHECK constraints of the base manifest, compiled driver-side
        # once and pickled to every task: each row is validated BEFORE
        # staging, so one violating row fails the job and nothing
        # partial ever claims a manifest.  An overwrite replaces the
        # table, constraints included.  option("constraints_from", p)
        # enforces ANOTHER table's constraints — the merge staging
        # path writes into a sibling stage dir whose rows are destined
        # for the real table, and must not bypass its contract.
        self._constraints: list[tuple] = []
        cfrom = options.get("constraints_from")
        src = cfrom if cfrom else (None if overwrite else self.path)
        if src and os.path.isdir(src):
            base = (
                self.base_version
                if self.base_version is not None and not cfrom
                else _latest_manifest_version(src)
            )
            if base > 0:
                for nm, ex in _constraints_of(
                    _manifest_at(src, base)
                ).items():
                    self._constraints.append(
                        (nm, ex, _compile_constraint(ex))
                    )
        # per-JOB token: assigned once driver-side, shared by all the
        # job's pickled task copies.  Temp shards carry it so commit's
        # orphan sweep only ever touches THIS job's leftovers — a
        # concurrent writer's in-flight staging is invisible to us
        # (foreign orphans from crashed jobs are vacuum's business).
        import uuid as _uuid

        self.job_token = _uuid.uuid4().hex[:8]
        if overwrite:
            # runs on the driver, pre-job (the writer is constructed
            # once driver-side before being pickled to tasks)
            import shutil

            shutil.rmtree(self.path, ignore_errors=True)

    def write(self, iterator) -> WriterCommitMessage:
        import json as _json
        import os as _os
        import uuid as _uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        _os.makedirs(self.path, exist_ok=True)
        has_doc = "doc_id" in self.fields

        class _Shard:
            __slots__ = ("tmp", "final", "fh", "n", "mn", "mx", "parts")

            def __init__(s, token: str, parts: dict | None) -> None:
                s.final = f"part-{pid:05d}-{_uuid.uuid4().hex[:8]}.jsonl"
                s.tmp = f"_tmp-{token}-" + s.final
                s.fh = open(_os.path.join(self.path, s.tmp), "w")
                s.n = 0
                s.mn = s.mx = None
                s.parts = parts

            def add(s, d: dict) -> None:
                s.fh.write(_json.dumps(d, default=_json_cell) + "\n")
                s.n += 1
                # per-shard doc_id min/max ride the commit message —
                # the zonemap the reader's filter pushdown prunes with
                if has_doc and d["doc_id"] is not None:
                    v = d["doc_id"]
                    s.mn = v if s.mn is None or v < s.mn else s.mn
                    s.mx = v if s.mx is None or v > s.mx else s.mx

            def close(s) -> JsonlCommit:
                # shard contents must be on disk before the driver's
                # commit can make them visible — same power-loss
                # discipline as the metadata files
                s.fh.flush()
                _os.fsync(s.fh.fileno())
                s.fh.close()
                return JsonlCommit(
                    s.tmp, s.final, s.n, s.mn, s.mx, parts=s.parts
                )

        cons = self._constraints

        def _validated(d: dict) -> dict:
            for nm, ex, fn in cons:
                if not fn(d):
                    raise ValueError(
                        f"CHECK constraint {nm!r} ({ex}) violated by "
                        f"row {d!r} — the job fails before any commit"
                    )
            return d

        if not self.partition_by:
            shard = _Shard(self.job_token, None)
            for row in iterator:
                shard.add(_validated({k: row[k] for k in self.fields}))
            return shard.close()
        # partitioned write: one shard per distinct partition value
        # seen by THIS task (callers repartition by the column, so
        # normally one value per task)
        shards: dict[tuple, _Shard] = {}
        for row in iterator:
            d = _validated({k: row[k] for k in self.fields})
            key = tuple(d[c] for c in self.partition_by)
            s = shards.get(key)
            if s is None:
                s = shards[key] = _Shard(
                    self.job_token,
                    dict(zip(self.partition_by, key)),
                )
            s.add(d)
        if not shards:
            # empty task still reports itself (rows=0, no file kept)
            shard = _Shard(self.job_token, None)
            return shard.close()
        commits = [s.close() for s in shards.values()]
        head, tail = commits[0], commits[1:]
        head.extra = tail
        return head

    def _sweep_tmp(self, keep: set[str]) -> None:
        import os as _os

        prefix = f"_tmp-{self.job_token}-"
        for f in _os.listdir(self.path):
            if f.startswith(prefix) and f not in keep:
                try:
                    _os.remove(_os.path.join(self.path, f))
                except OSError:
                    pass

    def commit(self, messages) -> None:
        import json as _json
        import os as _os

        # the version this commit will claim is decided FIRST, because
        # it names the base snapshot the new manifest must extend
        if self.base_version is not None:
            version = self.base_version + 1
        else:
            version = 1 + max(
                (
                    int(f.rsplit(".v", 1)[1])
                    for f in _os.listdir(self.path)
                    if f.startswith("_MANIFEST.v")
                    and f.rsplit(".v", 1)[1].isdigit()
                ),
                default=0,
            ) if _os.path.isdir(self.path) else 1
        # append mode commits ON TOP of the existing log: seed from the
        # IMMUTABLE base snapshot _MANIFEST.v{version-1} — never from
        # the live _MANIFEST pointer.  The live pointer lags a winner
        # that has claimed its version but not yet flipped (or crashed
        # between the two); seeding from it would silently drop that
        # committed winner's shards from every later version — exactly
        # the lost-update the version claim exists to prevent.  The
        # live pointer / directory listing are only fallbacks for
        # pre-versioned or manifest-less directories (readable via the
        # reader's listing fallback) — otherwise the first append would
        # hide every pre-existing shard behind a manifest naming only
        # its own.
        manifest = {}
        if not self.overwrite:
            base_snap = _os.path.join(
                self.path, f"_MANIFEST.v{version - 1}"
            )
            mpath = _os.path.join(self.path, "_MANIFEST")
            if version > 1 and _os.path.exists(base_snap):
                with open(base_snap) as fh:
                    manifest = _json.load(fh)
            elif _os.path.exists(mpath):
                with open(mpath) as fh:
                    manifest = _json.load(fh)
            elif _os.path.isdir(self.path):
                # same extension set the reader's listing fallback scans
                for f in _os.listdir(self.path):
                    if f.endswith((".json", ".jsonl")) and not f.startswith(
                        (".", "_")
                    ):
                        # row count unknown without a scan; None marks
                        # "listed, not counted" (readers only use keys)
                        manifest[f] = None
        # per-shard zonemap sidecar: merged like the manifest on append
        # (shards are immutable, so old entries stay valid); a shard
        # with NO entry is simply never pruned — partial stats are
        # always safe.  Unlike the manifest it MAY seed from the live
        # _STATS (a racing writer's lost entries only disable pruning
        # for those shards; extra entries for shards outside the
        # manifest are never consulted)
        stats = {}
        if not self.overwrite:
            spath = _os.path.join(self.path, "_STATS")
            if _os.path.exists(spath):
                with open(spath) as fh:
                    stats = _json.load(fh)
        committed_tmp = set()
        for m in _flatten_commits(messages):
            _os.rename(
                _os.path.join(self.path, m.tmp),
                _os.path.join(self.path, m.file),
            )
            committed_tmp.add(m.tmp)
            manifest[m.file] = m.rows
            if TOMBSTONE_KEY in manifest:
                # a table with delete history tracks each shard's add
                # version so tombstone entries (scoped "v > added")
                # never apply to rows committed after them
                manifest[TOMBSTONE_KEY].setdefault("added", {})[
                    m.file
                ] = version
            if getattr(m, "min_doc", None) is not None:
                stats[m.file] = [m.min_doc, m.max_doc]
            if getattr(m, "parts", None):
                # partition values per shard — advisory like the
                # zonemap: a shard without an entry is never pruned
                stats.setdefault("_parts", {})[m.file] = m.parts
        if self.overwrite and self.ddl != DOCS_DDL:
            manifest[SCHEMA_KEY] = self.ddl
        # operation provenance (DESCRIBE HISTORY): each commit records
        # its own op, overwriting whatever the base carried
        manifest[OP_KEY] = "overwrite" if self.overwrite else "append"
        # commit wall-clock (ns) — the "TIMESTAMP AS OF" resolution key
        # (reserved key, skipped by every shard-list consumer)
        import time as _time

        manifest["_ts"] = _time.time_ns()
        # orphans from failed/speculative task attempts
        self._sweep_tmp(committed_tmp)
        # versioned commit log (time travel's minimal form): every
        # commit also snapshots the full shard list as _MANIFEST.v{N}
        # (the version claimed above, before the base snapshot was
        # read).  Shards are immutable and appends never delete, so
        # reading an old version's list IS the table as of that commit.
        # metadata commits use the same rename pattern as the shards: a
        # crash mid-write (or a concurrent reader) must never observe a
        # truncated _MANIFEST / _MANIFEST.v{N} / _STATS — os.replace is
        # atomic on POSIX, so readers see either the old file or the new
        # one, never a partial body.  Order matters: the snapshot first
        # (time travel), then _STATS, then _MANIFEST last — the live
        # pointer only flips once everything it references is durable.
        #
        # OPTIMISTIC CONCURRENCY: the version snapshot is claimed with
        # CREATE-IF-ABSENT (hard link, which fails on an existing name)
        # — two writers that both prepared v{N} race to that one atomic
        # filesystem operation, exactly one wins, and the loser raises
        # ManifestCommitConflict after unlinking its own shards.  The
        # live _MANIFEST / _STATS are only ever flipped by the winner,
        # so a conflict can never produce a silent shard-list merge.
        body = _json.dumps(manifest)
        try:
            _write_atomic_excl(
                _os.path.join(self.path, f"_MANIFEST.v{version}"), body
            )
        except FileExistsError:
            # another writer committed this version first: roll back our
            # shard visibility (manifest-preferring readers never saw
            # them — they are in no committed manifest) and fail loudly.
            # Exception: on a manifest-less first commit the winner seeds
            # its manifest from a directory LISTING, which may have
            # caught our already-renamed shards — never delete a file
            # the winner's (atomic, hence complete) claim references.
            winner_files: set[str] = set()
            try:
                with open(
                    _os.path.join(self.path, f"_MANIFEST.v{version}")
                ) as fh:
                    winner_files = set(_json.load(fh))
            except (OSError, ValueError):
                pass
            for m in _flatten_commits(messages):
                if m.file in winner_files:
                    continue
                try:
                    _os.remove(_os.path.join(self.path, m.file))
                except OSError:
                    pass
            raise ManifestCommitConflict(
                f"concurrent commit: _MANIFEST.v{version} was claimed by "
                f"another writer after this job read version {version - 1}; "
                "this job's shards were rolled back — re-run the append "
                "against the new table state"
            ) from None
        # the live _MANIFEST is a CACHE: unpinned readers resolve the
        # highest _MANIFEST.v{N} first (JsonlDocsReader._resolve), so
        # correctness never depends on this pointer.  Still, only flip
        # it while this commit is the latest — a winner that claimed
        # v{N} then stalled while others committed v{N+1..} must not
        # swing the cache (and legacy consumers of it) backwards.  The
        # skipped _STATS merge only disables pruning for our shards —
        # zonemaps are advisory and partial stats are always safe.
        if _latest_manifest_version(self.path) == version:
            _write_atomic(
                _os.path.join(self.path, "_STATS"), _json.dumps(stats)
            )
            _write_atomic(_os.path.join(self.path, "_MANIFEST"), body)

    def abort(self, messages) -> None:
        import os as _os

        if _os.path.isdir(self.path):
            self._sweep_tmp(set())


class JsonlCommit(WriterCommitMessage):
    def __init__(
        self,
        tmp: str,
        file: str,
        rows: int,
        min_doc: int | None = None,
        max_doc: int | None = None,
        parts: dict | None = None,
        extra: list | None = None,
    ) -> None:
        self.tmp = tmp
        self.file = file
        self.rows = rows
        #: per-shard doc_id zonemap (None when the schema has no doc_id
        #: or the shard is empty) — commit() collects these into _STATS
        self.min_doc = min_doc
        self.max_doc = max_doc
        #: partition values of every row in this shard ({col: value}),
        #: set by a ``partition_by`` write — commit() records them
        #: under _STATS["_parts"] for reader-side partition pruning
        self.parts = parts
        #: additional shards from the SAME task (a partitioned task
        #: writes one shard per distinct partition value, but the
        #: DataSourceWriter API allows one message per task) —
        #: commit()/abort() flatten
        self.extra = extra


def _flatten_commits(messages):
    """One JsonlCommit per physical shard: tasks pack secondary shards
    into ``extra`` (one API message per task), commit/abort unpack."""
    for m in messages:
        if m is None:
            continue
        yield m
        for e in m.extra or ():
            yield e


#: reserved manifest key recording the streaming sink's last committed
#: micro-batch id — Delta's ``txn`` action: a retried batch compares
#: its id against this and becomes a no-op, which is what turns
#: at-least-once micro-batch delivery into exactly-once lake commits.
TXN_KEY = "_txn"


class JsonlDocsStreamWriter(DataSourceStreamWriter):
    """STREAMING SINK INTO THE MINI-LAKE — the fourth quadrant of the
    connector matrix (batch read/write and the two stream readers are
    the other three): every micro-batch lands as one manifest commit
    through the same create-if-absent OCC claim as batch appends, so a
    downstream ``versioned`` stream reader tails the sink's output at
    commit granularity and batch readers never observe a torn batch.

    EXACTLY-ONCE: tasks stage uuid-named shards (invisible until a
    manifest references them); ``commit(messages, batchId)`` first
    checks the latest manifest's ``_txn.last_batch`` — a RETRIED batch
    (engine restart between sink commit and offset-log commit) finds
    its own id already recorded and becomes a no-op sweep, never a
    duplicate (Delta's idempotent-txn pattern).  Conflicts with
    concurrent BATCH appenders re-claim the next version metadata-only
    (staged shards need no re-write).  Compaction/vacuum keep their
    exclusive-maintainer rule: a rewrite drops ``_txn``, so don't run
    them against a live sink's directory.

    Scale: per-batch work is the batch writer's (executor shards +
    one driver claim); state carried between batches is ONE integer
    in the manifest."""

    def __init__(self, options, schema) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_docs stream writer requires 'path'")
        self.fields = [f.name for f in schema.fields]
        import uuid as _uuid

        self.job_token = _uuid.uuid4().hex[:8]

    def write(self, iterator) -> WriterCommitMessage:
        import json as _json
        import os as _os
        import uuid as _uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        _os.makedirs(self.path, exist_ok=True)
        final = f"part-{pid:05d}-{_uuid.uuid4().hex[:8]}.jsonl"
        tmp = f"_tmp-{self.job_token}-" + final
        n = 0
        has_doc = "doc_id" in self.fields
        mn = mx = None
        # CHECK constraints, loaded lazily per TASK from the current
        # latest manifest (a stream is long-lived — a constraint added
        # mid-stream must bind future batches, so init-time loading
        # would be stale; per-batch task load is one manifest read)
        cons = []
        latest = _latest_manifest_version(self.path)
        if latest > 0:
            for nm, ex in _constraints_of(
                _manifest_at(self.path, latest)
            ).items():
                cons.append((nm, ex, _compile_constraint(ex)))
        with open(_os.path.join(self.path, tmp), "w") as fh:
            for row in iterator:
                d = {k: row[k] for k in self.fields}
                for nm, ex, fn in cons:
                    if not fn(d):
                        raise ValueError(
                            f"CHECK constraint {nm!r} ({ex}) violated "
                            f"by row {d!r} — the micro-batch fails "
                            "before any commit"
                        )
                fh.write(_json.dumps(d) + "\n")
                n += 1
                if has_doc and d["doc_id"] is not None:
                    v = d["doc_id"]
                    mn = v if mn is None or v < mn else mn
                    mx = v if mx is None or v > mx else mx
            fh.flush()
            _os.fsync(fh.fileno())
        return JsonlCommit(tmp, final, n, mn, mx)

    def _sweep(self, keep: set[str]) -> None:
        import os as _os

        prefix = f"_tmp-{self.job_token}-"
        try:
            names = _os.listdir(self.path)
        except OSError:
            return
        for f in names:
            if f.startswith(prefix) and f not in keep:
                try:
                    _os.remove(_os.path.join(self.path, f))
                except OSError:
                    pass

    def commit(self, messages, batchId: int) -> None:
        import json as _json
        import os as _os

        latest = _latest_manifest_version(self.path)
        last = (
            _manifest_at(self.path, latest).get(TXN_KEY, {})
            .get("last_batch", -1)
            if latest > 0
            else -1
        )
        if last >= batchId:
            # retried micro-batch: already durably committed — no-op
            self._sweep(set())
            return
        staged: dict[str, int] = {}
        stats_new: dict[str, list] = {}
        committed_tmp = set()
        for m in messages:
            if m is None:
                continue
            _os.rename(
                _os.path.join(self.path, m.tmp),
                _os.path.join(self.path, m.file),
            )
            committed_tmp.add(m.tmp)
            staged[m.file] = m.rows
            if getattr(m, "min_doc", None) is not None:
                stats_new[m.file] = [m.min_doc, m.max_doc]
        self._sweep(committed_tmp)
        # metadata-only claim loop: staged shards are invisible until a
        # manifest references them, so losing a claim to a concurrent
        # batch appender just means re-claiming against the new base.
        # Bounded: a pathologically hot table must fail the batch
        # loudly (the engine retries it; _txn makes that safe), not
        # spin the driver forever.
        for _attempt in range(64):
            base = _latest_manifest_version(self.path)
            version = base + 1
            manifest = dict(_manifest_at(self.path, base))
            # re-check _txn against the REFRESHED base: a zombie /
            # duplicate sink instance (engine failover) that passed the
            # pre-loop check can lose the claim race to the OTHER
            # instance's commit of this very batchId — re-claiming the
            # next version would land the batch's shards TWICE.  The
            # idempotence test must ride every claim attempt, not just
            # the first read (the Delta txn check is part of the commit
            # transaction for the same reason).  Our staged shards are
            # in no committed manifest — remove them and no-op.
            if manifest.get(TXN_KEY, {}).get("last_batch", -1) >= batchId:
                for f in staged:
                    try:
                        _os.remove(_os.path.join(self.path, f))
                    except OSError:
                        pass
                self._sweep(set())
                return
            if TOMBSTONE_KEY in manifest:
                added = manifest[TOMBSTONE_KEY].setdefault("added", {})
                for f in staged:
                    added[f] = version
            manifest.update(staged)
            manifest[TXN_KEY] = {"last_batch": batchId}
            manifest[OP_KEY] = "streaming-append"
            import time as _time

            manifest["_ts"] = _time.time_ns()
            body = _json.dumps(manifest)
            try:
                _write_atomic_excl(
                    _os.path.join(self.path, f"_MANIFEST.v{version}"),
                    body,
                )
            except FileExistsError:
                continue
            break
        else:
            raise ManifestCommitConflict(
                f"concurrent commit: _MANIFEST.v claims lost 64 times "
                f"for streaming batch {batchId} under {self.path} — "
                "contention is pathological; the engine will retry "
                "the batch"
            )
        if _latest_manifest_version(self.path) == version:
            spath = _os.path.join(self.path, "_STATS")
            stats = {}
            if _os.path.exists(spath):
                with open(spath) as fh:
                    stats = _json.load(fh)
            stats.update(stats_new)
            _write_atomic(spath, _json.dumps(stats))
            _write_atomic(_os.path.join(self.path, "_MANIFEST"), body)

    def abort(self, messages, batchId: int) -> None:
        self._sweep(set())


class JsonlDocsReader(DataSourceReader):
    """Manifest-resolving batch reader (snapshot / time-travel pins,
    tombstone application, zonemap + partition pruning — see the
    methods).

    PUSHDOWN-SHARING RULE (Spark 4.1 Python DataSource limitation —
    load once per filtered consumer): when ONE loaded DataFrame is
    branched under DIFFERENT filters (e.g. a union of two filtered
    aggregates over the same ``load()`` result), Spark builds a
    correctly-filtered reader per branch but executes BOTH branches
    against a single reader's planned partition list (scan identity
    ignores Python-side pushdown state, so the scans deduplicate;
    observed: the other branch re-filters the wrong shard set to
    empty).  Soundness rule for this source: take a FRESH ``load()``
    for every consumer that applies different filters — separate
    relations never share a reader.  Pruning stays a pure I/O saving
    under that rule because every filter is also re-evaluated by
    Spark.  (JVM DSv2 sources are immune: their pushed state lives in
    the Scan object, which participates in plan equality.)"""

    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_docs requires option 'path'")
        self.path = path
        #: optional snapshot pin: option("version", "N") reads the
        #: shard list committed as _MANIFEST.v{N} — time travel over
        #: the immutable shards (appends only ever add files)
        v = options.get("version")
        self.version = int(v) if v is not None else None
        #: Delta's TIMESTAMP AS OF: option("as_of_ts", ns) reads the
        #: newest commit whose _ts stamp is <= the given wall-clock ns
        ts = options.get("as_of_ts")
        self.as_of_ts = int(ts) if ts is not None else None
        if self.version is not None and self.as_of_ts is not None:
            raise ValueError(
                "jsonl_docs: pass either 'version' or 'as_of_ts', not both"
            )
        #: doc_id interval implied by pushed-down filters; shards whose
        #: _STATS zonemap can't intersect it are skipped in partitions()
        self._lo: int | None = None
        self._hi: int | None = None
        #: pushed-down equality/IN value sets per non-doc_id column —
        #: shards whose _STATS["_parts"] entry records a value OUTSIDE
        #: the set are skipped (partition pruning); columns without a
        #: parts entry never prune
        self._part_in: dict[str, set] = {}
        #: the pinned commit's column order (schema evolution: resolved
        #: once at plan time, same as the source's schema() call)
        _ddl = _effective_schema_ddl(options)
        self.fields = _fields_of_ddl(_ddl)
        self.convs = _converters_of_ddl(_ddl)

    def pushFilters(self, filters):
        """Filter PUSHDOWN (Spark 4.1 Python DataSource API), two
        pruning axes: (1) doc_id comparisons fold into one [lo, hi]
        interval tested against the writer's ``_STATS`` zonemap — the
        data-skipping move every lake format makes (parquet row-group
        stats, Iceberg manifests); (2) equality/IN predicates on other
        columns fold into per-column allowed-value sets tested against
        ``_STATS["_parts"]`` — PARTITION PRUNING over shards written
        with ``option("partition_by", col)``.  Every filter is
        returned to Spark for re-evaluation, so the pushdown is purely
        an I/O saving and can never change results; shards without a
        stats/parts entry are never pruned."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
        )

        def _tighten(lo=None, hi=None):
            if lo is not None and (self._lo is None or lo > self._lo):
                self._lo = lo
            if hi is not None and (self._hi is None or hi < self._hi):
                self._hi = hi

        for f in filters:
            attr = getattr(f, "attribute", None)
            # PARTITION pruning: equality/IN on any other column folds
            # into a per-column allowed-value set, tested against the
            # writer's _STATS["_parts"] (a partitioned shard holds ONE
            # value per partition column, so set membership is a sound
            # whole-shard test; non-partitioned shards have no entry
            # and are never pruned)
            if (
                attr is not None
                and len(attr) == 1
                and attr != ("doc_id",)
            ):
                col = attr[0]
                vals = None
                if isinstance(f, EqualTo) and isinstance(
                    f.value, (str, int, bool)
                ):
                    vals = {f.value}
                elif (
                    isinstance(f, In)
                    and f.value
                    and all(
                        isinstance(v, (str, int, bool)) for v in f.value
                    )
                ):
                    vals = set(f.value)
                if vals is not None:
                    prev = self._part_in.get(col)
                    self._part_in[col] = (
                        vals if prev is None else prev & vals
                    )
                continue
            if (
                isinstance(f, In)
                and attr == ("doc_id",)
                and f.value
                and all(isinstance(v, int) for v in f.value)
            ):
                # an IN list prunes by its value-set envelope (the
                # zonemap is an interval test, so the hull is the
                # tightest sound bound)
                _tighten(lo=min(f.value), hi=max(f.value))
                continue
            if getattr(f, "attribute", None) == ("doc_id",) and isinstance(
                getattr(f, "value", None), int
            ):
                if isinstance(f, EqualTo):
                    _tighten(lo=f.value, hi=f.value)
                elif isinstance(f, GreaterThan):
                    _tighten(lo=f.value + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    _tighten(lo=f.value)
                elif isinstance(f, LessThan):
                    _tighten(hi=f.value - 1)
                elif isinstance(f, LessThanOrEqual):
                    _tighten(hi=f.value)
        # all filters go back to Spark — zonemap pruning is a shard
        # skip, not a row filter
        return filters

    def _prune(self, files: list) -> list:
        if self._lo is None and self._hi is None and not self._part_in:
            return files
        spath = os.path.join(self.path, "_STATS")
        if not os.path.exists(spath):
            return files
        import json as _json

        with open(spath) as fh:
            stats = _json.load(fh)
        parts = stats.get("_parts", {})
        kept = []
        for f in files:
            # partition pruning: drop the shard iff a filtered column
            # has a RECORDED value outside the allowed set (no entry →
            # never prune blind, same rule as the zonemap)
            p = parts.get(f)
            if p and any(
                c in p and p[c] not in allowed
                for c, allowed in self._part_in.items()
            ):
                continue
            s = stats.get(f)
            if s is None:
                kept.append(f)  # no zonemap — never prune blind
                continue
            mn, mx = s
            if (self._hi is not None and mn > self._hi) or (
                self._lo is not None and mx < self._lo
            ):
                continue
            kept.append(f)
        return kept

    def _resolve(self) -> tuple[int | None, dict | None]:
        """(version, manifest) this read sees.  Pinned reads load their
        snapshot; unpinned reads resolve the HIGHEST committed
        ``_MANIFEST.v{N}`` — the live ``_MANIFEST`` is only a cache
        (a stalled winner flipping it late, or not at all, must never
        hide a newer committed version from batch readers) and is
        consulted only for legacy directories that have a live pointer
        but no versioned snapshots.  ``(None, None)`` = manifest-less
        directory → listing fallback."""
        import json as _json

        pinned = self.version
        if pinned is None and self.as_of_ts is not None:
            pinned = _version_as_of(self.path, self.as_of_ts)
        if pinned is not None:
            vpath = os.path.join(self.path, f"_MANIFEST.v{pinned}")
            if not os.path.exists(vpath):
                raise ValueError(
                    f"jsonl_docs: no snapshot _MANIFEST.v{pinned} "
                    f"under {self.path}"
                )
            with open(vpath) as fh:
                return pinned, _json.load(fh)
        latest = _latest_manifest_version(self.path)
        if latest > 0:
            with open(
                os.path.join(self.path, f"_MANIFEST.v{latest}")
            ) as fh:
                return latest, _json.load(fh)
        live = os.path.join(self.path, "_MANIFEST")
        if os.path.exists(live):
            with open(live) as fh:
                return None, _json.load(fh)
        return None, None

    def partitions(self):
        # driver-side work is ONE metadata read: when the directory was
        # produced by JsonlDocsWriter, the shard list comes from its
        # _MANIFEST commit log (so orphan shards from failed jobs are
        # never ingested); external directories (e.g. Spark's own JSON
        # writer output) fall back to a listing.  Each shard becomes an
        # independent task (ordering fixed for determinism).  Shards
        # with tombstoned rows (row-level DELETE/MERGE commits) carry
        # their applicable doc_id tombstones in the partition value so
        # every executor filters them at read time.
        _, manifest = self._resolve()
        if manifest is None:
            files = _list_shards(self.path)
        else:
            files = sorted(_manifest_files(manifest))
        tombs = _tombstones_of(manifest)
        parts = []
        for f in self._prune(files):
            # shallow-clone aware: names the clone never localized
            # resolve to the source dir (_base_dir)
            full = _shard_path(self.path, manifest, f)
            ids, kfiles = _tomb_sources_for(f, tombs)
            if ids or kfiles:
                parts.append(
                    InputPartition(
                        (
                            full,
                            ids,
                            tuple(
                                _shard_path(self.path, manifest, kf)
                                for kf in kfiles
                            ),
                        )
                    )
                )
            else:
                parts.append(InputPartition(full))
        return parts

    def read(self, partition):
        # runs on the executor's Python worker: stream one shard.
        # partition is None when partitions() returned [] (the zonemap
        # pruned EVERY shard) — PySpark substitutes a single default
        # partition in that case, which must scan nothing.
        if partition is None:
            return
        yield from _iter_jsonl(partition.value, self.fields, self.convs)


class ManifestCommitConflict(RuntimeError):
    """Two writers prepared the same manifest version concurrently and
    this one lost the atomic claim — the commit was rolled back; the
    table state is exactly the winner's.  Loud by design: a silent
    shard-list merge would interleave two jobs' rows under one version
    and break both the time-travel and exactly-once contracts."""


#: unique sentinel prefix every ManifestCommitConflict message starts
#: with — the ONE string _is_commit_conflict matches on across the Py4J
#: boundary (a generic phrase like "concurrent commit" could appear in
#: an unrelated Spark error and silently trigger the retry loop)
_CONFLICT_SENTINEL = "concurrent commit: _MANIFEST.v"


def _is_commit_conflict(exc: BaseException) -> bool:
    """True iff ``exc`` is (or wraps) a :class:`ManifestCommitConflict`.
    The writer's commit runs driver-side but the exception crosses the
    Py4J boundary wrapped, and the captured-exception repr() drops the
    class — so callers must match on str().  ONE place owns that
    matching rule: the exact raised prefix ``_CONFLICT_SENTINEL``,
    which every conflict site below embeds verbatim."""
    return isinstance(exc, ManifestCommitConflict) or (
        _CONFLICT_SENTINEL in str(exc)
    )


def _write_atomic_excl(path: str, body: str) -> None:
    """CREATE-IF-ABSENT twin of :func:`_write_atomic`: write the body to
    a temp file, fsync, then ``os.link`` it to the final name — link(2)
    fails with ``FileExistsError`` if the name is taken, which is the
    single atomic operation the optimistic-concurrency commit races on
    (POSIX guarantees exactly one of N concurrent links wins)."""
    import uuid as _uuid

    parent = os.path.dirname(path)
    tmp = os.path.join(parent, f"_tmp-meta-{_uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        fh.write(body)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, path)
    finally:
        os.unlink(tmp)
    dfd = os.open(parent, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _write_atomic(path: str, body: str) -> None:
    """Rename-commit a metadata file: write the full body to an
    underscore-prefixed temp name in the same directory (readers'
    listing fallback skips ``_``-files), fsync, then ``os.replace`` it
    into place.  POSIX rename atomicity means a crash mid-write or a
    concurrent reader observes the previous version or the new one —
    never truncated JSON (the time-travel and zonemap contracts both
    parse these files)."""
    import uuid as _uuid

    parent = os.path.dirname(path)
    tmp = os.path.join(parent, f"_tmp-meta-{_uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        fh.write(body)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)
    # fsync the DIRECTORY so the rename's directory entry is durable
    # across power loss, not just process crash (the rename itself
    # lives in directory metadata with its own write-back cache).
    dfd = os.open(parent, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _list_shards(path: str) -> list[str]:
    return sorted(
        f
        for f in os.listdir(path)
        if f.endswith((".json", ".jsonl")) and not f.startswith((".", "_"))
    )


#: reserved manifest key holding the cumulative tombstone ledger for
#: row-level DELETE / MERGE commits.  Embedding tombstones IN the
#: manifest snapshot keeps a delete commit a SINGLE atomic file claim —
#: no ordering window where a reader could see the new version's shard
#: list without its deletions (a sidecar file would need its own
#: tethering, like the .rewrite marker).  Shard-name keys never start
#: with '_', so the key can't collide; manifest consumers use
#: _manifest_files() to skip reserved keys.
#:
#: Ledger shape — Iceberg's SEQUENCE-NUMBER scoping, in JSON:
#:   {"entries": [{"v": commit_version,
#:                 "files": [key_file, ...],   # referenced DELETE FILES
#:                 "n": key_count,             # audit metadata only
#:                 "ids": [doc_ids]},          # legacy inline form
#:                ...],
#:    "added":   {shard_file: version_that_added_it, ...}}
#: An entry applies to shard f iff ``entry.v > added(f)`` (unknown
#: added = 0 — every shard already present when the ledger was created
#: predates every entry).  Version scoping, unlike a file LIST per
#: entry, survives rewrites: a compaction replaces file names, but the
#: rule "deleted by a later commit than the one that added these rows"
#: stays answerable for any shard a reader or a replaying stream can
#: deliver.  A MERGE is the exemption in action: its tombstone entry
#: and its new shards share one version, so ``v > added`` spares
#: exactly the replacement rows.
#:
#: The deleted KEYS live in delete FILES, not in the manifest
#: (Iceberg's equality-delete files / Delta's deletion vectors make
#: the same move): an entry's ``files`` name JSONL files in the table
#: directory whose rows carry ``doc_id`` — either dedicated
#: ``_delete-*`` key shards (written by :func:`delete_from_jsonl_dir`,
#: distributedly when the keys come as a DataFrame) or, for a MERGE,
#: the merge's OWN staged data shards (the keys are exactly its rows —
#: zero extra write, zero driver collect).  The manifest carries only
#: paths + counts, so a commit is O(files) metadata regardless of key
#: count, readers stream the key files executor-side at scan time
#: (cached per worker — files are immutable), compaction clears the
#: entries, and vacuum reclaims unreferenced ``_delete-*`` files.
#: Legacy inline ``ids`` entries remain readable (handy for crafted
#: fixtures); writers never produce them.
TOMBSTONE_KEY = "_tombstones"


def _manifest_files(manifest: dict) -> list[str]:
    """Shard filenames of a manifest dict, skipping reserved '_' keys."""
    return [f for f in manifest if not f.startswith("_")]


def _tombstones_of(manifest: dict | None) -> dict:
    """The ledger (see :data:`TOMBSTONE_KEY`) — empty shape if none."""
    if isinstance(manifest, dict) and TOMBSTONE_KEY in manifest:
        return manifest[TOMBSTONE_KEY]
    return {"entries": [], "added": {}}


def _tomb_sources_for(
    f: str, tombs: dict, added_v: int | None = None
) -> tuple[tuple, tuple]:
    """``(inline_ids, delete_file_names)`` tombstoning shard ``f`` —
    the sources of every entry committed AFTER the shard was added
    (``entry.v > added(f)``).  ``added_v`` overrides the ledger's
    added-map (the version stream knows each diff-delivered shard's add
    version directly).  Inline ids are the legacy fixture form; the
    delete-file names are resolved to absolute paths by the caller and
    streamed EXECUTOR-side (:func:`_load_delete_keys`) — the driver
    never materializes a key set."""
    av = (
        added_v
        if added_v is not None
        else tombs.get("added", {}).get(f, 0)
    )
    ids: set = set()
    files: list = []
    for e in tombs.get("entries", ()):
        if e["v"] > av:
            ids.update(e.get("ids", ()))
            for kf in e.get("files", ()):
                if kf not in files:
                    files.append(kf)
    return tuple(sorted(ids)), tuple(files)


@functools.lru_cache(maxsize=256)
def _load_delete_keys(path: str) -> frozenset:
    """doc_id key set of one delete/key file — runs on the EXECUTOR's
    Python worker and is memoized per worker process (delete files are
    immutable once referenced: UUID-named, written before the manifest
    claim, reclaimed only by vacuum), so a worker scanning many shards
    parses each key file once, not once per shard."""
    import json

    keys = set()
    with open(path) as fh:
        for line in fh:
            if not line.strip():
                continue
            keys.add(json.loads(line).get("doc_id"))
    return frozenset(keys)


def _iter_jsonl(value, fields: tuple[str, ...] | None = None, convs=None):
    """Executor-side shard scan shared by every reader: ``value`` is a
    shard path, or ``(path, inline_ids, delete_file_paths)`` when
    DELETE/MERGE commits apply to the shard — tombstoned rows are
    filtered here (the drop set is the inline ids plus the union of the
    referenced delete files' keys, loaded worker-side), so deletion is
    enforced by construction for batch, time-travel, and streaming
    reads alike.  ``fields`` is the resolved commit schema's column
    order (default: the legacy documents shape)."""
    import json

    if isinstance(value, str):
        path, drop = value, None
    else:
        path = value[0]
        drop = set(value[1])
        for kf in value[2] if len(value) > 2 else ():
            drop |= _load_delete_keys(kf)
    flds = fields or ("doc_id", "text", "lang", "source", "n_chars")
    with open(path) as fh:
        for line in fh:
            if not line.strip():
                continue
            r = json.loads(line)
            if drop is not None and r.get("doc_id") in drop:
                continue
            # missing keys read as NULL — JSONL's natural null-extension
            # is what makes add-column schema evolution rewrite-free
            if convs is None:
                yield tuple(r.get(k) for k in flds)
            else:
                yield tuple(
                    c(r.get(k)) if c else r.get(k)
                    for k, c in zip(flds, convs)
                )


class JsonlDocsStreamReader(DataSourceStreamReader):
    """Incremental landing-directory feed over the same JSONL shards:
    the offset is "how many shard files (in sorted order) have been
    consumed", so each microbatch picks up exactly the files that
    arrived since the last one — the file-source contract, expressed
    through the custom-source API.

    Distribution: ``partitions(start, end)`` emits one InputPartition
    per NEW file and ``read`` runs on executor Python workers, so
    ingest fans out like the batch reader; the driver never opens a
    shard.  Offsets are durable dicts — the checkpoint replays
    ``readBetweenOffsets`` deterministically because the sorted file
    list is append-only in a landing directory.
    """

    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_docs requires option 'path'")
        self.path = path

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        return {"index": len(_list_shards(self.path))}

    def partitions(self, start: dict, end: dict):
        files = _list_shards(self.path)[start["index"] : end["index"]]
        return [InputPartition(os.path.join(self.path, f)) for f in files]

    def read(self, partition):
        import json

        with open(partition.value) as fh:
            for line in fh:
                if not line.strip():
                    continue
                r = json.loads(line)
                yield (
                    r.get("doc_id"),
                    r.get("text"),
                    r.get("lang"),
                    r.get("source"),
                    r.get("n_chars"),
                )

    def commit(self, end: dict) -> None:
        pass


def _latest_manifest_version(path: str) -> int:
    return max(
        (
            int(f.rsplit(".v", 1)[1])
            for f in os.listdir(path)
            if f.startswith("_MANIFEST.v") and f.rsplit(".v", 1)[1].isdigit()
        ),
        default=0,
    )


def _version_as_of(path: str, ts_ns: int) -> int:
    """Largest committed version whose ``_ts`` stamp is <= ``ts_ns`` —
    Delta's TIMESTAMP AS OF resolution, over the versioned snapshots
    still on disk (vacuum shrinks the reachable window, same contract
    as version pins).  Legacy manifests without a stamp count as
    arbitrarily old (always eligible).  One metadata read per retained
    version — metadata-scale.  Raises if the timestamp predates every
    retained commit.

    Raw ``_ts`` stamps are NOT monotonic with version: a
    base_version-pinned writer stamps ``_ts`` before its claim and can
    stall, so v{N+1} may carry an earlier stamp than v{N}.  Resolution
    therefore CANONICALIZES each commit's effective timestamp to
    ``max(own _ts, every predecessor's _ts)`` (Delta canonicalizes
    commit timestamps for exactly this reason) — the effective series
    is monotone, so "newest commit at or before t" is well-defined and
    never resolves to a version at which an earlier-numbered commit had
    not yet landed."""
    versions = sorted(
        int(f.rsplit(".v", 1)[1])
        for f in os.listdir(path)
        if f.startswith("_MANIFEST.v") and f.rsplit(".v", 1)[1].isdigit()
    )
    best = 0
    running = 0
    for v in versions:
        running = max(running, _manifest_at(path, v).get("_ts", 0))
        if running <= ts_ns:
            best = v
    if best == 0:
        raise ValueError(
            f"jsonl_docs: no commit at or before as_of_ts={ts_ns} "
            f"under {path} (vacuumed, or timestamp predates the table)"
        )
    return best


def _manifest_at(path: str, version: int) -> dict:
    import json

    if version <= 0:
        return {}
    with open(os.path.join(path, f"_MANIFEST.v{version}")) as fh:
        return json.load(fh)


#: reserved manifest key recording the table schema (DDL string) as of
#: that commit — absent = the legacy documents shape (DOCS_DDL).  The
#: schema is COMMIT-SCOPED: an :func:`evolve_jsonl_schema` commit
#: records the new DDL at version N, so pinned reads of v<N keep the
#: old shape, latest reads serve the new one (old shards' missing
#: fields read as NULL — JSONL's natural null-extension), and a
#: version stream that started under the old schema fails LOUDLY at
#: the boundary (restart picks up the new shape) — the Delta/Iceberg
#: schema-evolution contract.
SCHEMA_KEY = "_schema"


def _typed_fields_of_ddl(ddl: str) -> tuple[tuple[str, str], ...]:
    """``(name, type)`` pairs of a DDL string, in order (paren- AND
    angle-bracket-aware split, so ``decimal(10,2)`` and
    ``map<string,int>`` column types don't shear)."""
    pairs = []
    depth = 0
    start = 0
    for i, ch in enumerate(ddl + ","):
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        elif ch == "," and depth == 0:
            part = ddl[start:i].strip()
            if part:
                name, _, typ = part.partition(" ")
                pairs.append((name, typ.strip()))
            start = i + 1
    return tuple(pairs)


def _fields_of_ddl(ddl: str) -> tuple[str, ...]:
    """Column names of a DDL string, in order (paren-aware split, so
    ``decimal(10,2)`` column types don't shear)."""
    return tuple(name for name, _ in _typed_fields_of_ddl(ddl))


def _cell_converter(ddl_type: str):
    """Reader-side converter for one DDL type, or ``None`` for types
    ``json.loads`` already yields in the Python object form PySpark's
    Arrow conversion expects.  Decimal / timestamp / date / binary
    need help: the JSONL form is a quoted string (written by
    :func:`_json_cell`) and Spark's conversion asserts the typed
    Python object (``decimal.Decimal`` etc.), not a str."""
    t = ddl_type.strip().lower()
    if t.startswith("decimal") or t.startswith("numeric"):
        import decimal

        return lambda v: None if v is None else decimal.Decimal(str(v))
    if t.startswith("timestamp"):
        import datetime

        return lambda v: (
            v
            if v is None or isinstance(v, datetime.datetime)
            else datetime.datetime.fromisoformat(v)
        )
    if t == "date":
        import datetime

        return lambda v: (
            v
            if v is None or not isinstance(v, str)
            else datetime.date.fromisoformat(v)
        )
    if t == "binary":
        import base64

        return lambda v: (
            None
            if v is None
            else base64.b64decode(v) if isinstance(v, str) else bytes(v)
        )
    return None


def _converters_of_ddl(ddl: str):
    """Per-field converter tuple aligned with :func:`_fields_of_ddl`
    order; all-None collapses to ``None`` (the fast path — zero
    per-cell overhead for ordinary string/bigint tables)."""
    convs = tuple(
        _cell_converter(t) for _, t in _typed_fields_of_ddl(ddl)
    )
    return convs if any(convs) else None


def _effective_schema_ddl(options) -> str:
    """The DDL a read with these options sees: the pinned (or latest)
    manifest's ``_schema``, else :data:`DOCS_DDL` for legacy manifests
    and manifest-less directories."""
    path = options.get("path")
    if not path or not os.path.isdir(path):
        return DOCS_DDL
    try:
        v = options.get("version")
        ts = options.get("as_of_ts")
        if v is not None:
            m = _manifest_at(path, int(v))
        elif ts is not None:
            m = _manifest_at(path, _version_as_of(path, int(ts)))
        else:
            latest = _latest_manifest_version(path)
            m = _manifest_at(path, latest) if latest else {}
    except (OSError, ValueError):
        return DOCS_DDL
    return m.get(SCHEMA_KEY, DOCS_DDL)


def evolve_jsonl_schema(
    path: str, new_ddl: str, base_version: int | None = None
) -> int:
    """SCHEMA EVOLUTION as a lake COMMIT: claim a new manifest version
    identical to the base except for ``_schema`` = ``new_ddl`` — a
    pure-metadata commit through the same create-if-absent OCC gate as
    every append (a concurrent writer and an evolve have exactly one
    winner).  Only ADD-COLUMN evolution is legal: the base schema's
    columns must be a verbatim prefix of the new DDL (the one evolution
    every engine can serve without rewriting data — old shards
    null-extend; renames/drops/retypes would silently corrupt old
    rows and are rejected loudly).  Returns the new version."""
    import json as _json
    import time as _time

    base = (
        base_version
        if base_version is not None
        else _latest_manifest_version(path)
    )
    if base <= 0:
        raise ValueError(
            f"evolve_jsonl_schema: no committed version under {path}"
        )
    manifest = _manifest_at(path, base)
    old_ddl = manifest.get(SCHEMA_KEY, DOCS_DDL)
    old_cols = [c.strip() for c in old_ddl.split(",")]
    new_cols = [c.strip() for c in new_ddl.split(",")]
    if new_cols[: len(old_cols)] != old_cols:
        raise ValueError(
            "evolve_jsonl_schema: only add-column evolution is "
            f"supported — the current schema ({old_ddl!r}) must be a "
            f"prefix of the new DDL ({new_ddl!r}); renames, drops and "
            "retypes require a rewrite"
        )
    version = base + 1
    new_manifest = dict(manifest)
    new_manifest[SCHEMA_KEY] = new_ddl
    new_manifest[OP_KEY] = "evolve-schema"
    new_manifest["_ts"] = _time.time_ns()
    body = _json.dumps(new_manifest)
    try:
        _write_atomic_excl(
            os.path.join(path, f"_MANIFEST.v{version}"), body
        )
    except FileExistsError:
        raise ManifestCommitConflict(
            f"concurrent commit: _MANIFEST.v{version} was claimed by "
            f"another writer after this evolve read version {base}; "
            "re-plan the schema change against the new table state"
        ) from None
    if _latest_manifest_version(path) == version:
        _write_atomic(os.path.join(path, "_MANIFEST"), body)
    return version


#: reserved manifest key holding the table's CHECK constraints
#: ({name: expr}) — commit-scoped like _schema: added/dropped by a
#: pure-metadata commit, enforced by every writer against the base
#: manifest it plans against, never enforced retroactively on rows
#: already committed (the Delta ALTER TABLE ADD CONSTRAINT contract
#: would scan history first; ours documents add-forward semantics)
CONSTRAINT_KEY = "_constraints"

_CONSTRAINT_OPS = {
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    "=": lambda a, b: a == b,
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<>": lambda a, b: a != b,
}


def _compile_constraint(expr: str):
    """Compile a restricted CHECK-constraint grammar to a row
    predicate: ``col IS NOT NULL`` or ``col <op> literal`` (numeric or
    single-quoted string; ops ``> >= < <= = == != <>``).  SQL CHECK
    semantics: only FALSE violates — a NULL cell under a comparison is
    UNKNOWN, which passes (use an explicit IS NOT NULL to forbid it),
    the same rule Delta/ANSI apply.  The deliberately small grammar is
    what a pure-Python per-row writer can evaluate at full speed; AND
    is spelled as multiple named constraints.  Raises ValueError on
    anything else — an unparseable constraint must fail at ADD time,
    never pass silently at write time."""
    import re as _re

    m = _re.fullmatch(
        r"\s*(\w+)\s+is\s+not\s+null\s*", expr, _re.IGNORECASE
    )
    if m:
        col = m.group(1)
        return lambda row, c=col: row.get(c) is not None
    m = _re.fullmatch(
        r"\s*(\w+)\s*(>=|<=|!=|<>|==|=|>|<)\s*"
        r"('(?:[^']*)'|-?\d+(?:\.\d+)?)\s*",
        expr,
    )
    if m:
        col, op, lit = m.group(1), m.group(2), m.group(3)
        if lit.startswith("'"):
            value = lit[1:-1]
        elif "." in lit:
            value = float(lit)
        else:
            value = int(lit)
        fn = _CONSTRAINT_OPS[op]

        def pred(row, c=col, f=fn, v=value):
            cell = row.get(c)
            if cell is None:
                return True  # UNKNOWN never violates (ANSI CHECK)
            return f(cell, v)

        return pred
    raise ValueError(
        f"unsupported constraint expression {expr!r}: the grammar is "
        "'col IS NOT NULL' or 'col <op> literal' "
        "(ops > >= < <= = == != <>; numeric or 'string' literal)"
    )


def _constraints_of(manifest: dict | None) -> dict:
    if isinstance(manifest, dict) and CONSTRAINT_KEY in manifest:
        return manifest[CONSTRAINT_KEY]
    return {}


def add_constraint_jsonl_dir(
    path: str, name: str, expr: str, base_version: int | None = None
) -> int:
    """ADD a named CHECK constraint as a lake COMMIT (pure metadata,
    same create-if-absent OCC gate as every append — a concurrent
    writer that planned against the pre-constraint base either wins
    the claim race or conflicts; it can never land unvalidated rows
    AFTER the constraint's version).  Enforcement is add-forward:
    every write that plans against version >= this commit validates
    each row on the EXECUTOR before staging, and one violating row
    fails the whole job before any manifest claim — nothing partial
    ever commits.  The expression must compile under the restricted
    grammar (:func:`_compile_constraint`) or the ADD itself fails."""
    import json as _json
    import time as _time

    _compile_constraint(expr)  # fail at ADD time, not at write time
    base = (
        base_version
        if base_version is not None
        else _latest_manifest_version(path)
    )
    if base <= 0:
        raise ValueError(
            f"add_constraint_jsonl_dir: no committed version under {path}"
        )
    manifest = _manifest_at(path, base)
    cons = dict(_constraints_of(manifest))
    if name in cons:
        raise ValueError(
            f"constraint {name!r} already exists: {cons[name]!r}"
        )
    cons[name] = expr
    version = base + 1
    new_manifest = dict(manifest)
    new_manifest[CONSTRAINT_KEY] = cons
    new_manifest[OP_KEY] = "add-constraint"
    new_manifest["_ts"] = _time.time_ns()
    body = _json.dumps(new_manifest)
    try:
        _write_atomic_excl(
            os.path.join(path, f"_MANIFEST.v{version}"), body
        )
    except FileExistsError:
        raise ManifestCommitConflict(
            f"concurrent commit: _MANIFEST.v{version} was claimed by "
            f"another writer after this constraint read version {base}; "
            "re-plan the ADD CONSTRAINT against the new table state"
        ) from None
    if _latest_manifest_version(path) == version:
        _write_atomic(os.path.join(path, "_MANIFEST"), body)
    return version


def drop_constraint_jsonl_dir(
    path: str, name: str, base_version: int | None = None
) -> int:
    """DROP a named constraint — the metadata-commit twin of
    :func:`add_constraint_jsonl_dir` (unknown names fail loudly)."""
    import json as _json
    import time as _time

    base = (
        base_version
        if base_version is not None
        else _latest_manifest_version(path)
    )
    manifest = _manifest_at(path, base)
    cons = dict(_constraints_of(manifest))
    if name not in cons:
        raise ValueError(f"constraint {name!r} does not exist")
    del cons[name]
    version = base + 1
    new_manifest = dict(manifest)
    if cons:
        new_manifest[CONSTRAINT_KEY] = cons
    else:
        new_manifest.pop(CONSTRAINT_KEY, None)
    new_manifest[OP_KEY] = "drop-constraint"
    new_manifest["_ts"] = _time.time_ns()
    body = _json.dumps(new_manifest)
    try:
        _write_atomic_excl(
            os.path.join(path, f"_MANIFEST.v{version}"), body
        )
    except FileExistsError:
        raise ManifestCommitConflict(
            f"concurrent commit: _MANIFEST.v{version} was claimed by "
            f"another writer after this constraint read version {base}; "
            "re-plan the DROP CONSTRAINT against the new table state"
        ) from None
    if _latest_manifest_version(path) == version:
        _write_atomic(os.path.join(path, "_MANIFEST"), body)
    return version


def _earliest_manifest_version(path: str) -> int:
    """Smallest committed version still on disk (0 if none) — moves
    up from 1 after :func:`vacuum_jsonl_dir` drops old snapshots."""
    return min(
        (
            int(f.rsplit(".v", 1)[1])
            for f in os.listdir(path)
            if f.startswith("_MANIFEST.v") and f.rsplit(".v", 1)[1].isdigit()
        ),
        default=0,
    )


def _rewrite_marker_valid(path: str, version: int) -> bool:
    """True iff ``_MANIFEST.v{version}.rewrite`` exists AND its body is
    the md5 of the snapshot it marks.  The tether makes a marker
    self-invalidating: a compaction that crashed between writing the
    marker and the snapshot leaves a marker whose digest matches
    nothing, so the NEXT data commit that claims the same version
    number is (correctly) streamed as data — a stale marker can never
    silently reclassify someone else's commit as a rewrite.

    Deliberately STRICT: pre-tether empty-body markers fail the check,
    so a table compacted by an older build would re-deliver its
    rewrite commit as data.  Acceptable here because mini-lake
    directories are session-scoped scratch artifacts (rebuilt per
    process, never carried across code versions); a durable table
    format would ship a marker-rewrite migration instead."""
    import hashlib

    mpath = os.path.join(path, f"_MANIFEST.v{version}.rewrite")
    try:
        with open(mpath) as fh:
            marked = fh.read().strip()
        with open(os.path.join(path, f"_MANIFEST.v{version}"), "rb") as fh:
            digest = hashlib.md5(fh.read()).hexdigest()
    except OSError:
        return False
    return marked == digest


class JsonlDocsVersionStreamReader(DataSourceStreamReader):
    """SNAPSHOT STREAMING over the manifest commit log — the
    stream-from-table semantics a lake source provides (Delta/Iceberg
    incremental read), on the engine's own connector: the offset is the
    COMMITTED MANIFEST VERSION, and each microbatch reads exactly the
    shards that version N+1..M added over version N (set difference of
    two manifest snapshots).  Files in the directory but in NO
    committed manifest — in-flight staging, orphans from failed or
    CONFLICTED commits (``ManifestCommitConflict``) — are invisible,
    which the listing-offset twin (:class:`JsonlDocsStreamReader`)
    cannot promise.  Composes with the optimistic-concurrency writer:
    a concurrent append lands as the next version and the next
    microbatch picks up precisely its shards.

    The checkpoint replays ``partitions(start, end)`` deterministically
    because manifests are immutable once claimed (create-if-absent) and
    appends never delete — the same property that makes batch time
    travel sound."""

    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_docs requires option 'path'")
        self.path = path
        # Delta's startingVersion: stream changes FROM this commit
        # (inclusive), skipping the initial snapshot.  Default 0 =
        # fresh subscriber = initial snapshot at the earliest kept
        # version, then diffs (see partitions()).
        sv = options.get("starting_version")
        self.starting_version = int(sv) if sv is not None else 0
        # Delta's ignoreDeletes: an append-only stream cannot RETRACT
        # rows, so a DELETE/MERGE commit (tombstone ledger grew) fails
        # the stream loudly unless the consumer opts in — with the
        # opt-in, removals are simply not propagated and any shards the
        # commit added (merge upserts) still stream as appends.
        self.ignore_deletes = (
            options.get("ignore_deletes", "").lower() == "true"
        )
        #: the stream's schema, fixed at query start (latest commit's):
        #: commits with a DIFFERENT schema that this one does not
        #: extend fail the stream loudly in partitions() — Delta's
        #: restart-on-schema-change contract
        _ddl = _effective_schema_ddl(options)
        self.fields = _fields_of_ddl(_ddl)
        self.convs = _converters_of_ddl(_ddl)

    def initialOffset(self) -> dict:
        return {"version": max(0, self.starting_version - 1)}

    def latestOffset(self) -> dict:
        return {"version": _latest_manifest_version(self.path)}

    def partitions(self, start: dict, end: dict):
        # walk the versions one commit at a time: a DATA commit
        # contributes the shards it added over its predecessor; a
        # REWRITE commit (compaction — ``.rewrite`` sidecar tethered to
        # its snapshot by md5, the dataChange=false flag) contributes
        # NOTHING — its files hold only rows earlier commits already
        # delivered, so reading them would duplicate every compacted
        # row.  Data commits are append-only, so per-commit set
        # difference is exact; a LAGGING stream that still needs a
        # pre-compaction shard vacuum already reclaimed fails LOUDLY
        # on the missing file (the same time-travel-until-vacuum
        # contract as batch reads).  A FRESH stream (offset 0) on a
        # vacuumed table instead starts from the earliest snapshot
        # still on disk, delivered WHOLE as its initial batch (rewrite
        # marker ignored for that one version — a new subscriber needs
        # the current rows however they were laid out), then tails
        # diffs — the Delta/Iceberg initial-snapshot semantics.
        import hashlib
        import json

        out: dict[str, int] = {}  # delivered shard → version that added it
        first = start["version"] + 1
        initial = None
        if start["version"] == 0:
            earliest = _earliest_manifest_version(self.path)
            if earliest == 0:
                return []  # no committed version yet
            first = initial = earliest
        # each snapshot's bytes are read ONCE per microbatch: the same
        # body feeds the md5 tether check, the current diff, and the
        # next iteration's prev (carried forward) — K+1 file reads for
        # a K-version batch, not 3K
        prev_files: set[str] | None = None
        prev_nents = 0
        base_dir: str | None = None  # shallow-clone source, if any
        batch_ents: list[dict] = []  # union of ledger entries walked
        ent_seen: set = set()
        for v in range(first, end["version"] + 1):
            with open(
                os.path.join(self.path, f"_MANIFEST.v{v}"), "rb"
            ) as fh:
                body = fh.read()
            m = json.loads(body)
            base_dir = m.get(BASE_DIR_KEY, base_dir)
            # SCHEMA boundary: a commit whose schema this stream's
            # fixed schema does not EXTEND cannot be represented in
            # the stream's rows — fail loudly; the restarted stream
            # picks up the evolved schema and null-extends old shards.
            # (Commits with a PREFIX schema — pre-evolution history
            # read by a fresh subscriber — null-extend naturally.)
            mf = _fields_of_ddl(m.get(SCHEMA_KEY, DOCS_DDL))
            if mf != tuple(self.fields[: len(mf)]):
                raise ValueError(
                    f"jsonl_docs version stream: commit v{v} of "
                    f"{self.path} changed the table schema to "
                    f"{list(mf)}, which this stream (started with "
                    f"{list(self.fields)}) cannot represent — restart "
                    "the subscriber to pick up the evolved schema."
                )
            cur = set(_manifest_files(m))
            tombs = _tombstones_of(m)
            for e in tombs["entries"]:
                key = (e["v"], tuple(e.get("ids", ())))
                if key not in ent_seen:
                    ent_seen.add(key)
                    batch_ents.append(e)
            skip = False
            if v != initial:
                try:
                    with open(
                        os.path.join(
                            self.path, f"_MANIFEST.v{v}.rewrite"
                        )
                    ) as fh:
                        skip = (
                            fh.read().strip()
                            == hashlib.md5(body).hexdigest()
                        )
                except OSError:
                    skip = False
            if v == initial:
                # initial snapshot: each shard keeps its TRUE add
                # version from the ledger's added-map (default 0 =
                # predates every entry), so entries committed before
                # the snapshot still filter it and a merge's own
                # replacement shards stay exempt
                added = tombs.get("added", {})
                for f in cur:
                    out.setdefault(f, added.get(f, 0))
            elif not skip:
                if prev_files is not None:
                    base, base_nents = prev_files, prev_nents
                else:
                    pm = _manifest_at(self.path, v - 1)
                    base = set(_manifest_files(pm))
                    base_nents = len(_tombstones_of(pm)["entries"])
                # a RESTORE (op stamp, plus the unmarked ledger
                # shrink backstop for hand-edited metadata) cannot be
                # replayed incrementally: rows it un-deletes were never
                # retracted downstream, and files it rolls back to may
                # already have been delivered (duplicate delivery)
                if (
                    m.get(OP_KEY) == "restore"
                    or len(tombs["entries"]) < base_nents
                ):
                    raise ValueError(
                        f"jsonl_docs version stream: commit v{v} of "
                        f"{self.path} is a RESTORE (or shrank the "
                        "ledger without a rewrite marker) — its "
                        "un-deletions cannot be replayed "
                        "incrementally; restart the subscriber from a "
                        "fresh snapshot."
                    )
                if (
                    len(tombs["entries"]) > base_nents
                    and not self.ignore_deletes
                ):
                    raise ValueError(
                        f"jsonl_docs version stream: commit v{v} of "
                        f"{self.path} deleted rows (tombstone ledger "
                        "grew), which an append-only stream cannot "
                        "retract.  Pass option('ignore_deletes', "
                        "'true') to skip removals (merge-added shards "
                        "still stream), or restart the subscriber from "
                        "a fresh snapshot."
                    )
                for f in cur - base:
                    out.setdefault(f, v)  # diff shards: added at v
            prev_files, prev_nents = cur, len(tombs["entries"])
        # every ledger entry seen across the walked versions is applied
        # to every delivered shard ADDED BEFORE it ("v > added" — the
        # sequence-number rule): deleted-as-of-end rows never enter the
        # stream, a merge's replaced keys are dropped from the old
        # shards but spared on its own replacements, and the scoping
        # survives compactions inside the range (a rewrite renames
        # files; the add-version comparison doesn't care).  The UNION
        # (not just the end ledger) matters because a compaction after
        # a delete clears the ledger while pre-compaction diffs still
        # need that delete's entry.  Deterministic on checkpoint
        # replay: (start, end) pins the batch and manifests are
        # immutable.  Cross-batch removals are the documented
        # ignore_deletes non-retraction.
        parts = []
        # shallow-clone aware: the walk may span a compaction that
        # dropped _base_dir, but earlier versions' shards still need
        # it — resolve against any base dir seen during the walk
        res = {BASE_DIR_KEY: base_dir} if base_dir else None
        for f, av in sorted(out.items()):
            full = _shard_path(self.path, res, f)
            ids, kfiles = _tomb_sources_for(
                f, {"entries": batch_ents}, added_v=av
            )
            if ids or kfiles:
                parts.append(
                    InputPartition(
                        (
                            full,
                            ids,
                            tuple(
                                _shard_path(self.path, res, kf)
                                for kf in kfiles
                            ),
                        )
                    )
                )
            else:
                parts.append(InputPartition(full))
        return parts

    def read(self, partition):
        if partition is None:
            return
        yield from _iter_jsonl(partition.value, self.fields, self.convs)

    def commit(self, end: dict) -> None:
        pass


class JsonlDocsChangeFeedStreamReader(DataSourceStreamReader):
    """STREAMING CHANGE DATA FEED — Delta's ``readChangeFeed``: each
    microbatch delivers the TYPED row-level changes of the commits in
    ``(start, end]`` — table columns + ``_change_type`` ∈ {insert,
    update_preimage, update_postimage, delete} + ``_commit_version``.
    The offset is the committed manifest version, same determinism
    contract as the snapshot stream (immutable manifests ⇒ checkpoint
    replay is exact).

    Where the changes come from, per commit:

    - append commit → its added shards stream as ``insert`` rows.
    - rewrite commit (valid ``.rewrite`` marker) → nothing
      (dataChange=false).
    - DML commit made with ``cdf=True`` → its commit-time ``_cdc-*``
      files stream VERBATIM (pre-images included; no snapshot join at
      read time — Delta's _change_data design).
    - DML commit made WITHOUT cdf → fail LOUDLY: pre-images for that
      commit no longer exist anywhere except by re-scanning history,
      which a stream partition cannot do.  Run DML with ``cdf=True``
      on tables that feed a change stream (Delta raises the same way
      when CDF was not enabled at the time of the commit).

    A fresh subscriber (offset 0) starts from the earliest retained
    snapshot delivered WHOLE as ``insert`` rows (its current state,
    tombstones applied), then tails typed diffs — the
    ``startingVersion`` initial-snapshot semantics."""

    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_docs requires option 'path'")
        self.path = path
        sv = options.get("starting_version")
        self.starting_version = int(sv) if sv is not None else 0
        base_ddl = _effective_schema_ddl(
            {"path": path}
        )  # table columns only — the CDF tags are appended at read
        self.fields = _fields_of_ddl(base_ddl)
        self.convs = _converters_of_ddl(base_ddl)

    def initialOffset(self) -> dict:
        return {"version": max(0, self.starting_version - 1)}

    def latestOffset(self) -> dict:
        return {"version": _latest_manifest_version(self.path)}

    def partitions(self, start: dict, end: dict):
        import hashlib
        import json

        parts = []
        first = start["version"] + 1
        initial = None
        if start["version"] == 0:
            earliest = _earliest_manifest_version(self.path)
            if earliest == 0:
                return []
            first = initial = earliest
        prev_files: set[str] | None = None
        base_dir: str | None = None  # shallow-clone source, if any
        for v in range(first, end["version"] + 1):
            with open(
                os.path.join(self.path, f"_MANIFEST.v{v}"), "rb"
            ) as fh:
                body = fh.read()
            m = json.loads(body)
            base_dir = m.get(BASE_DIR_KEY, base_dir)
            res = {BASE_DIR_KEY: base_dir} if base_dir else None
            mf = _fields_of_ddl(m.get(SCHEMA_KEY, DOCS_DDL))
            if mf != tuple(self.fields[: len(mf)]):
                raise ValueError(
                    f"jsonl_docs change feed: commit v{v} of "
                    f"{self.path} changed the table schema to "
                    f"{list(mf)}, which this stream (started with "
                    f"{list(self.fields)}) cannot represent — restart "
                    "the subscriber to pick up the evolved schema."
                )
            cur = set(_manifest_files(m))
            tombs = _tombstones_of(m)
            if v == initial:
                # initial snapshot: current rows as inserts, the
                # snapshot's own tombstones applied
                for f in sorted(cur):
                    ids, kfiles = _tomb_sources_for(
                        f, tombs, added_v=tombs.get("added", {}).get(f, 0)
                    )
                    parts.append(
                        InputPartition(
                            (
                                "snap",
                                (
                                    _shard_path(self.path, res, f),
                                    ids,
                                    tuple(
                                        _shard_path(self.path, res, kf)
                                        for kf in kfiles
                                    ),
                                )
                                if (ids or kfiles)
                                else _shard_path(self.path, res, f),
                                v,
                            )
                        )
                    )
                prev_files = cur
                prev_nents = len(tombs["entries"])
                continue
            skip = False
            try:
                with open(
                    os.path.join(self.path, f"_MANIFEST.v{v}.rewrite")
                ) as fh:
                    skip = (
                        fh.read().strip() == hashlib.md5(body).hexdigest()
                    )
            except OSError:
                skip = False
            if skip:
                prev_files = cur
                prev_nents = len(tombs["entries"])
                continue
            cdc_own = m.get(CDC_KEY, {}).get(str(v), [])
            if cdc_own:
                for f in cdc_own:
                    parts.append(
                        InputPartition(
                            ("cdc", _shard_path(self.path, res, f), v)
                        )
                    )
                prev_files = cur
                prev_nents = len(tombs["entries"])
                continue
            if prev_files is not None:
                base = prev_files
                base_nents = prev_nents
            else:
                pm = _manifest_at(self.path, v - 1)
                base = set(_manifest_files(pm))
                base_nents = len(_tombstones_of(pm)["entries"])
            if (
                m.get(OP_KEY) == "restore"
                or len(tombs["entries"]) < base_nents
            ):
                raise ValueError(
                    f"jsonl_docs change feed: commit v{v} of "
                    f"{self.path} is a RESTORE (or shrank the ledger "
                    "without a rewrite marker) — its un-deletions "
                    "cannot be replayed incrementally; restart the "
                    "subscriber from a fresh snapshot."
                )
            if len(tombs["entries"]) > base_nents:
                raise ValueError(
                    f"jsonl_docs change feed: commit v{v} of "
                    f"{self.path} deleted or replaced rows but carries "
                    "no CDC files — its pre-images cannot be streamed. "
                    "Run DELETE/MERGE with cdf=True on tables that "
                    "feed a change stream, or restart from a fresh "
                    "snapshot."
                )
            for f in sorted(cur - base):
                parts.append(
                    InputPartition(
                        ("ins", _shard_path(self.path, res, f), v)
                    )
                )
            prev_files = cur
            prev_nents = len(tombs["entries"])
        return parts

    def read(self, partition):
        import json

        kind, value, v = partition.value
        if kind == "cdc":
            with open(value) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    d = json.loads(line)
                    if self.convs is None:
                        yield tuple(d.get(c) for c in self.fields) + (
                            d.get("_change_type"),
                            v,
                        )
                    else:
                        yield tuple(
                            c(d.get(k)) if c else d.get(k)
                            for k, c in zip(self.fields, self.convs)
                        ) + (d.get("_change_type"), v)
            return
        # snap / ins: plain rows typed as inserts of their commit
        for row in _iter_jsonl(value, self.fields, self.convs):
            yield tuple(row) + ("insert", v)

    def commit(self, end: dict) -> None:
        pass


def _jsonl_shard_dir(spark: SparkSession, sf_dir: str) -> str:
    """Write the documents table as JSONL shards once per sf_dir (the
    fixture for the round-trip; written by Spark's own distributed JSON
    writer, hash-repartitioned into N_SHARDS files)."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    d = os.path.join(tempfile.gettempdir(), f"pu4spark_jsonl_{tag}")
    marker = os.path.join(d, "_SUCCESS")
    if not os.path.exists(marker):
        docs = load_table(spark, "documents", sf_dir)
        docs.repartition(N_SHARDS, "doc_id").write.mode("overwrite").json(d)
    return d


def q_fmt_pyds_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → JSONL shards → custom Python data source → per-lang
    aggregate; the oracle runs the same aggregate on the original
    parquet, so any row the source drops, mangles, or duplicates
    hash-mismatches."""
    shard_dir = _jsonl_shard_dir(spark, sf_dir)
    register_pyds(spark)
    back = spark.read.format("jsonl_docs").option("path", shard_dir).load()
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        F.countDistinct("source").alias("n_sources"),
    )


SQL_FMT_PYDS_JSONL_ROUNDTRIP = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc,
       COUNT(DISTINCT source) AS n_sources
FROM documents
GROUP BY lang
"""

def q_fmt_pyds_jsonl_write_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """documents → the CUSTOM Python writer (executor-side JSONL shards
    + driver manifest) → the custom reader → per-lang aggregate — the
    write half of the connector surface, value-checked end to end
    against the parquet truth (any row the writer drops, mangles, or
    double-writes hash-mismatches)."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    # per-process suffix: mode('overwrite') clears the target driver-
    # side, so concurrent sessions must not share one directory
    out = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_w_{tag}_{os.getpid()}"
    )
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)
    (
        docs.repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out)
        .mode("overwrite")  # writer clears the target driver-side
        .save()
    )
    back = spark.read.format("jsonl_docs").option("path", out).load()
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        F.countDistinct("source").alias("n_sources"),
    )


def q_fmt_pyds_snapshot_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL over the custom source's versioned commit log: write
    commit v1 (even doc_ids, overwrite) → append commit v2 (odd
    doc_ids) → read BOTH ``option("version", 1)`` and latest.  The v1
    snapshot must equal the even half exactly — appends add shards but
    never mutate them, so an old manifest's shard list IS the table as
    of that commit (the minimal form of a lake table's snapshot read,
    on the engine's own connector).  The oracle re-derives both
    snapshots from the parquet truth, so a snapshot that leaks
    post-commit rows (or loses pre-commit ones) hash-mismatches.

    Scale: a snapshot read costs ONE extra metadata file read on the
    driver; executors fan out over the listed shards exactly like the
    latest-version read."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_tt_{tag}_{os.getpid()}"
    )
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    (
        even.repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out)
        .mode("overwrite")
        .save()
    )
    (
        odd.repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out)
        .mode("append")
        .save()
    )

    def agg(df: DataFrame, snap: str) -> DataFrame:
        return df.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        ).select(F.lit(snap).alias("snapshot"), "*")

    at_v1 = (
        spark.read.format("jsonl_docs")
        .option("path", out)
        .option("version", 1)
        .load()
    )
    latest = spark.read.format("jsonl_docs").option("path", out).load()
    return agg(at_v1, "v1").unionByName(agg(latest, "latest"))


SQL_FMT_PYDS_SNAPSHOT_READ = """
SELECT 'v1' AS snapshot, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM documents WHERE doc_id % 2 = 0
GROUP BY lang
UNION ALL
SELECT 'latest' AS snapshot, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM documents
GROUP BY lang
"""


def q_fmt_pyds_time_travel_ts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TIMESTAMP AS OF on the mini-lake: every commit stamps wall-clock
    ns into its manifest (``_ts``), and ``option("as_of_ts", t)``
    resolves the newest commit at or before ``t`` — Delta's
    timestamp-based time travel beside the version pin
    (``fmt_pyds_snapshot_read``).  The fixture writes v1 (even
    doc_ids), captures a timestamp, appends v2 (odd) — the as-of-mid
    read must equal exactly the even half and the as-of-now read the
    full corpus; a resolution that rounds the wrong way (returning v2
    for the mid timestamp, or v1 for now) hash-mismatches the oracle.

    Scale: resolution is one metadata read per retained snapshot on
    the driver; executors fan out over the resolved manifest exactly
    like any pinned read."""
    import hashlib
    import time as _time

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_ts_{tag}_{os.getpid()}"
    )
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)
    (
        docs.filter(F.col("doc_id") % 2 == 0)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out).mode("overwrite").save()
    )
    _time.sleep(0.005)  # commit stamps are wall-clock ns: separate them
    t_mid = _time.time_ns()
    _time.sleep(0.005)
    (
        docs.filter(F.col("doc_id") % 2 == 1)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out)
        .option("base_version", 1)
        .mode("append")
        .save()
    )

    def agg(df: DataFrame, snap: str) -> DataFrame:
        return df.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        ).select(F.lit(snap).alias("snapshot"), "*")

    at_mid = (
        spark.read.format("jsonl_docs")
        .option("path", out)
        .option("as_of_ts", t_mid)
        .load()
    )
    at_now = (
        spark.read.format("jsonl_docs")
        .option("path", out)
        .option("as_of_ts", _time.time_ns())
        .load()
    )
    return agg(at_mid, "asof_mid").unionByName(agg(at_now, "asof_now"))


SQL_FMT_PYDS_TIME_TRAVEL_TS = """
SELECT 'asof_mid' AS snapshot, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM documents WHERE doc_id % 2 = 0
GROUP BY lang
UNION ALL
SELECT 'asof_now' AS snapshot, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM documents
GROUP BY lang
"""


def q_fmt_pyds_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC FROM SNAPSHOTS: the row-level delta between two manifest
    versions of the same table — read@v1 FULL OUTER JOIN read@v2 on the
    key, each row labeled added/removed/unchanged, rolled up per
    (status, lang).  This is how downstream consumers without a CDC
    feed derive one from a snapshotted table (the lake pattern); on
    this fixture v2 appends the odd half, so the oracle re-derives the
    exact delta from the parquet truth.

    Scale shape: both snapshot reads fan out over their manifest's
    shards; the diff is one equi-join on the key (sort-merge at 100 TB,
    broadcast at fixture scale) and one tiny-key rollup."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_sd_{tag}_{os.getpid()}"
    )
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)
    (
        docs.filter(F.col("doc_id") % 2 == 0)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out).mode("overwrite").save()
    )
    (
        docs.filter(F.col("doc_id") % 2 == 1)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out).mode("append").save()
    )
    v1 = (
        spark.read.format("jsonl_docs")
        .option("path", out).option("version", 1).load()
        .select("doc_id", F.col("lang").alias("lang_a"))
    )
    v2 = (
        spark.read.format("jsonl_docs")
        .option("path", out).option("version", 2).load()
        .select("doc_id", F.col("lang").alias("lang_b"))
    )
    status = (
        F.when(F.col("lang_a").isNull(), F.lit("added"))
        .when(F.col("lang_b").isNull(), F.lit("removed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        v1.join(v2, "doc_id", "full_outer")
        .select(
            status.alias("status"),
            F.coalesce(F.col("lang_b"), F.col("lang_a")).alias("lang"),
        )
        .groupBy("status", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


SQL_FMT_PYDS_SNAPSHOT_DIFF = """
SELECT CASE WHEN doc_id % 2 = 1 THEN 'added' ELSE 'unchanged' END AS status,
       lang,
       COUNT(*) AS n_docs
FROM documents
GROUP BY 1, 2
"""


def compact_jsonl_dir(
    spark: SparkSession,
    path: str,
    target_shards: int,
    cluster_by: str | None = None,
) -> int:
    """SMALL-FILE COMPACTION with snapshot semantics — the lake
    maintenance job: read the current manifest's shards, rewrite the
    same rows as ``target_shards`` consolidated files, and commit a new
    manifest version listing ONLY the new files.  Old shards stay on
    disk untouched, so earlier ``option("version", N)`` snapshot reads
    keep working until :func:`vacuum_jsonl_dir` reclaims them — exactly
    a table format's rewrite commit.  Returns the new version number.

    Scale shape: the rewrite is one distributed read + repartition +
    the transactional executor-side writer; the driver touches only
    manifest metadata.

    Transactionality: the whole rewrite is PINNED to one base snapshot
    — the read serves ``option("version", base)`` and the commit claims
    exactly ``base + 1`` create-if-absent — so compaction is
    correct-or-conflict under concurrent writers (Delta's OPTIMIZE
    conflict rule): a successful compaction's content is provably the
    state at ``version - 1``, and ANY commit landing in between makes
    it roll back the rewrite and raise ``ManifestCommitConflict`` for
    the caller to re-plan.  :func:`vacuum_jsonl_dir` still requires an
    EXCLUSIVE maintainer (it physically deletes unreferenced files and
    could sweep a concurrent writer's staged-but-unclaimed shards).
    Concurrent READERS are always safe:
    staged shards enter the live dir under ``_``-prefixed temp names
    (invisible to both the manifest-preferring reader and the
    listing/append-seed fallback), the final renames expose only
    fresh UUID names no old manifest references, and the manifest
    pointer itself flips last via the atomic rename-commit — so a
    crash at ANY step leaves the previous version fully intact (at
    worst orphan files a later vacuum sweeps)."""
    import json as _json
    import uuid as _uuid

    register_pyds(spark)
    # pin the WHOLE rewrite to one base snapshot: resolving the version
    # here and claiming exactly base+1 below makes a successful
    # compaction linearizable (its content is provably the state at
    # base = version-1).  The previous shape — unpinned read, then
    # version = latest+1 computed AFTER the rewrite — had a lost-update
    # hole: an append landing between the read and the claim got its
    # rows silently dropped by a rewrite that never saw them yet
    # claimed a LATER version.
    base = _latest_manifest_version(path)
    before = spark.read.format("jsonl_docs").option("path", path)
    if base > 0:
        before = before.option("version", base)
    # base == 0 means a manifest-less legacy directory: there is no
    # _MANIFEST.v0 snapshot to pin, so serve the listing fallback
    # unpinned (its content is the directory's files) and claim v1 —
    # the path that first promotes a plain JSONL directory into the
    # manifest protocol.  Pinning option("version", 0) here would
    # raise "no snapshot _MANIFEST.v0" and regress legacy compaction.
    before = before.load()
    # stage through the custom writer into a sibling dir, then move the
    # compacted shards in and commit a manifest naming only them — the
    # writer's append mode would UNION with the old manifest, which is
    # exactly wrong for a rewrite.  UUID stage dir: two concurrent
    # compactions must not clobber each other's staging (their claims
    # serialize below; their staging must too — same rule as merge).
    stage = path + f".compact-{_uuid.uuid4().hex[:8]}"
    # ``cluster_by``: the OPTIMIZE-with-clustering form — the rewrite
    # range-partitions on the column instead of round-robin, so each
    # consolidated shard owns a contiguous value range and the writer's
    # _STATS zonemap becomes selective again (appends scatter ranges
    # across shards; compaction is where a lake restores data-skipping,
    # the same job Delta's OPTIMIZE ZORDER runs).  Content-neutral
    # either way: the commit is the same rewrite commit.
    staged_df = (
        before.repartitionByRange(target_shards, cluster_by)
        if cluster_by
        else before.repartition(target_shards)
    )
    (
        staged_df
        .write.format("jsonl_docs")
        .option("path", stage)
        .mode("overwrite")
        .save()
    )
    with open(os.path.join(stage, "_MANIFEST")) as fh:
        # shard files only — the stage commit's own reserved keys
        # (_ts) must not be treated as files to move
        new_manifest = {
            f: v
            for f, v in _json.load(fh).items()
            if not f.startswith("_")
        }
    # two-step move: every staged shard first lands in the live dir
    # under an underscore temp name (crash here → only invisible
    # temps), then the batch of renames to final names (fresh UUIDs —
    # unreferenced by any committed manifest, so still invisible),
    # and only then does metadata flip
    for f in new_manifest:
        os.replace(
            os.path.join(stage, f),
            os.path.join(path, "_tmp-compact-" + f),
        )
    for f in new_manifest:
        os.replace(
            os.path.join(path, "_tmp-compact-" + f),
            os.path.join(path, f),
        )
    # carry the consolidated shards' zonemaps over (old entries stay —
    # harmless for vacuumed files, still valid for snapshot reads)
    stats_path = os.path.join(path, "_STATS")
    stats = {}
    if os.path.exists(stats_path):
        with open(stats_path) as fh:
            stats = _json.load(fh)
    stage_stats = os.path.join(stage, "_STATS")
    if os.path.exists(stage_stats):
        with open(stage_stats) as fh:
            stats.update(_json.load(fh))
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    version = base + 1
    # metadata last, each an atomic rename-commit, live pointer very
    # last: rewrite marker → snapshot → stats → _MANIFEST.  The marker
    # (``.rewrite`` sidecar) declares this commit dataChange=false so
    # the version stream reader SKIPS it — compaction rewrites rows,
    # it never adds any.  The marker body is the md5 of the snapshot
    # it marks: written first so a reader can never observe the
    # snapshot without the marker, and TETHERED so a crash between the
    # two leaves a marker that matches nothing — the next data commit
    # claiming the same version number streams as data instead of
    # being silently reclassified as a rewrite
    # (``_rewrite_marker_valid``).
    import hashlib as _hashlib
    import time as _time

    # a rewrite is content-neutral INCLUDING the table's metadata
    # contract: carry the pre-compaction commit's _schema (the
    # rewritten shards hold every evolved column — the read above
    # served the latest shape), its _constraints (a compaction must
    # not silently unharden the table), and the stream sink's _txn
    # idempotence marker (losing it would let a retried micro-batch
    # recommit AFTER a compaction — duplicate rows).  The tombstone
    # ledger and the _cdc map are deliberately NOT carried: the
    # rewrite applied the deletes physically, and CDC files belong to
    # the versions that made them.
    pre_m = _manifest_at(path, version - 1)
    for carry in (SCHEMA_KEY, CONSTRAINT_KEY, TXN_KEY):
        if carry in pre_m:
            new_manifest[carry] = pre_m[carry]
    new_manifest[OP_KEY] = "compact"
    new_manifest["_ts"] = _time.time_ns()
    body = _json.dumps(new_manifest)

    def _rollback_shards() -> None:
        winner_files: set[str] = set()
        try:
            with open(os.path.join(path, f"_MANIFEST.v{version}")) as fh:
                winner_files = set(_json.load(fh))
        except (OSError, ValueError):
            pass
        for f in new_manifest:
            if f not in winner_files:
                try:
                    os.remove(os.path.join(path, f))
                except OSError:
                    pass

    # the marker is claimed CREATE-IF-ABSENT too: with plain overwrite,
    # two compactions racing the same version clobber each other's
    # marker md5, and the loser's sweep below would delete the WINNER's
    # valid marker — either way the winner's rewrite commit gets
    # misclassified as a data commit and the version stream re-delivers
    # every compacted row.  An existing marker means another compactor
    # is mid-claim for this version: conflict out now.
    try:
        _write_atomic_excl(
            os.path.join(path, f"_MANIFEST.v{version}.rewrite"),
            _hashlib.md5(body.encode()).hexdigest(),
        )
    except FileExistsError:
        _rollback_shards()
        raise ManifestCommitConflict(
            f"concurrent commit: _MANIFEST.v{version}.rewrite is already "
            "claimed by another compaction; the rewrite was rolled back"
        ) from None
    # the snapshot itself is claimed CREATE-IF-ABSENT like every data
    # commit — _write_atomic here would silently overwrite a concurrent
    # writer's committed snapshot, breaking manifest immutability (and
    # with it deterministic checkpointed stream replay).  On a lost
    # claim the compacted files are rolled back (they are in no
    # committed manifest) minus anything the winner references.
    try:
        _write_atomic_excl(os.path.join(path, f"_MANIFEST.v{version}"), body)
    except FileExistsError:
        _rollback_shards()
        # the marker is OURS (claimed excl above) and can only
        # reclassify the winner's data commit if left behind — sweep it
        try:
            os.remove(os.path.join(path, f"_MANIFEST.v{version}.rewrite"))
        except OSError:
            pass
        raise ManifestCommitConflict(
            f"concurrent commit: _MANIFEST.v{version} was claimed by "
            "another writer during compaction; the rewrite was rolled "
            "back — re-plan against the new table state"
        ) from None
    if _latest_manifest_version(path) == version:
        _write_atomic(stats_path, _json.dumps(stats))
        _write_atomic(os.path.join(path, "_MANIFEST"), body)
    return version


def vacuum_jsonl_dir(
    path: str, keep_versions: int = 1, stale_grace_s: float = 600.0
) -> int:
    """Reclaim shards unreachable from the newest ``keep_versions``
    manifests and drop the older manifest files — the GC half of the
    snapshot contract (time travel works until vacuum, then fails
    LOUDLY rather than serving partial data).  Also sweeps ``_tmp-``
    orphans left by a crashed compaction or write job.

    ``stale_grace_s`` makes vacuum SAFE BESIDE LIVE WRITERS (Delta's
    file-retention check): an unreferenced file younger than the
    grace window is presumed to be a concurrent writer's
    staged-but-unclaimed work (data shards get their final names
    BEFORE the manifest claim; delete-key shards likewise) and is
    left alone — only files that have sat unreferenced past the
    window are true orphans from crashed jobs.  Size it above the
    worst stage-to-claim latency (the default 600 s is generous; a
    claim follows its staging within seconds).  ``stale_grace_s=0``
    restores the old exclusive-maintainer behavior: reclaim
    everything unreferenced, only safe with no writer in flight.
    Manifest snapshots need no grace — they are atomic
    create-if-absent commits, never staged.  Returns the number of
    shard files deleted."""
    import json as _json
    import time as _time

    now = _time.time()

    def _stale(f: str) -> bool:
        if stale_grace_s <= 0:
            return True
        try:
            return now - os.path.getmtime(os.path.join(path, f)) >= (
                stale_grace_s
            )
        except OSError:
            return False  # raced with its own cleanup — leave it

    versions = sorted(
        int(f.rsplit(".v", 1)[1])
        for f in os.listdir(path)
        if f.startswith("_MANIFEST.v") and f.rsplit(".v", 1)[1].isdigit()
    )
    if not versions:
        return 0
    keep = set(versions[-max(1, keep_versions):])
    #: manifests are removed by AGE CUTOFF, never by keep-set
    #: membership: a commit landing between vacuum's version listing
    #: and its removal pass is NEWER than everything listed and absent
    #: from the stale keep set — membership-based removal would delete
    #: that just-committed snapshot (observed in the threaded stress:
    #: a delete's fresh v2 vanished and the next delete re-claimed v2,
    #: breaking manifest immutability).  Only versions strictly OLDER
    #: than the oldest kept one are reclaimable.
    cutoff = min(keep)
    live: set[str] = set()
    for v in keep:
        try:
            with open(os.path.join(path, f"_MANIFEST.v{v}")) as fh:
                m = _json.load(fh)
        except OSError:
            continue  # raced a concurrent vacuum's removal pass
        live.update(_manifest_files(m))
        # tombstone entries' delete files stay reachable while any
        # retained manifest references them (a merge's entry names its
        # own data shards — already live; a delete's names _delete-*
        # key shards, reclaimed below once no kept ledger needs them)
        for e in _tombstones_of(m)["entries"]:
            live.update(e.get("files", ()))
        # commit-time CDC files stay reachable while any retained
        # manifest carries their version in its _cdc map
        for fl in m.get(CDC_KEY, {}).values():
            live.update(fl)
    removed = 0

    def _rm(f: str) -> bool:
        # two vacuums racing the same orphan must not crash the loser
        try:
            os.remove(os.path.join(path, f))
            return True
        except OSError:
            return False

    for f in os.listdir(path):
        if f.startswith(("_delete-", "_cdc-")):
            if f not in live and _stale(f):
                _rm(f)
        elif f.startswith("_MANIFEST.v"):
            # manifests need no grace (atomic create-if-absent commits,
            # never half-staged) but DO need the age cutoff — see the
            # comment at `cutoff` above
            v = f.rsplit(".v", 1)[1]
            if v.isdigit() and int(v) < cutoff:
                _rm(f)
            elif v.endswith(".rewrite"):
                # dataChange=false sidecar: lives and dies with its
                # snapshot version
                vn = v[: -len(".rewrite")]
                if vn.isdigit() and int(vn) < cutoff:
                    _rm(f)
        elif f.startswith("_tmp-"):
            # orphan from a crashed compaction/write — never visible
            # to readers; the grace window keeps a LIVE job's staging
            # safe
            if _stale(f):
                _rm(f)
        elif (
            f.endswith((".json", ".jsonl"))
            and not f.startswith((".", "_"))
            and f not in live
            and _stale(f)
        ):
            if _rm(f):
                removed += 1
    return removed


#: reserved manifest key: absolute path of the SOURCE table a shallow
#: clone references — file names missing from the clone's own dir
#: resolve there (Delta SHALLOW CLONE: metadata copied, data shared).
#: Carried forward by the '_'-key copy loops; dropped by compaction's
#: fresh manifest, which is exactly when the clone materializes.
BASE_DIR_KEY = "_base_dir"


def _shard_path(table_dir: str, manifest: dict | None, name: str) -> str:
    """Resolve a manifest file name to its physical path: the table's
    own dir, falling back to the shallow-clone base dir for names the
    clone never localized (immutable source shards)."""
    local = os.path.join(table_dir, name)
    base = (manifest or {}).get(BASE_DIR_KEY)
    if base and not os.path.exists(local):
        return os.path.join(base, name)
    return local


def clone_jsonl_dir(
    src: str, dst: str, version: int | None = None
) -> int:
    """SHALLOW CLONE — Delta's ``CREATE TABLE ... SHALLOW CLONE``:
    materialize a NEW table at ``dst`` whose v1 manifest references
    the SOURCE's immutable shards by name (resolved through
    ``_base_dir`` at read time — zero data copied), with the source
    snapshot's schema, constraints, zonemap stats, and tombstone
    ledger.  The clone's history starts fresh: writes/DML/compaction
    on the clone land in the clone's dir and never touch the source
    (divergence is the point — dev/test branching); a compaction
    materializes the clone fully local and drops the base-dir link.

    Ledger version stamps are NORMALIZED into the open interval (0, 1)
    by an order-preserving map: copied entries keep applying to
    exactly the copied shards they applied to in the source (strict
    ``v > added`` inequalities survive any injective order-preserving
    map); shards absent from the added-map keep their default 0, which
    stays BELOW every copied entry; and every FUTURE clone commit
    (integer version ≥ 2) sits ABOVE them all — so copied entries
    never touch post-clone shards and post-clone entries apply to all
    copied shards: the sequence-number contract holds across the
    graft.  Vacuum on the clone only ever
    deletes files physically present in the clone's dir, so shared
    source shards are structurally out of reach.  Returns 1."""
    import json as _json
    import time as _time

    base_v = (
        version
        if version is not None
        else _latest_manifest_version(src)
    )
    if base_v <= 0:
        raise ValueError(
            f"clone_jsonl_dir: no committed version under {src}"
        )
    src_m = _manifest_at(src, base_v)
    if os.path.exists(os.path.join(dst, "_MANIFEST.v1")):
        raise ValueError(f"clone_jsonl_dir: {dst} already has a table")
    os.makedirs(dst, exist_ok=True)
    new_manifest: dict = {f: src_m[f] for f in _manifest_files(src_m)}
    for carry in (SCHEMA_KEY, CONSTRAINT_KEY):
        if carry in src_m:
            new_manifest[carry] = src_m[carry]
    # the source itself may be a clone: chain to ITS base for any name
    # it never localized?  No — resolve one level only, flattening the
    # chain: names present in the source dir point there, the rest to
    # the source's own base
    src_base = src_m.get(BASE_DIR_KEY)
    new_manifest[BASE_DIR_KEY] = os.path.abspath(src)
    if src_base:
        # flatten: every referenced name must resolve from ONE base;
        # a two-level chain would need per-file bases.  Refuse unless
        # the source localized everything (post-compaction clone).
        missing = [
            f
            for f in _manifest_files(src_m)
            if not os.path.exists(os.path.join(src, f))
        ]
        if missing:
            raise ValueError(
                "clone_jsonl_dir: the source is itself a shallow "
                f"clone still sharing files (e.g. {missing[0]!r}) — "
                "compact the source first to materialize it"
            )
    tombs = _tombstones_of(src_m)
    if tombs["entries"]:
        stamps = sorted(
            {e["v"] for e in tombs["entries"]}
            | set(tombs.get("added", {}).values())
        )
        remap = {
            old: (i + 1) / (len(stamps) + 1)
            for i, old in enumerate(stamps)
        }
        new_manifest[TOMBSTONE_KEY] = {
            "entries": [
                {**e, "v": remap[e["v"]]} for e in tombs["entries"]
            ],
            "added": {
                f: remap[v] for f, v in tombs.get("added", {}).items()
            },
        }
        # the entries' delete-key FILES also resolve via the base dir
    new_manifest[OP_KEY] = "clone"
    new_manifest["_ts"] = _time.time_ns()
    body = _json.dumps(new_manifest)
    try:
        _write_atomic_excl(os.path.join(dst, "_MANIFEST.v1"), body)
    except FileExistsError:
        raise ManifestCommitConflict(
            f"concurrent commit: _MANIFEST.v1 of {dst} was claimed by "
            "another writer during clone"
        ) from None
    # copy the zonemap sidecar: entries are keyed by immutable shard
    # name, so they stay valid for the shared files
    spath = os.path.join(src, "_STATS")
    if os.path.exists(spath):
        with open(spath) as fh:
            _write_atomic(os.path.join(dst, "_STATS"), fh.read())
    if _latest_manifest_version(dst) == 1:
        _write_atomic(os.path.join(dst, "_MANIFEST"), body)
    return 1


def restore_jsonl_dir(
    path: str, to_version: int, base_version: int | None = None
) -> int:
    """RESTORE — Delta's ``RESTORE TABLE ... TO VERSION AS OF``: roll
    the table back to ``to_version``'s exact state as a NEW commit (a
    pure-metadata copy of that snapshot's manifest — shard list,
    ledger, schema, constraints), claimed through the same
    create-if-absent OCC gate.  History is preserved: the undone
    commits stay time-travelable until vacuum.  Fails loudly when the
    target snapshot is vacuumed or any file it references (data shards
    OR its ledger's delete files) has been reclaimed — a partial
    restore must never commit.  Version streams CANNOT ride through a
    restore (rows it un-deletes were never retracted downstream): the
    version stream raises on any unmarked ledger-shrinking commit and
    the subscriber restarts from a fresh snapshot, the same guidance
    Delta gives.  Returns the new version."""
    import json as _json
    import time as _time

    try:
        target = _manifest_at(path, to_version)
    except OSError:
        raise ValueError(
            f"restore_jsonl_dir: version {to_version} of {path} is "
            "vacuumed — its snapshot no longer exists"
        ) from None
    needed = list(_manifest_files(target))
    for e in _tombstones_of(target)["entries"]:
        needed.extend(e.get("files", ()))
    missing = [
        f
        for f in needed
        if not os.path.exists(_shard_path(path, target, f))
    ]
    if missing:
        raise ValueError(
            f"restore_jsonl_dir: version {to_version} references "
            f"reclaimed files (e.g. {missing[0]!r}) — a partial "
            "restore must never commit"
        )
    base = (
        base_version
        if base_version is not None
        else _latest_manifest_version(path)
    )
    version = base + 1
    new_manifest = dict(target)
    # the stream sink's idempotence marker tracks the LIVE commit
    # chain, not the restored-to snapshot: carry the base's _txn so a
    # retried micro-batch still no-ops after the restore
    cur = _manifest_at(path, base)
    if TXN_KEY in cur:
        new_manifest[TXN_KEY] = cur[TXN_KEY]
    new_manifest[OP_KEY] = "restore"
    new_manifest["_ts"] = _time.time_ns()
    body = _json.dumps(new_manifest)
    try:
        _write_atomic_excl(
            os.path.join(path, f"_MANIFEST.v{version}"), body
        )
    except FileExistsError:
        raise ManifestCommitConflict(
            f"concurrent commit: _MANIFEST.v{version} was claimed by "
            f"another writer after this restore read version {base}; "
            "re-plan the restore against the new table state"
        ) from None
    if _latest_manifest_version(path) == version:
        _write_atomic(os.path.join(path, "_MANIFEST"), body)
    return version


def describe_history_jsonl_dir(
    spark: SparkSession, path: str
) -> DataFrame:
    """DESCRIBE HISTORY — one row per still-retained commit, from
    manifest metadata only (never a data scan, Delta's history
    surface): version, the operation that made it (:data:`OP_KEY`,
    recorded by every commit site), physical file/row counts (rows as
    WRITTEN — tombstoned rows still sit in their immutable shards
    until compaction, so this is the storage view, not the live
    count), ledger depth, and whether the commit carries CDC files.
    Driver-side metadata build: O(retained versions × files-per-
    manifest) — the same cost Delta's DESCRIBE HISTORY pays reading
    its log, fine at any table size."""
    rows = []
    latest = _latest_manifest_version(path)
    for v in range(_earliest_manifest_version(path), latest + 1):
        try:
            m = _manifest_at(path, v)
        except OSError:
            continue  # vacuumed
        files = _manifest_files(m)
        counts = [m[f] for f in files if isinstance(m.get(f), int)]
        rows.append(
            (
                v,
                m.get(OP_KEY, "unknown"),
                len(files),
                sum(counts) if len(counts) == len(files) else None,
                len(_tombstones_of(m)["entries"]),
                bool(m.get(CDC_KEY, {}).get(str(v))),
            )
        )
    return spark.createDataFrame(
        rows,
        "version bigint, op string, n_files bigint, n_rows bigint, "
        "ledger_entries bigint, has_cdc boolean",
    )


#: broadcast-hint gate for the CDF derivation joins — aligned with
#: Spark's default ``autoBroadcastJoinThreshold`` territory (10 MB
#: default, commonly raised; 32 MB of raw JSONL decodes well under
#: executor broadcast budgets).  Past this, AQE decides from runtime
#: stats instead of a hard-coded hint.
CDF_BROADCAST_MAX_BYTES = 32 * 1024 * 1024


def _files_bytes_under(
    path: str, manifest, files, limit: int
) -> bool:
    """True iff the commit files' total on-disk size is under
    ``limit`` — the driver-side, job-free size signal that gates CDF
    broadcast hints.  Missing files (vacuumed between listing and
    stat) count as over-limit: fail safe toward the shuffle join."""
    total = 0
    for f in files:
        try:
            total += os.path.getsize(_shard_path(path, manifest, f))
        except OSError:
            return False
        if total >= limit:
            return False
    return True


def _read_sidecar_df(
    spark: SparkSession, paths: list[str], ddl: str
) -> DataFrame:
    """Distributed read of underscore-prefixed sidecar JSONL files
    (``_delete-*`` key files, ``_cdc-*`` change files) with the given
    DDL.  ``spark.read.json`` cannot serve this: Spark's file index
    hard-filters underscore-prefixed paths as hidden even when named
    explicitly — and the sidecars are '_'-prefixed BY DESIGN
    (invisible to listing readers until manifest metadata references
    them).  So the file list is parallelized (one file per task — the
    same per-shard parallelism the scan-time tombstone application
    uses) and each task parses its file Arrow-batched via
    ``mapInPandas``; executors open the paths directly, the same
    shared-filesystem assumption the whole mini-lake makes."""
    # paren-aware name→type map — a naive ``ddl.split(', ')`` shears
    # parameterized types like ``decimal(10,2)`` and KeyErrors below
    typed = _typed_fields_of_ddl(ddl)
    fields = tuple(name for name, _ in typed)
    types = dict(typed)
    # typed-cell converters (decimal/timestamp/date/binary): the JSONL
    # form is a quoted string; Arrow needs the Python object form
    convs = {
        name: c
        for name, t in typed
        if (c := _cell_converter(t)) is not None
    }
    paths_df = spark.createDataFrame(
        [(p,) for p in paths], "p string"
    ).repartition(len(paths))

    def _parse(batches):
        import pandas as pd

        for b in batches:
            for p in b["p"]:
                rows = pd.read_json(
                    p, lines=True, dtype=False, convert_dates=False
                )
                out = {}
                for c in fields:
                    if len(rows) and c in rows.columns:
                        col = rows[c]
                        if types[c] == "bigint":
                            col = col.astype("Int64")
                        elif c in convs:
                            conv = convs[c]
                            col = col.map(conv, na_action="ignore")
                        out[c] = col
                    else:
                        out[c] = pd.Series(
                            [None] * len(rows),
                            dtype="Int64"
                            if types[c] == "bigint"
                            else "object",
                        )
                yield pd.DataFrame(out)

    return paths_df.mapInPandas(_parse, ddl)


def _read_key_files_df(
    spark: SparkSession, path: str, key_files: list[str], manifest=None
) -> DataFrame:
    """Tombstone key files as a distinct ``doc_id bigint`` DataFrame
    (see :func:`_read_sidecar_df`).  Works uniformly for a MERGE's key
    source too (its entry references its own staged data shards —
    full rows, of which only doc_id is projected)."""
    return _read_sidecar_df(
        spark,
        [_shard_path(path, manifest, f) for f in key_files],
        "doc_id bigint",
    ).distinct()


def table_changes_jsonl_dir(
    spark: SparkSession,
    path: str,
    starting_version: int,
    ending_version: int | None = None,
) -> DataFrame:
    """Batch CHANGE DATA FEED — Delta's ``table_changes(tbl, a, b)``:
    one DataFrame of every row-level change committed in
    ``(starting_version, ending_version]``, each row tagged
    ``_change_type`` ∈ {``insert``, ``update_preimage``,
    ``update_postimage``, ``delete``} and ``_commit_version``.  The
    version STREAM delivers post-state diffs; CDF is the batch twin a
    downstream sync/audit job wants: it reconstructs pre-images too,
    so a consumer can apply the feed transactionally or diff old vs
    new values.

    Derivation per data commit v (rewrite commits — valid ``.rewrite``
    marker — are dataChange=false and contribute nothing):

    - ``added(v)``   = shard files in manifest v but not v-1, read
      directly as JSONL with the commit's effective schema (no
      snapshot scan — the per-commit file set, exactly what
      Delta/Iceberg CDF readers cost).
    - ``keys(v)``    = the commit's tombstone-entry key files (a
      DELETE's ``_delete-*`` shards; a MERGE's entry references its
      own staged shards, whose rows ARE the source keys).
    - ``pre(v)``     = rows live at v-1 whose doc_id ∈ keys(v) — the
      pinned snapshot read joined to the key set (AQE broadcasts the
      small side).
    - classification: pre-row with a same-key row in added(v) →
      ``update_preimage`` (its replacement → ``update_postimage``);
      pre-row without → ``delete``; added row without a live pre-image
      → ``insert`` (covers plain appends AND a merge's brand-new keys,
      which the fast path tombstones but which had nothing to kill).

    Scale: the feed is a union of per-commit file reads + one
    broadcast-key join per DML commit — O(changed data), never
    O(table).  Schema evolution inside the range null-extends via
    ``unionByName(allowMissingColumns=True)``, same contract as the
    version stream's fresh-subscriber shape."""
    import json as _json

    register_pyds(spark)
    end = (
        ending_version
        if ending_version is not None
        else _latest_manifest_version(path)
    )
    if starting_version > end:
        raise ValueError(
            f"table_changes: starting_version {starting_version} > "
            f"ending_version {end}"
        )
    end_ddl = _manifest_at(path, end).get(SCHEMA_KEY, DOCS_DDL)
    out_ddl = end_ddl + ", _change_type string, _commit_version bigint"
    pieces: list[DataFrame] = []
    for v in range(starting_version + 1, end + 1):
        if _rewrite_marker_valid(path, v):
            continue  # compaction/OPTIMIZE: rewrites rows, changes none
        m_v = _manifest_at(path, v)
        # RESTORE guard (mirrors both stream readers): a restore can
        # un-delete rows purely in metadata (ledger shrinks, file set
        # unchanged — invisible to the added/keys derivation below) or
        # roll back an append (re-added shards would replay as
        # duplicate inserts with no retractions).  The batch feed is
        # documented as EXACT, so refuse rather than silently emit a
        # wrong feed — consumers restart their sync from a fresh
        # snapshot, Delta's own contract for non-additive history.
        if m_v.get(OP_KEY) == "restore":
            raise ValueError(
                f"table_changes: version {v} is a RESTORE commit; the "
                "change feed cannot represent a history rollback "
                "exactly — re-sync from a snapshot read at or after "
                f"version {v} and resume the feed from there"
            )
        # same hazard without the op stamp: any commit whose tombstone
        # ledger SHRANK versus its parent (and which is not a rewrite,
        # handled above) un-deleted rows in metadata
        if len(_tombstones_of(m_v)["entries"]) < len(
            _tombstones_of(_manifest_at(path, v - 1))["entries"]
        ):
            raise ValueError(
                f"table_changes: version {v} shrank the tombstone "
                "ledger without a rewrite marker (metadata un-delete); "
                "the exact change feed cannot represent it — re-sync "
                "from a snapshot read"
            )
        ddl = m_v.get(SCHEMA_KEY, DOCS_DDL)
        # commit-time CDC files (DML run with cdf=True) are EXACT and
        # cheaper than derivation — no snapshot join; serve them
        cdc_own = m_v.get(CDC_KEY, {}).get(str(v), [])
        if cdc_own:
            pieces.append(
                _read_sidecar_df(
                    spark,
                    [_shard_path(path, m_v, f) for f in cdc_own],
                    ddl + ", _change_type string",
                ).withColumn(
                    "_commit_version", F.lit(v).cast("bigint")
                )
            )
            continue
        m_prev = _manifest_at(path, v - 1)
        added_files = sorted(
            set(_manifest_files(m_v)) - set(_manifest_files(m_prev))
        )
        key_files: list[str] = []
        for e in _tombstones_of(m_v)["entries"]:
            if e.get("v") == v:
                key_files.extend(e.get("files", ()))
        if not added_files and not key_files:
            continue  # metadata-only commit (schema evolve, _txn, ...)
        added = (
            spark.read.schema(ddl).json(
                [_shard_path(path, m_v, f) for f in added_files]
            )
            if added_files
            else spark.createDataFrame([], ddl)
        )

        def tagged(df: DataFrame, change: str, v: int = v) -> DataFrame:
            return df.withColumn(
                "_change_type", F.lit(change)
            ).withColumn("_commit_version", F.lit(v).cast("bigint"))

        if key_files:
            keys = _read_key_files_df(spark, path, key_files, m_v)
            # SIZE-GATED broadcast: a commit's key set is usually
            # batch-sized, but a partition-wide GDPR DELETE at 100 TB
            # carries 10⁷–10⁹ keys — an unconditional broadcast hint
            # there is a driver/executor OOM.  Gate the hint on the
            # key files' on-disk byte size (the same signal Spark's
            # autoBroadcastJoinThreshold uses, known here without a
            # job); past the gate, plain equi-joins let AQE pick the
            # strategy from runtime stats.  The added-file set gates
            # the pre/post classification hints identically.
            keys_small = _files_bytes_under(
                path, m_v, key_files, CDF_BROADCAST_MAX_BYTES
            )
            added_small = _files_bytes_under(
                path, m_v, added_files, CDF_BROADCAST_MAX_BYTES
            )
            maybe_keys = F.broadcast(keys) if keys_small else keys
            pre = (
                spark.read.format("jsonl_docs")
                .option("path", path)
                .option("version", v - 1)
                .load()
                .join(maybe_keys, "doc_id", "inner")
            )
            pre_keys = pre.select("doc_id")
            post_keys = added.select("doc_id")
            if added_small:
                post_keys = F.broadcast(post_keys)
            if keys_small:
                pre_keys = F.broadcast(pre_keys)
            pieces.append(
                tagged(
                    pre.join(post_keys, "doc_id", "left_semi"),
                    "update_preimage",
                )
            )
            pieces.append(
                tagged(
                    pre.join(post_keys, "doc_id", "left_anti"),
                    "delete",
                )
            )
            pieces.append(
                tagged(
                    added.join(pre_keys, "doc_id", "left_semi"),
                    "update_postimage",
                )
            )
            pieces.append(
                tagged(
                    added.join(pre_keys, "doc_id", "left_anti"),
                    "insert",
                )
            )
        else:
            pieces.append(tagged(added, "insert"))
    if not pieces:
        return spark.createDataFrame([], out_ddl)
    feed = pieces[0]
    for p in pieces[1:]:
        feed = feed.unionByName(p, allowMissingColumns=True)
    # column order: table schema (the END shape) then the CDF tags
    return feed.select(
        *[F.col(c) for c in _fields_of_ddl(end_ddl)],
        "_change_type",
        "_commit_version",
    )


def q_fmt_pyds_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full lake maintenance cycle on the engine's own connector,
    value-checked end to end: write (v1, N_SHARDS files) → append (v2)
    → COMPACT to 2 files (v3, a rewrite commit — old snapshots still
    readable) → aggregate the compacted table.  Compaction must be
    content-neutral: the oracle is the plain full-corpus aggregate, so
    a rewrite that drops, duplicates, or mangles one row
    hash-mismatches.  Shard-count reduction and post-vacuum snapshot
    failure are pinned by pytest (vacuum is destructive, so the
    registered query stops at the compaction commit)."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_cp_{tag}_{os.getpid()}"
    )
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    (
        even.repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out).mode("overwrite").save()
    )
    (
        odd.repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out).mode("append").save()
    )
    compact_jsonl_dir(spark, out, target_shards=2)
    back = spark.read.format("jsonl_docs").option("path", out).load()
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


SQL_FMT_PYDS_COMPACTION = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM documents
GROUP BY lang
"""


def q_streaming_pyds_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same per-lang aggregate computed INCREMENTALLY through the
    custom source's stream reader (availableNow drain): offsets step
    through the shard files, executors read only the new ones per
    microbatch.  Complete-mode memory sink is legitimate here — the
    output is the result-sized 5-row aggregate, not the corpus (the
    production corpus-sized drain is ``streaming_hourly_file_sink``)."""

    shard_dir = _jsonl_shard_dir(spark, sf_dir)
    register_pyds(spark)
    stream = (
        spark.readStream.format("jsonl_docs").option("path", shard_dir).load()
    )
    # no countDistinct: distinct aggregation is unsupported on streams
    agg = stream.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )
    from pu4spark_spark.streaming.drain import drain_to_memory

    return drain_to_memory(spark, agg, "pyds_docs_stream", "complete")


def q_streaming_pyds_lake_sink(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LANDING STREAM → LAKE SINK, value-checked end to end: the
    custom source's stream reader drains the JSONL landing shards and
    the custom STREAM WRITER commits each micro-batch into a mini-lake
    directory through the OCC manifest claim — then a second
    availableNow drain of the same checkpoint must commit NOTHING new
    (offsets already consumed; a duplicated batch would double every
    count), and the batch read of the lake must equal the documents
    truth.  This closes the connector matrix: batch read/write,
    stream read (listing + versioned), and now stream write, all over
    one commit log — so the lake a streaming job populates is the
    same lake batch jobs append to, time travel reads, and downstream
    versioned streams tail.  Retried-batch idempotence (the _txn
    no-op) and the downstream tail are pinned in pytest."""
    import hashlib
    import shutil

    shard_dir = _jsonl_shard_dir(spark, sf_dir)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    lake = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_sink_{tag}_{os.getpid()}"
    )
    ckpt = os.path.join(lake, "_ckpt")
    shutil.rmtree(lake, ignore_errors=True)
    register_pyds(spark)
    from pu4spark_spark.streaming.drain import drain_partitions

    def drain() -> None:
        with drain_partitions(spark, 8):
            q = (
                spark.readStream.format("jsonl_docs")
                .option("path", shard_dir)
                .load()
                .writeStream.format("jsonl_docs")
                .option("path", lake)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            q.stop()

    drain()
    v1 = _latest_manifest_version(lake)
    drain()  # nothing new landed: must commit no further version
    if _latest_manifest_version(lake) != v1:
        raise AssertionError(
            "lake sink re-committed an already-consumed batch"
        )
    back = spark.read.format("jsonl_docs").option("path", lake).load()
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


def _versioned_lang_drain(
    spark: SparkSession, out: str, ckpt: str, name: str
) -> None:
    """One availableNow drain of the VERSIONED stream over ``out`` into
    the complete-mode memory sink ``name``, resuming from ``ckpt`` —
    the shared microbatch step of the snapshot-stream queries (same
    per-lang aggregate, so all hash against the same batch truth)."""
    _versioned_lang_drain_opts(spark, out, ckpt, name)


def q_streaming_pyds_snapshot(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAM-FROM-TABLE under concurrent append, value-checked: the
    versioned stream reader drains commit v1 (even docs), a writer
    appends v2 (odd docs) while the stream is down, an ORPHAN shard
    with poison rows lands in the directory OUTSIDE any manifest (what
    a conflicted/crashed commit leaves behind), and the checkpointed
    stream resumes — its second microbatch must read exactly v2's
    shards: the final complete-mode aggregate equals the batch truth
    over ALL documents, and any poison leak (a listing-based source
    would read the orphan) breaks the hash.

    At 100 TB this is the table-as-a-feed shape: downstream consumers
    tail the commit log at version granularity, paying per-batch work
    sized by the new commit only, immune to in-flight and aborted
    writer debris."""
    import hashlib
    import json as _json
    import shutil
    import uuid as _uuid

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_ss_{tag}_{os.getpid()}"
    )
    ckpt = os.path.join(out, "_ckpt")  # _-prefixed: invisible to readers
    shutil.rmtree(out, ignore_errors=True)
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)
    (
        docs.filter(F.col("doc_id") % 2 == 0)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out)
        .mode("overwrite")
        .save()
    )

    name = f"pyds_snapshot_{_uuid.uuid4().hex[:8]}"
    _versioned_lang_drain(spark, out, ckpt, name)  # consumes v1
    (
        docs.filter(F.col("doc_id") % 2 == 1)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out)
        .option("base_version", 1)
        .mode("append")
        .save()
    )
    # orphan debris: a visible-named shard in NO committed manifest —
    # poison lang so any leak into the aggregate hash-mismatches
    with open(os.path.join(out, "part-99999-orphan00.jsonl"), "w") as fh:
        fh.write(
            _json.dumps(
                {
                    "doc_id": 10_000_001,
                    "text": "poison",
                    "lang": "xx",
                    "source": "orphan",
                    "n_chars": 6,
                }
            )
            + "\n"
        )
    # resumes at version offset 1, reads exactly v2
    _versioned_lang_drain(spark, out, ckpt, name)
    return spark.table(name)


def q_streaming_pyds_compaction_skip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAM × COMPACTION interplay — the lake-semantics trap this
    round's ``.rewrite`` sidecar closes: a compaction commit rewrites
    every live row into fresh consolidated shards; a version-offset
    stream that treated it as a data commit would re-deliver the whole
    table (every compacted row twice).  Sequence: drain v1 (even docs),
    append v2 (odd docs), COMPACT (v3, dataChange=false), drain again —
    the second drain must pick up exactly v2's original shards and skip
    v3 entirely.  The complete-mode aggregate hash-matches the batch
    truth over all documents; any double-delivery doubles every count.

    This is Delta's ``dataChange=false`` / Iceberg's rewrite-commit
    contract on the engine's own connector — without it, OPTIMIZE and
    downstream streams cannot coexist, which at 100 TB they must."""
    import hashlib
    import shutil
    import uuid as _uuid

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_cs_{tag}_{os.getpid()}"
    )
    ckpt = os.path.join(out, "_ckpt")
    shutil.rmtree(out, ignore_errors=True)
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)

    name = f"pyds_compact_skip_{_uuid.uuid4().hex[:8]}"
    (
        docs.filter(F.col("doc_id") % 2 == 0)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out)
        .mode("overwrite")
        .save()
    )
    _versioned_lang_drain(spark, out, ckpt, name)  # consumes v1
    (
        docs.filter(F.col("doc_id") % 2 == 1)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out)
        .option("base_version", 2 - 1)
        .mode("append")
        .save()
    )
    v = compact_jsonl_dir(spark, out, target_shards=2)  # v3, rewrite
    if v != 3:
        raise AssertionError(f"compaction committed v{v}, expected v3")
    # must read exactly v2's shards, skip the rewrite
    _versioned_lang_drain(spark, out, ckpt, name)
    return spark.table(name)


#: doc_id cut for the pruning demo — constant across sfs so the oracle
#: is one fixed predicate
PRUNE_THRESHOLD = 250


def q_fmt_pyds_stats_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA SKIPPING on the custom source: documents written
    range-clustered on ``doc_id`` (so each shard owns a contiguous id
    range and the writer's ``_STATS`` zonemap is selective), then read
    back with ``doc_id >= {PRUNE_THRESHOLD}`` — Catalyst pushes the
    comparison into the Python reader's ``pushFilters``, which folds
    it into an interval and SKIPS whole shards whose [min, max] can't
    intersect (parquet row-group stats / Iceberg manifest pruning, on
    the engine's own connector).  Every filter is also re-applied by
    Spark, so pruning is purely an I/O saving; correctness comes from
    the oracle on the parquet truth, and the shard-skip itself is
    pinned in pytest by driving the reader directly.

    The write clusters by RANGE deliberately: the hash-sharded layout
    the other pyds queries use spreads every id range over all shards,
    and a zonemap over hash shards prunes nothing — the same layout
    choice zordering makes for parquet."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_zm_{tag}_{os.getpid()}"
    )
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)
    (
        docs.repartitionByRange(N_SHARDS * 2, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out)
        .mode("overwrite")
        .save()
    )
    back = (
        spark.read.format("jsonl_docs")
        .option("path", out)
        .load()
        .filter(F.col("doc_id") >= PRUNE_THRESHOLD)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


SQL_FMT_PYDS_STATS_PRUNING = f"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM documents
WHERE doc_id >= {PRUNE_THRESHOLD}
GROUP BY lang
"""


def q_fmt_pyds_compaction_cluster(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """OPTIMIZE-WITH-CLUSTERING, value-checked content-neutral: the
    same write→append→compact cycle as ``fmt_pyds_compaction`` but the
    rewrite range-partitions on ``doc_id`` (``cluster_by``), restoring
    a selective ``_STATS`` zonemap after hash-scattered appends
    destroyed it — Delta's OPTIMIZE ZORDER job on the engine's own
    connector.  The oracle is the plain full-corpus aggregate, so a
    clustering rewrite that drops, duplicates, or mangles one row
    hash-mismatches; the pruning gain itself is pinned in pytest
    (``test_clustered_compaction_restores_zonemap_pruning``)."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_cz_{tag}_{os.getpid()}"
    )
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)
    (
        docs.filter(F.col("doc_id") % 2 == 0)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out).mode("overwrite").save()
    )
    (
        docs.filter(F.col("doc_id") % 2 == 1)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out)
        .option("base_version", 1)
        .mode("append")
        .save()
    )
    compact_jsonl_dir(spark, out, target_shards=2, cluster_by="doc_id")
    back = (
        spark.read.format("jsonl_docs")
        .option("path", out)
        .load()
        # the interval read that the restored zonemap serves shard-
        # skippingly (pushdown is an I/O saving — results identical)
        .filter(F.col("doc_id") >= PRUNE_THRESHOLD)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


SQL_FMT_PYDS_COMPACTION_CLUSTER = f"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM documents
WHERE doc_id >= {PRUNE_THRESHOLD}
GROUP BY lang
"""

def q_fmt_pyds_commit_conflict(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """OPTIMISTIC-CONCURRENCY WITNESS on the mini-lake: two appenders
    both plan against table version 1 (``option("base_version", 1)``)
    and race to commit version 2.  Exactly one wins the atomic
    create-if-absent claim on ``_MANIFEST.v2``; the loser raises
    ``ManifestCommitConflict`` and its shards are rolled back — never a
    silent shard-list merge (the first failure mode a real
    parallel-ingest user hits on a table without commit semantics).

    The loser here appends POISON rows (shifted doc_ids, lang
    ``'xx'``) — if any of them leaked into the committed table, the
    read@latest aggregate below would grow an extra lang group and
    hash-mismatch the oracle, which is built from the winner's content
    only (base even half + winner's odd half = the full documents
    table).

    Scale: conflict detection costs ONE link(2) syscall at commit time
    regardless of table size; losers retry against the new version with
    only their own shards re-staged (shards are task-side, the claim is
    driver-side)."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_cc_{tag}_{os.getpid()}"
    )
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    (
        even.repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out)
        .mode("overwrite")
        .save()
    )
    # writer A: planned against v1, commits v2 — the winner
    (
        odd.repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out)
        .option("base_version", 1)
        .mode("append")
        .save()
    )
    # writer B: ALSO planned against v1 (stale — A already took v2).
    # Its claim of _MANIFEST.v2 must lose and surface the conflict
    # loudly through the job; the poison rows must be rolled back.
    poison = odd.limit(100).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        "text",
        F.lit("xx").alias("lang"),
        "source",
        "n_chars",
    )
    conflicted = False
    try:
        (
            poison.repartition(1)
            .write.format("jsonl_docs")
            .option("path", out)
            .option("base_version", 1)
            .mode("append")
            .save()
        )
    except Exception as exc:  # Py4J wraps ManifestCommitConflict
        if not _is_commit_conflict(exc):
            raise
        conflicted = True
    if not conflicted:
        raise AssertionError(
            "stale base_version commit succeeded — optimistic "
            "concurrency is broken"
        )
    back = spark.read.format("jsonl_docs").option("path", out).load()
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


SQL_FMT_PYDS_COMMIT_CONFLICT = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM documents
GROUP BY lang
"""


def append_with_retry(
    df: DataFrame, path: str, max_retries: int = 3
) -> int:
    """The OTHER half of optimistic concurrency — what a loser DOES:
    re-read the table's latest committed version, re-declare it as
    ``base_version``, and re-submit the same rows (shards are re-staged;
    the data is unchanged, only the claim moves).  Exactly the
    Iceberg/Delta commit-retry loop.  Returns the version that finally
    committed; raises the last ``ManifestCommitConflict`` (wrapped by
    Spark) if ``max_retries`` consecutive claims lose — a pathologically
    hot table should fail loudly, not spin.

    Retry cost model at 100 TB: each attempt re-runs the WRITE job
    (tasks re-stage shards) but conflict detection itself is one
    link(2) — so the loop is sized by contention, never by table size;
    real deployments keep contention low by partitioning writers."""
    last: Exception | None = None
    for _ in range(max_retries):
        base = _latest_manifest_version(path)
        try:
            (
                df.write.format("jsonl_docs")
                .option("path", path)
                .option("base_version", base)
                .mode("append")
                .save()
            )
            return base + 1
        except Exception as exc:  # Spark wraps ManifestCommitConflict
            if not _is_commit_conflict(exc):
                raise
            last = exc
    assert last is not None
    raise last


def _stage_sidecar_shards(
    df: DataFrame, path: str, token: str, prefix: str
) -> tuple[list[str], int]:
    """Write ``df`` as ``_{prefix}-{token}-*`` sidecar shards in the
    table dir via a DISTRIBUTED job (the transactional writer into a
    sibling stage dir, then renamed in) — the driver never
    materializes a row, only file names + row counts.  The files are
    invisible until manifest metadata references them: '_'-prefixed
    (skipped by listing readers) and named by no committed manifest.
    Returns ``(names, total_rows)``; empty task shards are dropped.
    Used for DELETE key files (``_delete-``) and commit-time change-
    data-feed files (``_cdc-``)."""
    import json as _json
    import shutil

    register_pyds(df.sparkSession)
    stage = path + f".{prefix}-stage-{token}"
    (
        df.write.format("jsonl_docs")
        .option("path", stage)
        .mode("overwrite")
        .save()
    )
    with open(os.path.join(stage, "_MANIFEST")) as fh:
        staged = {
            f: r
            for f, r in _json.load(fh).items()
            if not f.startswith("_")
        }
    names: list[str] = []
    n_rows = 0
    for i, (f, rows) in enumerate(sorted(staged.items())):
        if not rows:
            continue  # empty task shard — nothing to reference
        name = f"_{prefix}-{token}-{i:04d}.jsonl"
        os.replace(os.path.join(stage, f), os.path.join(path, name))
        names.append(name)
        n_rows += rows
    shutil.rmtree(stage, ignore_errors=True)
    return names, n_rows


def _stage_key_shards(
    keys_df: DataFrame, path: str, token: str
) -> tuple[list[str], int]:
    """DELETE key files: ``keys_df``'s doc_id column staged as
    ``_delete-{token}-*`` shards (see :func:`_stage_sidecar_shards`)."""
    return _stage_sidecar_shards(
        keys_df.select("doc_id"), path, token, "delete"
    )


#: reserved manifest key: each commit's own operation name (append /
#: overwrite / delete / merge / compact / evolve-schema /
#: add-constraint / drop-constraint / streaming-append) — the
#: DESCRIBE HISTORY provenance field; every commit overwrites it
OP_KEY = "_op"

#: reserved manifest key: {str(version): [cdc file names]} — commit-
#: time CHANGE DATA FEED files (Delta's _change_data), written by DML
#: run with ``cdf=True``.  Each file holds the commit's typed change
#: rows (table columns + _change_type); carried forward like the
#: tombstone ledger (the '_'-key copy loops), CLEARED by compaction's
#: fresh manifest, reclaimed by vacuum once no retained manifest
#: carries the version.
CDC_KEY = "_cdc"


def _with_cdc(manifest: dict, version: int, files: list[str]) -> None:
    """Record ``files`` as commit ``version``'s CDC files in the
    manifest being built (in place; no-op for an empty list)."""
    if files:
        cdc = dict(manifest.get(CDC_KEY, {}))
        cdc[str(version)] = files
        manifest[CDC_KEY] = cdc


def delete_from_jsonl_dir(
    path: str,
    doc_ids,
    base_version: int | None = None,
    *,
    spark: SparkSession | None = None,
    cdf: bool = False,
) -> int:
    """Row-level DELETE on the mini-lake — the last table-format
    primitive it lacked: commit a new manifest version whose shard list
    is UNCHANGED (shards are immutable) plus a tombstone ledger entry
    ``{"v": this_version, "ids": [doc_ids]}`` — sequence-number scoped:
    it applies to every shard added by an EARLIER commit.  Every
    reader — batch, time travel, streaming — applies tombstones at scan
    time (:func:`_iter_jsonl`); snapshots BEFORE this version are
    untouched (their manifests carry the old ledger); compaction
    rewrites live rows only and so reclaims the space physically, after
    which vacuum drops the old shards.

    A delete commits through the same create-if-absent OCC gate as
    every append, so a delete racing an append has exactly one winner
    (``ManifestCommitConflict`` for the loser).  ``base_version`` pins
    the snapshot this delete was planned against (None = latest).

    Scale: the keys land in DELETE FILES (``_delete-*.jsonl``), not in
    the manifest — the manifest entry carries only file names + a
    count, so commit metadata is O(1) in the key count and every
    subsequent commit re-serializes paths, never keys (Iceberg
    equality-delete files / Delta deletion vectors).  ``doc_ids`` may
    be a DataFrame, in which case the key shards are written by a
    DISTRIBUTED job and the driver never materializes a single key —
    the 100 TB daily-CDC shape; an iterable writes one driver-side key
    file (the bounded metadata-scale path).  The manifest claim itself
    stays a pure-metadata commit either way.  Returns the new
    version.

    ``cdf=True`` (requires ``spark``) additionally stages the deleted
    rows' PRE-IMAGES as commit-time change-data-feed files
    (``_cdc-*``, Delta's _change_data): one distributed join of the
    base snapshot against the key set — the scan Delta also pays when
    CDF is enabled on DELETE, turning the otherwise pure-metadata
    commit into an O(matched data) one.  Downstream CDF readers
    (:func:`table_changes_jsonl_dir`, the change-feed stream) then
    serve this commit from its CDC files exactly."""
    import json as _json
    import uuid as _uuid

    base = (
        base_version
        if base_version is not None
        else _latest_manifest_version(path)
    )
    if base <= 0:
        raise ValueError(
            f"delete_from_jsonl_dir: no committed version under {path}"
        )
    if cdf and spark is None:
        raise ValueError("delete_from_jsonl_dir: cdf=True requires spark")
    version = base + 1
    manifest = _manifest_at(path, base)
    files = sorted(_manifest_files(manifest))
    # stage the key set as delete file(s) in the table dir: '_'-prefixed
    # (invisible to listing readers) and referenced by no manifest until
    # the claim below lands — same invisibility discipline as staged
    # data shards.
    token = _uuid.uuid4().hex[:8]
    key_files: list[str] = []
    n_keys = 0
    if isinstance(doc_ids, DataFrame):
        key_files, n_keys = _stage_key_shards(doc_ids, path, token)
    else:
        ids = sorted({int(i) for i in doc_ids})
        n_keys = len(ids)
        if ids:
            name = f"_delete-{token}.jsonl"
            _write_atomic(
                os.path.join(path, name),
                "".join(
                    _json.dumps({"doc_id": i}) + "\n" for i in ids
                ),
            )
            key_files.append(name)

    # cdf: stage the deleted rows' pre-images as this commit's CDC
    # files — the pinned base read joined to the key set, tagged
    cdc_files: list[str] = []
    if cdf and key_files and files:
        register_pyds(spark)
        keys_df = (
            doc_ids.select("doc_id")
            if isinstance(doc_ids, DataFrame)
            else spark.createDataFrame(
                [(int(i),) for i in doc_ids], "doc_id bigint"
            )
        )
        pre = (
            spark.read.format("jsonl_docs")
            .option("path", path)
            .option("version", base)
            .load()
            .join(F.broadcast(keys_df.distinct()), "doc_id", "inner")
            .withColumn("_change_type", F.lit("delete"))
        )
        cdc_files, n_cdc = _stage_sidecar_shards(pre, path, token, "cdc")
        if n_cdc == 0:
            # the keys matched ZERO live rows: a ledger-growing commit
            # with no CDC files would later make the change-feed
            # stream raise "carries no CDC files" for a commit the
            # user did run with cdf=True — and the tombstones are dead
            # weight anyway (earlier shards are immutable, so keys
            # that kill nothing at base can never kill anything).
            # Drop the staged key files and commit a pure-metadata
            # delete: CDF readers classify it metadata-only, exactly
            # right for zero changed rows.
            for kf in key_files:
                try:
                    os.remove(os.path.join(path, kf))
                except OSError:
                    pass
            key_files = []

    def _drop_key_files() -> None:
        for kf in key_files + cdc_files:
            try:
                os.remove(os.path.join(path, kf))
            except OSError:
                pass

    new_manifest = {f: manifest[f] for f in files}
    # carry reserved keys other than the ledger (e.g. the streaming
    # sink's _txn idempotence marker) through the metadata commit
    for k, v in manifest.items():
        if k.startswith("_") and k != TOMBSTONE_KEY:
            new_manifest[k] = v
    _with_cdc(new_manifest, version, cdc_files)
    new_manifest[OP_KEY] = "delete"
    tombs = _tombstones_of(manifest)
    if key_files and files:
        tombs = {
            "entries": [
                *tombs["entries"],
                {"v": version, "files": key_files, "n": n_keys},
            ],
            "added": dict(tombs.get("added", {})),
        }
    elif key_files:
        # empty table: the keys can tombstone nothing — reclaim now
        _drop_key_files()
        key_files = []
    if tombs["entries"]:
        new_manifest[TOMBSTONE_KEY] = tombs
    import time as _time

    new_manifest["_ts"] = _time.time_ns()
    body = _json.dumps(new_manifest)
    try:
        _write_atomic_excl(
            os.path.join(path, f"_MANIFEST.v{version}"), body
        )
    except FileExistsError:
        # rolled back: the key files are in no committed manifest
        _drop_key_files()
        raise ManifestCommitConflict(
            f"concurrent commit: _MANIFEST.v{version} was claimed by "
            f"another writer after this delete read version {base}; "
            "re-plan the delete against the new table state"
        ) from None
    if _latest_manifest_version(path) == version:
        _write_atomic(os.path.join(path, "_MANIFEST"), body)
    return version


def _stage_data_shards(
    df: DataFrame, path: str
) -> tuple[dict, dict]:
    """Stage ``df`` as data shards IN the live table dir, invisible to
    every reader: the transactional writer lands them in a sibling
    stage dir (two concurrent merges must not clobber each other's
    staging — their claims serialize; their staging must too), then a
    two-step move (underscore temps first, then renames to final UUID
    names no committed manifest references — same discipline as
    compaction).  Returns ``(staged {name: rows}, stage _STATS)``."""
    import json as _json
    import shutil
    import uuid as _uuid

    stage = path + f".merge-stage-{_uuid.uuid4().hex[:8]}"
    (
        df.write.format("jsonl_docs")
        .option("path", stage)
        # the staged rows land in the REAL table: its CHECK
        # constraints must hold here, where a violation can still
        # fail the merge before any claim
        .option("constraints_from", path)
        .mode("overwrite")
        .save()
    )
    with open(os.path.join(stage, "_MANIFEST")) as fh:
        staged = {
            f: v
            for f, v in _json.load(fh).items()
            if not f.startswith("_")
        }
    stage_stats = {}
    sp = os.path.join(stage, "_STATS")
    if os.path.exists(sp):
        with open(sp) as fh:
            stage_stats = _json.load(fh)
    for f in staged:
        os.replace(
            os.path.join(stage, f), os.path.join(path, "_tmp-merge-" + f)
        )
    for f in staged:
        os.replace(
            os.path.join(path, "_tmp-merge-" + f), os.path.join(path, f)
        )
    shutil.rmtree(stage, ignore_errors=True)
    return staged, stage_stats


def merge_into_jsonl_dir(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    max_retries: int = 3,
    *,
    when_matched_update: bool | str = True,
    when_matched_delete: bool | str = False,
    when_not_matched_insert: bool | str = True,
    update_set: dict[str, str] | None = None,
    cdf: bool = False,
) -> int:
    """MERGE INTO on ``doc_id`` in ONE atomic commit — the full
    conditional-clause contract of the SQL MERGE a table-format user
    writes::

        WHEN MATCHED [AND <when_matched_update>] THEN
            UPDATE SET <update_set or whole source row>
        WHEN MATCHED [AND <when_matched_delete>] THEN DELETE
        WHEN NOT MATCHED [AND <when_not_matched_insert>] THEN INSERT

    Clause predicates are SQL boolean expressions over the aliased
    source (``s.*``) and target (``t.*``) rows; booleans mean
    always/never.  Matched rows are tested against the UPDATE clause
    first, then DELETE (first match wins — a matched row neither
    clause takes is left UNTOUCHED, the key MERGE-vs-upsert
    difference).  ``update_set`` maps target columns to SQL
    expressions (default: replace with the whole source row).

    The DEFAULT arguments are the whole-row upsert fast path: every
    source key tombstoned + every source row inserted, with NO join
    against the target — the tombstone entry references the merge's
    own staged shards as its delete files, so the driver handles file
    names only (no collect, no key materialization; manifest
    O(#shards) per commit regardless of key count).

    CLAUSE merges must know which source keys exist in the target, so
    they run one distributed left join of source against the
    base-snapshot table (the same scan Delta/Iceberg MERGE pays) —
    updates/deletes become dedicated ``_delete-*`` key shards (written
    distributedly), inserts become staged data shards, and everything
    lands under one manifest claim: no reader can observe the delete
    without the insert.  Tombstone entries only apply to shards added
    by EARLIER commits ("v > added"), so the freshly staged rows are
    exempt by construction.

    Concurrency: the fast path's claim loop is metadata-only (losing
    to a concurrent append just re-claims against the new base — the
    upsert outcome is unaffected by it).  A CLAUSE merge's
    matched/not-matched split is only valid for the snapshot it was
    planned against, so a lost claim raises ``ManifestCommitConflict``
    immediately (Delta's ConcurrentAppendException) and the caller
    re-runs the merge — a silent metadata retry could classify a
    concurrently-inserted key as not-matched and land it twice.
    Returns the committed version."""
    import json as _json

    register_pyds(spark)  # also pins the active session for this thread
    clause_path = not (
        when_matched_update is True
        and when_matched_delete is False
        and when_not_matched_insert is True
        and update_set is None
    )
    # cdf needs per-row change classification (pre/post images), which
    # only the clause path's join computes — a cdf upsert routes there
    # (same outcome; it pays the target join, exactly Delta's CDF cost)
    if clause_path or cdf:
        return _merge_clauses(
            spark,
            df,
            path,
            when_matched_update,
            when_matched_delete,
            when_not_matched_insert,
            update_set,
            cdf,
        )
    staged, stage_stats = _stage_data_shards(df, path)
    last: Exception | None = None
    for _ in range(max_retries):
        base = _latest_manifest_version(path)
        version = base + 1
        manifest = _manifest_at(path, base)
        files = sorted(_manifest_files(manifest))
        new_manifest = {f: manifest[f] for f in files}
        for k, v in manifest.items():
            if k.startswith("_") and k != TOMBSTONE_KEY:
                new_manifest[k] = v
        new_manifest[OP_KEY] = "merge"
        tombs = _tombstones_of(manifest)
        entries = list(tombs["entries"])
        if staged and files:
            # the staged shards double as the entry's delete files:
            # every row they hold IS a source key (self-exempt via
            # "v > added" — they are added at this very version)
            entries.append(
                {
                    "v": version,
                    "files": sorted(staged),
                    "n": sum(staged.values()),
                }
            )
        new_manifest.update(staged)
        if entries:
            # the staged shards share the entry's version: "v > added"
            # exempts exactly the replacement rows from their own merge
            added = dict(tombs.get("added", {}))
            added.update({f: version for f in staged})
            new_manifest[TOMBSTONE_KEY] = {
                "entries": entries,
                "added": added,
            }
        import time as _time

        new_manifest["_ts"] = _time.time_ns()
        body = _json.dumps(new_manifest)
        try:
            _write_atomic_excl(
                os.path.join(path, f"_MANIFEST.v{version}"), body
            )
        except FileExistsError:
            last = ManifestCommitConflict(
                f"concurrent commit: _MANIFEST.v{version} was claimed "
                "by another writer during merge; re-claiming against "
                "the new base"
            )
            continue
        if _latest_manifest_version(path) == version:
            stats_path = os.path.join(path, "_STATS")
            stats = {}
            if os.path.exists(stats_path):
                with open(stats_path) as fh:
                    stats = _json.load(fh)
            stats.update(stage_stats)
            _write_atomic(stats_path, _json.dumps(stats))
            _write_atomic(os.path.join(path, "_MANIFEST"), body)
        return version
    # every claim lost: roll back the staged shards (in no committed
    # manifest — invisible all along) and surface the conflict
    for f in staged:
        try:
            os.remove(os.path.join(path, f))
        except OSError:
            pass
    assert last is not None
    raise last


def _merge_clauses(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    when_matched_update: bool | str,
    when_matched_delete: bool | str,
    when_not_matched_insert: bool | str,
    update_set: dict[str, str] | None,
    cdf: bool = False,
) -> int:
    """Conditional-clause MERGE (see :func:`merge_into_jsonl_dir`):
    plan against the base snapshot, split the source by one distributed
    left join, stage inserts as data shards and update/delete keys as
    ``_delete-*`` key shards, commit under ONE claim pinned to
    ``base + 1`` — a lost claim rolls everything back and raises.
    ``cdf=True`` also stages the commit's typed change rows
    (update_preimage/update_postimage/delete/insert) as ``_cdc-*``
    files from the SAME classification join — no extra scan."""
    import json as _json
    import uuid as _uuid

    from pyspark.storagelevel import StorageLevel

    register_pyds(spark)
    base = _latest_manifest_version(path)
    if base <= 0:
        raise ValueError(
            f"merge_into_jsonl_dir: no committed version under {path}"
        )
    version = base + 1

    def _pred(p: bool | str):
        return F.lit(p) if isinstance(p, bool) else F.expr(p)

    src_cols = df.columns
    tgt = (
        spark.read.format("jsonl_docs")
        .option("path", path)
        .option("version", base)
        .load()
    )
    # ONE distributed join classifies every source row; persisted
    # because three consumers (update rows, insert rows, tombstone
    # keys) read it — without the pin each would re-run the join scan.
    # At scale Spark picks the strategy (AQE broadcasts a small source).
    joined = df.alias("s").join(
        tgt.alias("t"),
        F.col("s.doc_id") == F.col("t.doc_id"),
        "left",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        is_matched = F.col("t.doc_id").isNotNull()
        take_update = is_matched & _pred(when_matched_update)
        # first match wins: DELETE only sees rows UPDATE declined
        take_delete = (
            is_matched
            & ~_pred(when_matched_update)
            & _pred(when_matched_delete)
        )
        take_insert = ~is_matched & _pred(when_not_matched_insert)
        sets = update_set or {}
        upd_rows = joined.filter(take_update).select(
            *[
                (
                    F.expr(sets[c]) if c in sets else F.col(f"s.{c}")
                ).alias(c)
                for c in src_cols
            ]
        )
        ins_rows = joined.filter(take_insert).select(
            *[F.col(f"s.{c}").alias(c) for c in src_cols]
        )
        tomb_keys = joined.filter(take_update | take_delete).select(
            F.col("s.doc_id").alias("doc_id")
        )
        staged, stage_stats = _stage_data_shards(
            upd_rows.unionByName(ins_rows), path
        )
        token = _uuid.uuid4().hex[:8]
        key_files, n_keys = _stage_key_shards(tomb_keys, path, token)
        cdc_files: list[str] = []
        if cdf:
            tgt_cols = [
                F.col(f"t.{c}").alias(c) for c in tgt.columns
            ]

            def typed(rows: DataFrame, change: str) -> DataFrame:
                return rows.withColumn("_change_type", F.lit(change))

            cdc_df = (
                typed(
                    joined.filter(take_update).select(*tgt_cols),
                    "update_preimage",
                )
                .unionByName(
                    typed(upd_rows, "update_postimage"),
                    allowMissingColumns=True,
                )
                .unionByName(
                    typed(
                        joined.filter(take_delete).select(*tgt_cols),
                        "delete",
                    ),
                    allowMissingColumns=True,
                )
                .unionByName(
                    typed(ins_rows, "insert"),
                    allowMissingColumns=True,
                )
            )
            cdc_files, _ = _stage_sidecar_shards(
                cdc_df, path, token, "cdc"
            )
    finally:
        joined.unpersist()

    def _rollback() -> None:
        for f in list(staged) + key_files + cdc_files:
            try:
                os.remove(os.path.join(path, f))
            except OSError:
                pass

    manifest = _manifest_at(path, base)
    files = sorted(_manifest_files(manifest))
    new_manifest = {f: manifest[f] for f in files}
    for k, v in manifest.items():
        if k.startswith("_") and k != TOMBSTONE_KEY:
            new_manifest[k] = v
    _with_cdc(new_manifest, version, cdc_files)
    new_manifest[OP_KEY] = "merge"
    tombs = _tombstones_of(manifest)
    entries = list(tombs["entries"])
    if key_files and files:
        entries.append({"v": version, "files": key_files, "n": n_keys})
    elif key_files:
        for kf in key_files:
            try:
                os.remove(os.path.join(path, kf))
            except OSError:
                pass
        key_files = []
    new_manifest.update(staged)
    if entries:
        added = dict(tombs.get("added", {}))
        added.update({f: version for f in staged})
        new_manifest[TOMBSTONE_KEY] = {"entries": entries, "added": added}
    import time as _time

    new_manifest["_ts"] = _time.time_ns()
    body = _json.dumps(new_manifest)
    try:
        _write_atomic_excl(
            os.path.join(path, f"_MANIFEST.v{version}"), body
        )
    except FileExistsError:
        _rollback()
        raise ManifestCommitConflict(
            f"concurrent commit: _MANIFEST.v{version} was claimed by "
            f"another writer after this clause merge planned against "
            f"version {base}; the matched/not-matched split is stale — "
            "staged shards were rolled back, re-run the merge"
        ) from None
    if _latest_manifest_version(path) == version:
        stats_path = os.path.join(path, "_STATS")
        stats = {}
        if os.path.exists(stats_path):
            with open(stats_path) as fh:
                stats = _json.load(fh)
        stats.update(stage_stats)
        _write_atomic(stats_path, _json.dumps(stats))
        _write_atomic(os.path.join(path, "_MANIFEST"), body)
    return version


#: the delete/merge demo predicates — constant so the oracle is fixed SQL
DELETE_MOD, MERGE_MOD = 3, 7


def q_fmt_pyds_delete_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW-LEVEL DELETE + MERGE, value-checked end to end: write v1
    (even doc_ids) → append v2 (odd) → DELETE every ``doc_id % 10 == 3``
    (v3, pure-metadata tombstone commit) → MERGE an upsert batch that
    rewrites every ``doc_id % 10 == 7`` row with ``n_chars + 1000``
    (v4: tombstone-the-old + insert-the-new in one claim).  The result
    unions read@v2 (``pre`` — time travel BEFORE the delete must still
    equal the full corpus) with read@latest (``post`` — %3 rows gone,
    %7 rows replaced, everything else untouched).  The oracle
    re-derives both states from the parquet truth, so a tombstone that
    leaks (deleted row surviving), over-applies (killing the merged
    replacement), or misses a snapshot boundary hash-mismatches.

    OCC interplay (delete racing an append), physical reclaim through
    compaction + vacuum, and the stream ``ignore_deletes`` contract are
    pinned in ``tests/test_formats.py``."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_dm_{tag}_{os.getpid()}"
    )
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)
    (
        docs.filter(F.col("doc_id") % 2 == 0)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out).mode("overwrite").save()
    )
    (
        docs.filter(F.col("doc_id") % 2 == 1)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out)
        .option("base_version", 1)
        .mode("append")
        .save()
    )
    # v3: DELETE — the keys go straight from a DataFrame predicate into
    # distributed _delete-* key shards; the driver never holds an id
    v = delete_from_jsonl_dir(
        out,
        docs.filter(F.col("doc_id") % 10 == DELETE_MOD)
        .select("doc_id")
        .repartition(2),
        base_version=2,
    )
    if v != 3:
        raise AssertionError(f"delete committed v{v}, expected v3")
    # v4: MERGE — replace the %7 rows with bumped n_chars
    upserts = docs.filter(F.col("doc_id") % 10 == MERGE_MOD).select(
        "doc_id",
        "text",
        "lang",
        "source",
        (F.col("n_chars") + F.lit(1000)).alias("n_chars"),
    )
    v = merge_into_jsonl_dir(spark, upserts.repartition(2, "doc_id"), out)
    if v != 4:
        raise AssertionError(f"merge committed v{v}, expected v4")

    def agg(df: DataFrame, snap: str) -> DataFrame:
        return df.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        ).select(F.lit(snap).alias("snapshot"), "*")

    pre = (
        spark.read.format("jsonl_docs")
        .option("path", out)
        .option("version", 2)
        .load()
    )
    post = spark.read.format("jsonl_docs").option("path", out).load()
    return agg(pre, "pre").unionByName(agg(post, "post"))


SQL_FMT_PYDS_DELETE_MERGE = f"""
SELECT 'pre' AS snapshot, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM documents
GROUP BY lang
UNION ALL
SELECT 'post' AS snapshot, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN doc_id % 10 = {MERGE_MOD}
                     THEN n_chars + 1000 ELSE n_chars END) AS BIGINT)
         AS sum_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM documents
WHERE doc_id % 10 <> {DELETE_MOD}
GROUP BY lang
"""


def q_fmt_pyds_schema_evolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SCHEMA EVOLUTION AS A LAKE COMMIT, value-checked across the
    boundary: write v1 (even doc_ids, the 5-column documents shape) →
    ``evolve_jsonl_schema`` adds ``priority bigint`` (v2, pure-metadata
    commit) → append odd doc_ids WITH priority = doc_id % 5 (v3).  The
    result unions read@v1 (time travel must serve the OLD 5-column
    shape — the column count is part of the checked output) with
    read@latest (6 columns; pre-evolution rows null-extend, so priority
    is NULL on evens and populated on odds).  The oracle re-derives
    both states from the parquet truth, so an evolution that leaks the
    new column into old snapshots, loses it on new rows, or
    null-extends the wrong side hash-mismatches.  The version-stream
    fail-loudly boundary and compaction carrying the evolved schema are
    pinned in ``tests/test_formats.py``."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_se_{tag}_{os.getpid()}"
    )
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)
    (
        docs.filter(F.col("doc_id") % 2 == 0)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out).mode("overwrite").save()
    )
    v = evolve_jsonl_schema(out, DOCS_DDL + ", priority bigint")
    if v != 2:
        raise AssertionError(f"evolve committed v{v}, expected v2")
    (
        docs.filter(F.col("doc_id") % 2 == 1)
        .withColumn("priority", F.col("doc_id") % 5)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out)
        .option("base_version", 2)
        .mode("append")
        .save()
    )
    old = (
        spark.read.format("jsonl_docs")
        .option("path", out)
        .option("version", 1)
        .load()
    )
    new = spark.read.format("jsonl_docs").option("path", out).load()
    if len(old.columns) != 5 or len(new.columns) != 6:
        raise AssertionError(
            f"schema resolution wrong: v1 has {len(old.columns)} cols, "
            f"latest has {len(new.columns)}"
        )
    pre = old.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    ).select(
        F.lit("v1").alias("snapshot"),
        "*",
        F.lit(5).cast("int").alias("n_cols"),
        F.lit(0).cast("bigint").alias("n_prio"),
        F.lit(0).cast("bigint").alias("sum_prio"),
    )
    post = new.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.count("priority").alias("n_prio"),
        F.coalesce(F.sum("priority"), F.lit(0)).alias("sum_prio"),
    ).select(
        F.lit("latest").alias("snapshot"),
        "lang",
        "n_docs",
        "sum_chars",
        F.lit(6).cast("int").alias("n_cols"),
        "n_prio",
        "sum_prio",
    )
    return pre.unionByName(post)


SQL_FMT_PYDS_SCHEMA_EVOLUTION = """
SELECT 'v1' AS snapshot, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(5 AS INT) AS n_cols,
       CAST(0 AS BIGINT) AS n_prio,
       CAST(0 AS BIGINT) AS sum_prio
FROM documents WHERE doc_id % 2 = 0
GROUP BY lang
UNION ALL
SELECT 'latest' AS snapshot, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(6 AS INT) AS n_cols,
       CAST(COUNT(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS BIGINT)
         AS n_prio,
       CAST(COALESCE(SUM(CASE WHEN doc_id % 2 = 1
                               THEN doc_id % 5 END), 0) AS BIGINT)
         AS sum_prio
FROM documents
GROUP BY lang
"""


def q_fmt_pyds_merge_clauses(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CONDITIONAL MERGE CLAUSES, all three forms in ONE commit,
    value-checked pre+post: write v1 (even doc_ids), then MERGE the
    ``doc_id % 5 == 0`` slice of the corpus with::

        WHEN MATCHED AND t.n_chars % 2 = 0
            THEN UPDATE SET n_chars = s.n_chars + 500
        WHEN MATCHED AND t.n_chars % 2 = 1 AND t.n_chars % 3 = 0
            THEN DELETE
        WHEN NOT MATCHED AND s.n_chars % 3 <> 0 THEN INSERT

    Matched keys are exactly ``doc_id % 10 == 0`` (the even half of the
    source), so the post state must show: those rows updated or
    deleted per the predicates — with the rows NEITHER clause takes
    left untouched (the upsert-vs-MERGE difference) — non-source
    target rows untouched, and exactly the insert-predicate slice of
    the unmatched source (``% 10 == 5``) added.  The oracle re-derives
    both snapshots from the parquet truth, so a clause that
    over-applies (upserting an untouched matched row), under-applies,
    or leaks across the matched/not-matched split hash-mismatches.
    The OCC contract (a clause merge racing an append fails loudly —
    its split is stale) is pinned in ``tests/test_formats.py``."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_mc_{tag}_{os.getpid()}"
    )
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)
    (
        docs.filter(F.col("doc_id") % 2 == 0)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out).mode("overwrite").save()
    )
    src = docs.filter(F.col("doc_id") % 5 == 0).repartition(2, "doc_id")
    v = merge_into_jsonl_dir(
        spark,
        src,
        out,
        when_matched_update="t.n_chars % 2 = 0",
        when_matched_delete="t.n_chars % 2 = 1 AND t.n_chars % 3 = 0",
        when_not_matched_insert="s.n_chars % 3 != 0",
        update_set={"n_chars": "s.n_chars + 500"},
    )
    if v != 2:
        raise AssertionError(f"clause merge committed v{v}, expected v2")

    def agg(df: DataFrame, snap: str) -> DataFrame:
        return df.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        ).select(F.lit(snap).alias("snapshot"), "*")

    pre = (
        spark.read.format("jsonl_docs")
        .option("path", out)
        .option("version", 1)
        .load()
    )
    post = spark.read.format("jsonl_docs").option("path", out).load()
    return agg(pre, "pre").unionByName(agg(post, "post"))


SQL_FMT_PYDS_MERGE_CLAUSES = """
SELECT 'pre' AS snapshot, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM documents WHERE doc_id % 2 = 0
GROUP BY lang
UNION ALL
SELECT 'post' AS snapshot, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM (
  -- target rows the merge leaves alone: non-source keys, plus matched
  -- rows neither clause takes (n_chars odd and not divisible by 3)
  SELECT doc_id, lang, n_chars FROM documents
  WHERE doc_id % 2 = 0
    AND (doc_id % 10 <> 0
         OR (n_chars % 2 = 1 AND n_chars % 3 <> 0))
  UNION ALL
  -- WHEN MATCHED AND t.n_chars % 2 = 0 THEN UPDATE
  SELECT doc_id, lang, n_chars + 500 FROM documents
  WHERE doc_id % 10 = 0 AND n_chars % 2 = 0
  UNION ALL
  -- WHEN NOT MATCHED AND s.n_chars % 3 <> 0 THEN INSERT
  SELECT doc_id, lang, n_chars FROM documents
  WHERE doc_id % 10 = 5 AND n_chars % 3 <> 0
)
GROUP BY lang
"""


def _versioned_lang_drain_opts(
    spark: SparkSession,
    out: str,
    ckpt: str,
    name: str,
    ignore_deletes: bool = False,
) -> None:
    """One availableNow drain of the VERSIONED stream over ``out`` into
    the complete-mode memory sink ``name`` — the ``ignore_deletes``
    twin of :func:`_versioned_lang_drain` for tables with row-level
    DELETE/MERGE history."""
    from pu4spark_spark.streaming.drain import drain_partitions

    reader = (
        spark.readStream.format("jsonl_docs")
        .option("path", out)
        .option("versioned", "true")
    )
    if ignore_deletes:
        reader = reader.option("ignore_deletes", "true")
    stream = reader.load()
    agg = stream.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )
    with drain_partitions(spark, 8):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()


#: delete/merge mods for the STREAM feed demo — even-parity so they hit
#: the evens-only fixture (constant, so the oracle is fixed SQL)
FEED_DELETE_MOD, FEED_MERGE_MOD = 4, 8


def q_streaming_pyds_delete_feed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAM × DELETE/MERGE through Spark's real microbatch engine —
    both halves of the append-only-stream contract, value-checked:

    - A LAGGING checkpointed subscriber (drained before the changes,
      resumed after, ``ignore_deletes``) exhibits NON-RETRACTION: the
      delete commit contributes nothing (its removals are never
      retracted from the sink), the merge commit streams exactly its
      replacement shards — so the complete-mode aggregate equals
      "initial snapshot + merge rows", with superseded key versions
      counted too.  That double-count is the documented semantics
      (Delta's ignoreDeletes), pinned here BY the oracle rather than
      despite it.
    - A FRESH subscriber's initial batch applies the tombstone ledger:
      its aggregate equals the CURRENT table (deletes gone, merged
      keys exactly once, at their new values).

    Both states are re-derived by the DuckDB oracle from the parquet
    truth, so a tombstone leak, a double-delivered merge shard, or a
    retraction that shouldn't happen all hash-mismatch."""
    import hashlib
    import shutil
    import uuid as _uuid

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_df_{tag}_{os.getpid()}"
    )
    ckpt = os.path.join(out, "_ckpt")
    shutil.rmtree(out, ignore_errors=True)
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)
    evens = docs.filter(F.col("doc_id") % 2 == 0)
    (
        evens.repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out)
        .mode("overwrite")
        .save()
    )
    lag = f"pyds_feed_lag_{_uuid.uuid4().hex[:8]}"
    _versioned_lang_drain_opts(
        spark, out, ckpt, lag, ignore_deletes=True
    )  # consumes v1 = all evens
    # v2: DELETE %10==4 — distributed key shards, no driver id collect
    delete_from_jsonl_dir(
        out,
        evens.filter(F.col("doc_id") % 10 == FEED_DELETE_MOD)
        .select("doc_id")
        .repartition(2),
        base_version=1,
    )
    # v3: MERGE — replace %10==8 rows with bumped n_chars
    upserts = evens.filter(F.col("doc_id") % 10 == FEED_MERGE_MOD).select(
        "doc_id",
        "text",
        "lang",
        "source",
        (F.col("n_chars") + F.lit(1000)).alias("n_chars"),
    )
    merge_into_jsonl_dir(spark, upserts.repartition(2, "doc_id"), out)
    # lagging subscriber resumes: v2 contributes nothing, v3 streams
    # its replacement shards only
    _versioned_lang_drain_opts(spark, out, ckpt, lag, ignore_deletes=True)
    # fresh subscriber: initial snapshot with the ledger applied
    fresh = f"pyds_feed_fresh_{_uuid.uuid4().hex[:8]}"
    _versioned_lang_drain_opts(
        spark,
        out,
        os.path.join(out, "_ckpt_fresh"),
        fresh,
        ignore_deletes=True,
    )
    return (
        spark.table(lag)
        .select(F.lit("lagging").alias("subscriber"), "*")
        .unionByName(
            spark.table(fresh).select(
                F.lit("fresh").alias("subscriber"), "*"
            )
        )
    )


#: streaming-CDF fixture predicates over the evens table: deletes hit
#: %10==6, updates %10==2, the post-stream append inserts odds %10==1
CDFS_DEL_MOD, CDFS_UPD_MOD, CDFS_INS_MOD = 6, 2, 1


def q_streaming_pyds_cdf_feed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING CHANGE DATA FEED through Spark's real microbatch
    engine (``option("read_change_feed", "true")`` — Delta's
    readChangeFeed), value-checked end to end: build v1 (evens) →
    DELETE %10==6 with ``cdf=True`` (v2 — pre-images staged as
    commit-time ``_cdc`` files) → MERGE-upsert %10==2 with
    ``cdf=True`` (v3 — update pre+post images) → append odds %10==1
    (v4 — plain inserts, no CDC files needed), then drain the change
    stream fresh: the initial snapshot arrives as v1 ``insert`` rows
    and every later commit as its typed changes.  The aggregate per
    (change type, commit version) is re-derived by the oracle from
    the parquet truth, so a missing pre-image, a post-image with the
    old value, a compaction row leaking as change, or an initial
    snapshot that misses the ledger all hash-mismatch.  The
    fail-loudly contract for non-cdf DML commits is pinned in
    tests/test_formats.py."""
    import hashlib
    import shutil
    import uuid as _uuid

    from pu4spark_spark.streaming.drain import drain_partitions

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_cdfs_{tag}_{os.getpid()}"
    )
    shutil.rmtree(out, ignore_errors=True)
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)
    evens = docs.filter(F.col("doc_id") % 2 == 0)
    (
        evens.repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out).mode("overwrite").save()
    )
    delete_from_jsonl_dir(
        out,
        evens.filter(F.col("doc_id") % 10 == CDFS_DEL_MOD)
        .select("doc_id")
        .repartition(2),
        base_version=1,
        spark=spark,
        cdf=True,
    )
    upserts = evens.filter(
        F.col("doc_id") % 10 == CDFS_UPD_MOD
    ).select(
        "doc_id",
        "text",
        "lang",
        "source",
        (F.col("n_chars") + F.lit(1000)).alias("n_chars"),
    )
    merge_into_jsonl_dir(
        spark, upserts.repartition(2, "doc_id"), out, cdf=True
    )
    (
        docs.filter(
            (F.col("doc_id") % 2 == 1)
            & (F.col("doc_id") % 10 == CDFS_INS_MOD)
        )
        .repartition(2, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out).option("base_version", 3)
        .mode("append").save()
    )
    name = f"pyds_cdf_feed_{_uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.format("jsonl_docs")
        .option("path", out)
        .option("read_change_feed", "true")
        .load()
    )
    with drain_partitions(spark, 8):
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option(
                "checkpointLocation", os.path.join(out, "_ckpt_cdf")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(name)
        .groupBy(
            F.col("_change_type").alias("change_type"),
            F.col("_commit_version").alias("commit_version"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


SQL_STREAMING_PYDS_CDF_FEED = f"""
SELECT 'insert' AS change_type, CAST(1 AS BIGINT) AS commit_version,
       COUNT(*) AS n_rows, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM documents WHERE doc_id % 2 = 0
UNION ALL
SELECT 'delete', CAST(2 AS BIGINT), COUNT(*),
       CAST(SUM(n_chars) AS BIGINT), MIN(doc_id), MAX(doc_id)
FROM documents WHERE doc_id % 10 = {CDFS_DEL_MOD}
UNION ALL
SELECT 'update_preimage', CAST(3 AS BIGINT), COUNT(*),
       CAST(SUM(n_chars) AS BIGINT), MIN(doc_id), MAX(doc_id)
FROM documents WHERE doc_id % 10 = {CDFS_UPD_MOD}
UNION ALL
SELECT 'update_postimage', CAST(3 AS BIGINT), COUNT(*),
       CAST(SUM(n_chars + 1000) AS BIGINT), MIN(doc_id), MAX(doc_id)
FROM documents WHERE doc_id % 10 = {CDFS_UPD_MOD}
UNION ALL
SELECT 'insert', CAST(4 AS BIGINT), COUNT(*),
       CAST(SUM(n_chars) AS BIGINT), MIN(doc_id), MAX(doc_id)
FROM documents
WHERE doc_id % 2 = 1 AND doc_id % 10 = {CDFS_INS_MOD}
"""


SQL_STREAMING_PYDS_DELETE_FEED = f"""
SELECT 'lagging' AS subscriber, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM (
  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id, lang, n_chars + 1000 FROM documents
  WHERE doc_id % 10 = {FEED_MERGE_MOD}
)
GROUP BY lang
UNION ALL
SELECT 'fresh' AS subscriber, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN doc_id % 10 = {FEED_MERGE_MOD}
                     THEN n_chars + 1000 ELSE n_chars END) AS BIGINT)
         AS sum_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM documents
WHERE doc_id % 2 = 0 AND doc_id % 10 <> {FEED_DELETE_MOD}
GROUP BY lang
"""


def q_fmt_pyds_commit_retry(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CONFLICT → REFRESH → RETRY, end to end: writer A and writer B
    both plan against version 1; A commits v2 first; B's first claim
    LOSES (witnessed — the query asserts the stale attempt raised) and
    :func:`append_with_retry` re-reads the latest version and lands B's
    rows as v3.  The final table must hold base + A + B exactly once
    each — a retry that double-committed B's shards (or lost them)
    hash-mismatches the oracle over the full documents table.

    Together with ``fmt_pyds_commit_conflict`` (loser fails loudly,
    no merge) this pins the complete optimistic-concurrency contract a
    parallel-ingest user relies on."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_cr_{tag}_{os.getpid()}"
    )
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)
    third = F.col("doc_id") % 3
    (
        docs.filter(third == 0)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out)
        .mode("overwrite")
        .save()
    )
    # writer A: planned against v1, wins v2
    (
        docs.filter(third == 1)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out)
        .option("base_version", 1)
        .mode("append")
        .save()
    )
    # writer B: stale claim of v2 must lose...
    b_rows = docs.filter(third == 2).repartition(N_SHARDS, "doc_id")
    stale_conflicted = False
    try:
        (
            b_rows.write.format("jsonl_docs")
            .option("path", out)
            .option("base_version", 1)
            .mode("append")
            .save()
        )
    except Exception as exc:
        if not _is_commit_conflict(exc):
            raise
        stale_conflicted = True
    if not stale_conflicted:
        raise AssertionError("stale claim won — OCC broken")
    # ...then the retry loop refreshes the base and lands v3
    committed = append_with_retry(b_rows, out)
    if committed != 3:
        raise AssertionError(f"retry landed v{committed}, expected v3")
    back = spark.read.format("jsonl_docs").option("path", out).load()
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


def q_fmt_pyds_partitioned_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """METADATA-TRACKED PARTITIONED TABLE, value-checked end to end:
    write the documents corpus partitioned by ``lang``
    (``option("partition_by", "lang")`` — each task writes one shard
    per lang value, the commit records the value per shard in
    ``_STATS["_parts"]``) across two commits (evens v1, odds v2), then
    read back twice: an equality filter (one lang) and an IN filter
    (two langs), both of which push down and prune whole shards by
    partition value before any row is read.  At 100 TB partition
    pruning is the FIRST lever — a lang='en' filter over a corpus
    partitioned by lang should list en's shards, not scan the corpus.
    The oracle re-derives both aggregates from the parquet truth, so a
    pruning that drops a matching shard (wrong results) or the writer
    splitting rows into the wrong partition hash-mismatches; the
    pruned-shard COUNT and the never-prune-blind rule (compaction
    drops parts entries) are pytest-pinned."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_part_{tag}_{os.getpid()}"
    )
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)
    (
        docs.filter(F.col("doc_id") % 2 == 0)
        .repartition("lang")
        .write.format("jsonl_docs")
        .option("path", out).option("partition_by", "lang")
        .mode("overwrite").save()
    )
    (
        docs.filter(F.col("doc_id") % 2 == 1)
        .repartition("lang")
        .write.format("jsonl_docs")
        .option("path", out).option("partition_by", "lang")
        .option("base_version", 1).mode("append").save()
    )
    def agg(df: DataFrame, snap: str) -> DataFrame:
        return df.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        ).select(F.lit(snap).alias("probe"), "*")

    def fresh() -> DataFrame:
        # ONE load() PER FILTERED CONSUMER — the pushdown-sharing rule
        # (see JsonlDocsReader docstring): branching a single loaded
        # DataFrame under different filters executes both branches
        # against one reader's pruned partition list
        return spark.read.format("jsonl_docs").option("path", out).load()

    one = agg(fresh().filter(F.col("lang") == "en"), "eq")
    two = agg(fresh().filter(F.col("lang").isin("de", "fr")), "in")
    return one.unionByName(two)


SQL_FMT_PYDS_PARTITIONED = """
SELECT 'eq' AS probe, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM documents WHERE lang = 'en'
GROUP BY lang
UNION ALL
SELECT 'in', lang, COUNT(*), CAST(SUM(n_chars) AS BIGINT),
       MIN(doc_id), MAX(doc_id)
FROM documents WHERE lang IN ('de', 'fr')
GROUP BY lang
"""


def q_fmt_pyds_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECK CONSTRAINTS as lake commits, value-checked on the passing
    path: write evens (v1) → ADD ``n_chars >= 0`` (v2, pure-metadata
    commit through the OCC gate) → ADD ``lang IS NOT NULL`` (v3) →
    append odds (v4 — every row validated on the EXECUTOR before
    staging, one violation fails the job before any claim) → aggregate
    the constrained table, which must equal the full parquet truth.
    The enforcement failure path (violating batch commits NOTHING,
    merge staging enforced, ANSI NULL semantics, DROP) is pinned in
    tests/test_formats.py — a failure can't be oracle-checked."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_ck_{tag}_{os.getpid()}"
    )
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)
    (
        docs.filter(F.col("doc_id") % 2 == 0)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out).mode("overwrite").save()
    )
    add_constraint_jsonl_dir(out, "chars_nonneg", "n_chars >= 0")
    add_constraint_jsonl_dir(out, "lang_set", "lang IS NOT NULL")
    (
        docs.filter(F.col("doc_id") % 2 == 1)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out).option("base_version", 3)
        .mode("append").save()
    )
    back = spark.read.format("jsonl_docs").option("path", out).load()
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


SQL_FMT_PYDS_CONSTRAINTS = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM documents
GROUP BY lang
"""


#: lake-release fixture: mirror-duplicate evens %10==0, quality gate
#: n_chars >= 100, purge source 'src3'
LR_DUP_MOD, LR_MIN_CHARS, LR_PURGE_SRC = 10, 100, "src3"


def q_curation_lake_release(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """THE LAKE AND THE PIPELINE COMPOSED — a bronze→silver training-
    data release with a GDPR purge, every hop on the engine's own
    table format, value-checked end to end:

    1. BRONZE lands in two commits (evens, then odds plus planted
       mirror duplicates — same text, doc_id+100000).
    2. SILVER = bronze latest → exact text-dedup keeping the smallest
       doc_id (the mirrors lose by construction) → quality gate
       ``n_chars >= 100`` → written to a second lake table, which
       then gets that same gate as a CHECK constraint (future appends
       can't regress the release).
    3. GDPR PURGE: all of source 'src3' is deleted from silver with
       ``cdf=True`` — a metadata commit plus CDC pre-images.
    4. The result unions the silver LIVE aggregate with the purge's
       change-feed ``delete`` rows (the downstream-propagation
       witness: a subscriber syncing silver sees exactly the purged
       rows, typed).

    The oracle re-derives both halves from the parquet truth: a
    mirror surviving dedup, a quality leak, a purge that misses a row
    or leaks into the feed, all hash-mismatch."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    bronze = os.path.join(
        tempfile.gettempdir(), f"pu4spark_lr_bronze_{tag}_{os.getpid()}"
    )
    silver = os.path.join(
        tempfile.gettempdir(), f"pu4spark_lr_silver_{tag}_{os.getpid()}"
    )
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)
    evens = docs.filter(F.col("doc_id") % 2 == 0)
    (
        evens.repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", bronze).mode("overwrite").save()
    )
    mirrors = evens.filter(F.col("doc_id") % LR_DUP_MOD == 0).select(
        (F.col("doc_id") + F.lit(100000)).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    (
        docs.filter(F.col("doc_id") % 2 == 1)
        .unionByName(mirrors)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", bronze).option("base_version", 1)
        .mode("append").save()
    )
    b = spark.read.format("jsonl_docs").option("path", bronze).load()
    keep = b.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    curated = (
        b.join(keep, ["text", "doc_id"], "inner")  # smallest id per text
        .filter(F.col("n_chars") >= LR_MIN_CHARS)
        .select("doc_id", "text", "lang", "source", "n_chars")
    )
    (
        curated.repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", silver).mode("overwrite").save()
    )
    add_constraint_jsonl_dir(
        silver, "release_quality", f"n_chars >= {LR_MIN_CHARS}"
    )
    s = spark.read.format("jsonl_docs").option("path", silver).load()
    purge_keys = s.filter(F.col("source") == LR_PURGE_SRC).select(
        "doc_id"
    )
    v = delete_from_jsonl_dir(
        silver, purge_keys.repartition(2), spark=spark, cdf=True
    )
    live = (
        spark.read.format("jsonl_docs").option("path", silver).load()
    )

    def agg(df: DataFrame, half: str) -> DataFrame:
        return df.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        ).select(F.lit(half).alias("half"), "*")

    feed = table_changes_jsonl_dir(spark, silver, v - 1, v).filter(
        F.col("_change_type") == "delete"
    )
    return agg(live, "silver").unionByName(
        agg(feed.select("doc_id", "lang", "n_chars"), "purged")
    )


SQL_CURATION_LAKE_RELEASE = f"""
SELECT 'silver' AS half, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM documents
WHERE n_chars >= {LR_MIN_CHARS} AND source <> '{LR_PURGE_SRC}'
GROUP BY lang
UNION ALL
SELECT 'purged', lang, COUNT(*),
       CAST(SUM(n_chars) AS BIGINT), MIN(doc_id), MAX(doc_id)
FROM documents
WHERE n_chars >= {LR_MIN_CHARS} AND source = '{LR_PURGE_SRC}'
GROUP BY lang
"""


#: clone fixture predicates over the evens table
CLN_DEL_MOD, CLN_MERGE_MOD, CLN_BRANCH_DEL_MOD = 8, 4, 0


def q_fmt_pyds_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE, value-checked end to end: build a source with
    history (evens v1 → DELETE %10==8 v2 → MERGE %10==4 with
    n_chars+1000 v3), clone it ZERO-COPY (the clone's v1 manifest
    references the source's shards via ``_base_dir``; the tombstone
    ledger grafts with stamps normalized into (0,1) so copied entries
    keep their exact scope), then DIVERGE: delete %10==0 in the CLONE
    only.  The result unions the clone's live aggregate (source
    history applied + branch delete) with the source's (untouched by
    the branch).  The oracle re-derives both from the parquet truth,
    so a grafted tombstone over- or under-applying, a branch write
    leaking into the source, or a clone that re-copied data (pinned
    zero-data-files in pytest) all hash-mismatch."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    src = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_clsrc_{tag}_{os.getpid()}"
    )
    dst = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_cldst_{tag}_{os.getpid()}"
    )
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)
    evens = docs.filter(F.col("doc_id") % 2 == 0)
    (
        evens.repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", src).mode("overwrite").save()
    )
    delete_from_jsonl_dir(
        src,
        evens.filter(F.col("doc_id") % 10 == CLN_DEL_MOD)
        .select("doc_id")
        .repartition(2),
        base_version=1,
    )
    upserts = evens.filter(
        F.col("doc_id") % 10 == CLN_MERGE_MOD
    ).select(
        "doc_id",
        "text",
        "lang",
        "source",
        (F.col("n_chars") + F.lit(1000)).alias("n_chars"),
    )
    merge_into_jsonl_dir(spark, upserts.repartition(2, "doc_id"), src)
    clone_jsonl_dir(src, dst)
    delete_from_jsonl_dir(
        dst,
        evens.filter(F.col("doc_id") % 10 == CLN_BRANCH_DEL_MOD)
        .select("doc_id")
        .repartition(2),
    )

    def agg(path: str, half: str) -> DataFrame:
        return (
            spark.read.format("jsonl_docs")
            .option("path", path)
            .load()
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("sum_chars"),
                F.min("doc_id").alias("min_doc"),
                F.max("doc_id").alias("max_doc"),
            )
            .select(F.lit(half).alias("half"), "*")
        )

    return agg(dst, "branch").unionByName(agg(src, "source"))


SQL_FMT_PYDS_CLONE = f"""
SELECT 'branch' AS half, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN doc_id % 10 = {CLN_MERGE_MOD}
                     THEN n_chars + 1000 ELSE n_chars END) AS BIGINT)
         AS sum_chars,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM documents
WHERE doc_id % 2 = 0 AND doc_id % 10 <> {CLN_DEL_MOD}
      AND doc_id % 10 <> {CLN_BRANCH_DEL_MOD}
GROUP BY lang
UNION ALL
SELECT 'source', lang, COUNT(*),
       CAST(SUM(CASE WHEN doc_id % 10 = {CLN_MERGE_MOD}
                     THEN n_chars + 1000 ELSE n_chars END) AS BIGINT),
       MIN(doc_id), MAX(doc_id)
FROM documents
WHERE doc_id % 2 = 0 AND doc_id % 10 <> {CLN_DEL_MOD}
GROUP BY lang
"""


#: restore fixture predicates over the evens table
RST_DEL_MOD, RST_MERGE_MOD = 2, 6


def q_fmt_pyds_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE, value-checked end to end: build v1 (evens) → DELETE
    %10==2 (v2) → MERGE %10==6 with n_chars+1000 (v3) → RESTORE TO
    VERSION 1 (v4, a pure-metadata snapshot copy through the OCC
    gate).  The result unions read@latest (must equal the ORIGINAL
    evens exactly — deletes undone, merged values reverted) with
    read@v3 (history preserved: the pre-restore state stays
    time-travelable).  The oracle re-derives both from the parquet
    truth, so a restore that leaks the ledger, loses a shard, or
    clobbers history hash-mismatches.  Vacuumed-target and
    missing-file refusals plus the stream restart contract are
    pytest-pinned."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_rst_{tag}_{os.getpid()}"
    )
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)
    evens = docs.filter(F.col("doc_id") % 2 == 0)
    (
        evens.repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out).mode("overwrite").save()
    )
    delete_from_jsonl_dir(
        out,
        evens.filter(F.col("doc_id") % 10 == RST_DEL_MOD)
        .select("doc_id")
        .repartition(2),
        base_version=1,
    )
    upserts = evens.filter(
        F.col("doc_id") % 10 == RST_MERGE_MOD
    ).select(
        "doc_id",
        "text",
        "lang",
        "source",
        (F.col("n_chars") + F.lit(1000)).alias("n_chars"),
    )
    merge_into_jsonl_dir(spark, upserts.repartition(2, "doc_id"), out)
    v = restore_jsonl_dir(out, 1)
    if v != 4:
        raise AssertionError(f"restore committed v{v}, expected v4")

    def agg(df: DataFrame, snap: str) -> DataFrame:
        return df.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        ).select(F.lit(snap).alias("snapshot"), "*")

    restored = (
        spark.read.format("jsonl_docs").option("path", out).load()
    )
    pre = (
        spark.read.format("jsonl_docs")
        .option("path", out)
        .option("version", 3)
        .load()
    )
    return agg(restored, "restored").unionByName(agg(pre, "pre_restore"))


SQL_FMT_PYDS_RESTORE = f"""
SELECT 'restored' AS snapshot, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM documents WHERE doc_id % 2 = 0
GROUP BY lang
UNION ALL
SELECT 'pre_restore', lang, COUNT(*),
       CAST(SUM(CASE WHEN doc_id % 10 = {RST_MERGE_MOD}
                     THEN n_chars + 1000 ELSE n_chars END) AS BIGINT),
       MIN(doc_id), MAX(doc_id)
FROM documents
WHERE doc_id % 2 = 0 AND doc_id % 10 <> {RST_DEL_MOD}
GROUP BY lang
"""


#: history fixture predicates over the evens table
HIST_DEL_MOD, HIST_MERGE_MOD = 4, 8


def q_fmt_pyds_describe_history(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DESCRIBE HISTORY, value-checked end to end: build a 4-commit
    history — overwrite evens (v1, N_SHARDS files) → DELETE %10==4
    with ``cdf=True`` (v2, metadata commit + CDC pre-images) →
    fast-MERGE %10==8 upserts in 2 staged shards (v3) → COMPACT to 2
    files (v4, ledger cleared) — and return the history table built
    from MANIFEST METADATA ONLY (op name, physical file/row counts,
    ledger depth, CDC presence).  The oracle re-derives every count
    from the parquet truth: a commit site that forgets its op stamp, a
    merge that stages the wrong shard count, physical rows that drift
    from written rows, a ledger that doesn't clear on compaction, or
    CDC flagged on the wrong commit all hash-mismatch."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_hist_{tag}_{os.getpid()}"
    )
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)
    evens = docs.filter(F.col("doc_id") % 2 == 0)
    (
        evens.repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out).mode("overwrite").save()
    )
    delete_from_jsonl_dir(
        out,
        evens.filter(F.col("doc_id") % 10 == HIST_DEL_MOD)
        .select("doc_id")
        .repartition(2),
        base_version=1,
        spark=spark,
        cdf=True,
    )
    upserts = evens.filter(
        F.col("doc_id") % 10 == HIST_MERGE_MOD
    ).select(
        "doc_id",
        "text",
        "lang",
        "source",
        (F.col("n_chars") + F.lit(1000)).alias("n_chars"),
    )
    merge_into_jsonl_dir(spark, upserts.repartition(2, "doc_id"), out)
    compact_jsonl_dir(spark, out, target_shards=2)
    return describe_history_jsonl_dir(spark, out)


SQL_FMT_PYDS_DESCRIBE_HISTORY = f"""
SELECT CAST(1 AS BIGINT) AS version, 'overwrite' AS op,
       CAST({N_SHARDS} AS BIGINT) AS n_files,
       (SELECT COUNT(*) FROM documents WHERE doc_id % 2 = 0) AS n_rows,
       CAST(0 AS BIGINT) AS ledger_entries, FALSE AS has_cdc
UNION ALL
SELECT 2, 'delete', {N_SHARDS},
       (SELECT COUNT(*) FROM documents WHERE doc_id % 2 = 0),
       1, TRUE
UNION ALL
SELECT 3, 'merge', {N_SHARDS} + 2,
       (SELECT COUNT(*) FROM documents WHERE doc_id % 2 = 0)
       + (SELECT COUNT(*) FROM documents
          WHERE doc_id % 10 = {HIST_MERGE_MOD}),
       2, FALSE
UNION ALL
SELECT 4, 'compact', 2,
       (SELECT COUNT(*) FROM documents
        WHERE doc_id % 2 = 0 AND doc_id % 10 <> {HIST_DEL_MOD}),
       0, FALSE
"""


def q_fmt_pyds_sql_surface(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PURE-SQL access to the mini-lake — ``CREATE TEMPORARY VIEW ...
    USING jsonl_docs OPTIONS (...)``, the Spark-SQL surface a
    BI/notebook user drives without touching the DataFrame API: one
    view over the live table, one pinned ``version '1'`` (SQL time
    travel), both aggregated by a ``spark.sql`` statement.  The
    whole read path — view resolution, option plumbing, snapshot pin,
    manifest read — runs through Spark's SQL catalog; the oracle
    re-derives both snapshots from the parquet truth."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_sqls_{tag}_{os.getpid()}"
    )
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)
    (
        docs.filter(F.col("doc_id") % 2 == 0)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out).mode("overwrite").save()
    )
    (
        docs.filter(F.col("doc_id") % 2 == 1)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out).option("base_version", 1)
        .mode("append").save()
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW pyds_sql_lake "
        f"USING jsonl_docs OPTIONS (path '{out}')"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW pyds_sql_lake_v1 "
        f"USING jsonl_docs OPTIONS (path '{out}', version '1')"
    )
    return spark.sql(
        """
        SELECT 'pre' AS snapshot, lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        FROM pyds_sql_lake_v1 GROUP BY lang
        UNION ALL
        SELECT 'post', lang, COUNT(*),
               CAST(SUM(n_chars) AS BIGINT), MIN(doc_id), MAX(doc_id)
        FROM pyds_sql_lake GROUP BY lang
        """
    )


SQL_FMT_PYDS_SQL_SURFACE = """
SELECT 'pre' AS snapshot, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM documents WHERE doc_id % 2 = 0
GROUP BY lang
UNION ALL
SELECT 'post', lang, COUNT(*),
       CAST(SUM(n_chars) AS BIGINT), MIN(doc_id), MAX(doc_id)
FROM documents
GROUP BY lang
"""


#: CDF fixture predicates: deletes hit doc_id%9==0 (⊂ the %3==0 rows
#: live since v1), updates hit doc_id%12==3 minus the deleted ones,
#: merge-inserts hit doc_id%3==2 ∧ doc_id%5==0 (never live before)
CDF_DEL_MOD, CDF_UPD_MOD, CDF_INS_MOD = 9, 12, 5


def q_fmt_pyds_cdf_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH CHANGE DATA FEED, value-checked end to end: build a
    5-commit history — v1 seed (doc_id%3==0) → v2 append (%3==1) → v3
    DELETE (%9==0) → v4 MERGE (update %12==3 rows with n_chars+1000,
    insert %3==2 ∧ %5==0) → v5 COMPACT — then read
    ``table_changes(1, latest)`` and aggregate per (commit, change
    type).  The oracle re-derives every change set from the parquet
    truth: a preimage served with post values, a delete row leaking
    from the rewrite commit (v5 must contribute NOTHING — compaction
    is dataChange=false), or an update misclassified as
    insert+delete all hash-mismatch.  update_preimage rows must carry
    the ORIGINAL n_chars, update_postimage the +1000 values — both
    sums are checked."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    out = os.path.join(
        tempfile.gettempdir(), f"pu4spark_pyds_cdf_{tag}_{os.getpid()}"
    )
    register_pyds(spark)
    docs = load_table(spark, "documents", sf_dir)
    (
        docs.filter(F.col("doc_id") % 3 == 0)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out).mode("overwrite").save()
    )
    (
        docs.filter(F.col("doc_id") % 3 == 1)
        .repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out).option("base_version", 1)
        .mode("append").save()
    )
    delete_from_jsonl_dir(
        out,
        docs.filter(F.col("doc_id") % CDF_DEL_MOD == 0)
        .select("doc_id")
        .repartition(2),
        base_version=2,
    )
    updates = docs.filter(
        (F.col("doc_id") % CDF_UPD_MOD == 3)
        & (F.col("doc_id") % CDF_DEL_MOD != 0)
    ).select(
        "doc_id",
        "text",
        "lang",
        "source",
        (F.col("n_chars") + F.lit(1000)).alias("n_chars"),
    )
    inserts = docs.filter(
        (F.col("doc_id") % 3 == 2) & (F.col("doc_id") % CDF_INS_MOD == 0)
    )
    merge_into_jsonl_dir(
        spark, updates.unionByName(inserts).repartition(2, "doc_id"), out
    )
    compact_jsonl_dir(spark, out, target_shards=2)
    feed = table_changes_jsonl_dir(spark, out, starting_version=1)
    return feed.groupBy(
        F.col("_commit_version").alias("commit_version"),
        F.col("_change_type").alias("change_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


SQL_FMT_PYDS_CDF_READ = f"""
SELECT CAST(2 AS BIGINT) AS commit_version, 'insert' AS change_type,
       COUNT(*) AS n_rows, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM documents WHERE doc_id % 3 = 1
UNION ALL
SELECT CAST(3 AS BIGINT), 'delete', COUNT(*), CAST(SUM(n_chars) AS BIGINT),
       MIN(doc_id), MAX(doc_id)
FROM documents WHERE doc_id % {CDF_DEL_MOD} = 0
UNION ALL
SELECT CAST(4 AS BIGINT), 'update_preimage', COUNT(*), CAST(SUM(n_chars) AS BIGINT),
       MIN(doc_id), MAX(doc_id)
FROM documents
WHERE doc_id % {CDF_UPD_MOD} = 3 AND doc_id % {CDF_DEL_MOD} <> 0
UNION ALL
SELECT CAST(4 AS BIGINT), 'update_postimage', COUNT(*),
       CAST(SUM(n_chars + 1000) AS BIGINT), MIN(doc_id), MAX(doc_id)
FROM documents
WHERE doc_id % {CDF_UPD_MOD} = 3 AND doc_id % {CDF_DEL_MOD} <> 0
UNION ALL
SELECT CAST(4 AS BIGINT), 'insert', COUNT(*), CAST(SUM(n_chars) AS BIGINT),
       MIN(doc_id), MAX(doc_id)
FROM documents
WHERE doc_id % 3 = 2 AND doc_id % {CDF_INS_MOD} = 0
"""


QUERIES = {
    "fmt_pyds_jsonl_roundtrip": q_fmt_pyds_jsonl_roundtrip,
    "fmt_pyds_jsonl_write_roundtrip": q_fmt_pyds_jsonl_write_roundtrip,
    "fmt_pyds_snapshot_read": q_fmt_pyds_snapshot_read,
    "fmt_pyds_time_travel_ts": q_fmt_pyds_time_travel_ts,
    "fmt_pyds_compaction": q_fmt_pyds_compaction,
    "fmt_pyds_compaction_cluster": q_fmt_pyds_compaction_cluster,
    "fmt_pyds_snapshot_diff": q_fmt_pyds_snapshot_diff,
    "fmt_pyds_stats_pruning": q_fmt_pyds_stats_pruning,
    "fmt_pyds_commit_conflict": q_fmt_pyds_commit_conflict,
    "fmt_pyds_commit_retry": q_fmt_pyds_commit_retry,
    "fmt_pyds_delete_merge": q_fmt_pyds_delete_merge,
    "fmt_pyds_merge_clauses": q_fmt_pyds_merge_clauses,
    "fmt_pyds_schema_evolution": q_fmt_pyds_schema_evolution,
    "fmt_pyds_cdf_read": q_fmt_pyds_cdf_read,
    "fmt_pyds_partitioned_scan": q_fmt_pyds_partitioned_scan,
    "fmt_pyds_constraints": q_fmt_pyds_constraints,
    "fmt_pyds_describe_history": q_fmt_pyds_describe_history,
    "fmt_pyds_sql_surface": q_fmt_pyds_sql_surface,
    "curation_lake_release": q_curation_lake_release,
    "fmt_pyds_restore": q_fmt_pyds_restore,
    "fmt_pyds_clone": q_fmt_pyds_clone,
    "streaming_pyds_delete_feed": q_streaming_pyds_delete_feed,
    "streaming_pyds_cdf_feed": q_streaming_pyds_cdf_feed,
    "streaming_pyds_docs": q_streaming_pyds_docs,
    "streaming_pyds_snapshot": q_streaming_pyds_snapshot,
    "streaming_pyds_compaction_skip": q_streaming_pyds_compaction_skip,
    "streaming_pyds_lake_sink": q_streaming_pyds_lake_sink,
}
SQL_STREAMING_PYDS_DOCS = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM documents
GROUP BY lang
"""

ORACLE_SQL = {
    "fmt_pyds_jsonl_roundtrip": SQL_FMT_PYDS_JSONL_ROUNDTRIP,
    "fmt_pyds_jsonl_write_roundtrip": SQL_FMT_PYDS_JSONL_ROUNDTRIP,
    "fmt_pyds_snapshot_read": SQL_FMT_PYDS_SNAPSHOT_READ,
    # as-of-mid == pre-append truth; as-of-now == full corpus
    "fmt_pyds_time_travel_ts": SQL_FMT_PYDS_TIME_TRAVEL_TS,
    "fmt_pyds_compaction": SQL_FMT_PYDS_COMPACTION,
    # clustered rewrite is content-neutral; interval read post-OPTIMIZE
    "fmt_pyds_compaction_cluster": SQL_FMT_PYDS_COMPACTION_CLUSTER,
    "fmt_pyds_snapshot_diff": SQL_FMT_PYDS_SNAPSHOT_DIFF,
    "fmt_pyds_stats_pruning": SQL_FMT_PYDS_STATS_PRUNING,
    # post-conflict read@latest must equal the WINNING writer's content
    "fmt_pyds_commit_conflict": SQL_FMT_PYDS_COMMIT_CONFLICT,
    # after the retry lands, the table holds base + A + B exactly once
    "fmt_pyds_commit_retry": SQL_FMT_PYDS_COMMIT_CONFLICT,
    # pre-delete time travel = full corpus; latest = deletes applied,
    # merged rows replaced
    "fmt_pyds_delete_merge": SQL_FMT_PYDS_DELETE_MERGE,
    # all three MERGE clause forms in one commit; untouched matched
    # rows prove first-match-wins and the no-clause-taken case
    "fmt_pyds_merge_clauses": SQL_FMT_PYDS_MERGE_CLAUSES,
    # v1 time travel = old 5-col shape; latest = 6 cols, old rows
    # null-extended on the evolved column
    "fmt_pyds_schema_evolution": SQL_FMT_PYDS_SCHEMA_EVOLUTION,
    # batch CDF: per-commit insert/update_pre/update_post/delete sets,
    # compaction (v5) contributes nothing
    "fmt_pyds_cdf_read": SQL_FMT_PYDS_CDF_READ,
    # partitioned write + partition-pruned equality/IN reads
    "fmt_pyds_partitioned_scan": SQL_FMT_PYDS_PARTITIONED,
    # constrained writes on the passing path == full corpus truth
    "fmt_pyds_constraints": SQL_FMT_PYDS_CONSTRAINTS,
    # commit provenance from manifest metadata only
    "fmt_pyds_describe_history": SQL_FMT_PYDS_DESCRIBE_HISTORY,
    # CREATE TEMPORARY VIEW ... USING jsonl_docs, incl. SQL time travel
    "fmt_pyds_sql_surface": SQL_FMT_PYDS_SQL_SURFACE,
    # bronze→silver release + GDPR purge with CDF propagation witness
    "curation_lake_release": SQL_CURATION_LAKE_RELEASE,
    # RESTORE: latest == original state, pre-restore stays travelable
    "fmt_pyds_restore": SQL_FMT_PYDS_RESTORE,
    # zero-copy branch: grafted ledger exact, divergence isolated
    "fmt_pyds_clone": SQL_FMT_PYDS_CLONE,
    # lagging subscriber = non-retraction union; fresh = current state
    "streaming_pyds_delete_feed": SQL_STREAMING_PYDS_DELETE_FEED,
    # typed change rows per commit: snapshot inserts + CDC-file changes
    "streaming_pyds_cdf_feed": SQL_STREAMING_PYDS_CDF_FEED,
    # the incremental path must agree with the batch oracle
    "streaming_pyds_docs": SQL_STREAMING_PYDS_DOCS,
    # two checkpointed version-offset drains == batch truth; orphan
    # debris (poison lang) must never surface
    "streaming_pyds_snapshot": SQL_STREAMING_PYDS_DOCS,
    # rewrite commit skipped: no compacted row delivered twice
    "streaming_pyds_compaction_skip": SQL_STREAMING_PYDS_DOCS,
    # landing stream → sink commits → batch read == documents truth
    "streaming_pyds_lake_sink": SQL_STREAMING_PYDS_DOCS,
}
