"""One-shot refactor: split sources/pydatasource.py into sources/lake/.

Routes every top-level block (def / class / assignment, with its
preceding comment lines) to one of seven modules, auto-computes the
cross-module imports by AST name analysis, and rewrites
sources/pydatasource.py as a compatibility shim re-exporting the whole
surface (tests and the registry import through it).
"""

from __future__ import annotations

import ast
import os
from collections import defaultdict

SRC = "pu4spark_spark/sources/pydatasource.py"
OUT = "pu4spark_spark/sources/lake"

ROUTE = {
    "protocol": [
        "DOCS_DDL", "N_SHARDS", "_json_cell", "ManifestCommitConflict",
        "_CONFLICT_SENTINEL", "_is_commit_conflict", "_write_atomic_excl",
        "_write_atomic", "_list_shards", "TXN_KEY", "TOMBSTONE_KEY",
        "_manifest_files", "_tombstones_of", "_tomb_sources_for",
        "_load_delete_keys", "_iter_jsonl", "_latest_manifest_version",
        "_version_as_of", "_manifest_at", "SCHEMA_KEY",
        "_typed_fields_of_ddl", "_fields_of_ddl", "_cell_converter",
        "_converters_of_ddl", "_effective_schema_ddl", "CONSTRAINT_KEY",
        "_CONSTRAINT_OPS", "_compile_constraint", "_constraints_of",
        "_earliest_manifest_version", "_rewrite_marker_valid",
        "BASE_DIR_KEY", "_shard_path", "OP_KEY", "CDC_KEY",
    ],
    "source": [
        "JsonlDocsDataSource", "_REGISTER_LOCK", "ensure_active_session",
        "register_pyds", "JsonlDocsWriter", "JsonlCommit",
        "_flatten_commits", "JsonlDocsStreamWriter", "JsonlDocsReader",
    ],
    "streaming": [
        "JsonlDocsStreamReader", "JsonlDocsVersionStreamReader",
        "JsonlDocsChangeFeedStreamReader",
    ],
    "maintenance": [
        "evolve_jsonl_schema", "add_constraint_jsonl_dir",
        "drop_constraint_jsonl_dir", "compact_jsonl_dir",
        "vacuum_jsonl_dir", "clone_jsonl_dir", "restore_jsonl_dir",
        "describe_history_jsonl_dir", "append_with_retry",
    ],
    "dml": [
        "_stage_sidecar_shards", "_stage_key_shards", "_with_cdc",
        "delete_from_jsonl_dir", "_stage_data_shards",
        "merge_into_jsonl_dir", "_merge_clauses",
    ],
    "cdf": [
        "CDF_BROADCAST_MAX_BYTES", "_files_bytes_under",
        "_read_sidecar_df", "_read_key_files_df",
        "table_changes_jsonl_dir",
    ],
    "queries_stream": [
        "q_streaming_pyds_docs", "q_streaming_pyds_lake_sink",
        "_versioned_lang_drain", "q_streaming_pyds_snapshot",
        "q_streaming_pyds_compaction_skip", "_versioned_lang_drain_opts",
        "q_streaming_pyds_delete_feed", "q_streaming_pyds_cdf_feed",
        "SQL_STREAMING_PYDS_CDF_FEED", "SQL_STREAMING_PYDS_DELETE_FEED",
        "SQL_STREAMING_PYDS_DOCS", "q_curation_lake_release",
        "SQL_CURATION_LAKE_RELEASE", "_jsonl_shard_dir",
        "FEED_DELETE_MOD", "CDFS_DEL_MOD", "LR_DUP_MOD",
    ],
    # everything else (q_* / SQL_* / QUERIES / ORACLE_SQL / helpers)
    # falls through to "queries"
}

DOCSTRINGS = {
    "protocol": '"""Mini-lake PROTOCOL core: manifest/versioning metadata,\n'
    "atomic-rename commit primitives, tombstone ledger, commit-scoped\n"
    "schema (DDL helpers + typed cell converters), CHECK-constraint\n"
    "compilation, rewrite markers, and shallow-clone path resolution.\n"
    "Pure functions over the on-disk layout — no Spark classes, no\n"
    'jobs.  Split from sources/pydatasource.py (r12)."""',
    "source": '"""The ``jsonl_docs`` Python DataSource (PySpark 4\n'
    "``spark.dataSource.register`` API): batch reader with pushdown +\n"
    "zonemap pruning, transactional batch writer (OCC manifest claim),\n"
    "exactly-once streaming sink, and per-session registration with\n"
    'thread pinning.  Split from sources/pydatasource.py (r12)."""',
    "streaming": '"""Streaming READERS over the mini-lake: landing-directory\n'
    "file feed, version stream (commit walk with rewrite skip +\n"
    "tombstone union), and the typed change-data-feed stream.  Split\n"
    'from sources/pydatasource.py (r12)."""',
    "maintenance": '"""Table MAINTENANCE + metadata commits: schema evolution,\n'
    "CHECK constraints add/drop, compaction (OPTIMIZE, with optional\n"
    "clustering), vacuum with retention grace, shallow CLONE, RESTORE,\n"
    "DESCRIBE HISTORY, and the commit-retry helper.  Split from\n"
    'sources/pydatasource.py (r12)."""',
    "dml": '"""Row-level DML on the mini-lake: DELETE (delete-file\n'
    "tombstones), MERGE (fast upsert + conditional clause form), the\n"
    "distributed sidecar/data-shard staging they share, and commit-time\n"
    'CDC file recording.  Split from sources/pydatasource.py (r12)."""',
    "cdf": '"""Batch CHANGE DATA FEED (Delta\'s ``table_changes``): exact\n'
    "serve from commit-time CDC files, else derivation from per-commit\n"
    "file diffs with size-gated broadcast joins.  Split from\n"
    'sources/pydatasource.py (r12)."""',
    "queries": '"""Registered BATCH lake queries + DuckDB oracles: every\n'
    "``fmt_pyds_*`` entry the driver checks, exercising the protocol\n"
    "end to end on real fixtures, plus the QUERIES/ORACLE_SQL registry\n"
    'for the whole lake.  Split from sources/pydatasource.py (r12)."""',
    "queries_stream": '"""Registered STREAMING lake queries + the composed\n'
    "``curation_lake_release`` pipeline: microbatch drains of the\n"
    "landing/version/CDF stream readers, the lake streaming sink, and\n"
    'their DuckDB oracles.  Split from sources/pydatasource.py (r12)."""',
}

BASE_IMPORTS = """
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
"""

src = open(SRC).read()
lines = src.splitlines(keepends=True)
tree = ast.parse(src)

# top-level blocks: each node owns preceding comment/blank lines
blocks = []  # (name, start_line0, end_line0_exclusive)
nodes = [n for n in tree.body if not isinstance(n, (ast.Import, ast.ImportFrom))]
# skip module docstring
if isinstance(nodes[0], ast.Expr) and isinstance(nodes[0].value, ast.Constant):
    nodes = nodes[1:]

prev_end = 40  # line after the import header (1-indexed end of imports)
import_end = max(
    n.end_lineno for n in tree.body if isinstance(n, (ast.Import, ast.ImportFrom))
)
prev_end = import_end


def node_name(n):
    if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        return n.name
    if isinstance(n, ast.Assign) and len(n.targets) == 1 and isinstance(
        n.targets[0], ast.Name
    ):
        return n.targets[0].id
    if isinstance(n, ast.AnnAssign) and isinstance(n.target, ast.Name):
        return n.target.id
    if isinstance(n, ast.Assign) and isinstance(n.targets[0], ast.Tuple):
        return n.targets[0].elts[0].id  # route by first name
    raise SystemExit(f"unroutable node at line {n.lineno}: {ast.dump(n)[:80]}")


for n in nodes:
    start = getattr(n, "decorator_list", None)
    first = min([n.lineno] + [d.lineno for d in (start or [])])
    blocks.append((node_name(n), prev_end, n.end_lineno))
    prev_end = n.end_lineno

route_of = {}
for mod, names in ROUTE.items():
    for nm in names:
        route_of[nm] = mod

per_mod = defaultdict(list)
for name, s, e in blocks:
    mod = route_of.get(name, "queries")
    per_mod[mod].append((name, s, e))

defined_in = {}
for mod, blks in per_mod.items():
    for name, s, e in blks:
        defined_in[name] = mod
        # tuple assignments define additional names
        for n in ast.parse("".join(lines[s:e])).body:
            if isinstance(n, ast.Assign) and isinstance(
                n.targets[0], ast.Tuple
            ):
                for el in n.targets[0].elts:
                    defined_in[el.id] = mod

os.makedirs(OUT, exist_ok=True)

bodies = {}
for mod, blks in per_mod.items():
    body = "".join("".join(lines[s:e]) for _, s, e in blks)
    bodies[mod] = body

# compute cross-module imports by AST name reference
for mod, body in bodies.items():
    mt = ast.parse(BASE_IMPORTS + body)
    referenced = {
        nd.id
        for nd in ast.walk(mt)
        if isinstance(nd, ast.Name) and isinstance(nd.ctx, ast.Load)
    }
    needs = defaultdict(set)
    for nm in referenced:
        other = defined_in.get(nm)
        if other and other != mod:
            needs[other].add(nm)
    imp = ""
    for other in sorted(needs):
        names = ",\n    ".join(sorted(needs[other]))
        imp += f"from pu4spark_spark.sources.lake.{other} import (\n    {names},\n)\n"
    header = DOCSTRINGS[mod] + "\n" + BASE_IMPORTS + imp + "\n"
    with open(f"{OUT}/{mod}.py", "w") as fh:
        fh.write(header + body)

# circular-import sanity: build module dep graph and check for cycles
deps = {}
for mod, body in bodies.items():
    mt = ast.parse(open(f"{OUT}/{mod}.py").read())
    deps[mod] = {
        nd.module.rsplit(".", 1)[1]
        for nd in ast.walk(mt)
        if isinstance(nd, ast.ImportFrom)
        and nd.module
        and nd.module.startswith("pu4spark_spark.sources.lake.")
    }


def cyclic(g):
    WHITE, GRAY, BLACK = 0, 1, 2
    color = {m: 0 for m in g}

    def visit(m, path):
        color[m] = GRAY
        for d in g.get(m, ()):
            if color.get(d) == GRAY:
                raise SystemExit(f"IMPORT CYCLE: {path + [d]}")
            if color.get(d) == WHITE:
                visit(d, path + [d])
        color[m] = BLACK

    for m in g:
        if color[m] == WHITE:
            visit(m, [m])


cyclic(deps)
print("deps:", {m: sorted(d) for m, d in deps.items()})
print("lines:", {m: bodies[m].count("\n") for m in bodies})
print("OK")
