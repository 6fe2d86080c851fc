"""Driver-style correctness self-check: run every ``queries()`` entry on
Spark and its ``oracle_sql()`` on DuckDB at sf0.01, compare row count +
columns + order-insensitive values.

Usage: python tools/check_oracle.py [query ...]   (default: all)
Env:   CHECK_SF_DIR (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if isinstance(v, Decimal):
        # Decimal stays Decimal (driver-grade strictness — no float
        # coercion that could mask a type mismatch); normalize() gives a
        # canonical exponent so '5' and '5.0' sort/compare identically
        return v.normalize()
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v


def rowset(rows):
    return sorted(
        (tuple(canon(v) for v in r) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


#: DuckDB type-string → canonical Spark-style type name.  HUGEINT /
#: UBIGINT deliberately map to names NO Spark type produces, so an
#: uncast SUM(BIGINT) oracle column can never silently "pass" — the
#: driver's hasher sees the physical type, so the self-check must too.
_DUCK_BASE = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "INT": "int",
    "SMALLINT": "smallint",
    "TINYINT": "tinyint",
    "HUGEINT": "hugeint",
    "UBIGINT": "ubigint",
    "UINTEGER": "uint",
    "DOUBLE": "double",
    "FLOAT": "float",
    "REAL": "float",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    "TIMESTAMP_NS": "timestamp",
    "BLOB": "binary",
}


def duck_canon_type(t: str) -> str:
    t = t.strip()
    if t.endswith("[]"):
        return f"array<{duck_canon_type(t[:-2])}>"
    u = t.upper()
    if u in _DUCK_BASE:
        return _DUCK_BASE[u]
    if u.startswith("DECIMAL"):
        return u.lower().replace(" ", "")
    return u.lower()


def spark_canon_type(simple: str) -> str:
    return simple.replace("timestamp_ntz", "timestamp")


def approx_equal(a, b, tol=1e-9):
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return abs(a - b) <= tol * max(1.0, abs(a), abs(b))
    return a == b


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    only = set(argv)
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results: dict[str, dict] = {}

    spark = (
        SparkSession.builder.appName("check_oracle")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    n_pass = n_fail = n_rows_only = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sorted(sdf.columns)
            stypes = {
                f.name: spark_canon_type(f.dataType.simpleString())
                for f in sdf.schema.fields
            }
            srows = [[r[c] for c in scols] for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            results[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": f"spark: {type(e).__name__}: {e}"[:300],
            }
            n_fail += 1
            continue
        if name not in oracles:
            status = "ok" if len(srows) >= 0 else "??"
            print(
                f"ROWS-ONLY {name}: {len(srows)} rows [{status}] "
                f"({time.time() - t0:.1f}s)"
            )
            results[name] = {
                "rows_match": None,
                "schema_match": None,
                "hash_match": None,
                "spark_rows": len(srows),
                "oracle_rows": None,
                "err": "no_oracle",
                "sec": round(time.time() - t0, 2),
            }
            n_rows_only += 1
            continue
        try:
            rel = con.sql(oracles[name])
            dcols_raw = list(rel.columns)
            dtypes = {
                c: duck_canon_type(str(t))
                for c, t in zip(rel.columns, rel.types)
            }
            drows_raw = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            results[name] = {
                "rows_match": None,
                "schema_match": None,
                "hash_match": False,
                "spark_rows": len(srows),
                "oracle_rows": None,
                "err": f"duckdb: {type(e).__name__}: {e}"[:300],
            }
            n_fail += 1
            continue
        dorder = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
        dcols = [dcols_raw[i] for i in dorder]
        drows = [[r[i] for i in dorder] for r in drows_raw]

        problems = []
        if scols != dcols:
            problems.append(f"columns differ: spark={scols} duckdb={dcols}")
        else:
            # driver-grade TYPE parity: the driver hashes the physical
            # output types, so an oracle HUGEINT/DOUBLE against a Spark
            # BIGINT is a failure even when every value is equal
            tdiff = {
                c: (stypes[c], dtypes[c])
                for c in scols
                if stypes[c] != dtypes[c]
            }
            if tdiff:
                problems.append(f"types differ: {tdiff}")
        if len(srows) != len(drows):
            problems.append(f"rowcount differs: spark={len(srows)} duckdb={len(drows)}")
        if not problems:
            sset, dset = rowset(srows), rowset(drows)
            exact = sset == dset
            if not exact:
                # find first difference, report with float tolerance info
                n_diff = 0
                first = None
                for a, b in zip(sset, dset):
                    if a != b:
                        n_diff += 1
                        if first is None:
                            first = (a, b)
                near = first is not None and all(
                    approx_equal(x, y, 1e-6) for x, y in zip(first[0], first[1])
                )
                problems.append(
                    f"values differ: {n_diff} rows (first spark={first[0]} "
                    f"duckdb={first[1]}; within-1e-6={near})"
                )
        results[name] = {
            "rows_match": len(srows) == len(drows),
            "schema_match": scols == dcols,
            "hash_match": not problems,
            "spark_rows": len(srows),
            "oracle_rows": len(drows),
            "err": " | ".join(problems)[:300] if problems else None,
            "sec": round(time.time() - t0, 2),
        }
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows ({time.time() - t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {json_out} ({len(results)} entries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
