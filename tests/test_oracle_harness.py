"""The self-check harness itself must be at least as strict as the
driver (VERDICT r5 #1): type canonicalization maps DuckDB relation
types and Spark simpleStrings into one namespace where exactly the
driver-equal pairs collide — and HUGEINT/UBIGINT (DuckDB's silent
SUM-widening types, which no Spark plan ever produces) can never
alias a Spark type.
"""

from __future__ import annotations

import sys
from decimal import Decimal
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from check_oracle import canon, duck_canon_type, spark_canon_type  # noqa: E402


def test_duck_canon_matches_spark_simple_strings():
    pairs = [
        ("BIGINT", "bigint"),
        ("INTEGER", "int"),
        ("SMALLINT", "smallint"),
        ("DOUBLE", "double"),
        ("FLOAT", "float"),
        ("VARCHAR", "string"),
        ("BOOLEAN", "boolean"),
        ("DATE", "date"),
        ("TIMESTAMP", "timestamp"),
        ("TIMESTAMP WITH TIME ZONE", "timestamp"),
        ("DECIMAL(38,0)", "decimal(38,0)"),
        ("DECIMAL(12, 2)", "decimal(12,2)"),
        ("BIGINT[]", "array<bigint>"),
        ("VARCHAR[]", "array<string>"),
        ("DOUBLE[]", "array<double>"),
        ("BLOB", "binary"),
    ]
    for duck, spark in pairs:
        assert duck_canon_type(duck) == spark, duck


def test_hugeint_never_aliases_a_spark_type():
    # SUM(BIGINT) in DuckDB widens to HUGEINT; no Spark plan emits one.
    # The canon must keep it distinct from EVERY Spark numeric.
    for duck in ("HUGEINT", "UBIGINT", "UINTEGER"):
        c = duck_canon_type(duck)
        assert c not in {
            "bigint",
            "int",
            "smallint",
            "tinyint",
            "double",
            "float",
            "decimal(38,0)",
        }, duck


def test_spark_canon_timestamp_ntz_folds():
    assert spark_canon_type("timestamp_ntz") == "timestamp"
    assert spark_canon_type("array<bigint>") == "array<bigint>"


def test_canon_keeps_decimals_decimal():
    # driver-grade strictness: no silent Decimal->float coercion; equal
    # values with different stored exponents still compare/sort equal
    assert isinstance(canon(Decimal("5.0")), Decimal)
    assert canon(Decimal("5.0")) == canon(Decimal("5"))
    assert str(canon(Decimal("5.0"))) == str(canon(Decimal("5")))
    # floats stay floats (NaN canonicalized for sortability)
    assert canon(float("nan")) == "NaN"
    assert canon(0.5) == 0.5
