"""The local correctness gate's dtype checker (scripts/verify_driver.py)
must catch every divergence class the driver's dtype-sensitive value
hash can see — including the ones the r8 version skipped: array element
types, decimal precision/scale, duplicate column names, and Spark types
it does not recognize (ADVICE r8 + VERDICT r8 item 7)."""

from __future__ import annotations

import duckdb
from pyspark.sql import types as T

# The script opens a SparkSession and runs the full gate at import, so
# exec only its dtype-checker section (from _DUCK_OK to `def norm(`).
_SRC = open("/root/repo/scripts/verify_driver.py").read()
_NS: dict = {}
exec(  # noqa: S102
    compile(
        _SRC[_SRC.index("_DUCK_OK = {"): _SRC.index("def norm(")],
        "verify_driver_dtype_section",
        "exec",
    ),
    _NS,
)
dtype_mismatches = _NS["dtype_mismatches"]


def _schema(*fields):
    return T.StructType([T.StructField(n, t) for n, t in fields])


def _rel(sql):
    return duckdb.connect().sql(sql)


def test_matching_scalars_pass():
    rel = _rel(
        "SELECT CAST(1 AS BIGINT) AS a, CAST(1.5 AS DOUBLE) AS b, 'x' AS c"
    )
    schema = _schema(
        ("a", T.LongType()), ("b", T.DoubleType()), ("c", T.StringType())
    )
    assert dtype_mismatches(schema, rel) == []


def test_hugeint_vs_bigint_fails():
    # the exact group_by_session bug class: un-cast DuckDB sum() HUGEINT
    rel = _rel("SELECT SUM(x) AS s FROM (SELECT 1 AS x)")
    schema = _schema(("s", T.LongType()))
    bad = dtype_mismatches(schema, rel)
    assert bad and bad[0][0] == "s"


def test_mistyped_array_element_fails():
    # VERDICT r8 item 7's acceptance check: an intentionally mis-typed
    # array column must fail the local gate
    rel = _rel("SELECT CAST([1, 2] AS BIGINT[]) AS v")
    ok = dtype_mismatches(_schema(("v", T.ArrayType(T.LongType()))), rel)
    assert ok == []
    bad = dtype_mismatches(_schema(("v", T.ArrayType(T.DoubleType()))), rel)
    assert bad and bad[0][0] == "v"


def test_decimal_precision_scale_strict():
    rel = _rel("SELECT CAST(1.50 AS DECIMAL(12,2)) AS d")
    ok = dtype_mismatches(_schema(("d", T.DecimalType(12, 2))), rel)
    assert ok == []
    bad = dtype_mismatches(_schema(("d", T.DecimalType(12, 3))), rel)
    assert bad and bad[0][0] == "d"


def test_unrecognized_spark_type_reported():
    rel = _rel("SELECT 1 AS m")
    bad = dtype_mismatches(
        _schema(("m", T.MapType(T.StringType(), T.LongType()))), rel
    )
    assert bad and "unrecognized" in bad[0][2]


def test_duplicate_names_do_not_collapse():
    # dict(zip(...)) used to keep only the LAST duplicate; positional
    # alignment must check both
    rel = _rel("SELECT 1 AS x, CAST(2.0 AS DOUBLE) AS x")
    ok = dtype_mismatches(
        _schema(("x", T.IntegerType()), ("x", T.DoubleType())), rel
    )
    assert ok == []
    bad = dtype_mismatches(
        _schema(("x", T.LongType()), ("x", T.DoubleType())), rel
    )
    assert bad


def test_extra_or_missing_columns_reported():
    rel = _rel("SELECT 1 AS a, 2 AS b")
    bad = dtype_mismatches(_schema(("a", T.IntegerType())), rel)
    assert bad  # duck has an extra column the Spark side lacks
