"""Simulate the driver's verify: smoke entry(), oracle-compare queries() at sf0.01."""
import math, sys, traceback
sys.path.insert(0, "/root/repo")
import duckdb
from grafeo_memory_spark.session import get_spark
import __spark_entry__ as E

spark = get_spark(app_name="driver-sim", shuffle_partitions=8)

# t1 smoke
df = E.entry(spark)
n = df.count()
print(f"SMOKE entry(): {n} rows, schema={df.schema.simpleString()}")
assert n >= 0

# t2 correctness at sf0.01
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

# The grading driver hashes collected values dtype-sensitively (a
# DuckDB HUGEINT reaches pandas as float64 and hash-mismatches Spark's
# int64 even when every value is equal — the group_by_session red rows
# of r5-r7). Compare logical column types up front so that class of
# bug fails HERE, not only in the driver's artifact. r9 (ADVICE r8 +
# VERDICT r8 item 7): positional alignment (duplicate names no longer
# collapse), unrecognized Spark types are REPORTED instead of skipped,
# array element types compare recursively, and decimal precision/scale
# must match exactly.
_DUCK_OK = {  # spark simpleString -> acceptable duckdb type names
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "tinyint": {"TINYINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "binary": {"BLOB"},
}

def _compat(st: str, dt: str):
    """Spark simpleString vs DuckDB type name; returns None when
    compatible, else a reason string."""
    dt = dt.strip()
    if st.startswith("array<") and st.endswith(">"):
        if not dt.endswith("[]"):
            return f"array vs {dt}"
        return _compat(st[6:-1], dt[:-2])
    if st.startswith("timestamp"):
        return None if dt.upper().startswith("TIMESTAMP") else f"timestamp vs {dt}"
    if st.startswith("decimal"):
        # exact precision/scale: decimal(12,2) must be DECIMAL(12,2)
        want = st.upper().replace(" ", "")
        got = dt.upper().replace(" ", "")
        return None if want == got else f"{st} vs {dt}"
    ok = _DUCK_OK.get(st)
    if ok is None:
        # map/struct/interval/... — the hash compare has no defined
        # dtype contract for these; surface them instead of skipping
        return f"unrecognized spark type {st!r} (duck {dt})"
    return None if dt.upper() in ok else f"{st} vs {dt}"

def dtype_mismatches(sdf_schema, rel):
    # positional over name-sorted fields on both sides: duplicate
    # column names align in order instead of collapsing in a dict
    sfields = sorted(
        ((f.name, f.dataType.simpleString()) for f in sdf_schema.fields),
    )
    dfields = sorted(zip(rel.columns, (str(t) for t in rel.types)))
    bad = []
    for i in range(max(len(sfields), len(dfields))):
        sn, st = sfields[i] if i < len(sfields) else ("<missing>", "-")
        dn, dt = dfields[i] if i < len(dfields) else ("<missing>", "-")
        if sn != dn:
            bad.append((sn, st, f"name mismatch vs duck {dn!r}"))
            continue
        reason = _compat(st, dt)
        if reason is not None:
            bad.append((sn, st, reason))
    return bad

def norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def c(v):
        if isinstance(v, float):
            return "nan" if math.isnan(v) else round(v, 6)
        return v
    return sorted(cols), sorted([tuple(c(r[i]) for i in order) for r in rows], key=repr)

qs, os_ = E.queries(), E.oracle_sql()
if len(sys.argv) > 1:  # optional: verify only the named queries
    wanted = set(sys.argv[1:])
    missing = wanted - qs.keys()
    assert not missing, f"unknown queries: {sorted(missing)}"
    qs = {k: v for k, v in qs.items() if k in wanted}
fails = 0
for name, fn in qs.items():
    try:
        sdf = fn(spark, SF)
        scols, srows = norm(sdf.columns, [tuple(r) for r in sdf.collect()])
        if name not in os_:
            print(f"ROWS-ONLY {name}: {len(srows)} rows")
            continue
        rel = con.sql(os_[name])
        tbad = dtype_mismatches(sdf.schema, rel)
        dcols, drows = norm(rel.columns, rel.fetchall())
        ok = scols == dcols and srows == drows and not tbad
        print(f"{'MATCH' if ok else 'MISMATCH'} {name}: spark={len(srows)} duck={len(drows)} cols={'ok' if scols==dcols else (scols,dcols)}"
              + (f" dtypes={tbad}" if tbad else ""))
        if not ok:
            fails += 1
            for a, b in list(zip(srows, drows))[:3]:
                if a != b: print("   spark:", a, "\n   duck :", b)
    except Exception:
        fails += 1
        print(f"ERROR {name}"); traceback.print_exc()
print("FAILS:", fails)
sys.exit(1 if fails else 0)
