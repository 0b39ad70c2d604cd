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
# bug fails HERE, not only in the driver's artifact.
_DUCK_OK = {  # spark simpleString prefix -> acceptable duckdb types
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
}

def dtype_mismatches(sdf_schema, rel):
    duck = dict(zip(rel.columns, (str(t) for t in rel.types)))
    bad = []
    for f in sdf_schema.fields:
        st, dt = f.dataType.simpleString(), duck.get(f.name)
        if dt is None:
            bad.append((f.name, st, "<missing>"))
            continue
        if st.startswith("timestamp") and dt.startswith("TIMESTAMP"):
            continue
        if st.startswith("decimal") and dt.startswith("DECIMAL"):
            continue
        if st.startswith("array"):
            continue
        if st in _DUCK_OK and dt not in _DUCK_OK[st]:
            bad.append((f.name, st, dt))
    return bad

def norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def c(v):
        if isinstance(v, float):
            return "nan" if math.isnan(v) else round(v, 6)
        return v
    return sorted(cols), sorted([tuple(c(r[i]) for i in order) for r in rows], key=repr)

qs, os_ = E.queries(), E.oracle_sql()
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
