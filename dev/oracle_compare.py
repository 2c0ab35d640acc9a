#!/usr/bin/env python3
"""Dev-side oracle compare: replicate the driver's correctness gate.

Reads /tmp/verify_out/<name>.parquet (Spark results) + oracle_sql.json,
runs each oracle SQL in DuckDB over views on the sf0.01 parquet tables,
sorts columns by name + rows by value, compares (floats via allclose).

STRICT dtype mode (default): a column whose numpy dtype FAMILY differs
between Spark and the oracle (e.g. int64 vs float64) fails with
DTYPE_MISMATCH before any value comparison.  The driver's gate hashes
TYPED values, so `91` (int64) != `91.0` (float64) even when every value
is numerically equal — this is the exact bug class that survived two
rounds because the old allclose path was weaker than the driver.
float32 vs float64 stay comparable (same family; pandas value hashing
agrees), but int-vs-float is a hard fail.  Set ORACLE_COMPARE_LAX=1 to
restore the old behavior for exploratory diffing.
"""
import json, sys, glob, os
import duckdb
import numpy as np
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
STRICT = os.environ.get("ORACLE_COMPARE_LAX", "") != "1"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

con = duckdb.connect()
for t in TABLES:
    p = os.path.join(SF_DIR, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(os.path.join(OUT_DIR, "oracle_sql.json")))

def dtype_family(dt):
    if np.issubdtype(dt, np.floating):
        return "float"
    if np.issubdtype(dt, np.integer):
        return "int"
    if np.issubdtype(dt, np.bool_):
        return "bool"
    return str(dt)

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify unhashable cells (arrays) for a stable sort
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if isinstance(v, (list, np.ndarray, dict)) else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def compare(name):
    spark_files = glob.glob(os.path.join(OUT_DIR, name, "*.parquet"))
    s = pd.concat([pd.read_parquet(f) for f in spark_files], ignore_index=True) \
        if spark_files else None
    if s is None:
        return ("NO_SPARK_OUT", None)
    if name not in oracles:
        return ("rows_only", len(s))
    o = con.execute(oracles[name]).df()
    if sorted(s.columns) != sorted(o.columns):
        return ("SCHEMA_MISMATCH", f"spark={sorted(s.columns)} oracle={sorted(o.columns)}")
    if len(s) != len(o):
        return ("ROWS_MISMATCH", f"spark={len(s)} oracle={len(o)}")
    s, o = canon(s), canon(o)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if STRICT and dtype_family(sv.dtype) != dtype_family(ov.dtype):
            return ("DTYPE_MISMATCH",
                    f"col={c} spark={sv.dtype} oracle={ov.dtype}")
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(ov.dtype, np.floating):
            sv = sv.astype(float).to_numpy(); ov = ov.astype(float).to_numpy()
            ok = np.allclose(sv, ov, rtol=1e-6, atol=1e-9, equal_nan=True)
        else:
            try:
                ok = sv.equals(ov) or (sv.astype(str) == ov.astype(str)).all()
            except Exception:
                ok = (sv.astype(str) == ov.astype(str)).all()
        if not ok:
            diff = None
            try:
                m = (sv.astype(str) != ov.astype(str))
                i = int(np.argmax(m.to_numpy())) if hasattr(m, "to_numpy") else 0
                diff = f"col={c} row{i}: spark={s[c].iloc[i]!r} oracle={o[c].iloc[i]!r}"
            except Exception:
                diff = f"col={c}"
            return ("HASH_MISMATCH", diff)
    return ("PASS", len(s))

names = sorted(d for d in os.listdir(OUT_DIR)
               if os.path.isdir(os.path.join(OUT_DIR, d)))
fails = 0
for n in names:
    try:
        status, detail = compare(n)
    except Exception as e:
        status, detail = ("ERROR", f"{type(e).__name__}: {e}")
    tag = "ok " if status in ("PASS", "rows_only") else "FAIL"
    if tag == "FAIL":
        fails += 1
    print(f"{tag} {n:28s} {status:15s} {detail}")
print(f"\n{len(names)} queries, {fails} failing")
sys.exit(1 if fails else 0)
