#!/usr/bin/env python3
"""Dev-only differential checker mimicking the driver's correctness gate:
runs each oracle SQL in DuckDB over the sf parquet tables, compares with
the Verify parquet dump (columns sorted by name, values hashed).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
NOT part of the library — driver-side python/duckdb only.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical row order: sort by all columns stringified
    if len(df):
        key = df.astype(str).apply(lambda r: "|".join(r), axis=1)
        df = df.iloc[key.argsort(kind="stable")].reset_index(drop=True)
    return df

def cell(v):
    try:
        if v is None or (isinstance(v, float) and v != v) or pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    if isinstance(v, float):
        return f"{v:.10g}"
    return str(v)

def frame_hash(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.md5()
    for _, row in df.iterrows():
        h.update(("|".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()

def type_divergence(con, sql, spark_df):
    """Columns whose DuckDB output type will hash differently on the
    driver even when values match. The driver fetches DuckDB results via
    pandas: HUGEINT (uncast sum() over BIGINT) and DECIMAL become
    float64, which the driver stringifies as '123.0' against Spark's
    '123'. Our cell() collapses integral floats back with %.10g, so
    this class is invisible to the hash comparison — catch it by type.
    Returns [(col, duck_type)] for any HUGEINT, or DECIMAL/DOUBLE duck
    column whose Spark-side dtype is integral."""
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchdf()
    except Exception:
        return []
    bad = []
    for _, r in desc.iterrows():
        c, t = r["column_name"], str(r["column_type"]).upper()
        spark_integral = c in spark_df.columns and \
            str(spark_df[c].dtype).startswith(("int", "uint", "Int"))
        if "HUGEINT" in t or \
           (spark_integral and (t.startswith("DECIMAL") or t == "DOUBLE")):
            bad.append((c, t))
    return bad

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:]) or None
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res_dir = os.path.join(out_dir, name)
        parts = glob.glob(f"{res_dir}/*.parquet")
        if not parts:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = norm(pd.concat([pd.read_parquet(p) for p in parts]))
            duck_df = norm(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        ok_rows = len(spark_df) == len(duck_df)
        ok_cols = list(spark_df.columns) == list(duck_df.columns)
        ok_hash = ok_rows and ok_cols and \
            frame_hash(spark_df) == frame_hash(duck_df)
        tdiv = type_divergence(con, oracle[name], spark_df)
        if ok_hash and tdiv:
            # Value-identical here, but the driver's hasher will see
            # float64 vs int64 strings → driver-red. Fail loudly.
            n_fail += 1
            print(f"FAIL {name}: oracle type divergence (driver-red): "
                  + ", ".join(f"{c}:{t}" for c, t in tdiv)
                  + "  -> CAST(... AS BIGINT) in the oracle SQL")
        elif ok_hash:
            print(f"ok   {name} ({len(spark_df)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows {len(spark_df)}/{len(duck_df)} "
                  f"cols_match={ok_cols}")
            if not ok_cols:
                print(f"  spark cols: {list(spark_df.columns)}")
                print(f"  duck  cols: {list(duck_df.columns)}")
            elif ok_rows:
                diff = (spark_df.astype(str) != duck_df.astype(str))
                bad = diff.any(axis=1)
                idx = list(spark_df.index[bad])[:3]
                for i in idx:
                    print(f"  row {i} spark: {spark_df.loc[i].to_dict()}")
                    print(f"  row {i} duck : {duck_df.loc[i].to_dict()}")
    # rows-only queries (no oracle): just check output exists
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle and (not only or d in only):
            parts = glob.glob(f"{p}/*.parquet")
            n = sum(len(pd.read_parquet(x)) for x in parts) if parts else 0
            status = "ok  " if n > 0 else "FAIL"
            print(f"{status} {d} (rows-only, {n} rows)")
            if n > 0: n_pass += 1
            else: n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main())
