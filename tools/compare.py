#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare against the Spark parquet dumps.

Usage: python tools/compare.py <sfdir> <verify_outdir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize tz-aware -> naive, ns -> us
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = df[c]
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cmp(a: pd.DataFrame, b: pd.DataFrame):
    """returns (exact, close, msg)"""
    if a.shape != b.shape:
        return False, False, f"shape {a.shape} vs {b.shape}"
    if list(a.columns) != list(b.columns):
        return False, False, f"cols {list(a.columns)} vs {list(b.columns)}"
    exact = True; close = True; msg = []
    for c in a.columns:
        x, y = a[c].values, b[c].values
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            xf = a[c].astype(float).values; yf = b[c].astype(float).values
            eq = (xf == yf) | (np.isnan(xf) & np.isnan(yf))
            if not eq.all():
                exact = False
                cl = np.isclose(xf, yf, rtol=1e-9, atol=1e-12, equal_nan=True)
                if not cl.all():
                    close = False
                    i = int(np.argmin(cl))
                    msg.append(f"{c}: row{i} {xf[i]!r} vs {yf[i]!r}")
                else:
                    i = int(np.argmin(eq))
                    msg.append(f"{c}: inexact row{i} {xf[i]!r} vs {yf[i]!r}")
        else:
            eq = pd.Series(x).astype(object).eq(pd.Series(y).astype(object)) | (pd.Series(x).isna() & pd.Series(y).isna())
            if not eq.all():
                exact = False; close = False
                i = int(np.argmin(eq.values))
                msg.append(f"{c}: row{i} {x[i]!r} vs {y[i]!r}")
    return exact, close, "; ".join(msg[:3])

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_close = n_bad = 0
    for name, sql in sorted(oracle.items()):
        pdir = f"{outdir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no spark output"); n_bad += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: {e}"); n_bad += 1; continue
        exact, close, msg = cmp(norm(spark_df), norm(duck_df))
        if exact: print(f"OK    {name}"); n_ok += 1
        elif close: print(f"CLOSE {name}: {msg}"); n_close += 1
        else: print(f"FAIL  {name}: {msg}"); n_bad += 1
    print(f"\n{n_ok} exact, {n_close} close, {n_bad} fail / {len(oracle)}")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
