#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py [sfdir] [outdir]
Runs each oracle SQL from outdir/oracle_sql.json against the same parquet
tables in DuckDB and compares with the Spark results (column-name-sorted,
row-sorted, exact values; floats reported both exact and isclose)."""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="first").reset_index(drop=True)
    return df

fails, passes, skips = [], [], []
# fail-closed universe: every ATTEMPTED query (queries.json — the full
# list Verify picked, including rows-only queries with no oracle entry)
# plus declared oracle keys plus every produced output dir. A query that
# died before writing is a FAIL, not silence (r7 verdict #2: iterating
# outdir alone hid 4 dead queries behind a "PASS 103, FAIL 0" banner;
# r8 verdict #2: oracle keys alone still hid rows-only deaths).
produced = [n for n in os.listdir(outdir)
            if os.path.isdir(os.path.join(outdir, n))]
qpath = os.path.join(outdir, "queries.json")
attempted = json.load(open(qpath)) if os.path.exists(qpath) else []
for name in sorted(set(produced) | set(oracle) | set(attempted)):
    d = os.path.join(outdir, name)
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    got = pq.read_table(files[0]).to_pandas()
    if name not in oracle:
        skips.append((name, len(got)))
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle sql error: {e}")); continue
    if sorted(got.columns) != sorted(exp.columns):
        fails.append((name, f"schema: spark={sorted(got.columns)} duck={sorted(exp.columns)}"))
        continue
    if len(got) != len(exp):
        fails.append((name, f"rows: spark={len(got)} duck={len(exp)}")); continue
    g, e = canon(got), canon(exp)
    bad = []
    for c in g.columns:
        gv, ev = g[c], e[c]
        if gv.dtype.kind == "f" or ev.dtype.kind == "f":
            gv2 = pd.to_numeric(gv, errors="coerce")
            ev2 = pd.to_numeric(ev, errors="coerce")
            eq = (gv2.isna() & ev2.isna()) | np.isclose(gv2, ev2, rtol=0, atol=0, equal_nan=True)
            exact = eq.all()
            close = ((gv2.isna() & ev2.isna()) | np.isclose(gv2, ev2, rtol=1e-9, equal_nan=True)).all()
            if not exact:
                bad.append((c, "float-exact" if close else "float-DIFF",
                            (gv2[~eq].head(3).tolist(), ev2[~eq].head(3).tolist())))
        else:
            gs = gv.astype(str).where(~gv.isna(), "<null>")
            es = ev.astype(str).where(~ev.isna(), "<null>")
            eq = gs == es
            if not eq.all():
                bad.append((c, "value-DIFF",
                            (gs[~eq].head(3).tolist(), es[~eq].head(3).tolist())))
    if bad:
        fails.append((name, bad))
    else:
        passes.append(name)

print(f"PASS ({len(passes)}):", " ".join(passes))
print(f"SKIP/rows-only ({len(skips)}):", " ".join(f"{n}[{r}]" for n, r in skips))
print(f"FAIL ({len(fails)}):")
for n, why in fails:
    print(f"  {n}: {why}")
sys.exit(1 if fails else 0)
