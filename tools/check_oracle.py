#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query result
parquet under OUTDIR, run the matching oracle SQL from oracle_sql.json in
DuckDB over the raw sf tables, sort columns by name + rows, and compare."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = bad = miss = 0
for name in sorted(oracle):
    path = f"{out_dir}/{name}"
    if not os.path.isdir(path):
        print(f"MISS  {name}: no spark output")
        miss += 1
        continue
    got = pd.read_parquet(path)
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}")
        bad += 1
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    status = []
    if list(got.columns) != list(exp.columns):
        status.append(f"cols {list(got.columns)} != {list(exp.columns)}")
    if len(got) != len(exp):
        status.append(f"rows {len(got)} != {len(exp)}")
    if not status:
        # array-valued cells (ndarray/list) are unhashable for sort keys —
        # sort on a stringified view, keep originals for comparison
        def sorted_frame(df):
            key = df.astype(str)
            order = key.sort_values(by=list(key.columns)).index
            return df.loc[order].reset_index(drop=True)
        gs = sorted_frame(got)
        es = sorted_frame(exp)
        try:
            gs = gs.astype(es.dtypes.to_dict())
        except Exception:
            pass
        for c in gs.columns:
            if not gs[c].equals(es[c]):
                neq = (gs[c].astype(str) != es[c].astype(str))
                if neq.any():
                    i = neq.idxmax()
                    status.append(
                        f"col {c} differs (dtype {gs[c].dtype} vs {es[c].dtype}) "
                        f"e.g. row {i}: {gs[c][i]!r} != {es[c][i]!r}")
    if status:
        print(f"FAIL  {name}: {'; '.join(status)}")
        bad += 1
    else:
        print(f"OK    {name} ({len(got)} rows)")
        ok += 1
print(f"\n{ok} ok, {bad} fail, {miss} missing of {len(oracle)}")
sys.exit(1 if (bad or miss) else 0)
