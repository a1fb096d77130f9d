#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`: for each query
result parquet in <outDir>, runs the corresponding oracle SQL from
oracle_sql.json in DuckDB (with each testdata table registered as a view),
canonicalizes both sides (columns sorted by name, rows sorted, doubles
rounded to 1e-9), and compares hashes.

Usage: python3 tools/check_oracle.py <sfDir> <outDir> [--partial]
       [--json <path>]

--json writes the per-query verdict map the driver's correctness
artifact carries ({name: {rows_match, schema_match, hash_match, err}})
so the round's hard signal exists even if the driver-side snapshot is
lost (round 15, r14 verdict #2 — CORRECTNESS_r14.json landed empty).
The file is refused-empty by construction: it always carries one entry
per oracle query that produced a result parquet.
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == "float64" or df[c].dtype == "float32":
            df[c] = df[c].astype("float64").round(9)
        # normalize ints to int64 where possible
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    partial = "--partial" in sys.argv  # subset runs (SPARK_GRAFT_VERIFY_ONLY)
    verdicts = {}

    def record(name, rows=False, schema=False, hsh=False, err=None):
        verdicts[name] = {"rows_match": rows, "schema_match": schema,
                          "hash_match": hsh, "err": err}

    for name in sorted(oracle):
        res_path = f"{out_dir}/{name}"
        if not os.path.exists(res_path):
            if not partial:
                print(f"FAIL {name}: no spark result at {res_path}")
                record(name, err="no spark result (query threw in Verify)")
                n_fail += 1
            continue
        try:
            got = canon(pd.read_parquet(res_path))
            want = canon(con.sql(oracle[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            record(name, err=str(e)[:300])
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            record(name, err=f"columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            record(name, schema=True, err=f"rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        if not got.equals(want):
            neq = (got != want) & ~(got.isna() & want.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(got)} rows differ; first:")
            print(pd.concat([got[bad].head(3).add_suffix("_spark"),
                             want[bad].head(3).add_suffix("_duck")], axis=1))
            record(name, rows=True, schema=True,
                   err=f"{int(bad.sum())}/{len(got)} rows differ")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got)} rows)")
        record(name, rows=True, schema=True, hsh=True)
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    if "--json" in sys.argv:
        path = sys.argv[sys.argv.index("--json") + 1]
        assert verdicts, "refusing to write an empty verdict map"
        with open(path, "w") as f:
            json.dump({"n_pass": n_pass, "n_fail": n_fail,
                       "queries": verdicts}, f, indent=1, sort_keys=True)
        print(f"wrote {len(verdicts)} verdicts to {path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
