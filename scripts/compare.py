#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads each <outDir>/<name> parquet dumped by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the
testdata parquet tables, then compares: row count, column names, and
values (exact, after sorting columns by name and rows by all columns).

Usage: python3 scripts/compare.py <sfDir> <outDir>
"""
import json
import os
import sys

import duckdb
import pandas as pd
import numpy as np

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
            df[c] = df[c].map(lambda v: tuple(v))
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def norm_cell(v):
    if isinstance(v, (np.floating, float)):
        return float(v)
    if isinstance(v, (np.integer, int)):
        return int(v)
    if isinstance(v, (list, np.ndarray)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = canon(pd.read_parquet(d))
        if name not in oracle:
            print(f"[rows-only] {name}: rows={len(got)} " + ("OK" if len(got) > 0 else "EMPTY!"))
            continue
        want = canon(con.execute(oracle[name]).df())
        errs = []
        if list(got.columns) != list(want.columns):
            errs.append(f"cols got={list(got.columns)} want={list(want.columns)}")
        elif len(got) != len(want):
            errs.append(f"rows got={len(got)} want={len(want)}")
        else:
            # The driver hashes raw values, so an int64 column vs the same
            # numbers as float64 (e.g. DuckDB HUGEINT window sums) is a
            # hash MISMATCH even though float(x) == int(x) — flag it here.
            for c in got.columns:
                gk, wk = got[c].dtype.kind, want[c].dtype.kind
                if {gk, wk} <= {"i", "u", "f"} and (gk == "f") != (wk == "f"):
                    errs.append(f"col {c}: dtype kind got={got[c].dtype} want={want[c].dtype}")
            for c in got.columns:
                gv = [norm_cell(x) for x in got[c]]
                wv = [norm_cell(x) for x in want[c]]
                bad = [i for i, (a, b) in enumerate(zip(gv, wv)) if a != b and not (a is None and b is None) and not (pd.isna(a) is True and pd.isna(b) is True)]
                if bad:
                    i = bad[0]
                    errs.append(f"col {c}: {len(bad)} diffs, first@{i}: got={gv[i]!r} want={wv[i]!r}")
        if errs:
            n_fail += 1
            print(f"[FAIL] {name}: " + "; ".join(errs[:3]))
        else:
            n_pass += 1
            print(f"[ok]   {name}: {len(got)} rows")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
