#!/usr/bin/env python3
"""Full-corpus oracle sweep → CORRECTNESS-style artifact.

Same comparison semantics as scripts/compare.py (the driver-gate
stand-in: row count, column names, exact values after canonical
sorting), but emits the driver's CORRECTNESS JSON shape so the sf0.1
sweep is a durable artifact, not a log. Queries with no oracle SQL are
recorded as rows-only entries (hash_match null), mirroring how the
driver records them.

Usage: python3 scripts/sweep_correctness.py <sfDir> <outDir> <artifact.json>

Expect ~45 min at sf0.1: the n²-style oracles (q40's Levenshtein
closure, d04 all-pairs hamming) are CPU-bound in DuckDB.
"""
import json
import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

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
    sf_dir, out_dir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        t0 = time.time()
        entry = {"rows_match": None, "schema_match": None,
                 "hash_match": None, "spark_rows": None,
                 "oracle_rows": None, "err": None, "oracle_sec": None}
        try:
            got = canon(pd.read_parquet(d))
            entry["spark_rows"] = int(len(got))
            if name not in oracle:
                # rows-only contract: the driver checks rows>0
                entry["rows_match"] = len(got) > 0
                entry["err"] = None if len(got) > 0 else "empty rows-only result"
                results[name] = entry
                print(f"[rows-only] {name}: rows={len(got)}", flush=True)
                continue
            want = canon(con.execute(oracle[name]).df())
            entry["oracle_rows"] = int(len(want))
            entry["oracle_sec"] = round(time.time() - t0, 1)
            entry["rows_match"] = len(got) == len(want)
            entry["schema_match"] = list(got.columns) == list(want.columns)
            ok = entry["rows_match"] and entry["schema_match"]
            if ok:
                for c in got.columns:
                    gk, wk = got[c].dtype.kind, want[c].dtype.kind
                    if {gk, wk} <= {"i", "u", "f"} and (gk == "f") != (wk == "f"):
                        ok = False
                        entry["err"] = f"col {c}: dtype kind mismatch"
                        break
                else:
                    for c in got.columns:
                        gv = [norm_cell(x) for x in got[c]]
                        wv = [norm_cell(x) for x in want[c]]
                        bad = [i for i, (a, b) in enumerate(zip(gv, wv))
                               if a != b and not (a is None and b is None)
                               and not (pd.isna(a) is True and pd.isna(b) is True)]
                        if bad:
                            ok = False
                            i = bad[0]
                            entry["err"] = (f"col {c}: {len(bad)} diffs, "
                                            f"first@{i}: got={gv[i]!r} want={wv[i]!r}")
                            break
            entry["hash_match"] = bool(ok)
            status = "ok" if ok else "FAIL"
            print(f"[{status}] {name}: {len(got)} rows "
                  f"({entry['oracle_sec']}s oracle)", flush=True)
        except Exception as e:
            entry["err"] = f"{type(e).__name__}: {e}"
            traceback.print_exc()
        results[name] = entry
        # incremental write: a killed sweep still leaves a partial artifact
        json.dump(results, open(artifact, "w"), indent=2)
    json.dump(results, open(artifact, "w"), indent=2)
    full = [n for n, e in results.items() if e["hash_match"]]
    rows_only = [n for n, e in results.items()
                 if e["hash_match"] is None and e["rows_match"]]
    bad = [n for n, e in results.items()
           if not (e["hash_match"] or (e["hash_match"] is None and e["rows_match"]))]
    print(f"== {len(full)} hash-green, {len(rows_only)} rows-only green, "
          f"{len(bad)} bad: {bad[:10]} ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
