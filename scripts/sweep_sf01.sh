#!/usr/bin/env bash
# Repeatable sf0.1 oracle sweep (r9 advice #7): ONE command regenerates
# CORRECTNESS_SF01.json — the full-corpus correctness gate at the TIMED
# scale factor, not just the driver's sf0.01 gate.
#
#   scripts/sweep_sf01.sh [sfDir] [outDir] [artifact]
#
# Defaults: /root/testdata/sf0.1 → /tmp/verify_sf01 → CORRECTNESS_SF01.json
#
# Cost: the Verify dump is ~5 min; the DuckDB oracle replay is ~40 min,
# CPU-bound on the n²-style oracles (q40's Levenshtein closure, d04
# all-pairs hamming — run it in the background and don't mistake it for
# a hang). Oracles whose CTEs unroll greedy iterations use
# AS MATERIALIZED (DuckDB inlines CTEs; the tree grows exponentially
# with unroll depth and exhausts file handles otherwise) — that guard
# lives in the oracle SQL itself, nothing to pass here.
#
# Cadence: run after any round that touches operator semantics or
# oracle SQL, before committing the round's final artifact. The sf0.01
# gate (scripts/compare.py) stays the fast inner loop; THIS is the
# scale gate.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.1}"
OUT_DIR="${2:-/tmp/verify_sf01}"
ARTIFACT="${3:-CORRECTNESS_SF01.json}"

echo "[sweep_sf01] Verify dump: $SF_DIR -> $OUT_DIR"
rm -rf "$OUT_DIR"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR"

echo "[sweep_sf01] DuckDB oracle sweep (expect ~40 min at sf0.1)"
python3 scripts/sweep_correctness.py "$SF_DIR" "$OUT_DIR" "$ARTIFACT"

python3 - "$ARTIFACT" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
ok = sum(1 for v in d.values()
         if v.get("rows_match") and v.get("schema_match")
         and v.get("hash_match") in (True, None) and not v.get("err"))
print(f"[sweep_sf01] {ok}/{len(d)} green -> {sys.argv[1]}")
sys.exit(0 if ok == len(d) else 1)
EOF
