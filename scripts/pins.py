#!/usr/bin/env python3
"""Independent twin for the pinned-fixture oracles.

Three queries have no DuckDB-expressible oracle (zlib and an iterative
trainer), so their oracles pin values computed by THIS script — an
independent reimplementation of the operator semantics, not a port of
the Scala (deflate comes from CPython's zlib vs the JVM's; BPE is
rewritten from the Sennrich algorithm statement with the same
tie-breaks):

  t09  deflate(text, level=1) byte size per doc
  p19  BPE merge table (24 merges, minFreq 2, word-freq dict,
       tie-break (weight desc, pair asc in UTF-8 byte order))
  p20  per-doc BPE token count with the trained ranks
       (chars sorted by UTF-8 bytes, merged tokens earlier-wins,
       greedy lowest-rank-first encode)

Usage: python3 scripts/pins.py <sfDir>
Prints the CSV / VALUES fragments the oracle SQL embeds, one per
query, for that corpus. The oracle SQL selects the fragment matching
the corpus row count, so the same SQL is correct at every pinned SF.
"""
import sys
import zlib

import duckdb


def train(dict_rows, num_merges=24, min_freq=2):
    merges = []
    d = [(list(w), f) for w, f in dict_rows]
    for rank in range(num_merges):
        counts = {}
        for syms, f in d:
            for j in range(len(syms) - 1):
                k = (syms[j], syms[j + 1])
                counts[k] = counts.get(k, 0) + f
        if not counts:
            break
        (l, r), w = min(
            counts.items(),
            key=lambda kv: (-kv[1], kv[0][0].encode(), kv[0][1].encode()))
        if w < min_freq:
            break
        merges.append((rank, l, r, l + r, w))
        nd = []
        for syms, f in d:
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                    out.append(l + r)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            nd.append((out, f))
        d = nd
    return merges


def ranks(merges, base_chars):
    chars = sorted(set(
        [c for m in merges for c in m[3]] + list(base_chars)),
        key=lambda c: c.encode())
    base = {c: i for i, c in enumerate(chars)}
    table = dict(base)
    for rank, l, r, merged, w in merges:
        if merged not in table:
            table[merged] = len(base) + rank
    return table


def encode_word(word, table):
    syms = list(word)
    while len(syms) >= 2:
        best_idx, best_rank = -1, 1 << 60
        for j in range(len(syms) - 1):
            rk = table.get(syms[j] + syms[j + 1])
            if rk is not None and rk < best_rank:
                best_rank, best_idx = rk, j
        if best_idx < 0:
            break
        syms = (syms[:best_idx] + [syms[best_idx] + syms[best_idx + 1]]
                + syms[best_idx + 2:])
    return syms


def main():
    sf_dir = sys.argv[1]
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
        " ORDER BY doc_id").fetchall()
    n = len(docs)

    deflate = [len(zlib.compress(t.encode("utf-8"), 1)) for _, t in docs]
    print(f"== t09 deflate sizes ({n} docs) ==")
    print(",".join(str(x) for x in deflate))

    freq = {}
    for _, t in docs:
        for w in t.split(" "):
            if w:
                freq[w] = freq.get(w, 0) + 1
    merges = train(sorted(freq.items()))
    print(f"== p19 merge table ({len(merges)} merges) ==")
    print(",".join(f"({r},'{l}','{rr}','{m}',{w})"
                   for r, l, rr, m, w in merges))

    alphabet = set(c for w in freq for c in w)
    table = ranks(merges, alphabet)
    counts = [
        sum(len(encode_word(w, table)) for w in t.split(" ") if w)
        for _, t in docs]
    print(f"== p20 bpe token counts ({n} docs) ==")
    print(",".join(str(x) for x in counts))


if __name__ == "__main__":
    main()
