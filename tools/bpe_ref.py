#!/usr/bin/env python3
"""Reference BPE trainer/encoder (classic Sennrich-style, no end-of-word
marker) used ONCE to produce the committed merges fixture in
graft.functions.BpeVocab, and kept here so the fixture is reproducible.

Train: on the word-frequency distribution of the documents fixture at
sf0.01; each step merges the most frequent adjacent symbol pair (ties
broken by lexicographic pair order, so training is deterministic).
Encode: iteratively apply the lowest-rank applicable merge, replacing all
non-overlapping occurrences left to right — the canonical batch rule.

Usage: python3 tools/bpe_ref.py [n_merges] [sf_dir]
Prints the merges as Scala tuples and a few sample encodings.
"""
import sys
import duckdb


def train(word_freq, n_merges):
    vocab = {tuple(w): f for w, f in word_freq.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        # most frequent pair; deterministic lexicographic tiebreak
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = {}
        for sym, f in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            merged[tuple(out)] = merged.get(tuple(out), 0) + f
        vocab = merged
    return merges


def encode(word, ranks):
    sym = list(word)
    while len(sym) > 1:
        best, best_rank = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = (sym[i], sym[i + 1]), r
        if best is None:
            break
        out, i = [], 0
        while i < len(sym):
            if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                out.append(sym[i] + sym[i + 1])
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def main():
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    rows = con.execute(
        "SELECT w, count(*) FROM (SELECT unnest(string_split(text,' ')) w "
        f"FROM '{sf}/documents.parquet') GROUP BY w ORDER BY w"
    ).fetchall()
    wf = dict(rows)
    merges = train(wf, n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    print("// committed merges (rank order) — paste into BpeVocab.merges")
    for x, y in merges:
        print(f'    ("{x}", "{y}"),')
    print("\n// sample encodings")
    for w in sorted(wf):
        print(f"//   {w} -> {encode(w, ranks)}")


if __name__ == "__main__":
    main()
