#!/usr/bin/env python3
"""Synthetic document corpora with ADVERSARIAL text shapes, for measuring
the LSH / stop-gram dispatcher thresholds beyond the driver-shaped corpus
(VERDICT r11 task 4). Deterministic (seed fixed per shape+size).

Shapes:
  boilerplate  unique ~28-token bodies drawn from a 50k vocabulary, with
               one of 3 shared 12-token boilerplate sentences appended to
               90% of docs — shared-window mass concentrates on a few
               templates (the suffix-array killer), and band minima often
               come from boilerplate shingles (hot LSH buckets).
  zipf         every token drawn Zipf(s≈1.07) from a 1500-word vocabulary
               — the vocabulary-limited regime where per-band minhash
               minima concentrate on the globally-common shingles and hot
               buckets grow as a linear corpus fraction.

Both shapes plant 2% near-dup pairs (a copy of an earlier doc with
1-2 token edits); the planted (a_id, b_id) list is WRITTEN alongside as
<out minus .parquet>.pairs.parquet so recall is measured against the
actual ground truth, not a reconstruction heuristic (r12 review: the
heuristic silently dropped hard planted pairs from the denominator).

Usage: gen_corpus.py <shape> <n_docs> <out.parquet>
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def gen(shape, n):
    rng = np.random.default_rng(42 + n + {"boilerplate": 0, "zipf": 1}[shape])
    texts = []
    if shape == "boilerplate":
        vocab = np.array([f"w{i}" for i in range(50000)])
        boiler = [
            "please subscribe to our newsletter for updates terms apply all rights reserved",
            "this page is for informational purposes only consult a professional before acting",
            "copyright two thousand twenty four example media group privacy policy applies here",
        ]
        for i in range(n):
            body = " ".join(rng.choice(vocab, size=28))
            if rng.random() < 0.9:
                texts.append(body + " " + boiler[int(rng.integers(3))])
            else:
                texts.append(body)
    elif shape == "zipf":
        v = 1500
        ranks = np.arange(1, v + 1)
        p = ranks ** -1.07
        p /= p.sum()
        vocab = np.array([f"z{i}" for i in range(v)])
        for i in range(n):
            texts.append(" ".join(rng.choice(vocab, size=40, p=p)))
    else:
        raise SystemExit(f"unknown shape {shape}")
    # plant 2% near-dups: doc i copies doc j<i with 1-2 token edits
    n_dup = n // 50
    dup_targets = rng.integers(0, n - n_dup, size=n_dup)
    pairs = []
    for k in range(n_dup):
        i = n - n_dup + k
        toks = texts[dup_targets[k]].split()
        for _ in range(int(rng.integers(1, 3))):
            toks[int(rng.integers(len(toks)))] = f"edit{k}"
        texts[i] = " ".join(toks)
        a, b = sorted((int(dup_targets[k]), i))
        pairs.append((a, b))
    return texts, pairs


def main():
    shape, n, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    texts, pairs = gen(shape, n)
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(t, out)
    pout = out[:-len(".parquet")] + ".pairs.parquet" \
        if out.endswith(".parquet") else out + ".pairs.parquet"
    pq.write_table(pa.table({
        "a_id": pa.array([a for a, _ in pairs], pa.int64()),
        "b_id": pa.array([b for _, b in pairs], pa.int64()),
    }), pout)
    print(f"{out}: {n} docs, shape={shape}, {len(pairs)} planted pairs, "
          f"avg_len={sum(len(x.split()) for x in texts) / n:.1f} tokens")


if __name__ == "__main__":
    main()
