#!/usr/bin/env python3
"""Generate ONLY the documents + customer tables at a large scale factor
(the sf100 decade-validation inputs — VERDICT r12 §6). Same recipes and
distribution shapes as gen_sf.py, but without materializing the 600M-row
lineitem/orders tables the dispatcher soak never reads. NOT byte-identical
to a full gen_sf run at the same sf (the shared rng stream advances
differently); shape-identical, which is what the dispatcher thresholds
are in terms of.

Usage: gen_sf_partial.py <scale_factor> <outdir>
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("a agg batch big column customer data dup fast filter group hash "
         "join key line merge order part query row scan slow small sort "
         "spark stream table the value vector window").split()
LANGS = ["en"] * 4 + ["de", "es", "fr", "zh"]


def main(sf: float, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(4242)
    n_cust = int(150_000 * sf)
    n_doc = int(50_000 * sf)

    pq.write_table(pa.table(dict(
        c_custkey=np.arange(n_cust, dtype=np.int64),
        c_name=[f"Customer#{i:09d}" for i in range(n_cust)],
        c_nationkey=rng.integers(0, 25, n_cust).astype(np.int32),
        c_acctbal=np.round(rng.uniform(-999, 9999, n_cust), 2),
        c_mktsegment=np.array(["AUTOMOBILE", "BUILDING", "FURNITURE",
                               "HOUSEHOLD", "MACHINERY"])[
            rng.integers(0, 5, n_cust)],
    )), f"{out}/customer.parquet")
    print("customer", n_cust, flush=True)

    lens = rng.integers(10, 101, n_doc)
    words = rng.integers(0, 31, int(lens.sum()))
    texts, pos = [], 0
    for ln in lens:
        texts.append(" ".join(VOCAB[w] for w in words[pos:pos + ln]))
        pos += ln
    for i in range(0, n_doc // 500):  # duplicate pairs, as in gen_sf.py
        texts[(i * 997 + 1) % n_doc] = texts[(i * 499) % n_doc]
    pq.write_table(pa.table(dict(
        doc_id=np.arange(n_doc, dtype=np.int64),
        text=texts,
        lang=np.array(LANGS)[rng.integers(0, len(LANGS), n_doc)],
        source=[f"src{i}" for i in rng.integers(0, 20, n_doc)],
        n_chars=np.array([len(t) for t in texts], dtype=np.int64),
    )), f"{out}/documents.parquet")
    print("documents", n_doc, flush=True)


if __name__ == "__main__":
    main(float(sys.argv[1]), sys.argv[2])
