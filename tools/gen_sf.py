#!/usr/bin/env python3
"""Generate a scaled synthetic dataset matching the /root/testdata schema.

Usage: gen_sf.py <scale_factor> <outdir>   (e.g. gen_sf.py 1 /tmp/sf1)

Replicates the driver tables' schemas and distribution SHAPES (key
ranges scale linearly, categorical shares match, embeddings are
label-clustered unit vectors, documents draw from the same 31-word
vocab) so sf0.1 -> sf1 slope measurements are apples-to-apples. It is
NOT byte-identical to driver data — oracle hash checks still run on the
driver's own sf0.01.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("a agg batch big column customer data dup fast filter group hash "
         "join key line merge order part query row scan slow small sort "
         "spark stream table the value vector window").split()
assert len(VOCAB) == 31

LANGS = ["en"] * 4 + ["de", "es", "fr", "zh"]  # ~40% en like the driver mix
ETYPES = ["click", "error", "purchase", "signup", "view"]


def write(out, name, **cols):
    t = pa.table(dict(cols))
    pq.write_table(t, f"{out}/{name}.parquet")
    print(name, t.num_rows)


def main(sf: float, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(4242)
    n_li = int(6_000_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    # region / nation (fixed small dims)
    write(out, "region", r_regionkey=np.arange(5, dtype=np.int32),
          r_name=["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"])
    write(out, "nation", n_nationkey=np.arange(25, dtype=np.int32),
          n_name=[f"NATION_{i}" for i in range(25)],
          n_regionkey=(np.arange(25) % 5).astype(np.int32))

    write(out, "customer",
          c_custkey=np.arange(n_cust, dtype=np.int64),
          c_name=[f"Customer#{i:09d}" for i in range(n_cust)],
          c_nationkey=rng.integers(0, 25, n_cust).astype(np.int32),
          c_acctbal=np.round(rng.uniform(-999, 9999, n_cust), 2),
          c_mktsegment=np.array(["AUTOMOBILE", "BUILDING", "FURNITURE",
                                 "HOUSEHOLD", "MACHINERY"])[
              rng.integers(0, 5, n_cust)])
    write(out, "supplier",
          s_suppkey=np.arange(n_supp, dtype=np.int64),
          s_name=[f"Supplier#{i:09d}" for i in range(n_supp)],
          s_nationkey=rng.integers(0, 25, n_supp).astype(np.int32),
          s_acctbal=np.round(rng.uniform(-999, 9999, n_supp), 2))
    write(out, "part",
          p_partkey=np.arange(n_part, dtype=np.int64),
          p_name=[f"part {i} {VOCAB[i % 31]}" for i in range(n_part)],
          p_brand=np.array([f"Brand#{i}{j}" for i in range(1, 6)
                            for j in range(1, 6)])[rng.integers(0, 25, n_part)],
          p_type=np.array([f"TYPE {a} {b}" for a in "ABCDE" for b in "XYZ"])[
              rng.integers(0, 15, n_part)],
          p_size=rng.integers(1, 51, n_part).astype(np.int32),
          p_retailprice=np.round(rng.uniform(900, 2000, n_part), 2))

    day = np.timedelta64(86400, "s")
    epoch95 = np.datetime64("1995-01-01", "s")
    odate = epoch95 + rng.integers(0, 2404, n_ord) * day
    write(out, "orders",
          o_orderkey=np.arange(n_ord, dtype=np.int64),
          o_custkey=rng.integers(0, n_cust, n_ord).astype(np.int64),
          o_orderstatus=np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)],
          o_totalprice=np.round(rng.uniform(1000, 500000, n_ord), 2),
          o_orderdate=odate.astype("datetime64[us]"),
          o_orderpriority=np.array(["1-URGENT", "2-HIGH", "3-MEDIUM",
                                    "4-NOT SPECIFIED", "5-LOW"])[
              rng.integers(0, 5, n_ord)])

    lo = rng.integers(0, n_ord, n_li).astype(np.int64)
    lo.sort()  # lines cluster per order like the driver's layout
    write(out, "lineitem",
          l_orderkey=lo,
          l_partkey=rng.integers(0, n_part, n_li).astype(np.int64),
          l_suppkey=rng.integers(0, n_supp, n_li).astype(np.int64),
          l_linenumber=(rng.integers(0, 7, n_li) + 1).astype(np.int32),
          l_quantity=rng.integers(1, 51, n_li).astype(np.float64),
          l_extendedprice=np.round(rng.uniform(900, 105000, n_li), 2),
          l_discount=np.round(rng.integers(0, 11, n_li) * 0.01, 2),
          l_tax=np.round(rng.integers(0, 9, n_li) * 0.01, 2),
          l_returnflag=np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
          l_linestatus=np.array(["F", "O"])[rng.integers(0, 2, n_li)],
          l_shipdate=(epoch95 + rng.integers(1, 2500, n_li) * day)
          .astype("datetime64[us]"))

    sec = np.timedelta64(1, "s")
    t0 = np.datetime64("2024-01-01", "s")
    ts = t0 + rng.integers(11, 30 * 86400, n_ev) * sec
    ts.sort()
    write(out, "events",
          event_id=np.arange(n_ev, dtype=np.int64),
          ts=ts.astype("datetime64[us]"),
          user_id=rng.integers(0, int(15_000 * sf), n_ev).astype(np.int64),
          event_type=np.array(ETYPES)[rng.integers(0, 5, n_ev)],
          value=np.round(rng.exponential(80, n_ev), 2),
          props=[f'{{"k": {v}}}' for v in rng.integers(0, 100, n_ev)])

    # documents: 10-100 words from the 31-word vocab, a ~0.2% exact-dup
    # tail so dedup queries keep finding survivors
    lens = rng.integers(10, 101, n_doc)
    words = rng.integers(0, 31, int(lens.sum()))
    texts, pos = [], 0
    for ln in lens:
        texts.append(" ".join(VOCAB[w] for w in words[pos:pos + ln]))
        pos += ln
    for i in range(0, n_doc // 500):  # duplicate pairs
        texts[(i * 997 + 1) % n_doc] = texts[(i * 499) % n_doc]
    write(out, "documents",
          doc_id=np.arange(n_doc, dtype=np.int64),
          text=texts,
          lang=np.array(LANGS)[rng.integers(0, len(LANGS), n_doc)],
          source=[f"src{i}" for i in rng.integers(0, 20, n_doc)],
          n_chars=np.array([len(t) for t in texts], dtype=np.int64))

    # embeddings: unit vectors clustered around 10 label centroids
    labels = rng.integers(0, 10, n_emb).astype(np.int32)
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = centers[labels] * 2.0 + rng.normal(0, 1, (n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write(out, "embeddings",
          vec_id=np.arange(n_emb, dtype=np.int64),
          embedding=pa.array(list(vecs.astype(np.float32)),
                             type=pa.list_(pa.float32())),
          label=labels)


if __name__ == "__main__":
    main(float(sys.argv[1]), sys.argv[2])
