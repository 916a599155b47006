"""Synthetic scale-up generator for scale-consistency sweeps.

The driver's testdata tops out at sf0.1 (TESTDATA.md, read-only).
Size-dependent bugs — broadcast thresholds crossed, LSH band
blowups, skewed-key aggregations, driver-side caps — only show up
past that, so this tool synthesizes the SAME star schema at an
arbitrary scale factor, matching the driver tables' schemas and
value distributions (measured from /root/testdata/sf0.1 — see
docstrings per table). Oracle parity does not require identical
*data*, only identical schema/semantics: `tools/parity_check.py`
compares Spark vs DuckDB over whatever parquet it is pointed at.

Usage::

    python tools/gen_scale_data.py [sf] [outdir]
    # defaults: sf=1.0, outdir=/tmp/sdls_scale/sf{sf}

Row counts follow the TPC-H scaling the driver data uses
(sf0.1 -> lineitem 600k): customer 150k*sf, orders 1.5M*sf,
lineitem 6M*sf, supplier 10k*sf, part 200k*sf, events 1M*sf,
documents 50k*sf, embeddings 20k*sf. Deterministic at a given sf
(seed 42). Everything is vectorized numpy -> one pyarrow write per
table; sf1 generates in well under a minute.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["cold", "hot", "blue", "red", "small", "old", "new", "large"]
NOUNS = ["plate", "gear", "rod", "ring", "anvil", "bolt", "cap", "screw"]
EVENT_TYPES = ["click", "view", "signup", "purchase", "error"]
# The driver documents' 31-word vocabulary (measured at sf0.1).
DOC_VOCAB = [
    "sort", "value", "hash", "filter", "big", "dup", "part", "scan",
    "slow", "agg", "key", "window", "table", "merge", "join", "batch",
    "data", "column", "order", "a", "vector", "query", "row", "stream",
    "spark", "fast", "customer", "the", "line", "small", "group",
]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_W = [0.41, 0.14, 0.15, 0.15, 0.15]

DAY_US = 86_400_000_000  # microseconds


def _ts_array(us: np.ndarray) -> pa.Array:
    return pa.Array.from_pandas(us.astype("datetime64[us]"))


def _dates(rng, n: int, lo: str, hi: str) -> pa.Array:
    lo_d = np.datetime64(lo).astype("datetime64[D]").astype(np.int64)
    hi_d = np.datetime64(hi).astype("datetime64[D]").astype(np.int64)
    days = rng.integers(lo_d, hi_d + 1, n)
    return _ts_array(days * DAY_US)


def write(outdir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(outdir, f"{name}.parquet")
    pq.write_table(table, path, compression="snappy")
    print(f"{name}: {table.num_rows} rows -> {path}", flush=True)


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    outdir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/tmp/sdls_scale/sf{sf:g}"
    )
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(SEED)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_users = int(15_000 * sf)

    # region / nation — fixed dimension tables.
    write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    # customer: acctbal uniform [-1000, 10000), segment uniform.
    write(outdir, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))

    write(outdir, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    # part: "adj noun" names, Brand#1-25, retail 900 + (key%1000)/10.
    pk = np.arange(n_part, dtype=np.int64)
    write(outdir, "part", pa.table({
        "p_partkey": pk,
        "p_name": np.char.add(
            np.char.add(np.array(ADJS)[rng.integers(0, 8, n_part)], " "),
            np.array(NOUNS)[rng.integers(0, 8, n_part)],
        ),
        "p_brand": np.array(
            [f"Brand#{i}" for i in range(1, 26)]
        )[rng.integers(0, 25, n_part)],
        "p_type": np.array(PTYPES)[rng.integers(0, 6, n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": 900.0 + (pk % 1000) / 10.0,
    }))

    # orders: totalprice uniform [1000, 500000), date uniform
    # 1995-01-01..2001-08-01, status/priority uniform.
    write(outdir, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": np.array(["O", "F", "P"])[
            rng.integers(0, 3, n_ord)
        ],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _dates(rng, n_ord, "1995-01-01", "2001-08-01"),
        "o_orderpriority": np.array(PRIORITIES)[
            rng.integers(0, 5, n_ord)
        ],
    }))

    # lineitem: orderkey uniform (lines-per-order ~ Poisson(4), like
    # the driver data), linenumber uniform 1..7, quantity integral
    # 1..50, discount 0..0.10 step .01, tax 0..0.08 step .01.
    write(outdir, "lineitem", pa.table({
        "l_orderkey": rng.integers(0, n_ord, n_li),
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": np.array(["R", "N", "A"])[
            rng.integers(0, 3, n_li)
        ],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": _dates(rng, n_li, "1995-01-02", "2001-11-04"),
    }))

    # events: ts sorted uniform over 30 days of 2024-01 (microsecond
    # precision, like the driver data), value uniform [0, 560].
    base = np.datetime64("2024-01-01").astype("datetime64[us]").astype(
        np.int64
    )
    ts = np.sort(rng.integers(0, 30 * DAY_US, n_ev)) + base
    write(outdir, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": _ts_array(ts),
        "user_id": rng.integers(0, n_users, n_ev),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0, 560, n_ev), 2),
        "props": np.array(
            [json.dumps({"k": int(k)}) for k in range(100)]
        )[rng.integers(0, 100, n_ev)],
    }))

    # documents: bag-of-words over the 31-word vocab, 10..100 words,
    # ~0.2% planted exact duplicates (like the driver corpus) so the
    # dedup operators have real work at every scale.
    lens = rng.integers(10, 101, n_doc)
    flat = np.array(DOC_VOCAB)[rng.integers(0, len(DOC_VOCAB), lens.sum())]
    bounds = np.concatenate([[0], np.cumsum(lens)])
    texts = np.array(
        [" ".join(flat[bounds[i]:bounds[i + 1]]) for i in range(n_doc)],
        dtype=object,
    )
    n_dup = max(2, n_doc // 600)
    dup_dst = rng.choice(n_doc, n_dup, replace=False)
    dup_src = rng.choice(n_doc, n_dup, replace=True)
    texts[dup_dst] = texts[dup_src]
    write(outdir, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": pa.array(list(texts), pa.string()),
        "lang": np.array(LANGS)[
            rng.choice(5, n_doc, p=LANG_W)
        ],
        "source": np.array(
            [f"src{i}" for i in range(20)]
        )[rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    # embeddings: 10 unit-norm cluster centers, vec = normalize(
    # 0.8*center + 0.6*noise) -> unit-norm rows like the driver data.
    centers = rng.standard_normal((10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = 0.8 * centers[labels] + 0.6 * rng.standard_normal((n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write(outdir, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(
            list(vecs.astype(np.float32)), pa.list_(pa.float32())
        ),
        "label": labels.astype(np.int32),
    }))


if __name__ == "__main__":
    main()
