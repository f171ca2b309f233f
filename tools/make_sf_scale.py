"""Scale-up rehearsal data generator (round-5 verdict #6).

Builds an sf1-shaped dataset from the driver's sf0.1 testdata by
deterministic replication — /root/testdata is read-only and tops out
at sf0.1, so the 10x gate/bench rehearsal needs its own input. The
copies are NOT byte-identical clones (identical copies would create
pathological count ties and quadratic dedup blowups the real
distribution doesn't have):

- FACT tables scale; DIMENSIONS stay fixed (classic fact scaling):
  customer/supplier/part are copied once, and orders/lineitem/events
  keep their original custkey/partkey/suppkey/user_id values — 10x
  the rows per key, NOT 10x the key cardinality, which is what a
  bigger crawl of the same web looks like and keeps fixed-width
  sketch queries in the regime they were sized for;
- fact keys (o_orderkey, l_orderkey, event_id, doc_id, vec_id) get a
  per-copy offset so rows stay unique;
- fact tables drop a deterministic ~3% of rows per copy (hash-gated),
  so replicated groups get distinct counts instead of exact 10-way
  ties;
- document texts get a per-copy Caesar letter rotation: shingle and
  token statistics are preserved isomorphically (no manufactured
  ultra-common shingles — a word-suffix variant collapsed LSH buckets
  among copies), copies are disjoint from each other, and intra-copy
  near-dup structure is exactly the original's, so dedup work scales
  linearly;
- embeddings get a per-copy random ORTHOGONAL rotation: intra-copy
  geometry (cluster structure, pair densities) is preserved exactly,
  cross-copy cosines decorrelate to the random-pair tail.

Every table lands as a single <name>.parquet FILE (DuckDB-oracle
layout, same as the driver's testdata).

Usage: python tools/make_sf_scale.py [base_dir] [factor] [out_dir]
       defaults: /root/testdata/sf0.1 10 /tmp/sf1
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np

OFF = 1_000_000_000  # per-copy key offset; far above any base key
KEEP = 97  # i>0 copies keep hash%100 < KEEP rows (~3% dropped)

def copy_union(con, base, table, out, per_copy_select, factor):
    selects = []
    for i in range(factor):
        selects.append(per_copy_select(i, f"'{base}/{table}.parquet'"))
    q = " UNION ALL ".join(selects)
    con.execute(f"COPY ({q}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")

def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    t0 = time.time()

    # dimensions: single copy (fact scaling)
    for t in ("region", "nation", "customer", "supplier", "part"):
        con.execute(
            f"COPY (SELECT * FROM '{base}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )

    def drop(i, keycols):
        if i == 0:
            return ""
        return f" WHERE hash({keycols}, {i}) % 100 < {KEEP}"

    copy_union(
        con, base, "orders", out,
        lambda i, src: (
            f"SELECT o_orderkey + {OFF * i} AS o_orderkey, "
            f"o_custkey, "
            f"o_orderstatus, o_totalprice, "
            f"o_orderdate, o_orderpriority FROM {src}"
            + drop(i, "o_orderkey")
        ),
        factor,
    )
    copy_union(
        con, base, "lineitem", out,
        lambda i, src: (
            f"SELECT l_orderkey + {OFF * i} AS l_orderkey, "
            f"l_partkey, l_suppkey, l_linenumber, l_quantity, "
            f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
            f"l_shipdate FROM {src}"
            + drop(i, "l_orderkey, l_linenumber")
        ),
        factor,
    )
    copy_union(
        con, base, "events", out,
        lambda i, src: (
            f"SELECT event_id + {OFF * i} AS event_id, ts, "
            f"user_id, event_type, value, props "
            f"FROM {src}" + drop(i, "event_id")
        ),
        factor,
    )

    def doc_select(i, src):
        if i == 0:
            return (
                f"SELECT doc_id, text, lang, source, n_chars FROM {src}"
            )
        import string

        k = i % 25 + 1  # shift 1..25, never identity
        lo = string.ascii_lowercase
        up = string.ascii_uppercase
        shifted = lo[k:] + lo[:k] + up[k:] + up[:k]
        return (
            f"SELECT doc_id + {OFF * i} AS doc_id, "
            f"translate(text, '{lo + up}', '{shifted}') AS text, "
            f"lang, source, n_chars FROM {src}" + drop(i, "doc_id")
        )

    copy_union(con, base, "documents", out, doc_select, factor)

    # embeddings: per-copy orthogonal rotation, written via pyarrow
    import pyarrow as pa
    import pyarrow.parquet as pq

    e = con.execute(
        f"SELECT vec_id, embedding, label FROM '{base}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    vec_ids = np.array([r[0] for r in e], dtype=np.int64)
    vecs = np.array([r[1] for r in e], dtype=np.float64)
    labels = np.array([r[2] for r in e], dtype=np.int32)
    dim = vecs.shape[1]
    ids_out, vecs_out, labels_out = [], [], []
    for i in range(factor):
        if i == 0:
            rot = np.eye(dim)
        else:
            q, _ = np.linalg.qr(
                np.random.default_rng(1000 + i).normal(size=(dim, dim))
            )
            rot = q
        ids_out.append(vec_ids + OFF * i)
        vecs_out.append(vecs @ rot)
        labels_out.append(labels)
    allv = np.concatenate(vecs_out).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": np.concatenate(ids_out),
                "embedding": pa.array(list(allv), type=pa.list_(pa.float32())),
                "label": np.concatenate(labels_out),
            }
        ),
        f"{out}/embeddings.parquet",
    )

    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        n = con.execute(f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t:12s} {n:>10,}")
    print(f"done in {time.time() - t0:.1f}s -> {out}")

if __name__ == "__main__":
    main()
