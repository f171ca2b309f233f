"""Local mini-driver: run each __spark_entry__ query against its DuckDB
oracle at a given sf dir and report row-count / schema / value matches —
the same comparison shape the real driver records in CORRECTNESS_r{N}.json.

Usage: python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from heavykeeper_rs_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # near-bit-exact: queries already ROUND() their float outputs,
        # so Spark and DuckDB must agree to 12 significant digits
        return float(f"{v:.12g}")
    if isinstance(v, int):
        return int(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return str(v)


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app="verify-oracle", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
        except Exception as e:  # record and continue, like the driver gate
            failures += 1
            msg = str(e).splitlines()[0][:200]
            print(f"{name}: ERR ({time.time() - t0:.1f}s) {msg}")
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows-only ({len(srows)} rows, {spark_t:.1f}s)")
            continue
        t1 = time.time()
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        oracle_t = time.time() - t1
        sc, sr = normalize(scols, srows)
        oc, orr = normalize(ocols, orows)
        ok_schema = sc == oc
        ok_rows = len(sr) == len(orr)
        ok_vals = sr == orr
        status = "OK" if (ok_schema and ok_rows and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name}: {status} (rows {len(sr)}/{len(orr)}, schema {ok_schema}, "
            f"vals {ok_vals}, {spark_t:.1f}s, oracle {oracle_t:.1f}s)"
        )
        if not ok_schema:
            print(f"  spark cols: {sc}\n  oracle cols: {oc}")
        if ok_schema and not ok_vals:
            diff = [(a, b) for a, b in zip(sr, orr) if a != b][:5]
            extra_s = [r for r in sr if r not in orr][:3]
            extra_o = [r for r in orr if r not in sr][:3]
            print(f"  first diffs: {diff}")
            print(f"  spark-only: {extra_s}\n  oracle-only: {extra_o}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
