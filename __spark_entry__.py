"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps one entry per implemented operator (SURVEY.md §2)
to a (spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` holds the
DuckDB-equivalent SQL. Sketch queries are run in their *exact regime*
(width*depth >> distinct keys, so HeavyKeeper degenerates to exact
counting — src/heavykeeper.rs:653-687) with key tie-breaking, making
them SQL-comparable; genuinely approximate runs are rows-only entries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from heavykeeper_rs_spark.functions import text as T
from heavykeeper_rs_spark.operators.topk import estimate, topk, topk_sketch

_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: HeavyKeeper top-20 most frequent tokens over documents
    (the word_count example lifted to a distributed corpus)."""
    return queries()["hk_topk_tokens"](spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _hk_topk_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return topk(ev, "event_type", k=5, width=1024, depth=4, tie_break_key=True)


def _hk_topk_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "user_str", F.col("user_id").cast("string")
    )
    return topk(ev, "user_str", k=20, width=65536, depth=4, tie_break_key=True)


def _hk_topk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(T.tokens("text")).alias("token"))
    return topk(toks, "token", k=20, width=65536, depth=4, tie_break_key=True)


def _hk_weighted_topk_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted add (src/heavykeeper.rs:273): top parts by total quantity."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("string").alias("pk"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    return topk(
        li, "pk", k=10, width=262144, depth=4, weight_col="q", tie_break_key=True
    )


def _hk_estimate_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-probe estimate() per distinct event_type (exact regime)."""
    ev = _t(spark, sf_dir, "events")
    sk = topk_sketch(ev, "event_type", k=50, width=4096, depth=4)
    distinct = ev.select("event_type").distinct()
    return (
        estimate(distinct, "event_type", sk)
        .select(F.col("event_type"), F.col("est_count").alias("cnt"))
    )


def _exact_topk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-truth twin of the flagship (groupBy.count.orderBy.limit —
    Spark's TakeOrderedAndProject path)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(T.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), "token")
        .limit(20)
        .select(F.col("token").alias("item"), "count")
    )


def _lineitem_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregation (map-side partial agg + exchange)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast join (small dim) + aggregation."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


def _top_sources_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 sources per lang: window row_number (top-K-per-group)."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    agg = docs.groupBy("lang", "source").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), "source")
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("lang", "source", "cnt", "rn")
        .orderBy("lang", "rn")
    )


def _token_stats_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: token counting per document, aggregated per lang."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("lang", T.token_count("text").alias("ntok"))
        .groupBy("lang")
        .agg(
            F.sum("ntok").alias("total_tokens"),
            F.round(F.avg("ntok"), 4).alias("avg_tokens"),
            F.count("*").alias("n_docs"),
        )
        .orderBy("lang")
    )


def _exact_dedup_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one representative doc per normalized-text hash."""
    docs = _t(spark, sf_dir, "documents")
    keyed = docs.select(
        T.doc_fingerprint("text").alias("fp"), F.col("doc_id")
    )
    return (
        keyed.groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("dup_count"))
        .orderBy("keep_doc_id")
        .select("keep_doc_id", "dup_count")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "hk_topk_event_type": _hk_topk_event_type,
        "hk_topk_user": _hk_topk_user,
        "hk_topk_tokens": _hk_topk_tokens,
        "hk_weighted_topk_part": _hk_weighted_topk_part,
        "hk_estimate_event_types": _hk_estimate_event_types,
        "exact_topk_tokens": _exact_topk_tokens,
        "lineitem_pricing_summary": _lineitem_pricing_summary,
        "revenue_by_segment": _revenue_by_segment,
        "top_sources_per_lang": _top_sources_per_lang,
        "token_stats_per_lang": _token_stats_per_lang,
        "exact_dedup_text": _exact_dedup_text,
    }


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

_TOKENS_SRC = (
    "SELECT t AS token FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS t "
    "FROM documents) WHERE length(t) <= 64"
)


def oracle_sql() -> dict[str, str]:
    return {
        "hk_topk_event_type": (
            "SELECT event_type AS item, COUNT(*) AS count FROM events "
            "GROUP BY 1 ORDER BY count DESC, item LIMIT 5"
        ),
        "hk_topk_user": (
            "SELECT CAST(user_id AS VARCHAR) AS item, COUNT(*) AS count FROM events "
            "GROUP BY 1 ORDER BY count DESC, item LIMIT 20"
        ),
        "hk_topk_tokens": (
            f"SELECT token AS item, COUNT(*) AS count FROM ({_TOKENS_SRC}) "
            "GROUP BY 1 ORDER BY count DESC, item LIMIT 20"
        ),
        "hk_weighted_topk_part": (
            "SELECT CAST(l_partkey AS VARCHAR) AS item, "
            "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS count FROM lineitem "
            "GROUP BY 1 ORDER BY count DESC, item LIMIT 10"
        ),
        "hk_estimate_event_types": (
            "SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY 1"
        ),
        "exact_topk_tokens": (
            f"SELECT token AS item, COUNT(*) AS count FROM ({_TOKENS_SRC}) "
            "GROUP BY 1 ORDER BY count DESC, item LIMIT 20"
        ),
        "lineitem_pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
            "ROUND(SUM(l_extendedprice), 2) AS sum_base_price, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
            "COUNT(*) AS count_order "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01' "
            "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"
        ),
        "revenue_by_segment": (
            "SELECT c_mktsegment, ROUND(SUM(o_totalprice), 2) AS revenue, "
            "COUNT(*) AS n_orders FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment ORDER BY c_mktsegment"
        ),
        "top_sources_per_lang": (
            "SELECT lang, source, cnt, rn FROM ("
            "  SELECT lang, source, cnt, CAST(ROW_NUMBER() OVER "
            "    (PARTITION BY lang ORDER BY cnt DESC, source) AS INT) AS rn"
            "  FROM (SELECT lang, source, COUNT(*) AS cnt FROM documents GROUP BY 1, 2)"
            ") WHERE rn <= 3 ORDER BY lang, rn"
        ),
        "token_stats_per_lang": (
            "SELECT lang, CAST(SUM(ntok) AS BIGINT) AS total_tokens, ROUND(AVG(ntok), 4) AS avg_tokens, "
            "COUNT(*) AS n_docs FROM ("
            "  SELECT lang, CAST(length(list_filter(regexp_extract_all(lower(text), '[a-z]+'), "
            "    t -> length(t) <= 64)) AS INT) AS ntok FROM documents"
            ") GROUP BY lang ORDER BY lang"
        ),
        "exact_dedup_text": (
            "SELECT MIN(doc_id) AS keep_doc_id, COUNT(*) AS dup_count FROM ("
            "  SELECT doc_id, hash(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp "
            "  FROM documents"
            ") GROUP BY fp ORDER BY keep_doc_id"
        ),
    }
