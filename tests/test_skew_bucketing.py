"""Scale-utility tests: salted aggregation/join equivalence + bucketed
co-located joins with plan-level proof (no exchange on the bucketed side).
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from correlationapi_spark.io import load_tables
from correlationapi_spark.skew import salted_agg, salted_join, with_salt

from .conftest import SF_SMOKE


def test_salt_is_deterministic_and_bounded(spark):
    ev = load_tables(spark, SF_SMOKE)["events"]
    a = with_salt(ev, 16).select("event_id", "_salt")
    b = with_salt(ev, 16).select("event_id", "_salt")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    lo, hi = a.agg(F.min("_salt"), F.max("_salt")).collect()[0]
    assert 0 <= lo and hi <= 15


def test_salted_agg_equals_plain_agg(spark):
    ev = load_tables(spark, SF_SMOKE)["events"]
    plain = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
    salted = salted_agg(
        ev,
        ["event_type"],
        aggs=[
            F.sum("_pn").alias("n"),
            F.round(F.sum("_pt"), 2).alias("total"),
        ],
        partial_aggs=[
            F.count("*").alias("_pn"),
            F.sum("value").alias("_pt"),
        ],
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_equals_plain_join(spark):
    t = load_tables(spark, SF_SMOKE)
    plain = (
        t["events"]
        .join(t["customer"].select(F.col("c_custkey").alias("user_id"), "c_mktsegment"), "user_id")
        .groupBy("c_mktsegment")
        .count()
    )
    salted = (
        salted_join(
            t["events"],
            t["customer"].select(F.col("c_custkey").alias("user_id"), "c_mktsegment"),
            "user_id",
            n_salts=8,
        )
        .groupBy("c_mktsegment")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_ngram_hot_shingle_cap_bounds_candidates(spark):
    """On a skewed corpus, a boilerplate shingle shared by every document
    generates O(n²) candidate pairs; the df-cap drops it from candidate
    generation and the postings join stays bounded by TRUE overlap."""
    from correlationapi_spark.llm.dedup import ngram_jaccard_pairs

    n = 60
    boiler = "terms of service apply to all"
    rows = [(i, f"{boiler} doc{i} body{i} text{i} tail{i}") for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # threshold 0 surfaces every candidate pair the join generates
    uncapped = ngram_jaccard_pairs(docs, threshold=0.0, max_shingle_df=None).count()
    capped = ngram_jaccard_pairs(docs, threshold=0.0, max_shingle_df=10).count()
    assert uncapped == n * (n - 1) // 2  # the hot shingles pair everyone
    assert capped == 0  # only unique per-doc shingles remain

    # the "auto" DEFAULT: floor 100 keeps this 60-doc corpus uncapped...
    assert ngram_jaccard_pairs(docs, threshold=0.0).count() == uncapped
    # ...but a corpus whose hot shingle df exceeds the floor gets the
    # guard with no parameter from the caller
    big = spark.createDataFrame(
        [(i, f"{boiler} doc{i} body{i} text{i} tail{i}") for i in range(120)],
        "doc_id long, text string",
    )
    assert ngram_jaccard_pairs(big, threshold=0.0).count() == 0
    assert (
        ngram_jaccard_pairs(big, threshold=0.0, max_shingle_df=None).count()
        == 120 * 119 // 2
    )

    # the guard never changes which HIGH-similarity pairs are reported on
    # a corpus whose hot shingles stay under the cap (lower-bound rule)
    near = [(100, "alpha beta gamma delta epsilon zeta"),
            (101, "alpha beta gamma delta epsilon eta")]
    docs2 = spark.createDataFrame(near, "doc_id long, text string")
    plain = sorted(map(tuple, ngram_jaccard_pairs(docs2, 0.3).collect()))
    guarded = sorted(map(tuple, ngram_jaccard_pairs(docs2, 0.3, max_shingle_df=10).collect()))
    assert plain == guarded and len(plain) == 1


@pytest.fixture(scope="module")
def bucketed_warehouse(spark):
    """Write lineitem + orders bucketed by the join key into the session
    warehouse; bucketing pre-shuffles ONCE at write time."""
    t = load_tables(spark, SF_SMOKE)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    (
        t["lineitem"].write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_b")
    )
    (
        t["orders"].write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_b")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, bucketed_warehouse):
    """Co-located join: both sides bucketed on the key → SortMergeJoin with
    ZERO Exchange operators. At 100 TB this converts the hourly fact-fact
    join from two full shuffles to none."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try:
        j = (
            spark.table("li_b")
            .join(spark.table("ord_b"), F.col("l_orderkey") == F.col("o_orderkey"))
            .select("l_orderkey", "l_quantity", "o_totalprice")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:2000]
        # and it still answers correctly
        t = load_tables(spark, SF_SMOKE)
        want = (
            t["lineitem"].join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey")).count()
        )
        assert j.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_aqe_skew_join_splits_hot_partition(spark):
    """100 TB posture exhibit (round 8): AQE's runtime skew-join split —
    the complement of the engine's compile-time salting. A join key
    carrying 96% of the rows lands in one shuffle partition; with
    spark.sql.adaptive.skewJoin enabled, the FINAL adaptive plan
    re-reads that partition in slices (`AQEShuffleRead skewed`,
    `SortMergeJoin(skew=true)`) instead of serializing the join on one
    task. Thresholds are lowered (runtime SQL confs, restored after)
    because the defaults — 256 MB partition, factor 5× median — are
    sized for cluster shuffles, not a fixture; at real scale this fires
    with the defaults and no code change, which is exactly why declared
    queries don't hand-salt joins unless the salt must survive into the
    aggregate (skew.py module doc)."""
    conf = spark.conf
    keys = (
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
    )
    saved = {k: conf.get(k, None) for k in keys}
    try:
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "32KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        left = spark.range(500_000).select(
            F.when(F.col("id") < 480_000, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k2"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, F.col("k") == F.col("k2")).select(
            (F.col("v") + F.col("w")).alias("s")
        )
        assert len(j.collect()) == 500_000  # every row joins, none lost
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
