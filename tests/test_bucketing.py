"""Bucketed co-located joins: two tables bucketed on the join key must
sort-merge-join with NO Exchange on either side (the write-time shuffle is
the last one the key ever pays)."""

from __future__ import annotations

import pytest

from recsys_pipeline_spark.io import read_table, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = read_table(spark, SF, "lineitem").select("l_orderkey", "l_extendedprice")
    o = read_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    write_bucketed(li, "t_li_bucketed", ["l_orderkey"], n_buckets=8)
    write_bucketed(o, "t_o_bucketed", ["o_orderkey"], n_buckets=8)
    yield "t_li_bucketed", "t_o_bucketed"
    spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS t_o_bucketed")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    li = spark.table(li_t)
    o = spark.table(o_t)
    # merge hint: keep the optimizer from broadcasting these (tiny) test
    # tables so the plan shape is the one a 100 TB fact-fact join would use
    joined = li.hint("merge").join(o, li.l_orderkey == o.o_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # and it still computes the right thing
    li0 = read_table(spark, SF, "lineitem")
    o0 = read_table(spark, SF, "orders")
    expected = li0.join(o0, li0.l_orderkey == o0.o_orderkey).count()
    assert joined.count() == expected


def test_bucketed_snapshot_diff_has_no_exchange(spark):
    """The incremental-reprocessing lever: daily snapshots bucketed
    identically on the key diff with ZERO exchanges — the md5 fingerprint
    projection is narrow (bucketing survives), so the full-outer merge join
    reads co-located buckets. At 100 TB the diff then costs one scan of
    each snapshot and no network beyond the digest rows."""
    from pyspark.sql import functions as F

    from recsys_pipeline_spark.operators.curation import snapshot_diff

    d = read_table(spark, SF, "documents").select("doc_id", "text", "lang")
    b = d.filter(F.col("doc_id") % 17 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0, F.concat(F.col("text"), F.lit(" rev2")))
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
    )
    write_bucketed(d, "t_snap_a", ["doc_id"], n_buckets=8)
    write_bucketed(b, "t_snap_b", ["doc_id"], n_buckets=8)
    try:
        diff = snapshot_diff(
            spark.table("t_snap_a").hint("merge"),
            spark.table("t_snap_b"),
            "doc_id",
            ["text", "lang"],
        )
        plan = diff._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin FullOuter" in plan or "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        statuses = {r["status"] for r in diff.collect()}
        assert statuses == {"removed", "changed"}
    finally:
        spark.sql("DROP TABLE IF EXISTS t_snap_a")
        spark.sql("DROP TABLE IF EXISTS t_snap_b")
