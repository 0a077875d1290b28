"""A/B for the pagerank iteration shape on the host graph (600 nodes,
5 iters): the cost is per-iteration scheduling (3 broadcast-build jobs per
round), not compute.

Variants (all bit-identical integer algebra):
  current        - dangling agg -> crossJoin(broadcast), broadcast(ranks)
                   into contrib, broadcast(inflow) into update.
  win_dangling   - dangling share via a global window over the ranks frame
                   (no separate agg job + broadcast build per round).
  bedges         - edges broadcast ONCE outside the loop; contrib keys off
                   ranks directly; inflow joins back SMJ-style; dangling via
                   window. Zero per-iteration broadcast builds.
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from recsys_pipeline_spark.io import read_table  # noqa: E402
from recsys_pipeline_spark.operators import web as W  # noqa: E402
from recsys_pipeline_spark.queries_web import (  # noqa: E402
    PR_ITERS,
    WEB_FANOUT,
    WEB_N_HOSTS,
)

SCALE = W.PR_SCALE
DNUM, DDEN = W.PR_DAMP_NUM, W.PR_DAMP_DEN


def _inputs(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    edges = W.host_edges(d, "doc_id", WEB_N_HOSTS, fanout=WEB_FANOUT)
    hosts = spark.range(WEB_N_HOSTS).select(F.col("id").alias("host"))
    return edges, hosts


def current(spark, sf_dir):
    edges, hosts = _inputs(spark, sf_dir)
    return W.pagerank(edges, hosts, iters=PR_ITERS)


def win_dangling(spark, sf_dir):
    edges, hosts = _inputs(spark, sf_dir)
    n = hosts.count()
    edges = edges.localCheckpoint(eager=False)
    base = (DDEN - DNUM) * SCALE // (DDEN * n)
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ranks = hosts.join(
        F.broadcast(out_deg), hosts.host == out_deg.src, "left"
    ).select(
        "host", F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
        F.lit(SCALE // n).cast("long").alias("rank"),
    )
    w = Window.partitionBy()
    for _ in range(PR_ITERS):
        ranks = ranks.localCheckpoint(eager=False)
        contrib = edges.join(F.broadcast(ranks), edges.src == ranks.host).select(
            "dst", F.expr("rank DIV out_deg").alias("c")
        )
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("inflow"))
        share = F.expr(f"_dang DIV {n}")
        ranks = (
            ranks.withColumn(
                "_dang",
                F.coalesce(
                    F.sum(F.when(F.col("out_deg") == 0, F.col("rank"))).over(w),
                    F.lit(0),
                ),
            )
            .join(F.broadcast(inflow), ranks.host == inflow.dst, "left")
            .select(
                "host",
                "out_deg",
                (
                    F.lit(base)
                    + F.expr(
                        f"({DNUM} * (coalesce(inflow, 0) + (_dang DIV {n})))"
                        f" DIV {DDEN}"
                    )
                ).cast("long").alias("rank"),
            )
        )
    return ranks.select("host", "out_deg", F.col("rank").alias("rank_scaled"))


def bedges(spark, sf_dir):
    edges, hosts = _inputs(spark, sf_dir)
    n = hosts.count()
    edges = edges.localCheckpoint(eager=False)
    base = (DDEN - DNUM) * SCALE // (DDEN * n)
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ranks = hosts.join(
        F.broadcast(out_deg), hosts.host == out_deg.src, "left"
    ).select(
        "host", F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
        F.lit(SCALE // n).cast("long").alias("rank"),
    )
    w = Window.partitionBy()
    for _ in range(PR_ITERS):
        ranks = ranks.localCheckpoint(eager=False)
        contrib = F.broadcast(edges).join(ranks, edges.src == ranks.host).select(
            "dst", F.expr("rank DIV out_deg").alias("c")
        )
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("inflow"))
        ranks = (
            ranks.withColumn(
                "_dang",
                F.coalesce(
                    F.sum(F.when(F.col("out_deg") == 0, F.col("rank"))).over(w),
                    F.lit(0),
                ),
            )
            .join(inflow, ranks.host == inflow.dst, "left")
            .select(
                "host",
                "out_deg",
                (
                    F.lit(base)
                    + F.expr(
                        f"({DNUM} * (coalesce(inflow, 0) + (_dang DIV {n})))"
                        f" DIV {DDEN}"
                    )
                ).cast("long").alias("rank"),
            )
        )
    return ranks.select("host", "out_deg", F.col("rank").alias("rank_scaled"))


VARIANTS = {
    "current": current,
    "win_dangling": win_dangling,
    "bedges": bedges,
}
