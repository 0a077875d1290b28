"""A/B for star_join_revenue: join-then-countDistinct (current) vs
pre-aggregate lineitem per orderkey, join the 1-row-per-order frames, and
count plain orderkeys (distinct by construction)."""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from recsys_pipeline_spark.io import read_table, spread  # noqa: E402
from recsys_pipeline_spark.queries import q_star_join_revenue  # noqa: E402


def preagg(spark, sf_dir):
    li = spread(read_table(spark, sf_dir, "lineitem"))
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    rev = (F.col("l_extendedprice").cast("decimal(28,6)")
           * (F.lit(1).cast("decimal(28,6)") - F.col("l_discount").cast("decimal(28,6)")))
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(rev).alias("_rev"),
        F.count(F.lit(1)).alias("_n"),
    )
    joined = (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.groupBy("r_name", "n_name")
        .agg(
            (F.sum("_rev") * 1_000_000).cast("long").alias("revenue_e6"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("_n").alias("n_rows"),
        )
    )


VARIANTS = {"current": q_star_join_revenue, "preagg": preagg}
