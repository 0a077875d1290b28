"""A/B for q_host_quality_filter: corpus join of docs_hosted x gate on
doc_id (current) vs host computed inline in the gate output (no corpus
join, one fewer documents scan)."""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from recsys_pipeline_spark.io import read_table  # noqa: E402
from recsys_pipeline_spark.operators import web as W  # noqa: E402
from recsys_pipeline_spark.operators.curation import quality_gate  # noqa: E402
from recsys_pipeline_spark.queries_web import (  # noqa: E402
    PR_ITERS,
    QF_DUP3_PPM_MAX,
    QF_MAX_TOKENS,
    QF_MIN_TOKENS,
    QF_MTL_MAX_X100,
    QF_MTL_MIN_X100,
    WEB_FANOUT,
    WEB_N_HOSTS,
    q_host_quality_filter,
)


def inline_host(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    edges = W.host_edges(d, "doc_id", WEB_N_HOSTS, fanout=WEB_FANOUT)
    hosts = spark.range(WEB_N_HOSTS).select(F.col("id").alias("host"))
    ranks = W.pagerank(edges, hosts, iters=PR_ITERS).select("host", "rank_scaled")
    uniform = W.PR_SCALE // WEB_N_HOSTS
    gate = quality_gate(
        d, "doc_id", "text",
        min_tokens=QF_MIN_TOKENS, max_tokens=QF_MAX_TOKENS,
        min_mtl_x100=QF_MTL_MIN_X100, max_mtl_x100=QF_MTL_MAX_X100,
        dup3_ppm_max=QF_DUP3_PPM_MAX,
    ).select(
        "doc_id",
        (F.col("doc_id") % WEB_N_HOSTS).cast("long").alias("host"),
        F.col("keep").alias("doc_ok"),
    )
    return (
        gate.join(F.broadcast(ranks), "host")
        .select(
            "doc_id",
            "host",
            "rank_scaled",
            F.when(F.col("rank_scaled") >= uniform, 1).otherwise(0).alias("host_ok"),
            "doc_ok",
            (
                F.when(F.col("rank_scaled") >= uniform, 1).otherwise(0)
                * F.col("doc_ok")
            ).alias("keep"),
        )
    )


VARIANTS = {
    "current": q_host_quality_filter,
    "inline_host": inline_host,
}
