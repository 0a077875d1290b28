"""A/B for q_ann_recall_report: 4 membership passes (r15 shape) vs the r16
family-shared 2-pass restructure (current code)."""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from recsys_pipeline_spark.operators import similarity  # noqa: E402
from recsys_pipeline_spark.queries_ext import (  # noqa: E402
    ANN_HI_NPROBE,
    ANN_HI_TABLES,
    _ann_queries_df,
    _emb,
    q_ann_recall_report,
)


def old4(spark, sf_dir):
    e = _emb(spark, sf_dir)
    queries = _ann_queries_df(spark, sf_dir)
    exact = (
        similarity.topk_for_queries(queries, e, k=10)
        .select("qid", "vec_id")
        .localCheckpoint(eager=False)
    )

    def method_report(cand: DataFrame, method: str) -> DataFrame:
        cand = cand.localCheckpoint(eager=False)
        topk = similarity.rerank_topk(cand, queries, k=10).select("qid", "vec_id")
        hits = topk.join(F.broadcast(exact), ["qid", "vec_id"]).groupBy("qid").agg(
            F.count(F.lit(1)).alias("_hits")
        )
        ncand = cand.groupBy("qid").agg(F.count(F.lit(1)).alias("n_cand"))
        return ncand.join(F.broadcast(hits), "qid", "left").select(
            "qid",
            F.lit(method).alias("method"),
            "n_cand",
            (F.coalesce(F.col("_hits"), F.lit(0)) * 100000).cast("long").alias("recall_ppm"),
        )

    lsh_cand = similarity.sketch_candidates_multi(e, queries, bits=4, tables=6, seed=11)
    ivf_cand = similarity.ivf_sketch_candidates_multi(
        e, queries, cell_bits=3, n_probe=4, seed=7
    )
    lsh_hi_cand = similarity.sketch_candidates_multi(
        e, queries, bits=4, tables=ANN_HI_TABLES, seed=11
    )
    ivf_hi_cand = similarity.ivf_sketch_candidates_multi(
        e, queries, cell_bits=3, n_probe=ANN_HI_NPROBE, seed=7
    )
    return (
        method_report(lsh_cand, "lsh")
        .unionByName(method_report(ivf_cand, "ivf"))
        .unionByName(method_report(lsh_hi_cand, "lsh_hi"))
        .unionByName(method_report(ivf_hi_cand, "ivf_hi"))
    )


def new2(spark, sf_dir):
    return q_ann_recall_report(spark, sf_dir)


VARIANTS = {"old4": old4, "new2": new2}
