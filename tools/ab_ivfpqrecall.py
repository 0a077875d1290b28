"""A/B for ivfpq_recall's plan shape: current (cand lazily checkpointed,
consumed by BOTH the ncand aggregation and the ADC rerank, hits/ncand merged
by a final join) vs a LINEAR pipeline where the per-qid candidate count rides
the same window pass as the ADC rank (count over the unbounded frame — valid
because every candidate joins exactly one codes row), the exact baseline is
broadcast into the topk frame, and one groupBy emits the report row.

Removes: the cand localCheckpoint materialization, the separate ncand
aggregation branch, and the ncand<-hits join."""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from recsys_pipeline_spark.operators import pq, similarity  # noqa: E402
from recsys_pipeline_spark.queries_ext import (  # noqa: E402
    _ann_queries_df,
    _pq_frames,
    q_ivfpq_recall,
)


def linear(spark, sf_dir):
    e, cents, codes = _pq_frames(spark, sf_dir)
    queries = _ann_queries_df(spark, sf_dir)
    lut = pq.adc_lut(queries, cents)
    cand = similarity.ivf_sketch_candidates_multi(
        e, queries, cell_bits=3, n_probe=4, seed=7, with_vec=False
    ).select("qid", "vec_id")
    scored = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(lut), "qid")
        .select(
            "qid",
            "vec_id",
            pq.adc_score(F.col("codes"), F.col("lut")).alias("_adc"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("_adc").asc(), F.col("vec_id").asc())
    wc = Window.partitionBy("qid")
    topk = (
        scored.withColumn("rk", F.row_number().over(w))
        .withColumn("_nc", F.count(F.lit(1)).over(wc))
        .filter(F.col("rk") <= 10)
        .select("qid", "vec_id", "_nc")
    )
    exact = pq.l2_topk_for_queries(queries, e, k=10).select(
        "qid", "vec_id", F.lit(1).alias("_m")
    )
    return (
        topk.join(F.broadcast(exact), ["qid", "vec_id"], "left")
        .groupBy("qid")
        .agg(
            F.max("_nc").alias("n_cand"),
            F.sum(F.coalesce(F.col("_m"), F.lit(0))).alias("_hits"),
        )
        .select(
            "qid",
            "n_cand",
            (F.col("_hits") * 100000).cast("long").alias("recall_ppm"),
        )
    )


VARIANTS = {"current": q_ivfpq_recall, "linear": linear}
