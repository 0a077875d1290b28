"""A/B for the membership-pass vector projection: ivfpq_recall pipeline
with the corpus membership shipping _v back through Arrow (old) vs id-only
(with_vec=False, current)."""
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


def old_withvec(spark, sf_dir):
    e, cents, codes = _pq_frames(spark, sf_dir)
    queries = _ann_queries_df(spark, sf_dir)
    lut = pq.adc_lut(queries, cents)
    cand = (
        similarity.ivf_sketch_candidates_multi(
            e, queries, cell_bits=3, n_probe=4, seed=7, with_vec=True
        )
        .select("qid", "vec_id")
        .localCheckpoint(eager=False)
    )
    scored = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(lut), "qid")
        .select(
            "qid", "vec_id",
            pq.adc_score(F.col("codes"), F.col("lut")).alias("_adc"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("_adc").asc(), F.col("vec_id").asc())
    topk = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("qid", "vec_id")
    )
    exact = pq.l2_topk_for_queries(queries, e, k=10).select("qid", "vec_id")
    hits = topk.join(exact, ["qid", "vec_id"]).groupBy("qid").agg(
        F.count(F.lit(1)).alias("_hits")
    )
    ncand = cand.groupBy("qid").agg(F.count(F.lit(1)).alias("n_cand"))
    return ncand.join(hits, "qid", "left").select(
        "qid", "n_cand",
        (F.coalesce(F.col("_hits"), F.lit(0)) * 100000).cast("long").alias("recall_ppm"),
    )


VARIANTS = {"old_withvec": old_withvec, "new_novec": q_ivfpq_recall}
