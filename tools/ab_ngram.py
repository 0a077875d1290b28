"""A/B for ngram_jaccard_pairs candidate generation: self-join of the full
mining pipeline (plan shows BOTH sides executing scan->explode->collect_set->
window — the broadcast side breaks exchange reuse) vs groupBy-collect within
the df-capped gram (state bounded at max_df) + chained pair explode."""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from recsys_pipeline_spark.operators import dedup  # noqa: E402
from recsys_pipeline_spark.operators.dedup import word_ngram_rows  # noqa: E402
from recsys_pipeline_spark.queries_ext import _docs  # noqa: E402


def grouped_pairs(df, id_col, text_col="text", n=3, threshold=0.5, max_df=100):
    raw = word_ngram_rows(df, id_col, text_col, n, distinct=False)
    per_doc = raw.groupBy(id_col).agg(F.collect_set("gram").alias("_grams"))
    e = per_doc.select(
        F.col(id_col),
        F.size("_grams").alias("n_g"),
        F.explode("_grams").alias("gram"),
    )
    eg = e.select(
        id_col, "n_g", "gram",
        F.count(F.lit(1)).over(Window.partitionBy("gram")).alias("_df"),
    ).filter(F.col("_df") <= max_df)
    members = eg.groupBy("gram").agg(
        F.collect_list(
            F.struct(F.col(id_col).alias("_id"), F.col("n_g").alias("_n"))
        ).alias("_ms")
    )
    pairs = (
        members.select(F.explode("_ms").alias("_a"), "_ms")
        .select("_a", F.explode("_ms").alias("_b"))
        .filter(F.col("_a._id") < F.col("_b._id"))
    )
    inter = pairs.groupBy(
        F.col("_a._id").alias("id_a"), F.col("_b._id").alias("id_b")
    ).agg(
        F.count(F.lit(1)).alias("inter"),
        F.min("_a._n").alias("_na"),
        F.min("_b._n").alias("_nb"),
    )
    jac = F.col("inter").cast("double") / (F.col("_na") + F.col("_nb") - F.col("inter"))
    return inter.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def current(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return dedup.ngram_jaccard_pairs(docs, "doc_id", n=3, threshold=0.5, max_df=100)


def grouped(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return grouped_pairs(docs, "doc_id", n=3, threshold=0.5, max_df=100)


VARIANTS = {"current": current, "grouped": grouped}
