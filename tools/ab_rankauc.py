"""A/B for rank_sum_auc's distributed ranking kernel on hash-domain scores:
range-repartition + eager checkpoint + driver offset collect (current) vs
deterministic high-bits bucketing (shift is monotone on longs) with the
offset vector from a window over the tiny bucket-total frame."""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from recsys_pipeline_spark.io import read_table  # noqa: E402
from recsys_pipeline_spark.operators import dedup, stats  # noqa: E402
from recsys_pipeline_spark.queries_ml import LABEL_THRESHOLD  # noqa: E402


def _base(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        dedup.portable_hash64(
            F.concat(F.lit("aucdet:"), F.col("event_id").cast("string"))
        ).alias("score"),
        F.when(F.col("value") > LABEL_THRESHOLD, 1).otherwise(0).alias("label"),
    )


def current(spark, sf_dir):
    return stats.rank_sum_auc(_base(spark, sf_dir), "score", "label").select(
        F.lit("rank_auc_det").alias("metric"), "n_pos", "n_neg", "auc_ppm"
    )


def bits_kernel_sums(df, score_col, label_col, shift=50):
    dec = "decimal(38,0)"
    bkt = F.shiftright(F.col(score_col), shift).alias("_bkt")
    part = df.select(bkt, F.col(score_col), F.col(label_col)).repartition(F.col("_bkt"))
    g = part.groupBy("_bkt", score_col).agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum(F.col(label_col).cast("long")).alias("_pos"),
    )
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy(F.col(score_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    btot = g.groupBy("_bkt").agg(F.sum("_cnt").alias("_btot"))
    w_off = (
        Window.orderBy(F.col("_bkt").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = btot.withColumn("_off", F.coalesce(F.sum("_btot").over(w_off), F.lit(0))).select(
        "_bkt", "_off"
    )
    ranked = (
        g.withColumn("_pre", F.coalesce(F.sum("_cnt").over(w_in), F.lit(0)))
        .join(F.broadcast(off), "_bkt")
        .withColumn("_before", (F.col("_pre") + F.col("_off")).cast(dec))
    )
    return ranked.agg(
        F.sum(
            F.col("_pos").cast(dec)
            * (F.lit(2).cast(dec) * F.col("_before") + F.col("_cnt") + F.lit(1))
        ).alias("_s2"),
        F.sum(F.col("_pos").cast(dec)).alias("_np"),
        F.sum(F.col("_cnt").cast(dec)).alias("_n"),
    )


def bits(spark, sf_dir):
    base = _base(spark, sf_dir)
    sums = bits_kernel_sums(base, "score", "label").first()
    s2 = int(sums["_s2"] or 0)
    np_, n = int(sums["_np"] or 0), int(sums["_n"] or 0)
    nn = n - np_
    if np_ == 0 or nn == 0:
        auc_ppm = 500_000
    else:
        auc_ppm = (s2 - np_ * (np_ + 1)) * 1_000_000 // (2 * np_ * nn)
    return spark.createDataFrame(
        [("rank_auc_det", np_, nn, auc_ppm)],
        "metric string, n_pos long, n_neg long, auc_ppm long",
    )


VARIANTS = {"current": current, "bits": bits}
