"""A/B for minhash_dup_pairs candidate generation: band self-join (the
broadcast side defeats exchange reuse -> minhash signature kernel computes
twice) vs (a) forced sort-merge join (identical exchanges -> ReusedExchange,
one kernel pass) vs (b) collect-within-bucket pair explode."""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from recsys_pipeline_spark.operators import dedup  # noqa: E402
from recsys_pipeline_spark.operators.dedup import (  # noqa: E402
    jaccard,
    char_shingles,
    lsh_bands,
    minhash_signature,
)
from recsys_pipeline_spark.queries_ext import _docs, q_minhash_dup_pairs  # noqa: E402


def _pipeline(spark, sf_dir, cand_fn):
    df = _docs(spark, sf_dir, cpu_heavy=True)
    id_col, text_col, threshold, shingle_n = "doc_id", "text", 0.8, 5
    sig = minhash_signature(df, id_col, text_col, k=32, shingle_n=shingle_n, portable=True)
    bands = lsh_bands(sig, id_col, 4, 8, k=32, portable=True)
    cand = cand_fn(bands, id_col)
    a = df.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("_t_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("_t_b"))
    verified = (
        F.broadcast(F.broadcast(cand).join(a, "id_a"))
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            jaccard(
                F.array_distinct(char_shingles("_t_a", shingle_n)),
                F.array_distinct(char_shingles("_t_b", shingle_n)),
            ).alias("jaccard"),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold)


def cand_join(bands, id_col):
    return dedup.candidate_pairs(bands, id_col)


def cand_merge(bands, id_col):
    a = bands.select("band_id", "band_hash", F.col(id_col).alias("id_a")).hint("merge")
    b = bands.select("band_id", "band_hash", F.col(id_col).alias("id_b")).hint("merge")
    return (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def cand_grouped(bands, id_col):
    members = bands.groupBy("band_id", "band_hash").agg(
        F.collect_list(F.col(id_col)).alias("_ids")
    )
    return (
        members.filter(F.size("_ids") > 1)
        .select(F.explode("_ids").alias("id_a"), "_ids")
        .select("id_a", F.explode("_ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def current(spark, sf_dir):
    return q_minhash_dup_pairs(spark, sf_dir)


def merge(spark, sf_dir):
    return _pipeline(spark, sf_dir, cand_merge)


def grouped(spark, sf_dir):
    return _pipeline(spark, sf_dir, cand_grouped)


VARIANTS = {"current": current, "merge": merge, "grouped": grouped}
