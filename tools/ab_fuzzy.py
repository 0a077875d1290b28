"""A/B for fuzzy_decontaminate: corpus-wide verify shingle frames (old) vs
statically eval/train-filtered sides (current code)."""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from recsys_pipeline_spark.operators import dedup  # noqa: E402
from recsys_pipeline_spark.operators.curation import hash_bucket  # noqa: E402
from recsys_pipeline_spark.queries_curation import QUERIES_CUR  # noqa: E402
from recsys_pipeline_spark.io import read_table  # noqa: E402


def new_filtered(spark, sf_dir):
    return QUERIES_CUR["fuzzy_decontaminate"](spark, sf_dir)


def old_corpus(spark, sf_dir):
    # the r15 shape, with the registration's exact parameters
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    id_col, text_col, eval_pct, salt = "doc_id", "text", 10, "eval"
    k, bands, rows, shingle_n, threshold = 32, 4, 4, 5, 0.8
    is_eval = hash_bucket(F.col(id_col), salt) < eval_pct
    sig = dedup.minhash_signature(docs, id_col, text_col, k=k, shingle_n=shingle_n, portable=True)
    band_df = dedup.lsh_bands(sig, id_col, bands, rows, k=k, portable=True)
    ev_bands = band_df.filter(is_eval).select(
        "band_id", "band_hash", F.col(id_col).alias("_eval_id")
    )
    tr_bands = band_df.filter(~is_eval)
    cand = (
        tr_bands.join(ev_bands, ["band_id", "band_hash"])
        .select(F.col(id_col), F.col("_eval_id"))
        .distinct()
    )
    sh = docs.select(
        F.col(id_col),
        F.array_distinct(dedup.char_shingles(text_col, shingle_n)).alias("_sh"),
    )
    verified = (
        cand.join(sh, id_col)
        .join(
            sh.select(F.col(id_col).alias("_eval_id"), F.col("_sh").alias("_sh_e")),
            "_eval_id",
        )
        .select(F.col(id_col), dedup.jaccard(F.col("_sh"), F.col("_sh_e")).alias("_j"))
        .filter(F.col("_j") >= threshold)
    )
    return verified.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_eval_matches"),
        F.max("_j").alias("max_jaccard"),
    )


def pin_bands(spark, sf_dir):
    # current filtered shape + a lazy pin of the NARROW band frame only
    # (id, band_id, band_hash): materializing it runs the minhash pass once
    # instead of once per band-join side
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    id_col, text_col, eval_pct, salt = "doc_id", "text", 10, "eval"
    k, bands, rows, shingle_n, threshold = 32, 4, 4, 5, 0.8
    is_eval = hash_bucket(F.col(id_col), salt) < eval_pct
    sig = dedup.minhash_signature(docs, id_col, text_col, k=k, shingle_n=shingle_n, portable=True)
    band_df = dedup.lsh_bands(sig, id_col, bands, rows, k=k, portable=True).localCheckpoint(eager=False)
    ev_bands = band_df.filter(is_eval).select(
        "band_id", "band_hash", F.col(id_col).alias("_eval_id")
    )
    tr_bands = band_df.filter(~is_eval)
    cand = (
        tr_bands.join(ev_bands, ["band_id", "band_hash"])
        .select(F.col(id_col), F.col("_eval_id"))
        .distinct()
    )
    sh = docs.filter(~is_eval).select(
        F.col(id_col),
        F.array_distinct(dedup.char_shingles(text_col, shingle_n)).alias("_sh"),
    )
    sh_e = docs.filter(is_eval).select(
        F.col(id_col).alias("_eval_id"),
        F.array_distinct(dedup.char_shingles(text_col, shingle_n)).alias("_sh_e"),
    )
    verified = (
        cand.join(sh, id_col)
        .join(sh_e, "_eval_id")
        .select(F.col(id_col), dedup.jaccard(F.col("_sh"), F.col("_sh_e")).alias("_j"))
        .filter(F.col("_j") >= threshold)
    )
    return verified.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_eval_matches"),
        F.max("_j").alias("max_jaccard"),
    )


VARIANTS = {"old_corpus": old_corpus, "new_filtered": new_filtered, "pin_bands": pin_bands}
