"""A/B variants for minhash_dup_pairs' verify stage (round 16).

Exact query parameters of q_minhash_dup_pairs: portable hash, k=32,
bands=4, rows=8, shingle_n=5, threshold=0.8, cpu_heavy spread scan.

- ``committed``: the r16 restructure at HEAD — raw text rides the
  explicitly-broadcast candidate joins, shingles computed per candidate PAIR.
- ``old_corpus``: the r15 shape — corpus-wide shingle frames on both sides
  of the candidate join.
- ``semi``: semi-join prefilter — shingles computed once per candidate DOC
  (ids from the candidate pairs, broadcast semi-join against the corpus),
  then the verify join runs over the candidate-bounded shingle frame.
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from recsys_pipeline_spark.operators import dedup  # noqa: E402
from recsys_pipeline_spark.queries_ext import _docs, q_minhash_dup_pairs  # noqa: E402

K, BANDS, ROWS, SHINGLE_N, THRESHOLD = 32, 4, 8, 5, 0.8


def _cand(docs):
    sig = dedup.minhash_signature(
        docs, "doc_id", "text", k=K, shingle_n=SHINGLE_N, portable=True
    )
    return dedup.candidate_pairs(
        dedup.lsh_bands(sig, "doc_id", BANDS, ROWS, k=K, portable=True), "doc_id"
    )


def committed(spark, sf_dir):
    return q_minhash_dup_pairs(spark, sf_dir)


def old_corpus(spark, sf_dir):
    docs = _docs(spark, sf_dir, cpu_heavy=True)
    cand = _cand(docs)
    sh = docs.select(
        F.col("doc_id"),
        F.array_distinct(dedup.char_shingles("text", SHINGLE_N)).alias("sh"),
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", dedup.jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
    )
    return verified.filter(F.col("jaccard") >= THRESHOLD)


def semi(spark, sf_dir):
    docs = _docs(spark, sf_dir, cpu_heavy=True)
    cand = _cand(docs).localCheckpoint(eager=False)
    ids = (
        cand.select(F.col("id_a").alias("doc_id"))
        .union(cand.select(F.col("id_b")))
        .distinct()
    )
    sh = (
        docs.join(F.broadcast(ids), "doc_id")
        .select(
            "doc_id",
            F.array_distinct(dedup.char_shingles("text", SHINGLE_N)).alias("sh"),
        )
        .localCheckpoint(eager=False)
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        F.broadcast(cand)
        .join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", dedup.jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
    )
    return verified.filter(F.col("jaccard") >= THRESHOLD)


VARIANTS = {
    "committed": committed,
    "old_corpus": old_corpus,
    "semi": semi,
}
