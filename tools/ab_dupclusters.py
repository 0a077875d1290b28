"""A/B for q_dup_clusters: where does the time go (pair mining vs CC
rounds), and does probing convergence every round (check_every=1) beat the
every-2 default on the near-clique dup graph (which converges at init)?"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from recsys_pipeline_spark.operators import dedup  # noqa: E402
from recsys_pipeline_spark.operators.graph import connected_components  # noqa: E402
from recsys_pipeline_spark.queries_ext import _docs, q_dup_clusters  # noqa: E402


def mining_only(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return dedup.ngram_jaccard_pairs(docs, "doc_id", n=3, threshold=0.5, max_df=100)


def probe_every_round(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", n=3, threshold=0.5, max_df=100)
    cc = connected_components(
        pairs.select("id_a", "id_b"), on_nonconverge="star", check_every=1
    )
    return docs.select("doc_id").join(
        cc, docs["doc_id"] == cc["id"], "left"
    ).select(
        "doc_id", F.coalesce(F.col("component"), F.col("doc_id")).alias("component")
    )


VARIANTS = {
    "current": q_dup_clusters,
    "mining_only": mining_only,
    "probe_every_round": probe_every_round,
}
