"""V3-V5, J6, score fusion — the two-channel recall query.

Reference (online/utils/es_caller.py): one Elasticsearch request runs a term
query (genre terms, boost 0.1) and a cosine kNN (boost 0.9) with a seen-item
``must_not`` filter in both branches, merging into one ranked list of 200.

Spark-first re-expression:
  * term channel  — arrays_overlap / array_intersect between the user's terms
    and the item's genre set (an inverted index materializes as an exploded
    equi-join at scale; for dimension-sized item sets a broadcast filter wins);
  * vector channel — exact brute-force cosine top-k (the reference's
    num_candidates = all items makes its ANN exact too); the LSH variant in
    ``similarity.py`` is the 100 TB path;
  * anti-join the user's seen items BEFORE top-k (same as ES must_not);
  * fusion — full-outer join by item with coalesce(score, 0) weighted sum:
    union-by-key with additive scores (SURVEY §2.6).

Everything is per-user-batch: one DataFrame computes recall for ALL users at
once (the reference loops one request at a time).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from recsys_pipeline_spark.schemas import RECALL_SIZE, TERM_BOOST, VECTOR_BOOST


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float> columns — a single codegen'd
    expression (zip_with product + aggregate folds), no UDF."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, x: s + x * x))
    # try_divide: a zero-norm vector (possible for an all-negative-feedback
    # ALS factor) yields NULL instead of an ANSI-mode DIVIDE_BY_ZERO error;
    # bits are unchanged for every non-degenerate pair.
    return F.try_divide(dot, na * nb)


def term_scores(user_terms: DataFrame, item_terms: DataFrame) -> DataFrame:
    """V5: (userid, itemid, term_score) for items whose genre set intersects
    the user's terms; score = |intersection| (ES-style per-term additive match).

    Explodes the user terms and equi-joins the exploded item index — the
    distributed form of an inverted index probe (no cartesian product).
    """
    u = user_terms.select("userid", F.explode("terms").alias("g"))
    i = item_terms.select("itemid", F.explode("genre_ids").alias("g"))
    return (
        u.join(i, "g")
        .groupBy("userid", "itemid")
        .agg(F.count(F.lit(1)).cast("double").alias("term_score"))
    )


def vector_scores(
    user_vecs: DataFrame, item_vecs: DataFrame, users_filter: DataFrame | None = None
) -> DataFrame:
    """V4: (userid, itemid, cos_score) for every user×item pair — exact
    brute-force. The item side is a broadcast dimension (3,952 items in the
    reference); at catalog scale switch to similarity.ann_lsh_topk / ann_ivf.

    Executed as numpy blocks against the broadcast item matrix (the same
    kernel as dedup.embedding_near_dup_pairs): vectorized across pairs,
    sequential along the dimension axis, so every score is bit-identical to
    the scalar ``cosine()`` expression fold it replaces — but the user×item
    loop runs at BLAS-adjacent speed instead of interpreted per-pair folds.
    Degenerate zero-norm vectors score NULL (matches ``try_divide``).
    """
    import numpy as np
    import pandas as pd

    u = user_vecs.select("userid", F.col("vector").alias("uvec"))
    if users_filter is not None:
        u = u.join(users_filter.select("userid").distinct(), "userid", "left_semi")
    i = item_vecs.select("itemid", F.col("vector").cast("array<double>").alias("ivec"))

    spark = user_vecs.sparkSession
    pdf_i = i.toPandas()
    item_ids = pdf_i["itemid"].to_numpy()
    B = np.array(pdf_i["ivec"].tolist(), dtype=np.float64)

    def _seq_norm(X):
        acc = X[:, 0] * X[:, 0]
        for k in range(1, X.shape[1]):
            acc = acc + X[:, k] * X[:, k]
        return np.sqrt(acc)

    bc = spark.sparkContext.broadcast(
        (item_ids, B, _seq_norm(B) if B.size else B.reshape(0))
    )

    def score_block(batches):
        ids_i, Bm, nrm_i = bc.value
        for pdf in batches:
            if not len(pdf) or not Bm.size:
                continue
            A = np.array(pdf["uvec"].tolist(), dtype=np.float64)
            dot = A[:, 0, None] * Bm[None, :, 0]
            for k in range(1, A.shape[1]):
                dot = dot + A[:, k, None] * Bm[None, :, k]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dot / (_seq_norm(A)[:, None] * nrm_i[None, :])
            n_u, n_i = cos.shape
            yield pd.DataFrame(
                {
                    "userid": np.repeat(pdf["userid"].to_numpy(), n_i),
                    "itemid": np.tile(ids_i, n_u),
                    "cos_score": np.where(np.isfinite(cos), cos, np.nan).ravel(),
                }
            )

    prepared = u.select("userid", F.col("uvec").cast("array<double>"))
    n_part = spark.sparkContext.defaultParallelism
    out = prepared.repartition(n_part).mapInPandas(
        score_block, schema="userid long, itemid long, cos_score double"
    )
    # NaN -> NULL so downstream ordering treats degenerate scores like the
    # expression form's try_divide NULLs
    return out.withColumn(
        "cos_score", F.when(F.isnan("cos_score"), F.lit(None)).otherwise(F.col("cos_score"))
    )


def fused_recall(
    user_vecs: DataFrame,
    item_vecs: DataFrame,
    user_terms: DataFrame,
    item_terms: DataFrame,
    seen: DataFrame,
    k: int = RECALL_SIZE,
    vector_boost: float = VECTOR_BOOST,
    term_boost: float = TERM_BOOST,
) -> DataFrame:
    """The composite recall query (§2.10 lines 1-3): fuse both channels,
    drop seen items, keep top-k per user by fused score."""
    vec = vector_scores(user_vecs, item_vecs)
    term = term_scores(user_terms, item_terms)
    fused = (
        vec.join(term, ["userid", "itemid"], "full_outer")
        .select(
            "userid",
            "itemid",
            (
                F.lit(vector_boost) * F.coalesce(F.col("cos_score"), F.lit(0.0))
                + F.lit(term_boost) * F.coalesce(F.col("term_score"), F.lit(0.0))
            ).alias("recall_score"),
        )
    )
    # J6: seen-item anti-join (ES must_not), BEFORE the top-k like ES does
    seen_pairs = seen.select("userid", F.explode("items").alias("itemid"))
    fused = fused.join(seen_pairs, ["userid", "itemid"], "left_anti")
    w = Window.partitionBy("userid").orderBy(
        F.col("recall_score").desc(), F.col("itemid").asc()
    )
    return (
        fused.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )
