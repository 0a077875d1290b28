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
    reference); at catalog scale switch to similarity.ann_lsh_topk."""
    u = user_vecs.select("userid", F.col("vector").alias("uvec"))
    if users_filter is not None:
        u = u.join(users_filter.select("userid").distinct(), "userid", "left_semi")
    i = item_vecs.select("itemid", F.col("vector").alias("ivec"))
    pairs = u.crossJoin(F.broadcast(i))
    return pairs.select(
        "userid", "itemid", cosine(F.col("uvec"), F.col("ivec")).alias("cos_score")
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
