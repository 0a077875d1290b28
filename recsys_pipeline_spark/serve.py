"""The composite online query (SURVEY §2.10) — recall -> rank -> top-k.

Reference request path (online/main/s1_server.py): Redis state lookup -> one
ES term+knn request (top 200, seen filtered) -> Feast feature joins -> Triton
DeepFM scoring -> sort desc -> top 50. Five network hops per user.

Spark-first: ONE DataFrame query, computed for every requested user at once:

    recall    = fused_recall(user_vecs, item_vecs, terms, item_terms, seen)
    features  = recall ⋈ broadcast(item_entity) ⋈ user_entity        (J7)
    scored    = rank_model.transform(features ordered by slot layout) (M9)
    answer    = top 50 per user by score desc                         (W6/W7)

Null-default semantics (P13, online/utils/redis_caller.py:19-35): a user with
no state gets vector [1.0]*16, empty terms, empty seen set — replicated with
coalesce before the joins.
"""

from __future__ import annotations

from pyspark.ml import PipelineModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recsys_pipeline_spark.operators import topk
from recsys_pipeline_spark.rank import model as rank_model
from recsys_pipeline_spark.recall import retrieve
from recsys_pipeline_spark.schemas import EMBEDDING_DIM, RECALL_SIZE, RESPONSE_SIZE


def default_user_state(
    request_users: DataFrame, user_vecs, user_terms, seen, emb_dim: int = EMBEDDING_DIM
) -> tuple:
    """P13: left-join the requested users against state tables, filling the
    reference's online defaults for missing users (vector [1.0]*dim)."""
    default_vec = F.array(*[F.lit(1.0) for _ in range(emb_dim)])
    vecs = (
        request_users.join(user_vecs, "userid", "left")
        .select("userid", F.coalesce("vector", default_vec).alias("vector"))
    )
    terms = (
        request_users.join(user_terms, "userid", "left")
        .select("userid", F.coalesce("terms", F.array().cast("array<int>")).alias("terms"))
    )
    seen_f = (
        request_users.join(seen, "userid", "left")
        .select("userid", F.coalesce("items", F.array().cast("array<bigint>")).alias("items"))
    )
    return vecs, terms, seen_f


def recommend(
    request_users: DataFrame,
    user_vecs: DataFrame,
    item_vecs: DataFrame,
    user_terms: DataFrame,
    item_terms: DataFrame,
    seen: DataFrame,
    user_entity: DataFrame,
    item_entity: DataFrame,
    model: PipelineModel,
    feature_cols: list[str],
    recall_k: int = RECALL_SIZE,
    response_k: int = RESPONSE_SIZE,
    emb_dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """-> (userid, itemid, score), <= response_k rows per requested user,
    ready to be consumed by any serving layer."""
    vecs, terms, seen_f = default_user_state(
        request_users, user_vecs, user_terms, seen, emb_dim=emb_dim
    )
    candidates = retrieve.fused_recall(
        vecs, item_vecs, terms, item_terms, seen_f, k=recall_k
    )
    enriched = candidates.join(F.broadcast(item_entity), "itemid", "left").join(
        user_entity, "userid", "left"
    )
    # online missing-feature default: 0 / 0.0 (triton_caller.py:43-53)
    enriched = enriched.na.fill(0)
    scored = rank_model.score(model, enriched)
    return topk.top_k_per_group(
        scored.select("userid", "itemid", "score"),
        ["userid"],
        [F.col("score").desc(), F.col("itemid").asc()],
        k=response_k,
    )


def recommend_linear(
    request_users: DataFrame,
    user_vecs: DataFrame,
    item_vecs: DataFrame,
    user_terms: DataFrame,
    item_terms: DataFrame,
    seen: DataFrame,
    user_entity: DataFrame,
    item_entity: DataFrame,
    weights: list[tuple[str, float]],
    recall_k: int = RECALL_SIZE,
    response_k: int = RESPONSE_SIZE,
    emb_dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """The §2.10 composite with a CLOSED-FORM ranker: the exact relational
    skeleton of ``recommend`` (P13 defaults -> fused recall -> J6 anti-join ->
    J5/J7 entity joins -> missing-feature zero-fill -> W6/W7 top-k), but the
    model score is ``recall_score + sum(w_c * feature_c)`` with literal
    coefficients — a fixed linear scorer standing in for the synced model
    weights (reference online/main/s1_server.py:24-57 + triton_caller.py).

    Every step is deterministic relational algebra, so the WHOLE request path
    is reproducible by an ANSI-SQL oracle (the trained-model variant,
    ``recommend``, keeps its rows-only + pytest-parity coverage). The weighted
    sum is built LEFT-ASSOCIATED in ``weights`` order so a scalar SQL engine
    computes bit-identical doubles.
    """
    vecs, terms, seen_f = default_user_state(
        request_users, user_vecs, user_terms, seen, emb_dim=emb_dim
    )
    candidates = retrieve.fused_recall(
        vecs, item_vecs, terms, item_terms, seen_f, k=recall_k
    )
    enriched = candidates.join(F.broadcast(item_entity), "itemid", "left").join(
        user_entity, "userid", "left"
    )
    enriched = enriched.na.fill(0)
    score = F.col("recall_score")
    for col, w in weights:
        score = score + F.lit(float(w)) * F.col(col)
    scored = enriched.select("userid", "itemid", score.alias("score"))
    return topk.top_k_per_group(
        scored,
        ["userid"],
        [F.col("score").desc(), F.col("itemid").asc()],
        k=response_k,
    )
