"""Implicit-feedback labeling and temporal splitting (SURVEY P1, W1-W3, A1, J1).

Reference semantics (offline/preprocess/s1_data_split.py:22-39):
  * label = 1 if rating > 3 else 0                       (:26)
  * per user ordered by ts (stable):                      (:32-33)
      rn    = 0-based rank within user
      u_cnt = user's interaction count
  * istest = 2 (online)  if rn >= u_cnt - 10              (:14-19,34)
             0 (train)   if rn <  (u_cnt - 10) * 0.8
             1 (test)    otherwise

Spark design: one window over (user) ordered by (ts, tiebreaker) gives BOTH the
rank and the count — no self-join with a grouped count (the reference's J1),
and no extra shuffle: rank and count share the same hash partitioning. The
tiebreaker column reproduces pandas' stable sort (SURVEY trap #1); callers pass
the original line/row id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def binarize_label(df: DataFrame, value_col: str, threshold: float, label_col: str = "label") -> DataFrame:
    """P1: CASE WHEN value > threshold THEN 1 ELSE 0 (implicit feedback)."""
    return df.withColumn(label_col, F.when(F.col(value_col) > threshold, 1).otherwise(0))


def split_flag(rn: Column, u_cnt: Column, n_online: int, train_frac: float) -> Column:
    """W3: the 3-way flag given a 0-based rank and the user's total count."""
    return (
        F.when(rn >= u_cnt - n_online, F.lit(2))
        .when(rn < (u_cnt - n_online) * train_frac, F.lit(0))
        .otherwise(F.lit(1))
    )


def temporal_split(
    df: DataFrame,
    user_col: str = "userid",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
    n_online: int = 10,
    train_frac: float = 0.8,
    rn_col: str = "rn",
    cnt_col: str = "u_cnt",
    flag_col: str = "istest",
) -> DataFrame:
    """W1+W2+W3+A1 fused: rank, count and flag from a single window.

    One shuffle on ``user_col``; at 100 TB this is the only exchange and it is
    reused by every downstream per-user window (same partitioning).
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    w_all = Window.partitionBy(user_col)
    rn = F.row_number().over(w) - F.lit(1)  # 0-based, like pandas cumcount
    u_cnt = F.count(F.lit(1)).over(w_all)
    return (
        df.withColumn(rn_col, rn)
        .withColumn(cnt_col, u_cnt)
        .withColumn(flag_col, split_flag(F.col(rn_col), F.col(cnt_col), n_online, train_frac))
    )


def seeded_shuffle(df: DataFrame, seed: int = 123, rand_col: str = "_shuffle_key") -> DataFrame:
    """W5: deterministic pre-training shuffle (reference
    offline/recall/s2_vector_recall.py:53 shuffles the epoch stream before its
    SGD loop). Spark-first: ORDER BY rand(seed) — one range exchange, fully
    reproducible for a fixed seed and input.

    Use for SGD-family estimators whose minibatch statistics depend on row
    order (FMClassifier's gradient descent); N/A for ALS, which factorizes the
    whole matrix per sweep and has no epoch stream — which is why the recall
    trainer does not call it. Opt-in: a full sort of the training set is real
    work at 100 TB, so it is never applied silently.
    """
    return df.withColumn(rand_col, F.rand(seed)).orderBy(rand_col).drop(rand_col)
