"""Stage 1 — implicit-feedback labeling + temporal split.

Reference: offline/preprocess/s1_data_split.py:22-39.
  label  = rating > 3                                   (:26)
  order  = (userid asc, ts asc), stable w.r.t. file order (:32)
  rn     = per-user cumcount (0-based)                  (:33)
  istest = 2 online | 0 train | 1 test                  (:14-19,34)
  sinks  : offline_imp (istest in {0,1}), online_imp (istest == 2)

Spark notes: the per-user rank+count come from one window (no grouped-count
self-join); the stable tiebreak is a line id taken at scan time —
``monotonically_increasing_id`` over an ordered single-source scan preserves
file order (partition index in the high bits, row offset in the low bits),
which reproduces pandas' stable ``sort_values``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recsys_pipeline_spark.operators import split as split_ops
from recsys_pipeline_spark.schemas import N_ONLINE_PER_USER, TRAIN_FRACTION

LINE_ID = "_line_id"


def with_line_id(df: DataFrame) -> DataFrame:
    """Stable scan-order tiebreaker (SURVEY trap #1)."""
    return df.withColumn(LINE_ID, F.monotonically_increasing_id())


def label_and_split(
    ratings: DataFrame,
    n_online: int = N_ONLINE_PER_USER,
    train_frac: float = TRAIN_FRACTION,
) -> DataFrame:
    """ratings(userid,itemid,rating,ts) -> + label, rn, u_cnt, istest."""
    df = ratings if LINE_ID in ratings.columns else with_line_id(ratings)
    df = split_ops.binarize_label(df, "rating", 3)
    df = split_ops.temporal_split(
        df, user_col="userid", ts_col="ts", tiebreak_col=LINE_ID,
        n_online=n_online, train_frac=train_frac,
    )
    return df


def offline_online(labeled: DataFrame) -> tuple[DataFrame, DataFrame]:
    """-> (offline_imp with istest in {0,1}, online_imp)."""
    base = ["userid", "itemid", "ts", "label", LINE_ID]
    offline = labeled.filter(F.col("istest") != 2).select(*base, "istest")
    online = labeled.filter(F.col("istest") == 2).select(*base)
    return offline, online
