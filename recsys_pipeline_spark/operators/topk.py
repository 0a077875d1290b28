"""Top-k operators (SURVEY W6-W8).

Global top-k (`orderBy(...).limit(k)`) is executed by Spark as a per-partition
TakeOrdered + driver merge — no full sort, no single-partition shuffle; safe at
any scale. Per-group top-k uses a rank window over the group key: one hash
shuffle, and with AQE skew handling a hot group splits automatically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_global(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """W6+W7: rank by score desc, truncate (the serve-path top-50)."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order: list[Column],
    k: int,
    rank_col: str = "rk",
    keep_rank: bool = False,
) -> DataFrame:
    """W8 at scale: top-k within each group via row_number (deterministic if
    ``order`` is a total order within the group — pass a tiebreaker)."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)
