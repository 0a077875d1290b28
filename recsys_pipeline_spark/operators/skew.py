"""Skew mitigation for hot keys at 100 TB: salted two-stage aggregation and
salted replicated joins.

AQE's skew handling (spark.sql.adaptive.skewJoin) splits oversized SHUFFLE
JOIN partitions at runtime, but it does not help a skewed groupBy — one
pathological key (a bot user, an empty-string document, a null join key)
still lands every row on one reducer. The classic fix is salting:

  * aggregation — append a salt in [0, n), partially aggregate on
    (key, salt), then merge the n partials per key. Works for any
    DECOMPOSABLE aggregate (sum/count/min/max, and avg as sum+count).
  * join — give each big-side row a salt, replicate the small side across
    all n salts, equi-join on (key, salt). Same result set as the plain
    join, with the hot key's rows spread over n tasks.

Salts are deterministic (hash of a unique column, or a seeded rand) so
retried tasks stay consistent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, unique_col: str | None = None) -> DataFrame:
    """+ ``_salt`` int in [0, n_salts): hash-derived when a unique column is
    available (deterministic under task retry), seeded-random otherwise."""
    if unique_col is not None:
        salt = F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts)).cast("int")
    else:
        salt = (F.rand(seed=7) * n_salts).cast("int")
    return df.withColumn("_salt", salt)


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    n_salts: int = 16,
    unique_col: str | None = None,
) -> DataFrame:
    """Skew-proof ``groupBy(keys).agg(count(*), sum(cols))``: two-stage over a
    salt so no single reducer sees a hot key's full row set. Output columns:
    ``n`` plus ``sum_<col>`` — identical values to the unsalted aggregation
    (sum/count are associative; only the partial-merge tree changes).
    """
    stage1 = (
        with_salt(df, n_salts, unique_col)
        .groupBy(*keys, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            *[F.sum(c).alias(f"_s_{c}") for c in sum_cols],
        )
    )
    return stage1.groupBy(*keys).agg(
        F.sum("_n").alias("n"),
        *[F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sum_cols],
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    big_unique_col: str | None = None,
) -> DataFrame:
    """Skew-proof equi-join: salt the big side, replicate the small side
    n_salts times, join on (key, salt). Row-identical to ``big.join(small,
    key, how)`` for inner/left joins; costs n_salts x the small side's size —
    use only when the small side is modest but too big (or the key too hot)
    for a clean broadcast, and AQE's skew split doesn't apply.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side is replicated)")
    b = with_salt(big, n_salts, big_unique_col)
    s = small.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = b.join(s, [key, "_salt"], how)
    return out.drop("_salt")
