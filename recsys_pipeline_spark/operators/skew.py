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


def heavy_hitters_exact(
    df: DataFrame,
    key_col: str,
    threshold_ppm: int,
    summary_k: int | None = None,
) -> DataFrame:
    """EXACT heavy hitters by sketch-then-verify — every key whose global
    share is >= ``threshold_ppm``, with its exact count.  The hot-key
    DETECTION primitive next to this module's mitigation primitives (you
    salt the keys this operator finds), and the first pass every frequent-
    items / stop-gram / celebrity-vertex analysis runs at corpus scale.

    Why not one groupBy: at 100 TB the key vocabulary (URLs, n-grams,
    user ids) can be billions of distinct values, and a full count shuffles
    ALL of them to find the few hundred frequent ones.  The classic fix
    (Misra-Gries / Space-Saving + mergeable-summaries, Agarwal et al. 2012):

      pass 1 — each partition streams its rows through a capacity-k
        Misra-Gries summary inside ONE Arrow-batched ``mapInPandas``
        (dict state across batches; per Arrow batch the update is a
        vectorized value_counts merge followed by the standard reduce:
        subtract the (k+1)-th largest count from all and drop the
        non-positive).  Output: <= k candidate keys per partition —
        KILOBYTES per task, no shuffle of the raw key stream.
      pass 2 — candidates (<= partitions * k rows) collapse to a distinct
        set, broadcast back, and ONLY matching rows aggregate to exact
        counts: the one exchange carries candidate keys alone.

    Guarantee: a key with global count >= N/k is, by averaging, locally
    >= n_p/k on some partition, and a capacity-k MG summary keeps every
    key with local count > n_p/(k+1) — so candidates ⊇ true hitters
    whenever threshold_ppm > 1e6/k.  The default capacity 2e6/threshold
    doubles that margin.  The summary CONTENT depends on arrival order
    (it is a sketch), but the verified output does not: pass 2 thresholds
    on exact counts, so extra candidates are filtered and true hitters
    are guaranteed present — deterministic end to end.

    -> (key_col, cnt, share_ppm), share in exact integer ppm.
    """
    if summary_k is None:
        summary_k = max(16, (2_000_000 + threshold_ppm - 1) // threshold_ppm)
    if threshold_ppm * summary_k <= 1_000_000:
        raise ValueError(
            f"summary_k={summary_k} cannot guarantee threshold_ppm="
            f"{threshold_ppm}: need threshold_ppm > 1e6/k"
        )
    k = summary_k

    def mg_summaries(batches):
        import pandas as pd

        counts: dict[str, int] = {}
        n_rows = 0
        for pdf in batches:
            vals = pdf[key_col].dropna()
            n_rows += int(len(vals))
            vc = vals.value_counts()
            for key, c in vc.items():
                counts[key] = counts.get(key, 0) + int(c)
            if len(counts) > k:
                # mergeable-summaries reduce: subtract the (k+1)-th
                # largest count, drop the non-positive remainder
                kth = sorted(counts.values(), reverse=True)[k]
                counts = {key: c - kth for key, c in counts.items() if c > kth}
        # the partition's row total rides the SAME pass as a key=NULL row:
        # a separate count() consumer would re-scan the corpus a third
        # time (heavy hitters is a 2-pass problem — keep it 2 passes)
        yield pd.DataFrame(
            {
                key_col: list(counts.keys()) + [None],
                "_prows": [0] * len(counts) + [n_rows],
            }
        )

    summ = (
        df.select(F.col(key_col).cast("string").alias(key_col))
        .mapInPandas(mg_summaries, schema=f"{key_col} string, _prows long")
        .localCheckpoint(eager=False)  # partitions*k rows, two consumers
    )
    cands = summ.filter(F.col(key_col).isNotNull()).select(key_col).distinct()
    dec = "decimal(38,0)"
    n_total = summ.agg(F.sum("_prows").cast(dec).alias("_n"))
    exact = (
        df.select(F.col(key_col).cast("string").alias(key_col))
        .join(F.broadcast(cands), key_col)
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(n_total))
        .filter(
            F.col("cnt").cast(dec) * F.lit(1_000_000)
            >= F.col("_n") * F.lit(threshold_ppm)
        )
        .select(
            key_col,
            F.col("cnt").cast("long").alias("cnt"),
            # DIV, not /: decimal division rounds at its result scale,
            # which can disagree with the oracle's integer floor
            F.expr(
                "CAST((CAST(cnt AS DECIMAL(38,0)) * 1000000) DIV _n AS BIGINT)"
            ).alias("share_ppm"),
        )
    )
