"""Feature-build operators (SURVEY P4-P7, P10, P6, J3, A3, A9, M1).

Reference stage: offline/rank/s1_feature_engi.py — one-hot dict-encodes with a
0 default, 18-way genre multi-hot, point-in-time map-field extraction, z-score
scaling from *train* statistics (sample stddev, NaN/<=0 guards), data-dependent
constant-column pruning, and the fixed 59-slot feature layout.

Spark design notes:
  * encodings are map-literal / array_contains expressions — pure codegen, no
    UDF, no fitted state except where stats are genuinely data-dependent;
  * train stats (mean/stddev_samp) are ONE tiny aggregate row, attached via a
    literal/broadcast cross join — never a per-row lookup;
  * constant-column pruning (P6) is data-dependent so it cannot be a Catalyst
    rewrite: a single countDistinct pass decides the select list;
  * star joins (J3) broadcast the dimension side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recsys_pipeline_spark.schemas import encode_with_default


def one_hot_encode(df: DataFrame, col: str, mapping: dict, out_col: str | None = None) -> DataFrame:
    """P4: dict-encode with empty-key→0 default (s1_feature_engi.py:21-29)."""
    return df.withColumn(out_col or col, encode_with_default(col, mapping))


def multi_hot_flags(
    df: DataFrame, array_col: str, values: list, prefix: str, cast: str = "int"
) -> DataFrame:
    """P5: one 0/1 column per vocabulary value (s1_feature_engi.py:32-41)."""
    cols = [df["*"]] + [
        F.array_contains(F.col(array_col), v).cast(cast).alias(f"{prefix}{v}") for v in values
    ]
    return df.select(*cols)


def constant_columns(df: DataFrame, candidate_cols: list[str]) -> list[str]:
    """P6: names of candidate columns with exactly one distinct value.

    One aggregate job over all candidates at once (approx_count_distinct would
    be cheaper at 100 TB but can under/over-count 1 vs 2; countDistinct on
    already-encoded small-int columns is a cheap partial agg).
    """
    row = df.agg(*[F.countDistinct(F.col(c)).alias(c) for c in candidate_cols]).collect()[0]
    return [c for c in candidate_cols if row[c] <= 1]


def drop_constant_columns(df: DataFrame, candidate_cols: list[str]) -> tuple[DataFrame, list[str]]:
    dropped = constant_columns(df, candidate_cols)
    return df.drop(*dropped), dropped


def train_stats(train_df: DataFrame, dense_cols: list[str]) -> dict[str, tuple[float, float]]:
    """A3: per-column (mean, sample stddev) with the reference's guards —
    NaN mean→0.0, NaN/<=0 stddev→1.0 (s1_feature_engi.py:62-64). One job."""
    aggs = []
    for c in dense_cols:
        aggs.append(F.avg(F.col(c)).alias(f"{c}__mean"))
        aggs.append(F.stddev_samp(F.col(c)).alias(f"{c}__std"))
    row = train_df.agg(*aggs).collect()[0]
    out: dict[str, tuple[float, float]] = {}
    for c in dense_cols:
        m, s = row[f"{c}__mean"], row[f"{c}__std"]
        m = 0.0 if m is None else float(m)
        s = 1.0 if (s is None or s != s or s <= 0) else float(s)
        out[c] = (m, s)
    return out


def zscore_apply(df: DataFrame, stats: dict[str, tuple[float, float]]) -> DataFrame:
    """P10: (x - mean_train) / std_train as literal expressions (codegen'd).

    Applied identically to train, test and the online entity table — the
    reference scales all three with the train stats (s1_feature_engi.py:57-69).
    """
    out = df
    for c, (m, s) in stats.items():
        out = out.withColumn(c, (F.col(c).cast("double") - F.lit(m)) / F.lit(s))
    return out


def star_join(
    fact: DataFrame, dims: list[tuple[DataFrame, str]], how: str = "left"
) -> DataFrame:
    """J3: fact ⋈ small dimensions, every dim broadcast (no shuffle of the fact).

    Mirrors s1_feature_engi.py:111-112 (imp ⋈ users ⋈ movies). Join order does
    not multiply rows when dim keys are unique; Catalyst + AQE keep the fact
    side pipelined through successive BroadcastHashJoins.
    """
    out = fact
    for dim, key in dims:
        out = out.join(F.broadcast(dim), key, how)
    return out


def max_plus_one(df: DataFrame, cols: list[str]) -> dict[str, int]:
    """A9: per-sparse-feature cardinality = max+1 (s1_feature_engi.py:76,80).

    An all-NULL column (possible after a left star-join with no dim match)
    makes F.max NULL; coalesce to -1 so its cardinality is 0 instead of a
    driver-side TypeError."""
    row = df.agg(
        *[F.coalesce(F.max(F.col(c)), F.lit(-1)).alias(c) for c in cols]
    ).collect()[0]
    return {c: int(row[c]) + 1 for c in cols}
