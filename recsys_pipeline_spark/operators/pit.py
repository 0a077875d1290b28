"""Point-in-time (as-of) sliding-window features (SURVEY J4, A4, A5, A2, A6).

This is the reference's flagship semantic (offline/preprocess/s2_term_trans.py:37-61,
readme.md:40-43): for every impression, per-genre impression/click counts over the
user's previous <=10 interactions — strictly before the current row, so no feature
leakage. The reference implements it as a sequential per-user dequeue scan; the
Spark-native form is a window frame:

    SUM(...) OVER (PARTITION BY user ORDER BY ts, tiebreak
                   ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)

which WindowExec evaluates incrementally (the same add/evict the reference
hand-rolls) and which scales horizontally: the only shuffle is the hash exchange
on the user key, shared with the temporal split.

Two distinct frames (SURVEY trap #2):
  * training features: [i-10, i-1]               (s2_term_trans.py:52-57)
  * online user state: last 11 rows, [n-11, n-1] evaluated at the final row —
    the reference adds the last row to a full 10-window without evicting
    (s2_term_trans.py:43-47).

For multi-valued keys (a row carries a set of genres) the pattern is
explode -> conditional window sums -> pivot back; for scalar keys (one
event_type per row) a conditional sum per key value suffices.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _user_window(user_col: str, ts_col: str, tiebreak_col: str | None):
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    return Window.partitionBy(user_col).orderBy(*order)


def pit_counts_scalar_key(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    key_col: str,
    key_values: list,
    label_col: str | None = None,
    tiebreak_col: str | None = None,
    window: int = 10,
    include_current: bool = False,
) -> DataFrame:
    """A4/J4 for scalar keys: per-key imp/clk counts over the previous
    ``window`` rows of the user (``[i-w, i-1]``; ``include_current`` extends the
    frame to the current row — the A5 "last 11" variant).

    Emits ``{key}_imp`` (count of rows with that key in the frame) and, when
    ``label_col`` given, ``{key}_clk`` (sum of the label over those rows).

    All 2x|keys| sliding sums are emitted from ONE ``select`` — sequential
    ``withColumn`` calls would interleave Projects between the Window nodes
    and defeat Spark's CollapseWindow rule, leaving |keys| stacked WindowExec
    operators; a single projection collapses them into one WindowExec pass
    over one hash exchange (verified via .explain).
    """
    upper = 0 if include_current else -1
    w = _user_window(user_col, ts_col, tiebreak_col).rowsBetween(-window, upper)
    cols = [df["*"]]
    for v in key_values:
        is_v = F.when(F.col(key_col) == v, 1).otherwise(0)
        cols.append(F.coalesce(F.sum(is_v).over(w), F.lit(0)).alias(f"{v}_imp"))
        if label_col is not None:
            clk = F.when(F.col(key_col) == v, F.col(label_col)).otherwise(0)
            cols.append(F.coalesce(F.sum(clk).over(w), F.lit(0)).alias(f"{v}_clk"))
    return df.select(*cols)


def pit_counts_multi_key(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    keys_array_col: str,
    key_values: list[int],
    label_col: str,
    tiebreak_col: str | None = None,
    window: int = 10,
    include_current: bool = False,
    prefix: str = "user_g",
) -> DataFrame:
    """A4/J4 for array-valued keys (the reference's per-genre case).

    Instead of explode+pivot (which multiplies rows by |genres| before the
    window, then needs a second shuffle to pivot back), compute each genre's
    membership flag with ``array_contains`` and run all 2x|genres| sliding sums
    inside ONE WindowExec over the original row count. For 18 genres that is 36
    frame aggregates per row — map-side, no extra exchange, and the frame
    buffer is shared.

    Emits ``{prefix}{v}_imp`` / ``{prefix}{v}_clk`` per key value v, matching
    the reference layout (offline/rank/s1_feature_engi.py:44-54).
    """
    upper = 0 if include_current else -1
    w = _user_window(user_col, ts_col, tiebreak_col).rowsBetween(-window, upper)
    cols = [df["*"]]
    for v in key_values:
        has = F.array_contains(F.col(keys_array_col), v).cast("int")
        clk = (has * F.col(label_col))
        cols.append(F.coalesce(F.sum(has).over(w), F.lit(0)).alias(f"{prefix}{v}_imp"))
        cols.append(F.coalesce(F.sum(clk).over(w), F.lit(0)).alias(f"{prefix}{v}_clk"))
    return df.select(*cols)


def last_row_state(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """A5 helper: keep only each user's final row (row_number desc == 1).

    Combined with ``include_current=True`` and ``window=10`` this reproduces the
    reference's last-11 online user state (s2_term_trans.py:43-47).
    """
    order = [F.col(ts_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(user_col).orderBy(*order)
    return df.withColumn("_rn_desc", F.row_number().over(w)).filter(F.col("_rn_desc") == 1).drop("_rn_desc")


def user_seen_items(df: DataFrame, user_col: str, item_col: str, out_col: str = "items") -> DataFrame:
    """A2: per-user set of interacted items (the online seen-filter,
    s2_term_trans.py:33). Sorted for determinism; downstream use is the
    anti-join in recall (J6), which consumes it exploded — never collected to
    the driver."""
    return df.groupBy(user_col).agg(F.sort_array(F.collect_set(item_col)).alias(out_col))


def item_key_sets(df: DataFrame, item_col: str, key_col: str, out_col: str = "keys") -> DataFrame:
    """A6: item -> sorted distinct key set (item_term, s2_term_trans.py:66-73)."""
    return df.groupBy(item_col).agg(F.sort_array(F.collect_set(key_col)).alias(out_col))


def assign_queryid(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    tiebreak_col: str | None = None,
    out_col: str = "queryid",
    n_partitions: int | None = None,
) -> DataFrame:
    """P12: deterministic 0-based row id equal to the (user, ts) scan order
    (s1_feature_engi.py:113) — WITHOUT a single-partition global sort.

    Two-pass range-partitioned form: (1) range-partition on the order keys so
    partition p holds a contiguous key range and every key in p sorts before
    every key in p+1; (2) row_number within each partition; (3) a tiny
    driver-side collect of the per-partition COUNTS (n_partitions integers,
    never rows) turned into cumulative offsets that are broadcast-joined back.
    queryid = local_rn - 1 + offset[pid] — the exact dense global id, but the
    heaviest single task sorts one partition, not the world.

    Spark's RangePartitioner samples with a deterministic per-partition seed
    (byteswap32 of the partition index), so the two jobs that consume the
    range exchange see identical bounds. Ties across a partition boundary
    cannot reorder IF the order key is total (pass a tiebreak); that is the
    same precondition the single-window form needs for determinism.
    """
    order = [F.col(user_col).asc(), F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = spark.sparkContext.defaultParallelism
    part = df.repartitionByRange(n_partitions, *order)
    with_pid = part.select(df["*"], F.spark_partition_id().alias("_pid"))

    counts = with_pid.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n")).collect()
    offsets, acc = [], 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((int(row["_pid"]), acc))
        acc += int(row["_n"])
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")

    w = Window.partitionBy("_pid").orderBy(*order)
    local = with_pid.withColumn("_lrn", F.row_number().over(w))
    out = local.join(F.broadcast(off_df), "_pid").withColumn(
        out_col, (F.col("_lrn") - F.lit(1) + F.col("_off")).cast("int")
    )
    return out.drop("_pid", "_lrn", "_off")
