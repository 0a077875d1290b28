"""Driver-facing query registry: every implemented operator from SURVEY.md §2
as a (PySpark callable, DuckDB oracle SQL) pair over /root/testdata tables.

Mapping (FIXTURES.md §B): ``events(user_id, ts, event_type, value)`` plays the
reference's ``ratings`` role (labeling, temporal split, PIT windows, user
state); the TPC-H-ish star exercises joins/aggs/top-k/scaling; ``documents`` /
``embeddings`` carry the text & vector operators.

Float discipline — the driver hash-compares values, so every aggregate that
would accumulate doubles in an engine-dependent order is computed EXACTLY:
cast operands to DECIMAL (exact in both Spark and DuckDB), aggregate, cast the
final value to DOUBLE (correctly-rounded, identical bits in both engines).
Intra-row expressions (per-row arithmetic, array folds) are deterministic and
stay double. Labels/counters are integers end to end.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from recsys_pipeline_spark.io import read_table, spread
from recsys_pipeline_spark.operators import pit, split, topk
from recsys_pipeline_spark.operators import features as feat

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LABEL_THRESHOLD = 100.0  # events.value in [0.01, 490] — P1 binarize knob
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
SEGMENT_MAP = {s: i + 1 for i, s in enumerate(SEGMENTS)}


def _dec_sum(col: Column, scale: int = 6) -> Column:
    """Exact sum of a double column: decimal-cast, sum, back to double."""
    return F.sum(col.cast(f"decimal(28,{scale})")).cast("double")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = read_table(spark, sf_dir, "events")
    # Parquet timestamps may arrive as TIMESTAMP or TIMESTAMP_NTZ depending on
    # the writer's isAdjustedToUTC flag; unix_micros only accepts the former.
    # With the session tz pinned to UTC the cast preserves the wall-clock
    # digits either way, matching DuckDB's epoch_us on the naive value.
    return df.withColumn("ts_epoch", F.unix_micros(F.col("ts").cast("timestamp")))


# ---------------------------------------------------------------------------
# P1 — implicit-feedback binarize
# ---------------------------------------------------------------------------

def q_binarize_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = split.binarize_label(_events(spark, sf_dir), "value", LABEL_THRESHOLD)
    return df.select("event_id", "user_id", "ts_epoch", "label")


SQL_BINARIZE = f"""
SELECT event_id, user_id, epoch_us(ts) AS ts_epoch,
       CASE WHEN value > {LABEL_THRESHOLD} THEN 1 ELSE 0 END AS label
FROM events
"""

# ---------------------------------------------------------------------------
# W1+W2+W3+A1 — temporal train/test/online split (s1_data_split.py parity)
# ---------------------------------------------------------------------------

def q_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = split.binarize_label(_events(spark, sf_dir), "value", LABEL_THRESHOLD)
    df = split.temporal_split(df, user_col="user_id", ts_col="ts", tiebreak_col="event_id")
    return df.select("event_id", "user_id", "label", "rn", "u_cnt", "istest")


SQL_TEMPORAL_SPLIT = f"""
WITH ranked AS (
  SELECT event_id, user_id,
         CASE WHEN value > {LABEL_THRESHOLD} THEN 1 ELSE 0 END AS label,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS u_cnt
  FROM events
)
SELECT event_id, user_id, label, rn, CAST(u_cnt AS BIGINT) AS u_cnt,
       CASE WHEN rn >= u_cnt - 10 THEN 2
            WHEN rn < (u_cnt - 10) * 0.8 THEN 0
            ELSE 1 END AS istest
FROM ranked
"""

# ---------------------------------------------------------------------------
# J4/A4 — FLAGSHIP: point-in-time sliding per-key counts, frame [i-10, i-1]
# ---------------------------------------------------------------------------

def q_pit_sliding_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: per-event-type impression/click counts over the user's
    previous <=10 interactions (strictly past — no leakage). The scalar-key
    analog of the reference's per-genre PIT features (s2_term_trans.py:37-61)."""
    df = split.binarize_label(_events(spark, sf_dir), "value", LABEL_THRESHOLD)
    df = pit.pit_counts_scalar_key(
        df, user_col="user_id", ts_col="ts", key_col="event_type",
        key_values=EVENT_TYPES, label_col="label", tiebreak_col="event_id", window=10,
    )
    keep = ["event_id", "user_id", "ts_epoch", "event_type", "label"]
    keep += [f"{t}_{s}" for t in EVENT_TYPES for s in ("imp", "clk")]
    return df.select(*keep)


def _pit_sql(upper: str) -> str:
    cols = []
    for t in EVENT_TYPES:
        cols.append(
            f"CAST(COALESCE(SUM(CASE WHEN event_type='{t}' THEN 1 ELSE 0 END) OVER w, 0) AS BIGINT) AS {t}_imp"
        )
        cols.append(
            f"CAST(COALESCE(SUM(CASE WHEN event_type='{t}' THEN label ELSE 0 END) OVER w, 0) AS BIGINT) AS {t}_clk"
        )
    col_sql = ",\n       ".join(cols)
    return f"""
WITH labeled AS (
  SELECT event_id, user_id, ts, epoch_us(ts) AS ts_epoch, event_type,
         CASE WHEN value > {LABEL_THRESHOLD} THEN 1 ELSE 0 END AS label
  FROM events
)
SELECT event_id, user_id, ts_epoch, event_type, label,
       {col_sql}
FROM labeled
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 10 PRECEDING AND {upper})
"""


SQL_PIT_SLIDING = _pit_sql("1 PRECEDING")

# ---------------------------------------------------------------------------
# A4 variant — exact sliding SUM of a double measure (decimal-exact)
# ---------------------------------------------------------------------------

def q_pit_value_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-10, -1)
    )
    return df.select(
        "event_id", "user_id",
        F.coalesce(F.sum(F.col("value").cast("decimal(28,6)")).over(w).cast("double"), F.lit(0.0)).alias("trailing_value"),
        F.count(F.lit(1)).over(w).alias("trailing_cnt"),
    )


SQL_PIT_VALUE_SUM = """
SELECT event_id, user_id,
       COALESCE(CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE), 0.0) AS trailing_value,
       CAST(COUNT(*) OVER w AS BIGINT) AS trailing_cnt
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
"""

# ---------------------------------------------------------------------------
# A5 — online user state: last-11 frame evaluated at each user's final row
# ---------------------------------------------------------------------------

def q_user_state_last11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's off-by-one: the online user term counts the final row
    PLUS the previous 10 (s2_term_trans.py:43-47) — frame [n-11, n-1]."""
    df = split.binarize_label(_events(spark, sf_dir), "value", LABEL_THRESHOLD)
    df = pit.pit_counts_scalar_key(
        df, user_col="user_id", ts_col="ts", key_col="event_type",
        key_values=EVENT_TYPES, label_col="label", tiebreak_col="event_id",
        window=10, include_current=True,
    )
    df = pit.last_row_state(df, user_col="user_id", ts_col="ts", tiebreak_col="event_id")
    keep = ["user_id"] + [f"{t}_{s}" for t in EVENT_TYPES for s in ("imp", "clk")]
    return df.select(*keep)


_LAST11_INNER = _pit_sql("CURRENT ROW")

SQL_USER_STATE_LAST11 = f"""
WITH pit AS ({_LAST11_INNER}),
ordered AS (
  SELECT p.*, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_epoch DESC, event_id DESC) AS rd
  FROM pit p
)
SELECT user_id, {", ".join(f"{t}_imp, {t}_clk" for t in EVENT_TYPES)}
FROM ordered WHERE rd = 1
"""

# ---------------------------------------------------------------------------
# A7 — threshold filter on aggregated clicks (recall-term selection)
# ---------------------------------------------------------------------------

def q_recall_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: event_types with total click-label sum >= 3 become recall
    terms (s1_user_to_redis.py:27-29 semantics)."""
    df = split.binarize_label(_events(spark, sf_dir), "value", LABEL_THRESHOLD)
    agg = df.groupBy("user_id", "event_type").agg(F.sum("label").alias("clk_sum"))
    return agg.filter(F.col("clk_sum") >= 3).select("user_id", "event_type", "clk_sum")


SQL_RECALL_TERMS = f"""
SELECT user_id, event_type, CAST(SUM(CASE WHEN value > {LABEL_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT) AS clk_sum
FROM events
GROUP BY user_id, event_type
HAVING SUM(CASE WHEN value > {LABEL_THRESHOLD} THEN 1 ELSE 0 END) >= 3
"""

# ---------------------------------------------------------------------------
# A1 — group count
# ---------------------------------------------------------------------------

def q_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _events(spark, sf_dir).groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))


SQL_GROUP_COUNT = "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events FROM events GROUP BY user_id"

# ---------------------------------------------------------------------------
# A2 — per-user seen-item set (sorted, csv-encoded for stable comparison)
# ---------------------------------------------------------------------------

def q_user_seen_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    seen = pit.user_seen_items(read_table(spark, sf_dir, "orders"), "o_custkey", "o_orderkey")
    return seen.select("o_custkey", F.array_join("items", ",").alias("seen_csv"))


SQL_USER_SEEN = """
SELECT o_custkey, array_to_string(list_sort(list(DISTINCT o_orderkey)), ',') AS seen_csv
FROM orders GROUP BY o_custkey
"""

# ---------------------------------------------------------------------------
# A6 — item -> sorted distinct key set
# ---------------------------------------------------------------------------

def q_item_key_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    sets = pit.item_key_sets(read_table(spark, sf_dir, "part"), "p_brand", "p_size")
    return sets.select("p_brand", F.array_join("keys", ",").alias("sizes_csv"))


SQL_ITEM_KEY_SETS = """
SELECT p_brand, array_to_string(list_sort(list(DISTINCT p_size)), ',') AS sizes_csv
FROM part GROUP BY p_brand
"""

# ---------------------------------------------------------------------------
# J2/J3 — star join + aggregate (fact ⋈ broadcast dims)
# ---------------------------------------------------------------------------

def q_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dims broadcast, so the join + partial-agg pipeline runs inside the
    # FACT SCAN stage -- io.spread widens a split-starved scan to all cores
    # (no-op at production split counts; measured 2.4s -> ~1.2s at sf0.1)
    li = spread(read_table(spark, sf_dir, "lineitem"))
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    rev = (F.col("l_extendedprice").cast("decimal(28,6)")
           * (F.lit(1).cast("decimal(28,6)") - F.col("l_discount").cast("decimal(28,6)")))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.groupBy("r_name", "n_name")
        .agg(
            # money data is exactly 2dp -> the product is <=6dp -> scaling by
            # 1e6 yields an exact integer (engine-independent; a raw
            # decimal->double cast is NOT correctly rounded in every engine)
            (F.sum(rev) * 1_000_000).cast("long").alias("revenue_e6"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


SQL_STAR_JOIN = """
SELECT r_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6)) * (CAST(1 AS DECIMAL(28,6)) - CAST(l_discount AS DECIMAL(28,6)))) * 1000000 AS BIGINT) AS revenue_e6,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""

# ---------------------------------------------------------------------------
# TPC-H Q1-shaped pricing summary (the bench headline aggregate)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same split-starvation fix as star_join: the filter + 4 decimal sums
    # all run map-side before the 2-key exchange
    li = spread(
        read_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("2001-09-02"))
    )  # filter INSIDE the scan (pushdown intact), spread above it
    dec = lambda c: F.col(c).cast("decimal(28,6)")  # noqa: E731
    disc_price = dec("l_extendedprice") * (F.lit(1).cast("decimal(28,6)") - dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(28,6)") + dec("l_tax"))
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity")).cast("long").alias("sum_qty"),
        (F.sum(dec("l_extendedprice")) * 100).cast("long").alias("sum_base_price_e2"),
        (F.sum(disc_price) * 10_000).cast("long").alias("sum_disc_price_e4"),
        (F.sum(charge) * 1_000_000).cast("long").alias("sum_charge_e6"),
        F.count(F.lit(1)).alias("count_order"),
    )
    # avg as double: numerator is an exact integer in both engines, the two
    # divisions are single correctly-rounded IEEE ops -> bit-identical.
    return g.withColumn("avg_qty", F.col("sum_qty").cast("double") / F.col("count_order"))


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) * 100 AS BIGINT) AS sum_base_price_e2,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6)) * (CAST(1 AS DECIMAL(28,6)) - CAST(l_discount AS DECIMAL(28,6)))) * 10000 AS BIGINT) AS sum_disc_price_e4,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6)) * (CAST(1 AS DECIMAL(28,6)) - CAST(l_discount AS DECIMAL(28,6))) * (CAST(1 AS DECIMAL(28,6)) + CAST(l_tax AS DECIMAL(28,6)))) * 1000000 AS BIGINT) AS sum_charge_e6,
       CAST(COUNT(*) AS BIGINT) AS count_order,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
"""

# ---------------------------------------------------------------------------
# W6-W8 — top-k per group (rank window) and global top-k
# ---------------------------------------------------------------------------

def q_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return topk.top_k_per_group(
        o, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], k=3,
        keep_rank=True,
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rk")


SQL_TOPK_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
"""


def q_top50_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return topk.top_k_global(
        o, [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], k=50
    ).select("o_orderkey", "o_custkey", "o_totalprice")


SQL_TOP50_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 50
"""

# ---------------------------------------------------------------------------
# P10/A3 — z-score scaling from train-partition stats (exact moments)
# ---------------------------------------------------------------------------

def q_zscore_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train stats from l_shipdate < 1999-01-01 applied to ALL rows — the
    reference scales train/test/entity with train-only statistics
    (s1_feature_engi.py:57-69). Moments are decimal-exact so the scalar
    mean/std are bit-identical across engines; the per-row z is then
    deterministic double arithmetic."""
    li = read_table(spark, sf_dir, "lineitem")
    train = li.filter(F.col("l_shipdate") < F.lit("1999-01-01"))
    stats = train.agg(
        _dec_sum(F.col("l_quantity")).alias("s1"),
        F.sum(F.col("l_quantity").cast("decimal(28,6)") * F.col("l_quantity").cast("decimal(28,6)")).cast("double").alias("s2"),
        F.count(F.lit(1)).alias("n"),
    )
    stats = stats.select(
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)).alias("std"),
    )
    return (
        li.crossJoin(F.broadcast(stats))
        .select(
            "l_orderkey", "l_linenumber",
            ((F.col("l_quantity") - F.col("mean")) / F.col("std")).alias("q_z"),
        )
    )


SQL_ZSCORE = """
WITH stats AS (
  SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,6)) * CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS s2,
         COUNT(*) AS n
  FROM lineitem WHERE l_shipdate < TIMESTAMP '1999-01-01'
),
ms AS (SELECT s1 / n AS mean, sqrt((s2 - s1 * s1 / n) / (n - 1)) AS std FROM stats)
SELECT l_orderkey, l_linenumber, (l_quantity - mean) / std AS q_z
FROM lineitem, ms
"""

# ---------------------------------------------------------------------------
# P4/P5 — dict-encode with default + multi-hot flags
# ---------------------------------------------------------------------------

def q_encode_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    c = feat.one_hot_encode(c, "c_mktsegment", SEGMENT_MAP, out_col="seg_id")
    c = c.withColumn("segs", F.array(F.col("c_mktsegment")))
    c = feat.multi_hot_flags(c, "segs", SEGMENTS, prefix="seg_")
    keep = ["c_custkey", "seg_id"] + [f"seg_{s}" for s in SEGMENTS]
    return c.select(*keep)


_SEG_CASE = " ".join(f"WHEN c_mktsegment = '{s}' THEN {i+1}" for i, s in enumerate(SEGMENTS))
_SEG_FLAGS = ",\n       ".join(
    f"CASE WHEN c_mktsegment = '{s}' THEN 1 ELSE 0 END AS seg_{s}" for s in SEGMENTS
)
SQL_ENCODE_SEGMENTS = f"""
SELECT c_custkey, CASE {_SEG_CASE} ELSE 0 END AS seg_id,
       {_SEG_FLAGS}
FROM customer
"""

# ---------------------------------------------------------------------------
# A9/A10/P6 — cardinality probes (constant-prune decision pass)
# ---------------------------------------------------------------------------

def q_cardinalities(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_returnflag").alias("n_returnflag"),
        F.countDistinct("l_linestatus").alias("n_linestatus"),
        F.countDistinct("l_partkey").alias("n_partkey"),
        (F.max("l_suppkey") + 1).alias("suppkey_card"),
    )


SQL_CARDINALITIES = """
SELECT CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_returnflag,
       CAST(COUNT(DISTINCT l_linestatus) AS BIGINT) AS n_linestatus,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_partkey,
       CAST(MAX(l_suppkey) + 1 AS BIGINT) AS suppkey_card
FROM lineitem
"""

# ---------------------------------------------------------------------------
# Sessionize — gap-based session assignment (lag + running sum)
# ---------------------------------------------------------------------------

SESSION_GAP_US = 1800 * 1_000_000


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.col("ts_epoch") - F.lag("ts_epoch").over(w)
    new_sess = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    df = df.withColumn("is_new", new_sess)
    df = df.withColumn(
        "session_idx",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1,
    )
    return df.select("event_id", "user_id", "session_idx")


SQL_SESSIONIZE = f"""
WITH g AS (
  SELECT event_id, user_id, ts,
         CASE WHEN epoch_us(ts)
                   - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_US}
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
)
SELECT event_id, user_id,
       CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS session_idx
FROM g
"""

# ---------------------------------------------------------------------------
# P-ext — JSON extraction from the props column
# ---------------------------------------------------------------------------

def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = read_table(spark, sf_dir, "events")
    return df.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


SQL_JSON_EXTRACT = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k FROM events
"""


# ---------------------------------------------------------------------------
# Range (interval) join — click -> purchase attribution within 1 hour.
# Beyond-reference relational extension (the reference's only temporal join is
# the as-of/PIT J4); classic event-attribution semantics.
# ---------------------------------------------------------------------------

def q_range_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per click: purchases by the same user in (click_ts, click_ts+1h].

    Scale shape: the range predicate rides on a USER equi-join, so this is a
    plain shuffle hash/SMJ on user_id with the interval filter applied inside
    matched groups — never a BroadcastNestedLoopJoin. (For a pure range join
    with no equi key, the 100 TB pattern is time-bucketing: explode each probe
    into its overlapping hour bins and equi-join on the bin.) The money sum
    uses the decimal(28,6) discipline for bit-exact cross-engine totals."""
    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), F.col("value").alias("p_value")
    )
    cond = (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("click_ts"))
        & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    j = clicks.join(purch, cond, "left")
    return j.groupBy("click_id", "user_id").agg(
        F.count("p_ts").alias("n_purchases"),
        F.min("p_ts").alias("first_purchase_ts"),
        F.coalesce(
            F.sum(F.col("p_value").cast("decimal(28,6)")), F.lit(0).cast("decimal(28,6)")
        ).cast("double").alias("attributed_value"),
    )


SQL_RANGE_JOIN_ATTRIBUTION = """
SELECT a.event_id AS click_id, a.user_id,
       CAST(COUNT(b.p_ts) AS BIGINT) AS n_purchases,
       MIN(b.p_ts) AS first_purchase_ts,
       CAST(COALESCE(SUM(CAST(b.p_value AS DECIMAL(28,6))), 0) AS DOUBLE) AS attributed_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') a
LEFT JOIN (SELECT user_id, ts AS p_ts, value AS p_value FROM events WHERE event_type = 'purchase') b
  ON a.user_id = b.user_id AND b.p_ts > a.ts AND b.p_ts <= a.ts + INTERVAL 1 HOUR
GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# Rollup — hierarchical aggregate (GROUP BY ROLLUP), subtotals + grand total.
# Beyond-reference (SURVEY §2.4 notes grouping sets as absent); free in Spark.
# ---------------------------------------------------------------------------

def q_pivot_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): per-user event counts, one column per event type
    — the relational form of the reference's map-cell extraction (P7 pivots
    the PIT map back to columns the same way).  With the pivot values given
    explicitly, Spark plans ONE aggregate pass (no distinct-values pre-query)
    and the output schema is static — the required form at 100 TB."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
    )


SQL_PIVOT_USER_EVENT_COUNTS = f"""
SELECT user_id,
       {", ".join(
           f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}"
           for t in EVENT_TYPES
       )}
FROM events GROUP BY user_id
"""


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem rollup over (returnflag, linestatus): per-pair, per-flag and
    grand-total rows in ONE pass (Expand + single shuffle — not a UNION of 3
    aggregations, which would scan 3x). grouping_id disambiguates rollup
    NULLs from data NULLs.

    The decimal revenue product is projected BEFORE the rollup: Expand
    replicates each row once per grouping level, and aggregate input
    expressions are evaluated on the replicas — pre-projecting computes the
    multiply once per source row instead of once per copy (measured 2.8x on
    the 4-level cube)."""
    li = read_table(spark, sf_dir, "lineitem")  # quiet-machine A/B: spread
    # is neutral here (grouping cols are low-cardinality, partial agg keeps
    # the exchange tiny either way) -- keep the plain scan
    pre = li.select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("long").alias("_q"),
        (
            F.col("l_extendedprice").cast("decimal(28,6)")
            * (F.lit(1).cast("decimal(28,6)") - F.col("l_discount").cast("decimal(28,6)"))
        ).alias("_rev"),
    )
    return pre.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.sum("_q").alias("sum_qty"),
        (F.sum("_rev") * 1_000_000).cast("long").alias("revenue_e6"),
    )


SQL_ROLLUP_REVENUE = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))
                * (CAST(1 AS DECIMAL(28,6)) - CAST(l_discount AS DECIMAL(28,6)))) * 1000000 AS BIGINT) AS revenue_e6
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "binarize_label": q_binarize_label,
    "temporal_split": q_temporal_split,
    "pit_sliding_features": q_pit_sliding_features,
    "pit_value_sum": q_pit_value_sum,
    "user_state_last11": q_user_state_last11,
    "recall_terms": q_recall_terms,
    "group_count": q_group_count,
    "user_seen_items": q_user_seen_items,
    "item_key_sets": q_item_key_sets,
    "star_join_revenue": q_star_join_revenue,
    "pricing_summary": q_pricing_summary,
    "topk_orders_per_customer": q_topk_orders_per_customer,
    "top50_orders": q_top50_orders,
    "zscore_quantity": q_zscore_quantity,
    "encode_segments": q_encode_segments,
    "cardinalities": q_cardinalities,
    "sessionize": q_sessionize,
    "json_extract": q_json_extract,
    "range_join_attribution": q_range_join_attribution,
    "rollup_revenue": q_rollup_revenue,
    "pivot_user_event_counts": q_pivot_user_event_counts,
}

ORACLES: dict[str, str] = {
    "binarize_label": SQL_BINARIZE,
    "temporal_split": SQL_TEMPORAL_SPLIT,
    "pit_sliding_features": SQL_PIT_SLIDING,
    "pit_value_sum": SQL_PIT_VALUE_SUM,
    "user_state_last11": SQL_USER_STATE_LAST11,
    "recall_terms": SQL_RECALL_TERMS,
    "group_count": SQL_GROUP_COUNT,
    "user_seen_items": SQL_USER_SEEN,
    "item_key_sets": SQL_ITEM_KEY_SETS,
    "star_join_revenue": SQL_STAR_JOIN,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "topk_orders_per_customer": SQL_TOPK_PER_CUSTOMER,
    "top50_orders": SQL_TOP50_ORDERS,
    "zscore_quantity": SQL_ZSCORE,
    "encode_segments": SQL_ENCODE_SEGMENTS,
    "cardinalities": SQL_CARDINALITIES,
    "sessionize": SQL_SESSIONIZE,
    "json_extract": SQL_JSON_EXTRACT,
    "range_join_attribution": SQL_RANGE_JOIN_ATTRIBUTION,
    "rollup_revenue": SQL_ROLLUP_REVENUE,
    "pivot_user_event_counts": SQL_PIVOT_USER_EVENT_COUNTS,
}
