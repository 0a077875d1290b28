"""Analytics-surface queries: full window-function coverage (navigation,
ranking, RANGE frames), set operations, CUBE, the generalized timestamp as-of
join, and exact statistical aggregates.

SURVEY.md §2.5/§2.6 lists these as absent from the reference but built into
Spark; an analytics user of the engine expects them, so they are implemented
and oracle-checked like the §2 inventory.  Float discipline follows
queries.py: money aggregates in DECIMAL scaled to integer outputs; the only
double outputs are bit-deterministic scalar expressions evaluated identically
by both engines (percent_rank/cume_dist ratios, moment formulas over exact
decimal sums).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from recsys_pipeline_spark.io import read_table, spread
from recsys_pipeline_spark.operators import asof, fuzzy, stats, timeseries, windows

# DuckDB tokenizer fragment shared with the text queries (operators/text.py
# semantics: lowercase, split on whitespace, drop empties)
_I_TOKENS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cast: parquet ts may be TIMESTAMP_NTZ (writer-dependent); see queries._events
    return read_table(spark, sf_dir, "events").withColumn(
        "ts_epoch", F.unix_micros(F.col("ts").cast("timestamp"))
    )


# ---------------------------------------------------------------------------
# Navigation window functions (lag / lead / first)
# ---------------------------------------------------------------------------

def q_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events(spark, sf_dir)
    out = windows.navigation_cols(
        df, part_col="user_id", order_col="ts_epoch",
        tiebreak_col="event_id", value_col="value",
    )
    return out.select(
        "event_id", "user_id", "prev_gap", "next_gap", "since_first", "prev_value"
    )


SQL_EVENT_GAPS = """
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tse, value FROM events)
SELECT event_id, user_id,
       tse - LAG(tse)  OVER w AS prev_gap,
       LEAD(tse) OVER w - tse AS next_gap,
       tse - FIRST_VALUE(tse) OVER w AS since_first,
       LAG(value) OVER w AS prev_value
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY tse, event_id)
"""

# ---------------------------------------------------------------------------
# Ranking window functions over an exact aggregate key
# ---------------------------------------------------------------------------

def q_spend_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    spend = (
        orders.groupBy("o_custkey")
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(28,6)")) * 1_000_000)
            .cast("long")
            .alias("spend_e6")
        )
        .join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    ranked = windows.ranking_cols(
        spend,
        part_col="c_mktsegment",
        order_expr=F.col("spend_e6").desc(),
        n_tiles=10,
        tile_tiebreak=F.col("o_custkey"),
    )
    return ranked.select(
        F.col("o_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        "spend_e6", "rnk", "drnk", "tile", "pct_rank", "cume",
    )


SQL_SPEND_RANK = """
WITH spend AS (
  SELECT o_custkey AS custkey, c_mktsegment AS segment,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) * 1000000 AS BIGINT) AS spend_e6
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY o_custkey, c_mktsegment
)
SELECT custkey, segment, spend_e6,
       RANK()         OVER w AS rnk,
       DENSE_RANK()   OVER w AS drnk,
       NTILE(10)      OVER (PARTITION BY segment ORDER BY spend_e6 DESC, custkey) AS tile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST()    OVER w AS cume
FROM spend
WINDOW w AS (PARTITION BY segment ORDER BY spend_e6 DESC)
"""

# ---------------------------------------------------------------------------
# RANGE frame: trailing 30-day spend per customer
# ---------------------------------------------------------------------------

def q_trailing_spend_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").withColumn(
        "day", F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
    )
    out = windows.trailing_range_agg(
        orders,
        part_col="o_custkey",
        order_numeric_col="day",
        value_expr=F.col("o_totalprice").cast("decimal(28,6)"),
        lower=-29,
        upper=0,
        out_col="spend30",
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        "day",
        (F.col("spend30") * 1_000_000).cast("long").alias("spend30_e6"),
    )


SQL_TRAILING_SPEND = """
WITH o AS (
  SELECT o_orderkey, o_custkey,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
         CAST(o_totalprice AS DECIMAL(28,6)) AS price
  FROM orders
)
SELECT o_orderkey, o_custkey, CAST(day AS INT) AS day,
       CAST(SUM(price) OVER (
              PARTITION BY o_custkey ORDER BY day
              RANGE BETWEEN 29 PRECEDING AND CURRENT ROW
            ) * 1000000 AS BIGINT) AS spend30_e6
FROM o
"""

# ---------------------------------------------------------------------------
# Set operations (INTERSECT / EXCEPT / UNION, distinct semantics)
# ---------------------------------------------------------------------------

def q_audience_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)

    def users(t: str) -> DataFrame:
        return e.filter(F.col("event_type") == t).select("user_id")

    both = users("purchase").intersect(users("click"))
    only = users("purchase").subtract(users("error"))
    either = users("purchase").union(users("signup")).distinct()
    return (
        both.withColumn("op", F.lit("purchase_and_click"))
        .unionByName(only.withColumn("op", F.lit("purchase_not_error")))
        .unionByName(either.withColumn("op", F.lit("purchase_or_signup")))
    )


SQL_AUDIENCE_SET_OPS = """
SELECT user_id, 'purchase_and_click' AS op FROM
  (SELECT user_id FROM events WHERE event_type = 'purchase'
   INTERSECT
   SELECT user_id FROM events WHERE event_type = 'click')
UNION ALL
SELECT user_id, 'purchase_not_error' AS op FROM
  (SELECT user_id FROM events WHERE event_type = 'purchase'
   EXCEPT
   SELECT user_id FROM events WHERE event_type = 'error')
UNION ALL
SELECT user_id, 'purchase_or_signup' AS op FROM
  (SELECT user_id FROM events WHERE event_type = 'purchase'
   UNION
   SELECT user_id FROM events WHERE event_type = 'signup')
"""

# ---------------------------------------------------------------------------
# CUBE (companion of queries.q_rollup_revenue — same Expand-based one-pass plan)
# ---------------------------------------------------------------------------

def q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four grouping levels in one Expand pass; the decimal revenue
    product is projected BEFORE the cube so it is computed once per source
    row, not once per Expand replica (measured 2.8x)."""
    li = read_table(spark, sf_dir, "lineitem")
    dec = "decimal(28,6)"
    pre = li.select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("long").alias("_q"),
        (
            F.col("l_extendedprice").cast(dec)
            * (F.lit(1).cast(dec) - F.col("l_discount").cast(dec))
        ).alias("_rev"),
    )
    return pre.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.sum("_q").alias("sum_qty"),
        (F.sum("_rev") * 1_000_000).cast("long").alias("revenue_e6"),
    )


SQL_CUBE_REVENUE = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))
                * (CAST(1 AS DECIMAL(28,6)) - CAST(l_discount AS DECIMAL(28,6)))) * 1000000 AS BIGINT) AS revenue_e6
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""

# ---------------------------------------------------------------------------
# Generalized as-of join: purchase attributed to the latest strictly-prior click
# ---------------------------------------------------------------------------

def q_asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_epoch"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts_epoch")
        .agg(F.max("value").alias("click_value"))
    )
    out = asof.asof_join(
        purchases, clicks,
        key_col="user_id", ts_col="ts_epoch",
        right_cols=["ts_epoch", "click_value"],
        strict=True,
    )
    return out.select(
        "event_id", "user_id", "ts_epoch",
        F.col("asof_ts_epoch").alias("click_ts_epoch"),
        F.col("asof_click_value").alias("click_value"),
    )


SQL_ASOF_CLICK = """
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_epoch
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, epoch_us(ts) AS cts, MAX(value) AS click_value
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, epoch_us(ts)
)
SELECT p.event_id, p.user_id, p.ts_epoch,
       c.cts AS click_ts_epoch, c.click_value
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.ts_epoch > c.cts
"""

# ---------------------------------------------------------------------------
# Exact statistical aggregates
# ---------------------------------------------------------------------------

def q_corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    # moment accumulation is map-side-heavy (6 decimal products/row) -> spread
    li = spread(read_table(spark, sf_dir, "lineitem"))
    return stats.exact_bivariate_stats(
        li, group_col="l_returnflag", x_col="l_quantity", y_col="l_extendedprice"
    )


SQL_CORR_QTY_PRICE = stats.exact_bivariate_stats_sql(
    "lineitem", "l_returnflag", "l_quantity", "l_extendedprice"
)


def q_ols_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS of extendedprice on quantity per returnflag — the
    regression companion to corr_qty_price: one aggregate pass over the
    same exact decimal power sums, slope/intercept/R² composed in a fixed
    rounded-double order so both engines emit identical coefficients.
    No iteration, no MLlib: the normal equations ARE the aggregate."""
    li = read_table(spark, sf_dir, "lineitem")
    return stats.exact_ols(li, "l_returnflag", "l_quantity", "l_extendedprice")


SQL_OLS_QTY_PRICE = stats.exact_ols_sql(
    "lineitem", "l_returnflag", "l_quantity", "l_extendedprice"
)

# ---------------------------------------------------------------------------
# TF-IDF document-term weights (text-analysis companion: the full weighted
# inverted index, no top-k so the output set is deterministic)
# ---------------------------------------------------------------------------

def q_tfidf_doc_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (doc, term): tf, df and round(tf * ln(N/df), 6).

    Pure relational TF-IDF: one explode + two hash aggregates (term counts
    per doc; document frequency per term joined back on term — the small
    side, vocabulary-sized, broadcastable at any corpus scale).  The score is
    rounded because ln() is not required to be correctly rounded by IEEE and
    the two engines' libm may differ in the last ulp; 6 dp is ~9 orders of
    magnitude above that noise.
    """
    from recsys_pipeline_spark.operators.text import tokens

    docs = read_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar only (the oracle inlines the same count)
    term_rows = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    # tf is materialized once and df DERIVED from it: tf holds one row per
    # (doc, term), so document frequency is a plain count over the already-
    # aggregated pairs — one tokenize+explode pass over the corpus instead
    # of two, and no countDistinct over the raw token stream (wall-neutral
    # at sf0.1, value-identical; the single-pass shape is what matters at
    # corpus scale).
    tf = (
        term_rows.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return tf.join(F.broadcast(df_), "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )


SQL_TFIDF = f"""
WITH tok AS (
  SELECT doc_id, unnest({_I_TOKENS}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
)
SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf, CAST(df.df AS BIGINT) AS df,
       ROUND(tf.tf * ln((SELECT COUNT(*) FROM documents) * 1.0 / df.df), 6) AS tfidf
FROM tf JOIN df ON tf.term = df.term
"""

# ---------------------------------------------------------------------------
# Exact percentiles (sort-based `percentile`, linear interpolation — the
# exact analog; at 100 TB swap for approx_percentile's mergeable sketch)
# ---------------------------------------------------------------------------

def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


SQL_VALUE_PERCENTILES = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.9), 6) AS p90,
       ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
"""


EXACT_PCTS = [50, 90, 99]


def q_exact_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MEDIAN ABSOLUTE DEVIATION of the cent-scaled event value —
    the robust dispersion statistic (outlier-insensitive, unlike stddev)
    as TWO composed selection passes by the lower-rank rule stated
    identically in both engines: m = exact median of v, mad = exact
    median of |v − m|.

    r16 shape (was: two raw-row kth_smallest passes + a count = THREE
    corpus aggregations with two eager checkpoints and four driver
    collects): the corpus is aggregated ONCE to its (value, cnt)
    histogram; both selections AND n then run on the histogram, which is
    bounded by the value vocabulary, never row count — the deviation
    histogram is a pure regroup of the value histogram (|v − m| is a
    function of v), so the second pass touches no raw rows at all. The
    median reaches the deviation regroup as a broadcast 1-row frame, so
    the whole query is one lazy plan with no driver synchronization
    (guide §2.4/§5). Selection = grouped_exact_quantiles_from_hist with a
    constant group — the same histogram-below-the-window kernel as
    segment_quantiles."""
    from recsys_pipeline_spark.operators.stats import (
        grouped_exact_quantiles_from_hist,
    )

    ev = read_table(spark, sf_dir, "events")
    base = ev.select(F.round(F.col("value") * 100).cast("long").alias("v_c"))
    # small aggregated frame with two expensive consumers (median selection
    # + deviation regroup) — the pin class that measured as a WIN
    # (item_cooccur_lift), unlike corpus-wide projection pins
    hist = (
        base.groupBy("v_c")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    med = grouped_exact_quantiles_from_hist(
        hist.withColumn("_gg", F.lit(0)), "_gg", "v_c", (50,)
    ).select(F.col("v_c").alias("_m"), F.col("n").alias("_n"))
    dev_hist = (
        hist.crossJoin(F.broadcast(med.select("_m")))
        .groupBy(F.abs(F.col("v_c") - F.col("_m")).alias("d_c"))
        .agg(F.sum("cnt").alias("cnt"))
    )
    mad = grouped_exact_quantiles_from_hist(
        dev_hist.withColumn("_gg", F.lit(0)), "_gg", "d_c", (50,)
    ).select(F.col("d_c").alias("_mad"))
    return (
        med.crossJoin(F.broadcast(mad))
        .select(
            F.col("_m").alias("median_cents"),
            F.col("_mad").alias("mad_cents"),
            F.col("_n").alias("n"),
        )
    )


SQL_EXACT_MAD = """
WITH mb AS (SELECT CAST(round(value * 100) AS BIGINT) AS v_c FROM events),
mn AS (SELECT COUNT(*) AS n, (COUNT(*) - 1) * 50 // 100 + 1 AS k FROM mb),
mr AS (SELECT v_c, row_number() OVER (ORDER BY v_c) AS rn FROM mb),
med AS (SELECT mr.v_c AS m FROM mr JOIN mn ON mr.rn = mn.k),
dv AS (SELECT abs(mb.v_c - med.m) AS d_c FROM mb, med),
dr AS (SELECT d_c, row_number() OVER (ORDER BY d_c) AS rn FROM dv),
mad AS (SELECT dr.d_c AS md FROM dr JOIN mn ON dr.rn = mn.k)
SELECT CAST(med.m AS BIGINT) AS median_cents,
       CAST(mad.md AS BIGINT) AS mad_cents,
       CAST(mn.n AS BIGINT) AS n
FROM med, mad, mn
"""


def q_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global percentiles of the cent-scaled event value by
    distributed SELECTION — no global single-task sort and no t-digest
    approximation (value_percentiles is the approx/tolerance-gated twin;
    this one is hash-checked because the answer is exactly defined: the
    k-th smallest element with k = (n−1)·p DIV 100 + 1, the lower-rank
    discrete quantile, stated identically in both engines rather than
    trusting two engines' quantile interpolation to agree).

    r16 shape (was: stats.ranked_score_groups over raw rows — an EAGER
    localCheckpoint of the pid-stamped histogram plus two driver collects,
    three construction-time jobs before the timed consumer ran): ONE
    map-side-combinable corpus aggregation to the (value, cnt) histogram
    (lazily checkpointed — small aggregated frame, two consumers inside
    the selection kernel), then the shared histogram selection kernel
    (grouped_exact_quantiles_from_hist, constant group — the
    segment_quantiles machinery) selects all three order statistics with
    the k targets on a broadcast rank-membership join. One lazy plan, no
    driver synchronization (guide §2.4/§5); the selection window sorts
    the value vocabulary, never raw rows."""
    from recsys_pipeline_spark.operators.stats import (
        grouped_exact_quantiles_from_hist,
    )

    ev = read_table(spark, sf_dir, "events")
    base = ev.select(F.round(F.col("value") * 100).cast("long").alias("v_c"))
    hist = (
        base.groupBy("v_c")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    sel = grouped_exact_quantiles_from_hist(
        hist.withColumn("_gg", F.lit(0)), "_gg", "v_c", tuple(EXACT_PCTS)
    )
    return sel.select(
        "pct", "k", F.col("v_c").alias("value_cents"), "n"
    ).orderBy("pct")


SQL_EXACT_PERCENTILES = f"""
WITH b AS (SELECT CAST(round(value * 100) AS BIGINT) AS v_c FROM events),
nn AS (SELECT COUNT(*) AS n FROM b),
ks AS (
  SELECT pct, (n - 1) * pct // 100 + 1 AS k, n
  FROM nn, (VALUES {", ".join(f"({p})" for p in EXACT_PCTS)}) p(pct)
),
r AS (SELECT v_c, row_number() OVER (ORDER BY v_c) AS rn FROM b)
SELECT CAST(ks.pct AS INT) AS pct, CAST(ks.k AS BIGINT) AS k,
       r.v_c AS value_cents, CAST(ks.n AS BIGINT) AS n
FROM ks JOIN r ON r.rn = ks.k
ORDER BY pct
"""

# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Funnel conversion — the classic ordered-stage analytics query: a user
# converts view -> click -> purchase only if each stage's FIRST qualifying
# event strictly follows the previous stage's (pinned strict-> semantics).
# ---------------------------------------------------------------------------


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per stage: users reached + conversion from the previous stage in
    integer ppm. Three co-partitioned per-user aggregates (each stage's
    first qualifying timestamp joins the previous frontier on user_id) —
    no window over the raw stream, so the plan is three grouped passes
    that all ride the same user_id exchange."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("et"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tse"),
    )
    # each frontier is consumed twice (the next stage's join + its own
    # count row) — without the pin the view frontier re-derives three
    # times and the corpus scans SIX times (plan-audit finding, round 15);
    # pinned, the plan is one scan per stage filter and the frontiers are
    # user-count-bounded
    v = (
        ev.filter(F.col("et") == "view")
        .groupBy("user_id")
        .agg(F.min("tse").alias("t1"))
        .localCheckpoint(eager=False)
    )
    c = (
        ev.filter(F.col("et") == "click")
        .join(v, "user_id")
        .filter(F.col("tse") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("tse").alias("t2"))
        .localCheckpoint(eager=False)
    )
    p = (
        ev.filter(F.col("et") == "purchase")
        .join(c, "user_id")
        .filter(F.col("tse") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("tse").alias("t3"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit(1).cast("long").alias("stage_idx"), F.lit("view").alias("stage"), "n"
    )
    nc = c.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit(2).cast("long").alias("stage_idx"), F.lit("click").alias("stage"), "n"
    )
    np_ = p.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit(3).cast("long").alias("stage_idx"), F.lit("purchase").alias("stage"), "n"
    )
    stages = nv.unionByName(nc).unionByName(np_)
    w = Window.orderBy("stage_idx")  # 3-row frame: the window is driver-sized
    return (
        stages.withColumn("_prev", F.lag("n").over(w))
        .select(
            "stage_idx",
            "stage",
            F.col("n").cast("long").alias("n_users"),
            # integer DIV on non-negative operands — the portable division;
            # stage 1 has no predecessor and reports 1e6 (100%); an EMPTY
            # previous stage reports 0 (nobody could have converted), not
            # the stage-1 default. KEEP IN LOCKSTEP with the CASE ladder in
            # SQL_FUNNEL_CONVERSION below — the same three branches live in
            # both dialects (NULL->1e6, 0->0, else DIV) and
            # test_funnel_zero_stage_reports_zero_ppm pins the 0 branch in
            # both engines.
            F.when(F.col("_prev").isNull(), F.lit(1000000))
            .when(F.col("_prev") == 0, F.lit(0))
            .otherwise(F.expr("n * 1000000 DIV _prev"))
            .cast("long").alias("conv_from_prev_ppm"),
        )
    )


SQL_FUNNEL_CONVERSION = """
WITH ev AS (SELECT user_id, event_type AS et, epoch_us(ts) AS tse FROM events),
v AS (SELECT user_id, min(tse) AS t1 FROM ev WHERE et = 'view' GROUP BY 1),
c AS (SELECT e.user_id, min(e.tse) AS t2 FROM ev e JOIN v USING (user_id)
      WHERE e.et = 'click' AND e.tse > v.t1 GROUP BY 1),
p AS (SELECT e.user_id, min(e.tse) AS t3 FROM ev e JOIN c USING (user_id)
      WHERE e.et = 'purchase' AND e.tse > c.t2 GROUP BY 1),
st AS (
  SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage,
         CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_users
  UNION ALL
  SELECT 2, 'click', CAST((SELECT COUNT(*) FROM c) AS BIGINT)
  UNION ALL
  SELECT 3, 'purchase', CAST((SELECT COUNT(*) FROM p) AS BIGINT)
)
SELECT stage_idx, stage, n_users,
       -- KEEP IN LOCKSTEP with the when() ladder in q_funnel_conversion
       -- above: NULL predecessor -> 1e6, EMPTY predecessor -> 0, else
       -- integer division (pinned by
       -- test_funnel_zero_stage_reports_zero_ppm in both engines).
       CAST(CASE WHEN lag(n_users) OVER (ORDER BY stage_idx) IS NULL
                 THEN 1000000
                 WHEN lag(n_users) OVER (ORDER BY stage_idx) = 0
                 THEN 0
                 ELSE n_users * 1000000 // lag(n_users) OVER (ORDER BY stage_idx)
            END AS BIGINT) AS conv_from_prev_ppm
FROM st
"""


# ---------------------------------------------------------------------------
# Cohort retention — users grouped by first-activity week; for each
# (cohort_week, weeks-since) cell, distinct active users + retention vs the
# cohort's size, in integer ppm. THE product-analytics matrix.
# ---------------------------------------------------------------------------


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scan -> per-user first week (grouped min) -> distinct
    (cohort, offset, user) -> counts; the cohort-size denominator joins
    back on the tiny cohort frame. Weeks are epoch-micros DIV one week —
    pure integer algebra, no calendar functions to disagree on."""
    wk = 7 * 86400 * 1000000
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        # integer DIV, not float / + truncate-cast: matches the oracle's
        # `//` (floor) on negative epochs too and avoids double rounding
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {wk}").alias("week"),
    )
    # the first-week frame feeds both the offset join and the cohort-size
    # denominator — pin it (user-count-bounded) or each consumer re-scans
    # events (plan-audit finding, round 15)
    first = (
        ev.groupBy("user_id")
        .agg(F.min("week").alias("cohort_week"))
        .localCheckpoint(eager=False)
    )
    active = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .distinct()
    )
    cells = active.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    sizes = first.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("_size"))
    return cells.join(sizes, "cohort_week").select(
        "cohort_week",
        "week_offset",
        F.col("n_users").cast("long").alias("n_users"),
        F.expr("n_users * 1000000 DIV _size").alias("retention_ppm"),
    )


SQL_RETENTION_COHORTS = """
WITH ev AS (SELECT user_id, epoch_us(ts) // 604800000000 AS week FROM events),
f AS (SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1),
act AS (SELECT DISTINCT e.user_id, f.cohort_week, e.week - f.cohort_week AS week_offset
        FROM ev e JOIN f USING (user_id)),
cells AS (SELECT cohort_week, week_offset, CAST(COUNT(*) AS BIGINT) AS n_users
          FROM act GROUP BY 1, 2),
sz AS (SELECT cohort_week, COUNT(*) AS _size FROM f GROUP BY 1)
SELECT cohort_week, week_offset, n_users,
       CAST(n_users * 1000000 // _size AS BIGINT) AS retention_ppm
FROM cells JOIN sz USING (cohort_week)
"""


# ---------------------------------------------------------------------------
# Calendar gap-fill + forward fill — densify the sparse event log to one row
# per (user, day) with the last observed value carried across gaps. The
# input shape every per-entity trend model wants; see operators/timeseries.py
# for the two-exchange scale design.
# ---------------------------------------------------------------------------


def q_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user dense daily calendar: last event value per day, forward-
    filled across gap days. ``filled_value`` is a bit-exact copy of an
    observed double (no arithmetic), ``is_observed`` flags fill rows.
    Days are epoch-micros DIV one day (integer floor in both engines)."""
    ev = _events(spark, sf_dir).select("user_id", "ts_epoch", "event_id", "value")
    daily = timeseries.last_per_day(
        ev, entity_col="user_id", ts_us_col="ts_epoch",
        tiebreak_col="event_id", value_col="value",
    )
    return timeseries.gapfill_forward_fill(
        daily, entity_col="user_id", day_col="day", value_col="obs_value"
    )


SQL_DAILY_GAPFILL = """
WITH e AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS tse,
         epoch_us(ts) // 86400000000 AS day
  FROM events
),
r AS (
  SELECT user_id, day, value,
         row_number() OVER (PARTITION BY user_id, day
                            ORDER BY tse DESC, event_id DESC) AS rn
  FROM e
),
d AS (SELECT user_id, day, value AS obs_value FROM r WHERE rn = 1),
s AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM d GROUP BY 1),
g AS (SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM s),
j AS (SELECT g.user_id, g.day, d.obs_value
      FROM g LEFT JOIN d ON g.user_id = d.user_id AND g.day = d.day)
SELECT user_id, CAST(day AS BIGINT) AS day,
       LAST_VALUE(obs_value IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       CAST(CASE WHEN obs_value IS NULL THEN 0 ELSE 1 END AS INT) AS is_observed
FROM j
"""


# ---------------------------------------------------------------------------
# SCD2 validity intervals — collapse the per-user event_type mutation log
# into versioned half-open intervals (Kimball type-2 dimension build), the
# gaps-and-islands window idiom on a single exchange.
# ---------------------------------------------------------------------------


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per maximal run of equal event_type per user: version 1..k,
    [valid_from_us, valid_to_us) with NULL close on the current version,
    and the run's event count. lag-flag -> running-sum -> collapse, all on
    one (user, ts) sort."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "ts_epoch"
    )
    return timeseries.scd2_intervals(
        ev, entity_col="user_id", attr_col="event_type",
        ts_us_col="ts_epoch", tiebreak_col="event_id",
    )


SQL_SCD2_INTERVALS = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS tse FROM events
),
c AS (
  SELECT user_id, event_type, tse, event_id,
         CASE WHEN LAG(event_type) OVER w IS NULL
                OR LAG(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY tse, event_id)
),
runs AS (
  -- running sum carries the SAME (tse, event_id) tiebreak as the chg
  -- window and the Spark implementation (timeseries.scd2_intervals):
  -- equal-microsecond events per user would otherwise make the version
  -- numbering nondeterministic on the oracle side (r13 ADVICE).
  SELECT user_id, event_type, tse,
         CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY tse, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS INT) AS version
  FROM c
),
iv AS (
  SELECT user_id, version, event_type,
         min(tse) AS valid_from_us, CAST(count(*) AS BIGINT) AS n_events
  FROM runs GROUP BY 1, 2, 3
)
SELECT user_id, version, event_type, valid_from_us,
       LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY version)
         AS valid_to_us,
       n_events
FROM iv
"""


def q_scd2_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consumption pattern SCD2 exists for: FACTS (purchase events)
    joined to the versioned dimension row active at fact time —
    ts ∈ [valid_from, valid_to) against the user's browsing-state
    dimension (SCD2 over the NON-purchase event stream, so the joined
    state is the behavior the purchase happened under, not the purchase
    itself). Facts before the user's first state row are dropped (inner
    semantics, matching the oracle's range join).

    Spark-first shape: NOT a join + range filter — interval starts tile
    each user's timeline, so membership is the as-of lookup on valid_from
    (operators/asof.py: union -> ONE hash exchange -> running last), with
    the half-open upper bound enforced by a residual filter. Linear per
    key where the range-join formulation explodes facts × versions.
    Oracle = the literal DuckDB range join over the same intervals."""
    ev = _events(spark, sf_dir)
    dim = timeseries.scd2_intervals(
        ev.filter(F.col("event_type") != "purchase").select(
            "user_id", "event_id", "event_type", "ts_epoch"
        ),
        entity_col="user_id", attr_col="event_type",
        ts_us_col="ts_epoch", tiebreak_col="event_id",
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts_epoch").alias("tse")
    )
    d = dim.select(
        "user_id",
        F.col("valid_from_us").alias("tse"),
        "version",
        F.col("event_type").alias("state_type"),
        "valid_to_us",
    )
    # asof_join's precondition: the right side must be unique per
    # (key, ts).  Same-microsecond state events of different types make
    # scd2_intervals emit a zero-width [t, t) version AND its successor at
    # the same valid_from; the range-join oracle never matches the empty
    # interval, but the running-last could pick it arbitrarily and the
    # residual valid_to filter would then DROP the fact (r14 ADVICE,
    # medium).  Collapse to the max version per (user, valid_from) — the
    # earlier same-instant versions are exactly the empty intervals.  A
    # map-side-combinable hash agg on a dim that is already per-version
    # granularity; the versions-per-user frame is the small side here.
    d = d.groupBy("user_id", "tse").agg(
        F.max_by(
            F.struct("version", "state_type", "valid_to_us"), F.col("version")
        ).alias("_v")
    ).select(
        "user_id", "tse",
        F.col("_v.version").alias("version"),
        F.col("_v.state_type").alias("state_type"),
        F.col("_v.valid_to_us").alias("valid_to_us"),
    )
    joined = asof.asof_join(
        facts, d, key_col="user_id", ts_col="tse",
        right_cols=["version", "state_type", "valid_to_us"],
        strict=False,  # inclusive lower bound: a fact AT valid_from belongs
    )
    return (
        joined
        .filter(F.col("asof_version").isNotNull())
        .filter(
            F.col("asof_valid_to_us").isNull()
            | (F.col("tse") < F.col("asof_valid_to_us"))
        )
        .select(
            "event_id", "user_id", "tse",
            F.col("asof_version").alias("version"),
            F.col("asof_state_type").alias("state_type"),
        )
    )


SQL_SCD2_DIM_JOIN = """
WITH se AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS tse FROM events
  WHERE event_type <> 'purchase'
),
sc AS (
  SELECT user_id, event_type, tse, event_id,
         CASE WHEN LAG(event_type) OVER w IS NULL
                OR LAG(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM se
  WINDOW w AS (PARTITION BY user_id ORDER BY tse, event_id)
),
sruns AS (
  SELECT user_id, event_type, tse,
         CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY tse, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS INT) AS version
  FROM sc
),
siv AS (
  SELECT user_id, version, event_type, min(tse) AS valid_from_us
  FROM sruns GROUP BY 1, 2, 3
),
sdim AS (
  SELECT user_id, version, event_type, valid_from_us,
         LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY version)
           AS valid_to_us
  FROM siv
),
sf AS (
  SELECT event_id, user_id, epoch_us(ts) AS tse FROM events
  WHERE event_type = 'purchase'
)
SELECT sf.event_id, sf.user_id, sf.tse,
       d.version, d.event_type AS state_type
FROM sf JOIN sdim d
  ON sf.user_id = d.user_id
 AND sf.tse >= d.valid_from_us
 AND (d.valid_to_us IS NULL OR sf.tse < d.valid_to_us)
"""


# ---------------------------------------------------------------------------
# Blocked fuzzy string join — near-identical part names paired by token
# blocking + banded Levenshtein (record linkage without the n² scan); see
# operators/fuzzy.py for the blocking/pre-filter/verify scale design.
# ---------------------------------------------------------------------------

FUZZY_MAX_DIST = 2
# Skew guard shared by BOTH engines: blocks larger than this are dropped on
# the Spark side (operators/fuzzy.py) AND by the QUALIFY clause in the two
# oracle SQLs below. Max observed block is 8 at the shipped SFs, but TPC-H's
# p_name token vocabulary is fixed (~92 words) while distinct names grow
# with scale factor, so around SF10 final-token blocks cross any fixed cap —
# the guard must live in both dialects or parity silently breaks at scale
# (r13 ADVICE, medium).
FUZZY_MAX_BLOCK = 10_000


def q_fuzzy_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct part-name pairs within edit distance 2, blocked on the
    name's final token (the discriminative noun) so candidate generation is
    sum-of-block² not n²; each side carries its catalog frequency."""
    part = read_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
    pairs = fuzzy.blocked_levenshtein_pairs(
        names,
        name_col="p_name",
        block_expr=F.element_at(F.split(F.col("p_name"), " "), -1),
        max_dist=FUZZY_MAX_DIST,
        max_block=FUZZY_MAX_BLOCK,
    )
    return pairs.select(
        "name_a", "name_b", "dist",
        F.col("n_parts_a").cast("long").alias("n_parts_a"),
        F.col("n_parts_b").cast("long").alias("n_parts_b"),
    )


SQL_FUZZY_PART_PAIRS = f"""
WITH n AS (SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts
           FROM part GROUP BY 1),
b AS (SELECT p_name, n_parts, string_split(p_name, ' ')[-1] AS blk FROM n
      QUALIFY count(*) OVER (PARTITION BY blk) <= {FUZZY_MAX_BLOCK})
SELECT a.p_name AS name_a, c.p_name AS name_b,
       CAST(levenshtein(a.p_name, c.p_name) AS INT) AS dist,
       a.n_parts AS n_parts_a, c.n_parts AS n_parts_b
FROM b a JOIN b c ON a.blk = c.blk
WHERE a.p_name < c.p_name
  AND abs(len(a.p_name) - len(c.p_name)) <= {FUZZY_MAX_DIST}
  AND levenshtein(a.p_name, c.p_name) <= {FUZZY_MAX_DIST}
"""


def q_fuzzy_name_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity RESOLUTION end-to-end: the blocked fuzzy pairs feed the
    distributed connected-components operator (hash-min label propagation,
    the dup_clusters machinery) and every name — singletons included —
    resolves to its cluster's canonical name (the member with the smallest
    first-catalog-appearance id, i.e. min p_partkey). Transitive closure
    matters: 'new bolt'–'red bolt'–'old bolt'–'cold bolt' chain into ONE
    cluster although the endpoints are far beyond edit distance 2.

    Scale: pairs are block-bounded (operators/fuzzy.py), CC rounds are
    edge-list-bounded with per-round checkpoints (operators/graph.py), and
    the name→id / id→name maps are name-vocabulary-sized broadcast joins.
    Oracle = DuckDB recursive CTE reach/min closure.
    """
    from recsys_pipeline_spark.operators import graph

    part = read_table(spark, sf_dir, "part")
    nm = part.groupBy("p_name").agg(F.min("p_partkey").alias("nid"))
    pairs = fuzzy.blocked_levenshtein_pairs(
        nm,
        name_col="p_name",
        block_expr=F.element_at(F.split(F.col("p_name"), " "), -1),
        max_dist=FUZZY_MAX_DIST,
        max_block=FUZZY_MAX_BLOCK,
    )
    edges = pairs.select(
        F.col("nid_a").alias("na"), F.col("nid_b").alias("nb")
    )
    comp = graph.connected_components(edges, src="na", dst="nb")
    labeled = nm.join(comp, nm["nid"] == comp["id"], "left").select(
        "p_name",
        F.coalesce(F.col("component"), F.col("nid")).alias("_comp"),
    )
    canon = F.broadcast(
        nm.select(F.col("nid").alias("_comp"), F.col("p_name").alias("canonical_name"))
    )
    return (
        labeled.join(canon, "_comp")
        .withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(Window.partitionBy("_comp")).cast("long"),
        )
        .select(F.col("p_name").alias("name"), "canonical_name", "cluster_size")
    )


SQL_FUZZY_NAME_CLUSTERS = f"""
WITH RECURSIVE
n AS (SELECT p_name, min(p_partkey) AS nid FROM part GROUP BY 1),
b AS (SELECT p_name, nid, string_split(p_name, ' ')[-1] AS blk FROM n
      QUALIFY count(*) OVER (PARTITION BY blk) <= {FUZZY_MAX_BLOCK}),
e AS (
  SELECT a.nid AS na, c.nid AS nb
  FROM b a JOIN b c ON a.blk = c.blk
  WHERE a.p_name < c.p_name
    AND abs(len(a.p_name) - len(c.p_name)) <= {FUZZY_MAX_DIST}
    AND levenshtein(a.p_name, c.p_name) <= {FUZZY_MAX_DIST}
),
sym AS (SELECT na AS s, nb AS d FROM e UNION SELECT nb, na FROM e),
reach(id, lbl) AS (
  SELECT nid, nid FROM n
  UNION
  SELECT s.d, r.lbl FROM reach r JOIN sym s ON r.id = s.s
),
cc AS (SELECT id, min(lbl) AS comp FROM reach GROUP BY id),
canon AS (SELECT nid AS comp, p_name AS canonical_name FROM n),
lab AS (SELECT n.p_name, cc.comp FROM n JOIN cc ON n.nid = cc.id)
SELECT lab.p_name AS name, canon.canonical_name,
       CAST(count(*) OVER (PARTITION BY lab.comp) AS BIGINT) AS cluster_size
FROM lab JOIN canon ON lab.comp = canon.comp
"""


# ---------------------------------------------------------------------------
# Peak concurrency — the distributed SWEEP-LINE: interval endpoints become
# +1/−1 deltas; a per-hour local prefix pass and a tiny hour-level carry
# pass compose into the exact global running level without ever sorting the
# corpus in one task (the classic two-pass prefix-sum decomposition).
# ---------------------------------------------------------------------------


def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour PEAK number of concurrently-active (user, day) activity
    intervals ([first event ts, last event ts], closed — a single-event
    interval is momentarily active), plus interval start/end counts.

    Scale shape: endpoint deltas partition by HOUR for the local
    running-sum pass (one corpus-keyed exchange); the cross-hour carry is
    a prefix sum over the HOUR frame — one row per hour, timeline-bounded
    (the funnel's driver-sized-window precedent), never a corpus-wide
    single-partition sort. Peak(h) = carry(h) + max(0, max local prefix):
    the hour's level starts at the carry, so an hour of pure −1 deltas
    peaks AT the carry (pinned in tests). Ties at one instant process
    +1 before −1 (touching intervals count as concurrent)."""
    ev = _events(spark, sf_dir)
    iv = ev.groupBy(
        "user_id",
        F.expr(f"ts_epoch DIV {timeseries.US_PER_DAY}").alias("day"),
    ).agg(F.min("ts_epoch").alias("s"), F.max("ts_epoch").alias("e"))
    # sweep shared verbatim with peak_concurrency_stream
    return timeseries.concurrency_profile(iv)


SQL_PEAK_CONCURRENCY = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         min(epoch_us(ts)) AS s, max(epoch_us(ts)) AS e
  FROM events GROUP BY 1, 2
),
d AS (SELECT s AS tse, 1 AS dd FROM iv
      UNION ALL SELECT e, -1 FROM iv),
r AS (
  SELECT tse // 3600000000 AS hour, dd,
         SUM(dd) OVER (ORDER BY tse, dd DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lvl
  FROM d
),
hs AS (
  SELECT hour, max(lvl) AS gmax, CAST(SUM(dd) AS BIGINT) AS net,
         CAST(SUM(CASE WHEN dd = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
         CAST(SUM(CASE WHEN dd = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ends
  FROM r GROUP BY 1
),
b AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM hs),
cal AS (SELECT unnest(range(h0, h1 + 1)) AS hour FROM b),
j AS (
  SELECT cal.hour, hs.gmax, coalesce(hs.net, 0) AS net,
         coalesce(hs.n_starts, 0) AS n_starts,
         coalesce(hs.n_ends, 0) AS n_ends
  FROM cal LEFT JOIN hs ON cal.hour = hs.hour
),
k AS (
  SELECT hour, gmax, n_starts, n_ends,
         coalesce(SUM(net) OVER (ORDER BY hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS carry
  FROM j
)
SELECT CAST(hour AS BIGINT) AS hour,
       CAST(greatest(coalesce(gmax, carry), carry) AS BIGINT)
         AS peak_concurrency,
       n_starts, n_ends
FROM k
"""


# ---------------------------------------------------------------------------
# Rolling anomaly detection — per-user trailing-30-day z-score flag with the
# float arithmetic ELIMINATED: the k-sigma test (x − S/n)² > k²·(nQ − S²)/n²
# multiplies out to the pure-BIGINT comparison (n·x − S)² > k²·(n·Q − S²),
# so the flag is bit-identical across engines (no stddev doubles anywhere).
# ---------------------------------------------------------------------------

ANOM_K = 3  # k-sigma threshold
ANOM_MIN_N = 5  # minimum trailing support before flagging


def q_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every event scored against its user's trailing 30-day REFERENCE
    window (RANGE frame on day, current day EXCLUDED — a self-inclusive
    window caps a lone spike at z = sqrt(n-1), the classic masking effect,
    so a 5x outlier over 9 calm days would score exactly 3.0 and slip a
    k=3 gate): is_anomaly = 1 iff the prior window holds >= 5 events and
    the value sits more than 3 population-sigmas from the window mean —
    evaluated as exact integer algebra on cent-scaled values. One (user)
    exchange; sum / sum-of-squares / count share the single RANGE frame.

    The products run in decimal(38,0), not long: DuckDB's SUM(BIGINT) is
    HUGEINT so the oracle evaluates (n·x − S)² > k²·(nQ − S²) in int128,
    and plain long algebra on the Spark side would wrap silently once a
    user's trailing cent-sum crosses ~3e9 (r13 ADVICE). decimal(38,0)
    headroom: |n·x − S| < 1e19 squared stays under 1e38 for any plausible
    cent magnitude (v_c ~ 1e7, window ~ 1e9 events)."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_id",
        "user_id",
        F.expr(f"ts_epoch DIV {timeseries.US_PER_DAY}").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("v_c"),
    )
    # Explicit-width repartition on the window key (r17, guide §2.2): the
    # ~2 MB exchange under the window is byte-tiny but COMPUTE-dense
    # (decimal(38,0) sliding-frame aggregation, tens of int128 ops per
    # 16-byte row), and AQE's byte-based coalescing serialized it
    # (measured: 1.02-1.09 s with coalescing on vs 0.45-0.48 s off — the
    # r16 fuzzy_decontaminate verify class). REPARTITION_BY_NUM is exempt
    # from coalescing; the window reuses the hash partitioning, so this is
    # still exactly one exchange. Width floored by shuffle.partitions for
    # dynamic-allocation sessions.
    sess = spark
    try:
        _sp = int(sess.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        _sp = 0
    base = base.repartition(
        max(sess.sparkContext.defaultParallelism, _sp), F.col("user_id")
    )
    dec = "decimal(38,0)"
    w = Window.partitionBy("user_id").orderBy("day").rangeBetween(-29, -1)
    n = F.count("v_c").over(w)
    s = F.sum(F.col("v_c").cast(dec)).over(w)
    q = F.sum(F.col("v_c").cast(dec) * F.col("v_c")).over(w)
    nd, x = n.cast(dec), F.col("v_c").cast(dec)
    lhs = (nd * x - s) * (nd * x - s)
    rhs = F.lit(ANOM_K * ANOM_K).cast(dec) * (nd * q - s * s)
    return base.select(
        "event_id",
        "user_id",
        "day",
        "v_c",
        n.cast("long").alias("n_win"),
        F.when((n >= ANOM_MIN_N) & (lhs > rhs), 1).otherwise(0)
        .cast("int")
        .alias("is_anomaly"),
    )


SQL_ROLLING_ANOMALY = f"""
WITH e AS (
  SELECT event_id, user_id,
         epoch_us(ts) // 86400000000 AS day,
         CAST(round(value * 100) AS BIGINT) AS v_c
  FROM events
),
s AS (
  SELECT event_id, user_id, day, v_c,
         COUNT(v_c) OVER w AS n,
         SUM(v_c) OVER w AS sv,
         SUM(v_c * v_c) OVER w AS qv
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY day
               RANGE BETWEEN 29 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, day, v_c,
       CAST(n AS BIGINT) AS n_win,
       CAST(CASE WHEN n >= {ANOM_MIN_N}
                  AND (n * v_c - sv) * (n * v_c - sv)
                      > {ANOM_K * ANOM_K} * (n * qv - sv * sv)
                 THEN 1 ELSE 0 END AS INT) AS is_anomaly
FROM s
"""


CUSUM_H = 5


def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user CUSUM drift flags over daily spend totals — the
    sequential change-point test every metrics platform runs next to the
    point-outlier scan (rolling_anomaly finds a spiked DAY; CUSUM finds a
    sustained LEVEL SHIFT too small for any single day to trip k-sigma).
    The recurrence is re-expressed as prefix-sum minus running-min
    (operators/timeseries.py:cusum_drift), so the whole test is two
    running windows and the full-partition stats riding ONE user
    exchange, all in exact decimal(38,0) algebra — bit-identical flags
    in both engines, no sqrt, no divide."""
    ev = _events(spark, sf_dir)
    daily = (
        ev.select(
            "user_id",
            F.expr(f"ts_epoch DIV {timeseries.US_PER_DAY}").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("v_c"),
        )
        .groupBy("user_id", "day")
        .agg(F.sum("v_c").alias("spend_c"))
    )
    return timeseries.cusum_drift(daily, "user_id", "day", "spend_c", h=CUSUM_H)


SQL_CUSUM_DRIFT = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         CAST(round(value * 100) AS BIGINT) AS v_c
  FROM events
),
d AS (SELECT user_id, day, CAST(SUM(v_c) AS BIGINT) AS spend_c
      FROM e GROUP BY 1, 2),
st AS (
  -- scaled increments d_j = n*x_j - S in HUGEINT (the decimal(38,0) twin)
  SELECT user_id, day, spend_c,
         COUNT(*) OVER wa AS n,
         SUM(CAST(spend_c AS HUGEINT)) OVER wa AS s,
         SUM(CAST(spend_c AS HUGEINT) * spend_c) OVER wa AS q
  FROM d
  WINDOW wa AS (PARTITION BY user_id)
),
p AS (
  SELECT user_id, day, spend_c, n, s, q,
         SUM(CAST(n AS HUGEINT) * spend_c - s) OVER wr AS pp
  FROM st
  WINDOW wr AS (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
cc AS (
  SELECT user_id, day, spend_c, n, s, q,
         pp - LEAST(CAST(0 AS HUGEINT), MIN(pp) OVER wr) AS c
  FROM p
  WINDOW wr AS (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, day, spend_c,
       CAST(c AS BIGINT) AS cusum_nx,
       CAST(CASE WHEN c > 0 AND c * c > {CUSUM_H * CUSUM_H} * (n * q - s * s)
                 THEN 1 ELSE 0 END AS INT) AS is_drift
FROM cc
"""


RAU_WINDOW_DAYS = 7


def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness ppm per day — the
    product-analytics engagement headline.  The scale-critical choice:
    trailing distinct-count is NOT a range self-join or a distinct-over-
    RANGE window (neither distributes); each distinct (user, day) activity
    row instead CONTRIBUTES to the <=7 target days it is visible from — a
    bounded fan-out of the per-day-deduped frame, then one count_distinct
    per target day.  Three exchanges total (activity dedup, DAU agg, WAU
    distinct agg); the day-span clip rides a broadcast 1-row max.
    stickiness_ppm = dau * 1e6 DIV wau, exact integer."""
    ev = _events(spark, sf_dir)
    ud = ev.select(
        "user_id", F.expr(f"ts_epoch DIV {timeseries.US_PER_DAY}").alias("day")
    ).distinct()
    return timeseries.active_users_report(ud, window_days=RAU_WINDOW_DAYS)


SQL_ROLLING_ACTIVE_USERS = f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
mx AS (SELECT max(day) AS dmax FROM ud),
dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
contrib AS (
  SELECT user_id,
         unnest(range(day, least(day + {RAU_WINDOW_DAYS}, (SELECT dmax FROM mx) + 1))) AS day
  FROM ud
),
wau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        FROM contrib GROUP BY 1)
SELECT w.day, COALESCE(d.dau, 0) AS dau, w.wau,
       CAST(COALESCE(d.dau, 0) * 1000000 // w.wau AS BIGINT) AS stickiness_ppm
FROM wau w LEFT JOIN dau d USING (day)
"""


SEG_PCTS = (50, 90)


def q_segment_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-market-segment account-balance quantiles (median + p90,
    lower-rank rule) — the grouped counterpart of exact_percentiles,
    computed on the per-(segment, cents) HISTOGRAM so the ordered window
    never sees raw customer rows (operators/stats.grouped_exact_quantiles:
    a per-group row_number over raw rows would put each whole segment on
    one reducer; the histogram frame is segment-count x value-vocabulary
    bounded)."""
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    )
    return stats.grouped_exact_quantiles(cust, "segment", "bal_c", SEG_PCTS)


SQL_SEGMENT_QUANTILES = f"""
WITH sq AS (
  SELECT c_mktsegment AS segment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer
),
sqh AS (SELECT segment, bal_c, CAST(count(*) AS BIGINT) AS cnt
        FROM sq GROUP BY 1, 2),
sqp AS (
  SELECT segment, bal_c, cnt,
         COALESCE(SUM(cnt) OVER (PARTITION BY segment ORDER BY bal_c
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS rows_before
  FROM sqh
),
sqt AS (SELECT segment, CAST(SUM(cnt) AS BIGINT) AS n FROM sqh GROUP BY 1),
sqk AS (
  SELECT segment, pct, n, (n - 1) * pct // 100 + 1 AS k
  FROM sqt, (SELECT unnest([{", ".join(str(p) for p in SEG_PCTS)}]) AS pct)
)
SELECT h.segment, CAST(k.pct AS INT) AS pct, k.n, CAST(k.k AS BIGINT) AS k,
       h.bal_c
FROM sqp h JOIN sqk k
  ON h.segment = k.segment
 AND h.rows_before < k.k AND k.k <= h.rows_before + h.cnt
"""


def q_segment_quantiles_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-7 INTERPOLATED per-segment balance quantiles (the R/NumPy/DuckDB
    ``quantile_cont`` definition) on the same per-(segment, cents) histogram
    as segment_quantiles — the interpolation stays EXACT integer algebra by
    emitting 100*v_lo + rem*(v_hi - v_lo) (cents scaled x100), so no float
    crosses the engine boundary (operators/stats.
    grouped_interp_quantiles_from_hist; r15 verdict #7)."""
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    )
    hist = cust.groupBy("segment", "bal_c").agg(F.count(F.lit(1)).alias("cnt"))
    return stats.grouped_interp_quantiles_from_hist(hist, "segment", "bal_c", SEG_PCTS)


SQL_SEGMENT_QUANTILES_CONT = f"""
WITH cq AS (
  SELECT c_mktsegment AS segment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer
),
cqh AS (SELECT segment, bal_c, CAST(count(*) AS BIGINT) AS cnt
        FROM cq GROUP BY 1, 2),
cqp AS (
  SELECT segment, bal_c, cnt,
         COALESCE(SUM(cnt) OVER (PARTITION BY segment ORDER BY bal_c
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS rows_before
  FROM cqh
),
cqt AS (SELECT segment, CAST(SUM(cnt) AS BIGINT) AS n FROM cqh GROUP BY 1),
cqk AS (
  SELECT segment, pct, n,
         (n - 1) * pct // 100 + 1 AS k1,
         (n - 1) * pct % 100 AS rem
  FROM cqt, (SELECT unnest([{", ".join(str(p) for p in SEG_PCTS)}]) AS pct)
),
cqk2 AS (
  SELECT segment, pct, n, k1, rem,
         k1 + CASE WHEN rem > 0 THEN 1 ELSE 0 END AS k2
  FROM cqk
)
SELECT k.segment, CAST(k.pct AS INT) AS pct, k.n,
       CAST(100 * h1.bal_c + k.rem * (h2.bal_c - h1.bal_c) AS BIGINT) AS q_x100
FROM cqk2 k
JOIN cqp h1 ON h1.segment = k.segment
           AND h1.rows_before < k.k1 AND k.k1 <= h1.rows_before + h1.cnt
JOIN cqp h2 ON h2.segment = k.segment
           AND h2.rows_before < k.k2 AND k.k2 <= h2.rows_before + h2.cnt
"""


SESSION_GAP_US_PM = 1800 * 1_000_000  # same 30-min gap as q_sessionize
CONVERSION_PATTERN = "v.*c.*p"  # view, later click, later purchase — within
# one session; '.*' semantics agree between Java regex (Spark rlike) and
# RE2 (DuckDB regexp_matches), the html_extract cross-engine discipline


def _gap_sessions(ev: DataFrame) -> DataFrame:
    """30-min-gap sessionization shared by the pattern queries: adds
    ``session_idx`` (0-based per user) over one user exchange — the same
    gap rule as queries.q_sessionize."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_epoch").asc(), F.col("event_id").asc()
    )
    gap = F.col("ts_epoch") - F.lag("ts_epoch").over(w)
    return ev.withColumn(
        "_new", F.when(gap.isNull() | (gap > SESSION_GAP_US_PM), 1).otherwise(0)
    ).withColumn(
        "session_idx",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1,
    )


def q_session_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-2016 MATCH_RECOGNIZE-style sequence-pattern matching over
    sessions: each session's event-type initials concatenate (in exact
    (ts, event_id) order) into a string, and 'did this session convert'
    is the regex v.*c.*p on it — view, then click, then purchase, in
    order, within ONE gap-bounded session (the ordered, session-scoped
    sharpening of funnel_conversion's lifetime-scoped stages).  Spark has
    no MATCH_RECOGNIZE operator; the string encoding IS the classic
    re-expression (pattern over a per-group ordered reduction — the
    parameterized ``windows.match_pattern`` kernel, r16), exact in both
    engines because the initials are single deterministic chars and the
    order is total.

    Scale: one user exchange carries the sessionize windows; the
    per-session string builds with the array_sort-of-structs idiom (an
    AGGREGATE with partial combine, not a second sort exchange) and is
    session-length-bounded — sessions are gap-bounded, so no lifetime
    concat ever materializes. The string never leaves the plan (only
    n_events + the match flag are emitted)."""
    sess = _gap_sessions(_events(spark, sf_dir))
    return windows.match_pattern(
        sess,
        part_cols=["user_id", "session_idx"],
        order_cols=["ts_epoch", "event_id"],
        class_col=F.substring("event_type", 1, 1),
        pattern=CONVERSION_PATTERN,
        match_alias="is_conversion",
    ).select(
        "user_id",
        F.col("session_idx").cast("long").alias("session_idx"),
        "n_events",
        "is_conversion",
    )


SQL_SESSION_CONVERSIONS = f"""
WITH spg AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS tse,
         CASE WHEN epoch_us(ts)
                   - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_US_PM}
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sps AS (
  SELECT event_id, user_id, event_type, tse,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY tse, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
           AS session_idx
  FROM spg
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(CASE WHEN regexp_matches(
              string_agg(substr(event_type, 1, 1), '' ORDER BY tse, event_id),
              '{CONVERSION_PATTERN}') THEN 1 ELSE 0 END AS INT) AS is_conversion
FROM sps GROUP BY 1, 2
"""


REPEAT_PATTERN = "p.*p"  # two purchases in one session, any events between


def q_repeat_purchase_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second MATCH_RECOGNIZE-style pattern on the shared kernel (r15
    VERDICT #3): repeat-purchase sessions, ``p.*p`` over a DEFINE-mapped
    class string — this one exercises ``windows.classify_events`` (explicit
    pattern-variable definitions with a default filler char) rather than
    the initials shortcut, proving the kernel is parameterized in both the
    pattern AND the event-class axis.  Same sessionization, same single
    user exchange, same never-materialized group-bounded string."""
    sess = _gap_sessions(_events(spark, sf_dir))
    cls = windows.classify_events(
        [("p", F.col("event_type") == "purchase")], default="_"
    )
    return windows.match_pattern(
        sess,
        part_cols=["user_id", "session_idx"],
        order_cols=["ts_epoch", "event_id"],
        class_col=cls,
        pattern=REPEAT_PATTERN,
        match_alias="is_repeat",
    ).select(
        "user_id",
        F.col("session_idx").cast("long").alias("session_idx"),
        "n_events",
        "is_repeat",
    )


SQL_REPEAT_PURCHASE_SESSIONS = f"""
WITH spg AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS tse,
         CASE WHEN epoch_us(ts)
                   - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_US_PM}
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sps AS (
  SELECT event_id, user_id, event_type, tse,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY tse, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
           AS session_idx
  FROM spg
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(CASE WHEN regexp_matches(
              string_agg(CASE WHEN event_type = 'purchase' THEN 'p' ELSE '_' END,
                         '' ORDER BY tse, event_id),
              '{REPEAT_PATTERN}') THEN 1 ELSE 0 END AS INT) AS is_repeat
FROM sps GROUP BY 1, 2
"""


QUERIES_AN: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "event_gaps": q_event_gaps,
    "spend_rank": q_spend_rank,
    "trailing_spend_30d": q_trailing_spend_30d,
    "audience_set_ops": q_audience_set_ops,
    "cube_revenue": q_cube_revenue,
    "asof_click_attribution": q_asof_click_attribution,
    "corr_qty_price": q_corr_qty_price,
    "tfidf_doc_terms": q_tfidf_doc_terms,
    "value_percentiles": q_value_percentiles,
    "exact_percentiles": q_exact_percentiles,
    "exact_mad": q_exact_mad,
    "funnel_conversion": q_funnel_conversion,
    "retention_cohorts": q_retention_cohorts,
    "daily_gapfill": q_daily_gapfill,
    "scd2_intervals": q_scd2_intervals,
    "scd2_dim_join": q_scd2_dim_join,
    "fuzzy_part_pairs": q_fuzzy_part_pairs,
    "fuzzy_name_clusters": q_fuzzy_name_clusters,
    "peak_concurrency": q_peak_concurrency,
    "rolling_anomaly": q_rolling_anomaly,
    "ols_qty_price": q_ols_qty_price,
    "cusum_drift": q_cusum_drift,
    "rolling_active_users": q_rolling_active_users,
    "segment_quantiles": q_segment_quantiles,
    "session_conversions": q_session_conversions,
    "repeat_purchase_sessions": q_repeat_purchase_sessions,
    "segment_quantiles_cont": q_segment_quantiles_cont,
}

ORACLES_AN: dict[str, str] = {
    "peak_concurrency": SQL_PEAK_CONCURRENCY,
    "rolling_anomaly": SQL_ROLLING_ANOMALY,
    "ols_qty_price": SQL_OLS_QTY_PRICE,
    "daily_gapfill": SQL_DAILY_GAPFILL,
    "scd2_intervals": SQL_SCD2_INTERVALS,
    "scd2_dim_join": SQL_SCD2_DIM_JOIN,
    "fuzzy_part_pairs": SQL_FUZZY_PART_PAIRS,
    "fuzzy_name_clusters": SQL_FUZZY_NAME_CLUSTERS,
    "funnel_conversion": SQL_FUNNEL_CONVERSION,
    "retention_cohorts": SQL_RETENTION_COHORTS,
    "event_gaps": SQL_EVENT_GAPS,
    "spend_rank": SQL_SPEND_RANK,
    "trailing_spend_30d": SQL_TRAILING_SPEND,
    "audience_set_ops": SQL_AUDIENCE_SET_OPS,
    "cube_revenue": SQL_CUBE_REVENUE,
    "asof_click_attribution": SQL_ASOF_CLICK,
    "corr_qty_price": SQL_CORR_QTY_PRICE,
    "tfidf_doc_terms": SQL_TFIDF,
    "value_percentiles": SQL_VALUE_PERCENTILES,
    "exact_percentiles": SQL_EXACT_PERCENTILES,
    "exact_mad": SQL_EXACT_MAD,
    "cusum_drift": SQL_CUSUM_DRIFT,
    "rolling_active_users": SQL_ROLLING_ACTIVE_USERS,
    "segment_quantiles": SQL_SEGMENT_QUANTILES,
    "session_conversions": SQL_SESSION_CONVERSIONS,
    "repeat_purchase_sessions": SQL_REPEAT_PURCHASE_SESSIONS,
    "segment_quantiles_cont": SQL_SEGMENT_QUANTILES_CONT,
}
