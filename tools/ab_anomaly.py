"""A/B (r17, VERDICT #7): rolling_anomaly's trailing window evaluated as
(a) the current SLIDING range frame (-29..-1) — Spark re-aggregates the
whole frame per row (SlidingWindowFunctionFrame is O(frame)/row), vs
(b) PREFIX-DIFFERENCE: two UNBOUNDED-PRECEDING range frames (.. -1 minus
.. -30), each incremental O(1)/row. All quantities are integers in
decimal(38,0), so the differences are exact and is_anomaly/n_win are
bit-identical (collect-compare gated before timing).

Run via: python tools/ab_bench.py tools.ab_anomaly [reps] [sf_dir]
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from recsys_pipeline_spark.operators import timeseries  # noqa: E402
from recsys_pipeline_spark.queries_analytics import (  # noqa: E402
    ANOM_K,
    ANOM_MIN_N,
    QUERIES_AN,
    _events,
)


def q_rolling_anomaly_prefix(spark, sf_dir):
    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_id",
        "user_id",
        F.expr(f"ts_epoch DIV {timeseries.US_PER_DAY}").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("v_c"),
    )
    sess = spark
    try:
        _sp = int(sess.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        _sp = 0
    base = base.repartition(
        max(sess.sparkContext.defaultParallelism, _sp), F.col("user_id"))
    dec = "decimal(38,0)"
    w1 = Window.partitionBy("user_id").orderBy("day").rangeBetween(
        Window.unboundedPreceding, -1)
    w30 = Window.partitionBy("user_id").orderBy("day").rangeBetween(
        Window.unboundedPreceding, -30)
    vc_d = F.col("v_c").cast(dec)
    n = F.count("v_c").over(w1) - F.count("v_c").over(w30)
    s = F.coalesce(F.sum(vc_d).over(w1), F.lit(0).cast(dec)) - F.coalesce(
        F.sum(vc_d).over(w30), F.lit(0).cast(dec))
    q = F.coalesce(F.sum(vc_d * F.col("v_c")).over(w1), F.lit(0).cast(dec)) - F.coalesce(
        F.sum(vc_d * F.col("v_c")).over(w30), F.lit(0).cast(dec))
    nd, x = n.cast(dec), vc_d
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


VARIANTS = {
    "anom_cur": QUERIES_AN["rolling_anomaly"],
    "anom_prefix": q_rolling_anomaly_prefix,
}

if __name__ == "__main__":
    # equivalence mode: bit-identical collect-compare at two SFs
    from recsys_pipeline_spark.session import get_spark

    spark = get_spark("ab-anomaly-equiv")
    spark.sparkContext.setLogLevel("ERROR")
    ok = True
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        a = sorted(map(tuple, VARIANTS["anom_cur"](spark, sf).collect()))
        b = sorted(map(tuple, VARIANTS["anom_prefix"](spark, sf).collect()))
        same = a == b
        ok &= same
        print(f"{sf}: rows={len(a)} identical={same}", flush=True)
        if not same:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
            print("first diffs:", diffs)
    print("EQUIV PASS" if ok else "EQUIV FAIL")
    sys.exit(0 if ok else 1)
