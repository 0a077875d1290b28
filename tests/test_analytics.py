"""Window-analytics / as-of / stats operator tests beyond the oracle parity
gate (tests/test_oracle_parity.py covers the value checks for every
queries_analytics.py entry)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from recsys_pipeline_spark.operators import asof, stats
from recsys_pipeline_spark import queries_analytics as QA
from tests.conftest import SF_SMOKE


def _sides(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 5, "d")],
        "k int, ts int, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 25, 250.0), (3, 1, 999.0)],
        "k int, ts int, v double",
    )
    return left, right


def test_asof_strict_excludes_same_instant(spark):
    left, right = _sides(spark)
    out = asof.asof_join(
        left, right, key_col="k", ts_col="ts", right_cols=["ts", "v"], strict=True
    )
    got = {r["tag"]: (r["asof_ts"], r["asof_v"]) for r in out.collect()}
    # ts=10 left row must NOT see the ts=10 right row under strict `<`
    assert got["a"] == (None, None)
    assert got["b"] == (10, 100.0)
    assert got["c"] == (25, 250.0)
    assert got["d"] == (None, None)  # key 2 has no right rows at all


def test_asof_inclusive_matches_same_instant(spark):
    left, right = _sides(spark)
    out = asof.asof_join(
        left, right, key_col="k", ts_col="ts", right_cols=["v"], strict=False
    )
    got = {r["tag"]: r["asof_v"] for r in out.collect()}
    assert got["a"] == 100.0
    assert got["b"] == 100.0
    assert got["c"] == 250.0


def test_asof_plan_has_no_join(spark):
    """The merge-scan form must stay a union + one window — a Join node means
    the quadratic candidate formulation snuck back in."""
    left, right = _sides(spark)
    out = asof.asof_join(left, right, "k", "ts", ["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_navigation_and_ranking_share_one_exchange(spark):
    df = QA.q_event_gaps(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    ranked = QA.q_spend_rank(spark, SF_SMOKE)
    rplan = ranked._jdf.queryExecution().executedPlan().toString()
    # agg shuffle + window shuffle; the broadcast dim must not add a shuffle
    assert rplan.count("Exchange hashpartitioning") <= 2
    assert "BroadcastHashJoin" in rplan


def test_approx_distinct_within_tolerance(spark):
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    approx = {
        r["event_type"]: r["approx_uniques"]
        for r in stats.approx_distinct(events, "event_type", "user_id").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for t, n in exact.items():
        assert abs(approx[t] - n) <= max(2, 0.05 * n), (t, approx[t], n)


def test_exact_corr_matches_builtin_loosely(spark):
    """Sanity: the exact-decimal corr agrees with Spark's double corr to
    float tolerance (the decimal path exists for cross-engine exactness,
    not to change the statistic)."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    ours = {
        r["l_returnflag"]: r["corr"]
        for r in stats.exact_bivariate_stats(
            li, "l_returnflag", "l_quantity", "l_extendedprice"
        ).collect()
    }
    builtin = {
        r["l_returnflag"]: r["c"]
        for r in li.groupBy("l_returnflag")
        .agg(F.corr("l_quantity", "l_extendedprice").alias("c"))
        .collect()
    }
    for k, v in builtin.items():
        assert ours[k] == pytest.approx(v, abs=1e-6)


def test_asof_join_matches_bruteforce_on_random_data(spark):
    """Property check: on random co-timed data (duplicate left timestamps,
    sparse keys) the merge-scan as-of join must equal the brute-force
    max-prior-match definition, for both strict and inclusive bounds."""
    import random

    rng = random.Random(99)
    left = [(rng.randrange(1, 8), rng.randrange(0, 40), i) for i in range(120)]
    right_map = {}
    for _ in range(80):
        k, ts = rng.randrange(1, 8), rng.randrange(0, 40)
        right_map[(k, ts)] = rng.random()  # unique per (key, ts) by construction
    ldf = spark.createDataFrame(left, "k int, ts int, lid int")
    rdf = spark.createDataFrame(
        [(k, ts, v) for (k, ts), v in right_map.items()], "k int, ts int, v double"
    )
    for strict in (True, False):
        out = {
            r["lid"]: r["asof_v"]
            for r in asof.asof_join(
                ldf, rdf, key_col="k", ts_col="ts", right_cols=["v"], strict=strict
            ).collect()
        }
        for k, ts, lid in left:
            cands = [
                (rts, v)
                for (rk, rts), v in right_map.items()
                if rk == k and (rts < ts if strict else rts <= ts)
            ]
            want = max(cands)[1] if cands else None
            assert out[lid] == want, (lid, strict, out[lid], want)


def test_item_transitions_planted_counts_and_self_loop_drop(spark, tmp_path):
    """Planted streams: self-transitions drop, counts aggregate across
    users, ties rank by (cnt desc, next_item asc)."""
    import json

    from recsys_pipeline_spark.queries_ext import q_item_transitions

    rows = [
        # user 1: A A B C  -> A->B, B->C (A->A self-loop dropped)
        (1, 1, 100, "view", 0.0, json.dumps({"k": 1})),
        (2, 1, 200, "view", 0.0, json.dumps({"k": 1})),
        (3, 1, 300, "view", 0.0, json.dumps({"k": 2})),
        (4, 1, 400, "view", 0.0, json.dumps({"k": 3})),
        # user 2: B C -> B->C (now cnt 2)
        (5, 2, 100, "view", 0.0, json.dumps({"k": 2})),
        (6, 2, 200, "view", 0.0, json.dumps({"k": 3})),
        # user 3: B D -> B->D (tie-breaks after C at cnt 1)
        (7, 3, 100, "view", 0.0, json.dumps({"k": 2})),
        (8, 3, 200, "view", 0.0, json.dumps({"k": 4})),
    ]
    df = spark.createDataFrame(
        [(e, __import__("datetime").datetime.fromtimestamp(t), u, et, v, p)
         for e, u, t, et, v, p in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    sf = str(tmp_path / "ev")
    df.write.parquet(sf + "/events.parquet")
    got = {
        (int(r["item"]), int(r["rk"])): (int(r["next_item"]), int(r["cnt"]))
        for r in q_item_transitions(spark, sf).collect()
    }
    # C (item 3) is every stream's last event, so it sources no transition
    assert got == {
        (1, 1): (2, 1),  # A -> B
        (2, 1): (3, 2),  # B -> C: cnt 2 outranks ...
        (2, 2): (4, 1),  # ... B -> D at cnt 1
    }


# ---------------------------------------------------------------------------
# item_transitions: property vs a sequential simulation on random streams
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_ev = st.tuples(
    st.integers(min_value=1, max_value=4),    # user
    st.integers(min_value=0, max_value=500),  # ts seconds
    st.integers(min_value=0, max_value=6),    # item
)
_streams = st.lists(_ev, min_size=1, max_size=40)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_streams)
def test_item_transitions_equals_sequential_simulation(spark, tmp_path_factory, evs):
    import datetime
    import json

    from recsys_pipeline_spark.queries_ext import TRANSITIONS_TOPK, q_item_transitions

    rows = [
        (i, datetime.datetime.fromtimestamp(t), u, "view", 0.0, json.dumps({"k": item}))
        for i, (u, t, item) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    sf = str(tmp_path_factory.mktemp("itr"))
    df.write.mode("overwrite").parquet(sf + "/events.parquet")

    # sequential simulation: per user sort by (ts, event_id), count pairs
    by_user: dict[int, list] = {}
    for i, (u, t, item) in enumerate(evs):
        by_user.setdefault(u, []).append((t, i, item))
    counts: dict[tuple[int, int], int] = {}
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            if a != b:
                counts[(a, b)] = counts.get((a, b), 0) + 1
    want = {}
    for item in {a for a, _ in counts}:
        nxt = sorted(
            ((c, b) for (a, b), c in counts.items() if a == item),
            key=lambda cb: (-cb[0], cb[1]),
        )[:TRANSITIONS_TOPK]
        for rk, (c, b) in enumerate(nxt, start=1):
            want[(item, rk)] = (b, c)
    got = {
        (int(r["item"]), int(r["rk"])): (int(r["next_item"]), int(r["cnt"]))
        for r in q_item_transitions(spark, sf).collect()
    }
    assert got == want


def _ev_frame(spark, rows):
    """rows: (event_id, user_id, ts_seconds, event_type)"""
    import datetime
    import json

    return spark.createDataFrame(
        [
            (e, datetime.datetime.utcfromtimestamp(t), u, et, 0.0, json.dumps({"k": 0}))
            for e, u, t, et in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def test_funnel_conversion_strict_order_semantics(spark, tmp_path):
    """Stage events must strictly FOLLOW the previous stage's first event:
    a click before (or exactly at) the first view does not convert; a
    purchase without a preceding click does not convert."""
    from recsys_pipeline_spark.queries_analytics import q_funnel_conversion

    rows = [
        (1, 1, 100, "view"), (2, 1, 200, "click"), (3, 1, 300, "purchase"),  # full
        (4, 2, 100, "click"), (5, 2, 200, "view"),  # click precedes view
        (6, 3, 100, "view"), (7, 3, 200, "purchase"),  # purchase skips click
        (8, 4, 100, "view"), (9, 4, 100, "click"),  # equal ts: strict > drops
    ]
    sf = str(tmp_path / "fun")
    _ev_frame(spark, rows).write.parquet(sf + "/events.parquet")
    got = {
        int(r["stage_idx"]): (r["stage"], int(r["n_users"]), int(r["conv_from_prev_ppm"]))
        for r in q_funnel_conversion(spark, sf).collect()
    }
    assert got == {
        1: ("view", 4, 1000000),
        2: ("click", 1, 250000),
        3: ("purchase", 1, 1000000),
    }


def test_funnel_zero_stage_reports_zero_ppm(spark, tmp_path):
    """An EMPTY middle stage must report 0 ppm for the NEXT stage in BOTH
    dialects (the lag=0 branch — distinct from stage 1's no-predecessor
    1e6 default). Pinned in Spark and the DuckDB oracle on the same
    planted frame so the duplicated CASE ladders cannot drift silently
    (r13 verdict, What's-wrong #2)."""
    import duckdb

    from recsys_pipeline_spark.queries_analytics import (
        SQL_FUNNEL_CONVERSION,
        q_funnel_conversion,
    )

    rows = [(1, 1, 100, "view"), (2, 1, 200, "purchase")]  # no clicks at all
    sf = str(tmp_path / "funz")
    _ev_frame(spark, rows).write.parquet(sf + "/events.parquet")
    want = {
        1: ("view", 1, 1000000),
        2: ("click", 0, 0),  # 0 of 1 viewer clicked
        3: ("purchase", 0, 0),  # lag = 0: nobody COULD convert -> 0, not 1e6
    }
    got = {
        int(r["stage_idx"]): (r["stage"], int(r["n_users"]), int(r["conv_from_prev_ppm"]))
        for r in q_funnel_conversion(spark, sf).collect()
    }
    assert got == want
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet/*.parquet')"
    )
    oracle = {
        int(r[0]): (r[1], int(r[2]), int(r[3]))
        for r in con.execute(SQL_FUNNEL_CONVERSION).fetchall()
    }
    assert oracle == want


def test_retention_cohorts_planted_matrix(spark, tmp_path):
    """Hand-built cohort matrix: users A/C in week-0 cohort (A active weeks
    0,1,3; C week 0 only), user B in week-1 cohort."""
    from recsys_pipeline_spark.queries_analytics import q_retention_cohorts

    wk = 7 * 86400
    rows = [
        (1, 1, 0 * wk + 10, "view"),
        (2, 1, 1 * wk + 10, "view"),
        (3, 1, 3 * wk + 10, "click"),
        (4, 2, 1 * wk + 20, "view"),
        (5, 2, 1 * wk + 30, "view"),
        (6, 3, 0 * wk + 50, "purchase"),
    ]
    sf = str(tmp_path / "coh")
    _ev_frame(spark, rows).write.parquet(sf + "/events.parquet")
    got = {
        (int(r["cohort_week"]), int(r["week_offset"])): (
            int(r["n_users"]),
            int(r["retention_ppm"]),
        )
        for r in q_retention_cohorts(spark, sf).collect()
    }
    assert got == {
        (0, 0): (2, 1000000),
        (0, 1): (1, 500000),
        (0, 3): (1, 500000),
        (1, 0): (1, 1000000),
    }


# ---------------------------------------------------------------------------
# Round-13 continuation: gap-fill / SCD2 / blocked fuzzy join
# ---------------------------------------------------------------------------


def test_daily_gapfill_planted(spark, tmp_path):
    """User 1: events on day 0 (two — last wins) and day 3 -> dense days
    0..3 with the day-0 value carried across the gap; user 2: single day."""
    from recsys_pipeline_spark.queries_analytics import q_daily_gapfill

    day = 86400
    rows = [
        (1, 1, 0 * day + 10, "view"),
        (2, 1, 0 * day + 20, "view"),   # later same day: its value wins
        (3, 1, 3 * day + 5, "click"),
        (4, 2, 7 * day + 1, "view"),
    ]
    df = _ev_frame(spark, rows).withColumn(
        "value", F.col("event_id").cast("double") * 10
    )
    sf = str(tmp_path / "gap")
    df.write.parquet(sf + "/events.parquet")
    got = {
        (int(r["user_id"]), int(r["day"])): (r["filled_value"], int(r["is_observed"]))
        for r in q_daily_gapfill(spark, sf).collect()
    }
    assert got == {
        (1, 0): (20.0, 1),
        (1, 1): (20.0, 0),
        (1, 2): (20.0, 0),
        (1, 3): (30.0, 1),
        (2, 7): (40.0, 1),
    }


def test_gapfill_contiguity_on_corpus(spark):
    """Real corpus invariants: per user the calendar is exactly contiguous
    (rows == max-min+1), the first day is observed, and no filled_value is
    NULL (forward fill can never lead)."""
    from recsys_pipeline_spark.queries_analytics import q_daily_gapfill

    out = q_daily_gapfill(spark, SF_SMOKE).cache()
    per_user = out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        (F.max("day") - F.min("day") + 1).alias("span"),
        F.min(F.struct("day", "is_observed")).alias("first"),
    )
    bad = per_user.filter(
        (F.col("n") != F.col("span")) | (F.col("first.is_observed") != 1)
    )
    assert bad.count() == 0
    assert out.filter(F.col("filled_value").isNull()).count() == 0
    out.unpersist()


def test_scd2_planted_intervals(spark, tmp_path):
    from recsys_pipeline_spark.queries_analytics import q_scd2_intervals

    rows = [
        (1, 1, 100, "view"),
        (2, 1, 200, "view"),
        (3, 1, 300, "click"),
        (4, 1, 400, "view"),
    ]
    sf = str(tmp_path / "scd")
    _ev_frame(spark, rows).write.parquet(sf + "/events.parquet")
    got = sorted(
        (
            int(r["version"]),
            r["event_type"],
            int(r["valid_from_us"]),
            None if r["valid_to_us"] is None else int(r["valid_to_us"]),
            int(r["n_events"]),
        )
        for r in q_scd2_intervals(spark, sf).filter(F.col("user_id") == 1).collect()
    )
    us = 1_000_000
    assert got == [
        (1, "view", 100 * us, 300 * us, 2),
        (2, "click", 300 * us, 400 * us, 1),
        (3, "view", 400 * us, None, 1),
    ]


def test_scd2_tiles_timeline_on_corpus(spark):
    """Corpus invariants: versions are consecutive 1..k per user, event
    counts tile the user's log exactly, each interval closes at the next
    one's open (half-open tiling, one NULL close per user), and adjacent
    versions always change the attribute."""
    from recsys_pipeline_spark.queries_analytics import q_scd2_intervals
    from recsys_pipeline_spark.io import read_table

    iv = q_scd2_intervals(spark, SF_SMOKE).cache()
    ev_counts = (
        read_table(spark, SF_SMOKE, "events").groupBy("user_id").count()
    )
    per_user = iv.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("k"),
        F.max("version").alias("vmax"),
        F.min("version").alias("vmin"),
        F.sum("n_events").alias("tot"),
        F.sum(F.col("valid_to_us").isNull().cast("int")).alias("n_open"),
    )
    joined = per_user.join(ev_counts, "user_id")
    bad = joined.filter(
        (F.col("vmin") != 1)
        | (F.col("vmax") != F.col("k"))
        | (F.col("tot") != F.col("count"))
        | (F.col("n_open") != 1)
    )
    assert bad.count() == 0
    nxt = iv.select(
        "user_id",
        (F.col("version") - 1).alias("version"),
        F.col("event_type").alias("next_type"),
        F.col("valid_from_us").alias("next_from"),
    )
    adj = iv.join(nxt, ["user_id", "version"])
    assert adj.filter(F.col("event_type") == F.col("next_type")).count() == 0
    assert adj.filter(F.col("valid_to_us") != F.col("next_from")).count() == 0
    iv.unpersist()


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_pairs_match_bruteforce(spark):
    """Operator output == brute-force all-pairs edit distance restricted to
    the same block (final token), on the real part-name vocabulary."""
    from recsys_pipeline_spark.queries_analytics import (
        FUZZY_MAX_DIST,
        q_fuzzy_part_pairs,
    )
    from recsys_pipeline_spark.io import read_table

    names = [
        r["p_name"]
        for r in read_table(spark, SF_SMOKE, "part").select("p_name").distinct().collect()
    ]
    want = set()
    for x in names:
        for y in names:
            if x < y and x.split(" ")[-1] == y.split(" ")[-1]:
                d = _lev(x, y)
                if d <= FUZZY_MAX_DIST:
                    want.add((x, y, d))
    got = {
        (r["name_a"], r["name_b"], int(r["dist"]))
        for r in q_fuzzy_part_pairs(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert want, "fixture should produce at least one fuzzy pair"


def test_fuzzy_max_block_guard_drops_oversized_blocks(spark):
    from recsys_pipeline_spark.operators import fuzzy

    names = spark.createDataFrame(
        [("aa x",), ("ab x",), ("ac x",), ("aa y",), ("ab y",)],
        "name string",
    )
    blk = F.element_at(F.split(F.col("name"), " "), -1)
    full = fuzzy.blocked_levenshtein_pairs(
        names, name_col="name", block_expr=blk, max_dist=1
    )
    assert full.count() == 3 + 1  # 3 pairs in block x, 1 in block y
    capped = fuzzy.blocked_levenshtein_pairs(
        names, name_col="name", block_expr=blk, max_dist=1, max_block=2
    )
    assert {(r["name_a"], r["name_b"]) for r in capped.collect()} == {
        ("aa y", "ab y")
    }


def test_fuzzy_clusters_transitive_chain_and_singletons(spark):
    """Resolution must be TRANSITIVE (chains merge although the endpoints
    exceed the edit-distance threshold) and total (singletons resolve to
    themselves); every cluster's canonical name is a member of the cluster
    and carries the smallest first-appearance id."""
    from recsys_pipeline_spark.queries_analytics import q_fuzzy_name_clusters
    from recsys_pipeline_spark.io import read_table

    out = q_fuzzy_name_clusters(spark, SF_SMOKE)
    rows = {r["name"]: (r["canonical_name"], int(r["cluster_size"])) for r in out.collect()}
    names = {
        r["p_name"]
        for r in read_table(spark, SF_SMOKE, "part").select("p_name").distinct().collect()
    }
    assert set(rows) == names  # total: every name resolves
    # chain: cold bolt -1- old bolt -2- red bolt -2- new bolt all one cluster
    chain = ["cold bolt", "old bolt", "red bolt", "new bolt"]
    canons = {rows[n][0] for n in chain if n in rows}
    if all(n in rows for n in chain):
        assert len(canons) == 1
        assert rows[chain[0]][1] >= 4
    # canonical is always a cluster member (its own canonical is itself)
    for name, (canon, _) in rows.items():
        assert rows[canon][0] == canon


def test_peak_concurrency_planted_sweepline(spark, tmp_path):
    """Planted intervals pin the sweep-line semantics: overlap across
    users, a touching endpoint counting as concurrent (+1 before -1 at one
    instant), an empty hour carrying the level flat, and a single-event
    instant interval spiking momentarily."""
    from recsys_pipeline_spark.queries_analytics import q_peak_concurrency

    h = 3600
    rows = [
        # user 1 active [0h+100, 2h+100]: one (user, day) interval
        (1, 1, 0 * h + 100, "view"),
        (2, 1, 2 * h + 100, "view"),
        # user 2 active [0h+200, 0h+300]
        (3, 2, 0 * h + 200, "view"),
        (4, 2, 0 * h + 300, "view"),
        # user 3: single event at 2h+100 -> instant interval touching
        # user 1's endpoint: 3 concurrent at that instant (1 ends there)
        (5, 3, 2 * h + 100, "view"),
        # user 4 active [4h+10, 4h+20] after an empty hour 3
        (6, 4, 4 * h + 10, "view"),
        (7, 4, 4 * h + 20, "view"),
    ]
    sf = str(tmp_path / "pc")
    _ev_frame(spark, rows).write.parquet(sf + "/events.parquet")
    got = {
        int(r["hour"]): (int(r["peak_concurrency"]), int(r["n_starts"]), int(r["n_ends"]))
        for r in q_peak_concurrency(spark, sf).collect()
    }
    assert got == {
        0: (2, 2, 1),  # users 1+2 overlap; 2 ends in hour 0
        1: (1, 0, 0),  # empty hour: carry (user 1 still active)
        2: (2, 1, 2),  # user 3's instant spike while 1 is active: 1+1
        3: (0, 0, 0),  # empty hour after everything closed
        4: (1, 1, 1),
    }


def test_rolling_anomaly_planted_ksigma(spark, tmp_path):
    """Nine 10.00-valued events establish a zero-variance PRIOR window; a
    10th event at 50.00 in range is flagged (any deviation beats 3 sigma =
    0), while the same spike with only 3 prior events (below min support)
    and a spike outside the 30-day range both stay unflagged. The prior
    window EXCLUDES the current day — self-inclusion would cap the spike
    at exactly z = 3 and mask it (pinned by the query docstring)."""
    from recsys_pipeline_spark.queries_analytics import q_rolling_anomaly

    day = 86400
    rows = []
    # user 1: 9 calm days then a spike on day 9 (window support 10)
    for i in range(9):
        rows.append((i + 1, 1, i * day + 10, "view"))
    rows.append((10, 1, 9 * day + 10, "view"))
    # user 2: 3 calm days then a spike (support 4 < ANOM_MIN_N)
    for i in range(3):
        rows.append((20 + i, 2, i * day + 10, "view"))
    rows.append((23, 2, 3 * day + 10, "view"))
    # user 3: calm cluster, then a spike 40 days later (window rolled off,
    # support 1)
    for i in range(6):
        rows.append((30 + i, 3, i * day + 10, "view"))
    rows.append((36, 3, 45 * day + 10, "view"))
    df = _ev_frame(spark, rows).withColumn(
        "value",
        F.when(F.col("event_id").isin(10, 23, 36), 50.0).otherwise(10.0),
    )
    sf = str(tmp_path / "anom")
    df.write.parquet(sf + "/events.parquet")
    got = {
        int(r["event_id"]): (int(r["n_win"]), int(r["is_anomaly"]))
        for r in q_rolling_anomaly(spark, sf).collect()
    }
    assert got[10] == (9, 1)    # zero-variance prior window: spike flagged
    assert got[23] == (3, 0)    # below min support
    assert got[36] == (0, 0)    # window rolled off entirely
    assert all(v == 0 for e, (_, v) in got.items() if e not in (10,))


def test_exact_ols_recovers_planted_line_and_handles_degenerates(spark):
    """OLS on a planted exact line recovers slope/intercept with r2 = 1;
    a constant-x group yields NULL coefficients (zero variance); a
    constant-y group fits slope 0 with NULL r2 (vy = 0)."""
    from recsys_pipeline_spark.operators import stats

    rows = (
        [("line", float(x), 3.0 * x + 7.0) for x in range(1, 11)]
        + [("constx", 5.0, float(y)) for y in range(1, 6)]
        + [("consty", float(x), 4.0) for x in range(1, 6)]
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {
        r["g"]: (r["n"], r["slope"], r["intercept"], r["r2"])
        for r in stats.exact_ols(df, "g", "x", "y").collect()
    }
    assert got["line"] == (10, 3.0, 7.0, 1.0)
    assert got["constx"] == (5, None, None, None)
    assert got["consty"] == (5, 0.0, 4.0, None)


def test_rank_sum_auc_planted_ties_and_perfect_ranking(spark):
    """Hand-computed Mann-Whitney values: tie groups take AVERAGE ranks
    (scores [5(-),10(+),10(-),20(+)] -> rank-sum 2.5+4, U=3.5, AUC=0.875);
    a perfectly separating score gives 1e6 ppm, a perfectly inverted one 0;
    a single-class input reports the 0.5 convention."""
    from recsys_pipeline_spark.operators.stats import rank_sum_auc

    def auc_of(rows):
        df = spark.createDataFrame(rows, "score long, label int")
        r = rank_sum_auc(df, "score", "label").first()
        return int(r["n_pos"]), int(r["n_neg"]), int(r["auc_ppm"])

    assert auc_of([(10, 1), (10, 0), (20, 1), (5, 0)]) == (2, 2, 875000)
    assert auc_of([(1, 0), (2, 0), (3, 1), (4, 1)]) == (2, 2, 1000000)
    assert auc_of([(4, 0), (3, 0), (2, 1), (1, 1)]) == (2, 2, 0)
    assert auc_of([(1, 1), (2, 1)]) == (2, 0, 500000)
    # all-tied scores: every rank is average -> exactly 0.5
    assert auc_of([(7, 1), (7, 0), (7, 1), (7, 0)]) == (2, 2, 500000)


def test_rank_sum_auc_empty_input_both_engines(spark):
    """Empty relation: Spark coalesces the null sums to (0, 0, 500000); the
    SQL twin must NOT return a row of NULLs (SUM over zero rows is NULL,
    which used to NULL the single-class guard — r14 ADVICE)."""
    import duckdb

    from recsys_pipeline_spark.operators.stats import rank_sum_auc, rank_sum_auc_sql

    df = spark.createDataFrame([], "score long, label int")
    r = rank_sum_auc(df, "score", "label").first()
    assert (int(r["n_pos"]), int(r["n_neg"]), int(r["auc_ppm"])) == (0, 0, 500000)

    sql = rank_sum_auc_sql(
        "SELECT 1 AS score, 1 AS label WHERE false"
    )
    o = duckdb.sql(sql).fetchall()
    assert o == [(0, 0, 500000)]


def test_scd2_dim_join_boundary_semantics(spark, tmp_path):
    """Planted interval boundaries: a purchase exactly AT a version's
    valid_from belongs to that (new) version (half-open [from, to)); one
    inside an interval gets that version; one in the open current version
    matches; one BEFORE the user's first state row is dropped (inner
    semantics, matching the oracle's range join)."""
    from recsys_pipeline_spark.queries_analytics import q_scd2_dim_join

    rows = [
        (1, 1, 100, "view"),      # state v1 [100, 300)
        (2, 1, 300, "click"),     # state v2 [300, open)
        (3, 1, 50, "purchase"),   # before first state -> dropped
        (4, 1, 200, "purchase"),  # inside v1 -> view
        (5, 1, 300, "purchase"),  # exactly at v2's valid_from -> click
        (6, 1, 400, "purchase"),  # open version -> click
    ]
    sf = str(tmp_path / "scd2dj")
    _ev_frame(spark, rows).write.parquet(sf + "/events.parquet")
    got = {
        int(r["event_id"]): (int(r["version"]), r["state_type"])
        for r in q_scd2_dim_join(spark, sf).collect()
    }
    assert got == {4: (1, "view"), 5: (2, "click"), 6: (2, "click")}


def test_scd2_dim_join_zero_width_version_collapsed(spark, tmp_path):
    """Same-microsecond state events of different types create a zero-width
    [t, t) version followed by its successor at the same valid_from.  The
    as-of join must deterministically pick the MAX version (the range-join
    oracle never matches the empty interval) — and must NOT drop the fact
    via the residual valid_to filter when the empty version wins the
    running-last arbitrarily (r14 ADVICE, medium)."""
    from recsys_pipeline_spark.queries_analytics import q_scd2_dim_join

    rows = [
        (1, 1, 100, "view"),       # v1 [100, 100) — zero width
        (2, 1, 100, "click"),      # v2 [100, open) — same microsecond
        (3, 1, 100, "purchase"),   # AT the shared valid_from -> v2 click
        (4, 1, 150, "purchase"),   # inside the open version -> v2 click
        # a second user where the zero-width pair is followed by a later
        # closed version: the collapse must keep valid_to intact
        (5, 2, 100, "view"),       # v1 [100, 100)
        (6, 2, 100, "click"),      # v2 [100, 200)
        (7, 2, 200, "view"),       # v3 [200, open)
        (8, 2, 150, "purchase"),   # inside v2 -> click
        (9, 2, 250, "purchase"),   # inside v3 -> view
    ]
    sf = str(tmp_path / "scd2zw")
    _ev_frame(spark, rows).write.parquet(sf + "/events.parquet")
    got = {
        int(r["event_id"]): (int(r["version"]), r["state_type"])
        for r in q_scd2_dim_join(spark, sf).collect()
    }
    assert got == {
        3: (2, "click"), 4: (2, "click"),
        8: (2, "click"), 9: (3, "view"),
    }


def test_exact_percentiles_planted_ties_and_ranks(spark, tmp_path):
    """Hand-computed lower-rank discrete quantiles on a tied frame:
    values (cents) [100 x4, 200 x4, 900 x2], n=10 -> k50=5 (200),
    k90=9 (900), k99=9 (900). Ties must not shift the selected value."""
    from recsys_pipeline_spark.queries_analytics import q_exact_percentiles

    vals = [1.0] * 4 + [2.0] * 4 + [9.0] * 2
    rows = [(i + 1, 1, 100 + i, "view") for i in range(len(vals))]
    sf = str(tmp_path / "pct")
    df = _ev_frame(spark, rows)
    # overwrite value column with the planted magnitudes by event_id order
    from pyspark.sql import functions as F2
    m = spark.createDataFrame(
        [(i + 1, v) for i, v in enumerate(vals)], "event_id long, value double"
    )
    df.drop("value").join(m, "event_id").write.parquet(sf + "/events.parquet")
    got = {
        int(r["pct"]): (int(r["k"]), int(r["value_cents"]), int(r["n"]))
        for r in q_exact_percentiles(spark, sf).collect()
    }
    assert got == {50: (5, 200, 10), 90: (9, 900, 10), 99: (9, 900, 10)}


def test_exact_mad_planted(spark, tmp_path):
    """Hand-computed MAD: values (cents) [100, 200, 200, 900, 1000], n=5,
    k=3 -> median 200; deviations [100, 0, 0, 700, 800] -> MAD 100. A
    stddev-style statistic would be dragged by the 900/1000 outliers; the
    MAD must not be."""
    from recsys_pipeline_spark.queries_analytics import q_exact_mad

    vals = [1.0, 2.0, 2.0, 9.0, 10.0]
    rows = [(i + 1, 1, 100 + i, "view") for i in range(len(vals))]
    sf = str(tmp_path / "mad")
    df = _ev_frame(spark, rows)
    m = spark.createDataFrame(
        [(i + 1, v) for i, v in enumerate(vals)], "event_id long, value double"
    )
    df.drop("value").join(m, "event_id").write.parquet(sf + "/events.parquet")
    r = q_exact_mad(spark, sf).first()
    assert (int(r["median_cents"]), int(r["mad_cents"]), int(r["n"])) == (200, 100, 5)


def test_cusum_drift_operator_matches_textbook_recurrence(spark):
    """The prefix-sum-minus-running-min identity must equal the textbook
    recurrence C_i = max(0, C_{i-1} + (x_i - mu)) scaled by n, and the
    flag must fire exactly where C > h*n*sigma: a sustained 5x level
    shift flags (from the day the cumulative excess crosses 5 sigmas),
    while a constant series and a single-day user never do."""
    from recsys_pipeline_spark.operators.timeseries import cusum_drift

    series = {
        1: [1000] * 20 + [5000] * 10,  # calm then sustained shift
        2: [700] * 15,                 # constant -> C = 0 everywhere
        3: [123],                      # single observation
    }
    rows = [(u, d, v) for u, xs in series.items() for d, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "user_id long, day long, spend_c long")
    got = {
        (int(r["user_id"]), int(r["day"])): (int(r["cusum_nx"]), int(r["is_drift"]))
        for r in cusum_drift(df, "user_id", "day", "spend_c", h=5).collect()
    }

    for u, xs in series.items():
        n, s = len(xs), sum(xs)
        q = sum(v * v for v in xs)
        var_scaled = n * q - s * s  # n^2 * sigma^2
        c = 0
        for d, v in enumerate(xs):
            c = max(0, c + (n * v - s))  # textbook recurrence, scaled by n
            want_flag = 1 if (c > 0 and c * c > 25 * var_scaled) else 0
            assert got[(u, d)] == (c, want_flag), (u, d)
    # the planted shift fires on elevated days 4..10 (cumulative excess
    # crosses 5 sigmas on the 4th elevated day), never on calm days
    flagged = sorted(d for (u, d), (_, f) in got.items() if u == 1 and f)
    assert flagged == list(range(23, 30))
    assert all(got[(2, d)] == (0, 0) for d in range(15))
    assert got[(3, 0)] == (0, 0)


def test_rolling_active_users_planted_window_and_stickiness(spark, tmp_path):
    """Hand-computed DAU/WAU: activity on days 0 (users 1,2), 2 (user 3)
    and 8 (user 2). Each activity is visible for 7 days clipped at the
    global max day; days with zero trailing actives emit no row; the
    stickiness is exact integer ppm."""
    from recsys_pipeline_spark.queries_analytics import q_rolling_active_users

    day = 86_400
    rows = [
        (1, 1, 0 * day + 10, "view"),
        (2, 2, 0 * day + 20, "view"),
        (3, 2, 0 * day + 30, "view"),  # same (user, day): dedups
        (4, 3, 2 * day + 10, "view"),
        (5, 2, 8 * day + 10, "view"),
    ]
    sf = str(tmp_path / "rau")
    _ev_frame(spark, rows).write.parquet(sf + "/events.parquet")
    got = {
        int(r["day"]): (int(r["dau"]), int(r["wau"]), int(r["stickiness_ppm"]))
        for r in q_rolling_active_users(spark, sf).collect()
    }
    assert got == {
        0: (2, 2, 1000000),
        1: (0, 2, 0),
        2: (1, 3, 333333),
        3: (0, 3, 0),
        4: (0, 3, 0),
        5: (0, 3, 0),
        6: (0, 3, 0),
        7: (0, 1, 0),   # only user 3's day-2 activity still visible
        8: (1, 2, 500000),
    }


def test_item_cooccur_lift_planted_support_and_independence(spark, tmp_path):
    """Three of four users share items {1,2} -> the pair passes the
    support floor with lift = 3*4/(3*3) = 1.333x (1333333 ppm); pairs
    involving the fourth user's solo item never reach support 3; repeat
    events of the same (user, item) dedup before counting."""
    import json

    from recsys_pipeline_spark.queries_ext import q_item_cooccur_lift

    rows = []
    eid = 0
    for u in (1, 2, 3):
        for item in (1, 2):
            for _ in range(2):  # repeats must not inflate counts
                eid += 1
                rows.append((eid, u, 100 * eid, "view", 0.0, json.dumps({"k": item})))
    eid += 1
    rows.append((eid, 4, 100 * eid, "view", 0.0, json.dumps({"k": 3})))
    import datetime
    df = spark.createDataFrame(
        [(e, datetime.datetime.utcfromtimestamp(t), u, et, v, p)
         for e, u, t, et, v, p in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    sf = str(tmp_path / "lift")
    df.write.parquet(sf + "/events.parquet")
    out = [tuple(r) for r in q_item_cooccur_lift(spark, sf).collect()]
    assert out == [(1, 2, 3, 3, 3, 1333333)]


def test_grouped_exact_quantiles_planted_ties_and_plan(spark):
    """Hand-computed lower-rank quantiles per group on a tied frame, and
    the scale shape: the ordered window must consume the per-(group,
    value) HISTOGRAM aggregate, never raw rows (a per-group row_number
    over raw rows puts each whole group on one reducer)."""
    from recsys_pipeline_spark.operators.stats import grouped_exact_quantiles

    rows = (
        [("a", 1)] * 4 + [("a", 2)] * 4 + [("a", 9)] * 2  # n=10
        + [("b", 7)]                                       # n=1
    )
    df = spark.createDataFrame(rows, "g string, v long")
    out = grouped_exact_quantiles(df, "g", "v", (50, 90))
    got = {
        (r["g"], int(r["pct"])): (int(r["n"]), int(r["k"]), int(r["v"]))
        for r in out.collect()
    }
    assert got == {
        ("a", 50): (10, 5, 2),   # k = 9*50//100+1 = 5 -> 5th smallest = 2
        ("a", 90): (10, 9, 9),   # k = 9*90//100+1 = 9 -> 9
        ("b", 50): (1, 1, 7),
        ("b", 90): (1, 1, 7),
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the window's child chain must contain the histogram hash aggregate
    # (partial+final) before any Window node sees data
    assert "Window" in plan and "HashAggregate" in plan


def test_session_conversions_pattern_and_session_scope(spark, tmp_path):
    """Pattern semantics: v then c then p IN ORDER within ONE session
    converts; wrong order does not; the pattern does not span a session
    gap; equal-timestamp events order by event_id."""
    from recsys_pipeline_spark.queries_analytics import q_session_conversions

    gap = 2000  # > 30-min session gap, in seconds
    rows = [
        (1, 1, 100, "view"), (2, 1, 200, "click"), (3, 1, 300, "purchase"),
        (4, 2, 100, "click"), (5, 2, 200, "view"), (6, 2, 300, "purchase"),
        (7, 3, 100, "view"),                       # session 0: 'v'
        (8, 3, 100 + gap, "click"),                # session 1: 'cp'
        (9, 3, 110 + gap, "purchase"),
        (10, 4, 100, "view"), (11, 4, 200, "purchase"),
        (12, 5, 100, "view"), (13, 5, 100, "click"), (14, 5, 100, "purchase"),
    ]
    sf = str(tmp_path / "spm")
    _ev_frame(spark, rows).write.parquet(sf + "/events.parquet")
    got = {
        (int(r["user_id"]), int(r["session_idx"])): (
            int(r["n_events"]), int(r["is_conversion"])
        )
        for r in q_session_conversions(spark, sf).collect()
    }
    assert got == {
        (1, 0): (3, 1),
        (2, 0): (3, 0),   # click precedes view: 'cvp' does not match
        (3, 0): (1, 0),   # the pattern cannot span the session gap
        (3, 1): (2, 0),
        (4, 0): (2, 0),   # no click stage
        (5, 0): (3, 1),   # same-microsecond: event_id order gives 'vcp'
    }


def test_match_pattern_kernel_order_invariance_and_classes(spark):
    """The parameterized MATCH_RECOGNIZE kernel (r16): the class string
    builds in (order_cols) order regardless of input row order, and
    classify_events applies DEFINE conditions first-match-wins with the
    default filler for undefined rows."""
    from recsys_pipeline_spark.operators import windows

    rows = [  # (grp, ord1, ord2, etype) deliberately shuffled
        (1, 300, 1, "purchase"),
        (1, 100, 1, "view"),
        (1, 200, 1, "purchase"),
        (2, 100, 2, "purchase"),  # same ts: event_id breaks the tie
        (2, 100, 1, "view"),
        (3, 100, 1, "signup"),    # undefined class -> filler, never matches
        (3, 200, 1, "purchase"),
    ]
    df = spark.createDataFrame(rows, "grp int, o1 long, o2 long, event_type string")
    cls = windows.classify_events(
        [("p", F.col("event_type") == "purchase"),
         ("v", F.col("event_type") == "view")],
        default="_",
    )
    got = {
        r["grp"]: (r["n_events"], r["is_match"])
        for r in windows.match_pattern(
            df, ["grp"], ["o1", "o2"], cls, "v.*p"
        ).collect()
    }
    # grp 1 orders to 'vpp' -> match; grp 2 orders to 'vp' (tie broken by
    # o2) -> match; grp 3 is '_p' (signup is filler) -> no match
    assert got == {1: (3, 1), 2: (2, 1), 3: (2, 0)}
    # repeat-purchase pattern on the same frames: only grp 1 has two p's
    got2 = {
        r["grp"]: r["is_match"]
        for r in windows.match_pattern(
            df, ["grp"], ["o1", "o2"], cls, "p.*p"
        ).collect()
    }
    assert got2 == {1: 1, 2: 0, 3: 0}


def test_classify_events_rejects_bad_definitions(spark):
    from recsys_pipeline_spark.operators import windows

    with pytest.raises(ValueError, match="single character"):
        windows.classify_events([("pp", F.lit(True))])
    with pytest.raises(ValueError, match="single character"):
        windows.classify_events([("p", F.lit(True))], default="__")
    with pytest.raises(ValueError, match="distinct"):
        windows.classify_events([("p", F.lit(True)), ("p", F.lit(False))])
    with pytest.raises(ValueError, match="distinct"):
        windows.classify_events([("_", F.lit(True))], default="_")


def test_repeat_purchase_sessions_planted(spark, tmp_path):
    """p.*p matches only sessions holding >=2 purchases; the pattern does
    not span the session gap; non-purchase events are filler chars."""
    from recsys_pipeline_spark.queries_analytics import q_repeat_purchase_sessions

    gap = 2000
    rows = [
        (1, 1, 100, "purchase"), (2, 1, 200, "view"), (3, 1, 300, "purchase"),
        (4, 2, 100, "purchase"),
        (5, 2, 100 + gap, "purchase"),  # second purchase in a NEW session
        (6, 3, 100, "view"), (7, 3, 200, "click"),
    ]
    sf = str(tmp_path / "rps")
    _ev_frame(spark, rows).write.parquet(sf + "/events.parquet")
    got = {
        (int(r["user_id"]), int(r["session_idx"])): (
            int(r["n_events"]), int(r["is_repeat"])
        )
        for r in q_repeat_purchase_sessions(spark, sf).collect()
    }
    assert got == {
        (1, 0): (3, 1),   # 'p_p' matches p.*p
        (2, 0): (1, 0),   # gap splits the two purchases
        (2, 1): (1, 0),
        (3, 0): (2, 0),   # no purchase at all
    }


def test_grouped_interp_quantiles_match_duckdb_quantile_cont(spark, tmp_path):
    """The x100 integer algebra must implement exactly the type-7
    definition DuckDB's native quantile_cont uses — checked against the
    NATIVE aggregate (not the twin SQL, which shares the algebra) on a
    planted frame with ties, singletons, and both rem=0 and rem>0 targets."""
    import duckdb

    from recsys_pipeline_spark.operators import stats

    rows = [
        ("a", v) for v in [10, 10, 20, 30, 50]   # n=5: p50 rem=0, p90 rem=60
    ] + [
        ("b", v) for v in [7, 11]                 # n=2: p50 h=0.5
    ] + [
        ("c", 42),                                # singleton: both pcts = 42
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    hist = df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("cnt"))
    got = {
        (r["g"], r["pct"]): (r["n"], r["q_x100"])
        for r in stats.grouped_interp_quantiles_from_hist(
            hist, "g", "v", (50, 90)
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    for pct in (50, 90):
        ref = con.execute(
            f"SELECT g, count(*), quantile_cont(v, {pct / 100.0}) FROM t GROUP BY g"
        ).fetchall()
        for g, n, q in ref:
            gn, gq = got[(g, pct)]
            assert gn == n
            assert gq == pytest.approx(float(q) * 100, abs=1e-6), (g, pct, gq, q)
    # spot-check the closed form: group a, p90 -> h=3.6, v[3]=30, v[4]=50,
    # q = 30 + 0.6*20 = 42 -> 4200
    assert got[("a", 90)] == (5, 4200)
    assert got[("a", 50)] == (5, 2000)
    assert got[("b", 50)] == (2, 900)
    assert got[("c", 90)] == (1, 4200)
