"""Property-based check of the PIT window engine: on arbitrary event logs
(random users, duplicate timestamps, any key mix) the window-function
implementation must equal a direct per-user sequential simulation of the
reference's dequeue scan — frame [i-w, i-1] (training) and [i-w, i]
(online last-row state). This is the randomized generalization of the
hand-built fixture in test_pipeline_golden.py."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from recsys_pipeline_spark.operators import pit

KEYS = ["a", "b"]

event = st.tuples(
    st.integers(min_value=0, max_value=2),   # user
    st.integers(min_value=0, max_value=8),   # ts (ties likely)
    st.sampled_from(KEYS),                   # key
    st.integers(min_value=0, max_value=1),   # label
)
logs = st.lists(event, min_size=1, max_size=40)


def simulate(rows, window, include_current):
    """Reference semantics: per user, scan rows in (ts, event_id) order
    keeping a deque of the last `window` PAST rows; emit counts per key."""
    out = {}
    by_user: dict[int, list] = {}
    for eid, (u, ts, k, lbl) in enumerate(rows):
        by_user.setdefault(u, []).append((ts, eid, k, lbl))
    for u, evs in by_user.items():
        evs.sort()
        for i, (ts, eid, k, lbl) in enumerate(evs):
            lo = max(0, i - window)
            frame = evs[lo : i + 1] if include_current else evs[lo:i]
            if include_current and len(frame) > window + 1:
                frame = frame[-(window + 1):]
            counts = {}
            for _, _, fk, flbl in frame:
                imp, clk = counts.get(fk, (0, 0))
                counts[fk] = (imp + 1, clk + flbl)
            out[eid] = {
                key: counts.get(key, (0, 0)) for key in KEYS
            }
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(logs)
def test_pit_counts_match_sequential_simulation(spark, data):
    rows = [(eid, u, ts, k, lbl) for eid, (u, ts, k, lbl) in enumerate(data)]
    df = spark.createDataFrame(rows, ["event_id", "user", "ts", "key", "label"])
    for include_current in (False, True):
        got_df = pit.pit_counts_scalar_key(
            df, user_col="user", ts_col="ts", key_col="key", key_values=KEYS,
            label_col="label", tiebreak_col="event_id", window=3,
            include_current=include_current,
        )
        got = {
            r["event_id"]: {k: (r[f"{k}_imp"], r[f"{k}_clk"]) for k in KEYS}
            for r in got_df.collect()
        }
        want = simulate(data, window=3, include_current=include_current)
        assert got == want, f"include_current={include_current}"


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(logs)
def test_last_row_state_is_per_user_final_row(spark, data):
    rows = [(eid, u, ts, k, lbl) for eid, (u, ts, k, lbl) in enumerate(data)]
    df = spark.createDataFrame(rows, ["event_id", "user", "ts", "key", "label"])
    feats = pit.pit_counts_scalar_key(
        df, user_col="user", ts_col="ts", key_col="key", key_values=KEYS,
        label_col="label", tiebreak_col="event_id", window=3, include_current=True,
    )
    last = pit.last_row_state(feats, user_col="user", ts_col="ts", tiebreak_col="event_id")
    got_ids = sorted(r["event_id"] for r in last.collect())
    by_user: dict[int, tuple] = {}
    for eid, (u, ts, k, lbl) in enumerate(data):
        cur = by_user.get(u)
        if cur is None or (ts, eid) > cur[:2]:
            by_user[u] = (ts, eid)
    assert got_ids == sorted(eid for _, eid in by_user.values())
