"""Streaming pipelines over the events table shape.

Batch parity: every operator here has a batch twin in queries.py; the tests
drive a parquet-backed stream with availableNow and compare against the batch
result — the Structured Streaming contract (same code, incremental execution).

Scale notes: watermarks bound state; the per-user stateful aggregation keys by
user_id (hash-partitioned state store, RocksDB-backable); session windows use
the built-in ``session_window`` (state merges handled by the engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_raw_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", ts_type, True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )


EVENTS_RAW_SCHEMA = _events_raw_schema(T.TimestampType())


def _ts_stored_as_int64(sf_dir: str) -> bool:
    """Probe the parquet footer once: only TIMESTAMP(NANOS)-era files take the
    int64 + div-1000 path (they surface as raw long under nanosAsLong, same
    as the batch reader's guard). A PLAIN int64 ts with no timestamp logical
    type has an unknowable epoch unit — raise rather than silently assuming
    nanos (a micros-era int64 would be mis-scaled 1000x)."""
    from recsys_pipeline_spark.io import parquet_ts_unit

    unit = parquet_ts_unit(f"{sf_dir}/events.parquet", "ts")
    if unit == "int":
        raise ValueError(
            "events.ts is stored as plain INT64 with no timestamp logical "
            "type — cannot infer the epoch unit; rewrite the file with a "
            "TIMESTAMP annotation"
        )
    return unit == "ns"


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events table with the same dtype guard as the batch
    reader (io.read_table): micros-era parquet streams straight into
    TimestampType; nanos-era files are read as long (nanosAsLong) and
    truncated to micros so batch and stream see identical event times."""
    if _ts_stored_as_int64(sf_dir):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = (
            spark.readStream.schema(_events_raw_schema(T.LongType()))
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def windowed_counts(
    events: DataFrame, window: str = "1 hour", slide: str | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked (sliding) event-time window counts per event_type —
    late rows beyond the watermark are dropped, state is bounded."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win, "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionized(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows with the built-in gap-merge state machine."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            F.col("session_window.start").alias("sess_start"),
            F.col("session_window.end").alias("sess_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def user_state_counts(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Streaming twin of the per-user running per-type counters (the
    reference's online user state, continuously maintained): cumulative
    imp/clk per (user, event_type) in update mode."""
    labeled = events.withColumn("label", F.when(F.col("value") > 100.0, 1).otherwise(0))
    return (
        labeled.withWatermark("ts", watermark)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("imp"), F.sum("label").alias("clk"))
    )


PIT_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
PIT_LABEL_THRESHOLD = 100.0


def pit_features_stateful(events: DataFrame, window: int = 10) -> DataFrame:
    """The reference's per-user sliding dequeue scan (offline/preprocess/
    s2_term_trans.py:37-61) as a CUSTOM STATEFUL STREAMING OPERATOR: for each
    arriving event, emit per-type imp/clk counts over that user's previous
    <= ``window`` events, then push the event into the user's deque state.

    Offline, window functions reproduce this exactly (operators/pit.py); this
    is the online form — state is the per-user deque (two parallel arrays),
    keyed and hash-partitioned by user_id in the state store, so it scales
    with users, not history. Within a micro-batch rows are processed in
    (ts, event_id) order; across batches source order must be per-key
    monotonic (true for availableNow over an ordered log; use event-time
    reordering upstream otherwise).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    types, thr, win = list(PIT_EVENT_TYPES), PIT_LABEL_THRESHOLD, window
    out_fields = [T.StructField("user_id", T.LongType()), T.StructField("event_id", T.LongType())]
    for t in types:
        out_fields += [
            T.StructField(f"{t}_imp", T.LongType()),
            T.StructField(f"{t}_clk", T.LongType()),
        ]
    out_schema = T.StructType(out_fields)
    state_schema = T.StructType(
        [
            T.StructField("types", T.ArrayType(T.StringType())),
            T.StructField("labels", T.ArrayType(T.IntegerType())),
        ]
    )

    def step(key, pdf_iter, state):
        import pandas as _pd

        dq_types, dq_labels = state.get if state.exists else ([], [])
        dq_types, dq_labels = list(dq_types), list(dq_labels)
        out = []
        # One group can span several Arrow chunks in a micro-batch (> ~10k
        # rows); sorting each chunk independently would interleave deque
        # updates out of (ts, event_id) order. Concatenate FIRST, sort once —
        # memory is the group's rows in this micro-batch, the same bound the
        # state-store contract already assumes per key.
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = _pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
            for eid, et, val in zip(pdf["event_id"], pdf["event_type"], pdf["value"]):
                row = {"user_id": key[0], "event_id": int(eid)}
                for t in types:
                    row[f"{t}_imp"] = sum(1 for x in dq_types if x == t)
                    row[f"{t}_clk"] = sum(
                        l for x, l in zip(dq_types, dq_labels) if x == t
                    )
                out.append(row)
                dq_types.append(et)
                dq_labels.append(1 if val > thr else 0)
                if len(dq_types) > win:
                    dq_types.pop(0)
                    dq_labels.pop(0)
        state.update((dq_types, dq_labels))
        yield _pd.DataFrame(out, columns=[f.name for f in out_schema.fields])

    return events.groupBy("user_id").applyInPandasWithState(
        step, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def deduplicated(events: DataFrame, keys: list[str] | None = None, watermark: str = "1 day") -> DataFrame:
    """Streaming exact-dedup (idempotent ingestion): drop rows whose key was
    already seen, with the watermark bounding the dedup state — the streaming
    twin of the batch exact-dedup operator, and the standard guard in front
    of an at-least-once source. State is keyed and hash-partitioned by the
    dedup key, so it scales with the key cardinality inside the watermark
    horizon, not with history."""
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicates(keys)


def attributed_purchases(
    events: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream event-time interval join: every purchase paired with the
    same user's clicks in the preceding ``lookback`` window (strictly before
    the purchase) — the online twin of the batch range-join attribution
    query (queries.q_range_join_attribution semantics family).

    Both sides carry watermarks and the join has a two-sided event-time bound,
    so the state store holds only ``lookback + watermark`` of each side per
    user (the engine derives the eviction condition from the interval) —
    bounded state, the requirement for an unbounded 100 TB/day stream.
    Append mode: a (purchase, click) pair is emitted once, when the watermark
    proves no earlier-arriving match can still appear.
    """
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_event_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}")),
    ).select("p_event_id", "c_event_id", F.col("p_user").alias("user_id"), "p_ts", "c_ts")


def run_to_memory(df: DataFrame, name: str, output_mode: str) -> None:
    """Drive a streaming query to completion over all currently-available
    input (availableNow) into an in-memory table — the deterministic test
    harness; swap for a kafka/delta sink in production."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def foreach_batch_sink(df: DataFrame, fn) -> None:
    """Exactly-once style sink adapter (foreachBatch): fn(batch_df, epoch_id)."""
    q = df.writeStream.foreachBatch(fn).trigger(availableNow=True).start()
    q.awaitTermination()
