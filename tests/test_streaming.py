"""Streaming/batch parity: the same event pipeline driven incrementally
(availableNow) must agree with its batch twin."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from recsys_pipeline_spark.io import read_table
from recsys_pipeline_spark.streaming import pipeline as sp

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batch_events(spark):
    return read_table(spark, SF, "events").cache()


def test_windowed_counts_match_batch(spark, batch_events):
    stream = sp.stream_events(spark, SF)
    # complete mode: availableNow never advances past the last window, so
    # append would hold the final windows in state forever
    sp.run_to_memory(sp.windowed_counts(stream, window="1 hour"), "win_counts", "complete")
    got = {
        (r["win_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    want_df = (
        batch_events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .select(F.col("window.start").alias("s"), "event_type", "n", "v")
    )
    want = {(r["s"], r["event_type"]): (r["n"], r["v"]) for r in want_df.collect()}
    assert set(got) == set(want)
    for k, (n, v) in want.items():
        assert got[k][0] == n
        assert abs(got[k][1] - v) < 1e-6


def test_sessionized_runs_and_covers_all_events(spark, batch_events):
    stream = sp.stream_events(spark, SF)
    sp.run_to_memory(sp.sessionized(stream, gap="30 minutes"), "sessions", "complete")
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert sum(r["n_events"] for r in rows) == batch_events.count()
    assert all(r["sess_end"] > r["sess_start"] for r in rows)


def test_user_state_counts_match_batch(spark, batch_events):
    stream = sp.stream_events(spark, SF)
    sp.run_to_memory(sp.user_state_counts(stream), "user_state", "complete")
    got = {
        (r["user_id"], r["event_type"]): (r["imp"], r["clk"])
        for r in spark.sql("SELECT * FROM user_state").collect()
    }
    want_df = (
        batch_events.withColumn("label", F.when(F.col("value") > 100.0, 1).otherwise(0))
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("imp"), F.sum("label").alias("clk"))
    )
    want = {(r["user_id"], r["event_type"]): (r["imp"], r["clk"]) for r in want_df.collect()}
    assert got == want


def test_stateful_pit_matches_batch_window_functions(spark, batch_events):
    """The custom stateful operator must reproduce the batch PIT query
    (window frame [i-10, i-1]) row for row — the same semantics computed by
    two different execution strategies (state store vs WindowExec)."""
    from recsys_pipeline_spark.queries import q_pit_sliding_features

    stream = sp.stream_events(spark, SF)
    sp.run_to_memory(sp.pit_features_stateful(stream), "pit_stream", "append")
    cols = [f"{t}_{s}" for t in sp.PIT_EVENT_TYPES for s in ("imp", "clk")]
    got = {
        r["event_id"]: tuple(r[c] for c in cols)
        for r in spark.sql("SELECT * FROM pit_stream").collect()
    }
    want = {
        r["event_id"]: tuple(r[c] for c in cols)
        for r in q_pit_sliding_features(spark, SF).collect()
    }
    assert got == want


def test_stateful_pit_correct_across_arrow_chunks(spark, batch_events):
    """ADVICE r1 regression: when one user's micro-batch rows span several
    Arrow chunks, the deque updates must still run in (ts, event_id) order.
    Forcing 10-row Arrow batches makes every user span many chunks; the
    result must be unchanged from the batch twin."""
    from recsys_pipeline_spark.queries import q_pit_sliding_features

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "10")
    try:
        stream = sp.stream_events(spark, SF)
        sp.run_to_memory(sp.pit_features_stateful(stream), "pit_stream_chunked", "append")
        cols = [f"{t}_{s}" for t in sp.PIT_EVENT_TYPES for s in ("imp", "clk")]
        got = {
            r["event_id"]: tuple(r[c] for c in cols)
            for r in spark.sql("SELECT * FROM pit_stream_chunked").collect()
        }
        want = {
            r["event_id"]: tuple(r[c] for c in cols)
            for r in q_pit_sliding_features(spark, SF).collect()
        }
        assert got == want
    finally:
        if old is not None:
            spark.conf.set(key, old)
        else:
            spark.conf.unset(key)


def test_streaming_dedup_drops_replayed_rows(spark, batch_events):
    """Union the source with itself (an at-least-once replay): the
    watermarked dropDuplicates must emit each event_id exactly once, matching
    the batch distinct count."""
    s1 = sp.stream_events(spark, SF)
    s2 = sp.stream_events(spark, SF)
    sp.run_to_memory(
        sp.deduplicated(s1.unionByName(s2)), "dedup_stream", "append"
    )
    got = spark.sql("SELECT event_id FROM dedup_stream").collect()
    ids = [r["event_id"] for r in got]
    assert len(ids) == len(set(ids))  # no duplicates emitted
    assert len(ids) == batch_events.select("event_id").distinct().count()


def test_stateful_pit_parity_on_rocksdb_state_store(spark, batch_events):
    """VERDICT r6 item 7: the streaming twins' 100x-scale story pinned, not
    assumed — the custom stateful PIT operator and the watermarked dedup must
    produce identical results on the DISK-BACKED RocksDB state store with
    bounded block-cache memory (the provider a production cluster runs when
    per-executor state exceeds the heap; HDFSBackedStateStoreProvider keeps
    every version in memory)."""
    from recsys_pipeline_spark.queries import q_pit_sliding_features

    conf = {
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage": "true",
        "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB": "64",
    }
    old = {}
    for k, v in conf.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        stream = sp.stream_events(spark, SF)
        sp.run_to_memory(sp.pit_features_stateful(stream), "pit_rocksdb", "append")
        cols = [f"{t}_{s}" for t in sp.PIT_EVENT_TYPES for s in ("imp", "clk")]
        got = {
            r["event_id"]: tuple(r[c] for c in cols)
            for r in spark.sql("SELECT * FROM pit_rocksdb").collect()
        }
        want = {
            r["event_id"]: tuple(r[c] for c in cols)
            for r in q_pit_sliding_features(spark, SF).collect()
        }
        assert got == want

        s1 = sp.stream_events(spark, SF)
        s2 = sp.stream_events(spark, SF)
        sp.run_to_memory(
            sp.deduplicated(s1.unionByName(s2)), "dedup_rocksdb", "append"
        )
        ids = [r["event_id"] for r in spark.sql("SELECT event_id FROM dedup_rocksdb").collect()]
        assert len(ids) == len(set(ids))
        assert len(ids) == batch_events.select("event_id").distinct().count()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_stream_stream_interval_join_matches_batch(spark, batch_events):
    stream = sp.stream_events(spark, SF)
    sp.run_to_memory(
        sp.attributed_purchases(stream, lookback="1 hour"), "attributed", "append"
    )
    got = {
        (r["p_event_id"], r["c_event_id"])
        for r in spark.sql("SELECT * FROM attributed").collect()
    }
    p = batch_events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("p_ts"),
    )
    c = batch_events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("c_ts"),
    )
    want = {
        (r["p_event_id"], r["c_event_id"])
        for r in p.join(
            c,
            (F.col("u") == F.col("cu"))
            & (F.col("c_ts") < F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 hour")),
        ).collect()
    }
    assert got == want
    assert len(want) > 0  # fixture actually exercises the join


def test_streaming_hash_sample_matches_batch(spark, batch_events):
    """Curation composes with streams: hash-deterministic sampling is a
    stateless codegen filter, so the SAME operator call works on a readStream
    and keeps exactly the batch-chosen rows (rand(seed) sampling cannot — the
    draw stream depends on micro-batch boundaries)."""
    from recsys_pipeline_spark.operators import curation

    stream = sp.stream_events(spark, SF)
    sp.run_to_memory(
        curation.hash_sample(stream, "event_id", 30), "sampled_stream", "append"
    )
    got = {r["event_id"] for r in spark.table("sampled_stream").select("event_id").collect()}
    want = {
        r["event_id"]
        for r in curation.hash_sample(batch_events, "event_id", 30)
        .select("event_id").collect()
    }
    assert got == want and 0 < len(got) < batch_events.count()


def test_streaming_cap_per_group_single_epoch_matches_batch_prefix(
    spark, batch_events, tmp_path
):
    """foreachBatch cap twin, one micro-batch: admits exactly the first k
    rows per group in (ts, event_id) order — the admission-control meaning
    of a cap online (the batch cap_per_group picks hash-uniformly instead,
    which needs the whole group; semantics difference documented in
    streaming/curation_stream.py)."""
    from pyspark.sql import Window

    from recsys_pipeline_spark.streaming import curation_stream as cs

    out = str(tmp_path / "cap_out")
    cs.cap_per_group_stream(
        sp.stream_events(spark, SF), "event_type", ["ts", "event_id"], 7, out
    )
    got = {r["event_id"] for r in spark.read.parquet(out).collect()}
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    want = {
        r["event_id"]
        for r in batch_events.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= 7)
        .collect()
    }
    assert got == want and len(got) > 0


def test_streaming_cap_per_group_multi_epoch_respects_cap(
    spark, batch_events, tmp_path
):
    """Across micro-batches the sink-derived state must keep every group at
    min(k, group size) — replays/late batches cannot double-admit."""
    from recsys_pipeline_spark.streaming import curation_stream as cs

    src = str(tmp_path / "src")
    batch_events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    batch_events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema(batch_events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "cap_out2")
    cs.cap_per_group_stream(stream, "event_type", ["ts", "event_id"], 7, out)
    sizes = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(out)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    base = {
        r["event_type"]: r["n"]
        for r in batch_events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sizes == {t: min(n, 7) for t, n in base.items()}
    # survivors are input rows, not rewrites
    assert (
        spark.read.parquet(out)
        .join(batch_events, ["event_id"], "left_anti")
        .count()
        == 0
    )


def _inter(df):
    return df.select(
        "event_id",
        F.col("user_id").alias("userid"),
        F.get_json_object("props", "$.k").cast("int").alias("itemid"),
    )


def test_streaming_negative_sample_single_epoch_matches_batch(
    spark, batch_events, tmp_path
):
    """One micro-batch holds the whole log, so prefix-seen == full-seen and
    the foreachBatch twin must reproduce the batch operator exactly."""
    from recsys_pipeline_spark.operators import curation
    from recsys_pipeline_spark.streaming import curation_stream as cs

    out, seen = str(tmp_path / "neg_out"), str(tmp_path / "neg_seen")
    cs.negative_sample_stream(
        _inter(sp.stream_events(spark, SF)),
        "userid", "itemid", "event_id", 100, out, seen,
    )
    got = {
        (r["event_id"], r["userid"], r["itemid"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["event_id"], r["userid"], r["itemid"])
        for r in curation.negative_sample(
            _inter(batch_events), "userid", "itemid", "event_id", 100
        ).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_negative_sample_multi_epoch_prefix_semantics(
    spark, batch_events, tmp_path
):
    """Two micro-batches: the draw for an event never depends on batching
    (same salted hash), and the prefix-seen output is a superset of the
    batch full-seen output — the extra emissions are exactly pairs whose
    disqualifying positive had not arrived yet."""
    from recsys_pipeline_spark.operators import curation
    from recsys_pipeline_spark.operators.curation import hash_bucket
    from recsys_pipeline_spark.streaming import curation_stream as cs

    src = str(tmp_path / "src")
    batch_events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    batch_events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema(batch_events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out, seen = str(tmp_path / "neg_out2"), str(tmp_path / "neg_seen2")
    cs.negative_sample_stream(
        _inter(stream), "userid", "itemid", "event_id", 100, out, seen
    )
    got = {
        (r["event_id"], r["userid"], r["itemid"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["event_id"], r["userid"], r["itemid"])
        for r in curation.negative_sample(
            _inter(batch_events), "userid", "itemid", "event_id", 100
        ).collect()
    }
    cand = {
        (r["event_id"], r["userid"], r["itemid"])
        for r in _inter(batch_events)
        .select(
            "event_id", "userid",
            hash_bucket(F.col("event_id"), "neg", 100).alias("itemid"),
        )
        .collect()
    }
    full_seen = {
        (r["userid"], r["itemid"])
        for r in _inter(batch_events).select("userid", "itemid").distinct().collect()
    }
    assert want <= got <= cand
    # one negative per source event, always in vocab
    assert len({e for e, _, _ in got}) == len(got)
    assert all(0 <= i < 100 for _, _, i in got)
    # anything beyond the batch output was blocked only by a not-yet-seen
    # positive: its (user, item) IS in the full seen set
    assert {(u, i) for _, u, i in got - want} <= full_seen


def test_streaming_decontaminate_single_epoch_matches_batch(spark, tmp_path):
    """One micro-batch holds the whole corpus, so prefix-eval == full-eval
    and the foreachBatch twin must reproduce decontaminate_flags exactly."""
    from recsys_pipeline_spark.operators import curation
    from recsys_pipeline_spark.streaming import curation_stream as cs

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "documents.parquet")
        .parquet("/root/testdata/sf0.001")
    )
    out, gd = str(tmp_path / "dec_out"), str(tmp_path / "dec_grams")
    cs.decontaminate_stream(stream, "doc_id", "text", 5, 4, out, gd)
    got = {
        (r["doc_id"], r["n_hits"]) for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["doc_id"], r["n_hits"])
        for r in curation.decontaminate_flags(
            docs, "doc_id", "text", eval_pct=5, n=4
        ).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_decontaminate_multi_epoch_prefix_semantics(spark, tmp_path):
    """Two micro-batches: a doc is only checked against eval grams that had
    arrived by its batch, so per-doc hit counts are <= the batch operator's
    and the flagged set is a subset — never a false positive."""
    from recsys_pipeline_spark.operators import curation
    from recsys_pipeline_spark.streaming import curation_stream as cs

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").cache()
    src = str(tmp_path / "src")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out, gd = str(tmp_path / "dec_out2"), str(tmp_path / "dec_grams2")
    cs.decontaminate_stream(stream, "doc_id", "text", 5, 4, out, gd)
    got = {
        r["doc_id"]: r["n_hits"] for r in spark.read.parquet(out).collect()
    }
    want = {
        r["doc_id"]: r["n_hits"]
        for r in curation.decontaminate_flags(
            docs, "doc_id", "text", eval_pct=5, n=4
        ).collect()
    }
    assert set(got) <= set(want)
    assert all(got[i] <= want[i] for i in got)
    assert len(got) > 0


def test_streaming_curation_replay_is_idempotent(spark, batch_events, tmp_path):
    """foreachBatch is at-least-once: re-running the whole stream against
    the same sink dirs (a full replay — without a checkpoint the epochs
    re-fire with the same ids) must leave the output byte-identical, not
    doubled; the epoch-partitioned dynamic-overwrite sink guarantees it."""
    from recsys_pipeline_spark.streaming import curation_stream as cs

    out = str(tmp_path / "cap_out")

    def run():
        cs.cap_per_group_stream(
            sp.stream_events(spark, SF), "event_type", ["ts", "event_id"], 7, out
        )

    run()
    first = sorted(
        (r["event_id"], r["event_type"])
        for r in spark.read.parquet(out).collect()
    )
    run()  # replay
    second = sorted(
        (r["event_id"], r["event_type"])
        for r in spark.read.parquet(out).collect()
    )
    assert first == second and len(first) > 0

    nout, seen = str(tmp_path / "neg_out"), str(tmp_path / "neg_seen")

    def run_neg():
        cs.negative_sample_stream(
            _inter(sp.stream_events(spark, SF)),
            "userid", "itemid", "event_id", 100, nout, seen,
        )

    run_neg()
    n1 = sorted(
        (r["event_id"], r["itemid"]) for r in spark.read.parquet(nout).collect()
    )
    run_neg()
    n2 = sorted(
        (r["event_id"], r["itemid"]) for r in spark.read.parquet(nout).collect()
    )
    assert n1 == n2 and len(n1) > 0


def test_streaming_boilerplate_single_epoch_matches_batch(spark, tmp_path):
    """One micro-batch holds the whole corpus, so prefix stats == corpus
    stats and the foreachBatch twin must reproduce boilerplate_flags
    exactly (same grams, same df threshold, same counts)."""
    from recsys_pipeline_spark.operators import curation
    from recsys_pipeline_spark.streaming import curation_stream as cs

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "documents.parquet")
        .parquet("/root/testdata/sf0.001")
    )
    out = str(tmp_path / "bp_out")
    gd, dd = str(tmp_path / "bp_grams"), str(tmp_path / "bp_docs")
    cs.boilerplate_stream(stream, "doc_id", "text", "source", 2, 15, out, gd, dd)
    got = {
        (r["doc_id"], r["source"], r["n_grams"], r["n_boiler"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["doc_id"], r["source"], r["n_grams"], r["n_boiler"])
        for r in curation.boilerplate_flags(
            docs, "doc_id", "text", "source", n=2, share_pct=15
        ).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_boilerplate_epoch_equals_batch_on_prefix(spark, tmp_path):
    """Two micro-batches: each epoch's flags must equal the batch operator
    run on the PREFIX corpus (epochs 0..e), restricted to that epoch's
    documents — the honest online semantics of a corpus-statistic
    threshold (no subset guarantee across epochs, asserted per-epoch)."""
    from recsys_pipeline_spark.operators import curation
    from recsys_pipeline_spark.streaming import curation_stream as cs

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").cache()
    half0, half1 = docs.filter(F.col("doc_id") % 2 == 0), docs.filter(
        F.col("doc_id") % 2 == 1
    )
    src = str(tmp_path / "bp_src")
    half0.coalesce(1).write.mode("append").parquet(src)
    half1.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "bp_out2")
    gd, dd = str(tmp_path / "bp_grams2"), str(tmp_path / "bp_docs2")
    cs.boilerplate_stream(stream, "doc_id", "text", "source", 2, 15, out, gd, dd)
    flags = spark.read.parquet(out).cache()
    # file order == epoch order is not guaranteed; recover which half each
    # epoch processed from the sink itself (flags carry the batch's ids)
    epochs = sorted(r["_epoch"] for r in flags.select("_epoch").distinct().collect())
    assert len(epochs) == 2
    for e in epochs:
        got = {
            (r["doc_id"], r["n_grams"], r["n_boiler"])
            for r in flags.filter(F.col("_epoch") == e).collect()
        }
        ids = {i for i, _, _ in got}
        batch_half = half0 if all(i % 2 == 0 for i in ids) else half1
        # first epoch's prefix is its own half; second epoch saw everything
        prefix = batch_half if e == min(epochs) else docs
        want_all = curation.boilerplate_flags(
            prefix, "doc_id", "text", "source", n=2, share_pct=15
        )
        want = {
            (r["doc_id"], r["n_grams"], r["n_boiler"])
            for r in want_all.join(
                batch_half.select("doc_id"), "doc_id"
            ).collect()
        }
        assert got == want, e
    assert flags.count() > 0
    flags.unpersist()


def test_streaming_chunking_matches_batch(spark, tmp_path):
    """chunk_documents is stateless narrow ops (tokenize/sequence/explode/
    slice), so the SAME operator applied to a readStream frame must emit
    exactly the batch chunks — no twin needed, which is itself the claim
    worth pinning."""
    from recsys_pipeline_spark.operators.curation import chunk_documents

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "documents.parquet")
        .parquet("/root/testdata/sf0.001")
    )
    out = str(tmp_path / "chunks")
    (
        chunk_documents(stream, "doc_id", "text", 64, 16)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r["doc_id"], r["chunk_id"], r["start_tok"], r["n_tokens"], r["chunk_text"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["doc_id"], r["chunk_id"], r["start_tok"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(docs, "doc_id", "text", 64, 16).collect()
    }
    assert got == want and len(got) > 0


def test_state_compaction_preserves_reads_and_shrinks_partitions(spark, tmp_path):
    """compact_state folds old epochs into the _epoch=-1 base partition:
    _read_state results are identical before and after (for any live epoch
    horizon), the partition count drops to base + the newest delta (which
    is NEVER folded — it may be an uncommitted first attempt whose replay
    must not see its own rows), and a subsequent epoch still appends
    normally."""
    import os

    from recsys_pipeline_spark.streaming import curation_stream as cs

    docs = read_table(spark, SF, "events").limit(40).select("event_id", "user_id")
    path = str(tmp_path / "state")
    # three delta epochs
    for e in range(3):
        part = docs.filter(F.col("event_id") % 3 == e)
        cs._write_epoch(part, path, e)

    def read_at(horizon):
        return {
            tuple(r)
            for r in cs._read_state(spark, path, docs, horizon).collect()
        }

    before = {h: read_at(h) for h in (2, 3, 4)}
    cs.compact_state(spark, path, before_epoch=4)  # horizon clamps to newest=2
    parts = sorted(
        d for d in os.listdir(path) if d.startswith("_epoch=")
    )
    assert parts == ["_epoch=-1", "_epoch=2"], parts
    after = {h: read_at(h) for h in (2, 3, 4)}
    assert after == before
    # a replay of the newest epoch still overwrites its own delta and sees
    # only the base (crash-replay invariant the clamp protects)
    assert read_at(2) == before[2]
    # new delta after compaction still accumulates on top of the base
    extra = docs.filter(F.col("event_id") % 3 == 0)
    cs._write_epoch(extra, path, 3)
    grown = read_at(4)
    assert grown == before[3] | {tuple(r) for r in extra.collect()}
    # and a replay of epoch 3 is still idempotent (dynamic overwrite)
    cs._write_epoch(extra, path, 3)
    assert read_at(4) == grown


def test_streaming_weighted_reservoir_equals_batch_exactly(spark, tmp_path):
    """The ES key is a pure per-row function, so the reservoir after the
    LAST micro-batch must equal the batch weighted sample on the whole
    corpus — exact, not subset/superset, regardless of batching."""
    from recsys_pipeline_spark.operators.curation import weighted_sample_per_group
    from recsys_pipeline_spark.streaming import curation_stream as cs

    docs = read_table(spark, SF, "documents").select("lang", "doc_id", "n_chars").cache()
    src = str(tmp_path / "ws_src")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "ws_out")
    cs.weighted_sample_stream(stream, "lang", "doc_id", "n_chars", 10, out)
    snap = spark.read.parquet(out)
    last = snap.select(F.max("_epoch").alias("m")).collect()[0]["m"]
    assert last >= 1  # really ran >1 micro-batch
    got = {
        (r["lang"], r["doc_id"])
        for r in snap.filter(F.col("_epoch") == last).collect()
    }
    want = {
        (r["lang"], r["doc_id"])
        for r in weighted_sample_per_group(
            docs, "lang", "doc_id", "n_chars", 10
        ).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_boilerplate_reingested_doc_does_not_double_count(spark, tmp_path):
    """Review-finding regression: a document ingested again in a later
    epoch (a re-crawled page) must not double-count its grams' doc
    frequency — epoch 2's flags must equal the batch operator on the
    DISTINCT prefix corpus restricted to epoch 2's docs."""
    from recsys_pipeline_spark.operators import curation
    from recsys_pipeline_spark.streaming import curation_stream as cs

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").cache()
    half0 = docs.filter(F.col("doc_id") % 2 == 0)
    # second batch = the odd docs PLUS a re-crawl of half the even docs
    recrawl = docs.filter((F.col("doc_id") % 2 == 1) | (F.col("doc_id") % 4 == 0))
    src = str(tmp_path / "bp_src3")
    half0.coalesce(1).write.mode("append").parquet(src)
    recrawl.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "bp_out3")
    gd, dd = str(tmp_path / "bp_grams3"), str(tmp_path / "bp_docs3")
    cs.boilerplate_stream(stream, "doc_id", "text", "source", 2, 15, out, gd, dd)
    flags = spark.read.parquet(out).cache()
    epochs = sorted(r["_epoch"] for r in flags.select("_epoch").distinct().collect())
    assert len(epochs) == 2
    # identify the recrawl epoch by its doc mix (contains odd ids)
    for e in epochs:
        ids = {r["doc_id"] for r in flags.filter(F.col("_epoch") == e).collect()}
        if any(i % 2 == 1 for i in ids):
            recrawl_epoch, recrawl_ids = e, ids
    got = {
        (r["doc_id"], r["n_grams"], r["n_boiler"])
        for r in flags.filter(F.col("_epoch") == recrawl_epoch).collect()
    }
    # prefix corpus at that epoch = all docs (half0 ∪ recrawl), DISTINCT
    want = {
        (r["doc_id"], r["n_grams"], r["n_boiler"])
        for r in curation.boilerplate_flags(
            docs, "doc_id", "text", "source", n=2, share_pct=15
        )
        .join(recrawl.select("doc_id"), "doc_id")
        .collect()
    }
    assert got == want and len(got) > 0
    flags.unpersist()


def test_streaming_quality_gate_is_batch_local(spark, tmp_path):
    """quality_gate's verdict is a pure function of the document's own row
    (every signal — counts, mean length, stopwords, dup-3-grams —
    aggregates only within the doc), so applying the operator per
    micro-batch via foreachBatch yields EXACTLY the batch verdicts for
    those docs, independent of how the stream is batched. That
    batch-locality is the claim worth pinning: it means the gate needs no
    state table at all, unlike the df-ratio boilerplate twin."""
    from recsys_pipeline_spark.operators.curation import quality_gate
    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    src = str(tmp_path / "qg_src")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(src)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "qg_out")
    kw = dict(
        min_tokens=25, max_tokens=90, min_mtl_x100=380, max_mtl_x100=520,
        dup3_ppm_max=20000,
    )

    def step(batch, epoch_id):
        quality_gate(batch, "doc_id", "text", **kw).write.mode("append").parquet(out)

    foreach_batch_sink(stream, step)
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    want = {tuple(r) for r in quality_gate(docs, "doc_id", "text", **kw).collect()}
    assert got == want and len(got) > 0


def test_streaming_tokenize_ids_matches_batch_on_prefix(spark, tmp_path):
    """Each epoch's encodings must equal the batch operator applied to the
    PREFIX corpus, restricted to that epoch's documents — with the state
    held as sum-mergeable per-epoch count deltas, not raw token rows. The
    final epoch (prefix = everything) must equal the full batch result."""
    from recsys_pipeline_spark.operators.curation import (
        encode_token_ids,
        token_positions,
        vocab_topk,
    )
    from recsys_pipeline_spark.streaming import curation_stream as cs

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    half0 = docs.filter(F.col("doc_id") % 2 == 0)
    half1 = docs.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "tk_src")
    half0.coalesce(1).write.parquet(src)
    half1.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out, cnt = str(tmp_path / "tk_out"), str(tmp_path / "tk_cnt")
    cs.tokenize_ids_stream(stream, "doc_id", "text", 20, out, cnt)
    got_all = spark.read.parquet(out).cache()
    epochs = sorted(
        r["_epoch"] for r in got_all.select("_epoch").distinct().collect()
    )
    assert len(epochs) == 2

    def batch_on(prefix, members):
        pos = token_positions(prefix, "doc_id", "text")
        counts = pos.groupBy("tok").agg(F.count(F.lit(1)).alias("_cnt"))
        return {
            (r["doc_id"], tuple(r["token_ids"]), r["n_tokens"], r["n_oov"])
            for r in encode_token_ids(pos, vocab_topk(counts, 20), "doc_id")
            .join(members.select("doc_id"), "doc_id")
            .collect()
        }

    # identify which epoch carried which half by its doc ids
    by_epoch = {
        e: {r["doc_id"] for r in got_all.filter(F.col("_epoch") == e).collect()}
        for e in epochs
    }
    first = [e for e, ids in by_epoch.items() if all(i % 2 == 0 for i in ids)]
    assert len(first) == 1
    e0 = first[0]
    e1 = [e for e in epochs if e != e0][0]
    got0 = {
        (r["doc_id"], tuple(r["token_ids"]), r["n_tokens"], r["n_oov"])
        for r in got_all.filter(F.col("_epoch") == e0).collect()
    }
    got1 = {
        (r["doc_id"], tuple(r["token_ids"]), r["n_tokens"], r["n_oov"])
        for r in got_all.filter(F.col("_epoch") == e1).collect()
    }
    assert got0 == batch_on(half0, half0) and len(got0) > 0
    assert got1 == batch_on(docs, half1) and len(got1) > 0
    got_all.unpersist()


def test_streaming_lm_perplexity_matches_batch_on_prefix(spark, tmp_path):
    """Each epoch's scores must equal the batch operator on the PREFIX
    corpus restricted to that epoch's documents, with the LM state held as
    sum-mergeable (prev, cur) count deltas; the final epoch (prefix =
    everything) must equal the full batch result for its docs."""
    from recsys_pipeline_spark.operators.curation import hash_bucket, lm_perplexity
    from recsys_pipeline_spark.streaming import curation_stream as cs

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    half0 = docs.filter(F.col("doc_id") % 2 == 0)
    half1 = docs.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "lm_src")
    half0.coalesce(1).write.parquet(src)
    half1.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    ref = hash_bucket(F.col("doc_id"), "lm") < 30
    out, c2d = str(tmp_path / "lm_out"), str(tmp_path / "lm_c2")
    cs.lm_perplexity_stream(stream, "doc_id", "text", ref, out, c2d)
    got_all = spark.read.parquet(out).cache()
    epochs = sorted(r["_epoch"] for r in got_all.select("_epoch").distinct().collect())
    assert len(epochs) == 2
    by_epoch = {
        e: {r["doc_id"] for r in got_all.filter(F.col("_epoch") == e).collect()}
        for e in epochs
    }
    e0 = next(e for e, ids in by_epoch.items() if all(i % 2 == 0 for i in ids))
    e1 = next(e for e in epochs if e != e0)

    def snap(e):
        return {
            (r["doc_id"], r["n_bigrams"], r["avg_nll"])
            for r in got_all.filter(F.col("_epoch") == e).collect()
        }

    def batch_on(prefix, members):
        return {
            (r["doc_id"], r["n_bigrams"], r["avg_nll"])
            for r in lm_perplexity(prefix, "doc_id", "text", ref)
            .join(members.select("doc_id"), "doc_id")
            .collect()
        }

    assert snap(e0) == batch_on(half0, half0) and len(snap(e0)) > 0
    assert snap(e1) == batch_on(docs, half1) and len(snap(e1)) > 0
    got_all.unpersist()


def test_streaming_url_dedup_admits_first_per_canonical_key(spark, tmp_path):
    """Across micro-batches exactly one document per canonical URL is
    admitted (first-epoch-wins, min-id within a batch); on a single batch
    the admitted set equals the batch report's keepers; replaying never
    double-admits. URL synthesis matches q_url_dedup's."""
    from recsys_pipeline_spark.streaming import curation_stream as cs

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    did = F.col("doc_id")
    url = F.concat(
        F.lit("https://WWW."), F.col("source"), F.lit(".Example.COM:443/p/"),
        (did % 7).cast("string"), F.lit("/?utm_source=feed&id="),
        (did % 3).cast("string"),
    )
    with_url = docs.select("doc_id", "source", url.alias("url"))
    half0 = with_url.filter(did % 2 == 0)
    half1 = with_url.filter(did % 2 == 1)
    src = str(tmp_path / "ud_src")
    half0.coalesce(1).write.parquet(src)
    half1.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(with_url.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "ud_out")
    cs.url_dedup_stream(stream, "doc_id", "url", out)
    admitted = spark.read.parquet(out).cache()
    # exactly one admission per canonical key, and every key admitted
    per_key = admitted.groupBy("canonical_url").count()
    assert per_key.filter("count > 1").count() == 0
    from recsys_pipeline_spark.operators.text import canonical_url

    n_keys = (
        with_url.select(canonical_url(F.col("url")).alias("c")).distinct().count()
    )
    assert per_key.count() == n_keys
    # a key first seen in epoch 0 keeps its epoch-0 winner (min even id);
    # keys only introduced by odd docs admit their min odd id
    rows = {r["canonical_url"]: (r["doc_id"], r["_epoch"]) for r in admitted.collect()}
    wins0 = {
        r["c"]: r["m"]
        for r in half0.select(canonical_url(F.col("url")).alias("c"), "doc_id")
        .groupBy("c").agg(F.min("doc_id").alias("m")).collect()
    }
    for key, (keeper, _) in rows.items():
        if key in wins0:
            assert keeper == wins0[key], (key, keeper)
    assert any(k not in wins0 for k in rows)  # odd-only keys exist and admit
    admitted.unpersist()


def test_streaming_incremental_curate_matches_batch_on_prefix(spark, tmp_path):
    """Each epoch's report must equal the batch composite (snapshot_diff +
    quality_gate + chunk_documents) applied to (prefix-before, prefix-after-
    this-batch), restricted to the batch's docs: re-sent identical docs emit
    nothing, changed docs re-gate/re-chunk, new docs arrive as 'added'. The
    digest state folds via compact_latest_state with identical reads."""
    from recsys_pipeline_spark.operators.curation import (
        chunk_documents,
        quality_gate,
        snapshot_diff,
    )
    from recsys_pipeline_spark.streaming import curation_stream as cs

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "lang"
    )
    did = F.col("doc_id")
    b0 = docs.filter(did % 5 != 0)
    b1 = (
        docs.filter(did % 10 == 1)  # changed
        .select("doc_id", F.concat("text", F.lit(" rev2")).alias("text"), "lang")
        .unionByName(docs.filter(did % 10 == 2))  # re-sent identical -> no output
        .unionByName(docs.filter(did % 5 == 0))  # added
    )
    src = str(tmp_path / "ic_src")
    b0.coalesce(1).write.parquet(src)
    b1.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out, fpd = str(tmp_path / "ic_out"), str(tmp_path / "ic_fp")
    GATE = dict(
        min_tokens=25, max_tokens=90, min_mtl_x100=380, max_mtl_x100=520,
        dup3_ppm_max=20000,
    )
    cs.incremental_curate_stream(
        stream, "doc_id", "text", ["text", "lang"], out, fpd,
        chunk_tokens=64, chunk_overlap=16, **GATE,
    )
    got_all = spark.read.parquet(out).cache()
    epochs = sorted(r["_epoch"] for r in got_all.select("_epoch").distinct().collect())
    assert len(epochs) == 2
    by_epoch = {
        e: {r["doc_id"] for r in got_all.filter(F.col("_epoch") == e).collect()}
        for e in epochs
    }
    e0 = next(e for e, ids in by_epoch.items() if all(i % 5 != 0 for i in ids))
    e1 = next(e for e in epochs if e != e0)

    def snap(e):
        return {
            (r["doc_id"], r["status"], r["keep"], r["n_chunks"])
            for r in got_all.filter(F.col("_epoch") == e).collect()
        }

    def batch_report(delta_docs):
        gate = quality_gate(delta_docs, "doc_id", "text", **GATE).select("doc_id", "keep")
        kept = delta_docs.join(gate.filter(F.col("keep") == 1), "doc_id").select(
            "doc_id", "text"
        )
        nch = (
            chunk_documents(kept, "doc_id", "text", 64, 16)
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_chunks"))
        )
        return {
            (r["doc_id"], r["status"], r["keep"], r["n_chunks"])
            for r in delta_docs.select("doc_id", "status")
            .join(gate, "doc_id")
            .join(nch, "doc_id", "left")
            .select(
                "doc_id", "status", "keep",
                F.coalesce(F.col("n_chunks"), F.lit(0)).alias("n_chunks"),
            )
            .collect()
        }

    # epoch 0: empty prefix -> everything added
    exp0 = batch_report(b0.withColumn("status", F.lit("added")))
    assert snap(e0) == exp0 and len(exp0) > 0
    # epoch 1: statuses from the batch snapshot_diff on (b0, b0 upserted by b1)
    merged = b1.unionByName(b0.join(b1.select("doc_id"), "doc_id", "left_anti"))
    diff = snapshot_diff(b0, merged, "doc_id", ["text", "lang"]).filter(
        F.col("status") != "removed"
    )
    delta1 = b1.join(diff, "doc_id")
    exp1 = batch_report(delta1)
    assert snap(e1) == exp1 and len(exp1) > 0
    # the re-sent identical docs emitted nothing
    assert not any(i % 10 == 2 and i % 5 != 0 for i in by_epoch[e1])
    got_all.unpersist()

    # compact_latest_state: latest-fingerprint-per-key reads are equivalent
    def latest_fp():
        t = spark.read.parquet(fpd)
        w = Window.partitionBy("doc_id").orderBy(F.col("_epoch").desc())
        return {
            (r["doc_id"], r["_fp"])
            for r in t.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("doc_id", "_fp")
            .collect()
        }

    before = latest_fp()
    cs.compact_latest_state(spark, fpd, ["doc_id"], before_epoch=10**6)
    assert latest_fp() == before and len(before) > 0


def test_streaming_semdedup_admission_matches_batch_and_prefix(spark, tmp_path):
    """Single micro-batch == the batch semdedup_survivors exactly; across
    micro-batches admission is first-arrival-wins single-hop: drop a doc
    with a smaller-id near-dup in its batch OR any admitted near-dup in its
    cell — asserted against an independent numpy replication of the rule."""
    import numpy as np

    from recsys_pipeline_spark.operators.dedup import sketch_of_vec, sketch_planes
    from recsys_pipeline_spark.queries_ext import q_semdedup_survivors
    from recsys_pipeline_spark.streaming import curation_stream as cs

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")

    # 1) single batch == batch operator
    src1 = str(tmp_path / "sd_src1")
    emb.coalesce(1).write.parquet(src1)
    stream = (
        spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1).parquet(src1)
    )
    out1 = str(tmp_path / "sd_out1")
    cs.semdedup_stream(stream, "vec_id", "embedding", out1, threshold=0.3)
    got1 = {r["_id"] for r in spark.read.parquet(out1).collect()}
    want1 = {r["vec_id"] for r in q_semdedup_survivors(spark, "/root/testdata/sf0.001").collect()}
    assert got1 == want1 and len(got1) > 0

    # 2) two micro-batches vs the numpy reference of the sequential rule
    half0 = emb.filter(F.col("vec_id") % 2 == 0)
    half1 = emb.filter(F.col("vec_id") % 2 == 1)
    src2 = str(tmp_path / "sd_src2")
    half0.coalesce(1).write.parquet(src2)
    half1.coalesce(1).write.mode("append").parquet(src2)
    stream2 = (
        spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1).parquet(src2)
    )
    out2 = str(tmp_path / "sd_out2")
    cs.semdedup_stream(stream2, "vec_id", "embedding", out2, threshold=0.3)
    table = spark.read.parquet(out2)
    epochs = sorted(r["_epoch"] for r in table.select("_epoch").distinct().collect())
    assert len(epochs) == 2
    by_epoch = {
        e: {r["_id"] for r in table.filter(F.col("_epoch") == e).collect()}
        for e in epochs
    }
    e0 = next(e for e, ids in by_epoch.items() if all(i % 2 == 0 for i in ids))
    e1 = next(e for e in epochs if e != e0)

    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    planes = sketch_planes(64, bits=3, tables=1, seed=7)
    cell = {i: sketch_of_vec(v, planes)[0] for i, v in vecs.items()}

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(np.dot(a, b) / (na * nb)) if na and nb else 0.0

    def admit(batch_ids, state_ids):
        admitted = []
        for i in sorted(batch_ids):
            same_batch = any(
                j < i and cell[j] == cell[i] and cos(vecs[j], vecs[i]) >= 0.3
                for j in batch_ids
            )
            vs_state = any(
                cell[s] == cell[i] and cos(vecs[s], vecs[i]) >= 0.3
                for s in state_ids
            )
            if not same_batch and not vs_state:
                admitted.append(i)
        return set(admitted)

    ids0 = {i for i in vecs if i % 2 == 0}
    ids1 = {i for i in vecs if i % 2 == 1}
    exp0 = admit(ids0, set())
    exp1 = admit(ids1, by_epoch[e0])
    assert by_epoch[e0] == exp0 and len(exp0) > 0
    assert by_epoch[e1] == exp1 and len(exp1) > 0


def test_streaming_pack_token_bins_exact_on_ordered_ranges(spark, tmp_path):
    """Range-partitioned micro-batches (each source's ids contiguous across
    epochs — the append-log shape) must produce EXACTLY the batch
    pack_greedy bins on the full corpus: packing is a prefix sum and the
    per-source carry is the prefix. State = one long per source."""
    from recsys_pipeline_spark.operators.curation import pack_greedy
    from recsys_pipeline_spark.operators.text import token_count
    from recsys_pipeline_spark.streaming import curation_stream as cs

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    lo = docs.filter(F.col("doc_id") < 250)
    hi = docs.filter(F.col("doc_id") >= 250)
    src = str(tmp_path / "pk_src")
    lo.coalesce(1).write.parquet(src)
    hi.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out, carry = str(tmp_path / "pk_out"), str(tmp_path / "pk_carry")
    cs.pack_token_bins_stream(
        stream, "source", "doc_id", token_count(F.col("text")), 512, out, carry
    )
    got_all = spark.read.parquet(out).cache()
    epochs = sorted(r["_epoch"] for r in got_all.select("_epoch").distinct().collect())
    assert len(epochs) == 2
    # file order is not guaranteed: the exact guarantee holds only when the
    # low range was processed first — if not, assert arrival-order semantics
    e_first = min(epochs)
    first_ids = {r["doc_id"] for r in got_all.filter(F.col("_epoch") == e_first).collect()}
    got = {
        (r["source"], r["doc_id"], r["bin_offset"], r["bin_id"])
        for r in got_all.collect()
    }
    want_df = pack_greedy(docs, "source", "doc_id", token_count(F.col("text")), 512)
    if all(i < 250 for i in first_ids):
        want = {
            (r["source"], r["doc_id"], r["bin_offset"], r["bin_id"])
            for r in want_df.select("source", "doc_id", "bin_offset", "bin_id").collect()
        }
        assert got == want and len(got) == docs.count()
    else:  # reversed arrival: per-batch packing still exact per epoch
        for e, part in ((min(epochs), hi), (max(epochs), lo)):
            sub = {
                (r["source"], r["doc_id"], r["bin_id"])
                for r in got_all.filter(F.col("_epoch") == e).collect()
            }
            assert len(sub) == part.count()
    got_all.unpersist()

    # carry state equals each source's total token count after both epochs
    totals = {
        r["source"]: r["t"]
        for r in docs.groupBy("source")
        .agg(F.sum(token_count(F.col("text"))).alias("t"))
        .collect()
    }
    from pyspark.sql import Window as W

    ct = spark.read.parquet(carry)
    w = W.partitionBy("source").orderBy(F.col("_epoch").desc())
    latest = {
        r["source"]: r["_carry"]
        for r in ct.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .collect()
    }
    assert latest == totals


def test_streaming_bm25_matches_batch_on_prefix(spark, tmp_path):
    """Each epoch's top-k must equal the batch BM25 operator on the PREFIX
    corpus (top-k is corpus-global, so the epoch output is not restricted
    to the epoch's docs), with state held as query-term-filtered fact rows
    plus sum-mergeable (n_docs, tot_tokens) counters; the final epoch
    (prefix = everything) must equal the full batch result."""
    from recsys_pipeline_spark.operators.text import bm25_facts, bm25_topk_from_facts
    from recsys_pipeline_spark.queries_curation import BM25_B, BM25_K1, BM25_TERMS
    from recsys_pipeline_spark.streaming import curation_stream as cs

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    half0 = docs.filter(F.col("doc_id") % 2 == 0)
    half1 = docs.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "bm_src")
    half0.coalesce(1).write.parquet(src)
    half1.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "bm_out")
    cs.bm25_stream(
        stream, "doc_id", "text", BM25_TERMS, BM25_K1, BM25_B, 20,
        out, str(tmp_path / "bm_tfdl"), str(tmp_path / "bm_stats"),
    )
    got_all = spark.read.parquet(out).cache()
    epochs = sorted(r["_epoch"] for r in got_all.select("_epoch").distinct().collect())
    assert len(epochs) == 2

    def batch_on(prefix):
        tfdl, stats = bm25_facts(prefix, "doc_id", "text", BM25_TERMS)
        return {
            (r["doc_id"], r["bm25"])
            for r in bm25_topk_from_facts(
                tfdl, stats, "doc_id", BM25_TERMS, BM25_K1, BM25_B, 20
            ).collect()
        }

    # the half0 epoch is the one whose top-k holds only even doc ids
    def got(e):
        return {
            (r["doc_id"], r["bm25"])
            for r in got_all.filter(F.col("_epoch") == e).collect()
        }

    e0 = [e for e in epochs if all(d % 2 == 0 for d, _ in got(e))]
    assert len(e0) == 1
    e1 = [e for e in epochs if e != e0[0]][0]
    assert got(e0[0]) == batch_on(half0) and len(got(e0[0])) == 20
    assert got(e1) == batch_on(docs) and len(got(e1)) == 20


def test_streaming_crawl_ingest_matches_batch(spark, tmp_path):
    """Ingest-gate parity: epoch 0's report must equal the batch composite
    on the first half's captures (minus the duplicate count an admission
    gate cannot know); epoch 1's must equal the batch composite on the
    second half restricted to canonical URLs NOT already admitted —
    first-epoch-wins, min-id within an epoch. Gate verdicts are
    per-document, so they match the batch gate's exactly either way."""
    from recsys_pipeline_spark.queries_curation import (
        QF_DUP3_PPM_MAX,
        QF_MAX_TOKENS,
        QF_MIN_TOKENS,
        QF_MTL_MAX_X100,
        QF_MTL_MIN_X100,
    )
    from recsys_pipeline_spark.queries_web import crawl_ingest_report, warc_blobs
    from recsys_pipeline_spark.streaming import curation_stream as cs

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    half0 = docs.filter(F.col("doc_id") % 2 == 0)
    half1 = docs.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "ci_src")
    warc_blobs(half0).coalesce(1).write.parquet(src)
    warc_blobs(half1).coalesce(1).write.mode("append").parquet(src)
    blob_schema = warc_blobs(docs).schema
    stream = (
        spark.readStream.schema(blob_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "ci_out")
    cs.crawl_ingest_stream(
        stream, out,
        min_tokens=QF_MIN_TOKENS, max_tokens=QF_MAX_TOKENS,
        min_mtl_x100=QF_MTL_MIN_X100, max_mtl_x100=QF_MTL_MAX_X100,
        dup3_ppm_max=QF_DUP3_PPM_MAX,
    )
    got_all = spark.read.parquet(out).cache()
    epochs = sorted(r["_epoch"] for r in got_all.select("_epoch").distinct().collect())
    assert len(epochs) == 2

    cols = ["doc_id", "canonical_url", "n_links", "n_tokens", "drop_reasons", "keep"]

    def got(e):
        return {tuple(r) for r in got_all.filter(F.col("_epoch") == e).select(*cols).collect()}

    def batch_on(prefix, exclude_canon=None):
        rep = crawl_ingest_report(prefix)
        if exclude_canon is not None:
            rep = rep.join(exclude_canon, "canonical_url", "left_anti")
        return {tuple(r) for r in rep.select(*cols).collect()}

    # which epoch carried half0 (even ids only)?
    by_ids = {e: {t[0] for t in got(e)} for e in epochs}
    e0 = [e for e in epochs if all(i % 2 == 0 for i in by_ids[e])]
    assert len(e0) == 1
    e0 = e0[0]
    e1 = [e for e in epochs if e != e0][0]
    got0 = got(e0)
    assert got0 == batch_on(half0) and len(got0) > 0
    seen0 = got_all.filter(F.col("_epoch") == e0).select("canonical_url")
    got1 = got(e1)
    assert got1 == batch_on(half1, exclude_canon=seen0) and len(got1) > 0
    # every canonical admitted exactly once across the stream, and the
    # admitted key set equals the batch composite's on the full corpus
    all_canon = [t[1] for t in got0 | got1]
    assert len(all_canon) == len(set(all_canon))
    assert set(all_canon) == {
        r["canonical_url"] for r in crawl_ingest_report(docs).select("canonical_url").collect()
    }
    got_all.unpersist()


def test_streaming_dup_span_coverage_matches_batch_on_prefix(spark, tmp_path):
    """Each epoch's coverage must equal the batch operator on the PREFIX
    corpus restricted to the epoch's documents — including the cross-epoch
    case where an epoch-1 doc duplicates a gram that occurred only ONCE in
    epoch 0 (prefix df reaches 2 across the boundary), with state held as
    sum-mergeable (gram, df) deltas. The final epoch's scores equal the
    full batch result for its docs."""
    from recsys_pipeline_spark.operators.dedup import dup_span_coverage
    from recsys_pipeline_spark.queries_curation import DUP_SPAN_N
    from recsys_pipeline_spark.streaming import curation_stream as cs

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    half0 = docs.filter(F.col("doc_id") % 2 == 0)
    half1 = docs.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "sp_src")
    half0.coalesce(1).write.parquet(src)
    half1.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out, dfd = str(tmp_path / "sp_out"), str(tmp_path / "sp_df")
    cs.dup_span_coverage_stream(stream, "doc_id", "text", DUP_SPAN_N, out, dfd)
    got_all = spark.read.parquet(out).cache()
    epochs = sorted(r["_epoch"] for r in got_all.select("_epoch").distinct().collect())
    assert len(epochs) == 2
    by_epoch = {
        e: {r["doc_id"] for r in got_all.filter(F.col("_epoch") == e).collect()}
        for e in epochs
    }
    e0 = [e for e, ids in by_epoch.items() if all(i % 2 == 0 for i in ids)]
    assert len(e0) == 1
    e0 = e0[0]
    e1 = [e for e in epochs if e != e0][0]

    def got(e):
        return {
            (r["doc_id"], r["n_tokens"], r["covered_tokens"], r["coverage_ppm"])
            for r in got_all.filter(F.col("_epoch") == e).collect()
        }

    def batch_on(prefix, members):
        return {
            (r["doc_id"], r["n_tokens"], r["covered_tokens"], r["coverage_ppm"])
            for r in dup_span_coverage(prefix, "doc_id", "text", n=DUP_SPAN_N)
            .join(members.select("doc_id"), "doc_id")
            .collect()
        }

    assert got(e0) == batch_on(half0, half0) and len(got(e0)) > 0
    assert got(e1) == batch_on(docs, half1) and len(got(e1)) > 0
    got_all.unpersist()


def test_streaming_line_dedup_matches_batch_on_prefix(spark, tmp_path):
    """Each epoch's cleaned documents must equal the batch line-dedup run
    on the PREFIX corpus restricted to the epoch's documents — including
    lines whose first occurrence was in an earlier epoch (they drop from
    later docs entirely), with state held as append-once admitted-line
    deltas."""
    from recsys_pipeline_spark.operators.dedup import line_dedup
    from recsys_pipeline_spark.operators.text import tokens
    from recsys_pipeline_spark.queries_curation import LINE_TOKENS
    from recsys_pipeline_spark.streaming import curation_stream as cs

    k = LINE_TOKENS
    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).select(
        "doc_id",
        F.expr(
            f"array_join(transform(sequence(1, (size(toks) + {k - 1}) DIV {k}),"
            f" i -> array_join(slice(toks, (i - 1) * {k} + 1, {k}), ' ')), '\\n')"
        ).alias("text_lines"),
    )
    # halves split by ID RANGE, not parity: the stream admits lines in
    # ARRIVAL order while the batch operator keeps the smallest (doc, pos)
    # GLOBALLY — the two agree exactly when arrival order == id order,
    # which is the honest "prefix corpus" reading for an ordered corpus
    # (with interleaved ids a line first ARRIVING in a big-id doc is
    # admitted there, while the batch assigns it to a later-arriving
    # smaller id — arrival semantics, not a bug; pinned by this choice)
    half0 = docs.filter(F.col("doc_id") < 250)
    half1 = docs.filter(F.col("doc_id") >= 250)
    src = str(tmp_path / "ln_src")
    half0.coalesce(1).write.parquet(src)
    half1.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out, lnd = str(tmp_path / "ln_out"), str(tmp_path / "ln_lines")
    cs.line_dedup_stream(stream, "doc_id", "text_lines", out, lnd)
    got_all = spark.read.parquet(out).cache()
    epochs = sorted(r["_epoch"] for r in got_all.select("_epoch").distinct().collect())
    assert len(epochs) == 2
    by_epoch = {
        e: {r["doc_id"] for r in got_all.filter(F.col("_epoch") == e).collect()}
        for e in epochs
    }
    e0 = [e for e, ids in by_epoch.items() if all(i < 250 for i in ids)]
    assert len(e0) == 1
    e0 = e0[0]
    e1 = [e for e in epochs if e != e0][0]

    def got(e):
        return {
            (r["doc_id"], r["cleaned_text"], r["n_kept"], r["n_dropped"])
            for r in got_all.filter(F.col("_epoch") == e).collect()
        }

    def batch_on(prefix, members):
        return {
            (r["doc_id"], r["cleaned_text"], r["n_kept"], r["n_dropped"])
            for r in line_dedup(prefix, "doc_id", "text_lines")
            .join(members.select("doc_id"), "doc_id")
            .collect()
        }

    assert got(e0) == batch_on(half0, half0) and len(got(e0)) > 0
    assert got(e1) == batch_on(docs, half1) and len(got(e1)) > 0
    # cross-epoch bite: at least one epoch-1 doc must actually lose a line
    assert any(t[3] > 0 for t in got(e1))
    got_all.unpersist()


def test_streaming_line_dedup_replay_is_idempotent(spark, tmp_path):
    """A full replay over the same sink/state dirs must leave both the
    cleaned output AND the admitted-line state byte-identical — the
    admission twins derive state from their own epochs, so a replayed
    epoch must re-derive the same admissions, never double-admit."""
    from recsys_pipeline_spark.operators.text import tokens
    from recsys_pipeline_spark.queries_curation import LINE_TOKENS
    from recsys_pipeline_spark.streaming import curation_stream as cs

    k = LINE_TOKENS
    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).select(
        "doc_id",
        F.expr(
            f"array_join(transform(sequence(1, (size(toks) + {k - 1}) DIV {k}),"
            f" i -> array_join(slice(toks, (i - 1) * {k} + 1, {k}), ' ')), '\\n')"
        ).alias("text_lines"),
    )
    src = str(tmp_path / "lr_src")
    docs.filter(F.col("doc_id") < 250).coalesce(1).write.parquet(src)
    docs.filter(F.col("doc_id") >= 250).coalesce(1).write.mode("append").parquet(src)
    out, lnd = str(tmp_path / "lr_out"), str(tmp_path / "lr_lines")

    def run():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        cs.line_dedup_stream(stream, "doc_id", "text_lines", out, lnd)

    def snap(path):
        return sorted(tuple(r) for r in spark.read.parquet(path).collect())

    run()
    out1, st1 = snap(out), snap(lnd)
    run()  # full replay, same epoch ids
    assert snap(out) == out1 and len(out1) > 0
    assert snap(lnd) == st1 and len(st1) > 0


def test_streaming_corpus_health_matches_batch_on_prefix(spark, tmp_path):
    """Each epoch must emit the FULL dashboard of the prefix corpus —
    identical to the batch operator on the prefix (ppm divisions run only
    on fully-summed counters); the final epoch equals the full batch
    result exactly."""
    from recsys_pipeline_spark.queries_curation import (
        health_partials,
        health_rollup,
        q_corpus_health,
    )
    from recsys_pipeline_spark.streaming import curation_stream as cs

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    half0 = docs.filter(F.col("doc_id") % 2 == 0)
    half1 = docs.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "ch_src")
    half0.coalesce(1).write.parquet(src)
    half1.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out, pts = str(tmp_path / "ch_out"), str(tmp_path / "ch_pts")
    cs.corpus_health_stream(stream, out, pts)
    got_all = spark.read.parquet(out).cache()
    epochs = sorted(r["_epoch"] for r in got_all.select("_epoch").distinct().collect())
    assert len(epochs) == 2

    def got(e):
        return {
            tuple(r)
            for r in got_all.filter(F.col("_epoch") == e).drop("_epoch").collect()
        }

    def batch_on(prefix):
        return {tuple(r) for r in health_rollup(health_partials(prefix)).collect()}

    # epochs are cumulative dashboards: one equals half0's, one the full
    # corpus's; the full one must match the registered batch query verbatim
    outs = [got(e) for e in epochs]
    want0, want_full = batch_on(half0), batch_on(docs)
    assert (outs[0] == want0 and outs[1] == want_full) or (
        outs[1] == want0 and outs[0] == want_full
    )
    assert want_full == {
        tuple(r) for r in q_corpus_health(spark, "/root/testdata/sf0.001").collect()
    }
    got_all.unpersist()


def test_streaming_pq_index_freezes_codebook_and_matches_batch(spark, tmp_path):
    """Online ANN-index ingestion: the codebook trains on the FIRST batch
    and freezes (written exactly once); every epoch's vectors encode against
    it. The first batch is constructed to contain the full corpus' pivot
    set, so the frozen codebook equals the batch codebook and the streamed
    index must equal batch pq_encode over the whole corpus verbatim."""
    import time

    from recsys_pipeline_spark.operators import pq
    from recsys_pipeline_spark.streaming import curation_stream as cs

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents_batch = pq.pq_centroids(emb)
    pivot_ids = {
        int(r["vec_id"])
        for r in emb.select(
            "vec_id",
            pq.portable_hash64(
                F.concat(F.lit("pqc:"), F.col("vec_id").cast("string"))
            ).alias("_h"),
        )
        .orderBy("_h", "vec_id")
        .limit(pq.PQ_K)
        .collect()
    }
    first = emb.filter(
        F.col("vec_id").isin([*pivot_ids]) | (F.col("vec_id") % 2 == 0)
    )
    second = emb.subtract(first)
    src = str(tmp_path / "pq_src")
    first.coalesce(1).write.parquet(src)
    time.sleep(1.5)  # distinct mtimes: the file source processes oldest first
    second.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out, cdir = str(tmp_path / "pq_out"), str(tmp_path / "pq_cents")
    cs.pq_index_stream(stream, "vec_id", "embedding", out, cdir)

    # codebook written exactly once, identical to the batch codebook
    cents_tbl = spark.read.parquet(cdir)
    assert cents_tbl.select("_epoch").distinct().count() == 1
    got_cents = {
        (int(r["m"]), int(r["k"]), tuple(r["cvec"])) for r in cents_tbl.collect()
    }
    want_cents = {
        (int(r["m"]), int(r["k"]), tuple(r["cvec"])) for r in cents_batch.collect()
    }
    assert got_cents == want_cents

    # two epochs, every vector encoded exactly once, codes == batch verbatim
    codes_tbl = spark.read.parquet(out).cache()
    assert codes_tbl.select("_epoch").distinct().count() == 2
    got = {int(r["vec_id"]): list(r["codes"]) for r in codes_tbl.collect()}
    assert len(got) == codes_tbl.count()  # no vector twice
    want = {
        int(r["vec_id"]): list(r["codes"])
        for r in pq.pq_encode(emb, cents_batch).collect()
    }
    assert got == want
    codes_tbl.unpersist()


def test_streaming_bpe_train_matches_batch_on_prefix(spark, tmp_path):
    """Prefix-dictionary BPE: each epoch's merge table equals batch
    bpe_train on the prefix corpus; the second epoch's table is the
    registered batch query's result verbatim."""
    from recsys_pipeline_spark.operators.curation import bpe_train
    from recsys_pipeline_spark.streaming import curation_stream as cs

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    half0 = docs.filter(F.col("doc_id") % 2 == 0)
    src = str(tmp_path / "bpe_src")
    half0.coalesce(1).write.parquet(src)
    import time

    time.sleep(1.5)  # distinct mtimes: oldest file processes first
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out, ddir = str(tmp_path / "bpe_out"), str(tmp_path / "bpe_dict")
    cs.bpe_train_stream(stream, "text", 3, out, ddir)
    table = spark.read.parquet(out).cache()
    epochs = sorted(r["_epoch"] for r in table.select("_epoch").distinct().collect())
    assert len(epochs) == 2

    def got(e):
        return [
            (int(r["merge_round"]), r["lhs"], r["rhs"], r["merged"], int(r["cnt"]))
            for r in table.filter(F.col("_epoch") == e).orderBy("merge_round").collect()
        ]

    def want(prefix):
        return [
            (int(r["merge_round"]), r["lhs"], r["rhs"], r["merged"], int(r["cnt"]))
            for r in bpe_train(prefix, "text", rounds=3).orderBy("merge_round").collect()
        ]

    assert got(epochs[0]) == want(half0)
    assert got(epochs[1]) == want(docs)
    table.unpersist()


def test_streaming_zorder_matches_batch_when_grid_freezes_on_extremes(spark, tmp_path):
    """Online write-layout planning: the zone grid freezes on the first
    batch; per-file zone-map partials merge by one grouped pass. The first
    batch is constructed to carry both columns' extremes, so the frozen
    grid equals the full-corpus grid and the final emitted zone map must
    equal batch zorder_layout verbatim. Out-of-grid handling (clamping) is
    pinned separately on a planted frame."""
    import time

    from recsys_pipeline_spark.operators import web as W
    from recsys_pipeline_spark.queries_web import ZORDER_BITS, ZORDER_SHIFT
    from recsys_pipeline_spark.streaming import curation_stream as cs

    li = read_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    st = li.agg(
        F.min("l_partkey").alias("mnx"), F.max("l_partkey").alias("mxx"),
        F.min("l_suppkey").alias("mny"), F.max("l_suppkey").alias("mxy"),
    ).first()
    extreme = (
        (F.col("l_partkey") == st["mnx"]) | (F.col("l_partkey") == st["mxx"])
        | (F.col("l_suppkey") == st["mny"]) | (F.col("l_suppkey") == st["mxy"])
    )
    keep_first = extreme | (F.col("l_orderkey") % 2 == 0)
    first = li.filter(keep_first)
    second = li.filter(~keep_first)  # NOT subtract: it would dedupe repeats
    src = str(tmp_path / "zo_src")
    first.coalesce(1).write.parquet(src)
    time.sleep(1.5)
    second.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(li.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "zo_out")
    cs.zorder_stream(
        stream, "l_partkey", "l_suppkey", out,
        str(tmp_path / "zo_stats"), str(tmp_path / "zo_parts"),
        bits=ZORDER_BITS, rows_per_file_shift=ZORDER_SHIFT,
    )
    table = spark.read.parquet(out)
    epochs = sorted(r["_epoch"] for r in table.select("_epoch").distinct().collect())
    assert len(epochs) == 2
    got = {
        int(r["file_id"]): (int(r["n_rows"]), int(r["min_x"]), int(r["max_x"]),
                            int(r["min_y"]), int(r["max_y"]))
        for r in table.filter(F.col("_epoch") == epochs[-1]).collect()
    }
    want = {
        int(r["file_id"]): (int(r["n_rows"]), int(r["min_x"]), int(r["max_x"]),
                            int(r["min_y"]), int(r["max_y"]))
        for r in W.zorder_layout(
            li, "l_partkey", "l_suppkey",
            bits=ZORDER_BITS, rows_per_file_shift=ZORDER_SHIFT,
        ).collect()
    }
    assert got == want


def test_zorder_files_clamps_out_of_grid_rows(spark):
    """Pinned-grid semantics: rows outside the frozen stats land in the
    edge buckets (greatest/least clamp), never bit-wrap into interior
    files."""
    from recsys_pipeline_spark.operators import web as W

    grid_src = spark.createDataFrame(
        [(0, 0), (15, 15)], "x long, y long"
    )
    stats = W.zorder_stats(grid_src, "x", "y")
    outside = spark.createDataFrame(
        [(-100, 5), (300, 5), (5, -100), (5, 300), (300, 300)], "x long, y long"
    )
    got = {
        (int(r["x"]), int(r["y"])): int(r["file_id"])
        for r in W.zorder_files(
            outside, "x", "y", stats, bits=4, rows_per_file_shift=0
        ).collect()
    }
    edge = {
        (int(r["x"]), int(r["y"])): int(r["file_id"])
        for r in W.zorder_files(
            spark.createDataFrame(
                [(0, 5), (15, 5), (5, 0), (5, 15), (15, 15)], "x long, y long"
            ),
            "x", "y", stats, bits=4, rows_per_file_shift=0,
        ).collect()
    }
    assert got[(-100, 5)] == edge[(0, 5)]
    assert got[(300, 5)] == edge[(15, 5)]
    assert got[(5, -100)] == edge[(5, 0)]
    assert got[(5, 300)] == edge[(5, 15)]
    assert got[(300, 300)] == edge[(15, 15)]


def test_streaming_item_transitions_exact_parity_via_carry(spark, tmp_path):
    """Covisitation online: the per-user carry row bridges micro-batch
    boundaries, so with time-ordered arrival the twin has EXACT batch
    parity — the merged pair counts equal the batch operator's counts in
    full (boundary transitions counted exactly once), and the final
    emitted top-k table equals the registered query verbatim."""
    import time

    from recsys_pipeline_spark.queries_ext import q_item_transitions
    from recsys_pipeline_spark.streaming import curation_stream as cs

    sf = "/root/testdata/sf0.001"
    ev = read_table(spark, sf, "events")
    t_med = ev.agg(
        F.expr("percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.5)")
    ).first()[0]
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    first = ev.filter(ts_us <= t_med)
    second = ev.filter(ts_us > t_med)
    assert first.count() > 0 and second.count() > 0
    src = str(tmp_path / "it_src")
    first.coalesce(1).write.parquet(src)
    time.sleep(1.5)
    second.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "it_out")
    pairs_dir = str(tmp_path / "it_pairs")
    cs.item_transitions_stream(stream, out, pairs_dir, str(tmp_path / "it_carry"))

    table = spark.read.parquet(out)
    epochs = sorted(r["_epoch"] for r in table.select("_epoch").distinct().collect())
    assert len(epochs) == 2
    got = {
        (int(r["item"]), int(r["rk"])): (int(r["next_item"]), int(r["cnt"]))
        for r in table.filter(F.col("_epoch") == epochs[-1]).collect()
    }
    want = {
        (int(r["item"]), int(r["rk"])): (int(r["next_item"]), int(r["cnt"]))
        for r in q_item_transitions(spark, sf).collect()
    }
    assert got == want

    # stronger than top-k equality: the FULL merged pair counts match the
    # batch counts — boundary transitions counted exactly once
    merged = {
        (int(r["item"]), int(r["next_item"])): int(r["cnt"])
        for r in spark.read.parquet(pairs_dir)
        .groupBy("item", "next_item")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    ev_items = ev.select(
        "user_id", "ts", "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch_pairs = {
        (int(r["item"]), int(r["next_item"])): int(r["cnt"])
        for r in ev_items.withColumn("next_item", F.lead("item").over(w))
        .filter(F.col("next_item").isNotNull() & (F.col("next_item") != F.col("item")))
        .groupBy("item", "next_item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert merged == batch_pairs


def test_streaming_funnel_conversion_prefix_parity(spark, tmp_path):
    """The funnel twin's min-mergeable frontier state: every epoch's 3-row
    report equals the registered batch query on the stream PREFIX, and the
    final epoch equals it on the full corpus — a view in one epoch whose
    converting click arrives in a later epoch is counted exactly once,
    across the micro-batch boundary."""
    import time

    from recsys_pipeline_spark.queries_analytics import q_funnel_conversion
    from recsys_pipeline_spark.streaming import curation_stream as cs

    sf = "/root/testdata/sf0.001"
    ev = read_table(spark, sf, "events")
    t_med = ev.agg(
        F.expr("percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.5)")
    ).first()[0]
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    first = ev.filter(ts_us <= t_med)
    second = ev.filter(ts_us > t_med)
    assert first.count() > 0 and second.count() > 0
    src = str(tmp_path / "fn_src")
    first.coalesce(1).write.parquet(src)
    time.sleep(1.5)
    second.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "fn_out")
    cs.funnel_conversion_stream(stream, out, str(tmp_path / "fn_state"))

    table = spark.read.parquet(out)
    epochs = sorted(r["_epoch"] for r in table.select("_epoch").distinct().collect())
    assert len(epochs) == 2

    def report(df):
        return {
            int(r["stage_idx"]): (r["stage"], int(r["n_users"]), int(r["conv_from_prev_ppm"]))
            for r in df.collect()
        }

    # prefix parity: epoch 0's report equals the registered batch query run
    # over ONLY the first slice (written as its own events table)
    prefix_dir = str(tmp_path / "fn_prefix")
    first.coalesce(1).write.parquet(f"{prefix_dir}/events.parquet")
    assert report(table.filter(F.col("_epoch") == epochs[0])) == report(
        q_funnel_conversion(spark, prefix_dir)
    )
    # full parity: the final epoch equals the batch query on the whole corpus
    assert report(table.filter(F.col("_epoch") == epochs[-1])) == report(
        q_funnel_conversion(spark, sf)
    )


def test_streaming_funnel_cross_boundary_conversion_and_compaction(spark, tmp_path):
    """Planted cross-boundary funnel: the view arrives in epoch 0, the
    qualifying click and purchase in epoch 1 — the click converts against
    the STATE frontier, not the batch. A same-ts click (not strictly after
    the view) must NOT convert. compact_state preserves the min-merged
    state exactly (the reader is an order-free aggregate)."""
    import time

    from recsys_pipeline_spark.streaming import curation_stream as cs

    import datetime

    schema = "user_id long, event_id long, event_type string, ts timestamp, value double, props string"

    def mk(uid, eid, et, sec):
        return (uid, eid, et, datetime.datetime(2024, 1, 1, 0, 0, sec), 1.0, "{}")

    first = spark.createDataFrame(
        [mk(1, 10, "view", 1), mk(2, 20, "view", 2), mk(2, 21, "click", 2)], schema
    )  # user 2's click ties the view's ts -> must not qualify
    second = spark.createDataFrame(
        [mk(1, 11, "click", 5), mk(1, 12, "purchase", 9)], schema
    )
    src = str(tmp_path / "fx_src")
    first.coalesce(1).write.parquet(src)
    time.sleep(1.5)
    second.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(first.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "fx_out")
    state = str(tmp_path / "fx_state")
    cs.funnel_conversion_stream(stream, out, state)

    table = spark.read.parquet(out)
    last = max(r["_epoch"] for r in table.select("_epoch").distinct().collect())
    got = {
        int(r["stage_idx"]): (int(r["n_users"]), int(r["conv_from_prev_ppm"]))
        for r in table.filter(F.col("_epoch") == last).collect()
    }
    # 2 viewers; only user 1 clicks (epoch-0 view -> epoch-1 click) and
    # purchases; user 2's same-ts click never qualifies
    assert got == {1: (2, 1000000), 2: (1, 500000), 3: (1, 1000000)}

    def merged_state():
        return {
            int(r["user_id"]): (r["t1"], r["t2"], r["t3"])
            for r in spark.read.parquet(state)
            .drop("_epoch")
            .groupBy("user_id")
            .agg(F.min("t1").alias("t1"), F.min("t2").alias("t2"), F.min("t3").alias("t3"))
            .collect()
        }

    before = merged_state()
    cs.compact_state(spark, state, before_epoch=last + 1)
    assert merged_state() == before


def test_streaming_retention_cohorts_exact_parity_even_out_of_order(spark, tmp_path):
    """The retention twin re-derives everything from an order-free
    (user, week) pair set, so parity is EXACT per epoch — including under
    OUT-OF-ORDER delivery: the second micro-batch here carries the EARLIER
    half of the corpus, re-cohorting users exactly as a batch rerun would."""
    import time

    from recsys_pipeline_spark.queries_analytics import q_retention_cohorts
    from recsys_pipeline_spark.streaming import curation_stream as cs

    sf = "/root/testdata/sf0.001"
    ev = read_table(spark, sf, "events")
    t_med = ev.agg(
        F.expr("percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.5)")
    ).first()[0]
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    late_half = ev.filter(ts_us > t_med)   # arrives FIRST
    early_half = ev.filter(ts_us <= t_med)  # arrives SECOND (out of order)
    src = str(tmp_path / "rc_src")
    late_half.coalesce(1).write.parquet(src)
    time.sleep(1.5)
    early_half.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "rc_out")
    pairs = str(tmp_path / "rc_pairs")
    cs.retention_cohorts_stream(stream, out, pairs)

    table = spark.read.parquet(out)
    epochs = sorted(r["_epoch"] for r in table.select("_epoch").distinct().collect())
    assert len(epochs) == 2

    def matrix(df):
        return {
            (int(r["cohort_week"]), int(r["week_offset"])): (
                int(r["n_users"]),
                int(r["retention_ppm"]),
            )
            for r in df.collect()
        }

    # epoch 0: parity vs the batch query on the late half alone
    prefix_dir = str(tmp_path / "rc_prefix")
    late_half.coalesce(1).write.parquet(f"{prefix_dir}/events.parquet")
    assert matrix(table.filter(F.col("_epoch") == epochs[0])) == matrix(
        q_retention_cohorts(spark, prefix_dir)
    )
    # final epoch: exact parity vs the full corpus DESPITE reversed arrival
    assert matrix(table.filter(F.col("_epoch") == epochs[-1])) == matrix(
        q_retention_cohorts(spark, sf)
    )
    # state is bounded by the matrix support: distinct (user, week) pairs
    n_pairs = spark.read.parquet(pairs).drop("_epoch").count()
    n_distinct = (
        ev.select(
            "user_id",
            F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 604800000000"),
        )
        .distinct()
        .count()
    )
    assert n_pairs == n_distinct  # append-once: no pair stored twice

    # compaction preserves the disjoint pair set exactly
    before = n_pairs
    cs.compact_state(spark, pairs, before_epoch=int(epochs[-1]) + 1)
    assert spark.read.parquet(pairs).drop("_epoch").count() == before


def test_streaming_daily_gapfill_exact_parity_even_out_of_order(spark, tmp_path):
    """The gapfill twin's state merge is an argmax over (ts, event_id) —
    order-free — and emission re-runs the batch operator over merged
    state, so parity is EXACT per epoch even when the second micro-batch
    carries the EARLIER half of the corpus."""
    import time

    from recsys_pipeline_spark.queries_analytics import q_daily_gapfill
    from recsys_pipeline_spark.streaming import curation_stream as cs

    sf = SF
    ev = read_table(spark, sf, "events")
    t_med = ev.agg(
        F.expr("percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.5)")
    ).first()[0]
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    late_half = ev.filter(ts_us > t_med)   # arrives FIRST
    early_half = ev.filter(ts_us <= t_med)  # arrives SECOND (out of order)
    src = str(tmp_path / "gf_src")
    late_half.coalesce(1).write.parquet(src)
    time.sleep(1.5)
    early_half.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "gf_out")
    obs = str(tmp_path / "gf_obs")
    cs.daily_gapfill_stream(stream, out, obs)

    table = spark.read.parquet(out)
    epochs = sorted(r["_epoch"] for r in table.select("_epoch").distinct().collect())
    assert len(epochs) == 2

    def calendar(df):
        return {
            (int(r["user_id"]), int(r["day"])): (r["filled_value"], int(r["is_observed"]))
            for r in df.collect()
        }

    prefix_dir = str(tmp_path / "gf_prefix")
    late_half.coalesce(1).write.parquet(f"{prefix_dir}/events.parquet")
    assert calendar(table.filter(F.col("_epoch") == epochs[0])) == calendar(
        q_daily_gapfill(spark, prefix_dir)
    )
    assert calendar(table.filter(F.col("_epoch") == epochs[-1])) == calendar(
        q_daily_gapfill(spark, sf)
    )
    # state bounds: one row per batch-active (user, day) per epoch, and the
    # merged argmax is compaction-equivalent (set-state relabel is safe)
    state = spark.read.parquet(obs)

    def merged_obs():
        return {
            (int(r["user_id"]), int(r["day"])): r["obs_value"]
            for r in state.drop("_epoch")
            .groupBy("user_id", "day")
            .agg(
                F.max_by(F.col("obs_value"), F.struct("tse", "event_id")).alias(
                    "obs_value"
                )
            )
            .collect()
        }

    before = merged_obs()
    cs.compact_state(spark, obs, before_epoch=max(epochs) + 1)
    state = spark.read.parquet(obs)
    assert merged_obs() == before


def test_streaming_scd2_intervals_prefix_parity_time_ordered(spark, tmp_path):
    """The SCD2 twin (carry class, time-ordered contract): two
    order-contiguous micro-batches split at the time median; every epoch's
    emitted interval table equals batch q_scd2_intervals on the prefix —
    including runs that straddle the epoch boundary (the carry
    pseudo-event keeps their n_events and version numbering exact)."""
    import time

    from recsys_pipeline_spark.queries_analytics import q_scd2_intervals
    from recsys_pipeline_spark.streaming import curation_stream as cs

    sf = SF
    ev = read_table(spark, sf, "events")
    t_med = ev.agg(
        F.expr("percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.5)")
    ).first()[0]
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    early_half = ev.filter(ts_us <= t_med)
    late_half = ev.filter(ts_us > t_med)
    src = str(tmp_path / "sc_src")
    early_half.coalesce(1).write.parquet(src)
    time.sleep(1.5)
    late_half.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "sc_out")
    closed = str(tmp_path / "sc_closed")
    carry = str(tmp_path / "sc_carry")
    cs.scd2_intervals_stream(stream, out, closed, carry)

    table = spark.read.parquet(out)
    epochs = sorted(r["_epoch"] for r in table.select("_epoch").distinct().collect())
    assert len(epochs) == 2

    def intervals(df):
        return {
            (
                int(r["user_id"]),
                int(r["version"]),
                r["event_type"],
                int(r["valid_from_us"]),
                None if r["valid_to_us"] is None else int(r["valid_to_us"]),
                int(r["n_events"]),
            )
            for r in df.collect()
        }

    prefix_dir = str(tmp_path / "sc_prefix")
    early_half.coalesce(1).write.parquet(f"{prefix_dir}/events.parquet")
    assert intervals(table.filter(F.col("_epoch") == epochs[0])) == intervals(
        q_scd2_intervals(spark, prefix_dir)
    )
    assert intervals(table.filter(F.col("_epoch") == epochs[-1])) == intervals(
        q_scd2_intervals(spark, sf)
    )
    # carry state: compact_latest_state on user_id is read-equivalent
    w = Window.partitionBy("user_id").orderBy(
        F.col("closed_cnt").desc(), F.col("tse").desc(), F.col("w").desc()
    )

    def latest_carry():
        return {
            int(r["user_id"]): (r["event_type"], int(r["tse"]), int(r["w"]), int(r["closed_cnt"]))
            for r in spark.read.parquet(carry)
            .drop("_epoch")
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .collect()
        }

    before = latest_carry()
    cs.compact_latest_state(spark, carry, ["user_id"], before_epoch=max(epochs) + 1)
    assert latest_carry() == before


def test_streaming_peak_concurrency_exact_parity_even_out_of_order(spark, tmp_path):
    """The concurrency twin's interval state merges by grouped min/max —
    order-free — and emission re-runs the shared sweep operator, so parity
    is EXACT per epoch even with the corpus halves arriving in reverse
    time order (a late event can only widen its interval, as a batch rerun
    would)."""
    import time

    from recsys_pipeline_spark.queries_analytics import q_peak_concurrency
    from recsys_pipeline_spark.streaming import curation_stream as cs

    sf = SF
    ev = read_table(spark, sf, "events")
    t_med = ev.agg(
        F.expr("percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.5)")
    ).first()[0]
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    late_half = ev.filter(ts_us > t_med)   # arrives FIRST
    early_half = ev.filter(ts_us <= t_med)  # arrives SECOND
    src = str(tmp_path / "pk_src")
    late_half.coalesce(1).write.parquet(src)
    time.sleep(1.5)
    early_half.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "pk_out")
    iv = str(tmp_path / "pk_iv")
    cs.peak_concurrency_stream(stream, out, iv)

    table = spark.read.parquet(out)
    epochs = sorted(r["_epoch"] for r in table.select("_epoch").distinct().collect())
    assert len(epochs) == 2

    def profile(df):
        return {
            int(r["hour"]): (
                int(r["peak_concurrency"]),
                int(r["n_starts"]),
                int(r["n_ends"]),
            )
            for r in df.collect()
        }

    prefix_dir = str(tmp_path / "pk_prefix")
    late_half.coalesce(1).write.parquet(f"{prefix_dir}/events.parquet")
    assert profile(table.filter(F.col("_epoch") == epochs[0])) == profile(
        q_peak_concurrency(spark, prefix_dir)
    )
    assert profile(table.filter(F.col("_epoch") == epochs[-1])) == profile(
        q_peak_concurrency(spark, sf)
    )
    # state: one row per batch-active (user, day) per epoch; min/max merge
    # is relabel-invariant so plain compact_state is read-equivalent
    state = spark.read.parquet(iv)

    def merged_iv():
        return {
            (int(r["user_id"]), int(r["day"])): (int(r["s"]), int(r["e"]))
            for r in state.drop("_epoch")
            .groupBy("user_id", "day")
            .agg(F.min("s").alias("s"), F.max("e").alias("e"))
            .collect()
        }

    before = merged_iv()
    cs.compact_state(spark, iv, before_epoch=max(epochs) + 1)
    state = spark.read.parquet(iv)
    assert merged_iv() == before


def test_streaming_host_triangles_prefix_parity(spark, tmp_path):
    """The graph twin's edge state is an append-once canonical set; each
    epoch re-runs the shared triangle kernel on the merged set, so every
    epoch equals the batch query on the document prefix — including the
    doc-id-interleaved split (edges only ever ADD)."""
    from recsys_pipeline_spark.queries_web import (
        WEB_FANOUT,
        WEB_N_HOSTS,
        q_host_triangles,
    )
    from recsys_pipeline_spark.streaming import curation_stream as cs

    docs = read_table(spark, SF, "documents")
    half0 = docs.filter(F.col("doc_id") % 2 == 0)
    half1 = docs.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "tr_src")
    half0.coalesce(1).write.parquet(src)
    half1.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "tr_out")
    edges = str(tmp_path / "tr_edges")
    cs.host_triangles_stream(stream, out, edges, WEB_N_HOSTS, fanout=WEB_FANOUT)

    table = spark.read.parquet(out)
    epochs = sorted(r["_epoch"] for r in table.select("_epoch").distinct().collect())
    assert len(epochs) == 2

    def counts(df):
        return {int(r["host"]): int(r["n_triangles"]) for r in df.collect()}

    prefix_dir = str(tmp_path / "tr_prefix")
    half0.coalesce(1).write.parquet(f"{prefix_dir}/documents.parquet")
    assert counts(table.filter(F.col("_epoch") == epochs[0])) == counts(
        q_host_triangles(spark, prefix_dir)
    )
    full_dir = str(tmp_path / "tr_full")
    docs.coalesce(1).write.parquet(f"{full_dir}/documents.parquet")
    assert counts(table.filter(F.col("_epoch") == epochs[-1])) == counts(
        q_host_triangles(spark, full_dir)
    )
    # edge state: one row per distinct canonical edge, compaction-safe
    e = spark.read.parquet(edges)
    assert e.drop("_epoch").count() == e.drop("_epoch").distinct().count()
    from recsys_pipeline_spark.operators import graph as G

    before = counts(G.triangle_counts(e.drop("_epoch"), src="u", dst="v"))
    cs.compact_state(spark, edges, before_epoch=max(epochs) + 1)
    e2 = spark.read.parquet(edges)
    after = counts(G.triangle_counts(e2.drop("_epoch"), src="u", dst="v"))
    assert after == before


def test_streaming_rolling_anomaly_epochs_union_to_exact_batch(spark, tmp_path):
    """The anomaly twin's window excludes the current day, so flags depend
    only on strictly earlier days — each epoch's per-event rows are FINAL,
    and the union of all epochs equals the batch query verbatim, even with
    the split falling mid-day (time-ordered arrival is the one contract)."""
    import time

    from recsys_pipeline_spark.queries_analytics import q_rolling_anomaly
    from recsys_pipeline_spark.streaming import curation_stream as cs

    sf = SF
    ev = read_table(spark, sf, "events")
    t_med = ev.agg(
        F.expr("percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.5)")
    ).first()[0]
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    early = ev.filter(ts_us <= t_med)
    late = ev.filter(ts_us > t_med)
    src = str(tmp_path / "ra_src")
    early.coalesce(1).write.parquet(src)
    time.sleep(1.5)
    late.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "ra_out")
    stats = str(tmp_path / "ra_stats")
    cs.rolling_anomaly_stream(stream, out, stats)

    table = spark.read.parquet(out)
    epochs = sorted(r["_epoch"] for r in table.select("_epoch").distinct().collect())
    assert len(epochs) == 2

    def rows(df):
        return {
            int(r["event_id"]): (
                int(r["day"]), int(r["v_c"]), int(r["n_win"]), int(r["is_anomaly"])
            )
            for r in df.collect()
        }

    got = rows(table)
    want = rows(q_rolling_anomaly(spark, sf))
    assert got == want  # exact union equality, not just prefix parity
    assert any(v[3] == 1 for v in want.values())  # the corpus does fire flags
    # state is sum-mergeable counters: compact_state is read-equivalent
    st = spark.read.parquet(stats)

    def merged():
        return {
            (int(r["user_id"]), int(r["day"])): (int(r["n"]), int(r["s"]), int(r["q"]))
            for r in st.drop("_epoch")
            .groupBy("user_id", "day")
            .agg(F.sum("n").alias("n"), F.sum("s").alias("s"), F.sum("q").alias("q"))
            .collect()
        }

    before = merged()
    cs.compact_state(spark, stats, before_epoch=max(epochs) + 1)
    st = spark.read.parquet(stats)
    assert merged() == before


def test_streaming_scd2_dim_join_exact_union_parity(spark, tmp_path):
    """The dim-join twin (carry class, inclusive-boundary exactness): two
    order-contiguous micro-batches cut at the time median (a strict ts
    boundary, so equal-timestamp events never straddle). Every epoch emits
    labels for ITS purchase facts only, and the union of the two epochs
    equals batch q_scd2_dim_join on the full table EXACTLY — a fact's
    version is fixed by state events at or before its timestamp, so a
    label never changes after emission. The first epoch additionally
    equals the batch query on the prefix verbatim."""
    import time

    from recsys_pipeline_spark.queries_analytics import q_scd2_dim_join
    from recsys_pipeline_spark.streaming import curation_stream as cs

    sf = SF
    ev = read_table(spark, sf, "events")
    t_med = ev.agg(
        F.expr("percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.5)")
    ).first()[0]
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    early = ev.filter(ts_us <= t_med)
    late = ev.filter(ts_us > t_med)
    src = str(tmp_path / "sdj_src")
    early.coalesce(1).write.parquet(src)
    time.sleep(1.5)
    late.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "sdj_out")
    closed = str(tmp_path / "sdj_closed")
    carry = str(tmp_path / "sdj_carry")
    cs.scd2_dim_join_stream(stream, out, closed, carry)

    table = spark.read.parquet(out)
    epochs = sorted(r["_epoch"] for r in table.select("_epoch").distinct().collect())
    assert len(epochs) == 2

    def rows(df):
        return {
            int(r["event_id"]): (
                int(r["user_id"]), int(r["tse"]), int(r["version"]), r["state_type"]
            )
            for r in df.collect()
        }

    got = rows(table)
    want = rows(q_scd2_dim_join(spark, sf))
    assert got == want  # exact union equality, not just prefix parity
    assert want, "corpus must produce labeled purchases"
    prefix_dir = str(tmp_path / "sdj_prefix")
    early.coalesce(1).write.parquet(f"{prefix_dir}/events.parquet")
    assert rows(table.filter(F.col("_epoch") == epochs[0])) == rows(
        q_scd2_dim_join(spark, prefix_dir)
    )


def test_streaming_exact_percentiles_prefix_parity_any_order(spark, tmp_path):
    """The exact-quantile twin is ORDER-FREE: per-value count deltas are
    sum-mergeable, so even REVERSED arrival folds to the same histogram
    and every epoch's 3-row report equals batch q_exact_percentiles on
    the set of events seen so far (prefix in delivery order, not time
    order)."""
    import time

    from recsys_pipeline_spark.queries_analytics import q_exact_percentiles
    from recsys_pipeline_spark.streaming import curation_stream as cs

    sf = SF
    ev = read_table(spark, sf, "events")
    t_med = ev.agg(
        F.expr("percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.5)")
    ).first()[0]
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    early = ev.filter(ts_us <= t_med)
    late = ev.filter(ts_us > t_med)
    src = str(tmp_path / "ep_src")
    late.coalesce(1).write.parquet(src)  # REVERSED: late half arrives first
    time.sleep(1.5)
    early.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "ep_out")
    counts = str(tmp_path / "ep_counts")
    cs.exact_percentiles_stream(stream, out, counts)

    table = spark.read.parquet(out)
    epochs = sorted(r["_epoch"] for r in table.select("_epoch").distinct().collect())
    assert len(epochs) == 2

    def rows(df):
        return {
            int(r["pct"]): (int(r["k"]), int(r["value_cents"]), int(r["n"]))
            for r in df.collect()
        }

    prefix_dir = str(tmp_path / "ep_prefix")
    late.coalesce(1).write.parquet(f"{prefix_dir}/events.parquet")
    assert rows(table.filter(F.col("_epoch") == epochs[0])) == rows(
        q_exact_percentiles(spark, prefix_dir)
    )
    assert rows(table.filter(F.col("_epoch") == epochs[-1])) == rows(
        q_exact_percentiles(spark, sf)
    )


def test_streaming_cusum_drift_prefix_parity_any_order(spark, tmp_path):
    """The CUSUM twin is ORDER-FREE: per-(user, day) spend deltas are
    sum-mergeable, so even REVERSED arrival folds to the same daily
    series, and every epoch's full report equals batch q_cusum_drift on
    the set of events seen so far (CUSUM re-states the whole prefix by
    construction — a new day shifts every increment's mean)."""
    import time

    from recsys_pipeline_spark.queries_analytics import q_cusum_drift
    from recsys_pipeline_spark.streaming import curation_stream as cs

    sf = SF
    ev = read_table(spark, sf, "events")
    t_med = ev.agg(
        F.expr("percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.5)")
    ).first()[0]
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    early = ev.filter(ts_us <= t_med)
    late = ev.filter(ts_us > t_med)
    src = str(tmp_path / "cu_src")
    late.coalesce(1).write.parquet(src)  # REVERSED: late half arrives first
    time.sleep(1.5)
    early.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "cu_out")
    daily = str(tmp_path / "cu_daily")
    cs.cusum_drift_stream(stream, out, daily)

    table = spark.read.parquet(out)
    epochs = sorted(r["_epoch"] for r in table.select("_epoch").distinct().collect())
    assert len(epochs) == 2

    def rows(df):
        return {
            (int(r["user_id"]), int(r["day"])): (int(r["cusum_nx"]), int(r["is_drift"]))
            for r in df.collect()
        }

    prefix_dir = str(tmp_path / "cu_prefix")
    late.coalesce(1).write.parquet(f"{prefix_dir}/events.parquet")
    assert rows(table.filter(F.col("_epoch") == epochs[0])) == rows(
        q_cusum_drift(spark, prefix_dir)
    )
    assert rows(table.filter(F.col("_epoch") == epochs[-1])) == rows(
        q_cusum_drift(spark, sf)
    )
    # state is sum-mergeable: compaction must not change what a future
    # epoch reads (the horizon clamps to the newest epoch, which stays a
    # live delta — it may be an uncommitted first attempt)
    def merged_daily():
        return {
            (int(r["user_id"]), int(r["day"])): int(r["spend_c"])
            for r in spark.read.parquet(daily)
            .groupBy("user_id", "day")
            .agg(F.sum("spend_c").alias("spend_c"))
            .collect()
        }

    before = merged_daily()
    cs.compact_state(spark, daily, before_epoch=epochs[-1] + 1)
    assert merged_daily() == before
    assert set(
        r["_epoch"]
        for r in spark.read.parquet(daily).select("_epoch").distinct().collect()
    ) == {-1, epochs[-1]}


def test_streaming_rolling_active_users_prefix_parity_any_order(spark, tmp_path):
    """The DAU/WAU twin is ORDER-FREE: the distinct (user, day) activity
    set is union-mergeable, so even REVERSED arrival folds to the same
    frame and every epoch's full report equals batch
    q_rolling_active_users on the events seen so far."""
    import time

    from recsys_pipeline_spark.queries_analytics import q_rolling_active_users
    from recsys_pipeline_spark.streaming import curation_stream as cs

    sf = SF
    ev = read_table(spark, sf, "events")
    t_med = ev.agg(
        F.expr("percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.5)")
    ).first()[0]
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    early = ev.filter(ts_us <= t_med)
    late = ev.filter(ts_us > t_med)
    src = str(tmp_path / "rau_src")
    late.coalesce(1).write.parquet(src)  # REVERSED: late half arrives first
    time.sleep(1.5)
    early.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "rau_out")
    pairs = str(tmp_path / "rau_pairs")
    cs.rolling_active_users_stream(stream, out, pairs)

    table = spark.read.parquet(out)
    epochs = sorted(r["_epoch"] for r in table.select("_epoch").distinct().collect())
    assert len(epochs) == 2

    def rows(df):
        return {
            int(r["day"]): (int(r["dau"]), int(r["wau"]), int(r["stickiness_ppm"]))
            for r in df.collect()
        }

    prefix_dir = str(tmp_path / "rau_prefix")
    late.coalesce(1).write.parquet(f"{prefix_dir}/events.parquet")
    assert rows(table.filter(F.col("_epoch") == epochs[0])) == rows(
        q_rolling_active_users(spark, prefix_dir)
    )
    assert rows(table.filter(F.col("_epoch") == epochs[-1])) == rows(
        q_rolling_active_users(spark, sf)
    )
    # append-once state: re-arriving (user, day) pairs add no rows
    n_state = spark.read.parquet(pairs).count()
    n_true = (
        read_table(spark, sf, "events")
        .select("user_id", F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000"))
        .distinct()
        .count()
    )
    assert n_state == n_true


def test_streaming_heavy_hitter_grams_prefix_parity_any_order(spark, tmp_path):
    """The heavy-hitters twin is ORDER-FREE (sum-mergeable gram counts) and
    needs no sketch online: each micro-batch is bounded, so the state is
    the exact histogram and every epoch's report equals batch
    q_heavy_hitter_grams on the documents seen so far."""
    from recsys_pipeline_spark.queries_curation import q_heavy_hitter_grams
    from recsys_pipeline_spark.streaming import curation_stream as cs

    d = read_table(spark, SF, "documents")
    half0 = d.filter(F.col("doc_id") >= 250)  # REVERSED halves
    half1 = d.filter(F.col("doc_id") < 250)
    src = str(tmp_path / "hh_src")
    half0.coalesce(1).write.parquet(src)
    half1.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(d.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "hh_out")
    counts = str(tmp_path / "hh_counts")
    cs.heavy_hitter_grams_stream(stream, out, counts)

    table = spark.read.parquet(out)
    epochs = sorted(r["_epoch"] for r in table.select("_epoch").distinct().collect())
    assert len(epochs) == 2

    def rows(df):
        return {
            r["gram"]: (int(r["cnt"]), int(r["share_ppm"])) for r in df.collect()
        }

    prefix_dir = str(tmp_path / "hh_prefix")
    half0.coalesce(1).write.parquet(f"{prefix_dir}/documents.parquet")
    assert rows(table.filter(F.col("_epoch") == epochs[0])) == rows(
        q_heavy_hitter_grams(spark, prefix_dir)
    )
    assert rows(table.filter(F.col("_epoch") == epochs[-1])) == rows(
        q_heavy_hitter_grams(spark, SF)
    )


def test_streaming_item_cooccur_lift_prefix_parity_any_order(spark, tmp_path):
    """The lift twin is ORDER-FREE: the distinct (user, item) basket set
    is union-mergeable, so even REVERSED arrival folds to the same frame
    and every epoch's full report equals batch q_item_cooccur_lift on the
    events seen so far (N, n_a, n_b and every pair count all re-state)."""
    import time

    from recsys_pipeline_spark.queries_ext import q_item_cooccur_lift
    from recsys_pipeline_spark.streaming import curation_stream as cs

    sf = SF
    ev = read_table(spark, sf, "events")
    t_med = ev.agg(
        F.expr("percentile(unix_micros(CAST(ts AS TIMESTAMP)), 0.5)")
    ).first()[0]
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    early = ev.filter(ts_us <= t_med)
    late = ev.filter(ts_us > t_med)
    src = str(tmp_path / "il_src")
    late.coalesce(1).write.parquet(src)  # REVERSED: late half arrives first
    time.sleep(1.5)
    early.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "il_out")
    pairs = str(tmp_path / "il_pairs")
    cs.item_cooccur_lift_stream(stream, out, pairs)

    table = spark.read.parquet(out)
    epochs = sorted(r["_epoch"] for r in table.select("_epoch").distinct().collect())
    assert len(epochs) == 2

    def rows(df):
        return {
            (int(r["item_a"]), int(r["item_b"])): (
                int(r["n_ab"]), int(r["n_a"]), int(r["n_b"]), int(r["lift_ppm"])
            )
            for r in df.collect()
        }

    prefix_dir = str(tmp_path / "il_prefix")
    late.coalesce(1).write.parquet(f"{prefix_dir}/events.parquet")
    assert rows(table.filter(F.col("_epoch") == epochs[0])) == rows(
        q_item_cooccur_lift(spark, prefix_dir)
    )
    assert rows(table.filter(F.col("_epoch") == epochs[-1])) == rows(
        q_item_cooccur_lift(spark, sf)
    )


def test_streaming_segment_quantiles_prefix_parity_any_order(spark, tmp_path):
    """The grouped-quantile twin is ORDER-FREE: per-(segment, value) count
    deltas are sum-mergeable, so even REVERSED arrival folds to the same
    histogram and every epoch's report equals batch q_segment_quantiles on
    the customers seen so far."""
    from recsys_pipeline_spark.queries_analytics import q_segment_quantiles
    from recsys_pipeline_spark.streaming import curation_stream as cs

    cust = read_table(spark, SF, "customer")
    half0 = cust.filter(F.col("c_custkey") % 2 == 0)  # REVERSED halves
    half1 = cust.filter(F.col("c_custkey") % 2 == 1)
    src = str(tmp_path / "sq_src")
    half0.coalesce(1).write.parquet(src)
    half1.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(cust.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "sq_out")
    counts = str(tmp_path / "sq_counts")
    cs.segment_quantiles_stream(stream, out, counts)

    table = spark.read.parquet(out)
    epochs = sorted(r["_epoch"] for r in table.select("_epoch").distinct().collect())
    assert len(epochs) == 2

    def rows(df):
        return {
            (r["segment"], int(r["pct"])): (int(r["n"]), int(r["k"]), int(r["bal_c"]))
            for r in df.collect()
        }

    prefix_dir = str(tmp_path / "sq_prefix")
    half0.coalesce(1).write.parquet(f"{prefix_dir}/customer.parquet")
    assert rows(table.filter(F.col("_epoch") == epochs[0])) == rows(
        q_segment_quantiles(spark, prefix_dir)
    )
    assert rows(table.filter(F.col("_epoch") == epochs[-1])) == rows(
        q_segment_quantiles(spark, SF)
    )


def test_streaming_segment_quantiles_cont_prefix_parity_any_order(spark, tmp_path):
    """Twin 36 (interpolated grouped quantiles) shares segment_quantiles'
    order-free histogram state; only the selection kernel differs. Reversed
    arrival must still reproduce batch q_segment_quantiles_cont per epoch."""
    from recsys_pipeline_spark.queries_analytics import q_segment_quantiles_cont
    from recsys_pipeline_spark.streaming import curation_stream as cs

    cust = read_table(spark, SF, "customer")
    half0 = cust.filter(F.col("c_custkey") % 2 == 0)  # REVERSED halves
    half1 = cust.filter(F.col("c_custkey") % 2 == 1)
    src = str(tmp_path / "sqc_src")
    half0.coalesce(1).write.parquet(src)
    half1.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(cust.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "sqc_out")
    counts = str(tmp_path / "sqc_counts")
    cs.segment_quantiles_cont_stream(stream, out, counts)

    table = spark.read.parquet(out)
    epochs = sorted(r["_epoch"] for r in table.select("_epoch").distinct().collect())
    assert len(epochs) == 2

    def rows(df):
        return {
            (r["segment"], int(r["pct"])): (int(r["n"]), int(r["q_x100"]))
            for r in df.collect()
        }

    prefix_dir = str(tmp_path / "sqc_prefix")
    half0.coalesce(1).write.parquet(f"{prefix_dir}/customer.parquet")
    assert rows(table.filter(F.col("_epoch") == epochs[0])) == rows(
        q_segment_quantiles_cont(spark, prefix_dir)
    )
    assert rows(table.filter(F.col("_epoch") == epochs[-1])) == rows(
        q_segment_quantiles_cont(spark, SF)
    )
