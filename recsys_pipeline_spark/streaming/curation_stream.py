"""Streaming twins of the curation operators (foreachBatch + state tables).

Batch curation decides from the WHOLE corpus; a stream can only know its
prefix. Two of the operators need per-key state to run online, and both get
it the way the reference's online stages do (state tables maintained by the
sync path, sync.py): a foreachBatch step that reads the accumulated state,
decides for the micro-batch, and appends the delta — idempotent per epoch,
swappable for Redis/Delta in production.

Semantics vs the batch twins (documented, asserted in tests):

* ``cap_per_group_stream`` admits the FIRST ``k`` rows per group in arrival
  order (admission control — the online meaning of a cap). The batch
  ``curation.cap_per_group`` picks a hash-uniform k instead: uniformity
  needs the whole group, which a stream never has. On a single micro-batch
  the stream equals the batch row_number-by-arrival selection exactly.
* ``negative_sample_stream`` anti-joins each batch's hash-drawn candidates
  against every interaction seen SO FAR (prefix-seen, the serving-time
  truth — online/main/s1_server.py:24-33 filters against the user state
  table the same way). Full-seen ⊇ prefix-seen, so the streaming output is
  a superset of the batch operator's; on a single micro-batch they are
  identical.
* ``decontaminate_stream`` flags each batch's non-eval documents against
  the eval n-grams accumulated SO FAR (prefix-eval). The batch operator
  sees the full eval set, so streaming per-doc hit counts are <= the batch
  counts and the flagged set is a subset; on a single micro-batch they are
  identical.
* ``boilerplate_stream`` scores each batch's documents against gram
  doc-frequencies over the prefix: every epoch's output equals the batch
  operator on the prefix corpus restricted to that epoch's docs (exact on
  a single micro-batch). No cross-epoch subset relation exists — a df
  threshold moves both ways as the corpus grows.
* ``weighted_sample_stream`` is the distributed weighted reservoir — the
  one twin with an EXACT cross-epoch guarantee: the ES key is a pure row
  function, so top-k(reservoir ∪ batch) == top-k(prefix) and the final
  reservoir equals the batch operator on the whole corpus regardless of
  batching.
* ``incremental_curate_stream`` consumes document UPSERTS: state = each
  doc's latest 32-byte content fingerprint; only fingerprint-changed/new
  docs run the gate+chunk hygiene stage (the batch composite per epoch).

State is bounded and mergeable everywhere (round-10 migration): counter
deltas (tokenize/LM/boilerplate: one grouped SUM to merge), append-once
set deltas (decontaminate eval grams, boilerplate roster: plain union, no
distinct), latest-per-key rows (incremental-curate digests), or full ≤k
snapshots (weighted reservoir) — never per-epoch dumps of raw corpus rows.

Scale: state lives in partitioned parquet keyed by the join key — the
per-batch work is one broadcast-or-shuffle join against it; nothing
collects to the driver. The availableNow harness (run via
pipeline.foreach_batch_sink) is the test rig; a production run needs two
things the rig deliberately omits:

* **State compaction** (``compact_state`` below). ``_read_state`` unions
  every prior ``_epoch=`` partition, so per-batch read cost grows
  linearly with stream age (quadratic cumulative I/O over the stream's
  life). Periodic compaction folds the accumulated partitions into the
  ``_epoch=-1`` base partition (base + recent deltas, the standard
  state-table layout) so each batch reads O(state), not O(epochs); reads
  are equivalence-tested before/after. The epoch-partitioned layout is
  exactly what makes the rewrite safe: compaction touches only partitions
  strictly below the live epoch horizon.
* **A real ``checkpointLocation``.** The rig relies on availableNow
  epoch ids restarting from 0 so ``_write_epoch``'s dynamic partition
  overwrite is replay-idempotent; a long-lived query must set
  ``checkpointLocation`` on ``writeStream`` so epoch ids are durable
  across restarts and a replayed epoch overwrites its own partition
  rather than a fresh id appending a duplicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from recsys_pipeline_spark.operators.curation import hash_bucket


def _write_epoch(df: DataFrame, path: str, epoch_id: int) -> None:
    """Epoch-idempotent sink: rows land in an ``_epoch=<id>`` partition via
    DYNAMIC partition overwrite, so a foreachBatch replay (at-least-once
    delivery) overwrites its own epoch instead of appending duplicates."""
    (
        df.withColumn("_epoch", F.lit(int(epoch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_epoch")
        .parquet(path)
    )


def _read_parquet_or_empty(spark, path: str, like: DataFrame) -> DataFrame | None:
    """The shared first-epoch contract: returns the parquet table, or None
    when (and ONLY when) the path does not exist yet / holds no readable
    files. A corrupt or unreadable state table raises — it must not
    silently become an empty seen-set."""
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as ex:
        msg = str(ex)
        if "PATH_NOT_FOUND" in msg or "UNABLE_TO_INFER_SCHEMA" in msg:
            return None
        raise


def _read_state(
    spark, path: str, like: DataFrame, before_epoch: int
) -> DataFrame:
    """Accumulated state from every epoch BEFORE the current one (a replayed
    epoch must not see its own first attempt), or an empty frame with
    ``like``'s schema when the table does not exist yet."""
    df = _read_parquet_or_empty(spark, path, like)
    if df is None:
        return spark.createDataFrame([], like.schema)
    return df.filter(F.col("_epoch") < before_epoch).drop("_epoch")


BASE_EPOCH = -1  # compacted-state partition: reads as "before every live epoch"


def compact_state(spark, path: str, before_epoch: int) -> None:
    """State-table compaction — the production requirement the module
    docstring names, executable: fold every ``_epoch < before_epoch``
    partition into the single base partition ``_epoch=-1`` and leave newer
    deltas untouched. ``_read_state`` filters ``_epoch < current``, and
    -1 sorts before every live epoch id, so reads are EQUIVALENT before and
    after compaction (asserted in tests) while per-batch I/O drops from
    O(epochs) partitions to O(1) base + recent deltas.

    Run while the stream is stopped (the standard compaction window). The
    rewrite goes to a temp directory and swaps in — the availableNow-rig
    analog of a transactional commit; a production deployment uses a table
    format with atomic replace (Delta/Iceberg) for the same move.

    The horizon is CLAMPED to the newest epoch present: the newest delta
    may be an uncommitted first attempt (stream crashed after the state
    write, before the checkpoint commit), and folding it into the base
    would both let its replay see its own rows through ``_epoch=-1 <
    epoch`` and leave them duplicated when the replay re-writes its delta
    (review finding, round 9). Everything strictly below the newest epoch
    is by definition committed — a later epoch ran after it.
    """
    import os
    import shutil

    df = spark.read.parquet(path)
    newest = df.agg(F.max("_epoch").alias("m")).collect()[0]["m"]
    horizon = min(before_epoch, newest if newest is not None else before_epoch)
    compacted = df.withColumn(
        "_epoch",
        F.when(
            (F.col("_epoch") < horizon) & (F.col("_epoch") != BASE_EPOCH),
            F.lit(BASE_EPOCH),
        ).otherwise(F.col("_epoch")),
    )
    tmp = path.rstrip("/") + ".compact_tmp"
    compacted.write.mode("overwrite").partitionBy("_epoch").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)


def compact_latest_state(spark, path: str, key_cols: list[str], before_epoch: int) -> None:
    """Compaction for LAST-WRITE-WINS state tables (e.g. the incremental-
    curation digest table, where each key's newest row is the truth).
    ``compact_state`` is only safe for SET/COUNTER state: it relabels every
    old partition to ``_epoch=-1``, so two generations of the same key would
    land in the base with their order erased. This variant folds epochs
    below the horizon into the base keeping ONLY each key's newest row
    (ties impossible: a key writes at most once per epoch), so the reader's
    max-epoch-per-key rule selects identically before and after
    (equivalence asserted in tests). Same clamp rule as compact_state: the
    newest epoch present may be an uncommitted first attempt and is never
    folded.
    """
    import os
    import shutil

    df = spark.read.parquet(path)
    newest = df.agg(F.max("_epoch").alias("m")).collect()[0]["m"]
    horizon = min(before_epoch, newest if newest is not None else before_epoch)
    old = df.filter(F.col("_epoch") < horizon)
    w = Window.partitionBy(*key_cols).orderBy(F.col("_epoch").desc())
    base = (
        old.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
        .withColumn("_epoch", F.lit(BASE_EPOCH))
    )
    keep = df.filter(F.col("_epoch") >= horizon)
    tmp = path.rstrip("/") + ".compact_tmp"
    base.unionByName(keep).write.mode("overwrite").partitionBy("_epoch").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)


def incremental_curate_stream(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    content_cols: list[str],
    out_dir: str,
    fp_dir: str,
    *,
    min_tokens: int,
    max_tokens: int,
    min_mtl_x100: int,
    max_mtl_x100: int,
    dup3_ppm_max: int,
    chunk_tokens: int,
    chunk_overlap: int,
) -> None:
    """The daily-crawl consumer of the incremental-curation composite: the
    stream delivers document UPSERTS; state = each document's latest content
    fingerprint (snapshot_diff's md5-of-per-column-md5s discipline, 32 bytes
    per key). Per micro-batch, every document is diffed against its stored
    fingerprint — ``added`` (never seen), ``changed`` (fingerprint differs)
    or unchanged (dropped, no output) — and ONLY the added/changed docs run
    the hygiene stage (quality gate + context-window chunking), emitting the
    batch composite's per-delta report (id, status, keep, n_chunks).

    Parity (asserted in tests): an epoch's output equals the batch operators
    composed on (prefix-before, prefix-after-upserting-this-batch),
    restricted to the batch's documents — ``removed`` cannot occur in an
    upsert stream (no tombstones), which is the one status the batch
    snapshot_diff can emit that this twin cannot. Gate/chunk expressions are
    the batch operators' own, so verdicts cannot diverge.

    State discipline: the fingerprint table stores per-epoch DELTAS (only
    added/changed keys write), read back as latest-row-per-key below the
    current epoch — churn-sized writes, and the read moves keys + 32-byte
    digests, never payloads. Compaction = ``compact_latest_state`` (NOT
    ``compact_state``: last-write-wins state must keep per-key order, see
    its docstring). Batches are assumed key-unique (one upsert per doc per
    micro-batch — the CDC contract).
    """
    from recsys_pipeline_spark.operators.curation import chunk_documents, quality_gate

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        parts = [
            F.when(F.col(c).isNull(), F.lit("-")).otherwise(F.md5(F.col(c).cast("string")))
            for c in content_cols
        ]
        fps = batch.select(F.col(id_col), F.md5(F.concat(*parts)).alias("_fp"))
        table = _read_parquet_or_empty(spark, fp_dir, fps)
        if table is None:
            prior = spark.createDataFrame([], fps.schema)
        else:
            hist = table.filter(F.col("_epoch") < epoch_id)
            w = Window.partitionBy(id_col).orderBy(F.col("_epoch").desc())
            prior = (
                hist.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") == 1)
                .select(id_col, "_fp")
            )
        status = (
            fps.join(prior.withColumnRenamed("_fp", "_fp_prior"), id_col, "left")
            .select(
                id_col,
                "_fp",
                F.when(F.col("_fp_prior").isNull(), F.lit("added"))
                .when(F.col("_fp") != F.col("_fp_prior"), F.lit("changed"))
                .otherwise(F.lit("unchanged"))
                .alias("status"),
            )
        )
        delta_keys = status.filter(F.col("status") != "unchanged")
        delta = batch.join(delta_keys.select(id_col, "status"), id_col).localCheckpoint(
            eager=False
        )  # feeds gate + chunk + report
        gate = quality_gate(
            delta,
            id_col,
            text_col,
            min_tokens=min_tokens,
            max_tokens=max_tokens,
            min_mtl_x100=min_mtl_x100,
            max_mtl_x100=max_mtl_x100,
            dup3_ppm_max=dup3_ppm_max,
        ).select(id_col, "keep")
        kept = delta.join(gate.filter(F.col("keep") == 1), id_col).select(id_col, text_col)
        n_chunks = (
            chunk_documents(kept, id_col, text_col, chunk_tokens, chunk_overlap)
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_chunks"))
        )
        report = (
            delta.select(id_col, "status")
            .join(gate, id_col)
            .join(n_chunks, id_col, "left")
            .select(
                id_col,
                "status",
                "keep",
                F.coalesce(F.col("n_chunks"), F.lit(0)).alias("n_chunks"),
            )
        )
        _write_epoch(report, out_dir, epoch_id)
        _write_epoch(delta_keys.select(id_col, "_fp"), fp_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def cap_per_group_stream(
    stream: DataFrame,
    group_col: str,
    order_cols: list[str],
    k: int,
    out_dir: str,
) -> None:
    """Admit at most ``k`` rows per group across the whole stream, first-come
    in ``order_cols`` order within each micro-batch. The admitted output IS
    the state: prior per-group admission counts are re-derived from the sink,
    so replaying an epoch cannot double-admit past the cap."""

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        prior = (
            _read_state(spark, out_dir, batch, epoch_id)
            .groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("_prior"))
        )
        w = Window.partitionBy(group_col).orderBy(*order_cols)
        admitted = (
            batch.withColumn("_rk", F.row_number().over(w))
            .join(prior, group_col, "left")
            .filter(F.coalesce(F.col("_prior"), F.lit(0)) + F.col("_rk") <= k)
            .drop("_rk", "_prior")
        )
        _write_epoch(admitted, out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def negative_sample_stream(
    stream: DataFrame,
    user_col: str,
    item_col: str,
    event_id_col: str,
    n_items: int,
    out_dir: str,
    seen_dir: str,
    salt: str = "neg",
) -> None:
    """One hash-drawn negative per arriving interaction, anti-joined against
    the seen-set STATE TABLE (all positives up to and including this batch).
    The draw is the same salted-hash bucket as the batch operator, so a
    given event always proposes the same item no matter how the stream is
    micro-batched — only the seen horizon differs."""

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        batch_seen = batch.select(
            F.col(user_col).alias("_u"), F.col(item_col).alias("_i")
        ).distinct()
        seen = (
            _read_state(spark, seen_dir, batch_seen, epoch_id)
            .union(batch_seen)
            .distinct()
            .localCheckpoint(eager=False)
        )
        cand = batch.select(
            F.col(event_id_col),
            F.col(user_col),
            hash_bucket(F.col(event_id_col), salt, n_items).alias(item_col),
        )
        neg = cand.join(
            seen,
            (cand[user_col] == seen["_u"]) & (cand[item_col] == seen["_i"]),
            "left_anti",
        )
        _write_epoch(neg, out_dir, epoch_id)
        _write_epoch(batch_seen, seen_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def weighted_sample_stream(
    stream: DataFrame,
    group_col: str,
    key_col: str,
    weight_col: str,
    k: int,
    out_dir: str,
    salt: str = "wsamp",
) -> None:
    """Distributed weighted reservoir sampling — the streaming form of
    ``curation.weighted_sample_per_group``, and the one curation twin with
    an EXACT cross-epoch guarantee: the Efraimidis-Spirakis key is a pure
    per-row function (hash-derived u, so no RNG state), which makes top-k
    selection associative — top-k(reservoir ∪ batch) == top-k(prefix) —
    so after the last micro-batch the reservoir EQUALS the batch operator
    on the full corpus, however the stream was batched (asserted in
    tests). Each epoch writes the complete reservoir snapshot (≤ k rows
    per group — tiny); the previous snapshot is the only state read, so
    per-batch I/O is O(k·groups), not O(stream age), and no compaction is
    ever needed.
    """
    from recsys_pipeline_spark.operators.curation import weighted_sample_per_group

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        cand = batch.select(group_col, key_col, weight_col)
        # live state = the LATEST snapshot strictly before this epoch (older
        # epochs are replay history kept for the idempotent-overwrite
        # contract; unioning them would duplicate surviving keys and let
        # row_number burn ranks). The max-epoch lookup is one scalar row —
        # a driver-side metadata decision, not data movement.
        table = _read_parquet_or_empty(spark, out_dir, cand)
        prev = spark.createDataFrame([], cand.schema)
        if table is not None:
            hist = table.filter(F.col("_epoch") < epoch_id)
            latest = hist.select(F.max("_epoch").alias("m")).collect()[0]["m"]
            if latest is not None:
                prev = hist.filter(F.col("_epoch") == latest).drop("_epoch")
        reservoir = weighted_sample_per_group(
            prev.unionByName(cand), group_col, key_col, weight_col, k, salt=salt
        )
        _write_epoch(reservoir, out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def boilerplate_stream(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    n: int,
    share_pct: int,
    out_dir: str,
    gram_dir: str,
    docs_dir: str,
) -> None:
    """Boilerplate detection online: each micro-batch's documents are flagged
    against the gram doc-frequencies accumulated over the PREFIX (state =
    the distinct (id, group, gram) triples plus the (id, group) roster —
    the roster is separate because gramless docs still count toward a
    group's size). An epoch's output equals the batch operator run on the
    prefix corpus, restricted to that epoch's documents (asserted in
    tests); on a single micro-batch that IS the batch result. Unlike the
    decontaminate twin there is no subset guarantee across epochs — a
    gram's df ratio moves both ways as the corpus grows, which is the
    honest online semantics of a threshold on corpus statistics.

    State shape (migrated round 10 from raw (id, group, gram) triples —
    the production form this docstring used to only name): per-epoch
    (group, gram, _df) DELTA COUNTERS, sum-mergeable and bounded by the
    distinct-gram vocabulary instead of corpus size, plus an append-once
    (id, group) roster (set-deltas: a doc id writes in exactly one epoch).
    Only docs NOT already in the roster contribute counters —
    first-ingest-wins, which reproduces the old triple-distinct exactly for
    identical re-crawls (the pinned regression) and assigns a CHANGED
    re-crawl's statistics to its first version; content-changing re-crawls
    belong upstream in the incremental_curate twin's fingerprint diff.
    Merging state is one grouped SUM; nothing re-reads raw documents.
    """
    from recsys_pipeline_spark.operators.curation import word_gram_rows

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        batch_triples = (
            word_gram_rows(batch, id_col, text_col, n, group_col=group_col)
            .distinct()
            .localCheckpoint(eager=False)  # feeds the counter delta + both joins
        )
        batch_docs = batch.select(id_col, group_col).distinct()
        roster_prior = _read_state(spark, docs_dir, batch_docs, epoch_id)
        # first-ingest-wins: a re-ingested id (re-crawled page) must not
        # double-count its grams' doc-frequency (review finding, round 9)
        new_docs = batch_docs.join(
            roster_prior.select(id_col), id_col, "left_anti"
        ).localCheckpoint(eager=False)  # feeds the delta filter + roster append
        delta_counts = (
            batch_triples.join(new_docs.select(id_col), id_col)
            .groupBy(group_col, "gram")
            .agg(F.count(F.lit(1)).alias("_df"))
        )
        merged_counts = (
            _read_state(spark, gram_dir, delta_counts, epoch_id)
            .unionByName(delta_counts)
            .groupBy(group_col, "gram")
            .agg(F.sum("_df").alias("_df"))
        )
        docs_all = roster_prior.union(new_docs)
        group_sizes = docs_all.groupBy(group_col).agg(
            F.count(F.lit(1)).alias("_n_docs")  # roster ids are append-once
        )
        boiler = (
            merged_counts.join(group_sizes, group_col)
            .filter(F.col("_df") * 100 >= F.lit(share_pct) * F.col("_n_docs"))
            .select(group_col, "gram")
        )
        per_doc = batch_triples.groupBy(id_col, group_col).agg(
            F.count(F.lit(1)).alias("n_grams")
        )
        hits = (
            batch_triples.join(boiler, [group_col, "gram"])
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_boiler"))
        )
        flags = per_doc.join(hits, id_col).select(
            id_col, group_col, "n_grams", "n_boiler"
        )
        _write_epoch(flags, out_dir, epoch_id)
        _write_epoch(delta_counts, gram_dir, epoch_id)
        _write_epoch(new_docs, docs_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def decontaminate_stream(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    eval_pct: int,
    n: int,
    out_dir: str,
    gram_dir: str,
    salt: str = "eval",
) -> None:
    """Benchmark decontamination online: hash-designated eval documents feed
    their word n-grams into a state table as they arrive; every non-eval
    document is flagged against the grams accumulated so far (prefix-eval —
    the truth available at ingestion time). Emits (id, n_hits) per flagged
    doc. The gram extraction, eval designation, and hit counting are the
    batch operator's expressions, so one micro-batch == the batch result.

    State shape (migrated round 10 from per-epoch raw gram dumps): each
    eval gram is written in exactly ONE epoch — the epoch that first saw it
    (per-epoch delta = batch grams anti-joined against the accumulated set).
    The union of epoch partitions is therefore duplicate-free by
    construction: state size is the distinct eval-gram vocabulary, not
    O(epochs x grams), merging is a plain union with no distinct, and
    compact_state folds partitions without a dedup pass. Set membership is
    epoch-order-independent, so a replayed epoch re-derives the identical
    delta (it reads only state strictly before itself).
    """
    from recsys_pipeline_spark.operators.curation import word_gram_rows

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        grams = word_gram_rows(batch, id_col, text_col, n).localCheckpoint(
            eager=False
        )  # feeds the eval append AND the flag join
        is_eval = hash_bucket(F.col(id_col), salt) < eval_pct
        batch_eval = grams.filter(is_eval).select("gram").distinct()
        prior = _read_state(spark, gram_dir, batch_eval, epoch_id)
        new_eval = batch_eval.join(prior, "gram", "left_anti")
        eval_grams = prior.union(new_eval)
        flags = (
            grams.filter(~is_eval)
            .join(eval_grams, "gram")
            .groupBy(id_col)
            .agg(F.count_distinct("gram").alias("n_hits"))
        )
        _write_epoch(flags, out_dir, epoch_id)
        _write_epoch(new_eval, gram_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def tokenize_ids_stream(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    vocab_size: int,
    out_dir: str,
    counts_dir: str,
) -> None:
    """Vocab-id encoding online: each micro-batch's documents are encoded
    with the vocabulary of the PREFIX corpus (state = per-epoch (tok, _cnt)
    DELTA counters — sum-mergeable, so the state table is vocabulary-sized
    per epoch, the compact form the boilerplate twin's docstring names as
    the production shape; merging is one grouped SUM, never a re-read of
    raw documents). An epoch's output equals the batch operator run on the
    prefix corpus, restricted to that epoch's documents (asserted in
    tests); on a single micro-batch that IS the batch result. As with any
    threshold on corpus statistics there is no cross-epoch stability
    guarantee: a token can enter or leave the top-k as counts grow — the
    honest online semantics (re-encode on vocab freeze for training).

    The gram/vocab/encode expressions are the batch operator's own
    (token_positions / vocab_topk / encode_token_ids), so the pair cannot
    silently diverge.
    """
    from recsys_pipeline_spark.operators.curation import (
        encode_token_ids,
        token_positions,
        vocab_topk,
    )

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        pos = token_positions(batch, id_col, text_col).localCheckpoint(
            eager=False
        )  # feeds the count delta AND the encode join
        batch_counts = pos.groupBy("tok").agg(F.count(F.lit(1)).alias("_cnt"))
        _write_epoch(batch_counts, counts_dir, epoch_id)
        merged = (
            _read_state(spark, counts_dir, batch_counts, epoch_id)
            .unionByName(batch_counts)
            .groupBy("tok")
            .agg(F.sum("_cnt").alias("_cnt"))
        )
        vocab = vocab_topk(merged, vocab_size)
        _write_epoch(encode_token_ids(pos, vocab, id_col), out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def lm_perplexity_stream(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    ref_filter,
    out_dir: str,
    c2_dir: str,
) -> None:
    """Perplexity scoring online: each micro-batch's non-reference
    documents score against the bigram LM of the reference docs seen over
    the PREFIX (state = per-epoch (prev, cur, _c2) DELTA counters —
    sum-mergeable and vocabulary²-bounded, same compact-counter shape as
    the tokenize twin; merging is one grouped SUM, never a re-read of raw
    documents). An epoch's output equals the batch operator run on the
    prefix corpus, restricted to that epoch's documents (asserted in
    tests); on a single micro-batch that IS the batch result. The pair
    mining and scoring expressions are the batch operator's own
    (bigram_pairs / lm_score_pairs), so the pair cannot diverge. As with
    every threshold-free corpus statistic the score itself drifts as the
    reference grows — the honest online semantics (scores stabilize as the
    LM saturates).
    """
    from recsys_pipeline_spark.operators.curation import bigram_pairs, lm_score_pairs

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        pairs = bigram_pairs(
            batch, id_col, text_col, extra_cols=[ref_filter.alias("_is_ref")]
        ).localCheckpoint(eager=False)  # feeds the C2 delta AND the score side
        batch_c2 = (
            pairs.filter(F.col("_is_ref"))
            .groupBy("prev", "cur")
            .agg(F.count(F.lit(1)).alias("_c2"))
        )
        _write_epoch(batch_c2, c2_dir, epoch_id)
        merged_c2 = (
            _read_state(spark, c2_dir, batch_c2, epoch_id)
            .unionByName(batch_c2)
            .groupBy("prev", "cur")
            .agg(F.sum("_c2").alias("_c2"))
        )
        scored = lm_score_pairs(
            pairs.filter(~F.col("_is_ref")).select(id_col, "prev", "cur"),
            merged_c2,
            id_col,
        )
        _write_epoch(scored, out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def pack_token_bins_stream(
    stream: DataFrame,
    part_col: str,
    order_col: str,
    size_col,
    budget: int,
    out_dir: str,
    carry_dir: str,
) -> None:
    """Sequence packing online: each micro-batch's documents append to their
    partition's token stream and are cut into ``budget``-sized bins exactly
    like the batch ``curation.pack_greedy`` — the only state is ONE carried
    token count per partition (the smallest state of any twin: O(sources)
    longs, written as latest-per-key deltas, compactable with
    ``compact_latest_state``). Emits (part, order, tok, bin_offset, bin_id)
    per document.

    Cross-epoch guarantee (asserted in tests): when micro-batches deliver
    each partition's documents in ``order_col``-contiguous ranges (the
    crawl-shard/append-log shape), the streamed bins EQUAL the batch
    operator on the full corpus — packing is a prefix sum, and the carry is
    exactly the prefix. On out-of-order arrival the semantics degrade
    honestly to arrival-order packing (documents append to training shards
    as they arrive), still batch-exact within each micro-batch.
    """

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        sized = batch.select(
            F.col(part_col), F.col(order_col), size_col.alias("tok")
        )
        carry_like = sized.groupBy(part_col).agg(F.sum("tok").alias("_carry"))
        table = _read_parquet_or_empty(spark, carry_dir, carry_like)
        if table is None:
            carry = spark.createDataFrame([], carry_like.schema)
        else:
            hist = table.filter(F.col("_epoch") < epoch_id)
            w_last = Window.partitionBy(part_col).orderBy(F.col("_epoch").desc())
            carry = (
                hist.withColumn("_rk", F.row_number().over(w_last))
                .filter(F.col("_rk") == 1)
                .select(part_col, "_carry")
            )
        w = (
            Window.partitionBy(part_col)
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        offs = (
            sized.withColumn("_cum", F.sum("tok").over(w))
            .join(F.broadcast(carry), part_col, "left")
            .select(
                part_col,
                order_col,
                "tok",
                (F.coalesce(F.col("_carry"), F.lit(0)) + F.col("_cum") - F.col("tok")).alias(
                    "bin_offset"
                ),
                "_carry",
                "_cum",
            )
        )
        packed = offs.select(
            part_col,
            order_col,
            "tok",
            "bin_offset",
            F.floor(F.col("bin_offset") / budget).cast("long").alias("bin_id"),
        )
        new_carry = offs.groupBy(part_col).agg(
            (F.coalesce(F.max("_carry"), F.lit(0)) + F.sum("tok")).alias("_carry")
        )
        _write_epoch(packed, out_dir, epoch_id)
        _write_epoch(new_carry, carry_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def semdedup_stream(
    stream: DataFrame,
    id_col: str,
    vec_col: str,
    out_dir: str,
    *,
    threshold: float = 0.3,
    cell_bits: int = 3,
    seed: int = 7,
    dim: int = 64,
) -> None:
    """Ingest-time semantic dedup (the SemDeDup admission gate): an arriving
    document is admitted iff it has NO smaller-id near-duplicate in its own
    micro-batch AND no near-duplicate among the already-admitted documents
    of its sketch cell — first-arrival-wins, the crawl-side form of the
    batch ``semdedup_survivors`` rule (single-hop keep-smallest: the batch
    operator drops a doc whose smaller-id neighbor was itself dropped, and
    the stream mirrors that exactly, so one micro-batch == the batch
    survivors, asserted in tests). The admitted output IS the state
    (id, cell, vector — append-once set deltas, the url_dedup_stream
    pattern), so a replayed epoch cannot double-admit.

    Scale: the batch side computes its cells in one Arrow pass; the state
    conflict check is a join co-keyed on the CELL (at 100 TB the state
    table is stored partitioned by cell, so each batch touches only its
    cells' partitions) followed by the exact cosine kernel within the cell
    — candidate work is sum(cell_batch x cell_state), never batch x state.
    Nothing collects; state grows only by admitted (deduped) vectors.
    """
    from recsys_pipeline_spark.operators.dedup import (
        embedding_near_dup_pairs_sketch,
        sketch_memberships,
        sketch_planes,
    )
    from recsys_pipeline_spark.recall.retrieve import cosine

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        planes = sketch_planes(dim, bits=cell_bits, tables=1, seed=seed)
        bmem = (
            sketch_memberships(batch, planes, id_col=id_col, vec_col=vec_col)
            .select(F.col("sketch").alias("cell"), "_id", "_v")
            .localCheckpoint(eager=False)  # feeds state join + both anti-joins
        )
        pairs = embedding_near_dup_pairs_sketch(
            batch, id_col, vec_col, threshold=threshold,
            bits=cell_bits, tables=1, seed=seed, dim=dim,
        )
        batch_losers = pairs.select(F.col("id_b").alias("_id")).distinct()
        state = _read_state(spark, out_dir, bmem, epoch_id)
        conflicts = (
            bmem.join(state.select("cell", F.col("_v").alias("_sv")), "cell")
            .filter(cosine(F.col("_v"), F.col("_sv")) >= threshold)
            .select("_id")
            .distinct()
        )
        admitted = bmem.join(batch_losers, "_id", "left_anti").join(
            conflicts, "_id", "left_anti"
        )
        _write_epoch(admitted, out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def url_dedup_stream(
    stream: DataFrame,
    id_col: str,
    url_col: str,
    out_dir: str,
) -> None:
    """Crawl-time URL dedup admission: the FIRST document (smallest id
    within its micro-batch) per canonical URL is admitted, across the whole
    stream — the ingest-side twin of the batch url_dedup report. The
    admitted output IS the state (the cap_per_group_stream pattern): prior
    canonical keys re-derive from the sink, so a replayed epoch cannot
    double-admit. Canonicalization is text.canonical_url — the batch
    operator's own expression, so the pair cannot diverge.

    Within a batch the winner is min(id) per key (deterministic); across
    batches it is first-epoch-wins — the arrival-order semantics of an
    ingest gate (the batch report's min-id keeper is the same rule when the
    whole corpus is one batch, asserted in tests).

    Scale: one canonical projection (regexp codegen) + one per-key window
    (WindowGroupLimit bounds it map-side) + an anti-join against the seen
    keys per batch — all keyed on the canonical URL, nothing collects.
    """
    from recsys_pipeline_spark.operators.text import canonical_url

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        canon = batch.withColumn("canonical_url", canonical_url(F.col(url_col)))
        w = Window.partitionBy("canonical_url").orderBy(F.col(id_col).asc())
        firsts = (
            canon.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )
        seen = _read_state(spark, out_dir, firsts, epoch_id).select(
            "canonical_url"
        )
        admitted = firsts.join(seen, "canonical_url", "left_anti")
        _write_epoch(admitted, out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def bm25_stream(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    terms: tuple,
    k1: float,
    b: float,
    k: int,
    out_dir: str,
    tfdl_dir: str,
    stats_dir: str,
) -> None:
    """BM25 retrieval online: each epoch emits the top-k over the PREFIX
    corpus. State is two tables, both bounded and mergeable: per-epoch
    (id, term, tf, dl) facts — append-once per doc and QUERY-TERM-FILTERED,
    so the table holds only matching docs, never the corpus — and a
    per-epoch (n_docs, tot_tokens) counter row (sum-mergeable, the
    LM/tokenize twins' count-delta shape). An epoch's output equals the
    batch operator run on the prefix corpus (asserted in tests); on a
    single micro-batch that IS the batch result. Scores drift as df/avgdl
    grow — the honest online semantics of any corpus-statistic scorer.

    The fact mining and scoring expressions are the batch operator's own
    (text.bm25_facts / bm25_topk_from_facts), so the pair cannot diverge.
    """
    from recsys_pipeline_spark.operators.text import bm25_facts, bm25_topk_from_facts

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        tfdl, stats = bm25_facts(batch, id_col, text_col, terms)
        _write_epoch(tfdl, tfdl_dir, epoch_id)
        _write_epoch(stats, stats_dir, epoch_id)
        merged_tfdl = _read_state(spark, tfdl_dir, tfdl, epoch_id).unionByName(tfdl)
        merged_stats = (
            _read_state(spark, stats_dir, stats, epoch_id)
            .unionByName(stats)
            .agg(
                F.sum("n_docs").alias("n_docs"),
                F.sum("tot_tokens").alias("tot_tokens"),
            )
        )
        _write_epoch(
            bm25_topk_from_facts(merged_tfdl, merged_stats, id_col, terms, k1, b, k),
            out_dir,
            epoch_id,
        )

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def crawl_ingest_stream(
    stream: DataFrame,
    out_dir: str,
    *,
    min_tokens: int,
    max_tokens: int,
    min_mtl_x100: int,
    max_mtl_x100: int,
    dup3_ppm_max: int,
) -> None:
    """The ingest composite online — production crawl ingest IS a stream of
    capture files: each micro-batch delivers WARC BLOBS; per epoch they run
    parse → html_extract → canonical-URL admission → quality gate on the
    extracted content, emitting the batch composite's per-doc report minus
    the duplicate count (an admission gate cannot know future duplicates).

    Admission semantics (the url_dedup_stream contract): within a batch the
    winner is min(doc_id) per canonical URL; across batches first-epoch-wins
    — the arrival-order semantics of an ingest gate. The admitted output IS
    the state: prior canonical keys re-derive from the sink, so a replayed
    epoch cannot double-admit. On a single micro-batch the admitted set
    equals the batch composite's min-id keepers exactly (asserted in
    tests), and each admitted doc's gate verdict ALWAYS equals the batch
    gate's (the quality rules are per-document, corpus-independent).

    Parse/extract/key/gate expressions are the batch composite's own
    (multimodal.parse_warc, queries_web.extract_keyed,
    curation.quality_gate), so the pair cannot diverge.

    Scale: parse+extract is the same single Arrow narrow map per blob as
    the batch path; admission is one per-key window (map-side
    WindowGroupLimit) + an anti-join against seen keys; state reads move
    only canonical-URL keys, never content.
    """
    from recsys_pipeline_spark.operators.curation import quality_gate
    from recsys_pipeline_spark.operators.multimodal import parse_warc
    from recsys_pipeline_spark.queries_web import extract_keyed

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        keyed = extract_keyed(parse_warc(batch, "blob"))
        w = Window.partitionBy("canonical_url").orderBy(F.col("doc_id").asc())
        firsts = (
            keyed.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )
        like = firsts.select(
            "doc_id", "canonical_url", "n_links",
            F.lit(0).cast("int").alias("n_tokens"),
            F.lit("").alias("drop_reasons"),
            F.lit(0).cast("int").alias("keep"),
        )
        seen = _read_state(spark, out_dir, like, epoch_id).select("canonical_url")
        admitted = firsts.join(seen, "canonical_url", "left_anti").localCheckpoint(
            eager=False
        )  # feeds the gate AND the final join
        gate = quality_gate(
            admitted.select("doc_id", "content"),
            "doc_id",
            "content",
            min_tokens=min_tokens,
            max_tokens=max_tokens,
            min_mtl_x100=min_mtl_x100,
            max_mtl_x100=max_mtl_x100,
            dup3_ppm_max=dup3_ppm_max,
        )
        report = admitted.join(gate, "doc_id").select(
            "doc_id", "canonical_url", "n_links",
            "n_tokens", "drop_reasons", "keep",
        )
        _write_epoch(report, out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def dup_span_coverage_stream(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    out_dir: str,
    df_dir: str,
) -> None:
    """Duplicate-span coverage online: each epoch scores ITS documents
    against the gram document frequencies of the PREFIX corpus. State =
    per-epoch (gram, _df) DELTA counters — sum-mergeable because a doc
    contributes to a gram's df exactly once and the corpus is append-only
    (the LM/tokenize/BM25 twins' count-delta shape); merging is one grouped
    SUM, never a re-read of raw documents. A gram is duplicated when its
    PREFIX df >= 2 — including a single-occurrence gram in an old doc that
    a new doc now matches, which is exactly the retroactivity the batch
    operator sees when run on the whole prefix. An epoch's output equals
    the batch operator on the prefix corpus restricted to the epoch's
    documents (asserted in tests); earlier epochs' scores are NOT
    retro-emitted — the honest online semantics (re-run the batch operator
    on corpus freeze for the final signal).

    Tokenize / occurrence / df / sweep expressions are the batch
    operator's own (dedup.span_token_frame / span_occurrences /
    span_gram_df / span_coverage_report), so the pair cannot diverge.
    """
    from recsys_pipeline_spark.operators.dedup import (
        span_coverage_report,
        span_gram_df,
        span_occurrences,
        span_token_frame,
    )

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        t = span_token_frame(batch, id_col, text_col)
        occ = span_occurrences(t, id_col, n)
        batch_df = span_gram_df(occ, id_col)
        _write_epoch(batch_df, df_dir, epoch_id)
        merged = (
            _read_state(spark, df_dir, batch_df, epoch_id)
            .unionByName(batch_df)
            .groupBy("gram")
            .agg(F.sum("_df").alias("_df"))
        )
        dup = merged.filter(F.col("_df") >= 2).select("gram")
        _write_epoch(
            span_coverage_report(t, occ, dup, id_col, n), out_dir, epoch_id
        )

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def line_dedup_stream(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    out_dir: str,
    lines_dir: str,
    sep: str = "\n",
) -> None:
    """C4's repeated-line discard online: per micro-batch, a document keeps
    a line iff that line's first occurrence across PREFIX + batch is this
    (doc, pos) — within the batch the (id, pos)-minimum wins (the batch
    operator's rule), and lines already admitted by earlier epochs drop
    entirely. State = the admitted line set as per-epoch APPEND-ONCE deltas
    (the decontaminate twin's set-delta shape): each epoch writes exactly
    its newly-admitted lines, so the table is distinct-line-bounded and a
    replayed epoch re-derives the same admissions. (A production deployment
    stores line DIGESTS to bound row width; the twin stores the line itself
    so parity with the batch operator is exact by construction, not
    modulo hash collisions.) Admission is ARRIVAL-ordered across epochs
    (first epoch wins), id-ordered within one — so an epoch's output
    equals the batch operator on the prefix corpus restricted to the
    epoch's documents exactly when arrival order matches id order
    (asserted in tests over an id-ordered corpus); with out-of-order
    arrival the admitted SET of lines is the same but a line's surviving
    (doc, pos) is the first to ARRIVE, the ingest-gate semantics every
    admission twin here shares (url_dedup_stream, crawl_ingest_stream).

    Split / first-occurrence / rebuild expressions are the batch
    operator's own (dedup.line_rows / line_firsts / line_rebuild), so the
    pair cannot diverge.
    """
    from recsys_pipeline_spark.operators.dedup import (
        line_firsts,
        line_rebuild,
        line_rows,
    )

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        lines = line_rows(batch, id_col, text_col, sep)
        firsts = line_firsts(lines, id_col)
        seen = _read_state(
            spark, lines_dir, firsts.select("line"), epoch_id
        ).select("line")
        kept = firsts.join(seen, "line", "left_anti").localCheckpoint(
            eager=False
        )  # feeds the rebuild AND the state delta
        _write_epoch(line_rebuild(lines, kept, id_col, sep), out_dir, epoch_id)
        _write_epoch(kept.select("line"), lines_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def corpus_health_stream(
    stream: DataFrame,
    out_dir: str,
    partials_dir: str,
) -> None:
    """The corpus-health dashboard online — the report IS consumed
    incrementally in production (per-crawl keep rates feed alerting).
    State = per-epoch (source, lang) COUNTER deltas (n_docs, keep_sum,
    tokens_sum, dup3_sum) — the gate signals are per-document and
    corpus-independent, so disjoint slices' counters are exact partials
    and merging is one grouped SUM over a (sources x langs)-bounded
    table. Each epoch emits the FULL rollup over the prefix corpus
    (a dashboard describes the whole corpus, so the epoch output is not
    restricted to the epoch's documents); it equals the batch operator on
    the prefix exactly because the ppm divisions run only in the shared
    finisher, on fully-summed counters (asserted in tests; on a single
    micro-batch it IS the batch result).

    Partials/finisher expressions are the batch operator's own
    (queries_curation.health_partials / health_rollup), so the pair
    cannot diverge.
    """
    from recsys_pipeline_spark.queries_curation import (
        health_partials,
        health_rollup,
    )

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        delta = health_partials(batch)
        _write_epoch(delta, partials_dir, epoch_id)
        merged = (
            _read_state(spark, partials_dir, delta, epoch_id)
            .unionByName(delta)
            .groupBy("source", "lang")
            .agg(
                F.sum("n_docs").alias("n_docs"),
                F.sum("keep_sum").alias("keep_sum"),
                F.sum("tokens_sum").alias("tokens_sum"),
                F.sum("dup3_sum").alias("dup3_sum"),
            )
        )
        _write_epoch(health_rollup(merged), out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def pq_index_stream(
    stream: DataFrame,
    id_col: str,
    vec_col: str,
    out_dir: str,
    cents_dir: str,
) -> None:
    """Online ANN-index ingestion — the production IVF-PQ lifecycle (FAISS's
    train-then-add): the codebook trains ONCE, on the first non-empty
    micro-batch, and freezes; every arriving vector thereafter is encoded
    against the frozen codebook and appended to the codes index. State is
    the 128-row codebook table itself (written exactly once) — the appended
    codes ARE the output, immutable because the codebook never moves, the
    append-once contract of the admission twins.

    Semantic distinction vs the batch operator (the honest online
    semantics, like the tokenize twin's vocabulary drift): batch
    `pq_centroids` hash-designates pivots over the FULL corpus, the stream
    over the first batch only. The two coincide exactly when the first
    batch contains the full corpus' pivot set (asserted in tests — the
    streamed index then equals batch `pq_encode` verbatim); otherwise the
    deployment answer is re-encode on codebook refresh, exactly as deployed
    PQ indexes retrain their quantizer out of band.

    Replay safety: a replayed first epoch re-derives the SAME codebook
    (hash-designation is deterministic in the batch content) and dynamic
    partition overwrite rewrites its own epoch; later epochs read only
    codebook state from earlier epochs (`_read_state` excludes the current
    one). Codebook/encode expressions are the batch operator's own
    (pq.pq_centroids / pq.pq_encode), so the pair cannot diverge.
    """
    from recsys_pipeline_spark.operators import pq

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        like = pq.pq_centroids(batch.limit(0), id_col=id_col, vec_col=vec_col)
        cents = _read_state(spark, cents_dir, like, epoch_id)
        if cents.first() is None:
            if batch.first() is None:
                return  # nothing to train on, nothing to encode
            cents = pq.pq_centroids(batch, id_col=id_col, vec_col=vec_col)
            _write_epoch(cents, cents_dir, epoch_id)
        codes = pq.pq_encode(batch, cents, id_col=id_col, vec_col=vec_col)
        _write_epoch(codes, out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def bpe_train_stream(
    stream: DataFrame,
    text_col: str,
    rounds: int,
    out_dir: str,
    dict_dir: str,
) -> None:
    """BPE training online — prefix-corpus merge tables. BPE merges are a
    batch artifact (rounds depend on each other), but the trainer's ONLY
    corpus-dependent input is the word frequency dictionary, which IS
    sum-mergeable: state = per-epoch (word, wcnt) DELTA counters, merging
    one grouped SUM over a vocabulary-bounded table (the compact-counter
    shape of the tokenize/LM twins). Each epoch re-trains the full
    ``rounds`` iterations on the prefix dictionary — cheap because training
    cost is dictionary-bounded, not corpus-bounded (the measured flat-8x
    property) — and emits the complete merge table for the prefix corpus;
    it equals batch bpe_train on the prefix exactly (asserted in tests; on
    a single micro-batch it IS the batch result). Merge choices can drift
    as counts grow — the honest online semantics (freeze the merge table
    before tokenizing, as with the tokenize twin's vocabulary).

    Dictionary/trainer expressions are the batch operator's own
    (bpe_word_dict / bpe_train_from_dict), so the pair cannot diverge.
    """
    from recsys_pipeline_spark.operators.curation import (
        bpe_train_from_dict,
        bpe_word_dict,
    )

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        delta = bpe_word_dict(batch, text_col)
        _write_epoch(delta, dict_dir, epoch_id)
        merged = (
            _read_state(spark, dict_dir, delta, epoch_id)
            .unionByName(delta)
            .groupBy("word")
            .agg(F.sum("wcnt").alias("wcnt"))
        )
        _write_epoch(bpe_train_from_dict(merged, rounds=rounds), out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def zorder_stream(
    stream: DataFrame,
    col_x: str,
    col_y: str,
    out_dir: str,
    stats_dir: str,
    partials_dir: str,
    *,
    bits: int = 8,
    rows_per_file_shift: int = 6,
) -> None:
    """z-order write-layout planning online — how a table with a pinned
    zone grid actually ingests: the bucketing STATS freeze on the first
    non-empty micro-batch (deployed zone grids are per-table constants, not
    re-derived per write — the frozen-codebook contract of the PQ twin);
    each epoch's rows bucket against the frozen grid and contribute a
    PARTIAL per-file zone map. count/min/max are mergeable, so state =
    per-epoch partial-map deltas and the merge is one grouped pass; every
    epoch emits the FULL prefix zone map (a zone map describes the whole
    table). It equals batch `zorder_layout` on the prefix whenever the
    frozen grid equals the prefix's stats — in particular when the first
    batch carries both columns' extremes (asserted in tests); otherwise
    out-of-grid rows clamp into edge buckets (zorder_files clamps the
    bucketing inputs against the grid — a no-op under self-stats), and
    the deployment answer is re-layout on grid refresh (OPTIMIZE),
    mirroring the codebook/vocabulary twins.

    Stats/bucketing/zone-map expressions are the batch operator's own
    (web.zorder_stats / zorder_files / zone_map), so the pair cannot
    diverge.
    """
    from recsys_pipeline_spark.operators.web import zone_map, zorder_files, zorder_stats

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        like = zorder_stats(batch.limit(0), col_x, col_y)
        stats = _read_state(spark, stats_dir, like, epoch_id)
        if stats.first() is None:
            if batch.first() is None:
                return
            stats = zorder_stats(batch, col_x, col_y)
            _write_epoch(stats, stats_dir, epoch_id)
        delta = zone_map(
            zorder_files(
                batch, col_x, col_y, stats,
                bits=bits, rows_per_file_shift=rows_per_file_shift,
            )
        )
        _write_epoch(delta, partials_dir, epoch_id)
        merged = (
            _read_state(spark, partials_dir, delta, epoch_id)
            .unionByName(delta)
            .groupBy("file_id")
            .agg(
                F.sum("n_rows").alias("n_rows"),
                F.min("min_x").alias("min_x"),
                F.max("max_x").alias("max_x"),
                F.min("min_y").alias("min_y"),
                F.max("max_y").alias("max_y"),
            )
        )
        _write_epoch(merged, out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def item_transitions_stream(
    stream: DataFrame,
    out_dir: str,
    pairs_dir: str,
    carry_dir: str,
    topk: int = 5,
) -> None:
    """The covisitation channel online — transition counting is the
    rare twin with EXACT batch parity: state is (a) sum-mergeable
    (item, next_item) count deltas and (b) one CARRY row per user (the
    user's latest event), so the transition that straddles a micro-batch
    boundary — last event of one epoch to first event of the next — is
    counted exactly once, by prepending the carry to the user's stream
    before the lead() window. With time-ordered arrival (a stream's
    delivery contract) the final emitted top-k table equals the batch
    operator on the full corpus verbatim, asserted in tests.

    State bounds: counts are item²-bounded; the carry table gains one row
    per BATCH-ACTIVE user per epoch (a delta, not a snapshot of every
    ever-seen user) before compaction (`compact_latest_state` folds it to
    one per user)."""

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        ev = batch.select(
            "user_id",
            "ts",
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("item"),
        )
        carry_rows = _read_state(spark, carry_dir, ev, epoch_id)
        w_last = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        carry = (
            carry_rows.withColumn("_rk", F.row_number().over(w_last))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )
        aug = carry.unionByName(ev)
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        delta = (
            aug.withColumn("next_item", F.lead("item").over(w))
            .filter(
                F.col("next_item").isNotNull()
                & (F.col("next_item") != F.col("item"))
            )
            .groupBy("item", "next_item")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        _write_epoch(delta, pairs_dir, epoch_id)
        # Carry DELTA: only users present in THIS batch write a row (their
        # in-batch latest event). Users absent from the batch keep their
        # prior epochs' rows in carry_dir, and the read-side row_number
        # over (ts desc, event_id desc) picks the true latest regardless of
        # which epoch wrote it — so state grows O(active users) per epoch,
        # not a full O(all ever-seen users) snapshot every epoch.
        new_carry = (
            ev.withColumn("_rk", F.row_number().over(w_last))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )
        _write_epoch(new_carry, carry_dir, epoch_id)
        merged = (
            _read_state(spark, pairs_dir, delta, epoch_id)
            .unionByName(delta)
            .groupBy("item", "next_item")
            .agg(F.sum("cnt").alias("cnt"))
        )
        rk = Window.partitionBy("item").orderBy(
            F.col("cnt").desc(), F.col("next_item").asc()
        )
        _write_epoch(
            merged.withColumn("rk", F.row_number().over(rk))
            .filter(F.col("rk") <= topk)
            .select("item", F.col("rk").cast("long").alias("rk"), "next_item", "cnt"),
            out_dir,
            epoch_id,
        )

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def funnel_conversion_stream(
    stream: DataFrame,
    out_dir: str,
    state_dir: str,
) -> None:
    """The ordered-stage funnel online: state is one row per BATCH-ACTIVE
    user per epoch holding the user's first-qualifying stage timestamps
    (t1 = first view, t2 = first click strictly after t1, t3 = first
    purchase strictly after t2; null = stage not reached). Every column is
    MIN-MERGEABLE — min ignores nulls, and with time-ordered arrival a
    frontier only ever gets SET, never moved — so merged state is a
    per-user 3-column min, plain ``compact_state`` applies (the reader
    aggregates, order never matters), and writes are deltas for batch
    users only (the item_transitions carry discipline).

    Parity (asserted in tests): each epoch's emitted 3-row report equals
    batch ``q_funnel_conversion`` on the stream prefix — the prior state's
    frontiers are complete for all earlier events, and in-order batches
    can only extend them forward; a view in one epoch and its converting
    click in a later epoch is counted exactly once, across the boundary.

    Scale: per batch, three grouped passes over BATCH rows riding one
    user_id exchange (the batch operator's own plan) joined against the
    merged state (one co-keyed join); the report is a 3-row frame. State
    grows one row per active user per epoch between compactions.
    """

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        ev = batch.select(
            "user_id",
            F.col("event_type").alias("et"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("tse"),
        )
        like = ev.groupBy("user_id").agg(
            F.min("tse").alias("t1"),
            F.min("tse").alias("t2"),
            F.min("tse").alias("t3"),
        )
        prior = (
            _read_state(spark, state_dir, like, epoch_id)
            .groupBy("user_id")
            .agg(
                F.min("t1").alias("t1"),
                F.min("t2").alias("t2"),
                F.min("t3").alias("t3"),
            )
        )
        base = ev.select("user_id").distinct().join(prior, "user_id", "left")
        v = (
            ev.filter(F.col("et") == "view")
            .groupBy("user_id")
            .agg(F.min("tse").alias("_b1"))
        )
        s1 = base.join(v, "user_id", "left").select(
            "user_id", F.least("t1", "_b1").alias("t1"), "t2", "t3"
        )
        c = (
            ev.filter(F.col("et") == "click")
            .join(s1.select("user_id", "t1"), "user_id")
            .filter(F.col("tse") > F.col("t1"))
            .groupBy("user_id")
            .agg(F.min("tse").alias("_b2"))
        )
        s2 = s1.join(c, "user_id", "left").select(
            "user_id", "t1", F.least("t2", "_b2").alias("t2"), "t3"
        )
        p = (
            ev.filter(F.col("et") == "purchase")
            .join(s2.select("user_id", "t2"), "user_id")
            .filter(F.col("tse") > F.col("t2"))
            .groupBy("user_id")
            .agg(F.min("tse").alias("_b3"))
        )
        delta = s2.join(p, "user_id", "left").select(
            "user_id", "t1", "t2", F.least("t3", "_b3").alias("t3")
        )
        _write_epoch(delta, state_dir, epoch_id)
        merged = (
            _read_state(spark, state_dir, delta, epoch_id)
            .unionByName(delta)
            .groupBy("user_id")
            .agg(
                F.min("t1").alias("t1"),
                F.min("t2").alias("t2"),
                F.min("t3").alias("t3"),
            )
        )
        counts = merged.agg(
            F.count("t1").alias("n1"),
            F.count("t2").alias("n2"),
            F.count("t3").alias("n3"),
        )
        stages = counts.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit(1).cast("long").alias("stage_idx"),
                        F.lit("view").alias("stage"),
                        F.col("n1").cast("long").alias("n_users"),
                    ),
                    F.struct(
                        F.lit(2).cast("long").alias("stage_idx"),
                        F.lit("click").alias("stage"),
                        F.col("n2").cast("long").alias("n_users"),
                    ),
                    F.struct(
                        F.lit(3).cast("long").alias("stage_idx"),
                        F.lit("purchase").alias("stage"),
                        F.col("n3").cast("long").alias("n_users"),
                    ),
                )
            ).alias("s")
        ).select("s.*")
        w = Window.orderBy("stage_idx")  # 3-row frame: driver-sized window
        report = stages.withColumn("_prev", F.lag("n_users").over(w)).select(
            "stage_idx",
            "stage",
            "n_users",
            F.when(F.col("_prev").isNull(), F.lit(1000000))
            .when(F.col("_prev") == 0, F.lit(0))
            .otherwise(F.expr("n_users * 1000000 DIV _prev"))
            .cast("long")
            .alias("conv_from_prev_ppm"),
        )
        _write_epoch(report, out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def retention_cohorts_stream(
    stream: DataFrame,
    out_dir: str,
    pairs_dir: str,
) -> None:
    """The cohort-retention matrix online — with an EXACT cross-epoch
    guarantee and NO arrival-order assumption (the weighted_sample class,
    not the carry class): state is the distinct active ``(user_id, week)``
    pair set as APPEND-ONCE deltas (each batch anti-joins the prior set,
    so epochs are disjoint by construction and plain ``compact_state``
    applies). Cohort assignment, offsets, cell counts, and cohort sizes
    all RE-DERIVE from the merged pair set at emission — order-free
    aggregates of order-free state — so every epoch's emitted matrix
    equals batch ``q_retention_cohorts`` on the stream prefix verbatim,
    even under out-of-order delivery (a late early-week event simply
    re-cohorts the user in the next report, exactly as a batch rerun
    would; asserted in tests).

    Scale: state is bounded by distinct (user, week) combinations — the
    matrix's own support, not raw events (a user's 1000 events in a week
    are one state row). Per batch: one in-batch distinct, one co-keyed
    anti-join against state, then the batch query's own grouped passes on
    the user exchange.
    """
    wk = 7 * 86400 * 1000000

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        ev = batch.select(
            "user_id",
            F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {wk}").alias(
                "week"
            ),
        ).distinct()
        prior = _read_state(spark, pairs_dir, ev, epoch_id)
        delta = ev.join(prior, ["user_id", "week"], "left_anti")
        _write_epoch(delta, pairs_dir, epoch_id)
        pairs = prior.unionByName(delta)  # disjoint union by construction
        first = pairs.groupBy("user_id").agg(
            F.min("week").alias("cohort_week")
        )
        active = pairs.join(first, "user_id").select(
            "user_id",
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        cells = active.groupBy("cohort_week", "week_offset").agg(
            F.count(F.lit(1)).alias("n_users")
        )
        sizes = first.groupBy("cohort_week").agg(
            F.count(F.lit(1)).alias("_size")
        )
        report = cells.join(sizes, "cohort_week").select(
            "cohort_week",
            "week_offset",
            F.col("n_users").cast("long").alias("n_users"),
            F.expr("n_users * 1000000 DIV _size").alias("retention_ppm"),
        )
        _write_epoch(report, out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def daily_gapfill_stream(
    stream: DataFrame,
    out_dir: str,
    obs_dir: str,
) -> None:
    """The dense-calendar gap-fill online — the ORDER-FREE class
    (retention/weighted_sample, not the carry class): state is the per
    (user, day) LAST observation as ``(tse, event_id, obs_value)`` delta
    rows, merged on read with one grouped ``max_by`` over the (tse,
    event_id) struct — an argmax is order-free, so a late or out-of-order
    event folds in exactly as a batch rerun would (it either wins the
    argmax or is ignored). Emission re-derives the dense calendar
    (span -> sequence/explode -> forward fill, the batch operator itself)
    from the merged observation set, so every epoch's table equals batch
    ``q_daily_gapfill`` on the stream prefix verbatim, asserted in tests
    including reversed arrival.

    State bounds: one row per batch-ACTIVE (user, day) per epoch —
    the calendar's own observed support, never raw events (a user's 1000
    events in a day collapse map-side to one delta row). A key's newest
    row is NOT the truth (the argmax is), so plain ``compact_state``
    (set/counter relabel) applies: the reader's grouped max_by selects
    identically before and after.
    """
    from recsys_pipeline_spark.operators import timeseries

    us_day = timeseries.US_PER_DAY

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        ev = batch.select(
            "user_id",
            "event_id",
            "value",
            F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("tse"),
        ).withColumn("day", F.expr(f"tse DIV {us_day}"))
        key = F.struct("tse", "event_id")
        delta = ev.groupBy("user_id", "day").agg(
            F.max_by(F.struct("tse", "event_id", "value"), key).alias("_r")
        ).select(
            "user_id",
            "day",
            F.col("_r.tse").alias("tse"),
            F.col("_r.event_id").alias("event_id"),
            F.col("_r.value").alias("obs_value"),
        )
        _write_epoch(delta, obs_dir, epoch_id)
        merged = (
            _read_state(spark, obs_dir, delta, epoch_id)
            .unionByName(delta)
            .groupBy("user_id", "day")
            .agg(
                F.max_by(
                    F.col("obs_value"), F.struct("tse", "event_id")
                ).alias("obs_value")
            )
        )
        report = timeseries.gapfill_forward_fill(
            merged, entity_col="user_id", day_col="day", value_col="obs_value"
        )
        _write_epoch(report, out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def scd2_intervals_stream(
    stream: DataFrame,
    out_dir: str,
    closed_dir: str,
    carry_dir: str,
) -> None:
    """The SCD2 dimension build online — the CARRY class (item_transitions'
    time-ordered delivery contract; run structure is inherently
    order-dependent, so an order-free twin would have to keep the raw
    mutation log as state). State:

    (a) CLOSED intervals, append-once (a closed interval never reopens
        under in-order arrival; versions per user only grow, so epochs are
        disjoint and plain ``compact_state`` applies);
    (b) one OPEN-RUN carry row per user — (event_type, run-start tse,
        n_events weight ``w``, count of previously closed runs
        ``closed_cnt``) — written as batch-active DELTAS; the read side
        picks each user's latest row by the monotone (closed_cnt, tse, w)
        lexicographic key (every active epoch strictly increases it), so
        ``compact_latest_state`` on user_id folds it safely.

    Each batch prepends the open run as ONE weighted pseudo-event
    (event_id -1 sorts it before same-instant new events), recomputes
    gaps-and-islands over pseudo-event + new events, closes all runs but
    the last, and emits closed-state ∪ open-runs-as-intervals — equal to
    batch ``q_scd2_intervals`` on the stream prefix, asserted per epoch.
    """

    def step(batch: DataFrame, epoch_id: int) -> None:
        report = _scd2_update(batch, epoch_id, closed_dir, carry_dir)
        _write_epoch(report, out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def _scd2_update(
    batch: DataFrame, epoch_id: int, closed_dir: str, carry_dir: str
) -> DataFrame:
    """One SCD2 carry-class state update (the scd2_intervals_stream step
    body, shared with scd2_dim_join_stream): fold the batch's mutation
    events into the closed-interval state + open-run carry, and return the
    CURRENT full interval table (closed ∪ open, version-numbered) for the
    stream prefix seen so far."""
    spark = batch.sparkSession
    ev = batch.select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("tse"),
    ).select(
        "user_id",
        "event_type",
        "tse",
        "event_id",
        F.lit(1).cast("long").alias("w"),
        F.lit(0).cast("int").alias("closed_cnt"),
    )
    carry_like = ev.select(
        "user_id", "event_type", "tse", "w", "closed_cnt"
    )
    carry_rows = _read_state(spark, carry_dir, carry_like, epoch_id)
    w_latest = Window.partitionBy("user_id").orderBy(
        F.col("closed_cnt").desc(), F.col("tse").desc(), F.col("w").desc()
    )
    latest = (
        carry_rows.withColumn("_rk", F.row_number().over(w_latest))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    active_users = ev.select("user_id").distinct()
    active_carry = latest.join(active_users, "user_id", "left_semi")
    idle_carry = latest.join(active_users, "user_id", "left_anti")

    aug = active_carry.select(
        "user_id",
        "event_type",
        "tse",
        F.lit(-1).cast("long").alias("event_id"),
        "w",
        "closed_cnt",
    ).unionByName(ev)
    ord_w = Window.partitionBy("user_id").orderBy("tse", "event_id")
    chg = F.when(
        F.lag("event_type").over(ord_w).isNull()
        | (F.lag("event_type").over(ord_w) != F.col("event_type")),
        1,
    ).otherwise(0)
    run_w = ord_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runs = (
        aug.withColumn("_ver", F.sum(chg).over(run_w).cast("int"))
        .groupBy("user_id", "_ver", "event_type")
        .agg(
            F.min("tse").alias("valid_from_us"),
            F.sum("w").alias("n_events"),
        )
    )
    per_user = Window.partitionBy("user_id")
    offs = aug.groupBy("user_id").agg(F.max("closed_cnt").alias("_off"))
    runs = (
        runs.join(offs, "user_id")
        .withColumn("_k", F.max("_ver").over(per_user))
        .withColumn(
            "valid_to_us",
            F.lead("valid_from_us").over(
                Window.partitionBy("user_id").orderBy("_ver")
            ),
        )
        .withColumn("version", (F.col("_off") + F.col("_ver")).cast("int"))
    )
    closed_delta = runs.filter(F.col("_ver") < F.col("_k")).select(
        "user_id", "version", "event_type", "valid_from_us",
        "valid_to_us", "n_events",
    )
    _write_epoch(closed_delta, closed_dir, epoch_id)
    open_runs = runs.filter(F.col("_ver") == F.col("_k"))
    new_carry = open_runs.select(
        "user_id",
        "event_type",
        F.col("valid_from_us").alias("tse"),
        F.col("n_events").alias("w"),
        (F.col("version") - 1).cast("int").alias("closed_cnt"),
    )
    _write_epoch(new_carry, carry_dir, epoch_id)
    open_iv = open_runs.unionByName(
        idle_carry.select(
            "user_id",
            F.col("closed_cnt"),
            "event_type",
            F.col("tse").alias("valid_from_us"),
            F.col("w").alias("n_events"),
        ).select(
            "user_id",
            (F.col("closed_cnt") + 1).cast("int").alias("version"),
            "event_type",
            "valid_from_us",
            F.lit(None).cast("long").alias("valid_to_us"),
            "n_events",
        ),
        allowMissingColumns=True,
    ).select(
        "user_id", "version", "event_type", "valid_from_us",
        F.lit(None).cast("long").alias("valid_to_us"), "n_events",
    )
    report = (
        _read_state(spark, closed_dir, closed_delta, epoch_id)
        .unionByName(closed_delta)
        .unionByName(open_iv)
    )
    return report


def scd2_dim_join_stream(
    stream: DataFrame,
    out_dir: str,
    closed_dir: str,
    carry_dir: str,
) -> None:
    """Facts-to-SCD2-version labeling online — the dim-join consumer of the
    scd2_intervals_stream state machine (same CARRY class, same
    time-ordered delivery contract with epoch cuts at strict ts boundaries
    so equal-timestamp events never straddle a batch).

    Each batch: the NON-purchase events fold into the shared SCD2 state
    update (_scd2_update — closed intervals + open-run carry); the batch's
    PURCHASE events then join the resulting interval table by
    tse ∈ [valid_from, valid_to). EXACT union-to-batch parity (the
    rolling_anomaly argument, inclusive-boundary variant): a fact's
    version is determined by state events with tse <= fact tse — all
    present once its own epoch is folded, and an open interval matched now
    can only be CLOSED at a strictly later tse, so the label never
    changes. Epochs therefore union to batch ``q_scd2_dim_join`` verbatim.

    State bounds: version-bounded interval rows + one carry row per user —
    never raw events."""

    def step(batch: DataFrame, epoch_id: int) -> None:
        state_ev = batch.filter(F.col("event_type") != "purchase")
        intervals = _scd2_update(state_ev, epoch_id, closed_dir, carry_dir)
        facts = batch.filter(F.col("event_type") == "purchase").select(
            "event_id",
            "user_id",
            F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("tse"),
        )
        d = intervals.select(
            F.col("user_id").alias("_u"), "version",
            F.col("event_type").alias("state_type"),
            "valid_from_us", "valid_to_us",
        )
        report = facts.join(
            d,
            (F.col("user_id") == F.col("_u"))
            & (F.col("tse") >= F.col("valid_from_us"))
            & (F.col("valid_to_us").isNull() | (F.col("tse") < F.col("valid_to_us"))),
        ).select("event_id", "user_id", "tse", "version", "state_type")
        _write_epoch(report, out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def peak_concurrency_stream(
    stream: DataFrame,
    out_dir: str,
    iv_dir: str,
) -> None:
    """The sweep-line concurrency profile online — ORDER-FREE class: state
    is the per (user, day) activity interval as (min s, max e) delta rows;
    min/max are merge-stable, so the read-side grouped min/max folds any
    arrival order into exactly the batch intervals (a late event can only
    widen its interval, as a batch rerun would). Emission re-runs the
    sweep (hour-local prefix + timeline-bounded carry) over merged
    intervals, so every epoch's profile equals batch ``q_peak_concurrency``
    on the stream prefix verbatim — asserted including reversed arrival.

    State bounds: one row per batch-active (user, day) per epoch — the
    interval support, not raw events; plain ``compact_state`` applies
    (the reader's min/max merge is relabel-invariant).
    """
    from recsys_pipeline_spark.operators import timeseries

    us_day = timeseries.US_PER_DAY

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        delta = (
            batch.select(
                "user_id",
                F.expr(
                    f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {us_day}"
                ).alias("day"),
                F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("tse"),
            )
            .groupBy("user_id", "day")
            .agg(F.min("tse").alias("s"), F.max("tse").alias("e"))
        )
        _write_epoch(delta, iv_dir, epoch_id)
        iv = (
            _read_state(spark, iv_dir, delta, epoch_id)
            .unionByName(delta)
            .groupBy("user_id", "day")
            .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        )
        report = timeseries.concurrency_profile(iv)
        _write_epoch(report, out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def host_triangles_stream(
    stream: DataFrame,
    out_dir: str,
    edges_dir: str,
    n_hosts: int,
    fanout: int = 3,
) -> None:
    """Triangle counting over the growing host graph — the first GRAPH-
    family twin, ORDER-FREE class: state is the distinct undirected edge
    set as APPEND-ONCE canonical (u < v) delta rows (each batch's derived
    edges anti-join the prior set — epochs disjoint by construction, plain
    ``compact_state`` applies). Emission re-runs the shared
    ``graph.triangle_counts`` kernel on the merged edge set, so every
    epoch's per-host counts equal the batch ``host_triangles`` query on
    the document prefix verbatim — a late document can only ADD edges,
    exactly as a batch rerun would see.

    State bounds: the simple host graph is host²-capped regardless of how
    many documents stream in (edge dedup absorbs repeats), so state stops
    growing once the graph saturates — the item_transitions count-table
    property, on edges.
    """
    from recsys_pipeline_spark.operators import graph as G
    from recsys_pipeline_spark.operators import web as W

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        und = (
            W.host_edges(batch, "doc_id", n_hosts, fanout=fanout)
            .select(
                F.least("src", "dst").alias("u"),
                F.greatest("src", "dst").alias("v"),
            )
            .distinct()
        )
        prior = _read_state(spark, edges_dir, und, epoch_id)
        delta = und.join(prior, ["u", "v"], "left_anti")
        _write_epoch(delta, edges_dir, epoch_id)
        merged = prior.unionByName(delta)  # disjoint union by construction
        report = G.triangle_counts(merged, src="u", dst="v")
        _write_epoch(report, out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def rolling_anomaly_stream(
    stream: DataFrame,
    out_dir: str,
    stats_dir: str,
) -> None:
    """Trailing k-sigma anomaly flags online — the rare twin whose epoch
    outputs UNION to the batch result EXACTLY (not merely prefix-equal):
    the reference window excludes the current day, so an event's flag
    depends only on STRICTLY EARLIER days' statistics — under time-ordered
    arrival those are complete when the event arrives, even when one
    calendar day straddles a batch boundary. State is the per (user, day)
    (n, sum, sum-of-squares) counter row as SUM-MERGEABLE deltas (plain
    ``compact_state`` applies); each batch emits flags for ITS events by
    joining them against the merged counters over [day-29, day-1] — an
    equi-join on user with a bounded 30-day range predicate, the same
    BIGINT algebra as the batch query ((n·x − S)² > k²·(n·Q − S²)).

    State bounds: one row per active (user, day) — the calendar support,
    never raw events.
    """
    from recsys_pipeline_spark.operators import timeseries
    from recsys_pipeline_spark.queries_analytics import ANOM_K, ANOM_MIN_N

    us_day = timeseries.US_PER_DAY

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        ev = batch.select(
            "event_id",
            "user_id",
            F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {us_day}").alias(
                "day"
            ),
            F.round(F.col("value") * 100).cast("long").alias("v_c"),
        )
        # State counters accumulate in decimal(38,0) (not long) so the
        # k-sigma products below match the batch query's exact-decimal
        # algebra — DuckDB-side SUM(BIGINT) is int128, and long would wrap
        # silently past ~3e9 trailing cent-sums (r13 ADVICE).
        dec = "decimal(38,0)"
        delta = ev.groupBy("user_id", "day").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v_c").cast(dec)).alias("s"),
            F.sum(F.col("v_c").cast(dec) * F.col("v_c")).alias("q"),
        )
        _write_epoch(delta, stats_dir, epoch_id)
        merged = (
            _read_state(spark, stats_dir, delta, epoch_id)
            .unionByName(delta)
            .groupBy("user_id", "day")
            .agg(F.sum("n").alias("n"), F.sum("s").alias("s"), F.sum("q").alias("q"))
        )
        m = merged.select(
            F.col("user_id").alias("_u"),
            F.col("day").alias("_d"),
            "n", "s", "q",
        )
        win = ev.join(
            m,
            (F.col("user_id") == F.col("_u"))
            & (F.col("_d") >= F.col("day") - 29)
            & (F.col("_d") <= F.col("day") - 1),
            "left",
        ).groupBy("event_id", "user_id", "day", "v_c").agg(
            F.coalesce(F.sum("n"), F.lit(0)).alias("nw"),
            F.sum("s").alias("sw"),
            F.sum("q").alias("qw"),
        )
        nw, sw, qw = F.col("nw"), F.col("sw"), F.col("qw")
        nd, x = nw.cast(dec), F.col("v_c").cast(dec)
        lhs = (nd * x - sw) * (nd * x - sw)
        rhs = F.lit(ANOM_K * ANOM_K).cast(dec) * (nd * qw - sw * sw)
        report = win.select(
            "event_id", "user_id", "day", "v_c",
            nw.cast("long").alias("n_win"),
            F.when((nw >= ANOM_MIN_N) & (lhs > rhs), 1).otherwise(0)
            .cast("int")
            .alias("is_anomaly"),
        )
        _write_epoch(report, out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def exact_percentiles_stream(
    stream: DataFrame,
    out_dir: str,
    counts_dir: str,
) -> None:
    """Exact global percentiles online — ORDER-FREE class: state is the
    per-distinct-cent-value count as SUM-MERGEABLE delta rows (plain
    ``compact_state`` applies; any arrival order folds to the same
    histogram, as a batch rerun would). Emission re-runs the distributed
    selection (stats.ranked_score_groups' two-pass ranking over the
    merged value histogram — each "row" now carries its count weight, so
    the ranking input is value-vocabulary-sized, not corpus-sized) and
    every epoch's 3-row report equals batch ``q_exact_percentiles`` on
    the stream prefix verbatim.

    State bounds: one row per distinct cent value per epoch — the value
    vocabulary, never raw events.
    """
    from recsys_pipeline_spark.queries_analytics import EXACT_PCTS

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        delta = (
            batch.select(
                F.round(F.col("value") * 100).cast("long").alias("v_c")
            )
            .groupBy("v_c")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        _write_epoch(delta, counts_dir, epoch_id)
        hist = (
            _read_state(spark, counts_dir, delta, epoch_id)
            .unionByName(delta)
            .groupBy("v_c")
            .agg(F.sum("cnt").alias("cnt"))
        )
        # Weighted ranking over the PRE-AGGREGATED histogram: _before is a
        # count-weighted prefix over the value-ordered rows. The frame is
        # value-vocabulary-sized (state bound above), so a plain ordered
        # window suffices here — the same timeline-bounded-window
        # precedent as peak_concurrency's hour carry; the batch query's
        # range-partitioned two-pass (ranked_score_groups) is the shape
        # for corpus-sized inputs, not for this bounded merge.
        wv = Window.orderBy("v_c").rowsBetween(Window.unboundedPreceding, -1)
        small = hist.withColumn(
            "_before", F.coalesce(F.sum("cnt").over(wv), F.lit(0))
        )
        n = int(hist.agg(F.sum("cnt")).first()[0] or 0)
        ks = [(p, (n - 1) * p // 100 + 1) for p in EXACT_PCTS]
        k_df = spark.createDataFrame(ks, "pct int, k long")
        report = (
            small.join(
                F.broadcast(k_df),
                (F.col("_before") < F.col("k"))
                & (F.col("k") <= F.col("_before") + F.col("cnt")),
            )
            .select(
                "pct", "k",
                F.col("v_c").alias("value_cents"),
                F.lit(n).cast("long").alias("n"),
            )
        )
        _write_epoch(report, out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def cusum_drift_stream(
    stream: DataFrame,
    out_dir: str,
    daily_dir: str,
) -> None:
    """CUSUM drift detection online — ORDER-FREE class: state is the per
    (user, day) spend-cents total as SUM-MERGEABLE delta rows (plain
    ``compact_state`` applies; any arrival order folds to the same daily
    series).  Every epoch re-runs the SHARED ``timeseries.cusum_drift``
    operator on the merged daily state, so each epoch's full report
    equals batch ``q_cusum_drift`` on the events seen so far — prefix
    parity in delivery order.  A retroactive re-statement is inherent to
    CUSUM (a new day shifts every day's mean-relative increments), which
    is why the emission is the full prefix report, not a delta.

    State bounds: one row per active (user, day) per epoch — the
    calendar support, never raw events.
    """
    from recsys_pipeline_spark.operators import timeseries
    from recsys_pipeline_spark.queries_analytics import CUSUM_H

    us_day = timeseries.US_PER_DAY

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        delta = (
            batch.select(
                "user_id",
                F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {us_day}").alias(
                    "day"
                ),
                F.round(F.col("value") * 100).cast("long").alias("v_c"),
            )
            .groupBy("user_id", "day")
            .agg(F.sum("v_c").alias("spend_c"))
        )
        _write_epoch(delta, daily_dir, epoch_id)
        merged = (
            _read_state(spark, daily_dir, delta, epoch_id)
            .unionByName(delta)
            .groupBy("user_id", "day")
            .agg(F.sum("spend_c").alias("spend_c"))
        )
        report = timeseries.cusum_drift(
            merged, "user_id", "day", "spend_c", h=CUSUM_H
        )
        _write_epoch(report, out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def rolling_active_users_stream(
    stream: DataFrame,
    out_dir: str,
    pairs_dir: str,
) -> None:
    """DAU / trailing-WAU / stickiness online — ORDER-FREE class: state is
    the distinct (user_id, day) activity set as APPEND-ONCE deltas (a set
    union is order-free, so any arrival order folds to the same frame;
    plain ``compact_state`` applies).  Every epoch re-runs the SHARED
    ``timeseries.active_users_report`` on the merged set, so each epoch's
    full report equals batch ``q_rolling_active_users`` on the events
    seen so far.  The retroactive re-statement is inherent: a new
    activity day extends the global day span and feeds the trailing
    windows of the <= 7 days after it.

    State bounds: one row per NEW (user, day) per epoch — the activity
    support, never raw events.
    """
    from recsys_pipeline_spark.operators import timeseries
    from recsys_pipeline_spark.queries_analytics import RAU_WINDOW_DAYS

    us_day = timeseries.US_PER_DAY

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        pairs = batch.select(
            "user_id",
            F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {us_day}").alias("day"),
        ).distinct()
        prior = _read_state(spark, pairs_dir, pairs, epoch_id)
        delta = pairs.join(prior, ["user_id", "day"], "left_anti")
        _write_epoch(delta, pairs_dir, epoch_id)
        merged = prior.unionByName(delta)
        report = timeseries.active_users_report(
            merged, window_days=RAU_WINDOW_DAYS
        )
        _write_epoch(report, out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def heavy_hitter_grams_stream(
    stream: DataFrame,
    out_dir: str,
    counts_dir: str,
) -> None:
    """Frequent word-bigrams online — ORDER-FREE class: state is the
    per-gram occurrence count as SUM-MERGEABLE deltas (gram-vocabulary-
    bounded; plain ``compact_state`` applies).  Ingest needs NO sketch:
    the per-batch gram mining (shared ``curation.word_gram_rows``, the
    batch operator's pass) collapses each micro-batch to its gram
    histogram delta — the batch side's Misra-Gries stage exists to bound
    one pass over an unbounded CORPUS, while here each micro-batch is
    bounded by construction and the state already is the exact histogram.
    Every epoch thresholds the merged counts exactly, so each epoch's
    report equals batch ``q_heavy_hitter_grams`` on the documents seen so
    far (same exact counts, same integer share arithmetic — no
    approximation anywhere online).
    """
    from recsys_pipeline_spark.operators import curation
    from recsys_pipeline_spark.queries_curation import HH_THRESHOLD_PPM

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        delta = (
            curation.word_gram_rows(batch, "doc_id", "text", 2)
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        _write_epoch(delta, counts_dir, epoch_id)
        merged = (
            _read_state(spark, counts_dir, delta, epoch_id)
            .unionByName(delta)
            .groupBy("gram")
            .agg(F.sum("cnt").alias("cnt"))
        )
        dec = "decimal(38,0)"
        n_total = merged.agg(F.sum(F.col("cnt").cast(dec)).alias("_n"))
        report = (
            merged.crossJoin(F.broadcast(n_total))
            .filter(
                F.col("cnt").cast(dec) * F.lit(1_000_000)
                >= F.col("_n") * F.lit(HH_THRESHOLD_PPM)
            )
            .select(
                "gram",
                F.col("cnt").cast("long").alias("cnt"),
                F.expr(
                    "CAST((CAST(cnt AS DECIMAL(38,0)) * 1000000) DIV _n AS BIGINT)"
                ).alias("share_ppm"),
            )
        )
        _write_epoch(report, out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def item_cooccur_lift_stream(
    stream: DataFrame,
    out_dir: str,
    pairs_dir: str,
) -> None:
    """Item co-occurrence lift online — ORDER-FREE class: state is the
    distinct (user_id, item) basket set as APPEND-ONCE deltas (set union
    merges in any order; plain ``compact_state`` applies).  Every epoch
    re-runs the SHARED ``queries_ext.item_lift_from_pairs`` on the merged
    set, so each epoch's full report equals batch ``q_item_cooccur_lift``
    on the events seen so far.  Retroactive re-statement is inherent: a
    new (user, item) observation moves N, n_a and n_b for every pair the
    user touches.

    State bounds: one row per NEW (user, item) per epoch — the basket
    support (users x item-vocabulary at saturation), never raw events.
    """
    from recsys_pipeline_spark.queries_ext import item_lift_from_pairs

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        pairs = (
            batch.select(
                "user_id",
                F.get_json_object("props", "$.k").cast("long").alias("item"),
            )
            .filter(F.col("item").isNotNull())
            .distinct()
        )
        prior = _read_state(spark, pairs_dir, pairs, epoch_id)
        delta = pairs.join(prior, ["user_id", "item"], "left_anti")
        _write_epoch(delta, pairs_dir, epoch_id)
        merged = prior.unionByName(delta).localCheckpoint(eager=False)
        _write_epoch(item_lift_from_pairs(merged), out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def segment_quantiles_stream(
    stream: DataFrame,
    out_dir: str,
    counts_dir: str,
) -> None:
    """Grouped exact quantiles online — ORDER-FREE class: state is the
    per-(segment, cent-value) count as SUM-MERGEABLE deltas (bounded by
    segments x value vocabulary; plain ``compact_state`` applies).  Every
    epoch re-runs the SHARED ``stats.grouped_exact_quantiles_from_hist``
    selection over the merged histogram, so each epoch's report equals
    batch ``q_segment_quantiles`` on the customers seen so far.  The
    lower-rank selection re-states inherently: new rows move every
    group's n and k.
    """
    from recsys_pipeline_spark.operators.stats import (
        grouped_exact_quantiles_from_hist,
    )
    from recsys_pipeline_spark.queries_analytics import SEG_PCTS

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        delta = (
            batch.select(
                F.col("c_mktsegment").alias("segment"),
                F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
            )
            .groupBy("segment", "bal_c")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        _write_epoch(delta, counts_dir, epoch_id)
        merged = (
            _read_state(spark, counts_dir, delta, epoch_id)
            .unionByName(delta)
            .groupBy("segment", "bal_c")
            .agg(F.sum("cnt").alias("cnt"))
        )
        report = grouped_exact_quantiles_from_hist(
            merged, "segment", "bal_c", SEG_PCTS
        )
        _write_epoch(report, out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)


def segment_quantiles_cont_stream(
    stream: DataFrame,
    out_dir: str,
    counts_dir: str,
) -> None:
    """Type-7 interpolated grouped quantiles online (twin 36) — the same
    ORDER-FREE sum-mergeable per-(segment, cent-value) histogram state as
    ``segment_quantiles_stream``; only the selection stage differs (the
    SHARED ``stats.grouped_interp_quantiles_from_hist`` kernel, exact x100
    integer algebra), so each epoch's report equals batch
    ``q_segment_quantiles_cont`` on the customers seen so far."""
    from recsys_pipeline_spark.operators.stats import (
        grouped_interp_quantiles_from_hist,
    )
    from recsys_pipeline_spark.queries_analytics import SEG_PCTS

    def step(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        delta = (
            batch.select(
                F.col("c_mktsegment").alias("segment"),
                F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
            )
            .groupBy("segment", "bal_c")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        _write_epoch(delta, counts_dir, epoch_id)
        merged = (
            _read_state(spark, counts_dir, delta, epoch_id)
            .unionByName(delta)
            .groupBy("segment", "bal_c")
            .agg(F.sum("cnt").alias("cnt"))
        )
        report = grouped_interp_quantiles_from_hist(
            merged, "segment", "bal_c", SEG_PCTS
        )
        _write_epoch(report, out_dir, epoch_id)

    from recsys_pipeline_spark.streaming.pipeline import foreach_batch_sink

    foreach_batch_sink(stream, step)
