"""Physical-plan regression guards: the properties that make the headline
queries viable at 100 TB (audited in PLANS.md) are asserted here so a future
refactor can't silently reintroduce a nested-loop join, a multi-pass rollup,
or a fan-out of redundant scans."""

from __future__ import annotations

import re

import pytest

from recsys_pipeline_spark.queries import (
    q_pit_sliding_features,
    q_range_join_attribution,
    q_rollup_revenue,
    q_star_join_revenue,
)
from recsys_pipeline_spark.queries_ext import q_ngram_jaccard_dup

SF = "/root/testdata/sf0.001"


def _final_plan(df) -> str:
    df.count()  # materialize so AQE settles on the final plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_range_join_rides_equi_key_not_nested_loop(spark):
    plan = _final_plan(q_range_join_attribution(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rollup_is_single_pass_expand(spark):
    plan = _final_plan(q_rollup_revenue(spark, SF))
    assert plan.count("Expand") == 1
    assert plan.count("FileScan") == 1  # not a union of per-level scans


def test_ngram_jaccard_bounded_scans(spark):
    plan = _final_plan(q_ngram_jaccard_dup(spark, SF))
    # linear pipeline: documents read at most twice (self-join sides),
    # never the 6-scan fan-out of the branched formulation (PLANS.md note 5)
    assert plan.count("FileScan") <= 2
    assert "BroadcastNestedLoopJoin" not in plan


def test_pit_windows_collapse_to_one_windowexec(spark):
    plan = _final_plan(q_pit_sliding_features(spark, SF))
    assert len(re.findall(r"\bWindow\b", plan)) == 1  # PLANS.md iteration 1


def test_assign_queryid_no_single_partition_sort(spark):
    """VERDICT item 5: the P12 dense row id must come from the two-pass
    range-partitioned form — a Window over an `Exchange SinglePartition`
    (one task sorts the world) must never reappear."""
    from recsys_pipeline_spark.io import read_table
    from recsys_pipeline_spark.operators import pit

    ev = read_table(spark, SF, "events").select("user_id", "ts", "event_id")
    out = pit.assign_queryid(ev, "user_id", "ts", tiebreak_col="event_id")
    plan = _final_plan(out)
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" in plan.lower()


def test_embedding_near_dup_one_scan_one_exchange(spark):
    """The blocked all-pairs operator reads the corpus ONCE and shuffles it
    ONCE (membership explode -> pair groupBy). The grouped-blocks self-join
    formulation (2 scans, 5 exchanges, zero reuse — PLANS.md lesson 5) must
    not come back."""
    from recsys_pipeline_spark.io import read_table
    from recsys_pipeline_spark.operators.dedup import embedding_near_dup_pairs

    emb = read_table(spark, SF, "embeddings")
    out = embedding_near_dup_pairs(emb, threshold=0.3)
    plan = _final_plan(out)
    assert plan.count("FileScan") == 1
    assert plan.count("Exchange") == 1


def test_hyperplane_sketch_is_codegen_not_hof(spark):
    """VERDICT item 9: the sketch is the 100 TB bucketing primitive; its dot
    products must stay whole-stage-codegen expressions, never the
    aggregate()/zip_with() CodegenFallback fold (measured ~50x slower)."""
    from recsys_pipeline_spark.io import read_table
    from recsys_pipeline_spark.operators.similarity import random_hyperplane_sketch

    emb = read_table(spark, SF, "embeddings")
    out = random_hyperplane_sketch(emb, bits=8)
    plan = _final_plan(out)
    assert "zip_with" not in plan and "aggregate(" not in plan
    assert "*(" in plan  # the WholeStageCodegen stage marker in toString()


def test_sketch_ann_plans_stay_lean(spark):
    """The oracle-checked ANN queries must keep the audited round-6 shapes:
    one corpus scan, one Arrow python stage (the membership kernel), a
    TakeOrdered top-k — and at most one tiny exchange (LSH candidate-id
    dedup; the IVF probe filter needs none). A second scan or a join-shaped
    candidate generation means the membership pipeline regressed."""
    from recsys_pipeline_spark.queries_ext import q_ann_ivf_topk, q_ann_lsh_topk

    for q, max_exchanges in ((q_ann_ivf_topk, 0), (q_ann_lsh_topk, 1)):
        plan = _final_plan(q(spark, SF))
        assert plan.count("FileScan") == 1, q.__name__
        assert plan.count("InPandas") == 1, q.__name__
        assert plan.count("Exchange") <= max_exchanges, q.__name__
        assert "TakeOrderedAndProject" in plan, q.__name__


def test_star_join_broadcasts_dims(spark):
    plan = _final_plan(q_star_join_revenue(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3  # customer/nation/region
    assert "CartesianProduct" not in plan


def test_simhash_aggregate_stays_codegen(spark):
    """The 64-bit-vote SimHash aggregate must run inside WholeStageCodegen:
    with the default codegen.maxFields=100 Spark silently drops codegen for
    >100-buffer aggregates and the interpreted path is 3-5x slower (PLANS.md
    round-3 lesson 12; session.py pins maxFields=300)."""
    import contextlib
    import io

    from recsys_pipeline_spark.operators.dedup import simhash

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = simhash(docs, portable=True)
    df.collect()  # settle AQE so the formatted explain shows the final plan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    # formatted explain tags compiled operators as "NodeName [codegen id : N]"
    assert re.search(r"HashAggregate \[codegen id", buf.getvalue()), (
        "64-buffer vote aggregate fell out of whole-stage codegen "
        "(check spark.sql.codegen.maxFields in session.py)"
    )


def test_scan_pushdown_and_column_pruning(spark):
    """Predicate pushdown + column pruning must reach the parquet scan: the
    as-of attribution query filters event_type and touches 4 of events' 6
    columns — the FileScan must show a pushed EqualTo filter and a ReadSchema
    without the untouched wide columns (props)."""
    from recsys_pipeline_spark.queries_analytics import q_asof_click_attribution

    plan = _final_plan(q_asof_click_attribution(spark, SF))
    scans = [l for l in plan.splitlines() if "FileScan" in l or "PushedFilters" in l]
    txt = "\n".join(scans) or plan
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(event_type", txt), txt[:500]
    assert "props" not in txt


def test_det_composite_materializes_the_split_once(spark):
    """Round-7 lesson (PLANS.md 20): 8 branches hang off the temporal split;
    without the localCheckpoint the executed plan showed 9 FileScans and 14
    Window passes (the subtree re-ran per branch). Pin the materialized
    shape: the events file is scanned for the split + request-users only,
    and the split's two window passes appear once."""
    import re

    from recsys_pipeline_spark.queries_ml import q_recommend_top50_det

    plan = _final_plan(q_recommend_top50_det(spark, SF))
    assert plan.count("FileScan") <= 3, plan.count("FileScan")
    assert len(re.findall(r"\bWindow\b", plan)) <= 2


def test_boilerplate_gram_mining_materialized_once(spark):
    """The distinct gram frame fans out to three consumers; without the
    checkpoint each re-mined the corpus (4 FileScans). Pinned: the final
    plan scans parquet exactly once (group sizes) — the gram branches read
    the materialized RDD."""
    from recsys_pipeline_spark.queries_curation import q_boilerplate_ngrams

    plan = _final_plan(q_boilerplate_ngrams(spark, SF))
    assert plan.count("FileScan") == 1, plan


def test_select_token_budget_never_sorts_the_corpus(spark):
    """The budget cutoff must come from the <=1001-cell bucket frame, not a
    global sort of the documents: the only single-partition exchange in the
    final plan feeds the cell-level window (tiny), the corpus-side frame is
    read from the one materialized projection (no FileScan re-mining), and
    no corpus-wide global Sort exists."""
    from recsys_pipeline_spark.queries_curation import q_select_token_budget

    plan = _final_plan(q_select_token_budget(spark, SF))
    assert plan.count("FileScan") == 0, plan  # sized projection materialized once
    # windows run over the cell frame / boundary cell only: every Window's
    # required sort is partition-local (no global ordering of all docs)
    assert "rangepartitioning" not in plan, plan


def test_pii_redaction_is_shuffle_free_codegen(spark):
    """The regexp chain must stay a pure projection over the scan: no
    exchange, no UDF/Arrow eval — the property that makes a corpus-wide
    scrub a single IO-bound pass at 100 TB."""
    from recsys_pipeline_spark.queries_curation import q_pii_redaction

    plan = _final_plan(q_pii_redaction(spark, SF))
    assert plan.count("Exchange") == 0, plan
    assert "Python" not in plan and "Arrow" not in plan, plan


def test_doc_chunks_is_shuffle_free(spark):
    """Chunking is tokenize→sequence→explode→slice over the scan; any
    exchange here would re-shuffle the whole corpus before the (cheaper)
    downstream pack/tokenize stage gets to choose its own key."""
    from recsys_pipeline_spark.queries_curation import q_doc_chunks

    plan = _final_plan(q_doc_chunks(spark, SF))
    assert plan.count("Exchange") == 0, plan
    assert plan.count("FileScan") == 1, plan


def test_curate_corpus_scans_the_corpus_once(spark):
    """The composite's stages all read the materialized survivor/clean
    frames — the documents parquet is scanned only inside the first
    (dedup) materialization, never re-mined per stage, and no corpus-wide
    global sort exists (the selection stage's windows run on the tiny
    cell/boundary frames)."""
    from recsys_pipeline_spark.queries_curation import q_curate_corpus

    plan = _final_plan(q_curate_corpus(spark, SF))
    assert plan.count("FileScan") == 0, plan  # staged frames, no re-scan
    assert "rangepartitioning" not in plan, plan  # no global sort


def test_quality_filter_single_pass_no_python(spark):
    """The gate reads the corpus once (tokenized base materialized lazily,
    shared by the signal and repetition branches) and stays JVM-side; the
    repetition signal must keep the explode+projection shape, not per-row
    higher-order transforms."""
    from recsys_pipeline_spark.queries_curation import q_quality_filter

    plan = _final_plan(q_quality_filter(spark, SF))
    assert plan.count("FileScan") <= 1  # 0 once the checkpoint owns the scan
    assert "Python" not in plan and "ArrowEval" not in plan
    assert plan.count("Exchange") <= 3


def test_bpe_pairs_partial_agg_and_topk_no_global_sort(spark):
    """Pair counting must collapse map-side (bounded charset² dictionary →
    ONE small shuffle) and take the top-k via TakeOrderedAndProject —
    a global sort of the pair table must never appear."""
    from recsys_pipeline_spark.queries_curation import q_bpe_pairs

    plan = _final_plan(q_bpe_pairs(spark, SF))
    assert plan.count("FileScan") == 1
    assert plan.count("Exchange") == 1
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()


def test_bm25_filters_terms_before_tf_agg_and_broadcasts_stats(spark):
    """The exploded term stream must be filtered to the query terms BEFORE
    the tf aggregate (unmatched terms never shuffle), df/corpus stats join
    as broadcasts, the top-k is a TakeOrderedAndProject (no global sort),
    and no Python UDF or cartesian appears anywhere."""
    from recsys_pipeline_spark.queries_curation import q_bm25_topk

    plan = _final_plan(q_bm25_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()
    # exactly ONE nested-loop join is legal: the broadcast crossJoin of the
    # 1-row corpus-stats frame (the repo's standard scalar pattern); a
    # corpus-sized cartesian would show as a second one or a CartesianProduct
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("BroadcastExchange") >= 2  # df frame + stats scalar
    # the isin filter sits under the explode projection, pre-aggregate
    assert re.search(r"term#\d+ IN \(spark,vector,dup\)", plan) or "IN (spark" in plan


def test_dup_span_coverage_no_cartesian_no_python(spark):
    """Coverage = bounded explodes + keyed joins only: no cartesian, no
    Python, and the documents file is scanned at most twice (occurrence
    mining feeds a lazy checkpoint; the per-doc size side re-reads)."""
    from recsys_pipeline_spark.queries_curation import q_dup_span_coverage

    plan = _final_plan(q_dup_span_coverage(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_multi_query_ann_candidates_broadcast_the_query_side(spark):
    """The ANN report's candidate joins must broadcast the (tiny) query
    memberships / probe table — the corpus side must never shuffle for
    candidate generation."""
    from pyspark.sql import functions as F

    from recsys_pipeline_spark.io import read_table
    from recsys_pipeline_spark.operators import similarity

    emb = read_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").cast("long").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qvec"),
    )
    for cand in (
        similarity.sketch_candidates_multi(emb, queries, bits=4, tables=6, seed=11),
        similarity.ivf_sketch_candidates_multi(emb, queries, cell_bits=3, n_probe=4, seed=7),
    ):
        plan = _final_plan(cand)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


def test_corpus_health_is_single_pass_expand(spark):
    from recsys_pipeline_spark.queries_curation import q_corpus_health

    df = q_corpus_health(spark, SF)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 1  # one ROLLUP pass, not per-level unions
    assert plan.count("FileScan") == 1


def test_bpe_train_no_cartesian_and_broadcast_merge_join(spark):
    """Every bpe_round join is equi-keyed: the 1-row best-pair frame joins
    by BroadcastHashJoin (never a nested loop) and the state rebuild keys on
    (word, pos) — a refactor that degrades either to a cartesian fails.
    The registered query truncates rounds behind checkpoints, so the join
    shape is pinned on one un-truncated bpe_round application."""
    from recsys_pipeline_spark.io import read_table
    from recsys_pipeline_spark.operators import curation

    docs = read_table(spark, SF, "documents")
    state = curation.bpe_char_state(curation.bpe_word_dict(docs))
    _, new_state = curation.bpe_round(state)
    plan = _final_plan(new_state)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_bpe_encode_bounded_corpus_scans(spark):
    """Train+encode reads documents at most twice (word dictionary side +
    doc-words side); the round chain must stay checkpoint-truncated, never
    re-deriving the dictionary per round."""
    from recsys_pipeline_spark.queries_curation import q_bpe_encode

    plan = _final_plan(q_bpe_encode(spark, SF))
    assert plan.count("FileScan") <= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scd2_single_exchange_single_sort_family(spark):
    """The SCD2 build's lag-flag, running sum, and collapse must all ride
    ONE (user) hash exchange — a second Exchange means the window specs
    stopped aligning and the gaps-and-islands idiom broke."""
    from recsys_pipeline_spark.queries_analytics import q_scd2_intervals

    plan = _final_plan(q_scd2_intervals(spark, SF))
    assert len(re.findall(r"\bExchange hashpartitioning", plan)) == 1
    assert plan.count("FileScan") == 1


def test_gapfill_no_rownumber_sort_dedup(spark):
    """The per-(user, day) last observation must stay a max_by AGGREGATE
    (map-side partial combine), never regress to the row_number-over-
    window formulation that full-sorts every event."""
    from recsys_pipeline_spark.queries_analytics import q_daily_gapfill

    plan = _final_plan(q_daily_gapfill(spark, SF))
    assert "row_number" not in plan
    assert "max_by" in plan
    # exactly one Window (the forward fill); the dedup is an aggregate
    assert len(re.findall(r"\bWindow\b", plan)) == 1


def test_fuzzy_pairs_equijoin_on_block_key_no_cartesian(spark):
    """The verify stage must stay an EQUI-join on the block key — a
    cartesian/nested-loop means blocking stopped working and the n² scan
    is back. (At this SF, AQE broadcasts the tiny side and duplicates the
    subtree instead of reusing the _blk exchange; the equi-key is the
    load-bearing property at scale, so that is what gets pinned.)"""
    from recsys_pipeline_spark.queries_analytics import q_fuzzy_part_pairs

    plan = _final_plan(q_fuzzy_part_pairs(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[_blk", plan)


def test_scd2_dim_join_is_join_free(spark):
    """The dim-join consumer must stay the as-of merge-scan (union -> one
    window -> filter): any Join node means the facts x versions range-join
    formulation snuck back in — quadratic in versions per user at scale."""
    from recsys_pipeline_spark.queries_analytics import q_scd2_dim_join

    plan = _final_plan(q_scd2_dim_join(spark, SF))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_rank_auc_det_broadcast_offsets_no_global_sort(spark):
    """The distributed rank-sum ranking stage must keep the two-pass
    shape: the only join is the broadcast of the n_partitions-row offset
    vector, and the prefix window partitions by _pid — never a
    single-partition global window (an empty partitionBy full-sorts the
    corpus in one task)."""
    from recsys_pipeline_spark.io import read_table
    from recsys_pipeline_spark.operators.stats import ranked_score_groups
    from pyspark.sql import functions as F

    ev = read_table(spark, SF, "events").select(
        F.col("event_id").alias("score"),
        (F.col("value") > 100.0).cast("int").alias("label"),
    )
    plan = _final_plan(ranked_score_groups(ev, "score", "label"))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # every Window in the plan rides the pid partitioning (no global sort)
    wins = re.findall(r"Window .*", plan)
    assert wins, plan
    for w in wins:
        assert "_pid" in w, w


def test_cusum_drift_rides_two_exchanges_no_join(spark):
    """CUSUM is pure window algebra: the plan must hold exactly the daily
    aggregate exchange + the user window exchange — no join node (the
    recurrence's closed form needs none) and no global (empty-partitionBy)
    window."""
    from recsys_pipeline_spark.queries_analytics import q_cusum_drift

    plan = _final_plan(q_cusum_drift(spark, SF))
    assert "Join" not in plan, plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2, plan
    for w in re.findall(r"Window .*", plan):
        assert "user_id" in w, w


def test_heavy_hitters_two_passes_and_candidate_broadcast(spark):
    """Sketch-then-verify must stay 2 corpus passes: the visible plan
    scans once (the summary pass materializes at checkpoint time, carrying
    the row totals as key=NULL rows so no third counting pass exists), the
    candidate set joins back by BROADCAST, and no exchange precedes the
    MapInPandas summary stage (the raw key stream never shuffles)."""
    from recsys_pipeline_spark.queries_curation import q_heavy_hitter_grams

    df = q_heavy_hitter_grams(spark, SF)
    plan = _final_plan(df)
    assert plan.count("Scan parquet") == 1, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_segment_quantiles_window_consumes_histogram(spark):
    """The ordered prefix window must run on the per-(segment, value)
    histogram aggregate, not raw customer rows: the plan holds the
    partial+final HashAggregate below the Window, and every window
    partitions by segment (never a global sort)."""
    from recsys_pipeline_spark.queries_analytics import q_segment_quantiles

    plan = _final_plan(q_segment_quantiles(spark, SF))
    assert "HashAggregate" in plan and "Window" in plan
    for w in re.findall(r"Window .*", plan):
        assert "segment" in w, w
    assert "CartesianProduct" not in plan
