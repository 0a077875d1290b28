"""A/B (r16): BPE merge-apply as pure window algebra over the paired frame
(no (word,pos)-keyed joins back to state) vs the current join formulation.

Greedy left-to-right semantics re-expressed windowed: _f marks match
positions, runs are contiguous _f stretches (run start = last head at or
before pos), even parity of (pos - run_start) marks merge starts, lag(_ms)
marks consumed followers. All windows share the word partitioning the
paired frame already established.
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, Window, functions as F  # noqa: E402

from recsys_pipeline_spark.operators import curation  # noqa: E402
from recsys_pipeline_spark.queries_curation import QUERIES_CUR  # noqa: E402

# NOTE: the windowed formulation WON (bt 0.80x / be 0.83x / tb 0.92x mins)
# and was landed as the library implementation, so _ORIG now points at it;
# the *_cur variants only reproduce the historical numbers against a
# checkout predating that commit.
_ORIG = curation._bpe_apply_from_paired


def _bpe_apply_from_paired_win(
    state: DataFrame, paired: DataFrame, pair: DataFrame
) -> DataFrame:
    w_ord = Window.partitionBy("word").orderBy("pos")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    p = paired.join(
        F.broadcast(pair),
        (paired["tok"] == pair["lhs"]) & (paired["nxt"] == pair["rhs"]),
        "left",
    ).select(
        paired["word"],
        paired["wcnt"],
        paired["pos"],
        paired["tok"],
        paired["nxt"],
        pair["lhs"].isNotNull().alias("_f"),
    )
    p = p.withColumn(
        "_head", F.col("_f") & ~F.coalesce(F.lag("_f").over(w_ord), F.lit(False))
    )
    p = p.withColumn(
        "_rs",
        F.last(F.when(F.col("_head"), F.col("pos")), ignorenulls=True).over(w_cum),
    )
    p = p.withColumn("_ms", F.col("_f") & (((F.col("pos") - F.col("_rs")) % 2) == 0))
    p = p.withColumn("_dr", F.coalesce(F.lag("_ms").over(w_ord), F.lit(False)))
    return (
        p.filter(~F.col("_dr"))
        .select(
            "word",
            "wcnt",
            F.row_number().over(w_ord).cast("long").alias("pos"),
            F.when(F.col("_ms"), F.concat("tok", "nxt"))
            .otherwise(F.col("tok"))
            .alias("tok"),
        )
    )


def _with_impl(impl, qname):
    def fn(spark, sf_dir):
        curation._bpe_apply_from_paired = impl
        try:
            return QUERIES_CUR[qname](spark, sf_dir)
        finally:
            curation._bpe_apply_from_paired = _ORIG

    return fn


VARIANTS = {
    "bt_cur": _with_impl(_ORIG, "bpe_train"),
    "bt_win": _with_impl(_bpe_apply_from_paired_win, "bpe_train"),
    "be_cur": _with_impl(_ORIG, "bpe_encode"),
    "be_win": _with_impl(_bpe_apply_from_paired_win, "bpe_encode"),
    "tb_cur": _with_impl(_ORIG, "training_batches"),
    "tb_win": _with_impl(_bpe_apply_from_paired_win, "training_batches"),
}
