"""A/B (r17, VERDICT #3): BPE round-checkpoint cadence — span 1 (every
round, the r16 shape) vs span 2 vs span 3 (one lineage truncation per
loop). localCheckpoint(eager=False) is semantically identity, so outputs
are unchanged at any cadence; what moves is driver-side physical planning
(one call per checkpoint, ~0.5 s/round measured in the r16 survey) and
the number of materialization jobs at execution.

Run via: python tools/ab_bench.py tools.ab_bpe_span [reps] [sf_dir]

RESULT (r17, final): ALL spans > 1 measured negative and per-round
checkpoints stayed everywhere. A first ab_bench run (then FIXED variant
order) read span 2 at 0.92x for bpe_train, but an order-alternating 3-way
rerun reversed it (span 1 min 1.31 vs span 2 min 1.52) and the closing
bench passes agreed — the first reading was position bias (ab_bench now
alternates order per rep). bpe_final_state consumers measured span 2 at
+5% from the start. BPE_CKPT_SPAN stays 1; only the trainer loop reads it.
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from recsys_pipeline_spark.operators import curation  # noqa: E402
from recsys_pipeline_spark.queries_curation import QUERIES_CUR  # noqa: E402


def _with_span(span: int, qname: str):
    def fn(spark, sf_dir):
        saved = curation.BPE_CKPT_SPAN
        curation.BPE_CKPT_SPAN = span
        try:
            return QUERIES_CUR[qname](spark, sf_dir)
        finally:
            curation.BPE_CKPT_SPAN = saved

    return fn


VARIANTS = {}
for q, tag in (("bpe_train", "bt"), ("bpe_encode", "be"),
               ("training_batches", "tb")):
    for span in (1, 2, 3):
        VARIANTS[f"{tag}_s{span}"] = _with_span(span, q)
