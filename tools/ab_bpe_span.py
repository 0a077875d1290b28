"""A/B (r17, VERDICT #3): BPE round-checkpoint cadence — span 1 (every
round, the r16 shape) vs span 2 vs span 3 (one lineage truncation per
loop). localCheckpoint(eager=False) is semantically identity, so outputs
are unchanged at any cadence; what moves is driver-side physical planning
(one call per checkpoint, ~0.5 s/round measured in the r16 survey) and
the number of materialization jobs at execution.

Run via: python tools/ab_bench.py tools.ab_bpe_span [reps] [sf_dir]

RESULT (6 alternating reps, sf0.1, quiet): span 2 won for bpe_train
(min 1.30->1.20, median 1.40->1.25) and LOST for the bpe_final_state
consumers (bpe_encode min 2.29->2.41; training_batches wash), so
BPE_CKPT_SPAN=2 was landed on bpe_train_from_dict only — this harness's
global patch now only moves the trainer loop.
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
