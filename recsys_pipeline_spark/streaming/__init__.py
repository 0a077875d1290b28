"""Structured Streaming surface (SURVEY §2.9).

The reference has no streaming operators — its online path is request/response
— but the engine exposes the streaming re-expression of the same semantics:
the per-user ordered stateful scan (s2_term_trans.py:42-61) as a stateful
streaming aggregation, plus the standard event-time toolkit (watermarked
tumbling/sliding windows, session windows, foreachBatch sinks) and the
curation stage online (curation_stream: state-table per-group admission
caps, prefix-seen negative sampling, and prefix-eval decontamination,
batch-parity tested).
"""
