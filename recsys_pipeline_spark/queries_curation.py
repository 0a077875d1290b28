"""Data-curation queries: the selection/shaping stage of a training-data
pipeline — language rebalancing, per-domain caps, weighted reservoir
sampling, negative sampling, token-budget packing, benchmark
decontamination, domain-mixing weights, per-source boilerplate detection,
quality-ranked token-budget selection, cluster-balanced embedding
sampling, DSIR-style importance weighting, PII redaction, per-column
profiling (exact + HLL++), context-window chunking, snapshot diffing,
vocabulary coverage, rule-gate filtering with drop-reason audit
(`quality_filter`), BPE merge-pair counting (`bpe_pairs`), vocab-id
sequence encoding (`tokenize_ids`), the end-to-end hygiene composite
(`curate_corpus`), its incremental twin over the snapshot delta
(`incremental_curate`), int8 embedding quantization with an error
report (`quantize_embeddings`), CCNet-style bigram-LM perplexity
scoring (`lm_perplexity`), and URL-canonicalization dedup (`url_dedup`)
— over the driver's testdata, each with a bit-exact
DuckDB oracle via the engine-portable md5-fold hash
(operators/dedup.portable_hash64 — see operators/curation.py for why
hash-derived randomness, not rand(seed), is the only kind that survives
AQE re-planning / speculative execution). The only oracle-less entry is
the HLL++ profiling twin (sketches are engine-specific; tolerance-gated
in tests instead).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from recsys_pipeline_spark.io import read_table
from recsys_pipeline_spark.operators import curation, text
from recsys_pipeline_spark import queries_ext as _QX

# DuckDB twin of operators/dedup.portable_hash64 over a salted key
_H = "('0x' || substr(md5({salt} || ':' || CAST({col} AS VARCHAR)), 1, 15))::BIGINT"
_TOKENS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"

# Language rebalance: downsample the over-represented languages, keep the
# rare ones whole (the C4/mC4-style sampling temperature, as fixed rates).
LANG_RATES_PCT = {"en": 50, "de": 60, "zh": 80}
LANG_DEFAULT_PCT = 100
DOMAIN_CAP = 15
PACK_BUDGET = 400  # whitespace tokens per packed sequence
N_ITEMS = 100  # events item vocabulary: props.$.k in [0, 99] at every sf


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample of documents by language — no
    shuffle, pure codegen filter; the same doc keeps/drops on any cluster."""
    d = read_table(spark, sf_dir, "documents")
    out = curation.hash_sample(
        d, "doc_id", stratify_col="lang",
        rates_pct=LANG_RATES_PCT, default_pct=LANG_DEFAULT_PCT,
    )
    return out.select("doc_id", "lang", "source")


_RATE_CASE = "CASE lang " + " ".join(
    f"WHEN '{lang}' THEN {pct}" for lang, pct in LANG_RATES_PCT.items()
) + f" ELSE {LANG_DEFAULT_PCT} END"

SQL_SAMPLE_STRATIFIED = f"""
SELECT doc_id, lang, source FROM documents
WHERE {_H.format(salt="'samp'", col="doc_id")} % 100 < {_RATE_CASE}
"""


def q_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At most DOMAIN_CAP docs per source, hash-uniform without replacement
    — one shuffle on source, per-group top-k by salted hash rank."""
    d = read_table(spark, sf_dir, "documents")
    return curation.cap_per_group(d, "source", "doc_id", DOMAIN_CAP).select(
        "doc_id", "source", "lang"
    )


SQL_CAP_PER_SOURCE = f"""
SELECT doc_id, source, lang FROM (
  SELECT doc_id, source, lang,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {_H.format(salt="'cap'", col="doc_id")} ASC, doc_id ASC
         ) AS rk
  FROM documents
) WHERE rk <= {DOMAIN_CAP}
"""


def q_negative_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One hash-drawn unseen negative item per event (collisions with the
    user's seen set dropped via anti-join — J6 semantics on the training
    side; cites online/main/s1_server.py:24-33 for the serving twin)."""
    ev = read_table(spark, sf_dir, "events")
    # Both the seen set and the candidate side derive from this frame;
    # materialize the parsed projection ONCE (lazy: cached at first use) so
    # the events scan runs once instead of twice — the "write the
    # interactions table" step of an offline pipeline, kept in executor
    # memory here (cluster: checkpoint to storage, same effect). Quiet A/B
    # at sf0.1: 1.33 s -> 0.93 s median (PLANS.md §20).
    inter = ev.select(
        "event_id",
        F.col("user_id").alias("userid"),
        F.get_json_object("props", "$.k").cast("int").alias("itemid"),
    ).localCheckpoint(eager=False)
    neg = curation.negative_sample(inter, "userid", "itemid", "event_id", N_ITEMS)
    return neg.select("event_id", "userid", "itemid")


SQL_NEGATIVE_SAMPLE = f"""
WITH inter AS (
  SELECT event_id, user_id AS userid,
         CAST(json_extract_string(props, '$.k') AS INT) AS itemid
  FROM events
),
seen AS (SELECT DISTINCT userid, itemid FROM inter),
cand AS (
  SELECT event_id, userid,
         CAST({_H.format(salt="'neg'", col="event_id")} % {N_ITEMS} AS INT) AS itemid
  FROM inter
)
SELECT c.event_id, c.userid, c.itemid FROM cand c
ANTI JOIN seen s ON c.userid = s.userid AND c.itemid = s.itemid
"""


def q_pack_token_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing per source stream: bin = the
    PACK_BUDGET-token window the document's start offset lands in; returns
    per-bin shape stats (docs, tokens) — the batch-geometry report a
    pretraining run reads before tokenization."""
    d = read_table(spark, sf_dir, "documents")
    packed = curation.pack_greedy(
        d, "source", "doc_id", text.token_count(F.col("text")), PACK_BUDGET
    )
    return (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(text.token_count(F.col("text"))).alias("total_tokens"),
        )
        .orderBy("source", "bin_id")
    )


SQL_PACK_TOKEN_BINS = f"""
WITH sized AS (
  SELECT source, doc_id, len({_TOKENS}) AS tok FROM documents
),
offs AS (
  SELECT source, tok,
         SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) - tok AS bin_offset
  FROM sized
)
SELECT source, CAST(floor(bin_offset / {PACK_BUDGET}.0) AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS total_tokens
FROM offs GROUP BY 1, 2 ORDER BY 1, 2
"""


DECON_EVAL_PCT = 5
DECON_N = 4  # word-gram width: 8-13 in production; 4 on the short synthetic
# docs so the flagged set is non-trivial (37 of ~475 at sf0.01)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: non-eval docs sharing a word 4-gram with
    the hash-designated eval slice, with the count of distinct shared grams
    — the keep-test-data-out-of-training hygiene pass."""
    d = read_table(spark, sf_dir, "documents")
    return curation.decontaminate_flags(
        d, "doc_id", "text", eval_pct=DECON_EVAL_PCT, n=DECON_N
    )


_GRAMS_N = (
    f"list_transform(range(1, greatest(len(toks) - {DECON_N - 1}, 0) + 1), "
    f"i -> array_to_string(toks[i:i+{DECON_N - 1}], ' '))"
)

SQL_DECONTAMINATE = f"""
WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
g AS (SELECT doc_id, unnest({_GRAMS_N}) AS gram FROM t),
ev AS (SELECT doc_id FROM t
       WHERE {_H.format(salt="'eval'", col="doc_id")} % 100 < {DECON_EVAL_PCT}),
eg AS (SELECT DISTINCT gram FROM g JOIN ev USING (doc_id))
SELECT g.doc_id, count(DISTINCT g.gram) AS n_hits
FROM g ANTI JOIN ev ON g.doc_id = ev.doc_id
JOIN eg ON g.gram = eg.gram
GROUP BY 1
"""


FDECON_EVAL_PCT = 10
FDECON_SHINGLE = 5
FDECON_K, FDECON_BANDS, FDECON_ROWS = 32, 4, 4
FDECON_THRESHOLD = 0.8


def q_fuzzy_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-DUPLICATE benchmark decontamination: non-eval docs whose text
    is a MinHash-banded near-duplicate (verified char-5-shingle Jaccard >=
    0.8) of any hash-designated eval doc — the fuzzy complement of
    q_decontaminate's exact 4-gram overlap (exact grams miss reformatted
    or lightly paraphrased test items; this pass catches them the way
    near-dup dedup catches rewrapped documents). Fully portable-hashed so
    the DuckDB oracle reproduces signatures, banding, candidates AND the
    verified Jaccard values."""
    d = read_table(spark, sf_dir, "documents")
    return curation.fuzzy_decontaminate_flags(
        d, "doc_id", "text",
        eval_pct=FDECON_EVAL_PCT, k=FDECON_K, bands=FDECON_BANDS,
        rows=FDECON_ROWS, shingle_n=FDECON_SHINGLE,
        threshold=FDECON_THRESHOLD, portable=True,
    )


def _fuzzy_decon_sql() -> str:
    """DuckDB replica of q_fuzzy_decontaminate (same universal-hash
    constants and band layout as queries_ext._minhash_sql, plus the eval
    hash designation)."""
    from recsys_pipeline_spark.operators import dedup as _dd

    params = _dd._hash_params(FDECON_K)
    p = _dd._P
    sh = FDECON_SHINGLE
    mins = ", ".join(
        f"MIN(({a} * h + {b}) % {p}) AS m{i}" for i, (a, b) in enumerate(params)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_id, ('0x' || substr(md5(concat_ws(':', {cols})), 1, 15))::BIGINT AS band_hash FROM fsig".format(
            b=b,
            cols=", ".join(f"m{b * FDECON_ROWS + r}" for r in range(FDECON_ROWS)),
        )
        for b in range(FDECON_BANDS)
    )
    ev = f"{_H.format(salt=chr(39) + 'eval' + chr(39), col='doc_id')} % 100 < {FDECON_EVAL_PCT}"
    return f"""
WITH fpos AS (
  SELECT doc_id, text, unnest(range(1, greatest(length(text) - {sh - 1}, 1) + 1)) AS i FROM documents
),
fh AS (
  SELECT doc_id, ('0x' || substr(md5(substr(text, i, {sh})), 1, 15))::BIGINT % {p} AS h FROM fpos
),
fsig AS (SELECT doc_id, {mins} FROM fh GROUP BY doc_id),
fbands AS ({band_selects}),
fev AS (SELECT doc_id FROM documents WHERE {ev}),
fcand AS (
  SELECT DISTINCT t.doc_id, e.doc_id AS eval_id
  FROM fbands t JOIN fbands e ON t.band_id = e.band_id AND t.band_hash = e.band_hash
  JOIN fev ON e.doc_id = fev.doc_id
  ANTI JOIN fev x ON t.doc_id = x.doc_id
),
fsh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(length(text) - {sh - 1}, 0) + 1), i -> substr(text, i, {sh}))) AS s
  FROM documents
),
fver AS (
  -- zero-union convention shared with dedup.jaccard: both shingle sets
  -- empty (sub-shingle-length texts that still band-collided) -> 1.0
  -- exact dups, never 0/0 = NaN (which DuckDB sorts above all numbers)
  SELECT c.doc_id,
         CASE WHEN len(list_distinct(list_concat(sa.s, sb.s))) = 0 THEN 1.0
              ELSE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                   / len(list_distinct(list_concat(sa.s, sb.s))) END AS j
  FROM fcand c JOIN fsh sa ON c.doc_id = sa.doc_id JOIN fsh sb ON c.eval_id = sb.doc_id
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_eval_matches, max(j) AS max_jaccard
FROM fver WHERE j >= {FDECON_THRESHOLD}
GROUP BY 1
"""


BOILER_N = 2  # word-gram width for template detection (docs here are short;
# production uses whole lines — same relational shape, different unit)
BOILER_SHARE_PCT = 15  # gram in >= 15% of a source's docs => boilerplate
BUDGET_PCT = 60  # token-budget selection keeps the best 60% of corpus tokens


def q_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source template detection: flag documents carrying word 2-grams
    that appear in >= 15% of their source's documents (the line-dedup /
    boilerplate-removal hygiene step, gram-unit on this corpus)."""
    d = read_table(spark, sf_dir, "documents")
    return curation.boilerplate_flags(
        d, "doc_id", "text", "source", n=BOILER_N, share_pct=BOILER_SHARE_PCT
    )


_GRAMS_2 = (
    f"list_transform(range(1, greatest(len(toks) - {BOILER_N - 1}, 0) + 1), "
    f"i -> array_to_string(toks[i:i+{BOILER_N - 1}], ' '))"
)

SQL_BOILERPLATE_NGRAMS = f"""
WITH t AS (SELECT doc_id, source, {_TOKENS} AS toks FROM documents),
g AS (SELECT DISTINCT doc_id, source, unnest({_GRAMS_2}) AS gram FROM t),
sz AS (SELECT source, count(DISTINCT doc_id) AS n_docs FROM t GROUP BY 1),
dfq AS (SELECT source, gram, count(*) AS df FROM g GROUP BY 1, 2),
boiler AS (
  SELECT source, gram FROM dfq JOIN sz USING (source)
  WHERE df * 100 >= {BOILER_SHARE_PCT} * n_docs
),
per_doc AS (SELECT doc_id, source, count(*) AS n_grams FROM g GROUP BY 1, 2),
hits AS (
  SELECT doc_id, count(*) AS n_boiler
  FROM g JOIN boiler USING (source, gram) GROUP BY 1
)
SELECT doc_id, source, n_grams, n_boiler FROM per_doc JOIN hits USING (doc_id)
"""


def q_select_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked selection of the best BUDGET_PCT% of corpus tokens
    (lexical-diversity score, deterministic hash tiebreak) — computed with
    the bucket-cutoff plan, no global sort (operators/curation.py)."""
    d = read_table(spark, sf_dir, "documents")
    return curation.select_token_budget(d, "doc_id", "text", BUDGET_PCT)


SQL_SELECT_TOKEN_BUDGET = f"""
WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
sized AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS tok,
         CAST(len(list_distinct(toks)) AS BIGINT) AS dis
  FROM t WHERE len(toks) > 0
),
q AS (
  SELECT doc_id, tok, (dis * 1000) // tok AS qscore,
         {_H.format(salt="'sel'", col="doc_id")} AS h
  FROM sized
),
tot AS (SELECT (SUM(tok) * {BUDGET_PCT}) // 100 AS b FROM q),
o AS (
  SELECT doc_id, tok, qscore,
         SUM(tok) OVER (ORDER BY qscore DESC, h ASC, doc_id ASC
                        ROWS UNBOUNDED PRECEDING) AS run
  FROM q
)
SELECT doc_id, qscore, tok AS n_tokens FROM o, tot WHERE run <= b
"""


BAL_BITS = 4  # 2^4 sketch cells — the deterministic IVF coarse quantizer
BAL_SEED = 13
BAL_K = 20  # survivors per cell (500 vectors / 16 cells => the cap bites)
EMB_DIM = 64  # embeddings table width (TESTDATA.md)


def q_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced sampling over the embedding space: a deterministic
    hyperplane sketch assigns each vector one of 2^BAL_BITS cells (the same
    coarse quantizer the sketch-IVF ANN uses), then at most BAL_K vectors
    per cell survive, hash-uniform — the diversity-preserving selection
    step (SemDeDup-flavored: cap dense regions instead of sampling every
    region proportionally). Scale: the sketch is one Arrow pass, the cap is
    one shuffle on the cell key with the engine's map-side WindowGroupLimit
    bounding what dense cells ship."""
    from recsys_pipeline_spark.operators.dedup import (
        sketch_memberships,
        sketch_planes,
    )

    e = read_table(spark, sf_dir, "embeddings")
    planes = sketch_planes(EMB_DIM, bits=BAL_BITS, tables=1, seed=BAL_SEED)
    mem = sketch_memberships(e, planes, with_vec=False).select(
        F.col("_id").alias("vec_id"), F.col("sketch").cast("long").alias("cell")
    )
    return curation.cap_per_group(mem, "cell", "vec_id", BAL_K, salt="bal").select(
        "vec_id", "cell"
    )


def _sql_cluster_balanced_sample() -> str:
    from recsys_pipeline_spark.queries_ext import _sketch_mem_sql

    return f"""
WITH mem AS ({_sketch_mem_sql(bits=BAL_BITS, tables=1, seed=BAL_SEED, dim=EMB_DIM)})
SELECT vec_id, cell FROM (
  SELECT vec_id, sketch AS cell,
         row_number() OVER (PARTITION BY sketch
           ORDER BY {_H.format(salt="'bal'", col="vec_id")} ASC, vec_id ASC) AS rk
  FROM mem
) WHERE rk <= {BAL_K}
"""


IW_TARGET_LANG = "en"  # the high-quality reference slice for importance scoring


def q_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-flavored importance scores: per-doc average token log-likelihood
    ratio between the English slice's unigram distribution (the reference
    corpus stand-in) and the whole corpus — the up-weight-what-looks-like-
    the-target data-selection signal (feeds hash_sample rates the same way
    mixture_weights does)."""
    d = read_table(spark, sf_dir, "documents")
    return curation.importance_weights(
        d, "doc_id", "text", F.col("lang") == IW_TARGET_LANG
    )


SQL_IMPORTANCE_WEIGHTS = f"""
WITH t AS (
  SELECT doc_id, lang = '{IW_TARGET_LANG}' AS is_tgt, unnest({_TOKENS}) AS tok
  FROM documents
),
stats AS (
  SELECT tok, count(*) AS c_all,
         SUM(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS c_tgt
  FROM t GROUP BY 1
),
tot AS (SELECT SUM(c_all) AS c_all_t, SUM(c_tgt) AS c_tgt_t, COUNT(*) AS v FROM stats)
-- per-token LLR pre-rounded to a scaled 1e-12 integer and summed exactly,
-- mirroring the Spark operator: integer Σ is order-independent, so neither
-- engine's scan/partition order can flip the 6dp rounding
SELECT doc_id, COUNT(*) AS n_tokens,
       round(CAST(SUM(CAST(round(
               (ln(c_tgt + 1.0) - ln(c_tgt_t + v) - ln(c_all + 1.0) + ln(c_all_t + v))
               * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 / COUNT(*), 6) AS weight
FROM t JOIN stats USING (tok), tot
GROUP BY doc_id
"""


PROFILE_COLS = ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile (row count, null count, exact
    distinct count) — the ingestion health report every pipeline run
    records before training reads the data. One scan + one aggregate
    (multiple exact distincts share a single Expand pass); the 1-row
    result unpivots to long form without leaving the executors.

    Scale: exact count_distinct is the oracle-checkable form; at 100 TB a
    profiling job swaps it for the HLL++ sketch (operators/stats.py,
    `salted_group_sum`/approx family) at a documented error bound — the
    query shape is otherwise identical. (Registered in this module so it
    merges after the recorded window; see __spark_entry__.queries().)
    """
    o = read_table(spark, sf_dir, "orders")
    agg = o.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_null_{c}")
            for c in PROFILE_COLS
        ],
        *[F.count_distinct(F.col(c)).alias(f"_dist_{c}") for c in PROFILE_COLS],
    )
    cols = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null_{c}").alias("n_null"),
                F.col(f"_dist_{c}").alias("n_distinct"),
            )
            for c in PROFILE_COLS
        ]
    )
    return agg.select(F.explode(cols).alias("s")).select("s.*")


SQL_PROFILE_ORDERS = " UNION ALL ".join(
    f"""SELECT '{c}' AS column_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct FROM orders"""
    for c in PROFILE_COLS
)

APPROX_RSD = 0.02  # HLL++ relative standard deviation (the 100 TB default)


def q_approx_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of `profile_orders`: identical query shape with the
    exact count_distinct swapped for the HyperLogLog++ sketch
    (`approx_count_distinct`, rsd=2%) — constant accumulator memory and NO
    per-column de-dup Expand/shuffle, which is what makes a profiling pass
    affordable over a full corpus. The docstring claim on `profile_orders`
    is thereby executable, not aspirational. Sketch internals are
    engine-specific, so this entry carries no SQL oracle (driver records
    rows+schema); value coverage is the tolerance gate vs the exact twin in
    tests/test_curation.py and the observed sf0.1 error in PLANS.md."""
    o = read_table(spark, sf_dir, "orders")
    agg = o.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_null_{c}")
            for c in PROFILE_COLS
        ],
        *[
            F.approx_count_distinct(F.col(c), rsd=APPROX_RSD).alias(f"_dist_{c}")
            for c in PROFILE_COLS
        ],
    )
    cols = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null_{c}").alias("n_null"),
                F.col(f"_dist_{c}").alias("n_distinct"),
            )
            for c in PROFILE_COLS
        ]
    )
    return agg.select(F.explode(cols).alias("s")).select("s.*")


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing, driver-verifiable end to end: the testdata plants no
    PII, so the query SYNTHESIZES deterministic PII-shaped strings from
    doc_id (an email for doc_id%3==0, an SSN shape for %5==0, a phone shape
    for %7==0 — pure functions of the row, bit-identical in DuckDB), then
    runs operators/text.redact_pii and emits the per-kind counts plus the
    fully redacted text. The value hash therefore covers the regex chain's
    OUTPUT (clean text + counts), not just row shape — the sequential
    count-then-replace discipline (SSN redacted before the phone pattern
    can swallow it) is exactly what the oracle reproduces.

    Scale: pure regexp codegen over the scan — no shuffle, no UDF."""
    d = read_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 3 == 0,
                F.concat(
                    F.lit(" contact user"), did.cast("string"), F.lit("@example.com")
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 5 == 0,
                F.concat(
                    F.lit(" ssn "),
                    F.lpad((did % 1000).cast("string"), 3, "0"),
                    F.lit("-"),
                    F.lpad((did % 100).cast("string"), 2, "0"),
                    F.lit("-"),
                    F.lpad((did % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 7 == 0,
                F.concat(
                    F.lit(" call +1 "),
                    F.lpad((did % 1000).cast("string"), 3, "0"),
                    F.lit(" 555 "),
                    F.lpad((did % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = text.redact_pii(planted, "text", "clean")
    return out.select("doc_id", "n_email", "n_ssn", "n_phone", "clean")


def _sql_pii_redaction() -> str:
    # Same patterns, same sequential order (operators/text.PII_PATTERNS is
    # RE2-safe by design so the identical strings run in both engines);
    # counts are taken on the text as it stood BEFORE that kind's replace.
    pats = text.PII_PATTERNS
    plant = """
SELECT doc_id, text
  || CASE WHEN doc_id % 3 = 0
     THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
     ELSE '' END
  || CASE WHEN doc_id % 5 = 0
     THEN ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
       || '-' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
       || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
     ELSE '' END
  || CASE WHEN doc_id % 7 = 0
     THEN ' call +1 ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
       || ' 555 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
     ELSE '' END AS t0
FROM documents"""
    sql = f"WITH s0 AS ({plant})"
    prev = "s0"
    cur_text = "t0"
    carried: list[str] = []
    for i, (kind, pat) in enumerate(pats.items(), start=1):
        lit = pat.replace("'", "''")
        nxt_text = f"t{i}"
        cols = ", ".join(["doc_id", *carried])
        sql += f""",
s{i} AS (
  SELECT {cols},
         len(regexp_extract_all({cur_text}, '{lit}')) AS n_{kind},
         regexp_replace({cur_text}, '{lit}', '[PII]', 'g') AS {nxt_text}
  FROM {prev}
)"""
        carried.append(f"n_{kind}")
        prev, cur_text = f"s{i}", nxt_text
    counts = ", ".join(carried)
    return f"{sql}\nSELECT doc_id, {counts}, {cur_text} AS clean FROM {prev}"


CHUNK_TOKENS = 64  # context-window shard size (whitespace tokens)
CHUNK_OVERLAP = 16  # tokens shared between consecutive chunks (stride 48)


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window sharding: every document split into 64-token windows
    with 16-token overlap (final chunk short) — the corpus→training-sequence
    step; zero shuffles, explode bounded by ceil(len/stride) per doc."""
    d = read_table(spark, sf_dir, "documents")
    return curation.chunk_documents(
        d, "doc_id", "text", CHUNK_TOKENS, CHUNK_OVERLAP
    )


_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP

SQL_DOC_CHUNKS = f"""
WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
nz AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
g AS (SELECT doc_id, toks,
             unnest(range(0, greatest(len(toks) - {CHUNK_OVERLAP}, 1),
                          {_STRIDE})) AS st
      FROM nz)
SELECT doc_id,
       CAST(st // {_STRIDE} AS INT) AS chunk_id,
       CAST(st AS INT) AS start_tok,
       CAST(least({CHUNK_TOKENS}, len(toks) - st) AS INT) AS n_tokens,
       array_to_string(toks[st + 1 : st + {CHUNK_TOKENS}], ' ') AS chunk_text
FROM g
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version diff between the corpus and a deterministically
    derived next snapshot (doc_id%17==0 deleted, %10==0 revised, %23==0
    spawns a new id) — added/removed/changed by content fingerprint; the
    incremental-reprocessing primitive. Unchanged keys emit nothing."""
    d = read_table(spark, sf_dir, "documents")
    base = d.select("doc_id", "text", "lang")
    return curation.snapshot_diff(
        base, _next_snapshot(base), "doc_id", ["text", "lang"]
    )


def _next_snapshot(base: DataFrame) -> DataFrame:
    """The deterministically derived next dataset version shared by
    snapshot_diff and profile_drift: doc_id%17==0 deleted, %10==0 revised,
    %23==0 spawns a new id with lang 'xx'."""
    did = F.col("doc_id")
    revised = base.filter(did % 17 != 0).select(
        "doc_id",
        F.when(did % 10 == 0, F.concat(F.col("text"), F.lit(" rev2")))
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
    )
    fresh = base.filter(did % 23 == 0).select(
        (did + 100000).alias("doc_id"),
        F.concat(F.lit("fresh "), F.col("text")).alias("text"),
        F.lit("xx").alias("lang"),
    )
    return revised.unionByName(fresh)


SQL_SNAPSHOT_DIFF = """
WITH a AS (SELECT doc_id, text, lang FROM documents),
b AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0 THEN text || ' rev2' ELSE text END AS text,
         lang
  FROM documents WHERE doc_id % 17 <> 0
  UNION ALL
  SELECT doc_id + 100000, 'fresh ' || text, 'xx'
  FROM documents WHERE doc_id % 23 = 0
),
fa AS (SELECT doc_id, md5(CASE WHEN text IS NULL THEN '-' ELSE md5(text) END
                          || CASE WHEN lang IS NULL THEN '-' ELSE md5(lang) END)
         AS fp FROM a),
fb AS (SELECT doc_id, md5(CASE WHEN text IS NULL THEN '-' ELSE md5(text) END
                          || CASE WHEN lang IS NULL THEN '-' ELSE md5(lang) END)
         AS fp FROM b)
SELECT coalesce(fa.doc_id, fb.doc_id) AS doc_id,
       CASE WHEN fa.doc_id IS NULL THEN 'added'
            WHEN fb.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM fa FULL OUTER JOIN fb ON fa.doc_id = fb.doc_id
WHERE fa.doc_id IS NULL OR fb.doc_id IS NULL OR fa.fp <> fb.fp
"""


def q_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation-pipeline COMPOSITE — the hygiene stage a pretraining run
    executes end to end, as one query (the curation counterpart of the
    serving composite `recommend_top50_det`):

      exact dedup (keep first per md5 fingerprint)
      → benchmark decontamination (drop the hash-designated eval slice AND
        every doc sharing a word 4-gram with it)
      → quality-ranked token-budget selection (best 60% of clean tokens,
        bucket-cutoff plan — no global sort)
      → context-window chunking (64-token windows, 16 overlap)

    Emits one row per training chunk: (doc_id, chunk_id, start_tok,
    n_tokens, chunk_text, qscore). Every stage is the already-verified
    operator, so the composed DuckDB oracle is a CTE chain of the same
    algebra — the hash compare covers the whole pipeline's output.

    Scale: the survivor and clean frames are materialized once
    (lazy localCheckpoint — 2-3 consumers each; a cluster run writes these
    as staging tables, same effect); the stages add one md5-key shuffle
    (dedup), gram-join shuffles sized by AQE (decon), the tiny cell-frame
    window (selection), and a shuffle-free chunk explode.
    """
    from recsys_pipeline_spark.operators import dedup

    d = read_table(spark, sf_dir, "documents")
    survivors = dedup.exact_dedup_keep(
        d.select("doc_id", "text"), "doc_id"
    ).localCheckpoint(eager=False)
    flags = curation.decontaminate_flags(
        survivors, "doc_id", "text", eval_pct=DECON_EVAL_PCT, n=DECON_N
    )
    is_eval = curation.hash_bucket(F.col("doc_id"), "eval") < DECON_EVAL_PCT
    clean = (
        survivors.filter(~is_eval)
        .join(flags.select("doc_id"), "doc_id", "left_anti")
        .localCheckpoint(eager=False)
    )
    sel = curation.select_token_budget(clean, "doc_id", "text", BUDGET_PCT)
    kept = clean.join(sel.select("doc_id", "qscore"), "doc_id")
    chunks = curation.chunk_documents(
        kept.select("doc_id", "text"), "doc_id", "text", CHUNK_TOKENS, CHUNK_OVERLAP
    )
    return chunks.join(sel.select("doc_id", "qscore"), "doc_id")


SQL_CURATE_CORPUS = f"""
WITH t0 AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
fp AS (SELECT doc_id, toks,
              md5(array_to_string(toks, ' ')) AS fp FROM t0),
keepers AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY fp),
surv AS (SELECT f.doc_id, f.toks FROM fp f JOIN keepers k USING (doc_id)),
g AS (SELECT doc_id, unnest({_GRAMS_N}) AS gram FROM surv),
ev AS (SELECT doc_id FROM surv
       WHERE {_H.format(salt="'eval'", col="doc_id")} % 100 < {DECON_EVAL_PCT}),
eg AS (SELECT DISTINCT gram FROM g JOIN ev USING (doc_id)),
flagged AS (
  SELECT DISTINCT g.doc_id FROM g
  ANTI JOIN ev ON g.doc_id = ev.doc_id
  JOIN eg ON g.gram = eg.gram
),
clean AS (
  SELECT s.doc_id, s.toks FROM surv s
  ANTI JOIN ev ON s.doc_id = ev.doc_id
  ANTI JOIN flagged ON s.doc_id = flagged.doc_id
),
sized AS (
  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS tok,
         CAST(len(list_distinct(toks)) AS BIGINT) AS dis
  FROM clean WHERE len(toks) > 0
),
q AS (
  SELECT doc_id, toks, tok, (dis * 1000) // tok AS qscore,
         {_H.format(salt="'sel'", col="doc_id")} AS h
  FROM sized
),
tot AS (SELECT (SUM(tok) * {BUDGET_PCT}) // 100 AS b FROM q),
o AS (
  SELECT doc_id, toks, qscore,
         SUM(tok) OVER (ORDER BY qscore DESC, h ASC, doc_id ASC
                        ROWS UNBOUNDED PRECEDING) AS run
  FROM q
),
selq AS (SELECT doc_id, toks, qscore FROM o, tot WHERE run <= b),
gch AS (
  SELECT doc_id, qscore, toks,
         unnest(range(0, greatest(len(toks) - {CHUNK_OVERLAP}, 1),
                      {_STRIDE})) AS st
  FROM selq
)
SELECT doc_id,
       CAST(st // {_STRIDE} AS INT) AS chunk_id,
       CAST(st AS INT) AS start_tok,
       CAST(least({CHUNK_TOKENS}, len(toks) - st) AS INT) AS n_tokens,
       array_to_string(toks[st + 1 : st + {CHUNK_TOKENS}], ' ') AS chunk_text,
       qscore
FROM gch
"""


WSAMP_K = 25  # weighted sample size per language


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At most 25 docs per language, inclusion probability proportional to
    document length (n_chars) — Efraimidis-Spirakis exponential keys over
    hash-derived uniforms; deterministic, rerun-stable, map-side-limited
    like cap_per_source."""
    d = read_table(spark, sf_dir, "documents")
    return curation.weighted_sample_per_group(
        d, "lang", "doc_id", "n_chars", WSAMP_K
    ).select("doc_id", "lang", "n_chars")


SQL_WEIGHTED_SAMPLE = f"""
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY ln(CAST({_H.format(salt="'wsamp'", col="doc_id")} + 1 AS DOUBLE)
                       / 1152921504606846976) / CAST(n_chars AS DOUBLE) DESC,
                    doc_id ASC
         ) AS rk
  FROM documents WHERE n_chars > 0
) WHERE rk <= {WSAMP_K}
"""


VOCAB_SIZE = 20  # vocabulary budget: the synthetic corpus has 31 distinct
# tokens, so 20 makes the cap BITE and the OOV path carry real signal
# (production budgets are 32k-256k; the relational shape is identical)


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary fit report: build the top-VOCAB_SIZE token
    vocabulary by corpus frequency (ties broken lexically — deterministic)
    and measure per-language OOV occurrence rates — the
    does-this-vocab-serve-every-language check a multilingual pretraining
    run makes before freezing a tokenizer. All integers (rate in ppm via
    integer div), so the oracle is bit-exact.

    Scale: one tokenize+explode pass materialized once (two consumers:
    vocab build + coverage count); the vocab is top-k via sort+limit —
    Spark plans TakeOrderedAndProject (per-partition heads + driver merge
    of k rows), NOT a global sort — and re-joins as a broadcast
    (VOCAB_SIZE rows by construction). Coverage is one grouped agg on lang.
    """
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang", F.explode(text.tokens(F.col("text"))).alias("tok")
    ).localCheckpoint(eager=False)
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .orderBy(F.col("_cnt").desc(), F.col("tok").asc())
        .limit(VOCAB_SIZE)
        .select("tok")
    )
    flagged = toks.join(
        F.broadcast(vocab.withColumn("_in", F.lit(1))), "tok", "left"
    )
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).alias("n_oov"),
        F.expr(
            "(sum(CASE WHEN _in IS NULL THEN 1 ELSE 0 END) * 1000000)"
            " div count(1)"
        ).alias("oov_ppm"),
    )


SQL_VOCAB_COVERAGE = f"""
WITH t AS (SELECT lang, unnest({_TOKENS}) AS tok FROM documents),
vocab AS (
  SELECT tok FROM (
    SELECT tok, count(*) AS cnt FROM t GROUP BY 1
    ORDER BY cnt DESC, tok ASC LIMIT {VOCAB_SIZE}
  )
)
SELECT lang, count(*) AS n_tokens,
       CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       CAST((SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) * 1000000)
            // count(*) AS BIGINT) AS oov_ppm
FROM t LEFT JOIN vocab v USING (tok)
GROUP BY lang
"""


MIX_ALPHA_SQRT = True  # temperature alpha = 0.5 (sqrt), the mC4-style default


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing weights: per-source token mass raised to temperature
    alpha=0.5 and normalized — the up-weight-the-tail mixing step a
    multi-source pretraining corpus applies before sampling (feeds
    hash_sample's per-stratum rates). sqrt is correctly-rounded IEEE in both
    engines; the 20-term normalizing sum is order-dependent in its last ulp,
    so the weight is rounded to 9 dp (~7 orders above that noise — the
    tfidf_doc_terms discipline).

    Scale: one shuffle to the per-source token counts (tiny), then a scalar
    broadcast of the normalizer — no second pass over the corpus.
    """
    d = read_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.sum(text.token_count(F.col("text"))).alias("n_tokens")
    )
    norm = per_src.agg(
        F.sum(F.sqrt(F.col("n_tokens").cast("double"))).alias("_z")
    )
    return (
        per_src.crossJoin(F.broadcast(norm))
        .select(
            "source",
            "n_tokens",
            F.round(
                F.sqrt(F.col("n_tokens").cast("double")) / F.col("_z"), 9
            ).alias("weight"),
        )
    )


SQL_MIXTURE_WEIGHTS = f"""
WITH per_src AS (
  SELECT source, CAST(SUM(len({_TOKENS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
norm AS (SELECT SUM(sqrt(CAST(n_tokens AS DOUBLE))) AS _z FROM per_src)
SELECT source, n_tokens,
       round(sqrt(CAST(n_tokens AS DOUBLE)) / _z, 9) AS weight
FROM per_src, norm
"""


# quality_filter thresholds: chosen so every rule fires on SOME testdata
# documents (token counts run 10-99, mean token length x100 runs 370-530,
# ~9% of docs carry zero English stopwords, dup-3-gram ppm tops out ~71k)
# — a gate whose rules never bite tests nothing.
QF_MIN_TOKENS = 25
QF_MAX_TOKENS = 90
QF_MTL_MIN_X100 = 380
QF_MTL_MAX_X100 = 520
QF_DUP3_PPM_MAX = 20000


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-gate audit: per-document keep/drop decision with the firing
    rules spelled out (`drop_reasons`) — the audit trail a production
    curation run logs so a later "why did we lose 12% of source X?" has an
    answer. Signals and thresholds are all integers; see
    operators/curation.quality_gate for the plan-shape discussion."""
    d = read_table(spark, sf_dir, "documents")
    return curation.quality_gate(
        d,
        "doc_id",
        "text",
        min_tokens=QF_MIN_TOKENS,
        max_tokens=QF_MAX_TOKENS,
        min_mtl_x100=QF_MTL_MIN_X100,
        max_mtl_x100=QF_MTL_MAX_X100,
        dup3_ppm_max=QF_DUP3_PPM_MAX,
    )


_STOP_EN = "('the','a','of','and','to','in','is','it','that','for')"

# t/sig/d/r CTE chain shared with composed oracles (training_batches)
_QF_CTES = f"""t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
sig AS (
  SELECT doc_id, len(toks) AS n_tokens,
         CASE WHEN len(toks) > 0
              THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
                   * 100 // len(toks)
              ELSE 0 END AS mean_tok_len_x100,
         len(list_filter(toks, x -> x IN {_STOP_EN})) AS stop_hits,
         CASE WHEN len(toks) >= 3 THEN list_transform(
                range(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
              ELSE [] END AS grams
  FROM t
),
d AS (
  SELECT doc_id, n_tokens, mean_tok_len_x100, stop_hits,
         CASE WHEN len(grams) > 0
              THEN (len(grams) - len(list_distinct(grams))) * 1000000
                   // len(grams)
              ELSE 0 END AS dup3_ppm
  FROM sig
),
r AS (
  SELECT *, rtrim(
    (CASE WHEN n_tokens < {QF_MIN_TOKENS} THEN 'too_short,' ELSE '' END) ||
    (CASE WHEN n_tokens > {QF_MAX_TOKENS} THEN 'too_long,' ELSE '' END) ||
    (CASE WHEN mean_tok_len_x100 < {QF_MTL_MIN_X100}
            OR mean_tok_len_x100 > {QF_MTL_MAX_X100}
          THEN 'word_len,' ELSE '' END) ||
    (CASE WHEN stop_hits = 0 THEN 'no_stopword,' ELSE '' END) ||
    (CASE WHEN dup3_ppm > {QF_DUP3_PPM_MAX} THEN 'repetitive,' ELSE '' END),
    ',') AS drop_reasons
  FROM d
)"""

SQL_QUALITY_FILTER = f"""
WITH {_QF_CTES}
SELECT doc_id, n_tokens, mean_tok_len_x100, stop_hits, dup3_ppm, drop_reasons,
       CASE WHEN drop_reasons = '' THEN 1 ELSE 0 END AS keep
FROM r
"""


def q_tokenize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenize stage itself: encode every document into its vocab-id
    sequence (ids 1..VOCAB_SIZE assigned by corpus frequency, lexical
    tie-break; OOV → 0) — the step that turns curated text into the
    integer sequences pack_token_bins / doc_chunks consume. Order inside
    the sequence is the document's token order, reconstructed from
    explode positions (deterministic — never collection order).

    Scale: one tokenize+posexplode pass materialized once (two consumers:
    vocab build + encoding); the vocab is top-k via sort+limit
    (TakeOrderedAndProject — per-partition heads, no global sort) and its
    id assignment is a row_number over the POST-LIMIT k-row frame (a
    driver-sized window, not a corpus sort); the encode join broadcasts
    the k-row vocab; the re-group collects (pos, id) structs per doc —
    ONE exchange on the id, array size bounded by document length.

    Output shape: the sequence is emitted as a CSV string
    (``token_seq_csv``), not ARRAY<INT> — the driver-harness contract is
    scalar columns only (its pandas canonicalizer cannot sort list cells;
    CORRECTNESS_r11 recorded exactly that err). Downstream consumers
    (pack_token_bins / doc_chunks) keep the raw-array form via
    curation.encode_token_ids directly.
    """
    d = read_table(spark, sf_dir, "documents")
    base = curation.token_positions(d, "doc_id", "text").localCheckpoint(
        eager=False
    )
    counts = base.groupBy("tok").agg(F.count(F.lit(1)).alias("_cnt"))
    vocab = curation.vocab_topk(counts, VOCAB_SIZE)
    enc = curation.encode_token_ids(base, vocab, "doc_id")
    return enc.select(
        "doc_id",
        F.array_join(F.col("token_ids").cast("array<string>"), ",").alias(
            "token_seq_csv"
        ),
        "n_tokens",
        "n_oov",
    )


SQL_TOKENIZE_IDS = f"""
WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
p AS (SELECT doc_id, unnest(range(1, len(toks) + 1)) AS pos, toks FROM t),
e AS (SELECT doc_id, pos, toks[pos] AS tok FROM p),
v AS (
  SELECT tok, CAST(row_number() OVER (ORDER BY cnt DESC, tok ASC) AS INT)
           AS tok_id
  FROM (SELECT tok, count(*) AS cnt FROM e GROUP BY 1
        ORDER BY cnt DESC, tok ASC LIMIT {VOCAB_SIZE})
)
SELECT doc_id,
       array_to_string(
         list(CAST(coalesce(tok_id, 0) AS INT) ORDER BY pos), ','
       ) AS token_seq_csv,
       count(*) AS n_tokens,
       CAST(SUM(CASE WHEN tok_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov
FROM e LEFT JOIN v USING (tok)
GROUP BY doc_id
"""


BPE_TOP_PAIRS = 20


def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training, the distributed core: count adjacent character
    pairs inside whitespace words across the corpus and return the top
    merge candidates — one BPE iteration's statistics (the full trainer
    re-runs this count after each merge). Ties break lexically so the
    top-k cutoff is deterministic in both engines.

    Scale: words explode map-side off the scan; the pair projection is
    position-explode + substr (pure codegen, the MinHash-lesson shape —
    no per-row higher-order transforms); pair cardinality is bounded by
    charset² so the partial (map-side) aggregation collapses each
    partition to a tiny dictionary before ONE small shuffle, and the
    top-k is TakeOrderedAndProject (per-partition heads merged on the
    driver, k rows — no global sort)."""
    from recsys_pipeline_spark.operators import text as T

    d = read_table(spark, sf_dir, "documents")
    words = d.select(F.explode(T.tokens(F.col("text"))).alias("word"))
    pairs = words.select(
        F.explode(
            F.when(
                F.length("word") >= 2,
                F.sequence(F.lit(1), F.length("word") - 1),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("i"),
        "word",
    ).select(F.substr(F.col("word"), F.col("i"), F.lit(2)).alias("pair"))
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair").asc())
        .limit(BPE_TOP_PAIRS)
    )


SQL_BPE_PAIRS = f"""
WITH w AS (SELECT unnest({_TOKENS}) AS word FROM documents),
p AS (
  SELECT substr(word, CAST(i AS INT), 2) AS pair
  FROM (SELECT word, unnest(range(1, length(word))) AS i FROM w)
)
SELECT pair, count(*) AS cnt
FROM p GROUP BY 1
ORDER BY cnt DESC, pair ASC
LIMIT {BPE_TOP_PAIRS}
"""


def q_incremental_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental re-curation — the reason snapshot_diff exists: diff the
    corpus against its next snapshot (same synthetic derivation as
    `snapshot_diff`), then run the hygiene stage (quality gate + context-
    window chunking) ONLY on the added/changed documents. Emits one row
    per delta doc: its diff status, the gate verdict, and how many
    training chunks it yields (0 when dropped) — the per-increment
    processing report. At 100 TB this is the daily-crawl path: the full
    corpus is never re-gated or re-chunked, only the churn.

    Scale: the diff moves 32-byte digests (snapshot_diff's contract); the
    delta join is co-keyed on the id; the gate and chunker then see
    churn-sized input. The snapshot-b frame materializes once (lazy — two
    consumers: fingerprint side + delta payload), as does the delta (gate
    + chunk consumers) — staging tables on a cluster.
    """
    d = read_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    base = d.select("doc_id", "text", "lang")
    revised = base.filter(did % 17 != 0).select(
        "doc_id",
        F.when(did % 10 == 0, F.concat(F.col("text"), F.lit(" rev2")))
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
    )
    fresh = base.filter(did % 23 == 0).select(
        (did + 100000).alias("doc_id"),
        F.concat(F.lit("fresh "), F.col("text")).alias("text"),
        F.lit("xx").alias("lang"),
    )
    snap_b = revised.unionByName(fresh).localCheckpoint(eager=False)
    diff = curation.snapshot_diff(base, snap_b, "doc_id", ["text", "lang"])
    delta = snap_b.join(
        diff.filter(F.col("status") != "removed").select("doc_id", "status"),
        "doc_id",
    ).localCheckpoint(eager=False)
    gate = curation.quality_gate(
        delta,
        "doc_id",
        "text",
        min_tokens=QF_MIN_TOKENS,
        max_tokens=QF_MAX_TOKENS,
        min_mtl_x100=QF_MTL_MIN_X100,
        max_mtl_x100=QF_MTL_MAX_X100,
        dup3_ppm_max=QF_DUP3_PPM_MAX,
    ).select("doc_id", "keep")
    kept = delta.join(gate.filter(F.col("keep") == 1), "doc_id").select(
        "doc_id", "text"
    )
    n_chunks = (
        curation.chunk_documents(kept, "doc_id", "text", CHUNK_TOKENS, CHUNK_OVERLAP)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_chunks"))
    )
    return (
        delta.select("doc_id", "status")
        .join(gate, "doc_id")
        .join(n_chunks, "doc_id", "left")
        .select(
            "doc_id",
            "status",
            "keep",
            F.coalesce(F.col("n_chunks"), F.lit(0)).alias("n_chunks"),
        )
    )


SQL_INCREMENTAL_CURATE = f"""
WITH a AS (SELECT doc_id, text, lang FROM documents),
b AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0 THEN text || ' rev2' ELSE text END AS text,
         lang
  FROM documents WHERE doc_id % 17 <> 0
  UNION ALL
  SELECT doc_id + 100000, 'fresh ' || text, 'xx'
  FROM documents WHERE doc_id % 23 = 0
),
fa AS (SELECT doc_id, md5(CASE WHEN text IS NULL THEN '-' ELSE md5(text) END
                          || CASE WHEN lang IS NULL THEN '-' ELSE md5(lang) END)
         AS fp FROM a),
fb AS (SELECT doc_id, md5(CASE WHEN text IS NULL THEN '-' ELSE md5(text) END
                          || CASE WHEN lang IS NULL THEN '-' ELSE md5(lang) END)
         AS fp FROM b),
diff AS (
  SELECT coalesce(fa.doc_id, fb.doc_id) AS doc_id,
         CASE WHEN fa.doc_id IS NULL THEN 'added'
              WHEN fb.doc_id IS NULL THEN 'removed'
              ELSE 'changed' END AS status
  FROM fa FULL JOIN fb ON fa.doc_id = fb.doc_id
  WHERE fa.doc_id IS NULL OR fb.doc_id IS NULL OR fa.fp <> fb.fp
),
delta AS (
  SELECT b.doc_id, b.text, d.status
  FROM b JOIN diff d USING (doc_id) WHERE d.status <> 'removed'
),
t AS (SELECT doc_id, status, {_TOKENS} AS toks FROM delta),
sig AS (
  SELECT doc_id, status, len(toks) AS n_tokens,
         CASE WHEN len(toks) > 0
              THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
                   * 100 // len(toks)
              ELSE 0 END AS mtl,
         len(list_filter(toks, x -> x IN {_STOP_EN})) AS stop_hits,
         CASE WHEN len(toks) >= 3 THEN list_transform(
                range(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
              ELSE [] END AS grams,
         toks
  FROM t
),
g AS (
  SELECT *, CASE WHEN len(grams) > 0
                 THEN (len(grams) - len(list_distinct(grams))) * 1000000
                      // len(grams)
                 ELSE 0 END AS dup3_ppm
  FROM sig
),
verdict AS (
  SELECT doc_id, status, toks,
         CASE WHEN n_tokens >= {QF_MIN_TOKENS} AND n_tokens <= {QF_MAX_TOKENS}
               AND mtl >= {QF_MTL_MIN_X100} AND mtl <= {QF_MTL_MAX_X100}
               AND stop_hits > 0 AND dup3_ppm <= {QF_DUP3_PPM_MAX}
              THEN 1 ELSE 0 END AS keep
  FROM g
)
SELECT doc_id, status, keep,
       CASE WHEN keep = 1 AND len(toks) > 0
            THEN (greatest(len(toks) - {CHUNK_OVERLAP}, 1) - 1) // {_STRIDE} + 1
            ELSE 0 END AS n_chunks
FROM verdict
"""


def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector absmax int8 quantization of the embedding corpus plus its
    quality report (max reconstruction error in ppm of the scale) — the 4×
    storage/bandwidth cut an ANN index applies before sharding 100 TB of
    vectors. Quantized code: q_i = floor(x_i/scale·127 + 0.5) — half-up via
    floor, NOT round(), because round() half-even/half-away conventions
    differ across engines while floor is IEEE-identical everywhere; every
    arithmetic step is explicitly double so Spark and DuckDB execute the
    same correctly-rounded op sequence and the oracle is bit-exact.

    Scale: one scan, zero shuffles — per-element transforms are JVM
    higher-order functions (fine here: this is an O(dim)-per-row rewrite
    pass, not the ANN hot path, which stays on the codegen sketch plan).
    The error bound is structural: |x − q·scale/127| ≤ scale/254, so
    max_err_ppm ≤ 3937 + 1 ulp — asserted in tests.
    """
    e = read_table(spark, sf_dir, "embeddings")
    x_abs = F.transform("embedding", lambda x: F.abs(x))
    with_scale = e.select(
        "vec_id",
        "embedding",
        F.array_max(x_abs).cast("double").alias("scale"),
    )
    sc = F.col("scale")
    q = F.transform(
        "embedding",
        lambda x: F.when(
            sc > 0,
            F.floor(x.cast("double") / sc * 127 + F.lit(0.5)).cast("int"),
        ).otherwise(F.lit(0)),
    )
    quant = with_scale.select("vec_id", "embedding", "scale", q.alias("q_emb"))
    err = F.array_max(
        F.zip_with(
            "embedding",
            "q_emb",
            lambda x, qi: F.abs(x.cast("double") - qi.cast("double") * sc / 127),
        )
    )
    return quant.select(
        "vec_id",
        "scale",
        # CSV string, not ARRAY<INT> (the tokenize_ids lesson, applied
        # BEFORE a window promotion can burn on it: the driver's pandas
        # canonicalizer cannot factorize array cells). The raw-array form
        # stays available to composers via the `quant` frame shape.
        F.array_join(F.col("q_emb").cast("array<string>"), ",").alias(
            "q_emb_csv"
        ),
        F.when(sc > 0, F.floor(err / sc * 1000000))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("max_err_ppm"),
    )


SQL_QUANTIZE_EMBEDDINGS = """
WITH s AS (
  SELECT vec_id, embedding,
         CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
           AS scale
  FROM embeddings
),
q AS (
  SELECT vec_id, embedding, scale,
         list_transform(embedding, x ->
           CASE WHEN scale > 0
                THEN CAST(floor(CAST(x AS DOUBLE) / scale * 127 + 0.5) AS INT)
                ELSE 0 END) AS q_emb
  FROM s
)
SELECT vec_id, scale,
       array_to_string(q_emb, ',') AS q_emb_csv,
       CASE WHEN scale > 0
            THEN CAST(floor(list_max(list_transform(range(1, len(embedding) + 1),
                   i -> abs(CAST(embedding[i] AS DOUBLE)
                            - CAST(q_emb[i] AS DOUBLE) * scale / 127)))
                 / scale * 1000000) AS BIGINT)
            ELSE 0 END AS max_err_ppm
FROM q
"""


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the cheapest crawl dedup stage, run
    before any content hashing. The testdata carries no URL column, so the
    query synthesizes deterministic messy URLs from existing columns
    (mixed case, www, default port, utm tracking params, trailing slash —
    with doc_id folded mod 7/3 so distinct documents genuinely collide
    on the canonical form — 20 sources x 7 paths x 3 ids = 420 canonical
    cells < 500 docs, so duplicates exist by pigeonhole and the dedup
    actually bites), canonicalizes via text.canonical_url, and
    reports each canonical URL's keeper (min doc id) and duplicate count.
    The DuckDB oracle reproduces the same RE2-safe constant-replacement
    chain bit-for-bit.

    Scale: the synthesis + canonical chain is pure regexp codegen over the
    scan; ONE exchange for the canonical-key group — the same single-
    shuffle shape as exact content dedup, on a far cheaper key.
    """
    d = read_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url = F.concat(
        F.lit("https://WWW."),
        F.col("source"),
        F.lit(".Example.COM:443/p/"),
        (did % 7).cast("string"),
        F.lit("/?utm_source=feed&id="),
        (did % 3).cast("string"),
    )
    return (
        d.select("doc_id", text.canonical_url(url).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


_URL_RAW = (
    "'https://WWW.' || source || '.Example.COM:443/p/' || "
    "CAST(doc_id % 7 AS VARCHAR) || '/?utm_source=feed&id=' || "
    "CAST(doc_id % 3 AS VARCHAR)"
)
# the same constant-replacement chain as text._URL_CANON_STEPS
_URL_CANON_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "regexp_replace(regexp_replace(regexp_replace(lower({u}),"
    " '^https?://', ''),"
    " '^www\\.', ''),"
    " ':(443|80)/', '/'),"
    " 'utm_[a-z0-9_]*=[^&]*&', ''),"
    " '[?&]utm_[a-z0-9_]*=[^&]*$', ''),"
    " '/\\?', '?'),"
    " '/$', '')"
)

SQL_URL_DEDUP = f"""
SELECT {_URL_CANON_SQL.format(u=_URL_RAW)} AS canonical_url,
       min(doc_id) AS keeper_id,
       count(*) AS n_docs
FROM documents
GROUP BY 1
"""


LM_REF_PCT = 30  # hash-designated "clean reference" slice for the bigram LM


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality signal: avg bigram negative log-likelihood of
    every non-reference doc under an add-1 LM trained on the
    hash-designated reference slice. See operators/curation.lm_perplexity
    for the exact-integer summation discipline that makes the 6dp result
    engine-identical."""
    d = read_table(spark, sf_dir, "documents")
    return curation.lm_perplexity(
        d, "doc_id", "text",
        curation.hash_bucket(F.col("doc_id"), "lm") < LM_REF_PCT,
    )


SQL_LM_PERPLEXITY = f"""
WITH t AS (
  SELECT doc_id,
         {_H.format(salt="'lm'", col="doc_id")} % 100 < {LM_REF_PCT} AS is_ref,
         {_TOKENS} AS toks
  FROM documents
),
p AS (
  SELECT doc_id, is_ref, toks[i] AS prev, toks[i + 1] AS cur
  FROM (SELECT doc_id, is_ref, toks,
               unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS i
        FROM t)
),
c2 AS (SELECT prev, cur, count(*) AS _c2 FROM p WHERE is_ref GROUP BY 1, 2),
c1 AS (SELECT prev, SUM(_c2) AS _c1 FROM c2 GROUP BY 1),
v AS (SELECT count(DISTINCT cur) AS _vocab FROM c2),
scored AS (
  SELECT p.doc_id,
         CAST(round(-ln(CAST(coalesce(c2._c2, 0) + 1 AS DOUBLE)
                        / (coalesce(c1._c1, 0) + v._vocab)) * 1e12) AS BIGINT)
           AS nll_fp
  FROM p
  LEFT JOIN c2 ON p.prev = c2.prev AND p.cur = c2.cur
  LEFT JOIN c1 ON p.prev = c1.prev
  CROSS JOIN v
  WHERE NOT p.is_ref
)
SELECT doc_id, count(*) AS n_bigrams,
       round(CAST(SUM(nll_fp) AS DOUBLE) / 1e12 / count(*), 6) AS avg_nll
FROM scored GROUP BY 1
"""


# Order encodes recorded-window priority (see __spark_entry__.queries()):
# the first six are the family's driver-recorded representatives — the
# round-9 window audit promoted boilerplate_ngrams / select_token_budget /
# importance_weights (the three most pipeline-critical round-8 operators:
# every real curation run executes a hygiene pass, a budget cut, and a
# quality-weighting step) into the slots freed by deferring in-window
# redundancies (see __spark_entry__._DEFERRED). The rest sit past the
# window, pinned by tests/test_oracle_parity.py.
# ---------------------------------------------------------------------------
# Round-10 corpus operators: cross-doc duplicate-span coverage + BM25 retrieval
# ---------------------------------------------------------------------------

DUP_SPAN_N = 8  # span length in words (Lee et al. 2021 use 50 BPE tokens at
# web scale; 8 words keeps the signal non-degenerate on this corpus: 1015 of
# 22.6k grams are cross-doc duplicated at sf0.01)


def q_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicate-span coverage (tokens covered by 8-grams that
    occur in >=2 docs, as ppm) — the span-level dedup signal; see
    operators/dedup.dup_span_coverage for semantics and the scale plan."""
    from recsys_pipeline_spark.operators.dedup import dup_span_coverage

    d = read_table(spark, sf_dir, "documents")
    return dup_span_coverage(d, "doc_id", "text", n=DUP_SPAN_N)


SQL_DUP_SPAN_COVERAGE = f"""
WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
occ AS (
  SELECT doc_id, i, array_to_string(toks[i : i + {DUP_SPAN_N - 1}], ' ') AS gram
  FROM t, unnest(range(1, greatest(len(toks) - {DUP_SPAN_N - 1}, 0) + 1)) u(i)
),
gdf AS (SELECT gram, count(DISTINCT doc_id) AS d FROM occ GROUP BY gram),
cov AS (
  SELECT doc_id, count(DISTINCT pos) AS covered FROM (
    SELECT o.doc_id, u.pos
    FROM occ o JOIN gdf ON o.gram = gdf.gram AND gdf.d >= 2,
         unnest(range(o.i, o.i + {DUP_SPAN_N})) u(pos)
  ) GROUP BY doc_id
)
SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(COALESCE(cov.covered, 0) AS BIGINT) AS covered_tokens,
       CAST(CASE WHEN len(toks) > 0
                 THEN floor(COALESCE(cov.covered, 0) * 1000000 / len(toks))
                 ELSE 0 END AS BIGINT) AS coverage_ppm
FROM t LEFT JOIN cov ON t.doc_id = cov.doc_id
"""


def q_dup_span_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text with cross-doc duplicate 8-gram spans REMOVED (the
    removal action paired with dup_span_coverage's signal); see
    operators/dedup.dup_span_trim."""
    from recsys_pipeline_spark.operators.dedup import dup_span_trim

    d = read_table(spark, sf_dir, "documents")
    return dup_span_trim(d, "doc_id", "text", n=DUP_SPAN_N)


SQL_DUP_SPAN_TRIM = f"""
WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
occ AS (
  SELECT doc_id, i, array_to_string(toks[i : i + {DUP_SPAN_N - 1}], ' ') AS gram
  FROM t, unnest(range(1, greatest(len(toks) - {DUP_SPAN_N - 1}, 0) + 1)) u(i)
),
gdf AS (SELECT gram, count(DISTINCT doc_id) AS d FROM occ GROUP BY gram),
cov AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT o.doc_id, u.pos
    FROM occ o JOIN gdf ON o.gram = gdf.gram AND gdf.d >= 2,
         unnest(range(o.i, o.i + {DUP_SPAN_N})) u(pos)
  )
),
positions AS (
  SELECT doc_id, u.pos, toks[u.pos] AS tok
  FROM t, unnest(range(1, len(toks) + 1)) u(pos)
),
kept AS (
  SELECT p.doc_id, p.pos, p.tok FROM positions p
  LEFT JOIN cov c ON p.doc_id = c.doc_id AND p.pos = c.pos
  WHERE c.doc_id IS NULL
),
rebuilt AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS trimmed_text,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id, COALESCE(r.trimmed_text, '') AS trimmed_text,
       CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept
FROM t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
"""


def q_dup_max_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-document duplicated spans as explicit interval rows
    (id, 1-based span_start, span_len, span_text) — the ExactSubstr-style
    repeated-substring inventory behind dup_span_coverage's totals; see
    operators/dedup.dup_max_spans for semantics and the scale plan."""
    from recsys_pipeline_spark.operators.dedup import dup_max_spans

    d = read_table(spark, sf_dir, "documents")
    return dup_max_spans(d, "doc_id", "text", n=DUP_SPAN_N)


SQL_DUP_MAX_SPANS = f"""
WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
occ AS (
  SELECT doc_id, i, array_to_string(toks[i : i + {DUP_SPAN_N - 1}], ' ') AS gram
  FROM t, unnest(range(1, greatest(len(toks) - {DUP_SPAN_N - 1}, 0) + 1)) u(i)
),
gdf AS (SELECT gram, count(DISTINCT doc_id) AS d FROM occ GROUP BY gram),
st AS (SELECT o.doc_id, o.i FROM occ o
       JOIN gdf ON o.gram = gdf.gram AND gdf.d >= 2),
brk AS (
  SELECT doc_id, i,
         CASE WHEN lag(i) OVER (PARTITION BY doc_id ORDER BY i) IS NULL
                OR i - lag(i) OVER (PARTITION BY doc_id ORDER BY i)
                   > {DUP_SPAN_N}
              THEN 1 ELSE 0 END AS b
  FROM st
),
isl AS (
  SELECT doc_id, i,
         SUM(b) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS UNBOUNDED PRECEDING) AS g
  FROM brk
),
sp AS (
  SELECT doc_id, g, min(i) AS s, max(i) + {DUP_SPAN_N - 1} AS e
  FROM isl GROUP BY 1, 2
)
SELECT sp.doc_id, CAST(sp.s AS BIGINT) AS span_start,
       CAST(sp.e - sp.s + 1 AS BIGINT) AS span_len,
       array_to_string(t.toks[sp.s : sp.e], ' ') AS span_text
FROM sp JOIN t ON sp.doc_id = t.doc_id
"""


def q_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-ingest round trip: synthesize WARC-style capture blobs from the
    documents table (40 docs per capture file, Content-Length framing,
    byte-correct lengths) and run the real byte-scanner parser
    (multimodal.parse_warc) over them. The ORACLE is the identity: the
    parser must invert the synthesizer, so DuckDB just projects
    (url, text, octet_length) straight off documents — the oracle checks
    the round trip without re-implementing the parser.

    Scale: the synthesis groupBy is test-rig-only (real ingest reads the
    capture files from the object store — zero shuffles); the parse itself
    is one Arrow-batched narrow map over blobs.
    """
    from recsys_pipeline_spark.operators.multimodal import parse_warc

    d = read_table(spark, sf_dir, "documents")
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        F.lit("https://example.com/doc/"), F.col("doc_id").cast("string"),
        F.lit("\r\nContent-Length: "), F.octet_length("text").cast("string"),
        F.lit("\r\n\r\n"), F.col("text"), F.lit("\r\n\r\n"),
    )
    blobs = (
        d.select((F.col("doc_id") % 40).alias("file_id"), F.struct("doc_id", rec.alias("rec")).alias("s"))
        .groupBy("file_id")
        .agg(
            F.encode(
                F.array_join(
                    F.transform(F.array_sort(F.collect_list("s")), lambda x: x["rec"]), ""
                ),
                "UTF-8",
            ).alias("blob")
        )
    )
    return parse_warc(blobs, "blob")


SQL_WARC_EXTRACT = """
SELECT 'https://example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
       text AS content,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
"""


BM25_TERMS = ("spark", "vector", "dup")  # df spread at sf0.01: 385/382/25
BM25_K1 = 1.2
BM25_B = 0.75


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 over the documents table for a fixed 3-term query — the
    lexical-retrieval scorer (the reference's term-recall channel ranks by
    ES's BM25, online/readers/es_caller.py; here the scoring itself is
    re-expressed as relational algebra so it is engine-checkable).

    Float discipline: idf uses ln() (not correctly rounded by IEEE; engines
    may differ in the last ulp), so the score is round()ed to 6 dp like
    tfidf_doc_terms, and BOTH engines order by the ROUNDED score with doc_id
    tiebreak. Per-doc summation over query terms is a FIXED-ORDER sum of
    per-term conditional aggregates (each (doc, term) contributes exactly
    one row), so no nondeterministic double reduction exists anywhere.

    Scale: one tokenize pass, terms filtered to the query's BEFORE the tf
    aggregate (the exploded stream never shuffles unmatched terms); df and
    the corpus stats are broadcast scalar/K-row frames; one exchange for the
    per-doc tf aggregate, one map-side-limited TakeOrdered for the top-k.

    The fact mining and scoring live in operators/text.bm25_facts /
    bm25_topk_from_facts — shared verbatim with the streaming twin
    (streaming/curation_stream.bm25_stream), so the pair cannot diverge.
    """
    from recsys_pipeline_spark.operators.text import bm25_facts, bm25_topk_from_facts

    d = read_table(spark, sf_dir, "documents")
    tfdl, stats = bm25_facts(d, "doc_id", "text", BM25_TERMS)
    return bm25_topk_from_facts(
        tfdl, stats, "doc_id", BM25_TERMS, BM25_K1, BM25_B, 20
    )


_BM25_IN = ", ".join(f"'{t}'" for t in BM25_TERMS)

SQL_BM25_TOPK = f"""
WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM t),
st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
              CAST(SUM(len(toks)) AS DOUBLE) AS tot FROM t),
tr AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tr
       WHERE term IN ({_BM25_IN}) GROUP BY doc_id, term),
gdf AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term),
sc AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (st.n_docs - gdf.df + 0.5) / (gdf.df + 0.5))
         * (tf.tf * {BM25_K1 + 1.0!r}) / (tf.tf + {BM25_K1!r} *
            ({1.0 - BM25_B!r} + {BM25_B!r} * dl.dl / (st.tot / st.n_docs))) AS s
  FROM tf JOIN gdf USING (term) JOIN dl USING (doc_id), st
),
agg AS (
  SELECT doc_id,
         {" + ".join(f"COALESCE(SUM(s) FILTER (WHERE term = '{t}'), 0.0)" for t in BM25_TERMS)} AS score
  FROM sc GROUP BY doc_id
)
SELECT doc_id, round(score, 6) AS bm25 FROM agg
ORDER BY round(score, 6) DESC, doc_id LIMIT 20
"""


HH_THRESHOLD_PPM = 1500  # 54 of 916 bigrams qualify at sf0.01 — the
# selection genuinely bites (31-token vocabulary makes UNIGRAMS all-hitters)


def q_heavy_hitter_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide frequent word-bigrams with EXACT counts, found by
    sketch-then-verify (operators/skew.heavy_hitters_exact): per-partition
    Misra-Gries summaries inside one Arrow-batched mapInPandas produce a
    bounded candidate set, and only candidate keys aggregate exactly — the
    raw gram stream never shuffles.  The hot-key DETECTION primitive (the
    stop-gram lists, boilerplate seeds, and celebrity-vertex guards other
    operators take as inputs start exactly here), exact end to end, so the
    oracle is the plain GROUP BY ... HAVING."""
    from recsys_pipeline_spark.operators import skew

    d = read_table(spark, sf_dir, "documents")
    grams = curation.word_gram_rows(d, "doc_id", "text", 2).select("gram")
    return skew.heavy_hitters_exact(grams, "gram", HH_THRESHOLD_PPM)


_GRAM_LIST_2 = (
    "list_transform(range(1, greatest(len(toks) - 1, 0) + 1),"
    " i -> toks[i] || ' ' || toks[i + 1])"
)

SQL_HEAVY_HITTER_GRAMS = f"""
WITH hht AS (SELECT {_TOKENS} AS toks FROM documents),
hhg AS (SELECT unnest({_GRAM_LIST_2}) AS gram FROM hht),
hhc AS (SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM hhg GROUP BY 1),
hhn AS (SELECT CAST(SUM(cnt) AS HUGEINT) AS n FROM hhc)
SELECT gram, cnt,
       CAST(CAST(cnt AS HUGEINT) * 1000000 // (SELECT n FROM hhn) AS BIGINT)
         AS share_ppm
FROM hhc
WHERE CAST(cnt AS HUGEINT) * 1000000 >= (SELECT n FROM hhn) * {HH_THRESHOLD_PPM}
"""


RRF_K = 60       # the standard reciprocal-rank-fusion constant
RRF_CH_K = 20    # per-channel depth
RRF_TOPK = 10    # fused output depth


def q_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID retrieval rank fusion (reciprocal rank fusion, Cormack et
    al. 2009 — the fusion Elasticsearch/OpenSearch hybrid search ships):
    the BM25 channel's top-20 and a TF-IDF dot-product channel's top-20
    for the same query terms fuse by rrf_ppm = sum over channels of
    floor(1e6 / (RRF_K + rank)), missing channels contributing 0; top-10
    by (rrf_ppm desc, doc_id).  Each channel's score keeps the house ln()
    discipline (6 dp rounding, rank ties broken by doc_id), and the
    FUSION itself is exact integer algebra on the resulting ranks — the
    two channels genuinely disagree (BM25 saturates tf and normalizes by
    length; the dot product does neither), which is the point of fusing.

    Scale: both channels filter the exploded token stream to the query's
    terms BEFORE aggregating (one corpus pass via bm25_facts' checkpointed
    base), df/stats broadcast; the fusion full-outer join runs on two
    20-row frames."""
    from recsys_pipeline_spark.operators.text import bm25_facts, bm25_topk_from_facts

    d = read_table(spark, sf_dir, "documents")
    tfdl, stats = bm25_facts(d, "doc_id", "text", BM25_TERMS)
    tfdl = tfdl.localCheckpoint(eager=False)  # both channels + df read it

    ch1 = bm25_topk_from_facts(
        tfdl, stats, "doc_id", BM25_TERMS, BM25_K1, BM25_B, RRF_CH_K
    )
    w1 = Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
    r1 = ch1.select("doc_id", F.row_number().over(w1).alias("bm25_rank"))

    df_ = tfdl.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    sc = (
        tfdl.join(F.broadcast(df_), "term")
        .crossJoin(
            F.broadcast(stats.select(F.col("n_docs").cast("double").alias("_nd")))
        )
        .select(
            "doc_id",
            "term",
            (F.col("tf").cast("double") * F.log(F.col("_nd") / F.col("df"))).alias("_s"),
        )
    )
    per_doc = sc.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("term") == t, F.col("_s"))).alias(f"_t{i}")
            for i, t in enumerate(BM25_TERMS)
        ]
    )
    score = F.lit(0.0)
    for i in range(len(BM25_TERMS)):
        score = score + F.coalesce(F.col(f"_t{i}"), F.lit(0.0))
    ch2 = (
        per_doc.select("doc_id", F.round(score, 6).alias("tfidf"))
        .orderBy(F.col("tfidf").desc(), F.col("doc_id").asc())
        .limit(RRF_CH_K)
    )
    w2 = Window.orderBy(F.col("tfidf").desc(), F.col("doc_id"))
    r2 = ch2.select("doc_id", F.row_number().over(w2).alias("tfidf_rank"))

    fused = r1.join(r2, "doc_id", "full")
    rrf = F.coalesce(
        F.expr(f"1000000 DIV ({RRF_K} + bm25_rank)"), F.lit(0)
    ) + F.coalesce(F.expr(f"1000000 DIV ({RRF_K} + tfidf_rank)"), F.lit(0))
    return (
        fused.select(
            "doc_id",
            F.col("bm25_rank").cast("long").alias("bm25_rank"),
            F.col("tfidf_rank").cast("long").alias("tfidf_rank"),
            rrf.cast("long").alias("rrf_ppm"),
        )
        .orderBy(F.col("rrf_ppm").desc(), F.col("doc_id").asc())
        .limit(RRF_TOPK)
    )


SQL_HYBRID_RRF_TOPK = f"""
WITH hyt AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
hydl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM hyt),
hyst AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                CAST(SUM(len(toks)) AS DOUBLE) AS tot FROM hyt),
hytr AS (SELECT doc_id, unnest(toks) AS term FROM hyt),
hytf AS (SELECT doc_id, term, COUNT(*) AS tf FROM hytr
         WHERE term IN ({_BM25_IN}) GROUP BY doc_id, term),
hydf AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM hytf GROUP BY 1),
hysc AS (
  SELECT f.doc_id, f.term,
         ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (f.tf * {BM25_K1 + 1.0})
           / (f.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * l.dl / (s.tot / s.n_docs)))
           AS s
  FROM hytf f JOIN hydf d USING (term) JOIN hydl l USING (doc_id), hyst s
),
hyagg AS (
  SELECT doc_id,
         {" + ".join(f"COALESCE(SUM(s) FILTER (WHERE term = '{t}'), 0.0)" for t in BM25_TERMS)} AS score
  FROM hysc GROUP BY doc_id
),
hych1 AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS bm25_rank
  FROM (SELECT doc_id, round(score, 6) AS bm25 FROM hyagg
        ORDER BY round(score, 6) DESC, doc_id LIMIT {RRF_CH_K})
),
hytsc AS (
  SELECT f.doc_id, f.term, f.tf * ln(s.n_docs / d.df) AS s
  FROM hytf f JOIN hydf d USING (term), hyst s
),
hytagg AS (
  SELECT doc_id,
         {" + ".join(f"COALESCE(SUM(s) FILTER (WHERE term = '{t}'), 0.0)" for t in BM25_TERMS)} AS score
  FROM hytsc GROUP BY doc_id
),
hych2 AS (
  SELECT doc_id, row_number() OVER (ORDER BY tfidf DESC, doc_id) AS tfidf_rank
  FROM (SELECT doc_id, round(score, 6) AS tfidf FROM hytagg
        ORDER BY round(score, 6) DESC, doc_id LIMIT {RRF_CH_K})
)
SELECT doc_id,
       CAST(bm25_rank AS BIGINT) AS bm25_rank,
       CAST(tfidf_rank AS BIGINT) AS tfidf_rank,
       CAST(COALESCE(1000000 // ({RRF_K} + bm25_rank), 0)
            + COALESCE(1000000 // ({RRF_K} + tfidf_rank), 0) AS BIGINT)
         AS rrf_ppm
FROM hych1 FULL JOIN hych2 USING (doc_id)
ORDER BY rrf_ppm DESC, doc_id LIMIT {RRF_TOPK}
"""


LINE_TOKENS = 6  # tokens per synthesized line (261 duplicate lines dropped
# at sf0.01 — the discard genuinely bites at test scale)


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-wide exact LINE dedup (Raffel et al. 2020: discard
    every repeated line, keep the first occurrence) — the hygiene pass
    between URL dedup and the quality gate in a C4-shaped pipeline. The
    testdata's documents are single-line, so the query synthesizes
    line-structured text first (fixed 6-token lines — deterministic, and
    aligned lines genuinely collide across documents at test scale), then
    runs the operator; see operators/dedup.line_dedup for the
    WindowGroupLimit scale shape.
    """
    from recsys_pipeline_spark.operators.dedup import line_dedup
    from recsys_pipeline_spark.operators.text import tokens

    d = read_table(spark, sf_dir, "documents")
    k = LINE_TOKENS
    lined = d.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).select(
        "doc_id",
        F.expr(
            f"array_join(transform(sequence(1, (size(toks) + {k - 1}) DIV {k}),"
            f" i -> array_join(slice(toks, (i - 1) * {k} + 1, {k}), ' ')), '\\n')"
        ).alias("text_lines"),
    )
    return line_dedup(lined, "doc_id", "text_lines")


SQL_LINE_DEDUP = f"""
WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
l AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         array_to_string(
           toks[(i - 1) * {LINE_TOKENS} + 1 : (i - 1) * {LINE_TOKENS} + {LINE_TOKENS}],
           ' ') AS line
  FROM t, unnest(range(1, (len(toks) + {LINE_TOKENS - 1}) // {LINE_TOKENS} + 1)) u(i)
),
r AS (
  SELECT doc_id, pos, line,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rk
  FROM l
),
k AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS cleaned_text,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM r WHERE rk = 1 GROUP BY doc_id
),
tot AS (SELECT doc_id, count(*) AS n_lines FROM l GROUP BY doc_id)
SELECT tot.doc_id, COALESCE(k.cleaned_text, '') AS cleaned_text,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(tot.n_lines - COALESCE(k.n_kept, 0) AS BIGINT) AS n_dropped
FROM tot LEFT JOIN k ON tot.doc_id = k.doc_id
"""


def q_corpus_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-health dashboard every curation run publishes: per
    (source, lang) — with ROLLUP subtotals and a grand total — document
    count, keep-rate (ppm), total tokens, and the mean duplicate-3-gram
    rate (ppm), all derived from the quality gate's audit rows. Metrics
    are integer-exact (ppm via integer division) so the oracle matches
    bit-for-bit; ROLLUP null keys are labeled '(all)' to keep the result
    scalar-and-null-free in both engines.

    Scale: the gate signals are the quality_filter plan; the rollup is
    Spark's single-pass Expand (one scan, one grouping exchange — the
    rollup_revenue shape, plan-pinned there). The per-group COUNTER
    partials (health_partials) are sum-mergeable and the ppm divisions
    happen only in the finisher (health_rollup) — the split that lets the
    streaming twin hold partials as per-epoch count deltas."""
    d = read_table(spark, sf_dir, "documents")
    return health_rollup(health_partials(d))


def health_partials(d: DataFrame) -> DataFrame:
    """Per-(source, lang) counter partials off the quality gate's audit
    rows: (n_docs, keep_sum, tokens_sum, dup3_sum) — pure sums, so deltas
    from disjoint corpus slices merge by one grouped SUM. Shared with the
    streaming twin."""
    gate = curation.quality_gate(
        d, "doc_id", "text",
        min_tokens=QF_MIN_TOKENS, max_tokens=QF_MAX_TOKENS,
        min_mtl_x100=QF_MTL_MIN_X100, max_mtl_x100=QF_MTL_MAX_X100,
        dup3_ppm_max=QF_DUP3_PPM_MAX,
    ).select("doc_id", "n_tokens", "dup3_ppm", "keep")
    return (
        d.select("doc_id", "source", "lang")
        .join(gate, "doc_id")
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("keep").alias("keep_sum"),
            F.sum("n_tokens").cast("long").alias("tokens_sum"),
            F.sum("dup3_ppm").alias("dup3_sum"),
        )
    )


def health_rollup(partials: DataFrame) -> DataFrame:
    """ROLLUP finisher over the counter partials: the ppm divisions run
    only here, on fully-summed counters, so batch-on-corpus and
    merged-stream-state produce identical integers."""
    agg = partials.rollup("source", "lang").agg(
        F.sum("n_docs").alias("_n"),
        F.sum("keep_sum").alias("_k"),
        F.sum("tokens_sum").alias("_t"),
        F.sum("dup3_sum").alias("_d"),
    )
    return agg.select(
        F.coalesce(F.col("source"), F.lit("(all)")).alias("source"),
        F.coalesce(F.col("lang"), F.lit("(all)")).alias("lang"),
        F.col("_n").cast("long").alias("n_docs"),
        F.expr("_k * 1000000 DIV _n").alias("keep_ppm"),
        F.col("_t").cast("long").alias("total_tokens"),
        F.expr("_d DIV _n").alias("mean_dup3_ppm"),
    )


SQL_CORPUS_HEALTH = f"""
WITH t AS (SELECT doc_id, source, lang, {_TOKENS} AS toks FROM documents),
sig AS (
  SELECT doc_id, source, lang, len(toks) AS n_tokens,
         CASE WHEN len(toks) > 0
              THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
                   * 100 // len(toks)
              ELSE 0 END AS mean_tok_len_x100,
         len(list_filter(toks, x -> x IN {_STOP_EN})) AS stop_hits,
         CASE WHEN len(toks) >= 3 THEN list_transform(
                range(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
              ELSE [] END AS grams
  FROM t
),
d2 AS (
  SELECT doc_id, source, lang, n_tokens, mean_tok_len_x100, stop_hits,
         CASE WHEN len(grams) > 0
              THEN (len(grams) - len(list_distinct(grams))) * 1000000
                   // len(grams)
              ELSE 0 END AS dup3_ppm
  FROM sig
),
g AS (
  SELECT source, lang, n_tokens, dup3_ppm,
         CASE WHEN n_tokens >= {QF_MIN_TOKENS} AND n_tokens <= {QF_MAX_TOKENS}
               AND mean_tok_len_x100 >= {QF_MTL_MIN_X100}
               AND mean_tok_len_x100 <= {QF_MTL_MAX_X100}
               AND stop_hits > 0 AND dup3_ppm <= {QF_DUP3_PPM_MAX}
              THEN 1 ELSE 0 END AS keep
  FROM d2
)
SELECT COALESCE(source, '(all)') AS source, COALESCE(lang, '(all)') AS lang,
       count(*) AS n_docs,
       CAST(SUM(keep) * 1000000 // count(*) AS BIGINT) AS keep_ppm,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(dup3_ppm) // count(*) AS BIGINT) AS mean_dup3_ppm
FROM g
GROUP BY ROLLUP(source, lang)
"""


# ---------------------------------------------------------------------------
# bpe_train (round 12): the FULL iterative BPE trainer — bpe_pairs is one
# round's counting half; this runs count -> pick best merge -> APPLY ->
# repeat, the whole Sennrich 2016 loop, as window algebra on the distinct-
# word dictionary (corpus scanned exactly once; every round after that is
# vocabulary-bounded — the property real 100 TB BPE trainers rely on). The
# greedy left-to-right merge ("aaaa" + (a,a) -> "aa","aa") is relational:
# match runs group via the pos - row_number constant, even offsets within a
# run are the merge starts. The oracle unrolls the rounds as CTE blocks,
# pagerank-style — merge choice ties break lexically so both engines learn
# the identical merge table.
# ---------------------------------------------------------------------------

BPE_ROUNDS = 3


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return curation.bpe_train(d, "text", rounds=BPE_ROUNDS)


def _bpe_round_cte(r: int) -> str:
    return f"""p{r} AS (SELECT word, wcnt, pos, tok,
             lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM s{r - 1}),
c{r} AS (SELECT tok AS lhs, nxt AS rhs, CAST(SUM(wcnt) AS BIGINT) AS cnt
         FROM p{r} WHERE nxt IS NOT NULL GROUP BY 1, 2),
b{r} AS (SELECT lhs, rhs, cnt FROM c{r} ORDER BY cnt DESC, lhs, rhs LIMIT 1),
m{r} AS (SELECT p.word, p.pos, p.tok || p.nxt AS merged
         FROM p{r} p JOIN b{r} b ON p.tok = b.lhs AND p.nxt = b.rhs),
g{r} AS (SELECT word, pos, merged,
                pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp
         FROM m{r}),
st{r} AS (SELECT word, pos, merged FROM (
            SELECT word, pos, merged,
                   row_number() OVER (PARTITION BY word, grp ORDER BY pos) - 1 AS off
            FROM g{r}) WHERE off % 2 = 0),
s{r} AS (SELECT word, wcnt,
                row_number() OVER (PARTITION BY word ORDER BY pos) AS pos, tok
         FROM (SELECT s.word, s.wcnt, s.pos, COALESCE(st.merged, s.tok) AS tok
               FROM s{r - 1} s
               LEFT JOIN st{r} st ON s.word = st.word AND s.pos = st.pos
               LEFT JOIN st{r} dr ON s.word = dr.word AND s.pos = dr.pos + 1
               WHERE dr.pos IS NULL))"""


def _bpe_dict_ctes(rel: str) -> str:
    """wd/s0 CTE pair over any relation with a ``text`` column — the BPE
    blocks are composed into larger oracles (training_batches), so the
    source relation is a parameter."""
    return f"""wd AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS wcnt
            FROM (SELECT unnest({_TOKENS}) AS word FROM {rel}) GROUP BY 1),
s0 AS (SELECT word, wcnt, CAST(i AS BIGINT) AS pos,
              substr(word, CAST(i AS INT), 1) AS tok
       FROM (SELECT word, wcnt, unnest(range(1, length(word) + 1)) AS i FROM wd))"""


SQL_BPE_TRAIN = f"""
WITH {_bpe_dict_ctes("documents")},
{",".join(_bpe_round_cte(r) for r in range(1, BPE_ROUNDS + 1))}
{" UNION ALL ".join(
    f"SELECT CAST({r} AS BIGINT) AS merge_round, lhs, rhs, lhs || rhs AS merged, cnt FROM b{r}"
    for r in range(1, BPE_ROUNDS + 1)
)}
"""


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer's inference half: train the 3-round merge table, then
    ENCODE the corpus with it (curation.bpe_encode — merges applied in
    round order, greedy left-to-right, on the distinct-word frame; docs
    join their words' subword sequences back in word order). The oracle
    reuses the training CTE chain — its final state IS the encoded word
    dictionary — plus the word-position join, so train and apply are
    hash-checked as one pipeline."""
    d = read_table(spark, sf_dir, "documents")
    return curation.bpe_train_encode(d, "doc_id", "text", rounds=BPE_ROUNDS)


SQL_BPE_ENCODE = f"""
WITH {_bpe_dict_ctes("documents")},
{",".join(_bpe_round_cte(r) for r in range(1, BPE_ROUNDS + 1))},
wt AS (SELECT word, list(tok ORDER BY pos) AS toks,
              CAST(count(*) AS BIGINT) AS ntok
       FROM s{BPE_ROUNDS} GROUP BY word),
dt AS (SELECT doc_id, {_TOKENS} AS ws FROM documents),
dw AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS wpos, ws FROM dt),
dwp AS (SELECT doc_id, wpos, ws[wpos] AS word FROM dw)
SELECT doc_id,
       array_to_string(flatten(list(toks ORDER BY wpos)), ' ') AS bpe_text,
       CAST(SUM(ntok) AS BIGINT) AS n_bpe_tokens
FROM dwp JOIN wt USING (word)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# training_batches (round 12): the FINAL-MILE composite — what turns a raw
# corpus into the training input stream: quality-gate -> BPE-train on the
# SURVIVOR corpus (the production order: tokenizers train on curated text)
# -> per-document subword counts -> greedy per-source packing into
# PACK_BUDGET-subword bins. One registered oracle-checked query pinning the
# wiring of three independently-verified operators (the tokenization analog
# of curate_corpus / crawl_ingest); the oracle composes the shared quality
# CTE chain with the parametrized BPE blocks over the kept-docs relation.
# ---------------------------------------------------------------------------


def q_training_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    audit = curation.quality_gate(
        d,
        "doc_id",
        "text",
        min_tokens=QF_MIN_TOKENS,
        max_tokens=QF_MAX_TOKENS,
        min_mtl_x100=QF_MTL_MIN_X100,
        max_mtl_x100=QF_MTL_MAX_X100,
        dup3_ppm_max=QF_DUP3_PPM_MAX,
    )
    # survivors feed the BPE dictionary AND the per-doc count join: one
    # materialization (at cluster scale this is the curated staging table)
    kept = d.join(
        audit.filter(F.col("keep") == 1).select("doc_id"), "doc_id"
    ).localCheckpoint(eager=False)
    state = curation.bpe_final_state(kept, "text", rounds=BPE_ROUNDS)
    ntok = state.groupBy("word").agg(F.count(F.lit(1)).alias("ntok"))
    doc_words = kept.select(
        "doc_id", "source", F.explode(text.tokens(F.col("text"))).alias("word")
    )
    sized = (
        doc_words.join(ntok, "word")
        .groupBy("doc_id", "source")
        .agg(F.sum("ntok").alias("n_bpe_tokens"))
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    offs = sized.withColumn(
        "bin_offset", F.sum("n_bpe_tokens").over(w) - F.col("n_bpe_tokens")
    )
    return offs.select(
        "doc_id",
        "source",
        "n_bpe_tokens",
        F.floor(F.col("bin_offset") / float(PACK_BUDGET)).cast("long").alias("bin_id"),
    )


SQL_TRAINING_BATCHES = f"""
WITH {_QF_CTES},
kdocs AS (SELECT dd.doc_id, dd.source, dd.text
          FROM documents dd JOIN r USING (doc_id)
          WHERE r.drop_reasons = ''),
{_bpe_dict_ctes("kdocs")},
{",".join(_bpe_round_cte(rr) for rr in range(1, BPE_ROUNDS + 1))},
wt AS (SELECT word, CAST(count(*) AS BIGINT) AS ntok
       FROM s{BPE_ROUNDS} GROUP BY word),
dwx AS (SELECT doc_id, unnest({_TOKENS}) AS word FROM kdocs),
nd AS (SELECT doc_id, CAST(SUM(ntok) AS BIGINT) AS n_bpe_tokens
       FROM dwx JOIN wt USING (word) GROUP BY doc_id),
sized AS (SELECT k.doc_id, k.source, n.n_bpe_tokens
          FROM kdocs k JOIN nd n USING (doc_id)),
offs AS (SELECT doc_id, source, n_bpe_tokens,
                SUM(n_bpe_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                        ROWS UNBOUNDED PRECEDING)
                  - n_bpe_tokens AS bin_offset
         FROM sized)
SELECT doc_id, source, n_bpe_tokens,
       CAST(floor(bin_offset / {PACK_BUDGET}.0) AS BIGINT) AS bin_id
FROM offs
"""


# ---------------------------------------------------------------------------
# profile_drift (round 12): per-column statistical drift between two dataset
# versions — the data-contract monitoring report a production pipeline runs
# on every snapshot before training reads it (row-count shifts, null-rate
# regressions, cardinality collapse/explosion). Versions: the corpus and the
# _next_snapshot synthesis shared with snapshot_diff, so the diff primitive
# and the drift report describe the SAME version pair. Shifts are signed
# integer ppm computed as (b * 1e6 DIV a) - 1e6 — both operands of the
# truncating division stay non-negative, the Spark DIV == DuckDB // contract
# (negative-operand division disagrees between engines and never appears).
# ---------------------------------------------------------------------------

PROFILE_DRIFT_COLS = ["doc_id", "text", "lang"]
DRIFT_ROWS_PPM = 50000  # alert at >5% row-count shift
DRIFT_NULL_PPM = 1000  # alert at >0.1% null-rate change
DRIFT_DIST_PPM = 100000  # alert at >10% cardinality shift


def q_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from recsys_pipeline_spark.operators.stats import column_profile

    base = read_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    pa = column_profile(base, PROFILE_DRIFT_COLS).select(
        "column_name",
        F.col("n_rows").alias("n_rows_a"),
        F.col("n_null").alias("n_null_a"),
        F.col("n_distinct").alias("n_distinct_a"),
    )
    pb = column_profile(_next_snapshot(base), PROFILE_DRIFT_COLS).select(
        "column_name",
        F.col("n_rows").alias("n_rows_b"),
        F.col("n_null").alias("n_null_b"),
        F.col("n_distinct").alias("n_distinct_b"),
    )
    j = pa.join(pb, "column_name")
    null_ppm_a = F.expr("n_null_a * 1000000 DIV n_rows_a")
    null_ppm_b = F.expr("n_null_b * 1000000 DIV n_rows_b")
    rows_shift = F.expr("n_rows_b * 1000000 DIV n_rows_a - 1000000")
    dist_shift = F.expr("n_distinct_b * 1000000 DIV n_distinct_a - 1000000")
    out = j.select(
        "column_name",
        "n_rows_a",
        "n_rows_b",
        null_ppm_a.alias("null_ppm_a"),
        null_ppm_b.alias("null_ppm_b"),
        "n_distinct_a",
        "n_distinct_b",
        rows_shift.alias("rows_shift_ppm"),
        dist_shift.alias("distinct_shift_ppm"),
    )
    return out.withColumn(
        "alerts",
        F.rtrim(
            F.concat(
                F.when(
                    F.abs(F.col("rows_shift_ppm")) > DRIFT_ROWS_PPM,
                    F.lit("row_count,"),
                ).otherwise(F.lit("")),
                F.when(
                    F.abs(F.col("null_ppm_b") - F.col("null_ppm_a")) > DRIFT_NULL_PPM,
                    F.lit("null_rate,"),
                ).otherwise(F.lit("")),
                F.when(
                    F.abs(F.col("distinct_shift_ppm")) > DRIFT_DIST_PPM,
                    F.lit("cardinality,"),
                ).otherwise(F.lit("")),
            ),
            F.lit(","),
        ),
    )


def _profile_sql(rel: str, cols: list[str]) -> str:
    return " UNION ALL ".join(
        f"""SELECT '{c}' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct FROM {rel}"""
        for c in cols
    )


SQL_PROFILE_DRIFT = f"""
WITH a AS (SELECT doc_id, text, lang FROM documents),
b AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0 THEN text || ' rev2' ELSE text END AS text,
         lang
  FROM documents WHERE doc_id % 17 <> 0
  UNION ALL
  SELECT doc_id + 100000, 'fresh ' || text, 'xx'
  FROM documents WHERE doc_id % 23 = 0
),
pa AS ({_profile_sql("a", PROFILE_DRIFT_COLS)}),
pb AS ({_profile_sql("b", PROFILE_DRIFT_COLS)}),
j AS (
  SELECT pa.column_name,
         pa.n_rows AS n_rows_a, pb.n_rows AS n_rows_b,
         pa.n_null * 1000000 // pa.n_rows AS null_ppm_a,
         pb.n_null * 1000000 // pb.n_rows AS null_ppm_b,
         pa.n_distinct AS n_distinct_a, pb.n_distinct AS n_distinct_b,
         pb.n_rows * 1000000 // pa.n_rows - 1000000 AS rows_shift_ppm,
         pb.n_distinct * 1000000 // pa.n_distinct - 1000000 AS distinct_shift_ppm
  FROM pa JOIN pb USING (column_name)
)
SELECT column_name, n_rows_a, n_rows_b,
       CAST(null_ppm_a AS BIGINT) AS null_ppm_a,
       CAST(null_ppm_b AS BIGINT) AS null_ppm_b,
       n_distinct_a, n_distinct_b,
       CAST(rows_shift_ppm AS BIGINT) AS rows_shift_ppm,
       CAST(distinct_shift_ppm AS BIGINT) AS distinct_shift_ppm,
       rtrim(
         (CASE WHEN abs(rows_shift_ppm) > {DRIFT_ROWS_PPM} THEN 'row_count,' ELSE '' END) ||
         (CASE WHEN abs(null_ppm_b - null_ppm_a) > {DRIFT_NULL_PPM} THEN 'null_rate,' ELSE '' END) ||
         (CASE WHEN abs(distinct_shift_ppm) > {DRIFT_DIST_PPM} THEN 'cardinality,' ELSE '' END),
         ',') AS alerts
FROM j
"""


QUERIES_CUR: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "sample_stratified": q_sample_stratified,
    "negative_sample": q_negative_sample,
    "decontaminate": q_decontaminate,
    "boilerplate_ngrams": q_boilerplate_ngrams,
    "select_token_budget": q_select_token_budget,
    "importance_weights": q_importance_weights,
    # promoted by the fourth recorded-50 audit (see __spark_entry__):
    # the hygiene composite
    "curate_corpus": q_curate_corpus,
    # promoted by the fifth recorded-50 audit (round 10): the tokenizer, the
    # keep/drop quality gate, and the CCNet-style LM signal — the three
    # operators every pretraining corpus run executes. The window now closes
    # at lm_perplexity = entry 50 (deferred in exchange: top50_orders,
    # simhash_fingerprint, ann_exclude_seen — see __spark_entry__._DEFERRED).
    "quality_filter": q_quality_filter,
    "tokenize_ids": q_tokenize_ids,
    "bpe_train": q_bpe_train,
    "training_batches": q_training_batches,
    "lm_perplexity": q_lm_perplexity,
    "cap_per_source": q_cap_per_source,
    "fuzzy_decontaminate": q_fuzzy_decontaminate,  # round 14; registers
    # past the recorded window (the window closes at lm_perplexity above)
    "pack_token_bins": q_pack_token_bins,
    "mixture_weights": q_mixture_weights,
    "cluster_balanced_sample": q_cluster_balanced_sample,
    "profile_orders": q_profile_orders,
    "pii_redaction": q_pii_redaction,
    # no oracle (HLL++ sketch is engine-specific): driver records rows+schema;
    # value coverage = tolerance gate vs the exact twin (test_curation.py)
    "approx_profile_orders": q_approx_profile_orders,
    "doc_chunks": q_doc_chunks,
    "snapshot_diff": q_snapshot_diff,
    "weighted_sample": q_weighted_sample,
    "vocab_coverage": q_vocab_coverage,
    "bpe_pairs": q_bpe_pairs,
    "incremental_curate": q_incremental_curate,
    "quantize_embeddings": q_quantize_embeddings,
    "url_dedup": q_url_dedup,
    # round-10 additions (registered here so the recorded-50 window above
    # stays stable; defined in queries_ext with the other ANN queries)
    "ann_recall_report": _QX.q_ann_recall_report,
    "quantized_ann_overlap": _QX.q_quantized_ann_overlap,
    "dup_span_coverage": q_dup_span_coverage,
    "bm25_topk": q_bm25_topk,
    "semdedup_survivors": _QX.q_semdedup_survivors,
    "dup_span_trim": q_dup_span_trim,
    "warc_extract": q_warc_extract,
    "line_dedup": q_line_dedup,
    "corpus_health": q_corpus_health,
    "bpe_encode": q_bpe_encode,
    "profile_drift": q_profile_drift,
    "dup_max_spans": q_dup_max_spans,
    # round-15 additions (registered past the recorded window)
    "heavy_hitter_grams": q_heavy_hitter_grams,
    "hybrid_rrf_topk": q_hybrid_rrf_topk,
}

ORACLES_CUR: dict[str, str] = {
    "ann_recall_report": _QX.SQL_ANN_RECALL_REPORT,
    "quantized_ann_overlap": _QX.SQL_QUANTIZED_ANN_OVERLAP,
    "dup_span_coverage": SQL_DUP_SPAN_COVERAGE,
    "bm25_topk": SQL_BM25_TOPK,
    "semdedup_survivors": _QX.SQL_SEMDEDUP_SURVIVORS,
    "dup_span_trim": SQL_DUP_SPAN_TRIM,
    "warc_extract": SQL_WARC_EXTRACT,
    "line_dedup": SQL_LINE_DEDUP,
    "corpus_health": SQL_CORPUS_HEALTH,
    "bpe_train": SQL_BPE_TRAIN,
    "bpe_encode": SQL_BPE_ENCODE,
    "training_batches": SQL_TRAINING_BATCHES,
    "profile_drift": SQL_PROFILE_DRIFT,
    "pii_redaction": _sql_pii_redaction(),
    "doc_chunks": SQL_DOC_CHUNKS,
    "snapshot_diff": SQL_SNAPSHOT_DIFF,
    "curate_corpus": SQL_CURATE_CORPUS,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
    "vocab_coverage": SQL_VOCAB_COVERAGE,
    "decontaminate": SQL_DECONTAMINATE,
    "fuzzy_decontaminate": _fuzzy_decon_sql(),
    "mixture_weights": SQL_MIXTURE_WEIGHTS,
    "sample_stratified": SQL_SAMPLE_STRATIFIED,
    "cap_per_source": SQL_CAP_PER_SOURCE,
    "negative_sample": SQL_NEGATIVE_SAMPLE,
    "pack_token_bins": SQL_PACK_TOKEN_BINS,
    "boilerplate_ngrams": SQL_BOILERPLATE_NGRAMS,
    "select_token_budget": SQL_SELECT_TOKEN_BUDGET,
    "cluster_balanced_sample": _sql_cluster_balanced_sample(),
    "importance_weights": SQL_IMPORTANCE_WEIGHTS,
    "profile_orders": SQL_PROFILE_ORDERS,
    "quality_filter": SQL_QUALITY_FILTER,
    "bpe_pairs": SQL_BPE_PAIRS,
    "tokenize_ids": SQL_TOKENIZE_IDS,
    "incremental_curate": SQL_INCREMENTAL_CURATE,
    "quantize_embeddings": SQL_QUANTIZE_EMBEDDINGS,
    "lm_perplexity": SQL_LM_PERPLEXITY,
    "url_dedup": SQL_URL_DEDUP,
    "dup_max_spans": SQL_DUP_MAX_SPANS,
    "heavy_hitter_grams": SQL_HEAVY_HITTER_GRAMS,
    "hybrid_rrf_topk": SQL_HYBRID_RRF_TOPK,
}
