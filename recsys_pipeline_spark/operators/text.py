"""Text-analysis operators for large-scale training-data pipelines: token
stats, quality scoring, language-ID heuristic, document fingerprinting,
character shingles.

Everything is built-in `pyspark.sql.functions` expressions (JVM-side, inside
whole-stage codegen) — no Python UDFs anywhere in the hot path. All arithmetic
is int-or-deterministic-double so results are engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language heuristic.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "un", "est", "pas", "que", "en", "du"],
    "zh": ["的", "是", "在", "了", "我", "有", "和", "人", "这", "中"],
}
LANG_PREFERENCE = ["en", "de", "es", "fr", "zh"]  # deterministic tie-break order

PUNCT_CLASS = r"[^.,!?;:]"


def tokens(col: Column) -> Column:
    """Whitespace tokenization, lowercased, empties dropped."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda x: x != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


# GPT2-style pre-tokenizer shape, kept RE2-safe (no lookahead; alternatives
# disjoint by leading char) so the SAME pattern runs identically in Spark
# (Java regex) and DuckDB/RE2 oracles.
BPE_PRETOKEN_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def bpe_token_count(col: Column) -> Column:
    """Subword-style token count: letters / digits / punctuation runs with
    optional leading space — the BPE pre-tokenization granularity (a proxy
    for LLM token budgets; whitespace token_count undercounts code/punct)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_PRETOKEN_PATTERN), 0))


def punct_count(col: Column) -> Column:
    """Number of sentence-punctuation characters."""
    return F.length(F.regexp_replace(col, PUNCT_CLASS, ""))


def char_shingles(col_name: str, n: int = 3) -> Column:
    """Character n-grams of a named column (the MinHash/Jaccard input units)."""
    return F.expr(
        f"transform(sequence(1, greatest(length({col_name}) - {n - 1}, 0)), i -> substr({col_name}, i, {n}))"
    )


def stopword_hits(col: Column, lang: str) -> Column:
    """How many tokens are stopwords of `lang`."""
    vocab = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(vocab, t)))


def lang_id(col: Column) -> Column:
    """Stopword-vote language guess with a fixed preference order on ties —
    a deterministic heuristic (reproducible in ANSI SQL for the oracle)."""
    scores = {lang: stopword_hits(col, lang) for lang in LANG_PREFERENCE}
    expr = F.lit(LANG_PREFERENCE[-1])
    # build the CASE chain back-to-front so earlier langs win ties
    for lang in reversed(LANG_PREFERENCE[:-1]):
        later = [scores[l2] for l2 in LANG_PREFERENCE[LANG_PREFERENCE.index(lang) + 1 :]]
        cond = None
        for s in later:
            c = scores[lang] >= s
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals: token count, mean token length, punct
    ratio, stopword ratio, alpha ratio — the usual pretraining-filter stack."""
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = F.size(toks)
    n_char = F.length(c)
    total_tok_len = F.aggregate(toks, F.lit(0), lambda s, t: s + F.length(t))
    return df.withColumns(
        {
            "n_chars2": n_char,
            "token_cnt": n_tok,
            "mean_token_len": F.when(n_tok > 0, total_tok_len.cast("double") / n_tok).otherwise(F.lit(0.0)),
            "punct_ratio": F.when(n_char > 0, punct_count(c).cast("double") / n_char).otherwise(F.lit(0.0)),
            "stopword_ratio": F.when(
                n_tok > 0, stopword_hits(c, "en").cast("double") / n_tok
            ).otherwise(F.lit(0.0)),
        }
    )


def fingerprint(col: Column) -> Column:
    """Whole-document fingerprint: md5 of the whitespace-normalized lowercase
    text (the exact-dedup key)."""
    normalized = F.concat_ws(" ", tokens(col))
    return F.md5(normalized)


def word_ngrams(col: Column, n: int) -> Column:
    """Word n-grams as space-joined strings (expression-only; empty array for
    docs shorter than n tokens — sequence(1, 0) would count DOWN in Spark,
    so the guard is explicit).

    This is the per-row array form (transform/slice higher-order functions —
    CodegenFallback): right for ad-hoc single-column use, WRONG for corpus
    hot paths, where the explode + element_at projection shape is ~15x
    faster (see q_doc_repetition and the MinHash lesson in PLANS.md)."""
    toks = tokens(col)
    cnt = F.size(toks) - (n - 1)
    idx = F.when(cnt >= 1, F.sequence(F.lit(1), cnt)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def dup_ngram_frac(col: Column, n: int = 3) -> Column:
    """Gopher-style repetition signal: fraction of word n-grams that are
    repeats of an earlier n-gram in the same document (0 for short docs).
    Pure array expressions — no shuffle; the per-doc n-gram list is bounded
    by the document length, the same bound tokenization already implies."""
    grams = word_ngrams(col, n)
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return F.when(total > 0, (total - distinct).cast("double") / total).otherwise(
        F.lit(0.0)
    )


# RE2-safe (no lookahead/backreference) so the SAME patterns run in Spark's
# Java regex and the DuckDB/RE2 oracle. Order matters: SSN before the general
# digit-run phone pattern, else phones swallow SSNs.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "phone": r"\+?[0-9][0-9()\- ]{6,}[0-9]",
}


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "clean", token: str = "[PII]"
) -> DataFrame:
    """PII scrubbing for training corpora: sequentially redact email / SSN /
    phone shapes, emitting per-kind match counts (counted on the text as it
    stood BEFORE that kind's replacement, so overlapping kinds are not
    double-counted). All regexp_replace/regexp_extract_all — JVM codegen,
    embarrassingly parallel, no shuffle."""
    cur: Column = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS.items():
        counts.append(F.size(F.regexp_extract_all(cur, F.lit(pat), 0)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, token)
    return df.select("*", *counts, cur.alias(out_col))


# URL canonicalization: the pragmatic crawl-dedup subset of RFC 3986
# normalization (scheme case, www, default ports, tracking params, trailing
# slash) — NOT a full parser; the chain is RE2-safe with CONSTANT
# replacements only, because Spark (Java, "$1") and DuckDB (RE2, "\\1")
# disagree on replacement-group syntax, so portable chains must avoid
# groups in the replacement entirely.
_URL_CANON_STEPS = (
    (r"^https?://", ""),           # scheme (case handled by lower() first)
    (r"^www\.", ""),               # www alias
    (r":(443|80)/", "/"),          # default ports before the path
    (r"utm_[a-z0-9_]*=[^&]*&", ""),      # tracking param followed by more
    (r"[?&]utm_[a-z0-9_]*=[^&]*$", ""),  # tracking param in final position
    (r"/\?", "?"),                 # trailing slash before the query
    (r"/$", ""),                   # trailing slash at the end
)


def canonical_url(col: Column) -> Column:
    """Canonical form of a URL for exact dedup: lowercase, scheme- and
    www-stripped, default ports removed, utm_* tracking params dropped,
    trailing slash normalized. Deduping crawls by canonical URL is the
    cheapest dedup stage — it runs before any content hashing and removes
    the bulk of re-crawl duplicates."""
    out = F.lower(col)
    for pat, repl in _URL_CANON_STEPS:
        out = F.regexp_replace(out, pat, repl)
    return out


# ---------------------------------------------------------------------------
# BM25 lexical retrieval (the reference's term-recall channel ranks by ES's
# BM25, online/readers/es_caller.py; the scoring is re-expressed as
# relational algebra here so it is engine-checkable and streamable)
# ---------------------------------------------------------------------------

def bm25_facts(
    docs: DataFrame, id_col: str, text_col: str, terms: tuple[str, ...]
) -> tuple[DataFrame, DataFrame]:
    """The corpus facts BM25 needs, as two frames designed to be STATE for
    the streaming twin: ``tfdl`` = (id, term, tf, dl) for documents
    matching a query term (append-once per doc — new docs only ever ADD
    rows), and ``stats`` = one row of LONG counters (n_docs, tot_tokens)
    — sum-mergeable across epochs. Scoring casts to double at use, so
    batch-on-corpus and merged-stream-state produce identical floats.

    Scale: one tokenize pass (lazy checkpoint — dl/stats/term stream all
    read it once); terms are filtered to the query's BEFORE the tf
    aggregate, so unmatched tokens never shuffle."""
    t = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("toks")
    ).localCheckpoint(eager=False)
    dl = t.select(id_col, F.size("toks").cast("long").alias("dl"))
    stats = t.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("toks")).alias("tot_tokens"),
    )
    term_rows = t.select(id_col, F.explode("toks").alias("term")).filter(
        F.col("term").isin(list(terms))
    )
    tf = term_rows.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    return tf.join(dl, id_col), stats


def bm25_topk_from_facts(
    tfdl: DataFrame,
    stats: DataFrame,
    id_col: str,
    terms: tuple[str, ...],
    k1: float,
    b: float,
    k: int,
) -> DataFrame:
    """BM25 top-k from the fact frames (see q_bm25_topk for the float
    discipline: ln() absorbed by 6dp rounding, per-doc summation is a
    FIXED-ORDER sum of per-term conditional aggregates, both engines order
    by the rounded score with id tiebreak).

    Scale: df re-derives from tfdl with one tiny aggregate (terms-sized);
    df and the scalar stats broadcast; one exchange for the per-doc
    pivot-sum; TakeOrdered for the top-k."""
    df_ = tfdl.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    stats_d = stats.select(
        F.col("n_docs").cast("double").alias("_n_docs"),
        F.col("tot_tokens").cast("double").alias("_tot"),
    )
    avgdl = F.col("_tot") / F.col("_n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    contrib = idf * (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl)
    )
    scored = (
        tfdl.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats_d))
        .select(id_col, "term", contrib.alias("_s"))
    )
    per_doc = scored.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.col("term") == term, F.col("_s"))).alias(f"_s{i}")
            for i, term in enumerate(terms)
        ]
    )
    score = F.lit(0.0)
    for i in range(len(terms)):
        score = score + F.coalesce(F.col(f"_s{i}"), F.lit(0.0))
    return (
        per_doc.select(id_col, F.round(score, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )
