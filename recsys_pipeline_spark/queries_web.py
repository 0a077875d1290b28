"""Web-crawl ingest queries: the crawl→corpus front half upstream of every
curation stage — HTML main-content extraction (`html_extract`), the
host-graph quality signal (`pagerank_hosts`, integer-exact so five
iterations are bit-identical across engines), z-order write-layout planning
(`zorder_layout`), and the end-to-end ingest composite (`crawl_ingest`:
WARC parse → HTML extract → URL-canonicalization dedup → quality gate —
the stage every 100 TB corpus run executes first), plus
`host_quality_filter` (PageRank-gated curation: host rank x document
quality gate — the reason a corpus run computes host ranks at all).

The testdata carries no raw-crawl table, so — like `warc_extract` and
`url_dedup` before them — these queries SYNTHESIZE deterministic pages
from the documents table (title with escaped entities, a <style> block, a
<script> block containing a trap href and a bare ``<`` comparison, a nav
link carrying the url_dedup messy URL, the document text as the single
paragraph, and ``doc_id % 3`` extra links), so every parse hazard the
operators pin is present in every run. The html_extract oracle REBUILDS
the same page in DuckDB and runs the SAME RE2-safe regex chain (the
operators use no Java-regex-only syntax precisely so the oracle can); the
crawl_ingest oracle derives the expected survivors analytically from the
raw documents table (the warc_extract identity-oracle precedent: content
tokens == text tokens by construction, so the gate signals are computable
without re-running the parser).

No reference counterpart: the reference pipeline starts from already-clean
interaction logs (offline/preprocess/s1_data_split.py:9-11); these cover
the crawl stages upstream of it. See operators/web.py for the scale notes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recsys_pipeline_spark.io import read_table
from recsys_pipeline_spark.operators import text
from recsys_pipeline_spark.operators import web as W
from recsys_pipeline_spark.queries_curation import (
    _H,
    _TOKENS,
    _URL_CANON_SQL,
    _URL_RAW,
    QF_DUP3_PPM_MAX,
    QF_MAX_TOKENS,
    QF_MIN_TOKENS,
    QF_MTL_MAX_X100,
    QF_MTL_MIN_X100,
)


def _sqlq(s: str) -> str:
    """Single-quoted SQL string literal (DuckDB standard strings keep
    backslashes literal, so regex patterns pass through unchanged)."""
    return "'" + s.replace("'", "''") + "'"


# ---------------------------------------------------------------------------
# Deterministic page synthesis (shared by html_extract and crawl_ingest)
# ---------------------------------------------------------------------------
# Literal fragments used verbatim by BOTH the Spark builder and the DuckDB
# oracle builder, so the two engines parse the byte-identical page.
_PG1 = "<html><head><title>Doc "
_PG2 = " &amp; &quot;"
_PG3 = (
    "&quot;</title><style>p { color: #222; }</style>"
    "<script type=\"text/javascript\">var trap = "
    "'href=\"https://trap.example/x\"'; var cmp = (1 < 2);</script>"
    '</head><body><nav><a href="'
)
_PG4 = '">home</a></nav><p>'
_PG5 = "</p>"
_LINK = '<a href="https://example.com/next">more</a>'
_PG6 = "</body></html>"

# the url_dedup messy URL, Spark-side (SQL-side is queries_curation._URL_RAW)
def _messy_url(did) -> F.Column:
    return F.concat(
        F.lit("https://WWW."),
        F.col("source"),
        F.lit(".Example.COM:443/p/"),
        (did % 7).cast("string"),
        F.lit("/?utm_source=feed&id="),
        (did % 3).cast("string"),
    )


def _synth_page(did) -> F.Column:
    return F.concat(
        F.lit(_PG1), did.cast("string"), F.lit(_PG2), F.col("source"),
        F.lit(_PG3), _messy_url(did), F.lit(_PG4), F.col("text"),
        F.lit(_PG5),
        F.expr(f"repeat({_sqlq(_LINK)}, CAST(doc_id % 3 AS INT))"),
        F.lit(_PG6),
    )


_PAGE_SQL = (
    f"{_sqlq(_PG1)} || CAST(doc_id AS VARCHAR) || {_sqlq(_PG2)} || source || "
    f"{_sqlq(_PG3)} || {_URL_RAW} || {_sqlq(_PG4)} || text || {_sqlq(_PG5)} || "
    f"repeat({_sqlq(_LINK)}, CAST(doc_id % 3 AS INT)) || {_sqlq(_PG6)}"
)


def _clean_sql(x: str) -> str:
    """DuckDB twin of operators/web._clean_block: tag strip → entity
    unescape (same order, &amp; last) → whitespace collapse → trim."""
    u = f"regexp_replace({x}, {_sqlq(W._TAG_RE)}, '', 'g')"
    for ent, ch in W._ENTITIES:
        u = f"replace({u}, {_sqlq(ent)}, {_sqlq(ch)})"
    return f"trim(regexp_replace({u}, '\\s+', ' ', 'g'))"


# ---------------------------------------------------------------------------
# html_extract
# ---------------------------------------------------------------------------

def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction over synthesized pages: title (entities
    unescaped), paragraph content, links collected AFTER script/style
    stripping (the trap href inside the script block must not count).
    Links are emitted CSV-joined — scalar-column result contract."""
    d = read_table(spark, sf_dir, "documents")
    pages = d.select("doc_id", _synth_page(F.col("doc_id")).alias("page"))
    ex = W.html_extract(pages, "page")
    return ex.select(
        "doc_id", "title", "content",
        F.array_join("links", ",").alias("links_csv"), "n_links",
    )


_STRIPPED_SQL = (
    f"regexp_replace(regexp_replace({_PAGE_SQL}, {_sqlq(W._SCRIPT_RE)}, '', 'g'),"
    f" {_sqlq(W._STYLE_RE)}, '', 'g')"
)

SQL_HTML_EXTRACT = f"""
WITH s AS (SELECT doc_id, {_STRIPPED_SQL} AS stripped FROM documents)
SELECT doc_id,
       {_clean_sql(f"regexp_extract(stripped, {_sqlq(W._TITLE_RE)}, 1)")} AS title,
       {_clean_sql(f"array_to_string(regexp_extract_all(stripped, {_sqlq(W._PARA_RE)}, 1), ' ')")} AS content,
       array_to_string(regexp_extract_all(stripped, {_sqlq(W._HREF_RE)}, 1), ',') AS links_csv,
       CAST(len(regexp_extract_all(stripped, {_sqlq(W._HREF_RE)}, 1)) AS INT) AS n_links
FROM s
"""


# ---------------------------------------------------------------------------
# pagerank_hosts
# ---------------------------------------------------------------------------

WEB_N_HOSTS = 600  # > n_docs at test scale, so dangling hosts exist and the
# dangling-mass redistribution branch is genuinely exercised every run
WEB_FANOUT = 3
PR_ITERS = 5


def q_pagerank_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact PageRank over the deterministic host graph derived
    from the corpus (hosts 0..599; docs hash their outlinks) — the
    crawl-quality signal a corpus run joins back onto documents to drop
    low-rank hosts. The oracle unrolls the same five iterations as CTEs;
    every step is BIGINT +,*,truncating-DIV so ranks match bit-for-bit."""
    d = read_table(spark, sf_dir, "documents")
    edges = W.host_edges(d, "doc_id", WEB_N_HOSTS, fanout=WEB_FANOUT)
    hosts = spark.range(WEB_N_HOSTS).select(F.col("id").alias("host"))
    return W.pagerank(edges, hosts, iters=PR_ITERS)


def _pagerank_ctes(n: int, fanout: int, iters: int, scale: int) -> str:
    """The unrolled-iteration CTE block (shared by the standalone oracle
    and the host_quality_filter composite's oracle); the final ranks frame
    is CTE ``r{iters}``."""
    base = (W.PR_DAMP_DEN - W.PR_DAMP_NUM) * scale // (W.PR_DAMP_DEN * n)
    union = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id % {n} AS src, "
        + _H.format(salt=f"'lnk{j}'", col="doc_id")
        + f" % {n} AS dst FROM documents"
        for j in range(1, fanout + 1)
    )
    ctes = [
        f"e AS (SELECT DISTINCT src, dst FROM (\n      {union}\n  ) WHERE src <> dst)",
        f"h AS (SELECT host FROM range({n}) t(host))",
        "od AS (SELECT src, count(*) AS out_deg FROM e GROUP BY src)",
        f"""r0 AS (SELECT h.host, CAST(coalesce(od.out_deg, 0) AS BIGINT) AS out_deg,
            CAST({scale // n} AS BIGINT) AS rank
     FROM h LEFT JOIN od ON h.host = od.src)""",
    ]
    for k in range(1, iters + 1):
        p = f"r{k - 1}"
        ctes.append(
            f"d{k} AS (SELECT CAST(coalesce(sum(rank), 0) // {n} AS BIGINT) AS share"
            f" FROM {p} WHERE out_deg = 0)"
        )
        ctes.append(
            f"i{k} AS (SELECT dst, CAST(sum(rank // out_deg) AS BIGINT) AS inflow"
            f" FROM e JOIN {p} ON e.src = {p}.host GROUP BY dst)"
        )
        ctes.append(
            f"""r{k} AS (SELECT r.host, r.out_deg,
            CAST({base} + ({W.PR_DAMP_NUM} * (coalesce(i.inflow, 0) + d.share))
                 // {W.PR_DAMP_DEN} AS BIGINT) AS rank
     FROM {p} r LEFT JOIN i{k} i ON r.host = i.dst CROSS JOIN d{k} d)"""
        )
    return ",\n".join(ctes)


SQL_PAGERANK_HOSTS = (
    "WITH "
    + _pagerank_ctes(WEB_N_HOSTS, WEB_FANOUT, PR_ITERS, W.PR_SCALE)
    + f"\nSELECT host, out_deg, rank AS rank_scaled FROM r{PR_ITERS}"
)


# ---------------------------------------------------------------------------
# zorder_layout
# ---------------------------------------------------------------------------

ZORDER_BITS = 8
ZORDER_SHIFT = 6


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone map of a z-order write layout over lineitem (l_partkey x
    l_suppkey) — the per-file min/max ranges a reader's two-column
    predicate pruning consults. Pure integer bit math, oracle-exact."""
    d = read_table(spark, sf_dir, "lineitem")
    return W.zorder_layout(
        d, "l_partkey", "l_suppkey", bits=ZORDER_BITS,
        rows_per_file_shift=ZORDER_SHIFT,
    )


def _zorder_sql(table: str, cx: str, cy: str, bits: int, shift: int) -> str:
    inter = " + ".join(
        f"((((qx >> {i}) & 1) << {2 * i}) + (((qy >> {i}) & 1) << {2 * i + 1}))"
        for i in range(bits)
    )
    return f"""
WITH s AS (SELECT CAST(min({cx}) AS BIGINT) AS mnx, CAST(max({cx}) AS BIGINT) AS mxx,
                  CAST(min({cy}) AS BIGINT) AS mny, CAST(max({cy}) AS BIGINT) AS mxy
           FROM {table}),
b AS (SELECT CAST({cx} AS BIGINT) AS x, CAST({cy} AS BIGINT) AS y,
             ((CAST({cx} AS BIGINT) - mnx) * {1 << bits}) // (mxx - mnx + 1) AS qx,
             ((CAST({cy} AS BIGINT) - mny) * {1 << bits}) // (mxy - mny + 1) AS qy
      FROM {table}, s),
z AS (SELECT x, y, ({inter}) // {1 << shift} AS file_id FROM b)
SELECT file_id, count(*) AS n_rows,
       min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
FROM z GROUP BY 1
"""


SQL_ZORDER_LAYOUT = _zorder_sql(
    "lineitem", "l_partkey", "l_suppkey", ZORDER_BITS, ZORDER_SHIFT
)


# ---------------------------------------------------------------------------
# zone_map_prune: the data-skipping contract, executable
# ---------------------------------------------------------------------------


def q_zone_map_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """z-order vs 1-D range partitioning, measured: plan both layouts over
    lineitem (l_partkey x l_suppkey) at the same file granularity,
    evaluate the canonical 1/8 x 1/8 range predicate against both zone
    maps, and report file/row read fractions in integer ppm. The whole
    reason to z-order — pruning on BOTH axes — becomes a hash-checked
    number instead of a docstring claim."""
    d = read_table(spark, sf_dir, "lineitem")
    return W.zone_map_prune(
        d, "l_partkey", "l_suppkey",
        bits=ZORDER_BITS, rows_per_file_shift=ZORDER_SHIFT,
    )


def _zone_prune_sql(table: str, cx: str, cy: str, bits: int, shift: int) -> str:
    inter = " + ".join(
        f"((((qx >> {i}) & 1) << {2 * i}) + (((qy >> {i}) & 1) << {2 * i + 1}))"
        for i in range(bits)
    )
    n_files = 1 << (2 * bits - shift)
    rep = """SELECT '{name}' AS layout,
       CAST(count(*) AS BIGINT) AS files_total,
       CAST(SUM(rd) AS BIGINT) AS files_read,
       CAST(SUM(rd) * 1000000 // count(*) AS BIGINT) AS files_read_ppm,
       CAST(SUM(n_rows) AS BIGINT) AS rows_total,
       CAST(SUM(n_rows * rd) AS BIGINT) AS rows_read,
       CAST(SUM(n_rows * rd) * 1000000 // SUM(n_rows) AS BIGINT) AS rows_read_ppm
FROM (SELECT n_rows,
             CASE WHEN max_x >= x1 AND min_x <= x2
                   AND max_y >= y1 AND min_y <= y2 THEN 1 ELSE 0 END AS rd
      FROM {zm}, pr)"""
    return f"""
WITH s AS (SELECT CAST(min({cx}) AS BIGINT) AS mnx, CAST(max({cx}) AS BIGINT) AS mxx,
                  CAST(min({cy}) AS BIGINT) AS mny, CAST(max({cy}) AS BIGINT) AS mxy
           FROM {table}),
b AS (SELECT CAST({cx} AS BIGINT) AS x, CAST({cy} AS BIGINT) AS y,
             ((CAST({cx} AS BIGINT) - mnx) * {1 << bits}) // (mxx - mnx + 1) AS qx,
             ((CAST({cy} AS BIGINT) - mny) * {1 << bits}) // (mxy - mny + 1) AS qy,
             ((CAST({cx} AS BIGINT) - mnx) * {n_files}) // (mxx - mnx + 1) AS xf
      FROM {table}, s),
zf AS (SELECT x, y, ({inter}) // {1 << shift} AS file_id FROM b),
zmap AS (SELECT file_id, count(*) AS n_rows, min(x) AS min_x, max(x) AS max_x,
                min(y) AS min_y, max(y) AS max_y FROM zf GROUP BY 1),
xmap AS (SELECT xf AS file_id, count(*) AS n_rows, min(x) AS min_x, max(x) AS max_x,
                min(y) AS min_y, max(y) AS max_y FROM b GROUP BY 1),
pr AS (SELECT mnx AS x1, mnx + (mxx - mnx) // 8 AS x2,
              mny AS y1, mny + (mxy - mny) // 8 AS y2 FROM s)
{rep.format(name="zorder", zm="zmap")}
UNION ALL
{rep.format(name="xpart", zm="xmap")}
"""


SQL_ZONE_MAP_PRUNE = _zone_prune_sql(
    "lineitem", "l_partkey", "l_suppkey", ZORDER_BITS, ZORDER_SHIFT,
)


# ---------------------------------------------------------------------------
# crawl_ingest composite
# ---------------------------------------------------------------------------

def warc_blobs(docs: DataFrame) -> DataFrame:
    """Test-rig synthesis: wrap each document's synthesized page in a
    Content-Length-framed WARC record (messy URL in WARC-Target-URI) and
    concatenate 40 records per capture blob — the object-store file shape
    a real ingest reads. Shared by the batch composite and the streaming
    twin's test input so both parse the byte-identical captures."""
    did = F.col("doc_id")
    page = _synth_page(did)
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        _messy_url(did),
        F.lit("\r\nContent-Length: "), F.octet_length(page).cast("string"),
        F.lit("\r\n\r\n"), page, F.lit("\r\n\r\n"),
    )
    return (
        docs.select(
            (did % 40).alias("file_id"),
            F.struct("doc_id", rec.alias("rec")).alias("s"),
        )
        .groupBy("file_id")
        .agg(
            F.encode(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list("s")), lambda x: x["rec"]
                    ),
                    "",
                ),
                "UTF-8",
            ).alias("blob")
        )
    )


def extract_keyed(parsed: DataFrame) -> DataFrame:
    """parse_warc output → html_extract → the keyed ingest frame
    (doc_id, canonical_url, content, n_links). The doc id is recovered
    from the parsed page's title (the synthesis embeds it there — in
    production this is the crawl record id); the dedup key is the
    CANONICAL form of the WARC header URL. Shared verbatim by the batch
    composite and the streaming twin, so the pair cannot diverge."""
    ex = W.html_extract(parsed, "content")
    return ex.select(
        F.regexp_extract("title", r"Doc ([0-9]+) ", 1).cast("long").alias("doc_id"),
        text.canonical_url(F.col("url")).alias("canonical_url"),
        "content",
        "n_links",
    )


def q_crawl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end crawl ingest — the first stage of every 100 TB corpus
    run, as one registered query: WARC capture blobs (Content-Length
    framing, messy URL in WARC-Target-URI) → byte-scanner parse
    (multimodal.parse_warc) → HTML main-content extraction (web.html_extract)
    → URL-canonicalization dedup (min-doc keeper per canonical URL, the
    url_dedup chain) → rule gate on the EXTRACTED content with drop-reason
    audit (curation.quality_gate). Every piece is independently
    oracle-verified; this pins their wiring — the ingest analog of
    curate_corpus.

    Scale: synthesis + parse + extract is one Arrow mapInPandas narrow map
    over file-sized blobs (the blob column is consumed exactly once); the
    dedup is ONE exchange on the canonical key; the keeper frame
    materializes once (lazy localCheckpoint — two consumers: the gate's
    signal passes and the final join) so the parse never re-runs; the gate
    adds its usual co-keyed gram exchanges on the (already keeper-sized)
    survivor set.
    """
    return crawl_ingest_report(read_table(spark, sf_dir, "documents"))


def crawl_ingest_report(d: DataFrame) -> DataFrame:
    """The composite over an explicit documents frame (q_crawl_ingest reads
    the table; the streaming parity tests run it on prefix slices)."""
    from recsys_pipeline_spark.operators.curation import quality_gate
    from recsys_pipeline_spark.operators.multimodal import parse_warc

    parsed = parse_warc(warc_blobs(d), "blob")
    keyed = extract_keyed(parsed)
    keeper = (
        keyed.groupBy("canonical_url")
        .agg(
            F.min(F.struct("doc_id", "n_links", "content")).alias("s"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .select(
            "canonical_url", F.col("s.doc_id").alias("doc_id"),
            F.col("s.n_links").alias("n_links"), F.col("s.content").alias("content"),
            "n_docs",
        )
        .localCheckpoint(eager=False)
    )
    gate = quality_gate(
        keeper.select("doc_id", "content"),
        "doc_id",
        "content",
        min_tokens=QF_MIN_TOKENS,
        max_tokens=QF_MAX_TOKENS,
        min_mtl_x100=QF_MTL_MIN_X100,
        max_mtl_x100=QF_MTL_MAX_X100,
        dup3_ppm_max=QF_DUP3_PPM_MAX,
    )
    return keeper.join(gate, "doc_id").select(
        "doc_id", "canonical_url", "n_docs", "n_links",
        "n_tokens", "drop_reasons", "keep",
    )


_STOP_EN = "('the','a','of','and','to','in','is','it','that','for')"

SQL_CRAWL_INGEST = f"""
WITH u AS (
  SELECT doc_id, {_URL_CANON_SQL.format(u=_URL_RAW)} AS canonical_url
  FROM documents
),
k AS (
  SELECT canonical_url, min(doc_id) AS doc_id, count(*) AS n_docs
  FROM u GROUP BY 1
),
t AS (
  SELECT d.doc_id, k.canonical_url, k.n_docs, {_TOKENS} AS toks
  FROM documents d JOIN k ON d.doc_id = k.doc_id
),
sig AS (
  SELECT doc_id, canonical_url, n_docs, len(toks) AS n_tokens,
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
  SELECT doc_id, canonical_url, n_docs, n_tokens, mean_tok_len_x100, stop_hits,
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
  FROM d2
)
SELECT doc_id, canonical_url, n_docs, CAST(1 + doc_id % 3 AS INT) AS n_links,
       n_tokens, drop_reasons,
       CASE WHEN drop_reasons = '' THEN 1 ELSE 0 END AS keep
FROM r
"""


# ---------------------------------------------------------------------------
# host_quality_filter: rank x gate — the reason a corpus run computes
# PageRank at all (Common Crawl-style pipelines drop documents from
# low-rank hosts before any per-document scoring is trusted)
# ---------------------------------------------------------------------------

def q_host_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keep decision combining the HOST-level crawl-quality
    signal with the per-document rule gate: a doc survives iff its host's
    PageRank is at least the uniform mass (`scale DIV n_hosts` — hosts the
    link graph favors) AND the document itself passes the quality rules.
    Output is the audit row a curation run logs: both verdicts separately
    plus the conjunction.

    Scale: ranks are a |hosts|-row frame — broadcast into the doc join
    (never a shuffle of the corpus); the gate signals are the
    quality_filter plan; threshold is integer algebra, no percentile pass.
    """
    from recsys_pipeline_spark.operators.curation import quality_gate

    d = read_table(spark, sf_dir, "documents")
    edges = W.host_edges(d, "doc_id", WEB_N_HOSTS, fanout=WEB_FANOUT)
    hosts = spark.range(WEB_N_HOSTS).select(F.col("id").alias("host"))
    ranks = W.pagerank(edges, hosts, iters=PR_ITERS).select("host", "rank_scaled")
    uniform = W.PR_SCALE // WEB_N_HOSTS
    # r16 (guide §2.4): the doc->host map is a pure function of doc_id, so
    # it is computed INLINE on the gate output instead of joining the gate
    # back to a second corpus projection on doc_id — that join was a
    # corpus x corpus equi-join (sort-merge at scale) plus one more
    # documents scan, for a column the gate rows already determine.
    gate = quality_gate(
        d, "doc_id", "text",
        min_tokens=QF_MIN_TOKENS, max_tokens=QF_MAX_TOKENS,
        min_mtl_x100=QF_MTL_MIN_X100, max_mtl_x100=QF_MTL_MAX_X100,
        dup3_ppm_max=QF_DUP3_PPM_MAX,
    ).select(
        "doc_id",
        (F.col("doc_id") % WEB_N_HOSTS).cast("long").alias("host"),
        F.col("keep").alias("doc_ok"),
    )
    return (
        gate.join(F.broadcast(ranks), "host")
        .select(
            "doc_id",
            "host",
            "rank_scaled",
            F.when(F.col("rank_scaled") >= uniform, 1).otherwise(0).alias("host_ok"),
            "doc_ok",
            (
                F.when(F.col("rank_scaled") >= uniform, 1).otherwise(0)
                * F.col("doc_ok")
            ).alias("keep"),
        )
    )


SQL_HOST_QUALITY_FILTER = (
    "WITH "
    + _pagerank_ctes(WEB_N_HOSTS, WEB_FANOUT, PR_ITERS, W.PR_SCALE)
    + f""",
qt AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
qsig AS (
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
  FROM qt
),
qd AS (
  SELECT doc_id, n_tokens, mean_tok_len_x100, stop_hits,
         CASE WHEN len(grams) > 0
              THEN (len(grams) - len(list_distinct(grams))) * 1000000
                   // len(grams)
              ELSE 0 END AS dup3_ppm
  FROM qsig
),
qg AS (
  SELECT doc_id,
         CASE WHEN n_tokens >= {QF_MIN_TOKENS} AND n_tokens <= {QF_MAX_TOKENS}
               AND mean_tok_len_x100 >= {QF_MTL_MIN_X100}
               AND mean_tok_len_x100 <= {QF_MTL_MAX_X100}
               AND stop_hits > 0 AND dup3_ppm <= {QF_DUP3_PPM_MAX}
              THEN 1 ELSE 0 END AS doc_ok
  FROM qd
)
SELECT d.doc_id, d.doc_id % {WEB_N_HOSTS} AS host, r.rank AS rank_scaled,
       CASE WHEN r.rank >= {W.PR_SCALE // WEB_N_HOSTS} THEN 1 ELSE 0 END
         AS host_ok,
       qg.doc_ok,
       (CASE WHEN r.rank >= {W.PR_SCALE // WEB_N_HOSTS} THEN 1 ELSE 0 END)
         * qg.doc_ok AS keep
FROM documents d
JOIN r{PR_ITERS} r ON d.doc_id % {WEB_N_HOSTS} = r.host
JOIN qg ON d.doc_id = qg.doc_id
"""
)


def q_host_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host triangle participation over the corpus-derived host link
    graph — the clustering/community-density signal next to PageRank's
    centrality (a host embedded in many triangles is a tightly-linked
    cluster member; link farms and organic communities separate on exactly
    this count). Degree-ordered orientation bounds the wedge join at
    Sigma out_deg^2 (graph.triangle_counts); the oracle is the canonical
    a<b<c three-way self-join, exact at oracle scale."""
    from recsys_pipeline_spark.operators import graph as G

    d = read_table(spark, sf_dir, "documents")
    edges = W.host_edges(d, "doc_id", WEB_N_HOSTS, fanout=WEB_FANOUT)
    return G.triangle_counts(edges, src="src", dst="dst")


def _edge_union_sql(n: int, fanout: int) -> str:
    return "\n      UNION ALL\n      ".join(
        f"SELECT doc_id % {n} AS src, "
        + _H.format(salt=f"'lnk{j}'", col="doc_id")
        + f" % {n} AS dst FROM documents"
        for j in range(1, fanout + 1)
    )


SQL_HOST_TRIANGLES = f"""
WITH e0 AS (
  {_edge_union_sql(WEB_N_HOSTS, WEB_FANOUT)}
),
und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM e0 WHERE src <> dst),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e2.u = e1.v
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
),
vx AS (SELECT a AS host FROM tri
       UNION ALL SELECT b FROM tri
       UNION ALL SELECT c FROM tri)
SELECT host, CAST(count(*) AS BIGINT) AS n_triangles
FROM vx GROUP BY 1
"""


QUERIES_WEB: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "html_extract": q_html_extract,
    "pagerank_hosts": q_pagerank_hosts,
    "zorder_layout": q_zorder_layout,
    "zone_map_prune": q_zone_map_prune,
    "crawl_ingest": q_crawl_ingest,
    "host_quality_filter": q_host_quality_filter,
    "host_triangles": q_host_triangles,
}

ORACLES_WEB: dict[str, str] = {
    "html_extract": SQL_HTML_EXTRACT,
    "pagerank_hosts": SQL_PAGERANK_HOSTS,
    "zorder_layout": SQL_ZORDER_LAYOUT,
    "zone_map_prune": SQL_ZONE_MAP_PRUNE,
    "crawl_ingest": SQL_CRAWL_INGEST,
    "host_quality_filter": SQL_HOST_QUALITY_FILTER,
    "host_triangles": SQL_HOST_TRIANGLES,
}
