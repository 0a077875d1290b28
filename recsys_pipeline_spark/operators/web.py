"""Web-crawl operators: the front half of a corpus pipeline that the WARC
ingest (`operators/multimodal.parse_warc`) feeds — main-content extraction
from raw HTML, the host-level link graph, and integer-exact PageRank as the
URL/host quality signal (the Common Crawl host-ranking stage every
crawl-derived corpus filters on) — plus z-order write-layout planning for
multi-column data skipping.

All arithmetic is engine-portable by construction: PageRank runs on scaled
BIGINT mass with truncating division on non-negative operands (Spark ``DIV``
== DuckDB ``//`` there), so a fixed iteration count produces bit-identical
ranks in Spark and the DuckDB oracle; z-values are pure integer bit math.
Every regex is RE2-safe (no backreferences, no lookaround) so the SAME
pattern strings run in Spark (Java regex) and the DuckDB/RE2 oracle —
see queries_web.py for the registered oracle-checked queries and
tests/test_web.py for the pinned parse-order/entity semantics.

No reference counterpart: the reference pipeline starts from already-clean
interaction logs (offline/preprocess/s1_data_split.py:9-11 reads the ml-1m
ratings file); these operators cover the crawl→corpus stages upstream of it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from recsys_pipeline_spark.operators.dedup import portable_hash64

# ---------------------------------------------------------------------------
# HTML main-content extraction
# ---------------------------------------------------------------------------

# Paragraph-based main-content heuristic (the readability-family contract):
# content = the concatenation of <p>…</p> block texts, inline tags stripped,
# named entities unescaped, whitespace collapsed. Anchors, nav lists, scripts
# and styles never reach the content column.
#
# Script and style blocks are stripped with two separate literal-tag patterns
# instead of one backreference pattern (<(script|style)>.*?</\1>): RE2 — the
# regex engine behind the DuckDB oracle — has no backreferences, and the two
# literal patterns are bit-equivalent for well-formed blocks.
_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script>"
_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style>"
_TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"
_PARA_RE = r"(?is)<p\b[^>]*>(.*?)</p>"
_HREF_RE = r'(?i)href="([^"]*)"'
_TAG_RE = r"(?s)<[^>]*>"

# Handled named entities, in application order. &amp; is deliberately LAST —
# the inverse application order of escaping (escape does & first) — so
# escape→unescape round trips are exact and double-escaped input unescapes
# exactly one level (&amp;lt; → &lt;, matching browser semantics). Numeric
# character references other than &#39; are OUT of contract (documented
# narrowing): the corpus this stage targets is entity-light crawl text, and
# partial numeric handling would be worse than a pinned explicit set.
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def _unescape(col: Column) -> Column:
    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _clean_block(col: Column) -> Column:
    """Strip inline tags, unescape entities, collapse whitespace."""
    col = F.regexp_replace(col, _TAG_RE, "")
    col = _unescape(col)
    col = F.regexp_replace(col, r"\s+", " ")
    return F.trim(col)


def html_extract(df: DataFrame, html_col: str) -> DataFrame:
    """Parse an HTML string column into (title, content, links, n_links).

    The parse order matters and is pinned by tests/test_web.py: script/style
    blocks are removed FIRST (so a ``</p>`` inside a script cannot terminate
    a paragraph and an href inside a script body cannot inflate ``links``),
    then the title is captured, hrefs collected from the STRIPPED page, and
    paragraph blocks extracted and cleaned.

    Scale: a pure regexp/HOF chain over the page column — zero exchanges,
    whole-stage codegen end to end; at 100 TB this runs as a narrow map on
    the raw-crawl scan, exactly like `parse_warc` upstream of it.
    """
    stripped = F.regexp_replace(
        F.regexp_replace(F.col(html_col), _SCRIPT_RE, ""), _STYLE_RE, ""
    )
    paras = F.regexp_extract_all(stripped, F.lit(_PARA_RE), 1)
    return df.select(
        *[c for c in df.columns if c != html_col],
        _clean_block(F.regexp_extract(stripped, _TITLE_RE, 1)).alias("title"),
        _clean_block(F.array_join(paras, " ")).alias("content"),
        F.regexp_extract_all(stripped, F.lit(_HREF_RE), 1).alias("links"),
    ).withColumn("n_links", F.size("links").cast("int"))


# ---------------------------------------------------------------------------
# Host link graph + integer PageRank
# ---------------------------------------------------------------------------

PR_SCALE = 10**12  # total rank mass, as BIGINT
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio


def host_edges(
    docs: DataFrame, id_col: str, n_hosts: int, fanout: int = 3
) -> DataFrame:
    """Deterministic host-level link graph derived from the corpus: each
    document's host is ``id % n_hosts``; its outlinks go to ``fanout``
    hash-drawn hosts (md5-fold, the oracle-portable hash — salt ``lnk{j}``).
    Self-loops dropped, parallel edges collapsed.

    Scale: the distinct is one shuffle on (src, dst) — at 100 TB this is the
    edge-list build any link-graph job pays once, then amortizes across all
    PageRank iterations.
    """
    doc_id = F.col(id_col)
    pairs = [
        F.struct(
            (doc_id % n_hosts).cast("long").alias("src"),
            (
                portable_hash64(
                    F.concat(F.lit(f"lnk{j}:"), doc_id.cast("string"))
                )
                % n_hosts
            ).alias("dst"),
        )
        for j in range(1, fanout + 1)
    ]
    return (
        docs.select(F.explode(F.array(*pairs)).alias("e"))
        .select("e.src", "e.dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    hosts: DataFrame,
    iters: int = 5,
    scale: int = PR_SCALE,
    max_broadcast_nodes: int = 5_000_000,
) -> DataFrame:
    """Integer-exact PageRank: rank mass is BIGINT (``scale`` total), each
    iteration sends ``rank DIV out_degree`` along every edge, damps the
    inflow by 85/100 with truncating division, and redistributes dangling
    mass equally. Every operation is integer +,*,DIV on non-negative values
    — bit-identical across engines, so a fixed iteration count is exactly
    reproducible in ANSI SQL (the oracle unrolls the same steps as CTEs;
    see queries_web.SQL_PAGERANK_HOSTS).

    ``hosts`` must be one row per node (column ``host``) and non-empty
    (raises ValueError otherwise); nodes missing from ``edges`` still hold
    and shed rank (as dangling mass).

    Scale: ranks are |hosts|-sized while edges are corpus-sized — the
    iteration joins edges⋈ranks on src, then aggregates inflow by dst: one
    shuffle per iteration, on the same dst key every time, so a cluster
    pre-partitions edges by src and reuses the exchange. The node-sized
    frames (out_deg, ranks, inflow) broadcast ONLY while the node count is
    under ``max_broadcast_nodes`` — a host-level graph fits, a URL-level
    graph does not, and there the joins fall back to shuffle joins on the
    pre-partitioned edge key (the `retrieve.py` max_broadcast_items
    pattern). Lineage is truncated per iteration (localCheckpoint, lazy) so
    the rounds don't nest plans.
    """
    n = hosts.count()
    if n == 0:
        raise ValueError("pagerank: hosts frame is empty (n == 0)")
    broadcast_ok = n <= max_broadcast_nodes
    bcast = (lambda d: F.broadcast(d)) if broadcast_ok else (lambda d: d)
    # pay the edge-list build (scan -> explode -> distinct shuffle) ONCE:
    # without the checkpoint every iteration's contrib join re-executes it.
    # The shuffle path additionally pre-partitions by src so each
    # iteration's join reuses the exchange.
    if broadcast_ok:
        edges = edges.localCheckpoint(eager=False)
    else:
        edges = edges.repartition(F.col("src")).localCheckpoint(eager=False)
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * scale // (PR_DAMP_DEN * n)
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ranks = hosts.join(bcast(out_deg), hosts.host == out_deg.src, "left").select(
        "host", F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
        F.lit(scale // n).cast("long").alias("rank"),
    )
    # Dangling-mass share per iteration: on the broadcast path the share is
    # a global window over the node-sized ranks frame (one single-partition
    # window inside the update stage) instead of a separate filter+agg job
    # crossJoined as a broadcast — that was one extra broadcast-build job
    # per iteration, and on a node-bounded graph the per-iteration cost IS
    # the job scheduling (r16 A/B at sf0.1: 1.67 s -> 1.54 s min for 5
    # rounds on the 600-host graph). The window frame is node-sized and
    # capped by max_broadcast_nodes, the same bound that lets ranks
    # broadcast at all. The shuffle path keeps the scalar agg + 1-row
    # crossJoin: a URL-scale ranks frame must never collapse to one
    # partition.
    from pyspark.sql import Window as _W

    _wall = _W.partitionBy()
    for _ in range(iters):
        ranks = ranks.localCheckpoint(eager=False)
        contrib = edges.join(bcast(ranks), edges.src == ranks.host).select(
            "dst", F.expr("rank DIV out_deg").alias("c")
        )
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("inflow"))
        new_rank = (
            F.lit(base)
            + F.expr(
                f"({PR_DAMP_NUM} * (coalesce(inflow, 0) + (_dang DIV {n})))"
                f" DIV {PR_DAMP_DEN}"
            )
        ).cast("long").alias("rank")
        if broadcast_ok:
            ranks = (
                ranks.withColumn(
                    "_dang",
                    F.coalesce(
                        F.sum(
                            F.when(F.col("out_deg") == 0, F.col("rank"))
                        ).over(_wall),
                        F.lit(0),
                    ),
                )
                .join(F.broadcast(inflow), ranks.host == inflow.dst, "left")
                .select("host", "out_deg", new_rank)
            )
        else:
            dangling = (
                ranks.filter(F.col("out_deg") == 0)
                .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("d"))
                .select(F.col("d").alias("_dang"))
            )
            ranks = (
                ranks.join(inflow, ranks.host == inflow.dst, "left")
                .crossJoin(F.broadcast(dangling))  # always 1 row
                .select("host", "out_deg", new_rank)
            )
    return ranks.select("host", "out_deg", F.col("rank").alias("rank_scaled"))


# ---------------------------------------------------------------------------
# Z-order write layout
# ---------------------------------------------------------------------------

def _interleave_bits(x: Column, y: Column, bits: int) -> Column:
    """Z-value: interleave the low ``bits`` of x (even positions) and y (odd
    positions) — a sum of constant shift/mask terms, all codegen."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_layout(
    df: DataFrame,
    col_x: str,
    col_y: str,
    *,
    bits: int = 8,
    rows_per_file_shift: int = 6,
) -> DataFrame:
    """Plan a z-order write layout over two columns and report the resulting
    zone map: each row's (x, y) is range-bucketed to ``bits`` bits against
    the column's [min, max] span (offset-then-scale integer mult/div —
    exact, and valid for negative values because the min offset makes every
    bucketed operand non-negative before the truncating DIV), the two
    bucket ids are bit-interleaved into a z-value, and the z-space is cut
    into files (``z DIV 2^rows_per_file_shift``). Output: per-file row
    count and min/max of BOTH columns — the zone map a reader's predicate
    pruning consults; tight ranges on both axes are the whole point of
    z-order vs a single-column sort.

    Scale: the min/max stats pass is the write-planner's statistics
    collection (scalar, broadcast back); the layout itself is one exchange
    on file_id. At 100 TB this replaces a full sort with a clustered
    repartition — OPTIMIZE ZORDER semantics, Spark-native.
    """
    stats = zorder_stats(df, col_x, col_y)
    return zone_map(
        zorder_files(
            df, col_x, col_y, stats, bits=bits, rows_per_file_shift=rows_per_file_shift
        )
    )


def zorder_stats(df: DataFrame, col_x: str, col_y: str) -> DataFrame:
    """The write-planner's statistics row (mnx/mxx/mny/mxy) — factored so
    the streaming twin can FREEZE it after the first epoch (deployed zone
    grids are pinned per table, not re-derived per write)."""
    return df.agg(
        F.min(col_x).cast("long").alias("mnx"),
        F.max(col_x).cast("long").alias("mxx"),
        F.min(col_y).cast("long").alias("mny"),
        F.max(col_y).cast("long").alias("mxy"),
    )


def zorder_files(
    df: DataFrame,
    col_x: str,
    col_y: str,
    stats: DataFrame,
    *,
    bits: int = 8,
    rows_per_file_shift: int = 6,
) -> DataFrame:
    """Per-row (x, y, file_id) against a GIVEN stats grid (broadcast).

    Bucketing inputs CLAMP into the grid (greatest/least against the stats
    row) — a no-op when the stats come from ``df`` itself (the registered
    query's and the oracle's case, so values are unchanged), load-bearing
    when the grid is pinned and later rows fall outside it (the streaming
    twin): out-of-grid rows land in the edge buckets instead of
    bit-wrapping into arbitrary files."""
    bx = F.expr(
        f"((greatest(mnx, least(mxx, CAST({col_x} AS BIGINT))) - mnx)"
        f" * {1 << bits}) DIV (mxx - mnx + 1)"
    )
    by = F.expr(
        f"((greatest(mny, least(mxy, CAST({col_y} AS BIGINT))) - mny)"
        f" * {1 << bits}) DIV (mxy - mny + 1)"
    )
    z = _interleave_bits(bx, by, bits)
    return df.crossJoin(F.broadcast(stats)).select(
        F.col(col_x).cast("long").alias("x"),
        F.col(col_y).cast("long").alias("y"),
        F.shiftright(z, rows_per_file_shift).alias("file_id"),
    )


def zone_map(files: DataFrame) -> DataFrame:
    """Per-file zone map off (x, y, file_id) rows. count/min/max are
    MERGEABLE, so partial maps from disjoint slices combine by one more
    grouped pass — the streaming twin's state shape."""
    return files.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
    )


def zone_map_prune(
    df: DataFrame,
    col_x: str,
    col_y: str,
    *,
    bits: int = 8,
    rows_per_file_shift: int = 6,
) -> DataFrame:
    """Make the data-skipping contract EXECUTABLE: plan two write layouts
    over the same rows — the z-order layout (`zorder_layout`) and the 1-D
    range-partitioned layout every table starts with (equal-WIDTH buckets
    of ``col_x`` at the same file granularity: 2^(2*bits - shift) files,
    pure offset-scale integer algebra, no global rank and therefore no
    tie-order dependence) — then evaluate the canonical two-column range
    predicate (the first 1/8 of each column's span, derived from the same
    stats so the query is scale-free) against both zone maps. A file is
    read iff its [min, max] span intersects the predicate on BOTH axes.

    Output, one row per layout: file/row totals, how many a pruning reader
    must touch, and integer-ppm read fractions — the measured benefit
    z-order exists for (the x-partitioned layout prunes only on x; z-order
    prunes on both axes).

    Scale: two grouped passes over (x, y) projections plus a broadcast
    stats row — the write-planner's cost, not the reader's.
    """
    n_files = 1 << (2 * bits - rows_per_file_shift)
    stats = df.agg(
        F.min(col_x).cast("long").alias("mnx"),
        F.max(col_x).cast("long").alias("mxx"),
        F.min(col_y).cast("long").alias("mny"),
        F.max(col_y).cast("long").alias("mxy"),
    )
    zmap = zorder_layout(
        df, col_x, col_y, bits=bits, rows_per_file_shift=rows_per_file_shift
    )
    xmap = (
        df.crossJoin(F.broadcast(stats))
        .select(
            F.col(col_x).cast("long").alias("x"),
            F.col(col_y).cast("long").alias("y"),
            F.expr(
                f"((CAST({col_x} AS BIGINT) - mnx) * {n_files}) DIV (mxx - mnx + 1)"
            ).alias("file_id"),
        )
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
    )

    def report(zone_map: DataFrame, layout: str) -> DataFrame:
        j = zone_map.crossJoin(F.broadcast(stats))
        x_hi = F.expr("mnx + (mxx - mnx) DIV 8")
        y_hi = F.expr("mny + (mxy - mny) DIV 8")
        read = (
            (F.col("max_x") >= F.col("mnx"))
            & (F.col("min_x") <= x_hi)
            & (F.col("max_y") >= F.col("mny"))
            & (F.col("min_y") <= y_hi)
        )
        flagged = j.select(
            F.col("n_rows"), read.cast("long").alias("_read")
        )
        row = flagged.agg(
            F.count(F.lit(1)).alias("files_total"),
            F.sum("_read").alias("files_read"),
            F.expr("SUM(_read) * 1000000 DIV COUNT(*)").alias("files_read_ppm"),
            F.sum("n_rows").alias("rows_total"),
            F.sum(F.col("n_rows") * F.col("_read")).alias("rows_read"),
            F.expr("SUM(n_rows * _read) * 1000000 DIV SUM(n_rows)").alias(
                "rows_read_ppm"
            ),
        )
        return row.select(F.lit(layout).alias("layout"), "*")

    return report(zmap, "zorder").unionByName(report(xmap, "xpart"))
