"""Pinned semantics for the web-crawl operators (operators/web.py) and the
plan shape of the crawl_ingest composite. Value-level cross-engine parity is
tests/test_oracle_parity.py (html_extract / pagerank_hosts / zorder_layout /
crawl_ingest all carry DuckDB oracles); these tests pin the behaviors the
oracles alone cannot distinguish — parse ORDER, the broadcast/shuffle path
equivalence in pagerank, negative-input bucketing in zorder — plus the
hazard cases (trap hrefs, entities, empty graphs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from recsys_pipeline_spark.operators import web as W

SF = "/root/testdata/sf0.001"


def _extract_one(spark, html: str) -> dict:
    df = spark.createDataFrame([(1, html)], "id int, page string")
    return W.html_extract(df, "page").collect()[0].asDict()


# ---------------------------------------------------------------------------
# html_extract parse order + hazards
# ---------------------------------------------------------------------------

def test_script_href_does_not_leak_into_links(spark):
    row = _extract_one(
        spark,
        '<html><head><script>var t = \'href="https://trap.example/x"\';'
        "</script></head><body>"
        '<a href="https://real.example/a">a</a><p>hi there</p></body></html>',
    )
    assert row["links"] == ["https://real.example/a"]
    assert row["n_links"] == 1


def test_style_href_does_not_leak_into_links(spark):
    row = _extract_one(
        spark,
        "<html><head><style>/* href=\"https://trap.example/y\" */</style>"
        '</head><body><a href="https://real.example/b">b</a></body></html>',
    )
    assert row["links"] == ["https://real.example/b"]


def test_script_stripped_before_paragraphs(spark):
    # a literal "</p>" inside a script body must NOT terminate the paragraph
    # — the parse order (script/style strip FIRST) is the contract
    row = _extract_one(
        spark,
        "<html><body><p>hello <script>var s = \"</p>\";</script>world</p>"
        "</body></html>",
    )
    assert row["content"] == "hello world"


def test_inline_tags_stripped_and_whitespace_collapsed(spark):
    row = _extract_one(
        spark,
        "<html><head><title> The\n  <b>Title</b> </title></head>"
        "<body><p>one  <em>two</em>\nthree</p></body></html>",
    )
    assert row["title"] == "The Title"
    assert row["content"] == "one two three"


def test_entities_unescaped_one_level(spark):
    row = _extract_one(
        spark,
        "<html><body><p>&lt;tag&gt; &amp; &quot;q&quot; &#39;s&#39;"
        "&nbsp;end &amp;lt;stays</p></body></html>",
    )
    # &amp;lt; unescapes exactly one level (-> "&lt;"), browser semantics
    assert row["content"] == '<tag> & "q" \'s\' end &lt;stays'


def test_multiple_paragraphs_joined_in_document_order(spark):
    row = _extract_one(
        spark, "<html><body><p>first</p><nav>skip</nav><p>second</p></body></html>"
    )
    assert row["content"] == "first second"


def test_no_title_no_paras_yield_empty_strings(spark):
    row = _extract_one(spark, "<html><body><div>bare</div></body></html>")
    assert row["title"] == ""
    assert row["content"] == ""
    assert row["n_links"] == 0


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------

def _tiny_graph(spark):
    # 0 -> 1, 0 -> 2, 1 -> 2; host 3 is dangling (no out-edges)
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2)], "src long, dst long"
    )
    hosts = spark.range(4).select(F.col("id").alias("host"))
    return edges, hosts


def test_pagerank_empty_hosts_raises(spark):
    edges, _ = _tiny_graph(spark)
    empty = spark.range(0).select(F.col("id").alias("host"))
    with pytest.raises(ValueError, match="empty"):
        W.pagerank(edges, empty)


def test_pagerank_broadcast_and_shuffle_paths_agree(spark):
    edges, hosts = _tiny_graph(spark)
    bc = {r["host"]: r for r in W.pagerank(edges, hosts).collect()}
    sh = {
        r["host"]: r
        for r in W.pagerank(edges, hosts, max_broadcast_nodes=0).collect()
    }
    assert set(bc) == set(sh) == {0, 1, 2, 3}
    for h in bc:
        assert bc[h]["rank_scaled"] == sh[h]["rank_scaled"], h
        assert bc[h]["out_deg"] == sh[h]["out_deg"], h


def test_pagerank_mass_and_ordering(spark):
    edges, hosts = _tiny_graph(spark)
    rows = {r["host"]: r["rank_scaled"] for r in W.pagerank(edges, hosts).collect()}
    total = sum(rows.values())
    # truncating DIV only ever LOSES mass: total stays in (0.99, 1.0] x scale
    assert total <= W.PR_SCALE
    assert total > W.PR_SCALE * 99 // 100
    # host 2 has two in-links (from 0 and 1), host 1 one, host 3 none:
    # the rank order must reflect the link structure
    assert rows[2] > rows[1] > rows[3]
    assert all(v >= 0 for v in rows.values())


def test_pagerank_dangling_mass_redistributes(spark):
    # two nodes, one edge 0 -> 1: node 1 is dangling; without dangling
    # redistribution node 0 would decay to the base term only
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    hosts = spark.range(2).select(F.col("id").alias("host"))
    rows = {r["host"]: r["rank_scaled"] for r in W.pagerank(edges, hosts).collect()}
    n, scale = 2, W.PR_SCALE
    base = (W.PR_DAMP_DEN - W.PR_DAMP_NUM) * scale // (W.PR_DAMP_DEN * n)
    # node 0's inflow is purely the dangling share — strictly above base
    assert rows[0] > base
    assert rows[1] > rows[0]  # real in-link beats dangling share


# ---------------------------------------------------------------------------
# zorder_layout
# ---------------------------------------------------------------------------

def _brute_zonemap(points, bits, shift):
    xs = [p[0] for p in points]
    ys = [p[1] for p in points]
    mnx, mxx, mny, mxy = min(xs), max(xs), min(ys), max(ys)
    files = {}
    for x, y in points:
        bx = ((x - mnx) * (1 << bits)) // (mxx - mnx + 1)
        by = ((y - mny) * (1 << bits)) // (mxy - mny + 1)
        z = 0
        for i in range(bits):
            z += ((bx >> i) & 1) << (2 * i)
            z += ((by >> i) & 1) << (2 * i + 1)
        fid = z >> shift
        f = files.setdefault(fid, [0, x, x, y, y])
        f[0] += 1
        f[1], f[2] = min(f[1], x), max(f[2], x)
        f[3], f[4] = min(f[3], y), max(f[4], y)
    return {
        fid: tuple(v) for fid, v in files.items()
    }  # (n_rows, min_x, max_x, min_y, max_y)


@pytest.mark.parametrize(
    "grid",
    [
        [(x, y) for x in range(16) for y in range(16)],  # non-negative
        [(x, y) for x in range(-8, 8) for y in range(-8, 8)],  # negatives
        [(x, -3) for x in range(-5, 30)],  # constant y incl. all-negative min
    ],
    ids=["nonneg", "negatives", "const_y"],
)
def test_zorder_matches_bruteforce(spark, grid):
    bits, shift = 4, 2
    df = spark.createDataFrame(grid, "x long, y long")
    got = {
        r["file_id"]: (r["n_rows"], r["min_x"], r["max_x"], r["min_y"], r["max_y"])
        for r in W.zorder_layout(
            df, "x", "y", bits=bits, rows_per_file_shift=shift
        ).collect()
    }
    assert got == _brute_zonemap(grid, bits, shift)
    assert sum(v[0] for v in got.values()) == len(grid)


def test_zorder_files_partition_zspace_tightly(spark):
    # on a full square grid every file's zone map must span at most the
    # sqrt(cell) box z-order promises (here 4x4 buckets -> exact x/y tiles)
    grid = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(grid, "x long, y long")
    rows = W.zorder_layout(df, "x", "y", bits=4, rows_per_file_shift=4).collect()
    for r in rows:
        assert r["max_x"] - r["min_x"] <= 3, r
        assert r["max_y"] - r["min_y"] <= 3, r


# ---------------------------------------------------------------------------
# crawl_ingest plan shape
# ---------------------------------------------------------------------------

def test_html_extract_query_is_zero_exchange_single_scan(spark):
    from recsys_pipeline_spark.queries_web import q_html_extract

    df = q_html_extract(spark, SF)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0  # pure regexp codegen narrow map
    assert plan.count("FileScan") == 1


def test_zorder_layout_is_stats_pass_plus_one_layout_exchange(spark):
    from recsys_pipeline_spark.queries_web import q_zorder_layout

    df = q_zorder_layout(spark, SF)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # two scans by design (write-planner stats pass + the layout pass);
    # exchanges: the scalar stats agg pair + ONE shuffle on file_id
    assert plan.count("FileScan") == 2
    assert plan.count("Exchange") <= 3


def test_crawl_ingest_parses_blobs_exactly_once(spark):
    from recsys_pipeline_spark.queries_web import q_crawl_ingest

    df = q_crawl_ingest(spark, SF)
    df.count()  # settle AQE + materialize the lazy checkpoint
    plan = df._jdf.queryExecution().executedPlan().toString()
    # past the keeper checkpoint the WARC parse must be GONE from the plan:
    # the parse/extract pipeline runs once, not once per gate consumer
    assert "MapInPandas" not in plan
    assert "FileScan" not in plan  # documents scanned only upstream of it


# ---------------------------------------------------------------------------
# html_extract property: escape -> embed -> extract round trip
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# body text drawn from printable-ish chars INCLUDING the html-special ones;
# the page builder escapes them, html_extract must invert the escaping
_raw_text = st.text(
    alphabet=st.sampled_from(list("abcxyz <>&\"'01.")), min_size=0, max_size=60
)


def _escape(s: str) -> str:
    # forward escaping: & first (the inverse order of _ENTITIES' unescape)
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
        .replace("'", "&#39;")
    )


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_raw_text, min_size=1, max_size=4))
def test_html_extract_roundtrips_escaped_text(spark, texts):
    """Arbitrary text (including <, >, &, quotes) escaped into paragraph
    bodies must come back out of html_extract exactly — modulo the
    documented whitespace collapse — across any number of paragraphs."""
    import re

    page = (
        "<html><head><title>t</title></head><body>"
        + "".join(f"<p>{_escape(t)}</p>" for t in texts)
        + "</body></html>"
    )
    df = spark.createDataFrame([(1, page)], "id int, page string")
    row = W.html_extract(df, "page").collect()[0]
    expected = re.sub(r"\s+", " ", " ".join(_escape(t) for t in texts)).strip()
    # undo exactly one escape level, the way _clean_block does
    for ent, ch in W._ENTITIES:
        expected = expected.replace(ent, ch)
    assert row["content"] == expected


# ---------------------------------------------------------------------------
# pagerank / zorder properties over random inputs (hypothesis)
# ---------------------------------------------------------------------------

_edges_strategy = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda e: e[0] != e[1]),
    min_size=0,
    max_size=20,
    unique=True,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_edges_strategy)
def test_pagerank_invariants_on_random_graphs(spark, edge_list):
    """On arbitrary graphs over 8 hosts: rank mass never exceeds the scale
    and truncating DIV loses at most a bounded amount per host per step;
    every rank is at least the damped-base floor; out_deg matches the edge
    list; the broadcast and shuffle paths agree exactly."""
    hosts = spark.range(8).select(F.col("id").alias("host"))
    if edge_list:
        edges = spark.createDataFrame(edge_list, "src long, dst long")
    else:
        edges = spark.createDataFrame([], "src long, dst long")
    bc = {r["host"]: r for r in W.pagerank(edges, hosts, iters=3).collect()}
    n, scale = 8, W.PR_SCALE
    base = (W.PR_DAMP_DEN - W.PR_DAMP_NUM) * scale // (W.PR_DAMP_DEN * n)
    total = sum(r["rank_scaled"] for r in bc.values())
    assert total <= scale
    # each host loses < 1 unit per truncating DIV; 3 divisions per host
    # per iteration (share, contrib, damp) over 3 iterations bounds the loss
    assert total >= scale - n * 3 * 3 - n  # + initial scale//n remainder
    out_deg = {h: 0 for h in range(8)}
    for s, _ in edge_list:
        out_deg[s] += 1
    for h in range(8):
        assert bc[h]["out_deg"] == out_deg[h], h
        assert bc[h]["rank_scaled"] >= base, h
    sh = {
        r["host"]: r["rank_scaled"]
        for r in W.pagerank(edges, hosts, iters=3, max_broadcast_nodes=0).collect()
    }
    assert sh == {h: r["rank_scaled"] for h, r in bc.items()}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(-50, 50), st.integers(-50, 50)),
        min_size=1,
        max_size=40,
    )
)
def test_zorder_matches_bruteforce_on_random_points(spark, points):
    bits, shift = 4, 2
    df = spark.createDataFrame(points, "x long, y long")
    got = {
        r["file_id"]: (r["n_rows"], r["min_x"], r["max_x"], r["min_y"], r["max_y"])
        for r in W.zorder_layout(
            df, "x", "y", bits=bits, rows_per_file_shift=shift
        ).collect()
    }
    assert got == _brute_zonemap(points, bits, shift)


def test_zone_map_prune_is_sound_and_zorder_wins(spark):
    """Pruning soundness: each layout's read-file row total must COVER the
    predicate's true matching rows (zone-map pruning never drops a match);
    and the measured point of the query — z-order's two-axis pruning beats
    the 1-D x-partitioned layout on the same predicate."""
    from recsys_pipeline_spark.io import read_table
    from recsys_pipeline_spark.queries_web import q_zone_map_prune

    sf = "/root/testdata/sf0.001"
    rows = {r["layout"]: r for r in q_zone_map_prune(spark, sf).collect()}
    li = read_table(spark, sf, "lineitem").select(
        F.col("l_partkey").cast("long").alias("x"),
        F.col("l_suppkey").cast("long").alias("y"),
    )
    st = li.agg(
        F.min("x").alias("mnx"), F.max("x").alias("mxx"),
        F.min("y").alias("mny"), F.max("y").alias("mxy"),
    ).first()
    x_hi = st["mnx"] + (st["mxx"] - st["mnx"]) // 8
    y_hi = st["mny"] + (st["mxy"] - st["mny"]) // 8
    true_rows = li.filter(
        (F.col("x") >= st["mnx"]) & (F.col("x") <= x_hi)
        & (F.col("y") >= st["mny"]) & (F.col("y") <= y_hi)
    ).count()
    for r in rows.values():
        assert int(r["rows_read"]) >= true_rows  # sound: never skips a match
        assert int(r["rows_total"]) == li.count()
    assert int(rows["zorder"]["files_read_ppm"]) < int(rows["xpart"]["files_read_ppm"])
    assert int(rows["zorder"]["rows_read_ppm"]) < int(rows["xpart"]["rows_read_ppm"])


_pt = st.tuples(
    st.integers(min_value=-1000, max_value=1000),
    st.integers(min_value=-1000, max_value=1000),
)
_points = st.lists(_pt, min_size=1, max_size=60)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_points)
def test_zone_map_prune_sound_on_random_frames(spark, pts):
    """On arbitrary integer point sets (negatives, constants, duplicates):
    both layouts' read files must cover every true predicate match, totals
    must equal the input size, and ppm fields stay within [0, 1e6]."""
    from recsys_pipeline_spark.operators import web as W

    df = spark.createDataFrame(pts, "x long, y long")
    rep = {r["layout"]: r for r in
           W.zone_map_prune(df, "x", "y", bits=4, rows_per_file_shift=2).collect()}
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    x_hi = min(xs) + (max(xs) - min(xs)) // 8
    y_hi = min(ys) + (max(ys) - min(ys)) // 8
    true_rows = sum(
        1 for x, y in pts if min(xs) <= x <= x_hi and min(ys) <= y <= y_hi
    )
    assert set(rep) == {"zorder", "xpart"}
    for r in rep.values():
        assert int(r["rows_total"]) == len(pts)
        assert int(r["rows_read"]) >= true_rows
        for f in ("files_read_ppm", "rows_read_ppm"):
            assert 0 <= int(r[f]) <= 1_000_000
