"""Semantic gates for the curation operators (value-level parity with the
DuckDB oracles is covered by tests/test_oracle_parity.py, which picks every
curation query up from the entry registry automatically)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from recsys_pipeline_spark.io import read_table
from recsys_pipeline_spark.operators import curation
from recsys_pipeline_spark import queries_curation as QC

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return read_table(spark, SF, "documents").cache()


def test_hash_sample_rate_and_determinism(spark, docs):
    n = docs.count()
    s = curation.hash_sample(docs, "doc_id", 30)
    k = s.count()
    # Bernoulli(0.3) over 500 keys: 5 sigma ~ +-51
    assert abs(k - 0.3 * n) < 0.105 * n, (k, n)
    assert s.count() == k  # rerun-stable
    # different salt -> a genuinely different (but same-rate) subset
    s2 = curation.hash_sample(docs, "doc_id", 30, salt="other")
    ids, ids2 = (set(r[0] for r in x.select("doc_id").collect()) for x in (s, s2))
    assert ids != ids2 and len(ids) == k


def test_hash_sample_no_shuffle(docs):
    plan = curation.hash_sample(docs, "doc_id", 30)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_stratified_respects_per_stratum_rates(spark, docs):
    out = curation.hash_sample(
        docs, "doc_id", stratify_col="lang", rates_pct={"en": 0}, default_pct=100
    )
    per = dict(out.groupBy("lang").count().collect())
    assert "en" not in per
    base = dict(docs.groupBy("lang").count().collect())
    for lang, cnt in per.items():
        assert cnt == base[lang], (lang, cnt, base[lang])


def test_cap_per_group_enforces_k_and_keeps_small_groups(spark, docs):
    capped = curation.cap_per_group(docs, "source", "doc_id", 15)
    sizes = dict(capped.groupBy("source").count().collect())
    base = dict(docs.groupBy("source").count().collect())
    for src, n in base.items():
        assert sizes[src] == min(n, 15), (src, n, sizes[src])
    # survivors are a subset, not rewritten rows
    assert capped.join(docs, ["doc_id"], "left_anti").count() == 0


def test_negative_sample_is_unseen_and_in_vocab(spark):
    ev = read_table(spark, SF, "events")
    inter = ev.select(
        "event_id",
        F.col("user_id").alias("userid"),
        F.get_json_object("props", "$.k").cast("int").alias("itemid"),
    )
    neg = curation.negative_sample(inter, "userid", "itemid", "event_id", 100).cache()
    assert neg.filter((F.col("itemid") < 0) | (F.col("itemid") >= 100)).count() == 0
    # no emitted (user, item) may appear in the seen set
    seen = inter.select("userid", "itemid").distinct()
    assert neg.join(seen, ["userid", "itemid"], "left_semi").count() == 0
    # deterministic: at most one negative per source event
    assert neg.groupBy("event_id").count().filter("count > 1").count() == 0


def test_pack_bins_are_contiguous_and_filled(spark, docs):
    from recsys_pipeline_spark.operators import text

    packed = curation.pack_greedy(
        docs, "source", "doc_id", text.token_count(F.col("text")), QC.PACK_BUDGET
    ).cache()
    # bin ids per source are 0..max with no holes
    agg = packed.groupBy("source").agg(
        F.min("bin_id").alias("lo"),
        F.max("bin_id").alias("hi"),
        F.countDistinct("bin_id").alias("n"),
    )
    bad = agg.filter((F.col("lo") != 0) | (F.col("n") != F.col("hi") + 1))
    assert bad.count() == 0
    # every non-final bin starts within budget of the previous one's start:
    # a doc's start offset always lands in bin floor(offset/budget)
    assert (
        packed.filter(
            F.floor(F.col("bin_offset") / QC.PACK_BUDGET) != F.col("bin_id")
        ).count()
        == 0
    )


def test_decontaminate_flags_only_noneval_docs_with_real_overlap(spark, docs):
    from recsys_pipeline_spark.operators.text import tokens as tok_col

    flagged = curation.decontaminate_flags(docs, "doc_id", "text", eval_pct=5, n=4)
    rows = {r["doc_id"]: r["n_hits"] for r in flagged.collect()}
    assert rows and all(n >= 1 for n in rows.values())
    # python recompute: eval membership + 4-gram overlap must agree exactly
    toks = {
        r["doc_id"]: r["t"]
        for r in docs.select("doc_id", tok_col(F.col("text")).alias("t")).collect()
    }
    import hashlib

    def is_eval(i):
        return int(hashlib.md5(f"eval:{i}".encode()).hexdigest()[:15], 16) % 100 < 5

    def grams(ts):
        return {" ".join(ts[i : i + 4]) for i in range(len(ts) - 3)}

    eval_grams = set().union(*(grams(t) for i, t in toks.items() if is_eval(i)))
    want = {
        i: len(grams(t) & eval_grams)
        for i, t in toks.items()
        if not is_eval(i) and grams(t) & eval_grams
    }
    assert rows == want


def test_decontaminate_self_designated_join_is_aqe_sized(spark, docs):
    """The self-designated path must carry NO forced broadcast hint: with
    broadcasting disabled it has to plan (and run) as a shuffle join — the
    shape that survives an eval side that is 5% of a 100 TB corpus — and
    still produce identical flags."""
    baseline = {
        (r["doc_id"], r["n_hits"])
        for r in curation.decontaminate_flags(
            docs, "doc_id", "text", eval_pct=5, n=4
        ).collect()
    }
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    except Exception:
        old_aqe = None
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        df = curation.decontaminate_flags(docs, "doc_id", "text", eval_pct=5, n=4)
        got = {(r["doc_id"], r["n_hits"]) for r in df.collect()}
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert got == baseline
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is not None:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_decontaminate_external_eval_ids_matches_and_broadcasts(spark, docs):
    """Passing the hash-designated slice explicitly as eval_ids must flag the
    same documents, and — being the known-small benchmark-suite path — keep
    its broadcast hint even when auto-broadcast is disabled."""
    import hashlib

    ids = [
        r["doc_id"]
        for r in docs.select("doc_id").collect()
        if int(hashlib.md5(f"eval:{r['doc_id']}".encode()).hexdigest()[:15], 16)
        % 100
        < 5
    ]
    eval_ids = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    baseline = {
        (r["doc_id"], r["n_hits"])
        for r in curation.decontaminate_flags(
            docs, "doc_id", "text", eval_pct=5, n=4
        ).collect()
    }
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = curation.decontaminate_flags(
            docs, "doc_id", "text", n=4, eval_ids=eval_ids
        )
        got = {(r["doc_id"], r["n_hits"]) for r in df.collect()}
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
        assert got == baseline
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_mixture_weights_sum_to_one_and_flatten_the_distribution(spark):
    rows = QC.q_mixture_weights(spark, SF).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-6
    # temperature < 1 flattens: the weight ratio between the largest and
    # smallest source must be strictly smaller than their token-mass ratio
    big = max(rows, key=lambda r: r["n_tokens"])
    small = min(rows, key=lambda r: r["n_tokens"])
    assert big["n_tokens"] > small["n_tokens"]
    assert big["weight"] / small["weight"] < big["n_tokens"] / small["n_tokens"]


def test_boilerplate_flags_planted_template(spark):
    """A 2-gram planted across most of a source's docs must be flagged for
    exactly the docs that carry it; a gram unique to one doc must not."""
    rows = [
        (i, "s0", f"unique{i} token{i} click here now")  # template tail
        for i in range(8)
    ] + [(8, "s0", "totally fresh words"), (9, "s1", "click here now too")]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {
        r["doc_id"]: (r["n_grams"], r["n_boiler"])
        for r in curation.boilerplate_flags(
            df, "doc_id", "text", "source", n=2, share_pct=50
        ).collect()
    }
    # docs 0-7 share 'click here'/'here now' (8/9 of s0 >= 50%); doc 8 has
    # no boilerplate gram; s1 is a single-doc source where every gram is
    # trivially >= 50% of the source
    assert set(out) == {0, 1, 2, 3, 4, 5, 6, 7, 9}
    assert all(out[i][1] == 2 for i in range(8))


def test_select_token_budget_is_maximal_quality_prefix(spark, docs):
    """The selected set must be exactly the maximal prefix of the
    (qscore desc, hash, id) order fitting the budget: verified against a
    direct python replay of the contract on the collected corpus."""
    import hashlib

    out = {
        r["doc_id"]: (r["qscore"], r["n_tokens"])
        for r in curation.select_token_budget(docs, "doc_id", "text", 60).collect()
    }
    corpus = []
    for r in docs.select("doc_id", "text").collect():
        toks = [t for t in r["text"].lower().split() if t]
        if not toks:
            continue
        q = (len(set(toks)) * 1000) // len(toks)
        h = int(hashlib.md5(f"sel:{r['doc_id']}".encode()).hexdigest()[:15], 16)
        corpus.append((q, h, r["doc_id"], len(toks)))
    budget = sum(t for *_, t in corpus) * 60 // 100
    corpus.sort(key=lambda x: (-x[0], x[1], x[2]))
    want, run = {}, 0
    for q, _, i, tok in corpus:
        if run + tok > budget:
            break
        run += tok
        want[i] = (q, tok)
    assert out == want
    assert 0 < len(want) < len(corpus)  # the budget actually bites


def test_cluster_balanced_sample_caps_cells_and_keeps_sparse_cells(spark):
    """Per-cell survivor counts = min(cell size, BAL_K); sparse cells pass
    through whole — the diversity-preserving property."""
    out = QC.q_cluster_balanced_sample(spark, SF).cache()
    sizes = {r["cell"]: r["n"] for r in out.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()}
    from recsys_pipeline_spark.operators.dedup import sketch_memberships, sketch_planes

    e = read_table(spark, SF, "embeddings")
    planes = sketch_planes(QC.EMB_DIM, bits=QC.BAL_BITS, tables=1, seed=QC.BAL_SEED)
    base = {
        r["sketch"]: r["n"]
        for r in sketch_memberships(e, planes)
        .groupBy("sketch").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes == {c: min(n, QC.BAL_K) for c, n in base.items()}
    assert any(n > QC.BAL_K for n in base.values())  # the cap actually bites
    assert any(n < QC.BAL_K for n in base.values())  # and sparse cells exist


def test_importance_weights_favor_the_target_slice(spark, docs):
    """DSIR sanity: documents FROM the target (English) slice must score
    higher on average than the rest — the distribution ratio has to point
    toward the reference corpus; and weights must be rerun-stable."""
    out = curation.importance_weights(docs, "doc_id", "text", F.col("lang") == "en")
    joined = out.join(docs.select("doc_id", "lang"), "doc_id").cache()
    means = {
        r["is_en"]: r["m"]
        for r in joined.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("weight").alias("m"))
        .collect()
    }
    assert means[True] > means[False]
    again = curation.importance_weights(docs, "doc_id", "text", F.col("lang") == "en")
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in out.collect()}


def test_approx_profile_orders_within_tolerance(spark):
    """The HLL++ profiling twin must agree with the exact profile on rows and
    nulls EXACTLY (those are plain sums, not sketched) and on distinct counts
    within the sketch tolerance (rsd=2%; 5% + small-count slack gate, the
    approx_distinct discipline)."""
    exact = {
        r["column_name"]: r for r in QC.q_profile_orders(spark, SF).collect()
    }
    approx = {
        r["column_name"]: r
        for r in QC.q_approx_profile_orders(spark, SF).collect()
    }
    assert set(exact) == set(approx) == set(QC.PROFILE_COLS)
    for c in QC.PROFILE_COLS:
        assert approx[c]["n_rows"] == exact[c]["n_rows"]
        assert approx[c]["n_null"] == exact[c]["n_null"]
        n = exact[c]["n_distinct"]
        assert abs(approx[c]["n_distinct"] - n) <= max(2, 0.05 * n), (
            c, approx[c]["n_distinct"], n,
        )


def test_pii_redaction_clean_has_no_pii_left(spark):
    """Idempotence/completeness: after redaction no pattern matches the clean
    text, every planted kind was counted, and docs with no planted PII pass
    through byte-identical."""
    from recsys_pipeline_spark.operators.text import PII_PATTERNS

    out = QC.q_pii_redaction(spark, SF).cache()
    for pat in PII_PATTERNS.values():
        assert out.filter(F.col("clean").rlike(pat)).count() == 0, pat
    # counts follow the planting rule exactly
    bad = out.filter(
        (F.col("n_email") != F.when(F.col("doc_id") % 3 == 0, 1).otherwise(0))
        | (F.col("n_ssn") != F.when(F.col("doc_id") % 5 == 0, 1).otherwise(0))
        | (F.col("n_phone") != F.when(F.col("doc_id") % 7 == 0, 1).otherwise(0))
    )
    assert bad.count() == 0
    untouched = out.filter(
        (F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 5 != 0) & (F.col("doc_id") % 7 != 0)
    )
    orig = read_table(spark, SF, "documents").select("doc_id", "text")
    diff = untouched.join(orig, "doc_id").filter(F.col("clean") != F.col("text"))
    assert diff.count() == 0
    out.unpersist()


def test_chunk_documents_covers_and_overlaps(spark, docs):
    """Every token position is covered, consecutive chunks overlap by
    exactly `overlap`, the final chunk may run short, chunk_text length
    equals n_tokens, and empty docs emit nothing."""
    from recsys_pipeline_spark.operators.text import tokens as tok_expr

    chunk, overlap = 64, 16
    out = curation.chunk_documents(docs, "doc_id", "text", chunk, overlap).cache()
    lens = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", F.size(tok_expr(F.col("text"))).alias("n")).collect()
    }
    rows = sorted(
        ((r["doc_id"], r["chunk_id"], r["start_tok"], r["n_tokens"], r["chunk_text"])
         for r in out.collect())
    )
    assert rows, "no chunks produced"
    stride = chunk - overlap
    by_doc: dict[int, list] = {}
    for d, cid, st, n, txt in rows:
        by_doc.setdefault(d, []).append((cid, st, n, txt))
    for d, chunks in by_doc.items():
        n_tok = lens[d]
        assert [c for c, _, _, _ in chunks] == list(range(len(chunks)))
        for cid, st, n, txt in chunks:
            assert st == cid * stride
            assert n == min(chunk, n_tok - st) and n >= 1
            assert len(txt.split(" ")) == n
            # no redundant tail: every chunk past the first must extend
            # coverage beyond its predecessor's end (st + overlap < n_tok)
            assert cid == 0 or st + overlap < n_tok, (d, cid, st, n_tok)
        # maximal: one chunk per contributing start
        assert len(chunks) == max(n_tok - overlap - 1, 0) // stride + 1
        # and complete: the last chunk reaches the end of the document
        last_cid, last_st, last_n, _ = chunks[-1]
        assert last_st + last_n == n_tok
    # every nonempty doc chunked
    assert set(by_doc) == {d for d, n in lens.items() if n > 0}
    out.unpersist()
    with pytest.raises(ValueError):
        curation.chunk_documents(docs, "doc_id", "text", 8, 8)


def test_snapshot_diff_statuses_follow_the_planted_churn(spark, docs):
    """added/removed/changed exactly match the synthetic churn rule, and
    unchanged documents emit nothing."""
    out = {
        r["doc_id"]: r["status"]
        for r in QC.q_snapshot_diff(spark, SF).collect()
    }
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    for i in ids:
        if i % 17 == 0:
            assert out.get(i) == "removed", i
        elif i % 10 == 0:
            assert out.get(i) == "changed", i
        else:
            assert i not in out, i
        if i % 23 == 0:
            assert out.get(i + 100000) == "added", i
    # nothing else in the diff
    expect = {i for i in ids if i % 17 == 0 or i % 10 == 0} | {
        i + 100000 for i in ids if i % 23 == 0
    }
    assert set(out) == expect


def test_curate_corpus_composite_invariants(spark, docs):
    """Pipeline-level invariants the hash oracle can't state on its own:
    output docs are dedup keepers, never eval-slice or contaminated docs,
    and the selected docs' token mass respects the 60% budget of the CLEAN
    corpus (the stage-wiring property of the composite)."""
    from recsys_pipeline_spark.operators import dedup

    out = QC.q_curate_corpus(spark, SF).cache()
    out_ids = {r["doc_id"] for r in out.select("doc_id").distinct().collect()}
    assert out_ids

    survivors = dedup.exact_dedup_keep(docs.select("doc_id", "text"), "doc_id")
    keep_ids = {r["doc_id"] for r in survivors.select("doc_id").collect()}
    assert out_ids <= keep_ids

    ev = {
        r["doc_id"]
        for r in survivors.filter(
            curation.hash_bucket(F.col("doc_id"), "eval") < QC.DECON_EVAL_PCT
        ).collect()
    }
    flagged = {
        r["doc_id"]
        for r in curation.decontaminate_flags(
            survivors, "doc_id", "text", eval_pct=QC.DECON_EVAL_PCT, n=QC.DECON_N
        ).collect()
    }
    assert not (out_ids & ev) and not (out_ids & flagged)

    from recsys_pipeline_spark.operators.text import token_count

    clean = survivors.filter(
        ~(curation.hash_bucket(F.col("doc_id"), "eval") < QC.DECON_EVAL_PCT)
    ).join(spark.createDataFrame([(i,) for i in flagged] or [(-1,)], "doc_id long"),
           "doc_id", "left_anti")
    total = clean.select(F.sum(token_count(F.col("text")))).collect()[0][0]
    budget = total * QC.BUDGET_PCT // 100
    picked = (
        clean.join(
            spark.createDataFrame([(i,) for i in out_ids], "doc_id long"), "doc_id"
        )
        .select(F.sum(token_count(F.col("text"))))
        .collect()[0][0]
    )
    assert picked <= budget
    out.unpersist()


def test_weighted_sample_per_group_properties(spark, docs):
    """ES weighted sampling: per-group output size = min(k, positive-weight
    group size); rerun-identical; a dominant-weight row is always selected;
    the map-side WindowGroupLimit survives in the plan (cap_per_group's
    scale lever applies to the weighted form too)."""
    out = curation.weighted_sample_per_group(docs, "lang", "doc_id", "n_chars", 25)
    sizes = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    base = {
        r["lang"]: r["n"]
        for r in docs.filter(F.col("n_chars") > 0)
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes == {g: min(25, n) for g, n in base.items()}
    again = curation.weighted_sample_per_group(docs, "lang", "doc_id", "n_chars", 25)
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in out.collect()}
    # dominant weight wins: one row a billion times heavier is always kept
    toy = spark.createDataFrame(
        [("g", i, 1_000_000_000 if i == 7 else 1) for i in range(40)],
        "grp string, id long, w long",
    )
    picked = {
        r["id"]
        for r in curation.weighted_sample_per_group(toy, "grp", "id", "w", 5).collect()
    }
    assert 7 in picked and len(picked) == 5
    # zero/negative weights are never sampled
    toy2 = toy.withColumn("w", F.when(F.col("id") < 35, F.col("w")).otherwise(-1))
    picked2 = curation.weighted_sample_per_group(toy2, "grp", "id", "w", 50)
    assert picked2.filter(F.col("id") >= 35).count() == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_vocab_coverage_cap_bites_and_rates_are_exact(spark):
    """The vocabulary budget must actually constrain the corpus (a budget
    >= distinct-token count makes the whole report degenerate zeros), and
    the ppm rate must be the exact integer division of its own counts."""
    rows = QC.q_vocab_coverage(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_oov"] < r["n_tokens"], r
        assert r["oov_ppm"] == r["n_oov"] * 1_000_000 // r["n_tokens"], r


def test_snapshot_diff_fingerprint_is_injective_on_nasty_values(spark):
    """Review-finding regression: NULL vs its old sentinel string, and
    value bytes shifting across column boundaries, must all register as
    'changed' — the per-column-md5 fingerprint cannot alias them."""
    a = spark.createDataFrame(
        [(1, None, "c"), (2, "a\x1fb", "c"), (3, "x", "y")],
        "id long, t string, l string",
    )
    b = spark.createDataFrame(
        [(1, "\x00", "c"), (2, "a", "b\x1fc"), (3, "x", "y")],
        "id long, t string, l string",
    )
    out = {
        r["id"]: r["status"]
        for r in curation.snapshot_diff(a, b, "id", ["t", "l"]).collect()
    }
    assert out == {1: "changed", 2: "changed"}  # id 3 unchanged, absent


def test_quality_filter_every_rule_fires_and_reasons_are_ordered(spark):
    """A gate whose rules never bite tests nothing: each of the five rules
    must drop at least one sf0.01 document, a majority must survive, and
    drop_reasons must list firing rules in the pinned QUALITY_RULE_ORDER
    (the audit string is only stable across engines because of it)."""
    rows = QC.q_quality_filter(spark, SF).collect()
    assert rows
    kept = [r for r in rows if r["keep"] == 1]
    assert len(kept) > len(rows) // 2
    fired = set()
    order = list(curation.QUALITY_RULE_ORDER)
    for r in rows:
        reasons = r["drop_reasons"].split(",") if r["drop_reasons"] else []
        assert (r["keep"] == 1) == (not reasons)
        assert all(x in order for x in reasons), r
        # pinned order, no duplicates
        assert [x for x in order if x in reasons] == reasons, r
        fired.update(reasons)
        # signals are consistent with their own reasons
        if "too_short" in reasons:
            assert r["n_tokens"] < QC.QF_MIN_TOKENS
        if "no_stopword" in reasons:
            assert r["stop_hits"] == 0
        if "repetitive" in reasons:
            assert r["dup3_ppm"] > QC.QF_DUP3_PPM_MAX
    assert fired == set(order), fired


def test_quality_gate_short_doc_signals_are_exact(spark):
    """Hand-checkable toy: a 2-token doc has no 3-grams (dup3_ppm = 0, not
    an error), integer mean length x100, and multi-rule reasons."""
    toy = spark.createDataFrame(
        [(1, "zz zz"), (2, "the " + "sample text ok " * 20)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in curation.quality_gate(
            toy, "doc_id", "text",
            min_tokens=3, max_tokens=50, min_mtl_x100=100, max_mtl_x100=900,
            dup3_ppm_max=500_000,
        ).collect()
    }
    r1 = out[1]
    assert (r1["n_tokens"], r1["mean_tok_len_x100"], r1["dup3_ppm"]) == (2, 200, 0)
    assert r1["drop_reasons"] == "too_short,no_stopword" and r1["keep"] == 0
    r2 = out[2]  # 61 tokens of 'the sample text ok ...': repetitive + long
    assert r2["n_tokens"] == 61 and r2["stop_hits"] == 1
    assert r2["drop_reasons"] == "too_long,repetitive" and r2["keep"] == 0


def test_bpe_pairs_counts_match_brute_force(spark):
    """The distributed pair count equals a driver-side brute force over the
    same corpus, and the top-k cutoff is deterministic (count desc, pair
    asc) — the invariant a BPE trainer's merge choice rests on."""
    from collections import Counter

    texts = [r["text"] for r in spark.read.parquet(f"{SF}/documents.parquet").collect()]
    brute = Counter()
    for t in texts:
        for w in t.lower().split():
            for i in range(len(w) - 1):
                brute[w[i : i + 2]] += 1
    want = sorted(brute.items(), key=lambda kv: (-kv[1], kv[0]))[: QC.BPE_TOP_PAIRS]
    got = [(r["pair"], r["cnt"]) for r in QC.q_bpe_pairs(spark, SF).collect()]
    assert got == want


def test_tokenize_ids_round_trips_against_brute_force(spark):
    """Encoding must be invertible where the vocab covers: rebuilding the
    vocab driver-side (count desc, token asc, top-k) and decoding every
    id > 0 must reproduce the document's tokens in order, with 0 exactly
    on the OOV positions and n_oov equal to the zero count."""
    from collections import Counter

    rows = {r["doc_id"]: r for r in QC.q_tokenize_ids(spark, SF).collect()}
    texts = {
        r["doc_id"]: r["text"].lower().split()
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    freq = Counter(t for toks in texts.values() for t in toks)
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[: QC.VOCAB_SIZE]
    id_of = {tok: i + 1 for i, (tok, _) in enumerate(ranked)}
    assert set(rows) == set(texts)
    for doc_id, r in rows.items():
        toks = texts[doc_id]
        # the query emits the sequence CSV-joined (scalar-column contract
        # for the driver's recorded window); parse it back for the check
        token_ids = [int(x) for x in r["token_seq_csv"].split(",")] if r["token_seq_csv"] else []
        assert len(token_ids) == r["n_tokens"] == len(toks)
        assert token_ids == [id_of.get(t, 0) for t in toks]
        assert r["n_oov"] == sum(1 for i in token_ids if i == 0)


def test_incremental_curate_processes_exactly_the_delta(spark):
    """The composite must re-process exactly snapshot_diff's non-removed
    keys (never the unchanged corpus), and chunks must exist iff the gate
    kept the doc — n_chunks > 0 <=> keep = 1 (every kept testdata doc has
    tokens)."""
    rows = QC.q_incremental_curate(spark, SF).collect()
    assert rows
    diff = {
        r["doc_id"]: r["status"]
        for r in QC.q_snapshot_diff(spark, SF).collect()
        if r["status"] != "removed"
    }
    assert {r["doc_id"]: r["status"] for r in rows} == diff
    kinds = {(r["keep"], r["n_chunks"] > 0) for r in rows}
    assert all(k == (1, True) or k == (0, False) for k in kinds)
    assert {r["status"] for r in rows} == {"added", "changed"}
    assert any(r["keep"] == 0 for r in rows) and any(r["keep"] == 1 for r in rows)


def test_quantize_embeddings_bound_and_brute_force(spark):
    """Structural guarantee of absmax int8: codes live in [-127, 127], the
    max element hits ±127 exactly, and reconstruction error never exceeds
    half a quantization step (scale/254 → 3937 ppm). Codes must equal a
    numpy brute force of the same floor(x/scale*127 + 0.5) rule."""
    import math

    rows = QC.q_quantize_embeddings(spark, SF).collect()
    docs = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    assert len(rows) == len(docs) > 0
    for r in rows:
        emb, scale = docs[r["vec_id"]], r["scale"]
        q = [int(c) for c in r["q_emb_csv"].split(",")]
        assert scale == max(abs(v) for v in emb)
        assert all(-127 <= c <= 127 for c in q)
        assert 127 in q or -127 in q  # the absmax element saturates
        assert q == [int(math.floor(float(v) / scale * 127 + 0.5)) for v in emb]
        assert 0 <= r["max_err_ppm"] <= 3937


def test_lm_perplexity_orders_fluent_below_junk_and_is_exact_on_unseen(spark):
    """LM sanity: a non-reference doc written in the reference's own
    phrasing must score (far) lower avg-nll than a doc of never-seen
    tokens, and the all-unseen doc's score is exactly ln(V) (every bigram
    backs off to 1/(0+V)). Also the driver-query slice sizes must be
    non-degenerate (both ref and scored sides populated)."""
    import math

    toy = spark.createDataFrame(
        [(1, "the cat sat on the mat", True),
         (2, "the cat sat on the mat again", True),
         (3, "the cat sat on the mat", False),
         (4, "zz qq ww ee rr tt", False)],
        "doc_id long, text string, is_ref boolean",
    )
    out = {
        r["doc_id"]: r
        for r in curation.lm_perplexity(toy, "doc_id", "text", F.col("is_ref")).collect()
    }
    assert set(out) == {3, 4}
    # ref vocab of `cur` tokens: cat sat on the mat again -> V = 6
    assert out[4]["avg_nll"] == round(math.log(6), 6)
    # margin is modest on a 2-doc reference (add-1 smoothing dominates a
    # tiny LM) — strict ordering with a noise-proof gap is the claim
    assert out[3]["avg_nll"] < out[4]["avg_nll"] - 0.5
    # driver-scale slice sanity
    rows = QC.q_lm_perplexity(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert 0 < len(rows) < n_docs
    assert all(r["avg_nll"] > 0 and r["n_bigrams"] > 0 for r in rows)


def test_canonical_url_collapses_known_aliases(spark):
    """The canonical chain must collapse scheme/www/port/utm/trailing-slash
    variants to one key, keep non-tracking params, and strip an utm-only
    query entirely — and the driver query's dedup must actually bite."""
    from recsys_pipeline_spark.operators.text import canonical_url

    cases = [
        (1, "https://WWW.Site.Com:443/p/5/?utm_source=x&id=2"),
        (2, "http://site.com/p/5?id=2"),
        (3, "https://site.com:80/p/5/?id=2&utm_campaign=y"),
        (4, "HTTPS://www.site.com/p/5?utm_source=only"),   # utm-only query
        (5, "https://site.com/p/5?id=3"),                  # different id param
    ]
    df = spark.createDataFrame(cases, "doc_id long, url string")
    got = {
        r["doc_id"]: r["c"]
        for r in df.select("doc_id", canonical_url(F.col("url")).alias("c")).collect()
    }
    assert got[1] == got[2] == got[3] == "site.com/p/5?id=2"
    assert got[4] == "site.com/p/5"
    assert got[5] == "site.com/p/5?id=3"
    out = QC.q_url_dedup(spark, SF).collect()
    assert sum(1 for r in out if r["n_docs"] > 1) > 0
    assert sum(r["n_docs"] for r in out) == 500  # every doc in exactly one group


def test_bm25_planted_ordering(spark):
    """BM25 sanity on planted docs: a doc matching the rare query term plus
    repeats of a common one outranks a doc with a single common-term hit;
    docs with no query term never appear; idf orders rare > common for
    equal tf and dl."""
    from recsys_pipeline_spark.queries_curation import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
        q_bm25_topk,
    )

    assert BM25_K1 == 1.2 and BM25_B == 0.75 and len(BM25_TERMS) == 3
    out = q_bm25_topk(spark, "/root/testdata/sf0.001").collect()
    assert 0 < len(out) <= 20
    scores = [r["bm25"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # 'dup' is the rare term (df 25 of 500): every doc containing it should
    # outrank any doc scoring on common terms alone at comparable tf/dl --
    # check the top doc actually contains a query term at all (join back)
    from pyspark.sql import functions as F

    from recsys_pipeline_spark.io import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    top_ids = [r["doc_id"] for r in out]
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.filter(F.col("doc_id").isin(top_ids)).collect()
    }
    assert all(any(t in texts[i].split() for t in BM25_TERMS) for i in top_ids)
    # the rare term dominates: every top-5 doc contains 'dup'
    assert all("dup" in texts[i].split() for i in top_ids[:5])


# ---------------------------------------------------------------------------
# bpe_train: the full iterative trainer (count -> best merge -> apply)
# ---------------------------------------------------------------------------


def test_bpe_train_greedy_overlap_and_state_evolution(spark):
    """Hand-computed 3-round trace on a planted corpus pinning BOTH the
    greedy left-to-right overlap rule and that later rounds count MERGED
    tokens: 'aaaa ab ab' -> r1 merges (a,a) cnt 3 (overlapping run: aaaa
    contributes 3 adjacencies but collapses to aa,aa), r2 (a,b) cnt 2, r3
    (aa,aa) cnt 1 — which only exists because r1 rewrote the state."""
    from recsys_pipeline_spark.operators import curation

    docs = spark.createDataFrame([(1, "aaaa ab ab")], ["doc_id", "text"])
    got = [
        (int(r["merge_round"]), r["lhs"], r["rhs"], r["merged"], int(r["cnt"]))
        for r in curation.bpe_train(docs, "text", rounds=3)
        .orderBy("merge_round")
        .collect()
    ]
    assert got == [
        (1, "a", "a", "aa", 3),
        (2, "a", "b", "ab", 2),
        (3, "aa", "aa", "aaaa", 1),
    ]


def test_bpe_apply_even_run_parity(spark):
    """Even-length repeat runs pin the windowed merge-apply's parity rule
    (r16 rewrite): 'xxxxxx' r1 counts 5 (x,x) adjacencies but greedy
    left-to-right collapses to xx,xx,xx (starts at run offsets 0,2,4); r2
    the (xx,xx) run of length 2 merges only its head -> xxxx,xx."""
    from recsys_pipeline_spark.operators import curation

    docs = spark.createDataFrame([(1, "xxxxxx")], ["doc_id", "text"])
    got = [
        (int(r["merge_round"]), r["merged"], int(r["cnt"]))
        for r in curation.bpe_train(docs, "text", rounds=2)
        .orderBy("merge_round")
        .collect()
    ]
    assert got == [(1, "xx", 5), (2, "xxxx", 2)]
    state = curation.bpe_final_state(docs, "text", rounds=2)
    toks = [r["tok"] for r in state.orderBy("pos").collect()]
    assert toks == ["xxxx", "xx"]


def test_bpe_train_word_frequency_weighting(spark):
    """Pair counts weight by word FREQUENCY, not dictionary membership:
    'xy' twice beats 'zw' once."""
    from recsys_pipeline_spark.operators import curation

    docs = spark.createDataFrame([(1, "xy xy zw")], ["doc_id", "text"])
    got = curation.bpe_train(docs, "text", rounds=1).collect()
    assert [(r["lhs"], r["rhs"], int(r["cnt"])) for r in got] == [("x", "y", 2)]


def test_bpe_encode_applies_frozen_merges_to_new_docs(spark):
    """The deployment shape: merges trained on one corpus, applied frozen to
    ANOTHER. Train on 'aaaa ab ab' (merges aa, ab, aaaa), encode 'aab ba':
    aab -> [aa, b] (r1 fires, r2 (a,b) can't — the 'a' is inside 'aa'),
    ba -> [b, a] (no merge matches)."""
    from recsys_pipeline_spark.operators import curation

    train = spark.createDataFrame([(1, "aaaa ab ab")], ["doc_id", "text"])
    merges = curation.bpe_train(train, "text", rounds=3)
    new = spark.createDataFrame([(7, "aab ba")], ["doc_id", "text"])
    got = curation.bpe_encode(new, merges, "doc_id", "text", rounds=3).collect()
    assert [(int(r["doc_id"]), r["bpe_text"], int(r["n_bpe_tokens"])) for r in got] == [
        (7, "aa b b a", 4)
    ]


def test_bpe_encode_roundtrip_on_training_corpus(spark):
    """Encoding the training corpus reflects every learned merge: 'aaaa ab
    ab' tokenizes to single units after the 3 rounds that learned exactly
    those merges."""
    from recsys_pipeline_spark.operators import curation

    docs = spark.createDataFrame([(1, "aaaa ab ab")], ["doc_id", "text"])
    merges = curation.bpe_train(docs, "text", rounds=3)
    got = curation.bpe_encode(docs, merges, "doc_id", "text", rounds=3).collect()
    assert [(r["bpe_text"], int(r["n_bpe_tokens"])) for r in got] == [("aaaa ab ab", 3)]


def test_training_batches_composite_semantics(spark):
    """The final-mile composite: exactly the quality-gate survivors appear,
    bin ids are the greedy running-sum pack over BPE subword counts (within
    each source, ordered by doc_id, bin = floor(prefix_offset / budget) —
    re-simulated from the query's own rows), and counts are positive."""
    from recsys_pipeline_spark.queries_curation import (
        PACK_BUDGET,
        q_quality_filter,
        q_training_batches,
    )

    sf = "/root/testdata/sf0.001"
    rows = q_training_batches(spark, sf).collect()
    kept = {
        int(r["doc_id"]) for r in q_quality_filter(spark, sf).collect() if r["keep"] == 1
    }
    assert {int(r["doc_id"]) for r in rows} == kept and kept
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(
            (int(r["doc_id"]), int(r["n_bpe_tokens"]), int(r["bin_id"]))
        )
    for docs in by_source.values():
        docs.sort()
        off = 0
        for _, n, bin_id in docs:
            assert n > 0
            assert bin_id == off // PACK_BUDGET
            off += n


def test_bpe_train_invariant_to_input_partitioning(spark):
    """Rerun-stability: the merge table is a pure function of corpus content
    — identical under any input partitioning (window orders and tie rules
    are fully deterministic)."""
    from recsys_pipeline_spark.io import read_table
    from recsys_pipeline_spark.operators import curation

    d = read_table(spark, "/root/testdata/sf0.001", "documents")

    def table(df):
        return [
            tuple(r)
            for r in curation.bpe_train(df, "text", rounds=3)
            .orderBy("merge_round")
            .collect()
        ]

    assert table(d.repartition(1)) == table(d.repartition(7))


def test_profile_drift_alerts_follow_planted_churn(spark):
    """The synthesized next version deletes ~1/17 of rows (under the 5%
    row-count alert), leaves nulls untouched, and introduces the 'xx'
    language (5 -> 6 distinct = +20% cardinality): exactly one alert fires,
    on lang/cardinality."""
    from recsys_pipeline_spark.queries_curation import q_profile_drift

    rows = {r["column_name"]: r for r in q_profile_drift(spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) == {"doc_id", "text", "lang"}
    assert rows["lang"]["alerts"] == "cardinality"
    assert rows["doc_id"]["alerts"] == "" and rows["text"]["alerts"] == ""
    for r in rows.values():
        assert int(r["null_ppm_a"]) == 0 and int(r["null_ppm_b"]) == 0
        assert int(r["rows_shift_ppm"]) < 0  # deletions outnumber additions


def test_fuzzy_decontaminate_flags_near_duplicates_of_eval(spark):
    """Planted semantics: a light edit of an eval doc (one word changed in
    a long text — exact 4-gram decontamination's blind spot is small, but
    char-5-shingle Jaccard stays ~0.95) is flagged; an unrelated doc is
    not; eval docs themselves are never flagged."""
    import hashlib

    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(f"eval:{doc_id}".encode()).hexdigest()[:15], 16) % 100

    eval_id = next(i for i in range(1, 10_000) if bucket(i) < 10)
    train_ids = [i for i in range(1, 10_000) if bucket(i) >= 10][:2]
    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "purple elephants discuss quarterly revenue projections near "
        "the abandoned lighthouse on tuesday afternoon"
    )
    near = base.replace("tuesday", "thursday")
    unrelated = "completely different content about submarine maintenance " * 3
    docs = spark.createDataFrame(
        [(eval_id, base), (train_ids[0], near), (train_ids[1], unrelated)],
        "doc_id long, text string",
    )
    out = {
        int(r["doc_id"]): (int(r["n_eval_matches"]), float(r["max_jaccard"]))
        for r in curation.fuzzy_decontaminate_flags(
            docs, "doc_id", "text", eval_pct=10, threshold=0.8, portable=True
        ).collect()
    }
    assert set(out) == {train_ids[0]}
    n, j = out[train_ids[0]]
    assert n == 1 and j >= 0.9


def test_fuzzy_decontaminate_sub_shingle_identical_docs_flagged(spark):
    """Texts shorter than the shingle width have EMPTY verification shingle
    sets but still band-collide when identical (the signature hashes the
    whole short string).  The zero-union convention must score them 1.0 —
    they ARE exact dups — on both engines (Spark used to return 0.0 while
    DuckDB's 0/0 = NaN passed the threshold; r14 ADVICE).  A short train
    doc DIFFERENT from the short eval doc must not be flagged."""
    import hashlib

    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(f"eval:{doc_id}".encode()).hexdigest()[:15], 16) % 100

    eval_id = next(i for i in range(1, 10_000) if bucket(i) < 10)
    train_ids = [i for i in range(1, 10_000) if bucket(i) >= 10][:2]
    docs = spark.createDataFrame(
        [(eval_id, "ok"), (train_ids[0], "ok"), (train_ids[1], "no")],
        "doc_id long, text string",
    )
    out = {
        int(r["doc_id"]): (int(r["n_eval_matches"]), float(r["max_jaccard"]))
        for r in curation.fuzzy_decontaminate_flags(
            docs, "doc_id", "text", eval_pct=10, shingle_n=5,
            threshold=0.8, portable=True,
        ).collect()
    }
    assert out == {train_ids[0]: (1, 1.0)}


def test_heavy_hitters_exact_with_forced_evictions(spark):
    """Capacity-16 summaries over ~48 distinct keys FORCE Misra-Gries
    evictions in every partition, yet the verified output must be exactly
    the true hitters with exact counts — and identical under a different
    partitioning (the summary content is order-dependent, the verified
    result is not)."""
    from recsys_pipeline_spark.operators.skew import heavy_hitters_exact

    rows = (
        [("hot",)] * 300          # 30% of 1000
        + [("warm",)] * 150       # 15%
        + [("edge",)] * 100       # exactly 10% — >= threshold keeps it
        + [(f"noise{i % 45}",) for i in range(450)]  # 45 keys at 1%
    )
    df = spark.createDataFrame(rows, "k string")
    want = {"hot": (300, 300000), "warm": (150, 150000), "edge": (100, 100000)}
    for parts in (3, 17):
        got = {
            r["k"]: (int(r["cnt"]), int(r["share_ppm"]))
            for r in heavy_hitters_exact(
                df.repartition(parts), "k", threshold_ppm=100_000, summary_k=16
            ).collect()
        }
        assert got == want, (parts, got)


def test_heavy_hitters_guard_rejects_unsound_capacity(spark):
    """threshold_ppm <= 1e6/k voids the summary guarantee — the operator
    must refuse instead of silently missing hitters."""
    import pytest as _pytest

    from recsys_pipeline_spark.operators.skew import heavy_hitters_exact

    df = spark.createDataFrame([("a",)], "k string")
    with _pytest.raises(ValueError):
        heavy_hitters_exact(df, "k", threshold_ppm=1000, summary_k=1000)


def test_hybrid_rrf_fusion_arithmetic_and_channel_membership(spark):
    """The fused score must recompute exactly from the emitted ranks
    (floor(1e6/(60+rank)) per present channel), every output doc must come
    from at least one channel's top-20, the output must be rrf-descending,
    and the two channels must genuinely DISAGREE somewhere at sf0.01
    (otherwise the fusion tests nothing)."""
    from recsys_pipeline_spark.queries_curation import q_hybrid_rrf_topk

    out = q_hybrid_rrf_topk(spark, "/root/testdata/sf0.01").collect()
    assert len(out) == 10
    scores = []
    disagreement = False
    for r in out:
        b, t = r["bm25_rank"], r["tfidf_rank"]
        assert b is not None or t is not None
        want = (1_000_000 // (60 + b) if b is not None else 0) + (
            1_000_000 // (60 + t) if t is not None else 0
        )
        assert int(r["rrf_ppm"]) == want
        if b is not None and t is not None and b != t:
            disagreement = True
        if b is None or t is None:
            disagreement = True
        scores.append(int(r["rrf_ppm"]))
    assert scores == sorted(scores, reverse=True)
    assert disagreement
