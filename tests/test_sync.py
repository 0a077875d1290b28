"""Offline->online sync round-trip (S5-S9): state saved to parquet + MLlib
artifacts, reloaded in the same session, must serve IDENTICAL results to the
in-memory pipeline — the reference's offline/online parity check
(offline_to_online/rank/s3_check_offline_and_online.py:19-41) generalized
from 2 boundary samples to the full response."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from recsys_pipeline_spark import serve, sync
from recsys_pipeline_spark.pipeline import feature_engi, preprocess, terms
from recsys_pipeline_spark.rank import model as rank_model
from recsys_pipeline_spark.recall import vectors
from tests import ml1m_fixture as fx


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    ratings = spark.createDataFrame(fx.gen_ratings())
    movies = spark.createDataFrame(fx.gen_movies())
    users = spark.createDataFrame(fx.gen_users())
    labeled = preprocess.label_and_split(ratings)
    offline, _ = preprocess.offline_online(labeled)
    train, test, user_entity, item_entity, meta = feature_engi.build_features(
        offline, users, movies
    )
    feature_cols = [
        f["name"] for f in meta["sparse_id"] + meta["sparse_side"] + meta["dense"]
    ]
    mf = vectors.train_mf(train.select("userid", "itemid", "label"), max_iter=5)
    ranker = rank_model.train_rank_model(train, feature_cols, algo="lr", max_iter=20)
    ut = terms.recall_terms(terms.user_term(offline, movies), min_clicks=2)
    item_t = terms.item_term(movies)
    seen = terms.user_filter(offline)
    out_dir = str(tmp_path_factory.mktemp("online_state"))
    return dict(
        spark=spark, offline=offline, movies=movies, mf=mf, ranker=ranker,
        user_terms=ut, item_terms=item_t, seen=seen, user_entity=user_entity,
        item_entity=item_entity, meta=meta, feature_cols=feature_cols,
        out_dir=out_dir,
    )


@pytest.fixture(scope="module")
def saved(world):
    user_state = sync.build_user_state(
        vectors.user_vectors(world["mf"]), world["user_terms"], world["seen"]
    )
    item_state = sync.build_item_state(
        vectors.item_vectors(world["mf"]), world["item_terms"]
    )
    sync.save_online_state(
        world["out_dir"], user_state, item_state,
        world["user_entity"], world["item_entity"],
        mf_model=world["mf"], ranker=world["ranker"], feat_meta=world["meta"],
    )
    return world["out_dir"]


def test_state_tables_round_trip(world, saved):
    st = sync.load_online_state(world["spark"], saved)
    n_users_direct = vectors.user_vectors(world["mf"]).count()
    assert st["user_state"].where(F.col("vector").isNotNull()).count() == n_users_direct
    assert st["item_state"].count() >= vectors.item_vectors(world["mf"]).count()
    assert st["feat_meta"] == world["meta"]
    # nested array columns survive parquet (the pickle-replacement claim)
    row = st["user_state"].where(F.col("terms").isNotNull()).first()
    assert isinstance(row["terms"], list)


def test_model_artifacts_round_trip(world, saved):
    st = sync.load_online_state(world["spark"], saved)
    direct = {
        (r["userid"],): r["vector"]
        for r in vectors.user_vectors(world["mf"]).collect()
    }
    loaded = {
        (r["userid"],): r["vector"]
        for r in vectors.user_vectors(st["mf_model"]).collect()
    }
    assert direct == loaded  # ALS factors identical after save/load


def test_serve_from_reloaded_state_matches_inmemory(world, saved):
    req = world["spark"].createDataFrame([(1,), (2,), (99999,)], ["userid"])
    direct = serve.recommend(
        req,
        vectors.user_vectors(world["mf"]),
        vectors.item_vectors(world["mf"]),
        world["user_terms"], world["item_terms"], world["seen"],
        world["user_entity"], world["item_entity"],
        world["ranker"], world["feature_cols"],
        recall_k=20, response_k=5,
    )
    from_state = sync.recommend_from_state(
        world["spark"], saved, req, world["feature_cols"],
        recall_k=20, response_k=5,
    )
    a = sorted((r["userid"], r["itemid"], round(r["score"], 9)) for r in direct.collect())
    b = sorted((r["userid"], r["itemid"], round(r["score"], 9)) for r in from_state.collect())
    assert a == b


def test_streaming_recommend_matches_batch_serve(world, saved, tmp_path):
    """The foreachBatch serving loop must produce exactly what the batch
    serve-from-state query produces for the same request users."""
    spark = world["spark"]
    req_dir = str(tmp_path / "requests")
    spark.createDataFrame([(1,), (2,)], ["userid"]).write.parquet(req_dir)
    got: list = []
    stream = spark.readStream.schema("userid long").parquet(req_dir)
    sync.recommend_stream(
        spark, saved, stream, world["feature_cols"],
        sink=lambda recs, eid: got.extend(recs.collect()),
        recall_k=20, response_k=5,
    )
    want = sync.recommend_from_state(
        spark, saved, spark.createDataFrame([(1,), (2,)], ["userid"]),
        world["feature_cols"], recall_k=20, response_k=5,
    ).collect()
    key = lambda r: (r["userid"], r["itemid"], round(r["score"], 9))  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))
