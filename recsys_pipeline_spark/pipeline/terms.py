"""Stage 2 — term translation: PIT per-genre features + user/item term state.

Reference: offline/preprocess/s2_term_trans.py. The sequential per-user
dequeue scan (:37-61) becomes window frames over (userid, ts, line) — the
incremental add/evict the reference hand-rolls is exactly what WindowExec does
for a sliding ROWS frame, but distributed.

Artifacts (pickle dicts in the reference; DataFrames/Parquet here):
  user_filter : userid -> all interacted itemids            (:33-34)
  imp_term    : per-impression per-genre [imp,clk] over the previous <=10
                interactions, strictly past (frame [i-10, i-1])   (:52-57)
  user_term   : per-user final state over the LAST 11 rows — the reference
                adds the last row to a full 10-window without evicting
                (frame [n-11, n-1])                               (:43-47)
  item_term   : itemid -> distinct genre-id set                   (:66-73)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recsys_pipeline_spark.operators import pit
from recsys_pipeline_spark.pipeline.preprocess import LINE_ID
from recsys_pipeline_spark.schemas import (
    GENRE_IDS,
    GENRE_TO_ID,
    PIT_WINDOW,
    RECALL_TERM_CLICK_MIN,
    map_literal,
)


def genres_to_ids(movies: DataFrame, out_col: str = "genre_ids") -> DataFrame:
    """movies(genres 'A|B|C') -> + array<int> of genre ids (P8 + dict-encode).

    Pure expression: split + per-element map lookup, all codegen'd.
    """
    gmap = map_literal(GENRE_TO_ID)
    ids = F.transform(F.split(F.col("genres"), "\\|"), lambda g: gmap[g])
    return movies.withColumn(out_col, F.filter(ids, lambda x: x.isNotNull()))


def user_filter(offline_imp: DataFrame) -> DataFrame:
    """A2: userid -> sorted distinct interacted items (the online seen-filter)."""
    return pit.user_seen_items(offline_imp, "userid", "itemid")


def item_term(movies: DataFrame) -> DataFrame:
    """A6: itemid -> sorted distinct genre ids."""
    with_ids = genres_to_ids(movies)
    return with_ids.select("itemid", F.array_sort(F.array_distinct("genre_ids")).alias("genre_ids"))


def imp_with_genres(offline_imp: DataFrame, movies: DataFrame) -> DataFrame:
    """J2: impressions ⋈ item genre sets (broadcast — dims are small)."""
    items = genres_to_ids(movies).select("itemid", "genre_ids")
    return offline_imp.join(F.broadcast(items), "itemid", "left").withColumn(
        "genre_ids", F.coalesce(F.col("genre_ids"), F.array().cast("array<int>"))
    )


def imp_term(offline_imp: DataFrame, movies: DataFrame, window: int = PIT_WINDOW) -> DataFrame:
    """J4/A4: per-impression per-genre [imp_cnt, clk_cnt] over the user's
    previous <=10 interactions — strictly past, no leakage. Adds queryid (P12:
    the (userid, ts, line) scan order)."""
    df = imp_with_genres(offline_imp, movies)
    df = pit.pit_counts_multi_key(
        df, user_col="userid", ts_col="ts", keys_array_col="genre_ids",
        key_values=GENRE_IDS, label_col="label", tiebreak_col=LINE_ID,
        window=window, include_current=False, prefix="user_g",
    )
    return pit.assign_queryid(df, "userid", "ts", tiebreak_col=LINE_ID)


def user_term(offline_imp: DataFrame, movies: DataFrame, window: int = PIT_WINDOW) -> DataFrame:
    """A5: per-user per-genre counts over the LAST 11 interactions (the
    reference's off-by-one: final row included without evicting)."""
    df = imp_with_genres(offline_imp, movies)
    df = pit.pit_counts_multi_key(
        df, user_col="userid", ts_col="ts", keys_array_col="genre_ids",
        key_values=GENRE_IDS, label_col="label", tiebreak_col=LINE_ID,
        window=window, include_current=True, prefix="user_g",
    )
    df = pit.last_row_state(df, "userid", "ts", tiebreak_col=LINE_ID)
    keep = ["userid"] + [f"user_g{v}_{s}" for v in GENRE_IDS for s in ("imp", "clk")]
    return df.select(*keep)


def recall_terms(user_term_df: DataFrame, min_clicks: int = RECALL_TERM_CLICK_MIN) -> DataFrame:
    """A7: userid -> genre ids whose click count >= threshold (the user's
    term-recall query terms, offline_to_online/recall/s1_user_to_redis.py:27-29)."""
    pairs = F.array(
        *[
            F.when(F.col(f"user_g{v}_clk") >= min_clicks, F.lit(v)).otherwise(F.lit(None))
            for v in GENRE_IDS
        ]
    )
    terms = F.array_sort(F.filter(pairs, lambda x: x.isNotNull()))
    return user_term_df.select("userid", terms.alias("terms"))
