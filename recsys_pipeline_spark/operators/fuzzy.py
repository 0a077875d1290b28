"""Blocked approximate string join (fuzzy entity matching).

The reference has no record-linkage stage, but any catalog-scale pipeline
needs one: near-identical entity names (typos, abbreviation drift) must be
paired WITHOUT the O(n²) all-pairs edit-distance scan. The standard shape —
Gravano et al. (VLDB 2001) / PPJoin-family filtering — is:

1. BLOCK: hash-partition candidates by a cheap deterministic key a true
   match must share (here: a token of the name). One shuffle; candidate
   generation is Σ block_size², never n².
2. PRE-FILTER inside the block with codegen-cheap rejections (length
   difference > k kills a pair before any distance work).
3. VERIFY survivors with banded Levenshtein — Spark's ``levenshtein(l, r,
   threshold)`` early-exits at the threshold, O(k·len) instead of O(len²).

At 100 TB the only exchange is the block-key hash join; skewed blocks (a
stop-word block key) are the operational risk, so callers pick block keys
with bounded frequency (the discriminative token, not the generic one) and
``max_block`` guards the quadratic blowup by dropping oversized blocks
loudly rather than silently stalling an executor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def blocked_levenshtein_pairs(
    names: DataFrame,
    name_col: str,
    block_expr: Column,
    max_dist: int,
    max_block: int = 10_000,
) -> DataFrame:
    """All (name_a < name_b) pairs sharing a block key with edit distance
    <= ``max_dist``. ``names`` must be one row per distinct name; extra
    columns are carried through with ``_a`` / ``_b`` suffixes.

    Blocks larger than ``max_block`` are dropped (with the standard recall
    caveat of every blocking scheme — an oversized block means the key is
    not discriminative, so its pairs are mostly non-matches anyway). The
    length pre-filter runs before the distance call; the distance call is
    threshold-banded so verification cost is O(max_dist · len) per pair.
    """
    # Block-size guard as a COUNT window over the same _blk partitioning the
    # self-join needs: the one exchange is shared (ReusedExchange) instead of
    # spending a separate groupBy + broadcast-join round trip.
    blocked = (
        names.withColumn("_blk", block_expr)
        .withColumn("_bn", F.count(F.lit(1)).over(Window.partitionBy("_blk")))
        .filter(F.col("_bn") <= max_block)
        .drop("_bn")
    )
    carried = [c for c in names.columns if c != name_col]
    a = blocked.select(
        "_blk",
        F.col(name_col).alias("name_a"),
        F.length(name_col).alias("_la"),
        *[F.col(c).alias(f"{c}_a") for c in carried],
    )
    b = blocked.select(
        "_blk",
        F.col(name_col).alias("name_b"),
        F.length(name_col).alias("_lb"),
        *[F.col(c).alias(f"{c}_b") for c in carried],
    )
    pairs = (
        a.join(b, "_blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(F.abs(F.col("_la") - F.col("_lb")) <= max_dist)
        .withColumn(
            "dist", F.levenshtein(F.col("name_a"), F.col("name_b"), max_dist)
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
    )
    out_cols = ["name_a", "name_b", "dist"]
    out_cols += [f"{c}_a" for c in carried] + [f"{c}_b" for c in carried]
    # block_expr yields ONE key per name here, so a pair can only form in
    # one block — no dedup exchange needed. Callers that explode multi-key
    # blocking (q-gram posting lists) must .distinct() the result themselves.
    return pairs.select(*out_cols)
