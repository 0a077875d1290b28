"""Generalized timestamp as-of join (closest-prior-event semantics).

The reference's only temporal join is the PIT row-count window
(`offline/preprocess/s2_term_trans.py:37-61` — previous <=10 *rows*).  The
general form a feature pipeline needs at scale is the *timestamp* as-of join:
for each left event, the single most recent right event with the same key and
an earlier timestamp (strictly earlier, or <= for inclusive semantics).  This
is the market-data "trade joins last quote" operator and the
training-data "label joins last state snapshot" operator.

Spark-first design — NO join node at all:

    union(left, right)  -> one hash exchange on the key
                        -> one in-partition sort by (ts, side)
                        -> last(right_payload, ignorenulls) running window
                        -> filter back to left rows

A join + range-filter + argmax formulation would shuffle both sides, build an
exploded candidate set (every left row x every earlier right row) and then
throw away all but one candidate per row; the merge-scan form is the classic
single-pass algorithm, linear in |left| + |right| per key, with ONE shuffle
and bounded memory (WindowExec keeps a running `last`, not the frame).  This
is the same plan shape a 1000-executor cluster wants: cost is dominated by
one exchange of the union, and skewed keys are split by AQE like any other
window shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_cols: list[str],
    strict: bool = True,
    out_prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row + the payload of the latest right row
    with the same ``key_col`` and earlier ``ts_col``; NULLs when none exists.

    ``right`` must be unique per (key_col, ts_col) — pre-aggregate if the raw
    stream can carry co-timed duplicates, otherwise "latest" is undefined (the
    oracle engines tie-break arbitrarily too).

    strict=True  -> right.ts <  left.ts   (no same-instant leakage)
    strict=False -> right.ts <= left.ts

    Tie handling is encoded purely in the sort: at equal ts the right row
    sorts after the left rows when strict (so the running ``last`` cannot see
    it) and before them when inclusive.
    """
    right_side = 1 if strict else 0
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("_rpay")

    l = left.withColumn("_side", F.lit(1 - right_side)).withColumn(
        "_rpay", F.lit(None).cast(
            right.select(payload).schema["_rpay"].dataType
        )
    )
    r = right.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(right_side).alias("_side"),
        payload,
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))

    out = matched.filter(F.col("_side") == (1 - right_side))
    for c in right_cols:
        out = out.withColumn(f"{out_prefix}{c}", F.col("_m").getField(c))
    return out.drop("_side", "_rpay", "_m")
