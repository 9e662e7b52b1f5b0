"""As-of join — for each left row, the most recent right row at or
before its timestamp, per key.

The reference's analogue is the time-windowed vote-name rename
(``apply_edits.py:63-73``): a rule applies to the latest window
containing the row's stamp. Spark has no native as-of join; the
scalable composition used here is the union + last(ignorenulls)
window trick:

    1. union left and right with a side tag (right sorts first on ties
       so 'at or before' includes equal timestamps);
    2. one window per key ordered by (ts, tag, tiebreak); carry the
       last non-null right payload forward;
    3. keep left rows.

Scale: one shuffle on the key columns, no range explosion, no
per-group pandas. Skewed keys fall out of AQE skew handling since the
window partitions by key. (``pd.merge_asof`` inside ``applyInPandas``
is the fallback for very wide payloads; this version stays JVM-side.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str,
    right_payload: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: latest right row with right.ts <= left.ts.

    Both inputs must share the key columns ``on`` and timestamp column
    ``ts``. Right payload columns are appended to left rows (null when
    no earlier right row exists). ``tiebreak`` orders right rows that
    share a timestamp (latest wins); it must be a right column.
    """
    on = list(on)
    right_payload = list(right_payload)
    left_cols = [c for c in left.columns if c not in on and c != ts]

    tb = F.col(tiebreak) if tiebreak else F.lit(0)
    l_tagged = left.select(
        *on,
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_payload],
    )
    r_tagged = right.select(
        *on,
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        tb.cast("long").alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    )
    unioned = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *on,
        "__ts",
        "__side",
        *left_cols,
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c)
            for c in right_payload
        ],
    )
    return carried.filter(F.col("__side") == 1).drop("__side").withColumnRenamed("__ts", ts)
