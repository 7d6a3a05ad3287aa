"""As-of (backward) join — the time-series operator Spark lacks natively.

Each left row is annotated with the most recent right row whose
timestamp is <= the left row's, per key (classic "event → latest prior
snapshot" join; DuckDB/kdb ASOF JOIN, pandas merge_asof semantics).

Spark shape: ONE window pass over the tagged union of both sides — no
range-join candidate explosion and no per-key driver work. Both sides
shuffle once on the key, sort by (ts, side) inside partitions (right
rows first on ties, giving inclusive <= semantics), and the right-side
values propagate via last(..., ignorenulls=True). At 10¹² rows the cost
is one shuffle of each side plus a partition-local sort — the same plan
a native range join would need at minimum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by_cols: tuple = ("user_id",),
    value_cols: tuple = ("value",),
    prefix: str = "asof_",
    tolerance=None,
) -> DataFrame:
    """Backward as-of join.

    Returns `left`'s columns plus, per v in value_cols, `{prefix}{v}` —
    the most recent right row's v with right.ts <= left.ts on the same
    key (NULL when no prior right row) — and `{prefix}ts`, the matched
    right timestamp. `tolerance` (a Column interval or seconds literal)
    nulls matches older than `left.ts - tolerance`.
    """
    by = list(by_cols)
    rsel = right.select(
        *by,
        F.col(ts_col).alias(ts_col),
        F.col(ts_col).alias(f"_r_{ts_col}"),
        *[F.col(v).alias(f"_r_{v}") for v in value_cols],
    ).withColumn("_side", F.lit(0))
    lsel = left.withColumn("_side", F.lit(1))
    u = lsel.unionByName(rsel, allowMissingColumns=True)

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn(f"{prefix}ts", F.last(f"_r_{ts_col}", ignorenulls=True).over(w))
    for v in value_cols:
        u = u.withColumn(f"{prefix}{v}", F.last(f"_r_{v}", ignorenulls=True).over(w))
    out = u.filter(F.col("_side") == 1).drop(
        "_side", f"_r_{ts_col}", *[f"_r_{v}" for v in value_cols]
    )
    if tolerance is not None:
        stale = F.col(f"{prefix}ts") < (F.col(ts_col) - tolerance)
        for v in value_cols:
            out = out.withColumn(
                f"{prefix}{v}", F.when(stale, F.lit(None)).otherwise(F.col(f"{prefix}{v}"))
            )
        out = out.withColumn(
            f"{prefix}ts", F.when(stale, F.lit(None)).otherwise(F.col(f"{prefix}ts"))
        )
    return out
