"""As-of (nearest-prior) join — a training-pipeline staple Spark lacks.

Aligns each left row to the latest right row with ``right.ts <= left.ts``
per key (feature snapshots to events, prices to trades, last purchase to
click). Spark has no ASOF JOIN operator; the naive encodings both fail at
scale — an inequality theta-join degenerates to a per-key cross product,
and a windowed subquery per left row re-scans the right side.

This implementation is the scale-correct composition: UNION both sides,
ONE shuffle on the key, and a running ``last(right_value, ignorenulls)``
window ordered by (ts, side) — right rows sort before left rows at equal
ts, so the match is inclusive exactly like DuckDB's ``ASOF JOIN``
(l.ts >= r.ts), which serves as the oracle. Cost: one exchange + one
sort, independent of time-skew between the sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: tuple[str, ...] = ("user_id",),
              right_cols: tuple[str, ...] | None = None,
              suffix: str = "_asof") -> DataFrame:
    """For every left row: columns of the latest right row at-or-before
    its ``on`` timestamp within the same ``by`` group (null if none).

    Output = all left columns + ``<right_col><suffix>`` for each right
    value column + ``<on><suffix>`` (the matched right timestamp).
    """
    rcols = list(right_cols if right_cols is not None else
                 [c for c in right.columns if c not in (*by, on)])
    r = right.select(
        *by,
        F.col(on).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
    ).withColumn(on, F.col("_r_ts")).withColumn("_side", F.lit(0))
    l = left.withColumn("_side", F.lit(1))
    merged = l.unionByName(r, allowMissingColumns=True)
    w = (Window.partitionBy(*by)
         .orderBy(F.col(on).asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for c in rcols:
        merged = merged.withColumn(
            f"{c}{suffix}",
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w))
    merged = merged.withColumn(
        f"{on}{suffix}", F.last(F.col("_r_ts"), ignorenulls=True).over(w))
    return (
        merged.where(F.col("_side") == 1)
        .drop("_side", "_r_ts", *[f"_r_{c}" for c in rcols])
    )
