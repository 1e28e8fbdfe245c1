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
    # ONE last() over the WHOLE matched right row as a struct (r15
    # review): per-column last(ignorenulls) skipped a genuine NULL in
    # one value column and stitched that column from an OLDER right row
    # — a (ts_asof, value) combination that never existed, where the
    # DuckDB ASOF oracle returns the matched row intact, NULLs and all.
    # The struct is non-NULL exactly when a right row matched, so
    # ignorenulls still means "no right row yet", never "this column
    # was NULL".
    merged = merged.withColumn(
        "_r_row",
        F.when(F.col("_side") == 0,
               F.struct(F.col("_r_ts").alias("_ts"),
                        *[F.col(f"_r_{c}").alias(c) for c in rcols])))
    merged = merged.withColumn(
        "_m", F.last("_r_row", ignorenulls=True).over(w))
    for c in rcols:
        merged = merged.withColumn(f"{c}{suffix}", F.col(f"_m.{c}"))
    merged = merged.withColumn(f"{on}{suffix}", F.col("_m._ts"))
    return (
        merged.where(F.col("_side") == 1)
        .drop("_side", "_r_ts", "_r_row", "_m",
              *[f"_r_{c}" for c in rcols])
    )
