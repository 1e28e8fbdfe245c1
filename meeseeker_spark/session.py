"""SparkSession construction.

Local test profile mirrors the driver: local[$SPARK_GRAFT_CPUS] (default 32),
32 shuffle partitions.  The conf choices below are the 100 TB-scale defaults
too — AQE (runtime coalesce + skew-join splitting), Arrow for any pandas UDF
exchange, UTC session time so timestamp semantics are engine-independent.
On a real cluster only master/memory change; the plan-shaping confs stay.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def _plan_confs(shuffle: int) -> list[tuple[str, str]]:
    """The runtime-settable plan-shaping confs — ONE list driving both
    the builder and the host-session re-apply loop below (r15 second
    review: two verbatim copies meant a conf added to one but not the
    other silently failed to apply on exactly the embedded/notebook
    path the re-apply exists for).

    Why each: AQE (runtime coalesce + skew-join splitting); Arrow for
    any pandas-UDF exchange; UTC session time so timestamp semantics
    are engine-independent; InferFiltersFromGenerate rebuilds the
    generator's child expression inside a pre-Generate filter, and
    predicate pushdown then substitutes it through every projection —
    for the shingle/gram exploders this plants an O(len²)-per-row
    tokenize-at-every-element_at filter under the scan (measured 16×
    on the decontamination bench side, r9); the rule only adds
    redundant early-prune filters and none of our generators ever see
    empty/null arrays, so excluding it is semantics-free."""
    return [
        ("spark.sql.shuffle.partitions", str(shuffle)),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.optimizer.excludedRules",
         "org.apache.spark.sql.catalyst.optimizer."
         "InferFiltersFromGenerate"),
        ("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED"),
    ]


def get_spark(app_name: str = "meeseeker-spark", cpus: int | str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS))
    confs = _plan_confs(shuffle)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in confs:
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate() silently IGNORES every conf above when a session
    # already exists (a host harness/notebook created one first — r15
    # review): re-apply the runtime-settable plan-shaping confs on the
    # live session.  excludedRules and session.timeZone are the
    # load-bearing two (a measured 16× regression and timestamp
    # semantics); master/memory are static and legitimately stay the
    # host's.
    for k, v in confs:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # a host that pinned a conf non-modifiable keeps it
    return spark
