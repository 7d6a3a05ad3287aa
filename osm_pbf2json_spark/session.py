"""SparkSession factory with scale-oriented defaults.

All engine entry points accept any SparkSession; this factory is what
`spark-submit --py-files` jobs, tests and bench.py use so every run gets
the same Arrow / AQE / shuffle posture:

- Arrow execution ON: every geometry kernel is a vectorized pandas UDF
  (BASELINE.json input_hint: "no per-row Python").
- AQE ON incl. skew-join: hot H3 cells / hot node refs re-split at runtime.
- shuffle partitions sized for the local sandbox; on a real cluster this is
  overridden by --conf (AQE coalescing makes the initial number forgiving).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_session(
    master: str | None = None,
    app_name: str = "osm-pbf2json-spark",
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # Spark 4.1's sized-batch writer calls ArrowWriter.sizeInBytes per
        # appended ROW unless maxBytesPerBatch == Int.MaxValue exactly
        # (BatchedPythonArrowInput.underBatchSizeLimit). The per-row size
        # walk made every mapInPandas/mapInArrow stage ~8x slower and
        # allocator-bound; IntMax restores the fast whole-batch path.
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "2147483647")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
