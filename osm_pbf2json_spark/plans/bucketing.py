"""Bucketed tables — co-located joins with no Exchange.

The north-rule posture for repeated big×big joins on a stable key: pay
the shuffle ONCE at write time (`bucketBy` + optional `sortBy`), then
every subsequent equi-join on that key reads co-located buckets and
plans as a SortMergeJoin with NO Exchange on either side. At 100 TB this
turns the nightly "join events to documents by doc_id" from a
two-sided shuffle into a scan+merge.

Bucketed writes go through the session catalog (`saveAsTable`) — plain
`parquet(path)` cannot record bucket metadata. The catalog seam is the
same one `sources.pages.load_pages` pins for Iceberg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 64,
    sort: bool = True,
) -> None:
    """Overwrite `table` bucketed (and bucket-sorted) by `key`."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Equi-join two same-bucketed tables on their bucket key — planned
    shuffle-free when bucket specs match (asserted by the plan gate in
    tests/test_plans.py)."""
    return spark.table(left_table).join(spark.table(right_table), key)
