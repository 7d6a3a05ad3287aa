"""Explicit partitioning & skew control (north rule: "partitioning /
shuffle / skew handled explicitly").

- `repartition_by_tile_prefix`: co-locate rows by coarse spatial parent
  cell before heavy spatial stages, so downstream per-tile work is
  shuffle-free and output files are spatially clustered.
- `salted_join`: salted hash equi-join for skewed keys (hot node refs
  from mega-junctions, hot H3 cells over city centers). The small/dim
  side is replicated `salt` times; the large side draws a deterministic
  pseudo-random salt per row — the hot key's rows spread over `salt`
  reducers. AQE skew-join (on by default in session.py) handles runtime
  skew; explicit salting is for keys known-hot a priori, where AQE's
  post-hoc splitting still funnels the map side.
- `hot_keys`: sample-based hot-key detection to drive hybrid plans
  (salt only the hot keys, plain join for the rest).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from ..functions import tiles as T


def widen_narrow_input(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition when the input has fewer partitions than the cluster
    has slots. Spark never re-splits a partition mid-stage, so an
    operator that multiplies rows (shingle/token explode) or runs a
    per-row kernel over a single small parquet file would otherwise
    execute on a handful of cores. No-op when the input is already wide
    (the normal case for a real multi-file table)."""
    par = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def repartition_by_tile_prefix(
    df: DataFrame,
    n_partitions: int,
    res: int = 9,
    parent_res: int = 4,
    lon_col: str = "lon",
    lat_col: str = "lat",
    grid: str = "quad",
) -> DataFrame:
    """Partition by the parent cell of each row's tile: rows in the same
    coarse region land in the same partition (and the same output file)."""
    if grid == "quad":
        udf = F.pandas_udf(
            lambda lon, lat: pd.Series(
                T.quad_parent(T.quad_cell(lon.to_numpy(), lat.to_numpy(), res), parent_res)
            ),
            "long",
        )
    else:
        udf = F.pandas_udf(
            lambda lon, lat: pd.Series(T.hex_cell(lon.to_numpy(), lat.to_numpy(), parent_res)),
            "long",
        )
    return df.withColumn("_prefix", udf(F.col(lon_col), F.col(lat_col))).repartition(
        n_partitions, "_prefix"
    )


def hot_keys(df: DataFrame, key: str, threshold_frac: float = 0.01, sample: float = 0.05):
    """Keys covering more than `threshold_frac` of a sample — candidates
    for explicit salting.

    Single input scan: the cutoff is derived from the SAMPLE's own total
    (one window over the tiny aggregated key-count table), never from a
    full `df.count()` — at 100 TB a count-for-a-cutoff is a wasted scan.
    """
    from pyspark.sql import Window

    counts = df.sample(fraction=min(1.0, sample), seed=42).groupBy(key).count()
    tot = F.sum("count").over(Window.partitionBy(F.lit(1)))
    hot = counts.withColumn(
        "_cut", F.greatest(F.lit(1), F.floor(tot * F.lit(threshold_frac)).cast("long"))
    ).filter(F.col("count") >= F.col("_cut"))
    return [r[0] for r in hot.select(key).collect()]


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: `small` replicated `salt` times (explode
    of a literal range — JVM-side), `large` salted deterministically by
    hashing a second column-independent term, join on (key, salt)."""
    small_rep = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    # The salt must be DETERMINISTIC per row content: task retries (routine
    # at 1000-executor scale) re-evaluate the expression, and a retry that
    # re-salts rows differently can duplicate/drop join output after partial
    # stage retries. Hashing all columns reproduces the same salt per row;
    # fully duplicate rows share a salt bucket, which only costs balance,
    # never correctness.
    large_salted = large.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(salt)).cast("int"),
    )
    out = large_salted.join(small_rep, [key, "_salt"], how)
    return out.drop("_salt")
