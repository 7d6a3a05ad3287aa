"""Coordinate resolution: J1 (way→node join) and J2 (recursive relations).

Reference: way resolution `/root/reference/src/lib/mod.rs:36-47` (ordered,
missing refs silently dropped), relation resolution `mod.rs:49-75`
(DFS over members with cycle guard, convex hull applied at every nesting
level).

Spark shape (scale-first):
- J1 is `posexplode(refs)` → hash equi-join against nodes on id →
  `groupBy(way_id)` + `array_sort(collect_list(struct(pos,lon,lat)))`.
  The join is the engine's hottest shuffle at 100 TB: node refs are
  skewed (mega-junction nodes), so AQE skew-join stays on and callers can
  pre-repartition; the aggregation is partial (map-side combine) because
  collect_list groups by the exploded way_id which the join already
  co-located.
- J2 runs bounded driver-side rounds (max relation nesting depth, ≤ a few
  in OSM), each round a join of unresolved relations against the
  already-resolved pool. Cycles are broken by treating intra-cycle member
  edges as empty (deterministic; reference behavior is traversal-order
  dependent — see SURVEY.md §4 determinism notes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from ..functions.geometry import compound_coordinates
from .closure import _pin

COORD_ARR = "array<struct<lon:double,lat:double>>"


def resolve_way_coords(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """J1: (way id, refs) → ordered coords, dropping refs with no node.

    Returns DataFrame(id BIGINT, coords ARRAY<STRUCT<lon,lat>>).
    Ways whose refs all miss resolve to an empty array (reference yields an
    empty coordinate vec, mod.rs:36-47); ways with empty refs likewise.
    """
    exploded = ways.select("id", F.posexplode_outer("refs").alias("pos", "ref"))
    joined = exploded.join(
        nodes.select(F.col("id").alias("ref"), "lon", "lat"), "ref", "inner"
    )
    resolved = joined.groupBy("id").agg(
        F.array_sort(F.collect_list(F.struct("pos", "lon", "lat"))).alias("pcoords")
    )
    # left join back so ways with zero resolvable refs keep an empty array
    return ways.select("id").join(resolved, "id", "left").select(
        "id",
        F.coalesce(
            F.transform("pcoords", lambda s: F.struct(s.lon.alias("lon"), s.lat.alias("lat"))),
            F.array().cast(COORD_ARR),
        ).alias("coords"),
    )


def resolve_relation_coords(
    relations: DataFrame,
    way_coords: DataFrame,
    nodes: DataFrame,
    max_rounds: int = 16,
) -> DataFrame:
    """J2: resolve every relation in `relations` to its compound (hull)
    coordinates, bottom-up over nesting levels.

    `relations` must already be the dependency-closure set (all member
    relations present). Returns DataFrame(id, coords ARRAY<STRUCT<lon,lat>>).
    """
    spark = relations.sparkSession
    members = relations.select(
        "id", F.posexplode_outer("members").alias("pos", "m")
    ).select("id", "pos", "m.mtype", "m.mid")

    # node + way member coordinates resolve in one shot
    node_part = (
        members.filter(F.col("mtype") == "node")
        .join(nodes.select(F.col("id").alias("mid"), "lon", "lat"), "mid", "inner")
        .select("id", "pos", F.array(F.struct("lon", "lat")).alias("mcoords"))
    )
    way_part = (
        members.filter(F.col("mtype") == "way")
        .join(
            way_coords.select(F.col("id").alias("mid"), F.col("coords").alias("mcoords")),
            "mid",
            "inner",
        )
        .select("id", "pos", "mcoords")
    )
    static_parts = _pin(node_part.unionByName(way_part))

    rel_members = _pin(
        members.filter(F.col("mtype") == "relation")
        .select("id", "pos", F.col("mid").alias("child"))
    )

    # Level assignment is DISTRIBUTED — an anti-join fixpoint over the
    # relation→relation edge list (never over nodes/ways, and never a
    # driver collect: the planet has ~10⁷ relations, which is edge-list
    # driver-OOM territory). Each round: relations with no edge to a
    # still-unassigned child (that exists in the input set) become
    # `ready` at the current level. Rounds are bounded by nesting depth.
    all_ids = _pin(relations.select("id").distinct())
    # only edges to children that are actually present can block
    real_edges = _pin(
        rel_members.select("id", "child")
        .distinct()
        .join(all_ids.select(F.col("id").alias("child")), "child", "left_semi")
    )
    remaining = all_ids
    levels_df = spark.createDataFrame([], "id long, level int")
    n_levels = 0
    for level in range(max_rounds):
        if remaining.isEmpty():
            break
        blocked = (
            real_edges.join(
                remaining.select(F.col("id").alias("child")), "child", "left_semi"
            )
            .select("id")
            .distinct()
        )
        ready = _pin(remaining.join(blocked, "id", "left_anti"))
        if ready.isEmpty():
            break  # every remaining relation sits in a cycle
        levels_df = levels_df.unionByName(
            ready.withColumn("level", F.lit(level))
        )
        remaining = _pin(remaining.join(ready, "id", "left_anti"))
        n_levels = level + 1
    # cycle guard: everything still remaining resolves in one final level;
    # intra-cycle child edges find no earlier-resolved child and thus
    # contribute nothing (deterministic, matches SURVEY.md §4 notes)
    if not remaining.isEmpty():
        levels_df = levels_df.unionByName(
            remaining.withColumn("level", F.lit(n_levels))
        )
        n_levels += 1
    levels_df = _pin(levels_df)

    hull_udf = F.pandas_udf(_hull_series, COORD_ARR)

    resolved: DataFrame | None = None
    for level in range(n_levels):
        this_ids = levels_df.filter(F.col("level") == level).select("id")
        if level == 0:
            child_part = spark.createDataFrame([], "id long, pos int, mcoords " + COORD_ARR)
        else:
            child_part = rel_members.join(
                resolved.select(F.col("id").alias("child"), F.col("coords").alias("mcoords")),
                "child",
                "inner",
            ).select("id", "pos", "mcoords")
        parts = static_parts.unionByName(child_part).join(this_ids, "id", "left_semi")
        lvl = (
            parts.groupBy("id")
            .agg(
                F.flatten(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "mcoords"))),
                        lambda s: s.mcoords,
                    )
                ).alias("flat")
            )
            .join(this_ids, "id", "right")
            .select(
                "id",
                F.coalesce("flat", F.array().cast(COORD_ARR)).alias("flat"),
            )
            .select(
                "id",
                hull_udf(F.col("flat.lon"), F.col("flat.lat")).alias("coords"),
            )
        )
        resolved = _pin(lvl if resolved is None else resolved.unionByName(lvl))

    if resolved is None:
        return spark.createDataFrame([], "id long, coords " + COORD_ARR)
    return resolved


def _hull_series(lons: pd.Series, lats: pd.Series) -> pd.Series:
    """Arrow-batched hull: one hull per relation's flattened member
    coords. Input arrives as two parallel double arrays (extracted from
    the struct array JVM-side), so marshaling is a zero-copy
    np.column_stack — no per-point dict access; only the hull's own
    monotone chain is per-row."""
    out = []
    for lo, la in zip(lons, lats):
        if lo is None or len(lo) == 0:
            out.append([])
            continue
        pts = np.column_stack(
            [np.asarray(lo, np.float64), np.asarray(la, np.float64)]
        )
        out.append([{"lon": x, "lat": y} for x, y in compound_coordinates(pts)])
    return pd.Series(out)
