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

from .closure import _pin

COORD_ARR = "array<struct<lon:double,lat:double>>"


def resolve_way_coords(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """J1: (way id, refs) → ordered coords, dropping refs with no node.

    Returns DataFrame(id BIGINT, coords ARRAY<STRUCT<lon,lat>>).
    Ways whose refs all miss resolve to an empty array (reference yields an
    empty coordinate vec, mod.rs:36-47); ways with empty refs likewise.
    """
    # LEFT join + null-skipping collect: the outer explode keeps one row
    # per way even for empty refs, and unresolved refs collect as NULL
    # entries that collect_list drops — so every way id reaches the
    # aggregation and ways with zero resolvable refs come out with an
    # empty array directly. (The previous formulation inner-joined and
    # then LEFT-joined the result back onto the way-id list: one more
    # full shuffle of the hottest join's output for the same rows.)
    exploded = ways.select("id", F.posexplode_outer("refs").alias("pos", "ref"))
    joined = exploded.join(
        nodes.select(F.col("id").alias("ref"), "lon", "lat"), "ref", "left"
    )
    return joined.groupBy("id").agg(
        F.array_sort(
            F.collect_list(
                F.when(F.col("lon").isNotNull(), F.struct("pos", "lon", "lat"))
            )
        ).alias("pcoords")
    ).select(
        "id",
        F.transform(
            "pcoords", lambda s: F.struct(s.lon.alias("lon"), s.lat.alias("lat"))
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

    hull_udf = F.pandas_udf(
        _hull_batch, "struct<lons:array<double>,lats:array<double>>"
    )

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
                hull_udf(F.col("flat.lon"), F.col("flat.lat")).alias("h"),
            )
            .select(
                "id",
                F.transform(
                    F.arrays_zip(F.col("h.lons"), F.col("h.lats")),
                    lambda p: F.struct(
                        p["lons"].alias("lon"), p["lats"].alias("lat")
                    ),
                ).alias("coords"),
            )
        )
        resolved = _pin(lvl if resolved is None else resolved.unionByName(lvl))

    if resolved is None:
        return spark.createDataFrame([], "id long, coords " + COORD_ARR)
    return resolved


def _hull_chain(xs: list, ys: list) -> tuple[list, list]:
    """Andrew monotone chain over lexicographically sorted, deduped
    points — same stack rule, cross-product sign, and output ordering
    as functions.geometry.convex_hull (geo 0.14 shape), operating on
    plain Python floats (identical IEEE doubles)."""

    def half(idx_iter):
        out: list[int] = []
        for i in idx_iter:
            while len(out) >= 2:
                o, a = out[-2], out[-1]
                if (xs[a] - xs[o]) * (ys[i] - ys[o]) - (ys[a] - ys[o]) * (
                    xs[i] - xs[o]
                ) <= 0:
                    out.pop()
                else:
                    break
            out.append(i)
        return out

    lower = half(range(len(xs)))
    upper = half(range(len(xs) - 1, -1, -1))
    idx = lower[:-1] + upper[:-1] + [lower[0]]
    return [xs[i] for i in idx], [ys[i] for i in idx]


def _hull_batch(lons: pd.Series, lats: pd.Series) -> pd.DataFrame:
    """Arrow-batched hulls, offsets-based: ONE lexsort keyed
    (row, x, y) + one consecutive-dedup mask over every relation's
    flattened points replace the per-row sort/dedup/allocation; only
    the monotone-chain stack scan itself remains sequential (it is
    inherently a stack algorithm). Output is parallel lons/lats arrays
    — the public coords struct array is re-zipped JVM-side, so Python
    never builds per-point dicts. Trivial-hull shapes (0/1 point; 2-3
    points keep INPUT order, closed) match convex_hull exactly."""
    R = len(lons)
    counts = np.fromiter(
        (0 if lo is None else len(lo) for lo in lons), np.int64, R
    )
    out_x: list = [[]] * R
    out_y: list = [[]] * R
    for i in np.flatnonzero((counts > 0) & (counts < 4)).tolist():
        lo = np.asarray(lons.iloc[i], np.float64)
        la = np.asarray(lats.iloc[i], np.float64)
        if len(lo) == 1:
            out_x[i], out_y[i] = lo, la
        else:
            out_x[i] = np.concatenate([lo, lo[:1]])
            out_y[i] = np.concatenate([la, la[:1]])
    big = np.flatnonzero(counts >= 4)
    if len(big):
        fx = np.concatenate([np.asarray(lons.iloc[i], np.float64) for i in big])
        fy = np.concatenate([np.asarray(lats.iloc[i], np.float64) for i in big])
        row_of = np.repeat(np.arange(len(big)), counts[big])
        order = np.lexsort((fy, fx, row_of))
        sx, sy, sr = fx[order], fy[order], row_of[order]
        keep = np.concatenate(
            [[True], (sr[1:] != sr[:-1]) | (sx[1:] != sx[:-1]) | (sy[1:] != sy[:-1])]
        )
        sx, sy, sr = sx[keep], sy[keep], sr[keep]
        cuts = np.flatnonzero(np.concatenate([[True], sr[1:] != sr[:-1]]))
        ends = np.concatenate([cuts[1:], [len(sr)]])
        for s0, s1 in zip(cuts.tolist(), ends.tolist()):
            i = int(big[int(sr[s0])])
            xs = sx[s0:s1].tolist()
            ys = sy[s0:s1].tolist()
            if len(xs) == 1:
                out_x[i], out_y[i] = xs, ys
            elif len(xs) == 2:
                out_x[i] = [xs[0], xs[1], xs[0]]
                out_y[i] = [ys[0], ys[1], ys[0]]
            else:
                out_x[i], out_y[i] = _hull_chain(xs, ys)
    return pd.DataFrame({"lons": out_x, "lats": out_y})
