"""`objects()` pipeline — tag-filtered entity extraction with geometry.

Reference: `/root/reference/src/lib/mod.rs:206-248`. Output row per
matched entity: nodes carry (lon, lat); ways/relations carry centroid +
bounds (+ coordinates when retained). Dependency rows resolve geometry
but are re-filtered out of the output (mod.rs:220-222).

Spark shape: filter(F1 DNF) → closure(S2) → J1/J2 joins → Arrow-batched
geometry kernel → union → orderBy(type_rank, id) to reproduce the
BTreeMap output order (Node < Way < Relation, then id — mod.rs:218).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from ..functions.filter_dsl import Group, compile_groups, parse
from ..functions.geometry import geo_info
from .closure import EntityTables, closure
from .resolve import resolve_relation_coords, resolve_way_coords

GEO_SCHEMA = (
    "struct<centroid:struct<lat:double,lon:double>,"
    "bounds:struct<e:double,n:double,s:double,w:double>>"
)


def _geo_info_batch(coords: pd.Series) -> pd.DataFrame:
    """Vectorized shape→(centroid,bounds) over an Arrow batch of entities."""
    cents = []
    bnds = []
    for arr in coords:
        if arr is None or len(arr) == 0:
            cents.append(None)
            bnds.append(None)
            continue
        info = geo_info(np.array([(c["lon"], c["lat"]) for c in arr], np.float64))
        if info is None:
            cents.append(None)
            bnds.append(None)
        else:
            clon, clat, e, n, s, w = info
            cents.append({"lat": clat, "lon": clon})
            bnds.append({"e": e, "n": n, "s": s, "w": w})
    return pd.DataFrame({"centroid": cents, "bounds": bnds})


def _geo_info_udf():
    # created lazily: parsing the DDL return type needs an active session
    return F.pandas_udf(_geo_info_batch, GEO_SCHEMA)


def objects(
    tables: EntityTables,
    groups: list[Group] | str | None = None,
    retain_coordinates: bool = False,
) -> DataFrame:
    """Matched entities with computed geometry, ordered (type_rank, id).

    Output: id, type, tags, lon, lat, centroid, bounds[, coordinates].
    Node rows populate lon/lat; way/relation rows populate centroid/bounds
    (and coordinates when `retain_coordinates`).
    """
    if isinstance(groups, str):
        groups = parse(groups)
    pred: Column = compile_groups(groups) if groups is not None else F.lit(True)

    closed = closure(tables, pred)

    # re-filter (F8): only predicate matches are emitted
    out_nodes = closed.nodes.filter(pred)
    out_ways = closed.ways.filter(pred)
    out_rels = closed.relations.filter(pred)

    # pin: way coords feed both the way output branch and relation resolve
    from .closure import _pin

    way_coords = _pin(resolve_way_coords(closed.ways, closed.nodes))
    rel_coords = resolve_relation_coords(closed.relations, way_coords, closed.nodes)

    node_part = out_nodes.select(
        "id",
        F.lit("node").alias("type"),
        "tags",
        "lon",
        "lat",
        F.lit(None).cast(GEO_SCHEMA).alias("geo"),
        F.lit(None).cast("array<struct<lon:double,lat:double>>").alias("coordinates"),
    )

    def shape_part(out_df: DataFrame, coords_df: DataFrame, type_name: str) -> DataFrame:
        df = out_df.join(coords_df, "id", "left").select(
            "id",
            F.lit(type_name).alias("type"),
            "tags",
            F.lit(None).cast("double").alias("lon"),
            F.lit(None).cast("double").alias("lat"),
            _geo_info_udf()("coords").alias("geo"),
            (
                F.col("coords") if retain_coordinates else F.lit(None).cast(
                    "array<struct<lon:double,lat:double>>"
                )
            ).alias("coordinates"),
        )
        return df

    unioned = (
        node_part.withColumn("type_rank", F.lit(0))
        .unionByName(shape_part(out_ways, way_coords, "way").withColumn("type_rank", F.lit(1)))
        .unionByName(
            shape_part(out_rels, rel_coords, "relation").withColumn("type_rank", F.lit(2))
        )
    )
    return (
        unioned.orderBy("type_rank", "id")
        .select(
            "id",
            "type",
            "tags",
            "lon",
            "lat",
            F.col("geo.centroid").alias("centroid"),
            F.col("geo.bounds").alias("bounds"),
            "coordinates",
        )
    )
