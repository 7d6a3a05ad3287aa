"""JSON-lines and GeoJSON sinks (S4-S8).

Reference: `/root/reference/src/lib/output.rs`. Shapes reproduced:

- objects:    {"id","type","tags",("lon","lat") | ("centroid","bounds"
              [,"coordinates"])} — tags key-sorted, centroid/bounds
              serialized as null when absent, coordinates omitted unless
              retained (items.rs:27-73)
- streets:    {"id","name"[,"boundary"],"length","loc":[lon,lat]}
              (output.rs:76-84; boundary omitted when None)
- boundaries: {"name","admin_level","bbox":{"sw":[lon,lat],"ne":[lon,lat]}}
              (output.rs:17-46)
- GeoJSON FeatureCollections for streets (MultiLineString, segments with
  <2 points dropped, whole street dropped if nothing remains —
  output.rs:121-158) and boundaries (MultiPolygon, output.rs:48-73).

Determinism: the reference's street `stroke` color is random
(output.rs:136-139); we derive it from the street id so runs are
reproducible — excluded from parity per FIXTURES.md.

Everything is built with `to_json` on JVM-side expressions — the sink
adds no Python work and no extra shuffle beyond the pipeline's own
ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def _json_str(c: Column) -> Column:
    """JSON-escape a string value (wraps in quotes)."""
    return F.to_json(F.struct(c.alias("v"))).substr(
        F.lit(6), F.length(F.to_json(F.struct(c.alias("v")))) - F.lit(6)
    )


def objects_json_lines(objects_df: DataFrame) -> DataFrame:
    """One JSON string per object row, reference field order
    (id, type, tags, then geo fields)."""
    tags_obj = F.concat(
        F.lit("{"),
        F.array_join(
            F.transform(
                F.array_sort(F.map_entries("tags")),
                lambda e: F.concat(_json_str(e.key), F.lit(":"), _json_str(e.value)),
            ),
            ",",
        ),
        F.lit("}"),
    )
    point_json = F.concat(
        F.lit('{"id":'),
        F.col("id").cast("string"),
        F.lit(',"type":"'),
        F.col("type"),
        F.lit('","tags":'),
        tags_obj,
        F.lit(',"lon":'),
        F.col("lon").cast("string"),
        F.lit(',"lat":'),
        F.col("lat").cast("string"),
        F.lit("}"),
    )
    centroid_json = F.when(
        F.col("centroid").isNotNull(),
        F.concat(
            F.lit('{"lat":'),
            F.col("centroid.lat").cast("string"),
            F.lit(',"lon":'),
            F.col("centroid.lon").cast("string"),
            F.lit("}"),
        ),
    ).otherwise(F.lit("null"))
    bounds_json = F.when(
        F.col("bounds").isNotNull(),
        F.concat(
            F.lit('{"e":'),
            F.col("bounds.e").cast("string"),
            F.lit(',"n":'),
            F.col("bounds.n").cast("string"),
            F.lit(',"s":'),
            F.col("bounds.s").cast("string"),
            F.lit(',"w":'),
            F.col("bounds.w").cast("string"),
            F.lit("}"),
        ),
    ).otherwise(F.lit("null"))
    coords_json = F.when(
        F.col("coordinates").isNotNull(),
        F.concat(
            F.lit(',"coordinates":['),
            F.array_join(
                F.transform(
                    "coordinates",
                    lambda c: F.concat(
                        F.lit("["),
                        c.lon.cast("string"),
                        F.lit(","),
                        c.lat.cast("string"),
                        F.lit("]"),
                    ),
                ),
                ",",
            ),
            F.lit("]"),
        ),
    ).otherwise(F.lit(""))
    shape_json = F.concat(
        F.lit('{"id":'),
        F.col("id").cast("string"),
        F.lit(',"type":"'),
        F.col("type"),
        F.lit('","tags":'),
        tags_obj,
        F.lit(',"centroid":'),
        centroid_json,
        F.lit(',"bounds":'),
        bounds_json,
        coords_json,
        F.lit("}"),
    )
    return objects_df.select(
        F.when(F.col("type") == "node", point_json).otherwise(shape_json).alias("value")
    )


def streets_json_lines(streets_df: DataFrame) -> DataFrame:
    boundary_part = F.when(
        F.col("boundary").isNotNull(),
        F.concat(F.lit(',"boundary":'), _json_str(F.col("boundary"))),
    ).otherwise(F.lit(""))
    return streets_df.select(
        F.concat(
            F.lit('{"id":'),
            F.col("id").cast("string"),
            F.lit(',"name":'),
            _json_str(F.col("name")),
            boundary_part,
            F.lit(',"length":'),
            F.col("length").cast("string"),
            F.lit(',"loc":['),
            F.col("loc_lon").cast("string"),
            F.lit(","),
            F.col("loc_lat").cast("string"),
            F.lit("]}"),
        ).alias("value")
    )


def boundaries_json_lines(boundaries_df: DataFrame) -> DataFrame:
    return boundaries_df.select(
        F.concat(
            F.lit('{"name":'),
            _json_str(F.col("name")),
            F.lit(',"admin_level":'),
            F.col("admin_level").cast("string"),
            F.lit(',"bbox":{"sw":['),
            F.col("sw_lon").cast("string"),
            F.lit(","),
            F.col("sw_lat").cast("string"),
            F.lit('],"ne":['),
            F.col("ne_lon").cast("string"),
            F.lit(","),
            F.col("ne_lat").cast("string"),
            F.lit("]}}"),
        ).alias("value")
    )


def streets_geojson_features(streets_df: DataFrame) -> DataFrame:
    """(value string): one GeoJSON Feature per street, built DISTRIBUTED
    (Arrow-batched) so a planet-scale export writes feature lines from
    executors; only the O(1) collection framing is driver-side. Row order
    is preserved, so an ordered input yields an ordered collection."""
    import json

    import pandas as pd

    def kernel(iterator):
        for pdf in iterator:
            vals = []
            for r in pdf.to_dict("records"):
                coords = [
                    [[c["lon"], c["lat"]] for c in s["coords"]]
                    for s in r["segments"]
                    if len(s["coords"]) >= 2
                ]
                if not coords:
                    continue  # whole street dropped (output.rs:125-132)
                props = {"name": r["name"]}
                sid = int(r["id"]) & 0xFFFFFF
                props["stroke"] = (
                    f"#{(sid >> 16) & 255:02X}{(sid >> 8) & 255:02X}{sid & 255:02X}"
                )
                if r["boundary"] is not None:
                    props["boundary"] = r["boundary"]
                vals.append(
                    json.dumps(
                        {
                            "type": "Feature",
                            "properties": props,
                            "geometry": {
                                "type": "MultiLineString",
                                "coordinates": coords,
                            },
                        }
                    )
                )
            yield pd.DataFrame({"value": vals})

    return streets_df.mapInPandas(kernel, "value string")


def boundaries_geojson_features(boundaries_df: DataFrame) -> DataFrame:
    """(value string): one GeoJSON Feature per boundary, built distributed."""
    import json

    import pandas as pd

    def kernel(iterator):
        for pdf in iterator:
            vals = []
            for r in pdf.to_dict("records"):
                coords = [
                    [[[c["lon"], c["lat"]] for c in ring] for ring in rings]
                    for rings in r["polygons"]
                ]
                vals.append(
                    json.dumps(
                        {
                            "type": "Feature",
                            "properties": {
                                "name": r["name"],
                                "admin_level": str(r["admin_level"]),
                            },
                            "geometry": {
                                "type": "MultiPolygon",
                                "coordinates": coords,
                            },
                        }
                    )
                )
            yield pd.DataFrame({"value": vals})

    return boundaries_df.mapInPandas(kernel, "value string")


def _feature_collection(feature_lines: list[str]) -> str:
    # byte-identical to json.dumps({"type": "FeatureCollection",
    # "features": [...]}) with default separators
    return (
        '{"type": "FeatureCollection", "features": ['
        + ", ".join(feature_lines)
        + "]}"
    )


def streets_geojson(streets_df: DataFrame) -> str:
    """FeatureCollection JSON string (reference single-writer sink,
    output.rs:121-158). Features build on executors; the driver only
    concatenates strings."""
    return _feature_collection(
        [r["value"] for r in streets_geojson_features(streets_df).collect()]
    )


def boundaries_geojson(boundaries_df: DataFrame) -> str:
    return _feature_collection(
        [r["value"] for r in boundaries_geojson_features(boundaries_df).collect()]
    )
