"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": rows/sec, "unit": "rows/sec",
   "queries": {name: sec}, "sf": ...}

The headline metric is the flagship spatial-join + tile-assignment
throughput (BASELINE.json). Set SPARK_GRAFT_BENCH_QUERIES to a
comma-list to restrict.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from osm_pbf2json_spark.operators import dedup, spatial  # noqa: E402
from osm_pbf2json_spark.session import get_session  # noqa: E402


def flagship(spark, sf_dir):
    """PIP join + hex tile assignment + rollup over lineitem-derived points."""
    pts = E._points(spark, sf_dir)
    rows = [
        {"key": "A", "polygons": [[E.POLY_A + E.POLY_A[:1]]]},
        {"key": "B", "polygons": [[E.POLY_B + E.POLY_B[:1]]]},
    ]
    joined = spatial.pip_join_broadcast(pts, rows, out_col="polygon_key")
    tiled = spatial.point_tile(joined, res=9, grid="hex")
    return tiled.groupBy("polygon_key", "tile").agg(F.count("*").alias("n"))


BENCH_QUERIES = {
    "flagship_pip_tile": flagship,
    "j1_ordered_resolution": E.q_j1_ordered_resolution,
    "j6_bbox_self_join": E.q_j6_bbox_self_join,
    "knn": E.q_knn,
    "agg_pricing": E.q_agg_pricing,
    "minhash_lsh": lambda s, d: dedup.minhash_lsh_pairs(
        E._t(s, d, "documents"), threshold=0.35, num_perm=64, bands=16
    ),
    "ann_cosine_topk": E.q_ann_cosine_topk,
    "tile_histogram": E.q_tile_histogram,
}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    names = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    selected = names.split(",") if names else list(BENCH_QUERIES)
    spark = get_session(
        master=f"local[{cpus}]",
        app_name="osm-pbf2json-spark-bench",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    input_rows = E._t(spark, sf_dir, "lineitem").count()

    timings = {}
    for name in selected:
        fn = BENCH_QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        _ = n

    flagship_sec = timings.get("flagship_pip_tile")
    value = round(input_rows / flagship_sec, 1) if flagship_sec else 0.0
    print(
        json.dumps(
            {
                "metric": "spatial_join_tile_assign_rows_per_sec",
                "value": value,
                "unit": "rows/sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": int(cpus),
                "input_rows": input_rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
