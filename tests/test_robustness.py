"""Edge cases and scale-shape robustness: empty inputs, degenerate
queries, a large single-name street group (grid-bucketed union-find must
stay near-linear), IVF ANN recall."""

import time

import numpy as np
import pyspark.sql.functions as F

from osm_pbf2json_spark.operators import ann
from osm_pbf2json_spark.operators.objects import objects
from osm_pbf2json_spark.operators.spatial import knn_join, pip_join_broadcast
from osm_pbf2json_spark.operators.streets import extract_streets
from tests.test_objects import make_tables


def test_objects_on_empty_tables(spark):
    t = make_tables(spark)
    assert objects(t, "amenity").count() == 0


def test_streets_no_matching_ways(spark):
    t = make_tables(spark, nodes=[(1, 1.0, 1.0, {})], ways=[(2, [1], {})])
    assert extract_streets(t.ways, t.nodes).count() == 0  # no name tag


def test_pip_join_empty_points(spark):
    pts = spark.createDataFrame([], "id long, lon double, lat double")
    sq = {"key": "A", "polygons": [[[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]]]}
    assert pip_join_broadcast(pts, [sq]).count() == 0


def test_knn_k_larger_than_dataset(spark):
    pts = spark.createDataFrame(
        [(1, 13.0, 52.0), (2, 13.1, 52.1)], "id long, lon double, lat double"
    )
    out = knn_join(pts, [(9, 13.05, 52.05)], k=10, res=9)
    assert out.count() == 2  # returns all available neighbors


def test_knn_duplicate_points_tiebreak(spark):
    pts = spark.createDataFrame(
        [(i, 13.0, 52.0) for i in range(5)], "id long, lon double, lat double"
    )
    out = knn_join(pts, [(9, 13.0, 52.0)], k=3, res=9)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in rows] == [0, 1, 2]  # id tiebreak


def test_large_single_name_group_is_fast(spark):
    """5k segments under ONE street name: the grid-bucketed union-find
    must stay near-linear (a naive O(k²) pair test would be 25M ops per
    task here and explode at planet scale)."""
    rng = np.random.Generator(np.random.PCG64(17))
    nodes = []
    ways = []
    nid = 1
    for i in range(5000):
        x = float(rng.uniform(0, 50))
        y = float(rng.uniform(0, 50))
        nodes.append((nid, y, x, {}))
        nodes.append((nid + 1, y + 0.001, x + 0.001, {}))
        ways.append((100000 + i, [nid, nid + 1], {"name": "Hauptstraße"}))
        nid += 2
    t = make_tables(spark, nodes=nodes, ways=ways)
    t0 = time.time()
    streets = extract_streets(t.ways, t.nodes).collect()
    elapsed = time.time() - t0
    assert sum(len(s["segments"]) for s in streets) == 5000
    assert elapsed < 60, f"clustering took {elapsed:.1f}s"


def test_ivf_ann_recall(spark):
    rng = np.random.Generator(np.random.PCG64(23))
    # clustered corpus so IVF cells are meaningful
    centers = rng.normal(size=(8, 16)) * 3
    vecs = np.vstack([c + rng.normal(size=(40, 16)) * 0.3 for c in centers])
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    )
    queries = [(qi, list(map(float, vecs[qi] + rng.normal(size=16) * 0.05))) for qi in (5, 100, 250)]
    exact = ann.cosine_topk_bruteforce(df, queries, k=5)
    ivf = ann.cosine_topk_ivf(df, queries, k=5, n_centroids=8, n_probe=3)
    ex = {(r["qid"], r["neighbor_id"]) for r in exact.collect()}
    iv = {(r["qid"], r["neighbor_id"]) for r in ivf.collect()}
    recall = len(ex & iv) / len(ex)
    assert recall >= 0.8, recall


def test_trunc_div100_matches_rust_i64_division():
    """osmpbfreader divides nanodegrees by 100 with Rust i64 semantics
    (truncate toward zero); Python // floors. Negative southern/western
    coordinates with non-default granularity/offset hit the difference."""
    from osm_pbf2json_spark.sources.pbf import _trunc_div100

    for v in [0, 1, 99, 100, 101, -1, -99, -100, -101, -524413001, 524413001]:
        q = abs(v) // 100  # truncation toward zero, exactly Rust's i64 `/`
        assert _trunc_div100(v) == (q if v >= 0 else -q)
