"""objects() end-to-end parity with the reference integration tests
(/root/reference/tests/integration_test.rs:16-44, doc test mod.rs:194-204)
and the relation-resolution goldens (mod.rs:250-436) rebuilt as tiny
DataFrames."""

import pytest

from osm_pbf2json_spark.operators.closure import EntityTables
from osm_pbf2json_spark.operators.objects import objects

NODE_SCHEMA = "id long, lat double, lon double, tags map<string,string>"
WAY_SCHEMA = "id long, refs array<long>, tags map<string,string>"
REL_SCHEMA = (
    "id long, members array<struct<mtype:string,mid:bigint,role:string>>, "
    "tags map<string,string>"
)


def make_tables(spark, nodes=(), ways=(), relations=()):
    return EntityTables(
        nodes=spark.createDataFrame(list(nodes), NODE_SCHEMA),
        ways=spark.createDataFrame(list(ways), WAY_SCHEMA),
        relations=spark.createDataFrame(list(relations), REL_SCHEMA),
    )


def test_find_fountains_or_townhalls(alexanderplatz):
    # integration_test.rs:16-32 → 4 objects, each (fountain ∧ tourism) ∨ townhall
    rows = objects(alexanderplatz, "amenity~fountain+tourism,amenity~townhall").collect()
    assert len(rows) == 4
    for r in rows:
        tags = r["tags"]
        assert (tags.get("amenity") == "fountain" and "tourism" in tags) or tags.get(
            "amenity"
        ) == "townhall"


def test_find_bike_parking_for_six(alexanderplatz):
    # integration_test.rs:34-44 → 14 objects
    rows = objects(alexanderplatz, "amenity~bicycle_parking+capacity~6").collect()
    assert len(rows) == 14


def test_cobblestone_highways(alexanderplatz):
    # doc test mod.rs:194-204 → 4 objects
    rows = objects(alexanderplatz, "surface~cobblestone+highway").collect()
    assert len(rows) == 4


def test_output_order_is_type_then_id(alexanderplatz):
    # O1: BTreeMap order — node < way < relation, then id (mod.rs:218)
    rows = objects(alexanderplatz, "amenity~fountain+tourism,amenity~townhall").collect()
    rank = {"node": 0, "way": 1, "relation": 2}
    keys = [(rank[r["type"]], r["id"]) for r in rows]
    assert keys == sorted(keys)


def test_node_geo_is_point(alexanderplatz):
    rows = objects(alexanderplatz, "amenity~fountain+tourism,amenity~townhall").collect()
    for r in rows:
        if r["type"] == "node":
            assert r["lon"] is not None and r["lat"] is not None
            assert r["centroid"] is None and r["bounds"] is None
        else:
            assert r["lon"] is None and r["lat"] is None


def test_way_geometry_golden(spark):
    """Way centroid/bounds from resolved nodes; missing refs dropped
    silently (mod.rs:36-47)."""
    t = make_tables(
        spark,
        nodes=[
            (1, 49.0, 5.0, {}),
            (2, 50.0, 6.0, {}),
            (3, 49.0, 7.0, {}),
        ],
        ways=[(10, [1, 2, 3, 999], {"highway": "residential"})],
    )
    row = objects(t, "highway").collect()[0]
    assert row["centroid"]["lon"] == pytest.approx(6.0, abs=1e-5)
    assert row["centroid"]["lat"] == pytest.approx(49.5, abs=1e-5)
    b = row["bounds"]
    assert (b["e"], b["n"], b["s"], b["w"]) == (7.0, 50.0, 49.0, 5.0)


def test_closed_way_polygon_centroid(spark):
    t = make_tables(
        spark,
        nodes=[(1, 49.0, 5.0, {}), (2, 50.0, 6.0, {}), (3, 49.0, 7.0, {})],
        ways=[(10, [1, 2, 3, 1], {"highway": "x"})],
    )
    row = objects(t, "highway").collect()[0]
    assert row["centroid"]["lat"] == pytest.approx(49.333333, abs=1e-5)


def test_relation_with_one_way_hull(spark):
    # mod.rs:309-337: closed triangle from one way member
    t = make_tables(
        spark,
        nodes=[(1, 50.0, 9.0, {}), (2, 51.0, 9.0, {}), (3, 51.0, 10.0, {})],
        ways=[(42, [1, 2, 3], {})],
        relations=[(43, [("way", 42, "something")], {"x": "y"})],
    )
    row = objects(t, "x", retain_coordinates=True).collect()[0]
    coords = [(c["lon"], c["lat"]) for c in row["coordinates"]]
    assert coords == [(9.0, 50.0), (9.0, 51.0), (10.0, 51.0), (9.0, 50.0)]


def test_relation_with_multiple_nodes_hull(spark):
    # mod.rs:352-386: interior node dropped, closed rectangle
    nodes = [
        (1, 52.0, 6.0, {}),
        (2, 50.0, 6.0, {}),
        (3, 50.0, 8.0, {}),
        (4, 52.0, 8.0, {}),
        (5, 51.0, 7.0, {}),
    ]
    members = [("node", i, "something") for i in (1, 2, 3, 4, 5)]
    t = make_tables(spark, nodes=nodes, relations=[(42, members, {"x": "y"})])
    row = objects(t, "x", retain_coordinates=True).collect()[0]
    coords = [(c["lon"], c["lat"]) for c in row["coordinates"]]
    assert coords == [
        (6.0, 50.0),
        (8.0, 50.0),
        (8.0, 52.0),
        (6.0, 52.0),
        (6.0, 50.0),
    ]


def test_nested_relations(spark):
    # mod.rs:388-414: parent hull over child hull + node
    t = make_tables(
        spark,
        nodes=[(1, 52.0, 6.0, {}), (2, 50.0, 6.0, {}), (43, 52.0, 8.0, {})],
        relations=[
            (42, [("node", 1, "s"), ("node", 2, "s")], {}),
            (44, [("relation", 42, "s"), ("node", 43, "s")], {"x": "y"}),
        ],
    )
    row = objects(t, "x", retain_coordinates=True).collect()[0]
    coords = [(c["lon"], c["lat"]) for c in row["coordinates"]]
    assert coords == [(6.0, 50.0), (8.0, 52.0), (6.0, 52.0), (6.0, 50.0)]


def test_nested_relation_cycle(spark):
    # mod.rs:416-435: cycle tolerated; root resolves to the node only
    t = make_tables(
        spark,
        nodes=[(43, 52.0, 8.0, {})],
        relations=[
            (42, [("relation", 44, "s")], {}),
            (44, [("relation", 42, "s"), ("node", 43, "s")], {"x": "y"}),
        ],
    )
    row = objects(t, "x", retain_coordinates=True).collect()[0]
    coords = [(c["lon"], c["lat"]) for c in row["coordinates"]]
    assert coords == [(8.0, 52.0)]


def test_way_with_no_resolvable_refs_has_null_geo(spark):
    # all refs missing → empty coordinate set → get_geo_info returns
    # (None, None) (geo.rs:339-346); row still emitted with null geometry
    t = make_tables(spark, ways=[(10, [991, 992], {"highway": "x"})])
    row = objects(t, "highway").collect()[0]
    assert row["centroid"] is None and row["bounds"] is None


def test_no_groups_returns_everything(spark):
    t = make_tables(
        spark,
        nodes=[(1, 49.0, 5.0, {"a": "b"}), (2, 50.0, 6.0, {})],
        ways=[(10, [1, 2], {})],
    )
    assert objects(t, None).count() == 3
