"""Hypothesis property tests over the pure kernels (no Spark session):
grid invariants, ring stitching, split stability — the §5 test-strategy
layer that fixed goldens can't cover."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_pbf2json_spark.functions import tiles as T
from osm_pbf2json_spark.functions.geometry import points_in_polygons, stitch_rings

lonlat = st.tuples(
    st.floats(min_value=-179.9, max_value=179.9, allow_nan=False),
    st.floats(min_value=-89.9, max_value=89.9, allow_nan=False),
)


@settings(max_examples=100, deadline=None)
@given(lonlat, st.integers(min_value=2, max_value=20), st.integers(min_value=1, max_value=10))
def test_quad_parent_is_ancestor(pt, level, up):
    """parent(cell(p, L), L-k) == cell(p, L-k): the hierarchy commutes."""
    lon, lat = pt
    parent_level = max(0, level - up)
    child = T.quad_cell(np.array([lon]), np.array([lat]), level)
    direct = T.quad_cell(np.array([lon]), np.array([lat]), parent_level)
    via_parent = T.quad_parent(child, parent_level)
    assert int(via_parent[0]) == int(direct[0])
    assert int(T.quad_level(child)[0]) == level


@settings(max_examples=100, deadline=None)
@given(
    lonlat,
    st.lists(st.tuples(st.floats(0, 2.0), st.floats(0, 2.0)), min_size=1, max_size=20),
    st.integers(min_value=2, max_value=14),
)
def test_quad_covering_contains_member_points(base, offsets, level):
    """Every point inside a bbox maps to a cell of the bbox's exact-level
    covering (the invariant the cell equi-join plans rely on). The bbox
    is kept small (<=2 deg) so exact-level coverings stay test-sized."""
    lon0 = min(base[0], 177.0)
    lat0 = min(base[1], 87.0)
    arr = np.array([(lon0 + dx, lat0 + dy) for dx, dy in offsets], dtype=np.float64)
    cover = set(
        T.quad_covering_bbox(
            arr[:, 0].min(), arr[:, 1].min(), arr[:, 0].max(), arr[:, 1].max(),
            level, max_cells=None,
        ).tolist()
    )
    cells = T.quad_cell(arr[:, 0], arr[:, 1], level)
    assert set(cells.tolist()) <= cover


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_stitch_rings_recovers_shuffled_reversed_chunks(data):
    """Any closed ring cut into chunks, shuffled, with random chunks
    reversed, stitches back into exactly one closed ring with the same
    node-id cycle (admin.rs build_boundary semantics)."""
    n = data.draw(st.integers(min_value=4, max_value=24))
    node_ids = list(range(100, 100 + n))
    rng_seed = data.draw(st.integers(min_value=0, max_value=2**31))
    rng = np.random.Generator(np.random.PCG64(rng_seed))
    coords = {i: (float(rng.uniform(-10, 10)), float(rng.uniform(-10, 10))) for i in node_ids}
    cycle = node_ids + [node_ids[0]]
    # cut into 1..n chunks at sorted random positions
    n_cuts = data.draw(st.integers(min_value=0, max_value=min(5, n - 1)))
    cuts = sorted(set(data.draw(st.lists(st.integers(min_value=1, max_value=n - 1), min_size=n_cuts, max_size=n_cuts))))
    bounds = [0] + cuts + [n]
    chunks = [cycle[a : b + 1] for a, b in zip(bounds[:-1], bounds[1:])]
    order = list(rng.permutation(len(chunks)))
    ways_ids, ways_xy = [], []
    for ci in order:
        ids = chunks[ci]
        if data.draw(st.booleans()):
            ids = ids[::-1]
        ways_ids.append(list(ids))
        ways_xy.append(np.array([coords[i] for i in ids], dtype=np.float64))
    rings = stitch_rings(ways_ids, ways_xy)
    assert len(rings) == 1
    ring = rings[0]
    # same multiset of vertices, closed
    assert (ring[0] == ring[-1]).all()
    got = {tuple(p) for p in ring.tolist()}
    want = {coords[i] for i in node_ids}
    assert got == want


@settings(max_examples=100, deadline=None)
@given(lonlat, st.floats(min_value=-50, max_value=50), st.floats(min_value=-50, max_value=50))
def test_points_in_polygons_translation_invariant(pt, dx, dy):
    lon, lat = pt
    square = np.array([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)], dtype=np.float64)
    p = np.array([[lon % 8, lat % 8]])
    base = points_in_polygons(p, [[square]])[0]
    shifted = points_in_polygons(p + [dx, dy], [[square + [dx, dy]]])[0]
    assert base == shifted


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_hull_batch_matches_convex_hull(data):
    """_hull_batch (offsets-based batched lexsort + chain) is exactly
    convex_hull applied per row — including trivial shapes (0/1 pt,
    2-3 pts input-order closed), duplicate points, and collinear runs."""
    import pandas as pd

    from osm_pbf2json_spark.functions.geometry import convex_hull
    from osm_pbf2json_spark.operators.resolve import _hull_batch

    rows = data.draw(
        st.lists(
            st.lists(
                st.tuples(
                    st.integers(min_value=-5, max_value=5),
                    st.integers(min_value=-5, max_value=5),
                ),
                min_size=0,
                max_size=20,
            ),
            min_size=1,
            max_size=8,
        )
    )
    lons = pd.Series([np.array([float(x) for x, _ in r]) for r in rows])
    lats = pd.Series([np.array([float(y) for _, y in r]) for r in rows])
    out = _hull_batch(lons, lats)
    for i, r in enumerate(rows):
        want = convex_hull(np.array(r, np.float64).reshape(-1, 2))
        got = np.column_stack(
            [np.asarray(out["lons"][i], np.float64), np.asarray(out["lats"][i], np.float64)]
        ) if len(out["lons"][i]) else np.empty((0, 2))
        assert got.shape == want.reshape(-1, 2).shape, (i, got, want)
        assert (got == want.reshape(-1, 2)).all(), (i, got, want)


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_covering_bbox_batch_matches_scalar(data):
    """hex/quad batched bbox coverings are element-exact vs the scalar
    kernels for every bbox in the batch."""
    from osm_pbf2json_spark.functions import tiles as T

    boxes = data.draw(
        st.lists(
            st.tuples(
                st.floats(min_value=-50, max_value=50),
                st.floats(min_value=-50, max_value=50),
                st.floats(min_value=0, max_value=3),
                st.floats(min_value=0, max_value=3),
            ),
            min_size=1,
            max_size=6,
        )
    )
    xmin = np.array([b[0] for b in boxes])
    ymin = np.array([b[1] for b in boxes])
    xmax = xmin + np.array([b[2] for b in boxes])
    ymax = ymin + np.array([b[3] for b in boxes])
    hb = T.hex_covering_bbox_batch(xmin, ymin, xmax, ymax, 7)
    qb = T.quad_covering_bbox_batch(xmin, ymin, xmax, ymax, 10)
    for j in range(len(boxes)):
        hw = T.hex_covering_bbox(xmin[j], ymin[j], xmax[j], ymax[j], 7)
        qw = T.quad_covering_bbox(xmin[j], ymin[j], xmax[j], ymax[j], 10, max_cells=None)
        assert (hb[j] == hw).all(), j
        assert (qb[j] == qw).all(), j
