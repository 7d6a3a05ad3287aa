"""`streets()` pipeline — segment clustering into street entities.

Reference: `/root/reference/src/lib/mod.rs:159-184` + `streets.rs`.

Semantics preserved:
- pre-filter F5: highway ∈ {primary … pedestrian} × (name~<n> | name
  presence) (mod.rs:89-109); only ways participate (streets.rs:166-174);
- a segment is a way with ≥1 resolvable node (SegmentGeometry::new fails
  only on an empty coordinate set, streets.rs:119-123);
- connectivity = PADDED-BBOX OVERLAP (pad 0.002°, streets.rs:14,125-141),
  NOT exact geometric intersection (locked by streets.rs:401-408);
- street id = XOR of way ids (streets.rs:38-45); length = Σ bbox-diagonal
  (streets.rs:16-25); middle = mean-then-closest-point (geo.rs:256-274);
- boundary split: candidate boundaries by street-AABB ∩ boundary-AABB and
  exact segment×polygon intersection, then per-segment ownership by
  point-in-polygon on the segment's line centroid, fallback = first
  candidate (streets.rs:56-102). The reference's fallback order is R-tree
  internal; we define the deterministic order (admin_level, name,
  relation_id) — see SURVEY.md §4.

Spark shape: filter → J1 node join → shuffle once by street name →
applyInPandas(grid-bucketed union-find) → optional broadcast boundary
split (mapInPandas) → aggregates computed in the same grouped kernels.
Name groups distribute well; within a group the union-find pair test is
grid-bucketed so continent-wide common names ("Hauptstraße") stay
near-linear rather than O(k²).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from ..functions.filter_dsl import build_admin_groups, build_street_groups, compile_groups
from ..functions.geometry import (
    bbox_diag_length,
    line_centroid,
    linestring_intersects_polygon,
    midpoint,
    points_in_polygons,
)
from .boundaries import boundaries_from_closure
from .closure import EntityTables, closure
from .resolve import resolve_way_coords

RTREE_PADDING = 0.002  # streets.rs:14

SEGMENTS_T = "array<struct<way_id:bigint,coords:array<struct<lon:double,lat:double>>>>"
STREET_SCHEMA = (
    "id bigint, name string, boundary string, length double, "
    f"loc_lon double, loc_lat double, segments {SEGMENTS_T}"
)


def _union_find_clusters(swx, swy, nex, ney) -> np.ndarray:
    """Cluster ids for segments whose padded bboxes overlap (J6 edges).

    Grid-bucketed: each padded bbox registers in the ~0.02° cells it
    covers; only same-cell pairs are tested. Exact test reproduces
    streets.rs:125-141 (pad one side by 0.002°; symmetric).
    """
    n = len(swx)
    parent = np.arange(n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(i, j):
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[rj] = ri

    p = RTREE_PADDING
    cell = 0.02
    buckets: dict[tuple[int, int], list[int]] = {}
    for i in range(n):
        x0 = int(np.floor((swx[i] - p) / cell))
        x1 = int(np.floor((nex[i] + p) / cell))
        y0 = int(np.floor((swy[i] - p) / cell))
        y1 = int(np.floor((ney[i] + p) / cell))
        for cx in range(x0, x1 + 1):
            for cy in range(y0, y1 + 1):
                buckets.setdefault((cx, cy), []).append(i)
    for idx in buckets.values():
        if len(idx) < 2:
            continue
        ids = np.array(idx)
        a_swx, a_swy = swx[ids][:, None], swy[ids][:, None]
        a_nex, a_ney = nex[ids][:, None], ney[ids][:, None]
        hit = (
            (a_swx - p <= nex[ids][None, :])
            & (a_nex + p >= swx[ids][None, :])
            & (a_swy - p <= ney[ids][None, :])
            & (a_ney + p >= swy[ids][None, :])
        )
        ii, jj = np.nonzero(np.triu(hit, k=1))
        for a, b in zip(ids[ii], ids[jj]):
            union(a, b)
    return np.array([find(i) for i in range(n)])


def _street_row(name: str, boundary, seg_rows: list[dict]) -> dict:
    seg_rows = sorted(seg_rows, key=lambda s: s["way_id"])
    street_id = 0
    for s in seg_rows:
        street_id ^= int(s["way_id"])  # A3, streets.rs:38-45
    length = float(sum(bbox_diag_length(s["xy"]) for s in seg_rows))
    all_pts = np.vstack([s["xy"] for s in seg_rows])
    mid = midpoint(all_pts)
    return {
        "id": street_id,
        "name": name,
        "boundary": boundary,
        "length": length,
        "loc_lon": mid[0],
        "loc_lat": mid[1],
        "segments": [
            {
                "way_id": int(s["way_id"]),
                "coords": [{"lon": float(x), "lat": float(y)} for x, y in s["xy"]],
            }
            for s in seg_rows
        ],
    }


def _cluster_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map kernel: one street name → one row per connected
    component (A2)."""
    name = pdf["name"].iloc[0]
    segs = []
    for _, r in pdf.iterrows():
        xy = np.array([(c["lon"], c["lat"]) for c in r["coords"]], np.float64).reshape(
            -1, 2
        )
        if len(xy) == 0:
            continue  # SegmentGeometry::new fails on empty — dropped
        segs.append({"way_id": r["way_id"], "xy": xy})
    if not segs:
        return pd.DataFrame(
            columns=["id", "name", "boundary", "length", "loc_lon", "loc_lat", "segments"]
        )
    swx = np.array([s["xy"][:, 0].min() for s in segs])
    nex = np.array([s["xy"][:, 0].max() for s in segs])
    swy = np.array([s["xy"][:, 1].min() for s in segs])
    ney = np.array([s["xy"][:, 1].max() for s in segs])
    labels = _union_find_clusters(swx, swy, nex, ney)
    rows = []
    for lab in np.unique(labels):
        members = [s for s, l in zip(segs, labels) if l == lab]
        rows.append(_street_row(name, None, members))
    return pd.DataFrame(rows)


def extract_streets(ways_filtered: DataFrame, nodes: DataFrame) -> DataFrame:
    """F5-filtered ways + nodes → street rows (one per component)."""
    named = ways_filtered.select(
        "id", F.col("tags").getItem("name").alias("name"), "refs"
    ).filter(F.col("name").isNotNull())
    coords = resolve_way_coords(named, nodes)
    seg_input = named.select(F.col("id").alias("way_id"), "name").join(
        coords.select(F.col("id").alias("way_id"), "coords"), "way_id"
    )
    return seg_input.groupBy("name").applyInPandas(_cluster_group, STREET_SCHEMA)


def _split_streets_factory(boundary_rows: list[dict]):
    """mapInPandas kernel factory: broadcast boundary list → split kernel.

    boundary_rows: [{name, admin_level, relation_id, sw_lon.., polygons}]
    sorted deterministically; polygons as nested lon/lat lists.
    """

    bnds = sorted(
        boundary_rows, key=lambda b: (b["admin_level"], b["name"], b["relation_id"])
    )
    polys = [
        [
            [np.array([(c["lon"], c["lat"]) for c in ring], np.float64) for ring in rings]
            for rings in b["polygons"]
        ]
        for b in bnds
    ]
    bb = np.array(
        [[b["sw_lon"], b["sw_lat"], b["ne_lon"], b["ne_lat"]] for b in bnds]
    ).reshape(-1, 4)

    def split(iterator):
        for pdf in iterator:
            out_rows = []
            for _, r in pdf.iterrows():
                segs = [
                    {
                        "way_id": s["way_id"],
                        "xy": np.array(
                            [(c["lon"], c["lat"]) for c in s["coords"]], np.float64
                        ).reshape(-1, 2),
                    }
                    for s in r["segments"]
                ]
                pts = np.vstack([s["xy"] for s in segs])
                sx0, sy0 = pts[:, 0].min(), pts[:, 1].min()
                sx1, sy1 = pts[:, 0].max(), pts[:, 1].max()
                # J3 probe: AABB overlap
                cand = [
                    k
                    for k in range(len(bnds))
                    if bb[k, 0] <= sx1
                    and bb[k, 2] >= sx0
                    and bb[k, 1] <= sy1
                    and bb[k, 3] >= sy0
                ]
                # J4 refine: any segment linestring intersects the multipolygon
                cand = [
                    k
                    for k in cand
                    if any(
                        linestring_intersects_polygon(s["xy"], polys[k]) for s in segs
                    )
                ]
                if not cand:
                    out_rows.append(r.to_dict())
                    continue
                groups: dict[str, list] = {}
                for s in segs:
                    c = line_centroid(s["xy"])
                    owner = None
                    for k in cand:  # J5 ownership, first match
                        if points_in_polygons(np.array([c]), polys[k])[0]:
                            owner = k
                            break
                    if owner is None:
                        owner = cand[0]  # J7 fallback
                    groups.setdefault(bnds[owner]["name"], []).append(s)
                for bname, members in groups.items():
                    out_rows.append(_street_row(r["name"], bname, members))
            yield pd.DataFrame(out_rows)[
                ["id", "name", "boundary", "length", "loc_lon", "loc_lat", "segments"]
            ] if out_rows else pd.DataFrame(
                columns=["id", "name", "boundary", "length", "loc_lon", "loc_lat", "segments"]
            )

    return split


def streets(
    tables: EntityTables,
    name: str | None = None,
    boundary: int | None = None,
) -> DataFrame:
    """Full pipeline (mod.rs:159-184). `boundary` = admin level to split by."""
    pred = compile_groups(build_street_groups(name))
    closed = closure(tables, pred)
    # extract_streets consumes EVERY named way present in the closure —
    # including dependency ways pulled in as members of a pred-matched
    # relation (streets.rs:166-193 iterates all objs, not re-filtered).
    result = extract_streets(closed.ways, closed.nodes)
    if boundary is None:
        return result.orderBy("name", "id")
    admin_pred = compile_groups(build_admin_groups([boundary]))
    admin_closed = closure(tables, admin_pred)
    brows = [r.asDict(recursive=True) for r in boundaries_from_closure(admin_closed).collect()]
    split = result.mapInPandas(_split_streets_factory(brows), STREET_SCHEMA)
    return split.orderBy("name", "boundary", "id")
