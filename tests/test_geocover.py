"""Literal geo covers (operators/geocover.py) — SURVEY §2.8 U2/U3 + P9.

Mirrors the reference's own test strategy (SURVEY §5 /
tests/test_transform_ls_to_cs.py): a hand-checkable golden cover, the
hierarchical-vs-naive differential (pruning must not change the cover), an
independent-algorithm cross-check (general ray-cast classifier vs convex
SAT classifier), the Amanatides–Woo-vs-Liang–Barsky traversal differential,
and the reference's linecover edge-case semantics (single-cell segments,
zero-length segment skip, cross-segment duplicate suppression, endpoint
timestamp interpolation).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_spark.functions.geo import np_quadkey, np_tile_frac
from etl_spark.operators import geocover as gc

# convex CCW ring off Skagen, ~1.2 x 1.5 km — spans many z17 tiles
CONVEX = [
    (10.5011, 57.2013),
    (10.5093, 57.2027),
    (10.5131, 57.2089),
    (10.5072, 57.2141),
    (10.4987, 57.2118),
    (10.4953, 57.2051),
]
# concave (L-shaped) simple ring, CCW
CONCAVE = [
    (10.5010, 57.2010),
    (10.5110, 57.2010),
    (10.5110, 57.2060),
    (10.5060, 57.2060),
    (10.5060, 57.2110),
    (10.5010, 57.2110),
]
# large ring (~0.15 deg) so the coarsest zoom has FULLY contained tiles
BIG = [
    (10.41, 57.11),
    (10.56, 57.13),
    (10.59, 57.24),
    (10.50, 57.31),
    (10.40, 57.27),
    (10.37, 57.17),
]


def test_traversal_matches_slab_clip_differential():
    rng = np.random.default_rng(42)
    for _ in range(300):
        x0, y0, x1, y1 = rng.uniform(100, 130, 4)
        a = gc._segment_cells(x0, y0, x1, y1, 17)
        b = gc._naive_segment_cells(x0, y0, x1, y1, 17)
        assert (a[0] == b[0]).all() and (a[1] == b[1]).all()


def test_traversal_axis_aligned_segments():
    # dx == 0 and dy == 0 paths (infinite t_max slabs in the reference)
    a = gc._segment_cells(100.5, 100.2, 100.5, 103.7, 17)
    assert (a[0] == 100).all() and list(a[1]) == [100, 101, 102, 103]
    a = gc._segment_cells(100.2, 100.5, 97.8, 100.5, 17)
    assert list(a[0]) == [100, 99, 98, 97] and (a[1] == 100).all()


def test_classifiers_agree_on_convex():
    for zoom in (15, 17):
        tx, ty = gc._bbox_tiles(CONVEX, zoom)
        g = gc.classify_tiles(CONVEX, tx, ty, zoom)
        c = gc.classify_tiles_convex(CONVEX, tx, ty, zoom)
        assert (g == c).all()
        if zoom == 17:  # z15 tiles are ring-sized: no FULL there
            assert (g == gc.FULL).any() and (g == gc.NONE).any()


def test_hierarchical_equals_naive_per_zoom():
    for ring, zooms in [
        (CONVEX, (13, 15, 17)),
        (CONVEX, (15, 17, 19)),
        (CONCAVE, (13, 15, 17)),
        (BIG, (12, 14, 16)),
    ]:
        h = gc.hierarchical_cover_ring(ring, zooms)
        for z in zooms:
            hz = sorted(c for zz, c in h if zz == z)
            assert hz == gc.naive_cover_ring(ring, z), (ring[0], z)


def test_hierarchical_prunes_full_subtrees():
    # BIG at (12,14,16): coarse level must have FULLY contained tiles, and
    # their subtrees must be emitted without re-classification — verify the
    # prune actually fires by checking coarse-level FULL tiles exist
    tx, ty = gc._bbox_tiles(BIG, 12)
    cls = gc.classify_tiles(BIG, tx, ty, 12)
    assert (cls == gc.FULL).any(), "fixture must exercise the subtree prune"


def test_hierarchical_with_convex_classifier_identical():
    # independent classifier, same cover — cross-algorithm differential
    a = gc.hierarchical_cover_ring(CONVEX, (13, 15, 17))
    b = gc.hierarchical_cover_ring(CONVEX, (13, 15, 17), classifier=gc.classify_tiles_convex)
    assert a == b


def test_golden_unit_square_cover():
    # ring = exact center 60% of the 4-tile block at zoom 1 in tile space:
    # covers all 4 tiles partially; at zoom 2 it misses the 4 outer corners
    # of the 4x4 grid. Hand-checkable via tile fractions.
    # tile (x,y) at z1 spans lon [-180,0)/[0,180) and mercator-lat halves.
    ring = [(-100.0, -60.0), (100.0, -60.0), (100.0, 60.0), (-100.0, 60.0)]
    cover = gc.hierarchical_cover_ring(ring, (1, 2))
    z1 = sorted(c for z, c in cover if z == 1)
    assert z1 == [0, 1, 2, 3]  # all four z1 tiles intersect
    z2 = sorted(c for z, c in cover if z == 2)
    # by hand: lat ±60 -> mercator y fractions 1.162 / 2.838 -> rows {1, 2};
    # lon ±100 -> x fractions 0.889 / 3.111 -> cols {0,1,2,3}. Quadkeys of
    # (x, 1) and (x, 2) for x in 0..3 (digit = 2*ybit + xbit, MSB first):
    assert z2 == [2, 3, 6, 7, 8, 9, 12, 13]


def test_linecover_reference_edge_semantics():
    z = 17
    # build lon/lat points whose tile cells we know: use inverse of
    # np_tile_frac on chosen fractions via searching lon for target xf
    def lonlat(xf, yf):
        lon = xf / (1 << z) * 360.0 - 180.0
        # invert mercator for yf
        n = math.pi * (1 - 2 * yf / (1 << z))
        lat = math.degrees(math.atan(math.sinh(n)))
        return lon, lat

    p0 = lonlat(100.3, 200.4)
    p1 = lonlat(100.7, 200.6)  # same cell
    p2 = lonlat(102.5, 200.6)  # two cells east
    pts = [(*p0, 1000), (*p1, 1100), (*p1, 1150), (*p2, 1300)]
    out = gc.linecover_points(pts, z)
    cells = [c for c, _ in out]
    # start cell emitted once (p0->p1 same cell; p1->p1 zero-length skipped)
    assert cells[0] == int(np_quadkey(np.array([100]), np.array([200]), z)[0])
    assert len(cells) == len(set(cells))  # consecutive dups suppressed
    assert cells == [
        int(np_quadkey(np.array([x]), np.array([200]), z)[0]) for x in (100, 101, 102)
    ]
    # endpoint interpolation: first cell of the 3-cell run keeps ts0=1150?
    # p1->p2 run enters at cell 100 (already emitted) so first NEW cell is
    # 101 with progress 1/2: ts = floor(1150 + 0.5*150 + .5) = 1225
    assert out[1] == (cells[1], 1225)
    assert out[2] == (cells[2], 1300)


def test_linecover_single_point_and_empty():
    assert gc.linecover_points([], 17) == []
    assert gc.linecover_points([(10.5, 57.2, 5)], 17) == []
    c, t = gc.linecover_track(np.array([10.5]), np.array([57.2]), np.array([5]), 17)
    assert len(c) == 0 and len(t) == 0


def test_linecover_track_matches_sequential():
    # the vectorized hot path must be bit-identical to the
    # reference-shaped segment-by-segment walk, including degenerate
    # zero-length segments (duplicate consecutive points) and leading dups
    rng = np.random.default_rng(3)
    for trial in range(40):
        n = int(rng.integers(2, 40))
        lons = 10.5 + rng.integers(0, 9001, n) / 300000.0
        lats = 57.2 + rng.integers(0, 9001, n) / 300000.0
        for j in rng.integers(1, n, size=3):
            lons[j] = lons[j - 1]
            lats[j] = lats[j - 1]
        tss = np.sort(rng.integers(1_700_000_000, 1_700_100_000, n))
        seq = gc.linecover_points(list(zip(lons, lats, tss)), 17)
        vc, vt = gc.linecover_track(lons, lats, tss, 17)
        assert seq == list(zip(vc.tolist(), vt.tolist())), trial
    pts = [(10.5, 57.2, 1), (10.5, 57.2, 5), (10.5, 57.2, 9), (10.51, 57.21, 100)]
    vc, vt = gc.linecover_track(
        np.array([p[0] for p in pts]),
        np.array([p[1] for p in pts]),
        np.array([p[2] for p in pts], dtype=np.int64),
        17,
    )
    assert gc.linecover_points(pts, 17) == list(zip(vc.tolist(), vt.tolist()))


def test_polygon_cover_operator(spark):
    df = spark.createDataFrame(
        [(1, [{"lon": p[0], "lat": p[1]} for p in CONVEX])],
        "poly_id int, ring array<struct<lon double, lat double>>",
    )
    out = (
        gc.polygon_cover(df, "ring", (13, 15, 17))
        .select("poly_id", F.explode("cover").alias("e"))
        .select("poly_id", "e.zoom", "e.cell")
        .collect()
    )
    want = gc.hierarchical_cover_ring(CONVEX, (13, 15, 17))
    assert sorted((r.zoom, r.cell) for r in out) == sorted(want)


def test_linecover_operator(spark):
    pts = [(10.5001, 57.2001, 1000), (10.5101, 57.2061, 1600), (10.5021, 57.2101, 2200)]
    df = spark.createDataFrame(
        [(7, [p[0] for p in pts], [p[1] for p in pts], [p[2] for p in pts])],
        "vessel_id int, lons array<double>, lats array<double>, tss array<long>",
    )
    out = (
        gc.linecover(df, "lons", "lats", "tss", zoom=17)
        .select(F.explode("cells").alias("e"))
        .select("e.cell", "e.ts_s")
        .collect()
    )
    want = gc.linecover_points(pts, 17)
    assert [(r.cell, r.ts_s) for r in out] == want
    assert len(want) > 4
