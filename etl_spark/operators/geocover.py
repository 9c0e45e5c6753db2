"""Literal geo covers (SURVEY §2.8 U2/U3): Amanatides–Woo linecover and the
hierarchical multi-zoom polygon cover with subtree pruning.

Reference semantics:

- **Linecover** (/root/reference/src/core/cellstring_utils.py:46-135, U2):
  walk a LineStringM's segments through the slippy grid at a zoom with
  Amanatides & Woo traversal (ties step y first), linearly interpolate the
  integer timestamp across each segment's cell run by CELL INDEX (first
  cell gets ts0, last gets ts1), and suppress consecutive duplicate cells
  across the whole line.
- **Polygon cover** (cellstring_utils.py:138-279, U3): classify bbox tiles
  at the coarsest zoom as FULLY / PARTIALLY / NOT contained; emit every
  intersecting tile at every level; descend only into PARTIALLY contained
  tiles (children of FULLY contained tiles are emitted without
  re-classification — the subtree prune, SURVEY P9); at the finest zoom
  emit any intersecting child.

Spark-first shape: both are per-trajectory / per-polygon pandas UDFs
(Arrow-batched) returning ``array<struct>`` that callers ``posexplode`` —
rows are independent, so there is NO shuffle in the operator itself; the
only exchange in a typical query is the upstream groupBy that assembles the
point sequence (which sessionization needs anyway). Inside the UDF the
work is numpy-vectorized per segment / per tile-batch, not per-cell Python.

Geometry without shapely: the container has no shapely (the reference uses
it via ``poly.contains/intersects``), so tile classification is
implemented directly, vectorized, for SIMPLE (non-self-intersecting) rings:

- point-in-polygon by ray casting (general, handles concave rings);
- segment-vs-box overlap by Liang–Barsky slab clipping;
- a tile intersects the ring iff (any tile corner inside) OR (any ring
  vertex inside the tile) OR (any ring edge overlaps the tile);
- FULLY contained iff all four corners are inside AND no ring edge
  overlaps the tile.

This matches shapely's ``contains``/``intersects`` decisions except on
boundary tangencies (measure-zero; the synthetic fixtures avoid them). A
second, independent classifier for CONVEX rings (separating-axis test) is
exported for differential tests, and ``naive_cover_ring`` (single-level
scan, no pruning) mirrors the reference's own hierarchical-vs-naive
differential (tests/test_transform_ls_to_cs.py:278-311).

Deviation noted: timestamp interpolation rounds with floor(x + 0.5) rather
than Python's banker's ``round`` so the DuckDB oracle can reproduce it
bit-for-bit; the two differ only at exact .5 midpoints.
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark.functions.geo import np_quadkey, np_tile_frac, np_tile_lat_deg

DEFAULT_ZOOMS = (13, 17, 21)

FULL, PARTIAL, NONE = 1, 2, 3  # reference Classification enum values


# ---------------------------------------------------------------------------
# Geometry primitives (numpy, vectorized)
# ---------------------------------------------------------------------------


def _ring_arrays(ring: Sequence[tuple[float, float]]) -> tuple[np.ndarray, ...]:
    """Ring vertices -> (vx, vy, wx, wy) edge endpoint arrays (closed)."""
    v = np.asarray(ring, dtype=np.float64)
    if len(v) >= 2 and (v[0] == v[-1]).all():
        v = v[:-1]
    w = np.roll(v, -1, axis=0)
    return v[:, 0], v[:, 1], w[:, 0], w[:, 1]


def _points_in_ring(
    px: np.ndarray, py: np.ndarray, ring: Sequence[tuple[float, float]]
) -> np.ndarray:
    """Ray casting, vectorized over points x edges. Generic-position
    semantics (points on the boundary may land either way)."""
    vx, vy, wx, wy = _ring_arrays(ring)
    px = px[:, None]
    py = py[:, None]
    straddles = (vy[None, :] > py) != (wy[None, :] > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xs = (wx - vx)[None, :] * (py - vy[None, :]) / (wy - vy)[None, :] + vx[None, :]
    crosses = straddles & (px < xs)
    return (crosses.sum(axis=1) % 2).astype(bool)


def _edges_hit_boxes(
    ring: Sequence[tuple[float, float]],
    bx0: np.ndarray,
    by0: np.ndarray,
    bx1: np.ndarray,
    by1: np.ndarray,
) -> np.ndarray:
    """For each box, does ANY ring edge overlap it? Liang–Barsky slab clip
    of each edge against each box, vectorized edges x boxes."""
    vx, vy, wx, wy = _ring_arrays(ring)
    dx = (wx - vx)[:, None]
    dy = (wy - vy)[:, None]
    x0 = vx[:, None]
    y0 = vy[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        tx1 = (bx0[None, :] - x0) / dx
        tx2 = (bx1[None, :] - x0) / dx
        ty1 = (by0[None, :] - y0) / dy
        ty2 = (by1[None, :] - y0) / dy
    txmin = np.minimum(tx1, tx2)
    txmax = np.maximum(tx1, tx2)
    tymin = np.minimum(ty1, ty2)
    tymax = np.maximum(ty1, ty2)
    # dx == 0: the x-slab constrains nothing if x0 inside, excludes if not
    xin = (x0 >= bx0[None, :]) & (x0 <= bx1[None, :])
    txmin = np.where(dx == 0, np.where(xin, -np.inf, np.inf), txmin)
    txmax = np.where(dx == 0, np.where(xin, np.inf, -np.inf), txmax)
    yin = (y0 >= by0[None, :]) & (y0 <= by1[None, :])
    tymin = np.where(dy == 0, np.where(yin, -np.inf, np.inf), tymin)
    tymax = np.where(dy == 0, np.where(yin, np.inf, -np.inf), tymax)
    tlo = np.maximum(np.maximum(txmin, tymin), 0.0)
    thi = np.minimum(np.minimum(txmax, tymax), 1.0)
    return (tlo < thi).any(axis=0)


def _tile_boxes(
    tx: np.ndarray, ty: np.ndarray, zoom: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Tile (x, y) -> lon/lat box (west, south, east, north) — the
    reference's ``mercantile.bounds`` (degrees; y increases southwards)."""
    z2 = float(1 << zoom)
    west = tx / z2 * 360.0 - 180.0
    east = (tx + 1) / z2 * 360.0 - 180.0
    north = np_tile_lat_deg(ty, zoom)
    south = np_tile_lat_deg(ty + 1, zoom)
    return west, south, east, north


def classify_tiles(
    ring: Sequence[tuple[float, float]], tx: np.ndarray, ty: np.ndarray, zoom: int
) -> np.ndarray:
    """Classify tiles vs a simple ring: FULL / PARTIAL / NONE
    (reference ``classify_tile_containment``, cellstring_utils.py:138-162),
    vectorized over the tile batch."""
    tx = np.asarray(tx, dtype=np.int64)
    ty = np.asarray(ty, dtype=np.int64)
    west, south, east, north = _tile_boxes(tx, ty, zoom)
    cx = np.concatenate([west, east, west, east])
    cy = np.concatenate([south, south, north, north])
    corners_in = _points_in_ring(cx, cy, ring).reshape(4, -1)
    n_in = corners_in.sum(axis=0)
    edge_hit = _edges_hit_boxes(ring, west, south, east, north)
    vx, vy, _, _ = _ring_arrays(ring)
    vert_in = (
        (vx[:, None] >= west[None, :])
        & (vx[:, None] <= east[None, :])
        & (vy[:, None] >= south[None, :])
        & (vy[:, None] <= north[None, :])
    ).any(axis=0)
    out = np.full(len(tx), NONE, dtype=np.int8)
    intersects = (n_in > 0) | vert_in | edge_hit
    out[intersects] = PARTIAL
    out[(n_in == 4) & ~edge_hit] = FULL
    return out


def classify_tiles_convex(
    ring: Sequence[tuple[float, float]], tx: np.ndarray, ty: np.ndarray, zoom: int
) -> np.ndarray:
    """Independent classifier for CONVEX CCW rings via the separating-axis
    test — used by the differential tests to cross-check
    :func:`classify_tiles` with a disjoint algorithm."""
    tx = np.asarray(tx, dtype=np.int64)
    ty = np.asarray(ty, dtype=np.int64)
    west, south, east, north = _tile_boxes(tx, ty, zoom)
    vx, vy, wx, wy = _ring_arrays(ring)
    # inward normals for CCW ring: edge (v->w), normal (-(wy-vy), wx-vx)
    nx = -(wy - vy)
    ny = wx - vx
    d = nx * vx + ny * vy  # inside: nx*px + ny*py >= d
    cxs = np.stack([west, east, west, east])  # (4, B)
    cys = np.stack([south, south, north, north])
    # corner projections on each edge normal: (E, 4, B)
    proj = nx[:, None, None] * cxs[None] + ny[:, None, None] * cys[None]
    corner_inside = (proj > d[:, None, None]).all(axis=0)  # strict interior
    full = corner_inside.all(axis=0)
    # SAT separation: box axes, then edge normals
    pminx, pmaxx = vx.min(), vx.max()
    pminy, pmaxy = vy.min(), vy.max()
    sep = (pmaxx <= west) | (pminx >= east) | (pmaxy <= south) | (pminy >= north)
    pproj_min = (nx[:, None] * vx[None] + ny[:, None] * vy[None]).min(axis=1)
    pproj_max = (nx[:, None] * vx[None] + ny[:, None] * vy[None]).max(axis=1)
    bmin = proj.min(axis=1)
    bmax = proj.max(axis=1)
    sep |= ((bmin >= pproj_max[:, None]) | (bmax <= pproj_min[:, None])).any(axis=0)
    out = np.full(len(tx), NONE, dtype=np.int8)
    out[~sep] = PARTIAL
    out[full] = FULL
    return out


# ---------------------------------------------------------------------------
# Polygon cover (U3)
# ---------------------------------------------------------------------------


def _bbox_tiles(
    ring: Sequence[tuple[float, float]], zoom: int
) -> tuple[np.ndarray, np.ndarray]:
    """All tiles at ``zoom`` whose box intersects the ring's bbox — the
    reference's ``mercantile.tiles(*poly.bounds, zoom)`` seed set."""
    v = np.asarray(ring, dtype=np.float64)
    xf, yf = np_tile_frac(v[:, 0], v[:, 1], zoom)
    x0, x1 = int(np.floor(xf.min())), int(np.floor(xf.max()))
    y0, y1 = int(np.floor(yf.min())), int(np.floor(yf.max()))
    gx, gy = np.meshgrid(
        np.arange(x0, x1 + 1, dtype=np.int64),
        np.arange(y0, y1 + 1, dtype=np.int64),
        indexing="ij",
    )
    return gx.ravel(), gy.ravel()


def _children(tx: np.ndarray, ty: np.ndarray, dz: int) -> tuple[np.ndarray, np.ndarray]:
    """All descendants ``dz`` levels down of each tile (vectorized
    ``get_all_children_at_zoom``)."""
    k = 1 << dz
    off = np.arange(k, dtype=np.int64)
    ox, oy = np.meshgrid(off, off, indexing="ij")
    cx = (tx[:, None] << dz) + ox.ravel()[None, :]
    cy = (ty[:, None] << dz) + oy.ravel()[None, :]
    return cx.ravel(), cy.ravel()


def hierarchical_cover_ring(
    ring: Sequence[tuple[float, float]],
    zooms: Sequence[int] = DEFAULT_ZOOMS,
    classifier=classify_tiles,
) -> list[tuple[int, int]]:
    """Multi-zoom cover of a simple ring: ``[(zoom, quadkey), ...]`` —
    every intersecting tile at every zoom in ``zooms``, computed with the
    reference's fully-contained-subtree prune (process_z13/17/21_tiles)."""
    out: list[tuple[int, int]] = []
    tx, ty = _bbox_tiles(ring, zooms[0])
    cls = classifier(ring, tx, ty, zooms[0])
    full_x, full_y = tx[cls == FULL], ty[cls == FULL]
    part_x, part_y = tx[cls == PARTIAL], ty[cls == PARTIAL]
    hit = cls != NONE
    out.extend(
        (zooms[0], int(q)) for q in np.sort(np_quadkey(tx[hit], ty[hit], zooms[0]))
    )
    for lvl in range(1, len(zooms)):
        z, dz = zooms[lvl], zooms[lvl] - zooms[lvl - 1]
        # children of FULLY contained tiles: emitted WITHOUT re-classification
        fx, fy = _children(full_x, full_y, dz)
        px, py = _children(part_x, part_y, dz)
        cls = classifier(ring, px, py, z)
        if lvl < len(zooms) - 1:
            full_x = np.concatenate([fx, px[cls == FULL]])
            full_y = np.concatenate([fy, py[cls == FULL]])
            part_x, part_y = px[cls == PARTIAL], py[cls == PARTIAL]
        hit = cls != NONE
        qks = np.concatenate([np_quadkey(fx, fy, z), np_quadkey(px[hit], py[hit], z)])
        out.extend((z, int(q)) for q in np.sort(qks))
    return out


def naive_cover_ring(
    ring: Sequence[tuple[float, float]], zoom: int, classifier=classify_tiles
) -> list[int]:
    """Single-level cover with NO pruning: classify every bbox tile at
    ``zoom`` directly — the differential twin (reference
    tests/test_transform_ls_to_cs.py:278-311)."""
    tx, ty = _bbox_tiles(ring, zoom)
    cls = classifier(ring, tx, ty, zoom)
    hit = cls != NONE
    return [int(q) for q in np.sort(np_quadkey(tx[hit], ty[hit], zoom))]


_COVER_ENTRY = T.ArrayType(
    T.StructType(
        [
            T.StructField("zoom", T.IntegerType(), False),
            T.StructField("cell", T.LongType(), False),
        ]
    )
)


def polygon_cover(
    df: DataFrame, ring_col: str, zooms: Sequence[int] = DEFAULT_ZOOMS
) -> DataFrame:
    """U3 as a DataFrame op: ``ring_col`` is ``array<struct<lon,lat>>`` (a
    simple ring); appends ``cover: array<struct<zoom,cell>>``. Per-row
    independent pandas UDF — no shuffle; explode downstream as needed."""
    zs = tuple(int(z) for z in zooms)

    @F.pandas_udf(_COVER_ENTRY)
    def _cover(rings: pd.Series) -> pd.Series:
        out = []
        for ring in rings:
            pts = [(p["lon"], p["lat"]) for p in ring]
            out.append(
                [
                    {"zoom": z, "cell": c}
                    for z, c in hierarchical_cover_ring(pts, zs)
                ]
            )
        return pd.Series(out)

    return df.withColumn("cover", _cover(F.col(ring_col)))


# ---------------------------------------------------------------------------
# Linecover (U2): Amanatides–Woo traversal
# ---------------------------------------------------------------------------


def _segment_cells(
    x0f: float, y0f: float, x1f: float, y1f: float, zoom: int
) -> tuple[np.ndarray, np.ndarray]:
    """One segment's visited tile sequence (Amanatides–Woo), vectorized:
    collect every x- and y-boundary crossing with t < 1, sort by t (ties:
    y steps first, matching the reference's strict ``t_max_x < t_max_y``
    comparison), then cumulative-sum the steps from the start tile."""
    x, y = math.floor(x0f), math.floor(y0f)
    dx, dy = x1f - x0f, y1f - y0f
    xe, ye = math.floor(x1f), math.floor(y1f)
    if dx > 0:
        bx = np.arange(x + 1, xe + 1, dtype=np.float64)
    elif dx < 0:
        bx = np.arange(x, xe, -1, dtype=np.float64)
    else:
        bx = np.empty(0)
    if dy > 0:
        by = np.arange(y + 1, ye + 1, dtype=np.float64)
    elif dy < 0:
        by = np.arange(y, ye, -1, dtype=np.float64)
    else:
        by = np.empty(0)
    tx = (bx - x0f) / dx if len(bx) else bx
    ty = (by - y0f) / dy if len(by) else by
    # y crossings first so a stable sort breaks ties the reference's way
    ts = np.concatenate([ty, tx])
    stepx = np.concatenate(
        [np.zeros(len(ty), np.int64), np.full(len(tx), 1 if dx > 0 else -1, np.int64)]
    )
    stepy = np.concatenate(
        [np.full(len(ty), 1 if dy > 0 else -1, np.int64), np.zeros(len(tx), np.int64)]
    )
    keep = ts < 1.0
    order = np.argsort(ts[keep], kind="stable")
    cx = x + np.concatenate([[0], np.cumsum(stepx[keep][order])])
    cy = y + np.concatenate([[0], np.cumsum(stepy[keep][order])])
    return cx, cy


def _naive_segment_cells(
    x0f: float, y0f: float, x1f: float, y1f: float, zoom: int
) -> tuple[np.ndarray, np.ndarray]:
    """Differential twin: Liang–Barsky slab test of every bbox tile against
    the segment, ordered by entry parameter — an independent derivation of
    the same visited set for generic-position segments."""
    xlo, xhi = sorted((math.floor(x0f), math.floor(x1f)))
    ylo, yhi = sorted((math.floor(y0f), math.floor(y1f)))
    gx, gy = np.meshgrid(
        np.arange(xlo, xhi + 1, dtype=np.int64),
        np.arange(ylo, yhi + 1, dtype=np.int64),
        indexing="ij",
    )
    gx, gy = gx.ravel(), gy.ravel()
    dx, dy = x1f - x0f, y1f - y0f
    with np.errstate(divide="ignore", invalid="ignore"):
        tx1 = (gx - x0f) / dx
        tx2 = (gx + 1 - x0f) / dx
        ty1 = (gy - y0f) / dy
        ty2 = (gy + 1 - y0f) / dy
    txmin, txmax = np.minimum(tx1, tx2), np.maximum(tx1, tx2)
    tymin, tymax = np.minimum(ty1, ty2), np.maximum(ty1, ty2)
    if dx == 0:
        xin = gx == math.floor(x0f)
        txmin = np.where(xin, -np.inf, np.inf)
        txmax = np.where(xin, np.inf, -np.inf)
    if dy == 0:
        yin = gy == math.floor(y0f)
        tymin = np.where(yin, -np.inf, np.inf)
        tymax = np.where(yin, np.inf, -np.inf)
    tlo = np.maximum(np.maximum(txmin, tymin), 0.0)
    thi = np.minimum(np.minimum(txmax, tymax), 1.0)
    vis = tlo < thi
    order = np.argsort(tlo[vis], kind="stable")
    return gx[vis][order], gy[vis][order]


def linecover_points(
    pts: Iterable[tuple[float, float, int]],
    zoom: int = 21,
    segment_cells=_segment_cells,
) -> list[tuple[int, int]]:
    """Reference-faithful linecover of an ordered (lon, lat, ts_s) sequence
    (cellstring_utils.py:46-135): per segment, traverse; interpolate the
    integer timestamp by cell INDEX (floor(x+0.5) rounding — see module
    deviation note); suppress consecutive duplicate cells across the whole
    line; zero-length segments are skipped once any cell was emitted."""
    pts = list(pts)
    out: list[tuple[int, int]] = []
    prev_cell = None
    for i in range(len(pts) - 1):
        lon0, lat0, ts0 = pts[i]
        lon1, lat1, ts1 = pts[i + 1]
        x0f, y0f = np_tile_frac(np.array([lon0]), np.array([lat0]), zoom)
        x1f, y1f = np_tile_frac(np.array([lon1]), np.array([lat1]), zoom)
        x0f, y0f, x1f, y1f = float(x0f[0]), float(y0f[0]), float(x1f[0]), float(y1f[0])
        if x1f - x0f == 0 and y1f - y0f == 0 and prev_cell is not None:
            continue
        cx, cy = segment_cells(x0f, y0f, x1f, y1f, zoom)
        cells = np_quadkey(cx, cy, zoom)
        n = len(cells)
        if n == 1:
            if int(cells[0]) != prev_cell:
                out.append((int(cells[0]), int(ts0)))
                prev_cell = int(cells[0])
            continue
        prog = np.arange(n, dtype=np.float64) / (n - 1)
        tss = np.floor(ts0 + prog * (ts1 - ts0) + 0.5).astype(np.int64)
        for c, t in zip(cells.tolist(), tss.tolist()):
            if c != prev_cell:
                out.append((c, t))
                prev_cell = c
    return out


def linecover_track(
    lons: np.ndarray, lats: np.ndarray, tss: np.ndarray, zoom: int
) -> tuple[np.ndarray, np.ndarray]:
    """Whole-trajectory linecover in ONE numpy pass — the hot-path twin of
    :func:`linecover_points` (which walks segment-by-segment like the
    reference and is kept as the differential oracle; tests assert the two
    are identical on random tracks including degenerate segments).

    Vectorization: every boundary crossing of every segment becomes one
    row of a global crossing table (segment id, entry t, axis, step);
    a single lexsort orders crossings within segments (ties step y first,
    matching the reference's strict ``t_max_x < t_max_y``); per-segment
    cumulative sums of the steps reconstruct the visited tile sequence;
    timestamps interpolate by intra-segment cell index; suppression is a
    shifted-compare. Cost is ~25 array ops per TRAJECTORY instead of ~15
    per SEGMENT — ~100x less Python/numpy call overhead on long tracks.
    """
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    tss = np.asarray(tss, dtype=np.int64)
    if len(lons) < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    xf, yf = np_tile_frac(lons, lats, zoom)
    x0, x1 = xf[:-1], xf[1:]
    y0, y1 = yf[:-1], yf[1:]
    ts0, ts1 = tss[:-1], tss[1:]
    fx0 = np.floor(x0).astype(np.int64)
    fy0 = np.floor(y0).astype(np.int64)
    fx1 = np.floor(x1).astype(np.int64)
    fy1 = np.floor(y1).astype(np.int64)
    dx = x1 - x0
    dy = y1 - y0
    # zero-length segments emit nothing once any cell was emitted
    # (reference :85-86); only segment 0 can run with prev_cell unset
    live = (dx != 0) | (dy != 0)
    if len(live):
        live[0] = True
    (seg_ids,) = np.nonzero(live)
    S = len(seg_ids)
    kx = np.where(dx[seg_ids] != 0, np.abs(fx1 - fx0)[seg_ids], 0)
    ky = np.where(dy[seg_ids] != 0, np.abs(fy1 - fy0)[seg_ids], 0)

    def _crossings(k: np.ndarray, f0: np.ndarray, d: np.ndarray, p0: np.ndarray):
        """Per-crossing (local segment index, boundary t, step sign)."""
        tot = int(k.sum())
        loc = np.repeat(np.arange(S), k)
        off = np.arange(tot) - np.repeat(np.concatenate([[0], np.cumsum(k)[:-1]]), k)
        g = seg_ids[loc]
        pos = d[g] > 0
        # dx>0: boundaries f0+1+j ; dx<0: boundaries f0-j  (reference t_max
        # seeds abs(((1 if d>0 else 0) + tile - p0) / d) then steps by 1/|d|)
        b = np.where(pos, f0[g] + 1 + off, f0[g] - off).astype(np.float64)
        t = (b - p0[g]) / d[g]
        return loc, t, np.where(pos, 1, -1).astype(np.int64)

    locx, tx, sx = _crossings(kx, fx0, dx, x0)
    locy, ty, sy = _crossings(ky, fy0, dy, y0)
    loc = np.concatenate([locy, locx])
    t = np.concatenate([ty, tx])
    is_x = np.concatenate([np.zeros(len(ty), np.int8), np.ones(len(tx), np.int8)])
    stepx = np.concatenate([np.zeros(len(ty), np.int64), sx])
    stepy = np.concatenate([sy, np.zeros(len(tx), np.int64)])
    keep = t < 1.0
    loc, t, is_x, stepx, stepy = (a[keep] for a in (loc, t, is_x, stepx, stepy))
    order = np.lexsort((is_x, t, loc))  # per segment, by t, y first on ties
    loc, stepx, stepy = loc[order], stepx[order], stepy[order]
    k_seg = np.bincount(loc, minlength=S)  # kept crossings per live segment
    # per-segment-reset cumulative sums via global cumsum minus group base
    first = np.concatenate([[0], np.cumsum(k_seg)[:-1]])
    csx = np.cumsum(stepx)
    csy = np.cumsum(stepy)
    if len(csx):
        # empty trailing groups point past the end; clamp — repeat() drops
        # their (unused) base values anyway
        sf = np.minimum(first, len(csx) - 1)
        basex = np.repeat(csx[sf] - stepx[sf], k_seg)
        basey = np.repeat(csy[sf] - stepy[sf], k_seg)
    else:
        basex = np.zeros(0, np.int64)
        basey = np.zeros(0, np.int64)
    cellx_cross = fx0[seg_ids[loc]] + (csx - basex)
    celly_cross = fy0[seg_ids[loc]] + (csy - basey)
    # interleave: each live segment emits its start tile then its crossings
    n_cells = 1 + k_seg
    starts = np.concatenate([[0], np.cumsum(n_cells)[:-1]])
    N = int(n_cells.sum())
    cx = np.empty(N, np.int64)
    cy = np.empty(N, np.int64)
    cx[starts] = fx0[seg_ids]
    cy[starts] = fy0[seg_ids]
    cross_pos = starts[loc] + 1 + (np.arange(len(loc)) - first[loc])
    cx[cross_pos] = cellx_cross
    cy[cross_pos] = celly_cross
    # timestamp interpolation by intra-segment cell index
    seg_of_cell = np.repeat(np.arange(S), n_cells)
    idx = np.arange(N) - starts[seg_of_cell]
    g = seg_ids[seg_of_cell]
    n = n_cells[seg_of_cell]
    with np.errstate(invalid="ignore"):
        prog = idx / np.maximum(n - 1, 1)
    ts = np.where(
        n == 1,
        ts0[g],
        np.floor(ts0[g] + prog * (ts1[g] - ts0[g]) + 0.5).astype(np.int64),
    )
    cells = np_quadkey(cx, cy, zoom)
    dedup = np.empty(N, dtype=bool)
    if N:
        dedup[0] = True
        dedup[1:] = cells[1:] != cells[:-1]
    return cells[dedup], ts[dedup]


_LINECOVER_ENTRY = T.ArrayType(
    T.StructType(
        [
            T.StructField("cell", T.LongType(), False),
            T.StructField("ts_s", T.LongType(), False),
        ]
    )
)


def linecover(
    df: DataFrame, lons: str, lats: str, tss: str, zoom: int = 21
) -> DataFrame:
    """U2 as a DataFrame op: three parallel-array columns (ordered lons,
    lats, epoch-second ts) per trajectory row; appends
    ``cells: array<struct<cell,ts_s>>``. Parallel primitive arrays keep the
    Arrow transfer flat (no struct boxing); rows are independent — zero
    shuffle inside the operator."""
    z = int(zoom)

    @F.pandas_udf(_LINECOVER_ENTRY)
    def _cover(lon: pd.Series, lat: pd.Series, ts: pd.Series) -> pd.Series:
        out = []
        for lo, la, t in zip(lon, lat, ts):
            cells, tss_out = linecover_track(
                np.asarray(lo), np.asarray(la), np.asarray(t), z
            )
            out.append(
                [{"cell": int(c), "ts_s": int(s)} for c, s in zip(cells, tss_out)]
            )
        return pd.Series(out)

    return df.withColumn("cells", _cover(F.col(lons), F.col(lats), F.col(tss)))
