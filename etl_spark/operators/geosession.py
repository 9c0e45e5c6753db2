"""Literal U1: the reference's 5-phase AIS sessionization
(``process_single_mmsi``, /root/reference/src/core/points_to_ls_poly.py:51-240)
— per-key ordered points split into STOPS and TRAJECTORIES.

Faithful semantics, phase by phase:

1. parse (lon, lat, ts, sog) points;
2. linear scan: a point continues a CANDIDATE STOP when
   speed < 1 kn AND dt < 5400 s AND dist < 250 m (speed = SOG when
   present, else haversine dist/dt in knots); otherwise it continues a
   CANDIDATE TRAJECTORY — with the reference's exact edge rules:
   identical-timestamp points are skipped; points implying > 50 kn are
   dropped WITHOUT advancing the previous point; a > 1 h gap closes the
   current trajectory; each new segment starts with the CONNECTING point
   (the previous point, shared with the preceding segment); segments
   need >= 2 points to become candidates;
3. merge nearby candidate stops (gap < 3600 s AND running-centroid
   distance < 50 m — core/utils.py:67-113);
4. validate merged stops (>= 10 points, duration >= 600 s, MBR area
   <= 5 km²); INVALID stops dissolve into the candidate trajectories by
   exact endpoint equality (bridge / extend / prepend / standalone —
   ``try_merge_invalid_merged_stop_with_trajectories``), after a
   speed/gap sanity re-check of the stop's own legs;
5. validate trajectories (>= 10 points, ts_end > ts_start) and emit.

Geometry deviation (documented in SEMANTICS.md): the container has no
shapely, so a valid stop's polygon is its ENVELOPE (the reference's own
fallback when ``concave_hull`` degenerates, points_to_ls_poly.py:185-190);
the all-points-coincident case emits a +-1e-5 deg SQUARE where the
reference buffers a circle. Trajectories are LineStringM WKB with the
reference's junction-point duplication preserved (merged segments share
their connecting point, and ``len()`` counts it twice).

Spark shape: one ``applyInPandas`` over the key — the same primitive the
remapped sessionize (operators/sessionize.py) uses, because the scan is
inherently sequential per key. Per-leg motion uses scalar ``math`` (the
state machine consumes one leg at a time; numpy per-call overhead would
dominate at 1-2 us/leg). Keys are independent: one shuffle, then linear
work per key — the reference runs the same loop in a process pool.
"""

from __future__ import annotations

import math
from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark.functions.geo import (
    EARTH_RADIUS_M,
    KNOT_AS_MPS,
    wkb_linestring_m_bytes,
    wkb_polygon_bytes,
)

# thresholds — reference points_to_ls_poly.py:18-34
STOP_SOG_THRESHOLD = 1.0  # knots
STOP_DISTANCE_THRESHOLD = 250.0  # m
STOP_TIME_THRESHOLD = 5400.0  # s
MIN_STOP_POINTS = 10
MIN_STOP_DURATION = 600.0  # s
MERGE_DISTANCE_THRESHOLD = 50.0  # m
MERGE_TIME_THRESHOLD = 3600.0  # s
MAX_MBR_AREA = 5_000_000.0  # m²
STOP_POINT_BUFFER_DEG = 1e-5
TRAJ_MAX_SPEED_KN = 50.0
TRAJ_MAX_GAP_S = 3600.0
MIN_AIS_POINTS_IN_TRAJ = 10
MIN_POINTS_IN_SEGMENT = 2  # core/utils.py:7


def _hav_m(lon1: float, lat1: float, lon2: float, lat2: float) -> float:
    """Scalar haversine — the same expression tree as geo.haversine_m /
    np_haversine_m (multiplications, not pow) so all three paths agree."""
    rlon1, rlat1 = math.radians(lon1), math.radians(lat1)
    rlon2, rlat2 = math.radians(lon2), math.radians(lat2)
    sdlat = math.sin((rlat2 - rlat1) / 2.0)
    sdlon = math.sin((rlon2 - rlon1) / 2.0)
    a = sdlat * sdlat + math.cos(rlat1) * math.cos(rlat2) * sdlon * sdlon
    return EARTH_RADIUS_M * 2.0 * math.asin(math.sqrt(a))


def _motion(prev, cur) -> tuple[float, float, float]:
    """(dt_s, dist_m, speed_kn) between Coords — reference compute_motion
    (utils.py:44-49; inf when dt <= 0)."""
    dt = cur[2] - prev[2]
    dist = _hav_m(prev[0], prev[1], cur[0], cur[1])
    speed = (dist / dt / KNOT_AS_MPS) if dt > 0 else math.inf
    return dt, dist, speed


def _append_candidate(cands: list, seg: list) -> None:
    if len(seg) >= MIN_POINTS_IN_SEGMENT:
        cands.append(seg.copy())
    seg.clear()


def _merge_candidate_stops(stops: list[list]) -> list[list]:
    """Phase 3 (utils.py:67-113): fold a candidate stop into the running
    merged stop when start-to-end gap < 3600 s and centroid distance
    < 50 m (running (sum_x, sum_y, n) centroid — the P10 pattern)."""
    if not stops:
        return []
    merged = [stops[0].copy()]
    sx = sum(c[0] for c in merged[-1])
    sy = sum(c[1] for c in merged[-1])
    n = len(merged[-1])
    for cand in stops[1:]:
        cx = sum(c[0] for c in cand)
        cy = sum(c[1] for c in cand)
        cn = len(cand)
        dt = cand[0][2] - merged[-1][-1][2]
        dist = _hav_m(sx / n, sy / n, cx / cn, cy / cn)
        if dt < MERGE_TIME_THRESHOLD and dist < MERGE_DISTANCE_THRESHOLD:
            merged[-1].extend(cand)
            sx += cx
            sy += cy
            n += cn
        else:
            merged.append(cand.copy())
            sx, sy, n = cx, cy, cn
    return merged


def _mbr_area_m2(lons, lats) -> float:
    """Reference compute_mbr_area (utils.py:52-57): haversine width along
    the south edge x height along the west edge of the bounds."""
    minx, maxx = min(lons), max(lons)
    miny, maxy = min(lats), max(lats)
    return _hav_m(minx, miny, maxx, miny) * _hav_m(minx, miny, minx, maxy)


def _dissolve_invalid_stop(trajs: list[list], stop: list) -> None:
    """Phase 4.2 (utils.py:133-195): re-check the stop's own legs against
    trajectory sanity; then bridge / extend / prepend / standalone by EXACT
    endpoint equality, preserving the reference's junction duplication."""
    for c1, c2 in zip(stop, stop[1:]):
        dt, _, speed = _motion(c1, c2)
        if speed > TRAJ_MAX_SPEED_KN or dt > TRAJ_MAX_GAP_S:
            return
    before = after = None
    for i, tr in enumerate(trajs):
        if tr[-1] == stop[0]:
            before = i
        if tr[0] == stop[-1]:
            after = i
    if before is not None and after is not None and before != after:
        trajs[before] = trajs[before] + stop.copy() + trajs[after]
        # deviation (documented in SEMANTICS.md): the reference pops
        # ``before + 1`` when after < before (utils.py:180-184), which
        # removes an unrelated trajectory — or raises IndexError when
        # ``before`` is last — if earlier dissolutions left the list out of
        # temporal order. The in-place replacement above shifts no indices,
        # so popping ``after`` is always the correct removal.
        trajs.pop(after)
        return
    if before is not None:
        trajs[before].extend(stop)
        return
    if after is not None:
        trajs[after] = stop + trajs[after]
        return
    if len(stop) >= MIN_AIS_POINTS_IN_TRAJ:
        trajs.append(stop)


def process_track(
    lons: Sequence[float],
    lats: Sequence[float],
    tss: Sequence[float],
    sogs: Sequence[float | None] | None = None,
) -> tuple[list[tuple], list[tuple]]:
    """The full 5-phase scan for ONE key's ordered points. Returns
    (trajectories, stops) as (ts_start, ts_end, n_points, wkb) tuples."""
    def _sog_at(i: int) -> float | None:
        # NULL SOG arrives as NaN through the Arrow/pandas boundary; the
        # reference's `float(sog) if sog is not None else None` contract
        # means missing SOG must fall back to the computed average speed —
        # a NaN leaking through would make every stop comparison False and
        # silently suppress stop detection for that vessel
        if sogs is None:
            return None
        v = sogs[i]
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        return float(v)

    pts = [
        ((float(lo), float(la), float(t)), _sog_at(i))
        for i, (lo, la, t) in enumerate(zip(lons, lats, tss))
    ]
    prev = None
    cur_traj: list = []
    cur_stop: list = []
    cand_trajs: list[list] = []
    cand_stops: list[list] = []
    for coord, sog in pts:
        if prev is None:
            if sog is None or sog < STOP_SOG_THRESHOLD:
                cur_stop.append(coord)
            else:
                cur_traj.append(coord)
            prev = coord
            continue
        if coord[2] == prev[2]:
            continue  # identical timestamps
        dt, dist, avg_speed = _motion(prev, coord)
        speed = sog if sog is not None else avg_speed
        if (
            speed < STOP_SOG_THRESHOLD
            and dt < STOP_TIME_THRESHOLD
            and dist < STOP_DISTANCE_THRESHOLD
        ):
            if not cur_stop:
                cur_stop.append(prev)  # connecting point
            cur_stop.append(coord)
            _append_candidate(cand_trajs, cur_traj)
        else:
            if not cur_traj:
                cur_traj.append(prev)
            if avg_speed < TRAJ_MAX_SPEED_KN:
                if dt < TRAJ_MAX_GAP_S:
                    cur_traj.append(coord)
                else:
                    _append_candidate(cand_trajs, cur_traj)
            else:
                continue  # outlier: do NOT advance prev
            _append_candidate(cand_stops, cur_stop)
        prev = coord
    _append_candidate(cand_trajs, cur_traj)
    _append_candidate(cand_stops, cur_stop)

    stops_out: list[tuple] = []
    for stop in _merge_candidate_stops(cand_stops):
        ts0, ts1 = int(stop[0][2]), int(stop[-1][2])
        if len(stop) >= MIN_STOP_POINTS and ts1 - ts0 >= MIN_STOP_DURATION:
            lons_s = [c[0] for c in stop]
            lats_s = [c[1] for c in stop]
            minx, maxx = min(lons_s), max(lons_s)
            miny, maxy = min(lats_s), max(lats_s)
            if minx == maxx and miny == maxy:
                # all points coincident: the reference buffers the
                # centroid ~1e-5 deg; we emit the square (deviation)
                b = STOP_POINT_BUFFER_DEG
                minx, maxx, miny, maxy = minx - b, maxx + b, miny - b, maxy + b
            if minx == maxx or miny == maxy:
                # axis-aligned collinear points: shapely's envelope
                # degenerates to a LineString, which the reference never
                # emits — it falls through to dissolution (phase 4.2)
                pass
            elif _mbr_area_m2([minx, maxx], [miny, maxy]) <= MAX_MBR_AREA:
                ring = [(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy)]
                stops_out.append(
                    (ts0, ts1, len(stop), wkb_polygon_bytes(ring))
                )
                continue
        _dissolve_invalid_stop(cand_trajs, stop)

    trajs_out: list[tuple] = []
    for traj in cand_trajs:
        ts0, ts1 = int(traj[0][2]), int(traj[-1][2])
        if len(traj) >= MIN_AIS_POINTS_IN_TRAJ and ts1 > ts0:
            trajs_out.append(
                (ts0, ts1, len(traj), wkb_linestring_m_bytes(traj))
            )
    return trajs_out, stops_out


_SESSION_SCHEMA = T.StructType(
    [
        T.StructField("vessel_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("ts_start", T.LongType()),
        T.StructField("ts_end", T.LongType()),
        T.StructField("n_points", T.IntegerType()),
        T.StructField("geom", T.BinaryType()),
    ]
)


def geo_sessionize(
    df: DataFrame,
    key: str = "vessel_id",
    lon: str = "lon",
    lat: str = "lat",
    ts: str = "ts_s",
    sog: str | None = None,
) -> DataFrame:
    """U1 as a DataFrame op: per-key ordered points -> one row per emitted
    trajectory/stop with its WKB geometry. One shuffle (the groupBy), then
    per-key linear scans in parallel — the reference's process-pool map
    re-expressed as grouped-map pandas UDF (SURVEY §2.8 U1)."""
    cols = [key, lon, lat, ts] + ([sog] if sog else [])

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        # Spark delivers group rows in arbitrary partition order, and the
        # identical-timestamp rule keeps whichever duplicate arrives first
        # — sort with full tiebreak columns (stable mergesort, same
        # discipline as operators/sessionize.py) so the emitted geometry is
        # deterministic run to run
        pdf = pdf.sort_values([ts, lon, lat], kind="mergesort")
        trajs, stops = process_track(
            pdf[lon].to_numpy(),
            pdf[lat].to_numpy(),
            pdf[ts].to_numpy(),
            pdf[sog].tolist() if sog else None,
        )
        k = pdf[key].iloc[0]
        rows = [("traj", *t) for t in trajs] + [("stop", *s) for s in stops]
        return pd.DataFrame(
            [(k, kind, a, b, n, g) for kind, a, b, n, g in rows],
            columns=["vessel_id", "kind", "ts_start", "ts_end", "n_points", "geom"],
        )

    return (
        df.select(*cols)
        .groupBy(key)
        .applyInPandas(fn, schema=_SESSION_SCHEMA)
    )
