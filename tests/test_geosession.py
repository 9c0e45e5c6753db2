"""Literal U1 sessionization (operators/geosession.py) — reference
``process_single_mmsi`` semantics (points_to_ls_poly.py:51-240).

Each phase's edge rules get a targeted fixture: stop/traj split thresholds,
identical-timestamp skip, >50 kn outlier skip (prev NOT advanced), >1 h gap
split, connecting-point sharing, stop merging (time + centroid distance),
MBR-area invalidation, invalid-stop dissolution (bridge / extend /
standalone), the coincident-point buffer, and the WKB byte layouts.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from etl_spark.functions.geo import wkb_linestring_m_bytes, wkb_polygon_bytes
from etl_spark.operators import geosession as gs

LAT = 57.2
# ~1 deg lon at 57.2N is ~60.3 km: meters -> degrees east
M2DEG = 1.0 / 60340.0


def _track(specs):
    """Build (lons, lats, tss) from (dist_m_east, dt_s) or
    (dist_m_east, dist_m_north, dt_s) step specs."""
    lons, lats, tss = [10.5], [LAT], [1_000_000]
    for spec in specs:
        de, dn, dt = spec if len(spec) == 3 else (spec[0], 0.0, spec[1])
        lons.append(lons[-1] + de * M2DEG)
        lats.append(lats[-1] + dn / 111_360.0)
        tss.append(tss[-1] + dt)
    return lons, lats, tss


# a slow 2-D wiggle: alternating (35 E, 30 N) / (35 E, -30 N) ~ 46 m legs,
# ~0.3 kn at 300 s — a valid non-degenerate stop walk
STOP_LEG = [(35, 30, 300), (35, -30, 300)]


def test_pure_trajectory():
    # 12 fast legs (500 m / 300 s ~ 3.2 kn) -> one 13-point trajectory
    lons, lats, tss = _track([(500, 300)] * 12)
    trajs, stops = gs.process_track(lons, lats, tss)
    assert stops == []
    assert len(trajs) == 1
    ts0, ts1, n, wkb = trajs[0]
    assert (ts0, ts1, n) == (1_000_000, 1_000_000 + 12 * 300, 13)
    assert len(wkb) == 9 + 24 * 13


def test_pure_stop_envelope():
    # 12 slow 2-D legs (~46 m / 300 s ~ 0.3 kn) -> one 13-point stop
    lons, lats, tss = _track(STOP_LEG * 6)
    trajs, stops = gs.process_track(lons, lats, tss)
    assert trajs == []
    assert len(stops) == 1
    ts0, ts1, n, wkb = stops[0]
    assert n == 13 and ts1 - ts0 == 3600
    order, gtype, nrings, npts = struct.unpack("<BIII", wkb[:13])
    assert (order, gtype, nrings, npts) == (1, 3, 1, 5)
    assert len(wkb) == 13 + 16 * 5


def test_stop_traj_alternation_shares_connecting_point():
    # 12 slow, 12 fast, 12 slow -> stop, traj, stop; junction points shared
    lons, lats, tss = _track(STOP_LEG * 6 + [(500, 300)] * 12 + STOP_LEG * 6)
    trajs, stops = gs.process_track(lons, lats, tss)
    assert len(trajs) == 1 and len(stops) == 2
    # traj includes both connecting points: 12 fast legs -> 13 pts
    assert trajs[0][2] == 13
    assert stops[0][2] == 13 and stops[1][2] == 13
    # stop1 ends where traj starts; traj ends where stop2 starts
    assert stops[0][1] == trajs[0][0] and trajs[0][1] == stops[1][0]


def test_identical_timestamp_skipped():
    lons, lats, tss = _track([(500, 300)] * 12)
    lons.insert(5, lons[4])
    lats.insert(5, LAT)
    tss.insert(5, tss[4])  # duplicate ts -> skipped entirely
    trajs, stops = gs.process_track(lons, lats, tss)
    assert len(trajs) == 1 and trajs[0][2] == 13


def test_outlier_does_not_advance_prev():
    # a point implying 60 kn is dropped and prev stays, so the NEXT point
    # measures from the pre-outlier point and the trajectory stays whole
    lons, lats, tss = _track([(500, 300)] * 12)
    # inject an outlier: 10 km from point 6, 300 s later; following point
    # resumes the original path
    lons.insert(7, lons[6] + 10_000 * M2DEG)
    lats.insert(7, LAT)
    tss.insert(7, tss[6] + 150)
    for i in range(8, len(tss)):
        tss[i] += 150
    trajs, stops = gs.process_track(lons, lats, tss)
    assert len(trajs) == 1
    assert trajs[0][2] == 13  # outlier contributed no point


def test_gap_splits_trajectory():
    specs = [(500, 300)] * 12 + [(500, 4000)] + [(500, 300)] * 12
    lons, lats, tss = _track(specs)
    trajs, stops = gs.process_track(lons, lats, tss)
    assert len(trajs) == 2
    assert trajs[0][2] == 13 and trajs[1][2] == 13


def test_stop_merging_fires_on_close_stops():
    # two 12-leg stops separated by ONE fast leg (500 m, 300 s): the gap
    # is < 3600 s but the centroids sit ~550 m apart (> 50 m) -> NOT merged
    lons, lats, tss = _track(
        STOP_LEG * 6 + [(500, 0, 300)] + STOP_LEG * 6
    )
    trajs, stops = gs.process_track(lons, lats, tss)
    assert len(stops) == 2  # centroid distance blocks the merge
    # zero-drift tight wiggles with an out-and-back fast excursion:
    # centroids nearly coincide (< 50 m), gap 600 s (< 3600 s) -> merged
    tight = [(30, 30, 300), (-30, -30, 300)]
    lons3, lats3, tss3 = _track(
        tight * 6 + [(160, 0, 300)] + [(-160, 0, 300)] + tight * 6
    )
    trajs3, stops3 = gs.process_track(lons3, lats3, tss3)
    assert len(stops3) == 1
    # 13 pts + (1 connecting + 12) pts — list concatenation, no dedup
    assert stops3[0][2] == 13 + 13
    assert (stops3[0][0], stops3[0][1]) == (tss3[0], tss3[-1])


def test_invalid_stop_dissolves_bridging_trajectories():
    # a 4-point (3-leg) slow dip between two long trajectories: too few
    # stop points -> dissolved, bridging both trajs into ONE, with the
    # junction points double-counted (reference list concatenation)
    specs = [(500, 300)] * 12 + STOP_LEG + [(35, 30, 300)] + [(500, 300)] * 12
    lons, lats, tss = _track(specs)
    trajs, stops = gs.process_track(lons, lats, tss)
    assert stops == []
    assert len(trajs) == 1
    # 13 + (1+3) + 13 points with both junctions duplicated
    assert trajs[0][2] == 13 + 4 + 13
    assert trajs[0][0] == 1_000_000 and trajs[0][1] == tss[-1]


def test_invalid_stop_extends_trailing_trajectory():
    specs = [(500, 300)] * 12 + STOP_LEG + [(35, 30, 300)]
    lons, lats, tss = _track(specs)
    trajs, stops = gs.process_track(lons, lats, tss)
    assert stops == [] and len(trajs) == 1
    assert trajs[0][2] == 13 + 4


def test_isolated_big_invalid_stop_becomes_trajectory():
    # a single candidate stop with >= 10 points whose MBR area exceeds
    # 5 km² (long thin drift won't; use wide zig-zag at slow speed) is
    # dissolved standalone into a trajectory.
    # slow legs alternating +140 m east / +140 m north keep speed < 1 kn
    # while spreading the MBR: 30 legs x 140 m diagonal ~ 2.1 km x 2.1 km
    # = 4.4 km² < 5 km² — push to 36 legs ~ 2.5x2.5 = 6.3 km² > 5 km²
    lons, lats, tss = [10.5], [LAT], [1_000_000]
    for i in range(36):
        if i % 2 == 0:
            lons.append(lons[-1] + 140 * M2DEG)
            lats.append(lats[-1])
        else:
            lons.append(lons[-1])
            lats.append(lats[-1] + 140 / 111_360.0)
        tss.append(tss[-1] + 300)
    trajs, stops = gs.process_track(lons, lats, tss)
    assert stops == []
    assert len(trajs) == 1 and trajs[0][2] == 37


def test_coincident_points_buffered_square():
    lons = [10.5] * 13
    lats = [LAT] * 13
    tss = [1_000_000 + 300 * i for i in range(13)]
    trajs, stops = gs.process_track(lons, lats, tss)
    assert trajs == [] and len(stops) == 1
    wkb = stops[0][3]
    npts = struct.unpack("<I", wkb[9:13])[0]
    assert npts == 5
    xs = np.frombuffer(wkb[13:], dtype="<f8").reshape(-1, 2)
    assert xs[:, 0].min() == pytest.approx(10.5 - 1e-5)
    assert xs[:, 0].max() == pytest.approx(10.5 + 1e-5)


def test_wkb_builders_layout():
    ls = wkb_linestring_m_bytes([(1.0, 2.0, 3.0), (4.0, 5.0, 6.0)])
    order, gtype, n = struct.unpack("<BII", ls[:9])
    assert (order, gtype, n) == (1, 2002, 2)
    assert np.frombuffer(ls[9:], dtype="<f8").tolist() == [1, 2, 3, 4, 5, 6]
    poly = wkb_polygon_bytes([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)])
    order, gtype, nr, np_ = struct.unpack("<BIII", poly[:13])
    assert (order, gtype, nr, np_) == (1, 3, 1, 5)  # auto-closed ring
    ring = np.frombuffer(poly[13:], dtype="<f8").reshape(-1, 2)
    assert (ring[0] == ring[-1]).all()


def test_collinear_stop_dissolves():
    # axis-aligned slow drift: shapely's envelope would be a LineString,
    # so the reference never emits a polygon — the stop dissolves into a
    # standalone trajectory (>= 10 points)
    lons, lats, tss = _track([(50, 300)] * 12)
    trajs, stops = gs.process_track(lons, lats, tss)
    assert stops == []
    assert len(trajs) == 1 and trajs[0][2] == 13


def test_short_tracks_emit_nothing():
    assert gs.process_track([], [], []) == ([], [])
    assert gs.process_track([10.5], [LAT], [1]) == ([], [])
    lons, lats, tss = _track([(500, 300)] * 5)  # 6 pts < 10
    assert gs.process_track(lons, lats, tss) == ([], [])


def test_operator_matches_process_track(spark):
    lons, lats, tss = _track(STOP_LEG * 6 + [(500, 300)] * 12)
    rows = [(7, lo, la, t) for lo, la, t in zip(lons, lats, tss)]
    df = spark.createDataFrame(rows, "vessel_id long, lon double, lat double, ts_s long")
    got = sorted(
        (r.kind, r.ts_start, r.ts_end, r.n_points, bytes(r.geom))
        for r in gs.geo_sessionize(df).collect()
    )
    trajs, stops = gs.process_track(lons, lats, tss)
    want = sorted(
        [("traj", *t) for t in trajs] + [("stop", *s) for s in stops]
    )
    assert got == want and len(got) == 2


def test_nan_sog_falls_back_to_computed_speed():
    # NULL SOG arrives as NaN through the Arrow boundary; the reference's
    # contract (float(sog) if sog is not None else None) means a missing
    # SOG must fall back to the computed average speed — a NaN leaking in
    # would make every stop comparison False and suppress stop detection
    lons, lats, tss = _track(STOP_LEG * 6)
    nan = float("nan")
    with_nan = gs.process_track(lons, lats, tss, [nan] * len(lons))
    without = gs.process_track(lons, lats, tss, None)
    assert with_nan == without
    assert len(with_nan[1]) == 1  # the stop IS detected


def test_nan_sog_in_operator(spark):
    # end to end: a stationary vessel whose sog column is SQL NULL
    lons, lats, tss = _track(STOP_LEG * 6)
    rows = [(7, lo, la, t, None) for lo, la, t in zip(lons, lats, tss)]
    df = spark.createDataFrame(
        rows, "vessel_id long, lon double, lat double, ts_s long, sog double"
    )
    got = gs.geo_sessionize(df, sog="sog").collect()
    assert [r.kind for r in got] == ["stop"]


def test_duplicate_timestamps_deterministic(spark):
    # two points share a timestamp: whichever sorts first by (ts, lon,
    # lat) must win regardless of Spark's group delivery order
    lons, lats, tss = _track([(500, 300)] * 12)
    rows = [(7, lo, la, t) for lo, la, t in zip(lons, lats, tss)]
    rows.append((7, rows[5][1] + 0.01, rows[5][2], rows[5][3]))  # dup ts
    outs = []
    for order in (rows, list(reversed(rows))):
        df = spark.createDataFrame(
            order, "vessel_id long, lon double, lat double, ts_s long"
        ).repartition(4)
        outs.append(sorted(
            (r.kind, r.ts_start, r.ts_end, r.n_points, bytes(r.geom))
            for r in gs.geo_sessionize(df).collect()
        ))
    assert outs[0] == outs[1]


def test_bridge_dissolve_pops_correct_traj_when_after_precedes_before():
    # direct exercise of the fixed pop: the "after" trajectory sits at a
    # LOWER index than "before" — the reference's pop(before+1) would
    # remove the wrong list entry (or raise IndexError with before last);
    # the fix pops `after` and keeps the unrelated trajectory intact
    p = [(i * 1e-4, 0.0, 1000.0 + 60 * i) for i in range(8)]  # ~11 m / 60 s
    stop = [p[3], p[4]]
    after_traj = [p[4], p[5], p[6]]   # starts at stop's end — index 0
    before_traj = [p[0], p[1], p[2], p[3]]  # ends at stop's start — index 1
    trajs = [after_traj, before_traj]
    gs._dissolve_invalid_stop(trajs, stop)
    assert len(trajs) == 1
    assert trajs[0] == before_traj + stop + after_traj
