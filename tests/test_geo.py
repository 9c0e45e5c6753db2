"""Spatial math + grid encoding (functions/geo.py) — SURVEY §2.7 spatial/grid.

Covers: quadkey bit-interleave (JVM aggregate expr vs numpy twin), tile
fraction parity, haversine/speed/MBR semantics vs the reference's formulas
(/root/reference/src/core/utils.py:15-57), the deprecated offset encoding,
WKB PointM round-trip incl. malformed-input isolation, and the synthetic
track-point determinism the DuckDB oracles rely on.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_spark.functions import geo


def test_quadkey_expr_matches_numpy(spark):
    rng = np.random.default_rng(7)
    xs = rng.integers(0, 1 << 21, 200)
    ys = rng.integers(0, 1 << 21, 200)
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in zip(xs, ys)], "tx long, ty long"
    )
    got = (
        df.withColumn("qk", geo.quadkey_expr("tx", "ty", 21))
        .orderBy("tx", "ty")
        .collect()
    )
    want = {
        (int(x), int(y)): int(q) for x, y, q in zip(xs, ys, geo.np_quadkey(xs, ys, 21))
    }
    for r in got:
        assert r.qk == want[(r.tx, r.ty)]


def test_quadkey_known_digits():
    # x=3 (0b0011), y=5 (0b0101), z=4 -> digits MSB-first (2*ybit+xbit):
    # bit3: y=0,x=0 -> 0; bit2: y=1,x=0 -> 2; bit1: y=0,x=1 -> 1;
    # bit0: y=1,x=1 -> 3  => base-4 "0213" = 0*64+2*16+1*4+3 = 39
    assert int(geo.np_quadkey(np.array([3]), np.array([5]), 4)[0]) == 39


def test_quadkey_parent_is_prefix():
    q21 = geo.np_quadkey(np.array([123456]), np.array([654321]), 21)
    q13 = geo.np_quadkey(np.array([123456 >> 8]), np.array([654321 >> 8]), 13)
    assert int(q21[0]) >> (2 * 8) == int(q13[0])


def test_tile_frac_parity_and_clamp(spark):
    df = spark.createDataFrame(
        [(10.5, 57.2), (-180.0, 85.05), (179.9999, -85.05), (200.0, 0.0)],
        "lon double, lat double",
    )
    xf, yf = geo.tile_frac(F.col("lon"), F.col("lat"), 17)
    got = df.select("lon", "lat", xf.alias("xf"), yf.alias("yf")).collect()
    for r in got:
        nx, ny = geo.np_tile_frac(np.array([r.lon]), np.array([r.lat]), 17)
        # JVM Math.sin and numpy sin may differ by 1 ULP at extreme
        # latitudes (amplified by 2^z) — the oracles only rely on parity
        # inside the synthetic box, asserted exactly below
        assert r.xf == pytest.approx(nx[0], abs=1e-7)
        assert r.yf == pytest.approx(ny[0], abs=1e-7)
        assert 0.0 <= r.xf < (1 << 17) and 0.0 <= r.yf <= (1 << 17) - 1
    # bit-exact inside the synth working box (what the DuckDB oracles need)
    box = spark.createDataFrame([(10.5123, 57.2087)], "lon double, lat double")
    bx, by = geo.tile_frac(F.col("lon"), F.col("lat"), 21)
    r = box.select(bx.alias("xf"), by.alias("yf")).first()
    nx, ny = geo.np_tile_frac(np.array([10.5123]), np.array([57.2087]), 21)
    assert r.xf == nx[0] and r.yf == ny[0]


def test_haversine_reference_formula(spark):
    # reference haversine_distance_m (utils.py:15-26): numpy twin == Spark
    # built-ins; plus a physical sanity anchor (1 deg lat ~ 111.19 km)
    df = spark.createDataFrame([(10.0, 57.0, 10.0, 58.0)], "a double, b double, c double, d double")
    got = df.select(
        geo.haversine_m(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("m")
    ).first().m
    want = float(geo.np_haversine_m(10.0, 57.0, 10.0, 58.0))
    assert got == pytest.approx(want, rel=1e-12)
    assert got == pytest.approx(111_194.9, rel=1e-3)


def test_speed_and_mbr(spark):
    df = spark.createDataFrame([(514.444, 100.0), (514.444, 0.0)], "d double, t double")
    rows = df.select(
        geo.speed_knots(F.col("d"), F.col("t")).alias("kn")
    ).collect()
    assert rows[0].kn == pytest.approx(10.0, rel=1e-9)  # 514.444 m / 100 s = 10 kn
    assert rows[1].kn is None  # reference returns inf; we use NULL (doc'd)
    area = (
        spark.range(1)
        .select(
            geo.mbr_area_m2(F.lit(10.0), F.lit(57.0), F.lit(10.1), F.lit(57.1)).alias("a")
        )
        .first()
        .a
    )
    w = geo.np_haversine_m(10.0, 57.0, 10.1, 57.0)
    h = geo.np_haversine_m(10.0, 57.0, 10.0, 57.1)
    assert area == pytest.approx(float(w * h), rel=1e-12)


def test_offset_cell_encoding_roundtrip(spark):
    # deprecated encoding (cellstring_utils.py:282-334): offset + x*mult + y
    df = spark.createDataFrame([(4321, 1234)], "x long, y long")
    for zoom, (off, mult) in geo._OFFSET_PARAMS.items():
        cell = df.select(geo.offset_cell_encode(F.col("x"), F.col("y"), zoom).alias("c")).first().c
        assert cell == off + 4321 * mult + 1234
        assert ((cell - off) // mult, (cell - off) % mult) == (4321, 1234)


def test_wkb_point_m_roundtrip(spark):
    df = spark.createDataFrame(
        [(10.5123, 57.21, 1.7e9), (-179.99, -85.0, 0.0)], "lon double, lat double, m double"
    )
    enc = df.select("lon", "lat", geo.wkb_point_m("lon", "lat", "m").alias("wkb"))
    rows = enc.select(
        "lon", "lat", F.length("wkb").alias("n"), geo.wkb_point_m_decode("wkb").alias("p")
    ).collect()
    for r in rows:
        assert r.n == 29
        assert r.p.x == r.lon and r.p.y == r.lat
    # byte layout is ISO WKB little-endian PointM (type 2001)
    raw = enc.first().wkb
    order, gtype, x, y, m = struct.unpack("<BIddd", raw)
    assert (order, gtype) == (1, 2001)
    assert (x, y, m) == (10.5123, 57.21, 1.7e9)


def test_wkb_decode_isolates_malformed(spark):
    good = struct.pack("<BIddd", 1, 2001, 1.0, 2.0, 3.0)
    bad_type = struct.pack("<BIddd", 1, 1, 1.0, 2.0, 3.0)
    df = spark.createDataFrame(
        [(good,), (b"short",), (bad_type,), (None,)], "wkb binary"
    )
    rows = df.select(geo.wkb_point_m_decode("wkb").alias("p")).collect()
    assert rows[0].p.x == 1.0 and rows[0].p.m == 3.0
    for r in rows[1:]:
        assert r.p is None or r.p.x is None


def test_synth_track_points_deterministic(spark):
    sf = "/root/testdata/sf0.001"
    a = geo.synth_track_points(spark, sf).orderBy("event_id").limit(5).collect()
    b = geo.synth_track_points(spark, sf).orderBy("event_id").limit(5).collect()
    assert a == b
    for r in a:
        assert geo.SYNTH_LON0 <= r.lon < geo.SYNTH_LON0 + geo.SYNTH_MOD / geo.SYNTH_DIV
        assert 0 <= r.vessel_id < geo.SYNTH_VESSELS
        # exact reconstruction: integer arithmetic then one divide
        assert r.lon == geo.SYNTH_LON0 + ((r.event_id * 37 + 11) % geo.SYNTH_MOD) / geo.SYNTH_DIV
