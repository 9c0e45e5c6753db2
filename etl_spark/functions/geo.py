"""Spatial math + grid encoding (SURVEY §2.7 spatial / grid rows, literal).

The reference keeps a compact spatial layer under its sessionization and
cover operators: haversine distance / speed / MBR area
(/root/reference/src/core/utils.py:15-57), lon/lat -> fractional slippy
tile at a zoom (cellstring_utils.py:28-43, "adapted from Carto's quadbin
``point_to_tile_fraction``"), xyz -> quadkey cell ids
(cellstring_utils.py:24-25, via the external ``ukc_core`` package — not in
the reference repo, so this module fixes the standard Bing convention: the
z-digit base-4 quadkey string, digit = 2*ybit + xbit MSB-first, read as an
integer), and a deprecated offset cell encoding (cellstring_utils.py:282-334).

Spark-first shape: everything here that is closed-form math is a BUILT-IN
column expression (JVM-side, inside whole-stage codegen — radians/sin/cos/
asin/ln/floor and a single higher-order ``aggregate`` for the quadkey bit
interleave). No Python touches the hot path. The numpy twins (``np_*``)
exist for the cover operators' Arrow-batched UDF internals
(operators/geocover.py) and for tests; they use the exact same formulas so
both paths produce bit-identical doubles.

The WKB PointM codec is the one genuinely non-SQL piece (IEEE-754 byte
packing): vectorized numpy over Arrow batches, never per-row Python. The
reference likewise shuttles geometries as WKB bytes across process
boundaries (core/points_to_ls_poly.py:35-40); SURVEY §1's type mapping
keeps geometry as ``BinaryType`` WKB for the same reason.

Scale notes: all functions are per-row and shuffle-free; a 100 TB scan maps
through them without any exchange. Quadkey cell ids at z<=21 fit in 42 bits
(LongType, SURVEY §1's UINT64 remap).
"""

from __future__ import annotations

import math
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EARTH_RADIUS_M = 6_371_000.0  # mean Earth radius (reference utils.py:9)
KNOT_AS_MPS = 0.514444  # 1 knot = 0.514444 m/s (reference utils.py:6)
DEFAULT_ZOOM = 21  # reference cellstring_utils.py:19

# ISO WKB: little-endian byte-order marker + geometry type PointM (2001).
_WKB_NDR = 1
_WKB_POINT_M = 2001
_WKB_POINT_M_LEN = 1 + 4 + 3 * 8  # order byte + uint32 type + x, y, m


# ---------------------------------------------------------------------------
# Tile / quadkey encoding (built-in column expressions)
# ---------------------------------------------------------------------------


def tile_frac(lon: Column, lat: Column, zoom: int) -> tuple[Column, Column]:
    """Fractional slippy-tile coordinates at ``zoom`` (Web Mercator).

    Mirrors the reference's ``_point_to_tile_fraction``
    (cellstring_utils.py:28-43): x wraps into [0, 2^z), y is clamped to
    [0, 2^z - 1]. Pure built-ins — stays inside codegen.
    """
    z2 = float(1 << zoom)
    sinlat = F.sin(F.radians(lat))
    x = F.lit(z2) * (lon / F.lit(360.0) + F.lit(0.5))
    # wrap x into [0, z2) ONLY when out of range: an unconditional
    # ((x % z2) + z2) % z2 loses the low mantissa bit (x + z2 rounds at
    # the doubled exponent), which can flip floor() at tile boundaries
    x = F.when((x < 0) | (x >= z2), ((x % F.lit(z2)) + F.lit(z2)) % F.lit(z2)).otherwise(x)
    yfrac = F.lit(0.5) - F.lit(0.25) * F.log(
        (F.lit(1.0) + sinlat) / (F.lit(1.0) - sinlat)
    ) / F.lit(math.pi)
    y = F.greatest(F.lit(0.0), F.least(F.lit(z2 - 1.0), F.lit(z2) * yfrac))
    return x, y


def tile_xy(lon: Column, lat: Column, zoom: int) -> tuple[Column, Column]:
    """Integer tile coordinates at ``zoom`` (floor of the fractional pair)."""
    xf, yf = tile_frac(lon, lat, zoom)
    return F.floor(xf).cast("long"), F.floor(yf).cast("long")


def quadkey_expr(x_name: str, y_name: str, zoom: int) -> Column:
    """Quadkey integer of tile columns ``x_name``/``y_name`` at ``zoom``.

    Standard Bing convention: the zoom-digit base-4 string (digit at level
    l = 2*ybit + xbit of bit zoom-1-l), read as an integer — i.e.
    sum_i (2*ybit_i + xbit_i) * 4^i = morton(x, y). Computed with the
    classic Morton spread-bits ladder (5 shift-or-mask steps per
    coordinate): plain long arithmetic that whole-stage codegen compiles
    and CSE-dedupes, measured at scan speed — whereas a higher-order
    ``aggregate`` over ``sequence(zoom-1, 0)`` computes the same value
    interpreted per element (~300 us/row; lambda bodies don't codegen).
    Valid for tile coords < 2^32 (any zoom <= 21 is far inside).
    ``zoom`` only documents intent; the spread is zoom-independent.
    """
    del zoom

    def _spread(c: Column) -> Column:
        for s, mask in (
            (16, 0x0000FFFF0000FFFF),
            (8, 0x00FF00FF00FF00FF),
            (4, 0x0F0F0F0F0F0F0F0F),
            (2, 0x3333333333333333),
            (1, 0x5555555555555555),
        ):
            c = c.bitwiseOR(F.shiftleft(c, s)).bitwiseAND(F.lit(mask))
        return c

    return _spread(F.col(x_name)) + _spread(F.col(y_name)) * F.lit(2)


def quadkey_parent(qk: Column, levels_up: int) -> Column:
    """Ancestor quadkey ``levels_up`` zoom levels coarser (drop 2 bits/level)."""
    return F.shiftright(qk, 2 * levels_up)


def offset_cell_encode(x: Column, y: Column, zoom: int) -> Column:
    """The reference's deprecated offset cell encoding
    (cellstring_utils.py:282-308): ``OFFSET_z + x * MULT_z + y`` for
    z in {13, 17, 21}. Kept for parity; quadkeys are the real ids."""
    offset, mult = _OFFSET_PARAMS[zoom]
    return (F.lit(offset) + x * F.lit(mult) + y).cast("long")


_OFFSET_PARAMS = {
    13: (100_000_000, 10_000),
    17: (1_000_000_000_000, 1_000_000),
    21: (100_000_000_000_000, 10_000_000),
}


# ---------------------------------------------------------------------------
# Spatial math (built-in column expressions; reference utils.py:15-57)
# ---------------------------------------------------------------------------


def haversine_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Haversine distance in meters (reference ``haversine_distance_m``)."""
    rlon1, rlat1 = F.radians(lon1), F.radians(lat1)
    rlon2, rlat2 = F.radians(lon2), F.radians(lat2)
    sdlat = F.sin((rlat2 - rlat1) / F.lit(2.0))
    sdlon = F.sin((rlon2 - rlon1) / F.lit(2.0))
    # plain multiplication, not pow(x, 2): IEEE multiply is bit-identical
    # across engines; libm pow need not be
    a = sdlat * sdlat + F.cos(rlat1) * F.cos(rlat2) * sdlon * sdlon
    return F.lit(EARTH_RADIUS_M * 2.0) * F.asin(F.sqrt(a))


def speed_knots(dist_m: Column, dt_s: Column) -> Column:
    """Average speed in knots (reference ``compute_motion``, utils.py:44-49).

    Deviation: the reference returns ``inf`` when dt <= 0; here NULL —
    NULL survives Parquet round-trips and cross-engine comparison where a
    double infinity is fragile, and downstream filters treat both as
    "no valid speed"."""
    return F.when(dt_s > 0, dist_m / dt_s / F.lit(KNOT_AS_MPS))


def mbr_area_m2(
    min_lon: Column, min_lat: Column, max_lon: Column, max_lat: Column
) -> Column:
    """Minimum-bounding-rectangle area in m² (reference ``compute_mbr_area``,
    utils.py:52-57): width along the south edge × height along the west
    edge, both haversine."""
    w = haversine_m(min_lon, min_lat, max_lon, min_lat)
    h = haversine_m(min_lon, min_lat, min_lon, max_lat)
    return w * h


# ---------------------------------------------------------------------------
# numpy twins (UDF internals + tests; identical formulas)
# ---------------------------------------------------------------------------


def np_tile_frac(
    lon: np.ndarray, lat: np.ndarray, zoom: int
) -> tuple[np.ndarray, np.ndarray]:
    z2 = float(1 << zoom)
    sinlat = np.sin(np.radians(lat))
    x = z2 * (lon / 360.0 + 0.5)
    # wrap only out-of-range values (see tile_frac: the mod chain costs a
    # mantissa bit, so in-range x must pass through untouched)
    need = (x < 0) | (x >= z2)
    if need.any():
        x = np.where(need, np.mod(np.mod(x, z2) + z2, z2), x)
    yfrac = 0.5 - 0.25 * np.log((1.0 + sinlat) / (1.0 - sinlat)) / math.pi
    y = np.maximum(0.0, np.minimum(z2 - 1.0, z2 * yfrac))
    return x, y


def np_quadkey(x: np.ndarray, y: np.ndarray, zoom: int) -> np.ndarray:
    """Vectorized bit-interleave: one pass over the zoom levels, whole
    arrays per level (never per-row Python)."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    qk = np.zeros_like(x)
    for i in range(zoom):
        qk |= ((x >> i) & 1) << (2 * i)
        qk |= ((y >> i) & 1) << (2 * i + 1)
    return qk


def np_tile_lat_deg(y: np.ndarray, zoom: int) -> np.ndarray:
    """Latitude (degrees) of the TOP edge of tile row ``y`` — the inverse
    Mercator. sinh spelled as (e^a - e^-a)/2 so the oracle SQL (DuckDB has
    no sinh) and this path share the exact expression tree."""
    a = math.pi * (1.0 - 2.0 * np.asarray(y, dtype=np.float64) / float(1 << zoom))
    return np.degrees(np.arctan((np.exp(a) - np.exp(-a)) / 2.0))


def np_haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    rlon1, rlat1 = np.radians(lon1), np.radians(lat1)
    rlon2, rlat2 = np.radians(lon2), np.radians(lat2)
    sdlat = np.sin((rlat2 - rlat1) / 2.0)
    sdlon = np.sin((rlon2 - rlon1) / 2.0)
    a = sdlat * sdlat + np.cos(rlat1) * np.cos(rlat2) * sdlon * sdlon
    return EARTH_RADIUS_M * 2.0 * np.arcsin(np.sqrt(a))


# ---------------------------------------------------------------------------
# WKB PointM codec (vectorized numpy over Arrow batches)
# ---------------------------------------------------------------------------


def _encode_point_m_np(lon: np.ndarray, lat: np.ndarray, m: np.ndarray) -> list[bytes]:
    n = len(lon)
    buf = np.empty((n, _WKB_POINT_M_LEN), dtype=np.uint8)
    buf[:, 0] = _WKB_NDR
    buf[:, 1:5] = np.frombuffer(
        np.array([_WKB_POINT_M], dtype="<u4").tobytes(), dtype=np.uint8
    )
    coords = buf[:, 5:].view("<f8")
    coords[:, 0] = lon
    coords[:, 1] = lat
    coords[:, 2] = m
    return [row.tobytes() for row in buf]


@F.pandas_udf(T.BinaryType())
def wkb_point_m(lon: pd.Series, lat: pd.Series, m: pd.Series) -> pd.Series:
    """ST_PointM equivalent: (lon, lat, m) -> ISO WKB bytes (type 2001,
    little-endian). Reference parity: ``ST_PointM`` in
    pg_construct_trajs_stops.py:170-173 / mat_points_view.py:59."""
    out = _encode_point_m_np(
        lon.to_numpy(dtype=np.float64),
        lat.to_numpy(dtype=np.float64),
        m.to_numpy(dtype=np.float64),
    )
    return pd.Series(out)


_POINT_M_STRUCT = T.StructType(
    [
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
        T.StructField("m", T.DoubleType()),
    ]
)


@F.pandas_udf(_POINT_M_STRUCT)
def wkb_point_m_decode(wkb: pd.Series) -> pd.DataFrame:
    """ST_X / ST_Y / ST_M equivalent: ISO WKB PointM bytes -> (x, y, m).
    Malformed input (wrong length / type tag) decodes to NULLs instead of
    failing the batch — the reference's per-row error-isolation stance
    (SURVEY U5). One vectorized pass: stack the fixed-length rows, view the
    coordinate block as little-endian f8."""
    vals = wkb.to_numpy(dtype=object)
    n = len(vals)
    ok = np.zeros(n, dtype=bool)
    raw = np.zeros((n, _WKB_POINT_M_LEN), dtype=np.uint8)
    for i, b in enumerate(vals):  # bounded by batch size; bytes len-check only
        if isinstance(b, (bytes, bytearray)) and len(b) == _WKB_POINT_M_LEN:
            raw[i] = np.frombuffer(b, dtype=np.uint8)
            ok[i] = True
    if ok.any():
        hdr_ok = (raw[:, 0] == _WKB_NDR) & (
            raw[:, 1:5].view("<u4")[:, 0] == _WKB_POINT_M
        )
        ok &= hdr_ok
    coords = raw[:, 5:].view("<f8")
    out = pd.DataFrame(
        {"x": coords[:, 0], "y": coords[:, 1], "m": coords[:, 2]}
    )
    if not ok.all():
        out = out.astype("Float64")
        out[~ok] = pd.NA
    return out


_WKB_LINESTRING_M = 2002  # ISO WKB LineStringM
_WKB_POLYGON = 3  # ISO WKB Polygon (2D)


def wkb_linestring_m_bytes(coords: Iterable[tuple[float, float, float]]) -> bytes:
    """LineStringM -> ISO WKB (little-endian, type 2002). The reference
    builds the same geometry via WKT->shapely->wkb
    (core/utils.py:198-202 ``coords_to_linestringm_as_wkb``); here it's a
    direct numpy pack: header + point count + n*(x, y, m) doubles."""
    pts = np.asarray(list(coords), dtype=np.float64)
    n = len(pts)
    buf = np.empty(9 + 24 * n, dtype=np.uint8)
    buf[0] = _WKB_NDR
    buf[1:5] = np.frombuffer(
        np.array([_WKB_LINESTRING_M], dtype="<u4").tobytes(), dtype=np.uint8
    )
    buf[5:9] = np.frombuffer(np.array([n], dtype="<u4").tobytes(), dtype=np.uint8)
    if n:
        buf[9:] = np.frombuffer(pts.astype("<f8").tobytes(), dtype=np.uint8)
    return buf.tobytes()


def wkb_polygon_bytes(ring: Iterable[tuple[float, float]]) -> bytes:
    """Single-ring 2D Polygon -> ISO WKB (little-endian, type 3). The ring
    is closed automatically if open (shapely emits closed rings)."""
    pts = [tuple(p) for p in ring]
    if pts and pts[0] != pts[-1]:
        pts.append(pts[0])
    arr = np.asarray(pts, dtype=np.float64)
    n = len(arr)
    buf = np.empty(13 + 16 * n, dtype=np.uint8)
    buf[0] = _WKB_NDR
    buf[1:5] = np.frombuffer(
        np.array([_WKB_POLYGON], dtype="<u4").tobytes(), dtype=np.uint8
    )
    buf[5:9] = np.frombuffer(np.array([1], dtype="<u4").tobytes(), dtype=np.uint8)
    buf[9:13] = np.frombuffer(np.array([n], dtype="<u4").tobytes(), dtype=np.uint8)
    if n:
        buf[13:] = np.frombuffer(arr.astype("<f8").tobytes(), dtype=np.uint8)
    return buf.tobytes()


# ---------------------------------------------------------------------------
# Deterministic synthetic track points (tests / oracles / bench)
# ---------------------------------------------------------------------------

# Exact-integer-arithmetic-then-one-divide so Spark and DuckDB produce
# bit-identical doubles. Box ~0.03° x 0.03° off Skagen (the reference's AIS
# test fixtures sit in the same waters — tests/test_transform_ls_to_cs.py).
SYNTH_LON0 = 10.5
SYNTH_LAT0 = 57.2
SYNTH_MOD = 9001
SYNTH_DIV = 300_000.0
SYNTH_VESSELS = 16

SYNTH_POINTS_SQL = f"""
    SELECT user_id % {SYNTH_VESSELS} AS vessel_id,
           event_id,
           floor(epoch(ts))::BIGINT AS ts_s,
           {SYNTH_LON0} + ((event_id * 37 + 11) % {SYNTH_MOD}) / {SYNTH_DIV} AS lon,
           {SYNTH_LAT0} + ((event_id * 61 + 7) % {SYNTH_MOD}) / {SYNTH_DIV} AS lat
    FROM events
"""


# Random-walk track for the sessionization query: alternating 40-point
# blocks of small (10-80 m) and large (250-1500 m) steps at a fixed 300 s
# cadence — real stop/trajectory alternation with wide margins around every
# reference threshold (stop needs < 154.33 m at 300 s; gaps < 1 h; speeds
# < 50 kn). Steps are quantized to INTEGER nanodegrees before the running
# sum so the cumulative position is exact integer arithmetic — engines may
# sum windows in different orders (segment trees vs sequential), which
# would diverge doubles but not integers.
SYNTH_WALK_SQL = f"""
    SELECT vessel_id, rk, ts2 AS ts_s,
           10.5 + sum(dlon_n) OVER wcum / 1000000000.0 AS lon,
           57.2 + sum(dlat_n) OVER wcum / 1000000000.0 AS lat
    FROM (
        SELECT vessel_id, rk, ts2,
               round(step_m * cos(theta) / 60340.0 * 1000000000.0, 0)::BIGINT AS dlon_n,
               round(step_m * sin(theta) / 111360.0 * 1000000000.0, 0)::BIGINT AS dlat_n
        FROM (
            SELECT vessel_id, rk, 1700000000 + rk * 300 AS ts2,
                   CASE WHEN (rk // 40) % 2 = 1
                        THEN 10.0 + 70.0 * (((event_id * 37 + 11) % {SYNTH_MOD}) / {SYNTH_MOD}.0)
                        ELSE 250.0 + 1250.0 * (((event_id * 37 + 11) % {SYNTH_MOD}) / {SYNTH_MOD}.0)
                   END AS step_m,
                   2 * pi() * (((event_id * 61 + 7) % {SYNTH_MOD}) / {SYNTH_MOD}.0) AS theta
            FROM (
                SELECT user_id % {SYNTH_VESSELS} AS vessel_id, event_id, ts,
                       row_number() OVER (PARTITION BY user_id % {SYNTH_VESSELS}
                                          ORDER BY ts, event_id) - 1 AS rk
                FROM events
            )
        )
    ) WINDOW wcum AS (PARTITION BY vessel_id ORDER BY rk
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def synth_walk_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-vessel random-walk track (vessel_id, rk, ts_s,
    lon, lat) — ``SYNTH_WALK_SQL`` is the DuckDB twin. See the SQL's
    comment for why steps go through integer nanodegrees."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = ev.select(
        (F.col("user_id") % SYNTH_VESSELS).alias("vessel_id"), "event_id", "ts"
    )
    w = Window.partitionBy("vessel_id").orderBy("ts", "event_id")
    ev = ev.withColumn("rk", F.row_number().over(w) - 1)
    base = ((F.col("event_id") * 37 + 11) % SYNTH_MOD) / F.lit(float(SYNTH_MOD))
    theta = F.lit(2.0 * math.pi) * (
        ((F.col("event_id") * 61 + 7) % SYNTH_MOD) / F.lit(float(SYNTH_MOD))
    )
    step_m = F.when(
        F.expr("rk div 40") % 2 == 1, F.lit(10.0) + F.lit(70.0) * base
    ).otherwise(F.lit(250.0) + F.lit(1250.0) * base)
    ev = ev.select(
        "vessel_id",
        "rk",
        (F.lit(1700000000) + F.col("rk") * 300).alias("ts_s"),
        F.round(step_m * F.cos(theta) / F.lit(60340.0) * F.lit(1e9), 0)
        .cast("long")
        .alias("dlon_n"),
        F.round(step_m * F.sin(theta) / F.lit(111360.0) * F.lit(1e9), 0)
        .cast("long")
        .alias("dlat_n"),
    )
    wcum = (
        Window.partitionBy("vessel_id")
        .orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "vessel_id",
        "rk",
        "ts_s",
        (F.lit(10.5) + F.sum("dlon_n").over(wcum) / F.lit(1e9)).alias("lon"),
        (F.lit(57.2) + F.sum("dlat_n").over(wcum) / F.lit(1e9)).alias("lat"),
    )


def synth_track_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic (vessel_id, event_id, ts_s, lon, lat) derived from the
    events table — the geo queries' input; ``SYNTH_POINTS_SQL`` is the
    DuckDB-side twin (identical integer arithmetic, one divide)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        (F.col("user_id") % SYNTH_VESSELS).alias("vessel_id"),
        "event_id",
        F.col("ts").cast("timestamp").cast("long").alias("ts_s"),
        (
            F.lit(SYNTH_LON0)
            + ((F.col("event_id") * 37 + 11) % SYNTH_MOD) / F.lit(SYNTH_DIV)
        ).alias("lon"),
        (
            F.lit(SYNTH_LAT0)
            + ((F.col("event_id") * 61 + 7) % SYNTH_MOD) / F.lit(SYNTH_DIV)
        ).alias("lat"),
    )
