"""Geo-distance scalars (SURVEY.md F13-F16).

The reference computes great-circle distance inline in SQL
(BlueForty.py:438-439); here it is a reusable Column function.  Pure
``pyspark.sql.functions`` trig — whole-stage codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """2·R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2))) in km —
    the exact formula at BlueForty.py:438-439."""
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.pow(F.sin(dlat), 2) + F.cos(F.radians(lat1)) * F.cos(
        F.radians(lat2)
    ) * F.pow(F.sin(dlon), 2)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lat: Column, lon: Column, precision: int = 8) -> Column:
    """Standard base-32 geohash of (lat, lon) — the spatial bucketing
    key for proximity joins and prefix-aggregated tile rollups (a
    geohash PREFIX is a containing cell, so groupBy(prefix) is a
    shuffle-friendly spatial histogram and equi-joining on a prefix is
    the grid-cell join in ``closest_stations_grid`` with standardized
    cell names).

    Pure codegen arithmetic: quantize each axis to ``5*precision/2``
    bits (floor((lat+90)/180 * 2^b), clamped), interleave starting
    with longitude (the geohash bit order), then slice 5-bit groups
    through the base-32 alphabet.  No UDF; every step is integer after
    the initial IEEE-754 quantization, which a SQL oracle replays
    verbatim."""
    total_bits = 5 * precision
    lat_bits = total_bits // 2
    lon_bits = total_bits - lat_bits

    def quant(deg: Column, half_span: float, bits: int) -> Column:
        n = 1 << bits
        q = F.floor(
            ((deg + F.lit(half_span)) / F.lit(2.0 * half_span))
            * F.lit(float(n))
        ).cast("long")
        return F.greatest(F.lit(0), F.least(F.lit(n - 1), q))

    lat_q = quant(lat, 90.0, lat_bits)
    lon_q = quant(lon, 180.0, lon_bits)

    # Interleave, longitude first: code bit (total-1) = lon's MSB.
    # Even total (lon_bits == lat_bits): lon bit i lands at 2i+1,
    # lat bit i at 2i.  Odd total (lon has one extra bit): lon bit i
    # lands at 2i, lat bit i at 2i+1.
    lon_off, lat_off = (1, 0) if lon_bits == lat_bits else (0, 1)
    code = F.lit(0).cast("long")
    for i in range(lon_bits):
        code = code.bitwiseOR(
            F.shiftleft(
                F.shiftright(lon_q, i).bitwiseAND(F.lit(1)),
                2 * i + lon_off,
            )
        )
    for i in range(lat_bits):
        code = code.bitwiseOR(
            F.shiftleft(
                F.shiftright(lat_q, i).bitwiseAND(F.lit(1)),
                2 * i + lat_off,
            )
        )

    chars = [
        F.substring(
            F.lit(GEOHASH_ALPHABET),
            (
                F.shiftright(
                    code, 5 * (precision - 1 - j)
                ).bitwiseAND(F.lit(31))
                + 1
            ).cast("int"),
            1,
        )
        for j in range(precision)
    ]
    return F.concat(*chars)


def point_in_convex_polygon(
    x: Column, y: Column, vertices: list[tuple[int, int]]
) -> Column:
    """Containment test against a CONVEX polygon with integer vertices
    (counter-clockwise winding): the point is inside iff it lies on
    the left of (or on) every directed edge — one integer cross
    product per edge, folded into a single codegen conjunction.  All
    arithmetic is exact BIGINT, so there is no epsilon and no
    engine divergence (the float orientation tests that plague
    geometry libraries need adaptive arithmetic for this; integers
    sidestep it).

    Convexity + winding are the CALLER's contract (validated by
    :func:`validate_convex_ccw`); concave polygons need a ray-cast or
    a convex decomposition.

    Spatial-join shape: polygons are tiny and broadcast; this
    predicate runs scan-side against every point — for selective
    regions, pre-filter with a bounding-box (or geohash cell)
    condition so row groups prune before the exact test.
    """
    n = len(vertices)
    conds = []
    for i in range(n):
        x1, y1 = vertices[i]
        x2, y2 = vertices[(i + 1) % n]
        cross = (x2 - x1) * (y - F.lit(y1)) - (y2 - y1) * (
            x - F.lit(x1)
        )
        conds.append(cross >= 0)
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def validate_convex_ccw(vertices: list[tuple[int, int]]) -> None:
    """Raise unless ``vertices`` form a strictly convex CCW polygon
    (every consecutive edge pair turns left) — the precondition of
    :func:`point_in_convex_polygon`."""
    n = len(vertices)
    if n < 3:
        raise ValueError("polygon needs at least 3 vertices")
    for i in range(n):
        x1, y1 = vertices[i]
        x2, y2 = vertices[(i + 1) % n]
        x3, y3 = vertices[(i + 2) % n]
        cross = (x2 - x1) * (y3 - y2) - (y2 - y1) * (x3 - x2)
        if cross <= 0:
            raise ValueError(
                f"not strictly convex CCW at vertex {i} (cross={cross})"
            )
