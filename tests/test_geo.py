"""Geo-distance operators (SURVEY.md F13-F16, the EP3 KNN)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blueforty___etl_data_pipeline_spark.functions.geo import haversine_km
from blueforty___etl_data_pipeline_spark.plans.pipelines import (
    closest_stations,
    closest_stations_grid,
)


def _dist(spark, lat1, lon1, lat2, lon2):
    return spark.range(1).select(
        haversine_km(F.lit(lat1), F.lit(lon1), F.lit(lat2), F.lit(lon2)).alias("d")
    ).collect()[0]["d"]


def test_haversine_one_degree_longitude_at_equator(spark):
    # 1° of longitude at the equator ≈ 111.19 km (R=6371).
    assert _dist(spark, 0.0, 0.0, 0.0, 1.0) == pytest.approx(111.19, abs=0.05)


def test_haversine_shrinks_with_latitude(spark):
    d60 = _dist(spark, 60.0, 0.0, 60.0, 1.0)
    assert d60 == pytest.approx(111.19 / 2, abs=0.2)  # cos(60°) = 0.5


def test_haversine_zero_distance(spark):
    assert _dist(spark, 40.0, -75.0, 40.0, -75.0) == 0.0


def test_grid_matches_broadcast_at_high_latitude(spark):
    # Regression for the cos(lat) exactness bug: at lat ~60° a longitude
    # degree is ~55 km, so the old constant 110 km/deg bound wrongly
    # "proved" candidates that a station just outside the 3×3 block
    # (east-west) could beat.  Grid and exhaustive must agree everywhere.
    zips = spark.createDataFrame(
        [(i, 59.0 + (i % 5) * 0.5, float(i * 7 % 40) - 20.0) for i in range(30)],
        "zip_code long, lat double, lon double",
    )
    stations = spark.createDataFrame(
        [
            (s, 58.0 + (s * 3 % 7) * 0.7, float(s * 11 % 44) - 22.0)
            for s in range(40)
        ],
        "NOAA_WEATHER_STATION_ID long, LATITUDE double, LONGITUDE double",
    )
    exact = closest_stations(zips, stations, round_decimals=6)
    grid = closest_stations_grid(zips, stations, cell_deg=1.0, round_decimals=6)
    assert exact.exceptAll(grid).count() == 0
    assert grid.exceptAll(exact).count() == 0


def test_grid_falls_back_when_block_is_empty(spark):
    # One remote zip with no station in its 3×3 neighborhood must still
    # get the global nearest via the fallback scan.
    zips = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 45.0, 90.0)], "zip_code long, lat double, lon double"
    )
    stations = spark.createDataFrame(
        [(7, 0.5, 0.5)], "NOAA_WEATHER_STATION_ID long, LATITUDE double, LONGITUDE double"
    )
    out = closest_stations_grid(zips, stations, cell_deg=2.0, round_decimals=6)
    got = {r["zip_code"]: r["station_id"] for r in out.collect()}
    assert got == {1: 7, 2: 7}


def test_point_in_convex_polygon_and_validator(spark):
    import pytest
    from pyspark.sql import functions as F

    from blueforty___etl_data_pipeline_spark.functions.geo import (
        point_in_convex_polygon,
        validate_convex_ccw,
    )

    tri = [(0, 0), (10, 0), (0, 10)]
    validate_convex_ccw(tri)
    pts = spark.createDataFrame(
        [
            (1, 1, 1),    # interior
            (2, 0, 0),    # vertex (boundary counts as inside)
            (3, 5, 5),    # on the hypotenuse
            (4, 6, 5),    # outside
            (5, -1, 0),   # outside
        ],
        "id long, x long, y long",
    )
    got = {
        r["id"]
        for r in pts.filter(
            point_in_convex_polygon(F.col("x"), F.col("y"), tri)
        ).collect()
    }
    assert got == {1, 2, 3}

    # winding/convexity gates
    with pytest.raises(ValueError, match="convex"):
        validate_convex_ccw([(0, 0), (0, 10), (10, 0)])  # clockwise
    with pytest.raises(ValueError, match="convex"):
        validate_convex_ccw(
            [(0, 0), (10, 0), (5, 2), (10, 10), (0, 10)]  # dent
        )
    with pytest.raises(ValueError, match="at least 3"):
        validate_convex_ccw([(0, 0), (1, 1)])

    # every fixture polygon in the oracle query is valid
    import __spark_entry__ as e

    for verts in e._POLYGONS.values():
        validate_convex_ccw(verts)
