"""EP3 end-to-end on reference-shaped fixtures: supplier extract →
ZIP5 view → closest stations → weather enrichment (BlueForty.py:239-476),
with golden row-count checkpoints in the role of the reference's four
hand-checked counts (:234, :449, :464, :476)."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from blueforty___etl_data_pipeline_spark.functions.inference import (
    infer_csv_schema,
)
from blueforty___etl_data_pipeline_spark.plans.pipelines import (
    closest_stations,
    purchases_with_weather,
    supplier_zip5_view,
    supplier_zip_weather,
)
from blueforty___etl_data_pipeline_spark.sources.csv import read_csv


def _supplier_case(spark, fixtures_dir):
    path = os.path.join(fixtures_dir, "supplier", "supplier_case.csv")
    schema = infer_csv_schema(path)  # dynamic inference, like the reference
    return read_csv(spark, path, schema=schema)


def test_supplier_zip5_golden(spark, fixtures_dir):
    out = supplier_zip5_view(_supplier_case(spark, fixtures_dir))
    rows = {r["supplierid"]: r["ZIP5"] for r in out.collect()}
    # supplier 12 has null + empty postals → filtered; 13's 'abc12' pads
    # then strips to '12' (the reference's quirk, preserved).
    assert rows == {10: "90210", 11: "30301", 13: "12"}


def _stations(spark):
    return spark.createDataFrame(
        [
            (100, 34.1, -118.3),  # near 90210
            (200, 33.6, -84.4),  # near 30301
            (300, 40.1, -75.1),  # near zip '12'
            (400, 0.0, 0.0),  # far from everything
        ],
        "NOAA_WEATHER_STATION_ID long, LATITUDE double, LONGITUDE double",
    )


def _zips_geo(spark, fixtures_dir):
    zips = supplier_zip5_view(_supplier_case(spark, fixtures_dir)).select(
        F.col("ZIP5").alias("zip_code")
    )
    gaz = read_csv(
        spark,
        os.path.join(fixtures_dir, "supplier", "zipcode_geolocation.tsv"),
        options={"header": "true", "sep": "\t", "mode": "PERMISSIVE"},
    ).select(
        "zip_code",
        F.col("lat").cast("double").alias("lat"),
        F.col("lon").cast("double").alias("lon"),
    )
    return zips.join(gaz, on="zip_code")


def test_closest_stations_golden(spark, fixtures_dir):
    closest = closest_stations(_zips_geo(spark, fixtures_dir), _stations(spark))
    got = {r["zip_code"]: r["station_id"] for r in closest.collect()}
    # Golden: 3 rows (the CLOSEST_STATIONS 8-row checkpoint analog, :449).
    assert got == {"90210": 100, "30301": 200, "12": 300}


def test_weather_enrichment_golden(spark, fixtures_dir):
    closest = closest_stations(_zips_geo(spark, fixtures_dir), _stations(spark))
    d1, d2 = datetime.datetime(2013, 1, 5), datetime.datetime(2013, 1, 15)
    ts = spark.createDataFrame(
        [
            (100, d1, "Maximum Temperature", 18.5),
            (100, d1, "Minimum Temperature", 7.0),  # filtered out
            (200, d2, "Maximum Temperature", 11.0),
            (300, d1, "Maximum Temperature", 2.0),
            (400, d1, "Maximum Temperature", 30.0),  # unmatched station
        ],
        "NOAA_WEATHER_STATION_ID long, DATE timestamp, VARIABLE_NAME string,"
        " VALUE double",
    )
    weather = supplier_zip_weather(closest, ts)
    rows = {(r["zip_code"], r["date"]): r["high_temperature"] for r in weather.collect()}
    # Golden: 3 rows (the 28.6k checkpoint analog, :464).
    assert rows == {
        ("90210", d1.date()): 18.5,
        ("30301", d2.date()): 11.0,
        ("12", d1.date()): 2.0,
    }

    # Final 3-way join (the 1.7k checkpoint analog, :476): reconciliation
    # rows enriched where supplier zip + order date match the weather.
    reconciliation = spark.createDataFrame(
        [
            (1, d1.date(), 10, 50.0, 50.0, 0.0),  # 90210 @ d1 → matches
            (2, d2.date(), 11, 21.75, 21.75, 0.0),  # 30301 @ d2 → matches
            (3, d2.date(), 10, 9.0, 9.0, 0.0),  # 90210 @ d2 → no weather
        ],
        "PurchaseOrderID long, OrderDate date, SupplierID long,"
        " POAmount double, InvoiceExTaxTotal double, invoiced_vs_quoted double",
    )
    supplier_case = spark.createDataFrame(
        [(10, "Acme", "90210"), (11, "Globex", "30301")],
        "supplierid long, suppliername string, postalpostalcode string",
    )
    final = purchases_with_weather(reconciliation, supplier_case, weather)
    got = {r["PurchaseOrderID"]: r["high_temperature"] for r in final.collect()}
    assert got == {1: 18.5, 2: 11.0}
