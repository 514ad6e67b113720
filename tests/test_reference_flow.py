"""The complete reference script end-to-end in one call — the
'switch from the reference' acceptance test, on reference-shaped
fixtures with golden checkpoints."""

from __future__ import annotations

import datetime
import os

from blueforty___etl_data_pipeline_spark.plans.reference_flow import (
    run_reference_flow,
)


def _stations(spark):
    return spark.createDataFrame(
        [(100, 34.1, -118.3), (200, 33.6, -84.4), (300, 40.1, -75.1)],
        "NOAA_WEATHER_STATION_ID long, LATITUDE double, LONGITUDE double",
    )


def _weather(spark):
    d = datetime.datetime(2013, 1, 5)
    return spark.createDataFrame(
        [
            (100, d, "Maximum Temperature", 18.5),
            (100, d, "Minimum Temperature", 7.0),
            (300, d, "Maximum Temperature", 2.0),
        ],
        "NOAA_WEATHER_STATION_ID long, DATE timestamp, VARIABLE_NAME string,"
        " VALUE double",
    )


def test_full_reference_flow(spark, fixtures_dir, tmp_path):
    out = run_reference_flow(
        spark,
        purchases_csv_dir=os.path.join(fixtures_dir, "purchases"),
        invoices_xml=os.path.join(fixtures_dir, "xml", "supplier_invoices.xml"),
        supplier_case_csv=os.path.join(
            fixtures_dir, "supplier", "supplier_case.csv"
        ),
        zip_geo_tsv=os.path.join(
            fixtures_dir, "supplier", "zipcode_geolocation.tsv"
        ),
        stations=_stations(spark),
        weather_timeseries=_weather(spark),
        materialize_dir=str(tmp_path / "ctas"),
    )
    # Golden checkpoints (the reference's four row-count comments,
    # BlueForty.py:234, :449, :464, :476, scaled to the fixtures):
    assert out["purchases"].count() == 5
    assert out["supplier_invoices"].count() == 3
    recon = out["purchase_orders_and_invoices"].collect()
    assert len(recon) == 2  # invoices for PO 1 and PO 2 only
    deltas = {r["PurchaseOrderID"]: float(r["invoiced_vs_quoted"]) for r in recon}
    assert deltas == {1: 0.0, 2: 0.0}  # invoiced exactly what was quoted
    assert out["closest_stations"].count() == 3
    assert out["supplier_zip_code_weather"].count() == 2  # max-temp rows only
    # PO 1 ordered 2013-01-05 from supplier 10 (zip 90210, station 100,
    # 18.5°C that day) — the only (zip, date) with weather.
    final = out["purchases_with_weather"].collect()
    assert len(final) == 1
    assert final[0]["PurchaseOrderID"] == 1
    assert final[0]["high_temperature"] == 18.5

    # Temp views registered (the Snowflake-session analog)...
    assert spark.sql("SELECT COUNT(*) FROM purchases_with_weather").collect()[0][0] == 1
    # ...and the three CTAS tables materialized.
    assert spark.read.parquet(str(tmp_path / "ctas" / "purchases_with_weather")).count() == 1
