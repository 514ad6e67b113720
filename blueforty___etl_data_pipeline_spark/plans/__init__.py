"""Reference-analog pipeline compositions (SURVEY.md §3)."""

from .pipelines import (
    closest_stations,
    closest_stations_grid,
    load_purchases_csv,
    purchase_order_totals,
    purchase_orders_and_invoices,
    purchases_with_weather,
    shred_supplier_invoices,
    supplier_zip5_view,
    supplier_zip_weather,
)

__all__ = [
    "load_purchases_csv",
    "purchase_order_totals",
    "shred_supplier_invoices",
    "purchase_orders_and_invoices",
    "supplier_zip5_view",
    "closest_stations",
    "closest_stations_grid",
    "supplier_zip_weather",
    "purchases_with_weather",
]
