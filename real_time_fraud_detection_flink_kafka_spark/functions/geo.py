"""Geo expressions, all JVM-side (whole-stage codegen — no Python UDF).

Haversine parity with /root/reference/flink/fraud_detection.py:38-51,
re-expressed as Column arithmetic so Catalyst can codegen it inline
inside the window stage instead of calling back into Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from real_time_fraud_detection_flink_kafka_spark.config import EARTH_RADIUS_KM, LOCATION_COORDS


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km between two (lat, lon) column pairs."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    x = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlon / 2), 2)
    )
    return 2 * F.lit(EARTH_RADIUS_KM) * F.atan2(F.sqrt(x), F.sqrt(1 - x))


def location_lat(loc: Column) -> Column:
    """Latitude lookup for the reference's 5 cities as a CASE chain
    (constant-folded literal map; no join, no shuffle)."""
    expr = F.lit(None).cast("double")
    for name, (lat, _lon) in LOCATION_COORDS.items():
        expr = F.when(loc == name, F.lit(lat)).otherwise(expr)
    return expr


def location_lon(loc: Column) -> Column:
    expr = F.lit(None).cast("double")
    for name, (_lat, lon) in LOCATION_COORDS.items():
        expr = F.when(loc == name, F.lit(lon)).otherwise(expr)
    return expr


def haversine_between_locations(loc_a: Column, loc_b: Column) -> Column:
    """Distance between two known-city location codes (km)."""
    return haversine_km(
        location_lat(loc_a), location_lon(loc_a),
        location_lat(loc_b), location_lon(loc_b),
    )
