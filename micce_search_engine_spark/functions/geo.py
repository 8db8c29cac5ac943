"""Geo operators: radius filter (Q5) and closeness rank profile (Q10).

Reference: `geoLocation(spot_geo_location, lat, lon, "200km")` with a
hard-coded 200 km radius
(/root/reference/search-api/internal/repository/query/whereQuery.go:59-77,
convertGeoQuery.go:10) and the live rank profile `first-phase:
closeness(spot_geo_location)`
(/root/reference/search-engine/schemas/spot/spot.profile:3-5).

The web-corpus pages table has no coordinates (SURVEY.md §2A Q5), so
these are standalone Column operators: pure trig math, JVM-side
whole-stage codegen, no UDF. Closeness is mapped to 1/(1+km) — a
monotone analog of Vespa's closeness for ranking purposes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0
DEFAULT_RADIUS_KM = 200.0  # convertGeoQuery.go:10


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    rlat1, rlon1 = F.radians(lat1), F.radians(lon1)
    rlat2, rlon2 = F.radians(lat2), F.radians(lon2)
    dlat = rlat2 - rlat1
    dlon = rlon2 - rlon1
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geo_radius_filter(
    lat: Column, lon: Column, center_lat: float, center_lon: float,
    radius_km: float = DEFAULT_RADIUS_KM,
) -> Column:
    """Boolean predicate: point within radius_km of center (Q5)."""
    return haversine_km(
        lat, lon, F.lit(float(center_lat)), F.lit(float(center_lon))
    ) <= F.lit(float(radius_km))


def closeness(
    lat: Column, lon: Column, center_lat: float, center_lon: float
) -> Column:
    """Geo-proximity rank score in (0, 1]: 1 / (1 + distance_km) —
    the engine's analog of Vespa's first-phase closeness (Q10)."""
    return F.lit(1.0) / (
        F.lit(1.0)
        + haversine_km(lat, lon, F.lit(float(center_lat)), F.lit(float(center_lon)))
    )
