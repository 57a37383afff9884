"""Spatial join (SURVEY.md §2.3 J4).

The reference only *documents* its spatial join — runs to routes via
``ST_Contains`` (ETL Scripts/README.md:200-210) — and never executes
it. Here it is as a Spark-first operator without Sedona: a
grid-bucketed radius join, the standard scale pattern for point
proximity:

1. bucket both sides into lat/lon grid cells sized so one cell spans
   the search radius,
2. explode the (small) places side into its 3x3 cell neighborhood,
3. equi-join on the cell id (broadcast when places is small — no
   cross product, no theta join),
4. filter exactly with the haversine great-circle distance.

The binning is a lossless optimization: provided each cell spans the
radius (see ``lon_cell_deg``), the output equals the exact
cross-join-and-filter answer — which is exactly how the correctness
oracle computes it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0
KM_PER_DEG_LAT = 111.0


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km — pure Column math (codegen'd)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.pow(F.sin(dlon / 2), 2)
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def sql_haversine_km(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """DuckDB mirror of :func:`haversine_km` (same formula, same
    operation order) for oracle queries."""
    return (
        f"2 * {EARTH_RADIUS_KM} * asin(sqrt("
        f"pow(sin(radians({lat2} - {lat1}) / 2), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin(radians({lon2} - {lon1}) / 2), 2)))"
    )


def join_points_in_radius(
    points: DataFrame,
    places: DataFrame,
    radius_km: float,
    point_lat: str = "lat",
    point_lon: str = "lon",
    place_lat: str = "place_lat",
    place_lon: str = "place_lon",
    lon_cell_deg: float | None = None,
    distance_col: str = "distance_km",
) -> DataFrame:
    """All (point, place) pairs within ``radius_km`` — J4 as a
    bin-bucketed equi-join plus exact haversine filter.

    ``lon_cell_deg`` must be at least ``radius_km / (111 * cos(lat))``
    for every latitude in the data; the default (2x the latitude cell)
    is valid to |lat| <= 60°. Oversizing cells only adds candidates —
    never drops pairs — so the join stays exact. Longitude cells wrap
    modulo the globe, so pairs straddling the ±180° antimeridian are
    kept (the haversine filter itself is wrap-correct since
    ``sin(180° − x) = sin(x)``); latitude cells do NOT wrap over the
    poles — polar data needs a latitude bound like any grid scheme.

    Plan shape at scale: the places side (typically 10^2-10^5 rows)
    explodes 9x and broadcasts; the points side shuffles nowhere —
    one scan, a broadcast hash join on the cell id, and a codegen'd
    trig filter. Skewed cells (urban cores) can be salted on the
    points side if one cell dominates.
    """
    import math

    lat_cell = radius_km / KM_PER_DEG_LAT
    lon_cell = lon_cell_deg if lon_cell_deg is not None else 2 * lat_cell
    # Longitude cell ids live on a ring of n_lon cells: lon is shifted
    # to [0, 360) and cell ids wrap with pmod, so a point at 179.9° and
    # a place at −179.9° land in adjacent (joinable) cells. The ring
    # must divide 360° EVENLY: with ceil(360/w) cells of width w, the
    # seam cell is narrower than w and near-seam pairs can sit 2 cells
    # apart, escaping the ±1 neighborhood. So round the cell COUNT
    # down and widen the cells to 360/n_lon (>= the requested width —
    # oversizing only adds candidates, never drops pairs).
    n_lon = max(1, math.floor(360.0 / lon_cell))
    lon_cell = 360.0 / n_lon

    def cells(lat: str, lon: str) -> tuple[Column, Column]:
        return (
            F.floor(F.col(lat) / lat_cell).cast("long"),
            F.pmod(
                F.floor((F.col(lon) + 180.0) / lon_cell).cast("long"),
                F.lit(n_lon).cast("long"),
            ),
        )

    p_cy, p_cx = cells(point_lat, point_lon)
    pts = points.withColumn("__cy", p_cy).withColumn("__cx", p_cx)

    g_cy, g_cx = cells(place_lat, place_lon)
    offsets = F.array(*[F.lit(i) for i in (-1, 0, 1)])
    plc = (
        places.withColumn("__cy0", g_cy)
        .withColumn("__cx0", g_cx)
        .withColumn("__dy", F.explode(offsets))
        .withColumn("__dx", F.explode(offsets))
        .withColumn("__cy", F.col("__cy0") + F.col("__dy"))
        .withColumn(
            "__cx",
            F.pmod(
                F.col("__cx0") + F.col("__dx"), F.lit(n_lon).cast("long")
            ),
        )
        .drop("__cy0", "__cx0", "__dy", "__dx")
    )

    dist = haversine_km(
        F.col(point_lat),
        F.col(point_lon),
        F.col(place_lat),
        F.col(place_lon),
    )
    return (
        pts.join(F.broadcast(plc), ["__cy", "__cx"])
        .withColumn(distance_col, dist)
        .filter(F.col(distance_col) <= radius_km)
        .drop("__cy", "__cx")
    )
