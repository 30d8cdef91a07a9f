"""Geo/grid scalar functions — ports of the reference's scalar UDFs.

Reference: ``TaxiFunctions.scala`` (NycConstants :25-37, inNyc :39-45,
toCellId :47-57, toCoords :59-80, hourOfDay :82-85, toLong :87-90) and
``toGeoPoint`` / ``GeoPoint`` (ElasticUpsertTableSink.scala:150-158).

All are native Column expressions: they stay inside whole-stage codegen,
remain pushdown-eligible as filter predicates, and cost nothing at
100 TB compared to a Python UDF round-trip. The arithmetic mirrors the
reference's double-promotion order (floats promoted to double before
the subtraction/divide) so results hash-match a double-precision oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

# NYC bounding box + grid constants (TaxiFunctions.scala:25-37).
LON_EAST = -73.7
LON_WEST = -74.05
LAT_NORTH = 41.0
LAT_SOUTH = 40.5
DELTA_LON = 0.0014  # ~250 cells east-west
DELTA_LAT = 0.00125
GRID_WIDTH = 250


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def in_nyc(lon, lat) -> Column:
    """Bounding-box predicate (TaxiFunctions.scala:39-45).

    ``!(lon > EAST || lon < WEST) && !(lat > NORTH || lat < SOUTH)``
    == inclusive between on both axes.
    """
    lon, lat = _c(lon), _c(lat)
    return lon.between(LON_WEST, LON_EAST) & lat.between(LAT_SOUTH, LAT_NORTH)


def to_cell_id(lon, lat) -> Column:
    """Grid-cell id (TaxiFunctions.scala:47-57).

    xIdx = floor((abs(LON_WEST) - abs(lon)) / DELTA_LON)
    yIdx = floor((LAT_NORTH - lat) / DELTA_LAT)
    cell = xIdx + yIdx * 250
    """
    lon, lat = _c(lon), _c(lat)
    x_idx = F.floor((F.lit(abs(LON_WEST)) - F.abs(lon)) / F.lit(DELTA_LON))
    y_idx = F.floor((F.lit(LAT_NORTH) - lat) / F.lit(DELTA_LAT))
    return (x_idx + y_idx * F.lit(GRID_WIDTH)).cast("int")


def to_coords(cell_id) -> Column:
    """Inverse of :func:`to_cell_id` — cell id -> cell-center (lon, lat)
    struct (TaxiFunctions.scala:59-80). Returns
    ``struct<lon: double, lat: double>`` (the reference's 2-tuple).
    """
    cell = _c(cell_id)
    x_idx = cell % GRID_WIDTH
    y_idx = F.floor(cell / F.lit(GRID_WIDTH))
    lon = -(F.lit(abs(LON_WEST)) - x_idx * F.lit(DELTA_LON) - F.lit(DELTA_LON / 2))
    lat = F.lit(LAT_NORTH) - y_idx * F.lit(DELTA_LAT) - F.lit(DELTA_LAT / 2)
    return F.struct(lon.alias("lon"), lat.alias("lat"))


def hour_of_day(ts_millis) -> Column:
    """``ts % 86_400_000`` — ms-of-day (TaxiFunctions.scala:82-85; the
    reference's name is a misnomer, the formula is ported faithfully).
    """
    return _c(ts_millis) % F.lit(86_400_000)


def to_long_millis(ts) -> Column:
    """Timestamp -> epoch **milliseconds** (TaxiFunctions.scala:87-90).

    NB: Spark's ``cast("long")`` yields epoch seconds; the reference is
    ms end-to-end, so we use ``unix_millis``.
    """
    return F.unix_millis(_c(ts))


def to_geo_point(lon, lat) -> Column:
    """``GeoPoint(lon, lat).toString`` == ``"lat,lon"`` — latitude FIRST
    (the Elasticsearch geo_point string format,
    ElasticUpsertTableSink.scala:150-158).
    """
    return F.format_string("%s,%s", _c(lat), _c(lon))


def register_sql_functions(spark: SparkSession) -> None:
    """Expose the function library to the SQL dialect under the
    reference's registered names (TaxiRideQueries.scala:39-43).

    Spark has no SQL macro facility for Column-expression functions, so
    we register thin Python wrappers ONLY for SQL-dialect parity tests;
    the DataFrame dialect and all hot paths use the native expressions
    above. (The wrappers are row-at-a-time and deliberately not used in
    any benchmarked query.)
    """
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    spark.udf.register(
        "inNyc",
        lambda lon, lat: (
            lon is not None
            and lat is not None
            and LON_WEST <= lon <= LON_EAST
            and LAT_SOUTH <= lat <= LAT_NORTH
        ),
        BooleanType(),
    )

    import math

    def _to_cell_id(lon: float, lat: float) -> int:
        x_idx = math.floor((abs(LON_WEST) - abs(lon)) / DELTA_LON)
        y_idx = math.floor((LAT_NORTH - lat) / DELTA_LAT)
        return int(x_idx + y_idx * GRID_WIDTH)

    spark.udf.register("toCellId", _to_cell_id, IntegerType())

    def _to_coords(cell: int):
        x_idx = cell % GRID_WIDTH
        y_idx = cell // GRID_WIDTH
        lon = -(abs(LON_WEST) - x_idx * DELTA_LON - DELTA_LON / 2)
        lat = LAT_NORTH - y_idx * DELTA_LAT - DELTA_LAT / 2
        return (lon, lat)

    spark.udf.register(
        "toCoords",
        _to_coords,
        StructType(
            [StructField("lon", DoubleType()), StructField("lat", DoubleType())]
        ),
    )
    spark.udf.register("hourOfDay", lambda ts: ts % 86_400_000, LongType())
    spark.udf.register(
        "toGeoPoint", lambda lon, lat: f"{lat},{lon}", StringType()
    )

    import datetime as _dt

    def _to_long(ts: _dt.datetime) -> int:
        return int(ts.replace(tzinfo=_dt.timezone.utc).timestamp() * 1000)

    spark.udf.register("toLong", _to_long, LongType())
