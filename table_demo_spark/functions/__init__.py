"""Scalar function library.

Every reference scalar UDF (TaxiFunctions.scala:39-90,
ElasticUpsertTableSink.scala:150-158) is re-expressed as a **native
Column expression** — composable, whole-stage-codegen'd, predicate-
pushdown-safe — rather than a Python UDF. ``register_sql_functions``
exposes the same names to the SQL dialect, mirroring the reference's
``tEnv.registerFunction`` calls (TaxiRideQueries.scala:39-43).
"""

from table_demo_spark.functions.taxi import (
    LAT_NORTH,
    LAT_SOUTH,
    LON_EAST,
    LON_WEST,
    hour_of_day,
    in_nyc,
    register_sql_functions,
    to_cell_id,
    to_coords,
    to_geo_point,
    to_long_millis,
)

__all__ = [
    "LAT_NORTH",
    "LAT_SOUTH",
    "LON_EAST",
    "LON_WEST",
    "hour_of_day",
    "in_nyc",
    "register_sql_functions",
    "to_cell_id",
    "to_coords",
    "to_geo_point",
    "to_long_millis",
]
