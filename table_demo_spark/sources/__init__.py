"""Sources: batch fixture loaders and the event-replay streaming source."""

from table_demo_spark.sources.batch import (
    RIDES_ORACLE_SQL,
    TABLES,
    load_table,
    register_tables,
    rides_view,
)

__all__ = [
    "RIDES_ORACLE_SQL",
    "TABLES",
    "load_table",
    "register_tables",
    "rides_view",
]
