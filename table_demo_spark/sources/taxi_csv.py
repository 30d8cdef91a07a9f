"""The reference's CSV record format (S2) as native expressions.

Reference: ``TaxiRide.java`` —
- ``toString`` (:71-89): ``rideId,START|END,ts,ts,startLon,startLat,
  endLon,endLat,passengerCnt`` where the event type decides which
  timestamp is serialized first (START: start,end; END: end,start),
  timestamps formatted ``yyyy-MM-dd HH:mm:ss`` in UTC (:41-42).
- ``fromString`` (:91-129): strict 9-field arity (:94-96), event-type
  switch with the swapped timestamp parse (:102-115), empty coordinate
  tokens default to ``0.0f`` (:118-121), RuntimeException on malformed
  records.

Both directions are pure Column expressions (codegen'd, 100 TB-safe).
Float/double -> string uses the engines' shortest-roundtrip repr, which
Spark and DuckDB agree on (verified for the fixture value domain), so
the serializer itself is oracle-checkable, and the parser via roundtrip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TIME_FMT = "yyyy-MM-dd HH:mm:ss"  # TaxiRide.java:41-42 (UTC)


def ride_to_csv_line(
    ride_id: Column,
    is_start: Column,
    start_time: Column,
    end_time: Column,
    start_lon: Column,
    start_lat: Column,
    end_lon: Column,
    end_lat: Column,
    passenger_cnt: Column,
) -> Column:
    """``TaxiRide.toString`` (TaxiRide.java:71-89)."""
    first = F.when(is_start, start_time).otherwise(end_time)
    second = F.when(is_start, end_time).otherwise(start_time)
    return F.concat_ws(
        ",",
        ride_id.cast("string"),
        F.when(is_start, "START").otherwise("END"),
        F.date_format(first, TIME_FMT),
        F.date_format(second, TIME_FMT),
        start_lon.cast("float").cast("string"),
        start_lat.cast("float").cast("string"),
        end_lon.cast("float").cast("string"),
        end_lat.cast("float").cast("string"),
        passenger_cnt.cast("string"),
    )


def _coord(tok: Column) -> Column:
    """Empty coordinate token -> 0.0f (TaxiRide.java:118-121)."""
    return F.when(F.length(tok) > 0, tok.cast("float")).otherwise(
        F.lit(0.0).cast("float")
    )


def parse_taxi_csv(
    lines: DataFrame, line_col: str = "line", keep_line: bool = False
) -> DataFrame:
    """``TaxiRide.fromString`` (TaxiRide.java:91-129) over a DataFrame of
    CSV lines: strict arity + event-type validation (malformed records
    raise, like the reference's RuntimeException), swapped timestamp
    columns by event type, empty-coordinate defaulting.
    """
    line = F.col(line_col)
    toks = F.split(line, ",", -1)
    invalid = F.raise_error(F.concat(F.lit("Invalid record: "), line))
    ok = (F.size(toks) == 9) & F.element_at(toks, 2).isin("START", "END")

    def guard(c: Column) -> Column:
        return F.when(ok, c).otherwise(invalid)

    t = [F.element_at(toks, i + 1) for i in range(9)]
    is_start = t[1] == "START"
    ts_first = F.to_timestamp(t[2], TIME_FMT)
    ts_second = F.to_timestamp(t[3], TIME_FMT)
    return lines.select(
        *([line.alias(line_col)] if keep_line else []),
        guard(t[0].cast("long")).alias("ride_id"),
        guard(is_start).alias("is_start"),
        guard(F.when(is_start, ts_first).otherwise(ts_second)).alias("start_time"),
        guard(F.when(is_start, ts_second).otherwise(ts_first)).alias("end_time"),
        guard(_coord(t[4])).alias("start_lon"),
        guard(_coord(t[5])).alias("start_lat"),
        guard(_coord(t[6])).alias("end_lon"),
        guard(_coord(t[7])).alias("end_lat"),
        guard(t[8].cast("short")).alias("passenger_cnt"),
    )
