"""The reference's three relational queries, re-expressed Spark-first.

Reference: ``TaxiRideQueries.scala`` —
- Q1 ``departuresPerTenMinsTumble`` (:72-101): filter -> cell projection
  -> tumbling event-time window -> count -> window-end cast to epoch ms.
- Q1-SQL ``departuresPerTenMinsTumbleSQL`` (:104-128): the same query in
  the SQL dialect, with a nested SELECT composing toCoords(toCellId(..))
  and toLong — proves dialect equivalence.
- Q2 ``freqDeptLocations`` (:130-146): time-range over-window running
  count per cell + post-aggregation (HAVING-like) threshold filter.
- Q3 ``departureCntFreq`` (:148-167): chained aggregation — count per
  cell, then histogram of those counts.

The queries run over the rides-shaped derivation of the ``events``
fixture (sources/batch.py). Window widths are parameterized; the
fixture queries use 1-day tumble / 7-day range (the fixture's event
density is ~33 events/cell/month, so the reference's 10-minute windows
would make every aggregate trivially 1 — the OPERATORS are identical,
only the interval literal differs, as allowed by SURVEY §1.3).

Scale notes (100 TB): every query below is a single hash-shuffle on its
grouping key — filters and projections are pushed into the parquet scan
by Catalyst; the cell-id arithmetic is whole-stage-codegen'd; no Python
touches the hot path. The over-window in Q2 shuffles once on `cell` and
sorts within partitions — at 100 TB the per-cell partitions are the
unit of parallelism, and AQE splits skewed cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from table_demo_spark.functions.taxi import in_nyc, to_cell_id, to_coords
from table_demo_spark.queries import Query
from table_demo_spark.sources.batch import RIDES_ORACLE_SQL, rides_view

TUMBLE = "1 day"
TUMBLE_MS = 86_400_000
OVER_RANGE_MS = 7 * 86_400_000
Q2_THRESHOLD = 10
Q3_THRESHOLD = 10  # reference: .filter('deptCnt > 10) analog

# ---------------------------------------------------------------------------
# Shared oracle SQL fragments (DuckDB dialect-safe ANSI). Bare decimal
# literals are DECIMAL in DuckDB => cast everything to DOUBLE to mirror
# Spark's float math (SURVEY §2.4 precision note).
# ---------------------------------------------------------------------------
SQL_IN_NYC = (
    "({lon} BETWEEN CAST(-74.05 AS DOUBLE) AND CAST(-73.7 AS DOUBLE) "
    "AND {lat} BETWEEN CAST(40.5 AS DOUBLE) AND CAST(41.0 AS DOUBLE))"
)
SQL_CELL = (
    "CAST(FLOOR((ABS(CAST(-74.05 AS DOUBLE)) - ABS({lon})) / CAST(0.0014 AS DOUBLE))"
    " + FLOOR((CAST(41.0 AS DOUBLE) - {lat}) / CAST(0.00125 AS DOUBLE)) * 250 AS INT)"
)

_RIDES_CTE = f"WITH rides AS ({RIDES_ORACLE_SQL})"

_DEPARTURES_CTE = f"""{_RIDES_CTE},
departures AS (
  SELECT
    ride_id,
    {SQL_CELL.format(lon='start_lon', lat='start_lat')} AS cell,
    rowtime
  FROM rides
  WHERE is_start AND {SQL_IN_NYC.format(lon='start_lon', lat='start_lat')}
)"""


def _departures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter(isStart && inNyc) -> select(rideId, toCellId(...) as cell,
    rowtime) — TaxiRideQueries.scala:74-78 / :132-135 / :150-152."""
    rides = rides_view(spark, sf_dir)
    return rides.filter(
        F.col("is_start") & in_nyc("start_lon", "start_lat")
    ).select(
        "ride_id",
        to_cell_id("start_lon", "start_lat").alias("cell"),
        "rowtime",
    )


# ---------------------------------------------------------------------------
# Q1 — tumbling-window departure counts per cell (Table API dialect).
# ---------------------------------------------------------------------------
def q1_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TaxiRideQueries.scala:72-101 — groupBy(cell, Tumble over interval
    on rowtime).select(cell, w.end.cast(LONG) as deptTime, count)."""
    return (
        _departures(spark, sf_dir)
        .groupBy(
            "cell",
            F.window("rowtime", TUMBLE).alias("w"),
        )
        .agg(F.count("ride_id").alias("dept_cnt"))
        .select(
            "cell",
            F.unix_millis(F.col("w.end")).alias("dept_time"),
            "dept_cnt",
        )
    )


Q1_ORACLE = f"""{_DEPARTURES_CTE}
SELECT
  cell,
  (epoch_ms(rowtime) // {TUMBLE_MS}) * {TUMBLE_MS} + {TUMBLE_MS} AS dept_time,
  count(ride_id) AS dept_cnt
FROM departures
GROUP BY cell, (epoch_ms(rowtime) // {TUMBLE_MS}) * {TUMBLE_MS} + {TUMBLE_MS}
"""


# ---------------------------------------------------------------------------
# Q1-SQL — the identical query through the SQL dialect, nested-SELECT
# UDF composition included (dialect-equivalence proof).
# ---------------------------------------------------------------------------
def q1_tumble_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TaxiRideQueries.scala:104-128 — SQL text over the registered
    `rides` view; outer SELECT re-projects the inner (toCoords over
    toCellId), collapsed by Catalyst into the same plan as Q1."""
    rides_view(spark, sf_dir).createOrReplaceTempView("rides")
    inner = f"""
      SELECT
        to_cell_id_sql(start_lon, start_lat) AS cell,
        window(rowtime, '{TUMBLE}').end AS w_end,
        count(ride_id) AS dept_cnt
      FROM rides
      WHERE is_start AND (start_lon BETWEEN -74.05D AND -73.7D
                          AND start_lat BETWEEN 40.5D AND 41.0D)
      GROUP BY to_cell_id_sql(start_lon, start_lat), window(rowtime, '{TUMBLE}')
    """
    # Register the cell function for the SQL dialect as a *SQL* body so
    # the plan stays native (no Python round-trip) — the Spark analog of
    # tEnv.registerFunction (TaxiRideQueries.scala:40).
    spark.sql("DROP TEMPORARY FUNCTION IF EXISTS to_cell_id_sql")
    spark.sql(
        """
        CREATE TEMPORARY FUNCTION to_cell_id_sql(lon DOUBLE, lat DOUBLE)
        RETURNS INT
        RETURN CAST(FLOOR((ABS(-74.05D) - ABS(lon)) / 0.0014D)
                    + FLOOR((41.0D - lat) / 0.00125D) * 250 AS INT)
        """
    )
    return spark.sql(
        f"""
        SELECT cell,
               unix_millis(w_end) AS dept_time,
               dept_cnt
        FROM ({inner})
        """
    )


# ---------------------------------------------------------------------------
# Q2 — running departure count per cell over a preceding event-time
# range; keep rows above a threshold (over-window + HAVING-like filter).
# ---------------------------------------------------------------------------
def q2_over_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TaxiRideQueries.scala:130-146 — Over partitionBy cell orderBy
    rowtime preceding <range>; count over w; filter(deptCnt > N)."""
    w = (
        Window.partitionBy("cell")
        .orderBy(F.unix_millis("rowtime"))
        .rangeBetween(-OVER_RANGE_MS, 0)
    )
    return (
        _departures(spark, sf_dir)
        .select(
            "ride_id",
            "cell",
            F.unix_millis("rowtime").alias("rowtime_ms"),
            F.count("ride_id").over(w).alias("dept_cnt"),
        )
        .filter(F.col("dept_cnt") > Q2_THRESHOLD)
    )


Q2_ORACLE = f"""{_DEPARTURES_CTE}
SELECT * FROM (
  SELECT
    ride_id,
    cell,
    epoch_ms(rowtime) AS rowtime_ms,
    count(ride_id) OVER (
      PARTITION BY cell ORDER BY epoch_ms(rowtime)
      RANGE BETWEEN {OVER_RANGE_MS} PRECEDING AND CURRENT ROW
    ) AS dept_cnt
  FROM departures
)
WHERE dept_cnt > {Q2_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# Q3 — chained aggregation: departures per cell, then the histogram
# "how many cells saw N departures".
# ---------------------------------------------------------------------------
def q3_cnt_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TaxiRideQueries.scala:148-167 — groupBy(cell).count as deptCnt,
    then groupBy(deptCnt).count as cntFreq, filtered deptCnt > N."""
    per_cell = (
        _departures(spark, sf_dir)
        .groupBy("cell")
        .agg(F.count("ride_id").alias("dept_cnt"))
        .filter(F.col("dept_cnt") > Q3_THRESHOLD)
    )
    return per_cell.groupBy("dept_cnt").agg(
        F.count("cell").alias("cnt_freq")
    )


Q3_ORACLE = f"""{_DEPARTURES_CTE},
per_cell AS (
  SELECT cell, count(ride_id) AS dept_cnt
  FROM departures
  GROUP BY cell
  HAVING count(ride_id) > {Q3_THRESHOLD}
)
SELECT dept_cnt, count(cell) AS cnt_freq
FROM per_cell
GROUP BY dept_cnt
"""


# ---------------------------------------------------------------------------
# Q4 — cell-center re-projection (exercises toCoords, the F3 inverse
# function, as a query over Q1's result — mirrors the Q1-SQL nested
# projection with toCoords(toCellId(...)), TaxiRideQueries.scala:108-116).
# ---------------------------------------------------------------------------
def q4_cell_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = q1_tumble(spark, sf_dir)
    coords = to_coords(F.col("cell"))
    return agg.select(
        "cell",
        coords["lon"].alias("lon"),
        coords["lat"].alias("lat"),
        "dept_time",
        "dept_cnt",
    )


Q4_ORACLE = f"""{_DEPARTURES_CTE},
agg AS (
  SELECT
    cell,
    (epoch_ms(rowtime) // {TUMBLE_MS}) * {TUMBLE_MS} + {TUMBLE_MS} AS dept_time,
    count(ride_id) AS dept_cnt
  FROM departures
  GROUP BY 1, 2
)
SELECT
  cell,
  -(ABS(CAST(-74.05 AS DOUBLE)) - (cell % 250) * CAST(0.0014 AS DOUBLE)
    - CAST(0.0007 AS DOUBLE)) AS lon,
  CAST(41.0 AS DOUBLE) - FLOOR(cell / CAST(250 AS DOUBLE)) * CAST(0.00125 AS DOUBLE)
    - CAST(0.000625 AS DOUBLE) AS lat,
  dept_time,
  dept_cnt
FROM agg
"""


# ---------------------------------------------------------------------------
# Q5 — geo-point strings + ms-of-day (covers F4 hourOfDay and F6
# toGeoPoint, the remaining reference scalar functions, in the oracle
# gate; mirrors the Q1-SQL outer projection toGeoPoint(toCoords(...)),
# TaxiRideQueries.scala:108-112).
# ---------------------------------------------------------------------------
def q5_geo_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.functions.taxi import hour_of_day, to_geo_point

    agg = q1_tumble(spark, sf_dir)
    coords = to_coords(F.col("cell"))
    return agg.select(
        "cell",
        to_geo_point(coords["lon"], coords["lat"]).alias("geo_point"),
        hour_of_day(F.col("dept_time")).alias("ms_of_day"),
        "dept_cnt",
    )


Q5_ORACLE = f"""{_DEPARTURES_CTE},
agg AS (
  SELECT
    cell,
    (epoch_ms(rowtime) // {TUMBLE_MS}) * {TUMBLE_MS} + {TUMBLE_MS} AS dept_time,
    count(ride_id) AS dept_cnt
  FROM departures
  GROUP BY 1, 2
),
c AS (
  SELECT
    cell,
    -(ABS(CAST(-74.05 AS DOUBLE)) - (cell % 250) * CAST(0.0014 AS DOUBLE)
      - CAST(0.0007 AS DOUBLE)) AS lon,
    CAST(41.0 AS DOUBLE) - FLOOR(cell / CAST(250 AS DOUBLE)) * CAST(0.00125 AS DOUBLE)
      - CAST(0.000625 AS DOUBLE) AS lat,
    dept_time,
    dept_cnt
  FROM agg
)
SELECT cell,
       CAST(lat AS VARCHAR) || ',' || CAST(lon AS VARCHAR) AS geo_point,
       dept_time % 86400000 AS ms_of_day,
       dept_cnt
FROM c
"""


# ---------------------------------------------------------------------------
# S2 — CSV record-format roundtrip: serialize rides with the reference's
# toString, blank out some coordinate tokens, parse back with the strict
# fromString port. The line itself AND every parsed field are
# hash-checked against the oracle doing the same in SQL.
# ---------------------------------------------------------------------------
def s2_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.sources.taxi_csv import (
        parse_taxi_csv,
        ride_to_csv_line,
        shaped_rides,
    )

    shaped = shaped_rides(spark, sf_dir).withColumn(
        "blank", F.col("ride_id") % 50 == 0
    )
    line0 = ride_to_csv_line(
        F.col("ride_id"),
        F.col("is_start"),
        F.col("start_time"),
        F.col("end_time"),
        F.col("start_lon"),
        F.col("start_lat"),
        F.col("end_lon"),
        F.col("end_lat"),
        F.col("passenger_cnt"),
    )
    toks = F.split(line0, ",", -1)
    # empty-coordinate variant (TaxiRide.java:118-121): blank startLon
    blanked = F.array_join(
        F.concat(
            F.slice(toks, 1, 4), F.array(F.lit("")), F.slice(toks, 6, 4)
        ),
        ",",
    )
    lines = shaped.select(
        F.when(F.col("blank"), blanked).otherwise(line0).alias("line")
    )
    parsed = parse_taxi_csv(lines, keep_line=True)
    return parsed.select(
        "line",
        "ride_id",
        "is_start",
        F.unix_millis("start_time").alias("start_ms"),
        F.unix_millis("end_time").alias("end_ms"),
        "start_lon",
        "start_lat",
        "end_lon",
        "end_lat",
        "passenger_cnt",
    )


_CSV_FMT = "%Y-%m-%d %H:%M:%S"
S2_ORACLE = f"""{_RIDES_CTE},
shaped AS (
  SELECT ride_id, is_start,
    CASE WHEN is_start THEN rowtime ELSE rowtime - INTERVAL 20 MINUTE END AS start_ts,
    CASE WHEN is_start THEN rowtime + INTERVAL 20 MINUTE ELSE rowtime END AS end_ts,
    CAST(start_lon AS FLOAT) AS slon, CAST(start_lat AS FLOAT) AS slat,
    CAST(end_lon AS FLOAT) AS elon, CAST(end_lat AS FLOAT) AS elat,
    passenger_cnt, ride_id % 50 = 0 AS blank
  FROM rides
),
lines0 AS (
  SELECT blank, concat_ws(',',
    CAST(ride_id AS VARCHAR),
    CASE WHEN is_start THEN 'START' ELSE 'END' END,
    strftime(CASE WHEN is_start THEN start_ts ELSE end_ts END, '{_CSV_FMT}'),
    strftime(CASE WHEN is_start THEN end_ts ELSE start_ts END, '{_CSV_FMT}'),
    CAST(slon AS VARCHAR), CAST(slat AS VARCHAR),
    CAST(elon AS VARCHAR), CAST(elat AS VARCHAR),
    CAST(passenger_cnt AS VARCHAR)) AS line0
  FROM shaped
),
lines AS (
  SELECT CASE WHEN blank THEN
    array_to_string(list_concat(list_concat(
      string_split(line0, ',')[1:4], ['']), string_split(line0, ',')[6:9]), ',')
  ELSE line0 END AS line
  FROM lines0
),
parsed AS (SELECT line, string_split(line, ',') AS t FROM lines)
SELECT
  line,
  CAST(t[1] AS BIGINT) AS ride_id,
  t[2] = 'START' AS is_start,
  epoch_ms(CASE WHEN t[2] = 'START' THEN strptime(t[3], '{_CSV_FMT}')
                ELSE strptime(t[4], '{_CSV_FMT}') END) AS start_ms,
  epoch_ms(CASE WHEN t[2] = 'START' THEN strptime(t[4], '{_CSV_FMT}')
                ELSE strptime(t[3], '{_CSV_FMT}') END) AS end_ms,
  CASE WHEN length(t[5]) > 0 THEN CAST(t[5] AS FLOAT) ELSE CAST(0.0 AS FLOAT) END AS start_lon,
  CASE WHEN length(t[6]) > 0 THEN CAST(t[6] AS FLOAT) ELSE CAST(0.0 AS FLOAT) END AS start_lat,
  CASE WHEN length(t[7]) > 0 THEN CAST(t[7] AS FLOAT) ELSE CAST(0.0 AS FLOAT) END AS end_lon,
  CASE WHEN length(t[8]) > 0 THEN CAST(t[8] AS FLOAT) ELSE CAST(0.0 AS FLOAT) END AS end_lat,
  CAST(t[9] AS SMALLINT) AS passenger_cnt
FROM parsed
"""


# ---------------------------------------------------------------------------
# S1 — gzip-CSV ingestion: the reference's actual input format (a
# gzipped file of TaxiRide.toString lines, TaxiRideSource.java:109-110)
# read through Spark's transparent gzip codec and the strict fromString
# parser. The fixture is materialized deterministically from the events
# parquet (one .gz per partition — gzip isn't splittable, so many
# files IS the scale shape), then parsed back; the oracle recomputes
# the same records straight from the parquet (serialization is
# identity on the value domain: shortest-roundtrip floats, ms -> s
# timestamp truncation).
# ---------------------------------------------------------------------------
def s1_csv_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_demo_spark.sources.taxi_csv import (
        ensure_rides_csv_gz,
        parse_taxi_csv,
    )

    path = ensure_rides_csv_gz(spark, sf_dir)
    lines = spark.read.text(path).withColumnRenamed("value", "line")
    parsed = parse_taxi_csv(lines)
    return parsed.select(
        "ride_id",
        "is_start",
        F.unix_millis("start_time").alias("start_ms"),
        F.unix_millis("end_time").alias("end_ms"),
        "start_lon",
        "start_lat",
        "end_lon",
        "end_lat",
        "passenger_cnt",
    )


S1_GZIP_ORACLE = f"""{_RIDES_CTE},
shaped AS (
  SELECT ride_id, is_start,
    date_trunc('second',
      CASE WHEN is_start THEN rowtime ELSE rowtime - INTERVAL 20 MINUTE END)
      AS start_ts,
    date_trunc('second',
      CASE WHEN is_start THEN rowtime + INTERVAL 20 MINUTE ELSE rowtime END)
      AS end_ts,
    CAST(start_lon AS FLOAT) AS slon, CAST(start_lat AS FLOAT) AS slat,
    CAST(end_lon AS FLOAT) AS elon, CAST(end_lat AS FLOAT) AS elat,
    passenger_cnt
  FROM rides
)
SELECT
  ride_id,
  is_start,
  epoch_ms(start_ts) AS start_ms,
  epoch_ms(end_ts) AS end_ms,
  slon AS start_lon,
  slat AS start_lat,
  elon AS end_lon,
  elat AS end_lat,
  CAST(passenger_cnt AS SMALLINT) AS passenger_cnt
FROM shaped
"""


QUERIES: list[Query] = [
    Query("ref_q1_tumble", q1_tumble, Q1_ORACLE),
    Query("ref_q1_tumble_sql", q1_tumble_sql, Q1_ORACLE),
    Query("ref_q2_over_range", q2_over_range, Q2_ORACLE),
    Query("ref_q3_cnt_freq", q3_cnt_freq, Q3_ORACLE),
    Query("ref_q4_cell_coords", q4_cell_coords, Q4_ORACLE),
    Query("ref_q5_geo_points", q5_geo_points, Q5_ORACLE),
    Query("ref_s2_csv_roundtrip", s2_csv_roundtrip, S2_ORACLE),
    Query("ref_s1_csv_gzip", s1_csv_gzip, S1_GZIP_ORACLE),
]
