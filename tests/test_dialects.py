"""Dialect-equivalence (SURVEY §5.4): a query expressed through the
DataFrame API and through spark.sql over the same catalog must produce
identical results — the reference's Q1 vs Q1-SQL pairing
(TaxiRideQueries.scala:72-128), generalized."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _canon(df):
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


def test_q1_dataframe_vs_sql_dialect(spark):
    from table_demo_spark.queries.reference import q1_tumble, q1_tumble_sql

    a = _canon(q1_tumble(spark, SF_SMOKE))
    b = _canon(q1_tumble_sql(spark, SF_SMOKE))
    assert a.equals(b)


def test_sql_dialect_re_registration_is_idempotent(spark):
    from table_demo_spark.queries.reference import q1_tumble_sql

    n1 = q1_tumble_sql(spark, SF_SMOKE).count()
    n2 = q1_tumble_sql(spark, SF_SMOKE).count()  # re-registers temp fn
    assert n1 == n2 > 0


def test_analytics_dataframe_vs_sql_dialect(spark):
    from table_demo_spark.sources.batch import register_tables

    register_tables(spark, SF_SMOKE)
    df_side = (
        spark.table("orders")
        .join(spark.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )
    sql_side = spark.sql(
        """
        SELECT c_mktsegment,
               count(1) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """
    )
    assert _canon(df_side).equals(_canon(sql_side))


def test_reference_udf_names_callable_from_sql(spark):
    """The reference's registered function names
    (TaxiRideQueries.scala:39-43) resolve in the SQL dialect."""
    from table_demo_spark.functions.taxi import register_sql_functions

    register_sql_functions(spark)
    row = spark.sql(
        """
        SELECT inNyc(CAST(-74.0 AS DOUBLE), CAST(40.75 AS DOUBLE)) AS a,
               toCellId(CAST(-74.0 AS DOUBLE), CAST(40.75 AS DOUBLE)) AS c,
               toGeoPoint(CAST(-74.0 AS DOUBLE), CAST(40.75 AS DOUBLE)) AS g,
               hourOfDay(86400123) AS h
        """
    ).collect()[0]
    assert row["a"] is True
    assert row["g"] == "40.75,-74.0"
    assert row["h"] == 123
    import math

    assert row["c"] == int(
        math.floor((abs(-74.05) - abs(-74.0)) / 0.0014)
        + math.floor((41.0 - 40.75) / 0.00125) * 250
    )


def test_text_sql_functions_match_column_library(spark):
    """SQL-registered extension functions (Spark 4 SQL scalar UDFs,
    native-expression bodies) agree with the Column library, and the
    SQL dialect stays Python-free."""
    from table_demo_spark.functions import text as T
    from table_demo_spark.functions.text import register_text_sql_functions
    from table_demo_spark.sources.batch import load_table
    from tests.conftest import SF_SMOKE

    register_text_sql_functions(spark)
    register_text_sql_functions(spark)  # idempotent re-registration
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    docs.createOrReplaceTempView("d_sqludf")
    url = (
        "concat('https://WWW.', source, '.Ex.COM/A/', "
        "CAST(doc_id % 7 AS STRING), '/?utm_x=1&b=2&a=', "
        "CAST(doc_id % 3 AS STRING), '#f')"
    )
    via_sql = spark.sql(
        f"SELECT doc_id, ws_token_count(text) AS n, "
        f"doc_fingerprint(text) AS fp, canonical_url({url}) AS cu "
        f"FROM d_sqludf"
    )
    import pyspark.sql.functions as F

    from table_demo_spark.functions.text import canonical_url, tokens

    via_col = docs.select(
        "doc_id",
        F.size(tokens("text")).alias("n"),
        F.md5(F.array_join(tokens("text"), " ")).alias("fp"),
        canonical_url(F.expr(url)).alias("cu"),
    )
    assert via_sql.exceptAll(via_col).count() == 0
    assert via_col.exceptAll(via_sql).count() == 0
    plan = via_sql._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
