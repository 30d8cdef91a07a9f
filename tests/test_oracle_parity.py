"""The core correctness gate, run locally: every registered query's
Spark result must match its DuckDB oracle on the sf0.01 fixtures —
exactly (float_tol=0) because the engine's numeric discipline
(decimal-exact sums, order-stable folds) makes results bit-identical.
"""

from __future__ import annotations

import pytest

from table_demo_spark.queries import all_queries
from tests.compare import assert_matches
from tests.conftest import SF_CORRECT

QUERIES = all_queries()

# Everything is bit-exact except the GEMM-based operator, whose BLAS
# summation order differs from the oracle's sequential fold by ~1e-15.
FLOAT_TOL = {
    "llm_d5_embedding_neardup": 1e-9,
    "llm_d6_neardup_lsh_gemm": 1e-9,
}


@pytest.mark.parametrize("q", QUERIES, ids=[q.name for q in QUERIES])
def test_query_matches_oracle(q, spark, duck):
    if q.oracle is None:
        df = q.spark_fn(spark, SF_CORRECT)
        assert df.count() >= 0
        return
    oracle_pdf = duck.sql(q.oracle).df()
    assert_matches(
        q.spark_fn(spark, SF_CORRECT),
        oracle_pdf,
        float_tol=FLOAT_TOL.get(q.name, 0.0),
    )
