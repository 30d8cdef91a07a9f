"""Vector math over ``array<float>`` embedding columns — native exprs.

Everything is an exact left-fold (``aggregate`` over ``zip_with``) in
double precision so results are bit-reproducible across engines and
partitionings: (((0+x1)+x2)+...) — adding the 0 start value is exact,
so this equals DuckDB's ``list_reduce`` fold used by the oracle.

At 100 TB these expressions are whole-stage-codegen'd; for very wide
vectors a Pandas-UDF (BLAS) variant can be swapped in, but 64-dim dot
products are faster JVM-side than an Arrow round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a, b) -> Column:
    prod = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return _fold_sum(prod)


def norm2(a) -> Column:
    sq = F.transform(_c(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(_fold_sum(sq))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm2(a) * norm2(b))


def proj_weights(j: int, dim: int) -> Column:
    """Deterministic pseudo-random integer hyperplane ``j`` for
    random-projection LSH: w[i] = ((i*37 + j*101) % 19) - 9. Integer
    weights make the projection exactly reproducible in ANSI SQL."""
    return F.array(*[F.lit(((i * 37 + j * 101) % 19) - 9) for i in range(dim)])


def lsh_bucket(a, n_planes: int, dim: int) -> Column:
    """Random-hyperplane LSH bucket id in [0, 2**n_planes)."""
    bucket = F.lit(0)
    for j in range(n_planes):
        proj = F.zip_with(
            _c(a), proj_weights(j, dim), lambda x, w: x.cast("double") * w
        )
        bucket = bucket + F.when(_fold_sum(proj) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket
