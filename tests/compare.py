"""Local replica of the driver's oracle comparison: run the Spark query
and the DuckDB oracle over the same fixtures, canonicalize (sort
columns by name, sort rows), and compare values."""

from __future__ import annotations

import math

import pandas as pd


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    # normalize datetimes to epoch ms for engine-neutral comparison
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            # Resolution-safe: DuckDB returns datetime64[us], Spark ns;
            # convert to ms explicitly instead of assuming ns int64
            # (the driver_sim / driver-contract form).
            out[c] = out[c].astype("datetime64[ms]").astype("int64")
    out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out


def assert_matches(spark_df, oracle_pdf: pd.DataFrame, float_tol: float = 0.0):
    got = canonicalize(spark_df.toPandas())
    want = canonicalize(oracle_pdf)
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"row count {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            for i, (a, b) in enumerate(zip(g.astype(float), w.astype(float))):
                if math.isnan(a) and math.isnan(b):
                    continue
                assert a == b or abs(a - b) <= float_tol, (
                    f"col {c} row {i}: {a!r} != {b!r} (diff {abs(a - b)})"
                )
        else:
            mism = (g.astype(object) != w.astype(object)) & ~(g.isna() & w.isna())
            if mism.any():
                i = mism.idxmax()
                raise AssertionError(f"col {c} row {i}: {g[i]!r} != {w[i]!r}")
