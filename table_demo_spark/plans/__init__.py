"""Thin query-compilation shims (the non-Catalyst planning layer)."""

from table_demo_spark.plans.modes import ContinuousPlan, infer_plan

__all__ = ["ContinuousPlan", "infer_plan"]
