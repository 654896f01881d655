"""Plan-inspection helpers (used by tests/test_plans.py and bench)."""

from flexcalc_spark.plans.explain import plan_text  # noqa: F401
