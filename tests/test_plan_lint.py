"""Registry-wide plan lint as a test gate: no cartesians, no
row-at-a-time Python UDFs, no un-allowlisted nested-loop joins or
Python eval nodes anywhere in the ~98 entries (tools/plan_lint.py;
the positive per-entry plan pins live in test_plans.py)."""

import tools.plan_lint as PL

from harbourbridge_spark import queries as Q


def test_registry_plans_clean(spark):
    failures = {}
    for name in Q.REGISTRY:
        problems = PL.lint_one(spark, Q, name)
        if problems:
            failures[name] = problems
    assert not failures, failures


def test_allowlists_not_stale(spark):
    """Every allowlisted entry must still exist AND still need its
    exemption — a stale allowlist hides future regressions."""
    for name in set(PL.TINY_CROSS_OK) | PL.PYTHON_KERNEL_OK:
        assert name in Q.REGISTRY, f"allowlisted {name} not in registry"
    import re
    for name in sorted(PL.TINY_CROSS_OK):
        df = Q.REGISTRY[name].fn(spark, PL.SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan, \
            f"{name} no longer needs its TINY_CROSS_OK exemption"
    for name in sorted(PL.PYTHON_KERNEL_OK):
        df = Q.REGISTRY[name].fn(spark, PL.SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert re.search(PL.PY_EVAL_RE, plan), \
            f"{name} no longer needs its PYTHON_KERNEL_OK exemption"
