"""Registry-wide plan lint: no hard anti-patterns anywhere; warn-level
nodes must match the standing allowlist exactly (new ones need a reason,
stale entries must be pruned)."""

from __future__ import annotations

from api_etl_pipeline_spark.ops import plan_lint
from tests.conftest import SF_SMOKE


def test_registry_plans_are_clean(spark):
    findings = plan_lint.lint_registry(spark, SF_SMOKE)

    hard = [f for f in findings if f.severity == "hard"]
    assert not hard, f"hard plan anti-patterns: {[(f.query, f.node) for f in hard]}"

    fired = {(f.query, f.node) for f in findings if f.severity == "warn"}
    unexplained = fired - set(plan_lint.ALLOWED)
    assert not unexplained, f"warn nodes without a recorded reason: {sorted(unexplained)}"
    stale = set(plan_lint.ALLOWED) - fired
    assert not stale, f"allowlist entries that no longer fire: {sorted(stale)}"
