"""Global plan-quality sweep: EVERY `queries()` entry, one law.

The per-operator pins in test_plans.py check specific plans; this
sweep enforces the two anti-patterns that must never appear anywhere
in the surface, including entries added in a hurry later:

- `CartesianProduct` — an unguarded all-pairs plan (the exact-tier
  similarity anchors stay broadcast-NL over a guarded small side, so
  even they must not degrade to a shuffled cartesian);
- `BatchEvalPython` — a row-at-a-time Python UDF in the plan (the
  slow path this engine bans; Python kernels must be Arrow-batched
  mapInPandas/applyInPandas, which plan as different operators).

Runs at sf0.001 (plan shapes are scale-invariant; iterative operators
do their loop work eagerly at build time, which is why this test costs
~2-3 minutes — still the cheapest way to make the guarantee global).
"""

from __future__ import annotations

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

#: Entries allowed to show a pattern, with the reason of record.
ALLOWLIST: dict[str, set[str]] = {}


def test_no_cartesian_or_row_udf_anywhere(spark):
    qs = entry.queries()
    offenders: dict[str, list[str]] = {}
    failures: dict[str, str] = {}
    for name, fn in qs.items():
        try:
            df = fn(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001 — collect, report all at once
            failures[name] = f"{type(ex).__name__}: {ex}"[:200]
            continue
        hits = [
            p
            for p in ("CartesianProduct", "BatchEvalPython")
            if p in plan and p not in ALLOWLIST.get(name, set())
        ]
        if hits:
            offenders[name] = hits
    assert not failures, f"entries failed to build a plan: {failures}"
    assert not offenders, f"banned plan operators found: {offenders}"
