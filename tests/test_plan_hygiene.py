"""Machine-enforced plan hygiene: render the PHYSICAL plan of every
registry query and ban the two anti-patterns the repo's design rules
forbid (PLANS.md "Known trade-offs"; the task's anti-pattern sweep):

- ``BatchEvalPython`` — a row-at-a-time (pickled) Python UDF in the plan.
  Every Python boundary in this engine must be Arrow-batched
  (``ArrowEvalPython``, ``MapInPandas``, ``FlatMapGroupsInPandas``,
  ``FlatMapCoGroupsInPandas``) — a plain UDF is 10-100x slower and
  silently creeps in via ``F.udf`` without ``useArrow``.
- ``CartesianProduct`` — an unbounded physical cross product. The allowed
  cross-join shape is the 1-row-stats attach, which Spark plans as
  ``BroadcastNestedLoopJoin`` against a broadcast single row; a true
  CartesianProduct node means a join lost its keys.

This was previously a prose audit (PLANS.md); every new graded query is
now gated automatically. Rendering uses ``explain``'s formatted output —
plans are BUILT, never executed (same contract as the analyze-only gate),
except the THREE queries whose construction executes a checkpoint
(``SKIP_HEAVY`` below).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

# queries whose PLAN CONSTRUCTION executes a checkpoint (documented
# analyze-gate exceptions — heavy to build): dup_groups covers label
# propagation, corpus_prep_funnel the funnel stages. leakage_split
# composes the SAME checkpointed group resolution with split_assignment,
# whose own plan is hygiene-checked via dataset_split (identical CASE /
# hash shape, only the key expression differs) — so its exemption leaves
# no node shape ungated.
SKIP_HEAVY = {"dup_groups", "corpus_prep_funnel", "leakage_split"}

BANNED = ("BatchEvalPython", "CartesianProduct")


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.mark.parametrize(
    "name", [q for q in entrymod.queries() if q not in SKIP_HEAVY]
)
def test_no_banned_physical_nodes(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    plan = _formatted_plan(df)
    for node in BANNED:
        assert node not in plan, f"{name}: {node} in physical plan"
