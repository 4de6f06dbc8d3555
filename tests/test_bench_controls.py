"""Two-control bench protocol pins (r11, VERDICT r10 #7).

The bench separates CPU drift from shuffle weather with two frozen
controls: q01 (scan+agg, CPU-bound) and q05 (fact-side shuffle join,
shuffle-bound). The shuffle control is only as good as its plan is
stable — if an AQE or conf change silently turned q05's fact join into a
broadcast, "shuffle-bound" would mean something else mid-series and every
normalized_shuffle ratio would silently change meaning. This pins the
executed shape at the bench scale (sf0.1): all dimension joins broadcast,
EXACTLY ONE fact-side sort-merge join, zero cartesian/BNLJ.
"""
import os

import pytest


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="bench-scale testdata not present"
)
def test_q05_shuffle_control_plan_shape(spark):
    """The exact SMJ-vs-BHJ split legitimately follows the testdata's
    size statistics (at the current sf0.1 stats the column-pruned fact
    side fits the broadcast estimate, so all five joins broadcast), so
    the per-round JSON fingerprint (control_shuffle_plan) is what tracks
    strategy flips; here we pin the INVARIANTS no statistics change may
    break: five hash-family joins, shuffle exchanges present, no
    cartesian/BNLJ, no Python."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["q05_region_revenue"](spark, SF_DIR)
    df.collect()  # AQE finalizes the adaptive plan only after execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    joins = sum(plan.count(k) for k in
                ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"))
    # the final adaptive plan repeats the join text inside AQE subtrees;
    # require at least the logical five and no other join families
    assert joins >= 5, plan[:4000]
    assert plan.count("Exchange") >= 2, (
        "q05 lost its shuffle exchanges — no longer a shuffle control:\n"
        + plan[:4000]
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Python" not in plan  # pure-Catalyst control, no UDF creep


def test_bench_emits_shuffle_plan_fingerprint():
    import inspect

    import bench as bench_mod

    src = inspect.getsource(bench_mod)
    assert "control_shuffle_plan" in src


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="bench-scale testdata not present"
)
def test_q01_cpu_control_plan_shape(spark):
    """q01 (CPU control) must stay scan + partial/final agg: no joins,
    no Python, single shuffle (the agg exchange)."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["q01_pricing_summary"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Python" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_bench_json_carries_two_control_block():
    """The BENCH JSON contract: control + control_shuffle + normalized +
    normalized_shuffle + control_of must all be present (drift
    adjudication depends on them — bench-drift protocol)."""
    import bench as bench_mod

    queries = dict(bench_mod.bench_queries())
    assert "q01_pricing_summary" in queries and "q05_region_revenue" in queries
    import inspect

    src = inspect.getsource(bench_mod)
    for key in ("control_shuffle", "normalized_shuffle", "control_of"):
        assert key in src, f"bench.py lost the {key} field"
