"""Workflow API tests (reference workflow.py:144+ — incremental assembly,
re-process with cache, snapshots surviving restarts)."""

from kiara_spark import KiaraContext, Workflow


def test_workflow_assemble_process_snapshot(spark, tmp_path):
    ctx = KiaraContext(spark=spark, base_path=str(tmp_path / "wfctx"))
    wf = Workflow(ctx, "logic_demo")
    s1 = wf.add_step("logic.and", step_id="and_1")
    s2 = wf.add_step("logic.and", step_id="and_2", input_links={"a": f"{s1}.y"})
    wf.alias_input(f"{s1}.a", "a")
    wf.alias_input(f"{s1}.b", "b")
    wf.alias_input(f"{s2}.b", "c")
    wf.alias_output(f"{s2}.y", "y")
    wf.set_inputs(a=True, b=True, c=True)
    out = wf.process()
    assert out["y"].data is True

    # edit one input, re-process: step 1 is a cache hit, step 2 re-runs
    before = len(ctx.job_registry.history)
    wf.set_input("c", False)
    out = wf.process()
    assert out["y"].data is False
    new = ctx.job_registry.history[before:]
    hits = {r.module_type: r.cache_hit for r in new}
    assert any(r.cache_hit for r in new), hits

    snap = wf.snapshot()
    assert snap["outputs"]["y"]

    # restart: workflow structure + snapshot history reload from disk
    ctx2 = KiaraContext(spark=spark, base_path=ctx.base_path)
    wf2 = Workflow(ctx2, "logic_demo")
    assert len(wf2.snapshots) == 1
    wf2.set_inputs(a=True, b=True, c=True)
    assert wf2.process()["y"].data is True


def test_workflow_table_steps(spark, tmp_path):
    ctx = KiaraContext(spark=spark, base_path=str(tmp_path / "wfctx2"))
    wf = Workflow(ctx, "orders_pipeline")
    wf.add_step("create.table.from.file", step_id="load")
    wf.add_step("table.filter.rows", step_id="filt",
                input_links={"table": "load.table"})
    wf.add_step("table.query.sql", step_id="agg",
                input_links={"table": "filt.table"})
    wf.alias_input("load.path", "path")
    wf.alias_input("filt.where", "where")
    wf.alias_input("agg.query", "query")
    wf.alias_output("agg.table", "result")
    wf.set_inputs(
        path="/root/testdata/sf0.001/orders.parquet",
        where="o_totalprice > 100000",
        query="select count(*) as n from data",
    )
    out = wf.process()
    assert out["result"].data.collect()[0]["n"] == 1190


def test_workflow_duplicate_step_rejected(spark, tmp_path):
    import pytest

    ctx = KiaraContext(spark=spark, base_path=str(tmp_path / "wfctx3"))
    wf = Workflow(ctx, "dup")
    wf.add_step("logic.not", step_id="s1")
    with pytest.raises(ValueError, match="duplicate step id"):
        wf.add_step("logic.not", step_id="s1")

def test_workflow_snapshot_rollback_from_cache(spark, tmp_path):
    """Snapshot -> mutate (input change + extra step) -> load_state rollback:
    the restored pipeline re-runs entirely FROM THE JOB CACHE (no step
    recomputes) and reproduces the pre-mutation output values — reference
    load_state's clear_steps/add_steps/set_inputs restore
    (workflow.py:1164-1225) on top of the job registry."""
    ctx = KiaraContext(spark=spark, base_path=str(tmp_path / "wfctx4"))
    wf = Workflow(ctx, "rollback_demo")
    wf.add_step("create.table.from.file", step_id="load")
    wf.add_step("table.filter.rows", step_id="filt",
                input_links={"table": "load.table"})
    wf.add_step("table.query.sql", step_id="agg",
                input_links={"table": "filt.table"})
    wf.alias_input("load.path", "path")
    wf.alias_input("filt.where", "where")
    wf.alias_input("agg.query", "query")
    wf.alias_output("agg.table", "result")
    wf.set_inputs(
        path="/root/testdata/sf0.001/orders.parquet",
        where="o_totalprice > 100000",
        query="select count(*) as n from data",
    )
    out1 = wf.process()
    n1 = out1["result"].data.collect()[0]["n"]
    snap1 = wf.snapshot()
    sid1 = snap1["state_id"]

    # mutate: tighter filter AND an extra step on top
    wf.set_input("where", "o_totalprice > 200000")
    wf.add_step("table.filter.rows", step_id="extra",
                input_links={"table": "agg.table"},
                module_config={"where": "n >= 0"})
    wf.alias_output("extra.table", "result2")
    out2 = wf.process()
    wf.snapshot()
    sid2 = wf.snapshots[-1]["state_id"]
    assert sid2 != sid1
    assert out2["result2"].data.collect()[0]["n"] < n1

    # rollback to the first state
    restored = wf.load_state(sid1)
    assert restored["state_id"] == sid1
    assert [s["step_id"] for s in wf.pipeline_config["steps"]] == \
        ["load", "filt", "agg"]
    before = len(ctx.job_registry.history)
    out3 = wf.process()
    new = ctx.job_registry.history[before:]
    assert new and all(r.cache_hit for r in new), \
        {r.module_type: r.cache_hit for r in new}     # nothing recomputed
    assert out3["result"].data.collect()[0]["n"] == n1
    assert {k: str(v.value_id) for k, v in out3.items()} == \
        {k: str(v) for k, v in snap1["outputs"].items()}

    # structural diff between the two states
    d = wf.diff_states(sid1, sid2)
    assert d["steps_added"] == ["extra"]
    assert d["steps_removed"] == [] and d["steps_changed"] == []
    assert d["inputs_changed"] == {"where": {
        "a": "o_totalprice > 100000", "b": "o_totalprice > 200000"}}

    # latest-state default + unknown-id error
    assert wf.load_state()["state_id"] == sid2
    import pytest
    with pytest.raises(KeyError, match="no state 'nope'"):
        wf.get_state("nope")


def test_workflow_state_survives_restart(spark, tmp_path):
    """A persisted snapshot history reloads into a NEW context: state ids
    are intact, the last snapshot's scalar inputs are restored, and
    load_state of the older state re-runs correctly (recompute is fine
    here — the fresh context has a cold job cache)."""
    base = str(tmp_path / "wfctx5")
    ctx = KiaraContext(spark=spark, base_path=base)
    wf = Workflow(ctx, "persist_demo")
    wf.add_step("logic.and", step_id="and_1")
    wf.alias_input("and_1.a", "a")
    wf.alias_input("and_1.b", "b")
    wf.alias_output("and_1.y", "y")
    wf.set_inputs(a=True, b=True)
    wf.process()
    sid1 = wf.snapshot()["state_id"]
    wf.set_input("b", False)
    wf.process()
    sid2 = wf.snapshot()["state_id"]

    ctx2 = KiaraContext(spark=spark, base_path=base)
    wf2 = Workflow(ctx2, "persist_demo")
    assert wf2.all_state_ids == [sid1, sid2]
    # constructor restored the LAST snapshot's inputs
    assert wf2.process()["y"].data is False
    wf2.load_state(sid1)
    assert wf2.process()["y"].data is True
