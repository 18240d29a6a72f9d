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
