"""Runtime-profile enforcement (r9 VERDICT item 4).

Reference: ``KiaraRuntimeConfig.runtime_profile``
(``src/kiara/context/runtime_config.py:35-38``) and the "dharpa" branch in
``BaseAPI.queue_job`` (``src/kiara/interfaces/python_api/base_api.py:
2923-2934``): under the dharpa profile a job comment is mandatory and
outputs are force-persisted (``save_values=True``).  Deliberate deviation
(documented in context.py): the repo's default profile is "default", not
"dharpa", so programmatic use is not comment-gated; dharpa is opt-in via
the constructor arg or ``KIARA_SPARK_RUNTIME_PROFILE``.
"""

import os

import pytest

from kiara_spark import KiaraContext
from kiara_spark.api import KiaraAPI


@pytest.fixture()
def dharpa_ctx(spark, tmp_path):
    return KiaraContext(spark=spark, base_path=str(tmp_path),
                        runtime_profile="dharpa")


def test_default_profile_runs_without_comment(ctx):
    api = KiaraAPI(context=ctx)
    assert api.get_runtime_config()["runtime_profile"] == "default"
    out = api.run_job("logic.and", {"a": True, "b": True})
    assert out["y"].data is True


def test_dharpa_requires_comment(dharpa_ctx):
    api = KiaraAPI(context=dharpa_ctx)
    assert api.get_runtime_config()["runtime_profile"] == "dharpa"
    with pytest.raises(ValueError, match="provide a 'comment'"):
        api.run_job("logic.and", {"a": True, "b": True})
    # a blank comment is no comment (the reference checks for the key;
    # requiring non-whitespace is the stricter, documented contract)
    with pytest.raises(ValueError, match="provide a 'comment'"):
        api.run_job("logic.and", {"a": True, "b": True}, comment="   ")
    # nothing ran: the failed calls must not have touched job history
    assert len(dharpa_ctx.job_registry.history) == 0


def test_dharpa_with_comment_runs_and_autosaves(dharpa_ctx):
    api = KiaraAPI(context=dharpa_ctx)
    out = api.run_job("table.limit",
                      {"table": _lineitem(dharpa_ctx), "n": 3},
                      comment="provenance required")
    assert out["table"].data.count() == 3
    job_id = dharpa_ctx.job_registry.history[-1].job_id
    assert api.get_job_comment(job_id) == "provenance required"
    # forced auto-save without an explicit alias: the table output landed
    # in the warehouse (save_values=True analog)
    wh = dharpa_ctx.data_registry.warehouse_path
    stored = [d for d in os.listdir(wh)
              if os.path.isdir(os.path.join(wh, d))]
    assert out["table"].value_id in stored


def test_default_profile_does_not_autosave(spark, tmp_path):
    ctx = KiaraContext(spark=spark, base_path=str(tmp_path))
    api = KiaraAPI(context=ctx)
    out = api.run_job("table.limit", {"table": _lineitem(ctx), "n": 3})
    wh = ctx.data_registry.warehouse_path
    stored = os.listdir(wh) if os.path.isdir(wh) else []
    assert out["table"].value_id not in stored


def test_profile_from_env_and_validation(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("KIARA_SPARK_RUNTIME_PROFILE", "dharpa")
    ctx = KiaraContext(spark=spark, base_path=str(tmp_path))
    assert ctx.runtime_profile == "dharpa"
    with pytest.raises(ValueError, match="unknown runtime profile"):
        KiaraContext(spark=spark, base_path=str(tmp_path),
                     runtime_profile="bogus")


def _lineitem(ctx):
    ctx.load_tables("/root/testdata/sf0.001", ["lineitem"])
    return ctx.get_value("alias:lineitem")


def test_dharpa_gates_pipeline_runs(dharpa_ctx):
    """r10 advice: the pipeline run shape must pass the same comment gate
    as single operations (reference: every CLI run ends in queue_job)."""
    api = KiaraAPI(context=dharpa_ctx)
    cfg = {
        "pipeline_name": "gated",
        "steps": [{"step_id": "gate", "module_type": "logic.and"}],
    }
    inputs = {"gate__a": True, "gate__b": True}
    with pytest.raises(ValueError, match="provide a 'comment'"):
        api.run_pipeline(cfg, inputs)
    assert len(dharpa_ctx.job_registry.history) == 0
    out = api.run_pipeline(cfg, inputs, comment="pipeline provenance")
    assert out["gate__y"].data is True
    # the comment attached to every step job the run created
    for rec in dharpa_ctx.job_registry.history:
        assert api.get_job_comment(rec.job_id) == "pipeline provenance"


def test_dharpa_gates_job_desc_runs(dharpa_ctx, tmp_path):
    import json

    api = KiaraAPI(context=dharpa_ctx)
    jd = tmp_path / "job.json"
    jd.write_text(json.dumps({
        "operation": "logic.and",
        "inputs": {"a": True, "b": True},
    }))
    with pytest.raises(ValueError, match="provide a 'comment'"):
        api.run_job_desc(str(jd))
    assert len(dharpa_ctx.job_registry.history) == 0
    out = api.run_job_desc(str(jd), comment="job-desc provenance")
    assert out["y"].data is True
    job_id = dharpa_ctx.job_registry.history[-1].job_id
    assert api.get_job_comment(job_id) == "job-desc provenance"


def test_mixed_output_job_archives_record_without_false_cache_hit(
        spark, tmp_path):
    """r10 advice: persist_record used to abort on the first non-table
    output, leaving a mixed-output job with stored tables but no archived
    record.  Now it stores the persistable subset and archives the record
    marked incomplete — and an incomplete entry must never be served as a
    cross-context cache hit (a partial ValueMap would be wrong)."""
    ctx = KiaraContext(spark=spark, base_path=str(tmp_path))
    out = ctx.run_job("logic.and", {"a": True, "b": True})
    record = ctx.job_registry.history[-1]
    ctx.job_registry.persist_record(record)
    stored = ctx.job_registry._stored
    assert record.job_hash in stored
    entry = stored[record.job_hash]
    # the boolean output has no persistence profile: skipped, not fatal
    assert entry["complete"] is False and entry["outputs"] == {}
    # an incomplete archive entry is a cache MISS, not a partial hit
    assert ctx.job_registry._probe_stored(record.job_hash) is None


def test_service_payloads_carry_comment(tmp_path, monkeypatch, capsys):
    """r12 advice: the CLI's service-routing payloads for pipeline and
    job-desc runs must forward --comment (service.py passes
    req.get('comment') through the dharpa gate; a dropped comment either
    fails the gate or silently loses provenance)."""
    import json

    from kiara_spark import service as svc
    from kiara_spark.cli import main

    captured = []

    def fake_request(payload, **kw):
        captured.append(payload)
        return {"ok": True, "outputs": {}}

    monkeypatch.setenv("KIARA_SPARK_SERVICE", str(tmp_path / "sock"))
    monkeypatch.setattr(svc, "is_running", lambda *a, **kw: True)
    monkeypatch.setattr(svc, "request", fake_request)

    pipe = tmp_path / "p.json"
    pipe.write_text(json.dumps({
        "pipeline_name": "p",
        "steps": [{"step_id": "s", "module_type": "logic.and"}],
    }))
    assert main(["run", str(pipe), "s__a=true", "s__b=true",
                 "--comment", "pipeline provenance"]) == 0
    jd = tmp_path / "j.json"
    jd.write_text(json.dumps({
        "operation": "logic.and",
        "inputs": {"a": True, "b": True},
    }))
    assert main(["run", str(jd), "--comment", "job provenance"]) == 0
    assert main(["run", "logic.and", "a=true", "b=true",
                 "--comment", "run provenance"]) == 0

    by_cmd = {p["cmd"]: p for p in captured}
    assert by_cmd["run_pipeline"]["comment"] == "pipeline provenance"
    assert by_cmd["run_job_desc"]["comment"] == "job provenance"
    assert by_cmd["run"]["comment"] == "run provenance"


def test_job_desc_save_skips_forced_autosave(dharpa_ctx, tmp_path,
                                             monkeypatch):
    """r12 advice: run_job_desc mirrors run_job's `save is None` guard —
    an explicit --save already persists the outputs under an alias, so
    dharpa forced persistence must not re-store them."""
    import json

    from kiara_spark.api import KiaraAPI

    api = KiaraAPI(context=dharpa_ctx)
    calls = []
    monkeypatch.setattr(api, "_profile_autosave",
                        lambda records: calls.append(records))
    jd = tmp_path / "job.json"
    jd.write_text(json.dumps({
        "operation": "logic.and",
        "inputs": {"a": True, "b": True},
    }))
    api.run_job_desc(str(jd), save="kept", comment="c")
    assert calls == []
    api.run_job_desc(str(jd), comment="c")
    assert len(calls) == 1
