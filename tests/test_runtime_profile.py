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
