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
    out = api.import_values(arch, alias_map=True, alias_prefix="in_")
    assert any(a.startswith("in_") for a in api.list_alias_names())
    assert out


def test_singleton_instance():
    KiaraAPI._singleton = None
    # instance() would build a fresh default context (and a Spark session);
    # seed the registry so the singleton reuses the test session context
    import tests.conftest  # noqa: F401
    a = KiaraAPI.instance.__func__  # bound check only; no heavy init here
    assert callable(a)


PIPE_2AND = {
    "pipeline_name": "and_twice",
    "doc": "two chained ands",
    "steps": [
        {"module_type": "logic.and", "step_id": "s1"},
        {"module_type": "logic.and", "step_id": "s2",
         "input_links": {"a": "s1.y"}},
    ],
    "input_aliases": {"s1.a": "a", "s1.b": "b", "s2.b": "c"},
    "output_aliases": {"s2.y": "y"},
}


def test_runtime_config_and_operation_types(api):
    """get_runtime_config + the operation-type surface (reference
    BaseAPI.get_runtime_config / get_operation_type /
    retrieve_operation_type_info / find_operation_id)."""
    rc = api.get_runtime_config()
    assert rc["job_cache"] == "value_id" and rc["base_path"]

    names = api.list_operation_type_names()
    assert {"custom_module", "pipeline", "filter", "render_value",
            "create_from", "export_as"} <= set(names)
    info = api.retrieve_operation_type_info("render_value")
    assert "render.pipeline.as.html" in info["operation_ids"]
    assert info["doc"]
    with pytest.raises(KeyError, match="unknown operation type"):
        api.get_operation_type("nope")

    assert api.find_operation_id(
        "render.item",
        {"source_type": "archive", "target_type": "html"}) == \
        "render.archive.as.html"
    assert api.find_operation_id("render.item", {"source_type": "zz"}) is None

    op = api.create_operation("logic.and", operation_id="test.my_and")
    assert op.module_type == "logic.and"
    assert "test.my_and" in api.list_operation_ids()
    with pytest.raises(KeyError):
        api.create_operation("no.such.module")


def test_manifest_execution(api):
    """run_manifest / queue_manifest: the lowest-level run surface —
    module_type + module_config, no operation resolution (reference
    BaseAPI.run_manifest)."""
    out = api.run_manifest({"module_type": "logic.and"},
                           {"a": True, "b": True})
    assert out["y"].data is True
    job_id = api.queue_manifest({"module_type": "logic.and"},
                                {"a": True, "b": False})
    assert api.get_job_result(job_id)["y"].data is False
    with pytest.raises(ValueError, match="module_type"):
        api.run_manifest({"inputs": {}})


def test_register_pipeline_as_operation(api):
    """register_pipeline mints a runnable operation (reference
    BaseAPI.register_pipeline): run_job by id executes the whole pipeline
    through the PipelineModule; list/info surfaces see it."""
    op = api.register_pipeline(PIPE_2AND)
    assert op.operation_type == "pipeline"
    assert api.list_pipeline_ids() == ["and_twice"]
    out = api.run_job("and_twice", {"a": True, "b": True, "c": True})
    assert out["y"].data is True

    info = api.retrieve_pipeline_info("and_twice")
    assert info["stages"] == [["s1"], ["s2"]]
    assert [i["alias"] for i in info["inputs"]] == ["a", "b", "c"]
    assert info["doc"] == "two chained ands"
    assert "and_twice" in api.retrieve_pipelines_info()
    s = api.get_pipeline_structure("and_twice")
    assert [st.step_id for st in s.config.steps] == ["s1", "s2"]
    # anonymous pipelines need an explicit id
    with pytest.raises(ValueError, match="no name"):
        api.register_pipeline({"steps": PIPE_2AND["steps"]})


def test_register_pipelines_scans_dir(api, tmp_path):
    import json

    (tmp_path / "p1.json").write_text(json.dumps(PIPE_2AND))
    (tmp_path / "notes.json").write_text(json.dumps({"just": "data"}))
    ops = api.register_pipelines(str(tmp_path))
    assert [o.operation_id for o in ops] == ["and_twice"]


def test_register_data_value_map_query(api, spark):
    """register_data / assemble_value_map / query_value (reference
    BaseAPI parity)."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, txt string")
    v = api.register_data(df, alias="api_q")
    assert api.get_value("alias:api_q").value_id == v.value_id

    vm = api.assemble_value_map({"t": "alias:api_q", "n": 7},
                                register_data=True)
    assert vm["t"].schema.type == "table" and vm["n"].data == 7
    with pytest.raises(TypeError, match="register_data"):
        api.assemble_value_map({"n": 7})

    assert api.query_value(v, "columns") == ["id", "txt"]
    assert api.query_value("alias:api_q", "type") == "table"
    assert api.query_value(v, "value_id") == v.value_id
    with pytest.raises(KeyError):
        api.query_value(v, "nope")


def test_render_value_formats(api, spark):
    df = spark.createDataFrame([(1, "<b>x</b>")], "id int, txt string")
    api.register_data(df, alias="api_rv")
    s = api.render_value("alias:api_rv")
    assert "id" in s and "txt" in s
    html = api.render_value("alias:api_rv", "html")
    assert html.startswith("<!DOCTYPE html>") and "&lt;b&gt;" in html
    page = api.render_value("alias:api_rv", "table_page", {"limit": 1})
    assert page["kind"] == "table_page" and len(page["rows"]) == 1
    with pytest.raises(ValueError, match="unsupported"):
        api.render_value("alias:api_rv", "pdf")


def test_archive_register_copy_metadata(api, spark, tmp_path):
    """register_archive / copy_archive / set_archive_metadata_value
    (reference BaseAPI archive management)."""
    from kiara_spark.archive import export_archive

    df = spark.createDataFrame([(1,)], "id int")
    api.register_data(df, alias="arch_v")
    src = str(tmp_path / "a1")
    export_archive(api.context, ["arch_v"], src)

    name = api.register_archive(src, "demo_arch")
    assert name == "demo_arch"
    api.set_archive_metadata_value("demo_arch", "owner", "me")
    dst = str(tmp_path / "a2")
    manifest = api.copy_archive("demo_arch", dst)
    assert manifest["metadata"] == {"owner": "me"}
    assert (tmp_path / "a2" / "manifest.json").is_file()
    with pytest.raises(ValueError, match="target exists"):
        api.copy_archive("demo_arch", dst)
    with pytest.raises(ValueError, match="manifest"):
        api.register_archive(str(tmp_path / "empty"))


def test_metadata_items_store(api):
    i1 = api.register_metadata_item("note", "hello")
    i2 = api.register_metadata_item("note", "world")
    api.register_metadata_item("tag", "v1")
    notes = api.find_metadata_items("note")
    assert [n["item_id"] for n in notes] == [i1, i2]
    assert len(api.find_metadata_items()) == 3


def test_workflow_session_surface(api):
    """create_workflow seeded from a pipeline + the list/info family
    (reference BaseAPI.create_workflow / get_workflow /
    list_workflow_aliases / retrieve_workflow_info)."""
    wf = api.create_workflow("api_wf", initial_pipeline=PIPE_2AND,
                             initial_inputs={"a": True, "b": True,
                                             "c": True})
    out = wf.process()
    assert out["y"].data is True
    wf.snapshot()

    assert "api_wf" in api.list_workflow_alias_names()
    assert api.list_workflow_ids() == api.list_workflow_alias_names()
    info = api.retrieve_workflow_info("api_wf")
    assert info["steps"] == ["s1", "s2"] and info["n_snapshots"] == 1
    assert "api_wf" in api.retrieve_workflows_info()
    wf2 = api.get_workflow("api_wf")
    assert [s["step_id"] for s in wf2.pipeline_config["steps"]] == \
        ["s1", "s2"]
    with pytest.raises(KeyError):
        api.get_workflow("ghost_wf")
    assert api.get_workflow("fresh_wf", create_if_necessary=True).alias == \
        "fresh_wf"


def test_misc_parity_fills(api):
    assert api.is_internal_data_type("any") is True
    assert api.is_internal_data_type("table") is False
    with pytest.raises(KeyError):
        api.is_internal_data_type("nope")
    assert api.ensure_plugin_packages("json") == {"json": True}
    with pytest.raises(RuntimeError, match="not installed"):
        api.ensure_plugin_packages("definitely_not_a_package_xyz")
    assert api.doc().startswith("# `KiaraAPI`")
    assert any(r.source_type == "pipeline"
               for r in api.retrieve_renderers_for("pipeline"))


def test_assemble_render_pipeline(api, spark):
    """assemble_render_pipeline: optional filter chain + a render step
    (reference BaseAPI.assemble_render_pipeline)."""
    df = spark.createDataFrame([(1, "keep"), (2, "drop")],
                               "id int, tag string")
    api.register_data(df, alias="arp_demo")
    cfg = api.assemble_render_pipeline("table", "string",
                                       filters=["rows"])
    out = api.context.run_pipeline(
        cfg, {"table": api.get_value("alias:arp_demo"),
              "where": "tag = 'keep'"})
    s = out["rendered"].data
    assert "keep" in s and "drop" not in s

    page = api.context.run_pipeline(
        api.assemble_render_pipeline("table", "table_page"),
        {"table": api.get_value("alias:arp_demo")})["rendered"].data
    assert page["kind"] == "table_page" and len(page["rows"]) == 2
    with pytest.raises(ValueError, match="unsupported render target"):
        api.assemble_render_pipeline("table", "pdf")


def test_example_job_descs_run_end_to_end(api, tmp_path, monkeypatch):
    """The examples/jobs/ descriptions run as a chained session
    (reference examples/jobs/init.yaml pattern): the import job saves
    `docs`, the summary job reads it by alias and saves
    `corpus_summary`."""
    api.run_job_desc("/root/repo/examples/jobs/import_documents.json")
    assert "docs" in api.context.data_registry.aliases
    out = api.run_job_desc(
        "/root/repo/examples/jobs/corpus_summary.json",
        inputs={"table": "alias:docs"})
    rows = out["table"].data.collect()
    assert {r.lang for r in rows} and all(r.n_docs > 0 for r in rows)
    assert all(r.total_chars > 0 for r in rows)
    assert "corpus_summary" in api.context.data_registry.aliases
    # the summary job also renders to a runnable script
    s = api.render("/root/repo/examples/jobs/corpus_summary.json",
                   "job_desc", "python_script")
    assert "table.query.sql" in s and "GROUP BY lang" in s


def test_internal_data_type_family(api, capsys):
    """The reference's internal data-type family registers and reports
    internal=True (reference included_core_types/internal/)."""
    names = api.list_data_type_names()
    for n in ("internal", "internal_model", "doc", "render_scene",
              "render_value_result", "terminal_renderable"):
        assert n in names
        assert api.is_internal_data_type(n) is True
    assert api.is_internal_data_type("table") is False
    from kiara_spark.cli import main

    assert main(["type", "explain", "internal_model"]) == 0
    assert "internal: True" in capsys.readouterr().out


def test_list_operations_filters(api, capsys):
    """Filtered operation listings (reference BaseAPI.list_operations:
    input/output types, operation types, internal exclusion)."""
    ids = api.list_operation_ids(operation_types=["filter"])
    assert ids == ["table_filter.drop_duplicates", "table_filter.rows",
                   "table_filter.select_columns"]
    graph_ops = api.list_operation_ids(input_types=["network_graph"])
    assert "network_graph.pagerank" in graph_ops
    assert all("graph" in i or "network" in i for i in graph_ops[:5])
    str_out = api.list_operation_ids(filter="render",
                                     output_types=["string"],
                                     include_internal=True)
    assert "render.api.as.markdown" in str_out
    # internal operations are hidden BY DEFAULT (reference:
    # include_internal=False, base_api.py:899)
    full = set(api.list_operation_ids(include_internal=True))
    public = set(api.list_operation_ids())
    assert public < full
    assert "render.value.as.html" in full - public  # render.item internal
    # input/output types match ANY requested type (reference semantics),
    # not all of them
    either = api.list_operation_ids(
        input_types=["network_graph", "table"], include_internal=True)
    assert "network_graph.pagerank" in either
    assert "table_filter.rows" in either
    # filter: iterable = every term must match, case-insensitively
    assert api.list_operation_ids(filter=["TABLE", "bm25"]) == \
        ["table.bm25_score"]
    from kiara_spark.cli import main

    assert main(["operation", "list", "--operation-type", "filter"]) == 0
    out = capsys.readouterr().out
    assert "table_filter.rows" in out and "query.table" not in out
    # CLI hides internal ops unless --include-internal (reference flag)
    assert main(["operation", "list", "render.value"]) == 0
    assert "render.value.as.html" not in capsys.readouterr().out
    assert main(["operation", "list", "render.value",
                 "--include-internal"]) == 0
    assert "render.value.as.html" in capsys.readouterr().out


def test_endpoint_tagging_and_discovery():
    """Reference base_api.py:113-131 parity: the @tag decorator stamps
    _tags, find_base_api_endpoints selects by label, and every public
    KiaraAPI endpoint carries the curated 'kiara_api' tag."""
    from kiara_spark.api import KiaraAPI, find_base_api_endpoints, tag

    eps = find_base_api_endpoints(KiaraAPI, "kiara_api")
    names = {e.__name__ for e in eps}
    public = {n for n in dir(KiaraAPI)
              if not n.startswith("_") and callable(getattr(KiaraAPI, n))}
    assert public <= names
    assert {"run_job", "get_value", "store_value", "instance"} <= names
    # unknown labels select nothing; plugins can mint their own surfaces
    assert find_base_api_endpoints(KiaraAPI, "nope") == []

    @tag("my_surface", "beta")
    def extension(self):
        pass

    assert extension._tags == ("my_surface", "beta")

    class Extended(KiaraAPI):
        custom = tag("custom_api")(lambda self: 42)

    assert [e.__name__ for e in
            find_base_api_endpoints(Extended, "custom_api")] == ["<lambda>"]
