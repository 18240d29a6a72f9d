"""Pipeline engine tests, modeled on the reference's logic pipelines
(``tests/resources/pipelines/logic/logic_2.json``) and table_import pipeline."""

import pytest

from kiara_spark.modules import InvalidInputsError
from kiara_spark.pipeline import PipelineConfig, PipelineStructure

LOGIC_2 = {
    "pipeline_name": "logic_2",
    "steps": [
        {"module_type": "logic.and", "step_id": "and_1"},
        {"module_type": "logic.and", "step_id": "and_2",
         "input_links": {"a": "and_1.y"}},
    ],
    "input_aliases": {"and_1.a": "a", "and_1.b": "b", "and_2.b": "c"},
    "output_aliases": {"and_2.y": "y"},
}


def test_structure_stages_and_io(ctx):
    cfg = PipelineConfig.from_config(LOGIC_2)
    st = PipelineStructure(cfg, ctx.module_registry)
    assert st.stages == [["and_1"], ["and_2"]]
    assert sorted(pi.alias for pi in st.pipeline_inputs) == ["a", "b", "c"]
    assert [po.alias for po in st.pipeline_outputs] == ["y"]
    assert st.execution_graph["and_1"] == ["and_2"]


def test_logic_pipeline_truth_table(ctx):
    for a, b, c, want in [(True, True, True, True), (True, True, False, False),
                          (True, False, True, False)]:
        out = ctx.run_pipeline(LOGIC_2, {"a": a, "b": b, "c": c})
        assert out["y"].data is want


def test_missing_pipeline_input_raises(ctx):
    with pytest.raises(InvalidInputsError) as exc:
        ctx.run_pipeline(LOGIC_2, {"a": True, "b": True})
    assert "c" in exc.value.invalid


def test_cycle_detection(ctx):
    bad = {
        "steps": [
            {"module_type": "logic.not", "step_id": "s1", "input_links": {"a": "s2.y"}},
            {"module_type": "logic.not", "step_id": "s2", "input_links": {"a": "s1.y"}},
        ]
    }
    with pytest.raises(ValueError, match="cycle"):
        ctx.run_pipeline(bad, {})


def test_invalid_link_target(ctx):
    bad = {
        "steps": [
            {"module_type": "logic.not", "step_id": "s1",
             "input_links": {"a": "nope.y"}},
        ]
    }
    with pytest.raises(ValueError, match="unknown step"):
        ctx.run_pipeline(bad, {})


def test_table_pipeline_lazy_composition(ctx, tables):
    """table_import-style pipeline: load -> filter -> aggregate via SQL.
    Steps compose lazily; only the final output runs a Spark job."""
    pipeline = {
        "pipeline_name": "table_import",
        "steps": [
            {"module_type": "create.table.from.file", "step_id": "load"},
            {"module_type": "table.filter.rows", "step_id": "filt",
             "input_links": {"table": "load.table"}},
            {"module_type": "table.query.sql", "step_id": "agg",
             "input_links": {"table": "filt.table"}},
        ],
        "input_aliases": {"load.path": "path", "filt.where": "where",
                          "agg.query": "query"},
        "output_aliases": {"agg.table": "result"},
    }
    out = ctx.run_pipeline(pipeline, {
        "path": "/root/testdata/sf0.001/orders.parquet",
        "where": "o_totalprice > 100000",
        "query": "select o_orderpriority, count(*) as n from data group by 1",
    })
    df = out["result"].data
    assert df.count() == 5
    # lineage walks back through all three steps
    tree = ctx.data_registry.lineage(out["result"])
    assert tree["module"] == "table.query.sql"
    assert tree["inputs"]["table"]["module"] == "table.filter.rows"
    assert tree["inputs"]["table"]["inputs"]["table"]["module"] == "create.table.from.file"


def test_step_level_cache_hits(ctx):
    """Second run of the same pipeline: idempotent steps hit the job cache."""
    before = len(ctx.job_registry.history)
    ctx.run_pipeline(LOGIC_2, {"a": True, "b": False, "c": True})
    mid = ctx.job_registry.history
    ctx.run_pipeline(LOGIC_2, {"a": True, "b": False, "c": True})
    after = ctx.job_registry.history
    new = after[len(mid):]
    assert all(r.cache_hit for r in new), [r.module_type for r in new]


def test_pipeline_as_module(ctx):
    """PipelineModule: a pipeline runs as a module (composability)."""
    out = ctx.run_job("pipeline", {"a": True, "b": True, "c": True},
                      operation_config={"pipeline": LOGIC_2})
    assert out["y"].data is True


REFERENCE_PIPELINES = "/root/reference/tests/resources/pipelines"


def test_reference_logic_2_file_runs(ctx):
    """Compatibility: the reference's own pipeline file (step__field alias
    keys) parses and executes unchanged."""
    out = ctx.run_pipeline(f"{REFERENCE_PIPELINES}/logic/logic_2.json",
                           {"a": True, "b": True, "c": True})
    assert out["y"].data is True
    out = ctx.run_pipeline(f"{REFERENCE_PIPELINES}/logic/logic_2.json",
                           {"a": True, "b": True, "c": False})
    assert out["y"].data is False


def test_reference_logic_3_default_aliases(ctx):
    """No aliases in the file -> reference-style step__field defaults."""
    out = ctx.run_pipeline(f"{REFERENCE_PIPELINES}/logic/logic_3.json", {
        "and_1_1__a": True, "and_1_1__b": True,
        "and_1_2__a": True, "and_1_2__b": True,
    })
    assert out["and_2__y"].data is True


def test_multi_input_links_merge_to_list(ctx):
    """List-valued input_links (reference format): upstream outputs merge
    into one list input."""
    pipeline = {
        "steps": [
            {"module_type": "logic.not", "step_id": "n1"},
            {"module_type": "logic.not", "step_id": "n2"},
            {"module_type": "mock", "step_id": "collect",
             "module_config": {
                 "inputs": {"xs": "any"},
                 "outputs": {"out": {"type": "any", "from_input": "xs"}},
             },
             "input_links": {"xs": ["n1.y", "n2.y"]}},
        ],
        "input_aliases": {"n1.a": "a", "n2.a": "b"},
        "output_aliases": {"collect.out": "out"},
    }
    out = ctx.run_pipeline(pipeline, {"a": True, "b": False})
    assert out["out"].data == [False, True]


def test_reference_table_import_pipeline_verbatim(ctx, tables):
    """Run the REFERENCE'S OWN table_import.json unchanged
    (/root/reference/tests/resources/pipelines/table_import.json):
    import.local.file -> create.table.from.file wired through the `file`
    value, inputs addressed by step-qualified field names."""
    path = "/root/reference/tests/resources/pipelines/table_import.json"
    out = ctx.run_pipeline(path, {
        "import_file__path": "/root/testdata/sf0.001/orders.parquet"})
    dfs = [v.data for v in out.values() if hasattr(v.data, "columns")]
    assert dfs and "o_orderkey" in dfs[0].columns
    assert dfs[0].count() > 0


def test_llm_data_prep_example_pipeline(ctx, tables):
    """examples/llm_data_prep.json: the LLM training-data prep DAG
    (load -> quality -> filter -> exact dedup -> token stats -> SQL summary)
    runs end-to-end through the orchestration surface."""
    out = ctx.run_pipeline("examples/llm_data_prep.json", {
        "path": "/root/testdata/sf0.001/documents.parquet",
        "min_quality": "quality_score >= 0.3",
        "summary_query": ("select lang, count(*) as n_docs, "
                          "sum(num_tokens) as total_tokens from data group by lang"),
    })
    clean = out["clean_corpus"].data
    summary = out["corpus_summary"].data
    assert clean.count() > 0
    assert {c for c in summary.columns} == {"lang", "n_docs", "total_tokens"}
    assert summary.count() > 0


def test_corpus_refresh_example_pipeline(ctx, tmp_path):
    """examples/corpus_refresh.json end-to-end: audit + weighted-sample a
    batch, MERGE it into a corpus, pack training bins — the new-op pipeline
    composes through the same lazy-DataFrame DAG as every other pipeline."""
    import pyspark.sql.functions as F

    spark = ctx.spark
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus_path = str(tmp_path / "corpus.parquet")
    batch_path = str(tmp_path / "batch.parquet")
    # corpus = even ids with stale text; batch = a slice with ids 0..99
    docs.filter("doc_id % 2 = 0").withColumn(
        "text", F.concat(F.lit("STALE "), F.col("text"))).write.parquet(corpus_path)
    docs.filter("doc_id < 100").write.parquet(batch_path)

    res = ctx.run_pipeline("examples/corpus_refresh.json", {
        "corpus_path": corpus_path, "batch_path": batch_path})

    audit = {r["check_name"]: r["n_violations"] for r in res["batch_audit"].data.collect()}
    assert audit == {"null_text": 0, "empty_text": 0, "null_doc_id": 0}
    merged = res["refreshed_corpus"].data
    # sampled batch docs replaced their stale twins: any doc_id < 100 kept
    # from the batch must carry non-STALE text
    fresh = merged.filter("doc_id < 100 AND text LIKE 'STALE %'").count()
    sampled_ids = {r["doc_id"] for r in merged.filter("doc_id < 100").collect()
                   if not r["text"].startswith("STALE ")}
    # every non-stale doc under 100 came from the sampled batch; stale
    # leftovers under 100 are even ids the sampler skipped
    assert merged.count() > 0
    for r in merged.filter("doc_id < 100").collect():
        if r["text"].startswith("STALE "):
            assert r["doc_id"] % 2 == 0 and r["doc_id"] not in sampled_ids
    assert fresh + len(sampled_ids) == merged.filter("doc_id < 100").count()
    bins = res["training_bins"].data
    assert bins.agg(F.sum("n_docs")).collect()[0][0] == merged.count()


def test_reference_logic_4_constants(ctx):
    """module_config constants (reference logic_4.json): and_1_1.a is fixed
    false, so it is NOT a pipeline input and the whole AND tree is false
    regardless of the other legs."""
    from kiara_spark.pipeline import PipelineConfig, PipelineStructure

    path = f"{REFERENCE_PIPELINES}/logic/logic_4.json"
    cfg = PipelineConfig.from_file(path)
    st = PipelineStructure(cfg, ctx.module_registry)
    aliases = {pi.alias for pi in st.pipeline_inputs}
    assert "and_1_1__a" not in aliases  # constant: never an open input
    out = ctx.run_pipeline(path, {
        "and_1_1__b": True, "and_1_2__a": True, "and_1_2__b": True})
    assert out["and_2__y"].data is False


def test_reference_invalid_logic_4_rejected(ctx):
    """The reference's invalid_pipelines/logic_4.json names a constant field
    ('a1') that is not an input of logic.and -> rejected."""
    from kiara_spark.modules import InvalidInputsError

    with pytest.raises((InvalidInputsError, ValueError)):
        ctx.run_pipeline(
            "/root/reference/tests/resources/invalid_pipelines/logic_4.json",
            {"and_1_1__a": True, "and_1_1__b": True,
             "and_1_2__a": True, "and_1_2__b": True})


def test_constant_input_cannot_be_set(ctx):
    from kiara_spark.modules import InvalidInputsError

    with pytest.raises(InvalidInputsError, match="constant"):
        ctx.run_job("logic.and", {"a": True, "b": True},
                    operation_config={"constants": {"a": False}})
    out = ctx.run_job("logic.and", {"b": True},
                      operation_config={"constants": {"a": False}})
    assert out["y"].data is False


def test_defaults_are_overridable(ctx):
    out = ctx.run_job("logic.and", {"b": True},
                      operation_config={"defaults": {"a": True}})
    assert out["y"].data is True
    out2 = ctx.run_job("logic.and", {"a": False, "b": True},
                       operation_config={"defaults": {"a": True}})
    assert out2["y"].data is False


def test_mock_module_reference_config_shape(ctx):
    """The reference's MockModuleConfig dialect (inputs_schema + outputs
    with field_schema/data) runs unchanged."""
    out = ctx.run_job("mock", {"q": "hello"}, operation_config={
        "inputs_schema": {"q": {"type": "string"}},
        "outputs": {"result": {
            "field_schema": {"type": "any", "doc": "A result"},
            "data": "mock result data"}},
    })
    assert out["result"].data == "mock result data"


def test_training_mix_example_pipeline(ctx):
    """examples/training_mix.json end-to-end: group-keyed split -> mixture
    sampling -> per-language token cap -> dictionary encoding, through the
    orchestration surface."""
    import pyspark.sql.functions as F

    out = ctx.run_pipeline("examples/training_mix.json", {
        "docs_path": "/root/testdata/sf0.001/documents.parquet"})
    mix = out["training_mix"].data
    assert mix.count() > 0
    # split column present and source-consistent
    per_source = (mix.groupBy("source")
                  .agg(F.countDistinct("split").alias("k")).collect())
    assert all(r["k"] == 1 for r in per_source)
    # dictionary covers every encoded source
    d = out["source_dictionary"].data
    assert mix.filter(F.col("source_id").isNull()).count() == 0
    assert d.count() == mix.select("source").distinct().count()


def test_reference_mock_pipeline_yaml_verbatim(ctx):
    """Run the REFERENCE'S OWN examples/pipelines/mock_pipeline_1.yaml
    unchanged: YAML pipeline config, mock module with configured
    inputs_schema + canned outputs, step-qualified input aliases
    (reference `modules/included_core_modules/mock.py:75-140`)."""
    out = ctx.run_pipeline(
        "/root/reference/examples/pipelines/mock_pipeline_1.yaml",
        {"first": "a", "second": "b"})
    assert out["step_1__combined"].data == "Hello World!"


def test_search_index_build_example_pipeline(ctx):
    """examples/search_index_build.json: normalize -> inverted index +
    BM25 + deterministic augmentation, three outputs from one DAG."""
    out = ctx.run_pipeline("examples/search_index_build.json", {
        "path": "/root/testdata/sf0.001/documents.parquet",
    })
    idx = out["inverted_index"].data
    scores = out["bm25_scores"].data
    aug = out["augmented_corpus"].data
    assert set(idx.columns) == {"term", "doc_freq", "postings"}
    assert idx.filter("doc_freq < 2").count() == 0  # min_df honored
    assert {"doc_id", "bm25", "n_query_terms_hit"} <= set(scores.columns)
    assert scores.count() > 0
    assert aug.filter("n_kept > n_tokens").count() == 0


TABLE_PIPE = {
    "pipeline_name": "region_filter",
    "steps": [
        {"step_id": "load", "module_type": "create.table.from.file"},
        {"step_id": "pick", "module_type": "table.filter.rows",
         "module_config": {"where": "r_regionkey < 3"},
         "input_links": {"table": "load.table"}},
    ],
    "input_aliases": {"load.path": "path"},
    "output_aliases": {"pick.table": "result"},
}


def test_pipeline_cross_restart_warehouse_cache(spark, tmp_path):
    """r3 VERDICT item 10: under data_hash, a pipeline's materialized
    outputs auto-persist to the warehouse; a RESTARTED context (same
    base_path) serves the identical pipeline from storage with ZERO Spark
    jobs — no step runs, no executor work until the caller acts."""
    from kiara_spark.context import KiaraContext

    home = str(tmp_path / "ctx_home")
    inputs = {"path": "/root/testdata/sf0.001/region.parquet"}

    ctx1 = KiaraContext(spark=spark, base_path=home, cache_strategy="data_hash")
    out1 = ctx1.run_pipeline(TABLE_PIPE, inputs)
    rows1 = sorted(map(tuple, out1["result"].data.collect()))
    assert len(rows1) == 3
    hist1 = ctx1.job_registry.history
    assert hist1[-1].module_type == "pipeline" and not hist1[-1].cache_hit

    # fresh context, same base path = the restart
    ctx2 = KiaraContext(spark=spark, base_path=home, cache_strategy="data_hash")
    sc = spark.sparkContext
    sc.setJobGroup("restart-probe", "restart-probe")
    try:
        out2 = ctx2.run_pipeline(TABLE_PIPE, inputs)
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("restart-probe")
    assert jobs == [], f"expected zero Spark jobs on restart hit, got {jobs}"
    rec = ctx2.job_registry.history[-1]
    assert rec.cache_hit and rec.module_type == "pipeline"
    assert sorted(map(tuple, out2["result"].data.collect())) == rows1


def test_pipeline_in_session_composite_hit_skips_steps(spark, tmp_path):
    """Second identical run in ONE context: a single composite cache-hit
    record, no per-step records appended."""
    from kiara_spark.context import KiaraContext

    ctx = KiaraContext(spark=spark, base_path=str(tmp_path / "h2"))
    inputs = {"path": "/root/testdata/sf0.001/region.parquet"}
    ctx.run_pipeline(TABLE_PIPE, inputs)
    n_mid = len(ctx.job_registry.history)
    ctx.run_pipeline(TABLE_PIPE, inputs)
    new = ctx.job_registry.history[n_mid:]
    assert [r.module_type for r in new] == ["pipeline"]
    assert new[0].cache_hit


def test_pipeline_with_sink_step_never_composite_cached(spark, tmp_path):
    """A pipeline containing a SIDE-EFFECT step (export) must bypass the
    composite cache — a cache hit would silently skip the write.  Source
    steps (imports) stay cacheable because their path inputs are
    fingerprint-bound into the key."""
    from kiara_spark.context import KiaraContext

    ctx = KiaraContext(spark=spark, base_path=str(tmp_path / "h3"),
                       cache_strategy="data_hash")
    pipe = {
        "pipeline_name": "imp_exp",
        "steps": [
            {"step_id": "imp", "module_type": "import.local.file"},
            {"step_id": "exp", "module_type": "export.file",
             "module_config": {"name": "copy.parquet"},
             "input_links": {"file": "imp.file"}},
        ],
        "input_aliases": {"imp.path": "path", "exp.base_path": "dest"},
        "output_aliases": {"exp.export_details": "details"},
    }
    inputs = {"path": "/root/testdata/sf0.001/region.parquet",
              "dest": str(tmp_path / "exported")}
    ctx.run_pipeline(pipe, inputs)
    ctx.run_pipeline(pipe, inputs)
    pipes = [r for r in ctx.job_registry.history if r.module_type == "pipeline"]
    assert len(pipes) == 2 and not any(r.cache_hit for r in pipes)


def test_pipeline_source_cache_invalidated_by_file_change(spark, tmp_path):
    """The path fingerprint must bind external state: rewriting the input
    file with different content forces a composite re-run."""
    import shutil
    import time as _time

    from kiara_spark.context import KiaraContext

    src = tmp_path / "data.csv"
    src.write_text("k,v\n1,a\n2,b\n")
    ctx = KiaraContext(spark=spark, base_path=str(tmp_path / "h4"),
                       cache_strategy="data_hash")
    pipe = {
        "pipeline_name": "csvload",
        "steps": [{"step_id": "load", "module_type": "create.table.from.file"}],
        "input_aliases": {"load.path": "path"},
        "output_aliases": {"load.table": "t"},
    }
    out1 = ctx.run_pipeline(pipe, {"path": str(src)})
    assert out1["t"].data.count() == 2
    # same file untouched -> composite hit
    ctx.run_pipeline(pipe, {"path": str(src)})
    assert ctx.job_registry.history[-1].cache_hit
    # rewrite with MORE rows -> new fingerprint -> miss + fresh result
    _time.sleep(0.01)
    src.write_text("k,v\n1,a\n2,b\n3,c\n")
    out3 = ctx.run_pipeline(pipe, {"path": str(src)})
    assert not ctx.job_registry.history[-1].cache_hit
    assert out3["t"].data.count() == 3


def test_crawl_curation_example_pipeline(spark, tmp_path):
    """examples/crawl_curation.json end-to-end: raw HTML pages -> extract
    -> URL dedup (canonical survivors only) -> normalize -> quality."""
    from kiara_spark.context import KiaraContext

    rows = []
    for i in range(6):
        # pairs of URL variants pointing at the same canonical page
        url = (f"https://www.site{i % 3}.ex.com/a" if i < 3
               else f"HTTP://site{i % 3}.ex.com/a?utm_source=t")
        rows.append((i, url,
                     f"<html><body><p>Page {i % 3} body text here"
                     f"</p><script>x()</script></body></html>"))
    import pandas as pd
    src = str(tmp_path / "pages.parquet")
    pd.DataFrame(rows, columns=["doc_id", "url", "html"]).to_parquet(src)

    ctx = KiaraContext(spark=spark, base_path=str(tmp_path / "home"))
    out = ctx.run_pipeline("examples/crawl_curation.json", {"path": src})
    report = {r["canonical_url"]: r for r in out["url_dup_report"].data.collect()}
    assert len(report) == 3 and all(r["n_dups"] == 2 for r in report.values())
    corpus = out["curated_corpus"].data.collect()
    assert len(corpus) == 3  # one survivor per canonical URL
    by_id = {r["doc_id"]: r for r in corpus}
    assert set(by_id) == {0, 1, 2}  # min-id survivors
    assert by_id[0]["extracted_text"] == "Page 0 body text here"
    assert all(r["quality_score"] is not None for r in corpus)


def test_pipeline_source_not_cacheable_without_fingerprint(spark, tmp_path):
    """r4 review: a source step whose path is a glob/remote URI (no local
    fingerprint) must DISABLE the composite cache — the key cannot see the
    external state, so a hit could serve stale results."""
    import shutil

    from kiara_spark.context import KiaraContext

    d = tmp_path / "globdir"
    d.mkdir()
    src = d / "a.csv"
    src.write_text("k,v\n1,a\n")
    ctx = KiaraContext(spark=spark, base_path=str(tmp_path / "h5"),
                       cache_strategy="data_hash")
    pipe = {
        "pipeline_name": "globload",
        "steps": [{"step_id": "load", "module_type": "create.table.from.file",
                   "module_config": {"file_format": "csv"}}],
        "input_aliases": {"load.path": "path"},
        "output_aliases": {"load.table": "t"},
    }
    glob_path = str(d / "*.csv")
    out1 = ctx.run_pipeline(pipe, {"path": glob_path})
    assert out1["t"].data.count() == 1
    out2 = ctx.run_pipeline(pipe, {"path": glob_path})
    assert not ctx.job_registry.history[-1].cache_hit  # never cached
    # and results track the file set
    (d / "b.csv").write_text("k,v\n2,b\n3,c\n")
    out3 = ctx.run_pipeline(pipe, {"path": glob_path})
    assert out3["t"].data.count() == 3


def test_pipeline_config_path_fingerprinted(spark, tmp_path):
    """A source step whose path lives in module_config (not a pipeline
    input) must bind that file's fingerprint into the composite key."""
    import time as _time

    from kiara_spark.context import KiaraContext

    src = tmp_path / "cfg.csv"
    src.write_text("k,v\n1,a\n")
    ctx = KiaraContext(spark=spark, base_path=str(tmp_path / "h6"),
                       cache_strategy="data_hash")
    pipe = {
        "pipeline_name": "cfgload",
        "steps": [{"step_id": "load", "module_type": "create.table.from.file",
                   "module_config": {"path": str(src)}}],
        "output_aliases": {"load.table": "t"},
    }
    assert ctx.run_pipeline(pipe, {})["t"].data.count() == 1
    ctx.run_pipeline(pipe, {})
    assert ctx.job_registry.history[-1].cache_hit
    _time.sleep(0.01)
    src.write_text("k,v\n1,a\n2,b\n")
    out = ctx.run_pipeline(pipe, {})
    assert not ctx.job_registry.history[-1].cache_hit
    assert out["t"].data.count() == 2


def test_dir_fingerprint_sees_renames(tmp_path):
    from kiara_spark.pipeline.runner import _path_fingerprint

    d = tmp_path / "fp"
    d.mkdir()
    (d / "a.txt").write_text("xx")
    fp1 = _path_fingerprint(str(d))
    (d / "a.txt").rename(d / "b.txt")
    fp2 = _path_fingerprint(str(d))
    assert fp1 != fp2  # rename changes the fingerprint
    assert _path_fingerprint(str(d / "*.txt")) is None  # glob: no fp


def test_pretraining_curation_example_pipeline(spark, tmp_path):
    """examples/pretraining_curation.json end-to-end: code routing ->
    Gopher rules -> filter -> C4 clean -> filter -> perplexity tiles +
    readability."""
    import pandas as pd

    from kiara_spark.context import KiaraContext

    good_line = ("The quick brown fox jumps over the lazy dog and runs far "
                 "away to be safe today.")
    code_doc = ("def main():\n"
                "    x = load();\n"
                "    y = (x + 1);\n"
                "    return y;\n"
                "import sys\n"
                "print(main());\n")
    rows = []
    for i in range(10):
        if i < 6:  # passes Gopher (50+ words) and C4 (punctuated lines)
            rows.append((i, "\n".join([good_line] * 7)))
        elif i < 8:  # fails Gopher: too short
            rows.append((i, "tiny fragment"))
        elif i == 8:  # passes Gopher, killed by C4 doc rule (brace)
            rows.append((i, "\n".join([good_line] * 7) + "\n{ code }"))
        else:  # source code: routed out by the detector BEFORE Gopher
            rows.append((i, code_doc))
    src = str(tmp_path / "docs.parquet")
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(src)

    ctx = KiaraContext(spark=spark, base_path=str(tmp_path / "home"))
    out = ctx.run_pipeline("examples/pretraining_curation.json",
                           {"path": src})
    code = {r["doc_id"]: r["is_code"]
            for r in out["code_verdicts"].data.collect()}
    assert code[9] is True and not any(code[i] for i in range(9))
    verdicts = {r["doc_id"]: r for r in out["c4_verdicts"].data.collect()}
    # gopher dropped 6, 7; the code router already removed 9
    assert set(verdicts) == {0, 1, 2, 3, 4, 5, 8}
    assert not verdicts[8]["kept_doc"]  # brace kills doc 8 at the C4 stage
    tiles = {r["doc_id"]: r for r in out["perplexity_tiles"].data.collect()}
    assert set(tiles) == {0, 1, 2, 3, 4, 5}
    assert {r["label"] for r in tiles.values()} == {"head", "middle", "tail"}
    readability = out["readability_report"].data.collect()
    assert len(readability) == 6
    assert all(r["flesch_score"] is not None for r in readability)


def test_dh_corpus_analysis_example_pipeline(spark, tmp_path):
    """examples/dh_corpus_analysis.json end-to-end: stopwords -> stem ->
    TextRank keywords + term trends + KWIC concordance."""
    from kiara_spark.context import KiaraContext

    ctx = KiaraContext(spark=spark, base_path=str(tmp_path / "home"))
    out = ctx.run_pipeline(
        "examples/dh_corpus_analysis.json",
        {"path": "/root/testdata/sf0.001/documents.parquet",
         "term": "window"})
    kws = out["keywords"].data.collect()
    assert 0 < len(kws) <= 20
    # stopwords were stripped before the keyword graph was built
    assert all(r["keyword"] not in ("the", "and", "of") for r in kws)
    trends = out["term_trends"].data.collect()
    assert len(trends) == 20 * 3  # 20 sources x 3 tracked terms
    conc = out["concordance"].data.collect()
    assert len(conc) > 0
    assert all(r["term"] == "window" for r in conc)
    prepared = out["prepared_corpus"].data.columns
    assert "text_stemmed" in prepared and "n_changed" in prepared


def test_model_eval_suite_example_pipeline(ctx):
    """examples/model_eval_suite.json: one scored frame fanned into four
    metric branches (AUC, AP, calibration, confusion report)."""
    out = ctx.run_pipeline("examples/model_eval_suite.json", {
        "orders_path": "/root/testdata/sf0.001/orders.parquet"})
    auc = out["roc_auc"].data.collect()[0]
    ap = out["average_precision"].data.collect()[0]
    assert 0.0 <= auc.auc <= 1.0
    assert 0.0 <= ap.average_precision <= 1.0
    assert ap.n_pos == auc.n_pos
    bins = out["calibration_bins"].data.collect()
    assert 1 <= len(bins) <= 10
    rep = {r.metric: r.value for r in out["classification_report"].data
           .select("metric", "value").collect()} if \
        "metric" in out["classification_report"].data.columns else None
    assert out["classification_report"].data.count() >= 1
