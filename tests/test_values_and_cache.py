"""Value model, content hashing, job memoization — reference semantics
(SURVEY §1.1, §4): dedup-by-hash, value_id/data_hash cache strategies,
non-idempotent bypass."""

import pytest

from kiara_spark.hashing import dataframe_content_hash, job_hash, manifest_hash
from kiara_spark.modules import InvalidInputsError


def test_manifest_hash_is_order_insensitive():
    a = manifest_hash("table.join", {"how": "inner", "on": ["k"]})
    b = manifest_hash("table.join", {"on": ["k"], "how": "inner"})
    assert a == b
    assert a != manifest_hash("table.join", {"how": "left", "on": ["k"]})


def test_job_hash_depends_on_inputs():
    h1 = job_hash("m", {}, {"x": "v1"})
    h2 = job_hash("m", {}, {"x": "v2"})
    assert h1 != h2


def test_dataframe_content_hash_partition_invariant(spark):
    df = spark.range(0, 1000).selectExpr("id", "id * 2 as dbl", "cast(id as string) as s")
    h1 = dataframe_content_hash(df)
    h2 = dataframe_content_hash(df.repartition(7))
    h3 = dataframe_content_hash(df.orderBy("dbl"))
    assert h1 == h2 == h3
    h4 = dataframe_content_hash(df.filter("id < 999"))
    assert h4 != h1


def test_value_registration_and_alias(ctx, tables):
    v = ctx.get_value("alias:lineitem")
    assert v.data_type == "table"
    assert ctx.get_value("lineitem").value_id == v.value_id
    assert ctx.get_value(f"value:{v.value_id}").value_id == v.value_id


def test_cache_hit_on_same_inputs(ctx, tables):
    li = ctx.get_value("lineitem")
    m1 = ctx.create_module("table.limit")
    bound = ctx._bind_inputs(m1, {"table": li, "n": 7})
    r1 = ctx.job_registry.execute_job(m1, bound)
    r2 = ctx.job_registry.execute_job(ctx.create_module("table.limit"), bound)
    assert not r1.cache_hit and r2.cache_hit
    assert r2.outputs["table"].value_id == r1.outputs["table"].value_id


def test_non_idempotent_bypasses_cache(ctx):
    m = ctx.create_module("import.local.file")
    bound = ctx._bind_inputs(m, {"path": "/root/testdata/sf0.001/region.parquet"})
    r1 = ctx.job_registry.execute_job(m, bound)
    r2 = ctx.job_registry.execute_job(ctx.create_module("import.local.file"), bound)
    assert not r1.cache_hit and not r2.cache_hit


def test_invalid_inputs_names_fields(ctx):
    m = ctx.create_module("logic.and")
    with pytest.raises(InvalidInputsError) as exc:
        m.run(ctx._bind_inputs(m, {"a": True}), ctx)
    assert "b" in exc.value.invalid


def test_boolean_parsing_like_reference(ctx):
    out = ctx.run_job("logic.and", {"a": "true", "b": 1})
    assert out["y"].data is True
    out = ctx.run_job("logic.and", {"a": "false", "b": True})
    assert out["y"].data is False


def test_pedigree_and_lineage(ctx, tables):
    out = ctx.run_job("table.filter.rows",
                      {"table": ctx.get_value("orders"), "where": "o_totalprice > 100"})
    v = out["table"]
    assert v.pedigree.module_type == "table.filter.rows"
    tree = ctx.data_registry.lineage(v)
    assert tree["module"] == "table.filter.rows"
    assert "table" in tree["inputs"]


def test_store_value_roundtrip_and_dedup(ctx, spark, tmp_path):
    df = spark.range(0, 50).selectExpr("id", "id % 5 as g")
    v1 = ctx.register_table(df)
    p1 = ctx.data_registry.store_value(v1, alias="stored_one")
    v2 = ctx.register_table(spark.range(0, 50).selectExpr("id", "id % 5 as g"))
    p2 = ctx.data_registry.store_value(v2)
    assert p1 == p2  # deduped by content hash
    loaded = ctx.data_registry.load_value(p1)
    assert loaded.data.count() == 50


def test_extract_metadata_profile(ctx, tables):
    out = ctx.run_job("value.extract_metadata", {"value": ctx.get_value("region")})
    meta = out["value_metadata"].data
    assert meta["rows"] == 5
    assert meta["columns"]["r_regionkey"]["nulls"] == 0


# -- destinies / properties (reference data/__init__.py:693-820) ------------


def test_destiny_resolve_attaches_property_no_rerun(ctx, tables):
    """Register a metadata-extraction destiny, resolve it, then re-fetch the
    value and read the property back — without executing the job again."""
    reg = ctx.data_registry
    v = ctx.get_value("alias:nation")
    reg.register_destiny(v, "metadata", "extract.table.metadata")
    assert reg.destiny_aliases(v) == ["metadata"]

    result = reg.resolve_destiny(v, "metadata")
    assert result.data["rows"] == 25

    # re-fetch the SAME value from the registry: property is attached
    v2 = ctx.get_value(f"value:{v.value_id}")
    assert v2.property_names == ["metadata"]
    n_jobs_before = len([r for r in ctx.job_registry.history if not r.cache_hit])
    prop = reg.get_property_value(v2, "metadata")
    assert prop.value_id == result.value_id
    assert prop.data["rows"] == 25
    # resolve again: cached result id short-circuits, no new execution
    again = reg.resolve_destiny(v, "metadata")
    assert again.value_id == result.value_id
    n_jobs_after = len([r for r in ctx.job_registry.history if not r.cache_hit])
    assert n_jobs_after == n_jobs_before
    # origin backlink recorded on the derived value
    assert result.destiny_backlinks == {v.value_id: "metadata"}


def test_destiny_duplicate_alias_rejected(ctx, tables):
    reg = ctx.data_registry
    v = ctx.get_value("alias:region")
    reg.register_destiny(v, "meta2", "extract.table.metadata")
    with pytest.raises(ValueError, match="duplicate destiny"):
        reg.register_destiny(v, "meta2", "extract.table.metadata")


def test_property_immutable_once_attached(ctx, tables):
    from kiara_spark.values import Value, ValueSchema

    a = Value(data=1, schema=ValueSchema(type="integer"))
    b = Value(data=2, schema=ValueSchema(type="integer"))
    a.add_property(b, "twin")
    with pytest.raises(ValueError, match="already set"):
        a.add_property(b, "twin")


# -- value matchers (reference models/values/matchers.py:14-69) -------------


def test_find_values_by_type_and_alias(ctx, tables):
    reg = ctx.data_registry
    found = reg.find_values(data_types="table", alias_matchers="nat*")
    assert [a for a in ("nation",) if any(
        reg.aliases.get("nation") == vid for vid in found)]
    # scalar values don't match type=table
    sv = reg.register_data(42, data_type="integer")
    assert sv.value_id not in reg.find_values(data_types="table")
    # has_alias excludes the anonymous scalar
    assert sv.value_id not in reg.find_values(has_alias=True)


def test_find_values_size_bounds(ctx, tables):
    reg = ctx.data_registry
    lineitem = ctx.get_value("alias:lineitem")
    region = ctx.get_value("alias:region")
    big = reg.value_size(lineitem)
    small = reg.value_size(region)
    assert big > small > 0
    found = reg.find_values(data_types="table", min_size=small + 1)
    assert lineitem.value_id in found
    assert region.value_id not in found
    capped = reg.find_values(data_types="table", max_size=small)
    assert region.value_id in capped
    assert lineitem.value_id not in capped


def test_job_environment_fingerprint(ctx, tables):
    """Job records capture the full runtime environment (python, packages,
    OS, spark) + a stable hash — reference runtime_environment models."""
    ctx.run_job("logic.and", {"a": True, "b": True})
    rec = [r for r in ctx.job_registry.history if not r.cache_hit][-1]
    env = rec.environment
    assert env["python"] and env["pyspark"]
    assert "numpy" in env["packages"] and "pandas" in env["packages"]
    assert env["os"]["system"] == "Linux"
    assert env["spark"]["version"] and env["spark"]["java"]
    assert len(env["environment_hash"]) >= 16
    # the FULL installed-distribution set is captured (reference
    # PythonRuntimeEnvironment), not just the hard dependencies
    assert "pyspark" in env["packages"] and len(env["packages"]) > 4
    assert len(env["packages_hash"]) >= 16


def test_data_hash_cache_key_binds_package_set(spark, tmp_path, monkeypatch):
    """Deep (data_hash) cache keys must change when the installed-package
    set drifts — a dependency upgrade may change what an operator computes,
    and a restart-surviving stale hit would silently serve the old answer."""
    from kiara_spark import KiaraContext
    from kiara_spark.registries.jobs import JobRegistry

    ctx = KiaraContext(spark=spark, base_path=str(tmp_path),
                       cache_strategy="data_hash")
    ctx.run_job("logic.and", {"a": True, "b": True})
    rec1 = ctx.job_registry.history[-1]
    assert not rec1.cache_hit
    # same inputs, same env: hit
    ctx.run_job("logic.and", {"a": True, "b": True})
    assert ctx.job_registry.history[-1].cache_hit
    # drift the package set: the key changes, so the job re-executes
    drifted = dict(JobRegistry._installed_packages())
    k = sorted(drifted)[0]
    drifted[k] = (drifted[k] or "0") + ".post1"
    monkeypatch.setattr(JobRegistry, "_installed_packages",
                        staticmethod(lambda: drifted))
    monkeypatch.setattr(ctx.job_registry, "_env_cache", None)
    ctx.run_job("logic.and", {"a": True, "b": True})
    rec3 = ctx.job_registry.history[-1]
    assert not rec3.cache_hit
    assert rec3.job_hash != rec1.job_hash


def test_environment_hash_changes_on_package_drift(ctx, monkeypatch):
    """r2 verdict task 7: the packages hash must invalidate when a tracked
    package version changes, so data_hash memoization can detect
    dependency drift across restarts."""
    from kiara_spark.hashing import hash_obj
    from kiara_spark.registries.jobs import JobRegistry

    reg = ctx.job_registry
    base = reg._environment()
    drifted = dict(JobRegistry._installed_packages())
    assert drifted, "package scan came back empty"
    k = sorted(drifted)[0]
    drifted[k] = (drifted[k] or "0") + ".post1"
    monkeypatch.setattr(JobRegistry, "_installed_packages",
                        staticmethod(lambda: drifted))
    monkeypatch.setattr(reg, "_env_cache", None)
    moved = reg._environment()
    assert moved["packages_hash"] != base["packages_hash"]
    assert moved["environment_hash"] != base["environment_hash"]
    assert base["packages_hash"] == hash_obj(base["packages"])


def test_property_links_survive_store_load(spark, tmp_path):
    """property_links round-trip through the warehouse sidecar."""
    from kiara_spark import KiaraContext

    ctx1 = KiaraContext(spark=spark, base_path=str(tmp_path))
    df = spark.createDataFrame([(1, "x")], "k int, v string")
    v = ctx1.register_table(df, alias="t")
    ctx1.data_registry.register_destiny(v, "metadata", "extract.table.metadata")
    ctx1.data_registry.resolve_destiny(v, "metadata")
    path = ctx1.store_value(v)

    ctx2 = KiaraContext(spark=spark, base_path=str(tmp_path))
    v2 = ctx2.data_registry.load_value(path)
    assert v2.property_names == ["metadata"]
    assert v2.property_links == v.property_links
