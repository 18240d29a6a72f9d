"""Warehouse persistence (restart-surviving aliases) and portable archives
(reference ``tests/test_archives/test_archive_export.py`` /
``test_archive_import.py`` with the ``nand_true.0.10.kiarchive`` golden)."""

import pytest

from kiara_spark import KiaraContext


@pytest.fixture()
def fresh_ctx(spark, tmp_path):
    return KiaraContext(spark=spark, base_path=str(tmp_path / "ctx"))


def test_stored_alias_survives_restart(spark, tmp_path, fresh_ctx):
    out = fresh_ctx.run_job("table.query.sql", {
        "table": spark.read.parquet("/root/testdata/sf0.001/nation.parquet"),
        "query": "select n_regionkey, count(*) as n from data group by 1",
    })
    fresh_ctx.store_value(out["table"], alias="nation_counts")

    # new context over the same base_path = restart
    ctx2 = KiaraContext(spark=spark, base_path=fresh_ctx.base_path)
    v = ctx2.get_value("alias:nation_counts")
    assert v.data.count() == 5
    # pedigree survived the round-trip
    assert v.pedigree.module_type == "table.query.sql"
    assert "nation_counts" in ctx2.data_registry.aliases


def test_store_dedups_by_content_hash(spark, fresh_ctx):
    df = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    v1 = fresh_ctx.register_table(df)
    v2 = fresh_ctx.register_table(df.orderBy("r_regionkey"))  # same content
    p1 = fresh_ctx.data_registry.store_value(v1)
    p2 = fresh_ctx.data_registry.store_value(v2)
    assert p1 == p2  # second store reused the existing dataset


def test_archive_roundtrip(spark, tmp_path, fresh_ctx):
    out = fresh_ctx.run_job("table.query.sql", {
        "table": spark.read.parquet("/root/testdata/sf0.001/region.parquet"),
        "query": "select r_name from data order by r_name",
    })
    fresh_ctx.data_registry.register_alias("region_names", out["table"])

    archive = str(tmp_path / "arch")
    manifest = fresh_ctx.export_archive(["region_names"], archive)
    assert manifest["aliases"]["region_names"] == out["table"].value_id
    assert any(n["has_data"] for n in manifest["values"].values())

    ctx2 = KiaraContext(spark=spark, base_path=str(tmp_path / "ctx2"))
    loaded = ctx2.import_archive(archive, alias_prefix="imp_")
    v = ctx2.get_value("alias:imp_region_names")
    names = [r["r_name"] for r in v.data.collect()]
    assert names == sorted(names) and len(names) == 5
    # provenance travelled with the data
    assert v.pedigree.module_type == "table.query.sql"


def test_archive_rejects_unknown_version(tmp_path, fresh_ctx):
    import json
    import os

    bad = tmp_path / "bad_arch"
    os.makedirs(bad)
    (bad / "manifest.json").write_text(json.dumps({"format_version": 99}))
    with pytest.raises(ValueError, match="unsupported archive format"):
        fresh_ctx.import_archive(str(bad))


def test_sessionize_module(ctx, tables):
    out = ctx.run_job("events.sessionize", {"events": "alias:events"},
                      operation_config={"gap_seconds": 1800.0})
    df = out["sessions"].data
    assert df.columns == ["user_id", "session_start_us", "session_end_us", "n_events"]
    total = df.agg({"n_events": "sum"}).collect()[0][0]
    assert total == tables["events"].data.count()


def test_append_upgrades_metadata_only_node(spark, tmp_path, fresh_ctx):
    """r12 advice: in append mode a value the prior manifest recorded as
    metadata-only (exported as an un-shipped ancestor) must get its data
    written — not early-returned — when appended explicitly; otherwise its
    alias imports nothing."""
    src = fresh_ctx.register_table(
        spark.read.parquet("/root/testdata/sf0.001/region.parquet"))
    out = fresh_ctx.run_job("table.query.sql", {
        "table": src,
        "query": "select r_name from data order by r_name",
    })
    fresh_ctx.data_registry.register_alias("derived", out["table"])

    archive = str(tmp_path / "arch")
    # first export ships only the derived value; the ancestor lands as a
    # metadata-only lineage node (has_data: False)
    m1 = fresh_ctx.export_archive(["derived"], archive,
                                  include_ancestors=False)
    assert m1["values"][src.value_id]["has_data"] is False

    fresh_ctx.data_registry.register_alias("ancestor", src)
    m2 = fresh_ctx.export_archive(["ancestor"], archive, append=True)
    node = m2["values"][src.value_id]
    assert node["has_data"] is True and "spark_schema" in node
    # the appended alias now round-trips with data
    ctx2 = KiaraContext(spark=spark, base_path=str(tmp_path / "ctx2"))
    loaded = ctx2.import_archive(archive, values=["ancestor"])
    assert loaded["ancestor"].data.count() == 5


def test_import_values_restores_only_requested_alias(spark, tmp_path,
                                                     fresh_ctx):
    """r12 advice: importing one selected alias must not drag in sibling
    aliases pointing at the same value_id; and the API default matches the
    reference (alias_map=False — no aliases unless asked)."""
    from kiara_spark.api import KiaraAPI

    v = fresh_ctx.register_table(
        spark.read.parquet("/root/testdata/sf0.001/region.parquet"))
    fresh_ctx.data_registry.register_alias("main_name", v)
    fresh_ctx.data_registry.register_alias("sibling_name", v)
    archive = str(tmp_path / "arch2")
    fresh_ctx.export_archive(["main_name", "sibling_name"], archive)

    ctx2 = KiaraContext(spark=spark, base_path=str(tmp_path / "ctx2"))
    api2 = KiaraAPI(context=ctx2)
    out = api2.import_values(archive, values=["main_name"], alias_map=True)
    assert set(out) == {"main_name"}
    assert "sibling_name" not in ctx2.data_registry.aliases

    # reference default: no aliases restored unless alias_map is set
    ctx3 = KiaraContext(spark=spark, base_path=str(tmp_path / "ctx3"))
    out3 = KiaraAPI(context=ctx3).import_values(archive)
    assert set(out3) == {v.value_id}
    assert "main_name" not in ctx3.data_registry.aliases


def test_by_id_warehouse_fallback_requires_uuid_shape(spark, tmp_path):
    """r12 advice: the cross-restart by-id fallback joins the ref onto the
    warehouse path — a non-uuid ref with separators must never escape the
    warehouse or load an arbitrary parquet directory as a value."""
    import os

    ctx = KiaraContext(spark=spark, base_path=str(tmp_path / "ctx"))
    # a parquet dataset OUTSIDE the warehouse, reachable via '..'
    evil = tmp_path / "evil"
    spark.range(0, 3).write.parquet(str(evil))
    wh = ctx.data_registry.warehouse_path
    traversal = os.path.relpath(str(evil), wh)
    assert os.path.isdir(os.path.join(wh, traversal))
    with pytest.raises(KeyError, match="no value for ref"):
        ctx.get_value(traversal)
    # uuid-shaped refs still resolve cross-restart
    v = ctx.register_table(
        spark.read.parquet("/root/testdata/sf0.001/region.parquet"))
    ctx.data_registry.store_value(v)
    ctx2 = KiaraContext(spark=spark, base_path=ctx.base_path)
    assert ctx2.get_value(v.value_id).data.count() == 5
