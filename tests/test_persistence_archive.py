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
