"""Filesystem source/sink operators (reference filesystem.py family)."""

import os


def _mk_corpus(tmp_path):
    d = tmp_path / "corpus"
    (d / "sub").mkdir(parents=True)
    (d / "a.txt").write_text("hello world")
    (d / "b.txt").write_text("goodbye")
    (d / "sub" / "c.txt").write_text("nested file")
    (d / "skip.bin").write_bytes(b"\x00\x01")
    return str(d)


def test_import_file(ctx, tmp_path):
    p = tmp_path / "one.txt"
    p.write_text("content here")
    out = ctx.run_job("import.file", {"path": str(p)})
    kf = out["file"].data
    assert kf.file_name == "one.txt" and kf.read_text() == "content here"


def test_import_bundle_with_filters(ctx, tmp_path):
    base = _mk_corpus(tmp_path)
    out = ctx.run_job("import.file_bundle", {"path": base},
                      operation_config={"include_file_types": [".txt"]})
    df = out["file_bundle"].data
    paths = sorted(r["rel_path"] for r in df.collect())
    assert paths == ["a.txt", "b.txt", "sub/c.txt"]


def test_pick_file_and_subfolder(ctx, tmp_path):
    base = _mk_corpus(tmp_path)
    bundle = ctx.run_job("import.file_bundle", {"path": base},
                         operation_config={"include_file_types": [".txt"]})["file_bundle"]
    one = ctx.run_job("file_bundle.pick.file", {"file_bundle": bundle, "path": "a.txt"})
    assert one["file"].data.count() == 1
    sub = ctx.run_job("file_bundle.pick.sub_folder",
                      {"file_bundle": bundle, "sub_path": "sub"})
    assert [r["rel_path"] for r in sub["file_bundle"].data.collect()] == ["sub/c.txt"]


def test_bundle_to_text_table(ctx, tmp_path):
    base = _mk_corpus(tmp_path)
    bundle = ctx.run_job("import.file_bundle", {"path": base},
                         operation_config={"include_file_types": [".txt"]})["file_bundle"]
    table = ctx.run_job("create.table.from.file_bundle", {"file_bundle": bundle})["table"]
    rows = {r["rel_path"]: r["text"] for r in table.data.collect()}
    assert rows["a.txt"] == "hello world"


def test_create_file_from_bytes_and_export(ctx, tmp_path):
    f = ctx.run_job("create.file.from.bytes",
                    {"bytes": b"payload", "file_name": "x.bin"})["file"]
    out = ctx.run_job("export.file.as.copy",
                      {"file": f, "base_path": str(tmp_path / "exp"), "name": "y.bin"})
    detail = out["export_details"].data
    assert os.path.exists(detail["path"])
    assert open(detail["path"], "rb").read() == b"payload"


def test_serialization_family(ctx):
    import pickle

    out = ctx.run_job("unpickle.value", {"value": pickle.dumps({"a": [1, 2]})})
    assert out["python_object"].data == {"a": [1, 2]}

    out = ctx.run_job("load.string", {"value": "héllo".encode()})
    assert out["python_object"].data == "héllo"

    out = ctx.run_job("load.bytes", {"value": b"\x00\x01"})
    assert out["python_object"].data == b"\x00\x01"

    out = ctx.run_job("deserialize.from_json",
                      {"value": '{"a": {"b": 42}}'},
                      operation_config={"result_path": "a.b"})
    assert out["python_object"].data == 42


def test_deserialize_unknown_profile(ctx):
    import pytest

    with pytest.raises(ValueError, match="unknown deserialization profile"):
        ctx.run_job("unpickle.value", {"value": b"x"},
                    operation_config={"profile": "nope"})


def test_render_value_pagination(ctx, tables):
    out = ctx.run_job("render.value", {"value": "alias:nation"},
                      operation_config={"offset": 5, "limit": 3})
    res = out["render_value_result"].data
    assert res["kind"] == "table_page"
    assert len(res["rows"]) == 3
    assert res["related_scenes"]["next"]["offset"] == 8
    assert res["related_scenes"]["previous"]["offset"] == 2
    # page 2 starts where page 1 ended
    first = ctx.run_job("render.value", {"value": "alias:nation"},
                        operation_config={"offset": 0, "limit": 5})
    ids = [r["n_nationkey"] for r in first["render_value_result"].data["rows"]]
    assert res["rows"][0]["n_nationkey"] not in ids


def test_frame_sample_fanout(spark, ctx):
    import pyspark.sql.functions as F

    from kiara_spark.operators.misc import frame_sample_stub

    df = spark.createDataFrame(
        [(1, b"x" * 2500), (2, b"y" * 100), (3, None)],
        "id long, media binary")
    rows = frame_sample_stub(df, "media", id_col="id",
                             frame_bytes=1000, max_frames=8).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append((r["frame_idx"], r["frame_offset"], r["frame_len"]))
    assert sorted(by_id[1]) == [(0, 0, 1000), (1, 1000, 1000), (2, 2000, 500)]
    assert by_id[2] == [(0, 0, 100)]
    assert 3 not in by_id  # NULL media -> no frames
    assert "media.frame_sample" in ctx.operation_registry.operation_ids


def test_resize_stub_letterbox_math(spark, ctx):
    from kiara_spark.operators.misc import resize_image_stub

    df = spark.createDataFrame(
        [(1, 64, 48), (2, 10, 224), (3, 0, 0)],
        "id long, width int, height int")
    rows = {r["id"]: r for r in resize_image_stub(df, 224, 224).collect()}
    # 64x48 -> scale 3.5 -> 224x168
    assert (rows[1]["resized_w"], rows[1]["resized_h"]) == (224, 168)
    # 10x224 -> scale 1.0 -> unchanged
    assert (rows[2]["resized_w"], rows[2]["resized_h"]) == (10, 224)
    # corrupt (0-dim) rows kept with zeros, not dropped
    assert (rows[3]["resized_w"], rows[3]["resized_h"], rows[3]["scale"]) == (0, 0, 0.0)
    assert "media.resize_image" in ctx.operation_registry.operation_ids


def test_audio_stub_header_math(spark, ctx):
    from kiara_spark.operators.misc import decode_audio_stub

    df = spark.createDataFrame(
        [(1, b"x" * 32000), (2, b"y" * 7), (3, None)],
        "id long, media binary")
    rows = {r["id"]: r for r in
            decode_audio_stub(df, "media", passthrough=("id",)).collect()}
    # 32000 bytes: rate 8000*(32000%3+1)=24000, chans 1+0=1, 16-bit PCM
    # duration = 32000*1000 // (24000*1*2) = 666 ms
    assert (rows[1]["sample_rate"], rows[1]["n_channels"],
            rows[1]["duration_ms"]) == (24000, 1, 666)
    # 7 bytes: rate 8000*(7%3+1)=16000, chans 1+1=2, 7000//(16000*2*2)=0
    assert (rows[2]["sample_rate"], rows[2]["n_channels"],
            rows[2]["duration_ms"]) == (16000, 2, 0)
    # NULL media kept as zero-feature audit row, not dropped
    assert (rows[3]["byte_len"], rows[3]["sample_rate"],
            rows[3]["duration_ms"]) == (0, 0, 0)
    assert "media.decode_audio" in ctx.operation_registry.operation_ids


def test_python_datasource_partitions_and_pushdown(spark):
    from pyspark.sql import functions as F

    from kiara_spark.sources import register_python_sources, synth_row

    register_python_sources(spark)
    df = (spark.read.format("kiara_synth_docs")
          .option("partitions", "5").option("rowsPerPartition", "40").load())
    # one task per declared input partition
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 200
    # rows are the documented pure function of the id
    got = {r["doc_id"]: (r["lang"], r["n_chars"]) for r in df.collect()}
    for i in (0, 7, 199):
        did, lang, n = synth_row(i)
        assert got[i] == (lang, n)
    # pushed-down lang filter == post-filter semantics (pushdown must never
    # change results), and the unpushable predicate still applies
    pushed = df.filter((F.col("lang") == "zh") & (F.col("n_chars") % 2 == 0))
    expect = sorted(i for i, (l, n) in got.items() if l == "zh" and n % 2 == 0)
    assert sorted(r["doc_id"] for r in pushed.collect()) == expect


def test_python_datasource_jsonl_writer_roundtrip(spark, tmp_path):
    import json

    from kiara_spark.sources import register_python_sources

    register_python_sources(spark)
    out = str(tmp_path / "jsonl_sink")
    df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    df.repartition(3).write.format("kiara_jsonl").option("path", out) \
        .mode("append").save()
    manifest = json.loads((tmp_path / "jsonl_sink" / "_MANIFEST.json").read_text())
    assert manifest["n_rows"] == df.count()
    assert len(manifest["files"]) == 3
    back = spark.read.json(f"{out}/part-*.jsonl")
    assert back.count() == df.count()
    assert sorted(r["n_name"] for r in back.collect()) == \
           sorted(r["n_name"] for r in df.collect())


def test_python_stream_source_replay_contract(spark):
    """readBetweenOffsets must regenerate exactly the rows the incremental
    read() path produced for the same offset range — the recovery contract."""
    from kiara_spark.sources import SynthDocsStreamReader

    r = SynthDocsStreamReader({"rowsPerBatch": 7, "maxRows": 30})
    off = r.initialOffset()
    incremental = []
    while off["idx"] < 30:
        rows, nxt = r.read(off)
        incremental.extend(rows)
        assert nxt["idx"] > off["idx"]
        off = nxt
    replay = list(r.readBetweenOffsets({"idx": 0}, {"idx": 30}))
    assert incremental == replay
    # arbitrary mid-range slice replays exactly
    assert list(r.readBetweenOffsets({"idx": 5}, {"idx": 12})) == incremental[5:12]


def test_python_datasource_stream_writer_epochs(spark, tmp_path):
    import glob
    import json

    from kiara_spark.sources import register_python_sources

    register_python_sources(spark)
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    in_dir = str(tmp_path / "in")
    src.limit(300).coalesce(1).write.parquet(in_dir)
    out = str(tmp_path / "stream_sink")
    stream = spark.readStream.schema(src.schema).parquet(in_dir)
    q = (stream.writeStream.format("kiara_jsonl").option("path", out)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    manifests = sorted(glob.glob(f"{out}/_EPOCH_*.json"))
    assert manifests, "no epoch manifests written"
    total = sum(json.loads(open(m).read())["n_rows"] for m in manifests)
    assert total == 300
    back = spark.read.json(f"{out}/stream-*.jsonl")
    assert back.count() == 300


def test_json_corrupt_record_handling(spark, tmp_path):
    """Operational ingestion semantics through create.table.from.file: a
    JSONL file with malformed rows surfaces them in _corrupt_record under
    PERMISSIVE (the default triage mode) and drops them under
    DROPMALFORMED — reader options pass through the operator untouched."""
    from kiara_spark.operators.tables import create_table_from_file

    p = tmp_path / "docs.jsonl"
    p.write_text('{"id": 1, "t": "ok"}\n'
                 'not json at all\n'
                 '{"id": 3, "t": "fine"}\n')
    schema = "id bigint, t string, _corrupt_record string"
    permissive = create_table_from_file(
        spark, str(p), file_format="json", schema=schema,
        mode="PERMISSIVE", columnNameOfCorruptRecord="_corrupt_record")
    rows = permissive.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and bad[0]["_corrupt_record"] == "not json at all"

    dropped = create_table_from_file(
        spark, str(p), file_format="json", schema="id bigint, t string",
        mode="DROPMALFORMED")
    assert sorted(r.id for r in dropped.collect()) == [1, 3]


def test_incremental_read_only_new_files(spark, tmp_path):
    from kiara_spark.operators.filesystem import incremental_read

    src = str(tmp_path / "incoming")
    ledger = str(tmp_path / "ledger.json")
    spark.range(0, 10).coalesce(1).write.parquet(src)

    df1, r1 = incremental_read(spark, src, ledger)
    assert df1.count() == 10 and r1["n_new_files"] == 1

    # second run with nothing new: empty result, schema preserved
    df2, r2 = incremental_read(spark, src, ledger)
    assert df2.count() == 0 and r2["n_new_files"] == 0
    assert df2.schema == df1.schema

    # append a batch: only its rows surface
    spark.range(100, 103).coalesce(1).write.mode("append").parquet(src)
    df3, r3 = incremental_read(spark, src, ledger)
    assert r3["n_new_files"] >= 1
    assert sorted(r.id for r in df3.collect()) == [100, 101, 102]


def test_incremental_read_op_registered(ctx):
    assert ctx.operation_registry.resolve("import.incremental.files") is not None
