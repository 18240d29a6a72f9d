"""Real media decode (operators/media_codecs.py): pure-stdlib BMP/PPM/WAV
codecs + the mapInPandas decode operators, including the corrupt-blob
degrade-to-NULL contract."""

import struct

import pytest

from kiara_spark.operators.media_codecs import (decode_bmp, decode_ppm,
                                                decode_wav, synth_bmp,
                                                synth_pixels, synth_ppm,
                                                synth_samples, synth_wav)


def test_bmp_round_trip_all_padding_widths():
    # widths 1..4 exercise every 4-byte row padding (3, 2, 1, 0 bytes)
    for seed in (0, 7, 123):
        for w in (1, 2, 3, 4, 5):
            for h in (1, 3):
                width, height, px = decode_bmp(synth_bmp(seed, w, h))
                assert (width, height) == (w, h)
                assert px == synth_pixels(seed, w, h)


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_bmp(b"BM" + b"\x00" * 60)  # zero dims
    good = synth_bmp(1, 4, 4)
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(good[:-8])
    # 8-bpp claim
    bad = bytearray(good)
    struct.pack_into("<H", bad, 28, 8)
    with pytest.raises(ValueError, match="unsupported"):
        decode_bmp(bytes(bad))


def test_ppm_and_pgm_decode():
    assert decode_ppm(synth_ppm(9, 6, 4)) == (6, 4, synth_pixels(9, 6, 4))
    gray = b"P5\n# a comment\n2 2\n255\n" + bytes([10, 20, 30, 40])
    w, h, px = decode_ppm(gray)
    assert (w, h) == (2, 2)
    assert px == bytes([10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40])
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n255\n\x00")  # truncated body


def test_wav_round_trip_and_extra_chunks():
    for seed in (0, 42):
        for ch in (1, 2):
            d = decode_wav(synth_wav(seed, 16000, ch, 37))
            assert d["sample_rate"] == 16000 and d["n_channels"] == ch
            assert d["n_frames"] == 37
            assert d["samples"] == synth_samples(seed, 37 * ch)
    # odd-sized LIST chunk before data: word-aligned chunk walk must skip it
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    pcm = struct.pack("<4h", 1, -2, 3, -4)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
            + b"data" + struct.pack("<I", 8) + pcm)
    d = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert d["samples"] == [1, -2, 3, -4]
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxWAVE")  # no fmt/data


def test_decode_image_operator_with_corrupt_rows(spark):
    import pandas as pd

    from kiara_spark.operators.media_codecs import decode_image

    def synth(batches):
        for pdf in batches:
            rows = []
            for i in (int(x) for x in pdf["id"]):
                if i == 0:
                    rows.append((i, synth_bmp(i, 3, 2)))
                elif i == 1:
                    rows.append((i, synth_ppm(i, 2, 2)))
                elif i == 2:
                    rows.append((i, b"\xff\xd8 not decodable jpeg"))
                else:
                    rows.append((i, None))
            yield pd.DataFrame(rows, columns=["id", "media"])

    blobs = spark.range(0, 4).toDF("id").mapInPandas(
        synth, schema="id long, media binary")
    out = {r.id: r for r in decode_image(blobs).collect()}
    assert out[0].format == "bmp" and out[0].width == 3 and out[0].height == 2
    assert out[0].pixel_sum == sum(synth_pixels(0, 3, 2))
    assert out[1].format == "ppm" and out[1].pixel_sum == sum(synth_pixels(1, 2, 2))
    # corrupt + NULL rows degrade to format='unknown' with NULL features
    for i in (2, 3):
        assert out[i].format == "unknown" and out[i].pixel_sum is None


def test_decode_audio_operator(spark):
    import pandas as pd

    from kiara_spark.operators.media_codecs import decode_audio

    def synth(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "id": [int(x) for x in pdf["id"]],
                "media": [synth_wav(int(x), 8000, 1, 10) if int(x) % 2 == 0
                          else b"garbage" for x in pdf["id"]]})

    blobs = spark.range(0, 4).toDF("id").mapInPandas(
        synth, schema="id long, media binary")
    out = {r.id: r for r in decode_audio(blobs).collect()}
    s = synth_samples(0, 10)
    assert out[0].format == "wav" and out[0].pcm_sum == sum(s)
    assert out[0].peak_abs == max(abs(v) for v in s)
    assert out[0].duration_ms == 10 * 1000 // 8000
    assert out[1].format == "unknown" and out[1].pcm_sum is None


def test_media_real_ops_registered(ctx):
    assert ctx.operation_registry.resolve("media.decode_image_real") is not None
    assert ctx.operation_registry.resolve("media.decode_audio_real") is not None


def test_decode_wav_truncated_data_chunk_raises():
    """r3 ADVICE: a data chunk whose size field overruns the file must
    raise (→ auditable 'unknown' row), not silently yield fewer samples."""
    import pytest as _pytest

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    pcm = struct.pack("<4h", 1, -2, 3, -4)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 16) + pcm)  # claims 16, has 8
    with _pytest.raises(ValueError, match="truncated"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_decode_image_decoder_paths_share_contract(spark):
    """r3 VERDICT item 7: stub and pillow paths share one output contract.
    Without Pillow installed, 'auto' must equal 'stub' exactly and
    'pillow' must fail loudly; the pillow batch function is exercised
    driver-side with a real BMP through a PIL-shaped opener."""
    import pandas as pd
    import pytest as _pytest

    from kiara_spark.operators.media_codecs import decode_bmp, synth_bmp
    from kiara_spark.operators.misc import (_image_batch_features,
                                            decode_image_stub)

    df = spark.createDataFrame(
        [(1, bytearray(b"x" * 100)), (2, bytearray(b"y" * 65)), (3, None)],
        "id long, media binary")
    stub = decode_image_stub(df, "media", passthrough=("id",),
                             decoder="stub")
    auto = decode_image_stub(df, "media", passthrough=("id",),
                             decoder="auto")
    assert stub.schema == auto.schema
    has_pil = True
    try:
        import PIL  # noqa: F401
    except ImportError:
        has_pil = False
    if not has_pil:
        assert sorted(map(tuple, stub.collect())) == \
            sorted(map(tuple, auto.collect()))
        with _pytest.raises(Exception, match="[Pp]illow"):
            decode_image_stub(df, "media", decoder="pillow").collect()
    else:  # real path exercised when PIL is present
        rows = {r["id"]: r for r in auto.collect()}
        assert rows[3]["width"] == 0  # NULL blob -> auditable (0,0)
    with _pytest.raises(ValueError, match="unknown image decoder"):
        decode_image_stub(df, "media", decoder="nope")

    # driver-side: the real-decode batch path with a PIL-shaped opener
    # backed by our own BMP codec — same columns, REAL dims
    bmp = synth_bmp(seed=5, width=7, height=3)

    def dims_fn(blob):
        if not blob:
            return (0, 0)
        try:
            w, h, _ = decode_bmp(bytes(blob))
            return (w, h)
        except ValueError:
            return (0, 0)

    pdf = pd.DataFrame({"id": [1, 2, 3],
                        "media": [bmp, b"not an image", None]})
    out = _image_batch_features(pdf, ["id"], "media", dims_fn)
    assert list(out.columns) == ["id", "byte_len", "width", "height"]
    assert (out.loc[0, "width"], out.loc[0, "height"]) == (7, 3)
    assert (out.loc[1, "width"], out.loc[1, "height"]) == (0, 0)
    assert out.loc[2, "byte_len"] == 0


def test_image_dhash_identical_and_jittered(spark):
    from kiara_spark.operators.media_codecs import (
        dhash_neardup_pairs, encode_bmp, encode_ppm, image_dhash,
        synth_pixels)

    w, h = 16, 12
    px = bytearray(synth_pixels(3, w, h))
    jit = bytearray(px)
    jit[5] = (jit[5] + 120) % 256  # hit a sampled cell hard
    rows = [
        (1, encode_bmp(bytes(px), w, h)),
        (2, encode_ppm(bytes(px), w, h)),   # same pixels, other container
        (3, encode_bmp(bytes(jit), w, h)),
        (4, b"not an image"),
    ]
    df = spark.createDataFrame(rows, "id long, media binary")
    sig = {r.id: r for r in image_dhash(df).collect()}
    assert sig[1].dhash == sig[2].dhash  # container-independent
    assert sig[1].format == "bmp" and sig[2].format == "ppm"
    assert sig[4].dhash is None and sig[4].format == "unknown"
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in dhash_neardup_pairs(image_dhash(df)).collect()}
    assert pairs[(1, 2)] == 0
    # jittered image is near, not identical, to 1 and 2
    assert 0 < pairs.get((1, 3), 99) <= 3 or (1, 3) not in pairs
    import pytest as _pytest
    with _pytest.raises(ValueError, match="bands"):
        dhash_neardup_pairs(image_dhash(df), max_hamming=5)


def test_dhash_ops_registered(ctx):
    assert ctx.operation_registry.resolve("media.image_dhash") is not None
    assert ctx.operation_registry.resolve("media.dedup_images") is not None
