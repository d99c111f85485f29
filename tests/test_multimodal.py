"""Multimodal binary-column plumbing tests (decode itself is stubbed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grape_vector_db_spark.functions.text import mock_embedding, mock_embedding_py
from grape_vector_db_spark.operators import multimodal


@pytest.fixture()
def blobs(spark):
    return spark.createDataFrame(
        [(1, bytearray(b"\x10\x20\x30\x40\x50")), (2, bytearray(b"\xff")), (3, None)],
        "doc_id long, blob binary",
    )


def test_blob_metadata(spark, blobs):
    rows = {r["doc_id"]: r for r in multimodal.blob_metadata(blobs).collect()}
    assert rows[1]["n_bytes"] == 5
    assert rows[2]["n_bytes"] == 1
    assert rows[3]["n_bytes"] is None


def test_extract_features_stub(spark, blobs):
    rows = {r["doc_id"]: r for r in multimodal.extract_features(blobs).collect()}
    assert rows[1]["n_bytes"] == 5
    # first FEATURE_DIM bytes scaled
    assert abs(rows[1]["feature"][0] - 0x10 / 255.0) < 1e-6
    # short blob zero-padded to FEATURE_DIM
    assert rows[2]["feature"][1] == 0.0
    assert len(rows[2]["feature"]) == multimodal.FEATURE_DIM
    # null blob -> zero bytes, zero feature
    assert rows[3]["n_bytes"] == 0


def test_decode_stub_raises(spark, blobs):
    with pytest.raises(Exception):
        multimodal.extract_features(blobs, use_stub_decoder=False).collect()


def test_mock_embedding_expr_matches_python(spark):
    """Column-expression embedder == pure-Python replica (f64 semantics)."""
    df = spark.createDataFrame([(1, "hello world"), (2, "spark")], "id long, text string")
    rows = {
        r["id"]: list(r["v"])
        for r in df.select("id", mock_embedding("text", 8).alias("v")).collect()
    }
    for text, i in [("hello world", 1), ("spark", 2)]:
        expected = mock_embedding_py(text, 8)
        got = rows[i]
        assert all(abs(a - b) < 1e-9 for a, b in zip(got, expected)), (got, expected)


def test_sample_frames_shape_and_determinism(spark):
    rows = [(1, bytes(range(200))), (2, b""), (3, b"x" * 64)]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    from grape_vector_db_spark.operators import multimodal

    out = multimodal.sample_frames(df, frame_size=64, stride=2, max_frames=2)
    got = {(r["doc_id"], r["frame_idx"]): (bytes(r["frame"]), r["n_bytes"]) for r in out.collect()}
    # doc 1: 200 bytes -> 4 frames (0..3), stride 2 keeps 0 and 2
    assert set(k for k in got if k[0] == 1) == {(1, 0), (1, 2)}
    assert got[(1, 0)] == (bytes(range(64)), 64)
    assert got[(1, 2)] == (bytes(range(128, 192)), 64)
    # doc 2: empty -> no frames; doc 3: one exact frame
    assert not any(k[0] == 2 for k in got)
    assert got[(3, 0)] == (b"x" * 64, 64)


def test_resize_blob_exact_size(spark):
    rows = [(1, b"abc"), (2, b""), (3, b"z" * 1000)]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    from grape_vector_db_spark.operators import multimodal

    got = {r["doc_id"]: bytes(r["resized"]) for r in
           multimodal.resize_blob(df, target_bytes=8).collect()}
    assert got[1] == b"abcabcab"      # cycled
    assert got[2] == b"\x00" * 8      # empty -> zero padding
    assert got[3] == b"z" * 8         # truncated


# --- real codec-free decode ------------------------------------------------


def _bmp_bytes(pixels, bpp=24, top_down=False):
    """Hand-rolled uncompressed BMP from a HxWx3 nested list (RGB)."""
    import struct

    h = len(pixels)
    w = len(pixels[0])
    nch = bpp // 8
    row_bytes = (w * nch + 3) & ~3
    rows = [] if top_down else None
    body = b""
    order = pixels if top_down else pixels[::-1]
    for row in order:
        rb = b""
        for (r, g, b) in row:
            rb += bytes([b, g, r] + ([0] if nch == 4 else []))
        body += rb + b"\x00" * (row_bytes - len(rb))
    off = 14 + 40
    height = -h if top_down else h
    return (
        b"BM"
        + struct.pack("<IHHI", off + len(body), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, height, 1, bpp, 0, len(body),
                      2835, 2835, 0, 0)
        + body
    )


def test_decode_ppm_p6():
    from grape_vector_db_spark.operators.multimodal import decode_image

    # 2x1 image: red then green; comment + maxval in header
    data = b"P6\n# c\n2 1\n255\n" + bytes([255, 0, 0, 0, 255, 0])
    img = decode_image(data)
    assert img.shape == (1, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 1].tolist() == [0, 255, 0]


def test_decode_pgm_p5_replicates_channels():
    from grape_vector_db_spark.operators.multimodal import decode_image

    data = b"P5\n2 2\n255\n" + bytes([0, 64, 128, 255])
    img = decode_image(data)
    assert img.shape == (2, 2, 3)
    assert img[1, 1].tolist() == [255, 255, 255]
    assert img[0, 1].tolist() == [64, 64, 64]


def test_decode_bmp_bottom_up_and_top_down():
    from grape_vector_db_spark.operators.multimodal import decode_image

    px = [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (10, 11, 12)]]
    for td in (False, True):
        img = decode_image(_bmp_bytes(px, top_down=td))
        assert img.shape == (2, 2, 3)
        assert img[0, 0].tolist() == [1, 2, 3]
        assert img[1, 1].tolist() == [10, 11, 12]


def test_decode_bmp_32bpp_and_row_padding():
    from grape_vector_db_spark.operators.multimodal import decode_image

    px = [[(9, 8, 7)]]  # 1x1: 24bpp row pads 3->4 bytes; 32bpp none
    assert decode_image(_bmp_bytes(px, bpp=24))[0, 0].tolist() == [9, 8, 7]
    assert decode_image(_bmp_bytes(px, bpp=32))[0, 0].tolist() == [9, 8, 7]


def test_decode_compressed_format_routes_through_hook():
    """The compressed-codec hook, exercised in BOTH environments: without
    Pillow a PNG-magic blob raises NotImplementedError (capability gap);
    with Pillow present the same truncated blob raises ValueError (data
    error) — the two cases corrupt-blob handling must distinguish."""
    import pytest

    from grape_vector_db_spark.operators.multimodal import decode_image

    try:
        import PIL  # noqa: F401

        have_pillow = True
    except ImportError:
        have_pillow = False
    expected = ValueError if have_pillow else NotImplementedError
    with pytest.raises(expected):
        decode_image(b"\x89PNG\r\n\x1a\nxxxx")


def test_decode_png_with_pillow():
    """Real compressed decode through the optional Pillow path — skipped
    gracefully wherever the library is absent (this container), green
    wherever it lands."""
    import pytest

    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    import numpy as np

    from grape_vector_db_spark.operators.multimodal import decode_image

    img = PIL_Image.new("RGB", (2, 1))
    img.putpixel((0, 0), (10, 20, 30))
    img.putpixel((1, 0), (40, 50, 60))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    out = decode_image(buf.getvalue())
    assert out.shape == (1, 2, 3)
    assert np.array_equal(
        out, np.array([[[10, 20, 30], [40, 50, 60]]], dtype=np.uint8)
    )


def test_image_features_real_decode(spark):
    import hashlib

    from pyspark.sql import functions as F

    from grape_vector_db_spark.operators import multimodal

    df = spark.createDataFrame([(7,), (42,)], "doc_id long").select(
        "doc_id",
        F.concat(
            F.lit("P6\n2 2\n255\n").cast("binary"),
            F.substring(F.unhex(F.md5(F.col("doc_id").cast("string"))), 1, 12),
        ).alias("blob"),
    )
    out = {r["doc_id"]: r for r in multimodal.image_features(df).collect()}
    for did in (7, 42):
        raw = hashlib.md5(str(did).encode()).digest()[:12]
        assert (out[did]["height"], out[did]["width"]) == (2, 2)
        assert out[did]["mean_r"] == round(sum(raw[0::3]) / 4.0, 6)
        assert out[did]["mean_g"] == round(sum(raw[1::3]) / 4.0, 6)
        assert out[did]["mean_b"] == round(sum(raw[2::3]) / 4.0, 6)


# ---------------------------------------------------------------------------
# round-4 additions: NN resize + WAV audio decode


def _p6(w, h, pixels: bytes) -> bytes:
    return f"P6\n{w} {h}\n255\n".encode() + pixels


def test_resize_image_nn_picks_center_pixels(spark):
    from grape_vector_db_spark.operators import multimodal

    # 4x4 image whose pixel (r, c) has value r*16+c in all channels;
    # NN 4->2 keeps rows/cols {1, 3}
    px = bytes(b for r in range(4) for c in range(4) for b in [r * 16 + c] * 3)
    df = spark.createDataFrame([(1, _p6(4, 4, px))], "doc_id long, blob binary")
    row = multimodal.resize_image(df, 2, 2).collect()[0]
    expect = (17 + 19 + 49 + 51) / 4.0  # pixels (1,1),(1,3),(3,1),(3,3)
    assert row["height"] == 2 and row["width"] == 2
    assert row["mean_r"] == expect == row["mean_g"] == row["mean_b"]


def test_decode_wav_roundtrip():
    import struct

    import numpy as np

    from grape_vector_db_spark.operators.multimodal import decode_wav

    samples = [0, 100, -100, 32767, -32768, 7, -7, 1]
    data = struct.pack("<8h", *samples)
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    rate, arr = decode_wav(hdr + data)
    assert rate == 8000
    assert np.array_equal(arr, np.array(samples, dtype=np.int16))


def test_decode_wav_rejects_non_pcm():
    import struct

    import pytest as _pytest

    from grape_vector_db_spark.operators.multimodal import decode_wav

    hdr = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 2, 44100, 352800, 8, 32)
        + b"data" + struct.pack("<I", 0)
    )
    with _pytest.raises(NotImplementedError):
        decode_wav(hdr)


def test_audio_features_rms(spark):
    import struct

    from grape_vector_db_spark.operators import multimodal

    samples = [3, -4, 0, 0, 0, 0, 0, 0]  # mean square = 25/8
    data = struct.pack("<8h", *samples)
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    df = spark.createDataFrame([(1, hdr + data)], "doc_id long, blob binary")
    row = multimodal.audio_features(df).collect()[0]
    assert row["sample_rate"] == 8000
    assert row["n_samples"] == 8
    assert row["rms"] == round((25 / 8) ** 0.5, 6)
