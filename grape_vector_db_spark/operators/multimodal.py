"""Multimodal (binary) column operators — LLM-data-pipeline addition.

A 100 TB training corpus carries images/audio/video as opaque ``binary``
columns plus typed metadata. The engine treats them as first-class:

- ``blob_metadata``: byte length + content hash as JVM expressions (no
  Python) — the cheap full-corpus pass.
- ``extract_features``: Arrow-batched ``mapInPandas`` over the binary
  column — THE pattern for decode/resize/frame-sample at scale: Spark
  handles partitioning/batching, Python sees a pandas iterator of
  ``bytes`` values, and each batch amortizes the serialization. The
  actual image/audio decode is STUBBED (``decode_image`` raises
  NotImplementedError — decode libs are not in this container); the
  deterministic fake featurizer keeps the plumbing (schema, batch shape,
  partition behavior) real and testable.

At scale: binary payloads dominate row size, so steps that don't need the
bytes must select around the blob column (column pruning keeps it unread
in parquet); ``extract_features`` repartitions by count, not bytes, so
callers should size partitions via ``spark.sql.files.maxPartitionBytes``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 4


def blob_metadata(df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob") -> DataFrame:
    """(id, n_bytes, content_md5) — pure JVM expressions over the blob."""
    return df.select(
        F.col(id_col),
        F.length(F.col(blob_col)).alias("n_bytes"),
        F.md5(F.col(blob_col)).alias("content_md5"),
    )


def decode_image(data: bytes):
    """Decode an image blob to an HxWx3 uint8 RGB ndarray.

    REAL for the codec-free formats — binary PPM (P6), PGM (P5), and
    uncompressed 24/32-bit BI_RGB BMP — implemented in pure numpy (these
    formats are just a header plus raw pixels; no codec library needed).
    Compressed formats (JPEG/PNG/...) route through Pillow when it is
    importable and raise NotImplementedError otherwise (r4 container
    check: ``import PIL`` still fails here, so Pillow stays an optional
    plug-in, not a dependency).
    """
    import numpy as np

    if data[:2] in (b"P6", b"P5"):
        return _decode_pnm(data)
    if data[:2] == b"BM":
        return _decode_bmp(data)
    try:
        import io

        from PIL import Image, UnidentifiedImageError
    except ImportError:
        raise NotImplementedError(
            "compressed image formats require Pillow; only PPM/PGM/BMP "
            "decode without it (Pillow is not in this container)"
        ) from None
    try:  # pragma: no cover - exercised only where Pillow exists
        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    except UnidentifiedImageError as e:
        # distinct from the no-library case: the codec stack IS present,
        # the bytes are just not an image — a data error, not a capability
        # gap, so corrupt-blob handling (filter/quarantine) can key on it
        raise ValueError(f"undecodable image blob: {e}") from e


def _decode_pnm(data: bytes):
    """Binary PPM (P6, RGB) / PGM (P5, grayscale -> replicated RGB)."""
    import numpy as np

    tokens: list[bytes] = []
    i = 0
    while len(tokens) < 4:
        c = data[i : i + 1]
        if c == b"":
            raise ValueError("truncated PNM header")
        if c == b"#":  # comment to end of line
            while data[i : i + 1] not in (b"\n", b""):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while data[j : j + 1] != b"" and not data[j : j + 1].isspace():
                j += 1
            tokens.append(data[i:j])
            i = j
    i += 1  # single whitespace after maxval, then raw pixels
    magic, w, h = tokens[0], int(tokens[1]), int(tokens[2])
    maxval = int(tokens[3])
    if maxval > 255:
        raise NotImplementedError("16-bit PNM not supported")
    ch = 3 if magic == b"P6" else 1
    px = np.frombuffer(data, np.uint8, count=w * h * ch, offset=i).reshape(
        h, w, ch
    )
    if ch == 1:
        px = np.repeat(px, 3, axis=2)
    return np.ascontiguousarray(px)


def _decode_bmp(data: bytes):
    """Uncompressed (BI_RGB) 24/32-bit BMP; rows are 4-byte aligned and
    bottom-up unless height is negative; BGR(A) -> RGB."""
    import numpy as np

    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BMP supported (bpp={bpp}, "
            f"compression={comp})"
        )
    bottom_up = h > 0
    h = abs(h)
    nch = bpp // 8
    row_bytes = (w * nch + 3) & ~3
    rows = np.frombuffer(
        data, np.uint8, count=row_bytes * h, offset=off
    ).reshape(h, row_bytes)
    px = rows[:, : w * nch].reshape(h, w, nch)
    rgb = px[:, :, [2, 1, 0]]
    if bottom_up:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def _fake_feature(data: bytes) -> list[float]:
    """Deterministic featurizer standing in for a decoder+model: first
    FEATURE_DIM bytes scaled to [0,1] (zero-padded)."""
    pad = data[:FEATURE_DIM] + b"\x00" * max(0, FEATURE_DIM - len(data))
    return [b / 255.0 for b in pad]


def sample_frames(
    df: DataFrame,
    frame_size: int = 64,
    stride: int = 4,
    max_frames: int = 8,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Frame sampling over a video-like blob: one output row per sampled
    frame (id, frame_idx, frame binary, n_bytes). The deterministic fake
    treats the blob as consecutive ``frame_size``-byte frames and keeps
    every ``stride``-th one up to ``max_frames`` — a real decoder slots
    into the same Arrow-batched loop (real keyframe extraction is av/
    ffmpeg; not in this container). The explode direction (one blob ->
    many frame rows) is the shape that matters at scale: downstream
    per-frame work repartitions freely, and the blob itself is read once.
    """
    schema = f"{id_col} long, frame_idx int, frame binary, n_bytes int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: [], "frame_idx": [], "frame": [], "n_bytes": []}
            for i, raw in zip(pdf[id_col], pdf[blob_col]):
                data = bytes(raw) if raw is not None else b""
                n_total = (len(data) + frame_size - 1) // frame_size
                for k, fi in enumerate(range(0, n_total, stride)):
                    if k >= max_frames:
                        break
                    frame = data[fi * frame_size : (fi + 1) * frame_size]
                    out[id_col].append(i)
                    out["frame_idx"].append(fi)
                    out["frame"].append(frame)
                    out["n_bytes"].append(len(frame))
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(run, schema)


def resize_blob(
    df: DataFrame,
    target_bytes: int = 256,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Resize plumbing: (id, resized binary of EXACTLY target_bytes). The
    deterministic fake truncates or cycles the payload to the target size
    (a real impl decodes, resizes WxH, re-encodes — Pillow not in this
    container); schema/batching/partition behavior are the real contract."""
    schema = f"{id_col} long, resized binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = []
            for raw in pdf[blob_col]:
                data = bytes(raw) if raw is not None else b""
                if not data:
                    res.append(b"\x00" * target_bytes)
                else:
                    reps = (target_bytes + len(data) - 1) // len(data)
                    res.append((data * reps)[:target_bytes])
            yield pd.DataFrame({id_col: pdf[id_col], "resized": res})

    return df.select(id_col, blob_col).mapInPandas(run, schema)


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    use_stub_decoder: bool = True,
) -> DataFrame:
    """mapInPandas featurization: (id, n_bytes, feature array<float>).

    ``use_stub_decoder=False`` routes through :func:`decode_image` —
    real for PPM/PGM/BMP blobs (pure-numpy decode), NotImplementedError
    for compressed formats unless Pillow is importable. The stub path
    keeps arbitrary-bytes corpora featurizable.
    """
    schema = f"{id_col} long, n_bytes int, feature array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            feats = []
            for raw in blobs:
                data = bytes(raw) if raw is not None else b""
                if not use_stub_decoder:
                    decode_image(data)
                feats.append(_fake_feature(data))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": blobs.map(lambda b: len(b) if b is not None else 0),
                    "feature": feats,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema)


def image_features(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """REAL decode featurization: (id, height, width, mean_r/g/b) via
    :func:`decode_image` over an Arrow-batched ``mapInPandas``. Channel
    means are on the raw 0-255 scale, rounded to 6 dp (oracle parity
    rule). This is the hash-checked proof that the decode path is real:
    the ``multimodal_decode`` query builds deterministic P6 PPM blobs and
    a DuckDB oracle recomputes the same features from the raw bytes.
    """
    import numpy as np

    schema = (
        f"{id_col} long, height int, width int, "
        "mean_r double, mean_g double, mean_b double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                id_col: [], "height": [], "width": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for i, raw in zip(pdf[id_col], pdf[blob_col]):
                if raw is None:
                    continue  # a NULL blob must not TypeError the stage
                img = decode_image(bytes(raw))
                h, w = img.shape[:2]
                m = img.reshape(-1, 3).astype(np.float64).mean(axis=0)
                out[id_col].append(i)
                out["height"].append(h)
                out["width"].append(w)
                out["mean_r"].append(round(float(m[0]), 6))
                out["mean_g"].append(round(float(m[1]), 6))
                out["mean_b"].append(round(float(m[2]), 6))
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(run, schema)


def _nn_indices(src: int, dst: int):
    """Nearest-neighbor sample indices: pixel t of the target reads
    source index floor((t + 0.5) * src / dst) — the standard NN mapping
    (pixel centers), reproducible in integer arithmetic: (2t+1)*src // (2*dst)."""
    return [((2 * t + 1) * src) // (2 * dst) for t in range(dst)]


def resize_image(
    df: DataFrame,
    out_h: int = 2,
    out_w: int = 2,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """REAL image resize: decode (pure-numpy PPM/PGM/BMP), nearest-
    neighbor downsample to (out_h, out_w), and emit the resized image's
    per-channel means — (id, height, width, mean_r, mean_g, mean_b) with
    height/width the TARGET dims and means on the 0-255 scale rounded to
    6 dp. NN sampling uses the pixel-center rule (see _nn_indices), which
    is pure integer index selection — so a DuckDB oracle can recompute
    the exact output from the raw blob bytes, proving the whole
    decode -> resize path end-to-end.
    """
    import numpy as np

    schema = (
        f"{id_col} long, height int, width int, "
        "mean_r double, mean_g double, mean_b double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                id_col: [], "height": [], "width": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for i, raw in zip(pdf[id_col], pdf[blob_col]):
                if raw is None:
                    continue  # a NULL blob must not TypeError the stage
                img = decode_image(bytes(raw))
                h, w = img.shape[:2]
                ri = _nn_indices(h, out_h)
                ci = _nn_indices(w, out_w)
                small = img[np.ix_(ri, ci)]
                m = small.reshape(-1, 3).astype(np.float64).mean(axis=0)
                out[id_col].append(i)
                out["height"].append(out_h)
                out["width"].append(out_w)
                out["mean_r"].append(round(float(m[0]), 6))
                out["mean_g"].append(round(float(m[1]), 6))
                out["mean_b"].append(round(float(m[2]), 6))
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(run, schema)


def decode_wav(data: bytes):
    """Decode an uncompressed RIFF/WAVE blob to (sample_rate, int16
    samples ndarray). REAL for PCM 16-bit mono — the codec-free audio
    format, pure byte parsing like the PPM/BMP image path. Other
    encodings raise NotImplementedError (codec libraries are not in this
    container)."""
    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE blob")
    pos, rate, bits, channels, fmt = 12, None, None, None, None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        csize = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            samples = body
        pos += 8 + csize + (csize % 2)  # chunks are word-aligned
    if fmt != 1 or bits != 16 or channels != 1:
        raise NotImplementedError(
            "only PCM 16-bit mono decodes codec-free "
            f"(fmt={fmt}, bits={bits}, channels={channels})"
        )
    if samples is None:
        raise NotImplementedError("missing data chunk")
    return rate, np.frombuffer(samples, dtype="<i2")


def audio_features(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """REAL audio decode featurization: (id, sample_rate, n_samples, rms)
    via :func:`decode_wav` over Arrow-batched mapInPandas. RMS is
    sqrt(mean(sample^2)) in DOUBLE on the raw int16 scale, rounded to
    6 dp — recomputable byte-for-byte by a DuckDB oracle from the same
    blob, proving the audio path is real parsing, not plumbing."""
    import math

    schema = f"{id_col} long, sample_rate int, n_samples int, rms double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: [], "sample_rate": [], "n_samples": [], "rms": []}
            for i, raw in zip(pdf[id_col], pdf[blob_col]):
                if raw is None:
                    continue  # a NULL blob must not TypeError the stage
                rate, s = decode_wav(bytes(raw))
                out[id_col].append(i)
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(s))
                ms = float((s.astype("float64") ** 2).mean()) if len(s) else 0.0
                out["rms"].append(round(math.sqrt(ms), 6))
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(run, schema)


def average_hash(
    df: DataFrame,
    hash_h: int = 4,
    hash_w: int = 4,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Perceptual image hash (aHash): decode -> NN-downsample to
    (hash_h, hash_w) with the pixel-center rule -> one bit per pixel,
    set iff the pixel is brighter than the image-average — packed MSB0
    (row-major, first pixel = highest bit) into ``(id, ahash, n_bits)``.
    Near-identical images (recompression, small crops/edits) land within
    a few bits, so :func:`dedup.hamming_pairs` over this table is the
    image near-dup tier, exactly like simhash is for text.

    Brightness uses the INTEGER channel sum r+g+b (0..765) and the
    threshold ``pixel_sum * n_pixels > total_sum`` — integer-exact, no
    float division, so a DuckDB oracle reproduces every bit from raw
    bytes. Scale shape: narrow Arrow-batched mapInPandas (one pass, no
    shuffle); up to 64 bits, packed two's-complement into a signed
    BIGINT (bit 63 set -> negative), the same convention as the 64-bit
    text simhash — so at billion-image scale use the standard 8x8 =
    64-bit hash, whose 16-bit hamming_pairs bands give 65k keys/band
    (the geometry that keeps the near-dup join sub-quadratic).
    """
    import numpy as np

    n_bits = hash_h * hash_w
    if n_bits > 64:
        raise ValueError("hash_h * hash_w must be <= 64 (one BIGINT word)")

    schema = f"{id_col} long, ahash long, n_bits int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for i, raw in zip(pdf[id_col], pdf[blob_col]):
                if raw is None:
                    continue  # a NULL blob must not TypeError the stage
                img = decode_image(bytes(raw))
                h, w = img.shape[:2]
                ri = _nn_indices(h, hash_h)
                ci = _nn_indices(w, hash_w)
                small = img[np.ix_(ri, ci)].astype(np.int64)
                sums = small.reshape(-1, 3).sum(axis=1)
                total = int(sums.sum())
                val = 0
                for s in sums:
                    val = (val << 1) | int(int(s) * n_bits > total)
                if val >= 1 << 63:  # two's-complement into signed long
                    val -= 1 << 64
                ids.append(i)
                hashes.append(val)
            yield pd.DataFrame(
                {id_col: ids, "ahash": hashes, "n_bits": [n_bits] * len(ids)}
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema)


def audio_energy_hash(
    df: DataFrame,
    n_windows: int = 16,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Audio fingerprint (energy hash): decode PCM16 -> split the sample
    stream into ``n_windows`` equal contiguous windows -> one bit per
    window, set iff the window's energy (sum of squared samples) exceeds
    the track average — packed MSB0 into ``(id, ehash, n_bits)``. The
    audio twin of :func:`average_hash`: re-encodes and small edits keep
    the energy envelope, so :func:`dedup.hamming_pairs` over this table
    is the audio near-dup tier.

    The threshold is the integer comparison ``window_energy * n_windows
    > total_energy`` over int64 sums of int16 squares — bit-exact, so a
    DuckDB oracle rebuilds every bit from raw bytes. Trailing samples
    beyond ``n_windows * (n // n_windows)`` are ignored (every window
    must weigh the same for the comparison to be fair). Narrow
    Arrow-batched mapInPandas — one pass, no shuffle. Up to 64 windows,
    packed two's-complement into a signed BIGINT like
    :func:`average_hash` — at catalog scale use the full 64-bit hash so
    the banded near-dup join gets 16-bit (65k-key) bands instead of the
    4-bit bands a 16-window hash forces.
    """
    import numpy as np

    if n_windows < 1 or n_windows > 64:
        raise ValueError("n_windows must be in [1, 64] (one BIGINT word)")

    schema = f"{id_col} long, ehash long, n_bits int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for i, raw in zip(pdf[id_col], pdf[blob_col]):
                if raw is None:
                    continue  # a NULL blob must not TypeError the stage
                _, s = decode_wav(bytes(raw))
                wlen = len(s) // n_windows
                if wlen == 0:
                    raise ValueError(
                        f"{len(s)} samples cannot fill {n_windows} windows"
                    )
                sq = s[: wlen * n_windows].astype(np.int64) ** 2
                energies = sq.reshape(n_windows, wlen).sum(axis=1)
                total = int(energies.sum())
                val = 0
                for e in energies:
                    val = (val << 1) | int(int(e) * n_windows > total)
                if val >= 1 << 63:  # two's-complement into signed long
                    val -= 1 << 64
                ids.append(i)
                hashes.append(val)
            yield pd.DataFrame(
                {id_col: ids, "ehash": hashes, "n_bits": [n_windows] * len(ids)}
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema)
