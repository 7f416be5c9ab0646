"""Multimodal column plumbing (SURVEY.md §7.6): image/audio/video as
opaque ``binary`` columns with typed metadata, processed in Arrow-batched
mapInPandas stages.

The Spark-side mechanics here are real and tested — schema shape,
partition-preserving batch processing, UDF signatures, deterministic
outputs. Image DECODING is real for the uncompressed formats a
stdlib+numpy decoder can cover — PPM (P3/P6) and BMP (24/32-bit BI_RGB) —
via :func:`decode_image`; :func:`extract_image_features` runs it inside the
Arrow kernel (dims + per-channel means, corrupt blobs → null features).
Compressed formats (PNG/JPEG/audio/video codecs) still need an injected
``decoder`` — the container ships no media libraries. The default
:func:`extract_features` path computes deterministic byte-level features
(size, byte histogram entropy, simple checksum) that work on ANY blob and
back the SQL-oracle catalog entry.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Typed metadata travelling with every media blob.
MEDIA_META_FIELDS = [
    StructField("media_type", StringType()),     # 'image' | 'audio' | 'video'
    StructField("format", StringType()),         # 'png', 'wav', ...
    StructField("width", IntegerType()),         # nullable for audio
    StructField("height", IntegerType()),
    StructField("n_bytes", LongType()),
]

FEATURE_FIELDS = [
    StructField("byte_entropy", DoubleType()),
    StructField("checksum", LongType()),
]


def attach_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media: the utf-8 bytes of a text column stand in
    for an encoded blob (same shape/nullability as a real corpus). Keeps
    the whole downstream path testable without media files."""
    return df.withColumn("media_bytes", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_type", F.lit("image")
    ).withColumn("format", F.lit("fake")).withColumn(
        "n_bytes", F.octet_length(F.col("media_bytes")).cast("long")
    )


def _ppm_header(data: bytes, n_tokens: int) -> tuple[list[bytes], int]:
    """First ``n_tokens`` whitespace-separated tokens of a PNM header,
    honoring ``#`` comments; returns (tokens, offset-just-past-last)."""
    toks: list[bytes] = []
    i = 0
    while len(toks) < n_tokens:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i >= len(data):
            raise ValueError("truncated PPM header")
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace() and data[j] != 0x23:
            j += 1
        toks.append(data[i:j])
        i = j
    return toks, i


def _decode_ppm(blob: bytes):
    """PPM → (H, W, 3) uint8. P6 (binary) and P3 (ascii), maxval ≤ 255
    (values rescaled to the 0-255 range when maxval differs)."""
    import numpy as np

    toks, off = _ppm_header(blob, 4)
    magic, w, h, maxval = toks[0], int(toks[1]), int(toks[2]), int(toks[3])
    if magic not in (b"P3", b"P6"):
        raise ValueError(f"not a PPM image (magic {magic!r})")
    if w <= 0 or h <= 0 or not 0 < maxval <= 255:
        raise ValueError(f"bad PPM geometry {w}x{h} maxval={maxval}")
    n = w * h * 3
    if magic == b"P6":
        # exactly ONE whitespace byte separates maxval from binary data
        px = np.frombuffer(blob, np.uint8, count=n, offset=off + 1)
    else:
        vals = blob[off:].split()
        if len(vals) < n:
            raise ValueError("truncated P3 pixel data")
        px = np.array([int(v) for v in vals[:n]], dtype=np.uint16)
    if px.size != n:
        raise ValueError("truncated P6 pixel data")
    if maxval != 255:
        px = (px.astype(np.uint32) * 255 + maxval // 2) // maxval
    return px.astype(np.uint8).reshape(h, w, 3)


def _decode_bmp(blob: bytes):
    """BMP (BITMAPINFOHEADER+, 24/32-bit uncompressed BI_RGB) →
    (H, W, 3) uint8 RGB; alpha dropped, bottom-up rows flipped."""
    import struct

    import numpy as np

    if blob[:2] != b"BM" or len(blob) < 54:
        raise ValueError("not a BMP file")
    (data_offset,) = struct.unpack_from("<I", blob, 10)
    (bisize,) = struct.unpack_from("<I", blob, 14)
    if bisize < 40:
        raise ValueError("BITMAPCOREHEADER BMPs unsupported")
    w, h = struct.unpack_from("<ii", blob, 18)
    _planes, bpp = struct.unpack_from("<HH", blob, 26)
    (compression,) = struct.unpack_from("<I", blob, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"only uncompressed 24/32-bit BMP (bpp={bpp}, comp={compression})")
    bottom_up, h = h > 0, abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP geometry {w}x{h}")
    bytespp = bpp // 8
    stride = (w * bytespp + 3) & ~3
    if len(blob) < data_offset + stride * h:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(blob, np.uint8, count=stride * h, offset=data_offset)
    px = rows.reshape(h, stride)[:, : w * bytespp].reshape(h, w, bytespp)
    if bottom_up:
        px = px[::-1]
    return px[:, :, 2::-1].copy()  # stored BGR(A) → RGB


def decode_image(blob: bytes, fmt: str = "auto"):
    """Decode an image blob to an (H, W, 3) uint8 numpy array.

    Stdlib+numpy decoders cover the uncompressed formats: PPM ``P6``/``P3``
    and BMP (24/32-bit BI_RGB). ``fmt='auto'`` sniffs magic bytes.
    Compressed formats (PNG/JPEG — no codec libraries in this container)
    raise ValueError; inject a richer ``decoder=`` into
    :func:`extract_image_features` when Pillow is available.
    """
    if not blob:
        raise ValueError("empty image blob")
    if fmt == "auto":
        if blob[:2] in (b"P3", b"P6"):
            fmt = "ppm"
        elif blob[:2] == b"BM":
            fmt = "bmp"
        else:
            raise ValueError(f"unrecognized image magic {blob[:4]!r}")
    if fmt == "ppm":
        return _decode_ppm(blob)
    if fmt == "bmp":
        return _decode_bmp(blob)
    raise ValueError(
        f"unsupported format {fmt!r}: built-in decoders cover 'ppm' and 'bmp'"
    )


def extract_features(
    df: DataFrame,
    blob_col: str = "media_bytes",
    decoder: Callable[[bytes, str], object] | None = None,
) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Arrow moves the blobs to Python in columnar batches (no per-row
    serialization); output schema = input + feature columns. With a real
    ``decoder`` injected, decoded frames feed the feature fn; without one,
    deterministic byte-level features are produced (decode stays stubbed).
    """
    out_schema = StructType(list(df.schema.fields) + FEATURE_FIELDS)

    # The closure must be self-contained (stdlib + numpy only): mapInPandas
    # ships it to Python workers by value, and workers may not have this
    # package on their import path.
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import math as _math

        import numpy as _np

        def entropy(b: bytes) -> float:
            # Histogram entropy with a DETERMINISTIC summation contract:
            # terms accumulate in ascending byte value with libm log2, the
            # exact fold order and primitive the DuckDB oracle uses
            # (numpy's SIMD log2/pairwise sum can drift a ulp and cross
            # the 6dp rounding boundary). ≤256 terms per row.
            if not b:
                return 0.0
            arr = _np.frombuffer(b, dtype=_np.uint8)
            counts = _np.bincount(arr, minlength=256)
            n = arr.size
            acc = 0.0
            for c in counts[counts > 0]:
                p = c / n
                acc += -(p * _math.log2(p))
            return round(acc, 6)

        def checksum(b: bytes) -> int:
            # 60-bit md5 prefix — reproducible in any engine with md5
            # (DuckDB: CAST('0x' || substr(md5(text), 1, 15) AS BIGINT)).
            return int(_hashlib.md5(b).hexdigest()[:15], 16)

        for pdf in batches:
            ent, chk = [], []
            for blob in pdf[blob_col]:
                # missing media -> missing features (same contract as the
                # corrupt-image NULL path; features-of-empty-bytes would
                # fabricate checksum md5('') for absent payloads)
                if blob is None:
                    ent.append(None)
                    chk.append(None)
                    continue
                b = bytes(blob)
                if decoder is not None:
                    decoder(b, "fake")  # decoded object would feed real features
                ent.append(entropy(b))
                chk.append(checksum(b))
            pdf["byte_entropy"] = ent
            pdf["checksum"] = chk
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def decode_wav(blob: bytes):
    """Decode a RIFF/WAVE PCM blob to (samples, sample_rate, n_channels).

    Pure stdlib+numpy: 16-bit (int16 -> float in [-1, 1)) and 8-bit
    (unsigned, rebased) PCM, any channel count; samples come back as an
    (n_frames, n_channels) float64 array. Compressed codecs (format tag
    != 1) raise ValueError — no audio libraries ship in this container.
    """
    import struct

    import numpy as np

    if len(blob) < 44 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid, size = blob[pos : pos + 4], struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, n_ch, rate, _byterate, _align, bits = fmt
    if tag != 1:
        raise ValueError(f"only PCM WAV supported (format tag {tag})")
    if n_ch < 1 or rate <= 0:
        raise ValueError(f"bad WAV geometry: channels={n_ch} rate={rate}")
    if bits == 16:
        raw = np.frombuffer(data, np.int16, count=len(data) // 2)
        samples = raw.astype(np.float64) / 32768.0
    elif bits == 8:
        raw = np.frombuffer(data, np.uint8)
        samples = (raw.astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM width {bits}")
    n_frames = samples.size // n_ch
    return samples[: n_frames * n_ch].reshape(n_frames, n_ch), rate, n_ch


#: Decoded-audio features appended by extract_audio_features.
AUDIO_FEATURE_FIELDS = [
    StructField("sample_rate", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("duration_s", DoubleType()),
    StructField("rms", DoubleType()),
    StructField("peak", DoubleType()),
]


def extract_audio_features(
    df: DataFrame,
    blob_col: str = "media_bytes",
    decoder: Callable[[bytes], "object"] | None = None,
) -> DataFrame:
    """Decode WAV blobs inside the Arrow kernel and append audio features:
    sample rate, channel count, duration, RMS and peak amplitude (6dp,
    float64 accumulate over all channels). Undecodable blobs yield NULL
    features — same corrupt-media contract as the image kernel. One
    mapInPandas pass, partition-preserving, scan-scaling."""
    import math

    dec = decoder or decode_wav
    out_schema = StructType(list(df.schema.fields) + AUDIO_FEATURE_FIELDS)

    def round6(x: float) -> float:
        # HALF-AWAY-FROM-ZERO at 6dp (x >= 0 here), the rounding DuckDB's
        # round() and Spark's F.round use — NOT Python's banker's round():
        # PCM amplitudes are binary fractions (k/32768) that land EXACTLY
        # on 6dp halves (e.g. 121/128 = 0.9453125), where the two rules
        # genuinely diverge and break the value hash.
        y = x * 1e6
        f = math.floor(y)
        return (f + 1 if y - f >= 0.5 else f) / 1e6

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, chans, durs, rmss, peaks = [], [], [], [], []
            for blob in pdf[blob_col]:
                try:
                    samples, rate, n_ch = dec(bytes(blob))
                except (ValueError, TypeError):
                    rates.append(None)
                    chans.append(None)
                    durs.append(None)
                    rmss.append(None)
                    peaks.append(None)
                    continue
                rates.append(int(rate))
                chans.append(int(n_ch))
                durs.append(round6(samples.shape[0] / rate))
                flat = samples.reshape(-1)
                # DETERMINISTIC summation contract (cf. entropy above):
                # squares vectorized in numpy, accumulated by builtin
                # sum() — a sequential left fold, the same order DuckDB's
                # list_avg uses — NOT numpy mean(), whose pairwise
                # summation can drift a ulp across the 6dp boundary.
                sq = (flat * flat).tolist()
                rmss.append(round6(math.sqrt(sum(sq) / len(sq))) if sq else 0.0)
                peaks.append(round6(float(abs(flat).max())) if flat.size else 0.0)
            pdf["sample_rate"] = pd.array(rates, dtype="Int32")
            pdf["n_channels"] = pd.array(chans, dtype="Int32")
            pdf["duration_s"], pdf["rms"], pdf["peak"] = durs, rmss, peaks
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


#: Decoded-image features appended by extract_image_features.
IMAGE_FEATURE_FIELDS = [
    StructField("img_width", IntegerType()),
    StructField("img_height", IntegerType()),
    StructField("mean_r", DoubleType()),
    StructField("mean_g", DoubleType()),
    StructField("mean_b", DoubleType()),
]


def extract_image_features(
    df: DataFrame,
    blob_col: str = "media_bytes",
    decoder: Callable[[bytes, str], "object"] | None = None,
) -> DataFrame:
    """Decode image blobs inside the Arrow kernel and append pixel-level
    features: dimensions and per-channel means (6dp, float64 accumulate).

    ``decoder`` defaults to :func:`decode_image` (PPM/BMP); blobs the
    decoder rejects produce NULL features rather than failing the stage —
    corrupt media is data, not an error, at corpus scale (SURVEY.md §2.11).
    mapInPandas keeps transfer columnar and partition-preserving: no
    shuffle, scan-scaling, the same 100 TB shape as extract_features.
    Workers import this module (ship the package via --py-files / conda
    env on a real cluster).
    """
    dec = decoder or decode_image
    out_schema = StructType(list(df.schema.fields) + IMAGE_FEATURE_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights = [], []
            means: list[list[float | None]] = [[], [], []]
            for blob in pdf[blob_col]:
                try:
                    img = dec(bytes(blob), "auto")
                except (ValueError, TypeError):
                    widths.append(None)
                    heights.append(None)
                    for m in means:
                        m.append(None)
                    continue
                heights.append(int(img.shape[0]))
                widths.append(int(img.shape[1]))
                ch = img.reshape(-1, 3).mean(axis=0, dtype="float64")
                for m, v in zip(means, ch):
                    m.append(round(float(v), 6))
            pdf["img_width"] = pd.array(widths, dtype="Int32")
            pdf["img_height"] = pd.array(heights, dtype="Int32")
            pdf["mean_r"], pdf["mean_g"], pdf["mean_b"] = means
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def image_dhash(
    df: DataFrame,
    blob_col: str = "media_bytes",
    decoder: Callable[[bytes, str], "object"] | None = None,
) -> DataFrame:
    """Perceptual difference-hash (dHash) per image, decoded inside the
    Arrow kernel: integer grayscale g = r+g+b per pixel (exact — no
    division), one bit per horizontal neighbor pair ``g[y,x] > g[y,x+1]``,
    packed row-major MSB-first. An (H, W) image yields an H*(W-1)-bit
    hash; identical-content images collide exactly, near-identical ones
    land within small hamming distance — the image-side analogue of
    simhash for text. Corrupt blobs hash to NULL (corrupt media is data).

    Comparisons over exact integers make the hash engine-reproducible:
    the DuckDB twin recomputes the same bits from the same bytes. One
    mapInPandas stage, partition-preserving, scan-scaling.
    """
    dec = decoder or decode_image
    out_schema = StructType(
        list(df.schema.fields) + [StructField("dhash", LongType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes: list[int | None] = []
            for blob in pdf[blob_col]:
                try:
                    img = dec(bytes(blob), "auto")
                except (ValueError, TypeError):
                    hashes.append(None)
                    continue
                g = img.astype("int64").sum(axis=2)
                bits = (g[:, :-1] > g[:, 1:]).flatten()
                h = 0
                for b in bits:
                    h = (h << 1) | int(b)
                hashes.append(h)
            pdf["dhash"] = pd.array(hashes, dtype="Int64")
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def split_ppm_frames(blob: bytes) -> list[bytes]:
    """Split a 'video' blob — a back-to-back concatenation of P6 PPM
    frames (the container-free uncompressed form; think y4m without the
    wrapper) — into per-frame blobs. Raises ValueError on anything that
    is not a clean whole-frame concatenation."""
    frames: list[bytes] = []
    pos = 0
    while pos < len(blob):
        sub = blob[pos:]
        if sub[:2] != b"P6":
            raise ValueError(f"frame {len(frames)}: not a P6 header")
        toks, off = _ppm_header(sub, 4)
        w, h, maxval = int(toks[1]), int(toks[2]), int(toks[3])
        if w <= 0 or h <= 0 or not 0 < maxval <= 255:
            raise ValueError(f"frame {len(frames)}: bad geometry")
        end = off + 1 + w * h * 3
        if end > len(sub):
            raise ValueError(f"frame {len(frames)}: truncated pixel data")
        frames.append(sub[:end])
        pos += end
    if not frames:
        raise ValueError("empty video blob")
    return frames


def sample_frames(
    df: DataFrame,
    every_k: int,
    blob_col: str = "media_bytes",
    splitter: Callable[[bytes], list[bytes]] | None = None,
) -> DataFrame:
    """Frame sampling for video columns (SURVEY.md §7.6 frame-sample):
    explode every ``every_k``-th frame (0, k, 2k, ...) of each video blob
    into its own row carrying ``frame_idx`` + ``frame_bytes``.

    Corrupt videos contribute ZERO rows — at corpus scale a bad file must
    not fail the stage, and downstream per-frame work simply never sees
    it (corrupt accounting belongs to a scan-side quality query, not the
    sampler). One mapInPandas pass; the fan-out is rows-per-row, still
    partition-preserving — no shuffle. On 100 TB the sampled-frame volume
    is output-bound (n_frames/k), which is the point of sampling before
    any expensive per-frame featurization."""
    if every_k < 1:
        raise ValueError("every_k must be >= 1")
    split = splitter or split_ppm_frames
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("frame_idx", IntegerType()), StructField("frame_bytes", BinaryType())]
    )
    names = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for row in pdf.itertuples(index=False):
                rec = dict(zip(names, row))
                try:
                    frames = split(bytes(rec[blob_col]))
                except (ValueError, TypeError):
                    continue
                for idx in range(0, len(frames), every_k):
                    out_rows.append({**rec, "frame_idx": idx, "frame_bytes": frames[idx]})
            out = pd.DataFrame(out_rows, columns=names + ["frame_idx", "frame_bytes"])
            out["frame_idx"] = out["frame_idx"].astype("Int32")
            yield out

    return df.mapInPandas(run, schema=out_schema)


def encode_ppm(img) -> bytes:
    """Encode an (H, W, 3) uint8 array as a binary P6 PPM blob."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype("uint8").tobytes()


def resize_image(img, width: int, height: int):
    """Nearest-neighbor resample of an (H, W, 3) array to (height, width).

    Pure numpy index mapping — the standard pixel-center rule
    ``src = floor((dst + 0.5) * src_dim / dst_dim)`` so up- and
    down-scaling both pick the geometrically nearest source pixel."""
    import numpy as np

    sh, sw = img.shape[:2]
    rows = np.minimum(((np.arange(height) + 0.5) * sh / height).astype(np.int64), sh - 1)
    cols = np.minimum(((np.arange(width) + 0.5) * sw / width).astype(np.int64), sw - 1)
    return img[rows][:, cols]


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    blob_col: str = "media_bytes",
    decoder: Callable[[bytes, str], "object"] | None = None,
) -> DataFrame:
    """Real resize stage: decode each blob (PPM/BMP via
    :func:`decode_image`, or an injected ``decoder``), nearest-neighbor
    resample to ``width``x``height``, and re-encode as P6 PPM in place.
    Undecodable blobs pass through unchanged with NULL output geometry —
    corrupt media must not fail a corpus-scale stage.

    ``width``/``height`` columns record the ACTUAL output geometry (NULL
    when the blob was skipped), replacing the old metadata-only stub. One
    mapInPandas pass, partition-preserving, no shuffle — scan-scaling at
    100 TB like every other media kernel here."""
    dec = decoder or decode_image
    keep = [f for f in df.schema.fields if f.name not in ("width", "height")]
    out_schema = StructType(
        keep + [StructField("width", IntegerType()), StructField("height", IntegerType())]
    )
    names = [f.name for f in keep]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, ws, hs = [], [], []
            for blob in pdf[blob_col]:
                try:
                    img = dec(bytes(blob), "auto")
                except (ValueError, TypeError):
                    blobs.append(blob)
                    ws.append(None)
                    hs.append(None)
                    continue
                blobs.append(encode_ppm(resize_image(img, width, height)))
                ws.append(width)
                hs.append(height)
            out = pdf[names].copy()
            out[blob_col] = blobs
            out["width"] = pd.array(ws, dtype="Int32")
            out["height"] = pd.array(hs, dtype="Int32")
            yield out

    return df.mapInPandas(run, schema=out_schema)
