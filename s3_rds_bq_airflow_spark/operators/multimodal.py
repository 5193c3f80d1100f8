"""Multimodal column handling: opaque binary payloads + typed
metadata, with decode/feature-extraction as Arrow-batched pandas
stages over ``mapInPandas``.

Design (per the build spec): image/audio/video payloads are
``binary`` columns; metadata (mime, dimensions, duration) are typed
columns alongside. Decode and feature extraction run in vectorized
pandas batches. The decoders are REAL for the two containers
parseable with struct/numpy alone (24-bit BMP, 16-bit PCM WAV);
other codecs (JPEG/MP4/...) would slot into the same
``_feature_runner`` dead-letter harness once their libraries are
available — the Spark-side plumbing (schema, partitioning, batch
shape, error rows) is identical and fully tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T


def frame_sample_plan(
    df: DataFrame,
    *,
    every_n_seconds: int = 5,
    duration_col: str = "duration_s",
) -> DataFrame:
    """Video frame-sampling *plan*: explode each payload row into the
    frame timestamps a decoder would extract — pure Spark (sequence +
    explode), demonstrating the fan-out stage without the codec."""
    return df.withColumn(
        "frame_ts_s",
        F.explode(
            F.sequence(F.lit(0), F.col(duration_col).cast("long"), F.lit(every_n_seconds))
        ),
    )


def sample_frames(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_bytes: int = 256,
    stride_bytes: int = 128,
) -> DataFrame:
    """Frame sampling over an opaque media payload: slice the binary
    into fixed-size windows every ``stride_bytes`` (the video analogue:
    seek offsets -> decoded frames; here the byte slices THEMSELVES,
    decode being stubbed in this environment).

    Pure JVM expressions: ``sequence`` generates the offsets,
    ``posexplode`` fans out one row per frame, ``substring`` slices
    the payload. Payloads shorter than one frame yield no rows.
    """
    n = F.octet_length(F.col(payload_col))
    offsets = F.sequence(F.lit(0), n - F.lit(frame_bytes), F.lit(stride_bytes))
    return (
        df.where(n >= F.lit(frame_bytes))
        .select(
            F.col(id_col),
            F.posexplode(offsets).alias("frame_idx", "frame_offset"),
            F.col(payload_col),
        )
        .select(
            id_col,
            "frame_idx",
            "frame_offset",
            F.substring(F.col(payload_col), F.col("frame_offset") + 1, F.lit(frame_bytes)).alias(
                "frame"
            ),
        )
    )


# --- Real decoders for container formats parseable without media
# libraries (pure struct/numpy): 24-bit uncompressed BMP and 16-bit
# PCM WAV. These replace the stub for their formats; everything else
# (JPEG/PNG/MP4/...) genuinely needs external codecs and stays
# stubbed above.

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("decode_status", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("decode_status", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def decode_bmp(payload: bytes) -> tuple[int, int, float, float, float]:
    """Decode a 24-bit uncompressed bottom-up BMP: (width, height,
    mean_r, mean_g, mean_b). Raises ValueError on anything else."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={compression})")
    h = abs(height)
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    need = pixel_off + row_bytes * h
    if len(payload) < need:
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=pixel_off
    ).reshape(h, row_bytes)[:, : width * 3].reshape(h, width, 3)
    # Stored BGR; bottom-up unless height < 0 — orientation doesn't
    # change channel means, so no flip needed for these features.
    means = rows.reshape(-1, 3).mean(axis=0)
    return width, h, float(means[2]), float(means[1]), float(means[0])


def decode_wav(payload: bytes) -> tuple[int, int, float, float]:
    """Decode 16-bit PCM WAV: (sample_rate, n_samples, duration_s,
    rms) over all channels. Raises ValueError otherwise."""
    import struct

    import numpy as np

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, _n_ch, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported WAV variant (fmt={audio_fmt}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2")
    if samples.size == 0:
        raise ValueError("empty data chunk")
    rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
    return int(rate), int(samples.size), samples.size / rate, rms


def _feature_runner(id_col, payload_col, decoder, columns, schema):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    rows.append((doc_id, "ok", *decoder(raw)))
                except ValueError as e:  # dead-letter row, batch survives
                    rows.append((doc_id, f"error:{e}", *([None] * len(columns))))
            yield pd.DataFrame(rows, columns=["doc_id", "decode_status", *columns])

    return run


def extract_image_features(
    df: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL image decode over a binary column (24-bit BMP — the one
    image container parseable with numpy alone): width/height/channel
    means per payload, Arrow-batched ``mapInPandas``, malformed
    payloads dead-lettered as ``error:`` rows."""
    run = _feature_runner(
        id_col,
        payload_col,
        decode_bmp,
        ["width", "height", "mean_r", "mean_g", "mean_b"],
        IMAGE_FEATURE_SCHEMA,
    )
    return df.select(id_col, payload_col).mapInPandas(run, IMAGE_FEATURE_SCHEMA)


def extract_audio_features(
    df: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL audio decode (16-bit PCM WAV): rate, sample count,
    duration, RMS loudness — same batch shape as the image path."""
    run = _feature_runner(
        id_col,
        payload_col,
        decode_wav,
        ["sample_rate", "n_samples", "duration_s", "rms"],
        AUDIO_FEATURE_SCHEMA,
    )
    return df.select(id_col, payload_col).mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def make_solid_bmp(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Serialize a minimal 24-bit bottom-up BMP of one solid color —
    the deterministic payload generator for decode roundtrip tests
    (the corpus ships no real media)."""
    import struct

    row = bytes(bytearray([rgb[2], rgb[1], rgb[0]] * width))
    pad = b"\x00" * ((4 - (len(row) % 4)) % 4)
    pixels = (row + pad) * height
    header_size = 14 + 40
    return (
        b"BM"
        + struct.pack("<IHHI", header_size + len(pixels), 0, 0, header_size)
        + struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
        )
        + pixels
    )


def make_pcm_wav(rate: int, samples: list[int]) -> bytes:
    """Serialize 16-bit mono PCM WAV from integer samples."""
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def resize_bmp(payload: bytes, factor: int) -> bytes:
    """REAL image resize: nearest-neighbor downsample of a 24-bit BMP
    by an integer factor (every ``factor``-th pixel in each axis),
    re-serialized as BMP. Pure numpy strided slicing — no codec."""
    import struct

    import numpy as np

    if factor < 1:
        raise ValueError("factor must be >= 1")
    w, h, *_ = decode_bmp(payload)  # validates variant + geometry
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=pixel_off
    ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    small = rows[::factor, ::factor, :]
    nh, nw = small.shape[0], small.shape[1]
    out_row = np.zeros(((nw * 3 + 3) & ~3,), dtype=np.uint8)
    body = bytearray()
    for r in range(nh):
        out_row[: nw * 3] = small[r].reshape(-1)
        body += out_row.tobytes()
    header_size = 14 + 40
    return (
        b"BM"
        + struct.pack("<IHHI", header_size + len(body), 0, 0, header_size)
        + struct.pack(
            "<IiiHHIIiiII", 40, nw, nh, 1, 24, 0, len(body), 2835, 2835, 0, 0
        )
        + body
    )


def _bmp_pixel_grid(payload: bytes):
    """Parse a 24-bit BMP into a TOP-DOWN (h, w, 3) BGR numpy array
    (BMPs store rows bottom-up unless height < 0). Shares the header
    validation rules of `decode_bmp`."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    _planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={compression})")
    h = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    if len(payload) < pixel_off + row_bytes * h:
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=pixel_off
    ).reshape(h, row_bytes)[:, : width * 3].reshape(h, width, 3)
    return rows[::-1] if height > 0 else rows


def ahash64_hex(payload: bytes) -> tuple[str]:
    """Average-hash (aHash) perceptual fingerprint of a BMP payload:
    nearest-sample the decoded image to an 8x8 grid, integer luma
    (r+g+b)//3 per cell, bit i = 1 iff 64*luma_i > sum(lumas) (the
    strict integer form of 'above average' — no float mean), packed
    row-major top-down into a 16-hex-char string. The standard cheap
    image near-dup key (pHash's DCT-free little sibling)."""
    import numpy as np

    grid = _bmp_pixel_grid(payload)
    h, w = grid.shape[0], grid.shape[1]
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    cells = grid[np.ix_(ys, xs)].astype(np.int64)
    luma = (cells[:, :, 2] + cells[:, :, 1] + cells[:, :, 0]) // 3  # BGR stored
    flat = luma.reshape(-1)
    s = int(flat.sum())
    bits = (64 * flat > s).astype(np.int64)
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return (format(val, "016x"),)


def extract_image_ahash(
    df: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL perceptual-hash extraction over a binary image column:
    Arrow-batched mapInPandas decode -> 64-bit aHash hex; malformed
    payloads dead-letter (same runner as the feature extractors)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("decode_status", T.StringType()),
            T.StructField("ahash", T.StringType()),
        ]
    )
    run = _feature_runner(id_col, payload_col, ahash64_hex, ["ahash"], schema)
    return df.select(id_col, payload_col).mapInPandas(run, schema)


def hex64_hamming(col_a: str, col_b: str):
    """Hamming distance between two 16-hex-char 64-bit hashes as a
    Column: per-16-bit-chunk conv -> xor -> bit_count (sign-safe —
    never materializes the full 64-bit value as a signed long)."""
    return sum(
        F.bit_count(
            F.conv(F.substring(col_a, i * 4 + 1, 4), 16, 10).cast("long").bitwiseXOR(
                F.conv(F.substring(col_b, i * 4 + 1, 4), 16, 10).cast("long")
            )
        )
        for i in range(4)
    )


def hamming_neardup_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    hash_col: str = "ahash",
    max_hamming: int = 7,
    bands: int = 8,
) -> DataFrame:
    """Near-duplicate pairs among 64-bit hex perceptual hashes with
    Hamming distance <= ``max_hamming``, via LSH banding: split each
    hash into ``bands`` equal hex substrings and equi-join on
    (band_idx, band_value) — by pigeonhole, any pair within
    ``bands - 1`` differing bits shares at least one exact band, so
    with the default 8 bands / threshold 7 the banded join has ZERO
    false negatives and the exact bit_count(xor) filter afterwards
    removes band-collision false positives. Same plan family as the
    SimHash text near-dup (`operators/dedup.simhash_candidates`):
    banded equi-join only, never all-pairs."""
    if max_hamming >= bands:
        raise ValueError(
            f"pigeonhole guarantee needs max_hamming < bands "
            f"(got {max_hamming} >= {bands})"
        )
    width = 16 // bands  # hex chars per band
    banded = df.select(
        F.col(id_col).alias("_id"),
        F.col(hash_col).alias("_h"),
        F.posexplode(
            F.array(
                *[
                    F.substring(hash_col, i * width + 1, width)
                    for i in range(bands)
                ]
            )
        ).alias("_band", "_bval"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bval") == F.col("b._bval"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._h").alias("ha"),
            F.col("b._h").alias("hb"),
        )
        .distinct()
    )
    hamming = hex64_hamming("ha", "hb")
    return (
        cand.withColumn("hamming", hamming.cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def make_gray8_bmp(values: list[int]) -> bytes:
    """Serialize an 8x8 24-bit BMP from 64 grayscale values (row-major
    TOP-DOWN, r=g=b) — the deterministic payload generator for the
    perceptual-hash pipeline (rows are written bottom-up per the BMP
    spec, so decoding returns exactly ``values``)."""
    import struct

    if len(values) != 64:
        raise ValueError("need exactly 64 grayscale values")
    body = bytearray()
    for y in range(7, -1, -1):  # bottom-up storage
        for x in range(8):
            v = values[y * 8 + x] & 0xFF
            body += bytes((v, v, v))
        # 8*3 = 24 bytes per row: already 4-byte aligned, no padding
    header_size = 14 + 40
    return (
        b"BM"
        + struct.pack("<IHHI", header_size + len(body), 0, 0, header_size)
        + struct.pack("<IiiHHIIiiII", 40, 8, 8, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + body
    )


def spectral_peak(payload: bytes) -> tuple[int, int, int, float]:
    """REAL audio feature extraction: parse a 16-bit PCM WAV and
    return (sample_rate, n_samples, peak_bin, peak_freq_hz) where
    peak_bin is the argmax-magnitude rFFT bin EXCLUDING DC — the
    dominant-tone detector (the first column of any MFCC-ish audio
    featurization). numpy FFT over the decoded samples; peak_freq =
    peak_bin * rate / n_samples is exact when n_samples is a power of
    two."""
    import struct

    import numpy as np

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, _n_ch, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported WAV variant (fmt={audio_fmt}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2").astype(np.float64)
    if samples.size < 4:
        raise ValueError("too few samples for spectral analysis")
    mag = np.abs(np.fft.rfft(samples))
    peak_bin = int(np.argmax(mag[1:]) + 1)  # exclude DC
    return int(rate), int(samples.size), peak_bin, peak_bin * rate / samples.size


def extract_audio_spectral(
    df: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Distributed spectral-peak extraction (same mapInPandas batch
    shape as the decode/feature family)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("decode_status", T.StringType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("peak_bin", T.LongType()),
            T.StructField("peak_freq", T.DoubleType()),
        ]
    )
    run = _feature_runner(
        id_col,
        payload_col,
        spectral_peak,
        ["sample_rate", "n_samples", "peak_bin", "peak_freq"],
        schema,
    )
    return df.select(id_col, payload_col).mapInPandas(run, schema)


def constellation_landmarks(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_samples: int = 256,
    deltas: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """Shazam-style constellation fingerprints (Wang 2003): split the
    decoded PCM stream into fixed frames, take each frame's dominant
    rFFT bin (the spectral landmark), and hash anchor->target landmark
    pairs ``(peak_f, peak_{f+dt}, dt)`` packed as
    ``peak_a * 2^16 + peak_b * 2^4 + dt`` — the combinatorial hash
    that makes audio matching a plain equi-join. One output row per
    landmark pair: (doc_id, f, lhash)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("f", T.LongType()),
            T.StructField("lhash", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    # reuse the WAV chunk walk via spectral decode rules
                    if len(raw) < 44 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
                        raise ValueError("not a WAV payload")
                    pos, fmt, data = 12, None, None
                    while pos + 8 <= len(raw):
                        cid = raw[pos : pos + 4]
                        size = struct.unpack_from("<I", raw, pos + 4)[0]
                        body = raw[pos + 8 : pos + 8 + size]
                        if cid == b"fmt ":
                            fmt = body
                        elif cid == b"data":
                            data = body
                        pos += 8 + size + (size & 1)
                    if fmt is None or data is None:
                        raise ValueError("missing fmt/data chunk")
                    samples = np.frombuffer(data, dtype="<i2").astype(np.float64)
                    n_frames = samples.size // frame_samples
                    peaks = [
                        int(
                            np.argmax(
                                np.abs(
                                    np.fft.rfft(
                                        samples[
                                            i * frame_samples : (i + 1) * frame_samples
                                        ]
                                    )
                                )[1:]
                            )
                        )
                        + 1
                        for i in range(n_frames)
                    ]
                    for f in range(n_frames):
                        for dt in deltas:
                            if f + dt < n_frames:
                                h = peaks[f] * 65536 + peaks[f + dt] * 16 + dt
                                out.append((doc_id, f, h))
                except ValueError:
                    continue  # dead-letter: malformed payloads emit no landmarks
            yield pd.DataFrame(out, columns=["doc_id", "f", "lhash"])

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def constellation_match(
    landmarks: DataFrame, *, min_votes: int = 2
) -> DataFrame:
    """Audio near-dup matching over constellation landmarks: equi-join
    on the landmark hash, then the Shazam offset-consistency vote — a
    true match shows MANY shared hashes at ONE consistent frame delta,
    random collisions scatter. Returns (id_a, id_b, delta, votes)
    with votes >= min_votes. Never all-pairs: the only join key is
    the landmark hash."""
    a, b = landmarks.alias("a"), landmarks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.lhash") == F.col("b.lhash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            (F.col("a.f") - F.col("b.f")).alias("delta"),
        )
        .groupBy("id_a", "id_b", "delta")
        .agg(F.count(F.lit(1)).cast("long").alias("votes"))
        .where(F.col("votes") >= min_votes)
    )


def video_frame_ahash(
    df: DataFrame,
    *,
    frame_bytes: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Video-shaped frame featurization: split a binary stream into
    fixed-size frames, REALLY decode each frame (24-bit BMP) and
    perceptual-hash it — (doc_id, f, ahash) rows. The container here
    is a raw concatenation of BMP frames (the one video-ish container
    buildable with numpy alone); an MP4/AVI demuxer would slot into
    the same split->decode->hash harness. Frames that fail to decode
    dead-letter silently (emit no row), like the landmark extractor."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("f", T.LongType()),
            T.StructField("ahash", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                for f in range(len(raw) // frame_bytes):
                    frame = raw[f * frame_bytes : (f + 1) * frame_bytes]
                    try:
                        out.append((doc_id, f, ahash64_hex(frame)[0]))
                    except ValueError:
                        continue
            yield pd.DataFrame(out, columns=["doc_id", "f", "ahash"])

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def resize_images(
    df: DataFrame,
    *,
    factor: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Distributed resize over a binary image column: binary -> binary
    mapInPandas (the brief's decode/feature/RESIZE/frame-sample verb
    set); malformed payloads dead-letter as NULL output payloads with
    an error status."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("resize_status", T.StringType()),
            T.StructField(payload_col, T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    rows.append((doc_id, "ok", resize_bmp(raw, factor)))
                except ValueError as e:
                    rows.append((doc_id, f"error:{e}", None))
            yield pd.DataFrame(rows, columns=[id_col, "resize_status", payload_col])

    return df.select(id_col, payload_col).mapInPandas(run, schema)
