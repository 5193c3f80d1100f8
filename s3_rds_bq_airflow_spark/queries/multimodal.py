"""Multimodal-column queries: binary payload metadata (oracle-checked
JVM-side path) and the real BMP/WAV decode pipeline (mapInPandas
plumbing with closed-form oracles).

The corpus has no real media, so payloads are derived
deterministically from document text (UTF-8 bytes) — an opaque blob
as far as the operators are concerned.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query
from ._util import t


@query(
    "q_binary_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           MD5(LOWER(hex(encode(text)))) AS payload_md5,
           UPPER(SUBSTRING(hex(encode(text)), 1, 8)) AS magic_prefix,
           CAST(octet_length(encode(text)) > 1000 AS BIGINT) AS is_large
    FROM documents
    WHERE doc_id % 10 = 0
    """,
)
def q_binary_metadata(spark, sf_dir):
    """Typed metadata over an opaque binary column — byte length,
    content digest, magic-bytes prefix — all JVM-side functions on
    BinaryType (no decode, no Python)."""
    payload = F.encode(F.col("text"), "UTF-8")
    # hex case differs across engines (Spark upper, DuckDB lower):
    # normalize explicitly on both sides.
    return (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 10 == 0)
        .select(
            "doc_id",
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(F.lower(F.hex(payload))).alias("payload_md5"),
            F.upper(F.substring(F.hex(payload), 1, 8)).alias("magic_prefix"),
            (F.octet_length(payload) > 1000).cast("long").alias("is_large"),
        )
    )


@query(
    "q_frame_sample",
    oracle="""
    WITH payloads AS (
        -- DuckDB substring doesn't slice BLOBs: slice the hex string
        -- instead (2 hex chars per byte) — identical bytes either way
        SELECT doc_id, LOWER(hex(encode(text))) AS payload_hex,
               octet_length(encode(text)) AS n_bytes
        FROM documents WHERE doc_id % 25 = 0
    ), frames AS (
        SELECT doc_id,
               unnest(generate_series(0, n_bytes - 256, 128)) AS frame_offset,
               payload_hex
        FROM payloads
        WHERE n_bytes >= 256
    )
    SELECT doc_id,
           CAST(frame_offset / 128 AS BIGINT) AS frame_idx,
           CAST(frame_offset AS BIGINT) AS frame_offset,
           MD5(substring(payload_hex, CAST(frame_offset AS INTEGER) * 2 + 1, 512)) AS frame_md5
    FROM frames
    """,
)
def q_frame_sample(spark, sf_dir):
    """Frame sampling plumbing (video/audio shape): sequence ->
    posexplode -> binary slice, one row per 256-byte frame at a
    128-byte stride; frames identified by content digest. All JVM
    expressions — the real media decoders (q_image_decode_real /
    q_audio_decode_real) consume exactly this fan-out shape."""
    from ..operators.multimodal import sample_frames

    docs = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 25 == 0)
        .select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    )
    frames = sample_frames(docs, frame_bytes=256, stride_bytes=128)
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("frame_offset").cast("long").alias("frame_offset"),
        F.md5(F.lower(F.hex(F.col("frame")))).alias("frame_md5"),
    )


def _synth_media(kind):
    """mapInPandas synthesizer: doc_id -> deterministic BMP/WAV bytes
    (payload generator — the decode under test is the REAL parser)."""
    import pandas as pd

    from ..operators.multimodal import make_pcm_wav, make_solid_bmp

    def run(batches):
        for pdf in batches:
            ids = pdf["doc_id"]
            if kind == "bmp":
                payloads = [
                    make_solid_bmp(
                        int(i % 8 + 1),
                        int(i % 5 + 1),
                        (int(i % 256), int(i * 7 % 256), int(i * 13 % 256)),
                    )
                    for i in ids
                ]
            else:
                payloads = [
                    make_pcm_wav(8000, [int(i % 1000 + 1)] * int(i % 50 + 1))
                    for i in ids
                ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return run


@query(
    "q_image_decode_real",
    oracle="""
    SELECT doc_id,
           'ok' AS decode_status,
           CAST(doc_id % 8 + 1 AS INT) AS width,
           CAST(doc_id % 5 + 1 AS INT) AS height,
           CAST(doc_id % 256 AS DOUBLE) AS mean_r,
           CAST((doc_id * 7) % 256 AS DOUBLE) AS mean_g,
           CAST((doc_id * 13) % 256 AS DOUBLE) AS mean_b
    FROM documents WHERE doc_id % 25 = 0
    """,
)
def q_image_decode_real(spark, sf_dir):
    """REAL image decode end-to-end (no stub): deterministic solid-
    color 24-bit BMPs are synthesized per doc_id, then parsed back by
    `operators/multimodal.decode_bmp` (pure struct+numpy — the one
    image container needing no external codec) in Arrow-batched
    mapInPandas. The oracle states the expected geometry and channel
    means in closed form: equality proves pixels, padding, and BGR
    layout were actually decoded, not fingerprinted."""
    from ..operators.multimodal import extract_image_features

    ids = t(spark, sf_dir, "documents").where(F.col("doc_id") % 25 == 0).select("doc_id")
    payloads = ids.mapInPandas(_synth_media("bmp"), "doc_id LONG, payload BINARY")
    return extract_image_features(payloads)


@query(
    "q_audio_decode_real",
    oracle="""
    SELECT doc_id,
           'ok' AS decode_status,
           CAST(8000 AS INT) AS sample_rate,
           CAST(doc_id % 50 + 1 AS BIGINT) AS n_samples,
           CAST(doc_id % 50 + 1 AS DOUBLE) / 8000 AS duration_s,
           CAST(doc_id % 1000 + 1 AS DOUBLE) AS rms
    FROM documents WHERE doc_id % 25 = 0
    """,
)
def q_audio_decode_real(spark, sf_dir):
    """REAL audio decode end-to-end: constant-amplitude 16-bit PCM
    WAVs synthesized per doc_id, parsed by `decode_wav` (RIFF chunk
    walk + numpy) — constant samples make RMS exactly the amplitude
    and duration an exact IEEE division, so the oracle is closed-form
    hash-tight."""
    from ..operators.multimodal import extract_audio_features

    ids = t(spark, sf_dir, "documents").where(F.col("doc_id") % 25 == 0).select("doc_id")
    payloads = ids.mapInPandas(_synth_media("wav"), "doc_id LONG, payload BINARY")
    return extract_audio_features(payloads)


# Perceptual-hash near-dup plant: docs with doc_id % 40 in {0, 1}
# form pairs (40b, 40b+1) sharing a base image; the odd member flips
# one pixel by +128 — a near-identical image. Pixel values are
# md5-derived (available identically in Python, Spark, and DuckDB)
# so unrelated images are hamming ~32 apart while planted pairs stay
# <= ~4 (measured: max 4, cross-min 14 over thousands of samples).
_AHASH_MOD = 40
_AHASH_MAX_HAMMING = 7


def _synth_gray8(batches):
    """mapInPandas synthesizer: doc_id -> deterministic 8x8 grayscale
    BMP; v_i = first md5 byte of '{base}_{i}', odd member flips pixel
    0 by +128 (mod 256)."""
    import hashlib

    import pandas as pd

    from ..operators.multimodal import make_gray8_bmp

    def vals(doc_id: int) -> list[int]:
        base, member = doc_id // _AHASH_MOD, doc_id % _AHASH_MOD
        v = [
            int(hashlib.md5(f"{base}_{i}".encode()).hexdigest()[:2], 16)
            for i in range(64)
        ]
        if member == 1:
            v[0] = (v[0] + 128) % 256
        return v

    for pdf in batches:
        ids = pdf["doc_id"]
        yield pd.DataFrame(
            {"doc_id": ids, "payload": [make_gray8_bmp(vals(int(i))) for i in ids]}
        )


@query(
    "q_image_ahash_neardup",
    oracle=f"""
    WITH ids AS (
        SELECT doc_id, doc_id // {_AHASH_MOD} AS base, doc_id % {_AHASH_MOD} AS member
        FROM documents WHERE doc_id % {_AHASH_MOD} < 2
    ),
    px AS (
        SELECT doc_id, list_transform(range(0, 64), i ->
                 CASE WHEN member = 1 AND i = 0
                      THEN (CAST('0x' || substr(md5(base || '_' || i), 1, 2) AS INT) + 128) % 256
                      ELSE CAST('0x' || substr(md5(base || '_' || i), 1, 2) AS INT)
                 END) AS v
        FROM ids
    ),
    bt AS (
        SELECT doc_id,
               list_transform(range(0, 64),
                              i -> CASE WHEN 64 * v[i + 1] > list_sum(v) THEN 1 ELSE 0 END) AS b
        FROM px
    )
    SELECT * FROM (
        SELECT a.doc_id AS id_a, c.doc_id AS id_b,
               CAST(list_sum(list_transform(range(0, 64),
                    i -> CASE WHEN a.b[i + 1] <> c.b[i + 1] THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
        FROM bt a JOIN bt c ON a.doc_id < c.doc_id
    ) WHERE hamming <= {_AHASH_MAX_HAMMING}
    """,
)
def q_image_ahash_neardup(spark, sf_dir):
    """Image near-duplicate detection by perceptual hash, end-to-end
    REAL: deterministic 8x8 grayscale BMPs are synthesized per doc_id
    (planted near-identical pairs differing in ONE pixel), decoded and
    aHashed by `operators/multimodal.ahash64_hex` (numpy over actual
    BMP bytes in Arrow-batched mapInPandas), then paired by
    `hamming_neardup_pairs` — 8-band LSH equi-join with the pigeonhole
    guarantee (hamming <= 7 over 8 bands of 8 bits always shares an
    exact band: ZERO false negatives), exact bit_count(xor) filter
    after. The image analogue of the SimHash text near-dup, and the
    standard first pass of multimodal training-data dedup.

    The oracle is the documented brute-force twin: it replays the
    closed-form pixel values and the strict-integer aHash rule in SQL
    and joins ALL pairs — proving the banded plan loses nothing. At
    scale the Spark side stays banded (never all-pairs); the subset
    keeps the oracle's O(n^2) replay feasible at every sweep SF."""
    from ..operators.multimodal import extract_image_ahash, hamming_neardup_pairs

    ids = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % _AHASH_MOD < 2)
        .select("doc_id")
    )
    payloads = ids.mapInPandas(_synth_gray8, "doc_id LONG, payload BINARY")
    hashes = extract_image_ahash(payloads).where(F.col("decode_status") == "ok")
    return hamming_neardup_pairs(hashes, max_hamming=_AHASH_MAX_HAMMING)


@query(
    "q_audio_spectral",
    oracle="""
    SELECT doc_id,
           'ok' AS decode_status,
           CAST(8000 AS INT) AS sample_rate,
           CAST(256 AS BIGINT) AS n_samples,
           CAST(doc_id % 100 + 5 AS BIGINT) AS peak_bin,
           CAST((doc_id % 100 + 5) * 8000 AS DOUBLE) / 256 AS peak_freq
    FROM documents WHERE doc_id % 25 = 0
    """,
)
def q_audio_spectral(spark, sf_dir):
    """REAL audio spectral featurization: 256-sample 16-bit PCM WAVs
    carrying a pure bin-aligned sine at k = doc_id % 100 + 5 cycles
    are synthesized, parsed back by `operators/multimodal.
    spectral_peak`, and the dominant tone recovered via numpy rFFT
    argmax (DC excluded) in Arrow-batched mapInPandas — the
    feature-extraction verb of the audio pipeline beyond plain decode
    (RMS/duration). The oracle is closed-form: a bin-aligned sine's
    argmax IS its bin (quantization noise is ~80 dB down), and
    peak_freq = k*8000/256 is an exact IEEE division by a power of
    two, so the driver hash is tight on every column."""
    import math

    import pandas as pd  # noqa: F401

    from ..operators.multimodal import extract_audio_spectral, make_pcm_wav

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["doc_id"]
            payloads = []
            for i in ids:
                k = int(i) % 100 + 5
                samples = [
                    int(round(12000 * math.sin(2 * math.pi * k * n / 256)))
                    for n in range(256)
                ]
                payloads.append(make_pcm_wav(8000, samples))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    ids = t(spark, sf_dir, "documents").where(F.col("doc_id") % 25 == 0).select("doc_id")
    payloads = ids.mapInPandas(synth, "doc_id LONG, payload BINARY")
    return extract_audio_spectral(payloads)


# Constellation plant: docs with doc_id % 25 in {0, 1} form pairs
# (25b, 25b+1) playing the SAME tone schedule shifted by one frame —
# the time-offset near-dup constellation matching exists to find.
_CONST_MOD = 25
_CONST_FRAMES = 4
_CONST_DELTAS = (1, 2)


def _const_tone(base: int, member: int, f: int) -> int:
    """Frame f's tone bin: member 1 plays member 0's schedule shifted
    one frame later. md5-derived (identically computable in Python
    and DuckDB) so DIFFERENT bases' schedules are unrelated — an
    arithmetic-progression schedule made every pair of docs a shifted
    coincidence (2200 accidental matches at sf0.1, O(n^2) growth);
    random schedules leave only the planted pairs."""
    import hashlib

    return int(hashlib.md5(f"{base}_{f + member}".encode()).hexdigest()[:4], 16) % 100 + 5


@query(
    "q_audio_constellation",
    oracle=f"""
    WITH ids AS (
        SELECT doc_id, doc_id // {_CONST_MOD} AS base, doc_id % {_CONST_MOD} AS member
        FROM documents WHERE doc_id % {_CONST_MOD} < 2
    ),
    lm AS (
        SELECT doc_id,
               CAST(p.f AS BIGINT) AS f,
               ((CAST('0x' || substr(md5(base || '_' || (p.f + member)), 1, 4) AS INT) % 100) + 5) * 65536
                 + ((CAST('0x' || substr(md5(base || '_' || (p.f + p.dt + member)), 1, 4) AS INT) % 100) + 5) * 16
                 + p.dt AS lhash
        FROM ids,
             (VALUES (0, 1), (1, 1), (2, 1), (0, 2), (1, 2)) p(f, dt)
    )
    SELECT id_a, id_b, delta, CAST(COUNT(*) AS BIGINT) AS votes
    FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.f - b.f AS delta
        FROM lm a JOIN lm b ON a.lhash = b.lhash AND a.doc_id < b.doc_id
    )
    GROUP BY 1, 2, 3
    HAVING COUNT(*) >= 2
    """,
)
def q_audio_constellation(spark, sf_dir):
    """Audio near-duplicate matching by constellation fingerprints
    (Wang 2003 — the Shazam algorithm), end-to-end REAL: 4-frame PCM
    WAVs playing deterministic tone schedules are synthesized (planted
    pairs share the schedule shifted by ONE frame — a time-offset
    duplicate), frames are actually decoded and rFFT'd to landmark
    peaks (`operators/multimodal.constellation_landmarks`), anchor->
    target peak pairs hash combinatorially, and matching is the
    landmark-hash equi-join + offset-consistency vote
    (`constellation_match`): a true match concentrates votes at one
    frame delta, random collisions scatter. The audio sibling of
    q_image_ahash_neardup, completing the multimodal near-dup pair.

    The oracle replays the tone schedules and the landmark/vote
    algebra in closed form (VALUES over the 5 (f, dt) anchor pairs) —
    equality proves the frames were really decoded and the peaks
    really recovered. Scale: landmarks are a scan-speed mapInPandas;
    the match is hash-equi-join + count — never all-pairs."""
    import math

    from ..operators.multimodal import (
        constellation_landmarks,
        constellation_match,
        make_pcm_wav,
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["doc_id"]
            payloads = []
            for i in ids:
                i = int(i)
                base, member = i // _CONST_MOD, i % _CONST_MOD
                samples = []
                for f in range(_CONST_FRAMES):
                    k = _const_tone(base, member, f)
                    samples.extend(
                        int(round(12000 * math.sin(2 * math.pi * k * n / 256)))
                        for n in range(256)
                    )
                payloads.append(make_pcm_wav(8000, samples))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    ids = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % _CONST_MOD < 2)
        .select("doc_id")
    )
    payloads = ids.mapInPandas(synth, "doc_id LONG, payload BINARY")
    lm = constellation_landmarks(payloads, deltas=_CONST_DELTAS)
    return constellation_match(lm, min_votes=2)


# Video-frame-dedup plant: 6 8x8 BMP frames per "video" (raw
# concatenation), where frame 4 repeats frame 1 exactly and frame 5
# is frame 2 with one pixel flipped — an exact and a near duplicate
# frame per video. 8x8 24-bit BMP = 54 + 8*24 = 246 bytes.
_VIDEO_MOD = 50
_VIDEO_FRAME_BYTES = 246
# (f, source frame, flip-pixel-0?) — the dedup structure
_VIDEO_FRAMES = ((0, 0, 0), (1, 1, 0), (2, 2, 0), (3, 3, 0), (4, 1, 0), (5, 2, 1))


@query(
    "q_video_frame_dedup",
    oracle=f"""
    WITH ids AS (
        SELECT doc_id FROM documents WHERE doc_id % {_VIDEO_MOD} = 0
    ),
    fr AS (
        SELECT doc_id, p.f, p.src, p.flip
        FROM ids, (VALUES {", ".join(str(t3) for t3 in _VIDEO_FRAMES)}) p(f, src, flip)
    ),
    px AS (
        SELECT doc_id, f, list_transform(range(0, 64), i ->
                 CASE WHEN flip = 1 AND i = 0
                      THEN (CAST('0x' || substr(md5(doc_id || '_' || src || '_' || i), 1, 2) AS INT) + 128) % 256
                      ELSE CAST('0x' || substr(md5(doc_id || '_' || src || '_' || i), 1, 2) AS INT)
                 END) AS v
        FROM fr
    ),
    bt AS (
        SELECT doc_id, CAST(f AS BIGINT) AS f,
               list_transform(range(0, 64),
                              i -> CASE WHEN 64 * v[i + 1] > list_sum(v) THEN 1 ELSE 0 END) AS b
        FROM px
    )
    SELECT * FROM (
        SELECT a.doc_id, a.f AS f_a, c.f AS f_b,
               CAST(list_sum(list_transform(range(0, 64),
                    i -> CASE WHEN a.b[i + 1] <> c.b[i + 1] THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
        FROM bt a JOIN bt c ON a.doc_id = c.doc_id AND a.f < c.f
    ) WHERE hamming <= 7
    """,
)
def q_video_frame_dedup(spark, sf_dir):
    """Within-video duplicate-frame detection — the frame-level dedup
    of video training pipelines (static scenes, looped intros): raw
    BMP-concatenation "videos" are synthesized with a planted exact
    duplicate (frame 4 = frame 1) and near duplicate (frame 5 =
    frame 2 one pixel off), split into frames and REALLY decoded +
    aHashed (`operators/multimodal.video_frame_ahash`), then frame
    pairs within each video with Hamming <= 7 are reported via the
    doc-keyed self-join (bounded: 15 pairs per 6-frame video).
    Completes the multimodal near-dup triad: q_image_ahash_neardup
    (cross-image), q_audio_constellation (cross-audio), this
    (within-video). The oracle replays pixels, aHash bits, and
    Hamming in closed form — proving the frame split and decode."""
    import hashlib

    from ..operators.multimodal import (
        hex64_hamming,
        make_gray8_bmp,
        video_frame_ahash,
    )

    def synth(batches):
        import pandas as pd

        def frame_vals(doc_id, src, flip):
            v = [
                int(hashlib.md5(f"{doc_id}_{src}_{i}".encode()).hexdigest()[:2], 16)
                for i in range(64)
            ]
            if flip:
                v[0] = (v[0] + 128) % 256
            return v

        for pdf in batches:
            ids = pdf["doc_id"]
            payloads = [
                b"".join(
                    make_gray8_bmp(frame_vals(int(i), src, flip))
                    for _f, src, flip in _VIDEO_FRAMES
                )
                for i in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    ids = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % _VIDEO_MOD == 0)
        .select("doc_id")
    )
    payloads = ids.mapInPandas(synth, "doc_id LONG, payload BINARY")
    frames = video_frame_ahash(payloads, frame_bytes=_VIDEO_FRAME_BYTES)
    a, b = frames.alias("a"), frames.alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.f") < F.col("b.f")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.f").alias("f_a"),
            F.col("b.f").alias("f_b"),
            F.col("a.ahash").alias("ha"),
            F.col("b.ahash").alias("hb"),
        )
        .withColumn("hamming", hex64_hamming("ha", "hb").cast("long"))
        .where(F.col("hamming") <= 7)
        .select("doc_id", "f_a", "f_b", "hamming")
    )


@query(
    "q_image_resize_real",
    oracle="""
    SELECT doc_id,
           'ok' AS decode_status,
           CAST(doc_id % 4 + 1 AS INT) AS width,
           CAST(doc_id % 3 + 1 AS INT) AS height,
           CAST(doc_id % 256 AS DOUBLE) AS mean_r,
           CAST((doc_id * 11) % 256 AS DOUBLE) AS mean_g,
           CAST((doc_id * 3) % 256 AS DOUBLE) AS mean_b
    FROM documents WHERE doc_id % 40 = 0
    """,
)
def q_image_resize_real(spark, sf_dir):
    """REAL image resize end-to-end (the brief's decode/feature/
    resize/frame-sample verb set, resize leg): solid-color BMPs with
    even dimensions are synthesized, nearest-neighbor downsampled 2x
    (`operators/multimodal.resize_bmp`, numpy strided slicing), and
    decoded back — halved geometry, invariant channel means, all in
    closed form for the oracle."""
    import pandas as pd

    from ..operators.multimodal import (
        extract_image_features,
        make_solid_bmp,
        resize_images,
    )

    def synth(batches):
        for pdf in batches:
            ids = pdf["doc_id"]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [
                        make_solid_bmp(
                            int((i % 4 + 1) * 2),
                            int((i % 3 + 1) * 2),
                            (int(i % 256), int(i * 11 % 256), int(i * 3 % 256)),
                        )
                        for i in ids
                    ],
                }
            )

    ids = t(spark, sf_dir, "documents").where(F.col("doc_id") % 40 == 0).select("doc_id")
    payloads = ids.mapInPandas(synth, "doc_id LONG, payload BINARY")
    resized = resize_images(payloads, factor=2).drop("resize_status")
    return extract_image_features(resized)
