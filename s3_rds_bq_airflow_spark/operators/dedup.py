"""Deduplication kit for large text corpora: exact, MinHash+LSH,
SimHash, and n-gram Jaccard verification.

Design for 100 TB:

- **Exact**: hash-groupBy on a normalized content digest — one
  shuffle of (digest, doc_id), never the text itself.
- **MinHash+LSH**: shingle -> 64-bit hash -> P permutation minima ->
  band signatures -> candidate pairs via a self-join on
  (band, signature). Only docs sharing a band bucket ever meet, so
  the join is linear-ish in corpus size instead of O(n^2); signatures
  are a few hundred bytes per doc regardless of document length.
- **SimHash**: per-token hash bit votes -> 32-bit signature -> banded
  byte join for candidates -> exact Hamming filter via bit_count.
- All hashing is xxhash64 (deterministic, seed-stable, JVM-side) in
  the throughput default; ``exact=True`` swaps every hash for
  ``md5_hash60`` (the 60-bit prefix of md5), which any engine
  computes identically — making the ENTIRE MinHash/SimHash pipeline
  replayable as a SQL oracle (same recipe as the LSH/IVF exact
  modes in similarity.py / ivf.py).

Everything is DataFrame-composable; no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Deterministic (a*h + b) % MERSENNE_31 permutation constants,
# pre-generated with a fixed seed so signatures are reproducible.
MERSENNE_31 = (1 << 31) - 1


def _perm_constants(n_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, MERSENNE_31), rng.randrange(0, MERSENNE_31)) for _ in range(n_perm)]


def normalize_text(col: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def md5_hash60(col: Column) -> Column:
    """Engine-portable 60-bit hash: the first 15 hex chars of md5 as
    a long (big-endian hex fold). Slower than xxhash64 (md5 + base
    conversion) — the verification gear, not the throughput path."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def ngram_array(toks_col: str, k: int) -> Column:
    """k-token shingles over a token-array column, space-joined.

    The ``greatest(size - k + 1, 1)`` clamp makes a document shorter
    than ``k`` tokens yield ONE short shingle instead of none — the
    single subtle spot, shared here so the MinHash shingler and the
    textops n-gram queries can't drift apart (their DuckDB oracles
    mirror the same clamp)."""
    return F.expr(
        f"transform(sequence(1, greatest(size({toks_col}) - {k - 1}, 1)), "
        f"i -> concat_ws(' ', slice({toks_col}, i, {k})))"
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup by normalized-content MD5: one row per distinct
    content with the kept (minimum) id and the duplicate count."""
    return (
        df.select(F.md5(normalize_text(F.col(text_col))).alias("content_fp"), F.col(id_col))
        .groupBy("content_fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def token_shingles(
    df: DataFrame, text_col: str, id_col: str, k: int = 3, *, exact: bool = False
) -> DataFrame:
    """Distinct k-token shingles per document -> (id, shingle_hash).

    Built with array expressions (transform/slice over the token
    array), exploded once; hashes immediately so shuffles move longs,
    not strings. ``exact=True`` hashes with the engine-portable
    ``md5_hash60`` instead of xxhash64.
    """
    toks = F.split(F.trim(normalize_text(F.col(text_col))), " ")
    shingle_arr = ngram_array("_toks", k)
    h = md5_hash60(F.col("_sh")) if exact else F.xxhash64("_sh")
    return (
        df.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
        .select("_id", F.explode(F.array_distinct(shingle_arr)).alias("_sh"))
        .select("_id", F.pmod(h, F.lit(MERSENNE_31)).alias("_h"))
        .distinct()
    )


def minhash_signatures(
    shingles: DataFrame, n_perm: int = 32, seed: int = 42
) -> DataFrame:
    """P-permutation MinHash signature per id (one hash-agg pass;
    shuffle payload = P longs per doc)."""
    perms = _perm_constants(n_perm, seed)
    aggs = [
        F.min((F.lit(a) * F.col("_h") + F.lit(b)) % F.lit(MERSENNE_31)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(perms)
    ]
    return shingles.groupBy("_id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, n_perm: int = 32, bands: int = 8, *, exact: bool = False
) -> DataFrame:
    """Band the signature, bucket-join: pairs sharing >= 1 band.

    Rows per doc = bands; join key = (band_idx, band_hash). Returns
    distinct (id_a < id_b) candidate pairs. ``exact=True`` derives
    the band hash from the comma-joined minima via ``md5_hash60``
    (portable) instead of xxhash64 over the columns.
    """
    rows_per_band = n_perm // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        sig = (
            md5_hash60(F.concat_ws(",", *cols))
            if exact
            else F.xxhash64(*cols)
        )
        band_cols.append(F.struct(F.lit(b).alias("band"), sig.alias("sig")))
    banded = signatures.select(
        F.col("_id"), F.explode(F.array(*band_cols)).alias("bs")
    ).select("_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.sig") == F.col("r.sig"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, shingles: DataFrame, threshold: float
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (anti-false-
    positive pass): |A ∩ B| via join on shingle hash, |A ∪ B| =
    |A| + |B| - |A ∩ B|."""
    sizes = shingles.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sh_a = shingles.select(F.col("_id").alias("id_a"), "_h")
    sh_b = shingles.select(F.col("_id").alias("id_b"), "_h")
    inter = (
        pairs.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "_h"])  # equal shingle hash on both sides
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 3,
    n_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    exact: bool = False,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle -> signature ->
    banded candidates -> exact-Jaccard verification. ``exact=True``
    uses portable md5-derived hashes throughout, making the whole
    pipeline SQL-oracle-checkable.

    The shingle table is persisted (round 12): Spark shares no
    subplans, so without the persist the shingle pipeline (normalize
    + explode + hash + distinct shuffle) executed FIVE times per run
    — once under each side of the banded self-join and once each for
    the verify pass's sizes/sh_a/sh_b consumers (24 parquet scan
    nodes in the sf0.1 plan; with the persist the corpus is scanned
    twice — once per union arm — during the single cache fill). The
    cached frame is key-sized (id, hash64) longs — never text.
    Round-12 sf10 occupancy probe: band-bucket max/median occupancy
    41/1 over 4M buckets, so there is no hot-bucket skew to salt;
    recomputation was the entire cost (interleaved 3-way A/B, min of
    3, hash-identical: unpersisted 41.9 s, shingles-only 28.1 s,
    shingles+signatures 28.0 s). The signature frame is deliberately
    NOT persisted: its two consumers (the band self-join's sides)
    each re-run ONE hash aggregate over the cached shingles — sf10
    par with caching it — while its P-longs-per-doc cache is ~16x
    the shingle cache and is exactly what spills first at sf100 on a
    fixed-memory box. Cache lifetime follows the similarity.py
    persist convention: the operator returns a LAZY frame so it
    cannot unpersist itself; MEMORY_AND_DISK blocks are
    LRU-evictable and an evicted block recomputes — see
    ``queries/__init__.clear_query_caches``."""
    sh = token_shingles(df, text_col, id_col, k, exact=exact).persist()
    sigs = minhash_signatures(sh, n_perm)
    cands = lsh_candidate_pairs(sigs, n_perm, bands, exact=exact)
    return jaccard_verify(cands, sh, threshold)


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
    *,
    exact: bool = False,
) -> DataFrame:
    """Per-document SimHash: token-hash bit votes -> sign -> packed
    signature (computed as `bits` conditional sums in one agg pass).
    ``exact=True`` votes on ``md5_hash60`` bits (portable)."""
    toks = F.explode(F.split(F.trim(normalize_text(F.col(text_col))), " ")).alias("_tok")
    h = md5_hash60(F.col("_tok")) if exact else F.xxhash64("_tok")
    hashed = df.select(F.col(id_col).alias("_id"), toks).select(
        "_id", h.alias("_h")
    )
    votes = [
        F.sum(
            F.when(F.expr(f"(_h >> {i}) & 1") == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    voted = hashed.groupBy("_id").agg(*votes)
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return voted.select("_id", sig.cast("long").alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    bits: int = 60,
    n_bands: int = 4,
    max_hamming: int = 6,
    exact: bool = False,
) -> DataFrame:
    """SimHash near-dup: candidates share >= 1 of ``n_bands`` bands
    of ``bits/n_bands`` bits (pigeonhole guarantee for small Hamming
    distances), then an exact popcount(xor) filter. ``exact=True`` =
    portable md5-derived hashes (60 usable bits).

    Band width IS the scale knob: candidate volume per band bucket is
    quadratic in occupancy, so the band key space (2^width) must stay
    ahead of the corpus. 60-bit signatures / 4 bands = 15-bit keys
    (32k buckets per band); the original 32-bit/8-bit-band shape
    flooded at the round-6 sf1 sweep — 50k docs / 256 buckets per
    band = tens of millions of candidate pairs (driver maxResultSize
    abort). At larger corpora, raise n_bands' width further (wider
    signature) or shard the band join by key range."""
    sigs = simhash_signatures(df, text_col, id_col, bits, exact=exact)
    band_width = bits // n_bands
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.expr(f"(simhash >> {b * band_width}) & {(1 << band_width) - 1}").alias("key"),
        )
        for b in range(n_bands)
    ]
    banded = sigs.select(
        "_id", "simhash", F.explode(F.array(*bands)).alias("bk")
    ).select("_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def incremental_exact_dedup(
    spark,
    state_path: str,
    batch: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Exact dedup of a NEW batch against the persisted corpus state —
    the production shape: arriving shards never rescan history, they
    join against a (content_fp, keep_id) signature store that is
    key-sized (one row per distinct content, no text).

    Per batch: dedup within the batch, LEFT-anti the store to find
    genuinely novel content, atomically fold the batch's partial
    aggregate into the store (min keep_id, summed counts). Returns
    ``(novel, state)``: the content first seen in this batch and the
    updated store. Invariant pinned in tests: processing a corpus in
    ANY batch split yields the same store as one-shot exact_dedup.

    At 100 TB the store shuffle is (16-byte fp, id) pairs; the batch
    side is the only text scanned — identical cost profile to the
    streaming upsert sink, with the same crash-safe swap.
    """
    import os

    from ..io.atomic import swap_directory

    in_batch = exact_dedup(batch, text_col, id_col)
    if os.path.exists(state_path):
        store = spark.read.parquet(state_path)
        novel = in_batch.join(store.select("content_fp"), "content_fp", "left_anti")
        # Store ∪ batch partials re-aggregated: keep_id is the GLOBAL
        # min and counts sum — the store is the same partial-aggregate
        # state a one-shot exact_dedup would hold, so any batch split
        # converges to the identical store (the pinned invariant).
        merged = (
            store.unionByName(in_batch)
            .groupBy("content_fp")
            .agg(
                F.min("keep_id").alias("keep_id"),
                F.sum("n_copies").alias("n_copies"),
            )
        )
    else:
        novel = in_batch
        merged = in_batch
    # Materialize novel BEFORE the swap: it is a lazy plan over the
    # store files the swap is about to replace — collecting it later
    # would read deleted parquet.
    novel = novel.localCheckpoint(eager=True)
    tmp = state_path.rstrip("/") + "__tmp"
    merged.write.mode("overwrite").parquet(tmp)
    swap_directory(tmp, state_path)
    return novel, spark.read.parquet(state_path)
