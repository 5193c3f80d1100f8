"""Deduplication queries over the documents table (training-data
pipeline kit; SURVEY build-plan step 6).

The synthetic corpus has no natural duplicates, so the near-dup
queries build a deterministic augmented corpus — each doc_id % 17 == 0
document gets a lightly-mutated twin (id + 1,000,000) — and must
recover exactly those planted pairs. That makes the rows-only checks
meaningful: non-empty, deterministic, and self-verifying.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
    simhash_near_dup_pairs,
)
from .registry import query
from ._util import pair_salt_width, t
from .textops import NORMALIZE_SQL, ngram_list_sql


@query(
    "q_dedup_exact",
    oracle=f"""
    SELECT MD5({NORMALIZE_SQL}) AS content_fp,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on normalized-content MD5. The
    shuffle moves (16-byte digest, id) pairs — content never moves."""
    return exact_dedup(t(spark, sf_dir, "documents"))


@query(
    "q_dedup_exact_planted",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 17 = 0
    )
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT MD5({NORMALIZE_SQL})) AS n_distinct,
           COUNT(*) - COUNT(DISTINCT MD5({NORMALIZE_SQL})) AS n_duplicates
    FROM corpus
    """,
)
def q_dedup_exact_planted(spark, sf_dir):
    """Exact dedup against planted identical twins: the distinct count
    must drop by exactly the number of planted copies."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    twins = docs.where(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(twins)
    fp = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")))
    return corpus.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(fp).alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct(fp)).alias("n_duplicates"),
    )


def _augmented_corpus(spark, sf_dir):
    """documents + mutated twins (suffix tokens appended) — near-dups
    by construction, recoverable by MinHash/SimHash."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    twins = docs.where(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz mutated suffix token")).alias("text"),
    )
    return docs.unionByName(twins)


# ---------------------------------------------------------------------------
# Hash-checkable MinHash/SimHash: exact mode swaps xxhash64 for the
# 60-bit md5 prefix, which DuckDB reproduces with an integer hex fold
# (list_reduce below == Spark's conv(substr(md5,1,15),16,10)). With
# identical hashes, signatures, bands, candidate sets, and verify
# metrics all match bit-for-bit — the same recipe that converted the
# hyperplane-LSH and IVF queries from rows-only to fully green.
# ---------------------------------------------------------------------------
from ..operators.dedup import MERSENNE_31, _perm_constants


def _md5_60_sql(expr: str) -> str:
    """DuckDB: first 15 hex chars of md5(expr) as a 60-bit BIGINT —
    exact integer arithmetic, matches Spark's conv(). The hex-literal
    cast replaced a 15-element list_reduce fold (bit-identical,
    verified over 100k samples) after the fold's per-row list
    materialization OOM'd the in-memory oracle at sf10's ~100M-token
    explode; this form is one md5 + one concat + one cast per row."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


_PERM_VALUES = ",\n        ".join(
    f"({i},{a},{b})" for i, (a, b) in enumerate(_perm_constants(32))
)

_AUGMENTED_SQL = """
corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, text || ' zz mutated suffix token'
    FROM documents WHERE doc_id % 17 = 0
)"""

_ORACLE_MINHASH = f"""
WITH {_AUGMENTED_SQL},
toks AS (
    SELECT doc_id, string_split({NORMALIZE_SQL}, ' ') AS tk FROM corpus
),
shingle_strs AS (
    SELECT doc_id, unnest(list_distinct({ngram_list_sql("tk", 3)})) AS sh
    FROM toks
),
shingles AS (
    SELECT DISTINCT doc_id, {_md5_60_sql("sh")} % {MERSENNE_31} AS h
    FROM shingle_strs
),
perms(pid, a, b) AS (VALUES
        {_PERM_VALUES}),
mins AS (
    SELECT s.doc_id, p.pid, MIN((p.a * s.h + p.b) % {MERSENNE_31}) AS mh
    FROM shingles s CROSS JOIN perms p
    GROUP BY s.doc_id, p.pid
),
band_strs AS (
    SELECT doc_id, pid // 4 AS band,
           string_agg(CAST(mh AS VARCHAR), ',' ORDER BY pid) AS bstr
    FROM mins GROUP BY doc_id, pid // 4
),
bands AS (
    SELECT doc_id, band, {_md5_60_sql("bstr")} AS sig FROM band_strs
),
cand AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
    SELECT c.id_a, c.id_b, COUNT(*) AS ni
    FROM cand c
      JOIN shingles sa ON sa.doc_id = c.id_a
      JOIN shingles sb ON sb.doc_id = c.id_b AND sb.h = sa.h
    GROUP BY c.id_a, c.id_b
),
j AS (
    SELECT i.id_a, i.id_b, CAST(i.ni AS DOUBLE) / (na.n + nb.n - i.ni) AS jaccard
    FROM inter i
      JOIN sizes na ON na.doc_id = i.id_a
      JOIN sizes nb ON nb.doc_id = i.id_b
)
SELECT id_a, id_b, ROUND(jaccard, 4) AS jaccard_r4,
       CAST(id_b - id_a = 1000000 AS BIGINT) AS is_planted_twin
FROM j WHERE jaccard >= 0.5
ORDER BY id_a, id_b
"""


@query("q_dedup_minhash_lsh", oracle=_ORACLE_MINHASH)
def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup detection (shingle -> 32-perm signature ->
    8-band bucket join -> exact-Jaccard verify >= 0.5) on the planted
    corpus, declared in exact mode: md5-derived 60-bit hashes are
    engine-portable, so shingle hashes, permutation minima, band
    buckets, the candidate set, and the verified Jaccard all replay
    in a DuckDB oracle (no more rows-only). The xxhash64 path is the
    same operator in throughput gear (``exact=False``); recovered
    pairs are exactly the (id, id+1e6) twins either way."""
    pairs = minhash_near_dup_pairs(
        _augmented_corpus(spark, sf_dir), threshold=0.5, exact=True
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.round(F.col("jaccard"), 4).alias("jaccard_r4"),
        (F.col("id_b") - F.col("id_a") == 1000000).cast("long").alias("is_planted_twin"),
    ).orderBy("id_a", "id_b")


_ORACLE_SIMHASH = f"""
WITH {_AUGMENTED_SQL},
tokh AS (
    SELECT doc_id, {_md5_60_sql("tok")} AS h
    FROM (SELECT doc_id, unnest(string_split({NORMALIZE_SQL}, ' ')) AS tok
          FROM corpus) t
),
votes AS (
    SELECT doc_id, b.bit,
           SUM(CASE WHEN ((h >> b.bit) & 1) = 1 THEN 1 ELSE -1 END) AS v
    FROM tokh CROSS JOIN (SELECT unnest(range(0, 60)) AS bit) b
    GROUP BY doc_id, b.bit
),
sig AS (
    SELECT doc_id,
           CAST(SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
),
banded AS (
    SELECT doc_id, simhash, b.band, (simhash >> (b.band * 15)) & 32767 AS key
    FROM sig CROSS JOIN (SELECT CAST(unnest(range(0, 4)) AS INT) AS band) b
),
cand AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id, bit_count(xor(a.simhash, b.simhash))
)
SELECT id_a, id_b, hamming,
       CAST(id_b - id_a = 1000000 AS BIGINT) AS is_planted_twin
FROM cand WHERE hamming <= 6
ORDER BY id_a, id_b
"""


@query("q_dedup_simhash", oracle=_ORACLE_SIMHASH)
def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup (60-bit token-vote signature, 4 bands x 15
    bits, Hamming <= 6) on the planted corpus, declared in exact mode:
    portable md5-derived token hashes make the bit votes, packed
    signatures, band buckets, and Hamming distances identical in any
    engine — checked against a DuckDB oracle. 60-bit/15-bit-band shape
    since round 6: the 32-bit/8-bit-band original had only 256 buckets
    per band, so candidate pairs grew quadratically with the corpus
    and flooded the sf1 sweep (see operators/dedup
    .simhash_near_dup_pairs)."""
    pairs = simhash_near_dup_pairs(_augmented_corpus(spark, sf_dir), exact=True)
    return pairs.select(
        "id_a",
        "id_b",
        "hamming",
        (F.col("id_b") - F.col("id_a") == 1000000).cast("long").alias("is_planted_twin"),
    ).orderBy("id_a", "id_b")


# Salt cap for the q_ngram_jaccard pair join: splits each language's
# pair workload across up to this many tasks (lang cardinality is a
# handful, so the unsalted equi-join serializes per-language work into
# single straggler tasks at scale). The effective width comes from
# `pair_salt_width(spark)` (round-9 advisor note: a fixed 32
# replicated the build side 32x even where two cores were available);
# side B's replication factor — the pair SPACE is unchanged and the
# output is provably salt-invariant (tests/test_lpa_fixture.py pins
# the identity for the shared salting pattern).
_NGRAM_JACCARD_SALT = 32


@query(
    "q_ngram_jaccard",
    oracle="""
    WITH sample_docs AS (
        SELECT doc_id, lang,
               list_distinct(
                   regexp_extract_all(
                       TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g')),
                       '[a-z0-9]+')
               ) AS grams
        FROM documents WHERE doc_id % 20 = 0
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(LEN(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / (LEN(a.grams) + LEN(b.grams) - LEN(list_intersect(a.grams, b.grams))) AS jaccard
    FROM sample_docs a JOIN sample_docs b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(LEN(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / (LEN(a.grams) + LEN(b.grams) - LEN(list_intersect(a.grams, b.grams))) >= 0.2
    """,
)
def q_ngram_jaccard(spark, sf_dir):
    """Exact token-set Jaccard with language blocking (the verify
    stage of near-dup pipelines, oracle-checked end-to-end). Blocking
    (same lang, sampled ids) keeps the pair space linear-ish — the
    production analogue is LSH buckets as the blocking key.

    Scale (round-8 salting fix): `lang` alone has a HANDFUL of
    values, so the bare equi-join funnels each language's entire pair
    workload into ONE task (observed at sf10: a single straggler task
    holding the whole stage for 45+ minutes while 31 cores idled).
    The join key is therefore salted — side A takes a deterministic
    hash bucket of its doc_id, side B is replicated across all
    ``_NGRAM_JACCARD_SALT`` buckets — which emits every (a, b) pair
    exactly once (A's bucket is a function of a.doc_id) while
    splitting each language across SALT parallel tasks. Replication
    multiplies the (sampled, linear) build side by SALT, never the
    quadratic pair space; output and oracle are untouched."""
    docs = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 20 == 0)
        .select(
            "doc_id",
            "lang",
            F.array_distinct(
                F.regexp_extract_all(
                    F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")),
                    F.lit("[a-z0-9]+"),
                    F.lit(0),
                )
            ).alias("grams"),
        )
    )
    salt = pair_salt_width(spark, max_width=_NGRAM_JACCARD_SALT)
    a = docs.withColumn("_salt", F.pmod(F.hash("doc_id"), F.lit(salt))).alias("a")
    b = docs.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.col("a.grams")) + F.size(F.col("b.grams")) - inter
    jac = inter.cast("double") / union
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a._salt") == F.col("b._salt"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.2)
    )


@query(
    "q_incremental_dedup",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 17 = 0
    )
    SELECT MD5({NORMALIZE_SQL}) AS content_fp,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM corpus
    GROUP BY 1
    """,
)
def q_incremental_dedup(spark, sf_dir):
    """Incremental exact dedup (`operators/dedup.py::
    incremental_exact_dedup`): the planted-twin corpus arrives as
    THREE batches folded one at a time into a persisted signature
    store — novel content detected by anti-join against the store,
    store swapped atomically per batch. The oracle is the ONE-SHOT
    dedup of the whole corpus: equality proves batch-split invariance
    (no content lost, first-seen ids kept, duplicate counts summed
    across batch boundaries)."""
    import os
    import tempfile

    from ..operators.dedup import incremental_exact_dedup

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    twins = docs.where(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(twins)
    state = os.path.join(tempfile.mkdtemp(prefix="engine_incdedup_"), "store")
    store = None
    for part in range(3):
        batch = corpus.where(F.col("doc_id") % 3 == part)
        _novel, store = incremental_exact_dedup(spark, state, batch)
    return store


_SETSIM_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, string_split({NORMALIZE_SQL}, ' ') AS tk FROM documents
),
sh0 AS (
    SELECT doc_id, unnest({ngram_list_sql('tk', 5)}) AS s FROM toks
),
sh AS (
    SELECT DISTINCT doc_id, ({_md5_60_sql('s')}) % 2147483647 AS h FROM sh0
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
    FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT id_a, id_b, n_inter,
       sa.n + sb.n - n_inter AS n_union,
       CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
FROM inter JOIN sizes sa ON id_a = sa.doc_id
           JOIN sizes sb ON id_b = sb.doc_id
WHERE 2 * n_inter >= sa.n + sb.n - n_inter
"""


@query("q_setsim_join", oracle=_SETSIM_ORACLE)
def q_setsim_join(spark, sf_dir):
    """EXACT Jaccard>=1/2 near-dup join via prefix filtering
    (`operators/setsim.py` — AllPairs/PPJoin, the deterministic
    complement to probabilistic MinHash-LSH): 5-token shingle sets,
    elements ordered rarest-first globally, candidates only where
    prefixes collide, then exact intersection counts. The oracle is
    the brute-force ALL-PAIRS scan the operator provably equals —
    same pairs, same integer intersection/union, same quotient —
    so a hash match here is a completeness proof for the prefix
    filter, not just a spot check. All thresholds are integer
    arithmetic (2*inter >= union); hashes are the portable 60-bit
    md5 fold mod 2^31-1 shared with the MinHash exact gear."""
    from ..operators.dedup import token_shingles
    from ..operators.setsim import setsim_join

    docs = t(spark, sf_dir, "documents")
    sh = token_shingles(docs, "text", "doc_id", k=5, exact=True)
    return setsim_join(sh, tau_num=1, tau_den=2)


# Fuzzy-match subset: every 40th customer keeps the brute-force
# oracle quadratic-feasible at every sweep SF while the Spark side
# stays blocked (the deletion-neighborhood index is the semantics-
# preserving candidate generator at ANY scale).
_FUZZY_MOD = 40
# Default-gear document-frequency cap on the variant blocking key,
# counted over DISTINCT names: a 1-deletion variant of length L-1 can
# only be produced by names within one edit of it, so on organic data
# a variant's distinct-name df is tiny; 64 is generous headroom (the
# same stop-key discipline as q_containment_dedup's df<=64 shingle
# cap). df_cap=None is the lossless oracle gear.
_FUZZY_VARIANT_DF_CAP = 64


def fuzzy_variant_keys(names):
    """Distinct-name deletion-variant rows (name, cnt, v) — the
    blocking-key relation both the matcher and the cap diagnostic
    share."""
    n = names.groupBy("name").agg(F.count(F.lit(1)).alias("cnt"))
    return n.select(
        "name",
        "cnt",
        F.expr(
            "explode(array_distinct(transform(sequence(0, length(name)), "
            "i -> concat(substring(name, 1, i), substring(name, i + 2)))))"
        ).alias("v"),
    )


def fuzzy_cap_stats(names, df_cap=_FUZZY_VARIANT_DF_CAP):
    """Companion diagnostic for the capped gear (advisor round-8
    item): ONE row (dropped_keys, total_keys) over the variant-df
    aggregate, so adversarial/clone-heavy data that erodes the capped
    gear's completeness is DETECTABLE instead of silent. On organic
    data dropped_keys = 0; nonzero means switch to ``df_cap=None``
    (the lossless proof gear) or raise the cap. A separate tiny
    aggregate rather than an in-plan Observation because the matcher
    self-joins the capped relation — a CollectMetrics node inside a
    self-joined branch is duplicated by alias resolution and its
    metrics row is no longer well-defined."""
    key_df = fuzzy_variant_keys(names).groupBy("v").agg(
        F.count(F.lit(1)).alias("_df")
    )
    return key_df.agg(
        F.sum((F.col("_df") > df_cap).cast("long")).alias("dropped_keys"),
        F.count(F.lit(1)).alias("total_keys"),
    )


def fuzzy_match_families(names, df_cap=_FUZZY_VARIANT_DF_CAP):
    """Edit-distance-<=1 matching over a `name` column, DEDUPE-FIRST:
    collapse to distinct names with multiplicities BEFORE the FastSS
    variant explode, so a clone family of m identical strings is ONE
    row through the blocking join and its m*(m-1)/2 exact-duplicate
    pairs are arithmetic (`n_pairs`), never materialized rows — the
    same discipline as `q_entity_resolution`'s distinct-records
    collapse (queries/privacyq.py). ``df_cap`` drops variant keys
    whose distinct-name document frequency exceeds the cap (the
    bounded default gear); ``df_cap=None`` is the lossless mode.

    When the cap matters (adversarial/clone-heavy data), run
    ``fuzzy_cap_stats`` alongside — it reports how many blocking keys
    the cap dropped, making the bounded gear's losses detectable.

    Output: one row per matched name pair — (name_a, name_b, cnt_a,
    cnt_b, dist, n_pairs) where n_pairs = cnt_a*cnt_b for cross-name
    matches (dist=1) and cnt*(cnt-1)/2 for the within-family row
    (dist=0, emitted only when cnt > 1)."""
    n = names.groupBy("name").agg(F.count(F.lit(1)).alias("cnt"))
    v = fuzzy_variant_keys(names)
    if df_cap is not None:
        keep = (
            v.groupBy("v")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= df_cap)
            .select("v")
        )
        v = v.join(keep, "v")
    a, b = v.alias("a"), v.alias("b")
    cross = (
        a.join(b, (F.col("a.v") == F.col("b.v")) & (F.col("a.name") < F.col("b.name")))
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.col("a.cnt").alias("cnt_a"),
            F.col("b.cnt").alias("cnt_b"),
        )
        .distinct()
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .where(F.col("dist") <= 1)
        .withColumn("n_pairs", (F.col("cnt_a") * F.col("cnt_b")).cast("long"))
    )
    fam = n.where(F.col("cnt") > 1).select(
        F.col("name").alias("name_a"),
        F.col("name").alias("name_b"),
        F.col("cnt").alias("cnt_a"),
        F.col("cnt").alias("cnt_b"),
        F.lit(0).cast("long").alias("dist"),
        # cnt*(cnt-1) is even, so the double division is exact.
        (F.col("cnt") * (F.col("cnt") - F.lit(1)) / F.lit(2))
        .cast("long")
        .alias("n_pairs"),
    )
    return cross.unionByName(fam)


@query(
    "q_fuzzy_match_blocked",
    oracle=f"""
    WITH c AS (
        SELECT c_name AS name
        FROM customer WHERE c_custkey % {_FUZZY_MOD} = 0
    ),
    n AS (SELECT name, COUNT(*) AS cnt FROM c GROUP BY name),
    v0 AS (
        SELECT name, cnt,
               unnest(list_distinct(list_transform(
                   range(0, length(name) + 1),
                   i -> substr(name, 1, CAST(i AS INTEGER))
                        || substr(name, CAST(i AS INTEGER) + 2)
               ))) AS v
        FROM n
    ),
    keep AS (
        SELECT v FROM v0 GROUP BY v
        HAVING COUNT(*) <= {_FUZZY_VARIANT_DF_CAP}
    ),
    vv AS (SELECT v0.name, v0.cnt, v0.v FROM v0 JOIN keep USING (v)),
    cand AS (
        SELECT DISTINCT a.name AS name_a, b.name AS name_b,
               a.cnt AS cnt_a, b.cnt AS cnt_b
        FROM vv a JOIN vv b ON a.v = b.v AND a.name < b.name
    )
    SELECT name_a, name_b,
           CAST(cnt_a AS BIGINT) AS cnt_a, CAST(cnt_b AS BIGINT) AS cnt_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist,
           CAST(cnt_a * cnt_b AS BIGINT) AS n_pairs
    FROM cand WHERE levenshtein(name_a, name_b) <= 1
    UNION ALL
    SELECT name, name, CAST(cnt AS BIGINT), CAST(cnt AS BIGINT),
           CAST(0 AS BIGINT), CAST(cnt * (cnt - 1) // 2 AS BIGINT)
    FROM n WHERE cnt > 1
    """,
)
def q_fuzzy_match_blocked(spark, sf_dir):
    """Fuzzy entity matching at edit distance <= 1 via FastSS
    deletion-neighborhood blocking (Bocek et al. 2007): each name
    emits its 1-deletion variants plus itself; any two strings within
    one edit (substitution at position i -> both deletions at i agree;
    insertion/deletion -> the shorter string IS a variant of the
    longer) share a variant, so the variant equi-join is a lossless
    candidate generator and the exact `levenshtein` builtin (same DP
    in Spark and DuckDB) prunes the collisions — never an all-pairs
    comparison. The record-linkage/entity-resolution primitive next
    to the token-set (`q_setsim_join`) and n-gram (`q_ngram_jaccard`)
    matchers, at the character granularity where typos live.

    Scale (round-8 rewrite, closing the round-7 design-weak spot):
    DEDUPE-FIRST — names collapse to distinct-with-counts BEFORE the
    variant explode, so a clone family of m identical names is one
    row through the join and its m*(m-1)/2 exact-dup pairs are the
    arithmetic `n_pairs` column, never m^2 output rows; and the
    variant blocking key carries a distinct-name df cap (<=
    {_FUZZY_VARIANT_DF_CAP}, the `q_containment_dedup` stop-key
    discipline) bounding the equi-join fanout on adversarial
    near-clone floods. Output is distinct-name-pair sized — bounded
    by the name vocabulary, not the corpus row count. The oracle
    replays the identical capped blocking in DuckDB;
    `fuzzy_match_families(df_cap=None)` is the lossless gear the
    blocking-completeness tests exercise."""
    c = (
        t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % _FUZZY_MOD == 0)
        .select(F.col("c_name").alias("name"))
    )
    return fuzzy_match_families(c)


def _containment_oracle() -> str:
    from .textops import NORMALIZE_SQL, ngram_list_sql

    return f"""
    WITH toks AS (
        SELECT doc_id, string_split({NORMALIZE_SQL}, ' ') AS tk FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 2147483647 AS h
        FROM (SELECT doc_id, unnest({ngram_list_sql('tk', 5)}) AS s FROM toks)
    ),
    capped AS (SELECT h FROM sh GROUP BY h HAVING COUNT(*) <= 64),
    ss AS (SELECT sh.doc_id, sh.h FROM sh JOIN capped USING (h)),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM ss GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM ss a JOIN ss b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, inter,
           CAST(sa.sz AS BIGINT) AS size_a, CAST(sb.sz AS BIGINT) AS size_b,
           CAST(inter * 1000 // sa.sz AS BIGINT) AS cont_a_pm,
           CAST(inter * 1000 // sb.sz AS BIGINT) AS cont_b_pm
    FROM pairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE inter * 5 >= 4 * sa.sz OR inter * 5 >= 4 * sb.sz
    """


@query("q_containment_dedup", oracle=_containment_oracle())
def q_containment_dedup(spark, sf_dir):
    """Containment dedup — SUBSET detection (Broder 1997's
    containment C(A,B) = |S(A) n S(B)| / |S(A)|, the asymmetric
    complement of the Jaccard family): a short doc fully quoted
    inside a long one scores low Jaccard but high containment, so
    MinHash/SimHash miss exactly the quotation/boilerplate-inclusion
    duplicates this catches. Pairs with >= 80%% containment in either
    direction (integer cross-multiplication, per-mille reported via
    truncating DIV).

    Scale: 5-token shingles hashed to longs (shuffles move longs,
    never text); shingles with document frequency > 64 are DROPPED
    BEFORE pairing (the stop-shingle cap — bounds the equi-join
    fanout at any corpus size, the same discipline as the LSH band
    joins; sizes are computed on the capped universe so containment
    stays well-defined); candidate pairs come only from the shingle
    equi-join — no all-pairs stage anywhere."""
    from ..operators.dedup import token_shingles

    docs = t(spark, sf_dir, "documents")
    # Persist the shingle table and the capped universe (round 12):
    # without them the shingle pipeline ran once for the df-cap
    # aggregate and again under each of ss's THREE consumers
    # (sizes/a/b), every one re-running the explode + md5 + distinct
    # (16 parquet scan nodes in the sf0.1 plan; with the persists
    # documents is scanned once, during the shingle cache fill).
    # Key-sized (long, long) rows only; lifetime per the
    # similarity.py persist convention (see clear_query_caches).
    # Interleaved sf10 A/B: 43.7 -> 24.4 s min-of-4, hash-identical.
    sh = token_shingles(docs, "text", "doc_id", k=5, exact=True).persist()
    capped = sh.groupBy("_h").agg(F.count(F.lit(1)).alias("_df")).where(
        F.col("_df") <= 64
    ).select("_h")
    ss = sh.join(capped, "_h").persist()
    sizes = ss.groupBy("_id").agg(F.count(F.lit(1)).alias("sz"))
    a = ss.select(F.col("_id").alias("doc_a"), "_h")
    b = ss.select(F.col("_id").alias("doc_b"), "_h")
    pairs = (
        a.join(b, "_h")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        pairs.join(
            sizes.select(F.col("_id").alias("doc_a"), F.col("sz").alias("size_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("_id").alias("doc_b"), F.col("sz").alias("size_b")),
            "doc_b",
        )
        .where(
            (F.col("inter") * 5 >= 4 * F.col("size_a"))
            | (F.col("inter") * 5 >= 4 * F.col("size_b"))
        )
    )
    return out.select(
        "doc_a",
        "doc_b",
        "inter",
        F.col("size_a").cast("long").alias("size_a"),
        F.col("size_b").cast("long").alias("size_b"),
        F.expr("CAST(inter * 1000 DIV size_a AS BIGINT)").alias("cont_a_pm"),
        F.expr("CAST(inter * 1000 DIV size_b AS BIGINT)").alias("cont_b_pm"),
    )
