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
               LENGTH(text) - LENGTH(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS n_alpha,
               LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
               LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS n_space,
               LENGTH(text) - LENGTH(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
               LEN(string_split_regex(TRIM(text), '\\s+')) AS n_tokens
        FROM documents
    )
    SELECT doc_id,
           CAST(n_alpha AS DOUBLE) / n AS alpha_ratio,
           CAST(n_digit AS DOUBLE) / n AS digit_ratio,
           CAST(n_space AS DOUBLE) / n AS space_ratio,
           CAST(n_punct AS DOUBLE) / n AS punct_ratio,
           CAST(n_alpha AS DOUBLE) / n
             - CAST(n_punct AS DOUBLE) / n
             - CAST(n_digit AS DOUBLE) / n AS quality_score,
           CAST(CAST(n AS DOUBLE) / n_tokens >= 3.0 AS BIGINT) AS len_ok
    FROM m
    """,
)
def q_text_quality(spark, sf_dir):
    """Quality scoring: character-class ratios + a composite score —
    the standard cheap pre-filter for LLM training corpora."""
    text = F.col("text")
    n = F.length(text)

    def n_class(pattern: str):
        return n - F.length(F.regexp_replace(text, pattern, ""))

    n_alpha = n_class("[a-zA-Z]")
    n_digit = n_class("[0-9]")
    n_space = n - F.length(F.replace(text, F.lit(" "), F.lit("")))
    n_punct = n_class("[.,;:!?]")
    n_tokens = F.size(F.split(F.trim(text), r"\s+"))
    alpha_ratio = n_alpha.cast("double") / n
    digit_ratio = n_digit.cast("double") / n
    punct_ratio = n_punct.cast("double") / n
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        alpha_ratio.alias("alpha_ratio"),
        digit_ratio.alias("digit_ratio"),
        (n_space.cast("double") / n).alias("space_ratio"),
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
