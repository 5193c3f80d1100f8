"""Column-name / table-name sanitization (reference operator P1).

The reference repeats this semantic in three places (CSV->RDS loader
``bec-aws-bq/s3-to-rds.py:147-157``, the upload UI
``hf-csv-s3/app.py:136-141``, and the warehouse loader
``target_bigquery/core.py:1104-1133``). Here it is one pure function
applied at the schema level — a zero-cost rename projection in Spark
(no data movement, collapsed into the scan by Catalyst).
"""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import DataFrame

_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])")
_NON_ALNUM_RE = re.compile(r"[^0-9a-zA-Z]+")


def clean_column_name(name: str, *, snake_case: bool = True) -> str:
    """Normalize a raw header into a safe column identifier.

    Semantics (parity with reference `s3-to-rds.py:147-157` and
    `target_bigquery/core.py:1104-1133`): strip BOM/quotes/whitespace,
    camelCase -> snake_case, non-alphanumerics -> ``_``, collapse and
    strip leading/trailing ``_``, lower-case, prefix ``col_`` when the
    result starts with a digit, fall back to ``col`` when empty.
    """
    s = unicodedata.normalize("NFKC", name)
    s = s.lstrip("﻿").strip().strip("\"'")
    if snake_case:
        s = _CAMEL_RE.sub("_", s)
    s = _NON_ALNUM_RE.sub("_", s)
    s = re.sub(r"_+", "_", s).strip("_")
    s = s.lower()
    if not s:
        return "col"
    if s[0].isdigit():
        s = f"col_{s}"
    return s


def dedupe_names(names: list[str]) -> list[str]:
    """Disambiguate duplicate sanitized names with ``_2``, ``_3``, …

    (Reference: ``target_bigquery/core.py:736-744`` appends numeric
    suffixes when two raw headers sanitize to the same identifier.)
    """
    seen: dict[str, int] = {}
    out: list[str] = []
    for n in names:
        if n in seen:
            seen[n] += 1
            out.append(f"{n}_{seen[n]}")
        else:
            seen[n] = 1
            out.append(n)
    return out


def sanitize_columns(df: DataFrame, *, snake_case: bool = True) -> DataFrame:
    """Rename every column through :func:`clean_column_name`."""
    cleaned = dedupe_names([clean_column_name(c, snake_case=snake_case) for c in df.columns])
    return df.toDF(*cleaned)


def derive_table_name(filename: str) -> str:
    """File name -> table name (reference ``s3-to-rds.py:287-289``):
    basename minus extension, lower, ``-``->``_``, other
    non-alphanumerics stripped."""
    base = filename.rsplit("/", 1)[-1]
    stem = base.rsplit(".", 1)[0] if "." in base else base
    stem = stem.lower().replace("-", "_")
    return re.sub(r"[^0-9a-z_]", "", stem) or "table"
