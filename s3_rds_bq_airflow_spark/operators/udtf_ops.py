"""Python UDTF surface (table-valued functions).

Completes the user-extensibility trio: scalar (pandas UDF), grouped
aggregate (applyInPandas), and TABLE-valued (this module). Policy
reminder: a UDTF's ``eval`` is per-row Python — anything expressible
as ``explode`` of a column expression (including this demo's sentence
split) should stay JVM-side; the UDTF exists for generators that need
real Python per row (external tokenizers, parsers, model calls).
``useArrow=True`` keeps the exchange on the Arrow batch path
(ArrowEvalPythonUDTF — the catalog-wide plan audit rejects the
pickled BatchEvalPython operators). The test pins the demo against
its JVM-expression equivalent.
"""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


@udtf(
    returnType="sentence_idx: int, sentence: string, n_tokens: int",
    useArrow=True,
)
class SentenceSplit:
    """Emit one row per sentence of ``text`` ('.'-delimited here —
    a real implementation would call a proper splitter)."""

    def eval(self, text: str):
        if text is None:
            return
        idx = 0
        for raw in text.split("."):
            s = raw.strip()
            if s:
                yield idx, s, len(s.split())
                idx += 1


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL (lateral-join style:
    ``SELECT d.doc_id, s.* FROM docs d, SentenceSplit(d.text) s``)."""
    spark.udtf.register("sentence_split", SentenceSplit)


__all__ = ["SentenceSplit", "register_udtfs", "lit"]
