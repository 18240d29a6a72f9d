"""Python UDTF surface (Spark 4 user-defined table functions).

The reference's module contract is arbitrary Python producing new values
(``/root/reference/src/kiara/modules/__init__.py:523-559``); for ROW-level
1->N expansion the Spark-4-native equivalent is a Python UDTF registered in
the SQL catalog and invoked via LATERAL — the table-function twin of the
scalar pandas-UDF path.

Performance position (deliberate): UDTFs run Python per input row, so the
engine's production chunker stays the pure-expression
``text.chunk_documents`` (sequence+posexplode+substring, whole-stage
codegen); these UDTFs are the EXTENSIBILITY seam — users drop in arbitrary
Python expansions without touching engine code — and each ships with the
same DuckDB-oracle verification as built-ins, so a swapped-in Python
implementation is still hash-checked against declarative semantics.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string")
class ChunkText:
    """Fixed-size character chunks: chunk_text(text, size)."""

    def eval(self, text: str, size: int):
        if text is None or size is None or size <= 0:
            return
        for i in range(0, len(text), size):
            yield i // size, text[i:i + size]


@udtf(returnType="pos int, ngram string")
class WordNgrams:
    """Word n-grams over the engine's shared token rule:
    word_ngrams(text, n) — lowercase, [^a-z0-9]+ separators."""

    def eval(self, text: str, n: int):
        import re

        if text is None or n is None or n <= 0:
            return
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        for i in range(len(toks) - n + 1):
            yield i, " ".join(toks[i:i + n])


UDTFS = {"chunk_text": ChunkText, "word_ngrams": WordNgrams}


def register_builtin_udtfs(spark: SparkSession) -> None:
    """Install the UDTF catalog entries for SQL LATERAL use (idempotent)."""
    for name, cls in UDTFS.items():
        spark.udtf.register(name, cls)
