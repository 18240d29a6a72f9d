"""Catalog SQL function library (Spark 4 SQL UDFs).

``register_sql_functions(spark)`` installs the engine's shared text/hash
idioms as SQL functions, so ``table.query.sql`` users write
``kiara_tokens(text)`` instead of re-deriving the regex.  SQL UDFs are
DECLARATIVE — the body is inlined into the plan at resolution time and runs
in whole-stage codegen, unlike Python UDFs/UDTFs: a free abstraction at any
scale.

Each function's semantics match the DuckDB-oracle idioms used across
``kiara_spark/queries.py`` (same token regex, same md5-derived 32-bit hash),
so user SQL built on them stays cross-engine verifiable.

Reference parity: the closest reference seam is operation discovery over
typed per-type methods (``pretty_print__*``/``filter__*`` families); here
the reusable unit is a catalog function visible to every SQL surface.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

SQL_FUNCTIONS: dict[str, str] = {
    # shared token rule (operators/text.py::tokens_col)
    "kiara_tokens": (
        "CREATE OR REPLACE TEMPORARY FUNCTION kiara_tokens(t STRING) "
        "RETURNS ARRAY<STRING> "
        "RETURN filter(split(lower(t), '[^a-z0-9]+'), x -> x != '')"
    ),
    # portable 32-bit hash (operators/text.py::base_hash32)
    "kiara_hash32": (
        "CREATE OR REPLACE TEMPORARY FUNCTION kiara_hash32(s STRING) "
        "RETURNS BIGINT "
        "RETURN cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint)"
    ),
    # canonical normalization (operators/text.py::normalize_text)
    "kiara_normalize": (
        "CREATE OR REPLACE TEMPORARY FUNCTION kiara_normalize(t STRING) "
        "RETURNS STRING "
        "RETURN trim(regexp_replace(regexp_replace(lower(t), "
        "'[\\\\x00-\\\\x1f]', ' '), '\\\\s+', ' '))"
    ),
    # deterministic keep-rule used by the samplers (weighted/mixture)
    "kiara_keep": (
        "CREATE OR REPLACE TEMPORARY FUNCTION kiara_keep(id STRING, rate DOUBLE) "
        "RETURNS BOOLEAN "
        "RETURN (cast(conv(substring(md5(id), 1, 8), 16, 10) as bigint) % 1000000) "
        "/ 1000000.0 < rate"
    ),
    # BPE-ish token-count estimate (chars/4 upper-bounded by word tokens)
    "kiara_ntokens": (
        "CREATE OR REPLACE TEMPORARY FUNCTION kiara_ntokens(t STRING) "
        "RETURNS BIGINT "
        "RETURN cast(size(filter(split(lower(t), '[^a-z0-9]+'), x -> x != '')) "
        "as bigint)"
    ),
}


def register_sql_functions(spark: SparkSession) -> None:
    """Install the library into the session catalog (idempotent)."""
    for ddl in SQL_FUNCTIONS.values():
        spark.sql(ddl)
