"""Inline lexicons shared verbatim between Spark queries and oracle SQL
(FIXTURES.md "Additional inline fixtures"): defined once here, rendered as
Python literals for the DataFrame side and VALUES CTEs for the DuckDB side so
the two can never drift.

Terms are drawn from the documents table's measured 31-token vocabulary so
the operators exercise real rows.
"""

from __future__ import annotations

STOPWORDS: tuple[str, ...] = ("a", "the", "of", "and", "to", "in", "is", "it")

# (term, score) — sentiment polarity over the corpus vocabulary.
SENTIMENT_LEXICON: tuple[tuple[str, float], ...] = (
    ("fast", 1.0),
    ("slow", -1.0),
    ("big", 0.3),
    ("small", -0.2),
    ("dup", -0.5),
    ("merge", 0.2),
    ("spark", 0.6),
    ("vector", 0.4),
    ("hash", 0.1),
    ("scan", -0.1),
    ("sort", 0.2),
    ("stream", 0.3),
    ("batch", -0.3),
    ("filter", 0.1),
    ("join", 0.2),
)


def stopwords_sql_values() -> str:
    """VALUES list for a DuckDB CTE: stopwords(term)."""
    return ", ".join(f"('{w}')" for w in STOPWORDS)


def sentiment_sql_values() -> str:
    """VALUES list for a DuckDB CTE: lexicon(term, score) — scores cast to
    DOUBLE (DuckDB types bare decimal literals as DECIMAL)."""
    return ", ".join(f"('{t}', CAST({s} AS DOUBLE))" for t, s in SENTIMENT_LEXICON)
