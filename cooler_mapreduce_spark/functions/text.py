"""Text tokenization as Catalyst expressions.

Reproduces the reference word-count normalization (reference
shared/samples/word_count.py:19-24): lowercase, strip the punctuation set
``.,!?;:"'-``, split on whitespace, drop empties — but as JVM-side Column
expressions over a text column instead of per-record Python. At 100 TB the
tokenize → explode → count pipeline is a single map stage + one shuffle
with map-side partial aggregation (the reference's designed-but-never-wired
combiner, reference design.md:197-245, for free).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: The reference's exact punctuation-strip set (word_count.py:19-24).
PUNCT_CLASS = "[.,!?;:\"'-]"


def tokens(text: str | Column) -> Column:
    """Raw whitespace tokens of ``text`` (array<string>, may hold empties)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(c), r"\s+")


def word_tokens(text: str | Column) -> Column:
    """Normalized word tokens: lowercased, punctuation-stripped, non-empty."""
    stripped = F.transform(tokens(text), lambda t: F.regexp_replace(t, PUNCT_CLASS, ""))
    return F.filter(stripped, lambda t: F.length(t) > 0)


#: DuckDB fragment equivalent to one normalized token stream; keep in sync
#: with word_tokens(). Usage: f"SELECT {SQL_WORD_TOKENS.format(col='text')} ..."
SQL_WORD_TOKENS = (
    "list_filter("
    "list_transform(string_split_regex(lower({col}), '\\s+'),"
    " t -> regexp_replace(t, '[.,!?;:\"''-]', '', 'g')),"
    " t -> length(t) > 0)"
)
