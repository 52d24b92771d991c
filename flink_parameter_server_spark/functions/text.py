"""Text primitives shared by dedup / sketch / text-analysis operators.

Tokenization is whitespace split (the fixture ``documents.text`` is
space-separated lowercase words — FIXTURES.md); shingles are word
n-grams joined with a separator so the polynomial hash sees one string.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small fixed stopword list used by quality scoring / language-id.
STOPWORDS = ("the", "and", "of", "a", "to", "in")


def tokens(col: Column) -> Column:
    """Whitespace tokens, empties dropped."""
    return F.filter(F.split(col, " "), lambda t: t != F.lit(""))


def tokens_sql(expr: str) -> str:
    return f"list_filter(string_split({expr}, ' '), t -> t <> '')"


def word_ngrams(col: Column, n: int) -> Column:
    """Word n-gram shingles as strings: tokens joined by '_'.

    Built from the token array with sequence+transform (no UDF);
    returns array<string> of length max(len-n+1, 0).
    """
    toks = tokens(col)
    ln = F.size(toks)
    return F.when(ln < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), ln - F.lit(n - 1)),
            lambda i: F.concat_ws(
                "_", *[F.element_at(toks, (i + k).cast("int")) for k in range(n)]
            ),
        )
    )


def word_ngrams_sql(expr: str, n: int) -> str:
    # DuckDB range(a, b) is b-exclusive and empty when b <= a, so no
    # short-doc guard is needed; list indexing is 1-based like element_at.
    toks = tokens_sql(expr)
    parts = " || '_' || ".join(f"({toks})[i + {k}]" for k in range(n))
    return f"list_transform(range(1, len({toks}) - {n - 1} + 1), i -> {parts})"
