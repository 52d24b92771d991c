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
    # n shifted slices zipped positionally — arrays_zip evaluates each
    # slice (and therefore the tokenization) ONCE per row. The previous
    # sequence+element_at form referenced `toks` inside the lambda,
    # which Spark re-evaluates per gram element: O(n*L^2) splits per
    # doc (the outer-reference pitfall measured on dedup_lines,
    # BASELINE.md r11). The slices are guarded by the `when`, which
    # evaluates its branch lazily, so ln < n never reaches a
    # negative-length slice.
    zipped = F.arrays_zip(
        *[
            F.slice(toks, 1 + k, ln - F.lit(n - 1)).alias(f"t{k}")
            for k in range(n)
        ]
    )
    return F.when(ln < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            zipped, lambda s: F.concat_ws("_", *[s[f"t{k}"] for k in range(n)])
        )
    )


def word_ngrams_sql(expr: str, n: int) -> str:
    # DuckDB range(a, b) is b-exclusive and empty when b <= a, so no
    # short-doc guard is needed; list indexing is 1-based like element_at.
    toks = tokens_sql(expr)
    parts = " || '_' || ".join(f"({toks})[i + {k}]" for k in range(n))
    return f"list_transform(range(1, len({toks}) - {n - 1} + 1), i -> {parts})"
