"""Text-analysis operators (SURVEY.md §2 D26 + north-star text ops):
quality stats, language-ID heuristic, token counting, fingerprinting.

No reference analog; LLM-data-pipeline surface. Everything is built-in
column math over the whitespace token array — no UDFs, so the hot path
stays in whole-stage codegen at 100 TB. MLlib's Tokenizer/NGram/
HashingTF cover the same ground pipeline-style (see tests).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.hashing import MOD, poly_hash, poly_hash_sql
from ..functions.text import STOPWORDS, tokens, tokens_sql
from ..plans.registry import register
from ._util import t

# Marker stopwords per language for the n-gram/stopword-overlap
# language-ID heuristic (fixture text is synthetic English-ish; the
# operator is the real thing, the fixture just exercises it).
LANG_MARKERS = {
    "de": ("der", "und", "die", "das"),
    "en": ("the", "and", "of", "a"),
    "es": ("el", "los", "y", "que"),
    "fr": ("le", "la", "et", "de"),
    "zh": ("的", "了", "是"),
}

FP_WINDOW = 8


def _stoplist_sql(words) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


@register(
    "text_quality_stats",
    oracle=f"""
WITH tk AS (SELECT doc_id, lang, {tokens_sql('text')} AS toks FROM documents)
SELECT doc_id, lang,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique,
  round(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(toks, s -> CAST(length(s) AS BIGINT))), (a, x) -> a + x) AS DOUBLE)
        / len(toks), 6) AS avg_token_len,
  round(CAST(len(list_filter(toks, s -> s IN {_stoplist_sql(STOPWORDS)})) AS DOUBLE)
        / len(toks), 6) AS stopword_ratio,
  round(0.5 * CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
        + 0.5 * (1.0 - CAST(len(list_filter(toks, s -> s IN {_stoplist_sql(STOPWORDS)})) AS DOUBLE) / len(toks)), 6) AS quality_score
FROM tk WHERE len(toks) > 0
""",
    tags=("D26",),
    doc="Per-document quality scoring: token/unique counts, mean token "
    "length, stopword ratio, and a composite quality score — the standard "
    "pre-training corpus filters, all as codegen'd array expressions.",
)
def text_quality_stats(spark, sf_dir):
    tk = t(spark, sf_dir, "documents").select("doc_id", "lang", tokens(F.col("text")).alias("toks"))
    tk = tk.where(F.size("toks") > 0)
    n = F.size("toks").cast("long")
    n_uniq = F.size(F.array_distinct("toks")).cast("long")
    sum_len = F.aggregate(
        F.transform(F.col("toks"), lambda s: F.length(s).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    n_stop = F.size(F.filter(F.col("toks"), lambda s: s.isin(*STOPWORDS)))
    stop_ratio = n_stop.cast("double") / n
    return tk.select(
        "doc_id",
        "lang",
        n.alias("n_tokens"),
        n_uniq.alias("n_unique"),
        F.round(sum_len.cast("double") / n, 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(0.5 * n_uniq.cast("double") / n + 0.5 * (F.lit(1.0) - stop_ratio), 6).alias(
            "quality_score"
        ),
    )


_LANGS = sorted(LANG_MARKERS)


@register(
    "text_lang_id",
    oracle=f"""
WITH tk AS (SELECT doc_id, lang, {tokens_sql('text')} AS toks FROM documents),
sc AS (
  SELECT doc_id, lang,
    {', '.join(f"len(list_filter(toks, s -> s IN {_stoplist_sql(LANG_MARKERS[lg])})) AS c_{lg}" for lg in _LANGS)}
  FROM tk
)
SELECT doc_id, lang AS actual_lang,
  CASE WHEN greatest({', '.join('c_' + lg for lg in _LANGS)}) = 0 THEN 'und'
       {' '.join(f"WHEN c_{lg} = greatest({', '.join('c_' + l2 for l2 in _LANGS)}) THEN '{lg}'" for lg in _LANGS)}
  END AS guessed_lang
FROM sc
""",
    tags=("D26",),
    doc="Language-ID heuristic: marker-stopword overlap per language, "
    "argmax with deterministic alphabetical tie-break, 'und' when no "
    "marker hits. (Real corpora swap in per-language frequency tables; "
    "the operator shape — score columns + argmax — is the same.)",
)
def text_lang_id(spark, sf_dir):
    tk = t(spark, sf_dir, "documents").select("doc_id", "lang", tokens(F.col("text")).alias("toks"))
    sc = tk.select(
        "doc_id",
        "lang",
        *[
            F.size(F.filter(F.col("toks"), _in_list(LANG_MARKERS[lg]))).alias(f"c_{lg}")
            for lg in _LANGS
        ],
    )
    best = F.greatest(*[F.col(f"c_{lg}") for lg in _LANGS])
    guess = F.when(best == 0, F.lit("und"))
    for lg in _LANGS:  # alphabetical order = deterministic tie-break
        guess = guess.when(F.col(f"c_{lg}") == best, F.lit(lg))
    return sc.select("doc_id", F.col("lang").alias("actual_lang"), guess.alias("guessed_lang"))


def _in_list(words):
    return lambda s: s.isin(*words)


@register(
    "text_token_counts",
    oracle=r"""
SELECT doc_id,
  CAST(len(list_filter(string_split(text, ' '), s -> s <> '')) AS BIGINT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_bpe_tokens,
  CAST(length(text) AS BIGINT) AS n_chars_measured,
  n_chars
FROM documents
""",
    tags=("D26",),
    doc="Token counting: whitespace tokens vs a BPE-ish regex segmentation "
    "([a-z]+|[0-9]+ runs) plus character counts cross-checked against the "
    "fixture's n_chars column.",
)
def text_token_counts(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+"), 0)).cast("long").alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
        "n_chars",
    )


@register(
    "text_doc_fingerprint",
    oracle=f"""
WITH pos AS (
  SELECT doc_id, unnest({tokens_sql('text')}) AS tok,
         generate_subscripts({tokens_sql('text')}, 1) - 1 AS p
  FROM documents
),
chunks AS (
  SELECT doc_id, p // {FP_WINDOW} AS chunk,
         CAST(sum({poly_hash_sql('tok', 97)} * CAST(power(31, p % {FP_WINDOW}) AS BIGINT)) % {MOD} AS BIGINT) AS chunk_hash
  FROM pos GROUP BY doc_id, p // {FP_WINDOW}
),
fp AS (SELECT doc_id, min(chunk_hash) AS fingerprint FROM chunks GROUP BY doc_id)
SELECT fp.doc_id, fp.fingerprint, {poly_hash_sql('d.text', 1)} AS full_hash
FROM fp JOIN documents d ON d.doc_id = fp.doc_id
""",
    tags=("D26", "D23"),
    doc="Document fingerprinting: position-weighted rolling hash per "
    "8-token chunk, doc fingerprint = min chunk hash (winnowing-style "
    "selection), plus a full-text polynomial hash. Content-defined "
    "signatures for shift-tolerant dedup.",
)
def text_doc_fingerprint(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    pos = d.select("doc_id", F.posexplode(tokens(F.col("text"))).alias("p", "tok"))
    chunks = (
        pos.select(
            "doc_id",
            F.expr(f"p div {FP_WINDOW}").alias("chunk"),
            (F.col("p") % FP_WINDOW).alias("m"),
            poly_hash(F.col("tok"), 97).alias("h"),
        )
        .groupBy("doc_id", "chunk")
        .agg((F.sum(F.col("h") * F.pow(F.lit(31.0), F.col("m")).cast("long")) % MOD).alias("chunk_hash"))
    )
    fp = chunks.groupBy("doc_id").agg(F.min("chunk_hash").alias("fingerprint"))
    full = d.select("doc_id", poly_hash(F.col("text"), 1).alias("full_hash"))
    return fp.join(full, "doc_id")
