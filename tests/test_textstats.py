"""PII / contamination signal columns of text_profile (D26, r5).

The driver fixture's synthetic text contains no emails, URLs, or
digits, so the oracle only proves the zero path; these rows exercise
the counting itself with known expected values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_parameter_server_spark.operators.textstats import EMAIL_RE, URL_RE


def _signals(spark, text):
    row = (
        spark.createDataFrame([(text,)], "text string")
        .select(
            F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), 0)).alias("n_emails"),
            F.size(F.regexp_extract_all("text", F.lit(URL_RE), 0)).alias("n_urls"),
            F.when(
                F.length("text") > 0,
                F.round(
                    F.size(F.regexp_extract_all("text", F.lit("[0-9]"), 0)).cast("double")
                    / F.length("text"),
                    6,
                ),
            ).alias("digit_ratio"),
        )
        .collect()[0]
    )
    return row["n_emails"], row["n_urls"], row["digit_ratio"]


def test_pii_signals_count_real_hits(spark):
    text = (
        "contact a.user+tag@example-site.org or b@x.co, docs at "
        "https://docs.example.com/a?b=1 and http://t.co/xyz — call 555 0142"
    )
    n_emails, n_urls, digit_ratio = _signals(spark, text)
    assert n_emails == 2
    assert n_urls == 2
    assert digit_ratio == round(8 / len(text), 6)  # 555 0142 + b=1 digit


def test_pii_signals_zero_on_clean_text(spark):
    assert _signals(spark, "plain words only here") == (0, 0, 0.0)


def test_pii_signals_match_duckdb(spark, duck):
    """Engine parity on a text that actually hits the patterns — the
    same expressions the text_profile oracle uses."""
    text = "x@y.io and https://z.dev/p 42%"
    n_emails, n_urls, digit_ratio = _signals(spark, text)
    got = duck.execute(
        f"""
        SELECT CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT),
               CAST(len(regexp_extract_all(t, '{URL_RE}')) AS BIGINT),
               round(CAST(len(regexp_extract_all(t, '[0-9]')) AS DOUBLE) / length(t), 6)
        FROM (SELECT '{text}' AS t)
        """
    ).fetchone()
    assert (n_emails, n_urls, digit_ratio) == got


def test_bpe_merge_vocab_classic_example(spark, tmp_path):
    """The r8 BPE trainer on the textbook corpus ('low' x5 + 'lower' x2
    + 'newest' x6) must reproduce a driver-side reference BPE
    implementation (Sennrich-style: most frequent adjacent pair,
    leftmost-scan merge, lexicographic tie-break) merge for merge."""
    import glob
    import shutil

    from flink_parameter_server_spark.operators.retrieval import bpe_merge_vocab
    from flink_parameter_server_spark.sources import TABLES
    from tests.conftest import SF_SMALL

    out = str(tmp_path / "bpe_corpus")
    import os

    os.makedirs(out)
    for tab in TABLES:
        if tab != "documents":
            shutil.copy(f"{SF_SMALL}/{tab}.parquet", f"{out}/{tab}.parquet")
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6)
    docs = spark.createDataFrame(
        [(1, text, "en", "web", len(text))],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    docs.coalesce(1).write.parquet(f"{out}/_tmp")
    [part] = glob.glob(f"{out}/_tmp/part-*.parquet")
    shutil.move(part, f"{out}/documents.parquet")
    shutil.rmtree(f"{out}/_tmp")

    # reference BPE on the same corpus
    vocab = {"low": 5, "lower": 2, "newest": 6}
    state = {w: list(w) for w in vocab}
    want = []
    for rank in range(1, 5):
        counts = {}
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                pr = (syms[i], syms[i + 1])
                counts[pr] = counts.get(pr, 0) + vocab[w]
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((rank, a, b, a + b, cnt))
        for w, syms in state.items():
            i, outsyms = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    outsyms.append(a + b)
                    i += 2
                else:
                    outsyms.append(syms[i])
                    i += 1
            state[w] = outsyms

    got = [
        (r["rank"], r["a"], r["b"], r["merged"], r["cnt"])
        for r in bpe_merge_vocab(spark, out, n_merges=4).collect()
    ]
    assert got == want, (got, want)


def test_bpe_apply_matches_reference_tokenization(spark):
    """bpe_apply (the serving half) must segment words exactly as the
    reference leftmost-scan merge application does, including merged
    symbols composing across ranks and unseen words passing through as
    characters."""
    from pyspark.sql import functions as F

    from flink_parameter_server_spark.operators.retrieval import bpe_apply

    merges = [("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t")]

    def ref(word):
        syms = list(word)
        for a, b in merges:
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    words = ["low", "lower", "newest", "lowest", "slow", "zzz", "t"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: (list(r["subwords"]), r["n_subwords"])
        for r in bpe_apply(df, merges).collect()
    }
    for w in words:
        assert got[w] == (ref(w), len(ref(w))), (w, got[w], ref(w))


def test_bpe_apply_large_vocab_no_forced_broadcast(spark):
    """VERDICT r8 #2: the serving join-back must not force the vocab
    side into a broadcast — the distinct-word table is corpus-dependent
    (multi-million rows at 100 TB). With the broadcast threshold off
    (simulating a vocab above it), the plan must be a shuffled equi-join
    on `word` (no BNLJ, no forced BroadcastHashJoin) and segmentations
    stay exact."""
    from pyspark.sql import functions as F

    from flink_parameter_server_spark.operators.retrieval import bpe_apply

    merges = [("l", "o"), ("lo", "w")]
    words = spark.range(20000).select(
        F.concat(F.lit("low"), F.col("id").cast("string")).alias("word")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        res = bpe_apply(words, merges)
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, plan[:3000]
        assert "BroadcastHashJoin" not in plan, plan[:3000]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:3000]
        got = {
            r["word"]: list(r["subwords"])
            for r in res.where(F.col("word") == "low7").collect()
        }
        assert got == {"low7": ["low", "7"]}
        assert res.count() == 20000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_lm_xent_separates_outliers(spark, tmp_path):
    """The r8 bigram-LM signal: on a corpus of same-domain docs plus one
    gibberish outlier, the outlier must carry the highest lm_xent (the
    CCNet perplexity-filtering property), in-domain docs cluster low,
    and a 1-token doc gets NULL (no bigrams)."""
    import glob
    import os
    import shutil

    from flink_parameter_server_spark.plans import REGISTRY
    from flink_parameter_server_spark.sources import TABLES
    from tests.conftest import SF_SMALL

    out = str(tmp_path / "lm_corpus")
    os.makedirs(out)
    for tab in TABLES:
        if tab != "documents":
            shutil.copy(f"{SF_SMALL}/{tab}.parquet", f"{out}/{tab}.parquet")
    domain = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (i, domain + f" round{i % 3}", "en", "web") for i in range(1, 9)
    ] + [
        (9, "zxq vbn wklm qprt zxcv bnma qwer tyui asdf ghjk", "en", "web"),
        (10, "solo", "en", "web"),
    ]
    import pandas as pd

    pdf = pd.DataFrame(docs, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    spark.createDataFrame(pdf).coalesce(1).write.parquet(f"{out}/_tmp")
    [part] = glob.glob(f"{out}/_tmp/part-*.parquet")
    shutil.move(part, f"{out}/documents.parquet")
    shutil.rmtree(f"{out}/_tmp")

    got = {
        r["doc_id"]: r["lm_xent"]
        for r in REGISTRY["text_profile"].fn(spark, out).collect()
    }
    assert got[10] is None
    xents = {k: v for k, v in got.items() if v is not None}
    assert max(xents, key=xents.get) == 9, xents
    # in-domain docs sit well below the outlier
    assert all(v < xents[9] * 0.8 for k, v in xents.items() if k != 9), xents
