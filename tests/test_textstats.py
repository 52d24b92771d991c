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


BPE_VOCAB = {"low": 5, "lower": 2, "newest": 6}


def _mk_text_corpus(spark, tmp_path, text):
    """A minimal sf-dir whose documents table is one doc holding
    ``text`` (other tables copied from the fixture)."""
    import glob
    import os
    import shutil

    from flink_parameter_server_spark.sources import TABLES
    from tests.conftest import SF_SMALL

    out = str(tmp_path / "bpe_corpus")
    os.makedirs(out)
    for tab in TABLES:
        if tab != "documents":
            shutil.copy(f"{SF_SMALL}/{tab}.parquet", f"{out}/{tab}.parquet")
    docs = spark.createDataFrame(
        [(1, text, "en", "web", len(text))],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    docs.coalesce(1).write.parquet(f"{out}/_tmp")
    [part] = glob.glob(f"{out}/_tmp/part-*.parquet")
    shutil.move(part, f"{out}/documents.parquet")
    shutil.rmtree(f"{out}/_tmp")
    return out


def _mk_docs_corpus(spark, tmp_path, rows, name="docs_corpus"):
    """A minimal sf-dir whose documents table is ``rows`` of
    (doc_id, text) (other tables copied from the fixture)."""
    import glob
    import os
    import shutil

    from flink_parameter_server_spark.sources import TABLES
    from tests.conftest import SF_SMALL

    out = str(tmp_path / name)
    os.makedirs(out)
    for tab in TABLES:
        if tab != "documents":
            shutil.copy(f"{SF_SMALL}/{tab}.parquet", f"{out}/{tab}.parquet")
    docs = spark.createDataFrame(
        [(i, s, "en", "web", len(s)) for i, s in rows],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    docs.coalesce(1).write.parquet(f"{out}/_tmp")
    [part] = glob.glob(f"{out}/_tmp/part-*.parquet")
    shutil.move(part, f"{out}/documents.parquet")
    shutil.rmtree(f"{out}/_tmp")
    return out


def test_eval_overlap_frac_measures_verbatim_span_mass(spark, tmp_path):
    """r9 eval-contamination signal: a doc embedding a verbatim
    CONTAM_N-token span of an eval-holdout doc scores exactly the
    fraction of its distinct 13-grams inside that span; clean docs
    score 0; sub-13-token docs are NULL; eval docs score 1.0 on their
    own grams. doc_id=13 satisfies is_eval_holdout (int_hash(13,5,77)
    % 13 == 0 — verified), the others do not."""
    from flink_parameter_server_spark.operators.curate import is_eval_holdout
    from flink_parameter_server_spark.plans import REGISTRY
    from pyspark.sql import functions as F

    ev_toks = [f"ev{i}" for i in range(30)]
    rows = [
        (13, " ".join(ev_toks)),                                 # eval doc
        (1, " ".join(ev_toks[:13] + [f"fresh{i}" for i in range(13)])),
        (2, " ".join(f"clean{i}" for i in range(20))),           # no overlap
        (3, " ".join(f"tiny{i}" for i in range(12))),            # < CONTAM_N
    ]
    # sanity: exactly doc 13 is in the holdout
    flags = {
        r["doc_id"]: r["e"]
        for r in spark.createDataFrame([(i,) for i, _ in rows], "doc_id long")
        .select("doc_id", is_eval_holdout().alias("e"))
        .collect()
    }
    assert flags == {13: True, 1: False, 2: False, 3: False}

    out = _mk_docs_corpus(spark, tmp_path, rows)
    got = {
        r["doc_id"]: r["eval_overlap_frac"]
        for r in REGISTRY["text_profile"].fn(spark, out).collect()
    }
    assert got[13] == 1.0
    # doc 1: 26 tokens -> 14 grams, exactly ONE lies fully inside the
    # copied 13-token span
    assert got[1] == round(1 / 14, 6)
    assert got[2] == 0.0
    assert got[3] is None


def test_eval_overlap_frac_fixture_direction(spark):
    """On the real fixture every eval-holdout doc with >= 13 tokens
    scores exactly 1.0 (its grams ARE the eval set) and the non-eval
    mean sits far below — the signal discriminates."""
    from flink_parameter_server_spark.operators.curate import is_eval_holdout
    from flink_parameter_server_spark.plans import REGISTRY
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMALL

    prof = REGISTRY["text_profile"].fn(spark, SF_SMALL)
    stats = (
        prof.groupBy(is_eval_holdout().alias("e"))
        .agg(
            F.min("eval_overlap_frac").alias("mn"),
            F.avg("eval_overlap_frac").alias("mean"),
        )
        .collect()
    )
    by = {r["e"]: r for r in stats}
    assert by[True]["mn"] == 1.0
    assert by[False]["mean"] < 0.05


def _ref_merge_word(syms, a, b):
    """Leftmost-scan application of one merge to a symbol list."""
    i, out = 0, []
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_bpe(vocab, n_merges):
    """Driver-side reference rank-sequential BPE (Sennrich-style:
    most frequent adjacent pair, leftmost-scan merge, lexicographic
    tie-break)."""
    state = {w: list(w) for w in vocab}
    want = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                pr = (syms[i], syms[i + 1])
                counts[pr] = counts.get(pr, 0) + vocab[w]
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((rank, a, b, a + b, cnt))
        for w in state:
            state[w] = _ref_merge_word(state[w], a, b)
    return want


def _ref_bpe_batched(vocab, n_merges, batch_m, guard_produced=True):
    """Driver-side reference of the BATCHED semantics: per round count
    once, take the top C=(4m, floor 16) candidates by (cnt desc, a, b),
    greedily select up to m NON-INTERACTING pairs (no shared symbol,
    and no symbol equal to an earlier selection's merged output — r9
    review), apply them all; pair exhaustion NULL-pads remaining ranks.
    ``guard_produced=False`` reproduces the pre-fix (flawed) selection
    for the divergence pin."""
    state = {w: list(w) for w in vocab}
    merges = []
    cand_n = max(4 * batch_m, 16)
    while len(merges) < n_merges:
        counts = {}
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                pr = (syms[i], syms[i + 1])
                counts[pr] = counts.get(pr, 0) + vocab[w]
        cand = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:cand_n]
        used, chosen = set(), []
        room = min(batch_m, n_merges - len(merges))
        for (a, b), cnt in cand:
            if len(chosen) >= room:
                break
            if a in used or b in used:
                continue
            used.update((a, b, a + b) if guard_produced else (a, b))
            chosen.append((a, b, cnt))
        if not chosen:
            merges.extend(
                (j, None, None, None, None)
                for j in range(len(merges) + 1, n_merges + 1)
            )
            break
        for a, b, cnt in chosen:
            merges.append((len(merges) + 1, a, b, a + b, cnt))
            for w in state:
                state[w] = _ref_merge_word(state[w], a, b)
    return merges


def test_bpe_merge_vocab_classic_example(spark, tmp_path):
    """The r8 BPE trainer on the textbook corpus ('low' x5 + 'lower' x2
    + 'newest' x6) must reproduce a driver-side reference BPE
    implementation merge for merge."""
    from flink_parameter_server_spark.operators.retrieval import bpe_merge_vocab

    out = _mk_text_corpus(
        spark, tmp_path, " ".join(w for w, n in BPE_VOCAB.items() for _ in range(n))
    )
    got = [
        (r["rank"], r["a"], r["b"], r["merged"], r["cnt"])
        for r in bpe_merge_vocab(spark, out, n_merges=4).collect()
    ]
    assert got == _ref_bpe(BPE_VOCAB, 4), got


def test_bpe_batched_m1_is_exactly_sequential(spark, tmp_path):
    """VERDICT r8 #3: batch_m=1 degrades the batched trainer to the
    rank-sequential one EXACTLY (same merges, same counts, same
    ranks)."""
    from flink_parameter_server_spark.operators.retrieval import (
        bpe_merge_vocab,
        bpe_merge_vocab_batched,
    )

    out = _mk_text_corpus(
        spark, tmp_path, " ".join(w for w, n in BPE_VOCAB.items() for _ in range(n))
    )
    seq = [tuple(r) for r in bpe_merge_vocab(spark, out, n_merges=6).collect()]
    bat = [tuple(r) for r in bpe_merge_vocab_batched(spark, out, n_merges=6, batch_m=1).collect()]
    assert bat == seq and len(seq) == 6


def test_bpe_batched_matches_reference_and_documents_divergence(spark, tmp_path):
    """The batched trainer must reproduce the driver-side reference of
    its OWN semantics (stale-counts greedy disjoint selection) merge
    for merge — and that semantics genuinely diverges from
    rank-sequential BPE on this corpus (the documented trade), so the
    pin would catch a silent switch to either behavior."""
    from flink_parameter_server_spark.operators.retrieval import bpe_merge_vocab_batched

    out = _mk_text_corpus(
        spark, tmp_path, " ".join(w for w, n in BPE_VOCAB.items() for _ in range(n))
    )
    want = _ref_bpe_batched(BPE_VOCAB, 8, 3)
    got = [
        (r["rank"], r["a"], r["b"], r["merged"], r["cnt"])
        for r in bpe_merge_vocab_batched(spark, out, n_merges=8, batch_m=3).collect()
    ]
    assert got == want, (got, want)

    # divergence is real on this corpus: stale within-round counts
    # reorder/alter the merge list vs the re-counting sequential path
    seq = _ref_bpe(BPE_VOCAB, 8)
    assert got != seq
    # ...but the first merge of round 1 is always the true rank-1 pair
    assert got[0] == seq[0]


def test_bpe_batched_pads_exhausted_ranks_like_sequential(spark, tmp_path):
    """r9 review: on a corpus whose pair supply exhausts (single word
    'ab', one real merge), BOTH trainers must emit the same n_merges-row
    NULL-padded shape — the degenerate-sweep 'every entry runs'
    contract, and the batch_m=1 ≡ sequential claim on degenerate input."""
    from flink_parameter_server_spark.operators.retrieval import (
        bpe_merge_vocab,
        bpe_merge_vocab_batched,
    )

    out = _mk_text_corpus(spark, tmp_path, "ab ab ab")
    seq = [tuple(r) for r in bpe_merge_vocab(spark, out, n_merges=5).collect()]
    bat = [tuple(r) for r in bpe_merge_vocab_batched(spark, out, n_merges=5, batch_m=2).collect()]
    assert bat == seq and len(seq) == 5
    assert seq[0] == (1, "a", "b", "ab", 3)
    assert all(r == (k, None, None, None, None) for k, r in zip(range(2, 6), seq[1:]))


def test_bpe_batched_on_fixture_trains_and_releases_scratch(spark):
    """On the real documents fixture the batched trainer lands exactly
    n_merges ranks in ~n/m rounds, every round's selection is
    symbol-disjoint, and its per-round checkpoints are tracked (no
    persistent-RDD leak after release)."""
    from flink_parameter_server_spark.operators.retrieval import bpe_merge_vocab_batched
    from flink_parameter_server_spark.scratch import persistent_rdd_ids, release
    from tests.conftest import SF_SMALL

    release()
    base = persistent_rdd_ids(spark)
    rows = bpe_merge_vocab_batched(spark, SF_SMALL, n_merges=12, batch_m=4).collect()
    assert [r["rank"] for r in rows] == list(range(1, 13))
    assert all(r["merged"] == r["a"] + r["b"] and r["cnt"] > 0 for r in rows)
    release()
    assert persistent_rdd_ids(spark) - base == set()


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


def test_dsir_logw_matches_driver_reference(spark):
    """The r9 DSIR signal: recompute the hashed-unigram importance
    weights driver-side (independent Python implementation of the add-1
    bucket model) and require exact equality with the entry's
    dsir_logw at sf0.001."""
    from collections import Counter
    from decimal import Decimal, ROUND_HALF_EVEN
    import math

    from flink_parameter_server_spark.operators._util import t
    from flink_parameter_server_spark.operators.textstats import (
        DSIR_B,
        DSIR_SEED,
        DSIR_TARGET_LANG,
    )
    from flink_parameter_server_spark.plans import REGISTRY
    from tests.conftest import SF_SMALL

    def ph(s, seed):
        acc = seed
        for ch in s:
            acc = (acc * 31 + ord(ch)) % 1_000_003
        return acc

    docs = t(spark, SF_SMALL, "documents").select("doc_id", "lang", "text").collect()
    per_doc: dict[int, Counter] = {}
    raw: Counter = Counter()
    tgt: Counter = Counter()
    for r in docs:
        toks = [x for x in r.text.split(" ") if x]
        c = Counter(ph(x, DSIR_SEED) % DSIR_B for x in toks)
        per_doc[r.doc_id] = c
        raw.update(c)
        if r.lang == DSIR_TARGET_LANG:
            tgt.update(c)
    rr, tt = sum(raw.values()), sum(tgt.values())
    lam = {}
    for b, cr in raw.items():
        x = ((tgt.get(b, 0) + 1.0) / (tt + float(DSIR_B))) / (
            (cr + 1.0) / (rr + float(DSIR_B))
        )
        # 6dp round-half-even on the double, like both engines' round()
        lam[b] = int(
            (Decimal(repr(round(math.log(x), 6))) * 1_000_000).to_integral_value(
                ROUND_HALF_EVEN
            )
        )
    want = {
        d: (sum(n * lam[b] for b, n in c.items()) / 1_000_000.0 if c else None)
        for d, c in per_doc.items()
    }
    got = {
        r["doc_id"]: r["dsir_logw"]
        for r in REGISTRY["text_profile"].fn(spark, SF_SMALL).collect()
    }
    assert got == want


def test_dsir_logw_prefers_target_language(spark):
    """Signal direction: docs in the target language must average a
    higher importance weight than the rest of the corpus — DSIR
    upweights what resembles the target distribution."""
    from flink_parameter_server_spark.operators.textstats import DSIR_TARGET_LANG
    from flink_parameter_server_spark.plans import REGISTRY
    from tests.conftest import SF_SMALL

    prof = REGISTRY["text_profile"].fn(spark, SF_SMALL)
    rows = prof.select("actual_lang", "dsir_logw").where(
        F.col("dsir_logw").isNotNull()
    ).collect()
    en = [r.dsir_logw for r in rows if r.actual_lang == DSIR_TARGET_LANG]
    rest = [r.dsir_logw for r in rows if r.actual_lang != DSIR_TARGET_LANG]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_dsir_selected_part_semantics(spark):
    """r9 dsir_selected (train_test_split part): exactly floor(nw /
    DSIR_KEEP_DIV) weighted docs are 'selected'; every selected doc's
    integer weight >= every rest doc's (ties broken by doc_id, so at
    the boundary weight only lower doc_ids are in); token-less docs
    are 'unweighted'."""
    from flink_parameter_server_spark.operators.mlprep import DSIR_KEEP_DIV
    from flink_parameter_server_spark.operators.textstats import dsir_micro
    from flink_parameter_server_spark.operators._util import t
    from flink_parameter_server_spark.plans import REGISTRY
    from tests.conftest import SF_SMALL

    part = (
        REGISTRY["train_test_split"]
        .fn(spark, SF_SMALL)
        .where(F.col("part") == "dsir_selected")
    )
    got = {r["doc_id"]: r["split"] for r in part.collect()}
    w = {
        r["doc_id"]: r["smic"]
        for r in dsir_micro(
            t(spark, SF_SMALL, "documents").select("doc_id", "lang", "text")
        ).collect()
    }
    n_docs = t(spark, SF_SMALL, "documents").count()
    assert len(got) == n_docs
    sel = {d for d, s in got.items() if s == "selected"}
    rest = {d for d, s in got.items() if s == "rest"}
    unw = {d for d, s in got.items() if s == "unweighted"}
    assert unw == set(got) - set(w)  # weightless docs exactly
    assert len(sel) == len(w) // DSIR_KEEP_DIV
    # driver-side reference cut on (smic desc, doc_id)
    order = sorted(w, key=lambda d: (-w[d], d))
    assert sel == set(order[: len(w) // DSIR_KEEP_DIV])
    assert rest == set(order[len(w) // DSIR_KEEP_DIV:])


def test_bpe_encode_part_cross_engine_on_exhausted_ranks(spark, duck, tmp_path):
    """r9: the 'bpe_encode' part (bpe_apply driver-verified) must match
    the oracle's final chained-replace state even when the pair supply
    exhausts before BPE_MERGES ranks — the oracle's CASE guard keeps
    merged states intact where empty argmax subqueries would otherwise
    NULL them via replace(state, NULL, NULL), and the Spark side skips
    the NULL-padded merges. Corpus 'ab ab ab': one real merge, nine
    exhausted ranks; 'ab' must encode as the single merged symbol in
    BOTH engines."""
    from flink_parameter_server_spark.operators.retrieval import _bpe_sql
    from flink_parameter_server_spark.plans import REGISTRY

    out = _mk_text_corpus(spark, tmp_path, "ab ab ab")
    duck.execute(
        f"CREATE OR REPLACE VIEW documents AS SELECT * FROM read_parquet('{out}/documents.parquet')"
    )
    want = {
        tuple(r)
        for r in duck.execute(
            f"SELECT tok, n1, n2, postings FROM ({_bpe_sql()}) WHERE part = 'bpe_encode'"
        ).fetchall()
    }
    got = {
        (r["tok"], r["n1"], r["n2"], r["postings"])
        for r in REGISTRY["text_retrieval"]
        .fn(spark, out)
        .where("part = 'bpe_encode'")
        .collect()
    }
    assert got == want, (got, want)
    assert ("ab", 3, 1, "ab") in got


def _mk_mix_corpus(spark, tmp_path, docs, embs=None):
    """A minimal sf-dir with custom documents (and optionally custom
    embeddings) rows; other tables copied from the fixture."""
    import glob
    import os
    import shutil

    from flink_parameter_server_spark.sources import TABLES
    from tests.conftest import SF_SMALL

    out = str(tmp_path / "mix_corpus")
    os.makedirs(out)
    custom = {"documents"} | ({"embeddings"} if embs is not None else set())
    for tab in TABLES:
        if tab not in custom:
            shutil.copy(f"{SF_SMALL}/{tab}.parquet", f"{out}/{tab}.parquet")

    def _write_one(df, tab):
        df.coalesce(1).write.parquet(f"{out}/_tmp_{tab}")
        [part] = glob.glob(f"{out}/_tmp_{tab}/part-*.parquet")
        shutil.move(part, f"{out}/{tab}.parquet")
        shutil.rmtree(f"{out}/_tmp_{tab}")

    _write_one(
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars int"
        ),
        "documents",
    )
    if embs is not None:
        _write_one(
            spark.createDataFrame(
                embs, "vec_id long, embedding array<float>, label int"
            ),
            "embeddings",
        )
    return out


def test_domain_reweight_direction_and_branches(spark, tmp_path):
    """r9 domain_reweight (train_test_split part): a source whose docs
    resemble the DSIR target (lang='en' slice) must be upsampled
    relative to a source that doesn't — no target-like doc is dropped,
    at least one off-target doc is, and the kept-copy mass orders by
    mean importance. Exercises the 'dropped' branch the driver fixture
    never reaches (its sources are homogeneous; rates all ~1)."""
    from flink_parameter_server_spark.plans import REGISTRY

    docs = []
    for i in range(20):  # target-like: en, tokens concentrate target buckets
        docs.append((i, "alpha alpha alpha alpha", "en", "good", 23))
    for i in range(20, 40):  # off-target: different lang AND tokens
        docs.append((i, "zulu zulu zulu zulu", "de", "bad", 19))
    out = _mk_mix_corpus(spark, tmp_path, docs)
    part = (
        REGISTRY["train_test_split"]
        .fn(spark, out)
        .where("part = 'domain_reweight'")
        .collect()
    )
    by_doc = {}
    for r in part:
        by_doc.setdefault(r["doc_id"], []).append(r["split"])
    assert set(by_doc) == set(range(40))  # every doc surfaces
    good_copies = sum(
        len([s for s in by_doc[i] if s != "dropped"]) for i in range(20)
    )
    bad_copies = sum(
        len([s for s in by_doc[i] if s != "dropped"]) for i in range(20, 40)
    )
    # direction: target-like source keeps at least one copy per doc and
    # strictly more copy mass than the off-target source
    assert all(by_doc[i] != ["dropped"] for i in range(20))
    assert any(by_doc[i] == ["dropped"] for i in range(20, 40))
    assert good_copies >= 20 > bad_copies


def test_cluster_balance_caps_and_unembedded(spark, tmp_path):
    """r9 cluster_balance (train_test_split part): per-cell kept counts
    equal min(cell size, cap) with cap = ceil(n/k) over NON-EMPTY
    cells, capped surplus is exact, and docs without a vector surface
    as 'unembedded' — verified against a driver-side cell assignment
    over the same counted-n centroid geometry (r11: stride =
    ceil(n/floor(sqrt(n))), recomputed independently here)."""
    import numpy as np

    from flink_parameter_server_spark.functions.planes import counted_stride
    from flink_parameter_server_spark.plans import REGISTRY

    rng = np.random.RandomState(7)
    n_vec = 130
    # three anchor directions; vecs at the counted-rule centroid ids
    # (multiples of stride=ceil(130/11)=12) get whatever direction the
    # skew rule gives them — the reference below recomputes the rule
    base = {0: [1, 0, 0, 0], 64: [0, 1, 0, 0], 128: [0, 0, 1, 0]}
    embs, vecs = [], {}
    for vid in range(n_vec):
        if vid in base:
            v = np.array(base[vid], dtype="float64")
        else:
            # skew: most vectors hug centroid 0's direction
            anchor = base[0] if vid % 10 < 8 else (base[64] if vid % 2 else base[128])
            v = np.array(anchor, dtype="float64") + 0.05 * rng.randn(4)
        vecs[vid] = v
        embs.append((vid, [float(x) for x in v], 0))
    docs = [
        (i, "word word", "en", "web", 9) for i in range(n_vec + 10)
    ]  # last 10 docs have no vector
    out = _mk_mix_corpus(spark, tmp_path, docs, embs=embs)
    part = (
        REGISTRY["train_test_split"]
        .fn(spark, out)
        .where("part = 'cluster_balance'")
        .collect()
    )
    got = {r["doc_id"]: r["split"] for r in part}
    assert len(got) == n_vec + 10
    assert {d for d, s in got.items() if s == "unembedded"} == set(
        range(n_vec, n_vec + 10)
    )
    # driver-side reference: counted-n centroid ids, max-cosine cell
    # (tie -> lowest cid)
    stride = counted_stride(n_vec)
    cents = {
        cid: vecs[cid] / np.linalg.norm(vecs[cid])
        for cid in vecs
        if cid % stride == 0
    }
    cell_of = {}
    for vid, v in vecs.items():
        vn = v / np.linalg.norm(v)
        best = max(sorted(cents), key=lambda c: (round(float(vn @ cents[c]), 12), -c))
        cell_of[vid] = best
    sizes = {}
    for vid, c in cell_of.items():
        sizes[c] = sizes.get(c, 0) + 1
    k = len(sizes)
    cap = (n_vec + k - 1) // k
    kept = {d for d, s in got.items() if s == "kept"}
    capped = {d for d, s in got.items() if s == "capped"}
    for c, n_c in sizes.items():
        members = {v for v, cc in cell_of.items() if cc == c}
        assert len(members & kept) == min(n_c, cap), (c, n_c, cap)
        assert len(members & capped) == max(0, n_c - cap), (c, n_c, cap)


def test_dsir_threshold_cut_matches_exact_up_to_boundary_ties(spark):
    """r9: dsir_select_threshold (the approx-quantile 100 TB form of
    the dsir_selected cut) must agree with the exact rank cut
    everywhere except the boundary tie group: strictly-above-threshold
    docs selected by both, strictly-below by neither, and every
    approx-selected doc is >= the exact cut's boundary weight."""
    from flink_parameter_server_spark.operators._dsir_core import dsir_micro
    from flink_parameter_server_spark.operators._util import t
    from flink_parameter_server_spark.operators.mlprep import (
        DSIR_KEEP_DIV,
        dsir_select_threshold,
    )
    from tests.conftest import SF_SMALL

    w_df = dsir_micro(
        t(spark, SF_SMALL, "documents").select("doc_id", "lang", "text")
    )
    w = {r["doc_id"]: r["smic"] for r in w_df.collect()}
    k = len(w) // DSIR_KEEP_DIV
    order = sorted(w, key=lambda d_: (-w[d_], d_))
    exact = set(order[:k])
    boundary = w[order[k - 1]]  # the exact cut's k-th largest weight
    approx = {
        r["doc_id"]
        for r in dsir_select_threshold(w_df).collect()
        if r["sel"] == "selected"
    }
    strictly_above = {d_ for d_ in w if w[d_] > boundary}
    strictly_below = {d_ for d_ in w if w[d_] < boundary}
    assert strictly_above <= approx and strictly_above <= exact
    assert not (strictly_below & approx) and not (strictly_below & exact)
    # fixture scale < sketch accuracy -> the percentile is exact, so
    # the two cuts differ ONLY inside the boundary tie group
    ties = {d_ for d_ in w if w[d_] == boundary}
    assert approx ^ exact <= ties
    assert len(approx) >= k > 0
    # Pin the regime explicitly (the r9 off-by-one only surfaced
    # because the fixture has NO boundary tie — keep that property
    # asserted so a future fixture tie can't mask a rank regression):
    # with a unique boundary value the two cuts must agree EXACTLY.
    assert len(ties) == 1, (
        "fixture drifted into a boundary tie group; the no-tie "
        "contract (approx == exact) is no longer exercised"
    )
    assert approx == exact


def test_repetition_removal_multiline_parity_and_semantics(spark, duck, tmp_path):
    """r10 (VERDICT r9 missing-#6): the within-document repetition
    REMOVAL transform — duplicate-LINE dedup (keep first occurrence,
    the Gopher/RefinedWeb rule) and consecutive-token-run collapse.
    The driver fixture is single-line, so the multi-line unit is
    pinned here on a synthetic corpus: full Spark-vs-DuckDB oracle
    parity on the whole text_profile entry, plus hand-computed
    expected transforms."""
    from flink_parameter_server_spark.plans import REGISTRY
    from tests.conftest import register_duck_views
    from tests.oracle import compare

    texts = {
        0: "dup line\nunique one\ndup line\nanother\ndup line",
        1: "a a table table table b a",
        2: None,
        3: "",
        4: "x\nx\nx",
        5: "one two\none two\nthree three",
        # paragraph unit (late r11): duplicate and unique paragraphs
        6: "p one\nl two\n\np one\nl two\n\nother",
        7: "solo para\n\nsolo para",
    }
    docs = [
        (i, txt, "en", "web", len(txt) if txt is not None else 0)
        for i, txt in texts.items()
    ]
    out = _mk_mix_corpus(spark, tmp_path, docs)
    spec = REGISTRY["text_profile"]
    register_duck_views(duck, out)
    ok, msg = compare(spec.fn(spark, out), duck, spec.oracle)
    assert ok, f"text_profile synthetic multi-line parity: {msg}"

    got = {r["doc_id"]: r for r in spec.fn(spark, out).collect()}
    assert got[0]["dedup_lines_text"] == "dup line\nunique one\nanother"
    assert got[0]["n_dup_lines_removed"] == 2
    assert got[4]["dedup_lines_text"] == "x"
    assert got[4]["n_dup_lines_removed"] == 2
    assert got[5]["dedup_lines_text"] == "one two\nthree three"
    assert got[5]["n_dup_lines_removed"] == 1
    # run collapse operates on the whitespace token array (so it sees
    # across line boundaries) and keeps one token per run
    assert got[1]["collapse_runs_text"] == "a table b a"
    assert got[1]["n_run_tokens_removed"] == 3
    # degenerate inputs: NULL text nulls the transforms; empty text is
    # an identity with zero removals
    assert got[2]["dedup_lines_text"] is None
    assert got[2]["n_dup_lines_removed"] is None
    assert got[2]["collapse_runs_text"] is None
    assert got[3]["n_dup_lines_removed"] == 0
    assert got[3]["collapse_runs_text"] == ""
    assert got[3]["n_run_tokens_removed"] == 0
    # single-line fixture docs pass through the line unit unchanged
    assert got[1]["dedup_lines_text"] == texts[1]
    # paragraph unit: keep-first over '\n\n' blocks; docs without a
    # blank line are one paragraph -> identity
    assert got[6]["dedup_paras_text"] == "p one\nl two\n\nother"
    assert got[6]["n_dup_paras_removed"] == 1
    assert got[7]["dedup_paras_text"] == "solo para"
    assert got[7]["n_dup_paras_removed"] == 1
    assert got[0]["dedup_paras_text"] == texts[0]
    assert got[0]["n_dup_paras_removed"] == 0
    assert got[2]["dedup_paras_text"] is None
    assert got[3]["n_dup_paras_removed"] == 0
    # the line unit sees doc 6's blank separator lines as duplicates
    # of each other ('' kept once) — paragraph and line units are
    # genuinely different granularities
    assert got[6]["n_dup_lines_removed"] == 3
    # char-fraction signals (Gopher Table A1 definitions): doc 6 is 31
    # chars; removed duplicate lines carry 10 content chars ("p one",
    # "l two", ""), the removed duplicate paragraph 11 ("p one\nl two")
    assert got[6]["dup_line_char_frac"] == round(10 / 31, 6)
    assert got[6]["dup_para_char_frac"] == round(11 / 31, 6)
    assert got[0]["dup_para_char_frac"] == 0.0
    assert got[2]["dup_line_char_frac"] is None
    assert got[3]["dup_line_char_frac"] is None


def test_substr_removal_semantics_and_parity(spark, duck, tmp_path):
    """late r11: the ExactSubstr REMOVAL transform (Lee et al. 2022) —
    every occurrence of a shared SPAN_K-token span is cut except the
    global canonical (min (doc_id, start)), across docs AND within one
    doc. Full text_profile oracle parity on a corpus with real span
    hits plus hand-computed expected outputs."""
    from flink_parameter_server_spark.operators.dedup import SPAN_K
    from flink_parameter_server_spark.plans import REGISTRY
    from tests.conftest import register_duck_views
    from tests.oracle import compare

    assert SPAN_K == 8, "test corpus is built for 8-token spans"
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    within = "a1 a2 a3 a4 a5 a6 a7 a8"
    texts = {
        10: f"{shared} TAIL1",
        # shares tokens 1-8 with doc 10; canonical is (10, 1) so this
        # copy loses positions 1-8
        11: f"{shared} TAIL2",
        # within-doc repeat: second occurrence (pos 10) is cut
        12: f"{within} x {within}",
        13: None,
        14: "one two",
    }
    docs = [
        (i, txt, "en", "web", len(txt) if txt is not None else 0)
        for i, txt in texts.items()
    ]
    out = _mk_mix_corpus(spark, tmp_path, docs)
    spec = REGISTRY["text_profile"]
    register_duck_views(duck, out)
    ok, msg = compare(spec.fn(spark, out), duck, spec.oracle)
    assert ok, f"text_profile span-removal parity: {msg}"

    got = {r["doc_id"]: r for r in spec.fn(spark, out).collect()}
    assert got[10]["substr_removed_text"] == texts[10]
    assert got[10]["n_dup_spans_removed"] == 0
    assert got[10]["n_span_tokens_removed"] == 0
    assert got[11]["substr_removed_text"] == "TAIL2"
    assert got[11]["n_dup_spans_removed"] == 1
    assert got[11]["n_span_tokens_removed"] == 8
    assert got[12]["substr_removed_text"] == f"{within} x"
    assert got[12]["n_dup_spans_removed"] == 1
    assert got[12]["n_span_tokens_removed"] == 8
    assert got[13]["substr_removed_text"] is None
    assert got[13]["n_dup_spans_removed"] is None
    assert got[13]["n_span_tokens_removed"] is None
    assert got[14]["substr_removed_text"] == texts[14]
    assert got[14]["n_dup_spans_removed"] == 0


def test_substr_removal_merges_maximal_runs(spark, duck, tmp_path):
    """r12 (VERDICT r11 #3): a long duplicated region whose cut runs
    sandwich a sub-SPAN_K kept fragment is removed as ONE contiguous
    maximal run (the fragment is debris — it cannot hold a complete
    span), matching Lee et al.'s suffix-array maximal-substring
    semantics; a gap of >= SPAN_K kept tokens (room for a full
    never-duplicated span) stays kept. Hand-computed on both engines
    plus full text_profile oracle parity."""
    from flink_parameter_server_spark.operators.dedup import SPAN_K
    from flink_parameter_server_spark.plans import REGISTRY
    from tests.conftest import register_duck_views
    from tests.oracle import compare

    assert SPAN_K == 8, "test corpus is built for 8-token spans"
    p = "p1 p2 p3 p4 p5 p6 p7 p8"  # canonical in doc 0
    q = "q1 q2 q3 q4 q5 q6 q7 q8"  # canonical in doc 1
    texts = {
        0: p,
        1: q,
        # P cut at 1-8, Q cut at 12-19; the 3-token gap (g1 g2 g3) is
        # sub-span debris between two cut runs -> merged: whole doc cut
        2: f"{p} g1 g2 g3 {q}",
        # 8-token gap (exactly one full unique span fits) -> kept
        3: f"{p} h1 h2 h3 h4 h5 h6 h7 h8 {q}",
    }
    docs = [(i, txt, "en", "web", len(txt)) for i, txt in texts.items()]
    out = _mk_mix_corpus(spark, tmp_path, docs)
    spec = REGISTRY["text_profile"]
    register_duck_views(duck, out)
    ok, msg = compare(spec.fn(spark, out), duck, spec.oracle)
    assert ok, f"text_profile maximal-run parity: {msg}"

    got = {r["doc_id"]: r for r in spec.fn(spark, out).collect()}
    assert got[0]["substr_removed_text"] == p  # canonical kept
    assert got[1]["substr_removed_text"] == q
    assert got[2]["substr_removed_text"] == ""  # one contiguous run
    assert got[2]["n_dup_spans_removed"] == 2
    assert got[2]["n_span_tokens_removed"] == 19
    assert got[3]["substr_removed_text"] == "h1 h2 h3 h4 h5 h6 h7 h8"
    assert got[3]["n_dup_spans_removed"] == 2
    assert got[3]["n_span_tokens_removed"] == 16


def test_dedup_lines_sorted_form_equivalence(spark):
    """r11 (ADVICE r10 low-#2 FIX): dedup_lines' sort-based keep-first
    rewrite (O(L log L) per doc, still map-only) must be semantically
    identical to the r10 array_position form it replaced — pinned on a
    seeded randomized multi-line corpus with heavy duplication, empty
    lines, multibyte lines, NULL and empty text, plus the pathological
    many-thousand-line doc the rewrite exists for."""
    import random

    from flink_parameter_server_spark.operators.textstats import (
        _dedup_lines_quadratic,
        dedup_lines,
    )

    rng = random.Random(11)
    pool = ["alpha", "beta", "", "ünïcodé ζ", "tab\tline", "x" * 50, "γραμμή"]
    texts = [
        "\n".join(rng.choice(pool) for _ in range(rng.randint(1, 40)))
        for _ in range(200)
    ]
    # the pathological doc: 6000 lines over an 80-line vocabulary
    texts.append("\n".join(f"line-{rng.randint(0, 79)}" for _ in range(6000)))
    texts.extend([None, "", "solo"])
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    new_t, new_n = dedup_lines(F.col("text"))
    old_t, old_n = _dedup_lines_quadratic(F.col("text"))
    newp_t, newp_n = dedup_lines(F.col("text"), sep="\n\n")
    oldp_t, oldp_n = _dedup_lines_quadratic(F.col("text"), sep="\n\n")
    rows = df.select(
        "doc_id",
        "text",
        new_t.alias("nt"),
        new_n.alias("nn"),
        old_t.alias("ot"),
        old_n.alias("on"),
        newp_t.alias("npt"),
        newp_n.alias("npn"),
        oldp_t.alias("opt"),
        oldp_n.alias("opn"),
    ).collect()
    assert len(rows) == len(texts)
    for r in rows:
        for a, b, sep in (("nt", "ot", "\n"), ("npt", "opt", "\n\n")):
            assert r[a] == r[b], f"doc {r['doc_id']} sep={sep!r}: text diverged"
        assert r["nn"] == r["on"], f"doc {r['doc_id']}: count diverged"
        assert r["npn"] == r["opn"], f"doc {r['doc_id']}: para count diverged"
        # independent Python reference: first occurrence, order kept
        if r["text"] is None:
            assert r["nt"] is None and r["nn"] is None
            assert r["npt"] is None and r["npn"] is None
        else:
            for out, cnt, sep in (("nt", "nn", "\n"), ("npt", "npn", "\n\n")):
                seen, ref = set(), []
                for ln in r["text"].split(sep):
                    if ln not in seen:
                        seen.add(ln)
                        ref.append(ln)
                assert r[out] == sep.join(ref)
                assert r[cnt] == len(r["text"].split(sep)) - len(ref)


def _one_shot_rates(spark, sf_dir):
    """The one-shot domain_reweight rate table recomputed through the
    factored helper — the reference the iterated loop's round 1 must
    reproduce bit-for-bit."""
    from flink_parameter_server_spark.operators._dsir_core import dsir_micro
    from flink_parameter_server_spark.operators._util import t
    from flink_parameter_server_spark.operators.mlprep import _domain_rates

    d = t(spark, sf_dir, "documents")
    w = dsir_micro(d.select("doc_id", "lang", "text"))
    dw = (
        d.select("doc_id", "source")
        .join(w, "doc_id", "left")
        .select(
            "source",
            F.coalesce("ntok", F.lit(0)).alias("nt"),
            F.coalesce("smic", F.lit(0)).alias("sm"),
        )
    )
    dom0 = dw.groupBy("source").agg(
        F.sum("nt").cast("long").alias("t_s"), F.sum("sm").cast("long").alias("m_s")
    )
    return {r["g_source"]: r["r"] for r in _domain_rates(dom0).collect()}


def test_pack_tokens_capped_invariants(spark):
    """r11: hard-cap FFD packing (pack_tokens_capped). Pins (1) the cap
    invariant — every pack's token sum <= budget unless it is a single
    oversize doc (which packs ALONE, flagged); (2) every input doc
    packs exactly once; (3) determinism (two runs identical); (4) the
    FFD quality floor — per shard, packs used <= 11/9*ceil(tok/budget)
    + 2 (the classic FFD guarantee over the OPT >= ceil(total/budget)
    lower bound, oversize docs excluded from both sides)."""
    import math

    from flink_parameter_server_spark.operators._util import t
    from flink_parameter_server_spark.operators.mlprep import (
        PACK_BUDGET,
        pack_tokens_capped,
    )
    from tests.conftest import SF_SMALL

    d = t(spark, SF_SMALL, "documents")
    rows = pack_tokens_capped(spark_df := d).collect()
    assert {r["doc_id"] for r in rows} == {
        r["doc_id"] for r in d.select("doc_id").collect()
    }
    by_pack: dict = {}
    for r in rows:
        by_pack.setdefault((r["shard"], r["pack_id"]), []).append(r)
    for members in by_pack.values():
        tok_sum = sum(r["tok"] for r in members)
        if any(r["oversize"] for r in members):
            assert len(members) == 1 and members[0]["tok"] > PACK_BUDGET
        else:
            assert tok_sum <= PACK_BUDGET, tok_sum

    rows2 = pack_tokens_capped(spark_df).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))

    shard_tok: dict = {}
    shard_packs: dict = {}
    for r in rows:
        if r["oversize"]:
            continue
        shard_tok[r["shard"]] = shard_tok.get(r["shard"], 0) + r["tok"]
        shard_packs.setdefault(r["shard"], set()).add(r["pack_id"])
    for s, toks in shard_tok.items():
        opt_lb = math.ceil(toks / PACK_BUDGET)
        assert len(shard_packs[s]) <= math.ceil(11 / 9 * opt_lb) + 2, (
            s, len(shard_packs[s]), opt_lb,
        )


def test_dsir_gumbel_tau_to_zero_recovers_exact_cut(spark):
    """r11: dsir_select_gumbel is the temperature>0 Gumbel form of the
    'dsir_selected' cut. Pins (1) tau -> 0 recovers the exact rank cut
    on the fixture's no-tie boundary (the key is smic/tau + g with g
    bounded ~[-4, 22], so any tau << 1e-6/|smic-gap| makes weight
    ordering dominate); (2) at the registry temperature the selected
    COUNT is identical (same top-1/5 rank cut) but the selection
    itself mixes in lower-weight docs with seeded randomness — on a
    corpus with non-trivial weight spread the two sets differ, which
    is the resampling semantics the paper argues for; (3) the key is
    deterministic (two calls agree)."""
    from flink_parameter_server_spark.operators._dsir_core import dsir_micro
    from flink_parameter_server_spark.operators._util import t
    from flink_parameter_server_spark.operators.mlprep import (
        DSIR_KEEP_DIV,
        dsir_select_gumbel,
    )
    from tests.conftest import SF_SMALL

    w_df = dsir_micro(
        t(spark, SF_SMALL, "documents").select("doc_id", "lang", "text")
    )
    w = {r["doc_id"]: r["smic"] for r in w_df.collect()}
    k = len(w) // DSIR_KEEP_DIV
    order = sorted(w, key=lambda d_: (-w[d_], d_))
    exact = set(order[:k])
    boundary = w[order[k - 1]]
    assert sum(1 for d_ in w if w[d_] == boundary) == 1, "fixture boundary tied"

    cold = {
        r["doc_id"]
        for r in dsir_select_gumbel(w_df, tau=1e-9).collect()
        if r["sel"] == "selected"
    }
    assert cold == exact

    hot1 = {(r["doc_id"], r["kmic"], r["sel"]) for r in dsir_select_gumbel(w_df).collect()}
    hot2 = {(r["doc_id"], r["kmic"], r["sel"]) for r in dsir_select_gumbel(w_df).collect()}
    assert hot1 == hot2  # seeded determinism
    hot_sel = {d_ for d_, _, s in hot1 if s == "selected"}
    assert len(hot_sel) == k
    assert hot_sel != exact, "temperature had no effect — tau too cold for fixture"


def test_domain_reweight_iterated_round1_equals_one_shot(spark):
    """r10 (VERDICT r9 #4): the EG loop at k=1 IS the one-shot
    domain_reweight — same integer micro-nat sums, same 6dp grid, same
    op order, so the rates are bitwise-equal doubles on the real
    fixture."""
    from flink_parameter_server_spark.operators.mlprep import (
        domain_reweight_iterated,
    )
    from tests.conftest import SF_SMALL

    one = _one_shot_rates(spark, SF_SMALL)
    got = {
        r["source"]: r["r"]
        for r in domain_reweight_iterated(spark, SF_SMALL, rounds=1).collect()
    }
    assert got == one


def test_domain_reweight_iterated_converges_on_two_source_corpus(spark, tmp_path):
    """r10 receipt: on the synthetic two-source corpus the mixture
    feedback damps the EG updates — upsampling the target-like source
    shrinks its own excess loss, so per-round rate deltas DECREASE and
    the direction (good upsampled, bad downsampled) holds at every
    round; round 1 equals the one-shot here too."""
    from flink_parameter_server_spark.operators.mlprep import (
        domain_reweight_iterated,
    )

    docs = []
    for i in range(20):
        docs.append((i, "alpha alpha alpha alpha", "en", "good", 23))
    for i in range(20, 40):
        docs.append((i, "zulu zulu zulu zulu", "de", "bad", 19))
    out = _mk_mix_corpus(spark, tmp_path, docs)

    rounds = 5
    hist = domain_reweight_iterated(spark, out, rounds=rounds).collect()
    r_of = {}
    for r in hist:
        r_of[(r["round"], r["source"])] = r["r"]
    assert set(r_of) == {(k, s) for k in range(1, rounds + 1) for s in ("good", "bad")}

    one = _one_shot_rates(spark, out)
    assert r_of[(1, "good")] == one["good"] and r_of[(1, "bad")] == one["bad"]

    # direction holds every round; normalization holds every round
    # (sum over sources of natural_share * rate == 1 up to the 6dp grid)
    for k in range(1, rounds + 1):
        assert r_of[(k, "good")] > 1.0 > r_of[(k, "bad")] >= 0.0
        mix_mass = 0.5 * r_of[(k, "good")] + 0.5 * r_of[(k, "bad")]
        assert abs(mix_mass - 1.0) < 1e-4  # equal token counts per source
    # convergence: successive max-deltas shrink and the tail is tight
    deltas = [
        max(
            abs(r_of[(k + 1, "good")] - r_of[(k, "good")]),
            abs(r_of[(k + 1, "bad")] - r_of[(k, "bad")]),
        )
        for k in range(1, rounds)
    ]
    assert all(d2 < d1 for d1, d2 in zip(deltas, deltas[1:])), deltas
    assert deltas[-1] < 0.05, deltas


def test_domain_reweight_pa_proxy_upweights_unfit_domain(spark, tmp_path):
    """r11 (VERDICT r10 #5): the TRAINED-proxy excess leg of the DoReMi
    loop. Corpus: 'easy' docs are consistently labeled (+1, distinct
    token direction — one PA step fits them, hinge shrinks); 'hard'
    docs share ONE feature vector with CONFLICTING labels (half pass
    the weak quality gate, half fail on n_chars) — irreducible loss no
    proxy step can remove. DoReMi must upweight the domain the proxy
    cannot fit: rate('hard') > rate('easy') at every round, and the
    normalization (sum share·rate = 1 on the 6dp grid) holds. Also
    pins the excess= guard."""
    import pytest

    from flink_parameter_server_spark.operators.mlprep import (
        domain_reweight_iterated,
    )

    text16 = " ".join(f"tok{i}" for i in range(16))  # >= 15 tokens
    docs = []
    for i in range(20):
        docs.append((i, text16 + " easyword", "en", "easy", 120))
    for i in range(20, 40):
        # identical text (identical x); label flips on n_chars
        docs.append((i, text16 + " hardword", "en", "hard", 120 if i % 2 else 50))
    out = _mk_mix_corpus(spark, tmp_path, docs)

    rounds = 3
    hist = domain_reweight_iterated(spark, out, rounds=rounds, excess="pa_proxy").collect()
    r_of = {(r["round"], r["source"]): r["r"] for r in hist}
    assert set(r_of) == {(k, s) for k in range(1, rounds + 1) for s in ("easy", "hard")}
    for k in range(1, rounds + 1):
        assert r_of[(k, "hard")] > r_of[(k, "easy")], (k, r_of)
        # equal token mass per source -> mixture normalization
        mix_mass = 0.5 * r_of[(k, "hard")] + 0.5 * r_of[(k, "easy")]
        assert abs(mix_mass - 1.0) < 1e-4, (k, mix_mass)

    with pytest.raises(ValueError):
        domain_reweight_iterated(spark, out, rounds=1, excess="nope")


def test_split_all_threshold_matches_exact_ntile_up_to_boundary(spark):
    """r10: split_all_threshold (the approx-quantile 100 TB form of the
    split_all per-stratum ntile) vs the exact window form. With exact
    percentiles (fixture n << accuracy) and no hash ties: the 0.9 cut
    agrees EXACTLY (ceil(0.9r) == min(9, r) for every remainder r), the
    0.8 cut may move at most ONE boundary doc per stratum from train to
    valid (ceil(0.8r) == min(8, r) - 1 for r in 5..8), and test sets
    are identical."""
    from flink_parameter_server_spark.functions.hashing import int_hash
    from flink_parameter_server_spark.operators._util import t
    from flink_parameter_server_spark.operators.mlprep import (
        N_TILES,
        SPLIT_SEED,
        split_all_threshold,
    )
    from pyspark.sql import Window
    from tests.conftest import SF_SMALL

    d = t(spark, SF_SMALL, "documents")
    h = int_hash(F.col("doc_id"), 0, SPLIT_SEED)
    win = Window.partitionBy("lang", "source").orderBy(h, "doc_id")
    tile = F.ntile(N_TILES).over(win)
    exact_rows = d.select(
        "doc_id",
        "lang",
        "source",
        h.alias("h"),
        F.when(tile <= 8, F.lit("train"))
        .when(tile == 9, F.lit("valid"))
        .otherwise(F.lit("test"))
        .alias("split"),
    ).collect()
    got = {
        r["doc_id"]: r["split"] for r in split_all_threshold(d).collect()
    }
    strata: dict = {}
    hashes: dict = {}
    for r in exact_rows:
        strata.setdefault((r["lang"], r["source"]), []).append(r)
        hashes.setdefault((r["lang"], r["source"]), []).append(r["h"])
    assert got and len(got) == len(exact_rows)
    moved_total = 0
    for key, rows in strata.items():
        # pin the no-tie regime explicitly (the DSIR lesson): a hash
        # tie would let the threshold keep a whole tie group and mask
        # a rank regression
        assert len(set(hashes[key])) == len(hashes[key]), key
        ex = {s: {r["doc_id"] for r in rows if r["split"] == s} for s in ("train", "valid", "test")}
        th = {s: {d_ for d_, sp in got.items() if sp == s and any(r["doc_id"] == d_ for r in rows)} for s in ("train", "valid", "test")}
        assert th["test"] == ex["test"], key
        assert th["train"] <= ex["train"], key
        moved = ex["train"] - th["train"]
        assert len(moved) <= 1, (key, moved)
        if moved:
            # the moved doc is exactly the exact form's train boundary
            boundary = max(
                (r for r in rows if r["split"] == "train"),
                key=lambda r: (r["h"], r["doc_id"]),
            )
            assert moved == {boundary["doc_id"]}, key
            assert got[boundary["doc_id"]] == "valid", key
        moved_total += len(moved)
    # per-stratum proportions: train within 1 of the exact 8/10 count
    for key, rows in strata.items():
        n = len(rows)
        k80 = 8 * (n // N_TILES) + min(8, n % N_TILES)
        n_train = sum(1 for r in rows if got[r["doc_id"]] == "train")
        assert k80 - 1 <= n_train <= k80, (key, n, n_train, k80)


def test_redact_pii_transform_parity_and_semantics(spark, duck, tmp_path):
    """r10 PII redaction: full oracle parity of the text_profile entry
    on a corpus with REAL email/URL hits (the fixture is PII-free, so
    the driver path only proves identity), plus hand-computed expected
    redactions — emails replace before URLs so a URL sentinel cannot
    eat an embedded address."""
    from flink_parameter_server_spark.plans import REGISTRY
    from tests.conftest import register_duck_views
    from tests.oracle import compare

    texts = {
        0: "contact a.user+tag@example-site.org or b@x.co today",
        1: "docs at https://docs.example.com/a?b=1 and http://t.co/xyz",
        2: "mixed c@d.io then https://e.f/g end",
        3: "clean words only here",
        4: None,
    }
    docs = [
        (i, s, "en", "web", len(s) if s is not None else 0)
        for i, s in texts.items()
    ]
    out = _mk_mix_corpus(spark, tmp_path, docs)
    spec = REGISTRY["text_profile"]
    register_duck_views(duck, out)
    ok, msg = compare(spec.fn(spark, out), duck, spec.oracle)
    assert ok, f"text_profile synthetic PII parity: {msg}"

    got = {r["doc_id"]: r["redacted_text"] for r in spec.fn(spark, out).collect()}
    assert got[0] == "contact <EMAIL> or <EMAIL> today"
    assert got[1] == "docs at <URL> and <URL>"
    assert got[2] == "mixed <EMAIL> then <URL> end"
    assert got[3] == texts[3]  # identity on clean text
    assert got[4] is None


def test_split_all_threshold_keeps_null_strata(spark, tmp_path):
    """r10 self-review: a NULL lang/source is its own stratum in the
    exact window form — the threshold form's stratum join must be
    null-safe so those docs don't silently vanish."""
    from flink_parameter_server_spark.operators.mlprep import split_all_threshold

    rows = [(i, f"w{i} text body", None if i % 3 == 0 else "en", None, 12) for i in range(30)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    got = {r["doc_id"]: r["split"] for r in split_all_threshold(docs).collect()}
    assert set(got) == set(range(30))
    assert set(got.values()) <= {"train", "valid", "test"}


def test_gopher_ngram_repetition_signals(spark, duck, tmp_path):
    """r12: the remaining Gopher Table A1 repetition thresholds —
    top-{2,3,4}-gram char fraction and duplicated-{5..10}-gram char
    coverage. Hand-computed pins on a synthetic corpus (the fixture
    text has few long self-repeats) plus full-entry Spark-vs-DuckDB
    parity over the same corpus, covering the NULL/empty/short-doc
    guards and the documented can-exceed-1 overlap case."""
    from flink_parameter_server_spark.plans import REGISTRY
    from tests.conftest import register_duck_views
    from tests.oracle import compare

    texts = {
        0: "a b a b a b",          # top2: 'a b' x3, clen 3 -> 9/11
        1: "x y z w v x y z w v",  # dup5: the 5-gram repeats -> full coverage
        2: "aa aa aa",             # top2 overlap: 2*5/8 > 1 (documented)
        3: "a",                    # too short for any gram -> NULLs
        4: "",
        5: None,
        6: "p q r s t u q r s t u v",  # inner 5-gram 'q r s t u' x2
        # r12 quality rules: 4 lines — 2 bullets, 1 ellipsis ending,
        # '#'+'...' symbols over 8 ws-tokens, one all-digit token
        7: "• first item\n- second 12 #\nplain tail...\nx9",
    }
    docs = [
        (i, txt, "en", "web", len(txt) if txt is not None else 0)
        for i, txt in texts.items()
    ]
    out = _mk_mix_corpus(spark, tmp_path, docs)
    spec = REGISTRY["text_profile"]
    register_duck_views(duck, out)
    ok, msg = compare(spec.fn(spark, out), duck, spec.oracle)
    assert ok, f"text_profile gopher-ngram synthetic parity: {msg}"

    got = {r["doc_id"]: r for r in spec.fn(spark, out).collect()}
    assert got[0]["top_2gram_char_frac"] == round(3 * 3 / 11, 6)
    assert got[0]["top_3gram_char_frac"] == round(2 * 5 / 11, 6)
    assert got[0]["dup_5gram_char_frac"] == 0.0  # both 5-grams unique
    assert got[1]["dup_5gram_char_frac"] == 1.0  # period-5 repeat covers all
    assert got[1]["dup_6gram_char_frac"] == 0.0
    assert got[2]["top_2gram_char_frac"] == round(2 * 5 / 8, 6)  # 1.25 > 1
    for n in (5, 6, 7, 8, 9, 10):
        assert got[2][f"dup_{n}gram_char_frac"] is None  # L=3 < n
    for col in ("top_2gram_char_frac", "dup_5gram_char_frac"):
        assert got[3][col] is None or got[3][col] == 0.0
        assert got[4][col] is None
        assert got[5][col] is None
    # doc 6: positions 2..6 and 7..11 covered (union 2..11 of 12) —
    # 10 covered single-char tokens over 12 token chars
    assert got[6]["dup_5gram_char_frac"] == round(10 / 12, 6)
    # r12 quality rules (doc 7: 7 space-tokens — newlines stay inside
    # tokens — 4 lines, '#' + '...' symbols, 5 alphabetic tokens)
    assert got[7]["symbol_word_ratio"] == round(2 / 7, 6)
    assert got[7]["bullet_line_frac"] == 0.5
    assert got[7]["ellipsis_line_frac"] == 0.25
    assert got[7]["alpha_word_frac"] == round(5 / 7, 6)
    for col in ("symbol_word_ratio", "bullet_line_frac",
                "ellipsis_line_frac", "alpha_word_frac"):
        assert got[5][col] is None  # NULL text
    assert got[4]["symbol_word_ratio"] is None  # empty: no tokens
    assert got[4]["bullet_line_frac"] == 0.0    # one empty line
    assert got[4]["ellipsis_line_frac"] == 0.0


def test_column_vs_sql_builder_equivalence(spark):
    """r13: text_profile's per-doc surface is rendered as Spark-SQL
    strings (one JVM parse per stage) instead of Column-API calls —
    ~8,300 py4j round-trips (~2.7 s driver-side, measured) down to
    ~1,600. The Column builders are kept as the readable reference;
    this pin proves each SQL twin evaluates bit-identically on a
    randomized corpus with newlines, unicode, duplicates, empty and
    NULL text (semantics change would break the DuckDB hash gate too,
    but this localizes the diff to the exact builder)."""
    import random

    from flink_parameter_server_spark.functions.hashing import poly_hash
    from flink_parameter_server_spark.functions.text import tokens
    from flink_parameter_server_spark.operators import textstats as ts

    rng = random.Random(13)
    vocab = ["alpha", "beta", "x", "ünïcodé", "the", "of", "12", "#", "...", "a" * 30]
    texts = []
    for _ in range(120):
        n = rng.randint(0, 40)
        toks = [rng.choice(vocab) for _ in range(n)]
        # inject newlines / repeated lines into some docs
        if rng.random() < 0.4 and n > 4:
            toks[rng.randrange(n)] = "line1\nline1\nline2"
        texts.append(" ".join(toks))
    texts.extend([None, "", "solo", "a a a a a a a a a a a a"])
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).select("doc_id", "text", tokens(F.col("text")).alias("toks"))
    df = df.withColumns(
        {
            "wlen": F.transform("toks", lambda s: F.length(s).cast("long")),
            "th_rep": F.transform("toks", lambda s_: poly_hash(s_, 0)),
            "n_chars_measured": F.length("text").cast("long"),
        }
    )
    prev = None
    for n in range(2, ts.DUP_NGRAM_NS[-1] + 1):
        df = df.withColumn(f"gh{n}", ts._gram_step("th_rep", prev, n))
        df = df.selectExpr("*", f"{ts._gram_step_ssql('th_rep', prev, n)} AS sgh{n}")
        prev = f"gh{n}"
    df = df.withColumns(
        {f"dupset{n}": ts._dup_set(F.col(f"gh{n}")) for n in ts.DUP_NGRAM_NS}
    )
    df = df.withColumns(
        {f"f{n}": ts._flag_col(f"gh{n}", f"dupset{n}") for n in ts.DUP_NGRAM_NS}
    )
    pairs = []  # (label, column form, sql form)
    pairs.append(("ph", poly_hash(F.col("text"), 1), F.expr(ts._ph_ssql("text", 1))))
    pairs.append(
        (
            "gram13",
            ts._gram_hashes(F.col("th_rep"), 13),
            F.expr(ts._gram_hashes_ssql("th_rep", 13)),
        )
    )
    for n in range(2, ts.DUP_NGRAM_NS[-1] + 1):
        pairs.append((f"gh{n}", F.col(f"gh{n}"), F.col(f"sgh{n}")))
    for n in ts.DUP_NGRAM_NS:
        pairs.append(
            (f"ds{n}", ts._dup_set(F.col(f"gh{n}")), F.expr(ts._dup_set_ssql(f"gh{n}")))
        )
        pairs.append(
            (
                f"fl{n}",
                ts._flag_col(f"gh{n}", f"dupset{n}"),
                F.expr(ts._flag_ssql(f"gh{n}", f"dupset{n}")),
            )
        )
        # r13 sort-adjacency flag rewrite == the dupset+contains form
        pairs.append(
            (
                f"nf{n}",
                ts._flag_col(f"gh{n}", f"dupset{n}"),
                F.expr(ts._flag_from_gh_ssql(f"gh{n}")),
            )
        )
        pairs.append(
            (
                f"dg{n}",
                ts._dup_gram_frac(f"f{n}", n),
                F.expr(ts._dup_gram_ssql(f"f{n}", n)),
            )
        )
    for n in ts.TOP_NGRAM_NS:
        pairs.append(
            (
                f"tg{n}",
                ts._top_gram_frac(f"gh{n}", n),
                F.expr(ts._top_gram_ssql(f"gh{n}", n)),
            )
        )
        # r13 single-pass run-length argmax == the per-distinct rescan
        pairs.append(
            (
                f"tgf{n}",
                ts._top_gram_frac(f"gh{n}", n),
                F.expr(ts._top_gram_fast_ssql(f"gh{n}", n)),
            )
        )
    for sep, tag in (("\n", "l"), ("\n\n", "p")):
        ct, cn = ts.dedup_lines(F.col("text"), sep)
        st, sn = ts._dedup_lines_ssql("text", sep)
        pairs.append((f"dl{tag}t", ct, F.expr(st)))
        pairs.append((f"dl{tag}n", cn, F.expr(sn)))
    crt, crn = ts.collapse_runs(F.col("toks"))
    srt, srn = ts._collapse_runs_ssql("toks")
    pairs.append(("crt", crt, F.expr(srt)))
    pairs.append(("crn", crn, F.expr(srn)))
    rows = df.select(
        "doc_id", *[c.alias(f"c_{lbl}") for lbl, c, _ in pairs],
        *[s.alias(f"s_{lbl}") for lbl, _, s in pairs],
    ).collect()
    for r in rows:
        for lbl, _, _ in pairs:
            assert r[f"c_{lbl}"] == r[f"s_{lbl}"], (
                f"doc {r['doc_id']} builder {lbl}: "
                f"{r[f'c_{lbl}']!r} != {r[f's_{lbl}']!r}"
            )


def test_max_token_ratio_run_length_fold_equivalence(spark):
    """r13: max_token_ratio's max count = the longest run of the
    sorted token array (single-pass fold) — pinned against the r3
    per-distinct rescan form on a randomized corpus with heavy
    duplication, unicode, single-token and empty/NULL docs."""
    import random

    from flink_parameter_server_spark.functions.text import tokens
    from flink_parameter_server_spark.plans import REGISTRY
    from tests.conftest import SF_SMALL

    rng = random.Random(7)
    vocab = ["a", "bb", "ccc", "ünï", "zzzz", "the"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 60)))
        for _ in range(150)
    ] + [None, "", "solo", "x x x x"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).select("doc_id", tokens(F.col("text")).alias("toks"))
    old = (
        "CASE WHEN size(toks) > 0 THEN round(CAST(array_max(transform("
        "array_distinct(toks), d -> CAST(size(filter(toks, x -> x = d))"
        " AS BIGINT))) AS DOUBLE) / CAST(size(toks) AS BIGINT), 6) END"
    )
    new = (
        "CASE WHEN size(toks) > 0 THEN round(CAST("
        "aggregate(array_sort(toks), named_struct('prev',"
        " CAST(NULL AS STRING), 'cur', 0L, 'best', 0L),"
        " (acc, x) -> CASE WHEN acc.prev IS NOT NULL AND x = acc.prev"
        " THEN named_struct('prev', x, 'cur', acc.cur + 1L,"
        " 'best', greatest(acc.best, acc.cur + 1L))"
        " ELSE named_struct('prev', x, 'cur', 1L,"
        " 'best', greatest(acc.best, 1L)) END,"
        " acc -> acc.best)"
        " AS DOUBLE) / CAST(size(toks) AS BIGINT), 6) END"
    )
    rows = df.selectExpr("doc_id", f"{old} AS o", f"{new} AS n").collect()
    for r in rows:
        assert r["o"] == r["n"], f"doc {r['doc_id']}: {r['o']} != {r['n']}"
    # and the registry entry still produces the column (fixture run)
    prof = REGISTRY["text_profile"].fn(spark, SF_SMALL)
    assert prof.where("max_token_ratio IS NOT NULL").count() > 0
