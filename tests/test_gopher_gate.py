"""Gopher Table A1 threshold gate (r13, VERDICT r12 #2): per-rule
sole-rejector corpus, first-failing-rule labeling, Spark/DuckDB gate
parity, and the fixture receipt behind GOPHER_FIXTURE_RULES.

Corpus design notes (why some rules cannot be STRICTLY sole under the
published definitions):
- a duplicated PARAGRAPH is always a set of duplicated LINES with the
  same characters, so dup_para_char_frac > 0.2 forces
  dup_line_char_frac > ~0.2 — the para-char rule can never be the
  first-failing rule of the full set; it is pinned via the rule-subset
  parameter instead (and its full-set label is asserted to be the
  line-level rule, the correct first fail).
- dup_{6..10}gram rules CAN be strictly sole: a duplicated n-window
  duplicates its (n-1)-subwindows, but both cover the same token
  positions, so the char-coverage fractions are EQUAL — placing that
  fraction inside (threshold_n, threshold_{n-1}] fails exactly rule n.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_parameter_server_spark.operators._gopher_core import (
    GOPHER_FIXTURE_RULES,
    GOPHER_REQUIRED_WORDS,
    GOPHER_RULES,
    gopher_gate_sql,
    gopher_reason_case_sql,
    gopher_reason_frame,
    gopher_signal_frame,
)

SIG_COLS = sorted({s for _, cl in GOPHER_RULES for s, _, _ in cl})


def _fill(tag: str, k: int, ln: int = 6) -> list[str]:
    """k distinct alphabetic filler words of length ~ln, unique per tag."""
    return [f"{tag}{i:0{ln - len(tag)}d}" for i in range(k)]


def _spread(base: list[str], insert: list[str], every: int) -> list[str]:
    out, j = [], 0
    for i, w in enumerate(base):
        out.append(w)
        if i % every == every - 1 and j < len(insert):
            out.append(insert[j])
            j += 1
    out.extend(insert[j:])
    return out


def _corpus():
    """[(doc_id, text, target_rule|None, strict)] — one violator per
    rule; `strict` means the target is the ONLY failing rule."""
    docs = []

    def add(text, target, strict=True):
        docs.append((len(docs), text, target, strict))

    add(" ".join(["the", "of"] + _fill("base", 60)), None)  # 0: passes all
    add(" ".join(["the", "of"] + _fill("wc", 30)), "word_count")
    two = [a + b for a in "cdfghjklmnpqrs" for b in "aeiou"][:58]
    add(" ".join(["the", "of"] + two), "mean_word_len")
    add(" ".join(_spread(["the", "of"] + _fill("sym", 60), ["#"] * 8, 7)),
        "symbol_word_ratio")
    bl = _fill("blt", 50)
    add("\n".join("- " + ("the of " if i == 0 else "") +
                  " ".join(bl[i * 5:(i + 1) * 5]) + " "
                  for i in range(10)),
        "bullet_line_frac")
    el = _fill("ell", 60)
    add("\n".join(" ".join(el[i * 6:(i + 1) * 6]) +
                  ("..." if i < 4 else "") + (" the of" if i == 9 else "")
                  for i in range(10)),
        "ellipsis_line_frac")
    add(" ".join(["the", "of"] + _fill("alp", 45) +
                 [str(900 + i) for i in range(15)]),
        "alpha_word_frac")
    add(" ".join(["the"] + _fill("stp", 60)), "stopwords")
    # 8: dup_line_frac — five tiny duplicate 'zz' lines (trailing-space
    # line style keeps whitespace tokens intact), 4/12 lines removed,
    # removed chars negligible
    dl = _fill("dln", 63)
    lines = [" ".join(dl[i * 9:(i + 1) * 9]) + (" the of " if i == 0 else " ")
             for i in range(7)]
    lines[6:6] = ["zz "] * 5
    add("\n".join(lines), "dup_line_frac")
    # 9: dup_para_frac — 1 of 3 paragraphs duplicated (1/3 > 0.3) while
    # the line-count fraction stays at 3/12 = 0.25 (blank separator
    # lines duplicate once, the dup para's two short lines once each)
    pa = _fill("par", 48)
    para_a = "\n".join(("the of " if i == 0 else "") +
                       " ".join(pa[i * 6:(i + 1) * 6]) for i in range(8))
    para_b = "qa qb \nqc qd "
    add(para_a + "\n\n" + para_b + "\n\n" + para_b, "dup_para_frac")
    # 10: dup_line_char_frac — two BIG single-token lines duplicated:
    # 2/9 lines removed (<= 0.3) but ~24% of characters
    big_a, big_b = "A" * 140, "B" * 140
    fl = _fill("big", 114, ln=4)
    toks = (["the", "of"] + fl[:28] + [f"\n{big_a}\n"] + fl[28:56]
            + [f"\n{big_a}\n"] + fl[56:84] + [f"\n{big_b}\n"]
            + fl[84:110] + [f"\n{big_b}\n"] + fl[110:])
    add(" ".join(toks), "dup_line_char_frac")
    # 11: dup_para_char_frac — a duplicated BIG paragraph; NOT strict
    # (its lines duplicate with the same chars, so the line-level
    # count/char rules fire first — see module docstring)
    pf = _fill("pch", 40)
    big_p = "P" * 120
    add(" ".join(["the", "of"] + pf) + "\n\n" + big_p + "\n\n" + big_p,
        "dup_para_char_frac", strict=False)
    # 12-14: top_{2,3,4}gram — a dominant word n-gram repeated with
    # DISTINCT neighbors so no higher-n window duplicates
    t2 = _fill("tga", 50)
    add(" ".join(_spread(["the", "of"] + t2, ["abcdef ghijkl"] * 10, 5)),
        "top_2gram_char_frac")
    t3 = _fill("tgb", 40)
    add(" ".join(_spread(["the", "of"] + t3, ["aaaa bbbb cccc"] * 6, 6)),
        "top_3gram_char_frac")
    t4 = _fill("tgc", 45)
    add(" ".join(_spread(["the", "of"] + t4, ["aa bb cc dd"] * 7, 6)),
        "top_4gram_char_frac")
    # 15-20: dup_{5..10}gram — ALL tokens 4 chars ('that'/'have' are
    # the two required words, both 4 chars), one duplicated n-window;
    # char coverage = 2n/N exactly, placed in (thr_n, thr_{n-1}]
    # every token EXACTLY 4 chars so char coverage is 2n/N exactly:
    # fillers "<letter>NNN", window tokens "k<n%10>NN"
    tags = {5: "v", 6: "w", 7: "x", 8: "y", 9: "z", 10: "u"}
    for n, N in ((5, 60), (6, 84), (7, 105), (8, 130), (9, 160), (10, 190)):
        win = [f"k{n % 10}{j:02d}" for j in range(n)]
        fill = _fill(tags[n], N - 2 * n - 2, ln=4)
        mid = len(fill) // 2
        toks = (["that", "have"] + fill[:mid] + win + fill[mid:mid + 20]
                + win + fill[mid + 20:])
        add(" ".join(toks), f"dup_{n}gram_char_frac")
    return docs


def _py_fails(row) -> list[str]:
    """Evaluate every Table A1 rule clause in Python from a signal-frame
    row — the independent oracle for sole-ness and first-fail order."""
    out = []
    for name, clauses in GOPHER_RULES:
        hit = False
        for sig, op, bound in clauses:
            v = row[sig]
            if v is None:
                continue
            b = float(bound)
            if (op == "<" and v < b) or (op == ">" and v > b):
                hit = True
        if hit:
            out.append(name)
    return out


@pytest.fixture(scope="module")
def gate_corpus(spark):
    docs = _corpus()
    df = spark.createDataFrame(
        [(i, t) for i, t, _, _ in docs], "doc_id long, text string"
    )
    sig = {
        r["doc_id"]: r
        for r in gopher_signal_frame(df).select("doc_id", *SIG_COLS).collect()
    }
    return docs, df, sig


def test_each_rule_is_the_sole_rejector(spark, gate_corpus):
    docs, df, sig = gate_corpus
    # (a) python-evaluated sole-ness per doc
    for i, _, target, strict in docs:
        fails = _py_fails(sig[i])
        if target is None:
            assert fails == [], f"doc {i} (clean) fails {fails}"
        else:
            assert target in fails, f"doc {i}: {target} not in {fails}"
            if strict:
                assert fails == [target], f"doc {i}: not sole — {fails}"
    # (b) the full-set gate labels every doc with its first failing rule
    reasons = {
        r["doc_id"]: r["g_reason"]
        for r in gopher_reason_frame(df, True).collect()
    }
    for i, _, target, strict in docs:
        fails = _py_fails(sig[i])
        want = fails[0] if fails else None
        assert reasons[i] == want, f"doc {i}: {reasons[i]} != {want}"
        if strict and target is not None:
            assert reasons[i] == target
    # (c) single-rule subsets label exactly the target (covers the
    # para-char rule the full set can never reach) — one job, one CASE
    # column per rule over the shared signal frame
    single = gopher_signal_frame(df).selectExpr(
        "doc_id",
        *[
            f"{gopher_reason_case_sql((name,))} AS r_{name}"
            for name, _ in GOPHER_RULES
        ],
    )
    rows = {r["doc_id"]: r for r in single.collect()}
    for i, _, target, _ in docs:
        if target is None:
            for name, _ in GOPHER_RULES:
                assert rows[i][f"r_{name}"] is None
        else:
            assert rows[i][f"r_{target}"] == target, f"doc {i}"
    # clean doc passes the full set too
    assert reasons[0] is None


def test_gate_spark_duckdb_parity(spark, duck, gate_corpus):
    """The SAME corpus through gopher_gate_sql's DuckDB CTE chain must
    label every doc identically to the Spark gate (the cross-engine pin
    behind the curate oracle extension)."""
    import pandas as pd

    docs, df, _ = gate_corpus
    duck.register("gdocs_py", pd.DataFrame(
        {"doc_id": [i for i, *_ in docs], "text": [t for _, t, *_ in docs]}
    ))
    sql = (
        "WITH gd AS (SELECT doc_id, text FROM gdocs_py),\n"
        + gopher_gate_sql("gd", True)
        + "\nSELECT doc_id, reason FROM greason"
    )
    want = {i: r for i, r in duck.execute(sql).fetchall()}
    got = {
        r["doc_id"]: r["g_reason"]
        for r in gopher_reason_frame(df, True).collect()
    }
    assert got == want


def test_fixture_stopword_receipt(spark):
    """The receipt behind GOPHER_FIXTURE_RULES: the synthetic fixture
    vocabulary contains at most ONE of the eight required English
    function words, so the published stopword-containment rule alone
    rejects every document — which is why the flagship 'curated' part
    runs the Table A1 set minus 'stopwords' (the rule itself is
    exercised above)."""
    from flink_parameter_server_spark.operators._util import t
    from tests.conftest import SF_SMALL

    d = t(spark, SF_SMALL, "documents").select("doc_id", "text")
    n = d.count()
    rej = (
        gopher_reason_frame(d, ("stopwords",))
        .where(F.col("g_reason") == "stopwords")
        .count()
    )
    assert rej == n
    assert GOPHER_FIXTURE_RULES == tuple(
        name for name, _ in GOPHER_RULES if name != "stopwords"
    )
    assert GOPHER_REQUIRED_WORDS == (
        "the", "be", "to", "of", "and", "that", "have", "with"
    )
