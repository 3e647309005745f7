"""q84-q86/q92/q93 heuristic-quality operators: planted-gate
expectations (each C4 gate, Luhn validation vs lookalikes, readability
extremes, one-gate-per-planted-page funnel attrition, sentence-dedup
edge shapes), a hypothesis cross-check of the Luhn Column expression
against a reference Python implementation, and plan pins (the in-row
ops must never shuffle). Oracle parity itself runs via test_oracle.py's
all_oracles() parametrization."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from alt_spark.plans import audit
from alt_spark.queries import all_queries
from tests.conftest import SF_SMOKE


def _by_id(rows, idx=0):
    return {r[idx]: r for r in rows}


# ------------------------------------------------------------------- q84 C4
def test_c4_planted_gates(spark):
    rows = _by_id(
        all_queries()["q84_c4_filters"](spark, SF_SMOKE)
        .filter(F.col("doc_id") < 0)
        .collect()
    )
    # (doc_id, n_lines, n_kept, page_kept, clean_md5)
    assert rows[-31]["n_kept"] == 4 and rows[-31]["page_kept"] == 1
    # short line, no-terminal line, javascript line all dropped
    assert rows[-32]["n_lines"] == 6 and rows[-32]["n_kept"] == 3
    assert rows[-32]["page_kept"] == 1
    # lorem ipsum / curly brace kill the PAGE despite surviving lines
    assert rows[-33]["n_kept"] == 3 and rows[-33]["page_kept"] == 0
    assert rows[-34]["n_kept"] == 3 and rows[-34]["page_kept"] == 0
    # two surviving sentences is under the 3-sentence floor
    assert rows[-35]["n_kept"] == 2 and rows[-35]["page_kept"] == 0
    # empty page: one empty line, nothing kept
    assert rows[-36]["n_lines"] == 1 and rows[-36]["n_kept"] == 0
    assert rows[-36]["page_kept"] == 0
    # CRLF page behaves exactly like its LF twin -31 (same clean_md5:
    # \r?\n split + LF rejoin normalizes the line endings away)
    assert rows[-37]["n_kept"] == 4 and rows[-37]["page_kept"] == 1
    assert rows[-37]["clean_md5"] == rows[-31]["clean_md5"]


def test_c4_kept_text_is_order_preserving(spark):
    """-32 keeps exactly the three good lines in original order — its
    md5 must equal -34's (same three good lines survive there)."""
    rows = _by_id(
        all_queries()["q84_c4_filters"](spark, SF_SMOKE)
        .filter(F.col("doc_id").isin(-32, -34))
        .collect()
    )
    assert rows[-32]["clean_md5"] == rows[-34]["clean_md5"]


def test_c4_natural_corpus_is_unkept_but_counted(spark):
    """The synthetic corpus is single-line, punctuation-free prose:
    every natural doc must appear (complete surface) with its line
    dropped and the page unkept — no silent row loss."""
    out = all_queries()["q84_c4_filters"](spark, SF_SMOKE).filter(
        F.col("doc_id") >= 0
    )
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum("n_kept").alias("kept"),
        F.sum("page_kept").alias("pages"),
    ).first()
    n_docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    )
    assert agg["n"] == n_docs
    assert agg["kept"] == 0 and agg["pages"] == 0


def test_q84_shuffle_free(spark):
    """C4 cleaning is in-row by design: narrow projection over the scan
    plus the planted local union; the only exchange is the presentation
    sort (rangepartitioning), never a hash shuffle or Python eval."""
    df = all_queries()["q84_c4_filters"](spark, SF_SMOKE)
    plan = audit.physical_plan(df)
    assert audit.shuffle_count(df) <= 1, plan  # presentation sort only
    assert "hashpartitioning" not in plan.lower(), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------------------- q85 PAN/Luhn
def _luhn_ref(digits: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def test_pan_planted_expectations(spark):
    rows = _by_id(
        all_queries()["q85_pan_luhn_audit"](spark, SF_SMOKE).collect()
    )
    assert rows[-41]["n_valid"] == 1 and rows[-41]["valid_last4"] == "1111"
    # separators stripped before validation
    assert rows[-42]["n_valid"] == 1 and rows[-42]["valid_last4"] == "1111"
    # Luhn-failing lookalike: candidate but NOT valid
    assert rows[-43]["n_candidates"] == 1 and rows[-43]["n_valid"] == 0
    assert rows[-43]["valid_last4"] == ""
    # 10-digit phone is never a candidate -> row filtered out entirely
    assert -44 not in rows
    # 15-digit Amex validates
    assert rows[-45]["n_valid"] == 1 and rows[-45]["valid_last4"] == "0005"
    # two cards, match order preserved
    assert rows[-46]["n_candidates"] == 2 and rows[-46]["n_valid"] == 2
    assert rows[-46]["valid_last4"] == "1111|4444"
    # space-ADJACENT cards: the 32-digit run splits back into both
    assert rows[-47]["n_candidates"] == 2 and rows[-47]["n_valid"] == 2
    assert rows[-47]["valid_last4"] == "1111|4444"
    # internally-spaced card: one candidate, not 4-digit fragments
    assert rows[-48]["n_candidates"] == 1 and rows[-48]["n_valid"] == 1
    assert rows[-48]["valid_last4"] == "1111"


def test_pan_natural_corpus_has_no_digit_runs(spark):
    """The generated corpus is alphabetic prose — only planted rows may
    surface (if this ever fails, the generator grew digit runs and the
    planted expectations above need a fresh look, not the operator)."""
    out = all_queries()["q85_pan_luhn_audit"](spark, SF_SMOKE)
    assert out.filter(F.col("doc_id") >= 0).count() == 0


@settings(max_examples=25, deadline=None)
@given(st.text(alphabet="0123456789", min_size=13, max_size=19))
def test_luhn_column_matches_reference(digit_string):
    """The Column-expression Luhn must agree with a direct Python
    implementation on arbitrary digit strings (session-free check: the
    expression is evaluated through a one-row DataFrame built on the
    shared session at collection time)."""
    from alt_spark.functions.text_analysis import luhn_ok
    from alt_spark.session import get_session

    spark = get_session("alt_spark-tests", shuffle_partitions=8)
    got = (
        spark.range(1)
        .select(luhn_ok(F.lit(digit_string)).alias("ok"))
        .first()["ok"]
    )
    assert got == _luhn_ref(digit_string)


def test_q85_shuffle_free(spark):
    df = all_queries()["q85_pan_luhn_audit"](spark, SF_SMOKE)
    plan = audit.physical_plan(df)
    assert audit.shuffle_count(df) <= 1, plan  # presentation sort only
    assert "hashpartitioning" not in plan.lower(), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------- q86 readability
def test_flesch_planted_extremes(spark):
    out = _by_id(
        all_queries()["q86_readability_bands"](spark, SF_SMOKE)
        .filter(F.col("source") == "planted")
        .collect(),
        idx=1,
    )
    # monosyllabic staccato rows land in the top band …
    assert "very_easy" in out
    assert out["very_easy"]["n_docs"] == 2
    # … and the unpunctuated latinate run lands deeply negative
    assert "dense" in out
    assert out["dense"]["min_score"] < 0


def test_flesch_score_is_exact_integer_surface(spark):
    """Known-value pin: 'Go. Run. Sit. Eat. Nap.' has W=5, S=5, Y=5 ->
    206835 - (1015*5)//5 - (84600*5)//5 = 121220 exactly."""
    from alt_spark.functions.text_analysis import flesch_milli

    row = (
        spark.range(1)
        .select(flesch_milli(F.lit("Go. Run. Sit. Eat. Nap.")).alias("f"))
        .select("f.*")
        .first()
    )
    assert (row["n_words"], row["n_sentences"], row["n_syllables"]) == (5, 5, 5)
    assert row["score_milli"] == 206835 - 1015 - 84600


def test_q86_single_aggregate_plan(spark):
    """One hash aggregate on (source, band): the scan side is in-row,
    so the plan carries exactly one aggregation exchange plus the
    presentation sort — no join, no Python."""
    df = all_queries()["q86_readability_bands"](spark, SF_SMOKE)
    plan = audit.physical_plan(df)
    assert audit.shuffle_count(df) <= 2, plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------------------ q92 gate funnel
def test_funnel_planted_rows_each_fail_one_stage(spark):
    """The planted page set is a basis for the gate chain: one page
    passes everything and each other page fails exactly one labelled
    gate, so the cumulative columns must drop by exactly one document
    per stage."""
    row = (
        all_queries()["q92_gate_funnel"](spark, SF_SMOKE)
        .filter(F.col("source") == "planted")
        .first()
    )
    assert row["n_docs"] == 5
    assert row["v_docs"] == 4  # -75 fails the length floors
    assert row["vg_docs"] == 3  # -73 fails Gopher (ellipsis/symbol caps)
    assert row["vgc_docs"] == 2  # -74 fails C4 (no terminal punctuation)
    assert row["kept_docs"] == 1  # -72 fails the PAN gate; -71 survives
    # standalone gate counts: -75 fails gopher+c4 too, -72 only PAN
    assert row["gopher_pass"] == 3  # -71, -72, -74
    assert row["c4_pass"] == 3  # -71, -72, -73
    assert row["pan_free"] == 4  # all but -72


def test_funnel_is_monotone_in_docs_and_tokens(spark):
    """Cumulative stage columns can only shrink — per source, docs and
    tokens both: n >= valid >= +gopher >= +c4 >= kept."""
    for r in all_queries()["q92_gate_funnel"](spark, SF_SMOKE).collect():
        assert (
            r["n_docs"] >= r["v_docs"] >= r["vg_docs"]
            >= r["vgc_docs"] >= r["kept_docs"]
        ), r
        assert (
            r["tok_sum"] >= r["v_toks"] >= r["vg_toks"]
            >= r["vgc_toks"] >= r["kept_toks"]
        ), r
        assert r["kept_docs"] >= 0 and r["kept_toks"] >= 0


def test_q92_single_aggregate_plan(spark):
    """Every gate flag is an in-row Column over one corpus scan; the
    plan is one hash aggregate on source plus the presentation sort —
    no join, no Python eval."""
    df = all_queries()["q92_gate_funnel"](spark, SF_SMOKE)
    plan = audit.physical_plan(df)
    assert audit.shuffle_count(df) <= 2, plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# -------------------------------------------------------- q93 sentence dedup
def test_sentence_dedup_planted_shapes(spark):
    import hashlib

    rows = _by_id(
        all_queries()["q93_sentence_dedup"](spark, SF_SMOKE)
        .filter(F.col("doc_id") < 0)
        .collect()
    )
    # triple repetition: first occurrence survives, order preserved
    assert rows[-81]["n_sent"] == 5 and rows[-81]["n_uniq"] == 4
    assert rows[-81]["saved_permyriad"] == 10000 * 1 // 5
    survivors = "We go now.|We stay here.|We go now!|The end is near."
    assert (
        rows[-81]["dedup_md5"]
        == hashlib.md5(survivors.encode()).hexdigest()
    )
    # no duplicates: everything survives, zero savings
    assert rows[-82]["n_sent"] == 3 and rows[-82]["n_uniq"] == 3
    assert rows[-82]["saved_permyriad"] == 0
    # unterminated run and empty page: zero sentences, guarded division
    for did in (-83, -84):
        assert rows[did]["n_sent"] == 0 and rows[did]["n_uniq"] == 0
        assert rows[did]["saved_permyriad"] == 0
    # terminator matters: 'We go.' vs 'We go!' are distinct sentences
    assert rows[-85]["n_sent"] == 3 and rows[-85]["n_uniq"] == 2
    assert rows[-85]["saved_permyriad"] == 10000 // 3


def test_sentence_dedup_constructed_corpus_duplication(spark):
    """The constructed pages inject a duplicate sentence for doc_id%2==0
    and doc_id%3==0: those documents MUST save at least one sentence,
    and documents divisible by neither must save nothing (their three
    sentences carry distinct terminators even when the words collide)."""
    out = (
        all_queries()["q93_sentence_dedup"](spark, SF_SMOKE)
        .filter(F.col("doc_id") >= 0)
        .select("doc_id", "n_sent", "n_uniq")
        .collect()
    )
    assert out, "natural corpus must be present"
    for r in out:
        dup_injected = r["doc_id"] % 2 == 0 or r["doc_id"] % 3 == 0
        if dup_injected:
            assert r["n_sent"] - r["n_uniq"] >= 1, r
        else:
            assert r["n_sent"] == r["n_uniq"] == 3, r


def test_q93_shuffle_free(spark):
    """Segmentation + first-occurrence keep are both in-row; only the
    presentation sort may exchange, and nothing drops to Python."""
    df = all_queries()["q93_sentence_dedup"](spark, SF_SMOKE)
    plan = audit.physical_plan(df)
    assert audit.shuffle_count(df) <= 1, plan
    assert "hashpartitioning" not in plan.lower(), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
