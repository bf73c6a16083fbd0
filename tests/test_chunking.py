"""Behavioral tests for the LLM-corpus preparation operators."""

from __future__ import annotations

import collections

from pyspark.sql import Row
from pyspark.sql import functions as F

from sql_database_to_elastic_datalake_spark.operators.chunking import (
    chunk_documents,
    pack_by_token_budget,
    redact_pii,
    stratified_sample,
)


def _docs(spark, *texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_chunk_windows_cover_all_tokens(spark):
    text = " ".join(f"w{i}" for i in range(10))
    out = chunk_documents(
        _docs(spark, text), "doc_id", "text", chunk_size=4, stride=2
    ).collect()
    # n=10, size=4, stride=2 → ceil(6/2)+1 = 4 windows
    assert [r["chunk_idx"] for r in out] == [0, 1, 2, 3]
    assert out[0]["chunk"] == "w0 w1 w2 w3"
    assert out[1]["chunk"] == "w2 w3 w4 w5"
    assert out[3]["chunk"] == "w6 w7 w8 w9"
    assert [r["n_tokens"] for r in out] == [4, 4, 4, 4]
    # every token appears in at least one chunk
    covered = {t for r in out for t in r["chunk"].split()}
    assert covered == {f"w{i}" for i in range(10)}


def test_chunk_short_doc_single_window(spark):
    out = chunk_documents(
        _docs(spark, "a b"), "doc_id", "text", chunk_size=8, stride=4
    ).collect()
    assert len(out) == 1
    assert out[0]["chunk"] == "a b" and out[0]["n_tokens"] == 2


def test_pack_by_token_budget_contiguous(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, n=40) for i in range(10)]
    )
    out = pack_by_token_budget(df, "doc_id", F.col("n"), budget=100).collect()
    out.sort(key=lambda r: r["doc_id"])
    # starts: 0,40,80,120,… → batches 0,0,0,1,1,2,2,2,3,3
    assert [r["batch_id"] for r in out] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]
    # batch ids are non-decreasing in doc order and every batch's start
    # offset is within budget of the batch boundary
    assert all(b >= 0 for b in (r["batch_id"] for r in out))


def test_redact_pii_counts_and_text(spark):
    out = redact_pii(
        _docs(
            spark,
            "mail me at a.b+c@x-corp.io or call 555-123-4567 now",
            "no pii here",
        ),
        "text",
    ).collect()
    out.sort(key=lambda r: r["doc_id"])
    assert out[0]["clean_text"] == "mail me at <EMAIL> or call <PHONE> now"
    assert out[0]["n_emails"] == 1 and out[0]["n_phones"] == 1
    assert out[1]["clean_text"] == "no pii here"
    assert out[1]["n_emails"] == 0 and out[1]["n_phones"] == 0


def test_redact_pii_wide_rule_set(spark):
    """r11 (verdict #6): SSN / IPv4 / IPv6 / credit-card redaction —
    the Luhn gate redacts valid cards (grouped and bare) and leaves
    Luhn-invalid digit runs untouched; per-type accounting; unicode-
    adjacent digits still match ([0-9] + ASCII \\b in both engines)."""
    texts = [
        "ssn 123-45-6789 also 987 65 4321 end",
        "v4 192.168.1.10 and 8.8.8.8 but ver 1.2.3 stays",
        "v6 2001:0db8:85a3:0000:0000:8a2e:0370:7334 time 12:30:45 ok",
        # 4539148803436467 is Luhn-valid; final digit 8 breaks it
        "card 4539 1488 0343 6467 bad 4539 1488 0343 6468",
        "bare 4539148803436467 and short 123456 stay-short",
        "unicode٣123-45-6789،edge",   # arabic digit/comma adjacency
    ]
    out = {r["doc_id"]: r
           for r in redact_pii(_docs(spark, *texts), "text").collect()}
    assert out[0]["clean_text"] == "ssn <SSN> also <SSN> end"
    assert out[0]["n_ssns"] == 2
    assert out[1]["clean_text"] == "v4 <IP> and <IP> but ver 1.2.3 stays"
    assert out[1]["n_ipv4s"] == 2
    assert out[2]["clean_text"] == "v6 <IP> time 12:30:45 ok"
    assert out[2]["n_ipv6s"] == 1 and out[2]["n_ipv4s"] == 0
    assert out[3]["clean_text"] \
        == "card <CREDIT_CARD> bad 4539 1488 0343 6468"
    assert out[3]["n_credit_cards"] == 1
    assert out[4]["clean_text"] == "bare <CREDIT_CARD> and short 123456 stay-short"
    assert out[4]["n_credit_cards"] == 1
    # ٣ is a non-ASCII-word char → \b boundary holds → SSN matches
    assert out[5]["clean_text"] == "unicode٣<SSN>،edge"
    assert out[5]["n_ssns"] == 1


def test_stratified_sample_deterministic_and_rate_shaped(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, grp="a" if i % 2 == 0 else "b") for i in range(400)]
    )
    picked = stratified_sample(df, "doc_id", "grp", rates={"a": 0.5})
    rows1 = sorted(r["doc_id"] for r in picked.collect())
    rows2 = sorted(
        r["doc_id"]
        for r in stratified_sample(
            df.repartition(7), "doc_id", "grp", rates={"a": 0.5}
        ).collect()
    )
    assert rows1 == rows2  # membership independent of partitioning
    by_grp = {
        r["grp"]: r["n"]
        for r in picked.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert by_grp.get("b") is None  # default rate 0 drops the stratum
    assert 60 <= by_grp["a"] <= 140  # ~50% of 200, hash-binomial spread


def test_leakage_safe_split_cluster_coherent(spark):
    """Every member of a near-dup cluster gets the same split; rates
    roughly follow the 90/5/5 thresholds at corpus level."""
    from sql_database_to_elastic_datalake_spark.operators.chunking import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame([Row(doc_id=i) for i in range(300)])
    # clusters of 3: 0,1,2 -> 0; 3,4,5 -> 3; ...
    clusters = spark.createDataFrame(
        [Row(doc_id=i, cluster_id=(i // 3) * 3) for i in range(300)]
    )
    out = leakage_safe_split(docs, clusters, "doc_id").collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    counts = collections.Counter(r["split"] for r in out)
    assert counts["train"] > counts["val"] + counts["test"]


def test_flag_contamination(spark):
    """Decontamination semantics: a doc flags iff it shares an 8-gram
    with a probe; shorter overlaps and sub-n texts never flag; every
    corpus doc appears in the output."""
    from sql_database_to_elastic_datalake_spark.operators.chunking import (
        flag_contamination,
    )

    probe_text = "the quick brown fox jumps over the lazy dog tonight"
    corpus = spark.createDataFrame([
        # full 8-gram overlap (words 1-8 of the probe), embedded
        Row(doc_id=1, text="PREFIX the quick brown fox jumps over the "
                           "lazy SUFFIX"),
        # only a 7-gram shared: below n, must NOT flag
        Row(doc_id=2, text="quick brown fox jumps over the lazy cats"),
        # exact probe duplicate (leaked benchmark)
        Row(doc_id=3, text=probe_text.upper()),  # case-folded match
        # unrelated
        Row(doc_id=4, text="completely different words entirely here "
                           "and then some more padding words"),
        # too short to carry any 8-gram
        Row(doc_id=5, text="tiny"),
    ])
    probes = spark.createDataFrame([Row(t=probe_text)])
    out = {r["doc_id"]: (r["n_hits"], r["contaminated"])
           for r in flag_contamination(
               corpus, "doc_id", "text", probes, "t", n=8).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1] == (1, True)
    assert out[2] == (0, False)
    assert out[3][1] is True and out[3][0] == 3  # all 3 probe 8-grams
    assert out[4] == (0, False)
    assert out[5] == (0, False)
    # the probe join side is broadcast (corpus never shuffles to meet it)
    plan = flag_contamination(
        corpus, "doc_id", "text", probes, "t", n=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_boilerplate_chunk_removal(spark):
    """r9: cross-doc repeated chunks drop; a doc repeating its OWN
    refrain is never self-flagged (distinct-doc counting); docs
    reassemble in chunk order; all-boilerplate docs yield ''."""
    from sql_database_to_elastic_datalake_spark.operators.chunking import (
        boilerplate_chunk_removal,
    )

    header = "terms of service apply"
    rows = [
        Row(doc_id=1, text=f"{header} alpha beta gamma delta"),
        Row(doc_id=2, text=f"{header} epsilon zeta eta theta"),
        Row(doc_id=3, text="unique words only here today"),
        Row(doc_id=4, text=f"{header}"),           # pure boilerplate
        Row(doc_id=5, text="echo echo echo echo echo echo echo echo"),
        Row(doc_id=6, text=None),                   # absent from output
    ]
    out = {r["doc_id"]: r for r in boilerplate_chunk_removal(
        spark.createDataFrame(rows), "doc_id", "text",
        chunk_size=4, min_docs=2).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1]["clean_text"] == "alpha beta gamma delta"
    assert out[1]["chunks_removed"] == 1
    assert out[1]["chars_removed"] == len(header)
    assert out[2]["clean_text"] == "epsilon zeta eta theta"
    assert out[3]["clean_text"] == "unique words only here today"
    assert out[3]["chunks_removed"] == 0
    # all chunks boilerplate → empty string, accounting intact
    assert out[4]["clean_text"] == "" and out[4]["chunks_removed"] == 1
    # self-repetition across a doc's own chunks is NOT boilerplate
    assert out[5]["chunks_removed"] == 0
    assert out[5]["clean_text"].count("echo") == 8
    assert out[5]["n_chunks"] == 2


def test_exact_substring_dedup(spark):
    """r11 (verdict #1): ExactSubstr-style variable-span removal — a
    duplicated run of ANY length ≥ k is removed whole (run extension
    through overlapping k-windows), within-doc repeats count as
    duplication, spans merge/split exactly at the k-gap boundary."""
    from sql_database_to_elastic_datalake_spark.operators.chunking import (
        exact_substring_dedup,
    )

    run = "d1 d2 d3 d4 d5"                    # 5-token duplicated run
    texts = [
        f"a0 a1 {run} a2 a3",                 # 0: run mid-doc
        f"b0 {run} b1 b2 b3 b4",              # 1: same run elsewhere
        "c0 c1 c2 c3 c4 c5 c6",               # 2: unique → untouched
        "e0 x y z q e1 x y z q e2",           # 3: WITHIN-doc repeat
        run,                                  # 4: whole doc duplicated
        f"{run} m0 m1 m2 m3 {run}",           # 5: two disjoint spans
        "f0 f1",                              # 6: shorter than k
        None,                                 # 7: NULL → absent
    ]
    out = {
        r["doc_id"]: r
        for r in exact_substring_dedup(
            _docs(spark, *texts), "doc_id", "text",
            k=3, min_occurrences=2,
        ).collect()
    }
    assert set(out) == {0, 1, 2, 3, 4, 5, 6}  # NULL text absent
    # the 5-token run is covered END TO END (its three 3-windows all
    # duplicate), not just one k-window
    assert out[0]["clean_text"] == "a0 a1 a2 a3"
    assert out[0]["tokens_removed"] == 5
    assert out[0]["n_spans_removed"] == 1
    assert out[1]["clean_text"] == "b0 b1 b2 b3 b4"
    # unique doc untouched
    assert out[2]["clean_text"] == texts[2]
    assert out[2]["tokens_removed"] == 0
    assert out[2]["n_spans_removed"] == 0
    # within-doc repetition IS duplication (site count, not doc count
    # — the boilerplate operator's distinct-doc rule differs)
    assert out[3]["clean_text"] == "e0 e1 e2"
    assert out[3]["tokens_removed"] == 8
    assert out[3]["n_spans_removed"] == 2
    # whole-doc duplicate → empty rebuild, full accounting
    assert out[4]["clean_text"] == ""
    assert out[4]["tokens_removed"] == 5
    assert out[4]["n_tokens"] == 5
    # two disjoint duplicated spans stay two spans
    assert out[5]["clean_text"] == "m0 m1 m2 m3"
    assert out[5]["n_spans_removed"] == 2
    # sub-k doc has no k-grams → untouched
    assert out[6]["clean_text"] == "f0 f1"
    assert out[6]["tokens_removed"] == 0


def test_exact_substring_dedup_adjacent_runs_merge(spark):
    """Two duplicated k-grams whose windows touch (start gap == k)
    merge into ONE maximal span; a gap of k+1 splits them."""
    from sql_database_to_elastic_datalake_spark.operators.chunking import (
        exact_substring_dedup,
    )

    # g1 and g2 are independent duplicated 2-grams placed adjacently
    # in doc 0 ("p q r s" = [p q][r s]) → one contiguous covered span
    texts = [
        "a0 p q r s a1",
        "b0 p q b1 b2 r s b3",   # the two grams duplicated separately
    ]
    out = {
        r["doc_id"]: r
        for r in exact_substring_dedup(
            _docs(spark, *texts), "doc_id", "text",
            k=2, min_occurrences=2,
        ).collect()
    }
    assert out[0]["tokens_removed"] == 4
    assert out[0]["n_spans_removed"] == 1       # merged
    assert out[1]["n_spans_removed"] == 2       # split by the gap
    assert out[1]["clean_text"] == "b0 b1 b2 b3"


def test_remove_probe_spans(spark):
    """r11: surgical decontamination — spans shared with a probe doc
    are removed (run extension included), matching is case-folded but
    the rebuild keeps original tokens, non-matching docs untouched."""
    from sql_database_to_elastic_datalake_spark.operators.chunking import (
        remove_probe_spans,
    )

    leak = "what is the capital of france"           # 6-token probe run
    texts = [
        f"intro text {leak} outro text",              # 0: exact leak
        f"intro text {leak.upper()} outro text",      # 1: case-folded
        "totally unrelated document body here",       # 2: untouched
        leak,                                         # 3: pure leak
        f"{leak} bridge words {leak}",                # 4: two spans
    ]
    docs = _docs(spark, *texts)
    probes = spark.createDataFrame([(leak,)], "ptext string")
    out = {r["doc_id"]: r for r in remove_probe_spans(
        docs, "doc_id", "text", probes, "ptext", k=3).collect()}
    assert out[0]["clean_text"] == "intro text outro text"
    assert out[0]["tokens_removed"] == 6
    assert out[0]["n_spans_removed"] == 1
    # case-folded match, ORIGINAL tokens rebuilt (outro kept verbatim)
    assert out[1]["clean_text"] == "intro text outro text"
    assert out[2]["clean_text"] == texts[2]
    assert out[2]["tokens_removed"] == 0
    assert out[3]["clean_text"] == "" and out[3]["tokens_removed"] == 6
    assert out[4]["n_spans_removed"] == 2
    assert out[4]["clean_text"] == "bridge words"
    # sub-k probes contribute no grams; sub-k docs are untouched
    out2 = {r["doc_id"]: r for r in remove_probe_spans(
        docs, "doc_id", "text", probes, "ptext", k=7).collect()}
    assert all(r["tokens_removed"] == 0 for r in out2.values())


def test_exact_substring_dedup_adversarial_all_identical(spark):
    """Adversarial skew: EVERY doc is the same 40-token text — every
    k-gram lands in one hash partition (the documented window-skew
    case) and every token is covered; the job must survive and zero
    out every doc."""
    from sql_database_to_elastic_datalake_spark.operators.chunking import (
        exact_substring_dedup,
    )

    text = " ".join(f"w{i}" for i in range(40))
    out = exact_substring_dedup(
        _docs(spark, *([text] * 200)), "doc_id", "text",
        k=25, min_occurrences=2,
    ).collect()
    assert len(out) == 200
    assert all(r["clean_text"] == "" for r in out)
    assert all(r["tokens_removed"] == 40 for r in out)
    assert all(r["n_spans_removed"] == 1 for r in out)


# ---------------------------------------------------------------------------
# resample_to_mixture (late r11 — mixture materialization)
# ---------------------------------------------------------------------------

def _domains(spark, spec):
    """spec: {domain: n_rows} → (id, domain) frame with global ids."""
    rows, i = [], 0
    for dom, n in sorted(spec.items()):
        for _ in range(n):
            rows.append((i, dom))
            i += 1
    return spark.createDataFrame(rows, "id long, dom string")


def test_resample_hits_rounded_targets(spark):
    from sql_database_to_elastic_datalake_spark.operators.chunking import (
        resample_to_mixture,
    )

    df = _domains(spark, {"a": 10, "b": 40})
    out = resample_to_mixture(
        df, "id", "dom", {"a": 3.0, "b": 1.0}).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["dom"], []).append(r)
    # N_total=50: a -> round(3/4*50)=38 from 10 docs, b -> round(1/4*50)=13
    assert len(by_dom["a"]) == 38 and len(by_dom["b"]) == 13
    # copies spread evenly: every a-doc 3 or 4 copies (38 = 10*3 + 8)
    from collections import Counter

    a_copies = Counter(r["id"] for r in by_dom["a"])
    assert sorted(a_copies.values()) == [3] * 2 + [4] * 8
    assert set(Counter(r["id"] for r in by_dom["b"]).values()) == {1}
    # copy indices are dense per doc
    for rid, n in a_copies.items():
        got = sorted(r["copy"] for r in by_dom["a"] if r["id"] == rid)
        assert got == list(range(n))


def test_resample_drops_unlisted_domains_and_is_deterministic(spark):
    from sql_database_to_elastic_datalake_spark.operators.chunking import (
        resample_to_mixture,
    )

    df = _domains(spark, {"a": 5, "zzz": 20})
    out1 = resample_to_mixture(df, "id", "dom", {"a": 1.0})
    rows1 = sorted((r["id"], r["copy"]) for r in out1.collect())
    assert all(True for _ in rows1)
    assert {r for r, _ in rows1} <= set(range(5))
    # target = round(1/1 * 25) = 25 copies over 5 docs -> 5 each
    assert len(rows1) == 25
    rows2 = sorted(
        (r["id"], r["copy"])
        for r in resample_to_mixture(
            df.repartition(7), "id", "dom", {"a": 1.0}).collect())
    assert rows1 == rows2


def test_resample_rejects_nonpositive_weights(spark):
    import pytest as _pytest

    from sql_database_to_elastic_datalake_spark.operators.chunking import (
        resample_to_mixture,
    )

    df = _domains(spark, {"a": 1})
    with _pytest.raises(ValueError, match="positive"):
        resample_to_mixture(df, "id", "dom", {"a": 0.0})


def test_resample_plan_no_global_sort(spark):
    from sql_database_to_elastic_datalake_spark.operators.chunking import (
        resample_to_mixture,
    )
    from sql_database_to_elastic_datalake_spark.plans.audit import audit

    df = _domains(spark, {"a": 5, "b": 5})
    a = audit(resample_to_mixture(df, "id", "dom", {"a": 1.0, "b": 1.0}))
    assert a["cartesian"] == 0
    # count groupBy (+1-row window) + the PER-DOMAIN rank window; the
    # corpus itself shuffles once on the domain key
    assert a["shuffles"] <= 4
    assert a["broadcast_joins"] >= 2


def test_normalize_text_rules(spark):
    """r12: deterministic Unicode normalization — NFC composition,
    C0/C1 control stripping (newline/tab kept), zero-width removal
    (ZWJ preserved for emoji families), space-run collapse, edge
    trim."""
    from sql_database_to_elastic_datalake_spark.operators.text import (
        normalize_unicode,
    )

    rows = [
        (1, "cafe\u0301 combining"),     # NFD e+acute
        (2, "a\x00b\x07c\nd\te"),             # controls out, \n\t kept
        (3, "zero​width﻿ soft­hyphen"),
        (4, "a   b\t\t c"),                   # run collapse
        (5, "  padded  "),                    # edge trim
        (6, "fam\U0001F469‍\U0001F469ily"),  # ZWJ survives
        (7, None),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    out = {r["id"]: r["n"] for r in df.select(
        "id", normalize_unicode("t").alias("n")).collect()}
    assert out[1] == "caf\u00e9 combining"  # composed
    assert out[2] == "abc\nd\te"
    assert out[3] == "zerowidth softhyphen"
    assert out[4] == "a b c"
    assert out[5] == "padded"
    assert out[6] == "fam\U0001F469‍\U0001F469ily"
    assert out[7] is None
