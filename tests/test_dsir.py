"""DSIR importance-weight tests (operators/dsir.py, r10).

The model and features are pinned against a hand-computed numpy
replica on a tiny corpus — the same Laplace arithmetic, so log_weight
agrees to float ulps; the exact integer moments agree exactly (they
are what the DuckDB oracle pins at sf0.01)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sql_database_to_elastic_datalake_spark.operators.dsir import (
    dsir_bucket_model,
    dsir_doc_features,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([
        Row(doc_id=1, lang="en", text="the cat sat on the mat"),
        Row(doc_id=2, lang="en", text="a cat and a dog"),
        Row(doc_id=3, lang="de", text="der hund und die katze"),
        Row(doc_id=4, lang="de", text="the dog sat"),
        Row(doc_id=5, lang=None, text=""),          # no tokens
        Row(doc_id=6, lang="en", text=None),         # no tokens
    ])


def _py_model(rows, n_buckets=64):
    """Reference model in plain python: same tokenizer, same md5
    bucket, Laplace p = (c+1)/(N+B)."""
    import hashlib
    import re

    buckets: dict[int, list[int]] = {}
    nt = nr = 0
    for lang, text in rows:
        for tok in re.split(r"[^0-9a-z]+", (text or "").lower()):
            if not tok:
                continue
            b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) \
                % n_buckets
            c = buckets.setdefault(b, [0, 0])
            if lang == "en":
                c[0] += 1
                nt += 1
            c[1] += 1
            nr += 1
    return {
        b: (ct, cr,
            (ct + 1) / (nt + n_buckets),
            (cr + 1) / (nr + n_buckets))
        for b, (ct, cr) in buckets.items()
    }, nt, nr


def test_bucket_model_matches_reference(spark, corpus):
    model = {r["bucket"]: r for r in dsir_bucket_model(
        corpus, F.col("lang").eqNullSafe("en"),
        n_buckets=64).collect()}
    ref, nt, nr = _py_model(
        [(r["lang"], r["text"]) for r in corpus.collect()])
    assert set(model) == set(ref)
    for b, (ct, cr, pt, pr) in ref.items():
        r = model[b]
        assert (r["c_target"], r["c_raw"]) == (ct, cr)
        assert r["p_target"] == pytest.approx(pt, rel=1e-15)
        assert r["p_raw"] == pytest.approx(pr, rel=1e-15)
    # probabilities are a proper smoothed distribution: all in (0, 1)
    assert all(0 < r["p_target"] < 1 and 0 < r["p_raw"] < 1
               for r in model.values())


def test_doc_features_moments_and_log_weight(spark, corpus):
    model = dsir_bucket_model(
        corpus, F.col("lang").eqNullSafe("en"), n_buckets=64)
    feats = {r["doc_id"]: r for r in dsir_doc_features(
        corpus, model, n_buckets=64).collect()}
    # token-less docs are dropped (quarantine tier)
    assert set(feats) == {1, 2, 3, 4}
    ref, _, _ = _py_model(
        [(r["lang"], r["text"]) for r in corpus.collect()])

    import hashlib
    import re

    for r in corpus.collect():
        if r["doc_id"] not in feats:
            continue
        toks = [t for t in re.split(
            r"[^0-9a-z]+", (r["text"] or "").lower()) if t]
        n = {}
        for tok in toks:
            b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 64
            n[b] = n.get(b, 0) + 1
        want_t = sum(c * ref[b][0] for b, c in n.items())
        want_r = sum(c * ref[b][1] for b, c in n.items())
        want_lw = sum(
            c * (math.log(ref[b][2]) - math.log(ref[b][3]))
            for b, c in n.items())
        got = feats[r["doc_id"]]
        assert got["n_tokens"] == len(toks)
        assert got["target_hits"] == want_t
        assert got["raw_hits"] == want_r
        assert got["log_weight"] == pytest.approx(want_lw, rel=1e-12)
    # the model discriminates: target-pool docs carry higher weights
    en = [feats[i]["log_weight"] for i in (1, 2)]
    de = [feats[3]["log_weight"]]
    assert min(en) > max(de)


def test_unseen_bucket_laplace_floor(spark, corpus):
    """Scoring NEW docs against a frozen model: a token whose bucket
    the model never saw contributes the exact Laplace floor
    p = 1/(N+B), reconstructed from the doc's seen buckets; a doc
    with NO seen bucket has no floor witness → null log_weight and
    all-zero moments (quarantine, not a crash)."""
    model = dsir_bucket_model(
        corpus, F.col("lang").eqNullSafe("en"), n_buckets=64)
    new = spark.createDataFrame([
        Row(doc_id=10, text="cat wug"),   # one seen + one unseen
        Row(doc_id=11, text="wug"),       # all unseen
    ])
    feats = {r["doc_id"]: r for r in dsir_doc_features(
        new, model, n_buckets=64).collect()}
    ref, nt, nr = _py_model(
        [(r["lang"], r["text"]) for r in corpus.collect()])

    import hashlib

    b_cat = int(hashlib.md5(b"cat").hexdigest()[:8], 16) % 64
    b_zz = int(hashlib.md5(b"wug").hexdigest()[:8], 16) % 64
    assert b_zz not in ref  # the test's premise
    floor_t, floor_r = 1 / (nt + 64), 1 / (nr + 64)
    want = (math.log(ref[b_cat][2]) - math.log(ref[b_cat][3])) \
        + (math.log(floor_t) - math.log(floor_r))
    got = feats[10]
    assert got["n_tokens"] == 2
    assert got["target_hits"] == ref[b_cat][0]
    assert got["raw_hits"] == ref[b_cat][1]
    assert got["log_weight"] == pytest.approx(want, rel=1e-12)
    got11 = feats[11]
    assert (got11["target_hits"], got11["raw_hits"]) == (0, 0)
    assert got11["log_weight"] is None
