"""CCNet-style bigram-LM perplexity (r11): hashed model, exact
moments, log scoring vs a plain-python replica, tercile tiers."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sql_database_to_elastic_datalake_spark.operators import lm

B = 16  # small bucket space: forces hash collisions into the test


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % B


def _toks(text: str | None) -> list[str]:
    if text is None:
        return []
    return [t for t in re.split(r"[^0-9a-z]+", text.lower()) if t]


def _replica(docs: list[tuple[int, str, str]], target_lang: str):
    model: dict[tuple[int, int], int] = {}
    for _, lang, text in docs:
        if lang != target_lang:
            continue
        t = _toks(text)
        for a, b in zip(t, t[1:]):
            k = (_bucket(a), _bucket(b))
            model[k] = model.get(k, 0) + 1
    ctx: dict[int, int] = {}
    for (b1, _), c in model.items():
        ctx[b1] = ctx.get(b1, 0) + c
    out = {}
    for doc_id, _, text in docs:
        t = _toks(text)
        pairs = [( _bucket(a), _bucket(b)) for a, b in zip(t, t[1:])]
        if not pairs:
            continue
        n = len(pairs)
        mh = sum(model.get(p, 0) for p in pairs)
        ch = sum(ctx.get(p[0], 0) for p in pairs)
        lp = sum(math.log((model.get(p, 0) + 1)
                          / (ctx.get(p[0], 0) + B)) for p in pairs)
        out[doc_id] = (n, mh, ch, lp, math.exp(-lp / n))
    return out


def test_lm_features_match_replica(spark):
    docs = [
        (1, "en", "the cat sat on the mat"),
        (2, "en", "the cat ran to the mat"),
        (3, "de", "der hund lief zum haus"),       # non-target scored
        (4, "en", "completely novel words here xyzzy"),
        (5, "en", "one"),                           # < 2 tokens: absent
        (6, "en", ""),                              # no tokens: absent
        (7, "en", None),                            # NULL: absent
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, lang=g, text=t) for i, g, t in docs])
    model = lm.lm_bigram_model(df, F.col("lang") == "en",
                               n_buckets=B)
    feats = {r["doc_id"]: r for r in lm.lm_doc_features(
        df, model, n_buckets=B).collect()}
    want = _replica(docs, "en")
    assert set(feats) == set(want) == {1, 2, 3, 4}
    for d, (n, mh, ch, lp, perp) in want.items():
        r = feats[d]
        assert (r["n_bigrams"], r["model_hits"],
                r["context_hits"]) == (n, mh, ch), d
        assert r["log_prob"] == pytest.approx(lp, rel=1e-12), d
        assert r["perplexity"] == pytest.approx(perp, rel=1e-12), d
    # the Wikipedia-like doc scores LOWER perplexity than the novel one
    assert feats[1]["perplexity"] < feats[4]["perplexity"]
    # the non-target-language doc still gets a score (CCNet scores
    # every doc against the target model)
    assert feats[3]["perplexity"] > 0


def test_perplexity_tiers_per_language(spark):
    rows = [Row(doc_id=i, lang="en", perplexity=float(i))
            for i in range(9)]
    rows += [Row(doc_id=100 + i, lang="de", perplexity=float(i))
             for i in range(3)]
    out = {r["doc_id"]: r["tier"] for r in lm.perplexity_tiers(
        spark.createDataFrame(rows)).collect()}
    # en: 9 docs → 3 per tercile, ordered by perplexity asc
    assert [out[i] for i in range(9)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3)
    # de cuts independently — one per tier even with tiny counts
    assert [out[100 + i] for i in range(3)] == ["head", "middle", "tail"]


def test_lm_model_is_saturation_bounded(spark):
    """The model never exceeds B² rows whatever the corpus — the
    broadcastability argument at 100 TB."""
    df = spark.createDataFrame(
        [Row(doc_id=i, lang="en",
             text=" ".join(f"w{j}" for j in range(i % 7, i % 7 + 30)))
         for i in range(50)])
    model = lm.lm_bigram_model(df, F.lit(True), n_buckets=4)
    assert model.count() <= 16

def _kn_replica(docs: list[tuple[int, str, str]], target_lang: str,
                D: float = 0.75):
    model: dict[tuple[int, int], int] = {}
    for _, lang, text in docs:
        if lang != target_lang:
            continue
        t = _toks(text)
        for a, b in zip(t, t[1:]):
            k = (_bucket(a), _bucket(b))
            model[k] = model.get(k, 0) + 1
    ctx: dict[int, int] = {}
    n1f: dict[int, int] = {}
    n1b: dict[int, int] = {}
    for (b1, b2), c in model.items():
        ctx[b1] = ctx.get(b1, 0) + c
        n1f[b1] = n1f.get(b1, 0) + 1
        n1b[b2] = n1b.get(b2, 0) + 1
    T = len(model)
    out = {}
    for doc_id, _, text in docs:
        t = _toks(text)
        pairs = [(_bucket(a), _bucket(b)) for a, b in zip(t, t[1:])]
        if not pairs:
            continue
        n = len(pairs)
        mh = sum(model.get(p, 0) for p in pairs)
        ch = sum(ctx.get(p[0], 0) for p in pairs)
        fw = sum(n1f.get(p[0], 0) for p in pairs)
        bw = sum(n1b.get(p[1], 0) for p in pairs)
        lp = 0.0
        for b1, b2 in pairs:
            pc = (n1b.get(b2, 0) + 1) / (T + B)
            c1 = ctx.get(b1, 0)
            if c1 > 0:
                p = (max(model.get((b1, b2), 0) - D, 0.0) / c1
                     + D * n1f[b1] / c1 * pc)
            else:
                p = pc
            lp += math.log(p)
        out[doc_id] = (n, mh, ch, fw, bw, lp, math.exp(-lp / n))
    return out


def test_lm_kn_features_match_replica(spark):
    docs = [
        (1, "en", "the cat sat on the mat"),
        (2, "en", "the cat ran to the mat"),
        (3, "de", "der hund lief zum haus"),
        (4, "en", "completely novel words here xyzzy"),
        (5, "en", "one"),
        (6, "en", None),
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, lang=g, text=t) for i, g, t in docs])
    model = lm.lm_bigram_model(df, F.col("lang") == "en", n_buckets=B)
    feats = {r["doc_id"]: r for r in lm.lm_kn_doc_features(
        df, model, n_buckets=B).collect()}
    want = _kn_replica(docs, "en")
    assert set(feats) == set(want) == {1, 2, 3, 4}
    for d, (n, mh, ch, fw, bw, lp, perp) in want.items():
        r = feats[d]
        assert (r["n_bigrams"], r["model_hits"], r["context_hits"],
                r["fw_types"], r["bw_types"]) == (n, mh, ch, fw, bw), d
        assert r["log_prob"] == pytest.approx(lp, rel=1e-12), d
        assert r["perplexity"] == pytest.approx(perp, rel=1e-12), d
    # KN gives every probability a strictly positive floor and the
    # target-like doc still wins
    assert feats[1]["perplexity"] < feats[4]["perplexity"]
    # discount knob shifts scores (sanity that D is actually used)
    alt = {r["doc_id"]: r["log_prob"] for r in lm.lm_kn_doc_features(
        df, model, n_buckets=B, discount=0.1).collect()}
    assert alt[1] != pytest.approx(feats[1]["log_prob"], rel=1e-12)
