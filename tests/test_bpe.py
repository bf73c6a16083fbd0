"""Tokenizer-exact BPE tier (r11, verdict #8): merge-table byte-level
BPE in the public GPT-2 merges.txt format, Arrow-batched counting, and
the packing integration that motivates it."""

from __future__ import annotations

import os

from pyspark.sql import Row

from sql_database_to_elastic_datalake_spark.operators.bpe import (
    BpeEncoder,
    bytes_to_unicode,
    default_merges_path,
    load_merges,
    token_count_bpe_exact,
)


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256  # bijective
    assert m[ord("a")] == "a"           # printables map to themselves
    assert m[ord(" ")] == "Ġ"           # the GPT-2 space stand-in


def test_merge_loop_pinned():
    """Hand-derivable fixture: merges [(a,b), (ab,c)] — 'abc' collapses
    to one token, 'abcabc' (one pre-token) to two, the merge order is
    rank-greedy and merges ALL occurrences per round."""
    enc = BpeEncoder([("a", "b"), ("ab", "c")])
    assert enc.encode("abc") == ["abc"]
    assert enc.encode("abcabc") == ["abc", "abc"]
    assert enc.encode("cba") == ["c", "b", "a"]  # nothing ranks
    assert enc.encode("") == []
    # ' abc' is one pre-token Ġabc: (a,b)/(ab,c) merge inside it but
    # Ġ never merges → [Ġ, abc]; plus the bare first word [abc] = 3
    assert enc.count("abc abc") == 3


def test_committed_merges_format_and_encoder():
    path = default_merges_path()
    merges = load_merges(path)
    assert merges and all(len(p) == 2 for p in merges)
    with open(path, encoding="utf-8") as fh:
        assert fh.readline().startswith("#version")
    enc = BpeEncoder(merges)
    # trained on English prose → 'the' with leading space is merged
    # far below its 4 bytes; exact numbers pinned to the committed
    # table (regenerate via scripts/gen_bpe_merges.py)
    assert enc.count(" the") <= 2
    # unicode round-trips through the byte table (no KeyError),
    # multi-byte chars count ≥ 1 token each
    assert enc.count("naïve ٣ test") >= 3
    # pre-tokenizer: contractions split like GPT-2
    assert enc.encode("it's")[:1] != []
    assert enc.count("") == 0


def test_token_count_bpe_exact_spark(spark):
    """The Arrow-batched tier equals the driver-side encoder on every
    row; NULL text counts NULL; composes with token-budget packing."""
    from sql_database_to_elastic_datalake_spark.operators.chunking import (
        pack_by_token_budget,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "counting tokens exactly matters 123 !",
        "naïve unicode ٣ and emoji \U0001f600 bytes",
        "",
        None,
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    out = {r["doc_id"]: r["n"] for r in token_count_bpe_exact(
        df, "text", default_merges_path(), out_col="n").collect()}
    enc = BpeEncoder(load_merges(default_merges_path()))
    for i, t in enumerate(texts):
        assert out[i] == (None if t is None else enc.count(t)), (i, t)
    # exact counts feed the packer directly
    packed = pack_by_token_budget(
        token_count_bpe_exact(
            df.filter("text is not null"), "text",
            default_merges_path(), out_col="n"),
        "doc_id", "n", budget=16,
    ).collect()
    assert {r["doc_id"] for r in packed} == {0, 1, 2, 3}
    assert all(r["batch_id"] >= 0 for r in packed)


def test_golden_matches_package_encoder():
    """The committed golden (independent replica, no package import in
    its generator) agrees with the package encoder on the sf0.01
    corpus — the same cross-implementation check the oracle runs,
    pinned here so `pytest` alone catches a drift."""
    import duckdb

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    golden = os.path.join(repo, "data", "golden",
                          "bpe_token_counts.parquet")
    docs = duckdb.sql(
        "SELECT doc_id, text, md5(coalesce(text, '')) AS k "
        "FROM read_parquet('/root/testdata/sf0.01/documents.parquet')"
    ).fetchall()
    want = {
        (r[0], r[1]): r[2] for r in duckdb.sql(
            f"SELECT doc_id, text_md5, n_bpe_exact "
            f"FROM read_parquet('{golden}')").fetchall()
    }
    enc = BpeEncoder(load_merges(default_merges_path()))
    checked = 0
    for doc_id, text, key in docs:
        expect = want[(doc_id, key)]
        got = None if text is None else enc.count(text)
        assert got == expect, (doc_id, got, expect)
        checked += 1
    assert checked == 500
