"""Merge-table byte-level BPE — the tokenizer-EXACT token-count tier.

The heuristic tier (:func:`.text.token_count_bpe`, a regex over
character classes) estimates; THIS tier runs a real byte-level BPE in
the public GPT-2 vocabulary format (``merges.txt``: a ``#version``
header then one merge per line over the bytes→unicode alphabet), so
``pack_by_token_budget`` can quote exact budget numbers for whatever
tokenizer a user drops in. The committed ``data/bpe/merges.txt`` is a
small table trained by ``scripts/gen_bpe_merges.py`` on an embedded
seed text — swap in a production ``merges.txt`` (same format) and the
counts are that tokenizer's.

Execution shape: Python is unavoidable (BPE is an iterative
data-dependent merge loop — not expressible as column algebra), so the
tier is an ARROW-BATCHED pandas UDF: one vectorized batch transfer per
Arrow chunk, the encoder built once per executor from the broadcast
merge list, an LRU cache over pre-tokens (Zipf makes the hit rate
high). Never row-at-a-time Python.

Algorithm parity notes (all public, GPT-2 ``encoder.py`` semantics):
  * bytes→unicode: the reversible 256-entry table (printable bytes map
    to themselves, the rest to U+0100+n) so merges operate on strings;
  * pre-tokenizer: GPT-2's pattern expressed with Python ``re``
    unicode classes (``[^\\W\\d_]`` for ``\\p{L}``, ``\\d`` for
    ``\\p{N}``, lookahead kept);
  * merge loop: repeatedly merge ALL occurrences of the lowest-ranked
    adjacent pair until none ranks.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame

#: GPT-2 pre-tokenizer, Python-re form (see module docstring).
PRE_TOKEN_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[^\W\d_]+| ?\d+| ?(?:_|[^\w\s])+"
    r"|\s+(?!\S)|\s+"
)


def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte→unicode table: every byte gets a
    printable single-character stand-in so BPE merges operate on
    plain strings."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def load_merges(path: str) -> list[tuple[str, str]]:
    """Parse a ``merges.txt`` in the public GPT-2 format: optional
    ``#version`` header, then one ``left right`` merge per line in
    rank order."""
    merges: list[tuple[str, str]] = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            a, b = line.split(" ")
            merges.append((a, b))
    return merges


class BpeEncoder:
    """Byte-level BPE over a merge-rank table (GPT-2 semantics)."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self.byte_map = bytes_to_unicode()
        # bound the cache: pre-tokens are words — Zipf gives high hit
        # rates at 64k entries without executor-memory risk
        self._bpe = lru_cache(maxsize=65536)(self._bpe_uncached)

    def _bpe_uncached(self, token: str) -> tuple[str, ...]:
        parts = list(token)
        while len(parts) > 1:
            best = None
            for pair in zip(parts, parts[1:]):
                r = self.ranks.get(pair)
                if r is not None and (best is None or r < best[0]):
                    best = (r, pair)
            if best is None:
                break
            a, b = best[1]
            out: list[str] = []
            i = 0
            while i < len(parts):
                if (i < len(parts) - 1
                        and parts[i] == a and parts[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            parts = out
        return tuple(parts)

    def encode(self, text: str) -> list[str]:
        toks: list[str] = []
        for pre in PRE_TOKEN_RE.findall(text):
            mapped = "".join(self.byte_map[b]
                             for b in pre.encode("utf-8"))
            toks.extend(self._bpe(mapped))
        return toks

    def count(self, text: str) -> int:
        n = 0
        for pre in PRE_TOKEN_RE.findall(text):
            mapped = "".join(self.byte_map[b]
                             for b in pre.encode("utf-8"))
            n += len(self._bpe(mapped))
        return n


def token_count_bpe_exact(
    df: DataFrame,
    text_col: str,
    merges_path: str,
    out_col: str = "bpe_tokens_exact",
) -> DataFrame:
    """Exact BPE token count as a new column — the Arrow-batched tier
    (pandas UDF: identical Arrow batch transfer to ``mapInPandas``,
    column-shaped so it composes as an expression). NULL text counts
    NULL. The merge list rides the closure (merge tables are
    kilobytes — broadcast-sized by construction)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    merges = load_merges(merges_path)
    holder: list[BpeEncoder] = []  # built once per executor process

    @pandas_udf("bigint")
    def _count(texts: pd.Series) -> pd.Series:
        if not holder:
            holder.append(BpeEncoder(merges))
        enc = holder[0]
        return texts.map(
            lambda t: enc.count(t) if t is not None else None)

    return df.withColumn(out_col, _count(F.col(text_col)))


def default_merges_path() -> str:
    """The committed demo merge table (see module docstring)."""
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "data", "bpe", "merges.txt")
