"""Train the committed demo BPE merge table (data/bpe/merges.txt).

The table is in the PUBLIC GPT-2 ``merges.txt`` format (``#version``
header, one ``left right`` merge per line in rank order, over the
bytes→unicode alphabet), so the engine's exact-count tier
(operators/bpe.py) reads a production tokenizer's merges unchanged —
this committed table just makes the tier runnable and testable inside
the repo without shipping a third-party vocabulary.

Training is the textbook BPE procedure (Sennrich et al. 2016): count
adjacent symbol pairs over the pre-tokenized seed corpus, merge the
most frequent pair (lexicographic tie-break → fully deterministic),
repeat. The seed text is EMBEDDED below so regeneration is
byte-reproducible: python scripts/gen_bpe_merges.py
"""

from __future__ import annotations

import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sql_database_to_elastic_datalake_spark.operators.bpe import (  # noqa: E402
    PRE_TOKEN_RE,
    bytes_to_unicode,
)

N_MERGES = 384

#: Deterministic seed corpus: plain public-domain-style English prose
#: covering the common character bigrams; content is irrelevant beyond
#: determinism — a production deployment swaps the whole table.
SEED = """
the quick brown fox jumps over the lazy dog while the rain in spain
stays mainly in the plain and the cat sat on the mat with a hat
to be or not to be that is the question whether it is nobler in the
mind to suffer the slings and arrows of outrageous fortune or to take
arms against a sea of troubles and by opposing end them
it was the best of times it was the worst of times it was the age of
wisdom it was the age of foolishness it was the epoch of belief
all happy families are alike each unhappy family is unhappy in its
own way everything was in confusion in the house of the oblonskys
call me ishmael some years ago never mind how long precisely having
little or no money in my purse and nothing particular to interest me
on shore i thought i would sail about a little and see the watery
part of the world it is a way i have of driving off the spleen
in the beginning was the word and the word was with the data and the
data was the word counting tokens exactly matters when packing
training batches by budget numbers 0 1 2 3 4 5 6 7 8 9 10 100 2024
punctuation, too: commas, periods. question? exclamation! (parens)
"""


def main() -> None:
    byte_map = bytes_to_unicode()
    words: collections.Counter[tuple[str, ...]] = collections.Counter()
    for pre in PRE_TOKEN_RE.findall(SEED):
        mapped = tuple(byte_map[b] for b in pre.encode("utf-8"))
        words[mapped] += 1

    merges: list[tuple[str, str]] = []
    for _ in range(N_MERGES):
        pairs: collections.Counter[tuple[str, str]] = collections.Counter()
        for w, c in words.items():
            for pair in zip(w, w[1:]):
                pairs[pair] += c
        if not pairs:
            break
        # most frequent; ties break lexicographically → deterministic
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        a, b = best
        nxt: collections.Counter[tuple[str, ...]] = collections.Counter()
        for w, c in words.items():
            out: list[str] = []
            i = 0
            while i < len(w):
                if i < len(w) - 1 and w[i] == a and w[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            nxt[tuple(out)] += c
        words = nxt

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(repo, "data", "bpe", "merges.txt")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as fh:
        fh.write("#version: 0.2\n")
        for a, b in merges:
            fh.write(f"{a} {b}\n")
    print(f"wrote {len(merges)} merges to {out_path}")


if __name__ == "__main__":
    main()
