"""Generate the golden exact-BPE token counts for ``token_count_bpe_exact``.

Like ``gen_multimodal_golden.py``: the expected values are re-derived
WITHOUT importing the package — this file restates the documented
algorithm (GPT-2 byte-level BPE: bytes→unicode table, the GPT-2
pre-tokenizer in Python-re form, greedy lowest-rank merge-all loop)
against the committed ``data/bpe/merges.txt``, so a drift in either
the operator's encoder or the merge table shows up as a golden
mismatch, not a silent agreement.

Output: ``data/golden/bpe_token_counts.parquet`` keyed by
``(doc_id, text_md5)`` over the union of every ``/root/testdata/sf*``
documents table (content-addressed — one file serves all SFs).

Run once per testdata or merge-table refresh:
    python scripts/gen_bpe_golden.py [extra_lake_dir ...]
"""

from __future__ import annotations

import glob
import hashlib
import os
import re
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "data", "golden", "bpe_token_counts.parquet")
MERGES = os.path.join(REPO, "data", "bpe", "merges.txt")

PAT = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[^\W\d_]+| ?\d+| ?(?:_|[^\w\s])+"
    r"|\s+(?!\S)|\s+"
)


def byte_table() -> dict[int, str]:
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


def main() -> None:
    ranks: dict[tuple[str, str], int] = {}
    with open(MERGES, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            a, b = line.split(" ")
            ranks[(a, b)] = len(ranks)
    bmap = byte_table()
    cache: dict[str, int] = {}

    def bpe_len(tok: str) -> int:
        if tok in cache:
            return cache[tok]
        parts = list(tok)
        while len(parts) > 1:
            best = None
            for pair in zip(parts, parts[1:]):
                r = ranks.get(pair)
                if r is not None and (best is None or r < best[0]):
                    best = (r, pair)
            if best is None:
                break
            a, b = best[1]
            out: list[str] = []
            i = 0
            while i < len(parts):
                if i < len(parts) - 1 and parts[i] == a \
                        and parts[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            parts = out
        cache[tok] = len(parts)
        return cache[tok]

    def count(text: str) -> int:
        n = 0
        for pre in PAT.findall(text):
            n += bpe_len("".join(bmap[b] for b in pre.encode("utf-8")))
        return n

    rows: dict[tuple[int, str], dict] = {}
    paths = sorted(glob.glob("/root/testdata/sf*/documents.parquet"))
    for extra in sys.argv[1:]:
        paths.append(os.path.join(extra, "documents.parquet"))
    for path in paths:
        for doc_id, text in duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet('{path}/*.parquet')"
            if os.path.isdir(path) else
            f"SELECT doc_id, text FROM read_parquet('{path}')"
        ).fetchall():
            key = (int(doc_id),
                   hashlib.md5((text or "").encode("utf-8")).hexdigest())
            rows[key] = {
                "doc_id": key[0], "text_md5": key[1],
                "n_bpe_exact": None if text is None else count(text),
            }
    table = pa.Table.from_pylist(
        sorted(rows.values(),
               key=lambda r: (r["doc_id"], r["text_md5"])),
        schema=pa.schema([
            ("doc_id", pa.int64()),
            ("text_md5", pa.string()),
            ("n_bpe_exact", pa.int64()),
        ]),
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT)
    print(f"wrote {table.num_rows} golden rows to {OUT}")


if __name__ == "__main__":
    main()
