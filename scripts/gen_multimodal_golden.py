"""Generate the golden expected-values table for ``multimodal_decode``.

The engine pipeline under test is ``synthesize_media -> decode_media_meta``
(operators/multimodal.py). This script re-derives what that pipeline MUST
produce for every document in the test lakes, **without importing the
package**: the payload is re-synthesized inline from the documented
construction (md5(text)-tiled bytes, P6/P5/WAV round-robin by doc_id) and
the metadata comes from closed-form formulas over that construction — not
from the codec. A bug in either the engine's synthesizer or its parsers
therefore shows up as a golden mismatch.

Output: ``data/golden/multimodal_decode.parquet`` keyed by
``(doc_id, text_md5)`` covering the union of every ``/root/testdata/sf*``
documents table, so one committed file serves all scale factors. The
query's oracle joins ``documents`` against this table on the key — a
document whose text changed (or a decode that drifted) breaks the join or
the hash.

Run once per testdata refresh:  python scripts/gen_multimodal_golden.py
Extra corpora (e.g. a local ``.scale/sf1`` rehearsal lake) can be
appended as arguments — their keys join the committed driver-corpora
set:            python scripts/gen_multimodal_golden.py .scale/sf1
"""

from __future__ import annotations

import glob
import hashlib
import os
import struct

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "data", "golden", "multimodal_decode.parquet")


def synth_payload(doc_id: int, text: str | None) -> bytes:
    """Independent restatement of the documented payload construction
    (operators/multimodal.py:_synth_payload's CONTRACT, not its code)."""
    seed = hashlib.md5((text or "").encode("utf-8")).digest()
    kind = doc_id % 3
    if kind == 2:
        n = 64 + doc_id % 64
        data = (seed * ((2 * n) // len(seed) + 1))[: 2 * n]
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        return (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
    width, height = 4 + doc_id % 5, 3 + doc_id % 4
    channels = 3 if kind == 1 else 1
    n = width * height * channels
    pixels = (seed * (n // len(seed) + 1))[:n]
    magic = b"P6" if kind == 1 else b"P5"
    return magic + f"\n{width} {height}\n255\n".encode() + pixels


def expected_row(doc_id: int, text: str | None) -> dict:
    """Closed-form decode expectation — no parser involved."""
    seed = hashlib.md5((text or "").encode("utf-8")).digest()
    payload = synth_payload(doc_id, text)
    kind = doc_id % 3
    row = {
        "doc_id": doc_id,
        "text_md5": hashlib.md5((text or "").encode("utf-8")).hexdigest(),
        "byte_len": len(payload),
        "content_md5": hashlib.md5(payload).hexdigest(),
    }
    if kind == 2:
        n = 64 + doc_id % 64
        data = (seed * ((2 * n) // 16 + 1))[: 2 * n]
        samples = [
            struct.unpack_from("<h", data, 2 * i)[0] for i in range(n)
        ]
        row.update(
            format="wav", width=None, height=None, channels=1,
            sample_rate=8000,
            mean_value=float(sum(abs(s) for s in samples)) / n,
        )
    else:
        w, h = 4 + doc_id % 5, 3 + doc_id % 4
        c = 3 if kind == 1 else 1
        n = w * h * c
        pixels = (seed * (n // 16 + 1))[:n]
        row.update(
            format="ppm" if kind == 1 else "pgm", width=w, height=h,
            channels=c, sample_rate=None,
            mean_value=float(sum(pixels)) / n,
        )
    return row


def main() -> None:
    import sys

    rows: dict[tuple[int, str], dict] = {}
    paths = sorted(glob.glob("/root/testdata/sf*/documents.parquet"))
    for extra in sys.argv[1:]:
        paths.append(os.path.join(extra, "documents.parquet"))
    for path in paths:
        for doc_id, text in duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet('{path}')"
        ).fetchall():
            r = expected_row(int(doc_id), text)
            rows[(r["doc_id"], r["text_md5"])] = r
    table = pa.Table.from_pylist(
        sorted(rows.values(), key=lambda r: (r["doc_id"], r["text_md5"])),
        schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text_md5", pa.string()),
                ("byte_len", pa.int64()),
                ("content_md5", pa.string()),
                ("format", pa.string()),
                ("width", pa.int32()),
                ("height", pa.int32()),
                ("channels", pa.int32()),
                ("sample_rate", pa.int32()),
                ("mean_value", pa.float64()),
            ]
        ),
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {table.num_rows} golden rows -> {OUT}")


if __name__ == "__main__":
    main()
