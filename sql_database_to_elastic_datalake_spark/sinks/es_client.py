"""Minimal Elasticsearch HTTP client for the bulk-export sink.

Closes the loop the reference closes with the ``elasticsearch`` SDK
(/root/reference/src/es_connector.py:37-74: ``helpers.bulk`` plus
index ensure-exists): the lake-side exporter
(:mod:`.bulk_export`) renders ``_bulk`` request bodies; this client
POSTs them and handles the part the wire format cannot — per-item
verdicts. ES returns HTTP 200 for a bulk request whose items FAILED
individually, so a client that only checks the status code silently
drops documents; the reference's SDK handles that internally, and this
shim reproduces the behavior explicitly:

* items that succeeded are acknowledged;
* items with retryable statuses (429 es_rejected_execution on a full
  bulk queue, 503) are re-sent alone with exponential backoff — the
  SDK's ``max_retries``/``initial_backoff`` contract;
* a retryable status on the WHOLE request (ES rejects the entire
  ``_bulk`` with 429 when the write queue is full; LBs emit 503 the
  same way) gets the identical backoff-and-resend treatment, raising
  only once retries are exhausted;
* items with permanent rejections (400 mapping conflicts, 404) are
  quarantined with their error bodies — mirroring the lake sink's
  quarantine posture (`sinks/writer.py`): a bad document must never
  kill the batch.

stdlib-only (``urllib``): the sandbox has no ``elasticsearch`` package
and no live cluster — the unit tests run this client against an
in-process mock server speaking the documented ``_bulk`` response
shape, which is the strongest available evidence without a cluster.

This is a DRIVER-SIDE shim for modest exports and the final hop of
`write_bulk_ndjson` output. At 100 TB the bulk POST fan-out belongs in
``foreachPartition`` tasks (each executor streaming its own partition's
bodies); the client is deliberately connectionless (one request per
call, no session state) so the same class works in either placement.
"""

from __future__ import annotations

import glob
import json
import os
import time
import urllib.error
import urllib.request
from dataclasses import dataclass, field

#: Item-level HTTP statuses worth re-sending: queue rejection / overload.
RETRYABLE_STATUSES = frozenset({429, 503})


@dataclass
class BulkResult:
    """Per-item accounting for one logical bulk load (incl. retries)."""

    ok: int = 0
    retried: int = 0
    rejected: list[dict] = field(default_factory=list)

    def merge(self, other: "BulkResult") -> None:
        self.ok += other.ok
        self.retried += other.retried
        self.rejected.extend(other.rejected)


class EsBulkClient:
    def __init__(
        self,
        base_url: str,
        timeout: float = 30.0,
        max_retries: int = 3,
        initial_backoff: float = 0.5,
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self.max_retries = max_retries
        self.initial_backoff = initial_backoff

    # -- low-level ---------------------------------------------------------

    def _request(self, method: str, path: str, body: bytes | None,
                 content_type: str) -> tuple[int, dict]:
        req = urllib.request.Request(
            self.base_url + path, data=body, method=method,
            headers={"Content-Type": content_type},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.status, json.loads(resp.read() or b"{}")
        except urllib.error.HTTPError as ex:
            payload = ex.read()
            try:
                parsed = json.loads(payload or b"{}")
            except json.JSONDecodeError:
                parsed = {"error": payload.decode("utf-8", "replace")}
            return ex.code, parsed

    # -- index lifecycle ---------------------------------------------------

    def ensure_index(self, name: str, mapping_body: str | None = None) -> bool:
        """Idempotent index creation (reference es_connector.py:21-35):
        returns True if created, False if it already existed; raises on
        any other failure."""
        status, body = self._request(
            "PUT", f"/{name}",
            mapping_body.encode("utf-8") if mapping_body else b"{}",
            "application/json",
        )
        if status in (200, 201):
            return True
        err_type = (
            body.get("error", {}).get("type")
            if isinstance(body.get("error"), dict) else None
        )
        if status == 400 and err_type == "resource_already_exists_exception":
            return False
        raise RuntimeError(f"index create failed ({status}): {body}")

    # -- search ------------------------------------------------------------

    def search(self, index: str, body: dict) -> dict:
        """POST ``/{index}/_search`` and return the parsed envelope.

        The reference round-trips ``/search`` and ``/search/advanced``
        through this ES endpoint (src/search_api.py:16-46) — the lake
        answers the same DSL locally (``LakeService.advanced_search``),
        and this method is the live-cluster analog, so envelope parity
        between the two is testable against a cluster speaking the
        documented response shape."""
        status, resp = self._request(
            "POST", f"/{index}/_search",
            json.dumps(body).encode("utf-8"), "application/json",
        )
        if status != 200:
            raise RuntimeError(f"_search failed ({status}): {resp}")
        return resp

    # -- bulk --------------------------------------------------------------

    def bulk(self, body: str | bytes) -> BulkResult:
        """POST one ``_bulk`` body; retry retryable items, quarantine
        permanent rejections. The request body must follow the exporter's
        framing (action/source line pairs, trailing newline)."""
        if isinstance(body, str):
            body = body.encode("utf-8")
        result = BulkResult()
        pairs = self._split_pairs(body)
        attempt = 0
        while pairs:
            payload = b"".join(a + s for a, s in pairs)
            status, resp = self._request(
                "POST", "/_bulk", payload, "application/x-ndjson"
            )
            if status in RETRYABLE_STATUSES and attempt < self.max_retries:
                # ES rejects a WHOLE _bulk request with 429 when the
                # write queue is full (and LBs emit 503 the same way);
                # inside bulk_load_distributed a raise here would fail
                # the Spark task instead of backing off, so the
                # request-level verdict gets the same retry contract as
                # item-level ones.
                result.retried += len(pairs)
                time.sleep(self.initial_backoff * (2 ** attempt))
                attempt += 1
                continue
            if status != 200:
                raise RuntimeError(f"_bulk transport failed ({status}): {resp}")
            if not resp.get("errors"):
                result.ok += len(pairs)
                return result
            items = resp.get("items", ())
            if len(items) != len(pairs):
                # ES guarantees one item verdict per action; anything
                # else is a broken proxy/server, and zip-truncating would
                # silently drop documents from the accounting
                raise RuntimeError(
                    f"_bulk returned {len(items)} item verdicts for "
                    f"{len(pairs)} actions"
                )
            retry_pairs = []
            for pair, item in zip(pairs, items):
                verdict = next(iter(item.values()))
                st = verdict.get("status", 500)
                if st < 300:
                    result.ok += 1
                elif st in RETRYABLE_STATUSES and attempt < self.max_retries:
                    retry_pairs.append(pair)
                else:
                    result.rejected.append(verdict)
            if retry_pairs:
                result.retried += len(retry_pairs)
                time.sleep(self.initial_backoff * (2 ** attempt))
            pairs = retry_pairs
            attempt += 1
        return result

    def load_export_dir(self, path: str) -> BulkResult:
        """POST every ``write_bulk_ndjson`` shard under ``path`` — the
        ``curl -XPOST _bulk --data-binary @part-*`` loop as a method.
        Shards written with ``compression=`` are decompressed before
        posting (the `_bulk` endpoint wants NDJSON bodies): gzip and
        bzip2 via the stdlib; other codec suffixes raise rather than
        posting compressed bytes as a garbage request body."""
        import bz2
        import gzip

        openers = {".gz": gzip.open, ".bz2": bz2.open}
        rejected_suffixes = (".snappy", ".lz4", ".deflate", ".zst", ".zstd")
        total = BulkResult()
        for f in sorted(glob.glob(os.path.join(path, "part-*"))):
            if f.endswith(".crc"):
                continue
            if f.endswith(rejected_suffixes):
                raise ValueError(
                    f"cannot decompress bulk shard {f!r}; export with "
                    "compression=gzip/bzip2 (or none) for HTTP loading"
                )
            suffix = os.path.splitext(f)[1]
            with openers.get(suffix, open)(f, "rb") as fh:
                body = fh.read()
            if body:
                total.merge(self.bulk(body))
        return total

    @staticmethod
    def _split_pairs(body: bytes) -> list[tuple[bytes, bytes]]:
        """Split a bulk body into (action_line, source_line) byte pairs
        (each keeping its newline) so failed items can be re-sent alone.
        The exporter only emits source-carrying ``index`` actions, so
        pairing is positional; a stray odd line count means the body was
        not produced by the exporter — fail loudly."""
        lines = body.splitlines(keepends=True)
        if len(lines) % 2:
            raise ValueError("bulk body is not action/source line pairs")
        return [(lines[i], lines[i + 1]) for i in range(0, len(lines), 2)]


def bulk_load_distributed(
    df,
    base_url: str,
    index_name: str,
    id_col: str,
    actions_per_request: int = 1000,
    timeout: float = 30.0,
    max_retries: int = 3,
    initial_backoff: float = 0.5,
):
    """Executor-side bulk loading: every partition POSTs its own rows.

    The 100 TB placement of the reference's sync loop
    (/root/reference/src/data_sync.py:124-130 runs one driver-side
    ``helpers.bulk`` per batch): the action/source rendering stays in
    the JVM (:func:`..bulk_export.bulk_action_lines`, whole-stage
    codegen), and only the final HTTP hop runs in Python — one
    :class:`EsBulkClient` per partition, batching
    ``actions_per_request`` actions per request (the reference's
    ``batch_size``). No driver bottleneck, no collect; load parallelism
    IS the upstream partitioning, which is how a 1000-executor cluster
    saturates an ES ingest tier.

    Returns a DataFrame ``(partition_ok, partition_retried,
    partition_rejected)`` with one row per partition — aggregate it for
    job-level accounting. Rejected items' error bodies are counted, not
    carried (a 100 TB load quarantines rejects to a side channel; here
    the per-partition count is the signal to go look).
    """
    from sql_database_to_elastic_datalake_spark.sinks.bulk_export import (
        bulk_action_lines,
    )

    lines = bulk_action_lines(df, index_name, id_col)

    def post_partition(it):
        client = EsBulkClient(
            base_url, timeout=timeout, max_retries=max_retries,
            initial_backoff=initial_backoff,
        )
        total = BulkResult()
        buf: list[str] = []
        for row in it:
            buf.append(row["value"])
            if len(buf) >= actions_per_request:
                total.merge(client.bulk("\n".join(buf) + "\n"))
                buf = []
        if buf:
            total.merge(client.bulk("\n".join(buf) + "\n"))
        yield (total.ok, total.retried, len(total.rejected))

    return lines.rdd.mapPartitions(post_partition).toDF(
        "partition_ok bigint, partition_retried bigint, "
        "partition_rejected bigint"
    )
