"""IPv4 column algebra — dotted-quad parsing, CIDR blocks, the ES
``ip`` field semantics the ``ip_range`` aggregation and CIDR ``term``
filters need.

Reference surface: the reference forwards search bodies verbatim to a
real ES 8.11 (/root/reference/src/search_api.py:38-46), whose ``ip``
mapping type stores addresses and serves ``ip_range`` aggs and CIDR
term queries. The reference schema carries no ip columns, so the
registry derives DETERMINISTIC synthetic addresses from integer keys
(pure integer modulo — the geo family's r13 derived-column pattern);
real deployments bring their own string ip columns.

Everything here is whole-stage-codegen column algebra: an ip parses
to a LONG once and every range/CIDR test is an ordinary numeric
comparison — filterable, groupable, pushdown-friendly after
materialization. IPv6 needs 128-bit arithmetic (two-long pairs) and
is a NAMED 400 wherever a v6 literal appears, never a silent
mis-parse.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

#: anchored dotted-quad with 0-255 octets (no leading-zero ambiguity
#: guard — ES is equally permissive about "01")
_IPV4_RE = (
    r"^((25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\.){3}"
    r"(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])$"
)

_CIDR_PY = re.compile(
    r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})/(\d{1,2})$")
_IPV4_PY = re.compile(r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$")


def ip_to_long(col: Column) -> Column:
    """A dotted-quad string column as an unsigned-32-bit LONG; a
    malformed value (including any v6 form) parses to NULL — the ES
    unmapped/no-match posture, never a wrong number."""
    valid = col.rlike(_IPV4_RE)
    parts = F.split(col, r"\.")
    n = (
        F.element_at(parts, 1).cast("long") * F.lit(16777216)
        + F.element_at(parts, 2).cast("long") * F.lit(65536)
        + F.element_at(parts, 3).cast("long") * F.lit(256)
        + F.element_at(parts, 4).cast("long")
    )
    return F.when(valid, n)


def ipv4_to_int(s: str) -> int:
    """Driver-side twin of :func:`ip_to_long` for literals; raises
    ValueError on malformed/v6 input (callers name their 400)."""
    m = _IPV4_PY.match(str(s).strip())
    if not m:
        if ":" in str(s):
            raise ValueError(
                f"ipv6 address {s!r} is unimplemented (needs 128-bit "
                "two-long arithmetic)")
        raise ValueError(f"malformed ipv4 address {s!r}")
    octets = [int(x) for x in m.groups()]
    if any(o > 255 for o in octets):
        raise ValueError(f"malformed ipv4 address {s!r}")
    return (octets[0] << 24) | (octets[1] << 16) \
        | (octets[2] << 8) | octets[3]


def int_to_ipv4(n: int) -> str:
    """The inverse rendering for response envelopes."""
    return ".".join(str((int(n) >> s) & 255) for s in (24, 16, 8, 0))


def parse_cidr(s: str) -> tuple[int, int]:
    """A CIDR block as the half-open numeric interval
    ``[network, network + 2^(32-prefix))`` — exactly the membership ES
    gives a CIDR term/range; host bits in the literal are masked off
    like ES does. ValueError on malformed or v6 input."""
    m = _CIDR_PY.match(str(s).strip())
    if not m:
        if ":" in str(s):
            raise ValueError(
                f"ipv6 CIDR {s!r} is unimplemented (needs 128-bit "
                "two-long arithmetic)")
        raise ValueError(f"malformed CIDR block {s!r}")
    octets = [int(x) for x in m.groups()[:4]]
    prefix = int(m.group(5))
    if any(o > 255 for o in octets) or prefix > 32:
        raise ValueError(f"malformed CIDR block {s!r}")
    base = (octets[0] << 24) | (octets[1] << 16) \
        | (octets[2] << 8) | octets[3]
    span = 1 << (32 - prefix)
    lo = base & ~(span - 1) & 0xFFFFFFFF
    return lo, lo + span


def is_cidr_literal(v) -> bool:
    """Whether a term value should take CIDR-block semantics."""
    return isinstance(v, str) and _CIDR_PY.match(v.strip()) is not None


def cidr_member(col: Column, cidr: str) -> Column:
    """CIDR membership for a string ip column — two numeric
    comparisons over the parsed long (null for non-ip values → no
    match, ES's posture for a term on absent/foreign values)."""
    lo, hi = parse_cidr(cidr)
    n = ip_to_long(col)
    return (n >= F.lit(lo)) & (n < F.lit(hi))
