"""Driver-side (pure-Python) parity primitives for Spark expressions.

The zero-job trickle paths (``sinks/driver_mor.py``,
``plans/incremental_join._refresh_driver``) rewrite KB-sized change
batches entirely on the driver with pyarrow — no Spark jobs. For the
on-disk state to stay BIT-IDENTICAL to what the Spark operators would
have written, four expression families must be reproduced exactly:

- ``xxhash64`` (bucket layout ``pmod(xxhash64(_cdc_key), nb)``, the
  digest micro-buckets, and the sidecar fold pair
  ``operators/cdc._fold_exprs``) — a pure-Python XXH64 (Collet's public
  spec; Spark's ``XXH64`` is a conforming port, differential-tested
  here against ``F.xxhash64`` for the string / int / long / chained
  shapes the engine uses);
- Spark's ``cast(x AS string)`` rendering (feeds ``row_hash`` and key
  normalization). Exact for string/integral/boolean/date/timestamp.
  For DOUBLE, Java ≤18's ``Double.toString`` is not always the
  shortest round-trip form Python's ``repr`` produces; the two agree
  everywhere in the NORMAL, ``|d| < 2**53`` region (150K-sample
  differential, zero mismatches) and can disagree outside it (giant
  integral doubles, subnormals). Out-of-region values are rendered by
  the live JVM via py4j when a gateway is supplied — exact by
  construction, a few driver round-trips for a trickle batch — else
  ``UnsupportedValue`` is raised and the caller declines to the Spark
  path.
- key normalization (``functions/keys.normalize_key``: trim, numeric
  canonicalization through a double parse — reference parity
  ``sync_INCREMENTAL.py:211-224``). The double PARSE follows Java
  ``Double.parseDouble`` (no underscores, optional d/D/f/F suffix,
  hex floats), not Python ``float``.
- ``row_hash`` (``functions/hashing.row_hash``: sorted columns,
  ``coalesce(nullif(cast, ''), 'NULL')``, '|' join, sha256 / xxh64).

Everything here is differential-tested against the live expressions in
``tests/test_driver_parity.py``; any drift in Spark's rendering would
surface there, not as silent state corruption (and a rendering mismatch
can only mis-CLASSIFY a row as changed — one spurious update version —
never produce wrong column values).
"""

from __future__ import annotations

import datetime
import math
import re
import struct
from hashlib import sha256

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_HASH_SEED = 42


class UnsupportedValue(Exception):
    """A value/type this driver-side renderer cannot reproduce exactly —
    callers must decline to the Spark path, never approximate."""


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """XXH64 over ``data`` (unsigned result) — the byte-level core Spark's
    hash of a STRING column runs (UTF-8 bytes, running seed)."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v = [
            (seed + _P1 + _P2) & _M,
            (seed + _P2) & _M,
            seed,
            (seed - _P1) & _M,
        ]
        while i <= n - 32:
            for k in range(4):
                w = int.from_bytes(data[i + 8 * k : i + 8 * k + 8], "little")
                v[k] = (_rotl((v[k] + w * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (
            _rotl(v[0], 1) + _rotl(v[1], 7) + _rotl(v[2], 12) + _rotl(v[3], 18)
        ) & _M
        for vk in v:
            h ^= (_rotl((vk * _P2) & _M, 31) * _P1) & _M
            h = ((h * _P1) + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        w = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl((w * _P2) & _M, 31) * _P1) & _M
        h = ((_rotl(h, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        w = int.from_bytes(data[i : i + 4], "little")
        h ^= (w * _P1) & _M
        h = ((_rotl(h, 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def xxh64_int(value: int, seed: int) -> int:
    """Spark ``XXH64.hashInt`` — how an int32 column (or int literal like
    the ``lit(1)`` in the digest fold) enters a chained xxhash64."""
    seed &= _M
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = ((_rotl(h, 23) * _P2) + _P3) & _M
    return _fmix(h)


def xxh64_long(value: int, seed: int) -> int:
    """Spark ``XXH64.hashLong`` — an int64 column in a chained xxhash64."""
    seed &= _M
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl(((value & _M) * _P2) & _M, 31) * _P1) & _M
    h = ((_rotl(h, 27) * _P1) + _P4) & _M
    return _fmix(h)


def to_signed64(x: int) -> int:
    x &= _M
    return x - (1 << 64) if x >= (1 << 63) else x


def xxhash64_str(s: str, seed: int = SPARK_HASH_SEED) -> int:
    """``F.xxhash64(string_col)`` — SIGNED int64, like the JVM returns."""
    return to_signed64(xxh64(s.encode("utf-8"), seed))


def pmod_bucket(key: str, num_buckets: int) -> int:
    """``pmod(xxhash64(_cdc_key), num_buckets)`` — the ``_kb`` layout
    bucket of a normalized key (Python ``%`` on the signed hash IS
    pmod)."""
    return xxhash64_str(key) % num_buckets


def fold_pair(key: str, row_hash: str) -> tuple[int, int]:
    """The digest sidecar's (key, hash) fold pair — byte parity with
    ``operators/cdc._fold_exprs``: ``(xxhash64(key, hash),
    xxhash64(hash, key, lit(1)))``, both signed."""
    kb = key.encode("utf-8")
    hb = row_hash.encode("utf-8")
    h1 = xxh64(hb, xxh64(kb, SPARK_HASH_SEED))
    h2 = xxh64_int(1, xxh64(kb, xxh64(hb, SPARK_HASH_SEED)))
    return to_signed64(h1), to_signed64(h2)


# --------------------------------------------------------------------------
# Spark cast-to-string rendering
# --------------------------------------------------------------------------

_TWO53 = float(1 << 53)
_MIN_NORMAL = 2.2250738585072014e-308


def java_double_str(d: float, jvm=None) -> str:
    """Java ``Double.toString(d)`` — what ``cast(double AS string)``
    renders. Pure Python (via the shortest round-trip digits, reformatted
    to Java's plain/scientific rules) inside the proven-identical region:
    zero, NaN, infinities, and normal doubles with ``|d| < 2**53``.
    Outside it (giant integral doubles, subnormals) Java ≤18 does not
    always emit the shortest form, so the value is rendered by the LIVE
    JVM when a py4j gateway is passed, else ``UnsupportedValue``."""
    if d != d:
        return "NaN"
    if d == math.inf:
        return "Infinity"
    if d == -math.inf:
        return "-Infinity"
    if d == 0.0:
        return "-0.0" if math.copysign(1.0, d) < 0 else "0.0"
    a = abs(d)
    if not (_MIN_NORMAL <= a < _TWO53):
        if jvm is not None:
            return jvm.java.lang.Double.toString(float(d))
        raise UnsupportedValue(
            f"double {d!r} is outside the proven Python/Java rendering "
            "region and no JVM gateway was supplied"
        )
    neg = d < 0
    r = repr(a)
    if "e" in r:
        mant, ex = r.split("e")
        exp = int(ex)
    else:
        mant, exp = r, 0
    if "." in mant:
        ip, fp = mant.split(".")
    else:
        ip, fp = mant, ""
    alld = ip + fp
    digits = alld.lstrip("0")
    point = len(ip) + exp - (len(alld) - len(digits))
    digits = digits.rstrip("0") or "0"
    if -3 < point <= 7:
        if point <= 0:
            s = "0." + "0" * (-point) + digits
        elif point >= len(digits):
            s = digits + "0" * (point - len(digits)) + ".0"
        else:
            s = digits[:point] + "." + digits[point:]
    else:
        s = digits[0] + "." + (digits[1:] or "0") + "E" + str(point - 1)
    return ("-" if neg else "") + s


def timestamp_str(t: datetime.datetime) -> str:
    """``cast(timestamp AS string)`` under the engine's UTC session zone:
    ``yyyy-MM-dd HH:mm:ss[.ffffff]`` with trailing fraction zeros
    trimmed. ``t`` must be the naive UTC wall time parquet stores."""
    if t.tzinfo is not None:
        t = t.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    s = "%04d-%02d-%02d %02d:%02d:%02d" % (
        t.year, t.month, t.day, t.hour, t.minute, t.second,
    )
    if t.microsecond:
        s += (".%06d" % t.microsecond).rstrip("0")
    return s


# type-kind tags the renderer understands; resolved from arrow types by
# sinks/driver_mor (Spark types carry the same names).
_INT_KINDS = {"int8", "int16", "int32", "int64"}


def cast_to_string(value, kind: str, jvm=None) -> str | None:
    """Spark's ``cast(value AS string)`` for one typed value. ``None``
    stays None (the CALLER applies null semantics — hash sentinel vs
    key ''). Unsupported kinds/values raise ``UnsupportedValue``."""
    if value is None:
        return None
    if kind == "string":
        return value
    if kind in _INT_KINDS:
        return str(int(value))
    if kind == "bool":
        return "true" if value else "false"
    if kind == "double":
        return java_double_str(float(value), jvm)
    if kind == "date":
        return "%04d-%02d-%02d" % (value.year, value.month, value.day)
    if kind == "timestamp":
        return timestamp_str(value)
    raise UnsupportedValue(f"no driver-side string rendering for {kind!r}")


# --------------------------------------------------------------------------
# Java Double.parseDouble (for normalize_key's try_cast('double'))
# --------------------------------------------------------------------------

# re.ASCII: Java digits are '0'-'9' ONLY. Python's unicode-aware \d
# matches e.g. Arabic-Indic '٣' (and float('٣') == 3.0), which
# Java rejects — letting those through silently diverged the driver-path
# _cdc_key/bucket/digest from the Spark path's raw-string key.
_DEC_RE = re.compile(
    r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?[dDfF]?$", re.ASCII
)
_HEX_RE = re.compile(
    r"^[+-]?0[xX]([0-9a-fA-F]+(\.[0-9a-fA-F]*)?|\.[0-9a-fA-F]+)"
    r"[pP][+-]?\d+[dDfF]?$",
    re.ASCII,
)


def _java_trim(s: str) -> str:
    """Java ``String.trim``: strip only chars <= U+0020. NOT unicode
    whitespace — NBSP '\\u00a0' etc. stay, exactly as
    ``Double.parseDouble`` sees them (Python ``str.strip()`` would eat
    them and parse strings Java throws on)."""
    b, e = 0, len(s)
    while b < e and s[b] <= " ":
        b += 1
    while e > b and s[e - 1] <= " ":
        e -= 1
    return s[b:e]


def java_parse_double(s: str) -> float | None:
    """``Double.parseDouble`` semantics (what Spark's string→double cast
    runs): leading/trailing chars <= U+0020 trimmed (Java ``trim``, not
    unicode whitespace), ASCII digits only, optional d/D/f/F suffix, hex
    floats, NO underscore separators (Python ``float`` accepts those — a
    parity trap). Returns None where Java throws.
    Infinity/NaN literals return their values (the normalize branch
    discards non-finite parses either way)."""
    t = _java_trim(s)
    if not t:
        return None
    body = t[1:] if t[0] in "+-" else t
    sign = -1.0 if t[0] == "-" else 1.0
    if body in ("Infinity", "NaN"):
        return sign * (math.nan if body == "NaN" else math.inf)
    if _DEC_RE.match(t):
        core = t[:-1] if t[-1] in "dDfF" else t
        return float(core)
    if _HEX_RE.match(t):
        core = t[:-1] if t[-1] in "dDfF" else t
        try:
            return float.fromhex(core)
        except ValueError:
            return None
    return None


def normalize_key_value(value, kind: str, jvm=None) -> str:
    """``functions/keys.normalize_key`` driver-side: None → '';
    trim (ASCII space, like ``F.trim``); numeric strings canonicalized
    through the double parse (integral → long rendering, else the
    double rendering); everything else the trimmed raw string."""
    if value is None:
        return ""
    s = cast_to_string(value, kind, jvm)
    if s is None:
        return ""
    s = s.strip(" ")
    if s == "":
        return ""
    d = java_parse_double(s)
    if d is None or d != d or d in (math.inf, -math.inf):
        return s
    if d == math.floor(d) and abs(d) < float(2**62):
        return str(int(d))
    return java_double_str(d, jvm)


def composite_key(values, kinds, jvm=None) -> str:
    """``functions/keys.composite_key``: normalized parts '|'-joined."""
    return "|".join(
        normalize_key_value(v, k, jvm) for v, k in zip(values, kinds)
    )


HASH_NULL_SENTINEL = "NULL"


def row_hash_value(
    row: dict, columns, kinds: dict, algo: str = "sha256", jvm=None
) -> str:
    """``functions/hashing.row_hash`` driver-side: sorted columns, each
    ``coalesce(nullif(cast(c AS string), ''), 'NULL')``, '|'-joined;
    sha256 hex or the xxh64 decimal-string mode."""
    parts = []
    for c in sorted(columns):
        s = cast_to_string(row.get(c), kinds[c], jvm)
        parts.append(HASH_NULL_SENTINEL if not s else s)
    joined = "|".join(parts)
    if algo == "xxh64":
        return str(xxhash64_str(joined))
    if algo != "sha256":
        raise ValueError(f"algo must be 'sha256' or 'xxh64', got {algo!r}")
    return sha256(joined.encode("utf-8")).hexdigest()


def double_bits(d: float) -> int:
    """Raw IEEE bits — lets equality checks treat two doubles the way a
    parquet round-trip does (NaN == NaN, 0.0 != -0.0 distinct bits)."""
    return struct.unpack(">Q", struct.pack(">d", d))[0]
