"""Persisted micro-bucket digest sidecars (the merkle-state discipline).

The digest prune (``operators/cdc.py``) removes the classify join's
shuffle, but still pays one narrow SCAN of the target per merge to learn
the target's per-micro-bucket digests — at a 100 TB state that scan IS
the steady-state sync cost. This module persists those digests as a
≤16K-row parquet sidecar inside the table (``_cdc_digest.parquet``,
underscore-prefixed so every Spark listing ignores it) and maintains
them INCREMENTALLY from each merge's classified changes: an update
xors out the old ``(key, hash)`` fold and xors in the new one, an
insert xors in, a delete xors out — the same order-independent algebra
the scan-side aggregation uses, so the maintained sidecar is
bit-identical to a recomputed one (differential-tested).

Safety model — the sidecar can NEVER make a merge wrong, only slower:

- The sidecar embeds a fingerprint of the table's exact file listing
  (relpath, size, mtime_ns of every file) in its parquet footer
  metadata. ``load`` re-walks the table and returns ``None`` on any
  mismatch, so a table touched by ANY digest-unaware writer (an
  external tool, a manual file copy, a crash between table publish
  and sidecar write) simply falls back to the scan path — which then
  writes a fresh sidecar, re-amortizing itself. Every engine writer
  maintains it: snapshot merges, micro-batch merges (maintenance
  decoupled from pruning — round 10), deletes/TTL/erasure, compaction.
- ``save`` runs strictly AFTER the table publish and is atomic
  (temp file + ``os.replace``); a failed or interrupted save leaves
  either no sidecar or the previous one, both of which fail the
  fingerprint check. Save errors are swallowed with a warning — a
  published merge must never be failed by its cache maintenance.
- ``apply_delta`` returns ``None`` (caller skips the save) on any
  bookkeeping inconsistency (a micro-bucket count going negative, or
  reaching zero with a nonzero fold), rather than persisting a digest
  that could mask a change.

At 100 TB the effect is that a steady-state snapshot sync's digest
compare does ZERO target-side I/O: one walk of the table's file
metadata plus a 16K-row local parquet read, against the source-side
aggregation it must run anyway.
"""

from __future__ import annotations

import hashlib
import os
import warnings

SIDE_FILE = "_cdc_digest.parquet"
_FP_KEY = b"presencia.state_fingerprint"
_TMP = "." + SIDE_FILE + ".tmp"

Digest = dict[int, tuple[int, int, int]]  # mb -> (count, xfold, yfold)


def enabled() -> bool:
    return os.environ.get("SPARK_GRAFT_DIGEST_SIDECAR", "1") != "0"


def _local_lister(base: str):
    """Default listing provider: a local-FS walk yielding one
    ``(relpath, size, mtime_ns)`` triple per file. mtime_ns is a
    LOCAL-FILESYSTEM assumption — object stores have no reliable
    mtime_ns; a production port swaps ``default_lister`` (or passes
    ``lister=``) for a provider built on the store's own change tokens
    (S3 ETag/version-id, GCS generation), which serve the same role:
    any rewrite of a same-named, same-sized object must change its
    triple. See docs/SCALE.md."""
    for root, _dirs, files in os.walk(base):
        for f in files:
            p = os.path.join(root, f)
            try:
                st = os.stat(p)
            except OSError:
                continue
            yield (
                os.path.relpath(p, base).replace(os.sep, "/"),
                st.st_size,
                st.st_mtime_ns,
            )


# (size, mtime_ns)-keyed memo of content tokens, per absolute path.
# Cleared wholesale at the cap — simpler than LRU and the cap is far
# above any real table's file count.
_CONTENT_TOKENS: dict[str, tuple[tuple[int, int], str]] = {}
_CONTENT_TOKENS_CAP = 1 << 18


def _content_token_lister(base: str):
    """Alternate listing provider: a CONTENT-derived change token
    instead of mtime_ns — ``(relpath, size, sha256(bytes||size))`` over
    the FULL file, streamed in 1 MiB blocks. Survives mtime-scrambling
    copies (rsync without -t, container image round-trips, backup
    restores) that spuriously invalidate the mtime lister's fingerprint,
    and upholds the same invariant the mtime lister does: ANY rewrite —
    including a same-size mutation of only middle bytes that leaves the
    parquet footer byte-identical — perturbs the token (an earlier
    head+tail sampling variant missed exactly that case). The full read
    is the honest local price of a content token; the production port
    never pays it — it maps the triple to (key, size, S3 ETag / GCS
    generation), the store's own whole-object change token, and reads no
    data at all (docs/SCALE.md). Select with
    ``SPARK_GRAFT_DIGEST_LISTER=content`` or by assigning
    ``default_lister``.

    Re-hashing is skipped for files whose ``(size, mtime_ns)`` pair is
    unchanged since this process last hashed them (in-memory cache) —
    digest validation would otherwise be O(table bytes) per listing.
    The cache does NOT weaken the provider contract the conformance
    suite pins: an mtime scramble is a cache MISS (re-hash → same
    content token → fingerprint stable), and any rewrite perturbs
    mtime_ns so the mutated bytes are re-hashed; only a rewrite that
    deliberately restores both size and nanosecond mtime (os.utime
    round-trip) could reuse a stale token WITHIN one process lifetime —
    the adversarial corner this cache knowingly trades for O(changed
    bytes) listings; every fresh process still re-hashes everything
    once. Races between threads at worst hash the same file twice."""
    block = 1 << 20
    for root, _dirs, files in os.walk(base):
        for f in files:
            p = os.path.join(root, f)
            try:
                st = os.stat(p)
                size = st.st_size
                cached = _CONTENT_TOKENS.get(p)
                if cached is not None and cached[0] == (size, st.st_mtime_ns):
                    yield (
                        os.path.relpath(p, base).replace(os.sep, "/"),
                        size,
                        cached[1],
                    )
                    continue
                h = hashlib.sha256()
                with open(p, "rb") as fh:
                    for blk in iter(lambda: fh.read(block), b""):
                        h.update(blk)
                h.update(str(size).encode())
            except OSError:
                continue
            token = h.hexdigest()
            if len(_CONTENT_TOKENS) >= _CONTENT_TOKENS_CAP:
                _CONTENT_TOKENS.clear()
            _CONTENT_TOKENS[p] = ((size, st.st_mtime_ns), token)
            yield (
                os.path.relpath(p, base).replace(os.sep, "/"),
                size,
                token,
            )


def _env_lister(base: str):
    """Provider selected by ``SPARK_GRAFT_DIGEST_LISTER`` (``mtime`` —
    the default — or ``content``), resolved per call so a deployment
    can flip it without restarting."""
    name = os.environ.get("SPARK_GRAFT_DIGEST_LISTER", "mtime")
    return (_content_token_lister if name == "content" else _local_lister)(
        base
    )


# Deployment-wide seam: swap for an object-store lister in a port (or
# set SPARK_GRAFT_DIGEST_LISTER=content for the content-token provider).
default_lister = _env_lister


def table_fingerprint(target_path: str, lister=None) -> str:
    """Fingerprint of the table's exact file listing — every file under
    the target except the sidecar itself (and its temp), hashed as
    sorted (relpath, size, change-token) triples from the listing
    provider (``lister`` arg, else ``default_lister``).
    Hidden/staging/journal files are deliberately INCLUDED: any
    in-flight or crashed state must read as "not the state I
    summarized" (over-invalidation is safe; a missed invalidation is
    not). Parquet task files carry UUID names, so no two distinct
    publishes share a listing."""
    base = target_path.rstrip("/")
    entries = sorted(
        e
        for e in (lister or default_lister)(base)
        if e[0].rsplit("/", 1)[-1] not in (SIDE_FILE, _TMP)
    )
    return hashlib.sha256(repr(entries).encode()).hexdigest()


def load(target_path: str) -> Digest | None:
    """The table's digest, or ``None`` when absent, disabled, unreadable,
    or STALE (fingerprint mismatch — some writer touched the table
    without maintaining the sidecar). Driver-side pyarrow read: no
    Spark job."""
    if not enabled():
        return None
    p = os.path.join(target_path, SIDE_FILE)
    if not os.path.exists(p):
        return None
    try:
        import pyarrow.parquet as pq

        t = pq.read_table(p)
        md = t.schema.metadata or {}
        fp = md.get(_FP_KEY)
        if fp is None or fp.decode() != table_fingerprint(target_path):
            return None
        mbs = t.column("mb").to_pylist()
        cs = t.column("c").to_pylist()
        xs = t.column("x").to_pylist()
        ys = t.column("y").to_pylist()
        return {mb: (c, x, y) for mb, c, x, y in zip(mbs, cs, xs, ys)}
    except Exception:
        return None


def save(target_path: str, digest: Digest | None) -> None:
    """Persist ``digest`` fingerprinted against the table's CURRENT
    listing — call strictly after the table publish (and after any
    follow-up like auto-compaction), so the fingerprint binds the
    digest to exactly the files it summarizes. Never raises."""
    if digest is None or not enabled():
        return
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        fp = table_fingerprint(target_path)
        mbs = sorted(digest)
        t = pa.table(
            {
                "mb": pa.array(mbs, pa.int32()),
                "c": pa.array([digest[m][0] for m in mbs], pa.int64()),
                "x": pa.array([digest[m][1] for m in mbs], pa.int64()),
                "y": pa.array([digest[m][2] for m in mbs], pa.int64()),
            }
        )
        t = t.replace_schema_metadata({_FP_KEY: fp.encode()})
        tmp = os.path.join(target_path, _TMP)
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(target_path, SIDE_FILE))
    except Exception as e:  # a published merge must not fail on cache upkeep
        warnings.warn(f"digest sidecar save skipped for {target_path!r}: {e}")


def apply_delta(
    digest: Digest, delta_rows: list[tuple[int, int, int, int]]
) -> Digest | None:
    """New digest = old digest ⊕ the merge's classified changes
    (``(mb, count_delta, xfold_delta, yfold_delta)`` rows from
    ``cdc.collect_digest_delta``). XOR on Python ints matches int64
    bitwise XOR for in-range values (sign-extension commutes with XOR),
    so folds stay in the same domain Spark's ``bit_xor`` produces.
    Returns ``None`` on any inconsistency — the caller must then skip
    the save and let the next merge rebuild from a scan."""
    new = dict(digest)
    for mb, dc, dx, dy in delta_rows:
        c, x, y = new.get(mb, (0, 0, 0))
        c += dc
        x ^= dx
        y ^= dy
        if c < 0:
            return None
        if c == 0:
            if x or y:
                return None
            new.pop(mb, None)
        else:
            new[mb] = (c, x, y)
    return new
