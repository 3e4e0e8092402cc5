"""Advisory single-writer lock for on-disk state directories.

The journaled swaps (COW bucket swap, MOR delta commit, rebucket,
index compaction) make every writer CRASH-safe, but two concurrent
writers would still race: both classify against the same snapshot, both
swap, and the loser's changes are silently dropped (lost update) or the
layouts interleave. Real table formats solve this with optimistic
concurrency (Delta) or lock providers (Hudi); the plain-parquet
equivalent here is an advisory lock file per state dir —
``<target>.writer_lock`` beside the state, created with O_EXCL (the
atomic primitive every local/NFS filesystem provides), carrying
{pid, host, ts}.

Semantics:
- Acquisition is per-process and REENTRANT (merge_upsert_mor holds the
  MOR lock while its internal compact_mor runs; rebucket holds it while
  compacting) via a module-level registry of held paths.
- A lock held by a LIVE process on this host raises ``StateLockedError``
  immediately — the cron-double-run case, where waiting would just
  serialize two identical syncs.
- A lock whose owner is dead (same-host pid probe) or whose timestamp is
  older than ``stale_after`` (cross-host crash, default 1 h) is broken
  and re-acquired — crashed writers must not wedge the state forever.

On object stores without O_EXCL rename semantics a deployment swaps this
for the table format's native lock; the call sites don't change.
"""

from __future__ import annotations

import contextlib
import functools
import inspect
import json
import os
import socket
import threading
import time

_held: dict[str, list] = {}  # path -> [owner_thread_id, depth]
_held_mu = threading.Lock()


class StateLockedError(RuntimeError):
    """Another live writer holds this state's lock."""


def _lock_path(target_path: str) -> str:
    return target_path.rstrip("/") + ".writer_lock"


def _owner_alive(info: dict, stale_after: float) -> bool:
    if time.time() - info.get("ts", 0) > stale_after:
        return False
    if info.get("host") != socket.gethostname():
        return True  # can't probe a remote pid; only age breaks it
    try:
        os.kill(int(info["pid"]), 0)
        return True
    except (OSError, ValueError):
        return False


def held_in_process(target_path: str) -> bool:
    """Is this state's writer lock held by ANY thread of this process —
    including the caller's own? Probes that must not piggyback on
    same-thread reentrancy (e.g. txn recovery deciding whether staged
    dirs belong to a live transaction) check this before acquiring."""
    with _held_mu:
        return os.path.abspath(target_path) in _held


@contextlib.contextmanager
def state_lock(target_path: str, stale_after: float = 3600.0):
    """Hold the single-writer lock for ``target_path`` for the block."""
    key = os.path.abspath(target_path)
    me = threading.get_ident()
    with _held_mu:
        cur = _held.get(key)
        if cur is not None and cur[0] == me:
            cur[1] += 1
            reentrant = True
        elif cur is not None:
            # Same process, DIFFERENT thread (two streams sharing a
            # session, say): that's a concurrent writer, not reentrancy.
            raise StateLockedError(
                f"{target_path!r} is locked by another thread of this "
                "process; concurrent writers to one state are not allowed."
            )
        else:
            reentrant = False
    if reentrant:
        try:
            yield
        finally:
            with _held_mu:
                _held[key][1] -= 1
        return

    path = _lock_path(target_path)
    # Initial loads lock a target whose parent (e.g. the warehouse root)
    # doesn't exist yet — the Spark write would create it; the lock must
    # come first.
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    payload = json.dumps(
        {"pid": os.getpid(), "host": socket.gethostname(), "ts": time.time()}
    )
    acquired = False
    try:
        for attempt in (0, 1):
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                with os.fdopen(fd, "w") as fh:
                    fh.write(payload)
                acquired = True
                break
            except FileExistsError:
                try:
                    with open(path) as fh:
                        info = json.load(fh)
                except (OSError, json.JSONDecodeError):
                    info = {}  # torn lock write → treat as dead
                if info and _owner_alive(info, stale_after):
                    raise StateLockedError(
                        f"{target_path!r} is locked by a live writer "
                        f"(pid {info.get('pid')} on {info.get('host')}); "
                        "a second concurrent merge/compact would race the "
                        "swap and lose updates. If that writer is gone, "
                        f"remove {path!r}."
                    )
                # Dead owner: break the lock and retry the O_EXCL create
                # once (a racing breaker may beat us to it — then the
                # second attempt correctly sees THEIR live lock).
                with contextlib.suppress(OSError):
                    os.unlink(path)
        if not acquired:
            raise StateLockedError(
                f"could not acquire {path!r} after breaking a stale lock"
            )
        with _held_mu:
            _held[key] = [me, 1]
        try:
            yield
        finally:
            with _held_mu:
                _held.pop(key, None)
    finally:
        if acquired:
            with contextlib.suppress(OSError):
                os.unlink(path)


def single_writer(path_arg: str):
    """Decorator: hold the state lock named by ``path_arg`` for the call.

    Applied to every stateful writer entry point (merges, compactions,
    rebucket, index appends); readers never lock — the staged swaps
    already give them old-or-new atomicity."""

    def deco(fn):
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            bound = sig.bind(*args, **kwargs)
            with state_lock(bound.arguments[path_arg]):
                return fn(*args, **kwargs)

        return wrapper

    return deco
