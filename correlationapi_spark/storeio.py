"""Shared filesystem + versioned-pointer layout for the persisted stores.

Both persisted stores (the IVF vector index in ``llm/similarity.py`` and
the SCD2 dimension store in ``operators/analytics.py``) are raw-parquet
directory trees. Through round 13 each published multi-directory changes
with its own journaled rename protocol (roll-forward manifests, per-object
trash dirs), which left a documented reader-consistency window: a
lock-free reader racing the multi-rename swap could see a transient
"no corpus" or a new-corpus/old-centroids pairing. Round 14 replaces both
protocols with the single-pointer versioned layout SCALING.md's round-13
design note specified:

* ``path/_layout.json`` names the live object set — one atomic file, so a
  reader resolves the pointer once per operation and then only opens the
  named directories. It sees version N's complete set or version N+1's,
  never a mixture and never an absent object.
* The pointer is replaced by tmp-write + hsync + rename (``write_atomic``)
  — the ONLY commit step any mutation has.
* ADDITIVE mutations (IVF append / delete-tombstone, SCD2 none) keep
  adding files to the current version's directories; racing readers may
  or may not see the new files — both consistent states.
* DESTRUCTIVE mutations (rebuild, compact, recluster, SCD2 merge) write a
  complete new object set beside the old one (unreferenced until the
  swap, so staging IS just writing), swap the pointer, and RETIRE the
  replaced objects in the pointer's ``retired`` list. Retired objects are
  garbage-collected at the NEXT mutation's preamble (``pointer_gc``), not
  at swap time — an in-flight reader that resolved the old pointer keeps
  its files on disk for a full mutation cycle of grace, which is strictly
  safer than the design note's swap-time GC. Crash before the swap:
  readers stay on vN and the orphan vN+1 objects are unreferenced-pattern
  dirs the next preamble GC removes. Crash after the swap: readers are on
  vN+1 and the old objects are already in ``retired``. No state needs a
  roll-forward; recovery IS garbage collection.
* Object stores without atomic rename still need a conditional-put for
  the pointer file (it is a table format's commit log in miniature) —
  the same honest raw-parquet limit the old rename protocols documented.

Object directories are named ``{logical}-v{version:06d}``. COMMITTED
versions are monotonic per store (every pointer write bumps ``version``),
so a retired name can never collide with a later live one; a CRASHED
stage's version number is reused by the next mutation, which is safe
because that mutation's preamble GC deletes the orphan dirs under the
same lock before staging. Directories that don't match the pattern —
legacy fixed names like ``corpus`` or ``bucket=3`` — are adopted as
objects by the migration paths and only ever deleted via an explicit
``retired`` entry.
"""

from __future__ import annotations

import json
import os
import re

POINTER = "_layout.json"

# crashed-stage detection: any object-pattern dir not referenced by the
# live pointer is garbage (versions are never reused)
OBJECT_RE = re.compile(r"^[a-z][a-z0-9_]*-v\d{6}$")


class StoreIO:
    """Filesystem primitives for a persisted store, resolved from the
    store path itself via Hadoop's FileSystem API — the same discipline
    as similarity._hadoop_fs (advice r11: the SCD2 protocol previously
    rode os.rename/os.path.isdir/shutil, which silently pass for hdfs://
    and s3a:// paths, so the 'FileSystem.rename on HDFS' the docstring
    promised was vacuous exactly where an interrupted commit is most
    expensive). Callers that hold the session pass it in (review r12:
    getActiveSession() is thread-local, so an off-main-thread merge —
    e.g. the ThreadingHTTPServer — would silently fall back to os-path
    semantics, or refuse an hdfs:// store, with a live session in hand).
    A genuinely sessionless caller (scd2_recover from a bare process)
    falls back to os-path semantics for plainly-local paths and refuses
    schemed paths it cannot resolve."""

    def __init__(self, anchor: str, spark=None):
        from pyspark.sql import SparkSession

        spark = spark or SparkSession.getActiveSession()
        if spark is None:
            if "://" in anchor:
                raise ValueError(
                    "persisted store on a non-local filesystem needs an "
                    f"active SparkSession to resolve it: {anchor}"
                )
            self._fs = None
        else:
            jvm = spark._jvm
            jpath = jvm.org.apache.hadoop.fs.Path(anchor)
            self._fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            self._jvm = jvm

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def exists(self, path: str) -> bool:
        if self._fs is None:
            return os.path.exists(path)
        return self._fs.exists(self._p(path))

    def isdir(self, path: str) -> bool:
        if self._fs is None:
            return os.path.isdir(path)
        return self._fs.isDirectory(self._p(path))

    def rename(self, src: str, dst: str) -> None:
        # Hadoop rename moves src INTO an existing dst directory instead
        # of failing like POSIX — call sites here rename onto
        # non-existent destinations by protocol, so a False return is a
        # genuine protocol violation, not a race.
        if self._fs is None:
            os.rename(src, dst)
        elif not self._fs.rename(self._p(src), self._p(dst)):
            raise OSError(f"FileSystem.rename failed: {src} -> {dst}")

    def rmtree(self, path: str) -> None:
        if self._fs is None:
            import shutil

            shutil.rmtree(path, ignore_errors=True)
        else:
            self._fs.delete(self._p(path), True)

    def remove(self, path: str) -> None:
        if self._fs is None:
            os.remove(path)
        else:
            self._fs.delete(self._p(path), False)

    def list_names(self, path: str) -> list[str]:
        if self._fs is None:
            return os.listdir(path)
        return [
            s.getPath().getName()
            for s in self._fs.listStatus(self._p(path))
        ]

    def write_atomic(self, path: str, text: str) -> None:
        # sibling tmp + durable flush + rename: the file either exists
        # complete or not at all (review r11 — a torn manifest would
        # block every future mutation with a bare JSONDecodeError)
        tmp = path + ".tmp"
        if self._fs is None:
            with open(tmp, "w") as f:
                f.write(text)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)
            return
        out = self._fs.create(self._p(tmp), True)
        out.write(bytearray(text.encode("utf-8")))
        try:
            out.hsync()
        except Exception:
            pass  # not every FS exposes hsync; close still flushes
        out.close()
        if self._fs.exists(self._p(path)):
            self._fs.delete(self._p(path), False)
        self.rename(tmp, path)

    def read_text(self, path: str) -> str:
        if self._fs is None:
            with open(path) as f:
                return f.read()
        ins = self._fs.open(self._p(path))
        try:
            return bytes(
                self._jvm.org.apache.commons.io.IOUtils.toByteArray(ins)
            ).decode("utf-8")
        finally:
            ins.close()


def object_dir(logical: str, version: int) -> str:
    """Physical directory name for ``logical`` created at ``version``."""
    return f"{logical}-v{version:06d}"


def pointer_read(io: StoreIO, path: str) -> dict | None:
    """The live layout pointer, or None for a legacy (pre-pointer) or
    absent store. Shape: ``{"version": int, "objects": {logical:
    dirname}, "retired": [dirname, ...], ...store-specific extras}``."""
    p = os.path.join(path, POINTER)
    if not io.exists(p):
        return None
    return json.loads(io.read_text(p))


def pointer_write(io: StoreIO, path: str, layout: dict) -> None:
    """Atomically publish ``layout`` as the live pointer — the single
    commit step of every destructive mutation. Caller holds the store's
    mutation lock and has already written every object ``layout``
    references."""
    io.write_atomic(os.path.join(path, POINTER), json.dumps(layout))


def retired_union(layout: dict | None, newly, live_names) -> list:
    """The ``retired`` list for a pointer swap: the objects this swap
    replaces UNION the prior pointer's still-unreclaimed retirees,
    minus anything the new pointer references. Carrying the prior list
    forward matters when one lock holder swaps TWICE before any
    preamble GC runs (e.g. an SCD2 rebuild followed by its delta
    merge): overwriting ``retired`` would orphan the first swap's
    retirees, and non-pattern names (adopted legacy dirs) would then
    never be reclaimed at all. Deleting an already-GC'd name later is
    a harmless no-op, so the union is always safe."""
    prior = [] if layout is None else layout.get("retired", [])
    return sorted((set(prior) | set(newly)) - set(live_names))


def pointer_gc(io: StoreIO, path: str, layout: dict | None) -> list[str]:
    """Mutation-preamble garbage collection (caller holds the lock):
    delete (a) every directory the live pointer retired at its last
    swap — the one-mutation-cycle reader grace expiring — and (b) every
    object-pattern directory the pointer doesn't reference (a crashed
    mutation's orphan stage; versions are never reused, so the pattern
    match can't hit a live object). Legacy fixed-name directories are
    only deleted via explicit ``retired`` entries. Returns the names
    removed. A None layout (legacy store) GCs nothing — pre-pointer
    stores have no object-pattern dirs by construction."""
    if layout is None or not io.isdir(path):
        return []
    live = set(layout.get("objects", {}).values())
    # SCD2 stores map per-bucket objects under a nested dict; fold any
    # dict-valued extras' values into the live set so store-specific
    # object maps (e.g. "buckets") are honored without schema coupling
    for v in layout.values():
        if isinstance(v, dict):
            live |= {x for x in v.values() if isinstance(x, str)}
    removed = []
    retired = [n for n in layout.get("retired", []) if n not in live]
    names = set(io.list_names(path))
    for n in retired:
        if n in names:
            io.rmtree(os.path.join(path, n))
            removed.append(n)
    for n in sorted(names - live):
        if OBJECT_RE.match(n) and n not in retired:
            io.rmtree(os.path.join(path, n))
            removed.append(n)
    return removed
