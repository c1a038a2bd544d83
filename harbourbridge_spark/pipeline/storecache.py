"""Per-user on-disk cache for fixture-keyed persisted stores.

The *_against_store registry entries amortize corpus-side state (the
dedup signature store, the ANN index store, the curation gram/stat
store) across bench runs by persisting it once per fixture identity.
ADVICE r8: the original scheme rooted those stores at a predictable
world-shared temp path (``/tmp/hb_sig_store_<ident>``), which on a
multi-user host lets any other user pre-create the path (a poisoned
store or a symlink) that the probe would then trust, and stale stores
from regenerated fixtures accumulated forever.

This module fixes both:

- stores live under ONE per-user root created with mode 0700
  (``$XDG_CACHE_HOME`` or ``~/.cache``, falling back to a
  uid-suffixed tempdir when no home exists).  The root is verified to
  be an owned, non-symlink, 0700 directory on every call — a
  pre-created foreign directory raises instead of being trusted;
- within the root, each store is ``<kind>_<ident>``; acquiring a
  store for ``(kind, ident)`` EVICTS the oldest other ``<kind>_*``
  entries past a small keep bound (stale fixture identities from
  earlier regenerations age out) — the cache is bounded per kind per
  user while the handful of live fixture scales (sf0.001 tests,
  sf0.01 oracle, sf0.1 bench) keep their stores concurrently, which
  is what makes the probe-only bench entries measure the amortized
  shape.

Writers keep the build-into-tmp-then-rename protocol so a concurrent
or crashed builder can never publish a partial store.
"""

from __future__ import annotations

import contextlib
import fcntl
import os
import shutil
import stat
import tempfile


@contextlib.contextmanager
def store_lock(target: str, exclusive: bool = True):
    """Advisory lock serializing store MUTATIONS (never reads).

    The compaction-vs-append race is a LOST UPDATE, not a torn read:
    ``replace_store`` rebuilds from a point-in-time snapshot, so an
    append (new signature part files, a curation fold's
    read-merge-overwrite) landing between snapshot and swap would be
    silently destroyed by the swap.  Readers need no lock — a probe
    racing a swap dies with a missing-input error and the streaming
    layer retries with a fresh listing (test-pinned) — so probes
    never block compaction and vice versa; only WRITERS serialize:
    compaction takes the lock exclusively, appends take it shared
    (concurrent appends of distinct batches commute — signature
    appends are disjoint part files; curation folds are
    read-merge-overwrite and DO conflict with each other, but the
    streaming admission loop is the only curation appender and runs
    one micro-batch at a time).

    flock scopes to one host (this repo's execution shape); a
    multi-writer cluster deployment would swap this for its
    coordinator's lease — the lock POINT (around mutations, not
    reads) is the design, not the flock syscall."""
    lockpath = target.rstrip("/") + ".lock"
    os.makedirs(os.path.dirname(lockpath) or ".", exist_ok=True)
    fd = os.open(lockpath, os.O_CREAT | os.O_RDWR, 0o600)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX if exclusive else fcntl.LOCK_SH)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


def _user_cache_root() -> str:
    """The per-user store root, created 0700 and verified safe."""
    base = os.environ.get("XDG_CACHE_HOME")
    if not base:
        home = os.path.expanduser("~")
        if home and home != "~" and os.path.isdir(home):
            base = os.path.join(home, ".cache")
        else:
            # no usable home: uid-suffix under tempdir keeps the path
            # per-user; the 0700 + ownership check below still guards
            # against pre-creation by someone else
            base = os.path.join(tempfile.gettempdir(),
                                f"hb_cache_uid{os.getuid()}")
    root = os.path.join(base, "harbourbridge_spark", "stores")
    os.makedirs(root, mode=0o700, exist_ok=True)
    st = os.lstat(root)
    if stat.S_ISLNK(st.st_mode) or not stat.S_ISDIR(st.st_mode):
        raise RuntimeError(f"store cache root {root} is not a "
                           "directory (symlink attack?)")
    if st.st_uid != os.getuid():
        raise RuntimeError(f"store cache root {root} is owned by "
                           f"uid {st.st_uid}, not us")
    if st.st_mode & 0o077:
        os.chmod(root, 0o700)
    return root


_KEEP_PER_KIND = 3           # other-identity stores kept (newest)


def store_path(kind: str, ident: str) -> str:
    """Path for the ``(kind, ident)`` store; evicts all but the
    newest ``_KEEP_PER_KIND`` OTHER ``<kind>_*`` entries (stale
    fixture identities age out; concurrent live scales survive).
    Does not create the store itself — callers check existence and
    build via :func:`publish_store`."""
    root = _user_cache_root()
    name = f"{kind}_{ident}"
    others = []
    for entry in os.listdir(root):
        if entry.startswith(f"{kind}_") and entry != name \
                and not entry.endswith(".tmp"):
            p = os.path.join(root, entry)
            try:
                others.append((os.stat(p).st_mtime_ns, p))
            except OSError:
                continue
    others.sort(reverse=True)
    for _, p in others[_KEEP_PER_KIND:]:
        shutil.rmtree(p, ignore_errors=True)
    return os.path.join(root, name)


def replace_store(target: str, build, pre_locked: bool = False) -> None:
    """Compaction twin of :func:`publish_store`: ``build(tmp_path)`` a
    REPLACEMENT for an EXISTING store into a private sibling dir, then
    swap it in (rename old aside -> rename new in -> drop old).  A
    reader that grabbed the old path keeps a consistent snapshot (the
    rename doesn't disturb open handles on POSIX); a crash between the
    two renames leaves the ``.old.<pid>`` directory behind for manual
    recovery rather than a half-written store.  The ``build`` callable
    MUST materialize its input before writing (``localCheckpoint``) —
    it is replacing the very directory a lazy plan would re-read.

    On an object store / HDFS deployment the two renames map to the
    FileSystem.rename metadata operation; the pattern is unchanged.

    Holds the store's EXCLUSIVE mutation lock for build + swap so a
    concurrent APPEND cannot land between the build's snapshot and
    the swap and be silently destroyed (see :func:`store_lock`;
    readers never take the lock and ride the swap-retry instead).
    CALLER CONTRACT: if the replacement is built from a SNAPSHOT
    taken before this call, the caller must take the exclusive lock
    around snapshot + this call itself and pass ``pre_locked=True``
    (flock is not reentrant — a second exclusive acquisition in the
    same thread deadlocks); the e2e that caught this had a compact
    swap in a stale pre-append snapshot because only the swap was
    locked."""
    target = os.path.abspath(target)
    parent = os.path.dirname(target)
    with (contextlib.nullcontext() if pre_locked
          else store_lock(target, exclusive=True)):
        tmp = tempfile.mkdtemp(prefix=os.path.basename(target) + ".",
                               suffix=".tmp", dir=parent)
        old = os.path.join(
            parent, f"{os.path.basename(target)}.old.{os.getpid()}")
        try:
            built = os.path.join(tmp, "store")
            build(built)
            os.rename(target, old)
            try:
                os.rename(built, target)
            except OSError:
                os.rename(old, target)          # roll the swap back
                raise
            shutil.rmtree(old, ignore_errors=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


def publish_store(target: str, build) -> None:
    """Run ``build(tmp_path)`` into a private sibling dir, then rename
    it to ``target`` — the exists-check can never observe a partial
    store, and losing a rename race to a concurrent builder is fine
    (the winner built the same content from the same fixture)."""
    if os.path.exists(target):
        return
    parent = os.path.dirname(target)
    tmp = tempfile.mkdtemp(prefix=os.path.basename(target) + ".",
                           suffix=".tmp", dir=parent)
    try:
        built = os.path.join(tmp, "store")
        build(built)
        try:
            os.rename(built, target)
        except OSError:
            if not os.path.exists(target):
                raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
