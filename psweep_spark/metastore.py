"""Commit-metadata store abstraction — the object-store-safe half of
the Database commit protocol (VERDICT r3 item 4).

The reference keeps its whole database in one pickled DataFrame
(``/root/reference/src/psweep/psweep.py:36,1334-1336``), so it has no
commit protocol at all.  A shared Parquet table needs one, and the
protocol must not assume POSIX primitives: S3-style object stores have
no atomic rename and no ``O_CREAT|O_EXCL``.  What they DO provide is a
**conditional put** ("create this key only if it does not exist" — S3
``If-None-Match: *`` since 2024, GCS ``ifGenerationMatch=0``, Azure
``If-None-Match`` ETags, HDFS/local ``O_EXCL``).  So conditional put is
the ONLY primitive this interface requires; everything above it —
versioned-manifest CAS for sequence reservation, the advisory writer
lock for local file moves — is built from it.

Concretely, ``Database`` commits metadata as immutable versioned
manifests ``_psweep_meta.v{N}.json``: a writer reads the highest
version, computes its update, and conditional-puts version ``N+1``.
First writer wins; the loser re-reads and retries (optimistic
concurrency — the same shape as a Delta/Iceberg commit, minus the file
listing, which Parquet directory layout still provides).
"""

from __future__ import annotations

import os
import threading


class MetaStore:
    """Key/bytes store exposing the conditional-put primitive.

    Keys are flat relative names (no directories).  Implementations
    must make :meth:`put_if_absent` atomic: of N concurrent calls for
    the same absent key, exactly one returns True.
    """

    def get(self, key: str) -> bytes | None:
        raise NotImplementedError

    def put_if_absent(self, key: str, data: bytes) -> bool:
        """Create ``key`` with ``data`` iff it does not exist.
        Returns True on success, False if the key already existed."""
        raise NotImplementedError

    def delete(self, key: str) -> None:
        raise NotImplementedError

    def delete_if_match(self, key: str, expected: bytes) -> bool:
        """Delete ``key`` only if its current payload equals
        ``expected``; returns True iff this call removed it.  Object
        stores provide this natively (S3 ``If-Match`` on DELETE, GCS
        ``ifGenerationMatch``, Azure ETag preconditions); it is the
        primitive that makes lock steal/release safe — an owner or
        stealer can never remove a lock record it did not observe.

        The base implementation is get-then-compare-then-delete, which
        shrinks but does not close the race window; concrete stores
        override with their atomic form."""
        if self.get(key) != expected:
            return False
        self.delete(key)
        return True

    def list_keys(self, prefix: str = "") -> list[str]:
        raise NotImplementedError


class LocalFSMetaStore(MetaStore):
    """Local-filesystem store: conditional put via ``O_CREAT|O_EXCL``
    (atomic on POSIX filesystems and HDFS — the create either wins or
    raises).  This is the default backing for :class:`Database`."""

    def __init__(self, root: str):
        self.root = os.path.abspath(root)

    def _p(self, key: str) -> str:
        return os.path.join(self.root, key)

    def get(self, key: str) -> bytes | None:
        try:
            with open(self._p(key), "rb") as fh:
                return fh.read()
        except OSError:
            return None

    def put_if_absent(self, key: str, data: bytes) -> bool:
        # Publish atomically: write the payload to a private tmp file,
        # then os.link(tmp, key).  link() fails with EEXIST if the key
        # exists (the conditional), and on success the key springs into
        # existence already holding the full payload — a concurrent
        # reader can never observe a torn or empty manifest, and a
        # writer killed mid-call leaves at worst an orphan tmp file,
        # never a permanently-empty highest manifest.
        os.makedirs(self.root, exist_ok=True)
        tmp = self._p(f".tmp.{key}.{os.getpid()}.{threading.get_ident()}")
        with open(tmp, "wb") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, self._p(key))
        except FileExistsError:
            return False
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass
        return True

    def delete(self, key: str) -> None:
        try:
            os.unlink(self._p(key))
        except OSError:
            pass

    def delete_if_match(self, key: str, expected: bytes) -> bool:
        """Atomic-enough delete-if-match on POSIX: flock the file's
        inode (serializes concurrent delete_if_match callers), verify
        the path still names that inode (``put_if_absent`` only ever
        *creates* keys, so a same-inode path means the payload we read
        is the payload the path holds), compare, then unlink.  Two
        racing stealers cannot both succeed, and neither can remove a
        fresh lock written after its observation."""
        import fcntl

        path = self._p(key)
        try:
            fd = os.open(path, os.O_RDONLY)
        except OSError:
            return False
        try:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except OSError:
                return False
            st_fd = os.fstat(fd)
            try:
                st_path = os.stat(path)
            except OSError:
                return False  # already deleted by the flock winner
            if (st_fd.st_dev, st_fd.st_ino) != (st_path.st_dev, st_path.st_ino):
                return False  # key was deleted and re-created since open
            with open(fd, "rb", closefd=False) as fh:
                data = fh.read()
            if data != expected:
                return False
            os.unlink(path)
            return True
        finally:
            os.close(fd)

    def list_keys(self, prefix: str = "") -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            n for n in os.listdir(self.root)
            if n.startswith(prefix) and os.path.isfile(self._p(n))
            and not n.startswith(".tmp.")
        )


class InMemoryConditionalStore(MetaStore):
    """Simulated object store for tests: provides ONLY the object-store
    API surface (GET / conditional PUT / DELETE / LIST) — no renames,
    no ``O_EXCL`` files, no mtimes.  A protocol that is correct against
    this store makes no hidden POSIX assumptions.

    Stores are shared per namespace (like buckets) so concurrent
    writers opening the same database path race against the same
    state.  The internal mutex is the stand-in for the store's own
    conditional-put atomicity guarantee, not a lock the protocol may
    rely on.
    """

    _registry: dict[str, "InMemoryConditionalStore"] = {}
    _registry_mu = threading.Lock()

    def __init__(self) -> None:
        self._objects: dict[str, bytes] = {}
        self._mu = threading.Lock()
        self.put_attempts = 0
        self.put_conflicts = 0

    @classmethod
    def for_namespace(cls, ns: str) -> "InMemoryConditionalStore":
        with cls._registry_mu:
            if ns not in cls._registry:
                cls._registry[ns] = cls()
            return cls._registry[ns]

    @classmethod
    def reset_namespace(cls, ns: str) -> None:
        with cls._registry_mu:
            cls._registry.pop(ns, None)

    def get(self, key: str) -> bytes | None:
        with self._mu:
            return self._objects.get(key)

    def put_if_absent(self, key: str, data: bytes) -> bool:
        with self._mu:
            self.put_attempts += 1
            if key in self._objects:
                self.put_conflicts += 1
                return False
            self._objects[key] = bytes(data)
            return True

    def delete(self, key: str) -> None:
        with self._mu:
            self._objects.pop(key, None)

    def delete_if_match(self, key: str, expected: bytes) -> bool:
        with self._mu:
            if self._objects.get(key) != expected:
                return False
            del self._objects[key]
            return True

    def list_keys(self, prefix: str = "") -> list[str]:
        with self._mu:
            return sorted(k for k in self._objects if k.startswith(prefix))
