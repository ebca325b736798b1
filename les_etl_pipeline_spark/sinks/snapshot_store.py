"""Versioned snapshot store: write-audit-publish over plain parquet.

The reference lands bronze/silver as Delta tables and leans on Delta's
transaction log for atomic replace and time travel
(generate_bronze_tables.py:81-86, les_main.py:28-39 in the reference).
``delta-spark`` is not installable in this container (COVERAGE.md §2.9),
so this module supplies the part of that contract a 100 TB pipeline
actually depends on, using nothing beyond parquet + atomic filesystem
rename:

- **Write**: each publish writes a brand-new immutable staging dir
  (``.tx-<nonce>/``) — never in place, so readers of the current version
  are untouched (cloud object stores: same pattern, unique prefixes).
- **Audit**: the caller's validation hook runs against the landed files
  BEFORE anything becomes visible; a failed audit leaves the store
  exactly as it was (the rejected staging dir is deleted on the spot; if
  the process dies mid-publish the dot-prefixed leftover is invisible to
  readers and swept by ``vacuum``).
- **Publish / arbitration**: the COMMIT POINT is one atomic
  ``os.rename(staging, v=<n>)``. A rename onto an existing non-empty
  directory fails on POSIX, and every staging dir contains a
  ``_COMMITTED`` marker file before the rename, so two concurrent
  writers racing for the same slot serialize: exactly one claims
  ``v=<n>``, the loser's rename raises and it either retries the next
  slot (blind write) or surfaces ``ConcurrentWriteError`` (optimistic
  read-modify-write via ``expected_version`` — Delta's commit-by-
  creating-the-next-log-file protocol, filesystem edition). No lost
  updates: claimed version dirs are never overwritten.
- **Current version** = the highest committed version on disk (marker
  files), so it can never move backwards even under racing publishers;
  the ``_CURRENT`` pointer file is maintained as a monotone read hint
  and for stores written by older revisions of this module.
- **Time travel**: old snapshot dirs stay until ``vacuum``; ``read``
  takes an explicit version.

``publish_dir`` exposes the same write-audit-claim cycle for MULTI-table
content (a builder callback materializes arbitrary files into the
staging dir): the streaming ANN index uses it to retrain-and-swap its
quantizer + reassigned postings as one atomic unit.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

CURRENT = "_CURRENT"
COMMITTED = "_COMMITTED"


class ConcurrentWriteError(RuntimeError):
    """Another writer committed first. For read-modify-write publishes
    (``expected_version=...``) the caller must re-read the new current
    version, re-derive its output, and retry — the classic optimistic-
    concurrency loop."""


class SnapshotStore:
    """Atomic-rename versioned parquet table (write-audit-publish) with
    optimistic multi-writer arbitration."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- version bookkeeping -------------------------------------------------
    def _pointer_path(self) -> str:
        return os.path.join(self.root, CURRENT)

    def _pointer_version(self) -> int | None:
        try:
            with open(self._pointer_path()) as f:
                return int(json.load(f)["version"])
        except (OSError, ValueError, KeyError):
            return None

    def _versions_on_disk(self, committed_only: bool = False) -> list[int]:
        out = []
        for name in os.listdir(self.root):
            if name.startswith("v="):
                try:
                    v = int(name[2:])
                except ValueError:
                    continue
                if committed_only and not os.path.exists(
                    os.path.join(self.root, name, COMMITTED)
                ):
                    continue
                out.append(v)
        return sorted(out)

    def current_version(self) -> int | None:
        """Highest committed version: max over marker-committed dirs and
        the pointer (which covers dirs published by older revisions of
        this module, pre-marker). Monotone under any writer race because
        claimed dirs are immutable."""
        cands = self._versions_on_disk(committed_only=True)
        ptr = self._pointer_version()
        if ptr is not None:
            cands = cands + [ptr]
        return max(cands) if cands else None

    # -- commit protocol -----------------------------------------------------
    def _staging_dir(self) -> str:
        return os.path.join(self.root, f".tx-{uuid.uuid4().hex[:12]}")

    def _claim(self, staging: str, expected_version: int | None) -> int:
        """Atomically promote ``staging`` to the next version slot.

        The rename is the commit point: POSIX rename onto an existing
        non-empty directory fails, and every staging dir holds the
        ``_COMMITTED`` marker before the rename, so a slot can be won by
        exactly one writer. With ``expected_version`` set, losing the
        race (or discovering the table moved since the caller's read)
        raises ``ConcurrentWriteError`` instead of silently publishing
        over a state the caller never saw."""
        while True:
            cur = self.current_version()
            if expected_version is not None and cur != expected_version:
                shutil.rmtree(staging, ignore_errors=True)
                raise ConcurrentWriteError(
                    f"table moved: expected v={expected_version}, found "
                    f"v={cur} — re-read and retry"
                )
            # next slot skips EVERY dir on disk, committed or not —
            # uncommitted orphans (legacy failed publishes) must not pin
            # the retry loop on a permanently-occupied slot
            on_disk = self._versions_on_disk()
            nxt = max([cur if cur is not None else -1] + on_disk) + 1
            try:
                os.rename(staging, os.path.join(self.root, f"v={nxt}"))
            except OSError:
                if expected_version is not None:
                    shutil.rmtree(staging, ignore_errors=True)
                    raise ConcurrentWriteError(
                        f"lost the race for v={nxt} — re-read and retry"
                    ) from None
                continue  # blind write: another writer took the slot; next
            self._advance_pointer(nxt)
            return nxt

    def _advance_pointer(self, version: int) -> None:
        """Best-effort monotone hint; correctness never depends on it
        (current_version() maxes over committed dirs)."""
        cur = self._pointer_version()
        if cur is not None and cur >= version:
            return
        fd, tmp = tempfile.mkstemp(prefix="._current.", dir=self.root)
        with os.fdopen(fd, "w") as f:
            json.dump({"version": version, "published_at": time.time()}, f)
        os.replace(tmp, self._pointer_path())

    # -- write / audit / publish ----------------------------------------------
    def publish(
        self,
        df: DataFrame,
        audit: Callable[[DataFrame], bool] | None = None,
        partition_by: str | None = None,
        expected_version: int | None = None,
    ) -> int:
        """Write df as the next snapshot, audit it, claim the version.

        Returns the published version. Raises ValueError (store
        untouched) if the audit rejects the landed data — the audit runs
        on the FILES AS WRITTEN, not the in-memory plan, so it catches
        write-path corruption too. With ``expected_version``, raises
        ``ConcurrentWriteError`` if any other writer committed since the
        caller read that version (optimistic concurrency; the caller
        re-reads and retries)."""
        staging = self._staging_dir()
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(staging)
        landed = self.spark.read.parquet(staging)
        if audit is not None and not audit(landed):
            shutil.rmtree(staging, ignore_errors=True)
            raise ValueError(
                f"audit rejected snapshot; current stays at v={self.current_version()}"
            )
        with open(os.path.join(staging, COMMITTED), "w") as f:
            f.write("1")
        return self._claim(staging, expected_version)

    def publish_dir(
        self,
        build: Callable[[str], None],
        audit: Callable[[str], bool] | None = None,
        expected_version: int | None = None,
    ) -> int:
        """Multi-table publish: ``build(staging_path)`` materializes
        arbitrary content (several parquet tables, manifests, ...) into
        the staging dir; the whole directory is then audited and claimed
        as ONE atomic version — the primitive behind the ANN index's
        retrain-and-swap."""
        staging = self._staging_dir()
        os.makedirs(staging, exist_ok=True)
        try:
            build(staging)
        except BaseException:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        if audit is not None and not audit(staging):
            shutil.rmtree(staging, ignore_errors=True)
            raise ValueError(
                f"audit rejected snapshot; current stays at v={self.current_version()}"
            )
        with open(os.path.join(staging, COMMITTED), "w") as f:
            f.write("1")
        return self._claim(staging, expected_version)

    # -- read / history ----------------------------------------------------
    def version_path(self, version: int | None = None) -> str:
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(
                f"snapshot store {self.root} has no published version"
            )
        return os.path.join(self.root, f"v={v}")

    def read(self, version: int | None = None) -> DataFrame:
        return self.spark.read.parquet(self.version_path(version))

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Drop snapshot dirs older than the last ``keep_last`` published
        versions (never the current one), plus any dot-prefixed staging
        debris from crashed publishes. Returns dropped versions."""
        cur = self.current_version()
        for name in os.listdir(self.root):
            if name.startswith(".tx-"):
                shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)
        if cur is None:
            return []
        keep = {v for v in self._versions_on_disk() if v > cur} | set(
            range(max(0, cur - keep_last + 1), cur + 1)
        )
        dropped = []
        for v in self._versions_on_disk():
            if v not in keep:
                shutil.rmtree(os.path.join(self.root, f"v={v}"), ignore_errors=True)
                dropped.append(v)
        return dropped
