"""Versioned snapshot store: write-audit-publish over plain parquet.

The reference lands bronze/silver as Delta tables and leans on Delta's
transaction log for atomic replace and time travel
(generate_bronze_tables.py:81-86, les_main.py:28-39 in the reference).
``delta-spark`` is not installable in this container (COVERAGE.md §2.9),
so this module supplies the part of that contract a 100 TB pipeline
actually depends on, using nothing beyond parquet + atomic filesystem
rename:

- **Write**: each publish writes a brand-new immutable snapshot dir
  (``v=<n>/``) — never in place, so readers of the current version are
  untouched (cloud object stores: same pattern, unique prefixes).
- **Audit**: the caller's validation hook runs against the landed files
  BEFORE anything becomes visible; a failed audit leaves the store
  exactly as it was (the rejected dir is deleted on the spot; if the
  process dies mid-publish the leftover dir is skipped — never
  published — by subsequent publishes).
- **Publish**: visibility flips by atomically replacing one small
  pointer file (``_CURRENT``) via write-to-temp + ``os.replace`` —
  readers see the old or the new version, never a mix and never a
  half-written table. This is the manifest-pointer move every table
  format (Delta/Iceberg/Hudi) builds on.
- **Time travel**: old snapshot dirs stay until ``vacuum``; ``read``
  takes an explicit version.

Single-writer by design (like the reference's per-run batch job); it
does not arbitrate concurrent publishers — that is the part that truly
needs a log/catalog service, and it is documented as out of scope
rather than half-implemented.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

CURRENT = "_CURRENT"


class SnapshotStore:
    """Atomic-pointer versioned parquet table (write-audit-publish)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- pointer -----------------------------------------------------------
    def _pointer_path(self) -> str:
        return os.path.join(self.root, CURRENT)

    def current_version(self) -> int | None:
        try:
            with open(self._pointer_path()) as f:
                return int(json.load(f)["version"])
        except (OSError, ValueError, KeyError):
            return None

    def _versions_on_disk(self) -> list[int]:
        out = []
        for name in os.listdir(self.root):
            if name.startswith("v="):
                try:
                    out.append(int(name[2:]))
                except ValueError:
                    continue
        return sorted(out)

    # -- write / audit / publish ------------------------------------------
    def publish(
        self,
        df: DataFrame,
        audit: Callable[[DataFrame], bool] | None = None,
        partition_by: str | None = None,
    ) -> int:
        """Write df as the next snapshot, audit it, flip the pointer.

        Returns the published version. Raises ValueError (store
        untouched) if the audit rejects the landed data — the audit runs
        on the FILES AS WRITTEN, not the in-memory plan, so it catches
        write-path corruption too."""
        cur = self.current_version()
        nxt = (cur if cur is not None else -1) + 1
        # skip any orphan dir a previously failed publish left behind
        on_disk = self._versions_on_disk()
        if on_disk and on_disk[-1] >= nxt:
            nxt = on_disk[-1] + 1
        snap_dir = os.path.join(self.root, f"v={nxt}")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(snap_dir)
        landed = self.spark.read.parquet(snap_dir)
        if audit is not None and not audit(landed):
            # remove the rejected dir so failed publishes don't accumulate
            # orphan snapshots (vacuum never drops versions > current)
            shutil.rmtree(snap_dir, ignore_errors=True)
            raise ValueError(
                f"audit rejected snapshot v={nxt}; current stays at v={cur}"
            )
        # atomic flip: temp file in the same directory, then os.replace
        # (POSIX atomic rename) — a reader of _CURRENT sees old or new,
        # never a partial write.
        fd, tmp = tempfile.mkstemp(prefix="._current.", dir=self.root)
        with os.fdopen(fd, "w") as f:
            json.dump({"version": nxt, "published_at": time.time()}, f)
        os.replace(tmp, self._pointer_path())
        return nxt

    # -- read / history ----------------------------------------------------
    def read(self, version: int | None = None) -> DataFrame:
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"snapshot store {self.root} has no published version")
        return self.spark.read.parquet(os.path.join(self.root, f"v={v}"))

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Drop snapshot dirs older than the last ``keep_last`` published
        versions (never the current one). Returns dropped versions."""
        cur = self.current_version()
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
