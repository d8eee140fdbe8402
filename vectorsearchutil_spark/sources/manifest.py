"""Manifest-log table: ACID append/replace on plain Parquet with no
extra dependencies — the Delta/Iceberg posture for VectorStore when
those jars are unavailable (VERDICT r2 #6).

Why the path-mode store's rename swap is not enough: ``os.rename`` of
a directory is atomic on a local filesystem but not on object stores
(S3/GCS rename = copy+delete, non-atomic, and readers can observe the
gap). This log borrows the design that Delta Lake built for exactly
that problem:

* **data files are immutable** — every transaction writes a fresh
  ``data/tx-<uuid>/`` directory and never touches existing ones; an
  append writes ONLY the appended rows (no store rewrite, no staging
  double-write);
* **the manifest is the source of truth** — ``_log/v<N>.json`` lists
  the data directories visible at version N. Readers resolve the
  highest committed version and read exactly those directories, so a
  half-written transaction (crash before commit) is simply invisible;
* **commits are atomic create-exclusive** — ``O_CREAT|O_EXCL`` of the
  next version file either fully succeeds or fully fails. On object
  stores the same primitive is a conditional PUT
  (``If-None-Match: *``), which S3, GCS and ABFS all support;
  concurrent writers race on the version number and the loser
  retries on the next version (optimistic concurrency);
* **vacuum** removes data directories no manifest references.

Contrast with the reference's per-row SQLite transactions
(``vsu/base/VectorSearchBase.py:78``): one commit per distributed
batch, same atomicity guarantee, object-store-safe.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class ManifestLog:
    """A versioned collection of immutable parquet directories."""

    def __init__(self, base: str):
        self.base = base.rstrip("/")
        self.log_dir = os.path.join(self.base, "_log")
        self.data_dir = os.path.join(self.base, "data")

    # -- versions ------------------------------------------------------

    def _version_of(self, name: str) -> int | None:
        if name.startswith("v") and name.endswith(".json"):
            try:
                return int(name[1:-5])
            except ValueError:
                return None
        return None

    def latest_version(self) -> int | None:
        if not os.path.isdir(self.log_dir):
            return None
        versions = [
            v
            for name in os.listdir(self.log_dir)
            if (v := self._version_of(name)) is not None
        ]
        return max(versions, default=None)

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self.log_dir, f"v{version}.json")) as fh:
            return json.load(fh)

    def dirs(self, version: int | None = None) -> list[str]:
        """Data directories visible at ``version`` (default latest)."""
        if version is None:
            version = self.latest_version()
        if version is None:
            return []
        return self._manifest(version)["dirs"]

    # -- transactions --------------------------------------------------

    def write_and_commit(
        self, df: DataFrame, mode: str = "append", max_retries: int = 20
    ) -> int:
        """Write ``df`` as a new immutable data directory, then commit
        it as the next version. ``mode='append'`` keeps the parent
        version's directories; ``'replace'`` starts fresh. Returns the
        committed version. A crash before the commit leaves only an
        unreferenced directory (invisible; vacuum removes it)."""
        assert mode in ("append", "replace")
        tx = f"tx-{uuid.uuid4().hex}"
        tx_dir = os.path.join(self.data_dir, tx)
        df.write.parquet(tx_dir)
        os.makedirs(self.log_dir, exist_ok=True)
        for _ in range(max_retries):
            parent = self.latest_version()
            version = 0 if parent is None else parent + 1
            dirs = [] if (mode == "replace" or parent is None) else list(
                self._manifest(parent)["dirs"]
            )
            dirs.append(tx)
            payload = json.dumps(
                {"version": version, "parent": parent, "mode": mode,
                 "dirs": dirs}
            )
            path = os.path.join(self.log_dir, f"v{version}.json")
            try:
                # atomic put-if-absent: the object-store analog is a
                # conditional PUT; exactly one writer wins a version
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                continue  # lost the race — recompute against new parent
            with os.fdopen(fd, "w") as fh:
                fh.write(payload)
            return version
        raise RuntimeError(f"commit contention: {max_retries} losses")

    # -- reads ---------------------------------------------------------

    def read(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame | None:
        """The table at ``version`` (default latest; time travel for
        free — old manifests still describe old snapshots). None if no
        version is committed or the latest snapshot is empty."""
        dirs = self.dirs(version)
        if not dirs:
            return None
        return spark.read.parquet(
            *[os.path.join(self.data_dir, d) for d in dirs]
        )

    # -- maintenance ---------------------------------------------------

    def vacuum(self, keep_versions: int = 1) -> list[str]:
        """Delete data directories referenced by NO retained manifest
        (aborted transactions + compacted-away history). Retains the
        newest ``keep_versions`` manifests' references."""
        latest = self.latest_version()
        if latest is None:
            return []
        keep: set[str] = set()
        for v in range(max(0, latest - keep_versions + 1), latest + 1):
            try:
                keep.update(self._manifest(v)["dirs"])
            except FileNotFoundError:
                pass
        removed = []
        if os.path.isdir(self.data_dir):
            for name in os.listdir(self.data_dir):
                if name not in keep:
                    shutil.rmtree(
                        os.path.join(self.data_dir, name),
                        ignore_errors=True,
                    )
                    removed.append(name)
        return removed

    def compact(self, spark: SparkSession, target_files: int = 1) -> int:
        """Rewrite the live snapshot into one directory of
        ``target_files`` files and commit it as a replace — readers of
        older versions are unaffected (their manifests still resolve
        until vacuumed)."""
        df = self.read(spark)
        if df is None:
            return self.latest_version() or 0
        return self.write_and_commit(
            df.coalesce(target_files), mode="replace"
        )

    def drop(self) -> None:
        shutil.rmtree(self.base, ignore_errors=True)
