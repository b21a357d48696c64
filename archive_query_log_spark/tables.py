"""Snapshot tables — Iceberg-style commit log over parquet.

Why not Iceberg proper: this sandbox ships no Iceberg catalog/runtime jars,
so the storage layer is an explicit, minimal reimplementation of the part of
the spec the pipeline needs — an atomic, append-or-overwrite commit log of
parquet data files with table metadata per snapshot — kept behind this one
module so a real Iceberg catalog can replace it by swapping
``SnapshotTable`` for ``spark.read/writeTo(...)`` calls (SURVEY.md §7.3e).

Guarantees used by the crawler (SURVEY.md §2.11):
- a commit is visible iff its manifest JSON was atomically renamed into
  ``_snapshots/`` — a killed run leaves at most orphan data files, never a
  torn table;
- readers always see the latest *committed* snapshot → deterministic resume;
- every manifest records op + row_count + lineage metadata (wave id,
  parent snapshot), giving the per-wave lineage the north_rule asks for.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.snap_dir = self.path / "_snapshots"
        self.data_dir = self.path / "data"

    # -- commit log ---------------------------------------------------------

    def _versions(self) -> list[int]:
        if not self.snap_dir.exists():
            return []
        return sorted(
            int(p.stem[1:]) for p in self.snap_dir.glob("v*.json")
        )

    def latest_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict[str, Any]:
        return json.loads((self.snap_dir / f"v{version}.json").read_text())

    def exists(self) -> bool:
        return self.latest_version() is not None

    def commit(
        self,
        df: DataFrame,
        op: str = "append",
        meta: dict[str, Any] | None = None,
    ) -> int:
        """Write df as new data files and atomically publish a new snapshot."""
        assert op in ("append", "overwrite")
        self.snap_dir.mkdir(parents=True, exist_ok=True)
        parent = self.latest_version()
        version = (parent + 1) if parent is not None else 0
        file_dir = self.data_dir / f"v{version}-{uuid.uuid4().hex[:8]}"
        df.write.mode("errorifexists").parquet(str(file_dir))
        dirs = [str(file_dir)]
        if op == "append" and parent is not None:
            dirs = self._manifest(parent)["data_dirs"] + dirs
        manifest = {
            "version": version,
            "parent": parent,
            "op": op,
            "data_dirs": dirs,
            "committed_at": time.time(),
            "meta": meta or {},
        }
        tmp = self.snap_dir / f".v{version}.json.tmp.{uuid.uuid4().hex[:6]}"
        tmp.write_text(json.dumps(manifest, indent=1))
        os.replace(tmp, self.snap_dir / f"v{version}.json")
        return version

    # -- read ---------------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed snapshot at {self.path}")
        dirs = self._manifest(v)["data_dirs"]
        return spark.read.parquet(*dirs)

    def history(self) -> list[dict[str, Any]]:
        return [self._manifest(v) for v in self._versions()]
