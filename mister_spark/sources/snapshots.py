"""Snapshot tables: a lightweight transactional table format.

The repo's answer to the 'no Delta/Iceberg in the sandbox' gap: the
same core ideas those formats implement — an immutable data-file pool,
a versioned MANIFEST naming which files are in each snapshot, atomic
commits via create-exclusive manifest writes, time-travel reads, and
min/max file stats for pruning copy-on-write deletes — in plain
parquet + JSON, no external jars.

Layout under the table root:

    data/c{version}-{op}/part-*.parquet   immutable per-commit dirs
    manifests/v{version:08d}.json         snapshot = list of dir entries

A snapshot's manifest entry records the data dir, its row count, and
min/max stats for the declared stats columns. Readers list manifests,
pick the requested (default: latest) version, and read exactly the
dirs it names — a half-written data dir is invisible until its
manifest commits, and old versions stay readable until explicitly
garbage-collected. Commits are optimistic: the manifest file is
created with O_EXCL, so two writers racing to the same version lose
deterministically (ConcurrentCommitError) and the loser retries on
top of the new head — the same protocol Iceberg runs against an
atomic-swap catalog. (On an object store without atomic create, the
manifest write would go through a conditional-put/catalog endpoint;
the driver-side metadata flow is unchanged.)

Metadata stays O(#commits + #files) on the driver — exactly what the
table formats do; data moves only through Spark jobs.
"""

from __future__ import annotations

import json
import os
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession, functions as F


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this version first; re-read and retry."""


class SnapshotTable:
    def __init__(
        self, spark: SparkSession, path: str, stats_cols: Iterable[str] = ()
    ) -> None:
        self.spark = spark
        self.path = path.rstrip("/")
        self.stats_cols = list(stats_cols)
        os.makedirs(os.path.join(self.path, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(self.path, "data"), exist_ok=True)

    # ----- manifest bookkeeping -------------------------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, "manifests", f"v{version:08d}.json")

    def versions(self) -> list[int]:
        mdir = os.path.join(self.path, "manifests")
        out = []
        for name in os.listdir(mdir):
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _load(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        return [self._load(v) for v in self.versions()]

    def _commit(self, manifest: dict) -> int:
        """Atomically publish `manifest` as the next version (O_EXCL
        create — the loser of a race gets ConcurrentCommitError)."""
        head = self.current_version()
        version = (head if head is not None else -1) + 1
        if manifest.get("parent", head) != head:
            raise ConcurrentCommitError(
                f"table advanced to v{head} past expected parent"
            )
        manifest["version"] = version
        manifest["parent"] = head
        try:
            fd = os.open(
                self._manifest_path(version), os.O_CREAT | os.O_EXCL | os.O_WRONLY
            )
        except FileExistsError as exc:
            raise ConcurrentCommitError(
                f"version {version} committed concurrently"
            ) from exc
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1)
        return version

    # ----- data writes ----------------------------------------------
    def _write_dir(self, df: DataFrame, version_hint: int, op: str) -> dict:
        """Write df to an immutable per-commit dir and return its
        manifest entry (rows + per-column min/max from ONE agg pass —
        production table formats read these from parquet footers)."""
        rel = f"data/c{version_hint}-{op}"
        full = os.path.join(self.path, rel)
        if os.path.exists(full):  # version race: pick a fresh suffix
            i = 1
            while os.path.exists(f"{full}.{i}"):
                i += 1
            rel, full = f"{rel}.{i}", f"{full}.{i}"
        df.write.parquet(full)
        aggs = [F.count(F.lit(1)).alias("_n")]
        for c in self.stats_cols:
            aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
        row = df.agg(*aggs).collect()[0]
        stats = {
            c: [row[f"_mn_{c}"], row[f"_mx_{c}"]] for c in self.stats_cols
        }
        return {"dir": rel, "rows": row["_n"], "stats": stats}

    def create(self, df: DataFrame) -> int:
        if self.current_version() is not None:
            raise ValueError("table exists; use append/overwrite")
        entry = self._write_dir(df, 0, "create")
        return self._commit({"op": "create", "entries": [entry]})

    def append(self, df: DataFrame) -> int:
        head = self.current_version()
        if head is None:
            return self.create(df)
        entries = self._load(head)["entries"]
        entry = self._write_dir(df, head + 1, "append")
        return self._commit(
            {"op": "append", "parent": head, "entries": entries + [entry]}
        )

    def clone_from(self, src: "SnapshotTable", version: int | None = None) -> int:
        """Zero-copy shallow clone: commit a manifest whose entries
        reference the SOURCE table's data dirs by absolute path — no
        data moves. Subsequent writes on the clone create dirs under
        the clone's own path, so the tables diverge copy-on-write
        (Delta/Iceberg SHALLOW CLONE semantics). Vacuuming the source
        can strand a clone — the same documented hazard real formats
        carry."""
        if self.current_version() is not None:
            raise ValueError("clone target must be empty")
        v = src.current_version() if version is None else version
        entries = [
            {**e, "dir": os.path.join(src.path, e["dir"])}
            for e in src._load(v)["entries"]
        ]
        return self._commit(
            {"op": "clone", "source": src.path, "entries": entries}
        )

    def overwrite(self, df: DataFrame) -> int:
        head = self.current_version()
        entry = self._write_dir(df, (head or 0) + 1, "overwrite")
        return self._commit(
            {"op": "overwrite", "parent": head, "entries": [entry]}
        )

    def delete_range(self, col: str, lo, hi) -> int:
        """Copy-on-write delete of rows with lo <= col <= hi. Dirs
        whose [min, max] stats don't intersect the range survive
        UNTOUCHED (no read, no rewrite — the pruning that makes
        copy-on-write affordable); intersecting dirs are rewritten
        filtered."""
        head = self.current_version()
        if head is None:
            raise ValueError("empty table")
        if col not in self.stats_cols:
            raise ValueError(f"no stats tracked for {col!r}")
        new_entries = []
        for e in self._load(head)["entries"]:
            mn, mx = e["stats"][col]
            if mn is None or mx is None or mx < lo or mn > hi:
                new_entries.append(e)  # provably untouched
                continue
            kept = self.spark.read.parquet(
                os.path.join(self.path, e["dir"])
            ).filter(~F.col(col).between(lo, hi))
            entry = self._write_dir(kept, head + 1, "delete")
            if entry["rows"] > 0:
                new_entries.append(entry)
        return self._commit(
            {
                "op": "delete_range",
                "parent": head,
                "predicate": {"col": col, "lo": lo, "hi": hi},
                "entries": new_entries,
            }
        )

    def merge(self, df: DataFrame, key: str) -> int:
        """MERGE INTO (upsert): rows of `df` replace existing rows with
        the same `key`; unmatched rows insert. Copy-on-write with the
        same stats pruning as delete_range — dirs whose [min, max] key
        stats don't intersect the incoming key range survive untouched;
        intersecting dirs are rewritten with matched keys anti-joined
        out (broadcast — the incoming batch is the small side of a CDC
        merge). One new dir carries the whole incoming batch."""
        head = self.current_version()
        if head is None:
            return self.create(df)
        if key not in self.stats_cols:
            raise ValueError(f"no stats tracked for {key!r}")
        krow = df.agg(F.min(key).alias("mn"), F.max(key).alias("mx")).collect()[0]
        klo, khi = krow["mn"], krow["mx"]
        keys = df.select(key).distinct()
        new_entries = []
        for e in self._load(head)["entries"]:
            mn, mx = e["stats"][key]
            if mn is None or klo is None or mx < klo or mn > khi:
                new_entries.append(e)  # provably disjoint key range
                continue
            kept = self.spark.read.parquet(
                os.path.join(self.path, e["dir"])
            ).join(F.broadcast(keys), key, "left_anti")
            entry = self._write_dir(kept, head + 1, "merge")
            if entry["rows"] > 0:
                new_entries.append(entry)
        new_entries.append(self._write_dir(df, head + 1, "upsert"))
        return self._commit(
            {"op": "merge", "parent": head, "key": key, "entries": new_entries}
        )

    def vacuum(self, retain_last: int = 1) -> dict:
        """Physically delete versions older than the newest
        ``retain_last`` manifests, plus every data dir no retained
        manifest references. Time travel to a vacuumed version then
        fails LOUDLY (missing manifest) instead of silently reading
        dangling files. Returns {"dropped_versions", "deleted_dirs",
        "kept_dirs"} for audit.

        Driver-side work is O(#versions + #dirs) metadata only — the
        deletes are directory removals, never a data read."""
        import shutil

        if retain_last < 1:
            raise ValueError("retain_last must be >= 1")
        vs = self.versions()
        if len(vs) <= retain_last:
            return {"dropped_versions": [], "deleted_dirs": [], "kept_dirs": []}
        keep_vs = vs[-retain_last:]
        drop_vs = vs[: -retain_last]
        referenced = set()
        for v in keep_vs:
            for e in self._load(v)["entries"]:
                referenced.add(e["dir"])
        deleted = []
        for v in drop_vs:
            for e in self._load(v)["entries"]:
                rel = e["dir"]
                full = os.path.join(self.path, rel)
                if rel not in referenced and os.path.exists(full):
                    shutil.rmtree(full)
                    deleted.append(rel)
            os.remove(self._manifest_path(v))
        return {
            "dropped_versions": drop_vs,
            "deleted_dirs": sorted(set(deleted)),
            "kept_dirs": sorted(referenced),
        }

    # ----- reads ----------------------------------------------------
    def read(self, version: int | None = None) -> DataFrame:
        head = self.current_version()
        if head is None:
            raise ValueError("empty table")
        v = head if version is None else version
        if version is not None and not os.path.exists(self._manifest_path(v)):
            raise ValueError(
                f"version {v} does not exist (vacuumed or never written)"
            )
        entries = self._load(v)["entries"]
        if not entries:
            return self.spark.createDataFrame([], schema="dummy string").limit(0)
        paths = [os.path.join(self.path, e["dir"]) for e in entries]
        # mergeSchema: commits may ADD columns (schema evolution); older
        # dirs surface the new columns as null, exactly like the table
        # formats this mirrors
        return self.spark.read.option("mergeSchema", "true").parquet(*paths)

    def row_count(self, version: int | None = None) -> int:
        v = self.current_version() if version is None else version
        return sum(e["rows"] for e in self._load(v)["entries"])
