"""Snapshot-committed lake table with copy-on-write bucket MERGE.

An Iceberg-shaped table format implemented from scratch on parquet +
JSON snapshots, because no Iceberg runtime jar ships in this sandbox.
The semantics mirror Iceberg v2 copy-on-write:

- **Atomic commits**: a snapshot is a JSON file ``_meta/v<N>.json``
  created with ``os.link`` (fails if the version exists → optimistic
  concurrency, like Iceberg's metadata swap). Readers always see a
  complete snapshot or the previous one, never a torn state.
- **Bucketed layout**: data files are grouped by
  ``bucket = pmod(xxhash64(conv_id), num_buckets)`` (Iceberg's
  ``bucket(N, conv_id)`` transform). A MERGE rewrites only the buckets
  that contain changed keys — at 10^10 rows with 4096 buckets an epoch
  touching 1% of conversations rewrites ~1% of the table.
- **Schema evolution**: each snapshot carries its schema; columns are
  add-only (reference analog: ``ALTER TABLE ADD COLUMN`` per new
  DataFrame column, extractors/leaflink/extractor.py:1053-1082). Old
  files are read through the evolved schema; missing columns read as
  NULL (same as Iceberg column-id projection for add-only evolution).
- **Exactly-once**: every MERGE commit stamps the epoch id into the
  snapshot summary; committed epoch ids are carried forward so a
  replayed epoch is detected as a no-op (reference analog: the
  duplicate-batch check on ``_extracted_at``,
  extractors/repsly/extractor.py:703-718).
- **Time travel**: ``read(version=k)`` reads any retained snapshot —
  the basis for replay-from-checkpoint convergence tests.

On a deployment with a real Iceberg catalog, this class is the swap
point: ``merge()`` becomes ``MERGE INTO t USING s ON t.conv_id =
s.conv_id AND t.turn_idx = s.turn_idx WHEN MATCHED ... `` and the
snapshot summary check becomes Iceberg's snapshot-summary lookup. The
engine above it (dedup, epoch loop, manifests) is unchanged.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_warehouse_agnostic_spark.functions.scalars import bucket_of

_BUCKET = "_bucket"  # physical layout column kept in data files
_PB = "_pb"  # throwaway copy used only for partitionBy at write time
_PD = "_pd"  # time-partition dir (days(ts)/months(ts) transform value)

_GRANULE_FMT = {"day": "yyyy-MM-dd", "month": "yyyy-MM"}


def _file_day(relpath: str) -> str | None:
    """Time-partition value encoded in a data-file path, or None."""
    for seg in relpath.split(os.sep):
        if seg.startswith(f"{_PD}="):
            return seg.split("=", 1)[1]
    return None


class CommitConflict(RuntimeError):
    """Another writer committed this version first (optimistic lock).

    ``written_dir`` carries the losing attempt's data directory so the
    retry loop can reclaim it before re-trying."""

    def __init__(self, path: str, written_dir: str | None = None):
        super().__init__(path)
        self.written_dir = written_dir


@dataclass
class MergeResult:
    version: int
    epoch_id: int | None
    rows_written: int
    bytes_written: int
    buckets_rewritten: int
    skipped: bool = False


def _atomic_write_json(payload: dict, final_path: str) -> None:
    """tmp + fsync + hard-link publish (fails if final exists).

    Reference analog: watermark state atomic persistence — tmp write +
    fsync + md5 + rename (extractors/repsly/extractor.py:432-481)."""
    d = os.path.dirname(final_path)
    tmp = os.path.join(d, f"_tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, default=str)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, final_path)
    except FileExistsError as e:
        raise CommitConflict(final_path) from e
    finally:
        os.unlink(tmp)


class LakeTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        self.meta_dir = os.path.join(self.path, "_meta")
        self.data_dir = os.path.join(self.path, "data")
        # Upper bound on rows per data file (Spark maxRecordsPerFile).
        # At 10^10-row scale one-file-per-bucket writes would produce
        # multi-GB files; this splits them. rewrite_small_files is the
        # inverse (bin-packs the fragments the splitting leaves behind
        # in rarely-touched buckets).
        self.max_records_per_file: int | None = None
        # MERGE anti-join build side: when the caller KNOWS the changed
        # key count (the engine reads it off the staging write's
        # Observation) and it is under this bound, the key set is
        # broadcast so the survivors scan is never shuffled by key —
        # the guide-§3.1 "broadcast the side you know is small" call
        # the planner cannot make from size estimates alone. ~4M keys
        # ≈ low hundreds of MB built, fine for executors with tens of
        # GB; larger deltas fall back to the shuffled plan (AQE may
        # still localize it).
        self.broadcast_changed_keys_max_rows: int = 4_000_000

    # ---------------- snapshot bookkeeping ----------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key_cols: list[str],
        num_buckets: int = 64,
        partition_spec: dict | None = None,
    ) -> "LakeTable":
        """``partition_spec={"col": "ts", "transform": "day"|"month"}``
        adds a time dimension to the layout (Iceberg multi-transform
        spec ``bucket(N, key) × days(ts)``): each bucket's files are
        further split by the transform value, and a day-bounded
        ``read(day_range=...)`` opens ONLY that window's files instead
        of scanning every bucket end-to-end. Reference analog: bronze
        partitioned by extraction date
        (extractors/repsly/extractor.py:643-645) and silver by
        ``toYYYYMM`` (dbt/models/curated/repsly/client_notes.sql:6)."""
        if partition_spec is not None:
            if partition_spec.get("transform") not in _GRANULE_FMT:
                raise ValueError("partition_spec.transform must be 'day' or 'month'")
            if partition_spec.get("col") not in schema.names:
                raise ValueError("partition_spec.col must be a table column")
        t = cls(spark, path)
        os.makedirs(t.meta_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        snap = {
            "version": 1,
            "parent": None,
            "schema": schema.jsonValue(),
            "key_cols": key_cols,
            "num_buckets": num_buckets,
            "partition_spec": partition_spec,
            "files": {},  # bucket(str) -> [relpath, ...]
            "committed_epochs": [],
            "summary": {"operation": "create"},
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        _atomic_write_json(snap, os.path.join(t.meta_dir, "v00000001.json"))
        return t

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LakeTable":
        t = cls(spark, path)
        if t.latest_version() is None:
            raise FileNotFoundError(f"no lake table at {path}")
        return t

    def latest_version(self) -> int | None:
        if not os.path.isdir(self.meta_dir):
            return None
        versions = [
            int(f[1:9])
            for f in os.listdir(self.meta_dir)
            if f.startswith("v") and f.endswith(".json")
        ]
        return max(versions) if versions else None

    def snapshot(self, version: int | None = None) -> dict[str, Any]:
        v = version if version is not None else self.latest_version()
        with open(os.path.join(self.meta_dir, f"v{v:08d}.json")) as f:
            return json.load(f)

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.snapshot()["schema"])

    @property
    def key_cols(self) -> list[str]:
        return list(self.snapshot()["key_cols"])

    @property
    def num_buckets(self) -> int:
        return int(self.snapshot()["num_buckets"])

    @property
    def partition_spec(self) -> dict | None:
        return self.snapshot().get("partition_spec")

    def committed_epochs(self) -> list[int]:
        return list(self.snapshot().get("committed_epochs", []))

    def epoch_committed(self, epoch_id: int) -> bool:
        return epoch_id in self.snapshot().get("committed_epochs", [])

    def epoch_snapshot(self, epoch_id: int) -> dict | None:
        """Snapshot whose commit carried this epoch (recovery scan)."""
        v = self.latest_version()
        while v is not None:
            try:
                snap = self.snapshot(v)
            except FileNotFoundError:
                return None  # expired ancestor — epoch predates retention
            if snap["summary"].get("epoch_id") == epoch_id:
                return snap
            v = snap["parent"]
        return None

    # ---------------- read ----------------

    def _read_files(
        self,
        snap: dict,
        buckets: list[int] | None = None,
        day_range: tuple[str, str] | None = None,
    ) -> DataFrame:
        schema = T.StructType.fromJson(snap["schema"]).add(_BUCKET, T.IntegerType())
        files = []
        for b, paths in snap["files"].items():
            if buckets is None or int(b) in buckets:
                for p in paths:
                    if day_range is not None:
                        d = _file_day(p)
                        if d is not None and not (day_range[0] <= d <= day_range[1]):
                            continue
                    files.append(os.path.join(self.path, p))
        if not files:
            return self.spark.createDataFrame([], schema)
        # Explicit file list = manual partition pruning from snapshot
        # metadata (bucket -> files); add-only schema evolution works
        # because parquet fills columns absent from a file with NULL.
        return self.spark.read.schema(schema).parquet(*files)

    def read(
        self,
        version: int | None = None,
        buckets: list[int] | None = None,
        day_range: tuple[str, str] | None = None,
    ) -> DataFrame:
        """Current (or time-travel) table state; optionally pruned to a
        bucket subset and/or (with a time partition_spec) to an
        INCLUSIVE transform-value range, e.g.
        ``day_range=("2024-01-02", "2024-01-03")`` — a day-bounded scan
        opens only that window's files, never the whole table.

        ``day_range`` is only meaningful against a time-partitioned
        layout and its bounds must be spelled in the spec's granule
        format: comparing a ``yyyy-MM-dd`` bound against ``yyyy-MM``
        path values would silently mis-prune lexicographically, and a
        range on an unpartitioned table would silently return the whole
        table — both are errors, not best-effort filters."""
        snap = self.snapshot(version)
        if day_range is not None:
            spec = snap.get("partition_spec")
            if spec is None:
                raise ValueError(
                    "day_range requires a time partition_spec; this table has none "
                    "— use a plain .where() filter instead"
                )
            pat = {"day": r"^\d{4}-\d{2}-\d{2}$", "month": r"^\d{4}-\d{2}$"}[spec["transform"]]
            for bound in day_range:
                if not re.match(pat, str(bound)):
                    raise ValueError(
                        f"day_range bound {bound!r} does not match the table's "
                        f"'{spec['transform']}' granule format "
                        f"({_GRANULE_FMT[spec['transform']]})"
                    )
        return self._read_files(snap, buckets, day_range).drop(_BUCKET)

    # ---------------- write paths ----------------

    def write_bucketed(
        self,
        df: DataFrame,
        out_dir: str,
        extra_metrics: dict[str, F.Column] | None = None,
        compression: str | None = None,
    ) -> tuple[dict[str, list[str]], dict[str, int], int]:
        """Write df (must carry _bucket) under out_dir, one file set per
        bucket via partitionBy; returns (bucket->relpaths, observed
        metrics incl. 'rows', bytes). Metrics come from an Observation
        attached to the write — no extra pass over the data.

        ``compression`` overrides the session parquet codec for THIS
        write only (used for ephemeral staging deltas, which are
        written once, read back once or twice and deleted — a cheap
        codec there is pure CPU savings; table-at-rest files keep the
        session default zstd)."""
        obs = Observation(f"write-{os.path.basename(out_dir)}-{uuid.uuid4().hex[:6]}")
        metrics = {"rows": F.count(F.lit(1)).alias("rows")}
        for k, v in (extra_metrics or {}).items():
            metrics[k] = v.alias(k)
        spec = self.partition_spec
        staged = df.withColumn(_PB, F.col(_BUCKET))
        part_cols = [_PB]
        if spec and spec["col"] in df.columns:
            # Time dimension: the transform value becomes a directory
            # level under the bucket; pruning reads it back from paths.
            staged = staged.withColumn(
                _PD, F.date_format(F.col(spec["col"]), _GRANULE_FMT[spec["transform"]])
            )
            part_cols.append(_PD)
        writer = (
            staged.observe(obs, *metrics.values())
            .repartition(F.col(_BUCKET))
            # partition cols lead the sort so FileFormatWriter's
            # required ordering is already satisfied and the key sort
            # survives into the files (min/max stats friendly).
            .sortWithinPartitions(*part_cols, *self.key_cols)
            .write.partitionBy(*part_cols)
            .mode("overwrite")
        )
        if self.max_records_per_file:
            writer = writer.option("maxRecordsPerFile", self.max_records_per_file)
        if compression:
            writer = writer.option("compression", compression)
        writer.parquet(out_dir)
        try:
            observed = {k: int(v or 0) for k, v in obs.get.items()}
        except Exception:
            # Catalyst can fold tiny local-relation inputs so the
            # CollectMetrics node never fires (seen with createDataFrame
            # sources in tests). Recompute from what was written.
            observed = {"rows": None}
        files: dict[str, list[str]] = {}
        nbytes = 0
        for sub in os.listdir(out_dir):
            if not sub.startswith(f"{_PB}="):
                continue
            b = sub.split("=", 1)[1]
            # walk: with a time dimension, parquet files live one level
            # deeper (_pb=N/_pd=DAY/part-*.parquet)
            for root, _, fns in os.walk(os.path.join(out_dir, sub)):
                for fn in fns:
                    if fn.endswith(".parquet"):
                        full = os.path.join(root, fn)
                        nbytes += os.path.getsize(full)
                        files.setdefault(b, []).append(os.path.relpath(full, self.path))
        if observed.get("rows") is None:
            import pyarrow.parquet as pq

            rows = sum(
                pq.ParquetFile(os.path.join(self.path, p)).metadata.num_rows
                for ps in files.values() for p in ps
            )
            observed = {"rows": rows}
            if extra_metrics:
                written = self.read_bucketed(out_dir, df.drop(_BUCKET).schema)
                agg = written.agg(*[v.alias(k) for k, v in extra_metrics.items()]).first()
                observed.update({k: int(agg[k] or 0) for k in extra_metrics})
        return files, observed, nbytes

    def _write_epoch_files(
        self, df: DataFrame, tag: str
    ) -> tuple[dict[str, list[str]], int, int]:
        files, observed, nbytes = self.write_bucketed(df, os.path.join(self.data_dir, tag))
        return files, observed["rows"], nbytes

    def read_bucketed(self, dir_path: str, schema: T.StructType) -> DataFrame:
        """Read a write_bucketed() directory back (leaf files directly,
        no partition inference; _bucket travels as a data column)."""
        files = []
        for sub in os.listdir(dir_path):
            if sub.startswith(f"{_PB}="):
                for root, _, fns in os.walk(os.path.join(dir_path, sub)):
                    files.extend(os.path.join(root, f) for f in fns if f.endswith(".parquet"))
        full = schema.add(_BUCKET, T.IntegerType()) if _BUCKET not in schema.names else schema
        if not files:
            return self.spark.createDataFrame([], full)
        return self.spark.read.schema(full).parquet(*files)

    def staged_buckets(self, dir_path: str) -> list[int]:
        return sorted(
            int(sub.split("=", 1)[1])
            for sub in os.listdir(dir_path)
            if sub.startswith(f"{_PB}=")
        )

    def _commit(self, snap: dict) -> int:
        v = snap["version"]
        _atomic_write_json(snap, os.path.join(self.meta_dir, f"v{v:08d}.json"))
        return v

    def _next_snapshot(self, parent: dict, operation: str) -> dict:
        return {
            "version": parent["version"] + 1,
            "parent": parent["version"],
            "schema": parent["schema"],
            "key_cols": parent["key_cols"],
            "num_buckets": parent["num_buckets"],
            "partition_spec": parent.get("partition_spec"),
            "files": dict(parent["files"]),
            "committed_epochs": list(parent.get("committed_epochs", [])),
            "summary": {"operation": operation},
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(_BUCKET, bucket_of(self.key_cols[0], self.num_buckets))

    def _align(self, df: DataFrame, schema: T.StructType) -> DataFrame:
        """Project df onto the table schema: missing columns → NULL,
        order fixed, types cast (JVM-side; add-only evolution)."""
        cols = []
        for f in schema.fields:
            if f.name in df.columns:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        extra = [c for c in df.columns if c == _BUCKET]
        return df.select(*cols, *extra)

    def evolve_schema(self, new_columns: T.StructType | list[T.StructField]) -> T.StructType:
        """Add-only column evolution; returns the (possibly updated)
        schema. Commits a metadata-only snapshot when columns are new."""
        fields = new_columns.fields if isinstance(new_columns, T.StructType) else new_columns
        cur = self.snapshot()
        cur_names = {f["name"] for f in cur["schema"]["fields"]}
        added = [f for f in fields if f.name not in cur_names]
        if not added:
            return T.StructType.fromJson(cur["schema"])
        snap = self._next_snapshot(cur, "evolve-schema")
        snap["schema"] = {
            "type": "struct",
            "fields": cur["schema"]["fields"] + [f.jsonValue() for f in added],
        }
        snap["summary"]["added_columns"] = [f.name for f in added]
        self._commit(snap)
        return T.StructType.fromJson(snap["schema"])

    def record_epochs(self, epoch_ids: list[int]) -> int | None:
        """Metadata-only commit marking epochs as committed WITHOUT any
        data change — for a bootstrap that already covers their content
        (a full refresh stamped with the last finalized epoch also
        contains every earlier epoch's rows; replaying a retained
        staged delta on top would double-apply it). Returns the new
        snapshot version, or None if nothing new to record."""
        cur = self.snapshot()
        have = set(cur.get("committed_epochs", []))
        new = sorted(e for e in set(epoch_ids) if e not in have)
        if not new:
            return None
        snap = self._next_snapshot(cur, "record-epochs")
        snap["committed_epochs"].extend(new)
        snap["summary"].update({"recorded_epochs": new})
        return self._commit(snap)

    def overwrite(self, df: DataFrame, epoch_id: int | None = None) -> MergeResult:
        """Full snapshot replace (bootstrap / full refresh — reference
        analog extractors/google_sheets/extractor.py:370-377). Same
        epoch-id idempotence as merge: a replayed epoch short-circuits
        to a skipped no-op before any data is rewritten."""
        cur = self.snapshot()
        if epoch_id is not None and epoch_id in cur.get("committed_epochs", []):
            return MergeResult(cur["version"], epoch_id, 0, 0, 0, skipped=True)
        schema = T.StructType.fromJson(cur["schema"])
        data = self._with_bucket(self._align(df, schema))
        tag = f"e{cur['version'] + 1:08d}-{uuid.uuid4().hex[:8]}"
        files, rows, nbytes = self._write_epoch_files(data, tag)
        snap = self._next_snapshot(cur, "overwrite")
        snap["files"] = files
        snap["summary"].update({"epoch_id": epoch_id, "rows_written": rows, "bytes_written": nbytes})
        if epoch_id is not None:
            snap["committed_epochs"].append(epoch_id)
        v = self._commit(snap)
        return MergeResult(v, epoch_id, rows, nbytes, len(files))

    def expire_snapshots(self, keep_last: int = 2) -> dict:
        """Iceberg-style maintenance: drop snapshot metadata older than
        the newest ``keep_last`` versions and delete the data files those
        *expired* snapshots referenced (minus anything a retained
        snapshot still references). Committed-epoch ids are carried
        forward in the newest snapshot, so exactly-once survives expiry.

        Deliberately does NOT touch unreferenced files it has never seen
        in a snapshot: with optimistic multi-writer commits, an in-flight
        merge writes its data files *before* committing, and a
        delete-everything-unreferenced sweep racing that write would
        commit a snapshot pointing at deleted files. Crashed writers'
        leftovers are reclaimed by ``remove_orphan_files`` under an mtime
        grace window instead (Iceberg's remove_orphan_files semantics).
        """
        latest = self.latest_version()
        if latest is None:
            return {"removed_snapshots": 0, "removed_files": 0}
        keep_versions = {
            v for v in range(max(1, latest - keep_last + 1), latest + 1)
            if os.path.exists(os.path.join(self.meta_dir, f"v{v:08d}.json"))
        }
        referenced: set[str] = set()
        for v in keep_versions:
            for paths in self.snapshot(v)["files"].values():
                referenced.update(paths)
        expired_refs: set[str] = set()
        expired_meta = []
        for f in os.listdir(self.meta_dir):
            if f.startswith("v") and f.endswith(".json") and int(f[1:9]) not in keep_versions:
                expired_meta.append(f)
                for paths in self.snapshot(int(f[1:9]))["files"].values():
                    expired_refs.update(paths)
        removed_files = 0
        for rel in expired_refs - referenced:
            full = os.path.join(self.path, rel)
            if os.path.exists(full):
                os.unlink(full)
                removed_files += 1
        removed_snaps = 0
        for f in expired_meta:
            os.unlink(os.path.join(self.meta_dir, f))
            removed_snaps += 1
        self._prune_empty_dirs()
        return {"removed_snapshots": removed_snaps, "removed_files": removed_files}

    def remove_orphan_files(self, grace_seconds: float = 3600.0) -> dict:
        """Delete data files referenced by NO snapshot and older than
        ``grace_seconds`` (so an in-flight writer's fresh files survive).
        Run it like Iceberg's remove_orphan_files: rarely, with a grace
        window comfortably above the longest plausible commit latency."""
        referenced: set[str] = set()
        for f in os.listdir(self.meta_dir):
            if f.startswith("v") and f.endswith(".json"):
                for paths in self.snapshot(int(f[1:9]))["files"].values():
                    referenced.update(paths)
        cutoff = time.time() - grace_seconds
        removed = 0
        for root, _, files in os.walk(self.data_dir):
            for fn in files:
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, self.path)
                if (
                    fn.endswith(".parquet")
                    and rel not in referenced
                    and os.path.getmtime(full) < cutoff
                ):
                    os.unlink(full)
                    removed += 1
        self._prune_empty_dirs()
        return {"removed_files": removed}

    def _prune_empty_dirs(self) -> None:
        for root, dirs, files in os.walk(self.data_dir, topdown=False):
            if not dirs and not files and root != self.data_dir:
                os.rmdir(root)

    def rewrite_small_files(
        self,
        target_file_bytes: int = 128 * 1024 * 1024,
        min_files: int = 2,
        max_retries: int = 3,
    ) -> dict:
        """Compaction (Iceberg rewrite_data_files / MergeTree background
        merge analog): bin-pack each bucket whose file set is fragmented
        — ≥ ``min_files`` files AND an average file size below
        ``target_file_bytes`` — into a fresh single file set, committed
        as one atomic snapshot. Logical content is untouched (proven by
        test: content hash identical before/after); committed-epoch ids
        carry forward, so exactly-once survives compaction.

        Needed because a copy-on-write table accumulates one file set
        per epoch per touched bucket: at 10^10 rows × thousands of
        epochs the scan cost becomes file-count-bound without this.
        Candidate selection is driver-side metadata only; the rewrite
        reads and writes ONLY the fragmented buckets.

        Concurrency: same optimistic retry as ``merge`` — a losing
        attempt deletes its freshly written file set and re-derives
        candidates from the fresh snapshot instead of stranding them
        until the orphan-GC grace window.
        """
        import shutil as _shutil

        last_exc: Exception | None = None
        for _attempt in range(max_retries + 1):
            try:
                return self._rewrite_small_files_attempt(target_file_bytes, min_files)
            except CommitConflict as e:
                last_exc = e
                if e.written_dir:
                    _shutil.rmtree(e.written_dir, ignore_errors=True)
                continue
        raise last_exc  # type: ignore[misc]

    def _rewrite_small_files_attempt(
        self, target_file_bytes: int, min_files: int
    ) -> dict:
        cur = self.snapshot()
        candidates: list[int] = []
        for b, paths in cur["files"].items():
            if len(paths) < min_files:
                continue
            sizes = [os.path.getsize(os.path.join(self.path, p)) for p in paths]
            if sum(sizes) / len(sizes) < target_file_bytes:
                candidates.append(int(b))
        if not candidates:
            return {"buckets_compacted": 0, "files_before": 0, "files_after": 0, "version": cur["version"]}
        files_before = sum(len(cur["files"][str(b)]) for b in candidates)
        data = self._read_files(cur, buckets=candidates)  # carries _bucket
        tag = f"c{cur['version'] + 1:08d}-{uuid.uuid4().hex[:8]}"
        saved_mrpf = self.max_records_per_file
        self.max_records_per_file = None  # bin-pack: fewest files per bucket
        try:
            files, observed, nbytes = self.write_bucketed(data, os.path.join(self.data_dir, tag))
        finally:
            self.max_records_per_file = saved_mrpf
        snap = self._next_snapshot(cur, "compact")
        for b in candidates:
            snap["files"].pop(str(b), None)
        snap["files"].update(files)
        files_after = sum(len(v) for v in files.values())
        snap["summary"].update(
            {"rows_written": observed["rows"], "bytes_written": nbytes,
             "buckets_compacted": len(candidates),
             "files_before": files_before, "files_after": files_after}
        )
        try:
            v = self._commit(snap)
        except CommitConflict as e:
            e.written_dir = os.path.join(self.data_dir, tag)
            raise
        return {
            "buckets_compacted": len(candidates),
            "files_before": files_before,
            "files_after": files_after,
            "version": v,
        }

    def rebucket(self, new_num_buckets: int, max_retries: int = 3) -> dict:
        """Bucket-count evolution: full rewrite of the table into
        ``new_num_buckets`` hash buckets, committed as one atomic
        snapshot. The escape hatch for a table created small that grew
        10^3×: a 64-bucket layout cannot spread a 10^10-row table over
        thousands of executors, and bucket ids are baked into file
        layout, so this is necessarily a full-table job — run it like
        Iceberg's ``rewrite_data_files`` with a partition-spec change.
        Readers see old or new layout atomically; committed epochs and
        schema carry forward unchanged. Commit conflicts retry with
        cleanup, same as ``merge``.
        """
        if new_num_buckets < 1:
            raise ValueError("new_num_buckets must be >= 1")
        import shutil as _shutil

        last_exc: Exception | None = None
        for _attempt in range(max_retries + 1):
            try:
                return self._rebucket_attempt(new_num_buckets)
            except CommitConflict as e:
                last_exc = e
                if e.written_dir:
                    _shutil.rmtree(e.written_dir, ignore_errors=True)
                continue
        raise last_exc  # type: ignore[misc]

    def _rebucket_attempt(self, new_num_buckets: int) -> dict:
        cur = self.snapshot()
        data = self._read_files(cur).drop(_BUCKET)
        data = data.withColumn(
            _BUCKET, bucket_of(cur["key_cols"][0], new_num_buckets)
        )
        tag = f"r{cur['version'] + 1:08d}-{uuid.uuid4().hex[:8]}"
        files, observed, nbytes = self.write_bucketed(data, os.path.join(self.data_dir, tag))
        snap = self._next_snapshot(cur, "rebucket")
        snap["num_buckets"] = new_num_buckets
        snap["files"] = files
        snap["summary"].update(
            {"rows_written": observed["rows"], "bytes_written": nbytes,
             "old_num_buckets": cur["num_buckets"], "new_num_buckets": new_num_buckets}
        )
        try:
            v = self._commit(snap)
        except CommitConflict as e:
            e.written_dir = os.path.join(self.data_dir, tag)
            raise
        return {"version": v, "num_buckets": new_num_buckets, "rows": observed["rows"]}

    def merge(
        self,
        upserts: DataFrame,
        delete_keys: DataFrame | None = None,
        epoch_id: int | None = None,
        extra_summary: dict | None = None,
        affected_buckets: list[int] | None = None,
        changed_rows: int | None = None,
        max_retries: int = 3,
    ) -> MergeResult:
        """Copy-on-write MERGE: last-writer-wins upsert + tombstone
        delete keyed on ``key_cols``.

        Equivalent SQL (what this compiles to on a real Iceberg
        catalog)::

            MERGE INTO target t USING changes s
              ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
            WHEN MATCHED AND s.op = 'D' THEN DELETE
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT *

        Inputs must already be deduped to one row per key (the engine's
        LWW dedup guarantees this). Only buckets containing changed keys
        are read and rewritten; unaffected buckets' files carry over
        into the new snapshot untouched.

        Concurrency: optimistic. An attempt reads the current snapshot,
        writes its rewritten buckets, and publishes the next version via
        hard link; if ANOTHER writer won that version (CommitConflict),
        the loser deletes its attempt's files and retries against the
        fresh snapshot — Iceberg's commit-retry semantics. Retries
        re-derive survivors from the new snapshot, so two writers
        touching different keys both land.
        """
        import shutil as _shutil

        last_exc: Exception | None = None
        for _attempt in range(max_retries + 1):
            try:
                return self._merge_attempt(
                    upserts, delete_keys, epoch_id, extra_summary,
                    affected_buckets, changed_rows,
                )
            except CommitConflict as e:
                last_exc = e
                if e.written_dir:
                    _shutil.rmtree(e.written_dir, ignore_errors=True)
                continue
        raise last_exc  # type: ignore[misc]

    def _merge_attempt(
        self,
        upserts: DataFrame,
        delete_keys: DataFrame | None,
        epoch_id: int | None,
        extra_summary: dict | None,
        affected_buckets: list[int] | None,
        changed_rows: int | None = None,
    ) -> MergeResult:
        cur = self.snapshot()
        if epoch_id is not None and epoch_id in cur.get("committed_epochs", []):
            return MergeResult(cur["version"], epoch_id, 0, 0, 0, skipped=True)
        schema = T.StructType.fromJson(cur["schema"])
        keys = cur["key_cols"]

        up = self._with_bucket(self._align(upserts, schema))
        # No dropDuplicates: LEFT ANTI ignores right-side duplicates,
        # and the census below distincts for itself — the dedup here
        # was one whole extra Exchange of the key set per epoch.
        changed_keys = up.select(*keys, _BUCKET)
        if delete_keys is not None:
            dk = self._with_bucket(delete_keys).select(*keys, _BUCKET)
            changed_keys = changed_keys.unionByName(dk)

        # Affected-bucket census — tiny (≤ num_buckets rows) collect,
        # or precomputed by the caller (the engine folds it into its
        # metrics aggregation to save a job).
        if affected_buckets is not None:
            affected = list(affected_buckets)
        else:
            affected = [r[0] for r in changed_keys.select(_BUCKET).distinct().collect()]
        if not affected:
            # Nothing to change; still record the epoch for idempotence.
            snap = self._next_snapshot(cur, "merge")
            snap["summary"].update({"epoch_id": epoch_id, "rows_written": 0, "bytes_written": 0})
            if epoch_id is not None:
                snap["committed_epochs"].append(epoch_id)
            v = self._commit(snap)
            return MergeResult(v, epoch_id, 0, 0, 0)

        if not any(cur["files"].get(str(b)) for b in affected):
            # Initial load / all-new buckets: no existing rows to
            # survive, so skip the anti-join (and its changed-key
            # broadcast build) entirely.
            new_data = up
        else:
            current = self._read_files(cur, buckets=affected)
            # Survivors: existing rows in affected buckets whose key was
            # not touched this epoch (anti = NOT EXISTS). When the
            # caller knows the delta is small (changed_rows from the
            # staging write's Observation), broadcast the key set so the
            # survivors scan is never shuffled; otherwise leave the
            # strategy to AQE.
            anti_keys = changed_keys.select(*keys)
            if changed_rows is not None and changed_rows <= self.broadcast_changed_keys_max_rows:
                anti_keys = F.broadcast(anti_keys)
            survivors = current.join(anti_keys, on=keys, how="left_anti")
            new_data = survivors.unionByName(up)

        tag = f"e{cur['version'] + 1:08d}-{uuid.uuid4().hex[:8]}"
        files, rows, nbytes = self._write_epoch_files(new_data, tag)

        snap = self._next_snapshot(cur, "merge")
        for b in affected:
            snap["files"].pop(str(b), None)
        # Buckets can become empty after deletes; only written ones return.
        snap["files"].update(files)
        snap["summary"].update(
            {"epoch_id": epoch_id, "rows_written": rows, "bytes_written": nbytes,
             "buckets_rewritten": len(affected)}
        )
        if extra_summary:
            snap["summary"].update(extra_summary)
        if epoch_id is not None:
            snap["committed_epochs"].append(epoch_id)
        try:
            v = self._commit(snap)
        except CommitConflict as e:
            e.written_dir = os.path.join(self.data_dir, tag)  # loser cleans up
            raise
        return MergeResult(v, epoch_id, rows, nbytes, len(affected))
