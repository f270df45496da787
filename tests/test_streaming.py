"""Structured-Streaming apply: backlog drain equals batch replay;
restart resumes from the streaming checkpoint without re-applying."""

import os

import duckdb
import pytest

from etl_warehouse_agnostic_spark.engine import CdcEngine
from etl_warehouse_agnostic_spark.lake.manifest import ManifestStore
from etl_warehouse_agnostic_spark.lake.table import LakeTable
from etl_warehouse_agnostic_spark.schemas import KEY_COLS, TRANSCRIPTS_SCHEMA_V1
from etl_warehouse_agnostic_spark.sources.generator import generate_changes
from etl_warehouse_agnostic_spark.streaming.stream_apply import StreamingCdcApply


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream"))
    # several files so maxFilesPerTrigger yields multiple micro-batches
    path = os.path.join(d, "changes.parquet")
    generate_changes(spark, 3000, n_convs=50, turns_per_conv=8, seed=9, num_partitions=6) \
        .write.parquet(path)
    # A real appended change log has monotonically increasing file
    # mtimes; Spark's file stream orders discovery by mtime. Writing
    # all files at once gives them one mtime → arbitrary batch order,
    # which violates the engine's in-order contract. Simulate the
    # appended log: stamp mtimes in lsn order (spark.range partitions
    # are lsn-contiguous, part files sort by partition index).
    import duckdb as _dd
    import time as _time

    parts = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
    ranked = []
    for f in parts:
        lo = _dd.sql(f"select min(lsn) from read_parquet('{path}/{f}')").fetchone()[0]
        ranked.append((lo, f))
    base = _time.time() - 3600
    for i, (_, f) in enumerate(sorted(ranked)):
        os.utime(os.path.join(path, f), (base + i * 10, base + i * 10))
    return path


def oracle(path):
    return duckdb.sql(
        f"""
        SELECT conv_id, turn_idx, text FROM (
          SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                   ORDER BY lsn DESC, ts DESC) rn
          FROM read_parquet('{path}/*.parquet'))
        WHERE rn = 1 AND op <> 'D' ORDER BY conv_id, turn_idx
        """
    ).fetchall()


def test_streaming_backlog_drain_matches_oracle(spark, tmpdir_path, stream_dir):
    table = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), TRANSCRIPTS_SCHEMA_V1, KEY_COLS, num_buckets=8
    )
    eng = CdcEngine(spark, table, ManifestStore(os.path.join(tmpdir_path, "ck")))
    s = StreamingCdcApply(
        eng, stream_dir, os.path.join(tmpdir_path, "stream_ckpt"), max_files_per_trigger=2
    )
    s.run_available()
    got = [
        (r.conv_id, r.turn_idx, r.text)
        for r in table.read().select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx").collect()
    ]
    assert got == oracle(stream_dir)
    # multiple micro-batches became multiple committed epochs
    assert len(eng.checkpoints.epochs()) >= 2


def test_streaming_restart_is_noop(spark, tmpdir_path, stream_dir):
    table = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), TRANSCRIPTS_SCHEMA_V1, KEY_COLS, num_buckets=8
    )
    eng = CdcEngine(spark, table, ManifestStore(os.path.join(tmpdir_path, "ck")))
    ckpt = os.path.join(tmpdir_path, "stream_ckpt")
    s1 = StreamingCdcApply(eng, stream_dir, ckpt, max_files_per_trigger=3)
    s1.run_available()
    v1 = table.latest_version()
    # "restart": new wrapper, same streaming checkpoint → nothing new.
    # No explicit epoch_base: the pinned base file must prevent
    # re-derivation from last_epoch() (which has advanced).
    s2 = StreamingCdcApply(eng, stream_dir, ckpt, max_files_per_trigger=3)
    assert s2.epoch_base == s1.epoch_base
    s2.run_available()
    assert table.latest_version() == v1


def test_epoch_base_pinned_not_rederived(spark, tmpdir_path, stream_dir):
    """Regression: a restarted wrapper must keep the first-start
    epoch_base even though last_epoch() has grown — otherwise a
    replayed batch_id maps to a FRESH epoch id and bypasses the
    epoch-id exactly-once check."""
    table = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), TRANSCRIPTS_SCHEMA_V1, KEY_COLS, num_buckets=8
    )
    store = ManifestStore(os.path.join(tmpdir_path, "ck"))
    eng = CdcEngine(spark, table, ManifestStore(os.path.join(tmpdir_path, "ck")))
    ckpt = os.path.join(tmpdir_path, "stream_ckpt")
    s1 = StreamingCdcApply(eng, stream_dir, ckpt, max_files_per_trigger=2)
    assert s1.epoch_base == 0
    s1.run_available()
    assert (store.last_epoch() or 0) > 0  # streaming advanced the manifests
    s2 = StreamingCdcApply(eng, stream_dir, ckpt)
    assert s2.epoch_base == 0  # pinned, NOT last_epoch()
