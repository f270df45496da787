"""Snapshot expiry: old files GC'd, retained reads intact,
exactly-once survives expiry."""

import os

from etl_warehouse_agnostic_spark.lake.table import LakeTable
from etl_warehouse_agnostic_spark.schemas import KEY_COLS, TRANSCRIPTS_SCHEMA_V1
from etl_warehouse_agnostic_spark.sources.generator import generate_base_transcripts


def _all_parquet(root):
    out = []
    for r, _, fs in os.walk(root):
        out += [os.path.join(r, f) for f in fs if f.endswith(".parquet")]
    return out


def test_expire_snapshots(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), TRANSCRIPTS_SCHEMA_V1, KEY_COLS, num_buckets=4
    )
    t.overwrite(generate_base_transcripts(spark, n_convs=10, turns_per_conv=4))
    for epoch in (1, 2, 3):
        ups = spark.createDataFrame(
            [("conv_00000001", 0, "user", f"v{epoch}", None)],
            "conv_id string, turn_idx int, role string, text string, ts timestamp",
        )
        t.merge(ups, epoch_id=epoch)
    files_before = len(_all_parquet(t.data_dir))
    res = t.expire_snapshots(keep_last=1)
    assert res["removed_snapshots"] >= 3 and res["removed_files"] >= 1
    assert len(_all_parquet(t.data_dir)) < files_before
    out = t.read()
    assert out.count() == 40
    assert out.where("conv_id='conv_00000001' and turn_idx=0").first().text == "v3"
    # exactly-once survives: committed epochs carried in latest snapshot
    assert t.epoch_committed(2)
    r = t.merge(
        spark.createDataFrame(
            [("conv_00000001", 0, "user", "SHOULD-NOT-APPLY", None)],
            "conv_id string, turn_idx int, role string, text string, ts timestamp",
        ),
        epoch_id=2,
    )
    assert r.skipped
