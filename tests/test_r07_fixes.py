"""Round-7 correctness fixes (ADVICE r6).

1. Auto-bootstrap must stamp RETAINED staged finalized epochs into the
   bootstrapped model's ledger — otherwise ``_recover_silver`` replays
   them on top of a bootstrap that already contains their content
   (permanent double-count for a DeltaAggregateModel).
2. ``SilverModel.epoch_delta`` must not leak the source's ``_bucket``
   layout column into a chained model's input (wrong modulus would
   silently mis-prune the child's snapshot reads; delete rows carry no
   bucket at all).
3. ``_maybe_maintain`` must not re-fire compaction when the non-skipped
   epoch count has not advanced past the last firing multiple.
"""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_warehouse_agnostic_spark.engine import CdcEngine
from etl_warehouse_agnostic_spark.lake.manifest import ManifestStore
from etl_warehouse_agnostic_spark.lake.table import LakeTable
from etl_warehouse_agnostic_spark.schemas import KEY_COLS, TRANSCRIPTS_SCHEMA_V1
from etl_warehouse_agnostic_spark.silver import DeltaAggregateModel, SilverModel
from etl_warehouse_agnostic_spark.sources.changes import ChangeStreamSource
from etl_warehouse_agnostic_spark.sources.generator import generate_changes

EPOCH_SIZE = 1000

SILVER_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text_len", T.IntegerType(), True),
    ]
)

GOLD_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_rows", T.LongType(), True),
        T.StructField("chars", T.LongType(), True),
        T.StructField("_nn_chars", T.LongType(), True),
    ]
)


def _rows(t):
    return sorted(tuple(r) for r in t.read().collect())


def test_bootstrap_stamps_retained_staged_epochs(spark, tmpdir_path, monkeypatch):
    """A model attached with bootstrap_if_behind=True while retained
    staged finalized epochs exist must not replay a staged epoch
    EARLIER than its bootstrap stamp on top of the bootstrap (the
    bootstrap's overwrite stamps only the LAST finalized epoch id —
    epoch 3 here — so without the fix the retained e2 delta
    double-applies into the delta-maintained gold)."""
    import etl_warehouse_agnostic_spark.engine as engine_mod

    chg = generate_changes(spark, 3000, n_convs=40, turns_per_conv=8, seed=45).localCheckpoint()
    bronze = LakeTable.create(
        spark, os.path.join(tmpdir_path, "bronze"), TRANSCRIPTS_SCHEMA_V1, KEY_COLS, num_buckets=4
    )
    silver_t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "silver"), SILVER_SCHEMA, KEY_COLS, num_buckets=4
    )
    silver = SilverModel(
        silver_t,
        lambda ups, e: ups.select(
            "conv_id", "turn_idx", F.length("text").cast("int").alias("text_len")
        ),
        name="lens",
    )
    ck = ManifestStore(os.path.join(tmpdir_path, "ck"))
    eng1 = CdcEngine(spark, bronze, ck, num_salts=4, silver_models=[silver])
    # epoch 1 applies cleanly with the silver model attached…
    eng1.run(ChangeStreamSource(spark, df=chg.where(F.col("lsn") <= 1000)), epoch_size=EPOCH_SIZE)
    # …then epochs 2-3 run detached from the model with staging-dir
    # cleanup suppressed — the crash-window state where finalized
    # epochs retain their staged deltas while a model is behind.
    eng2 = CdcEngine(spark, bronze, ck, num_salts=4)
    with monkeypatch.context() as mp:
        mp.setattr(engine_mod.shutil, "rmtree", lambda *a, **kw: None)
        eng2.run(ChangeStreamSource(spark, df=chg), epoch_size=EPOCH_SIZE)
    staging_root = os.path.join(bronze.path, "_staging")
    assert sorted(os.listdir(staging_root)) == ["e00000002", "e00000003"]

    # Attach a NEW delta-maintained gold with auto-bootstrap. Its
    # bootstrap is stamped with the last finalized epoch (3); the
    # retained staged epochs {2, 3} must ALSO be stamped, or
    # _recover_silver replays e2 on top of a bootstrap that already
    # contains it.
    gold_t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "gold"), GOLD_SCHEMA, ["conv_id"], num_buckets=4
    )
    gold = DeltaAggregateModel(gold_t, bronze, ["conv_id"], {"chars": F.length("text")})
    eng3 = CdcEngine(
        spark, bronze, ck, num_salts=4, silver_models=[silver, gold],
        bootstrap_if_behind=True,
    )
    eng3.recover()

    assert [e["model"] for e in eng3.bootstrap_log] == [gold.name]
    assert eng3.bootstrap_log[0]["stamped_staged"] == [2, 3]
    want = sorted(tuple(r) for r in gold.aggregate(bronze.read()).collect())
    assert _rows(gold_t) == want and len(want) > 0
    # the behind silver model caught up exactly-once from the replays
    want_silver = sorted(
        tuple(r)
        for r in silver.transform(bronze.read().withColumn("op", F.lit("I")), 0).collect()
    )
    assert _rows(silver_t) == want_silver
    # staged dirs swept once every model has the epochs
    assert os.listdir(staging_root) == []


def test_epoch_delta_drops_source_bucket_metadata(spark, tmpdir_path):
    """A pass-through transform that leaks '_bucket' must not hand the
    SOURCE table's layout column to a chained model."""
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), SILVER_SCHEMA, KEY_COLS, num_buckets=2
    )
    model = SilverModel(
        t,
        lambda ups, e: ups.select(
            "conv_id", "turn_idx", F.length("text").cast("int").alias("text_len"), "_bucket"
        ),
        name="leaky",
    )
    staged = spark.createDataFrame(
        [("A", 0, "user", "hello", "U", 1, 7), ("B", 1, None, None, "D", 2, 3)],
        "conv_id string, turn_idx int, role string, text string, op string, lsn long, _bucket int",
    )
    delta = model.epoch_delta(staged, 7)
    assert "_bucket" not in delta.columns
    # and a chained consumer's bucket census recomputes from ITS spec
    # without choking on key-only delete rows
    gold_t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "g"), GOLD_SCHEMA, ["conv_id"], num_buckets=4
    )
    gold = DeltaAggregateModel(
        gold_t, None, ["conv_id"], {"chars": F.lit(1)}, parent=model, name="rollup"
    )
    buckets = gold._delta_buckets(delta)
    assert buckets == sorted(set(buckets)) and all(0 <= b < 2 for b in buckets)


def test_concurrent_model_chains_match_sequential_truth(spark, tmpdir_path):
    """_apply_silver runs independent model chains concurrently (a
    chained silver→gold chain plus a bronze-fed delta rollup). The
    grouping must keep intra-chain order (child after parent) while
    inter-chain order stops mattering — every table must equal its
    from-scratch rebuild, and per-model walls must be reported for
    every model."""
    chg = generate_changes(spark, 4000, n_convs=50, turns_per_conv=8, seed=48).localCheckpoint()
    bronze = LakeTable.create(
        spark, os.path.join(tmpdir_path, "bronze"), TRANSCRIPTS_SCHEMA_V1, KEY_COLS, num_buckets=4
    )
    silver_t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "silver"), SILVER_SCHEMA, KEY_COLS, num_buckets=4
    )
    gold_t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "gold"), GOLD_SCHEMA, ["conv_id"], num_buckets=4
    )
    roll_t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "roll"), GOLD_SCHEMA, ["conv_id"], num_buckets=4
    )
    silver = SilverModel(
        silver_t,
        lambda ups, e: ups.select(
            "conv_id", "turn_idx", F.length("text").cast("int").alias("text_len")
        ),
        name="lens",
    )
    # chain 1: silver -> chained gold; chain 2: bronze-fed delta rollup
    gold = DeltaAggregateModel(
        gold_t, None, ["conv_id"], {"chars": F.lit(1)}, parent=silver, name="gold"
    )
    roll = DeltaAggregateModel(roll_t, bronze, ["conv_id"], {"chars": F.length("text")}, name="roll")
    eng = CdcEngine(
        spark, bronze, ManifestStore(os.path.join(tmpdir_path, "ck")),
        num_salts=4, silver_models=[silver, gold, roll],
    )
    results = eng.run(ChangeStreamSource(spark, df=chg), epoch_size=EPOCH_SIZE)
    assert all(set(r.model_wall_ms) == {"lens", "gold", "roll"} for r in results if not r.skipped)
    # every table equals its from-scratch truth
    assert _rows(roll_t) == sorted(tuple(r) for r in roll.aggregate(bronze.read()).collect())
    want_gold = sorted(
        tuple(r)
        for r in gold.aggregate(
            silver.transform(bronze.read().withColumn("op", F.lit("I")), 0)
        ).collect()
    )
    assert _rows(gold_t) == want_gold and len(want_gold) > 0


def test_max_lsn_footer_stats_match_scan(spark, tmpdir_path):
    """Path-backed ``max_lsn`` answers from parquet footer statistics
    (metadata-only, no Spark job) and must equal the scan aggregation
    exactly; df-backed sources and stat-less inputs fall back to the
    scan."""
    p = os.path.join(tmpdir_path, "chg.parquet")
    chg = generate_changes(spark, 5000, n_convs=30, turns_per_conv=8, seed=47)
    chg.write.mode("overwrite").parquet(p)

    src = ChangeStreamSource(spark, path=p)
    scan_max = int(src.frame().agg(F.max("lsn")).first()[0])
    assert src._max_lsn_from_footers() == scan_max
    assert src.max_lsn() == scan_max

    # df-backed: no path → scan fallback (and it honours the filter)
    src_df = ChangeStreamSource(spark, df=src.frame().where(F.col("lsn") <= 123))
    assert src_df.max_lsn() == 123

    # missing cursor column in the footers → None → scan fallback
    assert ChangeStreamSource(spark, path=p, lsn_col="nope")._max_lsn_from_footers() is None

    # all-null cursor → footer stats carry no max → scan fallback (0)
    np = os.path.join(tmpdir_path, "nulls.parquet")
    spark.range(10).select(
        F.lit(None).cast("long").alias("lsn"), "id"
    ).write.mode("overwrite").parquet(np)
    src_null = ChangeStreamSource(spark, path=np)
    assert src_null._max_lsn_from_footers() is None
    assert src_null.max_lsn() == 0


def test_maintenance_does_not_refire_without_new_epochs(spark, tmpdir_path):
    chg = generate_changes(spark, 2000, n_convs=20, turns_per_conv=8, seed=46).localCheckpoint()
    bronze = LakeTable.create(
        spark, os.path.join(tmpdir_path, "bronze"), TRANSCRIPTS_SCHEMA_V1, KEY_COLS, num_buckets=4
    )
    eng = CdcEngine(
        spark, bronze, ManifestStore(os.path.join(tmpdir_path, "ck")),
        num_salts=4, maintenance_every=2,
    )
    eng.run(ChangeStreamSource(spark, df=chg), epoch_size=EPOCH_SIZE)
    fired = len(eng.maintenance_log)
    assert fired >= 1
    # a replayed (skipped) epoch leaves the non-skipped count at the
    # same multiple — the hook must not fire again
    eng._maybe_maintain(2)
    assert len(eng.maintenance_log) == fired
