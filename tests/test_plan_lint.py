"""Plan lint: mechanical scale-killer guard over the harness surface.

For every (lazy) harness query, inspect the physical plan and assert:

- **no row-at-a-time Python** (``BatchEvalPython``) anywhere — Arrow
  paths (``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas``)
  are the only sanctioned Python boundaries;
- **no unexpected single-partition exchanges** — a
  ``SinglePartition`` shuffle is legal only to finish a ≤1-row global
  aggregate (the recall gates, the expectations battery); anything else
  (a global window, a global orderBy feeding more work) is the classic
  silent scale-killer this suite exists to catch.

Engine-e2e queries (they materialize temp tables) are exercised by
their own tests and skipped here.
"""

import pytest

from etl_warehouse_agnostic_spark.harness import QUERIES

SF = "/root/testdata/sf0.001"

# Queries that build real tables / run the engine at construction time.
# Queries that build real tables / run the engine at construction time
# (their result is a localCheckpointed scan — nothing to lint) are
# exercised by their own tests instead.
SKIP = {
    "cdc_engine_e2e", "warehouse_parity", "multi_source_converge",
    "time_partition_scan", "full_refresh", "csv_roundtrip",
    "pipeline_health", "silver_incremental", "windowed_op_counts",
}

# Queries whose FINAL result is a global ≤3-row (or top-k) aggregate —
# one SinglePartition exchange per gate to finish it is the correct
# plan (recall_gates unions three 1-row gates → 3).
GLOBAL_FINAL_OK = {"recall_gates": 3, "expectations": 1, "topk_customers": 1}


@pytest.mark.parametrize("name", [q for q in QUERIES if q not in SKIP])
def test_plan_has_no_scale_killers(spark, name):
    df = QUERIES[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF in plan"
    single = plan.count("SinglePartition")
    limit = GLOBAL_FINAL_OK.get(name, 0)
    assert single <= limit, (
        f"{name}: {single} SinglePartition exchange(s) (allowed {limit}) — "
        "global window/orderBy collapsing the data onto one task?"
    )


def test_incremental_slice_filters_reach_the_scan(spark):
    """The watermark slice predicate must land IN the parquet scan
    (DataFilters with both lsn bounds) — an unpushed slice filter means
    every epoch reads the whole change log at 10^10 events."""
    df = QUERIES["incremental_slice"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scan_lines, "no parquet scan in plan"
    assert any(
        "DataFilters" in l and ">" in l and "<=" in l for l in scan_lines
    ), f"slice bounds not pushed into the scan: {scan_lines}"


@pytest.mark.parametrize("name", ["exact_dedup", "training_pipeline"])
def test_dedup_shuffle_key_is_hash_not_text(spark, name):
    """The dedup exchange must key on md5(normalized text), never the
    text itself — at corpus scale a full-text shuffle key carries the
    whole corpus through the exchange."""
    df = QUERIES[name](spark, SF)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "md5(" in opt, f"{name}: no md5 hash key in plan"
    # No Aggregate may group on the normalized text directly (Catalyst
    # pushes the md5 into a Project; the Aggregate keys on its output).
    bad = [
        l for l in opt.splitlines()
        if l.strip().startswith("Aggregate") and "regexp_replace" in l
    ]
    assert not bad, f"{name}: aggregate keyed on raw text: {bad}"


def test_silver_chain_is_one_pure_projection(spark):
    """The 25-transform silver chain must stay a single shuffle-free
    JVM projection (no Python boundary, no exchange) — the per-cycle
    incremental cost is then O(delta) scan + the bucket merge."""
    from pyspark.sql import functions as F

    from etl_warehouse_agnostic_spark.harness import _changes, _silver_chain

    df = _silver_chain(_changes(spark, SF), F.lit(7))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan, "silver transform must not shuffle"


def test_chained_epoch_delta_is_shuffle_free(spark):
    """A chained model's input — the parent's epoch_delta — must add NO
    exchange on top of the staged-delta scan: transformed upserts
    unioned with key-only delete rows is projection + union, so the
    whole chain stays one WholeStageCodegen pass per branch and the
    only shuffles in chained maintenance remain the merges themselves."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from etl_warehouse_agnostic_spark.lake.table import LakeTable
    from etl_warehouse_agnostic_spark.silver import SilverModel

    silver_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("text_len", T.IntegerType(), True),
        ]
    )
    t = LakeTable.create(
        spark, os.path.join("/tmp", f"lint-silver-{os.getpid()}"), silver_schema,
        ["conv_id", "turn_idx"], num_buckets=2,
    )
    try:
        model = SilverModel(
            t,
            lambda ups, e: ups.select(
                "conv_id", "turn_idx", F.length("text").cast("int").alias("text_len")
            ),
        )
        staged_path = os.path.join("/tmp", f"lint-staged-{os.getpid()}")
        spark.createDataFrame(
            [("A", 0, "user", "hello", None, "U", 1),
             ("B", 1, None, None, None, "D", 2)],
            "conv_id string, turn_idx int, role string, text string, "
            "ts timestamp, op string, lsn long",
        ).write.mode("overwrite").parquet(staged_path)
        staged = spark.read.parquet(staged_path)
        plan = (
            model.epoch_delta(staged, 7)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, "chained delta must not shuffle"
        assert "BatchEvalPython" not in plan
    finally:
        import shutil

        shutil.rmtree(t.path, ignore_errors=True)
        shutil.rmtree(os.path.join("/tmp", f"lint-staged-{os.getpid()}"), ignore_errors=True)
