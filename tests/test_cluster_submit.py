"""spark-submit --py-files on a real multi-executor cluster (opt-in).

``local-cluster[W,C,M]`` forks SEPARATE executor JVMs with real
driver↔executor RPC and netty shuffle transfers — the serialization
boundary ``local[N]`` (threads, one JVM) never exercises, and the
launch path the north rule names literally. The test submits the
unmodified run_ingest.py with the engine shipped ONLY via
``--py-files engine.zip`` (repo stripped from PYTHONPATH, cwd outside
the repo) and asserts the final table state is row-for-row identical
to the same job run in-process on ``local[4]``.

Opt-in via SPARK_GRAFT_CLUSTER=1: it spawns a full spark-submit JVM
tree (~2-4 min); BENCH/ carries the recorded artifact for the round.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_CLUSTER"),
    reason="cluster-submit parity is opt-in (SPARK_GRAFT_CLUSTER=1); "
    "BENCH/ carries the recorded scaling artifact",
)
def test_local_cluster_submit_matches_local_mode(spark, tmpdir_path):
    from bench_scaling_cluster import build_zip, run_level, spark_submit_bin

    from etl_warehouse_agnostic_spark.lake.table import LakeTable
    from etl_warehouse_agnostic_spark.sources.generator import generate_changes

    assert os.path.exists(spark_submit_bin())

    events = 120_000
    changes = os.path.join(tmpdir_path, "changes.parquet")
    generate_changes(
        spark, events, n_convs=3_000, turns_per_conv=40, seed=7,
        evolution_lsn=events // 2,
    ).write.mode("overwrite").parquet(changes)

    # in-process local[4] reference run
    local_dir = os.path.join(tmpdir_path, "local")
    os.makedirs(local_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "run_ingest.py"),
         "--changes", changes, "--cores", "4", "--epochs", "3",
         "--buckets", "16", "--workdir", local_dir, "--keep-workdir"],
        capture_output=True, text=True, cwd=REPO, check=True,
    )
    ref = json.loads(out.stdout.strip().splitlines()[-1])

    # spark-submit --py-files on 2 executor JVMs x 2 cores
    cluster_dir = os.path.join(tmpdir_path, "cluster")
    os.makedirs(cluster_dir)
    build_zip(cluster_dir)
    level = run_level(
        changes, executors=2, cores_per_exec=2, mem_mb=2048, epochs=3,
        buckets=16, trials=1, workdir=cluster_dir, with_models=False,
    )
    got = level["best"]

    assert got["events"] == ref["events"]
    assert got["final_rows"] == ref["final_rows"]
    assert got["rows_upserted"] == ref["rows_upserted"]
    assert got["rows_deleted"] == ref["rows_deleted"]

    # row-for-row: full replay equivalence across launch modes
    ref_t = LakeTable.load(spark, os.path.join(local_dir, "table-4c"))
    got_t = LakeTable.load(spark, os.path.join(cluster_dir, "table-4c"))
    cols = [f.name for f in ref_t.schema.fields]
    a = sorted(tuple(r) for r in ref_t.read().select(*cols).collect())
    b = sorted(tuple(r) for r in got_t.read().select(*cols).collect())
    assert a == b
