"""Per-round benchmark (driver contract).

Runs the CDC apply loop (the BASELINE.json headline metric:
change-events/sec end-to-end) plus the headline harness queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], and prints ONE JSON line::

    {"metric": "change_apply_events_per_sec", "value": N, "unit":
     "events/sec", "queries": {...sec...}, "sf": 0.1, ...}

Query timings use a noop-format write so the full plan executes with
no driver collect cost.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

# r3 renames vs r2 timings: lww_dedup_strategies = lww_dedup_salted +
# lww_dedup_window unioned (≈ their sum); text_battery = text_quality +
# token_counts (+ lang-id + fingerprint) in one pass; media_battery =
# multimodal_features + resize plan joined.
HEADLINE = [
    "lww_dedup_strategies",
    "cdc_final_state",
    "merge_upsert",
    "dup_batch_anti_join",
    "asof_join",
    "sessionize",
    "pricing_summary",
    "revenue_by_region",
    "topk_customers",
    "exact_dedup",
    "minhash_lsh",
    "cosine_topk",
    "blocked_near_pairs",
    "text_battery",
    "media_battery",
    "silver_model",
]


def _q_silver_model(spark, sf_dir):
    """Bench-only: the 25-transform silver chain over the LWW-deduped
    stream — the data-plane cost of the silver model, comparable with
    the r2–r4 'silver_model' timings. (The registry row
    silver_incremental runs the chain through the engine's incremental
    maintenance path; its loop costs are measured by cdc_apply_loop.)"""
    from pyspark.sql import functions as F

    from etl_warehouse_agnostic_spark.harness import KEYS, ORDER, _changes, _silver_chain
    from etl_warehouse_agnostic_spark.operators.dedup import lww_dedup_window

    chg = _changes(spark, sf_dir)
    cur = lww_dedup_window(chg, KEYS, ORDER, num_salts=8).where(F.col("op") != "D")
    return _silver_chain(cur, F.lit(42))


def _q_blocked_near_pairs(spark, sf_dir):
    """Bench-only: the sub-quadratic near-dup scale path directly over
    the embeddings table (the registry times it inside recall_gates,
    which also pays for the exact baseline)."""
    from pyspark.sql import functions as F

    from etl_warehouse_agnostic_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return similarity.blocked_near_pairs(emb, threshold=0.9, num_centroids=32, nprobe=2)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    from etl_warehouse_agnostic_spark.engine import CdcEngine
    from etl_warehouse_agnostic_spark.harness import QUERIES
    from etl_warehouse_agnostic_spark.lake.manifest import ManifestStore
    from etl_warehouse_agnostic_spark.lake.table import LakeTable
    from etl_warehouse_agnostic_spark.schemas import KEY_COLS, TRANSCRIPTS_SCHEMA_V2
    from etl_warehouse_agnostic_spark.session import get_spark
    from etl_warehouse_agnostic_spark.sources.changes import ChangeStreamSource
    from etl_warehouse_agnostic_spark.sources.generator import generate_changes

    spark = get_spark("bench", cores=cpus, shuffle_partitions=cpus)

    # ---- host-noise anchor (VERDICT r5 #2) ----
    # This sandbox host is bimodal (up to ~2.4× uniform slow-mode
    # windows, documented since r2). A fixed CPU-bound probe timed
    # between row groups makes a slow window machine-detectable in the
    # artifact itself: every row is tagged with its window's noise
    # factor (window probe / fastest probe), and rows timed in a >1.5×
    # window are listed in noise.noisy_rows — no more per-round
    # forensics over whether a slow row is code or host.
    from pyspark.sql import functions as F

    # ~0.5 s of pure JVM compute per probe — long enough that scheduler
    # jitter is noise and the host's uniform slow mode is the signal.
    # A FRESH plan per call: re-collecting one DataFrame would reuse
    # its materialized shuffle stage and time nothing.
    probe_rows = 6_000_000 * cpus
    probes: dict[str, float] = {}
    probe_order: list[str] = []

    def _probe_plan(salt: int):
        return spark.range(salt, salt + probe_rows).select(
            F.sum(F.xxhash64("id").cast("decimal(38,0)")).alias("h")
        )

    def probe(tag: str) -> None:
        # min of two back-to-back runs: short-lived scheduler jitter
        # (~1.5×) washes out; the uniform ≥2× slow mode does not.
        best = None
        for k in (1, 2):
            t0 = time.monotonic()
            _probe_plan(2 * len(probe_order) + k).collect()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        probes[tag] = round(best, 3)
        probe_order.append(tag)

    _probe_plan(0).collect()  # codegen warm-up, unrecorded

    probe("start")
    row_window: dict[str, str] = {}

    # ---- headline metric: CDC apply throughput ----
    n_events = int(40_000_000 * sf)
    n_convs = max(1000, int(400_000 * sf))
    work_root = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    work = f"{work_root}/etlwa-bench-{os.getpid()}"
    os.makedirs(work, exist_ok=True)
    try:
        changes_path = os.path.join(work, "changes.parquet")
        generate_changes(
            spark, n_events, n_convs=n_convs, turns_per_conv=50, seed=42,
            evolution_lsn=n_events // 2,
        ).write.mode("overwrite").parquet(changes_path)

        table = LakeTable.create(
            spark, os.path.join(work, "table"), TRANSCRIPTS_SCHEMA_V2, KEY_COLS, num_buckets=64
        )
        eng = CdcEngine(spark, table, ManifestStore(os.path.join(work, "ckpt")),
                        source_partitions=cpus)
        src = ChangeStreamSource(spark, path=changes_path)
        t0 = time.monotonic()
        results = eng.run(src, epoch_size=max(1, n_events // 2))
        apply_wall = time.monotonic() - t0
        eps = n_events / apply_wall
        probe("apply")
        row_window["cdc_apply_loop"] = "apply"

        # ---- warehouse-agnostic loop: same stream, duckdb backend ----
        # (run_warehouse + executor-side parquet hand-off; tracked since
        # r4 so backend-transfer regressions show up per-round)
        from pyspark.sql import functions as F

        from etl_warehouse_agnostic_spark.lake.backends import make_warehouse
        from etl_warehouse_agnostic_spark.orchestrate import MultiSourceRunner, SourceSpec

        wh = make_warehouse(
            spark, {"type": "duckdb", "path": os.path.join(work, "wh.duckdb")},
            TRANSCRIPTS_SCHEMA_V2, KEY_COLS,
        )
        eng_wh = CdcEngine(spark, None, ManifestStore(os.path.join(work, "ckpt-wh")),
                           source_partitions=cpus)
        t0 = time.monotonic()
        eng_wh.run_warehouse(
            wh, ChangeStreamSource(spark, path=changes_path),
            epoch_size=max(1, n_events // 2),
        )
        warehouse_wall = time.monotonic() - t0
        probe("warehouse")
        row_window["warehouse_apply_loop"] = "warehouse"

        # ---- orchestrated multi-source run: 2 disjoint streams,
        # concurrent level scheduling, own tables + namespaces ----
        chg_df = spark.read.parquet(changes_path)
        is_a = F.pmod(F.xxhash64("conv_id"), F.lit(2)) == 0
        specs = [
            SourceSpec(
                name=name,
                source=ChangeStreamSource(spark, df=chg_df.where(pred)),
                table=LakeTable.create(
                    spark, os.path.join(work, f"ms-{name}"),
                    TRANSCRIPTS_SCHEMA_V2, KEY_COLS, num_buckets=64,
                ),
                epoch_size=max(1, n_events // 2),
            )
            for name, pred in (("src_a", is_a), ("src_b", ~is_a))
        ]
        runner = MultiSourceRunner(spark, specs, os.path.join(work, "ckpt-ms"))
        t0 = time.monotonic()
        ms_out = runner.run_all(max_parallel=2)
        multi_wall = time.monotonic() - t0
        assert all(r.status == "ran" for r in ms_out.values())
        probe("multi")
        row_window["multi_source_loop"] = "multi"

        # ---- Arrow python-worker warm-up (r4 verdict #6) ----
        # The first Arrow-batched call in a session pays python-worker
        # spin-up (~0.5-2 s under load); r4 burned investigation time
        # proving media_battery's +0.7 s was exactly that. One
        # throwaway mapInArrow makes every per-query timing below
        # steady-state.
        spark.range(10_000).mapInArrow(lambda it: it, "id long") \
            .write.mode("overwrite").format("noop").save()

        # ---- per-query timings (steady-state protocol) ----
        timings: dict[str, float] = {
            "cdc_apply_loop": round(apply_wall, 3),
            "warehouse_apply_loop": round(warehouse_wall, 3),
            "multi_source_loop": round(multi_wall, 3),
        }
        extra = {
            "blocked_near_pairs": _q_blocked_near_pairs,
            "silver_model": _q_silver_model,
        }
        for i, name in enumerate(HEADLINE):
            fn = QUERIES.get(name) or extra[name]
            t0 = time.monotonic()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            timings[name] = round(time.monotonic() - t0, 3)
            row_window[name] = f"q{i // 4}"
            if i % 4 == 3 or i == len(HEADLINE) - 1:
                probe(f"q{i // 4}")

        # A row's window factor is the worse of the probes bracketing
        # it (host mode can flip mid-group).
        probe_min = min(probes.values())
        factor = {t: round(probes[t] / probe_min, 2) for t in probes}

        def window_factor(tag: str) -> float:
            i = probe_order.index(tag)
            prev = probe_order[i - 1] if i > 0 else tag
            return max(factor[tag], factor[prev])

        noise = {
            "probe_sec": probes,
            "probe_min": probe_min,
            "window_factor": {t: window_factor(t) for t in probe_order},
            "noisy_rows": sorted(
                n for n, w in row_window.items() if window_factor(w) > 2.0
            ),
        }

        out = {
            "metric": "change_apply_events_per_sec",
            "value": round(eps, 1),
            "unit": "events/sec",
            "queries": timings,
            "sf": sf,
            "events": n_events,
            "epochs": len(results),
            "cores": cpus,
            "final_rows": table.read().count(),
            "noise": noise,
        }
        print(json.dumps(out), flush=True)
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
