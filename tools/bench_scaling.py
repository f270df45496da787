"""Two-cluster-size scaling evidence (BASELINE.json north rule).

Runs the identical CDC apply job on the identical change-stream input
at N and 4N cores (fresh JVM per run via subprocess), reports
throughput at both plus scaling efficiency = (T_N / T_4N) / 4.

Each level can run multiple trials; the minimum wall is used (the
sandbox host shows intermittent multi-second stalls unrelated to the
workload — min filters external interference; all trials are reported).

Usage::

    python tools/bench_scaling.py --events 32000000 --n 1 --trials 2 \
        --out BENCH_SCALING.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(changes: str, cores: int, epochs: int, buckets: int, trials: int,
              workdir: str, with_models: bool = False) -> dict:
    walls, results = [], []
    for t in range(trials):
        cmd = [
            sys.executable, os.path.join(REPO, "run_ingest.py"),
            "--changes", changes, "--cores", str(cores),
            "--shuffle-partitions", str(max(2, cores * 2)),
            "--epochs", str(epochs), "--buckets", str(buckets),
            "--workdir", workdir, "--keep-workdir",
        ] + (["--with-models"] if with_models else [])
        out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        line = out.stdout.strip().splitlines()[-1]
        r = json.loads(line)
        walls.append(r["wall_sec"])
        results.append(r)
        print(f"  cores={cores} trial={t}: wall={r['wall_sec']}s "
              f"eps={r['events_per_sec']}", flush=True)
    best = min(range(len(walls)), key=lambda i: walls[i])
    return {"cores": cores, "trials_wall_sec": walls, "best": results[best]}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=32_000_000)
    ap.add_argument("--convs", type=int, default=400_000)
    ap.add_argument("--n", type=int, default=1, help="small cluster size N (large is 4N)")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--workdir", default="/dev/shm/etlwa-scaling")
    ap.add_argument("--with-models", action="store_true",
                    help="scale the MODEL-DAG path: attach the standard "
                         "3-model curated DAG at both levels")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SCALING.json"))
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    changes = os.path.join(args.workdir, f"changes-{args.events}.parquet")
    if not os.path.exists(changes):
        print(f"generating {args.events} events …", flush=True)
        sys.path.insert(0, REPO)
        from etl_warehouse_agnostic_spark.session import get_spark
        from etl_warehouse_agnostic_spark.sources.generator import generate_changes

        spark = get_spark("scaling-gen")
        generate_changes(
            spark, args.events, n_convs=args.convs, turns_per_conv=50,
            seed=42, evolution_lsn=args.events // 2,
        ).write.mode("overwrite").parquet(changes)
        spark.stop()

    small = run_level(changes, args.n, args.epochs, args.buckets, args.trials,
                      args.workdir, with_models=args.with_models)
    large = run_level(changes, args.n * 4, args.epochs, args.buckets, args.trials,
                      args.workdir, with_models=args.with_models)

    t_n = min(small["trials_wall_sec"])
    t_4n = min(large["trials_wall_sec"])
    eff = (t_n / t_4n) / 4

    # Host-window coherence: each trial's run_ingest output carries the
    # in-JVM CPU probe (constant per-core work, so comparable across
    # cluster sizes).  A valid N/4N ratio needs both best trials probed
    # in the same host mode; >1.5x between their probes = polluted pair.
    def _best_probe(level: dict) -> float | None:
        ps = level["best"].get("probe_sec") or {}
        return max(ps.values()) if ps else None

    p_n, p_4n = _best_probe(small), _best_probe(large)
    noise = {"probe_sec_n": p_n, "probe_sec_4n": p_4n}
    if p_n and p_4n:
        ratio = max(p_n, p_4n) / min(p_n, p_4n)
        noise["pair_probe_ratio"] = round(ratio, 2)
        noise["pairing_coherent"] = ratio <= 1.5
    doc = {
        "metric": "change_apply_scaling_efficiency",
        "with_models": args.with_models,
        "n_cores": args.n,
        "4n_cores": args.n * 4,
        "events": args.events,
        "epochs": args.epochs,
        "wall_sec_n": t_n,
        "wall_sec_4n": t_4n,
        "events_per_sec_n": round(args.events / t_n, 1),
        "events_per_sec_4n": round(args.events / t_4n, 1),
        "scaling_efficiency": round(eff, 3),
        "passes_0.8": eff >= 0.8,
        "noise": noise,
        "levels": [small, large],
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: doc[k] for k in
                      ("wall_sec_n", "wall_sec_4n", "events_per_sec_n",
                       "events_per_sec_4n", "scaling_efficiency", "passes_0.8")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
