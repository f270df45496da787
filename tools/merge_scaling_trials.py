"""Append extra run_ingest trial JSONs to a bench_scaling artifact.

Used when additional trials of the SAME job/input are run outside the
harness (e.g. instrumented re-runs): appends each trial to its level's
disclosed ``trials_wall_sec``, re-selects the per-level best by min
wall, and recomputes the headline efficiency + probe coherence. All
walls stay disclosed; nothing is dropped.

Usage::

    python tools/merge_scaling_trials.py BENCH/BENCH_SCALING_MODELS_r6.json \
        --n1 /tmp/instrumented_n1.json --n4 /tmp/instrumented_n4.json
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--n1", action="append", default=[],
                    help="trial JSON for the small (N) level")
    ap.add_argument("--n4", action="append", default=[],
                    help="trial JSON for the large (4N) level")
    args = ap.parse_args()

    with open(args.artifact) as f:
        doc = json.load(f)
    levels = {lvl["cores"]: lvl for lvl in doc["levels"]}
    small, large = doc["n_cores"], doc["4n_cores"]

    def _append(level: dict, paths: list[str]) -> None:
        for p in paths:
            with open(p) as f:
                r = json.load(f)
            assert r["cores"] == level["cores"], (r["cores"], level["cores"])
            assert r["events"] == doc["events"], "different input"
            level["trials_wall_sec"].append(r["wall_sec"])
            if r["wall_sec"] == min(level["trials_wall_sec"]):
                level["best"] = r

    _append(levels[small], args.n1)
    _append(levels[large], args.n4)

    t_n = min(levels[small]["trials_wall_sec"])
    t_4n = min(levels[large]["trials_wall_sec"])
    ratio = doc["4n_cores"] / doc["n_cores"]
    doc["wall_sec_n"] = t_n
    doc["wall_sec_4n"] = t_4n
    doc["events_per_sec_n"] = round(doc["events"] / t_n, 1)
    doc["events_per_sec_4n"] = round(doc["events"] / t_4n, 1)
    doc["scaling_efficiency"] = round((t_n / t_4n) / ratio, 3)
    doc["passes_0.8"] = doc["scaling_efficiency"] >= 0.8

    def _best_probe(level: dict):
        ps = level["best"].get("probe_sec") or {}
        return max(ps.values()) if ps else None

    p_n, p_4n = _best_probe(levels[small]), _best_probe(levels[large])
    noise = {"probe_sec_n": p_n, "probe_sec_4n": p_4n}
    if p_n and p_4n:
        r = max(p_n, p_4n) / min(p_n, p_4n)
        noise["pair_probe_ratio"] = round(r, 2)
        noise["pairing_coherent"] = r <= 1.5
    doc["noise"] = noise

    with open(args.artifact, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: doc[k] for k in (
        "wall_sec_n", "wall_sec_4n", "scaling_efficiency", "passes_0.8", "noise")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
