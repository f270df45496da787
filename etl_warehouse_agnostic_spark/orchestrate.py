"""Multi-source orchestration (SURVEY.md §2.9 T7, completed).

The reference runs N endpoints per pipeline with ``depends_on``
ordering — endpoints are topologically sorted before extraction
(extractors/repsly/extractor.py:1315-1356) and an endpoint whose
dependency failed is skipped, not run against half-formed parents
(gating at :1299-1313). Each endpoint owns its own watermark state.

Spark rebuild: :class:`MultiSourceRunner` drives one
:class:`~etl_warehouse_agnostic_spark.engine.CdcEngine` per source in
deterministic topological order, with **per-source manifest
namespaces** (``<checkpoint_root>/<source_name>/``) so each stream's
offsets/lineage/high-water advance independently — replay of one
source never disturbs another's checkpoint. Dependency failures gate
dependents (recorded as ``skipped_dependency``), and the optional
``refresh_interval_hours`` applies the P8 reference-data skip per
source against its own namespace.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from etl_warehouse_agnostic_spark.control import should_skip_refresh
from etl_warehouse_agnostic_spark.engine import CdcEngine, EpochResult
from etl_warehouse_agnostic_spark.lake.manifest import ManifestStore
from etl_warehouse_agnostic_spark.lake.table import LakeTable
from etl_warehouse_agnostic_spark.sources.changes import ChangeStreamSource


@dataclass
class SourceSpec:
    """One change stream → one target table, with ordering constraints."""

    name: str
    source: ChangeStreamSource
    table: LakeTable
    depends_on: list[str] = field(default_factory=list)
    epoch_size: int = 100_000
    refresh_interval_hours: float | None = None  # P8 gate, per-source
    engine_kwargs: dict[str, Any] = field(default_factory=dict)


@dataclass
class SourceRun:
    name: str
    status: str  # ran | skipped_fresh | skipped_dependency | failed
    results: list[EpochResult] = field(default_factory=list)
    error: str | None = None


def topo_order(specs: list[SourceSpec]) -> list[str]:
    """Deterministic Kahn topological order (ready set processed in
    name order); raises on unknown deps and cycles."""
    names = {s.name for s in specs}
    deps = {s.name: set(s.depends_on) for s in specs}
    for n, ds in deps.items():
        unknown = ds - names
        if unknown:
            raise ValueError(f"source {n!r} depends on unknown {sorted(unknown)}")
    order: list[str] = []
    ready = sorted(n for n, ds in deps.items() if not ds)
    pending = {n: set(ds) for n, ds in deps.items() if ds}
    while ready:
        n = ready.pop(0)
        order.append(n)
        newly = []
        for m, ds in list(pending.items()):
            ds.discard(n)
            if not ds:
                newly.append(m)
                del pending[m]
        ready = sorted(ready + newly)
    if pending:
        raise ValueError(f"dependency cycle among {sorted(pending)}")
    return order


class MultiSourceRunner:
    def __init__(
        self,
        spark: SparkSession,
        specs: list[SourceSpec],
        checkpoint_root: str,
    ):
        self.spark = spark
        self.specs = {s.name: s for s in specs}
        if len(self.specs) != len(specs):
            raise ValueError("duplicate source names")
        self.checkpoint_root = checkpoint_root
        self.order = topo_order(specs)

    def manifests(self, name: str) -> ManifestStore:
        """Per-source manifest namespace — independent watermarks."""
        return ManifestStore(os.path.join(self.checkpoint_root, name))

    def _run_one(self, name: str, max_epochs: int | None) -> SourceRun:
        spec = self.specs[name]
        # The WHOLE per-source pipeline is fallible — a corrupt manifest
        # checksum surfaces in should_skip_refresh, bad engine kwargs in
        # construction — and every failure mode must become a recorded
        # 'failed' run that gates dependents, never an exception that
        # aborts run_all (or re-raises through pool.map in parallel mode)
        # while siblings are mid-flight.
        try:
            store = self.manifests(name)
            if spec.refresh_interval_hours is not None and should_skip_refresh(
                store, spec.refresh_interval_hours
            ):
                return SourceRun(name, "skipped_fresh")
            eng = CdcEngine(
                self.spark, spec.table, store, source_name=name, **spec.engine_kwargs
            )
            results = eng.run(spec.source, epoch_size=spec.epoch_size,
                              max_epochs=max_epochs)
            return SourceRun(name, "ran", results=results)
        except Exception as e:  # gate dependents, keep siblings going
            return SourceRun(name, "failed", error=repr(e))

    def run_all(
        self, max_epochs: int | None = None, max_parallel: int = 1
    ) -> dict[str, SourceRun]:
        """Run every source respecting ``depends_on``.

        ``max_parallel > 1`` runs each dependency level's mutually
        independent sources concurrently (thread pool → concurrent
        Spark jobs inside one session — Spark's scheduler interleaves
        their stages across executors, which is how N independent
        change streams keep a large cluster busy; state is disjoint:
        one table + one manifest namespace per source). Ordering
        guarantees are per-level: a source never starts before all its
        dependencies finished, and a failed dependency gates its
        dependents exactly as in serial mode."""
        out: dict[str, SourceRun] = {}
        remaining = list(self.order)
        while remaining:
            # next level: sources whose deps are all resolved
            level = [
                n for n in remaining
                if all(d in out for d in self.specs[n].depends_on)
            ]
            runnable: list[str] = []
            for name in level:
                failed_dep = next(
                    (d for d in self.specs[name].depends_on
                     if out[d].status in ("failed", "skipped_dependency")),
                    None,
                )
                if failed_dep is not None:
                    out[name] = SourceRun(name, "skipped_dependency",
                                          error=f"dependency {failed_dep!r} did not run")
                else:
                    runnable.append(name)
            if max_parallel > 1 and len(runnable) > 1:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=max_parallel) as pool:
                    for name, run in zip(
                        runnable,
                        pool.map(lambda n: self._run_one(n, max_epochs), runnable),
                    ):
                        out[name] = run
            else:
                for name in runnable:
                    out[name] = self._run_one(name, max_epochs)
            remaining = [n for n in remaining if n not in out]
        return out
