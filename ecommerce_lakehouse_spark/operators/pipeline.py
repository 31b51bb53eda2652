"""Metadata-driven incremental pipeline orchestration — the reference's
control plane (SURVEY §2.11) rebuilt as a driver-side DAG over Icehouse.

Parity:
- C1 dispatch loop: active specs ordered by processing_order, dispatched on
  transform_type (``src/silver/ingest_silver_tables.py:417-450``)
- C2 dependency validation: fact specs require every dependency to have a
  non-NULL watermark (``:308-324``)
- C5 fail-stop: an exception propagates and the watermark is never advanced
  past a failed run (``src/gold/ingest_gold_tables.py:93-95``)
- M6/M7 + T4 custom watermarks: last-processed ts persisted per table; the
  incremental slice is ``scan(ts > watermark)`` (P1) with the new watermark
  captured BEFORE transforms rename columns (A5 ordering,
  ``ingest_silver_tables.py:165-166``)
- P7 empty-batch short-circuit: no data past the watermark → NO_NEW_DATA
  without running the transform (``:161-163``)

The watermark store is a JSON ledger with atomic replace — the vanilla
equivalent of the reference's ``silver_metadata``/``gold_metadata`` Delta
tables. At-least-once execution + idempotent MERGE + advance-after-success
⇒ effectively-once (the reference's own argument, ``:114-118``).
"""

from __future__ import annotations

import datetime
import json
import os
import tempfile
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

EPOCH_DEFAULT = "1900-01-01T00:00:00"  # reference's NULL-watermark default


class WatermarkStore:
    """One JSON doc per logical table, atomic tmp+rename updates."""

    def __init__(self, path: str):
        self.dir = path
        os.makedirs(path, exist_ok=True)

    def _p(self, name: str) -> str:
        return os.path.join(self.dir, f"{name}.json")

    def get(self, name: str) -> datetime.datetime:
        p = self._p(name)
        if not os.path.exists(p):
            return datetime.datetime.fromisoformat(EPOCH_DEFAULT)
        with open(p) as f:
            return datetime.datetime.fromisoformat(json.load(f)["watermark"])

    def has(self, name: str) -> bool:
        return os.path.exists(self._p(name))

    def advance(self, name: str, ts: datetime.datetime) -> None:
        rec = {
            "watermark": ts.isoformat(),
            "updated_at": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        }
        fd, tmp = tempfile.mkstemp(dir=self.dir)
        with os.fdopen(fd, "w") as f:
            json.dump(rec, f)
        os.rename(tmp, self._p(name))


@dataclass
class TransformSpec:
    """One row of the reference's silver_metadata/gold_metadata tables."""

    name: str
    transform: Callable[[SparkSession, DataFrame], None]
    source: Callable[[SparkSession, datetime.datetime], DataFrame]
    watermark_col: str
    processing_order: int = 100
    is_active: bool = True
    dependencies: list[str] = field(default_factory=list)


@dataclass
class RunReport:
    executed: list[str] = field(default_factory=list)
    skipped_empty: list[str] = field(default_factory=list)
    skipped_inactive: list[str] = field(default_factory=list)
    failed: str | None = None


def run_pipeline(
    spark: SparkSession, specs: list[TransformSpec], store: WatermarkStore
) -> RunReport:
    """C1 dispatch loop with C2/C5/P7 semantics."""
    import pyspark.sql.functions as F

    report = RunReport()
    for spec in sorted(specs, key=lambda s: s.processing_order):
        if not spec.is_active:
            report.skipped_inactive.append(spec.name)
            continue
        # C2: every dependency must have completed at least one run
        missing = [d for d in spec.dependencies if not store.has(d)]
        if missing:
            raise RuntimeError(
                f"{spec.name}: dependencies without watermark: {missing}"
            )
        wm = store.get(spec.name)
        incr = spec.source(spark, wm).filter(F.col(spec.watermark_col) > F.lit(wm))
        # A5: capture the new watermark BEFORE the transform renames columns
        new_wm = incr.agg(F.max(spec.watermark_col)).first()[0]
        if new_wm is None:  # P7 empty short-circuit
            report.skipped_empty.append(spec.name)
            continue
        try:
            spec.transform(spark, incr)
        except Exception:
            report.failed = spec.name
            raise  # C5 fail-stop: watermark NOT advanced
        store.advance(spec.name, new_wm)
        report.executed.append(spec.name)
    return report
