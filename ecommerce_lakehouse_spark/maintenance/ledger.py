"""Per-work-unit lineage + metrics ledger for resumable maintenance jobs.

The north_rule requires every maintenance run to checkpoint per-partition
lineage and metrics to the table's metadata location so a crashed run
resumes idempotently mid-rewrite. This generalizes the reference's
watermark/tracking control tables (``src/utils/02_metadata_table_setup.py``,
``streaming_watermarks`` at ``src/silver/sessionize_clickstream.py:60-67``)
and its checkpoint two-phase pattern (``docs/kafka-concepts.md:114-169``):

- a job is identified DETERMINISTICALLY by (kind, base snapshot, plan hash),
  so a re-run of the same maintenance over the same snapshot finds its own
  half-finished ledger;
- each work unit (compaction bin, cluster range, …) writes one JSON file
  atomically (tmp+rename) when its outputs are fully staged — stage→publish,
  like a streaming commit log;
- the final table commit happens once, after all units are done; a crash
  before it leaves only staged files which the next run adopts via the
  ledger (and orphans are eventually swept by snapshot expiry).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from ..table.format import DataFile


class JobLedger:
    def __init__(self, table_path: str, job_id: str):
        self.dir = os.path.join(table_path, "ledger", job_id)
        os.makedirs(self.dir, exist_ok=True)
        self.job_id = job_id

    @staticmethod
    def job_id_for(kind: str, snapshot_id: int, plan_repr: str) -> str:
        h = hashlib.md5(plan_repr.encode()).hexdigest()[:12]
        return f"{kind}-snap{snapshot_id}-{h}"

    def _unit_path(self, unit_id: str) -> str:
        return os.path.join(self.dir, f"unit-{unit_id}.json")

    def get(self, unit_id: str) -> dict | None:
        p = self._unit_path(unit_id)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def complete(
        self,
        unit_id: str,
        inputs: list[str],
        outputs: list[DataFile],
        metrics: dict | None = None,
    ) -> None:
        """Atomically record a finished unit (outputs are already staged)."""
        rec = {
            "unit_id": unit_id,
            "inputs": inputs,
            "outputs": [f.to_json() for f in outputs],
            "metrics": metrics or {},
            "completed_at_ms": int(time.time() * 1000),
        }
        p = self._unit_path(unit_id)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.rename(tmp, p)

    def outputs_of(self, unit_id: str) -> list[DataFile] | None:
        rec = self.get(unit_id)
        if rec is None:
            return None
        return [DataFile.from_json(d) for d in rec["outputs"]]

    def finish_job(self, summary: dict) -> None:
        p = os.path.join(self.dir, "_SUCCESS.json")
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"job_id": self.job_id, **summary}, f)
        os.rename(tmp, p)

    def job_done(self) -> dict | None:
        p = os.path.join(self.dir, "_SUCCESS.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)
