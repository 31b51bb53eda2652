from .compact import CompactionBin, compact, plan_compaction  # noqa: F401
from .expire import (  # noqa: F401
    ExpireResult,
    OrphanSweepResult,
    expire_snapshots,
    remove_orphan_files,
)
from .ledger import JobLedger  # noqa: F401
from .loop import MaintenanceLoop  # noqa: F401
from .manifests import rewrite_manifests  # noqa: F401
from .rewrite_deletes import rewrite_delete_vectors  # noqa: F401
from .zorder import zorder_by  # noqa: F401
