from .format import IcehouseTable, CommitConflict, Snapshot, DataFile  # noqa: F401
from .predicates import Predicate  # noqa: F401
from .deletes import delete_by_key, delete_where  # noqa: F401
from .catalog import Catalog, MultiTableTransaction  # noqa: F401
