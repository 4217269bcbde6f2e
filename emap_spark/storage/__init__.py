from emap_spark.storage.delta import DeltaLog, SnapshotStore
from emap_spark.storage.jdbc import JdbcUpsertStore

__all__ = ["DeltaLog", "SnapshotStore", "JdbcUpsertStore"]
