from emap_spark.storage.delta import DeltaLog, SnapshotStore

__all__ = ["DeltaLog", "SnapshotStore"]
