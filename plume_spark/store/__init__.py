from plume_spark.store.catalog import SnapshotStore, SnapshotTable  # noqa: F401
from plume_spark.store.graph import GraphStore  # noqa: F401
