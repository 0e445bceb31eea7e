"""Deterministic, resume-idempotent entity IDs.

The reference assigns node IDs from a concurrent map at write time:
``nodeId.getOrElseUpdate(node, currId.getAndIncrement())``
(drivers/base/.../IDriver.scala:19-20,91-98) — same node object => same ID
across batches, but only *within one process lifetime*.

On Spark the equivalent must survive retries, restarts and re-runs, so IDs are
a pure function of the node identity: ``xxhash64(kind, canonical_name)``.
This makes the ID assignment join-free (no global counter, no shuffle), and
MERGE-idempotent: re-extracting the same entity always maps to the same row.
``monotonically_increasing_id`` is deliberately NOT used — it changes across
runs and breaks resume idempotency.

Collision risk: 64-bit hash over ~1e9 distinct entities => ~2.7e-2 birthday
collision probability aggregate (n^2/2^65); acceptable for linking, and
audited by ``collision_audit`` in tests (distinct keys vs distinct ids).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def entity_id_col(kind: Column | str, canonical_name: Column | str) -> Column:
    """Stable 64-bit entity id from (kind, canonical_name)."""
    k = F.col(kind) if isinstance(kind, str) else kind
    n = F.col(canonical_name) if isinstance(canonical_name, str) else canonical_name
    return F.xxhash64(k, n)


def collision_audit(df: DataFrame, kind: str = "kind", name: str = "canonical_name") -> int:
    """Return count of hash collisions (distinct keys sharing an id). 0 expected."""
    keys = df.select(kind, name).distinct()
    withid = keys.withColumn("entity_id", entity_id_col(kind, name))
    n_keys = withid.count()
    n_ids = withid.select("entity_id").distinct().count()
    return n_keys - n_ids
