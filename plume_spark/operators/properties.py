"""Per-id property-map merge (A4) — the reference merges the property maps of
node rows sharing an id when building vertices
(drivers/tigergraph/.../TigerGraphDriver.scala:233-237: map union, first
value per key wins).

Spark recast: 'first' is made deterministic as the minimum of ``order_col``
(a tie-broken window rank, not Spark's nondeterministic ``first()``), then the
surviving (key, value) entries fold into one map per id via
``map_from_entries`` over a key-sorted ``collect_list`` — both aggregation
steps are partial (map-side combinable) and the result is order-canonical,
so identical across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_property_maps(
    df: DataFrame,
    id_col: str,
    key_col: str,
    val_col: str,
    order_col: str,
) -> DataFrame:
    """(id, props map<key,val>): one entry per distinct key, value taken from
    the row with the smallest ``order_col`` (deterministic first-wins)."""
    w = Window.partitionBy(id_col, key_col).orderBy(order_col)
    firsts = (
        df.select(id_col, key_col, val_col, order_col)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
    )
    return firsts.groupBy(id_col).agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct(key_col, val_col)))
        ).alias("props")
    )
