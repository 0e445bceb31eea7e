"""Typed graph store: the reference's IDriver surface on SnapshotTables.

IDriver contract (drivers/base/.../IDriver.scala:24-52): exists(nodeId),
exists(src,dst,edge), bulkTx(delta), propertyFromNodes(label, keys*), clear,
plus exporters.  One backend here (snapshot parquet / Iceberg on a cluster)
instead of six, same semantics.
"""

from __future__ import annotations

import html
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from plume_spark.schemas import ENTITIES, LINEAGE, TRIPLES, with_defaults
from plume_spark.store.catalog import SnapshotStore

TRIPLE_KEY = ["subj", "pred", "obj", "conv_id", "turn_idx"]


class GraphStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.catalog = SnapshotStore(spark, root)
        self.entities = self.catalog.table("entities", ENTITIES)
        self.triples = self.catalog.table("triples", TRIPLES)
        self.lineage = self.catalog.table("lineage", LINEAGE)

    # -------------------------------------------------------------- writes

    def bulk_write(self, entities: DataFrame, triples: DataFrame) -> dict[str, int]:
        """bulkTx analog: nodes before edges (the total write ordering of
        GremlinDriver.scala:61-79 / Neo4jDriver.scala:198-213), both MERGE-
        idempotent so re-running a killed job cannot duplicate
        (IDriver node-identity contract, IDriver.scala:91-98)."""
        self.entities.merge_insert(entities, ["entity_id"])
        self.triples.merge_insert(triples, TRIPLE_KEY)
        return {"entities": self.entities.row_count(), "triples": self.triples.row_count()}

    def clear(self) -> None:
        """S8 destructive clear — all graph tables."""
        self.entities.truncate()
        self.triples.truncate()
        self.lineage.truncate()

    # -------------------------------------------------------------- reads

    def node_exists(self, entity_id: int) -> bool:
        """P2 point predicate (OverflowDbDriver.scala:63)."""
        return (
            self.entities.read().filter(F.col("entity_id") == entity_id).limit(1).count() > 0
        )

    def edge_exists(self, subj: int, obj: int, pred: str) -> bool:
        """P3 directed-edge predicate (OverflowDbDriver.scala:65-66).
        Direction matters: (s,p,o) true does not imply (o,p,s)."""
        t = self.triples.read()
        return (
            t.filter((F.col("subj") == subj) & (F.col("obj") == obj) & (F.col("pred") == pred))
            .limit(1)
            .count()
            > 0
        )

    def nodes_exist_bulk(self, ids: DataFrame) -> DataFrame:
        """Bulk existence as a semi-join (the scalable form of P2): input a
        DF with entity_id, output the subset that exists."""
        return ids.join(self.entities.read(), "entity_id", "left_semi")

    def property_from_nodes(self, kind: str, *keys: str) -> DataFrame:
        """P1 typed projection with defaults (OverflowDbDriver.scala:85-94):
        entity_id + requested keys for all nodes of a kind, missing values
        filled with the schema defaults (SchemaBuilder.getPropertyDefault)."""
        cols = ["entity_id", *[k for k in keys if k != "entity_id"]]
        df = self.entities.read().filter(F.col("kind") == kind)
        sub_schema = type(ENTITIES)([f for f in ENTITIES.fields if f.name in cols])
        return with_defaults(df.select(*cols), sub_schema)

    # -------------------------------------------------------------- export

    def export_json(self, out_dir: str) -> None:
        """S6/S7 export: nodes + edges as JSON lines (distributed write)."""
        self.entities.read().write.mode("overwrite").json(os.path.join(out_dir, "nodes"))
        self.triples.read().write.mode("overwrite").json(os.path.join(out_dir, "edges"))

    def import_json(self, in_dir: str) -> None:
        """S3 bulk import of a previously exported graph (round-trip parity,
        TinkerGraphDriver.scala:48-61)."""
        nodes = self.spark.read.schema(ENTITIES).json(os.path.join(in_dir, "nodes"))
        edges = self.spark.read.schema(TRIPLES).json(os.path.join(in_dir, "edges"))
        self.entities.overwrite(nodes)
        self.triples.overwrite(edges)

    def export_graphml(self, path: str, max_rows: int = 1_000_000) -> None:
        """Single-file GraphML parity artifact (hand-rolled, nodes then edges,
        XML-escaped — the shape of OverflowDbDriver.scala:103-157).  Driver-
        collected, so bounded by max_rows: this is a small parity/debug
        exporter, not the scale path (export_json is)."""
        nodes = self.entities.read().limit(max_rows).collect()
        edges = self.triples.read().limit(max_rows).collect()
        with open(path, "w", encoding="utf-8") as f:
            f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
            f.write('<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n')
            f.write('<key id="name" for="node" attr.name="canonical_name" attr.type="string"/>\n')
            f.write('<key id="kind" for="node" attr.name="kind" attr.type="string"/>\n')
            f.write('<key id="pred" for="edge" attr.name="pred" attr.type="string"/>\n')
            f.write('<graph id="G" edgedefault="directed">\n')
            for r in nodes:
                f.write(
                    f'<node id="n{r["entity_id"]}">'
                    f'<data key="name">{html.escape(str(r["canonical_name"]))}</data>'
                    f'<data key="kind">{html.escape(str(r["kind"]))}</data></node>\n'
                )
            for i, r in enumerate(edges):
                f.write(
                    f'<edge id="e{i}" source="n{r["subj"]}" target="n{r["obj"]}">'
                    f'<data key="pred">{html.escape(str(r["pred"]))}</data></edge>\n'
                )
            f.write("</graph>\n</graphml>\n")

    # -------------------------------------------------------------- checks

    def dangling_edges(self) -> DataFrame:
        """Schema-constraint check (J8): triples whose subj or obj has no
        entity row — anti-join must be empty (SchemaBuilder.checkEdgeConstraint
        recast as a test-time join)."""
        e = self.entities.read().select("entity_id")
        t = self.triples.read()
        bad_subj = t.join(e.withColumnRenamed("entity_id", "subj"), "subj", "left_anti")
        bad_obj = t.join(e.withColumnRenamed("entity_id", "obj"), "obj", "left_anti")
        return bad_subj.unionByName(bad_obj)
