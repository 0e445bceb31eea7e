"""Store contract tests — recast of the reference's parameterized driver
fixture (drivers/base/src/test/.../PlumeDriverFixture.scala:41-110): bulk
insert -> typed projection; directed edge existence (reverse false); MERGE
idempotency; clear; export/import round trip; snapshot time travel."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from plume_spark.schemas import ENTITIES, TRIPLES
from plume_spark.store import GraphStore

E = dt.datetime(2025, 1, 1)


@pytest.fixture()
def store(spark, tmp_path):
    return GraphStore(spark, str(tmp_path / "graph"))


def _fixture_frames(spark):
    ents = spark.createDataFrame(
        [
            (1, "alice smith", "person", ["alice smith"]),
            (2, "acme", "org", ["acme", "acme corp"]),
            (3, "hammer3000", "tool", ["hammer3000"]),
            (4, None, None, None),  # exercises defaults-on-read
        ],
        schema=ENTITIES,
    )
    trips = spark.createDataFrame(
        [
            (1, "works_at", 2, "c1", 0, "Alice Smith", "Acme Corp"),
            (1, "uses", 3, "c1", 1, "Alice Smith", "Hammer3000"),
        ],
        schema=TRIPLES,
    )
    return ents, trips


def test_bulk_write_projection_defaults(spark, store):
    ents, trips = _fixture_frames(spark)
    counts = store.bulk_write(ents, trips)
    assert counts == {"entities": 4, "triples": 2}
    # typed projection with defaults (P1): null canonical_name -> "<empty>"
    proj = store.property_from_nodes("person", "canonical_name")
    rows = {r["entity_id"]: r["canonical_name"] for r in proj.collect()}
    assert rows == {1: "alice smith"}
    all_names = {
        r["canonical_name"]
        for r in store.entities.read().select(
            F.coalesce("canonical_name", F.lit("<empty>")).alias("canonical_name")
        ).collect()
    }
    assert "<empty>" in all_names


def test_directed_edge_exists(spark, store):
    store.bulk_write(*_fixture_frames(spark))
    assert store.node_exists(1) and store.node_exists(3)
    assert not store.node_exists(99)
    assert store.edge_exists(1, 2, "works_at")
    assert not store.edge_exists(2, 1, "works_at")  # reverse must be false
    assert not store.edge_exists(1, 2, "uses")


def test_merge_idempotency(spark, store):
    ents, trips = _fixture_frames(spark)
    store.bulk_write(ents, trips)
    counts = store.bulk_write(ents, trips)  # double write => no duplicates
    assert counts == {"entities": 4, "triples": 2}
    assert store.entities.read().count() == 4
    assert store.triples.read().count() == 2


def test_clear_and_time_travel(spark, store):
    ents, trips = _fixture_frames(spark)
    store.bulk_write(ents, trips)
    v_before = store.entities._current_version()
    store.clear()
    assert store.entities.read().count() == 0
    assert store.triples.read().count() == 0
    # time travel to the pre-clear snapshot
    assert store.entities.read(snapshot_id=v_before).count() == 4


def test_export_import_round_trip(spark, store, tmp_path):
    ents, trips = _fixture_frames(spark)
    store.bulk_write(ents, trips)
    out = str(tmp_path / "export")
    store.export_json(out)
    store.clear()
    store.import_json(out)
    assert store.entities.read().count() == 4
    assert store.triples.read().count() == 2
    assert store.edge_exists(1, 2, "works_at")
    # graphml parity artifact is well-formed XML
    gml = str(tmp_path / "g.graphml")
    store.export_graphml(gml)
    import xml.etree.ElementTree as ET

    root = ET.parse(gml).getroot()
    ns = "{http://graphml.graphdrawing.org/xmlns}"
    graph = root.find(f"{ns}graph")
    assert len(graph.findall(f"{ns}node")) == 4
    assert len(graph.findall(f"{ns}edge")) == 2


def test_graphml_import_round_trip(spark, store, tmp_path):
    """export -> clear -> import must be frame-equal for all three columns
    incl. nulls and list properties (TinkerGraphDriver.scala:31-61 round
    trip; GraphML was previously write-only)."""
    ents, trips = _fixture_frames(spark)
    store.bulk_write(ents, trips)
    before_e = {tuple(map(str, r)) for r in store.entities.read().collect()}
    before_t = {tuple(map(str, r)) for r in store.triples.read().collect()}
    gml = str(tmp_path / "rt.graphml")
    store.export_graphml(gml)
    store.clear()
    assert store.entities.read().count() == 0
    store.import_graphml(gml)
    after_e = {tuple(map(str, r)) for r in store.entities.read().collect()}
    after_t = {tuple(map(str, r)) for r in store.triples.read().collect()}
    assert before_e == after_e
    assert before_t == after_t


def test_graphson_import_round_trip(spark, store, tmp_path):
    """Distributed adjacency export (GraphSON-shaped vertex lines with outE
    grouped by label) -> clear -> import must be frame-equal, completing the
    TinkerGraphDriver.scala:31-61 format set (JSON/GraphML/GraphSON).  Also
    checks the adjacency layout itself: isolated vertices carry no outE,
    edges ride under their pred label."""
    import json as _json

    ents, trips = _fixture_frames(spark)
    store.bulk_write(ents, trips)
    before_e = {tuple(map(str, r)) for r in store.entities.read().collect()}
    before_t = {tuple(map(str, r)) for r in store.triples.read().collect()}
    out = str(tmp_path / "graphson")
    store.export_graphson(out)
    docs = [_json.loads(r.value) for r in spark.read.text(out).collect()]
    assert len(docs) == 4  # one line per vertex
    by_id = {d["id"]: d for d in docs}
    assert "works_at" in by_id[1].get("outE", {})
    store.clear()
    assert store.entities.read().count() == 0
    store.import_graphson(out)
    after_e = {tuple(map(str, r)) for r in store.entities.read().collect()}
    after_t = {tuple(map(str, r)) for r in store.triples.read().collect()}
    assert before_e == after_e
    assert before_t == after_t


def test_kind_constraint_violations(spark, store):
    """checkEdgeConstraint recast: the clean fixture has zero violations; a
    person--works_at-->tool edge is caught (FK-valid, kind-invalid — beyond
    dangling_edges)."""
    ents, trips = _fixture_frames(spark)
    store.bulk_write(ents, trips)
    assert store.kind_violations().count() == 0
    store.triples.append(
        spark.createDataFrame([(1, "works_at", 3, "c2", 0, "A", "H")], schema=TRIPLES)
    )
    assert store.dangling_edges().count() == 0  # FK check cannot see it
    bad = store.kind_violations().collect()
    assert len(bad) == 1 and bad[0]["obj"] == 3


def test_dangling_edge_check(spark, store):
    ents, trips = _fixture_frames(spark)
    store.bulk_write(ents, trips)
    assert store.dangling_edges().count() == 0
    store.triples.append(
        spark.createDataFrame([(999, "uses", 3, "c9", 0, "X", "Y")], schema=TRIPLES)
    )
    assert store.dangling_edges().count() == 1


def test_append_only_and_snapshot_diff(spark, store):
    ents, trips = _fixture_frames(spark)
    t = store.entities
    v1 = t.append(ents)
    v2 = t.append(
        spark.createDataFrame([(10, "globex group", "org", ["globex group"])], schema=ENTITIES)
    )
    assert t.row_count() == 5
    diff = t.changed_since(v1)
    assert [r["entity_id"] for r in diff.collect()] == [10]
    assert t.read(snapshot_id=v1).count() == 4 and v2 == v1 + 1


def test_bucket_and_minmax_pruning(spark, store):
    """Layout contract (SURVEY §4 bucket(N, conv_id) + sort (pred, subj)):
    a point read must open strictly fewer files than the full scan, and the
    pruned read filtered must equal the full read filtered (conservative
    pruning)."""
    n = 600
    ents = spark.range(n).selectExpr(
        "id AS entity_id", "concat('e', id) AS canonical_name",
        "'person' AS kind", "array(concat('e', id)) AS aliases",
    )
    trips = spark.range(n).selectExpr(
        "id AS subj",
        "CASE WHEN id % 3 = 0 THEN 'works_at' WHEN id % 3 = 1 THEN 'uses' ELSE 'met' END AS pred",
        "id + 1 AS obj",
        "concat('c', id % 40) AS conv_id",
        "CAST(id % 7 AS INT) AS turn_idx",
        "'s' AS src_mention", "'o' AS obj_mention",
    )
    store.bulk_write(ents, trips)

    all_ent_files = store.entities.files_for()
    pruned_ent = store.entities.files_for(point={"entity_id": 17})
    assert len(all_ent_files) > 1
    assert len(pruned_ent) < len(all_ent_files)
    assert store.node_exists(17) and not store.node_exists(n + 5)

    all_tri_files = store.triples.files_for()
    pruned_tri = store.triples.files_for(point={"conv_id": "c3"})
    assert len(pruned_tri) < len(all_tri_files)
    full = store.triples.read().filter("conv_id = 'c3'").count()
    pruned = store.triples.read(point={"conv_id": "c3"}).filter("conv_id = 'c3'").count()
    assert full == pruned == 15
    assert store.edge_exists(3, 4, "works_at")
    assert not store.edge_exists(3, 4, "uses")


def test_rebucket_grows_modulus_and_stays_exact(spark, tmp_path):
    """rebucket() contract: rows identical afterward, pruned point/probe
    reads stay exact under the grown modulus, and a NEW table handle opened
    with the stale default modulus adopts the persisted one (probing with
    the write-time modulus is what keeps bucket pruning correct)."""
    from pyspark.sql import types as T

    from plume_spark.store.catalog import SnapshotTable, TableLayout

    schema = T.StructType([T.StructField("k", T.LongType()), T.StructField("v", T.LongType())])
    lay = TableLayout(bucket_by="k", n_buckets=4, sort_by=("k",), stats_cols=("k",))
    t = SnapshotTable(spark, str(tmp_path / "grow"), schema=schema, layout=lay)
    df = spark.range(500).selectExpr("id AS k", "id * 2 AS v")
    t.append(df)
    before = {tuple(r) for r in t.read().collect()}

    assert t.rebucket(16) is not None
    assert t.layout.n_buckets == 16
    assert {tuple(r) for r in t.read().collect()} == before
    # pruned point read under the new modulus: fewer files, same rows
    assert len(t.files_for(point={"k": 17})) < len(t.files_for())
    assert t.read(point={"k": 17}).filter("k = 17").count() == 1
    # a MERGE after growth stays exact and pruned
    t.merge_insert(
        spark.range(490, 510).selectExpr("id AS k", "id * 2 AS v"), ["k"], prune=True
    )
    assert t.row_count() == 510

    # reopening with the constructor default must adopt the persisted modulus
    t2 = SnapshotTable(spark, str(tmp_path / "grow"), schema=schema, layout=lay)
    assert t2.layout.n_buckets == 16
    assert t2.read(point={"k": 505}).filter("k = 505").count() == 1
    # growing is one-way here: same modulus is a no-op
    assert t2.rebucket(16) is None


def test_merge_upsert_and_delete_where(spark, store):
    ents, _ = _fixture_frames(spark)
    t = store.entities
    t.append(ents)
    t.merge_upsert(
        spark.createDataFrame(
            [(1, "alice m smith", "person", ["alice m smith"])], schema=ENTITIES
        ),
        ["entity_id"],
    )
    assert t.read().filter("entity_id = 1").collect()[0]["canonical_name"] == "alice m smith"
    assert t.row_count() == 4
    t.delete_where("kind = 'tool'")
    assert t.read().filter("entity_id = 3").count() == 0
    assert t.row_count() == 3


def test_compact_and_expire_snapshots(spark, store):
    """Maintenance contract (Iceberg rewrite_data_files / expire_snapshots
    analogs): micro-batch appends -> many small files; compact() rewrites the
    current snapshot into fewer layout-conforming files with identical rows
    and keeps time travel intact; expire_snapshots() then reclaims the old
    files and manifests, after which only retained history is readable."""
    t = store.entities
    for i in range(5):  # five micro-batch commits, one tiny fileset each
        t.append(
            spark.createDataFrame(
                [(10 * i + j, f"e{10 * i + j}", "person", [f"e{10 * i + j}"]) for j in range(10)],
                schema=ENTITIES,
            )
        )
    pre_files = t.files_for()
    pre_rows = {r["entity_id"] for r in t.read().collect()}
    v_pre = t._current_version()

    v_compact = t.compact()
    assert v_compact == v_pre + 1
    post_files = t.files_for()
    assert len(post_files) < len(pre_files)
    assert {r["entity_id"] for r in t.read().collect()} == pre_rows
    assert t.row_count() == 50
    # old snapshots still readable before expiry (their files are untouched)
    assert t.read(snapshot_id=v_pre).count() == 50
    assert t.read(snapshot_id=v_pre - 1).count() == 40
    # point reads still prune on the compacted layout
    assert len(t.files_for(point={"entity_id": 17})) < len(post_files)

    # a second compact on an already-compacted table is a no-op
    assert t.compact() is None

    import os
    stats = t.expire_snapshots(keep_last=1)
    assert stats["retained"] == [v_compact]
    assert stats["removed_data_files"] > 0 and stats["removed_manifests"] == v_pre
    # current snapshot unaffected; expired history gone, loudly
    assert {r["entity_id"] for r in t.read().collect()} == pre_rows
    assert [m["version"] for m in t.snapshots()] == [v_compact]
    with pytest.raises(FileNotFoundError):
        t.read(snapshot_id=v_pre)
    # every surviving on-disk parquet is referenced by the retained manifest
    on_disk = set()
    for dirpath, _dirs, fnames in os.walk(os.path.join(t.path, "data")):
        for f in fnames:
            if f.endswith(".parquet"):
                on_disk.add(os.path.relpath(os.path.join(dirpath, f), t.path))
    assert on_disk == set(t.files_for())


def test_reader_never_sees_torn_snapshot(spark, tmp_path):
    """Atomic-commit contract under a concurrent reader: while a writer
    commits overwrite snapshots of (version-stamped) rows, a reader thread
    re-opening the table must only ever observe a CONSISTENT snapshot —
    every row carries the same version stamp and the full row count — never
    a mix of two commits or a partial fileset.  (Single-writer is assumed;
    this pins reader-vs-writer isolation, the property the `_current`
    pointer flip provides.)"""
    import threading

    from pyspark.sql import types as T

    from plume_spark.store.catalog import SnapshotTable

    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("ver", T.LongType())]
    )
    t = SnapshotTable(spark, str(tmp_path / "torn"), schema=schema)
    n = 50
    t.overwrite(spark.range(n).select(F.col("id").alias("k"), F.lit(0).alias("ver")))

    bad: list[tuple] = []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            rows = t.read().collect()
            vers = {r["ver"] for r in rows}
            if len(vers) != 1 or len(rows) != n:
                bad.append((sorted(vers), len(rows)))
                return

    th = threading.Thread(target=reader)
    th.start()
    try:
        for v in range(1, 6):
            t.overwrite(
                spark.range(n).select(F.col("id").alias("k"), F.lit(v).alias("ver"))
            )
    finally:
        stop.set()
        th.join()
    assert not bad, f"reader observed torn snapshots: {bad[:3]}"
    assert {r["ver"] for r in t.read().collect()} == {5}
