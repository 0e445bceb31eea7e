"""Resume idempotency (north rule): a killed run, re-executed from the top,
produces exactly the tables an uninterrupted run produces — no duplicates,
no missing rows.  Also: unchanged input => extract stage is a no-op."""

from __future__ import annotations

from plume_spark.generator import generate_transcripts
from plume_spark.pipeline import build_graph
from plume_spark.store import GraphStore


def _table_set(store, name):
    t = {"entities": store.entities, "triples": store.triples}[name]
    return sorted(map(tuple, t.read().collect()))


def test_kill_and_resume_equals_uninterrupted(spark, tmp_path):
    t = generate_transcripts(spark, 30, seed=5)

    # uninterrupted run
    a = GraphStore(spark, str(tmp_path / "a"))
    build_graph(t, a, n_buckets=8)

    # killed run: only 3 of 8 buckets complete, then full re-run
    b = GraphStore(spark, str(tmp_path / "b"))
    partial = build_graph(t, b, n_buckets=8, max_units=3)
    assert partial["pending_units"] == 3
    resumed = build_graph(t, b, n_buckets=8)
    assert resumed["pending_units"] == 5  # only the unfinished buckets re-ran

    assert _table_set(a, "entities") == _table_set(b, "entities")
    assert _table_set(a, "triples") == _table_set(b, "triples")


def test_unchanged_rerun_is_noop_extract(spark, tmp_path):
    t = generate_transcripts(spark, 12, seed=9)
    s = GraphStore(spark, str(tmp_path / "g"))
    build_graph(t, s, n_buckets=4)
    again = build_graph(t, s, n_buckets=4)
    assert again["pending_units"] == 0  # A9 unchanged-input skip
    # still exactly one copy of everything
    n = s.triples.read().count()
    assert n == s.triples.read().dropDuplicates().count()


def test_changed_bucket_reprocesses(spark, tmp_path):
    t = generate_transcripts(spark, 12, seed=9)
    s = GraphStore(spark, str(tmp_path / "g"))
    build_graph(t, s, n_buckets=4)
    # new conversations appear -> only their buckets re-extract
    t2 = generate_transcripts(spark, 14, seed=9)
    stats = build_graph(t2, s, n_buckets=4)
    assert 1 <= stats["pending_units"] <= 4
    # final state equals a fresh full build
    fresh = GraphStore(spark, str(tmp_path / "fresh"))
    build_graph(t2, fresh, n_buckets=4)
    assert _table_set(s, "triples") == _table_set(fresh, "triples")
