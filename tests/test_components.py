"""Connected-components grouping and corpus dedup
(operators/components.py)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from serverless_data_lake_spark.operators.components import (
    connected_components,
    dedup_corpus,
)


def _labels(spark, pairs):
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    rows = connected_components(df).collect()
    return {r["id"]: r["component"] for r in rows}


class TestConnectedComponents:
    def test_chain_collapses_to_min(self, spark):
        # 1-2-3-4-5 single path: worst diameter per node count.
        got = _labels(spark, [(i, i + 1) for i in range(1, 5)])
        assert got == {i: 1 for i in range(1, 6)}

    def test_long_chain_converges_in_log_rounds(self, spark):
        got = _labels(spark, [(i, i + 1) for i in range(1, 64)])
        assert got == {i: 1 for i in range(1, 65)}

    def test_star_graph(self, spark):
        got = _labels(spark, [(10, k) for k in (11, 12, 13, 14)])
        assert got == {k: 10 for k in (10, 11, 12, 13, 14)}

    def test_disjoint_clusters_stay_disjoint(self, spark):
        got = _labels(spark, [(1, 2), (2, 3), (7, 8), (20, 21), (21, 22)])
        assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 20: 20, 21: 20, 22: 20}

    def test_reversed_and_duplicate_edges(self, spark):
        # Edges arrive in both orientations and repeated — the
        # symmetrize+distinct normalization must absorb both.
        got = _labels(spark, [(3, 1), (1, 3), (3, 1), (2, 3)])
        assert got == {1: 1, 2: 1, 3: 1}

    def test_self_loops_ignored(self, spark):
        got = _labels(spark, [(5, 5), (1, 2)])
        assert got == {1: 1, 2: 1}

    def test_empty_pairs(self, spark):
        df = spark.createDataFrame([], "id_a long, id_b long")
        assert connected_components(df).count() == 0

    def test_string_ids(self, spark):
        df = spark.createDataFrame(
            [("b", "c"), ("a", "b"), ("x", "y")], ["id_a", "id_b"]
        )
        got = {r["id"]: r["component"]
               for r in connected_components(df).collect()}
        assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}

    def test_two_cliques_bridged(self, spark):
        clique1 = [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a < b]
        clique2 = [(a, b) for a in (10, 11, 12) for b in (10, 11, 12) if a < b]
        got = _labels(spark, clique1 + clique2 + [(3, 10)])
        assert set(got.values()) == {1}

    def test_extra_columns_ignored(self, spark):
        df = spark.createDataFrame(
            [(1, 2, 0.9), (2, 3, 0.85)], ["id_a", "id_b", "jaccard"]
        )
        got = {r["id"]: r["component"]
               for r in connected_components(df).collect()}
        assert got == {1: 1, 2: 1, 3: 1}


class TestSmallGraphFastPath:
    """The driver-side union-find (edge sets ≤ SMALL_GRAPH_EDGE_CAP)
    must be indistinguishable from the distributed star rounds."""

    GRAPHS = {
        "chain": [(i, i + 1) for i in range(1, 40)],
        "star": [(10, k) for k in range(11, 30)],
        "disjoint": [(1, 2), (2, 3), (7, 8), (20, 21), (21, 22)],
        "bridged_cliques": (
            [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a < b]
            + [(a, b) for a in (10, 11, 12) for b in (10, 11, 12) if a < b]
            + [(3, 10)]
        ),
        "reversed_dups": [(3, 1), (1, 3), (3, 1), (2, 3), (5, 5)],
    }

    @pytest.mark.parametrize("name", sorted(GRAPHS))
    def test_paths_agree(self, spark, name):
        df = spark.createDataFrame(self.GRAPHS[name], ["id_a", "id_b"])
        local = {
            (r["id"], r["component"])
            for r in connected_components(df).collect()
        }
        dist = {
            (r["id"], r["component"])
            for r in connected_components(df, small_graph_edges=0).collect()
        }
        assert local == dist

    def test_paths_agree_string_ids(self, spark):
        df = spark.createDataFrame(
            [("b", "c"), ("a", "b"), ("x", "y")], ["id_a", "id_b"]
        )
        local = {
            (r["id"], r["component"])
            for r in connected_components(df).collect()
        }
        dist = {
            (r["id"], r["component"])
            for r in connected_components(df, small_graph_edges=0).collect()
        }
        assert local == dist

    def test_cap_boundary_routes_to_distributed(self, spark):
        # 5 edges with cap 4 → distributed path must still answer.
        df = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 6)], ["id_a", "id_b"]
        )
        got = {
            r["id"]: r["component"]
            for r in connected_components(df, small_graph_edges=4).collect()
        }
        assert got == {i: 1 for i in range(1, 7)}


class TestLocalPathProperty:
    """Property test: the union-find fast path agrees with a naive
    BFS reference on random graphs (pure-Python reference, one Spark
    round-trip per example)."""

    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=15),
                st.integers(min_value=0, max_value=15),
            ),
            min_size=1,
            max_size=25,
        )
    )
    @settings(max_examples=20, deadline=None)
    def test_matches_bfs_reference(self, spark, edges):
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            return
        # BFS reference: min-id label per component.
        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        expect = {}
        seen: set[int] = set()
        for start in adj:
            if start in seen:
                continue
            comp, frontier = set(), {start}
            while frontier:
                node = frontier.pop()
                if node in comp:
                    continue
                comp.add(node)
                frontier |= adj[node] - comp
            seen |= comp
            m = min(comp)
            for node in comp:
                expect[node] = m
        df = spark.createDataFrame(edges, ["id_a", "id_b"])
        got = {
            r["id"]: r["component"]
            for r in connected_components(df).collect()
        }
        assert got == expect


class TestDedupCorpus:
    def test_keeps_min_representative_and_untouched_rows(self, spark):
        corpus = spark.createDataFrame(
            [(i, f"doc{i}") for i in range(1, 8)], ["doc_id", "text"]
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6)], ["id_a", "id_b"]
        )
        kept = sorted(
            r["doc_id"]
            for r in dedup_corpus(corpus, pairs, "doc_id").collect()
        )
        # {1,2,3} -> keep 1; {5,6} -> keep 5; 4 and 7 untouched.
        assert kept == [1, 4, 5, 7]

    def test_no_pairs_keeps_everything(self, spark):
        corpus = spark.createDataFrame([(1, "a"), (2, "b")],
                                       ["doc_id", "text"])
        pairs = spark.createDataFrame([], "id_a long, id_b long")
        assert dedup_corpus(corpus, pairs, "doc_id").count() == 2

    def test_transitive_closure_applies(self, spark):
        # A~B, B~C but never A~C: all three are one group.
        corpus = spark.createDataFrame(
            [(i, "t") for i in (1, 2, 3)], ["doc_id", "text"]
        )
        pairs = spark.createDataFrame([(2, 3), (1, 2)], ["id_a", "id_b"])
        kept = [r["doc_id"]
                for r in dedup_corpus(corpus, pairs, "doc_id").collect()]
        assert kept == [1]


def test_components_on_real_near_dup_pairs(spark, sf_dir):
    """End-to-end: exact-Jaccard pairs over the documents table →
    components; every component labels itself by its min member and
    every paired doc is labeled."""
    from serverless_data_lake_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    comp = connected_components(pairs).cache()
    paired = {r[0] for r in pairs.select("id_a").collect()} | {
        r[0] for r in pairs.select("id_b").collect()
    }
    labeled = {r["id"] for r in comp.collect()}
    assert labeled == paired
    mins = (
        comp.groupBy("component").agg(F.min("id").alias("m"))
        .filter(F.col("component") != F.col("m"))
    )
    assert mins.count() == 0
