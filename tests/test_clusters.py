"""Connected components + near-duplicate clustering."""

import pytest
from pyspark.sql import functions as F

from sumi_agent_spark.operators.clusters import (
    connected_components,
    near_duplicate_clusters,
)


def _edges(spark, rows, schema="id_a long, id_b long"):
    return spark.createDataFrame(rows, schema)


def _comp(spark, rows, **kw):
    out = connected_components(_edges(spark, rows), **kw)
    return {r["id"]: r["rep"] for r in out.collect()}


class TestConnectedComponents:
    def test_transitive_chain(self, spark):
        # pairwise keep-first would keep C alongside A; components
        # collapse the whole family to rep A
        got = _comp(spark, [(1, 2), (2, 3)])
        assert got == {1: 1, 2: 1, 3: 1}

    def test_two_components(self, spark):
        got = _comp(spark, [(5, 6), (6, 7), (10, 11)])
        assert got == {5: 5, 6: 5, 7: 5, 10: 10, 11: 10}

    def test_orientation_and_duplicates_tolerated(self, spark):
        got = _comp(spark, [(3, 1), (1, 3), (3, 1), (2, 2), (2, 3)])
        assert got == {1: 1, 2: 1, 3: 1}

    def test_long_path_converges_via_pointer_jumping(self, spark):
        n = 16
        got = _comp(spark, [(i, i + 1) for i in range(n)], max_iter=8)
        assert got == {i: 0 for i in range(n + 1)}

    def test_max_iter_raises(self, spark):
        with pytest.raises(RuntimeError, match="did not converge"):
            _comp(spark, [(i, i + 1) for i in range(12)], max_iter=1)

    def test_string_ids(self, spark):
        out = connected_components(
            _edges(spark, [("b", "a"), ("b", "c")],
                   "id_a string, id_b string"))
        got = {r["id"]: r["rep"] for r in out.collect()}
        assert got == {"a": "a", "b": "a", "c": "a"}

    def test_empty_edges(self, spark):
        out = connected_components(
            spark.createDataFrame([], "id_a long, id_b long"))
        assert out.count() == 0

    def test_partitioning_invariance(self, spark):
        rows = [(i, i % 5) for i in range(5, 40)]
        a = _comp(spark, rows)
        out = connected_components(_edges(spark, rows).repartition(13))
        b = {r["id"]: r["rep"] for r in out.collect()}
        assert a == b


class TestNearDuplicateClusters:
    def test_explicit_pairs_attach_and_sizes(self, spark):
        df = spark.createDataFrame(
            [(1, "x"), (2, "x"), (3, "x"), (9, "solo")],
            "doc_id long, text string")
        pairs = _edges(spark, [(1, 2), (2, 3)])
        got = {r["doc_id"]: (r["cluster_rep"], r["cluster_size"])
               for r in near_duplicate_clusters(df, pairs=pairs).collect()}
        assert got == {1: (1, 3), 2: (1, 3), 3: (1, 3), 9: (9, 1)}

    def test_component_dedup_is_transitive(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string")
        pairs = _edges(spark, [(1, 2), (2, 3)])  # no (1,3) pair
        out = near_duplicate_clusters(df, pairs=pairs)
        kept = out.filter(F.col("doc_id") == F.col("cluster_rep"))
        assert [r["doc_id"] for r in kept.collect()] == [1]

    def test_reps_rerooted_to_present_ids(self, spark):
        # pairs reference id 1, which an earlier gate already dropped
        # from df: the family must keep ONE live representative (2),
        # not zero, and sizes must count live rows only
        df = spark.createDataFrame(
            [(2, "x"), (3, "x"), (9, "solo")], "doc_id long, text string")
        pairs = _edges(spark, [(1, 2), (2, 3)])
        out = near_duplicate_clusters(df, pairs=pairs)
        got = {r["doc_id"]: (r["cluster_rep"], r["cluster_size"])
               for r in out.collect()}
        assert got == {2: (2, 2), 3: (2, 2), 9: (9, 1)}
        kept = out.filter(F.col("doc_id") == F.col("cluster_rep"))
        assert sorted(r["doc_id"] for r in kept.collect()) == [2, 9]

    def test_minhash_backed_default(self, spark):
        base = ("the quick brown fox jumps over the lazy dog while "
                "the sun sets slowly behind the distant mountains "
                "and the rivers flow quietly to the sea " * 3)
        df = spark.createDataFrame(
            [(1, base), (2, base.replace("quick", "swift")),
             (3, "an entirely different document about spark "
                 "adaptive query execution and shuffle partitions "
                 "with no shared phrasing at all " * 3)],
            "doc_id long, text string")
        got = {r["doc_id"]: r["cluster_rep"]
               for r in near_duplicate_clusters(
                   df, threshold=0.6).collect()}
        assert got == {1: 1, 2: 1, 3: 3}
