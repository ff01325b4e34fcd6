"""Distributed AUC + precision/recall evaluation."""

import pytest

from sumi_agent_spark.operators.evaluation import (
    binary_auc,
    precision_recall_at,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "label boolean, score double")


def _auc(spark, rows):
    return binary_auc(_df(spark, rows)).collect()[0]


class TestBinaryAuc:
    def test_perfect_separation(self, spark):
        r = _auc(spark, [(True, 2.0), (True, 3.0),
                         (False, 0.0), (False, 1.0)])
        assert r["auc"] == 1.0
        assert (r["n_pos"], r["n_neg"], r["n_null"]) == (2, 2, 0)

    def test_inverted(self, spark):
        r = _auc(spark, [(True, 0.0), (False, 1.0)])
        assert r["auc"] == 0.0

    def test_hand_computed_with_ties(self, spark):
        # pos scores {1, 2}, neg scores {1, 3}:
        # pairs: (1,1)=tie 0.5, (1,3)=0, (2,1)=1, (2,3)=0 -> 1.5/4
        r = _auc(spark, [(True, 1.0), (True, 2.0),
                         (False, 1.0), (False, 3.0)])
        assert r["auc"] == 0.375

    def test_all_tied_is_half(self, spark):
        r = _auc(spark, [(True, 5.0), (False, 5.0), (True, 5.0)])
        assert r["auc"] == 0.5

    def test_null_rows_excluded_and_counted(self, spark):
        r = _auc(spark, [(True, 1.0), (False, 0.0),
                         (None, 9.0), (True, None)])
        assert r["auc"] == 1.0
        assert r["n_null"] == 2

    def test_single_class_null_auc(self, spark):
        r = _auc(spark, [(True, 1.0), (True, 2.0)])
        assert r["auc"] is None
        assert (r["n_pos"], r["n_neg"]) == (2, 0)

    def test_partitioning_invariance(self, spark):
        rows = [(i % 3 == 0, float(i % 7)) for i in range(200)]
        a = binary_auc(_df(spark, rows)).collect()[0]["auc"]
        b = binary_auc(_df(spark, rows).repartition(11)) \
            .collect()[0]["auc"]
        assert a == b is not None

    def test_single_lazy_plan_no_eager_job(self, spark):
        # building the result must not run any job (the n_null count
        # used to be an eager full scan at call time)
        df = _df(spark, [(True, 1.0), (False, 0.0)])
        tracker = spark.sparkContext.statusTracker()
        before = len(tracker.getJobIdsForGroup(None) or [])
        out = binary_auc(df)  # no action yet
        after = len(tracker.getJobIdsForGroup(None) or [])
        assert after == before
        assert out.collect()[0]["auc"] == 1.0

    def test_decimal_accumulator_exact(self, spark):
        # per-score contributions stay exact through the decimal(38,0)
        # path (value check on a mid-size tie-heavy input)
        rows = ([(True, float(i % 5)) for i in range(500)]
                + [(False, float(i % 5) - 0.5) for i in range(500)])
        r = binary_auc(_df(spark, rows)).collect()[0]
        # pos at k, neg at k-0.5 (k=0..4, 100 each): pos beats neg for
        # pairs where k_pos >= k_neg + ... hand value via brute force:
        import itertools
        ps = [float(i % 5) for i in range(500)]
        ns = [float(i % 5) - 0.5 for i in range(500)]
        import collections
        pc = collections.Counter(ps); nc = collections.Counter(ns)
        u = sum(pcnt * ncnt * (1.0 if p > n else 0.5 if p == n else 0.0)
                for p, pcnt in pc.items() for n, ncnt in nc.items())
        assert r["auc"] == round(u / (500 * 500), 6)


class TestPrecisionRecallAt:
    ROWS = [(True, 0.9), (True, 0.6), (True, 0.2),
            (False, 0.8), (False, 0.1)]

    def test_hand_computed(self, spark):
        out = {r["threshold"]: r for r in
               precision_recall_at(_df(spark, self.ROWS),
                                   [0.5, 0.85]).collect()}
        r5 = out[0.5]  # predicted pos: 0.9 0.6 0.8 -> tp 2, fp 1
        assert (r5["tp"], r5["fp"], r5["fn"], r5["tn"]) == (2, 1, 1, 1)
        assert r5["precision"] == round(2 / 3, 6)
        assert r5["recall"] == round(2 / 3, 6)
        r85 = out[0.85]  # predicted pos: 0.9 -> tp 1, fp 0
        assert (r85["tp"], r85["fp"]) == (1, 0)
        assert r85["precision"] == 1.0
        assert r85["recall"] == round(1 / 3, 6)

    def test_empty_prediction_side_nulls(self, spark):
        out = precision_recall_at(_df(spark, [(False, 0.1)]),
                                  [0.5]).collect()[0]
        assert out["precision"] is None  # no predicted positives
        assert out["recall"] is None     # no actual positives
        assert out["tn"] == 1

    def test_validation(self, spark):
        df = _df(spark, self.ROWS)
        with pytest.raises(ValueError, match="non-empty"):
            precision_recall_at(df, [])
        with pytest.raises(ValueError, match="duplicate"):
            precision_recall_at(df, [0.5, 0.5])

    def test_null_rows_excluded(self, spark):
        rows = self.ROWS + [(None, 0.9), (True, None)]
        out = precision_recall_at(_df(spark, rows), [0.5]).collect()[0]
        assert (out["tp"], out["fp"], out["fn"], out["tn"]) == \
            (2, 1, 1, 1)
