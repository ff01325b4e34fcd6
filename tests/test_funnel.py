"""Gate funnel accounting."""

import pytest
from pyspark.sql import functions as F

from sumi_agent_spark.operators.funnel import gate_funnel


def _df(spark):
    # rows: (id, len_ok, clean_ok)
    rows = [(1, True, True), (2, False, True), (3, True, False),
            (4, False, False), (5, True, True)]
    return spark.createDataFrame(rows, "id long, a boolean, b boolean")


def test_hand_computed_funnel(spark):
    df = _df(spark)
    out = {r["gate"]: r for r in gate_funnel(
        df, {"len": F.col("a"), "clean": F.col("b")}).collect()}
    ln = out["len"]
    assert (ln["n_in"], ln["n_dropped"], ln["n_out"]) == (5, 2, 3)
    assert ln["n_fail_total"] == 2
    assert ln["n_fail_unique"] == 1  # row 2 (row 4 also fails clean)
    cl = out["clean"]
    assert (cl["n_in"], cl["n_dropped"], cl["n_out"]) == (3, 1, 2)
    assert cl["n_fail_total"] == 2   # rows 3, 4 regardless of order
    assert cl["n_fail_unique"] == 1  # row 3


def test_order_changes_sequential_not_total(spark):
    df = _df(spark)
    out = {r["gate"]: r for r in gate_funnel(
        df, {"clean": F.col("b"), "len": F.col("a")}).collect()}
    assert out["clean"]["n_dropped"] == 2  # first gate now
    assert out["len"]["n_dropped"] == 1
    assert out["clean"]["n_fail_total"] == 2  # order-independent
    assert out["len"]["n_fail_unique"] == 1


def test_null_verdict_drops(spark):
    df = spark.createDataFrame([(1, None), (2, True)],
                               "id long, a boolean")
    r = gate_funnel(df, {"a": F.col("a")}).collect()[0]
    assert (r["n_dropped"], r["n_out"]) == (1, 1)


def test_expression_gates_compose(spark):
    from sumi_agent_spark.operators.doc_quality import (
        gopher_quality_keep_condition)
    df = spark.createDataFrame(
        [(1, "the cat and the dog have fun with that"), (2, "x")],
        "id long, text string")
    out = gate_funnel(df, {
        "len": F.length("text") >= 5,
        "stops": gopher_quality_keep_condition(
            F.col("text"), {"stop_word_count": (2, None)}),
    }).collect()
    assert [(r["gate"], r["n_out"]) for r in out] == \
        [("len", 1), ("stops", 1)]


def test_validation(spark):
    with pytest.raises(ValueError, match="non-empty"):
        gate_funnel(_df(spark), {})


def test_single_gate(spark):
    r = gate_funnel(_df(spark), {"a": F.col("a")}).collect()[0]
    assert r["n_fail_unique"] == r["n_fail_total"] == 2
