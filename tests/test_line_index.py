"""Incremental line-dedup index."""

import pytest

from sumi_agent_spark.operators.doc_quality import corpus_line_dedup
from sumi_agent_spark.operators.line_index import (
    append_line_index,
    line_dedup_incremental,
    write_line_index,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


CORPUS = [(0, "corpus only line\nshared boilerplate"),
          (2, "another corpus line\n\nshort")]
SLICE1 = [(10, "shared boilerplate\nfresh in slice one\ndup in slice"),
          (11, "dup in slice\nalso fresh")]
SLICE2 = [(20, "fresh in slice one\nbrand new line")]


def test_incremental_protocol(spark, tmp_path):
    idx = str(tmp_path / "li")
    st = write_line_index(_df(spark, CORPUS), idx)
    # corpus-only, shared-boilerplate, another-corpus-line, short
    # (the paragraph-break "" is not participating)
    assert st["n_keys"] == 4

    out1 = {r["doc_id"]: r for r in line_dedup_incremental(
        _df(spark, SLICE1), idx).collect()}
    # committed line drops; within-slice dup keeps first occurrence
    assert out1[10]["text"] == "fresh in slice one\ndup in slice"
    assert out1[10]["n_dropped_committed"] == 1
    assert out1[11]["text"] == "also fresh"
    assert out1[11]["n_dropped_in_slice"] == 1
    assert out1[11]["n_dropped_units"] == 1

    a1 = append_line_index(_df(spark, SLICE1), idx)
    assert a1["n_new_keys"] == 3  # fresh-in-slice-one, dup-in-slice, also-fresh

    out2 = line_dedup_incremental(_df(spark, SLICE2), idx).collect()[0]
    assert out2["text"] == "brand new line"
    assert out2["n_dropped_committed"] == 1


def test_sequential_equals_batch(spark, tmp_path):
    """Incremental over ordered slices == batch over the union."""
    idx = str(tmp_path / "li")
    all_rows = CORPUS + SLICE1 + SLICE2
    batch = {r["doc_id"]: r["text"] for r in corpus_line_dedup(
        _df(spark, all_rows)).collect()}
    write_line_index(_df(spark, CORPUS), idx)
    got = {}
    for r in CORPUS:
        got[r[0]] = r[1]  # bootstrap corpus emitted as-is (no dups in it)
    for sl in (SLICE1, SLICE2):
        for row in line_dedup_incremental(_df(spark, sl), idx).collect():
            got[row["doc_id"]] = row["text"]
        append_line_index(_df(spark, sl), idx)
    assert got == batch


def test_append_idempotent(spark, tmp_path):
    idx = str(tmp_path / "li")
    write_line_index(_df(spark, CORPUS), idx)
    append_line_index(_df(spark, SLICE1), idx)
    again = append_line_index(_df(spark, SLICE1), idx)
    assert again["n_new_keys"] == 0


def test_geometry_from_meta_normalize(spark, tmp_path):
    idx = str(tmp_path / "li")
    write_line_index(_df(spark, [(0, "Shared Line!")]), idx,
                     normalize=True)
    out = line_dedup_incremental(
        _df(spark, [(1, "shared line\nother line here")]),
        idx).collect()[0]
    assert out["text"] == "other line here"  # normalized key matched
    assert out["n_dropped_committed"] == 1


def test_overwrite_crash_is_loud_not_stale(spark, tmp_path, monkeypatch):
    """A crash inside overwrite=True must leave the index LOUDLY
    unreadable (old meta deleted first), never old-geometry meta over
    new keys -- which would hash slice keys under the wrong geometry
    and silently re-emit committed duplicates."""
    import sumi_agent_spark.operators.line_index as li
    idx = str(tmp_path / "li")
    write_line_index(_df(spark, CORPUS), idx)

    real = li._slice_keys

    def boom(lines):
        raise RuntimeError("injected crash before keys rewrite")

    monkeypatch.setattr(li, "_slice_keys", boom)
    with pytest.raises(RuntimeError, match="injected"):
        write_line_index(_df(spark, CORPUS), idx, normalize=True,
                         overwrite=True)
    monkeypatch.setattr(li, "_slice_keys", real)
    with pytest.raises(ValueError, match="no committed line index"):
        line_dedup_incremental(_df(spark, SLICE1), idx)
    # the rebuild re-runs cleanly after the crash
    write_line_index(_df(spark, CORPUS), idx, normalize=True)
    assert line_dedup_incremental(
        _df(spark, SLICE1), idx).count() == 2


def test_bootstrap_refusal_and_missing_index(spark, tmp_path):
    idx = str(tmp_path / "li")
    with pytest.raises(ValueError, match="no committed line index"):
        line_dedup_incremental(_df(spark, SLICE1), idx)
    write_line_index(_df(spark, CORPUS), idx)
    with pytest.raises(ValueError, match="already committed"):
        write_line_index(_df(spark, CORPUS), idx)
    write_line_index(_df(spark, CORPUS), idx, overwrite=True)  # allowed
