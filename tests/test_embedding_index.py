"""Incremental embedding near-dedup against a persisted hyperplane index."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sumi_agent_spark.operators.dedup import embedding_near_duplicates
from sumi_agent_spark.operators.embedding_index import (
    append_to_embedding_index,
    embedding_near_duplicates_incremental,
    write_embedding_index,
)


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        ["vec_id", "embedding"])


@pytest.fixture(scope="module")
def emb_fixture(spark):
    rng = np.random.RandomState(7)
    base = rng.standard_normal(16)
    other = rng.standard_normal(16)
    third = rng.standard_normal(16)
    # corpus ids large on purpose (corpus-wins must not depend on order)
    corpus = [(100, base), (101, other),
              (102, base + 0.01 * rng.standard_normal(16))]  # ~dup of 100
    new = [(1, base + 0.02 * rng.standard_normal(16)),   # ~dup of corpus
           (2, third),                                   # novel
           (3, third + 0.01 * rng.standard_normal(16))]  # ~dup of 2
    return _vecs(spark, corpus), _vecs(spark, new)


def test_embedding_incremental_equals_full_restricted(spark, emb_fixture,
                                                      tmp_path):
    """The equality contract holds at probe_bits=0 (same exact-bucket
    candidate generation as the batch operator); the probe_bits=1 DEFAULT
    is a verified SUPERSET -- multi-probe can only ADD pairs the batch
    op's single-bucket recall missed, every one exact-cosine-verified."""
    corpus, new = emb_fixture
    path = str(tmp_path / "eidx")
    write_embedding_index(corpus, "vec_id", "embedding", path,
                          threshold=0.95)
    inc = embedding_near_duplicates_incremental(
        new, "vec_id", "embedding", path, probe_bits=0)
    got = {(r.id_a, r.id_b): (r.cos, r.new_a, r.new_b)
           for r in inc.collect()}

    full = embedding_near_duplicates(
        corpus.unionByName(new), "vec_id", "embedding", threshold=0.95)
    new_keys = {1, 2, 3}
    want = {(r.id_a, r.id_b): r.cos for r in full.collect()
            if r.id_a in new_keys or r.id_b in new_keys}
    assert {k: v[0] for k, v in got.items()} == want
    assert len(got) >= 2  # 1~100/102 and 2~3 at least
    # mixed pairs flag the corpus side; old-vs-old (100,102) never appears
    assert all(k[0] in new_keys or k[1] in new_keys for k in got)
    for (ia, ib), (_, na, nb) in got.items():
        assert na == (ia in new_keys) and nb == (ib in new_keys)

    # default (probe_bits=1): superset of the exact-bucket result, same
    # values on shared keys, every pair still >= threshold and never
    # old-vs-old
    inc1 = embedding_near_duplicates_incremental(
        new, "vec_id", "embedding", path)
    got1 = {(r.id_a, r.id_b): r.cos for r in inc1.collect()}
    assert set(got1) >= set(got)
    assert all(got1[k] == v[0] for k, v in got.items())
    assert all(v >= 0.95 for v in got1.values())
    assert all(k[0] in new_keys or k[1] in new_keys for k in got1)


def test_embedding_append_idempotent_and_next_slice(spark, emb_fixture,
                                                    tmp_path):
    corpus, new = emb_fixture
    path = str(tmp_path / "eidx")
    write_embedding_index(corpus, "vec_id", "embedding", path,
                          threshold=0.95)
    append_to_embedding_index(new, "vec_id", "embedding", path)
    n_v = spark.read.parquet(f"{path}/vectors").count()
    n_b = spark.read.parquet(f"{path}/buckets").count()
    append_to_embedding_index(new, "vec_id", "embedding", path)
    assert spark.read.parquet(f"{path}/vectors").count() == n_v
    assert spark.read.parquet(f"{path}/buckets").count() == n_b

    # a later slice near-matching slice-1's vec 2 sees it as corpus
    v2 = [r.embedding for r in new.filter("vec_id = 2").collect()][0]
    rng = np.random.RandomState(11)
    slice2 = _vecs(spark, [(11, np.array(v2) + 0.01 *
                            rng.standard_normal(16))])
    inc = embedding_near_duplicates_incremental(
        slice2, "vec_id", "embedding", path)
    rows = {(r.id_a, r.id_b): (r.new_a, r.new_b) for r in inc.collect()}
    assert rows.get((2, 11)) == (False, True)


def test_embedding_index_dim_mismatch_raises(spark, emb_fixture, tmp_path):
    corpus, _ = emb_fixture
    path = str(tmp_path / "eidx")
    write_embedding_index(corpus, "vec_id", "embedding", path)
    bad = _vecs(spark, [(9, np.ones(8))])
    with pytest.raises(ValueError, match="dim"):
        embedding_near_duplicates_incremental(
            bad, "vec_id", "embedding", path)
    with pytest.raises(ValueError, match="dim"):
        append_to_embedding_index(bad, "vec_id", "embedding", path)
    # a MIXED-dim slice must be rejected up front too (a first-row-only
    # probe would pass it through to a cryptic executor-side vstack error)
    mixed = _vecs(spark, [(8, np.ones(16)), (9, np.ones(8))])
    with pytest.raises(ValueError, match="16|8"):
        embedding_near_duplicates_incremental(
            mixed, "vec_id", "embedding", path)


def test_embedding_index_empty_and_null_slices(spark, emb_fixture,
                                               tmp_path):
    """A zero-new-embeddings day (empty slice, or all-NULL vectors) must
    return empty / append nothing, never crash the ingest job; an empty
    CORPUS cannot create an index (no dim to pin) and says so."""
    corpus, _ = emb_fixture
    path = str(tmp_path / "eidx")
    write_embedding_index(corpus, "vec_id", "embedding", path)
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>")
    assert embedding_near_duplicates_incremental(
        empty, "vec_id", "embedding", path).count() == 0
    n_v = spark.read.parquet(f"{path}/vectors").count()
    append_to_embedding_index(empty, "vec_id", "embedding", path)
    assert spark.read.parquet(f"{path}/vectors").count() == n_v

    nulls = spark.createDataFrame([(7, None)],
                                  "vec_id long, embedding array<double>")
    assert embedding_near_duplicates_incremental(
        nulls, "vec_id", "embedding", path).count() == 0

    with pytest.raises(ValueError, match="empty corpus"):
        write_embedding_index(empty, "vec_id", "embedding",
                              str(tmp_path / "eidx2"))
    with pytest.raises(ValueError, match="n_planes"):
        write_embedding_index(corpus, "vec_id", "embedding",
                              str(tmp_path / "eidx3"), n_planes=64)


def test_embedding_incremental_multiprobe_recall(spark, tmp_path):
    """probe_bits=1 recovers near-identical pairs whose buckets differ by
    one hyperplane bit: strictly more recall than exact-bucket probing,
    still zero false positives (exact cosine verify), corpus side never
    exploded."""
    rng = np.random.RandomState(42)
    n = 200
    corpus = _vecs(spark, [(1000 + i, rng.standard_normal(16))
                           for i in range(n)])
    # the slice = tiny perturbations of every corpus vector: every
    # (i, i+offset) pair is a true near-dup at cos ~ 0.9999
    vecs = {r.vec_id: np.array(r.embedding) for r in corpus.collect()}
    slice_df = _vecs(spark, [(vid + 5000,
                              v + 0.002 * rng.standard_normal(16))
                             for vid, v in vecs.items()])
    path = str(tmp_path / "eidx")
    write_embedding_index(corpus, "vec_id", "embedding", path,
                          threshold=0.99)

    p0 = {(r.id_a, r.id_b) for r in embedding_near_duplicates_incremental(
        slice_df, "vec_id", "embedding", path, probe_bits=0).collect()}
    p1 = {(r.id_a, r.id_b) for r in embedding_near_duplicates_incremental(
        slice_df, "vec_id", "embedding", path, probe_bits=1).collect()}
    truth = {(v, v + 5000) for v in vecs}
    assert p0 <= p1 <= truth  # no false positives, monotone recall
    assert len(p0) < n        # single-bucket LSH misses some (seeded)
    assert len(p1) >= 0.99 * n  # multi-probe recovers the 1-bit misses
    with pytest.raises(ValueError, match="probe_bits"):
        embedding_near_duplicates_incremental(
            slice_df, "vec_id", "embedding", path, probe_bits=2)


def test_embedding_incremental_capping_full_bucket(spark, tmp_path):
    """Capping counts old + new bucket rows together (the hot bucket is
    hot regardless of which run contributed the rows)."""
    from pyspark.sql import Observation

    from sumi_agent_spark.operators.dedup import capped_bucket_metrics
    from sumi_agent_spark.operators.embedding_index import (
        embedding_index_bucket_audit)

    rng = np.random.RandomState(3)
    hot = rng.standard_normal(16)
    far = -hot  # opposite bucket, keeps the output nonempty
    corpus = _vecs(spark, [(1000 + i, hot + 0.001 * rng.standard_normal(16))
                           for i in range(30)])
    slice_rows = [(10 + i, hot + 0.001 * rng.standard_normal(16))
                  for i in range(30)]
    slice_rows += [(0, far), (1, far + 0.001 * rng.standard_normal(16))]
    slice_df = _vecs(spark, slice_rows)
    path = str(tmp_path / "eidx")
    write_embedding_index(corpus, "vec_id", "embedding", path,
                          threshold=0.95)
    obs = Observation("emb_capping")
    inc = embedding_near_duplicates_incremental(
        slice_df, "vec_id", "embedding", path, max_bucket_size=40,
        observation=obs)
    got = {(r.id_a, r.id_b) for r in inc.collect()}
    assert got == {(0, 1)}  # the hot 60-row bucket was capped out
    m = capped_bucket_metrics(obs)
    if m is None:
        m = embedding_index_bucket_audit(
            slice_df, "vec_id", "embedding", path, max_bucket_size=40)
    assert m["max_bucket_n"] == 60
    assert m["n_capped_rows"] == 60


def test_embedding_index_model_rev_pin(spark, emb_fixture, tmp_path):
    """A slice stating a different embedding-model revision than the
    index pins must be refused (cosines across revisions are
    meaningless); unstated revisions skip the check (backward compat)."""
    corpus, sl = emb_fixture
    path = str(tmp_path / "eidx_rev")
    write_embedding_index(corpus, "vec_id", "embedding", path,
                          model_rev="toy-emb@r1")
    with pytest.raises(ValueError, match="model_rev"):
        append_to_embedding_index(sl, "vec_id", "embedding", path,
                                  model_rev="toy-emb@r2")
    with pytest.raises(ValueError, match="model_rev"):
        embedding_near_duplicates_incremental(
            sl, "vec_id", "embedding", path, model_rev="toy-emb@r2")
    # matching rev passes; unstated rev passes (check skipped)
    embedding_near_duplicates_incremental(
        sl, "vec_id", "embedding", path, model_rev="toy-emb@r1").count()
    append_to_embedding_index(sl, "vec_id", "embedding", path)
    # an UNPINNED index refuses a slice that states a revision: the
    # index cannot confirm it -- rebuild with the pin instead
    path2 = str(tmp_path / "eidx_norev")
    write_embedding_index(corpus, "vec_id", "embedding", path2)
    with pytest.raises(ValueError, match="model_rev"):
        append_to_embedding_index(sl, "vec_id", "embedding", path2,
                                  model_rev="toy-emb@r1")
