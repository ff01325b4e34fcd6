"""Replacement-content probes: changed re-exports vs the rest of the corpus.

The contract under test: ``probe_index_near_duplicates`` (and its
embedding analog) flags a changed key whose NEW content near-duplicates a
DIFFERENT committed key, while never flagging a replacement for
resembling its own (or another probe key's) dying old content -- the hole
the committed-key filter in the incremental operators leaves open."""

import pytest
from pyspark.sql import functions as F

from sumi_agent_spark.operators.embedding_index import (
    probe_embedding_index_near_duplicates,
    write_embedding_index,
)
from sumi_agent_spark.operators.minhash_index import (
    incremental_drop_keys,
    probe_index_near_duplicates,
    write_minhash_index,
)

BASE = ("the quick brown fox jumps over the lazy dog while the sun sets "
        "slowly behind the distant mountains and the river keeps flowing")
ALT = ("a completely different discussion about query engines, shuffle "
       "partitioning, bucketed joins and skew mitigation at petabyte scale")
THIRD = ("yet another unrelated document describing watermarks, stateful "
         "streaming operators and exactly-once sinks in structured streaming")


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("probe_idx") / "mh")
    corpus = spark.createDataFrame(
        [("a", BASE), ("b", ALT), ("c", THIRD)], ["doc_id", "text"])
    write_minhash_index(corpus, "doc_id", "text", path, threshold=0.8)
    return path


def _probe(spark, index_path, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return probe_index_near_duplicates(df, "doc_id", "text", index_path)


def test_replacement_near_copy_of_other_doc_flagged(spark, index_path):
    # b's re-export was rewritten into a near-copy of committed doc a
    pairs = _probe(spark, index_path,
                   [("b", BASE.replace("quick", "swift"))]).collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {("a", "b")}
    p = pairs[0]
    assert (p["new_a"], p["new_b"]) == (False, True)
    drops = incremental_drop_keys(
        _probe(spark, index_path,
               [("b", BASE.replace("quick", "swift"))])).collect()
    assert [r["doc_id"] for r in drops] == ["b"]


def test_replacement_resembling_own_old_content_not_flagged(spark,
                                                            index_path):
    # a small edit: the replacement is ~identical to b's OWN stored text
    pairs = _probe(spark, index_path,
                   [("b", ALT.replace("different", "distinct"))]).collect()
    assert pairs == []


def test_replacement_resembling_other_probes_old_content_not_flagged(
        spark, index_path):
    # b is rewritten into a near-copy of c's OLD text -- but c is ALSO
    # being replaced in the same run, so c's old content is dying and b's
    # new content does not duplicate anything that will remain
    pairs = _probe(
        spark, index_path,
        [("b", THIRD.replace("operators", "runners")),
         ("c", "a thoroughly new unrelated note on compaction policies "
               "and manifest caching in large table formats")]).collect()
    assert pairs == []


def test_predecessor_shadow_carved_out(spark, tmp_path):
    """A corpus doc whose stored content near-duplicates the probe key's
    OWN old content is the predecessor's shadow (e.g. a replacement
    deleted for duplicating this key, then reindexed): matching it must
    not flag the probe -- while an UNCOMMITTED probe key matching the
    same doc is flagged normally (no history, no carve-out)."""
    path = str(tmp_path / "mh_shadow")
    # b is a's ghost: its stored content is byte-identical to a's
    corpus = spark.createDataFrame(
        [("a", BASE), ("b", BASE), ("c", ALT)], ["doc_id", "text"])
    write_minhash_index(corpus, "doc_id", "text", path, threshold=0.8)
    # a's replacement is a small self-edit; its only match is b, whose
    # stored content ~= a's own old content -> carved out, no pairs
    pairs = _probe(spark, path, [("a", BASE.replace("lazy", "idle"))])
    assert pairs.collect() == []
    # an uncommitted key with the same text has no predecessor: flagged
    pairs = _probe(spark, path,
                   [("z", BASE.replace("lazy", "idle"))]).collect()
    assert {p["id_a"] for p in pairs} == {"a", "b"}


def test_probe_probe_pair_drops_later_key_only(spark, index_path):
    # two re-exports rewritten into near-copies of each other: keep-first
    common = ("both replacements now describe adaptive query execution, "
              "runtime re-optimization and skew join splitting in detail")
    res = _probe(spark, index_path,
                 [("b", common), ("c", common + " indeed")])
    pairs = res.collect()
    assert {(p["id_a"], p["id_b"], p["new_a"], p["new_b"])
            for p in pairs} == {("b", "c", True, True)}
    drops = incremental_drop_keys(res).collect()
    assert [r["doc_id"] for r in drops] == ["c"]


# ─── embedding analog ───


def _vec(x, dim=8):
    base = [float(x)] + [1.0] * (dim - 1)
    n = sum(v * v for v in base) ** 0.5
    return [v / n for v in base]


@pytest.fixture(scope="module")
def emb_index_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("probe_idx") / "emb")
    corpus = spark.createDataFrame(
        [("a", _vec(0.0)), ("b", _vec(10.0)), ("c", _vec(-10.0))],
        "doc_id string, v array<double>")
    write_embedding_index(corpus, "doc_id", "v", path, threshold=0.98,
                          n_planes=4)
    return path


def _eprobe(spark, emb_index_path, rows):
    df = spark.createDataFrame(rows, "doc_id string, v array<double>")
    return probe_embedding_index_near_duplicates(df, "doc_id", "v",
                                                 emb_index_path)


def test_embedding_replacement_duplicating_other_key_flagged(
        spark, emb_index_path):
    # b's re-embedded vector now sits on top of committed a's
    pairs = _eprobe(spark, emb_index_path,
                    [("b", _vec(0.001))]).collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {("a", "b")}
    p = pairs[0]
    assert (p["new_a"], p["new_b"]) == (False, True)


def test_embedding_replacement_near_own_old_vector_not_flagged(
        spark, emb_index_path):
    pairs = _eprobe(spark, emb_index_path,
                    [("b", _vec(10.001))]).collect()
    assert pairs == []


def test_embedding_predecessor_shadow_carved_out(spark, tmp_path):
    path = str(tmp_path / "emb_shadow")
    corpus = spark.createDataFrame(
        [("a", _vec(3.0)), ("b", _vec(3.001)), ("c", _vec(-10.0))],
        "doc_id string, v array<double>")
    write_embedding_index(corpus, "doc_id", "v", path, threshold=0.98,
                          n_planes=4)
    # a's replacement sits near its own old vector; its only match is
    # b, whose stored vector ~= a's old one -> shadow, carved out
    assert _eprobe(spark, path, [("a", _vec(3.002))]).collect() == []
    # an uncommitted key at the same point is flagged against both
    pairs = _eprobe(spark, path, [("z", _vec(3.002))]).collect()
    assert {p["id_a"] for p in pairs} == {"a", "b"}


def test_embedding_probe_probe_pair(spark, emb_index_path):
    res = _eprobe(spark, emb_index_path,
                  [("b", _vec(5.0)), ("c", _vec(5.001))])
    pairs = res.collect()
    assert {(p["id_a"], p["id_b"], p["new_a"], p["new_b"])
            for p in pairs} == {("b", "c", True, True)}
    drops = incremental_drop_keys(res).collect()
    assert [r["doc_id"] for r in drops] == ["c"]


# ─── Group-granularity (conversation) probe ───

CONV_A = [("a", 0, "the quick brown fox jumps over the lazy dog near "
                   "the river bank at sunset"),
          ("a", 1, "and the slow badger digs a deep burrow beneath the "
                   "old oak tree before winter arrives")]
CONV_B = [("b", 0, "an entirely different exchange about broadcast "
                   "joins, shuffle partitions and adaptive execution"),
          ("b", 1, "continuing with skew mitigation, salting strategies "
                   "and bucketed storage layouts for petabyte tables")]
CONV_C = [("c", 0, "a third conversation on watermarks, state stores "
                   "and exactly-once semantics in streaming pipelines")]


def _conv_df(spark, rows):
    return spark.createDataFrame(rows, ["conv_id", "turn_idx", "text"])


@pytest.fixture(scope="module")
def grouped_index_path(spark, tmp_path_factory):
    from sumi_agent_spark.operators.minhash_index import (
        write_grouped_minhash_index)
    path = str(tmp_path_factory.mktemp("gprobe_idx") / "gmh")
    write_grouped_minhash_index(
        _conv_df(spark, CONV_A + CONV_B + CONV_C),
        "conv_id", "text", path, threshold=0.7)
    return path


def _gprobe(spark, index_path, rows):
    from sumi_agent_spark.operators.minhash_index import (
        probe_grouped_index_near_duplicates)
    return probe_grouped_index_near_duplicates(
        _conv_df(spark, rows), "conv_id", "text", index_path)


def test_grouped_replacement_copy_of_other_conv_flagged(
        spark, grouped_index_path):
    # conversation b re-exported as a near-copy of committed conv a
    probe = [("b", i, t.replace("quick", "swift")) for _, i, t in CONV_A]
    res = _gprobe(spark, grouped_index_path, probe)
    pairs = res.collect()
    assert {(p["id_a"], p["id_b"], p["new_a"], p["new_b"])
            for p in pairs} == {("a", "b", False, True)}
    assert [r["doc_id"] for r in incremental_drop_keys(res).collect()] \
        == ["b"]


def test_grouped_replacement_near_own_old_content_not_flagged(
        spark, grouped_index_path):
    # a grown conversation: same turns plus one new -- resembles only
    # its OWN dying content
    probe = CONV_B + [("b", 2, "a freshly appended closing turn about "
                               "manifest caching and compaction policy")]
    assert _gprobe(spark, grouped_index_path, probe).collect() == []


def test_grouped_replacement_of_other_probes_old_content_not_flagged(
        spark, grouped_index_path):
    # b rewritten into c's OLD content while c is also being replaced
    probe = ([("b", i, t.replace("third", "fourth")) for _, i, t in CONV_C]
             + [("c", 0, "a thoroughly new note on columnar codecs and "
                         "dictionary encoding for nested schemas")])
    assert _gprobe(spark, grouped_index_path, probe).collect() == []


def test_grouped_predecessor_shadow_carved_out(spark, tmp_path):
    from sumi_agent_spark.operators.minhash_index import (
        write_grouped_minhash_index)
    path = str(tmp_path / "gshadow")
    # b's stored content ~= a's stored content (the shadow); c unrelated
    shadow_b = [("b", i, t.replace("fox", "wolf")) for _, i, t in CONV_A]
    write_grouped_minhash_index(
        _conv_df(spark, CONV_A + shadow_b + CONV_C),
        "conv_id", "text", path, threshold=0.7)
    # a's replacement is a small self-edit; its only LSH match besides
    # its dying self is b, whose stored rows ~= a's old rows -> shadow
    probe = [("a", i, t.replace("sunset", "sunrise")) for _, i, t in CONV_A]
    assert _gprobe(spark, path, probe).collect() == []
    # an UNCOMMITTED conversation with the same content gets no
    # carve-out and is flagged against both committed copies
    probe_z = [("z", i, t) for _, i, t in CONV_A]
    pairs = _gprobe(spark, path, probe_z).collect()
    assert {p["id_a"] for p in pairs} == {"a", "b"}


def test_grouped_probe_probe_pair_drops_later_gid(
        spark, grouped_index_path):
    fresh = [("b", 0, "two re-exports rewritten into copies of each "
                      "other about vectorized readers and null masks"),
             ("b", 1, "sharing every sentence verbatim across both "
                      "replacement conversations in this slice")]
    probe = fresh + [("c", i, t) for _, i, t in fresh]
    res = _gprobe(spark, grouped_index_path, probe)
    pairs = res.collect()
    assert {(p["id_a"], p["id_b"], p["new_a"], p["new_b"])
            for p in pairs} == {("b", "c", True, True)}
    assert [r["doc_id"] for r in incremental_drop_keys(res).collect()] \
        == ["c"]
