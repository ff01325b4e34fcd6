"""Gopher quality battery, C4 heuristics, corpus-level line dedup."""

import pytest
from pyspark.sql import functions as F

from sumi_agent_spark.operators.doc_quality import (
    GOPHER_QUALITY_RULES,
    c4_clean,
    c4_stats,
    corpus_line_dedup,
    gopher_quality_filter,
    gopher_quality_keep_condition,
    gopher_quality_stats,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _stats(spark, text):
    row = (gopher_quality_stats(_df(spark, [("d", text)]))
           .collect()[0].asDict())
    row.pop("doc_id")
    return row


class TestGopherQualityStats:
    def test_hand_computed(self, spark):
        s = _stats(spark, "The cat sat on the mat and that have with "
                          "be to of.\nMore text here.")
        # 16 tokens, 52 token chars -> mean 3.25; 7 of the 8 stopwords
        assert s["word_count"] == 16
        assert s["mean_word_len"] == 3.25
        assert s["stop_word_count"] == 7
        assert s["alpha_word_frac"] == 1.0
        assert s["hash_word_ratio"] == 0.0

    def test_bullets_and_ellipses(self, spark):
        s = _stats(spark, "• bullet one\n  - dash bullet\nplain...")
        assert s["bullet_line_frac"] == round(2 / 3, 6)
        assert s["ellipsis_line_frac"] == round(1 / 3, 6)
        # one "..." over 7 words
        assert s["ellipsis_word_ratio"] == round(1 / 7, 6)

    def test_crlf_line_not_an_ellipsis_line(self, spark):
        # CRLF text split on \n leaves a trailing \r; Java's default $
        # would match before it while RE2's would not -- the \z anchor
        # keeps both engines agreeing that this is NOT an ellipsis line
        s = _stats(spark, "Read more...\r\nNext line here.")
        assert s["ellipsis_line_frac"] == 0.0

    def test_hash_ratio_counts_chars(self, spark):
        # 7 '#' chars over 7 words
        s = _stats(spark, "#### ## # lots of hashes here")
        assert s["hash_word_ratio"] == 1.0

    def test_unicode_ellipsis_and_overlap(self, spark):
        # "......" = two non-overlapping "..." + one U+2026
        s = _stats(spark, "a...... b…")
        assert s["ellipsis_word_ratio"] == 1.5

    def test_alpha_word_frac(self, spark):
        s = _stats(spark, "abc 123 4x 99 漢字")
        assert s["alpha_word_frac"] == round(3 / 5, 6)

    def test_null_and_empty(self, spark):
        for t in (None, "", "   \n \n"):
            s = _stats(spark, t)
            assert s["word_count"] == 0
            assert s["mean_word_len"] == 0.0
            assert s["bullet_line_frac"] == 0.0
            assert s["stop_word_count"] == 0

    def test_ideographic_space_not_split(self, spark):
        # U+3000 must not split tokens (explicit ASCII ws class)
        s = _stats(spark, "日本語　テキス"
                          "ト です。")
        assert s["word_count"] == 2

    def test_stopwords_case_insensitive_and_distinct(self, spark):
        s = _stats(spark, "THE the The WITH")
        assert s["stop_word_count"] == 2  # distinct stopwords present

    def test_no_exchange_no_python(self, spark):
        df = _df(spark, [("d", "hello world")])
        plan = (gopher_quality_stats(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan
        assert "EvalPython" not in plan


class TestGopherQualityFilter:
    GOOD = ("The quick brown fox jumps over the lazy dog and then "
            "runs off to the woods with great speed that day. " * 5)

    def test_catalog_pass_and_breach(self, spark):
        rows = [("good", self.GOOD),
                ("short", "Too few words with the and."),
                ("hashy", ("the be to of and that have with " * 8)
                 + "# " * 20)]
        out = gopher_quality_filter(_df(spark, rows))
        assert [r["doc_id"] for r in out.collect()] == ["good"]

    def test_custom_rules_directions(self, spark):
        rows = [("a", "one two three"), ("b", "one two three four five")]
        df = _df(spark, rows)
        lo = gopher_quality_filter(df, rules={"word_count": (4, None)})
        hi = gopher_quality_filter(df, rules={"word_count": (None, 4)})
        assert [r["doc_id"] for r in lo.collect()] == ["b"]
        assert [r["doc_id"] for r in hi.collect()] == ["a"]

    def test_rules_validation(self, spark):
        df = _df(spark, [("a", "x")])
        with pytest.raises(ValueError, match="unknown gopher"):
            gopher_quality_filter(df, rules={"nope": (1, 2)})
        with pytest.raises(ValueError, match="non-empty"):
            gopher_quality_filter(df, rules={})
        with pytest.raises(ValueError, match="at least one bound"):
            gopher_quality_filter(df, rules={"word_count": (None, None)})
        with pytest.raises(ValueError, match="min > max"):
            gopher_quality_filter(df, rules={"word_count": (9, 5)})

    def test_gopher_literal_equals_default(self, spark):
        df = _df(spark, [("good", self.GOOD), ("bad", "tiny.")])
        a = gopher_quality_filter(df, rules="gopher").collect()
        b = gopher_quality_filter(df, rules=None).collect()
        assert sorted(r["doc_id"] for r in a) == \
            sorted(r["doc_id"] for r in b) == ["good"]

    def test_keep_condition_composes(self, spark):
        df = _df(spark, [("good", self.GOOD), ("bad", "tiny.")])
        out = df.filter(gopher_quality_keep_condition(
            F.col("text"), {"word_count": (50, None)}))
        assert [r["doc_id"] for r in out.collect()] == ["good"]

    def test_catalog_values(self):
        assert GOPHER_QUALITY_RULES["stop_word_count"] == (2, None)
        assert GOPHER_QUALITY_RULES["alpha_word_frac"] == (0.80, None)


class TestC4:
    def test_line_rules(self, spark):
        rows = [("d", "\n".join([
            "This is a good sentence with many words.",   # kept
            "short line.",                                 # < 5 words
            "No terminal punctuation on this long line",   # no end mark
            "Trailing ellipsis long enough to keep...",    # ellipsis end
            "Uses JavaScript for the menus on pages.",     # javascript
            "See our privacy policy for more details.",    # policy
            'Ends with a quote so it stays right here."',  # quote end
            "A question that is long enough to keep?",     # ? end
        ]))]
        row = c4_stats(_df(spark, rows)).collect()[0]
        assert row["n_lines"] == 8
        assert row["n_kept_lines"] == 3
        kept = row["clean_text"].split("\n")
        assert kept == ["This is a good sentence with many words.",
                        'Ends with a quote so it stays right here."',
                        "A question that is long enough to keep?"]

    def test_doc_rules(self, spark):
        rows = [
            ("ok", "One fine sentence that is long enough here.\n"
                   "Two fine sentences that are long enough here.\n"
                   "Three fine sentences that are long enough here."),
            ("lorem", "Has Lorem Ipsum filler text in this sentence.\n"
                      "Two fine sentences that are long enough here.\n"
                      "Three fine sentences that are long enough here."),
            ("brace", "Contains a { brace in this long sentence here.\n"
                      "Two fine sentences that are long enough here.\n"
                      "Three fine sentences that are long enough here."),
            ("few", "Only one proper sentence lives in here today."),
        ]
        stats = {r["doc_id"]: r for r in
                 c4_stats(_df(spark, rows)).collect()}
        assert stats["ok"]["c4_keep"] is True
        assert stats["lorem"]["c4_keep"] is False
        assert stats["brace"]["c4_keep"] is False
        assert stats["few"]["c4_keep"] is False
        assert stats["few"]["n_sentences"] == 1
        out = c4_clean(_df(spark, rows))
        assert [r["doc_id"] for r in out.collect()] == ["ok"]

    def test_sentence_count_edges(self, spark):
        # "a.b." -- inner period not followed by ws doesn't end a
        # sentence; final period does
        rows = [("d", "Version a.b.c ships with five total words.")]
        assert c4_stats(_df(spark, rows)).collect()[0]["n_sentences"] == 1

    def test_clean_preserves_other_columns(self, spark):
        df = spark.createDataFrame(
            [("d", 7, "A good clean sentence with many words.\nx")],
            "doc_id string, extra int, text string")
        row = c4_clean(df, min_sentences=1).collect()[0]
        assert row["extra"] == 7
        assert row["text"] == "A good clean sentence with many words."

    def test_null_text(self, spark):
        row = c4_stats(_df(spark, [("d", None)])).collect()[0]
        assert row["n_lines"] == 0 and row["c4_keep"] is False

    def test_no_exchange_no_python(self, spark):
        df = _df(spark, [("d", "hello world.")])
        plan = (c4_stats(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan
        assert "EvalPython" not in plan


class TestCorpusLineDedup:
    def _run(self, spark, rows, **kw):
        out = corpus_line_dedup(_df(spark, rows), **kw)
        return {r["doc_id"]: r for r in out.collect()}

    def test_keep_first_across_docs(self, spark):
        got = self._run(spark, [
            ("a", "unique alpha\nshared boilerplate line\ntail a"),
            ("b", "shared boilerplate line\nunique beta\ntail b"),
        ])
        assert got["a"]["text"] == \
            "unique alpha\nshared boilerplate line\ntail a"
        assert got["a"]["n_dropped_units"] == 0
        assert got["b"]["text"] == "unique beta\ntail b"
        assert got["b"]["n_dropped_units"] == 1

    def test_within_doc_duplicates(self, spark):
        got = self._run(spark, [("a", "same line\nother\nsame line")])
        assert got["a"]["text"] == "same line\nother"
        assert got["a"]["n_dropped_units"] == 1

    def test_roundtrip_when_no_duplicates(self, spark):
        texts = ["a\n\nb\n", "", "x\ny", None]
        got = self._run(spark, [(f"d{i}", t)
                                for i, t in enumerate(texts)])
        for i, t in enumerate(texts):
            assert got[f"d{i}"]["text"] == (t or "")
            assert got[f"d{i}"]["n_dropped_units"] == 0

    def test_whitespace_lines_never_participate(self, spark):
        got = self._run(spark, [
            ("a", "x\n   \nyes this dupes"),
            ("b", "   \nyes this dupes\n   "),
        ])
        # the whitespace-only line survives everywhere; the content
        # line survives only in doc a
        assert got["a"]["text"] == "x\n   \nyes this dupes"
        assert got["b"]["text"] == "   \n   "
        assert got["b"]["n_dropped_units"] == 1

    def test_min_chars_guard(self, spark):
        rows = [("a", "hi\nlong enough line"),
                ("b", "hi\nlong enough line")]
        got = self._run(spark, rows, min_chars=5)
        # "hi" (2 non-ws chars) is below the bar -> survives in both
        assert got["b"]["text"] == "hi"
        assert got["b"]["n_dropped_units"] == 1
        with pytest.raises(ValueError, match="min_chars"):
            self._run(spark, rows, min_chars=0)

    def test_partitioning_invariance(self, spark):
        rows = [(f"d{i:02d}",
                 f"unique {i}\ncommon shared line\nalso unique {i}")
                for i in range(12)]
        df = _df(spark, rows)
        a = {r["doc_id"]: r["text"]
             for r in corpus_line_dedup(df).collect()}
        b = {r["doc_id"]: r["text"]
             for r in corpus_line_dedup(df.repartition(7)).collect()}
        assert a == b
        keepers = [d for d, t in a.items() if "common shared line" in t]
        assert keepers == ["d00"]

    def test_counts(self, spark):
        got = self._run(spark, [("a", "x\nx\nx"), ("b", "x")])
        assert got["a"]["n_units"] == 3
        assert got["a"]["n_dropped_units"] == 2
        assert got["b"]["n_dropped_units"] == 1

    def test_paragraph_unit(self, spark):
        got = self._run(spark, [
            ("a", "first para\nstill first\n\nshared para"),
            ("b", "shared para\n\n\nown para"),
        ], unit="paragraph")
        # multi-line paragraphs dedup as one unit; the 3-newline run in
        # doc b canonicalizes to one blank-line separator
        assert got["a"]["text"] == \
            "first para\nstill first\n\nshared para"
        assert got["b"]["text"] == "own para"
        assert got["b"]["n_dropped_units"] == 1
        with pytest.raises(ValueError, match="unit"):
            self._run(spark, [("a", "x")], unit="sentence")

    def test_ccnet_normalize_dedup_keeps_raw_text(self, spark):
        got = self._run(spark, [
            ("a", "Visit Example Corp, suite 101!"),
            ("b", "visit example corp suite"),
            ("c", "completely unrelated content here"),
        ], normalize=True)
        # same normalized key -> doc b's variant drops; doc a keeps its
        # RAW punctuation/case
        assert got["a"]["text"] == "Visit Example Corp, suite 101!"
        assert got["b"]["text"] == ""
        assert got["b"]["n_dropped_units"] == 1
        assert got["c"]["n_dropped_units"] == 0

    def test_normalized_whitespace_only_key_never_participates(
            self, spark):
        # "123 !!!" normalizes to empty -> structure, not content
        got = self._run(spark, [("a", "123 !!!"), ("b", "123 !!!")],
                        normalize=True)
        assert got["a"]["text"] == got["b"]["text"] == "123 !!!"


def test_gopher_quality_stream_matches_batch_filter(spark, tmp_path):
    """The stream gate IS the batch keep condition (one shared
    Catalyst expression), verified end-to-end under availableNow."""
    from sumi_agent_spark.streaming.stream_pipeline import (
        gopher_quality_stream)
    rows = [(0, TestGopherQualityFilter.GOOD),
            (1, "tiny."),
            (2, ("the be to of and that have with " * 8) + "# " * 20),
            (3, None)]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(src)
    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(src))
    out = str(tmp_path / "out")
    q = (gopher_quality_stream(stream).writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    batch = {r["doc_id"] for r in
             gopher_quality_filter(
                 spark.read.parquet(src)).collect()}
    assert got == batch == {0}


def _write_turns(rows, path):
    import datetime

    import pandas as pd
    pdf = pd.DataFrame(
        [{"conv_id": c, "turn_idx": i, "role": "user", "text": t,
          "tool": "", "ts": datetime.datetime(2025, 1, 1)}
         for c, i, t in rows])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(path, index=False)


LONG_TURN = ("the committee reviewed the annual water report and noted "
             "several measured improvements across districts this year")
SHORT_TURN = "ok."


class TestPipelineGopherGate:
    def test_gate_drops_and_counts(self, spark, tmp_path):
        from sumi_agent_spark.plans.pipeline import run_pipeline
        inp = str(tmp_path / "in.parquet")
        _write_turns([("c1", 0, LONG_TURN), ("c1", 1, SHORT_TURN),
                      ("c2", 0, LONG_TURN + " again")], inp)
        out = str(tmp_path / "out")
        stats = run_pipeline(spark, inp, out,
                             gopher_quality_rules={
                                 "word_count": (5, None)})
        got = spark.read.parquet(out).toPandas()
        assert set(zip(got["conv_id"], got["turn_idx"])) == {
            ("c1", 0), ("c2", 0)}
        lin = spark.read.parquet(
            f"{out}/_lineage_docquality").toPandas()
        assert lin["n_dropped"].tolist() == [1]
        assert "word_count=[5.0,None]" in lin["rules"][0]
        assert stats["rows_in"] == 2

    def test_gate_validation(self, spark, tmp_path):
        from sumi_agent_spark.plans.pipeline import run_pipeline
        inp = str(tmp_path / "in.parquet")
        _write_turns([("c1", 0, LONG_TURN)], inp)
        with pytest.raises(ValueError, match="unknown gopher"):
            run_pipeline(spark, inp, str(tmp_path / "o"),
                         gopher_quality_rules={"nope": (1, 2)})
        with pytest.raises(ValueError, match="non-empty"):
            run_pipeline(spark, inp, str(tmp_path / "o"),
                         gopher_quality_rules="nonsense")

    def test_gate_resume(self, spark, tmp_path):
        from sumi_agent_spark.plans.pipeline import run_pipeline
        inp = str(tmp_path / "in.parquet")
        _write_turns([("c1", 0, LONG_TURN), ("c1", 1, SHORT_TURN)], inp)
        out = str(tmp_path / "out")
        rules = {"word_count": (5, None)}
        run_pipeline(spark, inp, out, gopher_quality_rules=rules)
        s2 = run_pipeline(spark, inp, out, resume=True,
                          gopher_quality_rules=rules)
        assert s2["rows"] == 0
        assert len(spark.read.parquet(out).toPandas()) == 1

    def test_upsert_recheck_deletes_failing_replacement(
            self, spark, tmp_path):
        """A re-export rewritten into text that fails the gopher gate
        must come back as a delete action, not an upsert."""
        from sumi_agent_spark.plans.pipeline import run_pipeline
        idx = str(tmp_path / "mh_index")
        rules = {"word_count": (5, None)}
        _write_turns([("a", 0, LONG_TURN)], str(tmp_path / "s1.parquet"))
        run_pipeline(spark, str(tmp_path / "s1.parquet"),
                     str(tmp_path / "out1"), near_dedup_threshold=0.6,
                     near_dedup_index_path=idx, reindex_changed=True,
                     gopher_quality_rules=rules)
        _write_turns([("a", 0, SHORT_TURN)], str(tmp_path / "s2.parquet"))
        run_pipeline(spark, str(tmp_path / "s2.parquet"),
                     str(tmp_path / "out2"), near_dedup_threshold=0.6,
                     near_dedup_index_path=idx, reindex_changed=True,
                     gopher_quality_rules=rules)
        up = spark.read.parquet(
            f"{tmp_path}/out2/_changed_upsert").toPandas()
        assert list(up["_action"]) == ["delete"]
