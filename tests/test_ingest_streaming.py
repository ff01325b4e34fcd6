"""Ingest operator tests + streaming-equals-batch test."""

import pandas as pd
from pyspark.sql import functions as F

from sumi_agent_spark.sources.ingest import (
    clean_content,
    csv_to_pipe_lines,
    decode_binary_text,
    detect_encoding,
    flatten_json_text,
    ingest_post_clean,
    strip_html,
)
from sumi_agent_spark.sources.transcripts import generate_transcripts


def test_ingest_post_clean(spark):
    df = spark.createDataFrame(
        [("\n\nline one   \nline two\n\n\n\nline three  \n\n",)], ["text"])
    out = df.select(ingest_post_clean(F.col("text")).alias("t")).first()["t"]
    assert out == "line one\nline two\n\nline three"


def test_csv_to_pipe_lines(spark):
    df = spark.createDataFrame([(1, "田中", "eng"), (2, "佐藤", "pm")],
                               ["id", "name", "role"])
    lines = [r["line"] for r in csv_to_pipe_lines(df).collect()]
    assert "1 | 田中 | eng" in lines


def test_flatten_json_text(spark):
    payload = '{"user": {"name": "田中 太郎", "email": "t@example.com"}, "n": 3}'
    df = spark.createDataFrame([(payload,), ("plain text",)], ["text"])
    out = [r["t"] for r in df.select(flatten_json_text("text").alias("t")).collect()]
    assert "user.name: 田中 太郎" in out[0]
    assert "user.email: t@example.com" in out[0]
    assert "n: 3" in out[0]
    assert out[1] == "plain text"


def test_strip_html(spark):
    html = ("<html><head><title>プロフィール</title><style>body{}</style></head>"
            "<body><h1>田中 太郎</h1><ul><li>Python</li><li>Spark</li></ul>"
            "<table><tr><td>email</td><td>t@example.com</td></tr></table>"
            "<a href='https://github.com/tanaka'>GitHub</a></body></html>")
    df = spark.createDataFrame([(html,), ("no tags here",)], ["text"])
    out = [r["t"] for r in df.select(strip_html("text").alias("t")).collect()]
    t = out[0]
    assert "プロフィール" in t and "田中 太郎" in t
    assert "・Python" in t
    assert "| t@example.com" in t
    assert "(https://github.com/tanaka)" in t
    assert "<" not in t
    assert out[1] == "no tags here"


def test_detect_encoding():
    assert detect_encoding("こんにちは".encode("utf-8")) == "utf-8"
    assert detect_encoding("こんにちは世界です".encode("shift_jis")) == "shift_jis"
    assert detect_encoding("こんにちは世界です".encode("euc_jp")) == "euc_jp"
    assert detect_encoding(b"\xef\xbb\xbfplain") == "utf-8-sig"
    assert detect_encoding(b"ascii only") == "utf-8"


def test_decode_binary_text(spark):
    rows = [(bytearray("日本語テキスト".encode("shift_jis")),),
            (bytearray("utf8 text".encode("utf-8")),)]
    df = spark.createDataFrame(rows, ["payload"])
    out = [r["t"] for r in df.select(decode_binary_text("payload").alias("t")).collect()]
    assert out[0] == "日本語テキスト"
    assert out[1] == "utf8 text"


def test_clean_content(spark):
    masked = ("概要はこちらです。\n"
              "[氏名非公開]\n"
              "電話：[電話番号非公開]\n"
              "本文が続きます。")
    df = spark.createDataFrame([(masked,)], ["text"])
    out = df.select(clean_content("text").alias("t")).first()["t"]
    assert out == "概要はこちらです。\n本文が続きます。"


def test_streaming_equals_batch(spark, tmp_path):
    from sumi_agent_spark.plans.pipeline import scrub_transcripts
    from sumi_agent_spark.streaming.stream_pipeline import (
        read_transcript_stream,
        scrub_stream,
        start_scrub_sink,
    )

    pdf = generate_transcripts(n_convs=10, avg_turns=6, seed=7)
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    # two "arriving" files
    h = len(pdf) // 2
    spark.createDataFrame(pdf.iloc[:h]).write.parquet(in_dir)
    spark.createDataFrame(pdf.iloc[h:]).write.mode("append").parquet(in_dir)

    stream = read_transcript_stream(spark, in_dir, max_files_per_trigger=1)
    q = start_scrub_sink(scrub_stream(stream), out_dir, ckpt)
    q.awaitTermination(120)

    got = (spark.read.parquet(out_dir)
           .select("conv_id", "turn_idx", "masked_text", "keep")
           .toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    exp = (scrub_transcripts(spark.createDataFrame(pdf))
           .select("conv_id", "turn_idx", "masked_text", "keep")
           .toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    assert len(got) == len(exp) == len(pdf)
    pd.testing.assert_frame_equal(got, exp)


def test_streaming_windowed_counts(spark, tmp_path):
    from sumi_agent_spark.streaming.stream_pipeline import (
        read_transcript_stream,
        scrub_stream,
        windowed_conversation_counts,
    )

    pdf = generate_transcripts(n_convs=6, avg_turns=5, seed=9)
    in_dir = str(tmp_path / "in2")
    spark.createDataFrame(pdf).write.parquet(in_dir)
    counts = windowed_conversation_counts(
        scrub_stream(read_transcript_stream(spark, in_dir)))
    q = (counts.writeStream.format("memory").queryName("win_counts")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from win_counts").toPandas()
    # append mode only emits windows closed by the watermark; with a single
    # batch the final windows may be withheld -- assert plumbing, not totals
    assert set(got.columns) == {"window_start", "window_end", "conv_id",
                                "n_turns", "n_keep", "n_detections"}


def test_strip_rtf_reference_semantics():
    """parseRTF port (RedactPro.tsx:1543-1563): control words, groups,
    hex/unicode escapes, newline collapse, trim."""
    from sumi_agent_spark.sources.ingest import strip_rtf_text

    bs = chr(92)
    rtf = ("{" + bs + "rtf1" + bs + "ansi{" + bs + "fonttbl{" + bs
           + "f0 Times New Roman;}}{" + bs + "colortbl;" + bs + "red0"
           + bs + "green0" + bs + "blue0;}" + bs + "f0 Hello" + bs
           + "par World" + bs + "line Tab" + bs + "tab here " + bs
           + "'e9 and " + bs + "u12354?end}")
    assert strip_rtf_text(rtf) == (
        "Hello\nWorld\nTab\there \xe9 and " + chr(12354) + "end")
    # envelope round-trip recovers the payload modulo newline collapse/trim
    text = "  line one\nline two\n\n\n\n\nline three\n"
    payload = text.replace("\n", bs + "par ")
    wrapped = ("{" + bs + "rtf1" + bs + "ansi{" + bs + "fonttbl{" + bs
               + "f0 Arial;}}" + bs + "f0 " + payload + "}")
    assert strip_rtf_text(wrapped) == "line one\nline two\n\nline three"
    # lone-surrogate \uN maps to U+FFFD (Arrow-encodable), not a crash
    assert chr(0xFFFD) in strip_rtf_text(bs + "u55296?x")
    assert strip_rtf_text("") == ""
    assert strip_rtf_text("plain text, no rtf") == "plain text, no rtf"


def test_sessionize_conversations_stateful(spark, tmp_path):
    """applyInPandasWithState sessionizer: gap-split within a batch, idle
    flush via EventTimeTimeout across micro-batches, and state surviving a
    checkpointed restart (two availableNow runs on one checkpoint)."""
    import datetime

    from sumi_agent_spark.streaming.stream_pipeline import (
        TRANSCRIPT_SCHEMA, read_transcript_stream, sessionize_conversations,
    )

    t0 = datetime.datetime(2025, 1, 1, 9, 0, 0)
    mins = datetime.timedelta(minutes=1)

    def turn(conv, idx, ts, keep=True, ndet=1):
        return (conv, idx, "user", "本文", "", ts, ndet, keep)

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts",
            "n_detections", "keep"]
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp, n_detections int, keep boolean")

    in_dir = str(tmp_path / "in_sess")
    out = str(tmp_path / "out_sess")
    ckpt = str(tmp_path / "ckpt_sess")

    # batch 1: conv A has two bursts separated by a 90-min gap (splits);
    # conv B has one turn and then goes idle forever
    batch1 = [turn("A", 0, t0), turn("A", 1, t0 + 2 * mins),
              turn("A", 2, t0 + 92 * mins),
              turn("B", 0, t0 + 1 * mins, ndet=3)]
    spark.createDataFrame(batch1, schema).write.parquet(in_dir)

    def run_once():
        stream = (spark.readStream.schema(
            spark.createDataFrame([], schema).schema).parquet(in_dir))
        q = (sessionize_conversations(stream, gap_minutes=30,
                                      watermark="5 minutes")
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()
    got1 = spark.read.parquet(out).toPandas()
    # the intra-batch gap split must have closed A's first burst
    a1 = got1[got1["conv_id"] == "A"]
    assert len(a1) == 1 and a1.iloc[0]["n_turns"] == 2

    # batch 2: much-later activity on conv C advances the watermark past
    # everyone's idle timeout -> B's session (and A's second burst) flush
    batch2 = [turn("C", 0, t0 + datetime.timedelta(hours=6))]
    spark.createDataFrame(batch2, schema).write.mode("append").parquet(in_dir)
    run_once()
    got2 = spark.read.parquet(out).toPandas()
    b = got2[got2["conv_id"] == "B"]
    assert len(b) == 1
    assert b.iloc[0]["n_turns"] == 1 and b.iloc[0]["n_detections"] == 3
    a_all = got2[got2["conv_id"] == "A"].sort_values("session_start")
    assert len(a_all) == 2          # burst 1 (gap split) + burst 2 (timeout)
    assert a_all.iloc[1]["n_turns"] == 1


def test_csv_blank_rows_use_js_trim_set(spark):
    """A row whose cells hold only JS-whitespace (U+3000, NBSP) is blank to
    the reference's r.some(c => c.trim()) and must be dropped; ASCII trim
    would keep it."""
    df = spark.createDataFrame(
        [("　", "\xa0"), ("", ""), ("a", ""), (None, None)],
        ["x", "y"])
    lines = [r["line"] for r in csv_to_pipe_lines(df).collect()]
    assert lines == ["a | "]


def test_stream_dedup_exact(spark, tmp_path):
    """Streaming exact dedup keeps one row per normalized text within the
    watermark horizon; NULL-text rows dedup against each other (the same
    sentinel rule as the batch deduplicate_turns)."""
    import datetime

    from sumi_agent_spark.streaming.stream_pipeline import (
        TRANSCRIPT_SCHEMA, dedup_stream, read_transcript_stream)

    ts = datetime.datetime(2025, 1, 1, 12, 0, 0)
    rows = [
        ("c1", 0, "user", "同じ  本文 です", "", ts),
        ("c1", 1, "user", "同じ 本文  です", "", ts),   # ws-variant duplicate
        ("c2", 0, "user", "別の本文です", "", ts),
        ("c3", 0, "user", None, "", ts),
        ("c3", 1, "user", None, "", ts),               # NULL-text duplicate
    ]
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).write.parquet(in_dir)

    stream = read_transcript_stream(spark, in_dir)
    q = (dedup_stream(stream).writeStream
         .format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir).toPandas()
    assert len(got) == 3  # one per distinct normalized text (incl. NULL)
    texts = set(got["text"].fillna("<null>"))
    assert "<null>" in texts and "別の本文です" in texts


def test_stream_dedup_simhash(spark, tmp_path):
    """SimHash fingerprint mode drops near-duplicate variants within the
    watermark: case, whitespace, and token-order variants SimHash to the
    same 64 bits (sign sums are case-folded, token-based and
    order-invariant), which exact-md5 mode would all keep."""
    import datetime

    from sumi_agent_spark.operators.dedup import make_simhash_udf
    from sumi_agent_spark.streaming.stream_pipeline import (
        TRANSCRIPT_SCHEMA, dedup_stream, read_transcript_stream)

    base = ("the quick brown fox jumps over the lazy dog while rivers "
            "flow to the sea")
    variant = ("  The  QUICK brown fox jumps over the lazy dog while "
               "rivers flow to the sea ")  # case + whitespace "typo"
    reordered = ("rivers flow to the sea while the quick brown fox jumps "
                 "over the lazy dog")  # same token multiset
    other = "a completely different sentence about watermark semantics"
    ts = datetime.datetime(2025, 1, 1, 12, 0, 0)
    rows = [("c1", 0, "user", base, "", ts),
            ("c1", 1, "user", variant, "", ts),
            ("c1", 2, "user", reordered, "", ts),
            ("c2", 0, "user", other, "", ts),
            ("c3", 0, "user", None, "", ts),
            ("c3", 1, "user", "   ", "", ts)]  # NULL ~ whitespace-only

    # fixture sanity: the variants really are hamming-0 (they'd pass
    # trivially otherwise); batch UDF is the same code the stream runs
    sh = make_simhash_udf()
    hashes = (spark.createDataFrame(
        [(t,) for t in (base, variant, reordered)], ["text"])
        .select(sh("text").alias("h")).toPandas()["h"])
    assert len(set(hashes)) == 1

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).write.parquet(in_dir)
    stream = read_transcript_stream(spark, in_dir)
    q = (dedup_stream(stream, fingerprint="simhash").writeStream
         .format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir).toPandas()
    # one survivor for the base-variant-reordered cluster, one for other,
    # one for the NULL/whitespace-only cluster
    assert len(got) == 3
    assert len(got[got["conv_id"] == "c1"]) == 1
    assert len(got[got["conv_id"] == "c2"]) == 1

    import pytest as _pytest
    with _pytest.raises(ValueError, match="fingerprint"):
        dedup_stream(stream, fingerprint="minhash")


def test_stream_decontaminate(spark, tmp_path):
    """Streaming decontamination drops exactly the rows the batch gate
    would: benchmark-quoting rows die, paraphrases and NULLs pass, with
    no stateful operator (immediate emission) in the chain."""
    import datetime

    from sumi_agent_spark.operators.decontaminate import flag_benchmark_overlap
    from sumi_agent_spark.streaming.stream_pipeline import (
        TRANSCRIPT_SCHEMA, decontaminate_stream, read_transcript_stream)

    bench_text = ("the quick brown fox jumps over the lazy dog by the "
                  "river bank today")
    bench = spark.createDataFrame([(0, bench_text)],
                                  "bench_id long, text string")
    ts = datetime.datetime(2025, 1, 1, 12, 0, 0)
    rows = [
        ("c1", 0, "user", "as quoted: " + bench_text + " end", "", ts),
        ("c1", 1, "user", "a fast auburn fox leapt across one sleepy "
                          "canine near that stream's edge", "", ts),
        ("c2", 0, "user", None, "", ts),
        ("c2", 1, "user", bench_text[10:40] + " padded with other words "
                          "to make a full turn", "", ts),  # partial quote
    ]
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).write.parquet(in_dir)

    stream = read_transcript_stream(spark, in_dir)
    q = (decontaminate_stream(stream, bench).writeStream
         .format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir).toPandas()
    keys = set(zip(got["conv_id"], got["turn_idx"]))
    assert keys == {("c1", 1), ("c2", 0)}  # quote + partial quote dropped

    # batch-parity: same rows flagged by the batch operator
    batch = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA) \
        .withColumn("_k", __import__("pyspark").sql.functions.struct(
            "conv_id", "turn_idx"))
    flags = flag_benchmark_overlap(batch, "_k", "text", bench) \
        .toPandas()
    flagged = {(r["_k"]["conv_id"], r["_k"]["turn_idx"])
               for _, r in flags.iterrows() if r["contaminated"]}
    assert flagged == {("c1", 0), ("c2", 1)}


def test_stream_decontaminate_word_mode(spark, tmp_path):
    """Word-n-gram unit works online too (same closure-captured set)."""
    import datetime

    from sumi_agent_spark.streaming.stream_pipeline import (
        TRANSCRIPT_SCHEMA, decontaminate_stream, read_transcript_stream)

    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta")],
        "bench_id long, text string")
    ts = datetime.datetime(2025, 1, 1, 12, 0, 0)
    rows = [
        ("c1", 0, "user", "intro alpha  beta\tgamma delta\nepsilon zeta "
                          "eta theta outro", "", ts),      # ws-mangled quote
        ("c1", 1, "user", "theta eta zeta epsilon delta gamma beta alpha",
         "", ts),                                          # reordered
    ]
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).write.parquet(in_dir)
    stream = read_transcript_stream(spark, in_dir)
    q = (decontaminate_stream(stream, bench, k=8, ngrams="word")
         .writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir).toPandas()
    assert set(zip(got["conv_id"], got["turn_idx"])) == {("c1", 1)}


def test_stream_decontaminate_fuzzy(spark, tmp_path):
    """Streaming FUZZY decontamination: a lightly paraphrased quote of an
    eval row drops (the exact streaming gate keeps it), clean rows pass,
    and flag decisions equal the batch windowed-LSH operator's --
    stateless, immediate emission."""
    import datetime

    from sumi_agent_spark.operators.decontaminate import (
        flag_benchmark_near_overlap)
    from sumi_agent_spark.streaming.stream_pipeline import (
        TRANSCRIPT_SCHEMA, decontaminate_stream_fuzzy,
        read_transcript_stream)

    eval_q = ("a farmer has seventeen sheep and all but nine of them "
              "wander away through the broken fence one stormy evening "
              "so how many sheep does the farmer still have grazing")
    para = (eval_q.replace("sheep", "goats").replace("wander", "stray")
            .replace("evening", "night"))
    bench = spark.createDataFrame([(0, eval_q)],
                                  "bench_id long, text string")
    ts = datetime.datetime(2025, 1, 1, 12, 0, 0)
    rows = [
        ("c1", 0, "user", "context before the quote " + para + " and a "
                          "trailing remark", "", ts),     # fuzzy drop
        ("c1", 1, "user", "a completely unrelated turn about broadcast "
                          "joins, shuffle partitioning and adaptive "
                          "execution in columnar engines", "", ts),
        ("c2", 0, "user", None, "", ts),                  # NULL passes
    ]
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).write.parquet(in_dir)

    kw = dict(threshold=0.6, shingle_k=7, window_chars=240, stride=60)
    stream = read_transcript_stream(spark, in_dir)
    q = (decontaminate_stream_fuzzy(stream, bench, **kw).writeStream
         .format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir).toPandas()
    keys = set(zip(got["conv_id"], got["turn_idx"]))
    assert keys == {("c1", 1), ("c2", 0)}

    # batch-parity: the batch windowed-LSH operator flags the same rows
    batch = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA) \
        .withColumn("_k", __import__("pyspark").sql.functions.struct(
            "conv_id", "turn_idx"))
    rep = flag_benchmark_near_overlap(
        batch, "_k", "text", bench, "bench_id", **kw).toPandas()
    flagged = {(r["_k"]["conv_id"], r["_k"]["turn_idx"])
               for _, r in rep.iterrows()}
    assert flagged == {("c1", 0)}
