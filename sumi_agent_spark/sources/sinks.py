"""Export sinks for scrubbed tables (SURVEY.md §2.1 sinks).

The reference's ``generateExport`` (RedactPro.tsx:1764-1843) strips
page/sheet markers, prefixes a BOM/markdown header, and re-infers tabular
structure from `` | ``-joined lines.  Table-scale equivalents:

* ``strip_page_markers`` -- the exact marker regex as a native projection.
* ``write_scrubbed``     -- parquet/csv/json writers over the scrubbed
  schema with the marker-strip applied to ``masked_text``.
* ``pipe_lines_to_cells`` -- the csv/xlsx fallback re-inference: split
  `` | `` rows into a cells array (per-line), with the tabular-ness test
  (>=2 pipe lines and >=30% of non-empty lines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ingest import JS_TRIM_CHARS

# RedactPro.tsx:1767 -- strip "--- Page N ---" / "--- Sheet: x ---" lines,
# then leading newlines.  (?U): the reference's JS \s is Unicode-aware
# (U+3000/NBSP padding around a marker must still strip); Java \s is
# ASCII-only without UNICODE_CHARACTER_CLASS.
PAGE_MARKER_RE = r"(?mU)^-{2,}\s*(?:Page\s+\d+|Sheet:\s*.+)\s*-{2,}\s*\n?"

_JS_TRIM_CLASS = "[" + JS_TRIM_CHARS + "]"


def _js_trim(col: Column) -> Column:
    """JS String.trim analog: Spark's F.trim strips ASCII spaces only."""
    return F.regexp_replace(
        col, f"^{_JS_TRIM_CLASS}+|{_JS_TRIM_CLASS}+$", "")


def strip_page_markers(col: Column) -> Column:
    return F.regexp_replace(F.regexp_replace(col, PAGE_MARKER_RE, ""),
                            r"^\n+", "")


def pipe_lines_to_cells(df: DataFrame, text_col: str = "masked_text") -> DataFrame:
    """Explode pipe-joined lines into cells arrays; mark tabular docs.

    Faithful to the reference's csv/xlsx fallback (RedactPro.tsx:1786-1806):
    JS-trim per line, tabular when >=2 pipe lines covering >=30% of
    non-empty lines, and -- in tabular docs -- non-pipe lines padded to the
    first row's column count with the line in column 0 (ragged-free
    output); the first row's width is 2 when the doc leads with a non-pipe
    line, exactly like the reference's aoa[0] bootstrap."""
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda l: _js_trim(l)),
        lambda l: l != "")
    pipe_lines = F.filter(lines, lambda l: l.contains(" | "))
    is_tabular = (F.size(pipe_lines) >= 2) & \
        (F.size(pipe_lines) / F.greatest(F.size(lines), F.lit(1)) >= 0.3)
    first = F.element_at(F.col("_lines"), 1)
    head_cols = F.when(first.isNotNull() & first.contains(" | "),
                       F.size(F.split(first, r" \| "))).otherwise(F.lit(2))
    pad = F.array_repeat(F.lit(""), head_cols - 1)
    return (df.withColumn("_lines", lines)
              .withColumn("is_tabular", is_tabular)
              .withColumn("line", F.explode("_lines"))
              .withColumn("cells", F.when(
                  F.col("line").contains(" | "),
                  F.transform(F.split("line", r" \| "), lambda c: _js_trim(c)))
                  .when(F.col("is_tabular"),
                        F.concat(F.array(F.col("line")), pad))
                  .otherwise(F.array(F.col("line"))))
              .drop("_lines"))


def write_scrubbed(df: DataFrame, path: str, fmt: str = "parquet",
                   mode: str = "overwrite",
                   partition_by_day: bool = False) -> None:
    """Write the scrubbed table; masked_text gets the export marker strip.

    ``partition_by_day=True`` lays out parquet hive-partitioned by
    ``ts_date`` -- the Iceberg ``days(ts)`` partition-transform analog, so
    downstream time-ranged scans prune partitions for free.  csv/json
    writers drop the raw ``text`` column (exports carry only the scrubbed
    content, matching the reference's export behavior)."""
    out = df.withColumn("masked_text", strip_page_markers(F.col("masked_text")))
    if fmt == "parquet":
        if partition_by_day:
            (out.withColumn("ts_date", F.to_date("ts"))
                .write.mode(mode).partitionBy("ts_date").parquet(path))
            return
        out.write.mode(mode).parquet(path)
    elif fmt == "csv":
        (out.drop("text")
            .withColumn("ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
            .write.mode(mode).option("header", True)
            .option("quoteAll", True)
            .option("escape", '"')  # RFC4180 quote doubling, not backslash
            .csv(path))
    elif fmt == "json":
        out.drop("text").write.mode(mode).json(path)
    else:
        raise ValueError(f"unsupported export format: {fmt}")
