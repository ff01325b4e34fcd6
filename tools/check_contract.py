"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same sf dir, comparing row count,
column names, and an order-insensitive value hash (columns sorted by name,
rows sorted by their stringified tuple).  Usage:

    python tools/check_contract.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(pdf) -> str:
    import hashlib
    pdf = pdf[sorted(pdf.columns)]
    rows = sorted(
        tuple(str(v) for v in row) for row in pdf.itertuples(index=False))
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from sumi_agent_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="contract-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    # pinned oracles are constants frozen at the pin-generation scale --
    # comparing them against another sf would report spurious failures
    import json
    try:
        with open(entrymod._PINS_PATH) as f:
            pins_doc = json.load(f)
        pin_sf = pins_doc.get("_meta", {}).get("sf_dir", "/root/testdata/sf0.01")
        pinned = {k for k in pins_doc if not k.startswith("_")}
    except FileNotFoundError:
        pin_sf, pinned = sf_dir, set()
    # queries whose live twin embeds pinned values are pin-scale-bound too
    pinned |= getattr(entrymod, "PIN_DEPENDENT", set())
    skip_pins = sf_dir.rstrip("/") != pin_sf.rstrip("/")

    failures = 0
    for name, fn in qs.items():
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {e}")
            failures += 1
            continue
        if name in pinned and skip_pins:
            print(f"weak {name}: rows={len(spark_pdf)} "
                  f"(pin frozen at {pin_sf}, not checked at {sf_dir})")
            continue
        if name not in osql:
            print(f"weak {name}: rows={len(spark_pdf)} (no oracle sql)")
            continue
        try:
            duck_pdf = con.execute(osql[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            failures += 1
            continue
        ok_rows = len(spark_pdf) == len(duck_pdf)
        ok_cols = sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
        ok_hash = value_hash(spark_pdf) == value_hash(duck_pdf) if ok_cols else False
        status = "ok  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status} {name}: rows {len(spark_pdf)}/{len(duck_pdf)} "
              f"cols={'=' if ok_cols else sorted(spark_pdf.columns)!r}"
              f"{'' if ok_cols else sorted(duck_pdf.columns)} "
              f"hash={'=' if ok_hash else 'MISMATCH'}")
        if not ok_hash and ok_cols and len(spark_pdf) < 30:
            print("  spark:", spark_pdf.to_dict("records")[:5])
            print("  duck :", duck_pdf.to_dict("records")[:5])

    # smoke-check entry()
    try:
        n = entrymod.entry(spark).count()
        print(f"entry(): {n} rows, schema ok")
    except Exception as e:
        print(f"FAIL entry(): {e}")
        failures += 1
    spark.stop()
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
