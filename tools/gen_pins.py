"""Generate pinned golden oracles for non-SQL-expressible contract queries.

Runs the pinnable ``__spark_entry__.queries()`` entries at the driver's
correctness scale (sf0.01) and freezes their results into
``tests/golden/oracle_pins.json``; ``__spark_entry__.oracle_sql()`` replays
each pin as a constant DuckDB SELECT, giving the driver gate a full
row-count + schema + value-hash check for operators whose logic cannot run
in DuckDB (LSH banding, the detection engine, Python parsers, the langid
model).

Provenance chain: detection/masking behavior is anchored byte-exactly to
the reference's own executed TS (tests/golden/reference_golden.json, 57
cases) and the pure-Python oracle is unit-pinned; these pins freeze that
verified behavior at fixture scale so ANY later drift fails the gate.

Re-run (and commit the diff) only when an operator's intended semantics
change:  python tools/gen_pins.py

Determinism requirements (asserted here): no floating-point output columns
(carry rounded values as integer ppm), no wall-clock or RNG without fixed
seeds anywhere in the pinned queries.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

PIN_QUERIES = [
    "minhash_near_dup",
    "conv_near_dup",
    "incremental_near_dup",
    "emb_incremental_near_dup",
    "simhash_near_dup",
    "winnow_stats",
    "scrub_docs",
    "asset_features",
    "flatten_json",
    "sections",
    "strip_html",
    "lang_id_detect",
    "lsh_topk",
    "ivf_topk",
]

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "oracle_pins.json")

_DUCK_TYPE = {
    "int8": "BIGINT", "int16": "BIGINT", "int32": "BIGINT", "int64": "BIGINT",
    "uint8": "BIGINT", "uint32": "BIGINT", "uint64": "BIGINT",
    "bool": "BOOLEAN", "object": "VARCHAR",
}


def main() -> None:
    import __spark_entry__ as entrymod
    from sumi_agent_spark.session import get_spark

    spark = get_spark(app_name="gen-pins", cores=8, shuffle_partitions=8)
    qs = entrymod.queries()
    pins: dict[str, dict] = {"_meta": {"sf_dir": SF_DIR}}
    for name in PIN_QUERIES:
        pdf = qs[name](spark, SF_DIR).toPandas()
        types = {}
        for col in pdf.columns:
            dt = str(pdf[col].dtype)
            assert dt in _DUCK_TYPE, (
                f"{name}.{col} has dtype {dt}: pinned queries must emit "
                f"integer/bool/string columns only (use ppm ints, not floats)")
            types[col] = _DUCK_TYPE[dt]
        rows = [[(v.item() if hasattr(v, "item") else v) for v in row]
                for row in pdf.itertuples(index=False)]
        pins[name] = {"columns": list(pdf.columns), "types": types,
                      "rows": rows}
        print(f"pinned {name}: {len(rows)} rows x {len(pdf.columns)} cols")
    spark.stop()

    with open(OUT, "w") as f:
        json.dump(pins, f, indent=1, ensure_ascii=False)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
