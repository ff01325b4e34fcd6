"""Gate funnel: per-gate drop accounting for filter-config tuning.

Before committing thresholds to ``run_pipeline`` you want to know what
each gate would do to the corpus: how many rows it rejects outright,
how many it rejects that EARLIER gates already caught (sequencing), and
how many only IT catches (unique value -- a gate with zero unique drops
is dead weight at its current threshold).  This operator computes the
whole funnel in ONE scan: every gate's keep-condition becomes a flag
column, and all counts are conditional sums in a single aggregation --
no per-gate jobs, no joins.

Per gate (in the given order) the result reports:

* ``n_in`` / ``n_out`` -- rows entering / surviving the gate when the
  gates run in sequence,
* ``n_dropped`` -- sequential drops (``n_in - n_out``),
* ``n_fail_total`` -- rows failing this gate regardless of order, and
* ``n_fail_unique`` -- rows failing ONLY this gate.

Gates must be row-local boolean Columns (True = keep) over ``df``'s
columns -- exactly what the quality operators expose
(``gopher_quality_keep_condition``, ``repetition_keep_condition`` over
a stats join, a toxicity threshold, a length floor...).  NULL gate
verdicts count as False (a gate that cannot pass a row drops it), via
an explicit ``coalesce``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def gate_funnel(df: DataFrame, gates: dict[str, Column]) -> DataFrame:
    """One result row per gate, in ``gates`` order (see module
    docstring for the columns).  Insertion order of the dict defines
    the sequential semantics.  One scan, one aggregation; the reshape
    to rows happens on the driver over ``len(gates)`` values."""
    if not gates:
        raise ValueError("gates must be a non-empty ordered dict of "
                         "name -> keep Column")
    names = list(gates)
    flags = [F.coalesce(c, F.lit(False)) for c in gates.values()]
    aggs = []
    for i in range(len(names)):
        entering = F.lit(True)
        for prev in flags[:i]:
            entering = entering & prev
        others = F.lit(True)
        for j, other in enumerate(flags):
            if j != i:
                others = others & other
        aggs += [
            F.sum(F.when(entering, 1).otherwise(0))
            .alias(f"in_{i}"),
            F.sum(F.when(entering & ~flags[i], 1).otherwise(0))
            .alias(f"drop_{i}"),
            F.sum(F.when(~flags[i], 1).otherwise(0))
            .alias(f"fail_{i}"),
            F.sum(F.when(~flags[i] & others, 1).otherwise(0))
            .alias(f"uniq_{i}"),
        ]
    wide = df.agg(*aggs).collect()[0]
    rows = []
    for i, name in enumerate(names):
        n_in = int(wide[f"in_{i}"] or 0)
        n_drop = int(wide[f"drop_{i}"] or 0)
        rows.append((i, name, n_in, n_drop, n_in - n_drop,
                     int(wide[f"fail_{i}"] or 0),
                     int(wide[f"uniq_{i}"] or 0)))
    return df.sparkSession.createDataFrame(
        rows, "gate_idx int, gate string, n_in long, n_dropped long, "
              "n_out long, n_fail_total long, n_fail_unique long")
