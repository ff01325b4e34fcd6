"""N -> 4N scaling campaign at production-regime input size.

The north rule's two-cluster-size criterion (BASELINE.json: throughput
scaling efficiency >= 0.8 from N to 4N executors) cannot use a real
cluster in this sandbox; per the protocol in BENCH.md it is evidenced as
two local[] parallelism levels on identical input.  This script runs the
drift-robust version of that measurement:

* ADJACENT pairs: each round measures local[4] then local[16] back to
  back, so both levels of a ratio share one machine-state window (the
  shared host's clock drifts ~2x hour-to-hour, measured r3);
* 4x input (SUMI_BENCH_REPL=32 -> ~4.5M turns): the ~1.9 s per-pass fixed
  cost (job scheduling, scan planning, Arrow ramp -- see BENCH.md's
  two-point model) amortizes to <3% of the local[16] pass, so the measured
  ratio reflects the marginal per-turn regime a 100 TB run lives in,
  not the fixture's fixed costs;
* reports the median of per-round ratios (robust to one-round host
  excursions) AND best-per-level (the r1/r2 estimator), plus every raw
  timing so nothing is hidden.

Run:  python tools/scale_campaign.py [rounds]   (default 5, ~25 min)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPL = int(os.environ.get("SUMI_BENCH_REPL", "32"))  # 4x the bench default
PAIR = (4, 16)
TIMED_PASSES = 2  # plus one untimed warm pass per level


# The default split sizing (maxPartitionBytes=128m + 4m open cost) hands
# the 136 MB on-disk fixture FIVE splits at local[4] vs sixteen at
# local[16]: the low level runs 2 waves with a mostly-idle second wave and
# measured "efficiency" exceeds 1.0 -- a wave-quantization artifact of the
# scan, not engine scaling (measured: r4 first campaign, median 1.49).
# Pin file-aligned splits (128 at every level, = the fixture's file count)
# so both levels run >=8 full waves and the ratio measures the engine.
_SPLIT_CONF = {"spark.sql.files.maxPartitionBytes": "2m",
               "spark.sql.files.openCostInBytes": "131072"}


def one_level(cores: int) -> tuple[float, int]:
    import bench
    from sumi_agent_spark.session import get_spark

    s = get_spark(app_name=f"scale-{cores}", cores=cores,
                  extra_conf=_SPLIT_CONF)
    try:
        bench._warm(s)
        best = float("inf")
        base = s.read.parquet(bench.ensure_big_fixture(s, REPL))
        n = base.count()
        from pyspark.sql import functions as F

        from sumi_agent_spark.plans.pipeline import scrub_transcripts
        scrubbed = scrub_transcripts(base)

        def full_pass():
            scrubbed.agg(
                F.sum(F.length("masked_text")), F.sum("n_detections"),
                F.sum(F.col("keep").cast("long")), F.sum("nll")).collect()

        full_pass()  # untimed warm
        for _ in range(TIMED_PASSES):
            t0 = time.time()
            full_pass()
            best = min(best, time.time() - t0)
        return best, n
    finally:
        s.stop()


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    lo, hi = PAIR
    per_round = []
    raw = []
    n = 0
    for r in range(rounds):
        t_lo, n = one_level(lo)
        t_hi, _ = one_level(hi)
        ratio = (t_lo / t_hi) / (hi / lo)
        per_round.append(ratio)
        raw.append({"round": r, f"t{lo}": round(t_lo, 2),
                    f"t{hi}": round(t_hi, 2), "eff": round(ratio, 3)})
        print(f"round {r}: t{lo}={t_lo:.2f}s t{hi}={t_hi:.2f}s "
              f"eff={ratio:.3f}", file=sys.stderr, flush=True)
    best_lo = min(x[f"t{lo}"] for x in raw)
    best_hi = min(x[f"t{hi}"] for x in raw)
    best_eff = (best_lo / best_hi) / (hi / lo)
    out = {
        "protocol": f"adjacent ({lo},{hi}) pairs, repl={REPL} (~{n} turns), "
                    f"best-of-{TIMED_PASSES} after 1 warm pass per level",
        "n_turns": n,
        "rounds": raw,
        "median_eff": round(statistics.median(per_round), 3),
        "best_per_level_eff": round(best_eff, 3),
        f"best_t{lo}": round(best_lo, 2),
        f"best_t{hi}": round(best_hi, 2),
        f"local{lo}_turns_per_sec": round(n / best_lo, 1),
        f"local{hi}_turns_per_sec": round(n / best_hi, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
