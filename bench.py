"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS], plus a two-parallelism scaling run of the flagship
spatial-join+tiling pipeline (north_rule: throughput at N vs 4N cores with
scaling efficiency >= 0.8, evidenced with local[N] vs local[4N]).

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "pipeline": {...scaling numbers...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 8M pages (was 12M through round 3): each timed 2-core run is still
# ~285 s — fixed driver-side planning (~3 s) stays ~1% of the measurement,
# so the efficiency ratio is unaffected — and the full 3-pair scaling run
# PLUS the 50-query phase now fits the harness budget with margin.  At 12M
# the arithmetic never closed: ~1300 s/pair x 3 + queries > the ~1h
# harness timeout, which is exactly how round 3's artifact died (rc=124).
# Cross-round throughput comparability is by pages_per_sec, not wall sec.
PAGES_ROWS = int(os.environ.get("S2SPARK_BENCH_PAGES", "8000000"))
# N vs 4N scaling pair: 2 -> 8 by default.  This host is a shared VM with
# visible hypervisor steal: the pure-compute ceiling (sum(sin(id)), zero
# shuffle, measured in-child as `control_sec`) is ~0.84 for 2 -> 8 cores but
# only ~0.74-0.81 for 4 -> 16 — the wider pair measures the hypervisor, not
# the engine.  2 -> 8 stays under the steal knee while still exercising the
# full 4x two-cluster-size criterion; the page count amortizes the ~3 s of
# driver-side planning that a 10^12-row cluster job would amortize trivially.
SCALE_CORES = int(os.environ.get("S2SPARK_SCALE_CORES", str(min(8, CPUS))))
# Wall-clock budget for the WHOLE bench run.  Round 3's artifact was lost to
# a harness timeout (rc=124) during scaling pair 3: per-query timings were
# only emitted in the final JSON, so everything already measured vanished.
# Three defenses now: (1) every query timing and every scaling pair streams
# to stderr the moment it lands, (2) a full-result JSON checkpoint is
# printed to stderr after the query phase and after each pair, (3) this
# budget stops launching NEW scaling pairs when the next pair (estimated
# from the slowest completed one) would not finish before the budget, so
# the final stdout JSON is printed instead of being killed mid-pair.  The
# trim decision depends only on wall-clock, never on measured efficiency —
# the unbiased fixed-pair median policy is unchanged.
BUDGET_SEC = float(os.environ.get("S2SPARK_BENCH_BUDGET", "3000"))

# headline operator queries timed on the shared session
BENCH_QUERIES = [
    "s2_encode_tokens", "s2_tile_counts", "s2_tile_topk", "s2_cell_topology",
    "s2_point_in_polygon", "s2_point_in_polygon_shuffle",
    "s2_containment_ranges", "s2_rect_query", "s2_cap_query",
    "s2_rect_distance", "s2_polyline_project", "s2_buffered_join",
    "s2_corridor_join", "s2_nearest_track",
    "s2_polyline_length", "s2_polyline_interpolate", "s2_knn_join",
    "s2_boolean_pip",
    "dedup_exact", "dedup_minhash_signatures", "dedup_simhash",
    "dedup_lsh_pairs", "dedup_verified_pairs", "dedup_corpus_filter",
    "text_chunk_dedup", "s2_tile_quantiles", "multimodal_features",
    "text_quality", "text_langid", "text_fingerprint", "text_token_count",
    "similarity_bruteforce_topk", "similarity_lsh_topk",
    "similarity_ivf_topk",
    "similarity_near_dup_pairs",
    "text_entropy",
    "relational_revenue_by_nation", "events_daily_agg",
    "events_retention", "events_sessionization",
    "dedup_ngram_jaccard", "dedup_cc_clusters", "text_decontamination",
    "text_repetition", "text_domain_stats", "text_doc_stats",
    "corpus_sample_stratified", "embedding_stats",
    "stream_point_in_polygon", "s2_edge_crossing_join",
]


def _run_pipeline(spark, n_pages: int) -> int:
    """Flagship pipeline: synthesize pages -> mine -> encode -> spatial join
    -> tile counts.  Returns matched-row count (forces execution)."""
    from pyspark.sql import functions as F

    from s2spark.functions import columns as C
    from s2spark.operators.spatial_join import points_with_cells, spatial_join
    from s2spark.sources.fixtures import make_polygon
    from s2spark.sources.pages import mine_coordinates, synthesize_pages

    pages = synthesize_pages(spark, n_pages)
    # explicit early projection: the 30-deep encode projection stack exceeds
    # what the optimizer's column pruning reaches through, so without this
    # the unused html/warc_ts expressions (binary encode, ~40% of synthesis
    # cost) are computed and discarded
    pts = points_with_cells(mine_coordinates(pages.select("url", "text")))
    joined = spatial_join(
        spark, pts.select("url", "lat", "lng", "cell_id", "x", "y", "z"),
        {1: make_polygon("-4:-4, -4:4, 4:4, 4:-4;"),
         2: make_polygon("48.5:2.0, 48.5:2.7, 49.2:2.7, 49.2:2.0;"),
         3: make_polygon("-40:-40, -40:40, 40:40, 40:-40;")})
    tiles = (joined.withColumn("tile_id", C.parent_for_level(F.col("cell_id"), 10))
             .groupBy("polygon_id", "tile_id").agg(F.count(F.lit(1)).alias("n")))
    return tiles.agg(F.sum("n")).collect()[0][0]


_CHILD_SCRIPT = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from s2spark.plans.session import build_session
import bench
cores = int(sys.argv[1]); n_pages = int(sys.argv[2])
spark = build_session(app_name=f"bench-{{cores}}", master=f"local[{{cores}}]",
                      shuffle_partitions=2 * cores)
spark.sparkContext.setLogLevel("ERROR")
bench._run_pipeline(spark, 50_000)   # warm-up: JIT + Arrow + broadcasts
bench._run_pipeline(spark, 50_000)   # second warm-up: plan-path JIT settles
best = None; matched = 0
# best-of-2 timed runs: guards single steal spikes inside a pair, while
# the MEDIAN across unconditional pairs (bench._scaling_run) absorbs
# pair-level noise — best-of-3 here pushed a 3-pair run past 80 minutes
for _ in range({repeats}):
    t0 = time.time()
    matched = bench._run_pipeline(spark, n_pages)
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
# pure-compute control: measures what the host can actually scale
ctl = spark.range(0, 500_000_000, 1, 4 * cores)
ctl.limit(10).select(F.sum(F.sin(F.col("id").cast("double")))).collect()
t0 = time.time()
ctl.select(F.sum(F.sin(F.col("id").cast("double")))).collect()
ctl_sec = time.time() - t0
print(json.dumps({{"sec": best, "matched": int(matched), "control_sec": ctl_sec}}))
spark.stop()
"""


def _scaling_pair(n_pages: int) -> dict:
    """One N-vs-4N measurement: each size runs in its OWN subprocess pinned
    (taskset) to exactly that many CPUs — otherwise the small run borrows
    idle cores for GC/JIT/IO threads and the measured efficiency
    understates real cluster scaling (the two-cluster-size evidence
    required by the north rule)."""
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    script = _CHILD_SCRIPT.format(
        repo=repo,
        repeats=int(os.environ.get("S2SPARK_CHILD_REPEATS", "2")))
    out = {}
    big = SCALE_CORES
    small = max(1, big // 4)
    for label, cores in (("n_cores", small), ("n4_cores", big)):
        cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c",
               script, str(cores), str(n_pages)]
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
        r = json.loads(line)
        out[label] = {"cores": cores, "sec": round(r["sec"], 3),
                      "pages_per_sec": round(n_pages / r["sec"], 1),
                      "matched_rows": r["matched"],
                      "control_sec": round(r["control_sec"], 3)}
    tp_small = out["n_cores"]["pages_per_sec"]
    tp_big = out["n4_cores"]["pages_per_sec"]
    ratio = big / small
    out["scaling_efficiency"] = round(tp_big / (tp_small * ratio), 3)
    # normalize by what a zero-shuffle embarrassingly-parallel job achieves
    # on this host at the same two sizes (hypervisor steal ceiling)
    ctl_speedup = out["n_cores"]["control_sec"] / out["n4_cores"]["control_sec"]
    out["control_efficiency"] = round(ctl_speedup / ratio, 3)
    out["efficiency_vs_control"] = round(
        out["scaling_efficiency"] / out["control_efficiency"], 3) \
        if out["control_efficiency"] > 0 else None
    out["pages"] = n_pages
    return out


def _median_of(pairs: list[dict], n_pairs: int, skipped: int) -> dict:
    ordered = sorted(pairs, key=lambda p: p["scaling_efficiency"])
    median = dict(ordered[(len(ordered) - 1) // 2])
    median["attempts"] = [{"scaling_efficiency": p["scaling_efficiency"],
                           "control_efficiency": p["control_efficiency"]}
                          for p in pairs]
    median["policy"] = "median of %d unconditional pairs" % n_pairs
    if skipped:
        median["pairs_skipped_due_to_budget"] = skipped
    return median


def _scaling_run(n_pages: int, n_pairs: int | None = None,
                 deadline: float | None = None,
                 checkpoint_cb=None) -> dict:
    """A FIXED number of scaling pairs (default 3, S2SPARK_SCALE_PAIRS to
    override), reporting the MEDIAN pair by raw scaling efficiency.  This
    host is a shared VM with intermittent hypervisor steal: single pairs
    measure anywhere from ~0.75 to ~0.94 raw while the in-pair
    pure-compute CONTROL moves with them (the host itself stops scaling,
    not the engine).  Earlier rounds retried only sub-0.8 pairs and took
    the best — that conditions the headline on the acceptance threshold
    and upward-biases it exactly at the pass/fail boundary, so now every
    pair runs unconditionally and the median is the headline, with every
    attempt's (raw, control) kept in `attempts`.

    `deadline` (epoch sec): a new pair is only launched if the slowest
    completed pair would fit again (x1.15 margin) before the deadline —
    the first pair always runs.  Skipping is recorded in the result and
    depends only on wall-clock, never on the measured efficiencies, so
    it cannot bias the median toward the pass threshold."""
    if n_pairs is None:
        n_pairs = int(os.environ.get("S2SPARK_SCALE_PAIRS", "3"))
    pairs = []
    skipped = 0
    worst_pair_sec = 0.0
    for i in range(n_pairs):
        if pairs and deadline is not None:
            remaining = deadline - time.time()
            if remaining < 1.15 * worst_pair_sec:
                skipped = n_pairs - i
                print(f"[scaling] budget: skipping {skipped} remaining "
                      f"pair(s) ({remaining:.0f}s left < 1.15 x "
                      f"{worst_pair_sec:.0f}s slowest pair)",
                      file=sys.stderr, flush=True)
                break
        t0 = time.time()
        p = _scaling_pair(n_pages)
        worst_pair_sec = max(worst_pair_sec, time.time() - t0)
        # stream each pair to stderr the moment it lands: a harness
        # timeout mid-run must not erase already-measured evidence
        # (stdout stays reserved for the single final JSON line)
        print(f"[scaling pair {i + 1}/{n_pairs}] " + json.dumps(p),
              file=sys.stderr, flush=True)
        pairs.append(p)
        if checkpoint_cb is not None:
            checkpoint_cb(_median_of(pairs, n_pairs, 0))
    return _median_of(pairs, n_pairs, skipped)


def main() -> None:
    from s2spark.plans.session import build_session
    import __spark_entry__ as entry

    t_start = time.time()
    deadline = t_start + BUDGET_SEC
    qs = entry.queries()
    timings = {}
    spark = build_session(master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    # warm up the session (JVM JIT, Arrow init) on a tiny query
    qs["s2_tile_counts"](spark, SF_DIR).collect()
    from pyspark.sql import functions as F
    errors = {}
    for i, name in enumerate(BENCH_QUERIES):
        t0 = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            # force EVERY output column to materialize: a bare count() lets
            # Catalyst prune projection-only plans down to a scan row-count,
            # which silently under-times map-only queries (encode,
            # signatures, interpolate).  xxhash64 over all columns defeats
            # pruning at the cost of one hash per row.
            df.agg(F.sum(F.xxhash64(*[F.col(c) for c in df.columns])
                         .cast("long"))).collect()
            timings[name] = round(time.time() - t0, 3)
            # stream each timing the moment it lands (see BUDGET_SEC note)
            print(f"[query {i + 1}/{len(BENCH_QUERIES)}] "
                  f"{name}: {timings[name]}s", file=sys.stderr, flush=True)
        except Exception as exc:   # noqa: BLE001 — one bad query must not
            errors[name] = str(exc).splitlines()[0][:200]  # kill the round's bench
            print(f"[query {i + 1}/{len(BENCH_QUERIES)}] {name}: "
                  f"ERROR {errors[name]}", file=sys.stderr, flush=True)
    spark.stop()

    result = {
        "metric": "s2 spatial-join + tiling throughput and operator latencies",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "pipeline": None,
    }
    if errors:
        result["query_errors"] = errors

    def checkpoint(pipeline: dict | None) -> None:
        # full-result JSON on stderr after every completed phase: if the
        # harness kills the process anyway, the artifact's raw output
        # still carries everything measured so far in parseable form
        snap = dict(result)
        snap["pipeline"] = pipeline
        print("BENCH-CHECKPOINT " + json.dumps(snap),
              file=sys.stderr, flush=True)

    checkpoint(None)
    result["pipeline"] = _scaling_run(PAGES_ROWS, deadline=deadline,
                                      checkpoint_cb=checkpoint)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
