"""A/B the per-query release_session_state cost on small queries.

Round-5 observation: with bench.py releasing session state after every
timed query, tiny map-only queries (text_doc_stats, embedding_stats,
corpus_sample_stratified, text_fingerprint) measured 2-3.6x their
round-4 values while every heavy query got faster.  Hypothesis: the
release (clearCache + unpersist + System.gc()) imposes a fixed re-warm
cost on the NEXT query (heap re-expansion after G1 uncommit, re-created
broadcast exchange, freshly weak-cleared state) that is invisible to big
queries but dominates sub-second ones.

Runs each small query N times in four regimes within one session:
  warm      - no release between runs (round-4 behavior)
  release   - full release_session_state between runs (round-5 behavior)
  nogc      - clearCache+unpersist only, no System.gc()
  gconly    - System.gc() only

Prints one JSON line with per-regime median seconds per query.
Usage: python tools/release_cost_ab.py [sf_dir] [repeats]
"""
from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entry
from s2spark.plans.session import build_session, release_session_state

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 5
QUERIES = ["text_doc_stats", "embedding_stats", "corpus_sample_stratified",
           "text_fingerprint", "s2_tile_quantiles"]


def _hash_all(df):
    from pyspark.sql import functions as F
    cols = [F.col(c).cast("string") for c in df.columns]
    df.select(F.sum(F.xxhash64(*cols)).alias("h")).collect()


def regime_release(spark):
    release_session_state(spark)


def regime_nogc(spark):
    spark.catalog.clearCache()
    for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        jrdd.unpersist()


def regime_gconly(spark):
    spark.sparkContext._jvm.System.gc()


def main():
    spark = build_session("release-ab")
    qs = entry.queries()
    out = {}
    for regime, fn in [("warm", None), ("release", regime_release),
                       ("nogc", regime_nogc), ("gconly", regime_gconly)]:
        per = {}
        for q in QUERIES:
            # one untimed priming run so 'warm' starts warm
            _hash_all(qs[q](spark, SF))
            if fn:
                fn(spark)
            ts = []
            for _ in range(N):
                t0 = time.perf_counter()
                _hash_all(qs[q](spark, SF))
                ts.append(round(time.perf_counter() - t0, 3))
                if fn:
                    fn(spark)
            per[q] = {"median": round(statistics.median(ts), 3), "all": ts}
        out[regime] = per
        print(f"[{regime}] " + json.dumps(per), file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
