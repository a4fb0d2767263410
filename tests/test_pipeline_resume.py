"""Resumable pipeline + audit + streaming smoke tests."""

import json
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from s2spark.plans.session import build_session
    s = build_session(app_name="s2spark-pipe-tests", master="local[4]",
                      shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_pipeline_runs_and_resumes(spark, tmp_path):
    from jobs.spatial_pipeline import run
    work = str(tmp_path / "run")
    stats1 = run(spark, 5000, work)
    assert stats1["mined"] > 3000
    assert stats1["joined"] > 0
    assert stats1["tiles"] > 0
    assert stats1["audit_rows"] > 0

    # resume: manifest says all stages complete -> same results, and no new
    # audit rows are appended (stages are not recomputed)
    manifest = os.path.join(work, "snapshots", "MANIFEST.jsonl")
    stages = [json.loads(l)["stage"] for l in open(manifest)]
    assert stages == ["mine", "encode", "join", "tiles"]
    stats2 = run(spark, 5000, work)
    assert stats2["mined"] == stats1["mined"]
    assert stats2["joined"] == stats1["joined"]
    assert stats2["tiles"] == stats1["tiles"]
    assert stats2["audit_rows"] == stats1["audit_rows"]
    assert [json.loads(l)["stage"] for l in open(manifest)] == stages


def test_pipeline_partial_resume(spark, tmp_path):
    """Simulate a crash after stage 2: truncating the manifest makes the
    job recompute only the later stages."""
    from jobs.spatial_pipeline import run
    work = str(tmp_path / "run2")
    run(spark, 3000, work)
    manifest = os.path.join(work, "snapshots", "MANIFEST.jsonl")
    lines = open(manifest).readlines()
    with open(manifest, "w") as f:
        f.writelines(lines[:2])  # keep mine + encode only
    stats = run(spark, 3000, work)
    assert stats["joined"] > 0
    stages = [json.loads(l)["stage"] for l in open(manifest)]
    assert stages == ["mine", "encode", "join", "tiles"]


def test_torn_manifest_line_resumes(spark, tmp_path):
    """A crash mid-append leaves a torn trailing manifest line; resume must
    treat it as uncommitted (recompute that stage) instead of raising."""
    from jobs.spatial_pipeline import run
    work = str(tmp_path / "run3")
    run(spark, 3000, work)
    manifest = os.path.join(work, "snapshots", "MANIFEST.jsonl")
    lines = open(manifest).readlines()
    with open(manifest, "w") as f:
        f.writelines(lines[:3])
        f.write(lines[3][: len(lines[3]) // 2])  # torn final line
    stats = run(spark, 3000, work)
    assert stats["tiles"] > 0
    stages = []
    for l in open(manifest):
        try:
            stages.append(json.loads(l)["stage"])
        except json.JSONDecodeError:
            stages.append(None)  # the torn line stays torn; resume skips it
    assert stages[:3] == ["mine", "encode", "join"]
    assert stages[-1] == "tiles"


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState gap-sessionizer == the batch window-function
    sessionization on the same rows (latest update per user)."""
    import pandas as pd

    from s2spark.streaming.session_stream import streaming_sessionize

    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .select("user_id", F.col("ts").cast("timestamp").alias("ts"),
                  "event_id"))
    src_dir = str(tmp_path / "sess_src")
    ev.coalesce(1).write.mode("overwrite").parquet(src_dir)
    stream = (spark.readStream.schema(ev.schema).parquet(src_dir))
    out = streaming_sessionize(stream)
    q = (out.writeStream.format("memory").queryName("sess_out")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.sql("SELECT * FROM sess_out").toPandas()
           .drop_duplicates("user_id", keep="last")
           .sort_values("user_id").reset_index(drop=True))
    # batch reference: same semantics as the events_sessionization query
    batch = _batch_sessions(ev.toPandas())
    assert got["user_id"].tolist() == batch["user_id"].tolist()
    assert got["n_sessions"].tolist() == batch["n_sessions"].tolist()
    assert got["max_session_events"].tolist() == batch["max_session_events"].tolist()


def _batch_sessions(pdf):
    import pandas as pd
    rows = []
    for uid, g in pdf.groupby("user_id"):
        ts = sorted(g["ts"].astype("int64") // 1000)
        sessions = []
        cur = 0
        last = None
        for t in ts:
            if last is not None and t - last <= 1800 * 1_000_000:
                cur += 1
            else:
                if cur:
                    sessions.append(cur)
                cur = 1
            last = t
        if cur:
            sessions.append(cur)
        rows.append((uid, len(sessions), max(sessions)))
    return (pd.DataFrame(rows, columns=["user_id", "n_sessions",
                                        "max_session_events"])
            .sort_values("user_id").reset_index(drop=True))


def test_streaming_tile_counts(spark, tmp_path):
    """Drive the streaming tile aggregation on a bounded micro-batch and
    check it matches the batch tile counts for the same rows."""
    from s2spark.streaming.tile_stream import streaming_tile_counts
    from s2spark.functions import columns as C
    from s2spark.sources.pages import mine_coordinates, synthesize_pages

    # bounded "stream" via a memory-backed file source: write a small pages
    # table as json, stream-read it with the same schema
    src_dir = str(tmp_path / "stream_src")
    pages = synthesize_pages(spark, 2000).select(
        "url", "text", "lang", F.col("warc_ts"))
    pages.coalesce(1).write.mode("overwrite").parquet(src_dir)
    stream = (spark.readStream.schema(spark.read.parquet(src_dir).schema)
              .parquet(src_dir))
    agg = streaming_tile_counts(stream, level=4, window="1 hour")
    q = (agg.writeStream.format("memory").queryName("tiles_out")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.sql("SELECT tile_id, n_pages FROM tiles_out")
           .groupBy("tile_id").agg(F.sum("n_pages").alias("n_pages")).toPandas())
    # batch equivalent
    geo = mine_coordinates(pages)
    batch = (C.with_cell_id(geo, "lat", "lng")
             .groupBy(C.parent_for_level(F.col("cell_id"), 4).alias("tile_id"))
             .agg(F.count(F.lit(1)).alias("n_pages")).toPandas())
    g = got.sort_values("tile_id").reset_index(drop=True)
    b = batch.sort_values("tile_id").reset_index(drop=True)
    assert g["tile_id"].tolist() == b["tile_id"].tolist()
    assert g["n_pages"].tolist() == b["n_pages"].tolist()


def test_snapshot_time_travel_and_rollback(spark, tmp_path):
    """Iceberg-style snapshot log: ids, time travel by id/timestamp,
    append-only rollback changing what resume replays."""
    from s2spark.plans.checkpoint import SnapshotStore

    store = SnapshotStore(str(tmp_path / "snaps"))
    store.resume_or_compute(spark, "stage", lambda: spark.range(3))
    # force a second snapshot of the same stage (re-run after a change)
    v1 = store.snapshots("stage")[0]
    p2 = str(tmp_path / "v2")
    spark.range(10).write.parquet(p2)
    store.commit("stage", p2, 10, schema="struct<id:bigint>")

    snaps = store.snapshots("stage")
    assert [s["snapshot_id"] for s in snaps] == [1, 2]
    assert snaps[1]["schema"] == "struct<id:bigint>"

    # current = latest; time travel by id and by timestamp
    assert store.read_snapshot(spark, "stage").count() == 10
    assert store.read_snapshot(spark, "stage", snapshot_id=1).count() == 3
    assert store.read_snapshot(spark, "stage",
                               as_of_ts=v1["ts"]).count() == 3

    # rollback: resume now replays snapshot 1; history is preserved
    store.rollback("stage", 1)
    resumed = store.resume_or_compute(
        spark, "stage", lambda: (_ for _ in ()).throw(AssertionError))
    assert resumed.count() == 3
    assert [s["snapshot_id"] for s in store.snapshots("stage")] == [1, 2]


def test_streaming_tile_topk_matches_batch(spark, tmp_path):
    """Complete-mode streaming top-k == batch top-k over the same rows."""
    from s2spark.functions import columns as C
    from s2spark.sources.pages import mine_coordinates, synthesize_pages
    from s2spark.streaming.tile_stream import streaming_tile_topk

    src_dir = str(tmp_path / "topk_src")
    pages = synthesize_pages(spark, 2000).select(
        "url", "text", "lang", F.col("warc_ts"))
    pages.coalesce(1).write.mode("overwrite").parquet(src_dir)
    stream = (spark.readStream.schema(spark.read.parquet(src_dir).schema)
              .parquet(src_dir))
    topk = streaming_tile_topk(stream, k=5, level=4, window="1 hour")
    q = (topk.writeStream.format("memory").queryName("topk_out")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT tile_id, n_pages FROM topk_out").toPandas()

    geo = mine_coordinates(pages)
    batch = (C.with_cell_id(geo, "lat", "lng")
             .groupBy(C.parent_for_level(F.col("cell_id"), 4).alias("tile_id"))
             .agg(F.count(F.lit(1)).alias("n_pages"))
             .orderBy(F.desc("n_pages"), F.asc("tile_id")).limit(5).toPandas())
    assert got.sort_values(["n_pages", "tile_id"],
                           ascending=[False, True]).reset_index(drop=True)[
        ["tile_id", "n_pages"]].values.tolist() == \
        batch[["tile_id", "n_pages"]].values.tolist()


def test_streaming_tile_topk_append_bounded_state(spark, tmp_path):
    """Append-mode per-window top-k (bounded state): the watermark closes
    window W1 when later data arrives, W1's finalized counts are emitted
    exactly once, and the foreachBatch ranker's top-k equals the batch
    top-k over W1's rows.  W2 stays open (never emitted) — the price of
    append semantics, asserted too."""
    import glob
    import os
    import shutil

    from s2spark.functions import columns as C
    from s2spark.sources.pages import mine_coordinates, synthesize_pages
    from s2spark.streaming.tile_stream import streaming_tile_topk_append

    def rets(df, ts):
        return df.select("url", "text", "lang",
                         F.lit(ts).cast("timestamp").alias("warc_ts"))

    pages = synthesize_pages(spark, 1500).cache()
    split = F.pmod(F.xxhash64("url"), F.lit(3)) == 0   # deterministic split
    early = rets(pages.where(~split), "2026-01-01 00:10:00")
    late = rets(pages.where(split), "2026-01-02 00:00:00")

    src_dir = str(tmp_path / "append_src")
    os.makedirs(src_dir)
    for i, df in enumerate((early, late)):
        stage = str(tmp_path / f"stage_{i}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = os.path.join(src_dir, f"{i:04d}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1000 + i, 1000 + i))   # strict arrival order

    schema = spark.read.parquet(src_dir).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    counts, ranker = streaming_tile_topk_append(
        stream, k=5, level=4, window="1 hour", watermark="10 seconds")

    got = []
    q = (counts.writeStream.outputMode("append")
         .foreachBatch(lambda bdf, _id: got.extend(ranker(bdf).collect()))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    # only W1 (the early window) is closed and emitted
    wins = {(r["win"]["start"].isoformat()) for r in got}
    assert wins == {"2026-01-01T00:00:00"}
    # equals the batch top-5 over exactly the early rows
    geo = mine_coordinates(early)
    batch = (C.with_cell_id(geo, "lat", "lng")
             .groupBy(C.parent_for_level(F.col("cell_id"), 4).alias("tile_id"))
             .agg(F.count(F.lit(1)).alias("n_pages"))
             .orderBy(F.desc("n_pages"), F.asc("tile_id")).limit(5)
             .collect())
    got_sorted = sorted(got, key=lambda r: r["rank"])
    assert [(r["tile_id"], r["n_pages"]) for r in got_sorted] == \
        [(r["tile_id"], r["n_pages"]) for r in batch]


def test_interior_budget_audit_row(spark, tmp_path):
    """plans/audit.py interior_covering_metrics: one appendable audit row
    per interior covering, carrying cells-found vs max_cells and the
    budget-exhausted flag, so production operators can see when interior
    fast-accept coverage degraded."""
    import numpy as np
    from s2spark.kernel.cap import Cap
    from s2spark.kernel.coverer import RegionCoverer
    from s2spark.plans.audit import append_audit, interior_covering_metrics

    cov = RegionCoverer(max_cells=8, interior_pop_budget=2)
    with pytest.raises(ValueError):
        interior_covering_metrics(spark, cov, "too-early")
    cov.get_interior_covering(
        Cap.from_axis_angle(np.array([1.0, 0.0, 0.0]), 0.1))
    row_df = interior_covering_metrics(spark, cov, "join-coverings")
    audit_dir = str(tmp_path / "audit")
    append_audit(row_df, audit_dir)
    back = spark.read.parquet(audit_dir).collect()
    assert len(back) == 1
    r = back[0]
    assert r["stage"] == "join-coverings"
    assert r["budget_exhausted"] is True
    assert r["pops"] == 2 and r["pop_budget"] == 2
    assert 0 <= r["interior_cells"] < r["max_cells"] == 8
