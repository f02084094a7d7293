"""Structured Streaming tests: windowed rollup matches the batch analog."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture()
def events_dir(tmp_path):
    """events.parquet rewritten to µs timestamps in a stream-source dir
    (the ns-timestamp workaround is a batch-reader concern; streams read
    the rewritten copy)."""
    t = pq.read_table(os.path.join(SF_SMALL, "events.parquet"))
    df = t.to_pandas()
    df["ts"] = df["ts"].astype("datetime64[us]")
    d = tmp_path / "events_stream"
    d.mkdir()
    # two files → two micro-batches with maxFilesPerTrigger=1
    half = len(df) // 2
    pq.write_table(pa.Table.from_pandas(df.iloc[:half]), str(d / "part-0.parquet"))
    pq.write_table(pa.Table.from_pandas(df.iloc[half:]), str(d / "part-1.parquet"))
    # FileStreamSource orders candidate files by MODIFICATION TIME; two
    # back-to-back writes can land in the same mtime tick, and the
    # tie order is listing-dependent — under a loaded box part-1 then
    # sometimes fed the stream FIRST, folding the later half into the
    # expanding state before the earlier half scored (flaky
    # n_prior mismatch in the full-suite run).  Pin distinct mtimes so
    # the micro-batch order equals the intended chronological order.
    now = os.stat(str(d / "part-1.parquet")).st_mtime
    os.utime(str(d / "part-0.parquet"), (now - 10, now - 10))
    yield str(d)
    shutil.rmtree(str(d), ignore_errors=True)


def test_windowed_counts_match_batch(spark, events_dir):
    from dblab_ece_trino_spark.streaming.events import (
        read_event_stream,
        run_to_memory,
        windowed_event_counts,
    )

    stream = read_event_stream(spark, events_dir)
    run_to_memory(windowed_event_counts(stream), "win_counts", complete=True)
    got = {
        (r.window_start, r.event_type): (r.n, round(r.total_value, 6))
        for r in spark.table("win_counts").collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("tv"))
        .collect()
    )
    want = {(r.w.start, r.event_type): (r.n, r.tv) for r in batch}
    assert got == want
    assert len(got) > 0


def test_sessionize_emits_after_timeout(spark, events_dir):
    from dblab_ece_trino_spark.streaming.events import (
        read_event_stream,
        sessionize,
    )

    stream = read_event_stream(spark, events_dir)
    sessions = sessionize(stream, gap_minutes=30, watermark="10 minutes")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "availableNow stream did not terminate"
    out = spark.table("sessions_out").collect()
    assert spark.table("sessions_out").columns == [
        "user_id",
        "session_start",
        "session_end",
        "n_events",
    ]
    # with a 30-min gap over a month of events per user, sessions must
    # close once the watermark advances past batch 1
    assert len(out) > 0
    for r in out:
        assert r.session_start <= r.session_end
        assert r.n_events >= 1


def test_stream_dedup_drops_duplicates(spark, events_dir):
    """Duplicated source files: the stream dedup must emit each event_id
    once (the batch dedup_exact analog with watermark-bounded state)."""
    import shutil

    from dblab_ece_trino_spark.streaming.events import (
        dedup_event_stream,
        read_event_stream,
    )

    # duplicate every file so each event arrives twice
    for f in list(os.listdir(events_dir)):
        shutil.copy(os.path.join(events_dir, f), os.path.join(events_dir, f + ".dup.parquet"))
    stream = read_event_stream(spark, events_dir)
    q = (
        dedup_event_stream(stream, keys=["event_id"])
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    out = spark.table("dedup_out").collect()
    ids = [r.event_id for r in out]
    assert len(ids) == len(set(ids)), "stream dedup emitted duplicates"
    n_unique_src = spark.read.parquet(events_dir).select("event_id").distinct().count()
    assert len(ids) == n_unique_src


def test_builtin_session_window_stream_matches_batch(spark, events_dir):
    """session_window in streaming mode (complete output) produces the
    same sessions as the batch run over the same files."""
    from dblab_ece_trino_spark.streaming.events import (
        read_event_stream,
        run_to_memory,
        session_window_counts,
    )

    stream = read_event_stream(spark, events_dir)
    run_to_memory(
        session_window_counts(stream, watermark="2 hours"),
        "sess_win",
        complete=True,
    )
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table("sess_win").collect()
    )
    want = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in session_window_counts(spark.read.parquet(events_dir)).collect()
    )
    assert got == want
    assert len(got) > 0


def test_stream_static_enrichment(spark, events_dir):
    """Stream-static broadcast join: every streamed event is enriched
    with its user's dimension attributes, matching the batch join."""
    from dblab_ece_trino_spark.entrypoints import engine_for
    from dblab_ece_trino_spark.streaming.events import (
        enrich_with_dim,
        read_event_stream,
        run_to_memory,
    )

    eng = engine_for(spark, SF_SMALL)
    dim = eng.catalogs.table("psql.tpch.customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    stream = read_event_stream(spark, events_dir)
    run_to_memory(
        enrich_with_dim(stream, dim, "user_id").select(
            "event_id", "user_id", "c_mktsegment"
        ),
        "enriched",
        complete=False,
    )
    got = spark.table("enriched")
    batch = spark.read.parquet(events_dir).join(dim, "user_id", "inner")
    assert got.count() == batch.count() > 0
    # spot-check segment correctness
    seg = dict(dim.collect())
    for r in got.limit(50).collect():
        assert seg[r.user_id] == r.c_mktsegment


def test_foreachbatch_bucketed_sink_idempotent(spark, events_dir, tmp_path):
    """The foreachBatch sink lands each epoch under epoch=<id> partitioned
    by deterministic bucket; re-running from a cleared checkpoint (replay)
    leaves the same rows — idempotent overwrite, no duplicates."""
    import shutil as _sh

    from dblab_ece_trino_spark.streaming.events import (
        read_event_stream,
        write_bucketed_sink,
    )

    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = write_bucketed_sink(read_event_stream(spark, events_dir), out, ckpt)
    q.awaitTermination(120)
    first = spark.read.option("basePath", out).parquet(out)
    n_events = spark.read.parquet(events_dir).count()
    assert first.count() == n_events
    # replay: clear the checkpoint so both epochs re-fire over the same out dir
    _sh.rmtree(ckpt)
    q2 = write_bucketed_sink(read_event_stream(spark, events_dir), out, ckpt)
    q2.awaitTermination(120)
    replay = spark.read.option("basePath", out).parquet(out)
    assert replay.count() == n_events  # overwrite-per-epoch: no duplication
    # bucket dirs carry the deterministic hash assignment
    from dblab_ece_trino_spark.functions.hashing import bucket_expr

    expected = {
        r.event_id: r.b
        for r in spark.read.parquet(events_dir)
        .select("event_id", bucket_expr(F.col("event_id"), 8).alias("b"))
        .collect()
    }
    for r in replay.select("event_id", "bucket").limit(200).collect():
        assert expected[r.event_id] == r.bucket


def test_document_ingest_matches_batch(spark, tmp_path):
    """Streaming document ingest (redact → quality gate → watermarked
    dedup) pins to the batch analog over the same files: identical
    fingerprint sets and identical per-fingerprint cleaned text."""
    from dblab_ece_trino_spark.streaming.ingest import (
        clean_document_stream,
        read_document_stream,
    )
    from dblab_ece_trino_spark.streaming.events import run_to_memory

    src = pq.read_table(os.path.join(SF_SMALL, "documents.parquet")).to_pandas()
    d = tmp_path / "docs_stream"
    d.mkdir()
    half = len(src) // 2
    pq.write_table(pa.Table.from_pandas(src.iloc[:half]), str(d / "f0.parquet"))
    pq.write_table(pa.Table.from_pandas(src.iloc[half:]), str(d / "f1.parquet"))
    # a third file duplicating file 0's texts under shifted ids — the
    # stream must collapse them against state from an EARLIER micro-batch
    dup = src.iloc[:half].copy()
    dup["doc_id"] = dup["doc_id"] + 1_000_000
    pq.write_table(pa.Table.from_pandas(dup), str(d / "f2.parquet"))

    stream = clean_document_stream(read_document_stream(spark, str(d)))
    run_to_memory(stream, "doc_ingest", complete=False)
    got = spark.table("doc_ingest").select("fingerprint", "clean_text", "quality")

    batch = clean_document_stream(spark.read.parquet(str(d))).select(
        "fingerprint", "clean_text", "quality"
    )

    g = {(r.fingerprint, r.clean_text, float(r.quality)) for r in got.collect()}
    w = {(r.fingerprint, r.clean_text, float(r.quality)) for r in batch.collect()}
    assert g == w
    # every retained fingerprint is unique in the stream output
    n = spark.table("doc_ingest").count()
    assert n == spark.table("doc_ingest").select("fingerprint").distinct().count()


def test_click_attribution_stream_matches_batch(spark, events_dir):
    """Stream-stream interval join == the same join run in batch: the
    time-ordered micro-batches plus the 1h watermark mean no legitimate
    match is ever dropped (view state is evicted only once the watermark
    is past view_ts + window, by which point every matching click has
    been seen)."""
    from dblab_ece_trino_spark.streaming.events import (
        attribute_clicks,
        read_event_stream,
        run_to_memory,
    )

    stream = read_event_stream(spark, events_dir)
    run_to_memory(attribute_clicks(stream), "click_attr", complete=False)
    got = {
        (r.view_id, r.click_id) for r in spark.table("click_attr").collect()
    }
    want = {
        (r.view_id, r.click_id)
        for r in attribute_clicks(spark.read.parquet(events_dir)).collect()
    }
    assert got == want
    assert len(got) > 0


def test_anomaly_stream_matches_expanding_batch(spark, events_dir):
    """Streaming expanding-history z-scores equal the batch expanding
    window (UNBOUNDED PRECEDING TO 1 PRECEDING) within float tolerance."""
    from dblab_ece_trino_spark.streaming.events import (
        anomaly_stream,
        read_event_stream,
        run_to_memory,
    )

    stream = read_event_stream(spark, events_dir).filter(F.col("user_id") < 10)
    run_to_memory(anomaly_stream(stream), "anom_out", complete=False)
    got = {
        r.event_id: (r.n_prior, r.zscore, r.is_anomaly)
        for r in spark.table("anom_out").collect()
    }

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    batch = (
        spark.read.parquet(events_dir)
        .filter(F.col("user_id") < 10)
        .select(
            "event_id",
            "value",
            F.count("*").over(w).alias("n_prior"),
            F.avg("value").over(w).alias("mu"),
            F.stddev_samp("value").over(w).alias("sd"),
        )
        .collect()
    )
    assert len(got) == len(batch) > 0
    for r in batch:
        n_prior, zs, flag = got[r.event_id]
        assert n_prior == r.n_prior
        if r.n_prior >= 5 and r.sd and r.sd > 0:
            want = (r.value - r.mu) / r.sd
            assert abs(zs - want) < 1e-6
            assert flag == (abs(want) > 2.5)
        else:
            assert zs is None or zs != zs  # NaN / null marker


def test_anomaly_stream_multi_chunk_groups(spark, events_dir):
    """A group delivered as several Arrow chunks (tiny
    maxRecordsPerBatch) must score identically to single-chunk delivery:
    the operator buffers and sorts the WHOLE group per micro-batch, so
    chunk boundaries / chunk order cannot leak into the expanding-window
    math (ADVICE r3 medium)."""
    from dblab_ece_trino_spark.streaming.events import (
        anomaly_stream,
        read_event_stream,
        run_to_memory,
    )

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "7")
        stream = read_event_stream(spark, events_dir).filter(
            F.col("user_id") < 6
        )
        run_to_memory(anomaly_stream(stream), "anom_chunked", complete=False)
    finally:
        spark.conf.set(key, old)
    def norm(table):
        return {
            r.event_id: (
                r.n_prior,
                None
                if r.zscore is None or r.zscore != r.zscore
                else round(r.zscore, 9),
            )
            for r in spark.table(table).collect()
        }

    got = norm("anom_chunked")
    stream2 = read_event_stream(spark, events_dir).filter(F.col("user_id") < 6)
    run_to_memory(anomaly_stream(stream2), "anom_unchunked", complete=False)
    want = norm("anom_unchunked")
    assert len(got) == len(want) > 0
    assert got == want


def test_anomaly_stream_matches_registered_batch_entry(spark, events_dir):
    """The driver-graded batch analog (ts_expanding_anomaly) computes
    the same scores as the streaming operator: same n_prior, same
    anomaly flags, z-scores equal up to the entry's round-3 rendering."""
    from dblab_ece_trino_spark.entrypoints import build_queries
    from dblab_ece_trino_spark.streaming.events import (
        anomaly_stream,
        read_event_stream,
        run_to_memory,
    )

    entry = build_queries()["ts_expanding_anomaly"](spark, SF_SMALL)
    batch = {
        r.event_id: (r.n_prior, r.zscore, r.is_anomaly)
        for r in entry.collect()
    }

    stream = read_event_stream(spark, events_dir).filter(F.col("user_id") < 40)
    run_to_memory(anomaly_stream(stream), "anom_vs_entry", complete=False)
    srows = spark.table("anom_vs_entry").collect()
    assert len(srows) == len(batch) > 0
    for r in srows:
        n_prior, z_batch, flag_batch = batch[r.event_id]
        assert n_prior == r.n_prior
        z_stream = r.zscore
        if z_batch is None:
            assert z_stream is None or z_stream != z_stream  # NaN marker
            assert flag_batch == bool(r.is_anomaly)
        else:
            assert abs(z_stream - z_batch) <= 5.01e-4  # round-3 rendering
            # The batch entry derives moments from exact DECIMAL(18,6)
            # sums while the stream keeps float64 cumsums; a z sitting
            # exactly on the 2.5-sigma boundary can legitimately flip
            # the flag between the two paths.  Compare flags only where
            # the score is bounded away from the threshold.
            if abs(abs(z_batch) - 2.5) >= 1e-3:
                assert flag_batch == bool(r.is_anomaly)


def test_trending_stream_matches_batch_entry(spark, events_dir):
    """windowed_event_counts -> rank_trending over the stream sink equals
    the driver-graded op_trending_hours batch entry."""
    from dblab_ece_trino_spark.entrypoints import build_queries
    from dblab_ece_trino_spark.streaming.events import (
        rank_trending,
        read_event_stream,
        run_to_memory,
        windowed_event_counts,
    )

    stream = read_event_stream(spark, events_dir)
    run_to_memory(windowed_event_counts(stream), "trend_counts", complete=True)
    got = {
        (r.hour, r.event_type): (r.n, r.rk)
        for r in rank_trending(spark.table("trend_counts")).collect()
    }
    want = {
        (r.hour, r.event_type): (r.n, r.rk)
        for r in build_queries()["op_trending_hours"](spark, SF_SMALL).collect()
    }
    assert len(got) == len(want) > 0
    assert got == want


def test_throttle_stream_matches_batch_entry(spark, events_dir):
    """throttle_stream's kept set equals the driver-graded op_rate_limit
    batch analog (same (user, hour) counters, same event ordering)."""
    from dblab_ece_trino_spark.entrypoints import build_queries
    from dblab_ece_trino_spark.streaming.events import (
        read_event_stream,
        run_to_memory,
        throttle_stream,
    )

    stream = read_event_stream(spark, events_dir)
    run_to_memory(throttle_stream(stream), "throttled", complete=False)
    got = {
        r.event_id: (r.user_id, r.hour_ms, r.rn)
        for r in spark.table("throttled").collect()
    }
    want = {
        r.event_id: (
            r.user_id,
            int(r.hour.timestamp() * 1000),
            r.rn,
        )
        for r in build_queries()["op_rate_limit"](spark, SF_SMALL).collect()
    }
    assert len(got) == len(want) > 0
    assert got == want


def test_cdc_merge_sink_snapshot_matches_batch_apply(spark, events_dir, tmp_path):
    """Streaming CDC ingestion resolved by read_cdc_snapshot must equal
    cdc_apply over the same change rows in batch: per-user change rows
    derived from events (event_id as the sequence; 'error' events are
    deletes), streamed availableNow through the merge-on-read log."""
    from dblab_ece_trino_spark.operators.warehouse import cdc_apply
    from dblab_ece_trino_spark.streaming.events import (
        cdc_merge_sink,
        read_cdc_snapshot,
        read_event_stream,
    )

    def to_changes(df):
        return df.select(
            F.col("user_id").alias("k"),
            F.col("event_id").alias("seq"),
            F.when(F.col("event_type") == "error", F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            F.col("value").alias("payload"),
        )

    stream = read_event_stream(spark, str(events_dir))
    q = cdc_merge_sink(
        to_changes(stream),
        str(tmp_path / "cdclog"),
        str(tmp_path / "cdcckpt"),
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in read_cdc_snapshot(
            spark, str(tmp_path / "cdclog"), ["k"]
        )
        .select("k", "seq", "op", "payload")
        .collect()
    }
    batch = spark.read.parquet(str(events_dir))
    want = {
        tuple(r)
        for r in cdc_apply(to_changes(batch), ["k"], "seq", "op")
        .select("k", "seq", "op", "payload")
        .collect()
    }
    assert got == want and len(want) > 0


def test_pattern_match_stream_matches_batch_entry(spark, events_dir):
    """The streaming FSM's final per-user (n_matches, path_len) must
    equal the driver-graded op_sequence_match histogram's underlying
    journeys — including journeys whose 'v' and 'p' land in different
    micro-batches (the fixture splits the log in two)."""
    from dblab_ece_trino_spark.operators.registry import spark_queries
    from dblab_ece_trino_spark.streaming.events import (
        pattern_match_stream,
        read_event_stream,
        run_to_memory,
    )

    stream = read_event_stream(spark, str(events_dir))
    run_to_memory(pattern_match_stream(stream), "patterns", mode="update")
    # UPDATE mode re-emits per batch: keep each user's LAST emission
    got_rows = (
        spark.table("patterns")
        .groupBy("user_id")
        .agg(
            F.max("n_matches").alias("n_matches"),
            F.max("path_len").alias("path_len"),
        )
        .collect()
    )
    # histogram it the way the graded entry does
    from collections import Counter

    hist = Counter()
    pathsum = Counter()
    for r in got_rows:
        if r.path_len > 0:
            hist[r.n_matches] += 1
            pathsum[r.n_matches] += r.path_len
    # batch truth: recompute per-user journeys in pure Python from the
    # same files (ts, event_id order), an independent reference
    import pandas as pd
    import glob

    pdf = pd.concat(
        [pd.read_parquet(p) for p in sorted(glob.glob(f"{events_dir}/*.parquet"))]
    )
    pdf = pdf[pdf.event_type.isin(["view", "click", "purchase"])]
    pdf = pdf.sort_values(["user_id", "ts", "event_id"])
    want_hist = Counter()
    want_pathsum = Counter()
    for _uid, g in pdf.groupby("user_id"):
        saw_v, n = False, 0
        for et in g["event_type"]:
            if et == "view":
                saw_v = True
            elif et == "purchase":
                if saw_v:
                    n += 1
                saw_v = False
        want_hist[n] += 1
        want_pathsum[n] += len(g)
    assert hist == want_hist and pathsum == want_pathsum


def test_hopping_counts_match_registered_batch_entry(spark, events_dir):
    """Streaming hopping windows == the registered op_hopping_window
    batch entry on the same events (complete mode drains everything),
    including the x6 overlap expansion and the exact decimal sums."""
    from dblab_ece_trino_spark.streaming.events import (
        hopping_event_counts,
        read_event_stream,
        run_to_memory,
    )

    stream = read_event_stream(spark, events_dir)
    run_to_memory(hopping_event_counts(stream), "hop_counts", complete=True)
    got = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.table("hop_counts").collect()
    }
    ev = spark.read.parquet(events_dir)
    batch = (
        ev.groupBy(F.window("ts", "6 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.expr("CAST(value AS DECIMAL(18,4))"))
            .cast("double")
            .alias("tv"),
        )
        .collect()
    )
    want = {(r.w.start, r.event_type): (r.n, r.tv) for r in batch}
    assert got == want
    assert len(got) > 0
    # every event contributes to exactly 6 windows
    assert sum(n for n, _ in got.values()) == 6 * ev.count()


def test_sessionize_batch_hand_built_sessions(spark):
    """The batch twin must split exactly at the >= gap boundary
    (exclusive-end discipline) and keep sub-gap chains together."""
    import datetime as dt

    from dblab_ece_trino_spark.streaming.events import sessionize_batch

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # user 1: chain 0,29,58 (gaps 29 < 30: one session), then a
        # boundary event at exactly +30 after 58 -> NEW session
        (1, m(0)), (1, m(29)), (1, m(58)), (1, m(88)),
        # user 2: single event
        (2, m(5)),
        # user 3: two sessions split by a 31-min gap
        (3, m(0)), (3, m(10)), (3, m(41)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize_batch(df, gap_minutes=30).collect()
    )
    want = sorted([
        (1, m(0), m(58), 3), (1, m(88), m(88), 1),
        (2, m(5), m(5), 1),
        (3, m(0), m(10), 2), (3, m(41), m(41), 1),
    ])
    assert got == want


def test_sessionize_batch_user_straddles_arrow_batches(spark):
    """A single user's events larger than the Arrow batch size (~10k
    rows) must still sessionize as one stream — the per-partition
    concat guard; without it a session would split at a batch seam."""
    import datetime as dt

    from pyspark.sql import functions as F

    from dblab_ece_trino_spark.streaming.events import sessionize_batch

    t0 = dt.datetime(2024, 1, 1)
    n = 25_000  # > 2 Arrow batches, 1-minute spacing -> ONE session
    df = spark.range(n).select(
        F.lit(7).alias("user_id"),
        (F.lit(t0) + F.make_interval(mins=F.col("id"))).alias("ts"),
    )
    out = sessionize_batch(df, gap_minutes=30).collect()
    assert len(out) == 1
    assert out[0].n_events == n
    assert out[0].session_start == t0
    assert out[0].session_end == t0 + dt.timedelta(minutes=n - 1)
