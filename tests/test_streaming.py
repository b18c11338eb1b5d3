"""Streaming extract: the stream (availableNow) must produce exactly the batch
pipeline's pre-canonicalization triple multiset, and the watermarked window agg
must run over the events stream."""

import os

import pytest

from list_extractor_spark.engine.pipeline import run_pipeline, snapshots_to_dfs
from list_extractor_spark.engine.schemas import DOCUMENTS_SCHEMA
from list_extractor_spark.fixtures import corpus_to_rows, make_corpus, make_snapshots
from list_extractor_spark.streaming.stream_extract import (
    stream_documents,
    stream_triples,
    windowed_event_counts,
)


@pytest.mark.timeout(300)
def test_stream_matches_batch(spark, tmp_path):
    docs = make_corpus(18, hub_every=0)
    snaps = make_snapshots()
    docs_df = spark.createDataFrame(corpus_to_rows(docs), schema=DOCUMENTS_SCHEMA)

    in_dir = str(tmp_path / "in")
    docs_df.repartition(3).write.parquet(in_dir)

    mention_index, sameas, redirects = snapshots_to_dfs(spark, snaps)
    keys = {(r["lang"], r["surface"]) for r in mention_index.select("lang", "surface").collect()}

    out_dir = str(tmp_path / "out")
    q = stream_triples(
        stream_documents(spark, in_dir),
        mention_index,
        sameas,
        keys,
        out_dir,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(240)

    got = {
        (r["subj"], r["pred"], r["obj"], r["obj_dt"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # batch reference: same pipeline without redirects/canonicalization
    # (the streaming path covers extract+link; canonicalize is a batch post-pass)
    batch = run_pipeline(
        spark,
        docs_df,
        {**snaps, "redirects": []},
        canonicalize=False,
    )
    want = {(r["subj"], r["pred"], r["obj"], r["obj_dt"]) for r in batch.collect()}
    assert got == want


@pytest.mark.timeout(300)
def test_stream_versioned_sink_commits_snapshots_idempotently(spark, tmp_path):
    """Streaming into the versioned table: one atomic snapshot per
    micro-batch (marker in the manifest), total rows == the batch pipeline,
    replayed batches skip, and the table is rollback/time-travel capable."""
    from list_extractor_spark.engine.snapshots import (
        marker_committed,
        read_graph_at,
        snapshot_history,
        verify_table,
    )
    from list_extractor_spark.streaming.stream_extract import (
        stream_triples_versioned,
    )

    docs = make_corpus(18, hub_every=0)
    snaps = make_snapshots()
    docs_df = spark.createDataFrame(corpus_to_rows(docs), schema=DOCUMENTS_SCHEMA)
    in_dir = str(tmp_path / "in")
    docs_df.repartition(3).write.parquet(in_dir)

    mention_index, sameas, redirects = snapshots_to_dfs(spark, snaps)
    keys = {
        (r["lang"], r["surface"])
        for r in mention_index.select("lang", "surface").collect()
    }
    table = str(tmp_path / "graph")
    q = stream_triples_versioned(
        stream_documents(spark, in_dir),
        mention_index,
        sameas,
        keys,
        table,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(240)

    hist = snapshot_history(table)
    assert hist and all(
        h["operation"] == "append" and h["marker"].startswith("batch-")
        for h in hist
    )
    got = {
        (r["subj"], r["pred"], r["obj"], r["obj_dt"])
        for r in read_graph_at(spark, table).collect()
    }
    batch = run_pipeline(
        spark, docs_df, {**snaps, "redirects": []}, canonicalize=False
    )
    want = {(r["subj"], r["pred"], r["obj"], r["obj_dt"]) for r in batch.collect()}
    assert got == want
    # replay guard: the marker check refuses to double-commit a batch id
    last_marker = hist[-1]["marker"]
    assert marker_committed(table, last_marker)
    assert not marker_committed(table, "batch-999999")
    v = verify_table(table)
    assert v["missing_files"] == [] and v["bad_manifests"] == []
    # time travel to the first batch shows a strict subset (multi-batch run)
    if len(hist) > 1:
        first = read_graph_at(spark, table, snapshot_id=hist[0]["snapshot_id"])
        assert 0 < first.count() < len(want)


def test_windowed_event_counts_runs(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    in_dir = str(tmp_path / "ev")
    events.write.parquet(in_dir)
    stream = spark.readStream.schema(events.schema).parquet(in_dir)
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from winagg").collect()
    assert len(rows) > 0
    total = sum(r["n_events"] for r in rows)
    assert total == events.count()


@pytest.mark.timeout(300)
def test_stateful_streaming_dedup(spark, tmp_path):
    """applyInPandasWithState: duplicates across micro-batches must be flagged
    against state from earlier batches."""
    from list_extractor_spark.streaming.stateful import streaming_exact_dedup

    docs = make_corpus(8, hub_every=0)
    rows = corpus_to_rows(docs)
    dup = [(f"copy_of_{rows[0][0]}", rows[0][1], rows[0][2], rows[0][3])]
    in_dir = str(tmp_path / "sdocs")
    df_schema = DOCUMENTS_SCHEMA
    # batch 1 = originals, batch 2 = one exact copy (separate files => separate
    # micro-batches with maxFilesPerTrigger=1)
    spark.createDataFrame(rows, schema=df_schema).coalesce(1).write.parquet(in_dir)
    spark.createDataFrame(dup, schema=df_schema).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(df_schema).option("maxFilesPerTrigger", 1).parquet(in_dir)
    )
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    out = {r["doc_id"]: r for r in spark.sql("select * from sdedup").collect()}
    assert len(out) == len(rows) + 1
    copy = out[f"copy_of_{rows[0][0]}"]
    assert copy["kept"] is False and copy["n_seen"] >= 2
    assert sum(1 for r in out.values() if r["kept"]) == len(rows)


def test_stateful_dedup_salted_duplicate_storm(spark, tmp_path):
    """Hot-key form: one viral document repeated across batches must spread
    over `salt` state shards (bounded per-shard state, at most `salt` kept
    rows for the hash) while merge_salted_verdicts restores exact group
    totals and the deterministic representative."""
    from list_extractor_spark.streaming.stateful import (
        merge_salted_verdicts,
        streaming_exact_dedup,
    )

    viral = make_corpus(1, hub_every=0)
    (vid, vlang, vcls, vspans) = corpus_to_rows(viral)[0]
    n_copies, salt = 5000, 8
    in_dir = str(tmp_path / "storm")
    # two micro-batches (separate files), the storm split across both
    for b in range(2):
        rows = [(f"storm_{b}_{i:05d}", vlang, vcls, vspans)
                for i in range(b * n_copies // 2, (b + 1) * n_copies // 2)]
        spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        streaming_exact_dedup(stream, salt=salt)
        .writeStream.format("memory")
        .queryName("sstorm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "stormckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    out = spark.sql("select * from sstorm").collect()
    assert len(out) == n_copies  # one verdict per incoming doc
    assert len({r["text_hash"] for r in out}) == 1
    kept = [r for r in out if r["kept"]]
    firsts = {r["first_doc_id"] for r in out}
    # per-shard state is bounded: at most `salt` shard-firsts / kept rows
    assert 1 < len(kept) <= salt
    assert firsts == {r["doc_id"] for r in kept}
    # shards partition the storm: per-shard ranks sum to the total
    assert sum(max(r["n_seen"] for r in out if r["first_doc_id"] == f) for f in firsts) == n_copies
    merged = merge_salted_verdicts(spark.sql("select * from sstorm")).collect()
    assert len(merged) == 1
    assert merged[0]["n_docs"] == n_copies
    assert merged[0]["first_doc_id"] == min(firsts)


@pytest.mark.timeout(300)
def test_stateful_dedup_ttl_evicts_idle_hashes(spark, tmp_path):
    """ttl_ms arms ProcessingTimeTimeout: a hash idle past the TTL is evicted
    (its next arrival re-admits as new, n_seen restarting at 1), while a hash
    refreshed within the TTL keeps deduping.  ONE continuous processingTime
    query (availableNow never terminates under processing-time timeouts —
    Spark keeps scheduling no-data cleanup batches; see the docstring),
    driven by sink-count polling: X arrives, the query idles past the TTL
    (a no-data batch fires X's timeout), then X+Y then duplicates arrive —
    X re-admits as new, Y is still deduped.

    Orchestration note: under processing-time timeouts the engine ALSO never
    reports "no new data" (no-data cleanup batches fire every trigger), so
    ``processAllAvailable()`` blocks forever just like availableNow never
    terminates — jstack-verified: checkpoint at batch ~2000 with the driver
    parked in awaitProgressLock.  Poll the sink row count instead."""
    import time as _time

    from list_extractor_spark.streaming.stateful import streaming_exact_dedup

    rows = corpus_to_rows(make_corpus(2, hub_every=0))
    (_, xlang, xcls, xspans), (_, ylang, ycls, yspans) = rows[0], rows[1]
    in_dir, ck = str(tmp_path / "in"), str(tmp_path / "ck")

    def feed(batch_rows):
        spark.createDataFrame(batch_rows, schema=DOCUMENTS_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(in_dir)

    def await_rows(n, deadline_s=120):
        t0 = _time.time()
        while _time.time() - t0 < deadline_s:
            if spark.sql("select count(*) c from sttl").first()["c"] >= n:
                return
            _time.sleep(1)
        raise AssertionError(f"sink never reached {n} rows in {deadline_s}s")

    feed([("x1", xlang, xcls, xspans)])
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        streaming_exact_dedup(stream, ttl_ms=8_000)
        .writeStream.format("memory")
        .queryName("sttl")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        await_rows(1)  # x1 admitted, TTL armed
        _time.sleep(12)  # > TTL: a no-data batch evicts X's state
        feed([("y1", ylang, ycls, yspans)])
        await_rows(2)  # y1 admitted (fresh state); X already evicted
        feed([("x2", xlang, xcls, xspans), ("y2", ylang, ycls, yspans)])
        await_rows(4)
    finally:
        q.stop()

    out = {r["doc_id"]: r for r in spark.sql("select * from sttl").collect()}
    assert out["x1"]["kept"] is True
    assert out["y1"]["kept"] is True
    # X expired -> re-admitted as brand new state
    assert out["x2"]["kept"] is True and out["x2"]["n_seen"] == 1
    # Y set ~seconds ago (inside TTL) -> still deduped
    assert out["y2"]["kept"] is False and out["y2"]["n_seen"] == 2


@pytest.mark.timeout(300)
def test_stream_rollup_refresh_converges_with_late_data(spark, tmp_path):
    """foreachBatch rollup maintenance: three micro-batches (early days,
    later days, then LATE data for an old day) must leave the materialized
    hourly rollup exactly equal to a one-pass aggregate over all raw events,
    with each refresh rewriting only the invalidated day partitions."""
    from pyspark.sql import functions as F

    from list_extractor_spark.streaming.stream_rollup import stream_rollup_refresh
    from list_extractor_spark.tda.hypertable import daily_from_rollup

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    in_dir = str(tmp_path / "in")
    late = (F.to_date("ts") == "2024-01-05") & (F.col("event_id") % 2 == 0)
    batches = [
        events.filter((F.to_date("ts") < "2024-01-15") & ~late),
        events.filter(F.to_date("ts") >= "2024-01-15"),
        events.filter(late),  # late arrivals for an already-rolled-up day
    ]
    for b in batches:  # one file each => one micro-batch each
        b.coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    raw, rollup, ck = (str(tmp_path / d) for d in ("raw", "rollup", "ck"))
    q = stream_rollup_refresh(stream, raw, rollup, ck)
    q.awaitTermination(240)

    key = lambda r: (str(r["day"]), r["event_type"])  # noqa: E731
    got = {key(r): (r["n_events"], r["sum_value"])
           for r in daily_from_rollup(spark, rollup).collect()}
    want = {
        (str(r["d"]), r["event_type"]): (r["n"], r["s"])
        for r in events.groupBy(F.to_date("ts").alias("d"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(28,10)")), 4)
            .cast("double")
            .alias("s"),
        )
        .collect()
    }
    assert got == want and got
    # raw table carries one partition dir per micro-batch (idempotent form)
    import os

    assert sorted(d for d in os.listdir(raw) if d.startswith("batch_id=")) == [
        "batch_id=0", "batch_id=1", "batch_id=2",
    ]


def test_stream_quality_filter_equals_batch(spark, tmp_path):
    """The streaming curation filter (streaming/stream_curate.py) must emit
    exactly the batch quality_filter verdicts: the stage is a stateless
    narrow projection, so streaming it is plan reuse, not a reimplementation."""
    from list_extractor_spark.streaming.stream_curate import (
        stream_document_texts,
        stream_quality_filter,
    )
    from list_extractor_spark.tda.textstats import quality_filter

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    src = str(tmp_path / "src")
    docs.repartition(3).write.parquet(src)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = stream_quality_filter(stream_document_texts(spark, src), out, ck)
    q.awaitTermination()
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, quality_filter(docs.select("doc_id", "text")).collect()))
    assert got == want and got


def test_stream_sessionize_equals_batch_session_window(spark, tmp_path):
    """The streamed session_window rollup must equal the same session_window
    aggregation run in batch over identical events — Spark merges session
    state across micro-batches, so any divergence means the dynamic-window
    state op lost or split sessions at batch boundaries."""
    import uuid

    from pyspark.sql import functions as F

    from list_extractor_spark.streaming.stream_extract import session_event_rollup

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "src")
    events.repartition(4).write.parquet(src)  # 4 files -> 4 micro-batches
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    name = f"sw_{uuid.uuid4().hex[:8]}"
    q = (
        session_event_rollup(stream, gap="8 hours")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.table(name).collect()))
    want = sorted(map(tuple, session_event_rollup(events, gap="8 hours").collect()))
    assert got == want and len(got) > len(
        events.select("user_id").distinct().collect()
    )  # real multi-session users, not one session per user


def test_session_window_exact_gap_merges_like_batch(spark):
    """Pin the gap-boundary semantics empirically: an event EXACTLY gap
    seconds after its predecessor MERGES under session_window (the merge
    bound is inclusive — this test originally asserted a split and Spark
    proved it wrong), matching the batch operator's strictly-greater break.
    The contract fixtures contain no exact-gap events, so without this case
    the stream oracle's boundary choice is vacuously untested; a Spark
    upgrade flipping the inclusivity must fail here, not in a driver
    hash."""
    from datetime import datetime

    from list_extractor_spark.streaming.stream_extract import session_event_rollup
    from list_extractor_spark.tda.sessionize import sessionize

    events = spark.createDataFrame(
        [(1, datetime(2026, 1, 1, 0), 10), (1, datetime(2026, 1, 1, 8), 11)],
        "user_id long, ts timestamp, event_id long",
    )
    stream_form = session_event_rollup(events, gap="8 hours").collect()
    assert len(stream_form) == 1  # exact 8h gap MERGES under session_window
    assert stream_form[0]["n_events"] == 2
    batch_form = sessionize(events, gap_sec=28800).collect()
    assert len(batch_form) == 1  # strictly-greater keeps it in-session too
    assert batch_form[0]["n_events"] == 2
    # one second past the gap splits BOTH forms
    beyond = spark.createDataFrame(
        [(1, datetime(2026, 1, 1, 0), 10), (1, datetime(2026, 1, 1, 8, 0, 1), 11)],
        "user_id long, ts timestamp, event_id long",
    )
    assert len(session_event_rollup(beyond, gap="8 hours").collect()) == 2
    assert len(sessionize(beyond, gap_sec=28800).collect()) == 2


def test_stream_pq_encode_equals_batch(spark, tmp_path):
    """The streaming PQ code maintenance (streaming/stream_ann.py) must emit
    exactly the batch pq_encode codes: codebooks are a fixed driver-side
    artifact and the encode is a stateless narrow pass, so streaming it is
    plan reuse — micro-batch boundaries (maxFilesPerTrigger=2 over 4 files)
    must not change a single code."""
    from list_extractor_spark.streaming.stream_ann import (
        stream_embeddings,
        stream_pq_encode,
    )
    from list_extractor_spark.tda.similarity import pq_codebooks, pq_encode

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    books = pq_codebooks(emb, m=4, ksub=8, iters=3, sample=256)
    src = str(tmp_path / "src")
    emb.repartition(4).write.parquet(src)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = stream_pq_encode(stream_embeddings(spark, src), books, out, ck)
    q.awaitTermination()
    got = sorted(
        (r["vec_id"], list(r["codes"]))
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r["vec_id"], list(r["codes"])) for r in pq_encode(emb, books).collect()
    )
    assert got == want and got
