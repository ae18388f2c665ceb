"""Structured Streaming micro-batch tests: the streaming pipelines must
produce the same finalized windows as their batch twins (modulo windows
still open past the watermark, which append mode holds back)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from mysqldump_to_parquet_spark.streaming.stream import (
    dedup_stream,
    read_event_stream,
    run_tumbling_to_memory,
    start_parquet_sink,
    tumbling_counts_stream,
)
from mysqldump_to_parquet_spark.streaming.windows import stream_tumbling

SF = "/root/testdata/sf0.001"


def _events_dir(tmp_path):
    d = tmp_path / "events_in"
    d.mkdir()
    shutil.copy(f"{SF}/events.parquet", d / "part-000.parquet")
    return str(d)


def test_streaming_tumbling_matches_batch(spark, tmp_path):
    out = run_tumbling_to_memory(spark, _events_dir(tmp_path), "t_mem1")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in out.collect()
    }
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in stream_tumbling(spark, SF).collect()
    }
    # append mode emits only windows finalized by the watermark; everything
    # emitted must agree exactly with the batch twin, and nearly all windows
    # (all but the trailing watermark allowance) must have been emitted.
    assert got, "no windows emitted"
    for k, v in got.items():
        assert batch[k][0] == v[0]
        assert abs(batch[k][1] - v[1]) < 1e-6
    assert len(got) >= len(batch) - 10


def test_streaming_sliding_matches_batch(spark, tmp_path):
    """True-streaming sliding windows (watermark + append mode) must agree
    exactly with the batch twin q_stream_sliding on every window the
    watermark finalized (VERDICT r4 item 8)."""
    from mysqldump_to_parquet_spark.streaming.stream import (
        read_event_stream,
        sliding_counts_stream,
    )
    from mysqldump_to_parquet_spark.streaming.windows import stream_sliding

    events = read_event_stream(spark, _events_dir(tmp_path))
    q = (
        sliding_counts_stream(events)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sliding")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.window_start: r.n_events for r in spark.table("t_sliding").collect()
    }
    batch = {
        r.window_start: r.n_events
        for r in stream_sliding(spark, SF).collect()
    }
    assert got, "no windows emitted"
    for k, v in got.items():
        assert batch[k] == v, (k, v, batch.get(k))
    # all but the trailing watermark allowance must have been emitted
    # (4 overlapping 15-min slides per hour -> allow the last few slides)
    assert len(got) >= len(batch) - 10


def test_streaming_dedup_bounded_state(spark, tmp_path):
    events = read_event_stream(spark, _events_dir(tmp_path))
    q = (
        dedup_stream(events)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.table("t_dedup")
    pairs = out.select("user_id", "event_type").collect()
    assert len(pairs) == len(set((r.user_id, r.event_type) for r in pairs))
    assert len(pairs) >= 1


def test_foreachbatch_parquet_sink(spark, tmp_path):
    events = read_event_stream(spark, _events_dir(tmp_path))
    agg = tumbling_counts_stream(events)
    q = start_parquet_sink(
        agg, str(tmp_path / "out"), str(tmp_path / "ckpt"), "t_sink"
    )
    q.processAllAvailable()
    q.stop()
    written = spark.read.parquet(str(tmp_path / "out"))
    assert written.count() > 0
    assert written.where(F.col("n_events") <= 0).count() == 0


def test_stateful_running_stats(spark, tmp_path):
    from mysqldump_to_parquet_spark.streaming.stateful import user_running_stats

    events = read_event_stream(spark, _events_dir(tmp_path))
    q = (
        user_running_stats(events)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_state")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.table("t_state")
    # last update per user must equal the batch totals
    latest = {
        r.user_id: (r.n_events, r.total_value)
        for r in out.orderBy("n_events").collect()  # later updates overwrite
    }
    batch = {
        r.user_id: (r.n, r.total)
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(latest) == set(batch)
    for uid, (n, total) in batch.items():
        assert latest[uid][0] == n
        assert abs(latest[uid][1] - total) < 1e-6


def test_streaming_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream attribution join (purchases ⋈ preceding views within
    6 h per user) must emit exactly the batch join's row set — the
    interval bounds + watermarks make the stream version's state finite,
    not its answer different."""
    from mysqldump_to_parquet_spark.streaming.stream import (
        interval_join_stream,
        run_interval_join_to_memory,
        split_views_purchases,
    )

    out = run_interval_join_to_memory(spark, _events_dir(tmp_path), "ij_mem1")
    got = {(r.user_id, r.view_id, r.purchase_id) for r in out.collect()}

    from mysqldump_to_parquet_spark.catalog import load_table

    ev = load_table(spark, SF, "events")
    bviews, bpurch = split_views_purchases(ev)
    batch = {
        (r.user_id, r.view_id, r.purchase_id)
        for r in bviews.join(
            bpurch,
            (bviews.v_user == bpurch.p_user)
            & (bpurch.purchase_ts >= bviews.view_ts)
            & (
                bpurch.purchase_ts
                <= bviews.view_ts + F.expr("INTERVAL 6 HOURS")
            ),
        )
        .selectExpr("v_user AS user_id", "view_id", "purchase_id")
        .collect()
    }
    assert batch, "no attributed pairs in fixture"
    assert got == batch


def test_transform_with_state_profile(spark, tmp_path):
    """Spark 4 transformWithState processor (ValueState + MapState): the
    last update per user must equal the batch count/sum/countDistinct.

    The TWS python↔state-server protocol needs a protobuf runtime; this
    container has no wheel, so conftest activates the vendored pure-
    Python wire-format shim (mysqldump_to_parquet_spark/_vendor/
    protoshim — real protobuf always wins when installed).  The r8–r10
    skip is gone: this now exercises the REAL cluster wiring — RocksDB
    state store, the JVM state server, ValueState/MapState round-trips
    over the socket protocol (VERDICT r10 #7)."""
    pytest.importorskip("google.protobuf")  # shim or real — either works
    from mysqldump_to_parquet_spark.streaming.stateful import user_profile_tws

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    events = read_event_stream(spark, _events_dir(tmp_path))
    q = (
        user_profile_tws(events)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_tws")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    latest = {
        r.user_id: (r.n_events, r.total_value, r.n_types)
        for r in spark.table("t_tws").orderBy("n_events").collect()
    }
    batch = {
        r.user_id: (r.n, r.total, r.nt)
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.countDistinct("event_type").alias("nt"),
        )
        .collect()
    }
    assert set(latest) == set(batch)
    for uid, (n, total, nt) in batch.items():
        assert latest[uid][0] == n
        assert abs(latest[uid][1] - total) < 1e-6
        assert latest[uid][2] == nt


class _FakeValueState:
    """In-memory stand-in for the TWS ValueState handle (same surface:
    exists/get/update) — lets the processor run to completion where the
    protobuf-based python<->state-server protocol is unavailable."""

    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


class _FakeMapState:
    """In-memory stand-in for the TWS MapState handle (containsKey /
    getValue / updateValue / keys, all tuple-keyed like the real API)."""

    def __init__(self):
        self._m = {}

    def containsKey(self, k):
        return tuple(k) in self._m

    def getValue(self, k):
        return self._m[tuple(k)]

    def updateValue(self, k, v):
        self._m[tuple(k)] = tuple(v)

    def keys(self):
        return iter(self._m.keys())


class _FakeHandle:
    """StatefulProcessorHandle fake: per-(state-name) stores, fresh per
    grouping key — mirrors the real per-key state scoping."""

    def __init__(self):
        self._values = {}
        self._maps = {}

    def getValueState(self, name, schema, ttl_duration_ms=None):
        return self._values.setdefault(name, _FakeValueState())

    def getMapState(self, name, key_schema, value_schema, ttl_duration_ms=None):
        return self._maps.setdefault(name, _FakeMapState())


def test_transform_with_state_processor_driven_to_completion(spark):
    """Drive UserProfileProcessor end-to-end over real fixture data with
    an in-memory state handle (VERDICT r8 thin-spot #5: the protobuf
    runtime the real TWS state server needs is absent from this
    container, so the processor logic itself — state evolution across
    micro-batches, MapState per-type counts, emitted row shape — is
    exercised here directly; the cluster wiring keeps the
    protobuf-gated test below).

    Three micro-batches per user, state carried between them; the LAST
    emitted row per user must equal the batch count/sum/countDistinct
    over all events."""
    import pandas as pd

    from mysqldump_to_parquet_spark.streaming.stateful import (
        UserProfileProcessor,
    )

    events = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_type", "value")
        .toPandas()
    )
    expected = events.groupby("user_id").agg(
        n=("value", "size"),
        total=("value", "sum"),
        nt=("event_type", "nunique"),
    )

    last_emit = {}
    for uid, pdf in events.groupby("user_id"):
        proc = UserProfileProcessor()
        proc.init(_FakeHandle())  # per-key state, like the real store
        # split this user's rows into 3 micro-batches (uneven on purpose)
        n = len(pdf)
        cuts = [0, max(1, n // 3), max(2, (2 * n) // 3), n]
        for i in range(3):
            chunk = pdf.iloc[cuts[i]:cuts[i + 1]]
            for out in proc.handleInputRows((uid,), iter([chunk]), None):
                last_emit[uid] = out.iloc[0]
        proc.close()

    assert set(last_emit) == set(expected.index)
    for uid, row in expected.iterrows():
        got = last_emit[uid]
        assert got["n_events"] == row["n"]
        assert abs(got["total_value"] - row["total"]) < 1e-6
        assert got["n_types"] == row["nt"]
        assert got["user_id"] == uid


def test_transform_with_state_plan_builds(spark, tmp_path):
    """Protobuf-free slice of the TWS surface: the processor attaches and
    the unresolved streaming plan carries the declared output schema."""
    from mysqldump_to_parquet_spark.streaming.stateful import user_profile_tws

    df = user_profile_tws(read_event_stream(spark, _events_dir(tmp_path)))
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "user_id", "n_events", "total_value", "n_types",
    ]


def test_protobuf_shim_wire_format():
    """The vendored protobuf shim (activated by conftest when no real
    wheel exists) must speak spec-exact proto3 wire format: known-byte
    encodings, nested/oneof presence semantics (an ACCESSED-but-unmutated
    submessage must not serialize; an empty oneof member must), negative
    int64 as 10-byte two's-complement varints, repeated message fields,
    and unknown-field skipping."""
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    # known bytes: StateRequest.statefulProcessorCall(field 2, LEN)
    #   -> SetHandleState(field 1, LEN) -> state(field 1, varint)=2
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    assert req.SerializeToString() == bytes.fromhex("12040a020802")

    # proto3 implicit presence: default scalars vanish, empty message = b""
    assert sm.StateCallCommand().SerializeToString() == b""
    assert sm.SetHandleState(state=sm.PRE_INIT).SerializeToString() == b""

    # accessed-but-unmutated submessage must NOT gain presence...
    cmd = sm.StateCallCommand()
    cmd.stateName = "s"
    _ = cmd.ttl
    assert b"\x22" not in cmd.SerializeToString()  # no field-4 tag
    # ...but a mutated one must (and must round-trip)
    cmd.ttl.durationMs = 86_400_000
    rt = sm.StateCallCommand()
    rt.ParseFromString(cmd.SerializeToString())
    assert rt.ttl.durationMs == 86_400_000 and rt.stateName == "s"

    # an EMPTY oneof member still serializes (explicit presence)
    r = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            removeImplicitKey=sm.RemoveImplicitKey()
        )
    )
    assert r.SerializeToString() == bytes.fromhex("22021200")

    # negative int64: 10-byte varint
    d = sm.DeleteTimer(expiryTimestampMs=-5)
    enc = d.SerializeToString()
    assert enc == b"\x08" + b"\xfb" + b"\xff" * 8 + b"\x01"
    d2 = sm.DeleteTimer()
    d2.ParseFromString(enc)
    assert d2.expiryTimestampMs == -5

    # WhichOneof is scoped to the NAMED oneof (review r11: it used to
    # return any oneof's set member) and rejects unknown oneof names
    assert req.WhichOneof("method") == "statefulProcessorCall"
    assert sm.StateRequest().WhichOneof("method") is None
    with pytest.raises(ValueError, match="no oneof"):
        req.WhichOneof("nope")

    # repeated message + bool + unknown-field skip
    t = sm.StateResponseWithTimer()
    t.ParseFromString(
        bytes.fromhex("0802")  # statusCode=2
        + bytes.fromhex("1a02107b")  # timer { timestampMs: 123 }
        + bytes.fromhex("2001")  # requireNextFetch=true
        + bytes.fromhex("f00101")  # unknown field 30 (varint) — skipped
    )
    assert t.statusCode == 2
    assert [x.timestampMs for x in t.timer] == [123]
    assert t.requireNextFetch is True

    # appending to a repeated field of a LAZILY-VIVIFIED submessage must
    # give the child presence in the parent (ADVICE r11: the shim's
    # plain-list repeated container skipped _mark_mutated, so
    # `call.appendList.value.append(x)` — the real list-state client
    # shape — silently dropped from SerializeToString)...
    call = sm.ListStateCall()
    call.appendList.value.append(b"\x01\x02")
    rt2 = sm.ListStateCall()
    rt2.ParseFromString(call.SerializeToString())
    assert list(rt2.appendList.value) == [b"\x01\x02"]
    # ...while a merely-READ repeated field still creates no presence
    probe = sm.ListStateCall()
    assert len(probe.listStatePut.value) == 0
    assert probe.SerializeToString() == b""

    # the presence-marking container must survive pickle like the plain
    # list it replaced (ADVICE r12: unpickle append()s saved items
    # BEFORE restoring the _owner slot, so the mutator used to raise
    # AttributeError mid-loads) — and a post-unpickle mutation must
    # still mark presence through the restored owner
    import pickle

    rep = call.appendList.value
    clone = pickle.loads(pickle.dumps(rep))
    assert list(clone) == [b"\x01\x02"]
    msg2 = pickle.loads(pickle.dumps(call))
    assert msg2.SerializeToString() == call.SerializeToString()


def test_streaming_available_now_backfill(spark, tmp_path):
    """Trigger.AvailableNow: the production backfill pattern — drain the
    entire existing backlog in rate-limited micro-batches, then STOP (no
    perpetual query to babysit).  The drained aggregate must equal the
    batch aggregate over the same files, and the query must terminate on
    its own."""
    events = read_event_stream(spark, _events_dir(tmp_path))
    agg = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_avnow")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "AvailableNow query did not self-stop"
    got = {r.event_type: (r.n, r.total) for r in spark.table("t_avnow").collect()}
    batch = {
        r.event_type: (r.n, r.total)
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(got) == set(batch)
    for k, (n, total) in batch.items():
        assert got[k][0] == n
        assert abs(got[k][1] - total) < 1e-6


def test_stream_session_soak_matches_batch(spark, tmp_path):
    """Soak pin for the stateful sessionize stream (VERDICT r12 #7):
    burst-per-session fixture drained one file per micro-batch through
    session_counts_stream — emitted sessions must equal the batch twin
    EXACTLY (the sentinel flush event advances the final watermark past
    every real session, so this is full equality, not
    modulo-trailing-allowance), and session state must stay bounded
    (rows evict as the watermark sweeps — peak well under the total
    session count, end-state ~the sentinel's open session).  The 10k-
    event measured row lives in SCALING.md (tools/stream_soak.py)."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "stream_soak",
        pathlib.Path(__file__).resolve().parents[1]
        / "tools"
        / "stream_soak.py",
    )
    soak = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(soak)

    fixture = str(tmp_path / "soak_events")
    soak.gen_soak_fixture(fixture, 300, 5)
    rec = soak.run_soak(spark, fixture, "t_soak_sessions")
    assert rec["stream_equals_batch"], rec
    assert rec["sessions_emitted"] == rec["sessions_batch"] == 30
    assert rec["micro_batches"] >= 5  # one per file + flush batches
    # bounded state: sessions evict as the watermark passes; the peak
    # must sit far below the 30 total sessions and the end state holds
    # only the sentinel's never-finalized session
    assert rec["state_rows_peak"] <= 10, rec
    assert rec["state_rows_end"] <= 2, rec

    # the dedup stream on the same fixture (the r12 #7 task names
    # sessionize AND dedup): every distinct key covered, no key
    # re-emitted within the watermark allowance (the operator's actual
    # contract — a key recurring after eviction legitimately
    # re-emits), state bounded and drained at end
    drec = soak.run_soak_dedup(spark, fixture, "t_soak_dedup")
    assert drec["covers_all_keys"], drec
    assert drec["no_repeat_within_watermark"], drec
    assert drec["emitted_rows"] >= drec["distinct_keys"]
    assert drec["state_rows_peak"] <= 60, drec
    assert drec["state_rows_end"] <= 2, drec

    # the transformWithState profile on the same fixture (VERDICT r13
    # #4 — the one stateful surface without a soak row): last update
    # per user ≡ the batch count/sum/countDistinct profile exactly;
    # state rows count every PRIMITIVE row, not users: per user one
    # ValueState row + one MapState row per seen event_type, and
    # profiles never evict in timeMode=none — so the bound is
    # users×(1 + n_types) + sentinel's 2, the documented sizing
    # contract (measured exactly 127 on this fixture), not a leak
    pytest.importorskip("google.protobuf")  # vendored shim or real
    trec = soak.run_soak_tws(spark, fixture, "t_soak_tws")
    assert trec["stream_equals_batch"], trec
    assert trec["users_profiled"] == 25, trec
    assert trec["micro_batches"] >= 5
    assert trec["state_rows_peak"] is not None
    n_types = len(soak.EVENT_TYPES)
    assert trec["state_rows_peak"] <= 25 * (1 + n_types) + 2, trec


def test_admission_gate_stream_equals_batch(spark, tmp_path):
    """Streaming dedup-against-index gate (r14): micro-batches of
    incoming documents gated against the written IVF index via
    foreachBatch must produce, per query, EXACTLY the batch gate's
    (nearest_id, cosine, is_dup) at the gate's own semantics
    (exclude_self=False, external qid space) — per-query routing is
    independent of batch composition, so stream ≡ batch with no
    allowance.  Plus the two r14-review pins: (a) an arriving document
    whose vector IS an indexed one flags is_dup at cosine 1.0 — the
    collision the batch default would silently drop; (b) a retried
    epoch overwrites its own batch_id partition instead of appending a
    second copy (the exactly-once contract)."""
    from mysqldump_to_parquet_spark.llm import similarity as S
    from mysqldump_to_parquet_spark.streaming.stream import (
        _gate_epoch,
        admission_gate_stream,
        read_query_stream,
    )

    sf = SF
    # 3 arrival files × 10 queries: the fixture vectors under EXTERNAL
    # qids (shifted), the gate's real arrival shape
    shift = 10_000_000_000
    qdir = str(tmp_path / "queries")
    all_q = S._knn_join_queries(spark, sf).collect()
    for i in range(3):
        chunk = all_q[10 * i : 10 * (i + 1)]
        spark.createDataFrame(
            [(r.qid + shift, r.qv) for r in chunk],
            "qid long, qv array<double>",
        ).coalesce(1).write.mode("append").parquet(qdir)

    out = str(tmp_path / "admitted")
    q = admission_gate_stream(
        spark,
        sf,
        read_query_stream(spark, qdir),
        out_dir=out,
        checkpoint_dir=str(tmp_path / "ckpt"),
        query_name="t_admission",
    )
    q.processAllAvailable()
    q.stop()

    got = {
        r.qid: (r.nearest_id, r.cosine, r.is_dup)
        for r in spark.read.parquet(out).collect()
    }
    qdf = spark.read.parquet(qdir)
    top1 = S.ivf_knn_join(spark, sf, qdf, k=1, exclude_self=False)
    batch = {
        r.qid: (
            r.vec_id,
            r.cosine,
            bool(r.cosine >= S.DEDUP_INDEX_TAU),
        )
        for r in top1.collect()
    }
    assert len(got) == spark.read.parquet(out).count() == 30
    assert got == batch
    # (a) every arriving vector IS indexed (it's a corpus slice), so
    # with self-matching allowed the gate must flag all 30 at 1.0
    assert all(v[1] == 1.0 and v[2] for v in got.values()), got

    # (b) retry idempotence: re-running an epoch's write must leave
    # ONE copy (per-epoch overwrite), not append a duplicate
    replay = spark.createDataFrame(
        [(r.qid + shift, r.qv) for r in all_q[:10]],
        "qid long, qv array<double>",
    )
    for _ in range(2):
        _gate_epoch(spark, sf, out, S.DEDUP_INDEX_TAU, False, replay, 0)
    assert spark.read.parquet(out).count() == 30


def test_admission_gate_audits_unroutable_arrivals(spark, tmp_path):
    """ADVICE r14: a query whose qv is null / wrong-dim is dropped by
    the routing UDF's validity mask, so the kNN join emits nothing for
    it — the gate must still emit an explicit (is_dup=false,
    cosine=null) row so every arrival has an audit record instead of
    silently passing with none."""
    from mysqldump_to_parquet_spark.llm import similarity as S
    from mysqldump_to_parquet_spark.streaming.stream import _gate_epoch

    valid = S._knn_join_queries(spark, SF).limit(1).collect()[0]
    batch = spark.createDataFrame(
        [
            (1_000_001, valid.qv),           # routable
            (1_000_002, None),               # null vector
            (1_000_003, [1.0, 2.0]),         # wrong dimension
            (1_000_004, [0.0] * len(valid.qv)),  # zero norm → NULL cosine
            (1_000_005, [float("nan")] * len(valid.qv)),  # NaN cosine
        ],
        "qid long, qv array<double>",
    )
    out = str(tmp_path / "gate_out")
    _gate_epoch(spark, SF, out, S.DEDUP_INDEX_TAU, False, batch, 0)
    rows = {r.qid: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {
        1_000_001, 1_000_002, 1_000_003, 1_000_004, 1_000_005
    }, "every arrival must be accounted for"
    ok = rows[1_000_001]
    assert ok.nearest_id is not None and ok.cosine == 1.0 and ok.is_dup
    # null and wrong-dim never route; zero-norm routes but scores a
    # NULL cosine (non-ANSI divide-by-zero) and a NaN-valued vector a
    # NaN one — every leg must yield the explicit err-open audit row
    for qid in (1_000_002, 1_000_003, 1_000_004, 1_000_005):
        r = rows[qid]
        assert r.nearest_id is None and r.cosine is None
        assert r.is_dup is False, "unroutable arrivals err OPEN, visibly"


def test_gated_ingest_stream_learns_and_replays(spark, tmp_path):
    """The r15 gated-ingest loop: gate → admit → primary append →
    idempotent index append, all inside one epoch.  Pins:
    (a) an admitted NEW document enters primary AND index within its
    epoch; (b) the same content arriving in a LATER epoch is flagged
    dup by the index entry the stream itself wrote (the
    self-strengthening property — nearest_id is the earlier arrival's
    id, cosine 1.0); (c) a full epoch REPLAY (the foreachBatch
    at-least-once case) changes nothing: primary row set, index row
    set, and audit flags all identical, and the append reports the
    batch as already_indexed; (d) a degraded arrival (null qv) is
    audited, admitted to primary with a null embedding, and absent
    from the index; (e) a crash BETWEEN primary and index appends is
    healed by the replay (the index guard appends the missing rows)."""
    import numpy as np

    from mysqldump_to_parquet_spark.llm import similarity as S
    from mysqldump_to_parquet_spark.streaming.stream import _ingest_epoch

    # caller-owned corpus copy (the ingest loop WRITES to it)
    corpus = str(tmp_path / "corpus")
    spark.read.parquet(f"{SF}/embeddings.parquet").write.parquet(
        f"{corpus}/embeddings.parquet"
    )
    S._ivf_layout_dir(spark, corpus)  # deploy shape: index pre-exists
    n0 = spark.read.parquet(f"{corpus}/embeddings.parquet").count()
    tau = 0.9

    rng = np.random.default_rng(7)
    new_a = (rng.normal(size=64) / 8).tolist()
    new_b = (rng.normal(size=64) / 8).tolist()
    dup_of_corpus = [
        float(x)
        for x in spark.read.parquet(f"{corpus}/embeddings.parquet")
        .where(F.col("vec_id") == 3)
        .collect()[0]
        .embedding
    ]
    out = str(tmp_path / "audit")

    # ---- epoch 0: two new docs, one corpus dup, one degraded
    batch0 = spark.createDataFrame(
        [
            (5_000_001, new_a),
            (5_000_002, new_b),
            (5_000_003, dup_of_corpus),
            (5_000_004, None),
        ],
        "qid long, qv array<double>",
    )
    _ingest_epoch(spark, corpus, out, tau, False, batch0, 0)

    flags0 = {r.qid: r for r in spark.read.parquet(f"{out}/batch_id=0").collect()}
    assert flags0[5_000_003].is_dup and flags0[5_000_003].cosine == 1.0
    assert not flags0[5_000_001].is_dup and not flags0[5_000_002].is_dup
    assert not flags0[5_000_004].is_dup  # degraded: audited, errs open

    prim = spark.read.parquet(f"{corpus}/embeddings.parquet")
    # (a)+(d): admitted rows landed (incl. the degraded one), dup did not
    assert prim.count() == n0 + 3
    assert prim.where(F.col("vec_id") == 5_000_004).collect()[0].embedding is None
    assert prim.where(F.col("vec_id") == 5_000_003).count() == 0
    cells_dir = S._IVF_LAYOUTS[corpus][1] + "/cells"
    idx_ids = {
        r.vec_id
        for r in spark.read.parquet(cells_dir).select("vec_id").collect()
    }
    assert 5_000_001 in idx_ids and 5_000_002 in idx_ids
    assert 5_000_004 not in idx_ids  # degraded is not index mass

    # ---- epoch 1: the SAME content as new_a arrives again (b)
    batch1 = spark.createDataFrame(
        [(6_000_001, new_a)], "qid long, qv array<double>"
    )
    _ingest_epoch(spark, corpus, out, tau, False, batch1, 1)
    f1 = spark.read.parquet(f"{out}/batch_id=1").collect()[0]
    assert f1.is_dup and f1.nearest_id == 5_000_001 and f1.cosine == 1.0
    assert (
        spark.read.parquet(f"{corpus}/embeddings.parquet").count() == n0 + 3
    )

    # ---- (c) replay epoch 0 wholesale: nothing may change
    before_prim = sorted(
        r.vec_id
        for r in spark.read.parquet(f"{corpus}/embeddings.parquet").collect()
    )
    before_idx = sorted(
        r.vec_id for r in spark.read.parquet(cells_dir).collect()
    )
    _ingest_epoch(spark, corpus, out, tau, False, batch0, 0)
    after_prim = sorted(
        r.vec_id
        for r in spark.read.parquet(f"{corpus}/embeddings.parquet").collect()
    )
    after_idx = sorted(
        r.vec_id for r in spark.read.parquet(cells_dir).collect()
    )
    assert after_prim == before_prim, "primary duplicated on replay"
    assert after_idx == before_idx, "index duplicated on replay"

    # replayed append reports already_indexed, appends nothing
    res = S.ivf_index_append(
        spark,
        corpus,
        batch0.where(F.col("qid") != 5_000_003).select(
            F.col("qid").alias("vec_id"), F.col("qv").alias("embedding")
        ),
        verify_primary=False,
        idempotent=True,
    )
    assert res["appended_rows"] == 0
    assert res["already_indexed"] == 2
    assert res["skipped_unroutable"] == 1

    # ---- (e) crash between primary and index appends: simulate by
    # deleting the index's epoch-0 rows, then replaying the epoch —
    # the primary anti-join drops everything but the index guard
    # must append the missing rows back
    import glob
    import os

    removed = 0
    for p in glob.glob(f"{cells_dir}/cell=*/*.parquet"):
        ids = {r.vec_id for r in spark.read.parquet(p).collect()}
        if ids & {5_000_001, 5_000_002}:
            os.remove(p)
            removed += 1
    assert removed >= 1
    S._IVF_LAYOUT_DFS.pop(corpus, None)  # stale file index
    _ingest_epoch(spark, corpus, out, tau, False, batch0, 0)
    idx_ids2 = {
        r.vec_id
        for r in spark.read.parquet(cells_dir).select("vec_id").collect()
    }
    assert 5_000_001 in idx_ids2 and 5_000_002 in idx_ids2
    assert (
        spark.read.parquet(f"{corpus}/embeddings.parquet").count() == n0 + 3
    )


def test_gated_ingest_stream_end_to_end(spark, tmp_path):
    """gated_ingest_stream through a REAL file-source stream: three
    arrival files drain to a final state identical to what the epochs
    pin — every arrival audited exactly once, admitted documents in
    primary and index exactly once, and the post-drain staleness
    signal healthy (a small uniform ingest must not demand a refit)."""
    import numpy as np

    from mysqldump_to_parquet_spark.llm import similarity as S
    from mysqldump_to_parquet_spark.streaming.stream import (
        gated_ingest_stream,
        read_query_stream,
    )

    corpus = str(tmp_path / "corpus")
    spark.read.parquet(f"{SF}/embeddings.parquet").write.parquet(
        f"{corpus}/embeddings.parquet"
    )
    S._ivf_layout_dir(spark, corpus)
    n0 = spark.read.parquet(f"{corpus}/embeddings.parquet").count()

    rng = np.random.default_rng(11)
    qdir = str(tmp_path / "arrivals")
    vecs = [(7_000_000 + i, (rng.normal(size=64) / 8).tolist()) for i in range(9)]
    for i in range(3):
        spark.createDataFrame(
            vecs[3 * i : 3 * (i + 1)], "qid long, qv array<double>"
        ).coalesce(1).write.mode("append").parquet(qdir)

    out = str(tmp_path / "audit")
    q = gated_ingest_stream(
        spark,
        corpus,
        read_query_stream(spark, qdir),
        out_dir=out,
        checkpoint_dir=str(tmp_path / "ckpt"),
        tau=0.9,
    )
    q.processAllAvailable()
    q.stop()

    audit = spark.read.parquet(out)
    assert audit.count() == 9
    assert audit.select("qid").distinct().count() == 9
    admitted = {r.qid for r in audit.where(~F.col("is_dup")).collect()}
    prim_new = {
        r.vec_id
        for r in spark.read.parquet(f"{corpus}/embeddings.parquet")
        .where(F.col("vec_id") >= 7_000_000)
        .collect()
    }
    assert prim_new == admitted
    assert (
        spark.read.parquet(f"{corpus}/embeddings.parquet").count()
        == n0 + len(admitted)
    )
    cells_dir = S._IVF_LAYOUTS[corpus][1] + "/cells"
    idx_new = [
        r.vec_id
        for r in spark.read.parquet(cells_dir)
        .where(F.col("vec_id") >= 7_000_000)
        .collect()
    ]
    assert sorted(idx_new) == sorted(admitted), "index ≠ admitted set"
    st = S.ivf_index_staleness(spark, corpus)
    assert st["refit_due"] is False
