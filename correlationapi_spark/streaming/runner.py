"""Structured-streaming replay harness (SURVEY.md §2.10, §5.3).

The `events` table doubles as the stream fixture: unit tests re-write it
as N chunked parquet files into a temp dir, run the SAME query builder
under ``readStream`` with ``Trigger.AvailableNow`` (deterministic full
replay) into a memory sink, and assert equality with the batch result.
Late-data tests reorder chunks against the watermark.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..io import SCHEMAS, load_tables


def write_event_chunks(
    spark: SparkSession, sf_dir: str, n_chunks: int = 4, order_by: str = "ts"
) -> str:
    """Materialize events as n_chunks parquet files (one per microbatch
    under maxFilesPerTrigger=1) ordered by ``order_by``; returns the dir."""
    out = os.path.join(tempfile.gettempdir(), f"events_stream_{uuid.uuid4().hex}")
    ev = load_tables(spark, sf_dir)["events"]
    # ntile-style chunking on the requested order → deterministic files
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ranked = ev.withColumn(
        "_chunk",
        F.ntile(n_chunks).over(Window.orderBy(F.col(order_by), F.col("event_id"))),
    )
    # single partitioned write: one job, one sort — a per-chunk filter loop
    # would re-run the full global window once per chunk
    ranked.write.mode("overwrite").partitionBy("_chunk").parquet(out)
    return out


def events_stream(spark: SparkSession, chunk_dir: str, files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over the chunked events.

    SCHEMAS["events"] is the µs/native (TimestampType) form since round 4
    and write_event_chunks materializes exactly that, so the pinned
    schema applies directly (the pre-r4 LongType ns form needed a ts
    substitution here)."""
    return (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(chunk_dir)
    )


def run_available_now(
    stream_df: DataFrame,
    build: Callable[[DataFrame], DataFrame],
    output_mode: str = "complete",
) -> DataFrame:
    """Run build(stream) → memory sink with Trigger.AvailableNow; blocks
    until the replay drains, returns the sink table as a DataFrame."""
    spark = stream_df.sparkSession
    name = f"sink_{uuid.uuid4().hex[:12]}"
    q = (
        build(stream_df)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
