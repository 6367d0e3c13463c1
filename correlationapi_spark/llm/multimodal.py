"""Multimodal column support (SURVEY.md §2.9): image/audio/video as opaque
binary columns with typed metadata.

No binary fixture exists (SURVEY.md §1.2), so the declared key builds the
multimodal envelope from documents.text bytes deterministically and
exercises the REAL Spark plumbing — BinaryType + metadata struct schema,
mapInPandas with Arrow batches, partition-preserving decode signatures.
The actual media decode (image resize, audio features, frame sampling) is
STUBBED behind NotImplementedError / a deterministic fake, clearly marked:
the codecs aren't in this container, the Spark-side contract is the part
under test.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import load_tables
from ..registry import query

# The typed envelope every media column uses: payload + routing metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("data", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("uri", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

_META_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("head_hex", T.StringType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
    ]
)


def decode_image(data: bytes) -> tuple[int, int]:
    """REAL decode is stubbed: PIL/libvips are not in this container.

    The deterministic fake derives a plausible (width, height) from the
    payload so downstream plumbing (schema, batching, partitioning) is
    fully exercised and reproducible.
    """
    if data[:2] == b"\xff\xd8":  # a real JPEG would reach the real path
        raise NotImplementedError("media codecs unavailable in this container")
    w = 64 + (data[0] if data else 0) % 192
    h = 64 + (data[-1] if data else 0) % 192
    return w, h


def make_extract_meta():
    """Build the mapInPandas worker as a CLOSURE.

    Deliberately nested: cloudpickle serializes closures by value, so
    Python workers never need this package on their sys.path (the driver
    may import us from an arbitrary cwd; workers inherit neither its
    sys.path inserts nor its cwd). Module-top-level workers are pickled by
    reference and die with ModuleNotFoundError — found empirically.
    """

    def decode(data: bytes) -> tuple[int, int]:
        # real media decode stubbed — see decode_image module docstring
        if data[:2] == b"\xff\xd8":
            raise NotImplementedError("media codecs unavailable in this container")
        w = 64 + (data[0] if data else 0) % 192
        h = 64 + (data[-1] if data else 0) % 192
        return w, h

    def extract_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Batch-shaped (never per-row Python), stateless, partition-local —
        # the signature that scales to a 1000-executor decode fleet.
        for pdf in batches:
            data = pdf["media"].map(lambda m: bytes(m["data"]))
            dims = data.map(decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["media"].map(lambda m: m["mime"]),
                    "n_bytes": data.map(len).astype("int64"),
                    "head_hex": data.map(lambda b: b[:8].hex()),
                    "fake_width": dims.map(lambda d: d[0]).astype("int32"),
                    "fake_height": dims.map(lambda d: d[1]).astype("int32"),
                }
            )

    return extract_meta


def with_media_column(df: DataFrame) -> DataFrame:
    """Wrap documents rows into the multimodal envelope (deterministic)."""
    return df.select(
        "doc_id",
        F.struct(
            F.encode(F.col("text"), "UTF-8").alias("data"),
            F.lit("application/x-fixture-text").alias("mime"),
            F.concat(F.lit("mem://documents/"), F.col("doc_id")).alias("uri"),
            F.length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
        ).alias("media"),
    )


@query(
    "q_multimodal_meta",
    rows_only_reason="no binary media fixture exists; the decode step is a "
    "deterministic stub (decode_image), so only the Spark-side plumbing — "
    "BinaryType envelope schema, mapInPandas Arrow batching — is checked "
    "(rows + stable schema). Values are additionally pinned in unit tests.",
    doc="Multimodal envelope + mapInPandas metadata/feature extraction (decode stubbed).",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    media = with_media_column(t["documents"])
    return media.mapInPandas(make_extract_meta(), schema=_META_OUT_SCHEMA)
