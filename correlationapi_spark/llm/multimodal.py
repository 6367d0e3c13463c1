"""Multimodal column support (SURVEY.md §2.9): image/audio/video as opaque
binary columns with typed metadata.

No binary fixture exists (SURVEY.md §1.2), so the declared key builds the
multimodal envelope from documents.text bytes deterministically and
exercises the REAL Spark plumbing — BinaryType + metadata struct schema,
mapInPandas with Arrow batches, partition-preserving decode signatures.
Image HEADER decode is REAL as of round 4 — stdlib-only PNG IHDR, JPEG
SOF-marker and GIF screen-descriptor parses (see make_decode_image),
pinned on genuine bytes in unit tests. Pixel-level decode (resize, audio
features, frame demux) remains STUBBED behind a deterministic fake,
clearly marked: those codecs aren't in this container, the Spark-side
contract is the part under test.
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
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("decoder", T.StringType()),
    ]
)

def make_decode_image():
    """Build the (width, height, decoder) header decoder as a NESTED
    function: both the module-level ``decode_image`` and the mapInPandas
    worker closure use instances of it, and a nested function pickles BY
    VALUE (non-importable qualname), so workers never need this package
    on sys.path (the io.read_parquet_any / make_extract_meta rule).

    REAL, stdlib-only header parses for the three classic raster formats:

    - PNG: 8-byte signature, then the IHDR chunk (4-byte length, 4-byte
      type ``IHDR``) whose first 8 data bytes are width/height as
      big-endian uint32 (file bytes 16..24).
    - JPEG: walk the marker segments (0xFF id len payload) from SOI to
      the first SOFn frame header; height/width are big-endian uint16 at
      payload offsets 1..5 (after the precision byte).
    - GIF: 6-byte version signature, then the logical-screen descriptor's
      width/height as LITTLE-endian uint16 (bytes 6..10).

    Header metadata is exactly what a 100 TB profiling pass extracts —
    no pixel codec needed. Dispatch: when the caller passes the
    envelope's ``mime``, only ``image/*`` payloads are magic-sniffed —
    a TEXT document that happens to start with ASCII ``GIF89a`` must
    NOT be parsed as a GIF (review finding r4; PNG/JPEG magics are
    unreachable from UTF-8 text, the GIF one is printable). Non-image
    mimes and unknown magics get the documented deterministic fake so
    the plumbing stays exercised on the text-derived fixture envelopes;
    truncated/corrupt known-magic IMAGE payloads raise ValueError (a
    decode fleet quarantines those rows).
    """
    png_sig = b"\x89PNG\r\n\x1a\n"
    # JPEG start-of-frame markers that carry dimensions (all SOFn except
    # the DHT/DAC/arithmetic aliases C4/C8/CC)
    jpeg_sof = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}

    def fake(data: bytes) -> tuple[int, int, str]:
        w = 64 + (data[0] if data else 0) % 192
        h = 64 + (data[-1] if data else 0) % 192
        return w, h, "fake"

    def decode(data: bytes, mime: str | None = None) -> tuple[int, int, str]:
        if mime is not None and not mime.startswith("image/"):
            return fake(data)
        if data[:8] == png_sig:
            if len(data) < 24 or data[12:16] != b"IHDR":
                raise ValueError("corrupt PNG: missing IHDR at byte 12")
            w = int.from_bytes(data[16:20], "big")
            h = int.from_bytes(data[20:24], "big")
            return w, h, "png-ihdr"
        if data[:2] == b"\xff\xd8":
            i = 2
            while i + 4 <= len(data):
                if data[i] != 0xFF:
                    raise ValueError(f"corrupt JPEG: no marker at byte {i}")
                marker = data[i + 1]
                if marker == 0xFF:  # fill byte
                    i += 1
                    continue
                if marker in jpeg_sof:
                    if i + 9 > len(data):
                        raise ValueError("corrupt JPEG: truncated SOF header")
                    h = int.from_bytes(data[i + 5 : i + 7], "big")
                    w = int.from_bytes(data[i + 7 : i + 9], "big")
                    return w, h, "jpeg-sof"
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2  # standalone marker, no length field
                    continue
                seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
                if seg_len < 2:
                    raise ValueError("corrupt JPEG: bad segment length")
                i += 2 + seg_len
            raise ValueError("corrupt JPEG: no SOF marker found")
        if data[:6] in (b"GIF87a", b"GIF89a"):
            if len(data) < 10:
                raise ValueError("corrupt GIF: truncated screen descriptor")
            w = int.from_bytes(data[6:8], "little")
            h = int.from_bytes(data[8:10], "little")
            return w, h, "gif-lsd"
        return fake(data)

    return decode


#: Driver-side convenience instance (see make_decode_image for contract).
decode_image = make_decode_image()


def make_extract_meta():
    """Build the mapInPandas worker as a CLOSURE.

    Deliberately nested: cloudpickle serializes closures by value, so
    Python workers never need this package on their sys.path (the driver
    may import us from an arbitrary cwd; workers inherit neither its
    sys.path inserts nor its cwd). Module-top-level workers are pickled by
    reference and die with ModuleNotFoundError — found empirically.
    """

    # fresh by-value instance of the shared header decoder — pickles into
    # the worker closure with no package import (make_decode_image doc)
    decode = make_decode_image()

    def extract_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Batch-shaped (never per-row Python), stateless, partition-local —
        # the signature that scales to a 1000-executor decode fleet.
        for pdf in batches:
            data = pdf["media"].map(lambda m: bytes(m["data"]))
            # route on the envelope mime: only image/* is magic-sniffed
            dims = pd.Series(
                [
                    decode(d, m["mime"])
                    for d, m in zip(data, pdf["media"])
                ],
                index=pdf.index,
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["media"].map(lambda m: m["mime"]),
                    "n_bytes": data.map(len).astype("int64"),
                    "head_hex": data.map(lambda b: b[:8].hex()),
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "decoder": dims.map(lambda d: d[2]),
                }
            )

    return extract_meta


# A genuine 16x16 PNG signature+IHDR prefix (29 bytes): every 10th fixture
# doc is wrapped in it so the declared keys exercise the REAL png-ihdr
# decode path in-plan, not only in unit tests (round 4).
PNG_PREFIX = (
    b"\x89PNG\r\n\x1a\n"
    + (13).to_bytes(4, "big") + b"IHDR"
    + (16).to_bytes(4, "big") + (16).to_bytes(4, "big")
    + b"\x08\x06\x00\x00\x00"
)


def with_media_column(df: DataFrame) -> DataFrame:
    """Wrap documents rows into the multimodal envelope (deterministic).

    doc_id % 10 == 0 rows carry a real PNG header prefix (image/png mime,
    decoded by the real IHDR parser); the rest stay raw text payloads
    (the deterministic-fake path). Both branches are pure column
    expressions — binary concat stays JVM-side."""
    is_png = F.col("doc_id") % 10 == 0
    text_bytes = F.encode(F.col("text"), "UTF-8")
    return df.select(
        "doc_id",
        F.struct(
            F.when(is_png, F.concat(F.lit(PNG_PREFIX), text_bytes))
            .otherwise(text_bytes)
            .alias("data"),
            F.when(is_png, F.lit("image/png"))
            .otherwise(F.lit("application/x-fixture-text"))
            .alias("mime"),
            F.concat(F.lit("mem://documents/"), F.col("doc_id")).alias("uri"),
            (
                F.length(text_bytes)
                + F.when(is_png, F.lit(len(PNG_PREFIX))).otherwise(F.lit(0))
            ).cast("long").alias("n_bytes"),
        ).alias("media"),
    )


_FRAMES_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_off", T.LongType()),
        T.StructField("frame_sha256", T.StringType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

_FRAME_BYTES = 256  # fake fixed-size "frame" chunk of the payload
_MAX_SAMPLES = 4    # frames sampled per media object


def make_sample_frames():
    """Frame-sampling worker (CLOSURE — see make_extract_meta).

    A real implementation would hand each payload to a video demuxer and
    decode every k-th keyframe; no codec exists in this container, so a
    'frame' is STUBBED as a fixed 256-byte chunk — clearly fake, but the
    Spark-side contract is exactly the real one: mapInPandas EXPANDS each
    input row into a variable number of frame rows inside one Arrow batch
    (generator output decouples output rows from input rows), stateless
    and partition-local, so a 1000-executor fleet samples frames with no
    shuffle and no driver involvement.
    """
    import hashlib

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_off": [],
                "frame_sha256": [], "n_frames": [],
            }
            for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
                data = bytes(media["data"])
                n_frames = max(1, len(data) // _FRAME_BYTES)
                stride = max(1, n_frames // _MAX_SAMPLES)
                for idx in range(0, n_frames, stride):
                    off = idx * _FRAME_BYTES
                    chunk = data[off : off + _FRAME_BYTES]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_off"].append(off)
                    out["frame_sha256"].append(hashlib.sha256(chunk).hexdigest())
                    out["n_frames"].append(n_frames)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame_off": pd.Series(out["frame_off"], dtype="int64"),
                    "frame_sha256": pd.Series(out["frame_sha256"], dtype=object),
                    "n_frames": pd.Series(out["n_frames"], dtype="int32"),
                }
            )

    return sample_frames


@query(
    "q_multimodal_frames",
    rows_only_reason="no binary media fixture / codecs exist; frames are "
    "stubbed as fixed-size payload chunks, so the check is rows + stable "
    "schema; chunk hashes and sampling positions are pinned in unit tests.",
    doc="Frame sampling over media envelopes: row-expanding mapInPandas "
    "(every k-th fake frame per payload, decode stubbed).",
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    media = with_media_column(t["documents"])
    return media.mapInPandas(make_sample_frames(), schema=_FRAMES_OUT_SCHEMA)


@query(
    "q_multimodal_meta",
    rows_only_reason="no binary media fixture exists; PNG/JPEG/GIF "
    "headers decode for real (stdlib parses, pinned on genuine bytes in "
    "unit tests), and every 10th fixture envelope carries a genuine PNG "
    "header prefix so the real png-ihdr path runs in-plan — the rest are "
    "text payloads on the deterministic fake path; the Spark-side "
    "plumbing — BinaryType envelope schema, mapInPandas Arrow batching — "
    "is checked (rows + stable schema). Values are pinned in unit tests.",
    doc="Multimodal envelope + mapInPandas metadata extraction "
    "(real PNG/JPEG/GIF header decode; pixel codecs stubbed).",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    media = with_media_column(t["documents"])
    return media.mapInPandas(make_extract_meta(), schema=_META_OUT_SCHEMA)
