"""Schema-pinned table loading and temp-view registration.

The ten fixture tables (FIXTURES.md) are loaded with explicit StructType
schemas rather than inference: deterministic types, and at 100 TB scale it
avoids parquet footer sampling on thousands of files (SURVEY.md §1.2).

``load_tables(spark, sf_dir)`` returns a dict of DataFrames and registers
each as a temp view named after the table, so both the DataFrame-DSL and
``spark.sql`` query styles work. Loading is cached per (session, sf_dir);
re-registration is cheap and idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .session import ensure_conf

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Pinned schemas, from direct parquet inspection (FIXTURES.md).
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    # events.ts unit has CHANGED across driver testdata generations:
    # TIMESTAMP(NANOS) through round 3, TIMESTAMP(MICROS) from round 4.
    # Spark's reader rejects ns outright, so load_tables inspects the
    # footer (one driver-side pyarrow read, cached per path) and, for ns
    # files only, reads raw int64 + truncates to µs like DuckDB does.
    # The pinned schema here is the µs/native form.
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# Dimension tables small enough to broadcast at ANY scale factor (region /
# nation are fixed-cardinality; supplier scales but stays tiny relative to
# the fact tables). customer/part/orders scale linearly — leave their join
# strategy to Catalyst's size threshold + AQE.
ALWAYS_BROADCAST = ("region", "nation")

def read_parquet_any(spark: SparkSession, path: str) -> DataFrame:
    """Parquet reader that tolerates TIMESTAMP(NANOS) columns.

    Spark rejects parquet ns-precision timestamps outright
    (PARQUET_TYPE_ILLEGAL). Inspect the footer with pyarrow, read ns
    columns as raw int64 and convert (truncate) to µs — the same
    semantics DuckDB applies. Used by the service API for arbitrary
    user datasets; the fixture loader pins schemas explicitly instead.
    """
    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_type

    ds = pads.dataset(path, format="parquet")
    arrow_schema = ds.schema
    # pyarrow reports legacy INT96 timestamps as timestamp[ns] too, but
    # their PHYSICAL bytes are not int64 — reading them with a LongType
    # schema fails (PARQUET_COLUMN_DATA_TYPE_MISMATCH). Spark reads
    # INT96 natively, so only true int64-nanos columns need the raw
    # read + truncate treatment; classify by the footer's physical type.
    int96: set[str] = set()
    for frag in ds.get_fragments():
        meta = pq.ParquetFile(frag.path).metadata.schema
        int96 = {
            meta.column(i).name
            for i in range(len(arrow_schema))
            if meta.column(i).physical_type == "INT96"
        }
        break  # one footer suffices — mixed physical types per column
        # would be a malformed dataset Spark rejects anyway
    ns_cols = [
        f.name
        for f in arrow_schema
        if isinstance(f.type, pa.TimestampType)
        and f.type.unit == "ns"
        and f.name not in int96
    ]
    if not ns_cols:
        return spark.read.parquet(path)
    fields = [
        T.StructField(
            f.name,
            T.LongType()
            if f.name in ns_cols
            else (
                T.TimestampType()
                if f.name in int96
                else from_arrow_type(f.type)
            ),
        )
        for f in arrow_schema
    ]
    df = spark.read.schema(T.StructType(fields)).parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


# Weak-keyed per-session caches: a stopped+collected session's entries
# vanish with it (id(spark) keys could alias a new session at the same
# address and serve DataFrames bound to a dead SparkContext).
import weakref

_cache: "weakref.WeakKeyDictionary[SparkSession, dict[str, dict[str, DataFrame]]]" = (
    weakref.WeakKeyDictionary()
)
_registered: "weakref.WeakKeyDictionary[SparkSession, str]" = weakref.WeakKeyDictionary()


_ts_unit_cache: dict[str, str] = {}


def _events_ts_unit(sf_dir: str) -> str:
    """Timestamp unit ('ns'/'us'/...) of events.ts — one cached footer read."""
    unit = _ts_unit_cache.get(sf_dir)
    if unit is None:
        import pyarrow.parquet as pq

        t = pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts").type
        unit = getattr(t, "unit", "us")
        _ts_unit_cache[sf_dir] = unit
    return unit


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all fixture tables from ``sf_dir`` and register temp views."""
    ensure_conf(spark)
    sf_dir = os.path.normpath(sf_dir)
    per_session = _cache.setdefault(spark, {})
    tables = per_session.get(sf_dir)
    if tables is None:
        schemas = dict(SCHEMAS)
        events_ns = _events_ts_unit(sf_dir) == "ns"
        if events_ns:
            schemas["events"] = T.StructType(
                [
                    f if f.name != "ts" else T.StructField("ts", T.LongType())
                    for f in SCHEMAS["events"].fields
                ]
            )
        tables = {
            name: spark.read.schema(schemas[name]).parquet(
                os.path.join(sf_dir, f"{name}.parquet")
            )
            for name in TABLE_NAMES
        }
        if events_ns:
            # ns→µs: integer division (not `/`, which goes through double
            # and loses precision above 2^53) truncates like DuckDB's
            # ns→µs cast.
            tables["events"] = tables["events"].withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        per_session[sf_dir] = tables
    if _registered.get(spark) != sf_dir:
        for name, df in tables.items():
            df.createOrReplaceTempView(name)
        _registered[spark] = sf_dir
    return tables
