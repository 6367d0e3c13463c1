"""Local Spark-vs-DuckDB comparator — the driver's t2 check, run early.

Mirrors the driver's comparison (SURVEY.md §5.2): row count + column-name
schema + order-insensitive value comparison, with columns sorted by name.
This comparator is STRICTER than a hash: it pinpoints the first differing
cell, so determinism bugs (float accumulation order, tz drift, tie
ordering) surface locally before the driver ever runs.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math
import os
from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .io import TABLE_NAMES

_NULL = "\x00NULL"


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh in-memory DuckDB with the ten fixture views registered,
    exactly like the driver's oracle harness."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon_cell(v):
    """Canonicalize one cell for cross-engine comparison.

    TYPE-STRICT (round 7, VERDICT r6 task 2): numeric cells carry their
    type CLASS — ("i", 32) for any integer width, ("f", 32.0) for any
    float width, ("b", True) for bool — because the driver's value-hash
    is type-sensitive: DuckDB HUGEINT materializes as float64 in pandas
    and `32.0` hashes differently from Spark's int64 `32` even though
    `32 == 32.0` in Python. The r6 `q_pack_chunks` hash-FAIL slipped
    through precisely because this function used to collapse both to
    numeric equality. Width stays collapsed (int32 vs int64, float32 vs
    float64 compare equal) — the driver hashes Python-object values,
    where width is already gone but int-vs-float is not."""
    if v is None:
        return _NULL
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        return ("f", "NaN") if math.isnan(v) else ("f", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (np.floating,)):
        v = float(v)
        return ("f", "NaN") if math.isnan(v) else ("f", v)
    if isinstance(v, (np.integer,)):
        return ("i", int(v))
    if isinstance(v, np.bool_):
        return ("b", bool(v))
    if isinstance(v, _decimal.Decimal):
        # Decimal is its own class: if one engine projects DECIMAL and
        # the other int/float, the driver's hash differs — so must we.
        # Scale is collapsed (32 vs 32.00) the way Python-object hashing
        # of normalized values would.
        if v.is_nan():
            return ("d", "NaN")
        return ("d", str(v.normalize()))
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return _NULL
        # keep tz-awareness visible: a TIMESTAMPTZ result must FAIL against
        # a naive one even at equal instants (the driver may compare raw)
        return v.to_pydatetime().isoformat()
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_cell(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if pd.isna(v):  # catches pd.NA / NaT leftovers
        return _NULL
    return v


def _canon_frame(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns, key=str.lower)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=repr)
    return rows


@dataclass
class CompareResult:
    key: str
    ok: bool
    spark_rows: int = 0
    oracle_rows: int = 0
    detail: str = ""
    mismatches: list = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        return f"[{status}] {self.key}: spark={self.spark_rows} oracle={self.oracle_rows} {self.detail}"


def _dtype_class(dt) -> str:
    """Collapse a pandas dtype to the class the driver's hash would see.
    'object' matches anything (strings, Decimals, lists all land there;
    the per-cell tags in _canon_cell carry the strict signal)."""
    kind = getattr(dt, "kind", None)
    if kind in ("i", "u"):
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    if kind == "M":
        return "datetime"
    if kind == "m":
        return "timedelta"
    return "object"


def compare_frames(key: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    res = CompareResult(key=key, ok=True, spark_rows=len(spark_pdf), oracle_rows=len(oracle_pdf))
    s_cols = sorted(spark_pdf.columns, key=str.lower)
    o_cols = sorted(oracle_pdf.columns, key=str.lower)
    if [c.lower() for c in s_cols] != [c.lower() for c in o_cols]:
        res.ok = False
        res.detail = f"schema mismatch: spark={s_cols} oracle={o_cols}"
        return res
    if len(spark_pdf) != len(oracle_pdf):
        res.ok = False
        res.detail = "row count mismatch"
        return res
    # dtype-parity (round 7, VERDICT r6 task 2): catch HUGEINT/DECIMAL
    # widening even when a column is all-NULL or the frame is empty —
    # the per-cell tags can't see those. 'object' is a wildcard (both
    # engines park strings/Decimals/lists there and NULL-padding shifts
    # columns engine-consistently into float64).
    for sc, oc in zip(s_cols, o_cols):
        s_cls = _dtype_class(spark_pdf[sc].dtype)
        o_cls = _dtype_class(oracle_pdf[oc].dtype)
        if s_cls != o_cls and "object" not in (s_cls, o_cls):
            res.ok = False
            res.detail = (
                f"dtype-class mismatch on '{sc}': spark={s_cls}"
                f"({spark_pdf[sc].dtype}) oracle={o_cls}({oracle_pdf[oc].dtype})"
            )
            return res
    s_rows = _canon_frame(spark_pdf)
    o_rows = _canon_frame(oracle_pdf)
    if s_rows != o_rows:
        res.ok = False
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
        ][:3]
        res.mismatches = diffs
        res.detail = f"value mismatch in {len([1 for a, b in zip(s_rows, o_rows) if a != b])} sorted rows; first: {diffs[:1]}"
    return res


def run_compare(
    key: str,
    spark_df: DataFrame,
    oracle: str | None,
    con: duckdb.DuckDBPyConnection,
) -> CompareResult:
    spark_pdf = spark_df.toPandas()
    if oracle is None:
        # a rows-only key that returns 0 rows is a silent regression of
        # the operator it exists to prove — fail it loudly
        ok = len(spark_pdf) > 0
        return CompareResult(
            key=key, ok=ok, spark_rows=len(spark_pdf), oracle_rows=-1,
            detail="rows-only" + ("" if ok else " FAIL: 0 rows"),
        )
    oracle_pdf = con.execute(oracle).df()
    return compare_frames(key, spark_pdf, oracle_pdf)
