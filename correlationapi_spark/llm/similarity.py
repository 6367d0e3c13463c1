"""Similarity search over embedding columns (SURVEY.md §2.9).

Brute-force cosine top-k is the exact baseline (and the oracle-able key);
the LSH-bucketed variant is the declared sub-quadratic scale path. Vector
math uses zip_with + aggregate over array<double> — JVM-side expression
trees, no Python. (For very wide batch scoring a Pandas-UDF matmul path
would win; that variant lives in udfs.py as the vectorized-UDF exhibit.)
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_tables
from ..registry import query
from ..storeio import (
    StoreIO,
    object_dir,
    pointer_gc,
    pointer_read,
    pointer_write,
    retired_union,
)


def dot(x: Column, y: Column) -> Column:
    """Σ xᵢ·yᵢ as a sequential left fold (matches DuckDB list_dot_product
    to ~1 ulp; declared outputs round to 6 dp)."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, z: acc + z
    )


def cosine(x: Column, y: Column) -> Column:
    """NULL when either vector has zero norm (no direction — review r06:
    the bare division raised DIVIDE_BY_ZERO under ANSI mode and returned
    rank-poisoning NaN otherwise; CASE WHEN evaluates the division
    lazily, only on the defined branch). NaN-element vectors still yield
    NaN (NaN > 0 is TRUE in Spark's ordering) — ranking callers filter
    both out."""
    denom = F.sqrt(dot(x, x) * dot(y, y))
    return F.when(denom > 0, dot(x, y) / denom)


def guarded_cosine(a: Column, b: Column, na2: Column, nb2: Column) -> Column:
    """cosine(a, b) with PRECOMPUTED squared norms (the round-6 bench
    finding: higher-order-function subexpressions are not CSE'd, so the
    inline form re-ran both self-dots per pair) — one dot product per
    pair through the oracle's exact dot/sqrt(na2·nb2) float sequence,
    NULL when either norm is zero. One definition for every engine site
    (exact top-k, IVF refine, the two all-pairs threshold keys)."""
    denom2 = na2 * nb2
    return F.when(denom2 > 0, dot(a, b) / F.sqrt(denom2))


def corpus_view(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Normalize a caller-chosen (id, vector) table to the
    (vec_id, v: array<double>) shape the similarity engines consume —
    the parameterized-service entry (verdict r05: the LLM operators ran
    only as canned fixture-bound keys)."""
    if id_col not in df.columns or vec_col not in df.columns:
        raise KeyError(
            f"unknown column: need {id_col!r} and {vec_col!r} "
            f"in {df.columns}"
        )
    from pyspark.sql import types as T

    id_type = df.schema[id_col].dataType
    if not isinstance(
        id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        # review r06 (dedup finding, same shape here): a silent
        # cast('long') would turn string ids into NULLs and quietly
        # produce NULL neighbor ids
        raise TypeError(
            f"id column {id_col!r} must be integral, got "
            f"{id_type.simpleString()}"
        )
    return df.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )


def topk_neighbors_exact(
    corpus: DataFrame, probe_filter: Column, k: int
) -> DataFrame:
    """Brute-force cosine top-k: broadcast the (tiny) probe rows
    (corpus rows matching ``probe_filter``) against the corpus — a
    broadcast-nested-loop whose probe side is constant, so the corpus
    scan stays embarrassingly parallel at any scale. Ranking uses the
    ROUNDED cosine + unique neighbor id so sub-ulp drift cannot flip the
    top-k. Output: (probe_id, neighbor_id, cosine, rn)."""
    probes = corpus.filter(probe_filter).select(
        F.col("vec_id").alias("probe_id"), F.col("v").alias("pv")
    )
    return topk_neighbors_exact_probes(corpus, probes, k)


def topk_neighbors_exact_probes(
    corpus: DataFrame, probes: DataFrame, k: int
) -> DataFrame:
    """topk_neighbors_exact over an EXPLICIT (probe_id, pv) probe table
    — the entry for raw query vectors that are not corpus rows
    (api.similar(query_vectors=...)); probe ids only need to be
    disjoint from corpus ids so the self-match filter stays a no-op.

    Undefined-cosine corpus rows are EXCLUDED from the ranking (review
    r06): a NaN/zero-norm/NULL-element corpus vector yields a NaN
    cosine, and Spark's descending sort places NaN FIRST — such a row
    would outrank the true best match of every probe. The IVF twin drops
    zero-norm rows at indexing time, so the two engines now agree that
    direction-less vectors are never neighbors.

    Squared norms are PRECOMPUTED per row (round-6 bench finding: the
    inline cosine() re-ran both self-dot aggregates for every PAIR —
    higher-order-function subexpressions are not CSE'd — costing ~30%
    on the benched top-k; per-row _pn2/_vn2 cut the per-pair work to
    one dot product). The division keeps the oracle's exact float
    sequence, dot/sqrt(pn2·vn2)."""
    probes_n = probes.withColumn("_pn2", dot(F.col("pv"), F.col("pv")))
    corpus_n = corpus.withColumnRenamed("vec_id", "neighbor_id").withColumn(
        "_vn2", dot(F.col("v"), F.col("v"))
    )
    scored = (
        F.broadcast(probes_n)
        .join(corpus_n, F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(
                guarded_cosine(
                    F.col("pv"), F.col("v"), F.col("_pn2"), F.col("_vn2")
                ),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine").isNotNull() & ~F.isnan(F.col("cosine")))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rn")
    )


def _one_slice_df(spark: SparkSession, data: list, schema) -> DataFrame:
    """Driver-local rows as a SINGLE-slice DataFrame. Plain
    createDataFrame parallelizes even a 1-row sidecar over
    defaultParallelism python partitions, and a later coalesce(1) then
    pays one SEQUENTIAL python-worker round-trip per parent partition
    inside a single task — measured ~5 s for the 1-row idstate write on
    local[32], the biggest single cost in the round-12 append profile.
    One slice at source = one python partition, one output file, no
    coalesce, no tax. (Only for driver-bounded sidecar rows: centroids,
    Bloom state, manifests — never corpus-scale data.)"""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(data, 1), schema
    )


def ivf_index(
    corpus: DataFrame,
    n_cells: int = 16,
    seed: int = 42,
    train_fraction: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """TRAIN + ASSIGN stages of the IVF engine: returns
    ``(assigned, cents)`` — the cell-stamped corpus
    (vec_id, v, na, cell) and the k×d centroid table.

    ``train_fraction`` < 1 fits the coarse quantizer on a SAMPLE of the
    corpus (the 100 TB posture: KMeans cost is per-iteration linear, and
    centroid quality converges long before the full corpus is seen —
    SCALING.md records the measured recall of a 10%-sample-trained index
    at 100k vectors); the ASSIGN step always stamps every row.

    At scale the assigned corpus is what you persist, written
    ``partitionBy("cell")`` so a probe reads only its n_probe cells via
    partition pruning (canaried in tests/test_plans.py)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # zero-norm vectors have no direction: normalizing them yields NaN
    # arrays that would poison KMeans GLOBALLY (one NaN row drags its
    # centroid to NaN, then every point's distance to that centroid is
    # NaN) — drop them up front; the exact engine's cosine is NaN→null
    # for such rows anyway, so they can never be meaningful neighbors.
    # Materialize the norm as a COLUMN first: referencing the dot()
    # aggregate inside the per-element lambda would re-evaluate the
    # d-term sum for every element (O(d²)/row).
    # NB the isnan guard (review r06 second pass): NaN > 0 is TRUE in
    # Spark's ordering, so `_n > 0` alone let a NaN-element vector
    # through — normalizing it yields the all-NaN array this comment
    # block warns about, poisoning KMeans globally.
    # NB2 the finiteness guard (round 12): an ±inf ELEMENT slips both
    # checks (the norm is +inf: not NaN, > 0) and normalizing yields
    # inf/inf = NaN at that element — the same global poisoning by
    # another door. The numpy scale twin always checked
    # math.isfinite(n2); the expression path now matches it.
    e = corpus.withColumn("_n", F.sqrt(dot(F.col("v"), F.col("v")))).filter(
        (F.col("_n") > 0)
        & ~F.isnan(F.col("_n"))
        & (F.col("_n") < F.lit(float("inf")))
    )
    env = e.withColumn(
        "na", F.transform("v", lambda x: x / F.col("_n"))
    ).withColumn("nv", array_to_vector("na"))
    km = KMeans(
        k=n_cells, seed=seed, maxIter=5,
        featuresCol="nv", predictionCol="cell",
    )
    train = (
        env if train_fraction >= 1.0
        else env.sample(fraction=train_fraction, seed=seed)
    )
    model = km.fit(train)
    # probes and the candidate join both consume the assignment — pin it
    # (lazy localCheckpoint, the ordering.py pattern) so the normalize +
    # transform subtree runs once at action time, not once per consumer
    assigned = model.transform(env).select(
        "vec_id",
        "v",
        "na",
        "cell",
        dot(F.col("v"), F.col("v")).alias("_vn2"),
    ).localCheckpoint(eager=False)
    cents = _one_slice_df(
        corpus.sparkSession,
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, cv array<double>",
    )
    return assigned, cents


def ivf_probe(
    assigned: DataFrame,
    cents: DataFrame,
    probes: DataFrame,
    k: int,
    n_probe: int = 6,
) -> DataFrame:
    """PROBE + REFINE stages of the IVF engine over a prebuilt index:
    ``probes`` carries (probe_id, pv, pna) rows (raw + L2-normalized
    query vectors); candidates come from an equi-join on the n_probe
    nearest cells, the exact rounded-cosine + unique-id ranking picks
    the top-k. Same output contract as topk_neighbors_exact.

    The refine scores with PRECOMPUTED squared norms (the
    topk_neighbors_exact_probes finding): the index carries _vn2 per
    corpus row, the probe side stamps _pn2 once per probe, so each
    candidate costs one dot product through the oracle-identical
    dot/sqrt(pn2·vn2) float sequence."""
    if "_pn2" not in probes.columns:
        probes = probes.withColumn("_pn2", dot(F.col("pv"), F.col("pv")))
    # rank cells per probe by ||p − c||² = |c|² − 2·p·c (+ constant |p|²).
    # Round 12: per-probe array_sort + slice over the broadcast centroid
    # ARRAY, not a k-way row explosion ranked by a probe_id window (the
    # old shape shuffled k copies of every probe's vectors). Struct sort
    # compares (d2, cell) field-by-field — exactly the window's order —
    # and the d2 expression is unchanged, so the probed cell set is
    # identical; a million-probe rank-cells is now one narrow map stage.
    ranked = F.slice(
        F.array_sort(
            F.transform(
                F.col("_cs"),
                lambda c: F.struct(
                    (
                        dot(c["cv"], c["cv"])
                        - 2 * dot(F.col("pna"), c["cv"])
                    ).alias("d2"),
                    c["cell"].alias("cell"),
                ),
            )
        ),
        1,
        n_probe,
    )
    probe_cells = (
        probes.crossJoin(F.broadcast(_cells_array(cents)))
        .select(
            "probe_id", "pv", "_pn2", F.explode(ranked).alias("_pc")
        )
        .select("probe_id", "pv", "_pn2", F.col("_pc.cell").alias("cell"))
    )
    scored = (
        probe_cells.join(
            assigned.select(
                F.col("vec_id").alias("neighbor_id"), "v", "_vn2", "cell"
            ),
            "cell",
        )
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(
                guarded_cosine(
                    F.col("pv"), F.col("v"), F.col("_pn2"), F.col("_vn2")
                ),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine").isNotNull() & ~F.isnan(F.col("cosine")))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rn")
    )


def ivf_write(
    assigned: DataFrame, cents: DataFrame, path: str, _crash=None
) -> dict:
    """Persist an IVF index as the WRITTEN layout the 100 TB posture
    needs: the cell-stamped corpus ``partitionBy("cell")`` under the
    pointer-named corpus object (every probe's candidate read then
    prunes to its n_probe cells at the parquet scan — directory-level
    skipping, the same PartitionFilters contract
    test_ivf_bucketed_probe_prunes_partitions pins) and the k×d
    centroid table under the centroids object. All probe-side columns
    (na, _vn2) are persisted so a reader probes without touching the
    raw corpus. The idstate sidecar (1-row parquet carrying the id
    Bloom that makes ivf_append's duplicate check O(delta)) is built
    from the new corpus before the swap.

    Round 14 (r13 verdict item 1): the rebuild publishes through the
    versioned-pointer layout (storeio.py — SCALING.md's round-13
    design). The new object set is written BESIDE any existing one
    (unreferenced until the swap, so the old index stays fully
    readable and consistent through the whole build), then ONE atomic
    ``_layout.json`` rename commits it; the replaced objects are
    retired in the pointer and reclaimed at the next mutation's
    preamble, giving in-flight readers a full mutation cycle of
    grace. A crash before the swap leaves readers on the old version
    with orphan object dirs the next preamble GCs; a crash after the
    swap leaves readers on the new version. There is NO window in
    which a reader sees a torn layout — the de-certify-then-overwrite
    protocol this replaces had one. Tombstones do not survive a
    rebuild (the caller's frame is the complete new corpus).

    api.index_build only ever clobbers a directory bearing the
    ``_ivf_index`` marker or the layout pointer (advice r10: the old
    "has a corpus/ subdir" heuristic let /index/build overwrite
    arbitrary non-index directories)."""
    import os

    spark = assigned.sparkSession
    # the lock covers rebuilds too (review r11): a rebuild racing a
    # concurrent append/delete would interleave corpus and sidecar
    # writes into a layout neither writer described
    with _ivf_mutation_lock(spark, path):
        io = StoreIO(path, spark)
        old = _ivf_preamble(spark, io, path)
        v = old["version"] + 1
        objs = {
            "corpus": object_dir("corpus", v),
            "centroids": object_dir("centroids", v),
            "idstate": object_dir("idstate", v),
        }
        assigned.select("vec_id", "v", "na", "_vn2", "cell").write.mode(
            "overwrite"
        ).partitionBy("cell").parquet(os.path.join(path, objs["corpus"]))
        cents.write.mode("overwrite").parquet(
            os.path.join(path, objs["centroids"])
        )
        _idstate_build(spark, path, objs)
        if _crash is not None:
            _crash("staged")
        newly = set(old["objects"].values())
        if old.get("legacy"):
            # pre-pointer residue (old trash/stage dirs) retires with
            # the legacy layout — reclaimed at the next preamble
            newly |= {".trash-corpus", ".trash-centroids",
                      ".recluster-stage"}
        pointer_write(
            io, path,
            {
                "version": v,
                "objects": objs,
                "retired": retired_union(
                    None if old.get("legacy") else old,
                    newly, objs.values(),
                ),
            },
        )
        _ivf_touch_marker(spark, path)
        if _crash is not None:
            _crash("swapped")
        # what this rebuild REPLACED, sampled under the lock — the
        # authoritative input for api.index_build's pq_dropped flag
        # (round-15 review: the api sampled the pre-lock layout, so an
        # attach racing in between was dropped but reported kept)
        return {"replaced_pq": "pqbooks" in old.get("objects", {})}


def ivf_read(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Open a persisted IVF index: returns ``(assigned, cents)`` in the
    exact shape ivf_probe consumes. The corpus side stays a
    cell-partitioned parquet scan — ivf_probe's equi-join on ``cell``
    against the ≤ n_probe·|probes|-row probe-cells side prunes the
    scan to the probed cells (dynamic partition pruning; canaried in
    tests/test_plans.py::test_ivf_written_index_roundtrip). The layout
    pointer is resolved ONCE, so both frames come from the same
    version even when a destructive mutation swaps mid-call."""
    import os

    io = StoreIO(path, spark)
    objs = _ivf_layout(io, path)["objects"]
    return (
        spark.read.parquet(os.path.join(path, objs["corpus"])),
        spark.read.parquet(os.path.join(path, objs["centroids"])),
    )


def ivf_resolve(spark: SparkSession, path: str) -> dict:
    """logical-name → ABSOLUTE physical directory for the live object
    set of a persisted IVF index ({"corpus": …, "centroids": …,
    "idstate": …[, "tombstones": …]}) — the accessor tests and tools
    use instead of assuming fixed subdirectory names, which stopped
    being fixed when the versioned-pointer layout landed (round 14)."""
    import os

    io = StoreIO(path, spark)
    objs = _ivf_layout(io, path)["objects"]
    return {k: os.path.join(path, v) for k, v in objs.items()}


# -- persisted-index sidecars: marker, mutation lock, id Bloom, tombstones --
#
# Everything below operates through Hadoop's FileSystem API resolved FROM
# the index path itself (advice r10: os.path.isdir silently passes for
# hdfs:// and s3a:// paths, which made the local-only marker checks a
# no-op exactly where a destructive overwrite is most expensive), so the
# existence/atomic-create/delete calls run against the same filesystem
# Spark will write to.

_IVF_MARKER = "_ivf_index"
_IVF_LOCK = "_mutate.lock"
_BLOOM_K = 7  # (1 − e^(−7/16))^7 ≈ 7e-4 FP at the designed 16 bits/id


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` on the filesystem Spark resolves
    it to — local, HDFS, or an object store with a configured scheme."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def ivf_is_index(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` bears the ``_ivf_index`` marker or the
    versioned-layout pointer — either certifies a complete index (the
    pointer only ever names complete object sets; the marker covers
    pre-pointer layouts)."""
    import os

    from ..storeio import POINTER, _pointer_seqs

    io = StoreIO(path, spark)
    return (
        io.exists(os.path.join(path, _IVF_MARKER))
        or bool(_pointer_seqs(io, path))
        or io.exists(os.path.join(path, POINTER))
    )


def _protocol_residue(name: str) -> bool:
    """True for directory entries only the store protocols create —
    orphan object dirs from a crashed stage, lock/tmp files, legacy
    trash/manifest names. A directory containing ONLY these is a
    crashed build, not user data."""
    from ..storeio import OBJECT_RE

    return bool(
        OBJECT_RE.match(name)
        or name.endswith(".lock")
        or name.endswith(".tmp")
        or name.endswith(".crc")  # Hadoop local-fs checksum siblings
        or name.startswith(".trash-")
        or name in ("_recluster.json", ".recluster-stage")
    )


def ivf_dir_state(spark: SparkSession, path: str) -> str:
    """'absent' | 'empty' | 'index' | 'incomplete' | 'other' — the
    cases api.index_build's clobber guard distinguishes (everything
    but 'other' may be overwritten; 'incomplete' is a directory whose
    every entry is protocol residue, i.e. a crashed first build that
    never published a pointer — round 14, previously an unrecoverable
    'other')."""
    io = StoreIO(path, spark)
    if not io.exists(path):
        return "absent"
    if ivf_is_index(spark, path):
        return "index"
    if not io.isdir(path):
        return "other"
    names = io.list_names(path)
    if not names:
        return "empty"
    if all(_protocol_residue(n) for n in names):
        return "incomplete"
    return "other"


def _ivf_touch_marker(spark: SparkSession, path: str) -> None:
    import os

    fs, jvm = _hadoop_fs(spark, path)
    fs.create(
        jvm.org.apache.hadoop.fs.Path(os.path.join(path, _IVF_MARKER)), True
    ).close()


class _ivf_mutation_lock:
    """Single-writer guard for the check-then-write critical sections
    (build/append/delete/compact — advice r10: two concurrent appends
    of the same ids both passed the clash scan, then both wrote; a
    rebuild racing an append could interleave corpus and sidecar
    writes into a layout neither writer described). Atomic create of
    ``path/_mutate.lock`` via FileSystem.createNewFile — atomic on
    local disk and HDFS; object stores without atomic create need an
    external coordinator, which is the honest limit of a raw-parquet
    layout. A crashed writer leaves the lock behind: the error message
    says which file to remove after confirming no mutation is in
    flight. ``lockfile`` parametrizes the name so other persisted
    stores (the PSI reference) reuse the same discipline."""

    def __init__(
        self, spark: SparkSession, path: str, lockfile: str = _IVF_LOCK
    ):
        import os

        self._fs, jvm = _hadoop_fs(spark, path)
        self._lock = jvm.org.apache.hadoop.fs.Path(
            os.path.join(path, lockfile)
        )

    def __enter__(self):
        if not self._fs.createNewFile(self._lock):
            raise ValueError(
                "another index mutation is in flight (or a previous "
                f"writer crashed): remove {self._lock} to clear the lock"
            )
        return self

    def __exit__(self, *exc):
        self._fs.delete(self._lock, False)
        return False


def _legacy_layout() -> dict:
    """Synthesized layout for a pointer-less (pre-round-14) store: the
    legacy fixed names, version 0. Absent directories resolve to names
    whose reads raise the reader's own AnalysisException — exactly the
    404 surface the fixed-name code had. The first destructive
    mutation upgrades the store to a real pointer."""
    return {
        "version": 0,
        "objects": {
            "corpus": "corpus",
            "centroids": "centroids",
            "idstate": "idstate",
            "tombstones": "tombstones",
        },
        "retired": [],
        "legacy": True,
    }


def _ivf_layout(io: StoreIO, path: str) -> dict:
    """The live layout: the pointer when present, else the legacy
    synthesis. Readers call this ONCE per operation and then only open
    the named directories — the consistency contract of the
    versioned-pointer protocol (storeio.py)."""
    lay = pointer_read(io, path)
    return lay if lay is not None else _legacy_layout()


def _ivf_preamble(spark: SparkSession, io: StoreIO, path: str) -> dict:
    """Every mutation's first act under the lock: finish a PRE-POINTER
    release's interrupted recluster publish (one-time migration), then
    reclaim expired retired objects and crashed-stage orphans
    (pointer_gc — this is where the previous version's reader grace
    ends), and return the layout the mutation operates on."""
    _legacy_recluster_rollforward(spark, io, path)
    lay = pointer_read(io, path)
    if lay is not None:
        pointer_gc(io, path, lay)
        return lay
    return _legacy_layout()


def _legacy_recluster_rollforward(
    spark: SparkSession, io: StoreIO, path: str
) -> bool:
    """Migration healer for a store a PRE-POINTER release crashed
    mid-recluster-publish: its ``_recluster.json`` manifest landed
    only after the stage was complete, so roll-FORWARD is always safe
    — resume the old protocol's idempotent swap (staged dirs over
    live via trash), drop tombstones (the stage was built from the
    live view), rebuild the id Bloom over the healed legacy names, and
    remove the manifest. New-protocol stores never create this state
    (the pointer swap is the commit); this exists so upgrading a
    crashed legacy store is one mutation, not a manual rescue."""
    import json
    import os

    manifest = os.path.join(path, "_recluster.json")
    if not io.exists(manifest):
        return False
    stage = json.loads(io.read_text(manifest))["stage"]
    marker = os.path.join(path, _IVF_MARKER)
    if io.exists(marker):
        io.remove(marker)
    io.rmtree(os.path.join(path, "idstate"))
    for sub in ("corpus", "centroids"):
        staged = os.path.join(stage, sub)
        live = os.path.join(path, sub)
        trash = os.path.join(path, f".trash-{sub}")
        if io.isdir(staged):
            if io.isdir(live):
                io.rmtree(trash)
                io.rename(live, trash)
            io.rename(staged, live)
    io.rmtree(os.path.join(path, "tombstones"))
    for sub in ("corpus", "centroids"):
        io.rmtree(os.path.join(path, f".trash-{sub}"))
    io.rmtree(stage)
    _idstate_build(
        spark, path,
        {"corpus": "corpus", "idstate": "idstate"},
    )
    _ivf_touch_marker(spark, path)
    io.remove(manifest)
    return True


def _bloom_m(n: int) -> int:
    """Bits for the id Bloom: next power of two ≥ 16·n (k=7 hashes →
    ~7e-4 false-positive rate at design capacity), floor 8192 so tiny
    indexes still get a byte-aligned, pow-2 modulus."""
    return max(8192, 1 << (16 * max(n, 1) - 1).bit_length())


def _bloom_positions(idcol: Column, m: int) -> list[Column]:
    # k independent positions via xxhash64(id, salt) — the same JVM
    # hash family the engine uses everywhere, exactly reproducible
    # across sessions (no Python-side hashing to keep in sync)
    return [
        F.pmod(F.xxhash64(idcol, F.lit(i)), F.lit(m)) for i in range(_BLOOM_K)
    ]


def _bloom_build(ids: DataFrame, m: int) -> bytes:
    """Distributed Bloom construction: each partition folds its ids'
    bit positions into ONE m/8-byte bitmap (Arrow-batched, numpy
    scatter), the driver ORs the ≤numPartitions partials. Driver
    traffic is partitions × m/8 bytes — constant in row count. At
    billion-vector scale the bitmap itself grows (~2 GB at 16
    bits/id); the layout would shard it per cell, same construction."""
    nbytes = m // 8
    pos = ids.select(
        F.explode(F.array(*_bloom_positions(F.col("vec_id"), m))).alias("p")
    )

    def bitmaps(it):
        import numpy as np
        import pandas as pd

        buf = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for pdf in it:
            p = pdf["p"].to_numpy()
            if len(p):
                np.bitwise_or.at(
                    buf, p // 8,
                    np.left_shift(
                        np.uint8(1), (p % 8).astype(np.uint8)
                    ),
                )
                seen = True
        if seen:
            yield pd.DataFrame({"b": [buf.tobytes()]})

    import numpy as np

    out = np.zeros(nbytes, dtype=np.uint8)
    for r in pos.mapInPandas(bitmaps, schema="b binary").collect():
        out |= np.frombuffer(r.b, dtype=np.uint8)
    return out.tobytes()


def _bloom_suspects(
    spark: SparkSession, ids: DataFrame, m: int, bits: bytes
) -> DataFrame:
    """ids whose every Bloom position is set — the maybe-present set.
    The bitmap rides a real sc.broadcast (one copy per executor, not
    per task); membership is a vectorized gather over the Arrow
    batch."""
    bc = spark.sparkContext.broadcast(bits)
    poss = ids.select(
        "vec_id", F.array(*_bloom_positions(F.col("vec_id"), m)).alias("pp")
    )

    def check(it):
        import numpy as np

        buf = np.frombuffer(bc.value, dtype=np.uint8)
        for pdf in it:
            if not len(pdf):
                continue
            pp = np.stack([np.asarray(a) for a in pdf["pp"]])
            hit = ((buf[pp // 8] >> (pp % 8).astype(np.uint8)) & 1).all(
                axis=1
            )
            out = pdf.loc[hit, ["vec_id"]]
            if len(out):
                yield out

    # materialize NOW, then release the broadcast deterministically —
    # a lazy return would pin one dead m/8-byte broadcast per append
    # on every executor for the session lifetime (review r11)
    out = poss.mapInPandas(check, schema="vec_id long").localCheckpoint(
        eager=True
    )
    bc.destroy()
    return out


def _bloom_screen_and_build(
    spark: SparkSession, ids: DataFrame, m: int, bits: bytes
) -> tuple[DataFrame, bytes, int, int, list]:
    """_bloom_suspects and _bloom_build FUSED over one delta pass
    (round 13: the append phase is now the bench headline, and the two
    helpers each paid a full Arrow-batched python job to scan the SAME
    tiny delta — the suspect screen gathers the positions it just
    computed anyway, so the partial delta bitmap rides along for
    free). Emits suspect rows (bits NULL) plus one partial-bitmap row
    per input partition (vec_id NULL); the driver ORs the partials
    exactly like _bloom_build. Same billion-id honest limit as
    _bloom_build: the bitmap itself is driver-traffic — at ~2 GB the
    layout would shard it per cell.

    Round 16 (r15 verdict item 6): the intra-delta duplicate check
    rides the same pass — the ids are hash-REPARTITIONED on vec_id so
    every duplicate id provably lands in one partition, where one
    vectorized np.unique over the partition's accumulated ids finds
    them exactly; the per-partition row count and up to 6 sample dup
    ids ride the partial rows. ivf_append's separate
    count/count_distinct aggregate job is gone (one fewer job per
    append). The exchange moves only the 8-byte ids (positions are
    computed after it).

    Returns (suspects_df, delta_bits, n_suspects, n_rows, dup_sample)
    — the suspect COUNT rides the partial rows (round 15: the
    any-suspect gate was a separate take(1) job; the partials collect
    already had the answer)."""
    import numpy as np

    nbytes = m // 8
    bc = spark.sparkContext.broadcast(bits)
    poss = ids.repartition("vec_id").select(
        "vec_id", F.array(*_bloom_positions(F.col("vec_id"), m)).alias("pp")
    )

    def screen(it):
        import numpy as np
        import pandas as pd

        buf = np.frombuffer(bc.value, dtype=np.uint8)
        partial = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        n_sus = 0
        id_chunks = []
        for pdf in it:
            if not len(pdf):
                continue
            seen = True
            id_chunks.append(pdf["vec_id"].to_numpy(dtype=np.int64))
            pp = np.stack([np.asarray(a) for a in pdf["pp"]])
            np.bitwise_or.at(
                partial, pp // 8,
                np.left_shift(np.uint8(1), (pp % 8).astype(np.uint8)),
            )
            hit = ((buf[pp // 8] >> (pp % 8).astype(np.uint8)) & 1).all(
                axis=1
            )
            out = pdf.loc[hit, ["vec_id"]].copy()
            if len(out):
                n_sus += len(out)
                out["bits"] = None
                out["ns"] = None
                out["n"] = None
                out["dups"] = None
                yield out
        if seen:
            allv = np.concatenate(id_chunks)
            uniq, counts = np.unique(allv, return_counts=True)
            dups = uniq[counts > 1][:6]
            yield pd.DataFrame(
                {
                    "vec_id": [None],
                    "bits": [partial.tobytes()],
                    "ns": [n_sus],
                    "n": [len(allv)],
                    "dups": [[int(x) for x in dups]],
                }
            )

    fused = poss.mapInPandas(
        screen,
        schema="vec_id long, bits binary, ns long, n long, "
               "dups array<long>",
    ).localCheckpoint(eager=True)
    bc.destroy()
    suspects = fused.filter(F.col("vec_id").isNotNull()).select("vec_id")
    delta_bits = np.zeros(nbytes, dtype=np.uint8)
    n_suspects = 0
    n_rows = 0
    dup_sample: list = []
    for r in fused.filter(F.col("bits").isNotNull()).collect():
        delta_bits |= np.frombuffer(bytes(r.bits), dtype=np.uint8)
        n_suspects += int(r.ns)
        n_rows += int(r.n)
        dup_sample.extend(int(x) for x in (r.dups or []))
    return (
        suspects, delta_bits.tobytes(), n_suspects, n_rows,
        sorted(dup_sample)[:6],
    )


_IDSTATE_FILE = "state.bin"  # json header line + raw Bloom bitmap
_PQ_BOOKS_FILE = "books.json"  # codebook metadata json (round 15)
_PQ_ANCHORS_FILE = "anchors.json"  # residual anchors json (round 15)


class _IdState(NamedTuple):
    """The (m, k, n, bits) sidecar record — attribute-compatible with
    the Row the legacy 1-row parquet sidecar yielded."""

    m: int
    k: int
    n: int
    bits: bytes


def _idstate_write(
    spark: SparkSession,
    path: str,
    objs: dict | None,
    m: int,
    n: int,
    bits: bytes,
) -> None:
    """Write the id-Bloom sidecar as ONE protocol file inside the
    idstate object dir (round 15): the old 1-row parquet DATASET paid
    a full Spark write job (~0.3 s) per append for a few KB of
    writer-private state; a direct stream write costs one FS call.
    In-place overwrite stays safe for the same reason it always was —
    only lock-holding mutation paths read it — and a crash mid-write
    now degrades to 'no sidecar' at the next read (exact full check,
    superset-safe) instead of a raw parquet read error."""
    import json
    import os

    io = StoreIO(path, spark)
    if objs is None:
        objs = _ivf_layout(io, path)["objects"]
    header = json.dumps(
        {"m": int(m), "k": _BLOOM_K, "n": int(n)}
    ).encode("utf-8")
    io.write_bytes(
        os.path.join(path, objs["idstate"], _IDSTATE_FILE),
        header + b"\n" + bytes(bits),
    )


def _idstate_build(spark: SparkSession, path: str, objs: dict) -> None:
    """Recompute the id Bloom from the given corpus OBJECT's id column
    into the given idstate object — the shared epilogue of every
    operation that leaves the corpus as the sole id authority (build,
    compact, recluster, pre-sidecar append migration). Object names
    come from the layout the caller is building or mutating; the
    in-place overwrite is safe because idstate is writer-private state
    (only lock-holding mutation paths ever read it)."""
    import os

    ids = spark.read.parquet(
        os.path.join(path, objs["corpus"])
    ).select("vec_id")
    n = ids.count()  # parquet metadata count — no data pages read
    m = _bloom_m(n)
    _idstate_write(spark, path, objs, m, n, _bloom_build(ids, m))


def _idstate_read(spark: SparkSession, path: str, objs: dict | None = None):
    """The (m, k, n, bits) sidecar row, or None for a pre-round-11
    layout (ivf_append then migrates: exact full-scan check once,
    sidecar written on the way out). ``objs`` defaults to resolving
    the live pointer (test/tool convenience); mutation paths pass the
    layout they hold. Reads the round-15 protocol FILE first (one FS
    call, no Spark job); a store whose sidecar predates it falls back
    to the legacy 1-row parquet dataset. Torn/absent file = None,
    which every caller treats as 'run the exact check and rebuild'."""
    import json
    import os

    from pyspark.errors import AnalysisException

    io = StoreIO(path, spark)
    if objs is None:
        objs = _ivf_layout(io, path)["objects"]
    sidecar = os.path.join(path, objs["idstate"], _IDSTATE_FILE)
    try:
        raw = io.read_bytes(sidecar)
    except OSError:
        if io.exists(sidecar):
            # present but unreadable (torn write, checksum mismatch):
            # the round-15 file is authoritative for its object — 'no
            # sidecar' (exact check + rebuild), never the parquet read
            return None
        raw = None  # genuinely absent — legacy parquet below
    if raw is not None:
        # a PRESENT round-15 sidecar is authoritative: parse it or
        # treat the store as sidecar-less (torn write → exact check +
        # rebuild). Never fall through to the parquet read here — the
        # object dir holds the non-parquet file itself, so that read
        # would raise an uncaught footer error (round-15 review), and
        # any legacy rows beside it are older than the file anyway.
        try:
            nl = raw.index(b"\n")
            h = json.loads(raw[:nl].decode("utf-8"))
            st = _IdState(
                int(h["m"]), int(h["k"]), int(h["n"]), raw[nl + 1:]
            )
            if len(st.bits) != st.m // 8:
                return None  # truncated bitmap = torn write
            return st
        except (ValueError, KeyError):
            return None
    try:
        rows = spark.read.parquet(
            os.path.join(path, objs["idstate"])
        ).collect()
    except AnalysisException:
        return None
    return rows[0] if rows else None  # empty dir = interrupted write


def _tombstones(
    spark: SparkSession, path: str, objs: dict | None = None
) -> DataFrame | None:
    """Distinct tombstoned vec_ids of the given layout, or None when
    none exist (no tombstones object in the pointer, or the legacy
    name is absent). ``objs`` defaults to resolving the live pointer;
    mutation paths pass the layout they already hold so every read in
    a critical section comes from ONE version."""
    import os

    from pyspark.errors import AnalysisException

    if objs is None:
        objs = _ivf_layout(StoreIO(path, spark), path)["objects"]
    t = objs.get("tombstones")
    if t is None:
        return None
    try:
        return (
            spark.read.parquet(os.path.join(path, t))
            .select("vec_id")
            .distinct()
        )
    except AnalysisException:
        return None


def ivf_live(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """ivf_read with delete masking: the corpus anti-joined against the
    (broadcast, small-by-contract) tombstone set. Every read surface
    (index_status/index_probe, the CLI/HTTP routes) consumes THIS view;
    ivf_read stays the raw-layout accessor. A tombstone set that has
    grown past broadcast size is the signal to ivf_compact. The layout
    pointer is resolved ONCE for corpus + centroids + tombstones, so
    the three frames always come from one consistent version."""
    import os

    io = StoreIO(path, spark)
    objs = _ivf_layout(io, path)["objects"]
    corpus = spark.read.parquet(os.path.join(path, objs["corpus"]))
    cents = spark.read.parquet(os.path.join(path, objs["centroids"]))
    tomb = _tombstones(spark, path, objs)
    if tomb is not None:
        corpus = corpus.join(F.broadcast(tomb), "vec_id", "left_anti")
    return corpus, cents


def _cells_array(cents: DataFrame) -> DataFrame:
    """The k-row centroid table folded into ONE row carrying a
    cell-ascending array<struct<cell,cv>> — the broadcastable state the
    shuffle-free argmin/rank-cells expressions below iterate per row.
    array_sort on the struct orders by its first field (cell), so the
    fold is deterministic regardless of collect_list's task order; size
    is k·d floats, the same broadcast ceiling the old per-row
    nested-loop join already assumed."""
    return cents.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("cell"), F.col("cv")))
        ).alias("_cs")
    )


def ivf_assign(cents: DataFrame, vectors: DataFrame) -> DataFrame:
    """Fixed-centroid cell assignment: stamp every (vec_id, v) row with
    its nearest persisted centroid, returning the exact column layout
    the cell-partitioned corpus stores (vec_id, v, na, _vn2, cell).
    Ranking is ‖p − c‖² order via |c|² − 2·p·c on the unit sphere with
    the cell id as tie-break — the same primitive ivf_probe ranks cells
    with, whose algebra is oracle-checked by q_sim_assign. Zero-norm /
    NaN vectors drop under exactly ivf_index's guard.

    Round 12: the argmin is a per-row ``array_min`` over the broadcast
    centroid ARRAY (one 1-row BroadcastNestedLoopJoin attaches it), not
    a k-way row explosion ranked by a vec_id window — the old shape
    shuffled k copies of every vector's arrays to honor a "no shuffle"
    docstring. array_min on struct(d2, cell) compares field-by-field,
    which IS the (d2 asc, cell asc) window order, and the d2 expression
    is unchanged, so every row keeps its exact cell. A billion-row
    assignment is now a single narrow map stage. Each row's argmin is a
    pure function of its vector, so duplicate vec_ids each keep their
    row (the nearest_centroid_assign _rid lesson); ivf_append refuses
    intra-delta duplicate ids explicitly."""
    e = vectors.withColumn(
        "_n", F.sqrt(dot(F.col("v"), F.col("v")))
    ).filter(
        # finite positive norm — the exact guard ivf_index applies
        # (zero-norm: no direction; NaN-element: NaN norm; inf-element:
        # inf norm whose normalization is NaN at that element)
        (F.col("_n") > 0)
        & ~F.isnan(F.col("_n"))
        & (F.col("_n") < F.lit(float("inf")))
    )
    env = e.withColumn("na", F.transform("v", lambda x: x / F.col("_n")))
    best = F.array_min(
        F.transform(
            F.col("_cs"),
            lambda c: F.struct(
                (
                    dot(c["cv"], c["cv"]) - 2 * dot(F.col("na"), c["cv"])
                ).alias("d2"),
                c["cell"].alias("cell"),
            ),
        )
    )
    return (
        env.crossJoin(F.broadcast(_cells_array(cents)))
        .select(
            "vec_id",
            "v",
            "na",
            dot(F.col("v"), F.col("v")).alias("_vn2"),
            best["cell"].alias("cell"),
        )
        # empty centroid table ⇒ array_min over an empty array ⇒ NULL
        # cell; the old nested-loop shape returned ZERO rows there, and
        # a NULL cell would land in the Hive default partition outside
        # every pruning path — keep the empty-in/empty-out contract.
        # (ivf_probe needs no twin: exploding an empty ranked array
        # already drops the probe row.)
        .where(F.col("cell").isNotNull())
    )


def _clash_error(clash_rows) -> ValueError:
    # limit(6) upstream: show the first 5, ellipsis ONLY when a sixth
    # row proves truncation (advice r10: limit(5) made "exactly 5" and
    # "more than 5" indistinguishable, so the message lied either way)
    ids = sorted(r.vec_id for r in clash_rows)
    return ValueError(
        f"ivf_append is append-only: ids already indexed: {ids[:5]}"
        + ("…" if len(ids) > 5 else "")
    )


def ivf_append(spark: SparkSession, path: str, new_vectors: DataFrame) -> None:
    """Incremental IVF maintenance (round 10 — the r9 verdict's ask made
    a first-class engine instead of a convention): ivf_assign ONLY the
    appended (vec_id, v) vectors against the PERSISTED centroids and
    append their rows into the cell-partitioned layout. No re-train, no
    rewrite — existing cell directories are untouched (pinned by
    tests/test_rowsonly.py::test_ivf_append_equals_same_quantizer_rebuild),
    so appending a day's vectors to a billion-vector index costs one
    map-side assignment + an append write of the new rows only.

    APPEND-ONLY contract: an id that already LIVES in the index is
    REFUSED (ValueError) — silently appending it would duplicate the
    vector and let index_probe burn adjacent top-k ranks on the same
    neighbor (review r10). Round 11 made the check O(delta) (r10
    verdict item 3): delta ids are screened against the persisted id
    Bloom sidecar (idstate) first, and ONLY the Bloom-positive
    suspects — false positives plus genuine re-adds — fall back to the
    exact column-pruned corpus scan. A clean append (all-new ids, the
    steady-state case) never touches the corpus id column at all.
    tools/ivf_bench.py records append cost flat as the corpus grows.

    A TOMBSTONED id does not count as indexed: appending it re-admits
    the id (ivf_delete's contract). Round 14: re-admission runs a full
    ivf_compact first — the versioned-pointer layout has no in-place
    cell rewrite (that WAS the torn-read window the pointer protocol
    closes), so the re-admit price is one atomic compaction of the
    live view, after which the id is absent from corpus, tombstones
    AND Bloom and the append proceeds clean. Steady-state appends
    (all-new ids, no tombstone overlap) never pay it. The whole
    check+compact+write critical section runs under the single-writer
    mutation lock (advice r10: concurrent appends could both pass the
    clash check, then both write).

    The quality drift appends leave behind (centroids no longer
    centroids of their cells) is what ivf_imbalance gauges — recluster
    when the hottest cell outgrows the mean, not on a clock."""
    import os

    _ivf_404_probe(spark, path)
    with _ivf_mutation_lock(spark, path):
        io = StoreIO(path, spark)
        lay = _ivf_preamble(spark, io, path)
        objs = lay["objects"]
        # centroids read + assignment INSIDE the lock, after the
        # preamble (review r12): reading them before the lock let a
        # concurrent recluster swap the quantizer out from under the
        # assignment, stamping the delta with OLD cell ids in the NEW
        # layout (probes rank cells by the new centroids, so those
        # rows silently stop answering).
        cents = spark.read.parquet(os.path.join(path, objs["centroids"]))
        # eager pin: the assignment feeds the collision check, the
        # possible re-admit rewrite, AND the write — one broadcast-k
        # pass total
        assigned = ivf_assign(cents, new_vectors).localCheckpoint(eager=True)
        delta_ids = assigned.select("vec_id")
        # intra-delta duplicate ids are refused like live clashes
        # (round 12): ivf_assign now keeps every row — the old window
        # argmin silently collapsed same-id rows, which only masked the
        # caller's bug — and letting both land would duplicate the
        # vector exactly as the append-only contract forbids. Round 16
        # (r15 verdict item 6): the check RIDES the Bloom screen pass
        # (exact — the screen hash-partitions the ids), along with
        # n_delta for the Bloom sizing below, so the separate
        # count/count_distinct aggregate job is gone. The refusal still
        # happens BEFORE the tombstone re-admit compaction and before
        # any write — same externally observable order as before. Only
        # the pre-sidecar migration branch (no Bloom to screen against)
        # keeps the plain one-pass aggregate.
        state = _idstate_read(spark, path, objs)
        if state is not None:
            suspects, delta_bloom_bits, n_sus, n_delta, dup_ids = (
                _bloom_screen_and_build(
                    spark, delta_ids, int(state.m), bytes(state.bits)
                )
            )
            if dup_ids:
                raise ValueError(
                    "ivf_append delta carries duplicate vec_ids: "
                    f"{dup_ids[:5]}"
                    + ("…" if len(dup_ids) > 5 else "")
                )
        else:
            n_delta, n_distinct = assigned.agg(
                F.count("*"), F.count_distinct("vec_id")
            ).first()
            if n_distinct != n_delta:
                dup_rows = (
                    assigned.groupBy("vec_id")
                    .count()
                    .filter(F.col("count") > 1)
                    .limit(6)
                    .collect()
                )
                ids = sorted(r.vec_id for r in dup_rows)
                raise ValueError(
                    "ivf_append delta carries duplicate vec_ids: "
                    f"{ids[:5]}" + ("…" if len(ids) > 5 else "")
                )
        # re-admit detection (round 14): delta ids overlapping the
        # tombstone set trigger one atomic compaction (see docstring),
        # after which the store has no tombstones, the re-admitted ids
        # are physically gone, and the Bloom is freshly right-sized —
        # the SCREEN therefore re-runs against the post-compact sidecar
        # (its pre-compact bitmap has the wrong m and includes the
        # tombstoned ids; the rare re-admit path pays one extra screen
        # job, the steady-state path pays none). Checked against the
        # tombstone set DIRECTLY, not the Bloom suspect screen (advice
        # r11): a stale tombstone for a never-indexed id is absent from
        # the Bloom. Tombstones are small by contract, so the
        # take(1)-guarded broadcast semi-join is O(delta+|tombstones|).
        tomb = _tombstones(spark, path, objs)
        if tomb is not None and delta_ids.join(
            F.broadcast(tomb), "vec_id", "left_semi"
        ).take(1):
            lay, _ = _ivf_compact_locked(spark, io, path, lay)
            objs = lay["objects"]
            state = _idstate_read(spark, path, objs)
            # a compact always rebuilds the idstate object, so the
            # post-compact state is never None
            suspects, delta_bloom_bits, n_sus, n_delta, _ = (
                _bloom_screen_and_build(
                    spark, delta_ids, int(state.m), bytes(state.bits)
                )
            )
        if state is None:
            # pre-sidecar layout: one-time migration — exact full check
            # now, Bloom built over the whole id column on the way out
            suspects = delta_ids
            any_suspect = True
        else:
            # the O(delta) fast path: no Bloom-positive means no id was
            # ever indexed — the exact corpus check must not even START
            # (a left-semi probe for zero suspects would still stream
            # the whole corpus id column looking for its 6 rows). The
            # count rode the screen's own partials collect (round 15 —
            # the old take(1) was a whole extra job on the append path).
            any_suspect = n_sus > 0
        if any_suspect:
            live_ids = ivf_live(spark, path)[0].select("vec_id")
            clash_rows = (
                live_ids.join(suspects, "vec_id", "left_semi")
                .limit(6)
                .collect()
            )
            if clash_rows:
                raise _clash_error(clash_rows)
        if "pqbooks" in objs:
            # PQ-attached store: the delta's codes ride IN its corpus
            # rows (same write, atomically complete — see _pq_codes),
            # encoded with the STORED book against the STORED anchors
            # (residual coding — round 15): no retraining, no anchor
            # recompute, O(delta)
            assigned = _pq_codes(
                assigned,
                _pq_books_read(spark, path, objs),
                anchors=_pq_anchors_read(spark, path, objs),
            )
        corpus_dir = os.path.join(path, objs["corpus"])
        if state is None:
            # pre-sidecar migration: append, then derive the sidecar
            # from the (now complete) corpus id column. Retry safety
            # needs no Bloom ordering here — with no sidecar, a retry
            # re-runs the exact full check above.
            _corpus_drop_sentinel(spark, corpus_dir)
            assigned.write.mode("append").partitionBy("cell").parquet(
                corpus_dir
            )
            _idstate_build(spark, path, objs)
            _ivf_touch_marker(spark, path)
            return
        # Sidecar BEFORE corpus rows (review r11): the Bloom is
        # superset-safe — a crash between the two writes costs a
        # retry only false positives (exact-check fallback), whereas
        # the old corpus-first order let a crashed-then-retried append
        # slip a stale zero-suspect Bloom and duplicate every id
        # silently.
        m, n = int(state.m), int(state.n) + int(n_delta)
        if n * 16 > m:
            # past the filter's 16-bits/id design capacity: rebuild
            # right-sized over corpus ∪ delta (the delta is not on
            # disk yet) — amortized O(corpus) per capacity doubling,
            # O(delta) in the steady state; FP stays ≤ ~2× the 7e-4
            # design rate for the filter's whole life
            ids = spark.read.parquet(corpus_dir).select(
                "vec_id"
            ).unionByName(delta_ids)
            m = _bloom_m(n)
            bits = _bloom_build(ids, m)
        else:
            import numpy as np

            # the delta's bitmap was already built by the fused screen
            # above — no second delta scan
            bits = (
                np.frombuffer(bytes(state.bits), dtype=np.uint8)
                | np.frombuffer(delta_bloom_bits, dtype=np.uint8)
            ).tobytes()
        _idstate_write(spark, path, objs, m, n, bits)
        # a compact that emptied the corpus leaves a zero-row sentinel
        # file at the corpus object's root; drop it only NOW,
        # immediately before the partitioned write lands next to it
        # (review r12: dropping it before the capacity-resize branch
        # read the corpus id column deterministically failed the
        # append-after-empty case with UNABLE_TO_INFER_SCHEMA and left
        # the corpus file-less — the exact state the sentinel exists
        # to prevent; the sentinel is zero rows, so reading through it
        # for the resize union is harmless)
        _corpus_drop_sentinel(spark, corpus_dir)
        assigned.write.mode("append").partitionBy("cell").parquet(
            corpus_dir
        )
        _ivf_touch_marker(spark, path)


def _corpus_has_cells(spark: SparkSession, corpus_path: str) -> bool:
    """True iff any ``cell=`` partition directory remains under the
    corpus — one listStatus, no data read."""
    fs, jvm = _hadoop_fs(spark, corpus_path)
    jp = jvm.org.apache.hadoop.fs.Path(corpus_path)
    if not fs.exists(jp):
        return False
    for st in fs.listStatus(jp):
        if st.isDirectory() and st.getPath().getName().startswith("cell="):
            return True
    return False


def _corpus_drop_sentinel(spark: SparkSession, corpus_path: str) -> None:
    """Remove the zero-row sentinel file a compact leaves when the live
    view is empty: a partitioned append landing next to a
    root-level data file would make partition discovery fail with
    'conflicting directory structures'. In a healthy partitioned
    corpus, data files only live under cell=N/ — root-level part-*
    files can only be the sentinel. One listStatus; called only on
    append paths, where a write is about to happen anyway."""
    fs, jvm = _hadoop_fs(spark, corpus_path)
    jp = jvm.org.apache.hadoop.fs.Path(corpus_path)
    if not fs.exists(jp):
        return
    for st in fs.listStatus(jp):
        if st.isFile() and st.getPath().getName().startswith("part-"):
            fs.delete(st.getPath(), False)


def _ivf_compact_locked(
    spark: SparkSession, io: StoreIO, path: str, lay: dict
) -> tuple[dict, dict]:
    """The destructive half of ivf_compact (caller holds the lock and
    has run the preamble): write the LIVE view — corpus anti-joined
    against the tombstone set — as a complete NEW corpus object, build
    a right-sized id Bloom over it into a new idstate object, and
    commit both with one pointer swap that simultaneously drops the
    tombstones entry (so a deleted id can never be resurrected by a
    half-published state — the swap is the only visible event).
    Centroids are untouched and carried by name into the new version.

    Round 14 trade, stated honestly: the pre-pointer compact rewrote
    only the cells that held dead rows (dynamic partition overwrite),
    which was O(affected cells) but tore the cell being rewritten for
    any racing reader. Atomic reads on raw parquet require the
    replacement object to be complete, so compact is now O(live
    corpus) — the cost recluster (which implies compact) always paid —
    and in exchange NO read surface can ever observe a half-compacted
    cell. At 100 TB a compact batches many deletes, so the amortized
    cost per reclaimed row is unchanged; per-cell pruning with atomic
    publish would need a per-cell file manifest (a table format's
    commit log), the documented raw-parquet limit. If the live view is
    empty a zero-row schema-bearing sentinel file keeps the new corpus
    object readable (advice r11: zero parquet files raise
    UNABLE_TO_INFER_SCHEMA on every read surface); ivf_append drops
    the sentinel before its partitioned write lands.

    Returns (new layout, stats)."""
    import os

    objs = lay["objects"]
    corpus = spark.read.parquet(os.path.join(path, objs["corpus"]))
    tomb = _tombstones(spark, path, objs)
    n_tomb = tomb.count() if tomb is not None else 0
    live = (
        corpus
        if tomb is None
        else corpus.join(F.broadcast(tomb), "vec_id", "left_anti")
    )
    v = lay["version"] + 1
    new_objs = {
        "corpus": object_dir("corpus", v),
        "centroids": objs["centroids"],
        "idstate": object_dir("idstate", v),
    }
    if "pqbooks" in objs:
        # the live rewrite carries the pq_code column through; the
        # trained book (and the residual anchors — cells are unchanged
        # by a compact) is corpus-content state, not layout state:
        # both carry into the new version by name
        new_objs["pqbooks"] = objs["pqbooks"]
        if "pqanchors" in objs:
            new_objs["pqanchors"] = objs["pqanchors"]
    cdir = os.path.join(path, new_objs["corpus"])
    # reads the OLD corpus object, writes the NEW one — no
    # read-overwrite hazard, so no checkpoint pin is needed
    live.write.mode("overwrite").partitionBy("cell").parquet(cdir)
    if not _corpus_has_cells(spark, cdir):
        _one_slice_df(spark, [], corpus.schema).write.mode(
            "append"
        ).parquet(cdir)
    _idstate_build(spark, path, new_objs)
    retired = retired_union(
        None if lay.get("legacy") else lay,
        {objs[k] for k in ("corpus", "idstate", "tombstones") if k in objs},
        new_objs.values(),
    )
    new_lay = {"version": v, "objects": new_objs, "retired": retired}
    pointer_write(io, path, new_lay)
    _ivf_touch_marker(spark, path)
    n = spark.read.parquet(cdir).count()
    return new_lay, {"tombstones_cleared": n_tomb, "n_vectors": n}


def ivf_delete(spark: SparkSession, path: str, ids: list[int]) -> int:
    """Logical delete (r10 verdict item 7 — the missing half of the
    index CRUD surface): tombstone the given ids. Probe/status read
    through ivf_live, which anti-joins the tombstone set, so deleted
    ids stop answering immediately; the bytes stay on disk until
    ivf_compact rewrites the live view. Appending a tombstoned id
    re-admits it (ivf_append compacts first). Returns the number of
    ids that were actually live (a delete of an absent id is a no-op,
    not an error — DELETE semantics, mirroring SQL).

    Scale shape: the tombstone write is O(|ids|) and ADDITIVE — it
    only appends into the current version's tombstones object
    (creating the object plus one atomic pointer bump the first time),
    and the delta is coalesced to ONE file before the append (advice
    r14: a multi-file append commit moves its part-files out of
    _temporary one by one, so a lock-free reader could observe HALF a
    delete batch — some ids masked, others not; parquet job commit is
    per-file atomic, so a single-file delta makes the batch
    all-or-nothing, and the delta is small by contract). NO corpus
    scan happens here beyond the live-subset semi-join. The Bloom sidecar intentionally keeps deleted ids
    (Blooms can't unset); they resolve through the exact-check
    fallback until a compact rebuilds the filter.

    Only the LIVE subset of the requested ids is persisted (advice
    r11): a tombstone for a never-indexed id is absent from the Bloom
    sidecar, so a later ivf_append of that id would take the
    zero-suspect fast path and the appended vector would be silently
    masked by ivf_live. Tombstones ⊆ ever-indexed ids is the
    invariant every other surface assumes."""
    import os

    if not ids:
        return 0
    _ivf_404_probe(spark, path)
    with _ivf_mutation_lock(spark, path):
        io = StoreIO(path, spark)
        lay = _ivf_preamble(spark, io, path)
        objs = lay["objects"]
        live_ids = ivf_live(spark, path)[0].select("vec_id")
        # driver-side dedupe (review r11): [5, 5] must report
        # deleted=1, matching the single live row it masks
        wanted = _one_slice_df(
            spark, [(i,) for i in sorted({int(i) for i in ids})],
            "vec_id long",
        )
        live_wanted = wanted.join(
            live_ids, "vec_id", "left_semi"
        ).localCheckpoint(eager=True)
        n_live = live_wanted.count()
        if n_live:
            existing = objs.get("tombstones")
            target = existing or (
                "tombstones"
                if lay.get("legacy")
                else object_dir("tombstones", lay["version"] + 1)
            )
            live_wanted.coalesce(1).write.mode("append").parquet(
                os.path.join(path, target)
            )
            if existing is None and not lay.get("legacy"):
                # rows first, pointer second: the new object is
                # invisible until the atomic bump references it, and a
                # crash in between leaves an orphan the next preamble
                # GCs — the delete simply didn't happen
                pointer_write(
                    io, path,
                    {
                        "version": lay["version"] + 1,
                        "objects": {**objs, "tombstones": target},
                        "retired": retired_union(
                            lay, [],
                            list(objs.values()) + [target],
                        ),
                    },
                )
        return n_live


def ivf_compact(spark: SparkSession, path: str) -> dict:
    """Physical reclamation: publish the live view (tombstoned rows
    dropped) as a new corpus version with a right-sized id Bloom, and
    retire corpus + idstate + tombstones in ONE atomic pointer swap —
    see _ivf_compact_locked for the protocol and the O(live) cost
    statement. No crash-ordering subtleties remain: every pre-swap
    artifact is an unreferenced object dir the next preamble GCs, and
    post-swap readers are fully on the compacted version."""
    _ivf_404_probe(spark, path)
    with _ivf_mutation_lock(spark, path):
        io = StoreIO(path, spark)
        lay = _ivf_preamble(spark, io, path)
        _, stats = _ivf_compact_locked(spark, io, path, lay)
        return stats


def ivf_imbalance(spark: SparkSession, path: str, recluster_above: float = 3.0) -> DataFrame:
    """Cell-size drift gauge over a persisted IVF index: appends skew
    cells away from the trained balance, and probe cost is driven by
    the HOTTEST probed cell. One n_cells-row aggregate over the
    corpus's partition column (directory-count scan work only) →
    (n_cells, n_vectors, max_cell, avg_cell, imbalance, recluster)
    where imbalance = max/avg and ``recluster`` trips at the given
    ratio — the maintenance signal that the coarse quantizer should be
    re-trained (a full ivf_index + ivf_write), analogous to compaction
    triggers in LSM stores. Counts LIVE rows (round 11: tombstoned
    ids no longer answer probes, so they must not pad the gauge —
    the mask costs one broadcast anti-join on the thin id column)."""
    corpus = ivf_live(spark, path)[0]
    cells = corpus.groupBy("cell").agg(F.count("*").alias("n"))
    return cells.agg(
        F.count("*").alias("n_cells"),
        F.sum("n").alias("n_vectors"),
        F.max("n").alias("max_cell"),
        F.round(F.avg("n"), 6).alias("avg_cell"),
        F.round(F.max("n") / F.avg("n"), 6).alias("imbalance"),
        (F.max("n") / F.avg("n") > F.lit(recluster_above)).alias(
            "recluster"
        ),
    )


def _ivf_404_probe(spark: SparkSession, path: str) -> None:
    """Existence probe BEFORE a mutation takes the lock: a bogus path
    must raise the reader's AnalysisException (the 404 surface), not
    manufacture directories as a side effect of locking. A pending
    LEGACY recluster manifest counts as existing (after a pre-pointer
    crash mid-swap the corpus may sit in .trash-corpus — the preamble's
    migration roll-forward heals exactly that state, so probing the
    corpus schema here would turn a one-call recovery into a false
    'no IVF index' on every mutation surface). Pointer-born stores
    never need the exception: their corpus object is readable at every
    crash point by construction."""
    import os

    io = StoreIO(path, spark)
    if io.exists(os.path.join(path, "_recluster.json")):
        return
    objs = _ivf_layout(io, path)["objects"]
    spark.read.parquet(os.path.join(path, objs["corpus"])).schema


def ivf_recover(spark: SparkSession, path: str) -> bool:
    """Reclaim a persisted index's garbage NOW instead of waiting for
    the next mutation's preamble: expired retired objects (the
    previous version's reader grace) and crashed-stage orphans. Under
    the versioned-pointer layout (round 14) NO state needs a
    roll-forward — a crash before the swap leaves readers on the old
    version, a crash after it leaves them on the new one — so
    "recovery" degenerates to garbage collection, plus the one-time
    migration healer for a store a PRE-POINTER release crashed
    mid-recluster-publish (_legacy_recluster_rollforward). Returns
    True when anything was healed or reclaimed. Call it only when no
    long-running reader may still hold the retired version's files
    (the same discipline as a table format's snapshot expiry)."""
    import os

    io = StoreIO(path, spark)
    # pre-lock fast path: a path with neither pointer nor legacy
    # manifest has nothing to recover — return without manufacturing
    # lock files on bogus paths
    if pointer_read(io, path) is None and not io.exists(
        os.path.join(path, "_recluster.json")
    ):
        return False
    with _ivf_mutation_lock(spark, path):
        healed = _legacy_recluster_rollforward(spark, io, path)
        lay = pointer_read(io, path)
        removed = pointer_gc(io, path, lay, grace=0.0)
    return healed or bool(removed)


def ivf_recluster(
    spark: SparkSession,
    path: str,
    threshold: float = 3.0,
    n_cells: int | None = None,
    seed: int = 42,
    train_fraction: float = 1.0,
    _crash=None,
) -> dict:
    """Re-train the coarse quantizer of a persisted IVF index and
    rebuild the cell layout — the maintenance act ivf_imbalance's
    gauge calls for (r11 verdict item 4: the gauge existed, nothing
    acted on it). No-op (``reclustered: False``) while the live
    max/avg cell ratio is ≤ ``threshold``; pass ``threshold=0`` to
    force. ``n_cells`` defaults to the current centroid count;
    ``train_fraction`` < 1 fits KMeans on a sample (the 100 TB
    posture — assignment still stamps every row).

    Publish protocol (round 14 — r13 verdict item 1): the new corpus,
    centroids and idstate are trained FROM the live view and written
    as version-N+1 objects beside the live set (the index stays fully
    readable and probe-consistent through training and staging — the
    new objects are unreferenced until the swap), then ONE atomic
    ``_layout.json`` rename commits all three and retires the old
    objects together with the tombstones entry (recluster implies
    compact, and retiring both in the same swap kills the resurrection
    hazard by construction). A crash before the swap leaves readers on
    the old version with orphan objects the next preamble GCs; a crash
    after it leaves readers on the new version. The journaled
    rename/trash/roll-forward machinery this replaces — and its
    documented milliseconds-wide torn-reader window (a racing reader
    could see corpus/ absent, or the new corpus under the old
    centroids) — is gone: there is no sequence of visible states other
    than "old version" then "new version". Runs under the
    single-writer mutation lock; ``_crash`` hooks the two protocol
    points ("staged", "swapped") for the crash-ordering tests.

    Honest gauge note: on genuinely skewed DATA the post-recluster
    imbalance can stay high or rise — KMeans correctly gives a dense
    cluster its own large cell, and max/avg then measures the data,
    not quantizer drift. The quality recluster actually buys is
    centroid PLACEMENT: probe recall at fixed n_probe improves IN
    DISTRIBUTION (drifted-append fixture: 0.862 before, deterministic;
    after ∈ 0.83–0.95 over repeated retrains, mean ≈ +0.05 — the
    parallel KMeans merges partial sums in task-completion order, so
    one retrain is one draw from the optimum distribution; pinned
    wobble-honest in tests/test_rowsonly.py); returned
    imbalance_before/after let the caller see both."""
    import os

    _ivf_404_probe(spark, path)
    with _ivf_mutation_lock(spark, path):
        io = StoreIO(path, spark)
        lay = _ivf_preamble(spark, io, path)
        objs = lay["objects"]
        before = ivf_imbalance(spark, path, recluster_above=threshold)
        b = before.collect()[0]
        stats = {
            "n_vectors": b.n_vectors or 0,
            "imbalance_before": b.imbalance,
        }
        if b.n_vectors is None or b.n_vectors == 0 or not b.recluster:
            return {**stats, "reclustered": False}
        live = ivf_live(spark, path)[0].select("vec_id", "v")
        k = (
            n_cells
            or spark.read.parquet(
                os.path.join(path, objs["centroids"])
            ).count()
        )
        assigned, cents = ivf_index(
            live, n_cells=int(k), seed=seed, train_fraction=train_fraction
        )
        v = lay["version"] + 1
        new_objs = {
            "corpus": object_dir("corpus", v),
            "centroids": object_dir("centroids", v),
            "idstate": object_dir("idstate", v),
        }
        to_write = assigned.select("vec_id", "v", "na", "_vn2", "cell")
        if "pqbooks" in objs:
            # PQ-attached store: the book is corpus-content state and
            # carries by name (no retraining), but RESIDUAL codes are
            # cell-relative (round 15) — the recluster moved every
            # row's cell, so the anchors are recomputed for the NEW
            # cells (one decimal-exact groupBy, bounded driver state)
            # and every row re-encodes against its new anchor with the
            # stored book. Raw-code attachments (pre-round-15, no
            # anchors object) keep the old carry-codes-through path —
            # their codes really are cell-independent.
            new_objs["pqbooks"] = objs["pqbooks"]
            books = _pq_books_read(spark, path, objs)
            if "pqanchors" in objs:
                new_anchors = _pq_cell_anchors(to_write, vec_col="v")
                new_objs["pqanchors"] = object_dir("pqanchors", v)
                to_write = _pq_codes(to_write, books, anchors=new_anchors)
            else:
                new_anchors = None
                to_write = _pq_codes(to_write, books)
        to_write.write.mode(
            "overwrite"
        ).partitionBy("cell").parquet(os.path.join(path, new_objs["corpus"]))
        cents.write.mode("overwrite").parquet(
            os.path.join(path, new_objs["centroids"])
        )
        if "pqanchors" in new_objs and new_objs["pqanchors"] != objs.get(
            "pqanchors"
        ):
            _pq_anchors_write(spark, path, new_objs, new_anchors)
        _idstate_build(spark, path, new_objs)
        if _crash is not None:
            _crash("staged")
        newly = set(objs.values())
        if lay.get("legacy"):
            newly |= {".trash-corpus", ".trash-centroids",
                      ".recluster-stage"}
        pointer_write(
            io, path,
            {
                "version": v,
                "objects": new_objs,
                "retired": retired_union(
                    None if lay.get("legacy") else lay,
                    newly, new_objs.values(),
                ),
            },
        )
        _ivf_touch_marker(spark, path)
        if _crash is not None:
            _crash("swapped")
        a = ivf_imbalance(spark, path).collect()[0]
        return {
            **stats,
            "reclustered": True,
            "n_cells": int(k),
            "imbalance_after": a.imbalance,
        }


def topk_neighbors_ivf(
    corpus: DataFrame,
    probe_filter: Column,
    k: int,
    n_cells: int = 16,
    n_probe: int = 6,
    seed: int = 42,
    train_fraction: float = 1.0,
) -> DataFrame:
    """IVF-flat ANN engine (FAISS 'IVF,Flat' re-expressed on DataFrames)
    — ivf_index ∘ ivf_probe with the probe rows drawn from the corpus
    itself; see q_sim_topk_ivf for the full shape discussion. Same
    output contract as topk_neighbors_exact; only recall is approximate
    (a true neighbor in an unprobed cell is missed), every returned
    cosine is exact."""
    assigned, cents = ivf_index(
        corpus, n_cells=n_cells, seed=seed, train_fraction=train_fraction
    )
    probes = assigned.filter(probe_filter).select(
        F.col("vec_id").alias("probe_id"),
        F.col("v").alias("pv"),
        F.col("na").alias("pna"),
    )
    return ivf_probe(assigned, cents, probes, k, n_probe=n_probe)


# Undefined-cosine exclusion is pinned in the ORACLE too (ADVICE r6):
# the engine drops zero-norm/NaN rows (guarded_cosine -> NULL, then the
# isNotNull/~isnan filter), and without the mirrored WHERE a zero-norm
# or NaN-element fixture vector would make DuckDB rank rows the engine
# excludes (NaN sorts first under ORDER BY cosine DESC there).
_TOPK_ORACLE = """
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        WHERE list_dot_product(embedding, embedding) > 0
    ), probes AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 5),
    scored AS (
        SELECT p.probe_id, c.vec_id AS neighbor_id,
               round(list_dot_product(p.pv, c.v)
                     / sqrt(list_dot_product(p.pv, p.pv)
                            * list_dot_product(c.v, c.v)), 6) AS cosine
        FROM probes p JOIN e c ON c.vec_id <> p.probe_id
    )
    SELECT probe_id, neighbor_id, cosine, rn FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
                                     ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored
        WHERE cosine IS NOT NULL AND NOT isnan(cosine)
    ) WHERE rn <= 5
"""


@query(
    "q_sim_topk",
    oracle=_TOPK_ORACLE,
    doc="Brute-force cosine top-5 neighbors for 5 probe vectors.",
    bench=True,
)
def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline — the fixture exhibit of topk_neighbors_exact
    (round 6: one shared engine also serves the parameterized
    api.similar()/HTTP/CLI surface; the declared key pins it against the
    DuckDB oracle)."""
    t = load_tables(spark, sf_dir)
    return topk_neighbors_exact(
        corpus_view(t["embeddings"], "vec_id", "embedding"),
        F.col("vec_id") < 5,
        5,
    )


_ASSIGN_ORACLE = """
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        WHERE list_dot_product(embedding, embedding) > 0
    ), c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 8),
    scored AS (
        SELECT e.vec_id, c.cell,
               list_dot_product(e.v, c.cv)
               / sqrt(list_dot_product(e.v, e.v)
                      * list_dot_product(c.cv, c.cv)) AS cos
        FROM e CROSS JOIN c
    )
    SELECT vec_id, cell, round(cos, 6) AS cosine FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cos DESC, cell) AS rn
        FROM scored WHERE NOT isnan(cos)
    ) WHERE rn = 1
"""


def nearest_centroid_assign(
    corpus: DataFrame, centroid_ids: list[int]
) -> DataFrame:
    """Parameterized nearest-centroid engine (round 7 — the api.assign()
    service surface and q_sim_assign's core): label every non-zero-norm
    corpus row with its best centroid by cosine. Centroids are rows of
    the corpus itself, chosen by id — the k-row centroid table
    broadcasts, each row does k guarded-cosine comparisons map-side (no
    corpus shuffle), argmax via rank<=1 (WindowGroupLimit). Output:
    (vec_id, cell, cosine) with cosine rounded to 6 dp."""
    if not centroid_ids:
        raise ValueError("centroid_ids must be non-empty")
    # the argmax window partitions by a ROW-unique synthetic id, not
    # vec_id (review r07, confirmed live: duplicate caller ids silently
    # merged — two distinct vectors sharing an id returned ONE
    # assignment). Each row's argmax is a pure function of its vector,
    # so the output multiset stays deterministic under any _rid
    # assignment; duplicate vec_ids simply each keep their row.
    e = corpus.select(
        "vec_id", "v", dot(F.col("v"), F.col("v")).alias("_n2")
    ).filter(F.col("_n2") > 0).withColumn(
        "_rid", F.monotonically_increasing_id()
    )
    cents = e.filter(F.col("vec_id").isin(list(centroid_ids))).select(
        F.col("vec_id").alias("cell"),
        F.col("v").alias("cv"),
        F.col("_n2").alias("_cn2"),
    )
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "_rid",
        "cell",
        guarded_cosine(
            F.col("v"), F.col("cv"), F.col("_n2"), F.col("_cn2")
        ).alias("_cos"),
    ).filter(F.col("_cos").isNotNull() & ~F.isnan(F.col("_cos")))
    w = Window.partitionBy("_rid").orderBy(F.desc("_cos"), "cell")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell", F.round("_cos", 6).alias("cosine"))
    )


def nearest_centroid_assign_np(
    corpus: DataFrame, centroid_ids: list[int]
) -> DataFrame:
    """Scale twin of nearest_centroid_assign (round 8): same contract —
    (vec_id, cell, cosine 6 dp), zero-norm rows dropped, argmax
    tie-break lowest cell — but Arrow-batched numpy matmul instead of
    the broadcast crossJoin + window argmax.

    Why it exists: the expression path materializes k rows PER corpus
    row (1M × k=256 → 256M scored rows) and pays interpreted
    per-element expression cost on every multiply — measured 110.5 s
    for 1M×256×d32 on local[32] (tools/assign_bench.py). Dense
    batched linear algebra is exactly where an Arrow-vectorized kernel
    beats JVM expression trees: each mapInPandas batch computes ONE
    (batch × d) @ (d × k) matrix product, no row expansion, no window
    shuffle, still fully map-side with the same k-row broadcast-ceiling
    state (here: a driver-collected (k × d) float64 matrix, k·d·8
    bytes). Measured numbers in SCALING.md "Centroid assignment".

    Numeric note: the matmul's accumulation order differs from the
    expression path's sequential left fold, so cosines can differ in
    the last ulp — the 6 dp rounding (half-away-from-zero, matching
    F.round) hides this except at exact rounding boundaries; parity is
    pinned in tests/test_rowsonly.py on a margin-separated fixture.
    The ORACLE-checked q_sim_assign stays on the expression path, whose
    float sequence the DuckDB oracle mirrors exactly.
    """
    if not centroid_ids:
        raise ValueError("centroid_ids must be non-empty")
    import math

    import numpy as np

    cent_rows = (
        corpus.filter(F.col("vec_id").isin(list(centroid_ids)))
        .select("vec_id", "v")
        .collect()
    )
    cells: list[int] = []
    cvs = []
    # sorted by cell id so ties argmax to the LOWEST cell (nanargmax
    # returns the first maximal index), mirroring the window's
    # (desc cos, asc cell) order
    for r in sorted(cent_rows, key=lambda r: r.vec_id):
        a = np.asarray(r.v, dtype=np.float64)
        n2 = float(np.dot(a, a))
        if n2 > 0 and math.isfinite(n2):
            # pre-normalized: cos = (x @ c/|c|) / |x|
            cells.append(int(r.vec_id))
            cvs.append(a / math.sqrt(n2))
    if not cvs:
        raise ValueError("no non-zero-norm centroids")
    c_mat = np.vstack(cvs)
    cell_arr = np.asarray(cells, dtype=np.int64)

    def batches(it):
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            if len(pdf) == 0:
                continue
            x = _np.stack(
                [_np.asarray(v, dtype=_np.float64) for v in pdf["v"]]
            )
            n2 = _np.einsum("ij,ij->i", x, x)
            keep = n2 > 0  # zero-norm rows have no direction — dropped
            if not keep.any():
                continue
            ids = pdf["vec_id"].to_numpy()[keep]
            s = (x[keep] @ c_mat.T) / _np.sqrt(n2[keep])[:, None]
            # NaN-element vectors score NaN against every centroid (the
            # expression path filters those scores, dropping the row)
            valid = ~_np.isnan(s).all(axis=1)
            if not valid.any():
                continue
            s = s[valid]
            best = _np.nanargmax(s, axis=1)
            cos = s[_np.arange(len(best)), best]
            # half-away-from-zero at 6 dp, matching F.round
            cos6 = _np.sign(cos) * _np.floor(_np.abs(cos) * 1e6 + 0.5) / 1e6
            yield _pd.DataFrame(
                {
                    "vec_id": ids[valid],
                    "cell": cell_arr[best],
                    "cosine": cos6,
                }
            )

    return corpus.select("vec_id", "v").mapInPandas(
        batches, schema="vec_id long, cell long, cosine double"
    )


def kmeans_lloyd(
    corpus: DataFrame,
    k: int = 8,
    n_iter: int = 10,
    tol: float = 1e-4,
) -> dict:
    """Iterative spherical k-means (Lloyd) to convergence — the loop the
    oracle-checked q_cluster_kmeans_step pins ONE round of. Seeds are
    the k lowest non-zero-norm vec_ids (deterministic, no RNG — the
    repo-wide no-driver-randomness rule), cells labeled 0..k-1 in seed
    order.

    Per-iteration plan (the 100 TB shape): ONE mapInPandas pass over
    the corpus computes the E-step argmax (batch × d) @ (d × k) matmul
    against the broadcast-pickled normalized centroid matrix AND the
    batch-local M-step partials — each Arrow batch emits exactly
    k×(d+1) scalar rows (per-cell per-dim sums, plus a dim=-1 row
    carrying the member count and cosine sum). The only exchange per
    iteration is the k×(d+1)-row hash aggregate; the corpus is never
    shuffled and never joined back. Driver state is the (k × d) float64
    centroid matrix (k·d·8 bytes — the same broadcast ceiling as
    nearest_centroid_assign_np).

    Because cosine(x, mean) == cosine(x, mean/|mean|), this is spherical
    k-means: the mean-cosine objective is non-decreasing per iteration
    (property-tested). Empty cells keep their previous centroid.
    Convergence = max over cells of the L2 shift between successive
    NORMALIZED centroids ≤ tol.

    Returns {"centroids": (k × d) float64 ndarray (unnormalized means;
    seeds for round 0), "cells": {cell: n}, "mean_cosine": {cell: m},
    "iterations": int, "converged": bool, "shifts": [float per iter],
    "objective": [mean cosine per iter]} — the final hard assignment
    for any consumer is one more assign_fn pass over the returned
    centroids (by construction it equals the last E-step).
    """
    import math

    import numpy as np

    if k < 1:
        raise ValueError("k must be >= 1")
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    base = corpus.select(
        "vec_id", "v", dot(F.col("v"), F.col("v")).alias("_n2")
    ).filter(F.col("_n2") > 0)
    seed_rows = base.orderBy("vec_id").limit(k).select("vec_id", "v").collect()
    if len(seed_rows) < k:
        raise ValueError(
            f"need k={k} non-zero-norm vectors, found {len(seed_rows)}"
        )
    c_mat = np.stack(
        [np.asarray(r.v, dtype=np.float64) for r in seed_rows]
    )
    d = c_mat.shape[1]

    def one_pass(cn: np.ndarray):
        """One E+M fused pass: cn is the (k × d) row-normalized centroid
        matrix. Returns (sums k×d, counts k, cos_sums k)."""

        def estep_mstep(it):
            import numpy as _np
            import pandas as _pd

            for pdf in it:
                if len(pdf) == 0:
                    continue
                x = _np.stack(
                    [_np.asarray(v, dtype=_np.float64) for v in pdf["v"]]
                )
                n2 = _np.einsum("ij,ij->i", x, x)
                keep = n2 > 0
                if not keep.any():
                    continue
                x = x[keep]
                s = (x @ cn.T) / _np.sqrt(n2[keep])[:, None]
                valid = ~_np.isnan(s).all(axis=1)
                if not valid.any():
                    continue
                x, s = x[valid], s[valid]
                best = _np.nanargmax(s, axis=1)
                cos = s[_np.arange(len(best)), best]
                sums = _np.zeros((k, d))
                cnts = _np.zeros(k, dtype=_np.int64)
                csum = _np.zeros(k)
                _np.add.at(sums, best, x)
                _np.add.at(cnts, best, 1)
                _np.add.at(csum, best, cos)
                cells_rep = _np.repeat(_np.arange(k), d + 1)
                dims = _np.tile(_np.arange(-1, d), k)
                vals = _np.concatenate(
                    [_np.concatenate(([csum[c]], sums[c])) for c in range(k)]
                )
                ns = _np.where(dims == -1, cnts[cells_rep], 0)
                yield _pd.DataFrame(
                    {"cell": cells_rep, "dim": dims, "s": vals, "n": ns}
                )

        rows = (
            base.select("vec_id", "v")
            .mapInPandas(
                estep_mstep, schema="cell long, dim long, s double, n long"
            )
            .groupBy("cell", "dim")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        sums = np.zeros((k, d))
        cnts = np.zeros(k, dtype=np.int64)
        csum = np.zeros(k)
        for r in rows:
            if r.dim == -1:
                cnts[r.cell] = r.n
                csum[r.cell] = r.s
            else:
                sums[r.cell, r.dim] = r.s
        return sums, cnts, csum

    def normalize_rows(m: np.ndarray) -> np.ndarray:
        nrm = np.sqrt(np.einsum("ij,ij->i", m, m))
        out = m.copy()
        nz = nrm > 0
        out[nz] = out[nz] / nrm[nz][:, None]
        return out

    shifts: list[float] = []
    objective: list[float] = []
    converged = False
    cnts = np.zeros(k, dtype=np.int64)
    csum = np.zeros(k)
    it_run = 0
    for it_run in range(1, n_iter + 1):
        cn = normalize_rows(c_mat)
        sums, cnts, csum = one_pass(cn)
        new_c = c_mat.copy()  # empty cells keep their previous centroid
        nz = cnts > 0
        new_c[nz] = sums[nz] / cnts[nz][:, None]
        shift = float(
            np.max(
                np.sqrt(
                    np.einsum(
                        "ij,ij->i",
                        normalize_rows(new_c) - cn,
                        normalize_rows(new_c) - cn,
                    )
                )
            )
        )
        shifts.append(shift)
        total = int(cnts.sum())
        objective.append(float(csum.sum() / total) if total else math.nan)
        c_mat = new_c
        if shift <= tol:
            converged = True
            break
    return {
        "centroids": c_mat,
        "cells": {int(c): int(cnts[c]) for c in range(k)},
        "mean_cosine": {
            int(c): (float(csum[c] / cnts[c]) if cnts[c] else None)
            for c in range(k)
        },
        "iterations": it_run,
        "converged": converged,
        "shifts": shifts,
        "objective": objective,
    }


@query(
    "q_sim_assign",
    oracle=_ASSIGN_ORACLE,
    doc="Nearest-centroid assignment by cosine (round 7): the k-means "
    "E-step / IVF cell-assignment primitive as an ORACLE-CHECKED key — "
    "8 fixed centroids, every vector labeled with its best cell.",
)
def q_sim_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The assignment step every vector-partitioning scheme runs
    (k-means E-step, IVF indexing, routing for sharded ANN) — declared
    here with an exact oracle so the family's rows-only scale twins
    (ivf_index/q_sim_topk_ivf) rest on an oracle-checked core. Shape:
    the 8-row centroid side BROADCASTS into a nested-loop join (k
    comparisons per row, embarrassingly parallel — no shuffle of the
    corpus), squared norms precomputed once per row (guarded_cosine),
    argmax via rank<=1 which compiles to WindowGroupLimit (bounded
    per-task heaps). Zero-norm vectors are excluded on BOTH sides and
    NaN cosines filtered, mirroring the q_sim_topk contract; ranking
    uses the raw cosine (identical IEEE sequence on both engines) with
    the cell id as tie-break, and the output rounds to 6 dp."""
    t = load_tables(spark, sf_dir)
    return nearest_centroid_assign(
        corpus_view(t["embeddings"], "vec_id", "embedding"), list(range(8))
    )


@query(
    "q_sim_topk_lsh",
    rows_only_reason="BucketedRandomProjectionLSH buckets depend on Spark's "
    "seeded random hyperplanes — no cross-engine oracle. Unit tests assert "
    "recall ≥ 0.6 of its top-k against the exact q_sim_topk at fixture scale.",
    doc="ANN top-k via random-projection LSH — the sub-quadratic scale path.",
)
def q_sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize first so euclidean LSH distance orders like cosine
    (‖a−b‖² = 2−2cos on the unit sphere), then approxSimilarityJoin of the
    probe set; the per-probe top-k keeps the same rank/tie contract as the
    exact key. Bucket length/table count are the recall-vs-cost dials."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    t = load_tables(spark, sf_dir)
    e = t["embeddings"].select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("raw"),
    )
    e = Normalizer(inputCol="raw", outputCol="nv", p=2.0).transform(e)
    lsh = BucketedRandomProjectionLSH(
        inputCol="nv", outputCol="buckets", bucketLength=0.8, numHashTables=4, seed=42
    )
    model = lsh.fit(e)
    probes = e.filter(F.col("vec_id") < 5)
    pairs = model.approxSimilarityJoin(probes, e, 1.2, distCol="l2")
    scored = pairs.filter(F.col("datasetA.vec_id") != F.col("datasetB.vec_id")).select(
        F.col("datasetA.vec_id").alias("probe_id"),
        F.col("datasetB.vec_id").alias("neighbor_id"),
        # cosine = 1 − d²/2 on unit vectors
        F.round(1 - F.col("l2") * F.col("l2") / 2, 6).alias("cosine"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("probe_id", "neighbor_id", "cosine", "rn")
    )


@query(
    "q_sim_topk_ivf",
    rows_only_reason="IVF cells come from seeded KMeans centroids — no "
    "cross-engine oracle exists for the cell assignment with LEARNED "
    "centroids (the assignment primitive itself IS oracle-checked for "
    "fixed centroids via q_sim_assign, round 7). Unit tests assert "
    "recall ≥ 0.6 of its top-k against the exact q_sim_topk at "
    "fixture scale (and that every returned cosine is exact).",
    doc="ANN top-k via IVF: KMeans coarse quantizer → probe the n_probe "
    "nearest cells → exact cosine refine (the inverted-file scale path).",
)
def q_sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN — the inverted-file shape (FAISS 'IVF,Flat')
    re-expressed on DataFrames, the second sub-quadratic scale path next
    to the LSH twin:

    1. TRAIN: seeded KMeans over the L2-normalized corpus picks k coarse
       centroids (euclidean cells on the unit sphere order like cosine).
    2. ASSIGN: one map-only transform stamps each corpus vector with its
       cell id — the inverted file is just a column, and at scale the
       corpus would be written bucketed/partitioned BY that column.
    3. PROBE: each query ranks the k centroids (a k×d broadcast — per
       probe cost k·d flops) and keeps the n_probe nearest cells.
    4. REFINE: candidates come from an EQUI-JOIN on cell id — touching
       ~n_probe/k of the corpus per probe, never all of it — and the
       exact rounded-cosine + unique-id ranking of q_sim_topk picks the
       top-k, so every returned score is exact; only recall is
       approximate (a true neighbor in an unprobed cell is missed).

    Scale: train on a sample at 100 TB (KMeans cost is per-iteration
    linear), assignment is embarrassingly parallel, the probe side is a
    tiny broadcast, and the candidate join shuffles only cell-matched
    rows. n_cells/n_probe are the recall-vs-cost dials (√n cells,
    n_probe ~ 5-10% of cells is the standard starting point). Round 6:
    the engine lives in topk_neighbors_ivf (shared with the
    parameterized api.similar() surface); this key is its pinned
    fixture exhibit, and SCALING.md records its measured recall/cost
    curve at 100k vectors."""
    t = load_tables(spark, sf_dir)
    return topk_neighbors_ivf(
        corpus_view(t["embeddings"], "vec_id", "embedding"),
        F.col("vec_id") < 5,
        k=5,
        n_cells=16,
        n_probe=6,
    )


@query(
    "q_sim_pairs",
    oracle="""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(a.v, b.v)
                     / sqrt(list_dot_product(a.v, a.v)
                            * list_dot_product(b.v, b.v)), 6) AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v)
              / sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v))
              >= 0.35
    """,
    doc="All-pairs cosine above threshold (τ=0.35).",
)
def q_sim_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs form — the ORACLE exhibit for threshold-pair search.
    At corpus scale use dedup.embed_near_dup_lsh(docs, tau=0.35): identical
    output contract, candidates bounded by LSH bucket collisions instead of
    n² (recall/precision characterized in tests/test_rowsonly.py)."""
    t = load_tables(spark, sf_dir)
    return cosine_pairs_above(
        corpus_view(t["embeddings"], "vec_id", "embedding"), 0.35
    )


def cosine_pairs_above(corpus: DataFrame, tau: float) -> DataFrame:
    """All-pairs (id_a < id_b) cosine ≥ tau over a (vec_id, v) corpus —
    the shared exact engine behind q_sim_pairs (τ=0.35) and
    q_dedup_embed (τ=0.4). Squared norms precomputed per ROW (round-6
    bench finding, see topk_neighbors_exact_probes): the inline
    cosine() ran six dot aggregates per candidate (both self-dots, per
    reference in filter + select); this shape runs one dot per pair
    plus a reused _cos column, preserving the oracle's exact
    dot/sqrt(na2·nb2) float sequence. O(n²) by design — the fixture
    ORACLE exhibit; the scale twins are the LSH/IVF paths."""
    e = corpus.withColumn("_n2", dot(F.col("v"), F.col("v")))
    a = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
                 F.col("_n2").alias("_na2"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
                 F.col("_n2").alias("_nb2"))
    cos = guarded_cosine(
        F.col("va"), F.col("vb"), F.col("_na2"), F.col("_nb2")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("_cos", cos)
        .filter(F.col("_cos") >= tau)
        .select("id_a", "id_b", F.round(F.col("_cos"), 6).alias("cosine"))
    )


@query(
    "q_sim_pairs_lsh",
    rows_only_reason="BucketedRandomProjectionLSH buckets depend on Spark's "
    "seeded random hyperplanes — no cross-engine oracle. Unit tests assert "
    "recall vs the exact q_sim_pairs output and that every reported pair's "
    "cosine is genuinely ≥ τ (the refine step cannot over-report).",
    doc="All-pairs cosine ≥ τ via LSH buckets + exact refine — the "
    "sub-quadratic scale path behind q_sim_pairs.",
)
def q_sim_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible scale twin of the n² q_sim_pairs exhibit: identical
    (id_a, id_b, cosine) contract at the same τ=0.35, but candidates come
    from random-projection LSH bucket collisions (dedup.embed_near_dup_lsh)
    instead of the full cross-comparison — it can only MISS a pair below
    the recall bound, never report a wrong one (exact-cosine refine)."""
    from .dedup import embed_near_dup_lsh

    t = load_tables(spark, sf_dir)
    return embed_near_dup_lsh(t["embeddings"], tau=0.35)


@query(
    "q_embed_norm",
    oracle="""
        SELECT vec_id, label,
               round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))), 6)
                 AS l2_norm,
               round(CAST(embedding[1] AS DOUBLE)
                     / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[]))), 6)
                 AS first_unit,
               round(list_reduce([CAST(0.0 AS DOUBLE)] || CAST(embedding AS DOUBLE[]),
                                 (acc, x) -> acc + x), 6) AS vec_sum
        FROM embeddings
    """,
    doc="Vector ops as columns: L2 norm, normalized component, fold sum.",
)
def q_embed_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    v = F.col("embedding").cast("array<double>")
    norm = F.sqrt(dot(v, v))
    return t["embeddings"].select(
        "vec_id",
        "label",
        F.round(norm, 6).alias("l2_norm"),
        F.round(F.element_at(v, 1) / norm, 6).alias("first_unit"),
        F.round(F.aggregate(v, F.lit(0.0), lambda a, x: a + x), 6).alias("vec_sum"),
    )


_CENTROID_ORACLE = """
    WITH flat AS (
        SELECT label,
               unnest(range(0, len(embedding))) AS dim,
               unnest(embedding) AS v
        FROM embeddings
    )
    SELECT label, CAST(dim AS INT) AS dim,
           round(avg(CAST(v AS DOUBLE)), 6) AS centroid_v,
           count(*) AS n_vectors
    FROM flat GROUP BY 1, 2
"""


@query(
    "q_embed_centroid",
    oracle=_CENTROID_ORACLE,
    doc="Per-label embedding centroids (k-means E-step shape), long "
    "(label, dim, value) format.",
)
def q_embed_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class prototypes / cluster centroids: element-wise mean of the
    embedding vectors per label — the aggregation inside every k-means
    iteration, nearest-class-mean classifier, and domain-centroid dedup.

    posexplode flattens (vector → 64 scalar rows) BEFORE the shuffle, so
    the exchange carries (label, dim, float) triples, never arrays (the
    round-1 rule: arrays crossing shuffles measured 20×). One
    partial/final avg over (label, dim) — at 100 TB this is a plain
    grouped mean of labels×dims cells. Long format keeps every output
    column scalar (canonicalizer rule); floats are cast to double before
    averaging on BOTH engines, round 6."""
    e = load_tables(spark, sf_dir)["embeddings"]
    return (
        e.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(
            F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid_v"),
            F.count("*").alias("n_vectors"),
        )
    )


@query(
    "q_embed_quantize",
    oracle="""
        WITH base AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        scaled AS (
            SELECT vec_id, e,
                   list_max(list_transform(e, x -> abs(x))) / 127 AS scale
            FROM base
        ),
        err AS (
            SELECT vec_id, scale,
                   list_sum(list_transform(
                       e, x -> (x - round(x / scale) * scale)
                               * (x - round(x / scale) * scale)
                   )) AS sq,
                   len(e) AS n_dims
            FROM scaled WHERE scale > 0
        )
        SELECT vec_id,
               round(scale, 9) AS scale,
               round(sqrt(sq / n_dims), 9) AS recon_rmse,
               CAST(n_dims AS BIGINT) AS n_dims
        FROM err ORDER BY vec_id
    """,
    doc="Symmetric int8 quantization statistics per embedding: the "
    "per-vector scale (absmax/127) and reconstruction RMSE — the "
    "compression-error profile an ANN pipeline checks before shipping "
    "quantized vectors.",
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absmax int8 quantization (q = round(x/scale), scale = max|x|/127
    — the symmetric scheme every vector store and GEMM kernel uses):
    this key reports what the lossy step costs, per vector, BEFORE the
    corpus commits to it. The quantized values themselves need no
    materialization here — scale + RMSE characterize the codec (4×
    smaller vectors, and recall loss is a function of exactly this
    error).

    Determinism: the float32 inputs parse to identical doubles on both
    engines; every per-element expression (x − round(x/scale)·scale)²
    is spelled identically, and BOTH engines fold the list in element
    order, so even the error sums are bit-matched before the 9 dp
    rounding (magnitudes ~1e-3, so 6 dp would under-resolve — rule-3
    headroom still ≥1e3). Zero vectors (scale = 0) are excluded
    identically. No element's |q| can exceed 127 by construction
    (|x| ≤ absmax ⇒ |x/scale| ≤ 127, and round(127.0) = 127).

    Scale shape: pure map-side per-row array math — no shuffle at all
    except the output ordering; at 100 TB this is a scan-bound
    projection."""
    t = load_tables(spark, sf_dir)
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = t["embeddings"].select("vec_id", e.alias("e"))
    scale = F.array_max(F.transform(F.col("e"), F.abs)) / 127
    scaled = base.select("vec_id", "e", scale.alias("scale")).filter(
        F.col("scale") > 0
    )

    def sq_err(x):
        d = x - F.round(x / F.col("scale"), 0) * F.col("scale")
        return d * d

    err = scaled.select(
        "vec_id",
        "scale",
        F.aggregate(
            F.transform(F.col("e"), sq_err),
            F.lit(0.0),
            lambda acc, y: acc + y,
        ).alias("sq"),
        F.size("e").alias("n_dims"),
    )
    return err.select(
        "vec_id",
        F.round("scale", 9).alias("scale"),
        F.round(F.sqrt(F.col("sq") / F.col("n_dims")), 9).alias("recon_rmse"),
        F.col("n_dims").cast("bigint").alias("n_dims"),
    ).orderBy("vec_id")


@query(
    "q_cluster_kmeans_step",
    oracle="""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
            WHERE list_dot_product(embedding, embedding) > 0
        ), c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 8),
        scored AS (
            SELECT e.vec_id, c.cell,
                   list_dot_product(e.v, c.cv)
                   / sqrt(list_dot_product(e.v, e.v)
                          * list_dot_product(c.cv, c.cv)) AS cos
            FROM e CROSS JOIN c
        ),
        assigned AS (
            SELECT vec_id, cell FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id
                                             ORDER BY cos DESC, cell) AS rn
                FROM scored WHERE NOT isnan(cos)
            ) WHERE rn = 1
        ),
        flat AS (
            SELECT a.cell,
                   unnest(range(0, len(e.v))) AS dim,
                   unnest(e.v) AS x
            FROM assigned a JOIN e USING (vec_id)
        )
        SELECT cell, CAST(dim AS INT) AS dim,
               round(avg(x), 6) AS centroid_v,
               CAST(count(*) AS BIGINT) AS n_members
        FROM flat GROUP BY 1, 2
    """,
    doc="One full Lloyd iteration (k-means E-step + M-step) from 8 "
    "deterministic seed centroids: assign every vector to its nearest "
    "seed by cosine, then recompute each cell's element-wise mean — "
    "the updated centroids in long (cell, dim, value) form.",
)
def q_cluster_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The iterative-clustering primitive as ONE oracle-checked round:
    E-step via the same nearest_centroid_assign engine q_sim_assign
    declares (broadcast k=8 centroid rows, map-side guarded cosines,
    WindowGroupLimit argmax — no corpus shuffle), M-step via the same
    posexplode-then-group mean q_embed_centroid declares (the exchange
    carries (cell, dim, double) scalars, never arrays). A driver
    looping this to convergence pays exactly these two plan shapes per
    iteration — nothing else changes, only the centroid table fed back
    in (the engine-side loop over arbitrary centroid VECTORS is
    nearest_centroid_assign_np's contract; this declared key pins one
    full round against DuckDB).

    Determinism: assignment ranks raw cosines (identical IEEE sequence
    both engines, cell-id tie-break); the per-(cell, dim) mean is an
    order-varying float sum absorbed by 6 dp rounding — the exact
    discipline the oracle-green q_embed_centroid established.

    Scale shape at 100 TB: E-step is embarrassingly parallel (k
    comparisons per row against a broadcast k×d matrix); M-step is one
    map-side-combinable hash aggregate over k×d cells. The assignment
    join back to vectors is by vec_id — co-partitioned with the scan,
    no extra exchange beyond the argmax window's."""
    t = load_tables(spark, sf_dir)
    corpus = corpus_view(t["embeddings"], "vec_id", "embedding")
    assigned = nearest_centroid_assign(corpus, list(range(8))).select(
        "vec_id", "cell"
    )
    members = assigned.join(corpus, "vec_id").select(
        "cell", F.posexplode("v").alias("dim", "x")
    )
    return members.groupBy("cell", "dim").agg(
        F.round(F.avg("x"), 6).alias("centroid_v"),
        F.count("*").alias("n_members"),
    )


def pca_spectrum(corpus: DataFrame, k: int = 8) -> DataFrame:
    """Distributed PCA spectrum of an embedding corpus: top-k
    eigenvalues of the covariance matrix + explained-variance ratios.

    The distributed part is ONE mapInPandas pass computing per-batch
    Gram partials — each Arrow batch emits d rows of (count, column
    sum, Gram row) where the Gram row is a d-vector, so the shuffle
    carries #batches × d × (d+2) doubles regardless of corpus size
    (d=64 → ~33 KB per batch). The idx-keyed hash aggregate reduces
    them to ONE d×(d+2) moment table; the d×d eigendecomposition runs
    driver-side on numpy (d³ flops on a 64×64 matrix — microseconds,
    bounded by dimension, never by data). This is the textbook
    covariance-method PCA split: data-sized work vectorized in Arrow
    batches, dimension-sized work on the driver.

    NaN-element and zero-length vectors are dropped batch-side (same
    hygiene as the other embedding engines). Covariance uses the
    population convention C = E[xxᵀ] − μμᵀ."""
    import numpy as _np

    d_probe = corpus.select(F.size("v").alias("d")).first()
    if d_probe is None:
        raise ValueError("empty corpus")
    d = d_probe.d
    moments = gram_moments(corpus, d).collect()
    rows = sorted(moments, key=lambda r: r.idx)
    n = int(rows[0].n)  # every idx row carries the same total count
    mu = _np.array([r.s for r in rows]) / n
    gram = _np.array([r.g for r in rows])
    cov = gram / n - _np.outer(mu, mu)
    evals, _ = _np.linalg.eigh(cov)
    evals = evals[::-1]  # descending
    total = float(evals.sum())
    k = min(k, d)
    spark = corpus.sparkSession
    out = [
        (
            int(i),
            float(round(float(evals[i]), 8)),
            float(round(float(evals[i] / total), 6)),
            float(round(float(evals[: i + 1].sum() / total), 6)),
        )
        for i in range(k)
    ]
    return _one_slice_df(
        spark,
        out,
        "component int, eigenvalue double, explained_var double, "
        "cum_explained_var double",
    )


def gram_moments(corpus: DataFrame, d: int) -> DataFrame:
    """The DISTRIBUTED half of pca_spectrum: one mapInPandas pass of
    per-batch (count, column-sum, Gram-row) partials reduced by a
    d-row idx aggregate — the plan the round-9 canary pins (exactly
    one Arrow-batched Python stage, no row-at-a-time Python)."""

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            x = np.asarray(pdf["v"].tolist(), dtype=np.float64)
            if x.size == 0:
                continue
            # isfinite, not just ~isnan (round 12 — the ivf_index inf
            # lesson): one ±inf element would ride the Gram partial and
            # poison the whole spectrum, the same global failure as a
            # NaN row
            ok = np.isfinite(x).all(axis=1)
            if not ok.any():
                continue
            x = x[ok]
            gram = x.T @ x  # (d × d)
            yield pd.DataFrame(
                {
                    "idx": np.arange(d, dtype=np.int64),
                    "n": np.full(d, len(x), dtype=np.int64),
                    "s": x.sum(axis=0),
                    "g": list(gram),
                }
            )

    return (
        corpus.select("v")
        .mapInPandas(
            batches, schema="idx long, n long, s double, g array<double>"
        )
        .groupBy("idx")
        .agg(
            F.sum("n").alias("n"),
            F.sum("s").alias("s"),
            F.array(
                *[
                    F.sum(F.element_at("g", i + 1))
                    for i in range(d)
                ]
            ).alias("g"),
        )
    )


@query(
    "q_embed_pca",
    rows_only_reason="the d×d eigendecomposition (numpy eigh, driver-side, "
    "dimension-bounded) has no SQL equivalent; the spectrum is "
    "property-tested against full-precision numpy PCA on the collected "
    "fixture in tests/test_rowsonly.py",
    doc="Distributed PCA spectrum of the embedding corpus: top-8 "
    "covariance eigenvalues + explained-variance ratios from ONE "
    "Arrow-batched Gram-partial pass (shuffle bounded by d², never by "
    "rows); the intrinsic-dimensionality profile an embedding pipeline "
    "checks before choosing index/quantization parameters.",
)
def q_embed_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See pca_spectrum: batch-side X^T X partials (vectorized matmul),
    one d-row idx aggregate, driver-side 64×64 eigh. The 100 TB shape:
    per-executor work is a BLAS matmul per Arrow batch; the only
    exchange is #batches × d rows of (d+2) doubles — constant in the
    corpus size."""
    t = load_tables(spark, sf_dir)
    return pca_spectrum(
        corpus_view(t["embeddings"], "vec_id", "embedding"), k=8
    )


def mutual_knn_edges(corpus: DataFrame, k: int) -> DataFrame:
    """Mutual k-NN graph over a (vec_id, v) corpus: directed k-NN lists
    (here the exact all-pairs form — the fixture ORACLE exhibit; at
    corpus scale feed this from the IVF/LSH candidate paths, the
    mutualization below is identical), then keep the edges present in
    BOTH directions. The mutual filter is the standard symmetrization
    that graph clustering (spectral, HDBSCAN-style) wants: it prunes
    hub-induced asymmetric edges, and it is LINEAR in the k·n directed
    edge list — one self-join on the reversed pair.

    Ranking uses the ROUNDED cosine + unique neighbor id (the
    topk_neighbors_exact rule) so sub-ulp drift cannot flip a rank, and
    undefined-cosine rows (zero norm) are excluded on both engines."""
    e = corpus.withColumn("_n2", dot(F.col("v"), F.col("v")))
    # The streamed side of the pair join inherits the corpus file's
    # partitioning — a single tiny fixture file would serialize the
    # O(n²/2) dot-product stage onto one or two tasks. Spread it across
    # the cluster; at real scale the corpus is already many partitions
    # and this is a no-op-sized shuffle of the small side.
    par = corpus.sparkSession.sparkContext.defaultParallelism
    a = e.repartition(par).select(
        F.col("vec_id").alias("src"), F.col("v").alias("va"),
        F.col("_n2").alias("_na2"),
    )
    b = e.select(
        F.col("vec_id").alias("dst"), F.col("v").alias("vb"),
        F.col("_n2").alias("_nb2"),
    )
    cos = guarded_cosine(F.col("va"), F.col("vb"), F.col("_na2"), F.col("_nb2"))
    # Each unordered pair's dot product is computed ONCE (src < dst) and
    # the reversed direction is a cheap flipped projection — cosine is
    # bit-identical under operand swap (element-wise products and the
    # norm product both commute), so ranking sees the same float either
    # way and the expensive fold runs on n(n-1)/2 pairs, not n(n-1).
    # materialize() the half-pair table (round 16): BOTH unionAll
    # branches below consume it, and without the pin the O(n²/2)
    # dot-product theta-join ran TWICE — the flipped projection was
    # only cheap in intent. One pin makes the quadratic stage really
    # run once; the reversed direction reads the pinned blocks.
    from ..ordering import materialize

    half = materialize(
        a.join(b, F.col("src") < F.col("dst"))
        .select("src", "dst", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine").isNotNull() & ~F.isnan("cosine"))
    )
    pairs = half.unionAll(
        half.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "cosine"
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), "dst")
    knn = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("src", "dst", "cosine")
    )
    # Mutual = the unordered pair appears in BOTH directed lists: one
    # groupBy counting directions (cosine is identical in both, min is
    # a no-op reducer) — no self-join, the knn subtree evaluates once.
    return (
        knn.groupBy(
            F.least("src", "dst").alias("id_a"),
            F.greatest("src", "dst").alias("id_b"),
        )
        .agg(F.min("cosine").alias("cosine"), F.count("*").alias("_n"))
        .filter(F.col("_n") == 2)
        .select("id_a", "id_b", "cosine")
    )


@query(
    "q_embed_knn_graph",
    oracle="""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        n AS (
            SELECT vec_id, v, list_dot_product(v, v) AS n2 FROM e
        ),
        p AS (
            SELECT a.vec_id AS src, b.vec_id AS dst,
                   round(CASE WHEN a.n2 * b.n2 > 0 THEN
                         list_dot_product(a.v, b.v) / sqrt(a.n2 * b.n2)
                         END, 6) AS cosine
            FROM n a JOIN n b ON a.vec_id <> b.vec_id
        ),
        r AS (
            SELECT src, dst, cosine,
                   row_number() OVER (PARTITION BY src
                                      ORDER BY cosine DESC, dst) AS rn
            FROM p WHERE cosine IS NOT NULL AND NOT isnan(cosine)
        ),
        knn AS (SELECT src, dst, cosine FROM r WHERE rn <= 5)
        SELECT a.src AS id_a, a.dst AS id_b, a.cosine
        FROM knn a JOIN knn b ON a.src = b.dst AND a.dst = b.src
        WHERE a.src < a.dst
    """,
    doc="Mutual k-NN graph (k=5) over the embedding corpus — directed "
    "top-k lists symmetrized by a reversed-pair self-join; the standard "
    "neighborhood-graph construction feeding graph clustering.",
)
def q_embed_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See mutual_knn_edges: exact directed k-NN (the oracle exhibit;
    IVF/LSH feed the same mutualization at scale) symmetrized to the
    undirected mutual edge list. Scale shape: the directed list is k·n
    rows; mutualization is one equi-join on the reversed (src, dst)
    pair — linear in edges, no quadratic stage past candidate gen."""
    t = load_tables(spark, sf_dir)
    return mutual_knn_edges(
        corpus_view(t["embeddings"], "vec_id", "embedding"), k=5
    )


PQ_M = 8          # subspaces
PQ_K = 64         # centroids per subspace codebook
PQ_SUB_D = 8      # dims per subspace (fixture d=64)
PQ_BITS = 6       # bits per code index (PQ_K = 2**PQ_BITS)
PQ_TRAIN_N = 1024  # codebook training sample cap (driver-side rows)
PQ_ITERS = 8      # Lloyd iterations


def _pq_train_local(sample: list) -> list:
    """Per-subspace Lloyd k-means over a numpy sample — the codebook
    trainer shared by the engine and its replay tests (round 13, r12
    verdict item 3: the first-PQ_K-rows sampled codebook pinned ADC
    recall at noise level; per-subspace k-means is the standard PQ
    training — Jégou et al. 2011 §III). Deterministic given the
    sample's row order: init is the first PQ_K rows per subspace
    (cycled when the sample is smaller), assignment ties break at the
    lowest cid (np.argmin's first-occurrence rule), empty clusters
    keep their previous centroid, and every reduction is a numpy op
    over a fixed operand order — bit-reproducible across runs and
    replayable in the tests. Returns [PQ_M][PQ_K] centroid lists."""
    import numpy as np

    X = np.asarray(sample, dtype=np.float64)
    if X.ndim != 2 or not len(X):
        raise ValueError(
            "pq codebook training needs at least one sample vector"
        )
    books = []
    for s in range(PQ_M):
        Xs = X[:, s * PQ_SUB_D:(s + 1) * PQ_SUB_D]
        C = Xs[np.arange(PQ_K) % len(Xs)].copy()
        for _ in range(PQ_ITERS):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(PQ_K):
                members = Xs[a == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books.append([[float(v) for v in row] for row in C])
    return books


def _pq_train_books(
    corpus: DataFrame,
    vec_col: str = "embedding",
    anchors: "dict | None" = None,
    cell_col: str = "cell",
    n: "int | None" = None,
) -> list:
    """Trained PQ codebook as driver-side [PQ_M][PQ_K] centroid lists.

    Sample selection (round 14 — r13 verdict item 5, replacing the
    corpus-wide ``orderBy(vec_id).limit``): a deterministic HASH-CUT
    (the q_sample_fraction idiom) keeps rows with
    pmod(xxhash64(vec_id), 2²⁰) below a threshold targeting
    ~4·PQ_TRAIN_N survivors, then the PQ_TRAIN_N lowest vec_ids among
    the survivors train the book. The only corpus-wide work is one
    hash-filter scan (round 15 — r14 verdict item 6: callers that
    already know the corpus row count pass ``n`` and the separate
    count() job is gone); the vec_id top-k runs over ~4k survivors,
    never the corpus — at 100 TB a TakeOrderedAndProject over every
    row was exactly the cost the old docstring warned against while
    the code still paid it. Corpora of ≤ 4·PQ_TRAIN_N rows keep
    everything, so the sample degenerates to the old vec_id-ordered
    prefix (the replay pins' fixture case — bit-identical books
    there). Lloyd runs driver-side in numpy: ≤PQ_TRAIN_N × d doubles,
    milliseconds — distributing k-means over ≤1024 rows would cost
    more in scheduling than it computes.

    ``anchors`` (round 15 — r14 verdict item 1): train on RESIDUALS
    v − anchor[cell] instead of raw vectors — the FAISS IVF-PQ
    composition. Residuals concentrate the distribution each
    subquantizer sees (the cell's location is carried by the anchor,
    so the 48-bit code only has to describe the within-cell offset),
    which is what lifted recall well above the raw-code book at the
    same code budget. The subtraction is the replay-pinned sequential
    python float op on the ≤PQ_TRAIN_N collected sample rows — no
    distributed work changes."""
    cols = ["vec_id", F.col(vec_col).alias("_tv")]
    if anchors is not None:
        cols.append(F.col(cell_col).alias("_tc"))
    ids = corpus.select(*cols)
    if n is None:
        n = ids.count()
    cap = 4 * PQ_TRAIN_N
    if n > cap:
        m = 1 << 20
        thr = -(-cap * m // n)  # ceil(cap·m/n) — ≥ cap expected survivors
        ids = ids.filter(
            F.pmod(F.xxhash64(F.col("vec_id")), F.lit(m)) < F.lit(thr)
        )
    rows = ids.orderBy("vec_id").limit(PQ_TRAIN_N).collect()
    if anchors is None:
        return _pq_train_local([[float(x) for x in r._tv] for r in rows])
    d = PQ_M * PQ_SUB_D
    zero = [0.0] * d
    sample = []
    for r in rows:
        a = anchors.get(int(r._tc), zero)
        sample.append([float(x) - float(y) for x, y in zip(r._tv, a)])
    return _pq_train_local(sample)


def _pq_cell_anchors(corpus: DataFrame, vec_col: str = "v") -> dict:
    """Per-cell anchor vectors for residual PQ coding: the elementwise
    mean of each cell's raw vectors, as {cell: [d floats]}. This is
    the residual reference FAISS takes from its coarse quantizer; the
    cell MEAN is used here instead of the stored centroid because the
    IVF centroids live in normalized-vector space while PQ codes (and
    ADC distances) are over the raw vectors — the mean is the
    variance-minimizing anchor in the coding space itself.

    Determinism: each component accumulates as DECIMAL(30,15) — exact
    integer-lattice addition, so the sum (and therefore the anchor) is
    bit-identical regardless of task order or partitioning, unlike a
    double sum whose float rounding floats with the merge order (the
    exact-integer-cents discipline from numerics.py). One map-side-
    combined groupBy("cell"); driver state is n_cells × d doubles —
    the same broadcast ceiling as the centroid table."""
    d = PQ_M * PQ_SUB_D
    sums = corpus.groupBy("cell").agg(
        F.count("*").alias("_n"),
        *[
            F.sum(F.col(vec_col)[i].cast("decimal(30,15)")).alias(f"_s{i}")
            for i in range(d)
        ],
    )
    out = {}
    for r in sums.collect():
        out[int(r.cell)] = [
            float((r[f"_s{i}"] or 0) / r._n) for i in range(d)
        ]
    return out




def pq_encode(
    corpus: DataFrame, _books: "list | None" = None
) -> DataFrame:
    """Product-quantization encode (Jégou et al. 2011, public): split
    each d=64 embedding into PQ_M=8 contiguous subvectors, assign each
    to its nearest of PQ_K=64 codebook entries (L2), and pack the
    eight 6-bit code indices into one 48-bit integer — a ~43× memory
    reduction (256 float32 bytes → 6 code bytes) that makes
    billion-vector ANN tables RAM-resident; distances are then
    evaluated against codes via per-subspace lookup tables (ADC).

    Codebook: per-subspace k-means trained on a bounded deterministic
    sample (_pq_train_books / _pq_train_local — round 13; the old
    first-PQ_K-rows sampled codebook pinned ADC recall@5 at 0.24 on
    the fixture, the trained 8×64 book reaches ~0.36 five-probe /
    0.33 all-probe, pinned in tests/test_rowsonly.py). ``_books``
    lets the ADC probe engines share one trained book with the encode
    instead of re-training.

    Determinism: the trainer is numpy over a vec_id-ordered sample
    (bit-reproducible — see _pq_train_local); subvector distances are
    sequential F.aggregate folds over zip_with squared differences
    (double ops in array order); the per-subspace argmin is
    array_min over struct(dist, cid) — lexicographic with the cid
    tiebreak, the same order the old min(struct) aggregate used; the
    reconstruction error is assembled in FIXED order (e0+e1+…+e7 over
    literal indices, never a float sum aggregate whose accumulation
    order floats). Replayed bit-exactly in python in
    tests/test_rowsonly.py.

    Scale shape (round 13): the encode is ONE Arrow-batched numpy map
    stage (mapInArrow — the q_corr_matrix_gram discipline for dense
    numeric kernels, minus even the pandas hop: the embedding list
    column flattens to its contiguous Arrow values buffer, so no
    per-row python object is ever built). The n×PQ_M×PQ_K distance
    arithmetic is 4.1e9 double ops at 1M vectors: the original
    join+groupBy shape paid a 512M-row shuffle on top of it (174 s), a
    pure Catalyst higher-order-function rewrite still evaluated every
    lambda INTERPRETED per element (140 s), and a pandas-object path
    spent half its time materializing 1M python arrays (73 s) —
    vectorized numpy over the flat buffer runs the same ops in C. No
    shuffle at all; the codebook (4096 doubles) rides the closure.

    Bit-exactness with the python replay is preserved by operand
    order: the subspace distance is an EXPLICIT left fold over the
    PQ_SUB_D squared differences (one vectorized add per dim, in dim
    order — np.sum(axis=...) must NOT be used here: numpy's pairwise
    reduction tree engages at exactly 8 elements and differs from the
    sequential fold by 1 ULP on ~40% of sums, r13 review finding);
    argmin's first-occurrence rule IS the lowest-cid tiebreak; the
    error accumulates in subspace order; rounding stays in Spark
    (F.round, unchanged engine)."""
    books = _books if _books is not None else _pq_train_books(corpus)
    label_t = corpus.schema["label"].dataType.simpleString()
    d = PQ_M * PQ_SUB_D

    def encode(it):
        import numpy as np
        import pyarrow as pa

        C = [np.asarray(b, dtype=np.float64) for b in books]
        for batch in it:
            n = batch.num_rows
            if not n:
                continue
            emb = batch.column(2)
            flat = emb.flatten()
            if len(flat) != n * d:
                raise ValueError(
                    f"pq_encode needs fixed {d}-dim embeddings; got "
                    f"{len(flat)} values for {n} rows"
                )
            X = np.asarray(flat, dtype=np.float64).reshape(n, d)
            code = np.zeros(n, dtype=np.int64)
            err = np.zeros(n, dtype=np.float64)
            for s in range(PQ_M):
                Xs = X[:, s * PQ_SUB_D:(s + 1) * PQ_SUB_D]
                sq = (Xs[:, None, :] - C[s][None, :, :]) ** 2
                # sequential left fold over dims — see docstring
                d2 = sq[:, :, 0].copy()
                for j in range(1, PQ_SUB_D):
                    d2 += sq[:, :, j]
                cid = d2.argmin(axis=1)
                code |= cid.astype(np.int64) << (PQ_BITS * s)
                err += d2[np.arange(n), cid]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    batch.column(1),
                    pa.array(code),
                    pa.array(err),
                ],
                names=["vec_id", "label", "pq_code", "recon_err"],
            )

    enc = corpus.select("vec_id", "label", "embedding").mapInArrow(
        encode,
        schema=(
            f"vec_id long, label {label_t}, pq_code long, "
            "recon_err double"
        ),
    )
    return enc.select(
        "vec_id", "label", "pq_code",
        F.round("recon_err", 6).alias("recon_err"),
    )


@query(
    "q_embed_pq",
    rows_only_reason="the k-means-trained codebook is deterministic "
    "given the vec_id-ordered training sample, but neither the numpy "
    "Lloyd iterations nor the L2 argmin over float distances has a "
    "tractable SQL mirror at PQ_M×PQ_K scale; determinism is pinned by "
    "tests/test_rowsonly.py::test_pq_encode_replays_exactly (bit-exact "
    "python replay of the trained codebook, sequential fold, argmin "
    "tiebreak, and fixed-order error assembly for every fixture "
    "vector).",
    doc="Product-quantization encode of the embedding corpus: 8×6-bit "
    "codes (~43× compression of d=64 float32) against a per-subspace "
    "k-means-trained codebook + per-vector reconstruction error — the "
    "ANN memory layout for billion-vector tables, with the codebook "
    "broadcast and no d- or k-scaled shuffle.",
)
def q_embed_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See pq_encode. The IVF keys give the cell-pruned CANDIDATE
    plan; PQ gives the in-cell MEMORY plan (IVF-PQ is the composition
    every billion-scale ANN system ships). This key pins the encode;
    ADC probing scores codes against the closure-carried 512-entry
    per-probe lookup table in place of raw centroids."""
    t = load_tables(spark, sf_dir)
    return pq_encode(t["embeddings"])


def _pq_anchor_table(anchors: dict) -> "tuple[list, int]":
    """Dense [n_slots][d] anchor lookup table + the slot count: row i
    is cell i's anchor, missing/out-of-range cells map to the LAST row
    (all zeros — residual degenerates to the raw vector there, the
    same rule on the encode and probe sides so scores stay
    consistent). Bounded by max cell id — cells are the coarse
    quantizer's 0..k-1 labels, so the table is ~n_cells rows."""
    d = PQ_M * PQ_SUB_D
    hi = max(anchors) if anchors else -1
    table = [[0.0] * d for _ in range(hi + 2)]
    for c, a in anchors.items():
        table[c] = [float(x) for x in a]
    return table, hi + 2


def _pq_codes(
    df: DataFrame,
    books: list,
    vec_col: str = "v",
    anchors: "dict | None" = None,
) -> DataFrame:
    """Stamp a ``pq_code`` column onto ``df`` (the persisted-index
    encode — r13 verdict item 2): the same Arrow-batched numpy kernel
    as pq_encode (sequential per-dim fold, argmin first-occurrence
    tiebreak — the replay-pinned float algebra), minus the recon_err
    exhibit column, and carrying EVERY input column through so the
    codes ride IN the corpus rows. That choice is the crash-ordering
    design: a separate codes sidecar (FAISS's literal layout) can
    desynchronize from the corpus when an append dies between the two
    writes — ghost codes or silently un-probeable rows — whereas a
    code column makes every corpus row atomically complete, and
    parquet's columnar pruning still gives the probe its 6-byte-per-
    row read (the scan materializes only vec_id/cell/pq_code).

    ``anchors`` (round 15 — r14 verdict item 1, residual IVF-PQ):
    codes quantize v − anchor[cell] instead of the raw vector (Jégou
    et al. 2011 §IV / the FAISS IVFPQ composition). The subtraction is
    one vectorized elementwise op per batch against the broadcast
    anchor table; a cell with no anchor uses the zero anchor (raw
    encode) — the probe side applies the identical rule."""
    d = PQ_M * PQ_SUB_D
    cols = df.columns
    vpos = cols.index(vec_col)
    cpos = cols.index("cell") if anchors is not None else -1
    atable = _pq_anchor_table(anchors)[0] if anchors is not None else None
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", pq_code long"

    def encode(it):
        import numpy as np
        import pyarrow as pa

        C = [np.asarray(b, dtype=np.float64) for b in books]
        A = None if atable is None else np.asarray(atable, dtype=np.float64)
        for batch in it:
            n = batch.num_rows
            if not n:
                continue
            flat = batch.column(vpos).flatten()
            if len(flat) != n * d:
                raise ValueError(
                    f"pq encode needs fixed {d}-dim vectors; got "
                    f"{len(flat)} values for {n} rows"
                )
            X = np.asarray(flat, dtype=np.float64).reshape(n, d)
            if A is not None:
                cells = np.asarray(
                    batch.column(cpos).to_numpy(zero_copy_only=False),
                    dtype=np.int64,
                )
                idx = np.where(
                    (cells >= 0) & (cells < len(A) - 1), cells, len(A) - 1
                )
                X = X - A[idx]
            code = np.zeros(n, dtype=np.int64)
            for s in range(PQ_M):
                Xs = X[:, s * PQ_SUB_D:(s + 1) * PQ_SUB_D]
                sq = (Xs[:, None, :] - C[s][None, :, :]) ** 2
                # sequential left fold over dims (see pq_encode)
                d2 = sq[:, :, 0].copy()
                for j in range(1, PQ_SUB_D):
                    d2 += sq[:, :, j]
                code |= d2.argmin(axis=1).astype(np.int64) << (PQ_BITS * s)
            yield pa.RecordBatch.from_arrays(
                [batch.column(j) for j in range(len(cols))]
                + [pa.array(code)],
                names=cols + ["pq_code"],
            )

    return df.mapInArrow(encode, schema=out_schema)


def _pq_books_json(books: list, residual: bool = True) -> str:
    import json

    return json.dumps({
        "m": PQ_M, "k": PQ_K, "sub_d": PQ_SUB_D, "bits": PQ_BITS,
        "residual": residual, "books": books,
    })


def _pq_meta_read(spark: SparkSession, path: str, objs: dict) -> dict:
    """The trained codebook metadata from the pqbooks pointer object
    (one json row; 4096 doubles — driver/broadcast-bounded by
    construction). ``residual`` is False for stores attached by a
    pre-round-15 release (raw-vector codes) — the probe honors the
    stored flag, so old attachments keep answering until re-attached."""
    import json
    import os

    # round 15: the codebook is a protocol FILE inside the pqbooks
    # object (one FS read, no Spark job per probe); attachments from
    # the 1-row-parquet era fall back to the dataset read
    io = StoreIO(path, spark)
    books_file = os.path.join(path, objs["pqbooks"], _PQ_BOOKS_FILE)
    try:
        meta = json.loads(io.read_bytes(books_file).decode("utf-8"))
    except (OSError, ValueError) as e:
        # the _idstate_read rule (round-16 advice): a PRESENT round-15
        # protocol file is authoritative for its object — raise a clear
        # error instead of falling through to a parquet read of a dir
        # whose only file IS the non-parquet json (opaque footer
        # error). Only a genuinely absent file means a legacy (1-row
        # parquet) attachment. Unlike the idstate sidecar there is no
        # safe degrade here: the codebook is required to decode.
        if io.exists(books_file):
            raise ValueError(
                f"corrupt pqbooks protocol file {books_file!r} — "
                "re-attach with pq_attach to rebuild the codebook"
            ) from e
        row = spark.read.parquet(
            os.path.join(path, objs["pqbooks"])
        ).collect()[0]
        meta = json.loads(row.books)
    if (meta["m"], meta["k"], meta["sub_d"]) != (PQ_M, PQ_K, PQ_SUB_D):
        raise ValueError(
            "pq books were trained with different PQ geometry: "
            f"{meta['m']}x{meta['k']} sub_d={meta['sub_d']}"
        )
    meta["residual"] = bool(meta.get("residual", False))
    return meta


def _pq_books_read(spark: SparkSession, path: str, objs: dict) -> list:
    """The trained codebook lists — see _pq_meta_read."""
    return _pq_meta_read(spark, path, objs)["books"]


def _pq_anchors_read(
    spark: SparkSession, path: str, objs: dict
) -> "dict | None":
    """{cell: [d floats]} from the pqanchors pointer object, or None
    for a raw-code (pre-round-15) attachment. n_cells × d doubles —
    the centroid table's broadcast ceiling."""
    import json
    import os

    if "pqanchors" not in objs:
        return None
    # round 15: protocol file first (no Spark job — json doubles
    # round-trip bit-exactly via repr/parse), legacy parquet fallback
    io = StoreIO(path, spark)
    anchors_file = os.path.join(path, objs["pqanchors"], _PQ_ANCHORS_FILE)
    try:
        cells = json.loads(
            io.read_bytes(anchors_file).decode("utf-8")
        )["cells"]
        return {int(c): [float(x) for x in av] for c, av in cells}
    except (OSError, ValueError, KeyError) as e:
        # same authority rule as _pq_meta_read (round-16 advice): a
        # present-but-unreadable protocol file must not fall through to
        # a parquet read of its own non-parquet bytes
        if io.exists(anchors_file):
            raise ValueError(
                f"corrupt pqanchors protocol file {anchors_file!r} — "
                "re-attach with pq_attach to rebuild the anchors"
            ) from e
    return {
        int(r.cell): [float(x) for x in r.av]
        for r in spark.read.parquet(
            os.path.join(path, objs["pqanchors"])
        ).collect()
    }


def _pq_anchors_write(
    spark: SparkSession, path: str, objs: dict, anchors: dict
) -> None:
    """Persist the residual anchors as a protocol FILE inside the
    pqanchors pointer object (round 15 — the idstate sidecar
    discipline: bounded driver-side state should not cost a Spark
    write job; json doubles round-trip bit-exactly)."""
    import json
    import os

    StoreIO(path, spark).write_bytes(
        os.path.join(path, objs["pqanchors"], _PQ_ANCHORS_FILE),
        json.dumps(
            {
                "cells": [
                    [int(c), [float(x) for x in a]]
                    for c, a in sorted(anchors.items())
                ]
            }
        ).encode("utf-8"),
    )


def pq_attach(
    spark: SparkSession, path: str, _books: "list | None" = None
) -> dict:
    """Attach product quantization to a persisted IVF index (r13
    verdict item 2 — the FAISS IVF-PQ layout, adapted to raw parquet):
    train the codebook from the stored corpus (hash-pruned
    deterministic sample — _pq_train_books), re-write the corpus as a
    new versioned object whose rows carry a ``pq_code`` column, and
    publish the trained book as a ``pqbooks`` pointer object — one
    atomic swap, so readers see the store with PQ or without, never
    half. From then on:

    * ivf_append encodes ONLY its delta with the stored book against
      the stored anchors (no retraining, no re-encode — the O(delta)
      append contract holds); the code lands in the same row write as
      the vector, so no crash ordering can desynchronize codes from
      corpus.
    * ivf_compact carries codes AND anchors through its live rewrite
      (cells unchanged); ivf_recluster keeps the book but must
      recompute anchors and re-encode — residual codes are
      cell-RELATIVE, and the recluster moved every row's cell (the
      rewrite it was already paying; the re-encode rides in the same
      map stage).
    * pq_probe_stored scores the STORED codes with no per-call Lloyd
      and no raw-vector reads (columnar pruning: the probe scan
      materializes vec_id/cell/pq_code only).
    * a REBUILD (ivf_write / api.index_build) drops PQ — its corpus is
      new data, so the book must retrain: call pq_attach again.

    Tombstoned rows are encoded too (harmless — probes read the live
    view); they fall out at the next compact. ``_books`` attaches a
    caller-trained codebook instead of training from the live view
    (the FAISS pattern of passing a pre-trained quantizer — benches
    with planted structure use it; it is trained on RESIDUALS, so
    callers train via _pq_train_books with the store's anchors).

    Round 15 (r14 verdict item 1 — RESIDUAL coding, the FAISS IVFPQ
    composition): codes quantize v − anchor[cell] instead of the raw
    vector, where the per-cell anchors are deterministic decimal-exact
    cell means persisted as a ``pqanchors`` pointer object in the same
    swap as the books and the coded corpus. Residuals concentrate the
    distribution each subquantizer sees (the anchor carries the cell's
    location, the 48-bit code only describes the within-cell offset) —
    recall@5 on the fixture probes rose from 0.33–0.36 (raw codes,
    rounds 13–14) to well above the 0.5 target (pinned in
    tests/test_rowsonly.py). Also r14 verdict item 6: the attach no
    longer re-reads the written corpus to count codes (the encode is
    row-for-row, so the staged corpus count IS the code count) and the
    trainer reuses that one count instead of running its own — two
    fewer corpus-wide jobs per attach. Returns {n_codes, version}."""
    import os

    _ivf_404_probe(spark, path)
    with _ivf_mutation_lock(spark, path):
        io = StoreIO(path, spark)
        lay = _ivf_preamble(spark, io, path)
        objs = lay["objects"]
        corpus = spark.read.parquet(os.path.join(path, objs["corpus"]))
        live = corpus
        tomb = _tombstones(spark, path, objs)
        if tomb is not None:
            live = corpus.join(F.broadcast(tomb), "vec_id", "left_anti")
        # ONE corpus-wide count serves the hash-cut threshold AND the
        # response statistic (encode is 1:1, so codes == corpus rows).
        # The trainer's threshold sees the raw-corpus count even though
        # it samples the live view: deterministic either way, and a
        # tombstone-diluted sample only shrinks below PQ_TRAIN_N when
        # nearly the whole corpus is dead — compact first in that state.
        n_corpus = corpus.count()
        anchors = _pq_cell_anchors(corpus, vec_col="v")
        books = (
            _books if _books is not None
            else _pq_train_books(
                live, vec_col="v", anchors=anchors, n=n_corpus
            )
        )
        coded = _pq_codes(
            corpus.drop("pq_code") if "pq_code" in corpus.columns
            else corpus,
            books,
            anchors=anchors,
        )
        v = lay["version"] + 1
        new_objs = {
            **objs,
            "corpus": object_dir("corpus", v),
            "pqbooks": object_dir("pqbooks", v),
            "pqanchors": object_dir("pqanchors", v),
        }
        cdir = os.path.join(path, new_objs["corpus"])
        coded.write.mode("overwrite").partitionBy("cell").parquet(cdir)
        if not _corpus_has_cells(spark, cdir):
            _one_slice_df(spark, [], coded.schema).write.mode(
                "append"
            ).parquet(cdir)
        # protocol files, not 1-row parquet datasets (round 15): the
        # codebook json and the anchors are driver-bounded sidecar
        # state — a direct stream write each, no Spark write jobs
        StoreIO(path, spark).write_bytes(
            os.path.join(path, new_objs["pqbooks"], _PQ_BOOKS_FILE),
            _pq_books_json(books).encode("utf-8"),
        )
        _pq_anchors_write(spark, path, new_objs, anchors)
        retired = retired_union(
            None if lay.get("legacy") else lay,
            {objs["corpus"]}
            | {objs[k] for k in ("pqbooks", "pqanchors") if k in objs},
            new_objs.values(),
        )
        pointer_write(
            io, path,
            {"version": v, "objects": new_objs, "retired": retired},
        )
        _ivf_touch_marker(spark, path)
        return {"n_codes": n_corpus, "version": v}


def pq_probe_stored(
    spark: SparkSession,
    path: str,
    probe_ids: list,
    k: int = 5,
    n_probe: int | None = None,
    refine: int | None = None,
) -> DataFrame:
    """ADC top-k over the STORED codes of a PQ-attached index — the
    probe path with NO per-call training or encoding (r13 verdict
    item 2; the per-call Lloyd the round-13 probes paid is gone): the
    codebook is one stored json row, the per-probe L2 lookup table is
    P×PQ_M×PQ_K doubles computed driver-side in the replay-pinned pure-
    python seq_l2 order (the probe vectors come from one id-filtered,
    column-pruned vec_id+v read of the live corpus; ids that are not
    live — absent or tombstoned — neither probe nor answer), and the
    code scan materializes ONLY the
    vec_id/cell/pq_code columns (parquet columnar pruning — 6 bytes of
    code per row in place of 256B of floats, which is why PQ wins at
    100 TB). ``n_probe=None`` scores every live code (full-scan ADC,
    q_sim_topk_pq's contract); ``n_probe=K`` scores only each probe's
    K nearest cells by squared centroid distance (IVF-PQ,
    q_sim_topk_ivfpq's contract) — the cell filter prunes the
    cell-partitioned corpus at the scan, and each probe's own cell
    mask rides the closure. Probes beyond _PQ_MAX_PROBES are scored in
    batches of that size (one scan per batch — advice r13: the old
    hard cap refused library callers outright). Deleted ids neither
    probe nor answer (the live view masks tombstones).

    RESIDUAL scoring (round 15 — r14 verdict item 1): a store attached
    with residual codes (the books json's ``residual`` flag; every
    round-15 attach) is scored through the FAISS IVFPQ decomposition
    of ‖q − (a_c + r̂)‖² = ‖q − a_c‖² + Σ_s (T2[c][s][code_s] +
    T3[s][code_s]) where T2[c][s][j] = ‖b_sj‖² + 2·⟨a_c,s, b_sj⟩ is
    probe-INDEPENDENT (one table per cell, shared by every probe in a
    batch) and T3[s][j] = −2·⟨q_s, b_sj⟩ is cell-INDEPENDENT (one
    512-entry table per probe — the exact closure budget the raw LUT
    had). Per-(probe, cell) tables would cost P×C×512 doubles in the
    closure; the decomposition keeps it P×512 + C×512 + P×C, so the
    broadcast bound survives large cell counts. All three tables are
    computed driver-side in the replay-pinned pure-python fold order;
    the executor only gathers and adds in subspace order, so the
    python replay is bit-exact. Pre-round-15 attachments (no flag)
    keep the raw-code LUT path until re-attached.

    ``refine=R`` (round 15 — the FAISS IVFPQR composition, and what
    actually moves recall on weakly clustered data): ADC selects the
    top-R candidates per probe, then an exact sequential-fold L2 on
    the raw vectors (array order — the seq_l2 float sequence) re-ranks
    only those P×R rows and returns the exact-scored top-k as
    (probe_id, vec_id, l2, rank). Honest cost statement: when P×R ≤
    _PQ_REFINE_PUSHDOWN_IDS the candidate ids are materialized (one
    job) and pushed into the refine scan as a vec_id IN filter, so
    parquet row-group stats skip groups holding no candidate — the
    float read really is ~R rows per probe (plus row-group rounding) —
    and the re-rank itself runs DRIVER-SIDE over the collected
    candidate vectors (round 16: P·R·d is bounded by the same cap, so
    the broadcast-join + window job is replaced by one collect and a
    pure-python fold that is bit-identical to the join's
    F.aggregate — pinned by test_pq_refine_driver_matches_join);
    beyond that cap the ids stay distributed and the refine reads the
    (vec_id, v) columns of the probed cells (of the corpus when
    ``n_probe`` is unset), filtering at the broadcast join. Either
    way it reads floats pure ADC would not, which is why refine is an
    OPTION and ADC-only stays the default. Measured on the fixture
    (near-random unit vectors, where 48-bit codes cannot order
    sub-0.1 neighbor gaps: pure-ADC recall@5 ≈ 0.27–0.38 raw OR
    residual): refine=5k lifts recall@5 to 0.81 (sf0.001) / 0.60
    (sf0.1), refine=10k to 0.91 / 0.76."""
    import os

    io = StoreIO(path, spark)
    lay = _ivf_layout(io, path)
    objs = lay["objects"]
    if "pqbooks" not in objs:
        raise ValueError(
            f"no PQ attachment on the index at {path!r} — run "
            "pq_attach first"
        )
    meta = _pq_meta_read(spark, path, objs)
    books = meta["books"]
    anchors = (
        _pq_anchors_read(spark, path, objs) if meta["residual"] else None
    )
    if meta["residual"] and anchors is None:
        raise ValueError(
            f"index at {path!r} has residual PQ books but no pqanchors "
            "object — the layout is torn or from a newer writer"
        )
    corpus = spark.read.parquet(os.path.join(path, objs["corpus"]))
    if "pq_code" not in corpus.columns:
        raise ValueError(
            f"index at {path!r} names pqbooks but its corpus carries "
            "no pq_code column — the layout is from a newer writer"
        )
    tomb = _tombstones(spark, path, objs)
    if tomb is not None:
        corpus = corpus.join(F.broadcast(tomb), "vec_id", "left_anti")
    wanted = sorted({int(i) for i in probe_ids})
    probe_rows = (
        corpus.filter(F.col("vec_id").isin(wanted))
        .select("vec_id", "v")
        .orderBy("vec_id")
        .collect()
    )
    # empty-probe early return matches the populated path's schema:
    # refined answers carry exact l2, ADC-only answers carry adc_l2
    # (round-15 review: the old constant ADC schema made an all-
    # tombstoned probe list union-incompatible with refined results)
    out_schema = (
        "probe_id long, vec_id long, adc_l2 double, rank int"
        if refine is None
        else "probe_id long, vec_id long, l2 double, rank int"
    )
    if not probe_rows:
        return spark.createDataFrame([], out_schema)
    cents = None
    if n_probe is not None:
        cents = [
            (int(r.cell), [float(x) for x in r.cv])
            for r in spark.read.parquet(
                os.path.join(path, objs["centroids"])
            ).collect()
        ]  # bounded by n_cells × d
    coded = corpus.select("cell", "vec_id", "pq_code")
    # candidate depth: the per-batch partial top-k inside the ADC scan
    # must keep refine-many rows when a refine stage follows, or the
    # exact re-rank would only ever see each batch's top-k
    sel_k = k if refine is None else max(int(refine), k)
    atable = n_slots = t2 = None
    if anchors is not None:
        atable, n_slots = _pq_anchor_table(anchors)
        # probe-independent residual term: one [M][K] table per cell
        # slot, computed once per call and shared by every probe batch
        t2 = [_pq_t2_for_anchor(atable[c], books) for c in range(n_slots)]
    parts = []
    all_cells: set = set()
    for lo in range(0, len(probe_rows), _PQ_MAX_PROBES):
        chunk = probe_rows[lo:lo + _PQ_MAX_PROBES]
        pids = [int(r.vec_id) for r in chunk]
        pcells = None
        scan = coded
        if cents is not None:
            pcells = []
            for r in chunk:
                pv = [float(x) for x in r.v]
                ranked = sorted(
                    (_seq_l2(pv, cv), cell) for cell, cv in cents
                )[: n_probe]
                pcells.append(sorted(c for _, c in ranked))
            union_cells = sorted({c for cs in pcells for c in cs})
            all_cells.update(union_cells)
            scan = coded.filter(F.col("cell").isin(union_cells))
        if anchors is None:
            lut = [
                _pq_lut_one([float(x) for x in r.v], books)
                for r in chunk
            ]
            parts.append(_pq_adc_scan(scan, pids, lut, pcells, sel_k))
        else:
            pvs = [[float(x) for x in r.v] for r in chunk]
            lut3 = [_pq_lut3_one(pv, books) for pv in pvs]
            t1 = [
                [_seq_l2(pv, atable[c]) for c in range(n_slots)]
                for pv in pvs
            ]
            parts.append(
                _pq_adc_scan_residual(
                    scan, pids, t1, t2, lut3, pcells, sel_k
                )
            )
    scored = parts[0]
    for df in parts[1:]:
        scored = scored.unionByName(df)
    w = Window.partitionBy("probe_id").orderBy(
        F.col("adc").asc(), F.col("vec_id")
    )
    ranked = scored.select(
        "*", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= sel_k)
    if refine is None:
        return ranked.select(
            "probe_id", "vec_id",
            F.round(F.col("adc"), 6).alias("adc_l2"),
            F.col("rn").cast("int").alias("rank"),
        )
    # exact re-rank of the ADC candidates: P×refine rows join the raw
    # vectors (probed-cells-pruned when n_probe is set) and the probe
    # vectors (driver-bounded one-slice frame); the L2 is the
    # sequential F.aggregate fold — the seq_l2 float sequence — and the
    # final order is (rounded l2 asc, vec_id), the house tie rule
    raw = corpus.select("vec_id", "v")
    if cents is not None and all_cells:
        raw = corpus.filter(
            F.col("cell").isin(sorted(all_cells))
        ).select("vec_id", "v")
    w2 = Window.partitionBy("probe_id").orderBy(
        F.col("l2").asc(), F.col("vec_id")
    )
    if len(probe_rows) * sel_k <= _PQ_REFINE_PUSHDOWN_IDS:
        # bounded candidate set (round 16 — r15 verdict item 5): below
        # the pushdown cap the candidate ids were already collected for
        # the IN-filter pushdown, and P·R·d is driver-bounded by the
        # same cap (≤65536 ids × d doubles — ~32 MB at the fixture's
        # d=64), so the exact re-rank itself now runs DRIVER-SIDE: one
        # collect of the candidates' raw vectors through the pushed
        # vec_id IN scan (parquet row-group stats skip every group
        # holding no candidate — the float read really is ~R rows per
        # probe), then the pure-python _seq_l2 fold — bit-identical to
        # the join branch's F.aggregate/zip_with fold (same doubles,
        # same sequential order; pinned by
        # test_pq_refine_driver_matches_join). The broadcast-join +
        # window job over the raw vectors is gone; rounding and
        # ranking stay IN-PLAN over the one-slice result so ROUND's
        # HALF_UP and the (l2, vec_id) tie rule keep Spark semantics.
        crows = ranked.select("probe_id", "vec_id").collect()
        if not crows:
            return spark.createDataFrame(
                [], "probe_id long, vec_id long, l2 double, rank int"
            )
        vids = sorted({int(r.vec_id) for r in crows})
        vmap = {
            int(r.vec_id): [float(x) for x in r.v]
            for r in raw.filter(F.col("vec_id").isin(vids))
            .select("vec_id", "v").collect()
        }
        pmap = {
            int(r.vec_id): [float(x) for x in r.v] for r in probe_rows
        }
        scored_local = _one_slice_df(
            spark,
            [
                (
                    int(r.probe_id),
                    int(r.vec_id),
                    _seq_l2(pmap[int(r.probe_id)], vmap[int(r.vec_id)]),
                )
                for r in crows
            ],
            "probe_id long, vec_id long, _l2raw double",
        )
        return (
            scored_local.select(
                "probe_id", "vec_id",
                F.round(F.col("_l2raw"), 6).alias("l2"),
            )
            .select("*", F.row_number().over(w2).alias("rn"))
            .filter(F.col("rn") <= k)
            .select(
                "probe_id", "vec_id", "l2",
                F.col("rn").cast("int").alias("rank"),
            )
        )
    # above the cap the candidate set is NOT driver-bounded — it
    # must neither be collected NOR broadcast (round-15 review:
    # the old branch still wrapped it in F.broadcast, which
    # collects every candidate row to the driver — the exact
    # anti-pattern the cap exists to avoid). Leave the strategy to
    # the planner/AQE over the distributed frame.
    cand = ranked.select("probe_id", "vec_id")
    probes_df = _one_slice_df(
        spark,
        [(int(r.vec_id), [float(x) for x in r.v]) for r in probe_rows],
        "probe_id long, pv array<double>",
    )
    l2 = F.aggregate(
        F.zip_with(F.col("pv"), F.col("v"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        raw.join(cand, "vec_id")
        .join(F.broadcast(probes_df), "probe_id")
        .select("probe_id", "vec_id", F.round(l2, 6).alias("l2"))
        .select("*", F.row_number().over(w2).alias("rn"))
        .filter(F.col("rn") <= k)
        .select(
            "probe_id", "vec_id", "l2",
            F.col("rn").cast("int").alias("rank"),
        )
    )


def _seq_l2(a, b) -> float:
    """The replay-pinned sequential-fold squared L2 (pure python)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (x - y) * (x - y)
    return acc


def _pq_lut_one(v: list, books: list) -> list:
    """One probe's [PQ_M][PQ_K] L2 lookup table in seq_l2 order."""
    tab = []
    for s in range(PQ_M):
        sub = v[s * PQ_SUB_D:(s + 1) * PQ_SUB_D]
        tab.append([_seq_l2(sub, books[s][c]) for c in range(PQ_K)])
    return tab


def _seq_dot(a, b) -> float:
    """Sequential-fold dot product — the residual tables' float rule
    (pure python, replayed bit-exactly by the pins)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _pq_t2_for_anchor(anchor: list, books: list) -> list:
    """One cell's probe-independent residual ADC term: T2[s][j] =
    ‖b_sj‖² + 2·⟨a_s, b_sj⟩ (the ⟨a, r̂⟩ and ‖r̂‖² pieces of the FAISS
    IVFPQ expansion, folded per subspace in seq_dot order)."""
    tab = []
    for s in range(PQ_M):
        a_s = anchor[s * PQ_SUB_D:(s + 1) * PQ_SUB_D]
        tab.append([
            _seq_dot(b, b) + 2.0 * _seq_dot(a_s, b) for b in books[s]
        ])
    return tab


def _pq_lut3_one(v: list, books: list) -> list:
    """One probe's cell-independent residual ADC term: T3[s][j] =
    −2·⟨q_s, b_sj⟩ — the same 512-double closure budget per probe as
    the raw-code LUT."""
    tab = []
    for s in range(PQ_M):
        q_s = v[s * PQ_SUB_D:(s + 1) * PQ_SUB_D]
        tab.append([-2.0 * _seq_dot(q_s, b) for b in books[s]])
    return tab


def _pq_adc_scan_residual(
    coded: DataFrame,
    pids: list,
    t1: list,
    t2: list,
    lut3: list,
    pcells,
    k: int,
) -> DataFrame:
    """_pq_adc_scan's residual twin: one Arrow-batched pass over
    (cell, vec_id, pq_code) rows scoring adc = t1[p][cell] +
    Σ_s (T2[cell][s][code_s] + T3[p][s][code_s]) — gathers and adds
    only, in subspace order, so the driver-computed python tables fix
    every float. The T2 gathers are PROBE-INDEPENDENT, so each batch
    gathers them once into an n×M column block shared by every probe
    (measured at 1M codes: per-probe double-gathering T2 cost 7.98 s
    full-scan vs 3.0 s for the raw-code LUT; sharing the T2 columns
    removes half the per-probe gathers at identical floats — the
    per-element sum is still t1 + Σ_s (t2_s + t3_s) in subspace
    order, so the python replay stays bit-exact). Cells outside the
    anchor table (an append into a cell that did not exist at attach
    time would be a protocol bug, but the rule is total anyway) map
    to the zero-anchor slot exactly as the encode side does.
    Per-batch partial top-k as in _pq_adc_scan."""

    def score(it):
        import numpy as np
        import pandas as pd

        T1 = np.asarray(t1, dtype=np.float64)    # P × C
        T2 = np.asarray(t2, dtype=np.float64)    # C × M × K
        L3 = np.asarray(lut3, dtype=np.float64)  # P × M × K
        C = len(T2)
        pid_arr = np.asarray(pids, dtype=np.int64)
        cellsets = (
            None if pcells is None
            else [np.asarray(cs, dtype=np.int64) for cs in pcells]
        )
        for pdf in it:
            if not len(pdf):
                continue
            codes = pdf["pq_code"].to_numpy(dtype=np.int64)
            vids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            cidx = np.where((cells >= 0) & (cells < C - 1), cells, C - 1)
            cids = [
                (codes >> (PQ_BITS * s)) & (PQ_K - 1)
                for s in range(PQ_M)
            ]
            # probe-independent gathers, once per batch: t2g[:, s] is
            # exactly T2[cidx, s, cids[s]] — the value every probe adds
            t2g = np.empty((len(vids), PQ_M), dtype=np.float64)
            for s in range(PQ_M):
                t2g[:, s] = T2[cidx, s, cids[s]]
            for p in range(len(pid_arr)):
                adc = T1[p][cidx]  # fancy indexing: already a fresh array
                for s in range(PQ_M):
                    adc += t2g[:, s] + L3[p, s][cids[s]]
                mask = vids != pid_arr[p]
                if cellsets is not None:
                    mask &= np.isin(cells, cellsets[p])
                v, a = vids[mask], adc[mask]
                sel = np.lexsort((v, a))[:k]  # partial top-k, same order
                if len(sel):
                    yield pd.DataFrame(
                        {
                            "probe_id": pid_arr[p],
                            "vec_id": v[sel],
                            "adc": a[sel],
                        }
                    )

    return coded.mapInPandas(
        score, schema="probe_id long, vec_id long, adc double"
    )


def _pq_adc_scan(
    coded: DataFrame, pids: list, lut: list, pcells, k: int
) -> DataFrame:
    """One Arrow-batched ADC pass over ([cell,] vec_id, pq_code) rows
    (the cell column is only consumed when ``pcells`` gives per-probe
    cell masks — the full-scan ADC path omits it):
    per batch, per probe — unpack the 6-bit codes, gather-and-fold the
    closure-carried LUT in subspace order (the q_embed_pq float rule),
    mask self-matches and (for IVF-PQ) rows outside the probe's own
    cell set, and keep a per-batch partial top-k (map-side combine:
    the global (adc ASC, vec_id) top-k is a subset of the union of
    per-batch top-ks under the same order). Only batches×P×k rows
    reach the caller's final window."""

    def score(it):
        import numpy as np
        import pandas as pd

        L = np.asarray(lut, dtype=np.float64)  # P×M×K
        pid_arr = np.asarray(pids, dtype=np.int64)
        cellsets = (
            None if pcells is None
            else [np.asarray(cs, dtype=np.int64) for cs in pcells]
        )
        for pdf in it:
            if not len(pdf):
                continue
            codes = pdf["pq_code"].to_numpy(dtype=np.int64)
            vids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cells = (
                pdf["cell"].to_numpy(dtype=np.int64)
                if cellsets is not None
                else None
            )
            cids = [
                (codes >> (PQ_BITS * s)) & (PQ_K - 1)
                for s in range(PQ_M)
            ]
            for p in range(len(pid_arr)):
                adc = L[p, 0][cids[0]].copy()
                for s in range(1, PQ_M):
                    adc += L[p, s][cids[s]]
                mask = vids != pid_arr[p]
                if cellsets is not None:
                    mask &= np.isin(cells, cellsets[p])
                v, a = vids[mask], adc[mask]
                sel = np.lexsort((v, a))[:k]  # partial top-k, same order
                if len(sel):
                    yield pd.DataFrame(
                        {
                            "probe_id": pid_arr[p],
                            "vec_id": v[sel],
                            "adc": a[sel],
                        }
                    )

    return coded.mapInPandas(
        score, schema="probe_id long, vec_id long, adc double"
    )


_PQ_MAX_PROBES = 1024  # per-probe LUT state is broadcast — bound it
# refine: collect + IN-pushdown the candidate ids only below this bound
# (above it a driver-side id list is itself the anti-pattern)
_PQ_REFINE_PUSHDOWN_IDS = 65536


def _pq_probe_lut(
    corpus: DataFrame, probe_pred, books: list
) -> "tuple[list, list]":
    """Driver-side per-probe L2 lookup tables: for every probe row
    matching ``probe_pred``, LUT[p][s][c] = sequential-fold L2 of the
    probe's subvector s against codebook entry c — computed in PURE
    python (the same seq_l2 the replay tests run, so scores stay
    bit-identical to the pinned replays; each table is 512 doubles).
    Probes are bounded by contract (every surface passes explicit
    probe predicates over ids); driver memory is P×(d+512) doubles.
    Callers score in _PQ_MAX_PROBES-sized batches (advice r13: the
    old hard cap at 1024 refused larger probe sets outright — the
    per-batch LUT is what must stay broadcast-bounded, not the total).
    Returns (probe_ids, lut) in vec_id order."""
    rows = (
        corpus.filter(probe_pred)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    pids = [int(r.vec_id) for r in rows]
    lut = [
        _pq_lut_one([float(x) for x in r.embedding], books) for r in rows
    ]
    return pids, lut


def pq_adc_topk(
    corpus: DataFrame, probe_pred, k: int = 5, _books: "list | None" = None
) -> DataFrame:
    """Asymmetric distance computation over PQ codes (the probe side of
    q_embed_pq): each probe keeps its RAW subvectors and precomputes an
    L2 lookup table to all PQ_M×PQ_K codebook entries; every corpus
    vector is then scored as the SUM of eight table lookups on its
    unpacked 6-bit codes, never touching the raw corpus floats. This
    is why PQ wins at 100 TB: the scan reads 6-byte codes + a
    closure-carried LUT instead of 256-byte vectors.

    This is the AD-HOC form (train + encode per call, for corpora
    that are plain DataFrames); a PERSISTED index probes its stored
    codes through pq_probe_stored with no per-call Lloyd at all (r13
    verdict item 2). ``_books`` lets callers share one trained book
    across calls (advice r13: the deterministic book is cacheable —
    the declared keys pass the stored one). Probe sets larger than
    _PQ_MAX_PROBES are scored in batches of that size — one code scan
    per batch, LUT state broadcast-bounded per batch (advice r13: the
    old cap refused them).

    Plan: the codebook trains ONCE (_pq_train_books, hash-pruned
    sample) and is shared with the encode; scoring is one Arrow-
    batched numpy map stage per probe batch with a per-batch partial
    top-k (map-side combine — see _pq_adc_scan). ADC accumulates in
    subspace order (the q_embed_pq float rule)."""
    books = _books if _books is not None else _pq_train_books(corpus)
    pids, lut = _pq_probe_lut(corpus, probe_pred, books)
    spark = corpus.sparkSession
    if not pids:
        return spark.createDataFrame(
            [], "probe_id long, vec_id long, adc_l2 double, rank int"
        )
    coded = pq_encode(corpus, _books=books).select("vec_id", "pq_code")
    parts = [
        _pq_adc_scan(
            coded,
            pids[lo:lo + _PQ_MAX_PROBES],
            lut[lo:lo + _PQ_MAX_PROBES],
            None,
            k,
        )
        for lo in range(0, len(pids), _PQ_MAX_PROBES)
    ]
    scored = parts[0]
    for df in parts[1:]:
        scored = scored.unionByName(df)
    w = Window.partitionBy("probe_id").orderBy(
        F.col("adc").asc(), F.col("vec_id")
    )
    return (
        scored.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= k)
        .select(
            "probe_id", "vec_id", F.round(F.col("adc"), 6).alias("adc_l2"),
            F.col("rn").cast("int").alias("rank"),
        )
    )


import threading as _threading

_PQ_STORES: dict = {}
_PQ_STORES_LOCK = _threading.Lock()


def _pq_fixture_fingerprint(sf_dir: str):
    """(mtime_ns, size) of the fixture's embeddings parquet — the
    content-sensitivity key for the per-process store memo (advice
    r14: a regenerated fixture dir must invalidate the memo, not serve
    stale answers). Fixture dirs are local by contract; a non-local or
    vanished path yields None, degrading to path-only memoization."""
    import os

    try:
        st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return None


def _pq_store_for(spark: SparkSession, sf_dir: str) -> str:
    """Build-or-reuse a PQ-attached IVF store over the fixture
    embeddings, memoized per (process, sf_dir): ivf_index(n_cells=16,
    the q_sim_topk_ivf quantizer) → ivf_write → pq_attach. The
    declared PQ keys probe THIS store's persisted codes (r13 verdict
    item 2: no per-call Lloyd, no per-call encode on the probe path);
    the one-time build cost lives here and is shared by q_sim_topk_pq
    and q_sim_topk_ivfpq within a process (the cacheability advice —
    the book is deterministic, so reuse is sound). Advice r14: the
    build runs under a process lock (two concurrent first calls — the
    ThreadingHTTPServer shape — must not race the dict into duplicate
    stores) and the memo is keyed on the fixture file's
    (mtime, size) fingerprint, so a regenerated fixture rebuilds
    instead of answering from the stale store."""
    from ..operators.scans import _roundtrip_dir

    fp = _pq_fixture_fingerprint(sf_dir)
    with _PQ_STORES_LOCK:
        hit = _PQ_STORES.get(sf_dir)
        if hit is not None and hit[0] == fp:
            return hit[1]
        emb = corpus_view(
            load_tables(spark, sf_dir)["embeddings"], "vec_id", "embedding"
        )
        path = _roundtrip_dir("pq_store")
        assigned, cents = ivf_index(emb, n_cells=16)
        ivf_write(assigned, cents, path)
        pq_attach(spark, path)
        _PQ_STORES[sf_dir] = (fp, path)
        return path


@query(
    "q_sim_topk_pq",
    rows_only_reason="scores rest on the float k-means-trained "
    "residual PQ codebook (q_embed_pq's rows-only reason propagates); "
    "quality is pinned by "
    "tests/test_rowsonly.py::test_pq_adc_recall_vs_exact (recall@5 "
    "against the exact L2 top-5 on the fixture — ≥0.55 five-probe "
    "with ADC candidate generation + exact refine, vs 0.36 for the "
    "unrefined raw-code probe of rounds 13–14 — plus a bit-exact "
    "python replay of the residual ADC decomposition and of the "
    "refine fold for one probe).",
    doc="PQ top-k over a PERSISTED residual code column (IVF-PQ's "
    "probe side): ADC via broadcast lookup tables selects top-5k "
    "candidates from 6-bit stored codes, then one broadcast join "
    "re-ranks only those candidates with exact L2 (FAISS IVFPQR) — "
    "the candidate ids push into the refine scan as a vec_id IN "
    "filter, so the float read is row-group-pruned to ~25 rows per "
    "probe, never the corpus.",
    bench=True,
)
def q_sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See pq_probe_stored (full-scan ADC + refine form): probes
    vec_id < 5 (the q_sim_topk probe set), k = 5, refine = 5k over the
    persisted PQ-attached store — directly comparable against the
    exact engine's answer, which is what the recall pin measures.
    Round 15 (r14 verdict item 1): codes are RESIDUAL (v −
    anchor[cell], the FAISS composition; recon err 0.289 vs 0.321 raw
    on the fixture) and the probe refines the ADC top-25 exactly —
    measured recall@5 0.81 at sf0.001 / 0.60 at sf0.1 over 25 probes,
    vs 0.27–0.38 for ANY unrefined 48-bit code on this near-random
    fixture (neighbor gaps sit far below quantization error there, so
    the refine stage, not the encoding, is what clears the 0.5
    target)."""
    return pq_probe_stored(
        spark, _pq_store_for(spark, sf_dir), list(range(5)), k=5,
        refine=25,
    )


def ivfpq_topk(
    corpus: DataFrame,
    probe_pred,
    k: int = 5,
    n_probe: int = 6,
    _books: "list | None" = None,
) -> DataFrame:
    """IVF-PQ — the composition every billion-vector ANN system ships
    (FAISS IVFx,PQy): the IVF coarse quantizer prunes the corpus to
    n_probe cells' worth of CANDIDATES (at scale: parquet partition
    pruning on the cell-partitioned layout, q_sim_topk_ivf), and PQ's
    asymmetric distance scores only those candidates from 6-byte codes
    + a broadcast lookup table (q_sim_topk_pq) — so a probe touches
    ~n_probe/k_cells of the corpus AND never reads raw vectors.

    Plan (round 13, vectorized scoring): probe→cell ranking on the
    broadcast centroid table; the candidate (probe, vec) pairs come
    from the cell equi-join; packed codes join candidates on vec_id
    (ONE exchange, at scale the pruned parquet read); ADC is then one
    Arrow-batched numpy map stage over (probe_id, pq_code) with the
    closure-carried per-probe LUT — fixed-order e0+e1+… per the
    q_embed_pq float rule. The old shape exploded candidates ×PQ_M
    through a three-key join and a groupBy pivot. WindowGroupLimit
    top-k; ADC L2 ranks ascending (the q_sim_topk_pq contract)."""
    assigned, cents = ivf_index(
        corpus_view(corpus, "vec_id", "embedding")
    )
    # _books: callers (and the declared keys, which probe a PERSISTED
    # store's book) share one trained codebook across calls — advice
    # r13: the deterministic book is cacheable
    books = _books if _books is not None else _pq_train_books(corpus)
    pids, lut = _pq_probe_lut(corpus, probe_pred, books)
    spark = corpus.sparkSession
    if not pids:
        return spark.createDataFrame(
            [], "probe_id long, vec_id long, adc_l2 double, rank int"
        )
    coded = pq_encode(corpus, _books=books).select("vec_id", "pq_code")
    # probe -> n_probe nearest cells (L2 on the raw probe vs centroid)
    probes = corpus.filter(probe_pred).select(
        F.col("vec_id").alias("probe_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("pv"),
    )
    # same shuffle-free rank-cells shape as ivf_probe (round 12): the
    # squared-L2 expression is unchanged, struct sort = (d2, cell) order
    ranked = F.slice(
        F.array_sort(
            F.transform(
                F.col("_cs"),
                lambda c: F.struct(
                    F.aggregate(
                        F.zip_with(
                            F.col("pv"),
                            c["cv"],
                            lambda x, y: (x - y) * (x - y),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("d2"),
                    c["cell"].alias("cell"),
                ),
            )
        ),
        1,
        n_probe,
    )
    probe_cells = (
        probes.crossJoin(F.broadcast(_cells_array(cents)))
        .select("probe_id", F.explode(ranked).alias("_pc"))
        .select("probe_id", F.col("_pc.cell").alias("cell"))
    )
    candidates = probe_cells.join(
        assigned.select("vec_id", "cell"), "cell"
    ).select("probe_id", "vec_id")

    def chunk_scorer(cpids, clut):
        def score(it):
            import numpy as np
            import pandas as pd

            L = np.asarray(clut, dtype=np.float64)  # ≤1024×M×K
            pidmap = {int(p): i for i, p in enumerate(cpids)}
            for pdf in it:
                if not len(pdf):
                    continue
                codes = pdf["pq_code"].to_numpy(dtype=np.int64)
                pidx = pdf["probe_id"].map(pidmap).to_numpy(
                    dtype=np.int64
                )
                adc = L[pidx, 0, (codes >> 0) & (PQ_K - 1)].copy()
                for s in range(1, PQ_M):
                    adc += L[
                        pidx, s, (codes >> (PQ_BITS * s)) & (PQ_K - 1)
                    ]
                yield pd.DataFrame(
                    {
                        "probe_id": pdf["probe_id"].to_numpy(
                            dtype=np.int64
                        ),
                        "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                        "adc": adc,
                    }
                )

        return score

    # probe batches of _PQ_MAX_PROBES keep each scoring stage's LUT
    # closure broadcast-bounded (advice r13: the old cap at 1024
    # refused larger probe sets instead of batching them)
    pending = candidates.filter(F.col("probe_id") != F.col("vec_id")).join(
        coded, "vec_id"
    ).select("probe_id", "vec_id", "pq_code")
    parts = []
    for lo in range(0, len(pids), _PQ_MAX_PROBES):
        cpids = pids[lo:lo + _PQ_MAX_PROBES]
        clut = lut[lo:lo + _PQ_MAX_PROBES]
        part = pending
        if len(pids) > _PQ_MAX_PROBES:
            part = part.filter(F.col("probe_id").isin(cpids))
        parts.append(
            part.mapInPandas(
                chunk_scorer(cpids, clut),
                schema="probe_id long, vec_id long, adc double",
            )
        )
    scored = parts[0]
    for df in parts[1:]:
        scored = scored.unionByName(df)
    w = Window.partitionBy("probe_id").orderBy(F.col("adc").asc(), "vec_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= k)
        .select(
            "probe_id", "vec_id", F.round(F.col("adc"), 6).alias("adc_l2"),
            F.col("rn").cast("int").alias("rank"),
        )
    )


@query(
    "q_sim_topk_ivfpq",
    rows_only_reason="IVF cells come from seeded KMeans and the "
    "candidates from the float residual PQ codebook (both parents' "
    "rows-only reasons propagate); quality is pinned by "
    "tests/test_rowsonly.py::test_ivfpq_candidates_subset_and_"
    "consistent (answers come from the probed cells only, candidate "
    "generation scores identically to the full-scan stored-ADC "
    "engine on shared pairs, and the refined scores equal the exact "
    "seq-fold L2).",
    doc="IVF-PQ fused ANN (the FAISS IVFPQR composition): coarse-"
    "quantizer cell pruning + residual asymmetric-distance candidate "
    "generation over 6-bit codes + exact refine of the top-5k — a "
    "probe touches ~n_probe/k_cells of the corpus codes and reads "
    "floats for 25 rows per probe.",
)
def q_sim_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See pq_probe_stored (n_probe + refine form): probes vec_id < 5,
    k = 5, n_probe = 6 of 16 cells, refine = 5k over the persisted
    PQ-attached store — directly comparable to q_sim_topk (exact),
    q_sim_topk_ivf (IVF + exact refine) and q_sim_topk_pq (full-scan
    stored ADC + refine). Round 15: stored codes are RESIDUAL and the
    ADC candidates are exactly re-ranked (r14 verdict item 1); the
    cell filter still prunes the cell-partitioned scan (plan-canaried
    in tests/test_plans.py)."""
    return pq_probe_stored(
        spark, _pq_store_for(spark, sf_dir), list(range(5)), k=5,
        n_probe=6, refine=25,
    )


def _ivf_append_dir() -> str:
    # the shared per-call mkdtemp + exit-time cleanup helper (the
    # joins.py _BUCKET_DIRS lesson) — review r10: don't re-implement it
    from ..operators.scans import _roundtrip_dir

    return _roundtrip_dir("ivf_append")


@query(
    "q_sim_index_append",
    bench=True,
    rows_only_reason="The base index's cells come from seeded KMeans "
    "centroids (q_sim_topk_ivf's reason); the APPEND path itself is "
    "deterministic given those centroids, and "
    "tests/test_rowsonly.py::test_ivf_append_equals_same_quantizer_rebuild "
    "pins append-then-probe row-equal to assigning the union with the "
    "same quantizer, with the base cell files byte-untouched.",
    doc="Incremental IVF index maintenance: append a 20% delta to the "
    "persisted cell layout (assign-only, no re-train, base partitions "
    "untouched) and probe the appended index.",
)
def q_sim_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 10 (r9 verdict item 4): the maintenance path a production
    ANN index lives by. The 80% base corpus trains and writes the IVF
    layout (ivf_index → ivf_write); the 20% delta (vec_id % 5 = 0 —
    the probe ids land in the delta, so the appended rows provably
    participate) goes through ivf_append: one broadcast-k assignment
    pass over ONLY the new rows, appended into the cell-partitioned
    parquet. The probe then runs against the read-back index — same
    contract as q_sim_topk_ivf. At 100 TB the append touches new rows
    only; ivf_imbalance gauges when accumulated appends skew the cells
    enough to warrant a re-train (tools/ivf_bench.py records the
    append-vs-rebuild cost gap)."""
    t = load_tables(spark, sf_dir)
    emb = corpus_view(t["embeddings"], "vec_id", "embedding")
    path = _ivf_append_dir()
    assigned, cents = ivf_index(
        emb.filter(F.col("vec_id") % 5 != 0), n_cells=16
    )
    ivf_write(assigned, cents, path)
    ivf_append(spark, path, emb.filter(F.col("vec_id") % 5 == 0))
    corpus, cents2 = ivf_read(spark, path)
    probes = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"),
        F.col("v").alias("pv"),
        F.col("na").alias("pna"),
    )
    return ivf_probe(corpus, cents2, probes, k=5, n_probe=6)
