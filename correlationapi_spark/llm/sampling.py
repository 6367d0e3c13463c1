"""Deterministic sampling operators for training-data pipelines.

`df.sample()` is seed-dependent AND partitioning-dependent (Bernoulli per
partition-local RNG stream) — re-running after a repartition or an engine
upgrade yields a different sample, which poisons dataset reproducibility.
The pipeline-grade alternative: order rows by a cryptographic hash of a
stable key and cut. The "randomness" is the hash's avalanche; the sample
is a pure function of the DATA, so any engine (here: Spark and the DuckDB
oracle) selects the identical rows.

Related: llm/text.py q_split_stable (hash-modulo train/val/test split)
uses the same principle for partition assignment; this module covers
fixed-SIZE selections (per-stratum quotas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_tables
from ..registry import query


@query(
    "q_sample_stratified",
    oracle="""
        SELECT doc_id, lang, sample_rank FROM (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS sample_rank
            FROM documents
        ) WHERE sample_rank <= 20
    """,
    doc="Stratified sampling: exactly 20 docs per language, selected by "
    "deterministic hash order (reproducible across engines and runs).",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-stratum quotas, unlike sampleBy's Bernoulli approximation
    (± noise per stratum, seed- and partitioning-dependent). One shuffle
    on the stratum key; rank<=k compiles to WindowGroupLimit (plan-
    asserted), so each task keeps a bounded heap — per-stratum quota
    sampling of a 100 TB corpus costs one top-k-per-group pass. md5 of
    the decimal-rendered doc_id gives both engines the identical sort
    key; doc_id tie-break makes the order total (md5 is already unique
    per key here, but the rule is uniform across the repo)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        t["documents"]
        .select("doc_id", "lang", F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= 20)
    )


@query(
    "q_sample_fraction",
    oracle="""
        SELECT doc_id, source
        FROM documents
        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
              % 100 < 10
    """,
    doc="Deterministic 10% Bernoulli-style sample via hash-modulo cut "
    "(stable under repartitioning, engine-independent).",
)
def q_sample_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixed-FRACTION twin of q_sample_stratified: keep a row iff
    hash(key) mod 100 < pct. Purely map-side — no shuffle, no window, no
    state; the filter is evaluated inside the scan stage, so sampling a
    100 TB table costs exactly the scan. Growing the sample (10%→20%)
    keeps prior rows (nested samples), which hash-order selection can't
    offer map-side. Both engines parse the first 8 hex chars of the md5
    as an integer — identical bits, identical rows."""
    t = load_tables(spark, sf_dir)
    bucket = F.conv(F.md5(F.col("doc_id").cast("string")).substr(1, 8), 16, 10).cast(
        "bigint"
    )
    return (
        t["documents"]
        .filter(bucket % 100 < 10)
        .select("doc_id", "source")
    )


@query(
    "q_sample_weighted",
    oracle="""
        WITH w AS (
            SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight
            FROM documents
        ), mx AS (SELECT max(weight) AS w_max FROM w)
        SELECT w.doc_id, w.lang, w.weight
        FROM w, mx
        WHERE CAST(('0x' || substr(md5(CAST(w.doc_id AS VARCHAR)), 1, 10))
                   AS BIGINT) * mx.w_max * 2
              < CAST(1099511627776 AS BIGINT) * w.weight
        ORDER BY w.doc_id
    """,
    doc="Weighted (probability-proportional-to-size) Bernoulli sample: "
    "each doc kept with p = weight/(2*max_weight), membership decided "
    "by an exact integer cross-multiplication of a hash draw — "
    "deterministic, engine-independent, repartition-stable.",
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPS (probability-proportional-to-size) sampling — the shape
    corpus mixing actually needs (long docs carry more tokens, so
    uniform doc sampling under-represents them). Each doc's inclusion
    probability is weight/(2·w_max): a Poisson/Bernoulli design whose
    expected token mass tracks the weights without any global sort or
    fixed-k coordination.

    Determinism discipline: the 'draw' u is the first 10 hex chars of
    md5(doc_id) (u < 2^40, identical on both engines — the
    q_sample_fraction pattern), and membership is u·w_max·2 <
    2^40·weight — an EXACT int64 cross-multiplication (max magnitude
    ~2^55, no overflow, no float division), so the sampled set can
    never flip on rounding, the Q11/Q17/Q20 rule applied to sampling.

    Scale shape: ONE broadcast scalar (the global max weight, a 1-row
    aggregate via crossJoin — the Q22 pattern) + a purely map-side
    filter: sampling a 100 TB corpus costs the scan, no shuffle, no
    window, and the sample is reproducible across engines, runs, and
    repartitionings. (A fixed-k weighted sample — Efraimidis-Spiegelman
    top-k by u^(1/w) — needs transcendental keys whose last-ulp
    cross-engine drift violates the exactness discipline; the
    expected-size PPS form is both the scalable one and the exact
    one.)"""
    t = load_tables(spark, sf_dir)
    w = t["documents"].select(
        "doc_id", "lang", F.col("n_chars").cast("bigint").alias("weight")
    )
    mx = w.agg(F.max("weight").alias("w_max"))
    u = F.conv(
        F.md5(F.col("doc_id").cast("string")).substr(1, 10), 16, 10
    ).cast("bigint")
    return (
        w.crossJoin(F.broadcast(mx))
        .filter(u * F.col("w_max") * F.lit(2) < F.lit(1 << 40) * F.col("weight"))
        .select("doc_id", "lang", "weight")
        .orderBy("doc_id")
    )


@query(
    "q_domain_mix",
    oracle="""
        WITH actual AS (
            SELECT source,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                       AS n_tokens
            FROM documents GROUP BY 1
        ), total AS (SELECT sum(n_tokens) AS n, count(*) AS n_sources
                     FROM actual)
        SELECT source, n_tokens,
               round(CAST(n_tokens AS DOUBLE) / n, 6) AS actual_frac,
               round((1.0 / n_sources)
                     / (CAST(n_tokens AS DOUBLE) / n), 6) AS weight
        FROM actual CROSS JOIN total
    """,
    doc="Training-mixture reweighting: per-source token share vs the "
    "uniform 1/n_sources target (derived in-plan), emitted as sampling "
    "weights.",
)
def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/source mixing — the knob every corpus build turns last:
    measure each source's actual token share, emit weight =
    target_share / actual_share so a weighted sampler (compose with
    q_sample_fraction's hash cut, scaled per source) reproduces the
    target mixture. The target is the UNIFORM mixture 1/n_sources,
    derived IN-PLAN from the same aggregate (round 4: a hard-coded 0.2
    summed to an impossible 4.0 total across the fixture's 20 sources);
    a real run passes its own per-source mixture table instead.

    One aggregation over the corpus (token counts sum map-side), a 1-row
    total (token sum + source count) cross-joined in-plan (never a
    driver action), and a projection. Weights are int/int ratios →
    identical doubles; round 6."""
    t = load_tables(spark, sf_dir)
    actual = (
        t["documents"]
        .groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).alias("n_tokens"))
    )
    total = actual.agg(
        F.sum("n_tokens").alias("n"), F.count("*").alias("n_sources")
    )
    frac = F.col("n_tokens").cast("double") / F.col("n")
    return (
        actual.crossJoin(total)
        .select(
            "source",
            "n_tokens",
            F.round(frac, 6).alias("actual_frac"),
            F.round((F.lit(1.0) / F.col("n_sources")) / frac, 6).alias("weight"),
        )
    )


@query(
    "q_sample_reservoir",
    oracle="""
        WITH h AS (
            SELECT event_type, event_id,
                   md5(CAST(event_id AS VARCHAR)) AS hk
            FROM events
        ),
        r AS (
            SELECT event_type, event_id,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY hk, event_id) AS r
            FROM h
        )
        SELECT event_type, event_id, r FROM r WHERE r <= 20
    """,
    doc="Deterministic per-group 'reservoir' sample: the k=20 rows with "
    "the smallest content-hash per event type — uniform-like, "
    "repartition-stable, reproducible across engines and re-runs "
    "(a true reservoir sample depends on encounter order; ranking a "
    "content hash gives the same statistical effect as a pure "
    "function of the data).",
)
def q_sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-per-group sampling where membership must be a pure function of
    row identity — df.sample()/reservoir algorithms change membership
    with partition layout and encounter order, which breaks
    reproducibility audits. Ranking md5(key) per group is layout-
    independent and engine-portable (the q_sample_* md5-draw family's
    per-group form).

    Scale shape: one per-group window shuffle with WindowGroupLimit
    pushing the rank<=k bound below the exchange — bounded task state,
    ~k rows per group emitted, never a global sort."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("hk", "event_id")
    return (
        t["events"]
        .select(
            "event_type",
            "event_id",
            F.md5(F.col("event_id").cast("string")).alias("hk"),
        )
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 20)
        .select("event_type", "event_id", "r")
    )


@query(
    "q_sample_balanced",
    oracle="""
        WITH quota AS (
            SELECT CAST(min(c) AS BIGINT) AS m FROM (
                SELECT count(*) AS c FROM documents GROUP BY lang
            )
        )
        SELECT doc_id, lang, sample_rank FROM (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS sample_rank
            FROM documents
        ) CROSS JOIN quota WHERE sample_rank <= m
    """,
    doc="Class-balanced downsampling: every language keeps exactly the "
    "minority class's count, selected by deterministic hash order — "
    "the majority-class downsampler an LLM data pipeline runs to "
    "equalize a language (or domain/source) mix.",
)
def q_sample_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample-to-parity: quota = min per-class count, computed in a
    class-sized aggregate and broadcast back; selection is the same
    deterministic md5-order rank as q_sample_stratified, reproducible
    across engines, runs, and repartitioning (the quota is
    data-dependent, so the rank filter cannot compile to a static
    WindowGroupLimit — the per-class window itself bounds task state). Unlike a fixed-fraction sampleBy, the result is
    EXACTLY balanced — the class-mix guarantee domain-rebalancing
    needs (q_domain_mix reweights to arbitrary targets; this is the
    exact-parity special case that never overshoots).

    Scale shape: one class-keyed aggregate (tiny), one broadcast
    scalar, one shuffle on the class key — the identical footprint at
    any corpus size."""
    t = load_tables(spark, sf_dir)
    quota = (
        t["documents"]
        .groupBy("lang")
        .agg(F.count("*").alias("c"))
        .agg(F.min("c").cast("bigint").alias("m"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        t["documents"]
        .select(
            "doc_id", "lang", F.row_number().over(w).alias("sample_rank")
        )
        .crossJoin(F.broadcast(quota))
        .filter(F.col("sample_rank") <= F.col("m"))
        .drop("m")
    )


@query(
    "q_sample_systematic",
    oracle="""
        SELECT doc_id, lang, pos
        FROM (
            SELECT doc_id, lang,
                   CAST(row_number() OVER (
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS BIGINT) AS pos
            FROM documents
        )
        WHERE pos % 10 = 1
    """,
    doc="Systematic 1-in-10 sample under a hash-randomized total order: "
    "every 10th row by (md5(id), id) — fixed-RATE selection with exact "
    "stratification over the hash order, via the range-partitioned "
    "global row number (never a single-partition window).",
)
def q_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic sampling — the survey-statistics workhorse: order by a
    hash (so the order is 'random' but a pure function of the data),
    take every k-th row. Unlike the hash-modulo cut (q_sample_fraction,
    which Binomially wobbles around the target rate), the systematic
    take is EXACTLY ceil(n/k) rows, evenly spread through the hash
    order — the property quota sampling needs.

    Determinism: md5 is the same bytes on both engines; the (md5, id)
    order is total, so ranks and the p % 10 == 1 selection agree
    row-for-row.

    Scale shape: ordering.global_row_number — range-partitioned
    two-pass numbering, NO Exchange SinglePartition (the DuckDB oracle
    uses the plain window because the oracle runs local; the Spark
    side is the cluster plan; same ranks by construction)."""
    from ..ordering import global_row_number

    t = load_tables(spark, sf_dir)
    base = t["documents"].select(
        "doc_id", "lang", F.md5(F.col("doc_id").cast("string")).alias("_h")
    )
    numbered = global_row_number(
        base, [F.col("_h"), F.col("doc_id")], alias="pos"
    )
    return numbered.filter(F.col("pos") % 10 == 1).select(
        "doc_id", "lang", "pos"
    )



@query(
    "q_sample_temperature",
    oracle="""
        WITH actual AS (
            SELECT source,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                       AS n_tokens
            FROM documents GROUP BY 1
        ), total AS (SELECT sum(n_tokens) AS n FROM actual),
        powed AS (
            SELECT source, n_tokens,
                   CAST(n_tokens AS DOUBLE) / n AS p,
                   CAST(round(sqrt(sqrt(CAST(n_tokens AS DOUBLE) / n))
                              * 1000000) AS BIGINT) AS au
            FROM actual CROSS JOIN total
        ), z AS (SELECT sum(au) AS zu FROM powed)
        SELECT source, n_tokens,
               round(p, 6) AS actual_frac,
               round(CAST(au AS DOUBLE) / zu, 6) AS temp_frac,
               round((CAST(au AS DOUBLE) / zu) / p, 6) AS upsample
        FROM powed CROSS JOIN z
    """,
    doc="Temperature-based mixture reweighting (T = 4, i.e. share^(1/4) "
    "renormalized) — the mT5/XLM-R multilingual sampling formula that "
    "upsamples tail sources; the exponent is a double sqrt, so every "
    "step is IEEE-correctly-rounded on both engines.",
)
def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard low-resource upsampling knob: sample source i with
    probability p_i^(1/T) / Σ p_j^(1/T). T = 4 sits in the published
    0.2–0.7 exponent band AND makes the power a composition of two
    sqrt() calls — sqrt is correctly rounded by IEEE-754 REQUIREMENT
    (unlike pow/exp/ln, which are allowed a final-ulp of libm slack),
    so p^0.25 is bit-identical on every engine. The powered shares are
    then pinned to the 1e-6 integer lattice BEFORE the normalizing sum
    (Σ of doubles is accumulation-order-dependent; Σ of int64 is not —
    the q_drift_psi rule).

    One aggregation over the corpus + two 1-row cross joins (token
    total, lattice normalizer) — never a driver action; everything
    after the first partial/final agg runs on |sources| rows."""
    t = load_tables(spark, sf_dir)
    actual = (
        t["documents"]
        .groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).alias("n_tokens"))
    )
    total = actual.agg(F.sum("n_tokens").alias("n"))
    p = F.col("n_tokens").cast("double") / F.col("n")
    powed = actual.crossJoin(total).select(
        "source", "n_tokens", p.alias("p"),
        F.round(F.sqrt(F.sqrt(p)) * 1000000).cast("bigint").alias("au"),
    )
    z = powed.agg(F.sum("au").alias("zu"))
    tf = F.col("au").cast("double") / F.col("zu")
    return powed.crossJoin(z).select(
        "source", "n_tokens",
        F.round(F.col("p"), 6).alias("actual_frac"),
        F.round(tf, 6).alias("temp_frac"),
        F.round(tf / F.col("p"), 6).alias("upsample"),
    )


@query(
    "q_sample_cluster",
    oracle="""
        WITH picked AS (
            SELECT DISTINCT source FROM documents
            WHERE CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT)
                  % 10 < 4
        )
        SELECT d.doc_id, d.source
        FROM documents d JOIN picked USING (source)
        WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % 10 < 5
    """,
    doc="Two-stage cluster sampling: hash-select 40% of sources "
    "(stage 1, whole clusters), then 50% of docs within selected "
    "sources (stage 2) — the survey-statistics design for corpora "
    "where cluster-level costs dominate; both stages content-stable "
    "md5 draws, whole assignment oracle-checked.",
)
def q_sample_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster sampling — when touching a source at ALL has a fixed
    cost (a crawl host, a tape archive, a licensing negotiation), you
    sample CLUSTERS first and subsample inside, accepting higher
    variance per element for far fewer clusters touched. Both draws
    are the deterministic md5 idiom (q_split_hash), so the sample is a
    pure function of the data: stage 1 keeps sources with
    h(source) % 10 < 4, stage 2 keeps docs with h(doc_id) % 10 < 5 —
    expected overall rate 20%, exact membership reproducible anywhere.

    Scale shape: the stage-1 relation is |sources| rows (broadcast
    back); stage 2 is a map-side filter — no data-sized shuffle at
    all."""
    t = load_tables(spark, sf_dir)
    src_bucket = (
        F.conv(F.substring(F.md5(F.col("source")), 1, 8), 16, 10)
        .cast("bigint") % 10
    )
    doc_bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint") % 10
    )
    picked = (
        t["documents"]
        .select("source")
        .distinct()
        .filter(src_bucket < 4)
    )
    return (
        t["documents"]
        .join(F.broadcast(picked), "source")
        .filter(doc_bucket < 5)
        .select("doc_id", "source")
    )
