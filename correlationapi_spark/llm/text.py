"""Text-analysis operators for LLM data pipelines (SURVEY.md §2.9 north-star).

Tokenization is whitespace split (the fixture corpus is space-separated
lowercase tokens, FIXTURES.md). Everything is built from built-in
functions — explode/groupBy joins, higher-order array lambdas — so the
hot path stays JVM-side; no Python UDFs.

Determinism notes: token-count ratios and sentiment averages are exact
rational/dyadic arithmetic (identical IEEE ops on both engines → no
rounding); tf-idf rounds the ln() product to 6 dp and ranks on the
ROUNDED value so cross-libm 1-ulp drift can't reorder the top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_tables
from ..registry import query

def _toks():
    # built lazily: Column construction needs an active SparkContext
    return F.split(F.col("text"), " ")

# In-repo sentiment lexicon over the fixture vocabulary. Polarities are
# dyadic (multiples of 0.5) so per-doc sums are EXACT doubles in any
# accumulation order — the average needs no rounding (numerics.py).
SENTIMENT_LEXICON: list[tuple[str, float]] = [
    ("fast", 1.0),
    ("slow", -1.0),
    ("big", 0.5),
    ("small", -0.5),
    ("dup", -1.0),
    ("merge", 0.5),
    ("spark", 1.0),
    ("scan", -0.5),
    ("filter", 0.5),
    ("stream", 0.5),
]
_LEX_SQL = ", ".join(f"('{w}', {p})" for w, p in SENTIMENT_LEXICON)


@query(
    "q_text_stats",
    oracle="""
        SELECT lang,
               count(*)                                          AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
               CAST(sum(n_chars) AS DOUBLE) / count(*)           AS avg_chars,
               CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*)
                                                                 AS avg_tokens
        FROM documents
        GROUP BY lang
    """,
    doc="Corpus statistics per language: doc/token counts, avg lengths.",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # integer sums ÷ integer counts: exact int64 sums then ONE IEEE
    # division — identical bits on both engines, no rounding needed.
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(_toks())).alias("total_tokens"),
            (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
            (F.sum(F.size(_toks())).cast("double") / F.count("*")).alias("avg_tokens"),
        )
    )


_TFIDF_ORACLE = """
    WITH tok AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
        FROM documents
    ), tf AS (
        SELECT source, term, count(*) AS tf
        FROM tok GROUP BY source, term
    ), df AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
    ), n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.source, tf.term, tf.tf, df.df,
               round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
        FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    )
    SELECT source, term, tf, df, tfidf, rn FROM (
        SELECT *, row_number() OVER (PARTITION BY source
                                     ORDER BY tfidf DESC, term) AS rn
        FROM scored
    ) WHERE rn <= 5
"""


@query(
    "q_text_tfidf",
    oracle=_TFIDF_ORACLE,
    doc="TF-IDF top-5 terms per source (explicit tf × ln(N/df) formula).",
    bench=True,
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-expressible TF-IDF (SURVEY.md §2.9): explode → tf per
    (source, term), df per term, join the df/N sides back in-plan.
    At 100 TB the token explode is map-side; tf/df are two shuffles on
    (source,term)/(term) — no HashingTF, so the result is exact and
    oracle-able (ml.feature.IDF is only a unit-test cross-check).
    Ranking uses the ROUNDED tfidf so cross-engine ln() ulp drift cannot
    flip the top-k ordering.

    Round-2 scale fixes: N is a ONE-ROW aggregate cross-joined in-plan
    (exactly like the oracle's ``CROSS JOIN n``) — no driver-side
    .count() action inside the query path; and the tf⋈df vocabulary join
    carries NO broadcast hint — the document-frequency table is the
    vocabulary, which can exceed any broadcast threshold on a real
    corpus, so AQE picks the strategy from observed sizes."""
    t = load_tables(spark, sf_dir)
    # materialize() the token table (round 15): tf and df both consume
    # it and Catalyst cannot share the diamond — the scan + regex
    # tokenize + explode chain ran twice (verified in
    # plans/r15/q_text_tfidf_before.txt: two Scan parquet + Generate
    # pairs). One lazy localCheckpoint tokenizes once; both aggregates
    # read the same executor-local blocks. Measured 0.85 s → 0.73 s
    # warm at sf0.1; at 100 TB it trades a second full corpus scan +
    # re-tokenize for one token-table write. Row-identical output.
    from ..ordering import materialize

    tok = materialize(
        t["documents"].select(
            "doc_id", "source", F.explode(_toks()).alias("term")
        )
    )
    tf = tok.groupBy("source", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = t["documents"].agg(F.count("*").alias("n_docs"))  # 1 row, in-plan
    scored = (
        tf.join(df, "term")
        .join(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("source", "term", "tf", "df", "tfidf", "rn")
    )


@query(
    "q_text_ngram",
    oracle="""
        WITH toks AS (
            SELECT string_split(text, ' ') AS ts FROM documents
        ), grams AS (
            SELECT unnest(list_transform(range(1, len(ts)),
                          i -> concat(ts[i], ' ', ts[i+1]))) AS bigram
            FROM toks
        )
        SELECT bigram, count(*) AS n
        FROM grams GROUP BY bigram
        ORDER BY n DESC, bigram LIMIT 20
    """,
    doc="Bigram counts via sliding zip (SQL-expressible n-grams).",
)
def q_text_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sliding window via transform over an index sequence — stays in
    # codegen; DuckDB mirrors with list_transform(range). (ml.feature.NGram
    # produces the same grams; cross-checked in unit tests.)
    # zip_with of two shifted slices, not transform(sequence, element_at):
    # CollapseProject would inline the split() per element (see dedup.py
    # _shingle_df — measured 5× slower).
    t = load_tables(spark, sf_dir)
    ts = F.col("ts")
    # greatest(…, 0): single-token docs yield no bigrams, not slice(…, -1)
    n = F.greatest(F.size(ts) - 1, F.lit(0))
    grams = (
        t["documents"]
        .select(F.split("text", " ").alias("ts"))
        .select(
            F.explode(
                F.zip_with(
                    F.slice(ts, 1, n), F.slice(ts, 2, n),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("bigram")
        )
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(20)
    )


@query(
    "q_text_sentiment",
    oracle=f"""
        WITH lex(term, polarity) AS (VALUES {_LEX_SQL}),
        tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        )
        SELECT t.doc_id,
               CAST(sum(l.polarity) AS DOUBLE) / count(*) AS sentiment,
               count(*) AS n_scored
        FROM tok t JOIN lex l ON t.term = l.term
        GROUP BY t.doc_id
    """,
    doc="Lexicon-based sentiment: broadcast-join tokens against an in-repo "
    "polarity lexicon, average per doc.",
)
def q_text_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Dyadic polarities → exact sums in any order → single division,
    # identical on both engines without rounding (module docstring).
    t = load_tables(spark, sf_dir)
    lex = spark.createDataFrame(SENTIMENT_LEXICON, ["term", "polarity"])
    tok = t["documents"].select("doc_id", F.explode(_toks()).alias("term"))
    return (
        tok.join(F.broadcast(lex), "term")
        .groupBy("doc_id")
        .agg(
            (F.sum("polarity").cast("double") / F.count("*")).alias("sentiment"),
            F.count("*").alias("n_scored"),
        )
    )


# Stopword markers for the language-ID heuristic (the fixture corpus is
# synthetic same-vocabulary text, so this exercises the *plumbing* of
# n-gram/stopword language ID, not linguistic accuracy).
_EN_MARKERS = ("the", "a")


@query(
    "q_text_langid",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   CAST(len(list_filter(string_split(text, ' '),
                            x -> x IN {_EN_MARKERS!r})) AS DOUBLE)
                     / len(string_split(text, ' ')) AS marker_frac
            FROM documents
        )
        SELECT doc_id, lang, marker_frac,
               CASE WHEN marker_frac > 0.05 THEN 'en' ELSE 'other' END
                 AS predicted_lang
        FROM scored
    """,
    doc="Language-ID heuristic: stopword-marker fraction + threshold rule.",
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    frac = (
        F.size(F.filter(_toks(), lambda x: x.isin(*_EN_MARKERS))).cast("double")
        / F.size(_toks())
    )
    return t["documents"].select(
        "doc_id",
        "lang",
        frac.alias("marker_frac"),
        F.when(frac > 0.05, "en").otherwise("other").alias("predicted_lang"),
    )


@query(
    "q_text_quality",
    oracle="""
        WITH feats AS (
            SELECT doc_id,
                   len(string_split(text, ' '))                        AS n_tokens,
                   len(list_distinct(string_split(text, ' ')))          AS n_unique,
                   n_chars
            FROM documents
        )
        SELECT doc_id, n_tokens, n_unique,
               CAST(n_unique AS DOUBLE) / n_tokens AS unique_ratio,
               CAST(n_chars AS DOUBLE) / n_tokens  AS avg_token_len,
               0.5 * (CAST(n_unique AS DOUBLE) / n_tokens)
                 + 0.25 * (CASE WHEN n_tokens >= 20 THEN 1.0 ELSE 0.0 END)
                 + 0.25 * (CASE WHEN n_chars BETWEEN 100 AND 600 THEN 1.0 ELSE 0.0 END)
                 AS quality_score
        FROM feats
    """,
    doc="Document quality scoring: lexical-diversity + length heuristics.",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # All components are int÷int divisions and dyadic-constant products —
    # identical IEEE evaluation order on both sides, no rounding.
    t = load_tables(spark, sf_dir)
    n_tokens = F.size(_toks())
    n_unique = F.size(F.array_distinct(_toks()))
    unique_ratio = n_unique.cast("double") / n_tokens
    return t["documents"].select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_unique.alias("n_unique"),
        unique_ratio.alias("unique_ratio"),
        (F.col("n_chars").cast("double") / n_tokens).alias("avg_token_len"),
        (
            0.5 * unique_ratio
            + 0.25 * F.when(n_tokens >= 20, 1.0).otherwise(0.0)
            + 0.25 * F.when(F.col("n_chars").between(100, 600), 1.0).otherwise(0.0)
        ).alias("quality_score"),
    )


@query(
    "q_text_fingerprint",
    oracle="""
        SELECT doc_id,
               list_reduce(
                 [CAST(0 AS BIGINT)] ||
                 list_transform(range(1, least(length(text), 32) + 1),
                                i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)),
                 (acc, x) -> (acc * 31 + x) % 1000000007
               ) AS fingerprint
        FROM documents
    """,
    doc="Document fingerprint: polynomial rolling hash over the first 32 "
    "chars (mod 1e9+7) — exact integer arithmetic, fully oracle-able.",
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DuckDB's list_reduce seeds from the first element, so the zero seed
    # is prepended as a list element on both engines → identical folds.
    t = load_tables(spark, sf_dir)
    codes = F.transform(
        F.sequence(F.lit(1), F.least(F.length("text"), F.lit(32))),
        lambda i: F.ascii(F.substring(F.col("text"), 1, 32).substr(i, F.lit(1))).cast(
            "bigint"
        ),
    )
    fp = F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * 31 + x) % 1000000007,
    )
    return t["documents"].select("doc_id", fp.alias("fingerprint"))


@query(
    "q_text_tokens_bpeish",
    oracle="""
        SELECT doc_id,
               len(string_split(text, ' '))  AS ws_tokens,
               len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpeish_tokens
        FROM documents
    """,
    doc="Token counting: whitespace vs BPE-ish regex segmentation.",
)
def q_text_tokens_bpeish(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The BPE-ish segmenter is the standard pre-tokenizer regex family
    # (letters / digits / other) kept POSIX-simple for dialect agreement.
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        F.size(_toks()).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)).alias(
            "bpeish_tokens"
        ),
    )


@query(
    "q_split_stable",
    rows_only_reason="split assignment hashes with xxhash64 (Spark-specific, "
    "no DuckDB twin). Determinism, disjoint-completeness and fraction bounds "
    "are unit-tested instead.",
    doc="Deterministic train/val/test split (80/10/10) by content-stable "
    "key hash — the reproducible-split primitive for training pipelines.",
)
def q_split_stable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable splitting must be a pure function of a ROW KEY, never of
    partition layout: df.sample()/randomSplit() change membership when the
    file layout or parallelism changes, which silently leaks val/test rows
    into training on the next re-shard. Hash-bucketing the key is the
    scale answer — embarrassingly parallel, no state, stable under any
    repartitioning, and adding data never moves an existing row between
    splits. 80/10/10 via pmod(xxhash64(key), 1000) thresholds."""
    t = load_tables(spark, sf_dir)
    bucket = F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(1000))
    split = (
        F.when(bucket < 800, "train")
        .when(bucket < 900, "val")
        .otherwise("test")
    )
    return (
        t["documents"]
        .select(split.alias("split"))
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("split")
    )


@query(
    "q_text_repetition",
    oracle="""
        WITH grams AS (
            SELECT doc_id,
                   list_transform(range(1, len(string_split(text, ' '))),
                                  i -> concat(string_split(text, ' ')[i], ' ',
                                              string_split(text, ' ')[i+1]))
                       AS gs
            FROM documents
        )
        SELECT doc_id,
               len(gs)                AS n_bigrams,
               len(list_distinct(gs)) AS n_unique,
               1.0 - CAST(len(list_distinct(gs)) AS DOUBLE) / len(gs)
                   AS dup_frac,
               1.0 - CAST(len(list_distinct(gs)) AS DOUBLE) / len(gs) > 0.2
                   AS is_repetitive
        FROM grams
        WHERE len(gs) > 0
    """,
    doc="Within-document repetition (Gopher-style): fraction of duplicate "
    "bigrams per doc; flag docs above 20%.",
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The within-doc repetition filter from the Gopher/MassiveText
    cleanup rules: a document whose bigrams repeat heavily (boilerplate,
    keyword stuffing, template spam) is dropped before training. Duplicate
    fraction = 1 − |distinct bigrams| / |bigrams|.

    Entirely per-row array math — no explode, no shuffle, no state: the
    bigram list is built with the same zip-of-shifted-slices as
    q_text_ngram (the transform(sequence, element_at) spelling re-splits
    the text per element after CollapseProject — measured 5× slower), and
    both counts come from size()/array_distinct() on that one array. At
    100 TB this is a pure map stage pipelined into the scan; int/int
    division → bit-identical doubles, no rounding.

    The ≥1-bigram guard filters on size(split(text)) — an INPUT-column
    predicate — not on the computed n_bigrams alias: CollapseProject +
    filter-pushdown substitute a computed-column predicate with the full
    gram expression (another split+zip per row — measured 0.69 s → 0.48 s
    warm at sf0.1 from this one change). The gram tree is evaluated
    exactly twice (n_bigrams, n_unique); the residual dup_frac arithmetic
    duplicated across the two output columns is integer-cheap."""
    t = load_tables(spark, sf_dir)
    ts = F.col("ts")
    n = F.size(ts) - 1  # filter guarantees >= 1
    grams = F.zip_with(
        F.slice(ts, 1, n), F.slice(ts, 2, n),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    dup_frac = 1.0 - F.col("n_unique").cast("double") / F.col("n_bigrams")
    return (
        t["documents"]
        .filter(F.size(F.split("text", " ")) > 1)
        .select("doc_id", F.split("text", " ").alias("ts"))
        .select(
            "doc_id",
            F.size(grams).alias("n_bigrams"),
            F.size(F.array_distinct(grams)).alias("n_unique"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_unique",
            dup_frac.alias("dup_frac"),
            (dup_frac > 0.2).alias("is_repetitive"),
        )
    )


@query(
    "q_quality_pipeline",
    oracle="""
        WITH d AS (
            SELECT source, doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   min(doc_id) OVER (PARTITION BY text) AS keep_id
            FROM documents
        )
        SELECT source,
               count(*) AS n_total,
               count(*) FILTER (doc_id <> keep_id) AS n_dup,
               count(*) FILTER (doc_id = keep_id AND n_tokens < 20)
                   AS n_short,
               count(*) FILTER (doc_id = keep_id AND n_tokens >= 20)
                   AS n_kept
        FROM d GROUP BY 1
    """,
    doc="Composed C4-style cleanup funnel: exact-dedup survivorship + "
    "length filter, kept/dropped counts per source.",
)
def q_quality_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end cleanup accounting every corpus build publishes:
    per source, how many documents survived dedup and the length rule.
    Rules apply in pipeline order — duplicates drop first (keep_id =
    min doc_id per exact-text class, q_dedup_exact's survivor rule), the
    token-length floor applies to survivors only.

    Scale shape: the survivor table groups by sha256(text) — 32-byte keys
    cross the shuffle, never the text — and joins back on that digest
    (the oracle partitions by raw text: same classes, SQL-side
    convenience). The per-source rollup is a second tiny aggregation.
    Two shuffles total for a full-corpus dedup audit; at 100 TB both are
    the minimum the semantics allow."""
    docs = load_tables(spark, sf_dir)["documents"].withColumn(
        "_h", F.sha2(F.col("text"), 256)
    )
    survivors = docs.groupBy("_h").agg(F.min("doc_id").alias("keep_id"))
    surviving = F.col("doc_id") == F.col("keep_id")
    short = F.size(F.split(F.col("text"), " ")) < 20
    return (
        docs.join(survivors, "_h")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.count(F.when(~surviving, 1)).alias("n_dup"),
            F.count(F.when(surviving & short, 1)).alias("n_short"),
            F.count(F.when(surviving & ~short, 1)).alias("n_kept"),
        )
    )


_PERPLEXITY_ORACLE = """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ), vocab AS (
        SELECT term, count(*) AS cnt FROM tok GROUP BY 1
    ), total AS (
        SELECT sum(cnt) AS n FROM vocab
    )
    SELECT t.doc_id,
           count(*) AS n_tokens,
           round(avg(-ln(CAST(v.cnt AS DOUBLE) / n)), 4) AS avg_neg_logp
    FROM tok t JOIN vocab v ON t.term = v.term CROSS JOIN total
    GROUP BY 1
"""


@query(
    "q_text_perplexity",
    oracle=_PERPLEXITY_ORACLE,
    doc="Unigram-LM perplexity proxy: mean negative log-probability per "
    "document under the corpus unigram distribution.",
)
def q_text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lightest useful language-model quality signal: score each doc
    by the mean −ln p(token) under the corpus's own unigram distribution
    (the KenLM-filtering pattern with the n=1 model — outlier docs score
    high, natural in-domain text low; threshold downstream).

    Two aggregations, both scale-shaped: the vocab build is a
    partial/final count over distinct terms; the scoring pass re-keys
    tokens by term to join the vocab (Catalyst/AQE picks broadcast while
    the vocab fits, shuffle-hash beyond — same logical plan), and the
    corpus total N rides along as a 1-row cross join, never a driver
    action (the q_text_tfidf rule). ln() on bit-identical ratios
    (exact-int division) differs across libm implementations only in the
    last ulp; the per-doc average is rounded to 4 dp — 10 orders above
    the drift."""
    t = load_tables(spark, sf_dir)
    tok = t["documents"].select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    vocab = tok.groupBy("term").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n"))
    return (
        tok.join(vocab, "term")
        .crossJoin(total)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(-F.log(F.col("cnt").cast("double") / F.col("n"))), 4
            ).alias("avg_neg_logp"),
        )
    )


# -- approximate frequent items (Misra-Gries) --------------------------------

FREQ_K = 128       # MG counters per Arrow batch (error <= n_tokens/(K+1))
FREQ_TOP = 50      # rows the declared key emits


def freq_items(docs: DataFrame, text_col: str = "text", k: int = FREQ_K) -> DataFrame:
    """Approximate frequent tokens via mergeable Misra-Gries summaries.

    The exact heavy-hitters plan (explode -> groupBy(token)) shuffles one
    row per DISTINCT token — fine until the vocabulary itself is huge
    (web-scale corpora: billions of distinct tokens, mostly junk). This
    is the bounded-memory path: each Arrow batch keeps at most ``k``
    Misra-Gries counters (decrement-all on overflow), so the shuffle
    carries <= k rows per batch regardless of vocabulary size.

    Guarantees (the classic MG bounds, summed over batches because the
    plain sum-merge never prunes):
    - every emitted count is a LOWER bound on the true count;
    - undercount <= floor(N/(k+1)) where N = total tokens;
    - any token with true count > floor(N/(k+1)) appears in the output
      (if it were evicted from every batch summary, its entire count
      would have been consumed by decrements, which total <= N/(k+1)).

    Encoded in tests/test_rowsonly.py::test_freq_items_error_bounds.

    Output: (token, approx_count, n_total, err_bound). ONE mapInPandas
    pass (no pre-shuffle) + a tiny groupBy over <= k x #batches rows;
    N rides in from a separate pure-codegen scan (sum of split sizes —
    no second Python pass; an earlier null-carrier-row design made the
    filters push below the aggregate and re-evaluate the MG stage twice,
    plan-audited and fixed round 4). Plan canary:
    tests/test_plans.py::test_freq_items_runs_one_python_pass.
    """

    def make_mg(k: int, text_col: str):
        # closure by REQUIREMENT: cloudpickle ships it by value, workers
        # never import this package (io.py read_parquet_any note)
        import pandas as pd

        def mg(batches):
            for pdf in batches:
                counters: dict[str, int] = {}
                for text in pdf[text_col]:
                    for tok in text.split(" "):
                        if tok in counters:
                            counters[tok] += 1
                        elif len(counters) < k:
                            counters[tok] = 1
                        else:
                            # decrement-all; evict zeros (amortized O(1)
                            # per token: each decrement pays for one
                            # prior increment)
                            dead = []
                            for t2 in counters:
                                counters[t2] -= 1
                                if counters[t2] == 0:
                                    dead.append(t2)
                            for t2 in dead:
                                del counters[t2]
                yield pd.DataFrame(
                    {
                        "token": list(counters.keys()),
                        "cnt": list(counters.values()),
                    }
                )

        return mg

    # one NULL filter feeding BOTH passes: the MG worker's .split would
    # crash on None, and an unfiltered totals scan would count a
    # different row set than the worker iterates
    base = docs.select(F.col(text_col).alias(text_col)).filter(
        F.col(text_col).isNotNull()
    )
    summaries = base.mapInPandas(
        make_mg(k, text_col), schema="token string, cnt long"
    )
    merged = summaries.groupBy("token").agg(F.sum("cnt").alias("approx_count"))
    # N from a pure-codegen scan: size(split) counts exactly what the MG
    # worker's text.split(" ") iterates (empty strings included)
    totals = base.agg(
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("n_total")
    )
    return (
        merged.crossJoin(totals)
        .withColumn(
            "err_bound", F.floor(F.col("n_total") / F.lit(k + 1)).cast("long")
        )
    )


@query(
    "q_agg_freq_items",
    rows_only_reason="Misra-Gries summaries are sketch/order dependent "
    "(per-batch counters), not SQL-reproducible; the MG lower-bound, "
    "error-bound and recall guarantees are unit-tested against exact "
    "counts in tests/test_rowsonly.py::test_freq_items_error_bounds.",
    doc="Approximate frequent tokens (mergeable Misra-Gries, bounded "
    "memory): top tokens with certified undercount bound.",
)
def q_agg_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters over the corpus without a distinct-token shuffle —
    the profiling aggregate every large-corpus build runs first (stopword
    discovery, boilerplate detection, tokenizer QA). Top-FREQ_TOP by
    approximate count (TakeOrderedAndProject: per-partition heaps, no
    global sort); ties break on token for determinism."""
    t = load_tables(spark, sf_dir)
    return (
        freq_items(t["documents"], "text", FREQ_K)
        .orderBy(F.desc("approx_count"), "token")
        .limit(FREQ_TOP)
        .select("token", "approx_count", "n_total", "err_bound")
    )


_PACK_CAPACITY = 512

# Oracle notes (round 7, VERDICT r6 + ADVICE):
#  * the windowed sum MUST be CAST to BIGINT — DuckDB widens a windowed
#    sum of BIGINT to HUGEINT, which pandas materializes as float64, and
#    the driver's value-hash is type-sensitive (int64 32 != float64 32.0;
#    the r6 hash-FAIL with byte-identical values). numerics.py records the
#    rule: no HUGEINT/DECIMAL may reach an oracle output projection.
#  * the frame is explicit ROWS over the TOTAL order (doc_id, n_tok) —
#    DuckDB's default RANGE frame gives tied doc_ids the same cumulative
#    sum, diverging from global_running_sum's row semantics the moment a
#    fixture repeats an id.
def _pack_oracle(n_tok_sql: str, capacity: int) -> str:
    """DuckDB oracle for pack_chunks_layout under any token counter.

    Zero-token documents are excluded (mirroring the engine): they span
    no chunk, and their would-be last_chunk expression floor((off-1)/cap)
    diverges across engines at off=0 (Spark floors to -1, DuckDB's //
    truncates to 0). Whitespace counts can never be 0 (split('') is
    ['']), but regex counters can (empty/whitespace-only text)."""
    return f"""
    WITH tok AS (
        SELECT doc_id, CAST({n_tok_sql} AS BIGINT) AS n_tok
        FROM documents
        WHERE {n_tok_sql} > 0
    ), cum AS (
        SELECT doc_id, n_tok,
               CAST(sum(n_tok) OVER (
                   ORDER BY doc_id, n_tok
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) - n_tok AS off
        FROM tok
    )
    SELECT doc_id, n_tok, off,
           (off // {capacity}) AS first_chunk,
           ((off + n_tok - 1) // {capacity}) AS last_chunk,
           ((off + n_tok - 1) // {capacity})
               - (off // {capacity}) + 1 AS n_chunks
    FROM cum
"""


_PACK_ORACLE = _pack_oracle("len(string_split(text, ' '))", _PACK_CAPACITY)


@query(
    "q_pack_chunks",
    oracle=_PACK_ORACLE,
    doc="GPT-style concat-and-chunk packing layout: map each document's "
    "token span to fixed 512-token training chunks (scalable global "
    "running sum, no single-partition window).",
)
def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM pretraining (round 6) — the fixture
    exhibit of pack_chunks_layout, pinned against the DuckDB oracle."""
    t = load_tables(spark, sf_dir)
    return pack_chunks_layout(t["documents"], _PACK_CAPACITY)


_PACK_BPEISH_CAPACITY = 256

_PACK_BPEISH_ORACLE = _pack_oracle(
    "len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))",
    _PACK_BPEISH_CAPACITY,
)


@query(
    "q_pack_bpeish",
    oracle=_PACK_BPEISH_ORACLE,
    doc="Tokenizer-faithful packing layout (round 7): the same "
    "concat-and-chunk engine as q_pack_chunks driven by the BPE-ish "
    "regex token counter instead of whitespace counts, 256-token chunks "
    "— the budget a real pretraining dataloader packs against.",
    bench=True,
)
def q_pack_bpeish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pack_chunks_layout is parameterized on the token counter
    (round 7): whitespace counts are engine-portable but undercount
    punctuation-heavy text by 2-3x against a real tokenizer; the BPE-ish
    pre-tokenizer regex (q_text_tokens_bpeish's segmenter) tracks real
    budgets far closer, and the layout reduction — one global running
    sum — is identical. Same scale shape, different counter column."""
    t = load_tables(spark, sf_dir)
    return pack_chunks_layout(
        t["documents"],
        _PACK_BPEISH_CAPACITY,
        n_tok=F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0
            )
        ),
    )


def pack_chunks_layout(
    docs: DataFrame, capacity: int, n_tok: Column | None = None
) -> DataFrame:
    """GPT-style concat-and-chunk packing layout over (doc_id, text)
    rows: concatenate the corpus in deterministic doc_id order and cut
    it into fixed ``capacity``-token training chunks — each document's
    layout is (first_chunk, last_chunk, n_chunks) derived from its
    exclusive token offset. This IS the layout computation behind
    concat-and-chunk dataloaders (documents may span chunk boundaries;
    nothing is padded or dropped), and the reduction every packing job
    needs is a GLOBAL running sum — computed with
    ordering.global_running_sum's range-partitioned two-pass shape,
    NEVER a `sum() OVER (ORDER BY ...)` single-partition window (the
    canonical scale-killer; the q_sort_multi plan canary family asserts
    the pinned shape). Token counts are whitespace splits to stay
    engine-portable; swap in token_count_bpeish for tokenizer-faithful
    budgets. Round 6: parameterized for the api.pack() service surface.
    Round 7: the token counter is pluggable via ``n_tok`` (defaults to
    whitespace splits; q_pack_bpeish passes the BPE-ish regex count)."""
    from ..ordering import global_running_sum

    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    if n_tok is None:  # engine-portable default: whitespace counts
        n_tok = F.size(F.split(F.col("text"), " "))
    # zero-token docs span no chunk and are excluded (round 7 — the
    # oracle mirrors this; see _pack_oracle's divergent-floor note).
    # They contribute 0 to the running sum, so no other offset moves.
    tok = docs.select(
        "doc_id", n_tok.cast("bigint").alias("n_tok")
    ).filter(F.col("n_tok") > 0)
    # order by (doc_id, n_tok), not doc_id alone (review r06 second
    # pass): global_running_sum demands a TOTAL order. The output rows
    # carry only (doc_id, n_tok), so rows tied on BOTH keys are
    # interchangeable — the emitted layout multiset is deterministic
    # even when a caller table repeats ids.
    run = global_running_sum(
        tok,
        [F.col("doc_id").asc(), F.col("n_tok").asc()],
        F.col("n_tok"),
        alias="_run",
    )
    cap = F.lit(capacity)
    off = (F.col("_run") - F.col("n_tok")).alias("off")
    first = F.floor((F.col("_run") - F.col("n_tok")) / cap).cast("bigint")
    last = F.floor((F.col("_run") - 1) / cap).cast("bigint")
    return run.select(
        "doc_id",
        "n_tok",
        off,
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        (last - first + 1).alias("n_chunks"),
    )


@query(
    "q_vocab_coverage",
    oracle="""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS term FROM documents
        ),
        freq AS (
            SELECT term, CAST(count(*) AS BIGINT) AS c
            FROM tok GROUP BY 1
        ),
        tot AS (
            SELECT CAST(sum(c) AS BIGINT) AS total_tokens,
                   CAST(count(*) AS BIGINT) AS vocab_total
            FROM freq
        ),
        run AS (
            SELECT term, c,
                   CAST(sum(c) OVER (ORDER BY c DESC, term
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum
            FROM freq
        ),
        levels AS (SELECT unnest([50, 90, 95, 99]) AS level_pct)
        SELECT l.level_pct,
               CAST(count(*) FILTER (WHERE 100 * (r.cum - r.c)
                                           < l.level_pct * t.total_tokens)
                    AS BIGINT) AS vocab_size,
               CAST(max(r.cum) FILTER (WHERE 100 * (r.cum - r.c)
                                             < l.level_pct * t.total_tokens)
                    AS BIGINT) AS covered_tokens,
               any_value(t.total_tokens) AS total_tokens,
               any_value(t.vocab_total) AS vocab_total
        FROM run r CROSS JOIN tot t CROSS JOIN levels l
        GROUP BY 1 ORDER BY 1
    """,
    doc="Vocabulary coverage curve: the minimal vocabulary size whose "
    "cumulative token mass reaches 50/90/95/99% of the corpus — the "
    "tokenizer-budget planning statistic of a training-data pipeline.",
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each coverage level L, the smallest k such that the k most
    frequent terms (ties broken by term) cover ≥ L% of all token
    occurrences. The crossing test is EXACT integer arithmetic —
    100·(cum−c) < L·total selects precisely the rows at-or-before the
    crossing point, no float shares — so both engines agree to the row.

    Scale shape: tokenize map-side → one vocabulary-sized frequency
    shuffle; the cumulative mass comes from ordering.global_running_sum
    (range-partitioned two-pass, never an Exchange-SinglePartition
    window — the vocabulary of a 100 TB web corpus is itself huge), and
    the 4-level reduction rides a broadcast spine. The oracle spells
    the same cumsum as a plain window (DuckDB is single-node)."""
    from ..ordering import global_running_sum

    t = load_tables(spark, sf_dir)
    tok = t["documents"].select(F.explode(_toks()).alias("term"))
    # materialize() the frequency table (round 16): ``tot`` and the
    # global_running_sum's range shuffle both consume it, and the
    # before plan (plans/r16/q_vocab_coverage_before.txt) shows the
    # scan + explode + vocabulary shuffle running twice (the second
    # copy hides inside the running-sum's own checkpoint). One lazy
    # localCheckpoint computes the vocabulary once; ``tot`` reads the
    # pinned blocks. Row-identical output.
    from ..ordering import materialize

    freq = materialize(tok.groupBy("term").agg(F.count("*").alias("c")))
    tot = freq.agg(
        F.sum("c").cast("bigint").alias("total_tokens"),
        F.count("*").cast("bigint").alias("vocab_total"),
    )
    run = global_running_sum(
        freq, [F.col("c").desc(), F.col("term").asc()], F.col("c"), "cum"
    ).withColumn("cum", F.col("cum").cast("bigint"))
    levels = spark.createDataFrame(
        [(50,), (90,), (95,), (99,)], ["level_pct"]
    ).select(F.col("level_pct").cast("bigint").alias("level_pct"))
    crossing = (
        100 * (F.col("cum") - F.col("c"))
        < F.col("level_pct") * F.col("total_tokens")
    )
    return (
        run.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(levels))
        .groupBy("level_pct")
        .agg(
            F.count(F.when(crossing, F.lit(1))).alias("vocab_size"),
            F.max(F.when(crossing, F.col("cum"))).alias("covered_tokens"),
            F.any_value("total_tokens").alias("total_tokens"),
            F.any_value("vocab_total").alias("vocab_total"),
        )
        .orderBy("level_pct")
    )


@query(
    "q_text_zipf",
    oracle="""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS term FROM documents
        ),
        freq AS (
            SELECT term, CAST(count(*) AS BIGINT) AS c
            FROM tok GROUP BY 1
            ORDER BY c DESC, term LIMIT 1000
        ),
        ranked AS (
            SELECT c, row_number() OVER (ORDER BY c DESC, term) AS rnk
            FROM freq
        )
        SELECT round(regr_slope(ln(CAST(c AS DOUBLE)),
                                ln(CAST(rnk AS DOUBLE))), 6) AS zipf_slope,
               round(regr_intercept(ln(CAST(c AS DOUBLE)),
                                    ln(CAST(rnk AS DOUBLE))), 6)
                   AS zipf_intercept,
               round(regr_r2(ln(CAST(c AS DOUBLE)),
                             ln(CAST(rnk AS DOUBLE))), 6) AS r2,
               CAST(count(*) AS BIGINT) AS n_terms
        FROM ranked
    """,
    doc="Zipf slope of the corpus: log-log regression of frequency on "
    "rank over the top-1000 terms — the power-law health check of a "
    "natural-language corpus (≈ −1 for clean text).",
)
def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ln(freq) = α + s·ln(rank) fitted by least squares over the
    top-1000 terms; s ≈ −1 is Zipf's law, and a corpus whose slope
    drifts far from it (template spam flattens the head, dedup
    failures fatten it) fails the health check. Ranks tie-break by
    term so both engines number identically; counts are exact ints
    feeding the same ln calls, and the regression reduces ≤1000
    well-scaled terms — 6 dp rounding absorbs sum-order noise.

    Scale shape: the vocabulary shuffle is the only data-sized step;
    top-1000 selection is orderBy+limit (per-partition heaps + driver
    merge, NO full sort — TakeOrderedAndProject), and the ranking
    window runs on 1000 rows."""
    t = load_tables(spark, sf_dir)
    tok = t["documents"].select(F.explode(_toks()).alias("term"))
    freq = (
        tok.groupBy("term")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "term")
        .limit(1000)
    )
    ranked = freq.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.desc("c"), "term"))
        .alias("rnk"),
    )
    lc = F.log(F.col("c").cast("double"))
    lr = F.log(F.col("rnk").cast("double"))
    return ranked.agg(
        F.round(F.regr_slope(lc, lr), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(lc, lr), 6).alias("zipf_intercept"),
        F.round(F.regr_r2(lc, lr), 6).alias("r2"),
        F.count("*").alias("n_terms"),
    )


#: shards for distributed first-fit-decreasing packing: FFD is a
#: SEQUENTIAL greedy (each placement depends on all previous bins), so
#: the scale path shards the corpus deterministically and runs exact
#: FFD within each shard — bins never cross shards, so the result is a
#: valid packing whose bin count is at most the sum of per-shard FFD
#: bounds (each ≤ 11/9·OPT_shard + 6/9, Dósa 2007)
_BESTFIT_SHARDS = 8


@query(
    "q_pack_bestfit",
    rows_only_reason="First-fit-decreasing is an order-dependent greedy "
    "(every placement depends on the full prior bin state) — no SQL "
    "oracle can express it. The packing CONTRACT is property-tested "
    "instead (tests/test_rowsonly.py::test_pack_bestfit_contract): "
    "every document packed exactly once, no bin over capacity, at most "
    "one bin per shard under half full (the classic FFD guarantee), "
    "and the bin count within the FFD bound of the ceil(total/C) lower "
    "bound.",
    doc="Sample packing via distributed first-fit-decreasing: documents "
    "packed WHOLE into capacity-512 bins (no cross-document spans — "
    "the no-cross-attention alternative to concat-and-chunk), exact "
    "FFD within deterministic shards.",
)
def q_pack_bestfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second packing strategy real corpus builds use: where
    q_pack_chunks CONCATENATES (documents span chunk boundaries), this
    keeps every document intact and bin-packs them — the layout for
    training without cross-document attention, where the waste metric
    (1 − fill/capacity) is the number pipelines actually report.

    Sharded-FFD scale shape: docs shard by doc_id % k (deterministic,
    repartition-stable); each shard runs EXACT first-fit-decreasing in
    one applyInPandas task over (n_tok desc, doc_id) order; bin ids are
    shard-prefixed so shards never interact. Oversized docs clamp to
    capacity (the truncation rule, recorded per bin in n_clamped).
    Sequential FFD would be a single driver-side loop; the sharding
    costs at most one under-half-full bin per shard versus global FFD
    (property-pinned) while making the packing embarrassingly parallel
    — at 100 TB each shard is still one bounded task, so k scales with
    the corpus."""
    import pandas as pd

    t = load_tables(spark, sf_dir)
    cap = _PACK_CAPACITY
    docs = (
        t["documents"]
        .select(
            "doc_id",
            F.least(F.size(_toks()), F.lit(cap)).cast("long").alias("n_tok"),
            (F.size(_toks()) > cap).cast("int").alias("clamped"),
        )
        .filter(F.col("n_tok") > 0)
        .withColumn("shard", (F.col("doc_id") % _BESTFIT_SHARDS).cast("int"))
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # true BEST-fit-decreasing in O(n log n): the open bins live in
        # a residual-capacity-sorted list; each item takes the TIGHTEST
        # bin it fits (bisect for the smallest residual >= n). A naive
        # first-fit linear scan is O(n·bins) per shard — quadratic-ish
        # once shards carry ~1e5 docs — and BFD carries the same
        # 11/9·OPT + 6/9 guarantee (Dósa 2007) and the same
        # at-most-one-under-half-full property (any-fit family).
        import bisect

        pdf = pdf.sort_values(
            ["n_tok", "doc_id"], ascending=[False, True]
        )
        shard = int(pdf["shard"].iloc[0])
        fills: list[int] = []
        ndocs: list[int] = []
        nclamp: list[int] = []
        res: list[tuple[int, int]] = []  # (residual, bin_idx), sorted
        for n, cl in zip(pdf["n_tok"], pdf["clamped"]):
            n = int(n)
            pos = bisect.bisect_left(res, (n, -1))
            if pos < len(res):
                _, placed = res.pop(pos)
            else:
                placed = len(fills)
                fills.append(0)
                ndocs.append(0)
                nclamp.append(0)
            fills[placed] += n
            ndocs[placed] += 1
            nclamp[placed] += int(cl)
            if cap - fills[placed] > 0:
                bisect.insort(res, (cap - fills[placed], placed))
        return pd.DataFrame(
            {
                "bin_id": [shard * 1_000_000_000 + b
                           for b in range(len(fills))],
                "n_docs": ndocs,
                "fill_tokens": fills,
                "n_clamped": nclamp,
            }
        )

    out_schema = (
        "bin_id long, n_docs long, fill_tokens long, n_clamped long"
    )
    return (
        docs.groupBy("shard")
        .applyInPandas(pack, out_schema)
        .orderBy("bin_id")
    )


_BPE_PRETOKEN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 24,
    vocab_cap: int = 5000,
    min_pair_freq: int = 2,
):
    """Train a REAL byte-pair-encoding merges table on the corpus with
    pure DataFrame iterations — the actual Sennrich et al. procedure,
    not the pre-tokenizer regex proxy q_text_tokens_bpeish uses.

    Setup: pre-tokenize with the BPE-ish regex, reduce the corpus to the
    (word, freq) TYPE table (at 100 TB the type table is vocabulary-
    sized, not corpus-sized — this one reduction is the only pass over
    the raw text), cap it at the ``vocab_cap`` most frequent types
    (freq desc, word asc — deterministic), and split each word into
    character symbols.

    The merge ROUNDS run driver-side over the collected type table
    (round 15): the table is ≤ ``vocab_cap`` rows BY CONSTRUCTION —
    the same bounded-state rule that keeps centroids and PQ codebooks
    on the driver — while the pre-round-15 DataFrame loop paid two
    vocabulary-sized Spark jobs per round (an argmax ``first()`` and
    an eager checkpoint of the fold-rewritten symbols: 48 jobs and
    ~6 s of pure job overhead at n_merges=24 on a 5 000-type table
    whose per-round python cost is ~2 ms). The procedure is the exact
    sequential Sennrich reference the property tests pin
    (tests/test_properties.py::_ref_bpe): pair counts are
    freq-weighted integer sums; argmax tie-break (freq desc, l asc,
    r asc); greedy left-to-right single-pass merge apply (merging
    (a,a) in "aaa" yields ["aa","a"]). Integer counts and python/UTF-8
    string order match the old JVM fold bit-for-bit on BMP text; only
    beyond the BMP (where Spark's split("") yields UTF-16 code units)
    does the code-point split differ — and there the old engine
    already disagreed with its own pinned reference.

    Stops early when the best pair's frequency drops below
    ``min_pair_freq``. Returns (merges, words): ``merges`` is the
    ordered rule list [(rank, left, right, merged, freq)], ``words``
    the final (w, freq, syms, n_syms) type table — the word→token-count
    map that drives tokenizer-faithful packing without re-applying the
    rules to the corpus (one vocab-sized single-slice frame; every
    downstream join auto-broadcasts it)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1: {n_merges}")
    type_rows = (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(_BPE_PRETOKEN), 0
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "w")
        .limit(vocab_cap)
        .collect()
    )
    freqs = {r.w: int(r.freq) for r in type_rows}
    syms = {w: list(w) for w in freqs}
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        counts: dict = {}
        for w, f in freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        pf = max(counts.values())
        if pf < min_pair_freq:
            break
        l, r = min(k for k, v in counts.items() if v == pf)
        m = l + r
        for w, s in syms.items():
            out: list = []
            for x in s:
                if out and out[-1] == l and x == r:
                    out[-1] = m
                else:
                    out.append(x)
            syms[w] = out
        merges.append((rank, l, r, m, int(pf)))
    spark = docs.sparkSession
    words = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [
                (w, freqs[w], syms[w], len(syms[w]))
                for w in freqs
            ],
            1,
        ),
        "w string, freq bigint, syms array<string>, n_syms int",
    )
    return merges, words


@query(
    "q_text_bpe_train",
    rows_only_reason="Iterative merge training (argmax + fold per round) "
    "has no SQL-expressible oracle; determinism and exact agreement with "
    "a sequential reference BPE implementation are property-tested in "
    "tests/test_properties.py, and tokenizer-faithful packing driven by "
    "the trained counts is parity-tested there too.",
    doc="Real BPE training on the documents corpus: the ordered merges "
    "table (rank, left, right, merged, pair_freq) from iterative "
    "pair-count/merge rounds over the word-type table — the actual "
    "tokenizer-training primitive behind the q_*_bpeish proxies.",
)
def q_text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture exhibit of bpe_train (engine docstring has the algorithm
    and scale shape): 24 merges over the documents corpus. The merges
    list is rank-ordered and deterministic — pair argmax ties break on
    (l, r) lexicographically, so two runs (or two cluster layouts)
    produce identical rules."""
    t = load_tables(spark, sf_dir)
    merges, _ = bpe_train(t["documents"], n_merges=24)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_freq long"
    )


@query(
    "q_pack_bpe",
    rows_only_reason="The layout is driven by token counts from the "
    "iteratively TRAINED BPE merges table (q_text_bpe_train), which has "
    "no SQL-expressible oracle; layout parity against a sequential "
    "reference over the same trained counts is property-tested in "
    "tests/test_properties.py (test_bpe_counts_drive_packing_layout).",
    doc="Packing layout driven by REAL trained-BPE token counts: "
    "bpe_train's final word-type table broadcast-joined to the corpus "
    "gives per-doc post-merge token counts, and the same "
    "concat-and-chunk engine as q_pack_chunks cuts 256-token chunks — "
    "closing the proxy gap between the bpeish regex budget and the "
    "tokenizer a dataloader actually runs.",
)
def q_pack_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end tokenizer-faithful packing path: train merges on
    the corpus (vocabulary-sized iterations — engine bpe_train), then
    per-doc token counts WITHOUT re-applying rules to the text: every
    pre-token's post-merge symbol count is already in the trained
    word-type table, so counts are one explode + broadcast join +
    groupBy(doc_id) over word TYPES, and the layout is the same single
    range-shuffle running sum as q_pack_chunks. At 100 TB: train cost
    is bounded by vocabulary, the count join is map-side against a
    broadcast vocab, and no document is ever re-tokenized twice."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    _, words = bpe_train(docs, n_merges=24)
    counts = (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(
                    F.col("text"), F.lit(_BPE_PRETOKEN), 0
                )
            ).alias("w"),
        )
        .join(F.broadcast(words.select("w", "n_syms")), "w")
        .groupBy("doc_id")
        .agg(F.sum("n_syms").alias("bpe_tokens"))
    )
    return pack_chunks_layout(
        counts, _PACK_BPEISH_CAPACITY, n_tok=F.col("bpe_tokens")
    )


@query(
    "q_text_keyword",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM tok GROUP BY doc_id, term
        ), df AS (
            SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
        ), n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term, tf.tf, df.df,
                   round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6)
                       AS tfidf
            FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
        )
        SELECT doc_id, term, tfidf, rn FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY tfidf DESC, term) AS rn
            FROM scored
        ) WHERE rn <= 3
    """,
    doc="Keyword extraction: top-3 TF-IDF terms PER DOCUMENT (vs "
    "q_text_tfidf's per-source grain) — the per-doc salient-term "
    "tagger a corpus pipeline uses for labeling and retrieval keys.",
)
def q_text_keyword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same exact tf·ln(N/df) spelling as q_text_tfidf, re-grained to
    the document: tf per (doc, term), the shared df vocabulary join
    (no broadcast hint — the vocabulary can exceed any threshold at
    corpus scale; AQE picks), ranking on the ROUNDED score with a term
    tie-break so cross-engine ln() ulp drift cannot flip the top-k.
    rank<=3 compiles to WindowGroupLimit — a bounded per-task heap on
    the doc-keyed exchange."""
    t = load_tables(spark, sf_dir)
    # materialize() the token table (round 16, same diamond q_text_tfidf
    # fixed in round 15): tf and df both consume it and Catalyst cannot
    # share the subplan — plans/r16/q_text_keyword_before.txt shows two
    # Scan parquet + Generate chains. One lazy localCheckpoint tokenizes
    # once; both aggregates read the same executor-local blocks. At
    # 100 TB this trades a second full corpus scan + re-tokenize for one
    # token-table write. Row-identical output (deterministic subtree).
    from ..ordering import materialize

    tok = materialize(
        t["documents"].select("doc_id", F.explode(_toks()).alias("term"))
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = t["documents"].agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .join(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf", "rn")
    )


@query(
    "q_text_boilerplate",
    oracle="""
        WITH w AS (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS word,
                   generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
            FROM documents
        ),
        seg AS (
            SELECT doc_id, pos // 10 AS seg_id,
                   string_agg(word, ' ' ORDER BY pos) AS seg,
                   CAST(count(*) AS BIGINT) AS seg_tokens
            FROM w GROUP BY 1, 2
        ),
        sdf AS (
            SELECT seg, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
            FROM seg GROUP BY 1
        )
        SELECT s.doc_id,
               CAST(count(*) AS BIGINT) AS n_segments,
               CAST(count(*) FILTER (WHERE d.df >= 2) AS BIGINT)
                   AS n_boilerplate,
               CAST(sum(s.seg_tokens) FILTER (WHERE d.df < 2) AS BIGINT)
                   AS clean_tokens,
               round(CAST(count(*) FILTER (WHERE d.df >= 2) AS DOUBLE)
                     / count(*), 6) AS boiler_ratio
        FROM seg s JOIN sdf d ON s.seg = d.seg
        GROUP BY 1
    """,
    doc="Cross-document boilerplate detection at the 10-token segment "
    "grain (C4/CCNet-style repeated-paragraph removal): a segment seen "
    "in ≥2 distinct docs is boilerplate; per-doc removal stats.",
)
def q_text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The line-dedup step every web-crawl pipeline runs before
    training, re-grained for the fixture's unpunctuated corpus: docs
    split into aligned 10-token segments, segment document-frequency
    counted corpus-wide, segments shared by ≥2 distinct docs flagged,
    and each doc reports surviving token mass + boilerplate ratio.

    Spark side builds segments JVM-side with NO explode-order hazard:
    slice + array_join over the split array inside one transform()
    lambda, then posexplode — the per-doc work is embarrassingly
    parallel, and the only shuffles are the segment-hash df count and
    the segment-keyed join-back (the q_dedup_ngram inverted-index
    shape; hot segments behave like hot shingles and would take the
    same df-cap guard at crawl scale)."""
    t = load_tables(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    n_seg = F.ceil(F.size(words) / F.lit(10)).cast("int")
    segs = t["documents"].select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_seg - 1),
                lambda i: F.array_join(
                    F.slice(words, i * 10 + 1, 10), " "
                ),
            )
        ).alias("seg_id", "seg"),
    )
    # materialize() the segment table (round 16): the df aggregate and
    # the join-back both consume it — the before plan
    # (plans/r16/q_text_boilerplate_before.txt) shows the scan + split +
    # posexplode chain twice. One lazy localCheckpoint segments the
    # corpus once (the q_text_tfidf/q_dedup_ngram diamond rule); at
    # crawl scale that is the difference between one and two full
    # re-segmentation passes. Row-identical output.
    from ..ordering import materialize

    seg = materialize(
        segs.withColumn(
            "seg_tokens", F.size(F.split(F.col("seg"), " ")).cast("bigint")
        )
    )
    sdf = seg.groupBy("seg").agg(
        F.countDistinct("doc_id").alias("df")
    )
    j = seg.join(sdf, "seg")
    boiler = F.col("df") >= 2
    return j.groupBy("doc_id").agg(
        F.count("*").alias("n_segments"),
        F.count(F.when(boiler, 1)).alias("n_boilerplate"),
        F.sum(F.when(~boiler, F.col("seg_tokens"))).alias("clean_tokens"),
        F.round(
            F.count(F.when(boiler, 1)).cast("double") / F.count("*"), 6
        ).alias("boiler_ratio"),
    )


@query(
    "q_split_hash",
    oracle="""
        WITH b AS (
            SELECT doc_id, n_chars,
                   CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)
                       % 100 AS bucket
            FROM documents
        )
        SELECT doc_id, bucket,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split,
               n_chars
        FROM b
    """,
    doc="Content-stable train/val/test split (80/10/10) via md5 — the "
    "CROSS-ENGINE-oracle-able twin of q_split_stable's xxhash64 split: "
    "same contract, portable hash, assignment verified row-by-row.",
)
def q_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic split by content hash, the reproducibility
    primitive every training pipeline needs: a document's assignment
    depends ONLY on its text bytes — stable across reshuffles, repo
    versions, and engines. q_split_stable pins the xxhash64 (fast JVM)
    variant with unit tests; this key trades hash speed for a portable
    md5 so the ENTIRE assignment (not just fractions) is hash-checked
    against the oracle. bucket = first 8 md5 hex digits mod 100 —
    identical integer arithmetic in both engines.

    Scale shape: pure map-side projection, no shuffle at all."""
    t = load_tables(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast("bigint")
        % 100
    )
    return t["documents"].select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(F.col("bucket") < 80, "train")
        .when(F.col("bucket") < 90, "val")
        .otherwise("test")
        .alias("split"),
        "n_chars",
    )


GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "a", "and", "of", "to", "with", "that", "be",
)


@query(
    "q_text_gopher",
    oracle="""
        WITH base AS (
            SELECT doc_id, text, string_split(text, ' ') AS ts,
                   CAST(length(text) AS BIGINT) AS nc
            FROM documents
        ), m AS (
            SELECT doc_id,
                   CAST(len(ts) AS BIGINT) AS n_tokens,
                   CAST(nc - (len(ts) - 1) AS DOUBLE) / len(ts)
                       AS mean_word_len,
                   CAST(len(list_filter(ts,
                            x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
                       / len(ts) AS alpha_frac,
                   CAST(len(list_filter(
                            ['the', 'a', 'and', 'of', 'to', 'with',
                             'that', 'be'],
                            s -> list_contains(ts, s))) AS BIGINT)
                       AS n_stopwords
            FROM base
        )
        SELECT doc_id, n_tokens, mean_word_len, alpha_frac, n_stopwords,
               CAST(n_tokens BETWEEN 10 AND 100000 AS INTEGER) AS r_ntok,
               CAST(mean_word_len BETWEEN 3 AND 10 AS INTEGER)
                   AS r_wordlen,
               CAST(alpha_frac >= 0.8 AS INTEGER) AS r_alpha,
               CAST(n_stopwords >= 2 AS INTEGER) AS r_stop,
               CAST(n_tokens BETWEEN 10 AND 100000
                    AND mean_word_len BETWEEN 3 AND 10
                    AND alpha_frac >= 0.8
                    AND n_stopwords >= 2 AS INTEGER) AS passes_gopher
        FROM m
    """,
    doc="Gopher-style document quality rules: token-count bounds, mean "
    "word length 3..10, alphabetic-token fraction >= 0.8, >= 2 distinct "
    "stopwords — the published rule filter for web-scale pretraining "
    "corpora (Rae et al. 2021, public).",
)
def q_text_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher rule filter — the standard coarse quality gate a
    pretraining pipeline runs BEFORE any model-based scoring. Each rule
    is reported separately (so downstream can audit which rule fired)
    plus the conjunction.

    Determinism: every measure is an int÷int division or an integer
    comparison — mean word length is (chars − spaces)/tokens from exact
    counts; the stopword count is the number of LIST words present in
    the doc (count over the 8-word list, not token occurrences) —
    identical lambda semantics in both engines. Rules emit INTEGER 0/1
    to pin the dtype across engines.

    Scale shape: pure map-side row-local expressions inside
    whole-stage codegen — no shuffle, no UDF; the natural first stage
    of the q_quality_pipeline funnel at 100 TB."""
    t = load_tables(spark, sf_dir)
    return gopher_frame(t["documents"])


def gopher_frame(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The engine behind q_text_gopher (and api.gopher): per-doc Gopher
    rule measures + 0/1 rule columns over any (doc_id, text) frame. See
    the key's docstring for the determinism and scale argument."""
    ts = F.col("ts")
    n_tokens = F.size(ts).cast("bigint")
    mean_wl = (
        (F.col("nc") - (F.size(ts) - 1)).cast("double") / F.size(ts)
    )
    alpha_cnt = F.size(F.filter(ts, lambda x: x.rlike("[a-z]")))
    stoparr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    n_stop = F.size(
        F.filter(stoparr, lambda s: F.array_contains(ts, s))
    ).cast("bigint")
    m = (
        docs.select(
            "doc_id",
            F.split(text_col, " ").alias("ts"),
            F.length(text_col).cast("bigint").alias("nc"),
        )
        .select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            mean_wl.alias("mean_word_len"),
            (alpha_cnt.cast("double") / F.size(ts)).alias("alpha_frac"),
            n_stop.alias("n_stopwords"),
        )
    )
    r_ntok = F.col("n_tokens").between(10, 100000)
    r_wordlen = F.col("mean_word_len").between(3, 10)
    r_alpha = F.col("alpha_frac") >= 0.8
    r_stop = F.col("n_stopwords") >= 2
    return m.select(
        "doc_id", "n_tokens", "mean_word_len", "alpha_frac", "n_stopwords",
        r_ntok.cast("int").alias("r_ntok"),
        r_wordlen.cast("int").alias("r_wordlen"),
        r_alpha.cast("int").alias("r_alpha"),
        r_stop.cast("int").alias("r_stop"),
        (r_ntok & r_wordlen & r_alpha & r_stop)
        .cast("int")
        .alias("passes_gopher"),
    )


@query(
    "q_text_bigram_lm",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        ), grams AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(ts)),
                                         i -> ts[i])) AS w1,
                   unnest(list_transform(range(1, len(ts)),
                                         i -> ts[i + 1])) AS w2
            FROM toks
        ), scored AS (
            SELECT doc_id,
                   CAST(count(*) OVER (PARTITION BY w1, w2) AS BIGINT)
                       AS c2,
                   CAST(count(*) OVER (PARTITION BY w1) AS BIGINT) AS c1
            FROM grams
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               round(avg(-ln(CAST(c2 AS DOUBLE) / c1)), 4)
                   AS avg_neg_logp2,
               round(exp(avg(-ln(CAST(c2 AS DOUBLE) / c1))), 4)
                   AS ppl_bigram
        FROM scored GROUP BY doc_id
    """,
    doc="Bigram-LM cross-entropy per document under the corpus's own "
    "bigram model (KenLM-filtering pattern with n=2, pairing "
    "q_text_perplexity's unigram score).",
)
def q_text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order LM quality score: mean −ln P(w₂|w₁) with
    P(w₂|w₁) = c(w₁w₂)/c(w₁·) estimated from the corpus itself. Every
    observed bigram has positive probability, so no smoothing term can
    disagree across engines; docs with <2 tokens emit no row (no
    bigram positions).

    Determinism: both counts are exact int64; the scored ratio is ONE
    int÷int division, so ln() sees bit-identical inputs and the 4-dp
    round leaves ~10 orders of headroom over last-ulp libm drift (the
    q_text_perplexity rule); ppl = exp(mean) re-rounds the UNrounded
    mean.

    Scale shape: the bigram relation is built by the zip-of-shifted-
    slices idiom (q_text_ngram — stays in codegen, no per-element
    re-split); the two count tables are vocab- and vocab²-bounded, so
    Spark joins them back broadcast-style while they fit, shuffle-hash
    beyond — the oracle's window formulation is the same counts. No
    driver state, no UDF."""
    t = load_tables(spark, sf_dir)
    ts = F.col("ts")
    n = F.greatest(F.size(ts) - 1, F.lit(0))
    grams = (
        t["documents"]
        .select("doc_id", F.split("text", " ").alias("ts"))
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(ts, 1, n),
                    F.slice(ts, 2, n),
                    lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
                )
            ).alias("g"),
        )
        .select("doc_id", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    )
    c2 = grams.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = grams.groupBy("w1").agg(F.count("*").alias("c1"))
    neg_logp = -F.log(F.col("c2").cast("double") / F.col("c1"))
    return (
        grams.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(neg_logp), 4).alias("avg_neg_logp2"),
            F.round(F.exp(F.avg(neg_logp)), 4).alias("ppl_bigram"),
        )
    )


def compress_ratio(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document zlib compression ratio — the classic cheap
    redundancy signal (boilerplate / machine-generated text compresses
    far below natural prose; C4/Gopher-era pipelines gate on it).

    ONE mapInPandas pass, Arrow-batched; zlib level pinned to 6 so the
    byte count is deterministic for a given zlib build (the ratio is an
    environment constant, not SQL-expressible — hence rows-only).
    Output: (doc_id, n_bytes, n_compressed, compress_ratio)."""

    def make_cr(text_col: str):
        # closure by REQUIREMENT: cloudpickle ships it by value, workers
        # never import this package (io.py read_parquet_any note)
        import pandas as pd
        import zlib

        def cr(batches):
            for pdf in batches:
                raw = [t.encode("utf-8") for t in pdf[text_col]]
                nb = [len(b) for b in raw]
                nz = [len(zlib.compress(b, 6)) for b in raw]
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "n_bytes": pd.Series(nb, dtype="int64"),
                        "n_compressed": pd.Series(nz, dtype="int64"),
                        "compress_ratio": [
                            round(z / b, 4) if b else 0.0
                            for z, b in zip(nz, nb)
                        ],
                    }
                )

        return cr

    return docs.select("doc_id", text_col).mapInPandas(
        make_cr(text_col),
        "doc_id bigint, n_bytes bigint, n_compressed bigint, "
        "compress_ratio double",
    )


@query(
    "q_text_compress_ratio",
    rows_only_reason="zlib's DEFLATE byte count is not expressible in "
    "SQL — no DuckDB oracle can reproduce the compressor. Determinism "
    "is pinned instead by tests/test_rowsonly.py::"
    "test_compress_ratio_matches_local_zlib (exact per-doc byte "
    "equality against driver-side zlib at level 6).",
    doc="Per-document zlib compression ratio (level 6) — the standard "
    "cheap redundancy/quality gate for pretraining corpora; low ratio "
    "flags boilerplate and repetition, high flags noise.",
)
def q_text_compress_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level view of the compress-ratio gate: per-doc ratios
    plus the repetition cross-signal — docs are ordered client-side.

    Scale shape: one Arrow-batched Python stage (the unavoidable
    compressor), no shuffle at all — the groupless map emits exactly
    one row per doc; at 100 TB this is embarrassingly parallel and
    IO-bound, the cheapest possible Python surface."""
    t = load_tables(spark, sf_dir)
    return compress_ratio(t["documents"])



@query(
    "q_text_bigram_kn",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        ), grams AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(ts)),
                                         i -> ts[i])) AS w1,
                   unnest(list_transform(range(1, len(ts)),
                                         i -> ts[i + 1])) AS w2
            FROM toks
        ), c2 AS (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
            FROM grams GROUP BY 1, 2
        ), c1 AS (
            SELECT w1, CAST(sum(c2) AS BIGINT) AS c1,
                   CAST(count(*) AS BIGINT) AS n1fw
            FROM c2 GROUP BY 1
        ), cont AS (
            SELECT w2, CAST(count(*) AS BIGINT) AS n1bk
            FROM c2 GROUP BY 1
        ), btypes AS (
            SELECT CAST(count(*) AS BIGINT) AS b FROM c2
        )
        SELECT g.doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               round(avg(-ln(
                   (c2.c2 - 0.75) / c1.c1
                   + (0.75 * c1.n1fw / c1.c1)
                     * (CAST(cont.n1bk AS DOUBLE) / b)
               )), 4) AS kn_neg_logp
        FROM grams g
        JOIN c2 USING (w1, w2)
        JOIN c1 USING (w1)
        JOIN cont USING (w2)
        CROSS JOIN btypes
        GROUP BY g.doc_id
    """,
    doc="Kneser-Ney-smoothed bigram LM score per document (absolute "
    "discount d = 0.75, continuation probability from distinct-"
    "predecessor counts) — THE standard n-gram LM estimator, completing "
    "the unigram (q_text_perplexity) and MLE-bigram (q_text_bigram_lm) "
    "family.",
)
def q_text_bigram_kn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney, the n-gram smoother that beats MLE by
    reserving mass for unseen continuations:

        P(w2|w1) = (c(w1w2) − d)/c(w1·)
                 + d·N1+(w1·)/c(w1·) · N1+(·w2)/|bigram types|

    with d = 0.75 (DYADIC — exact in binary, so the discounted
    numerator is exact). Scoring the corpus against itself keeps every
    c(w1w2) ≥ 1 > d, so the max(·,0) clamp is vacuous and both engines
    evaluate the same three-term expression on exact-int-derived
    inputs: two single divisions plus one product chain in fixed
    order, then ln() on bit-identical doubles and the 4-dp average
    (the q_text_perplexity rule).

    Scale shape: all four count relations derive from the ONE bigram
    aggregate (c2; c1/N1+fw and N1+bk are c2 re-aggregations — vocab-
    and vocab²-bounded, broadcastable); the fact-sized join keys the
    gram stream by (w1, w2) once. No driver state, no UDF."""
    t = load_tables(spark, sf_dir)
    ts = F.col("ts")
    n = F.greatest(F.size(ts) - 1, F.lit(0))
    grams = (
        t["documents"]
        .select("doc_id", F.split("text", " ").alias("ts"))
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(ts, 1, n),
                    F.slice(ts, 2, n),
                    lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
                )
            ).alias("g"),
        )
        .select("doc_id", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    )
    c2 = grams.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.count("*").alias("n1fw")
    )
    cont = c2.groupBy("w2").agg(F.count("*").alias("n1bk"))
    btypes = c2.agg(F.count("*").alias("b"))
    p_kn = (
        (F.col("c2") - 0.75) / F.col("c1")
        + (0.75 * F.col("n1fw") / F.col("c1"))
        * (F.col("n1bk").cast("double") / F.col("b"))
    )
    return (
        grams.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .join(cont, ["w2"])
        .crossJoin(btypes)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(-F.log(p_kn)), 4).alias("kn_neg_logp"),
        )
    )


@query(
    "q_text_hashing_trick",
    oracle="""
        WITH tok AS (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS term
            FROM documents
        )
        SELECT doc_id,
               CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) % 256
                   AS bucket,
               CAST(count(*) AS BIGINT) AS cnt
        FROM tok
        GROUP BY 1, 2
        HAVING count(*) >= 2
    """,
    doc="Feature hashing (the hashing trick): tokens land in 256 "
    "md5-derived buckets, per-doc sparse counts (cnt >= 2 cells) — the "
    "fixed-width vectorizer that needs NO vocabulary pass; portable "
    "hash, whole assignment oracle-checked.",
)
def q_text_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing vectorizer (Weinberger et al. 2009, public — the
    sklearn HashingVectorizer / Vowpal Wabbit representation): bucket =
    h(token) mod D with D fixed, so featurization is a PURE MAP — no
    vocabulary build, no global state, the only text representation
    that needs zero passes before the first one. Collisions are the
    accepted trade; D = 256 keeps the fixture matrix readable, a real
    run uses 2^18+.

    Determinism: the q_split_hash md5 idiom — first 8 hex digits as an
    integer, identical mod arithmetic both engines; counts exact. The
    cnt >= 2 floor keeps the declared output sparse (and exercises
    HAVING on the hashed grain).

    Scale shape: explode → ONE partial/final count on (doc_id, bucket)
    — map-side combine collapses each doc's tokens to ≤ D rows before
    the exchange; at 100 TB this is the cheapest featurizer there is."""
    t = load_tables(spark, sf_dir)
    tok = t["documents"].select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10)
        .cast("bigint") % 256
    )
    return (
        tok.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
    )


@query(
    "q_text_pii_scrub",
    oracle="""
        WITH seeded AS (
            SELECT doc_id,
                   substring(text, 1, 60)
                   || CASE WHEN doc_id % 5 = 0
                           THEN ' mail user' || doc_id || '@example.com'
                           WHEN doc_id % 5 = 1
                           THEN ' call 555-01' || lpad(CAST(doc_id % 100
                                AS VARCHAR), 2, '0') || '-'
                                || lpad(CAST(doc_id % 10000 AS VARCHAR),
                                        4, '0')
                           WHEN doc_id % 5 = 2
                           THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
                                || '.0.' || CAST(doc_id % 100 AS VARCHAR)
                           ELSE '' END AS text
            FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                    '[a-z0-9]+@[a-z0-9.]+[a-z]')) AS BIGINT) AS n_email,
               CAST(len(regexp_extract_all(text,
                    '[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phoneish,
               CAST(len(regexp_extract_all(text,
                    '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+')) AS BIGINT)
                   AS n_ip,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text,
                     '[a-z0-9]+@[a-z0-9.]+[a-z]', '<EMAIL>', 'g'),
                   '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+', '<IP>', 'g'),
                 '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<PHONE>', 'g')
                   AS scrubbed
        FROM seeded
    """,
    doc="PII scrubbing pass: email / phone-ish / IP span detection and "
    "typed-token redaction over deterministically seeded spans — the "
    "standard pretraining privacy stage; counts per type + the "
    "scrubbed text, whole output oracle-checked.",
)
def q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scrub every pretraining pipeline runs before anything else
    ships: find PII-shaped spans, replace with typed placeholder
    tokens (<EMAIL>/<IP>/<PHONE>) so downstream tokenization sees a
    stable vocabulary item instead of infinite unique strings. The
    fixture corpus has no PII, so the key SEEDS deterministic spans
    first (email on doc_id % 5 == 0, a 555 phone on % 5 == 1, a
    10.x.0.y IP on % 5 == 2) — detection and redaction then have exact
    expected counts per doc.

    Dialect discipline: fixed-count classes ([0-9]{3}), literal dots
    escaped, 'g' replace — the portable subset (q_fn_regexp). The
    phone REDACTION pattern is the 3-2-4 grouping while the DETECTOR
    counts 3-4 tails, deliberately different so the test surface pins
    both count-only and rewrite paths.

    Scale shape: pure map-side regex in codegen — no shuffle, no UDF;
    composes in front of q_quality_pipeline at 100 TB."""
    t = load_tables(spark, sf_dir)
    seeded_text = F.concat(
        F.substring("text", 1, 60),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" mail user"), F.col("doc_id"), F.lit("@example.com")
            ),
        )
        .when(
            F.col("doc_id") % 5 == 1,
            F.concat(
                F.lit(" call 555-01"),
                F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
                F.lit("-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        )
        .when(
            F.col("doc_id") % 5 == 2,
            F.concat(
                F.lit(" host 10."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".0."),
                (F.col("doc_id") % 100).cast("string"),
            ),
        )
        .otherwise(F.lit("")),
    )
    seeded = t["documents"].select("doc_id", seeded_text.alias("text"))
    email_re = "[a-z0-9]+@[a-z0-9.]+[a-z]"
    ip_re = r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+"
    phone_tail_re = "[0-9]{3}-[0-9]{4}"
    phone_full_re = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), email_re, "<EMAIL>"),
            ip_re,
            "<IP>",
        ),
        phone_full_re,
        "<PHONE>",
    )
    return seeded.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(text, '{email_re}', 0)"))
        .cast("bigint")
        .alias("n_email"),
        F.size(F.expr(f"regexp_extract_all(text, '{phone_tail_re}', 0)"))
        .cast("bigint")
        .alias("n_phoneish"),
        F.size(F.expr(r"regexp_extract_all(text,"
                      r" '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+', 0)"))
        .cast("bigint")
        .alias("n_ip"),
        scrubbed.alias("scrubbed"),
    )


@query(
    "q_pipeline_pretrain",
    oracle="""
        WITH d AS (
            SELECT source, doc_id, text,
                   string_split(text, ' ') AS ts,
                   CAST(length(text) AS BIGINT) AS nc,
                   min(doc_id) OVER (PARTITION BY text) AS keep_id
            FROM documents
        ), m AS (
            SELECT source, doc_id,
                   doc_id = keep_id AS survives_dedup,
                   len(ts) BETWEEN 10 AND 100000
                   AND (CAST(nc - (len(ts) - 1) AS DOUBLE) / len(ts))
                       BETWEEN 3 AND 10
                   AND CAST(len(list_filter(ts,
                           x -> regexp_matches(x, '[a-z]')))
                           AS DOUBLE) / len(ts) >= 0.8
                   AND len(list_filter(
                           ['the', 'a', 'and', 'of', 'to', 'with',
                            'that', 'be'],
                           s -> list_contains(ts, s))) >= 2
                       AS passes_gopher
            FROM d
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_total,
               CAST(count(*) FILTER (NOT survives_dedup) AS BIGINT)
                   AS n_dropped_dup,
               CAST(count(*) FILTER (survives_dedup AND NOT passes_gopher)
                    AS BIGINT) AS n_dropped_gopher,
               CAST(count(*) FILTER (survives_dedup AND passes_gopher)
                    AS BIGINT) AS n_kept
        FROM m GROUP BY source
    """,
    doc="Modern pretraining funnel accounting: exact-dedup "
    "survivorship, then the Gopher rule gate — per-source drop "
    "attribution for the two heaviest cleanup stages, composed from "
    "the q_dedup_exact and q_text_gopher engines.",
)
def q_pipeline_pretrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit table a corpus card actually publishes: per source,
    how many documents each stage dropped — dedup FIRST (cheapest,
    biggest win; keep_id = min doc_id per exact-text class), the
    Gopher rule conjunction on survivors only. Stage attribution
    matters operationally: a source bleeding at the dedup stage is a
    crawl problem, one bleeding at Gopher is a content problem.

    Built from the shared engines (sha-256 survivor classes as
    q_quality_pipeline; gopher_frame for the rules), so the stage
    semantics here can never drift from the standalone keys.

    Scale shape: dedup's 32-byte-digest shuffle + the map-side gopher
    measures + one per-source rollup — the same two exchanges as
    q_quality_pipeline; no text crosses a shuffle."""
    docs = load_tables(spark, sf_dir)["documents"].withColumn(
        "_h", F.sha2(F.col("text"), 256)
    )
    survivors = docs.groupBy("_h").agg(F.min("doc_id").alias("keep_id"))
    gf = gopher_frame(docs).select("doc_id", "passes_gopher")
    joined = (
        docs.join(survivors, "_h")
        .join(gf, "doc_id")
        .select(
            "source",
            (F.col("doc_id") == F.col("keep_id")).alias("sd"),
            (F.col("passes_gopher") == 1).alias("pg"),
        )
    )
    return joined.groupBy("source").agg(
        F.count("*").alias("n_total"),
        F.sum((~F.col("sd")).cast("long")).alias("n_dropped_dup"),
        F.sum((F.col("sd") & ~F.col("pg")).cast("long")).alias(
            "n_dropped_gopher"
        ),
        F.sum((F.col("sd") & F.col("pg")).cast("long")).alias("n_kept"),
    )


@query(
    "q_text_winnow",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        ), grams AS (
            SELECT doc_id,
                   unnest(range(1, len(ts) - 1)) AS pos,
                   list_transform(range(1, len(ts) - 1),
                     i -> list_reduce(
                       [CAST(0 AS BIGINT)] ||
                       list_transform(
                         string_split(
                           concat(ts[i], ' ', ts[i+1], ' ', ts[i+2]), ''),
                         ch -> CAST(ascii(ch) AS BIGINT)),
                       (acc, x) -> (acc * 31 + x) % 1000000007)) AS hs
            FROM toks WHERE len(ts) >= 3
        ), hashed AS (
            SELECT doc_id, pos, hs[pos] AS h FROM grams
        ), winmin AS (
            SELECT doc_id, pos, h,
                   min(h) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                       AS wmin,
                   count(*) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS BETWEEN 3 PRECEDING
                                           AND CURRENT ROW) AS wn
            FROM hashed
        ), picked AS (
            SELECT DISTINCT doc_id, h
            FROM winmin WHERE wn = 4 AND h = wmin
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_fingerprints,
               CAST(sum(h) % 1000000007 AS BIGINT) AS fp_checksum,
               CAST(min(h) AS BIGINT) AS fp_min
        FROM picked GROUP BY doc_id
    """,
    doc="Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003, the "
    "MOSS algorithm): 3-gram polynomial rolling hashes, window-of-4 "
    "minima selected per position, distinct survivors summarized — "
    "the position-robust document fingerprint for plagiarism / "
    "contamination detection, fully oracle-checked.",
)
def q_text_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing GUARANTEES every shared substring of length ≥ w+k-1
    tokens (here 6) leaves at least one common fingerprint in both
    documents — the property plain sampled hashing lacks and the
    reason MOSS uses it. Selection = a hash is picked where it is the
    minimum of a length-w window of k-gram hashes; distinct picked
    values per doc are the fingerprint set (summarized as count +
    checksum so the declared output stays scalar — the join against
    another corpus groups on the raw picked values, q_contamination's
    postings shape).

    Determinism: the q_text_fingerprint polynomial hash (exact int64
    mod 1e9+7) per 3-gram; window minima over exact ints with full
    windows only.

    Scale shape: shingle positions explode once; the window is
    doc-partitioned (the event-stream shape, never global); the
    distinct + summary groupBys are doc-keyed — one exchange
    footprint end to end."""
    t = load_tables(spark, sf_dir)
    ts = F.col("ts")
    n = F.greatest(F.size(ts) - 2, F.lit(0))
    gram = F.concat_ws(
        " ",
        F.col("g.x1"), F.col("g.x2"), F.col("g.x3"),
    )
    grams = (
        t["documents"]
        .filter(F.size(F.split("text", " ")) >= 3)
        .select("doc_id", F.split("text", " ").alias("ts"))
        .select(
            "doc_id",
            F.posexplode(
                F.zip_with(
                    F.slice(ts, 1, n),
                    F.zip_with(
                        F.slice(ts, 2, n),
                        F.slice(ts, 3, n),
                        lambda y, z: F.struct(
                            y.alias("x2"), z.alias("x3")
                        ),
                    ),
                    lambda x, yz: F.struct(
                        x.alias("x1"),
                        yz.getField("x2").alias("x2"),
                        yz.getField("x3").alias("x3"),
                    ),
                )
            ).alias("p", "g"),
        )
        .select("doc_id", (F.col("p") + 1).alias("pos"), gram.alias("gram"))
    )
    codes = F.transform(
        F.split(F.col("gram"), ""), lambda ch: F.ascii(ch).cast("bigint")
    )
    h = F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * 31 + x) % 1000000007,
    )
    hashed = grams.select("doc_id", "pos", h.alias("h"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-3, 0)
    )
    winmin = hashed.select(
        "doc_id", "h",
        F.min("h").over(w).alias("wmin"),
        F.count("*").over(w).alias("wn"),
    )
    picked = (
        winmin.filter((F.col("wn") == 4) & (F.col("h") == F.col("wmin")))
        .select("doc_id", "h")
        .distinct()
    )
    return picked.groupBy("doc_id").agg(
        F.count("*").alias("n_fingerprints"),
        (F.sum("h") % 1000000007).cast("bigint").alias("fp_checksum"),
        F.min("h").cast("bigint").alias("fp_min"),
    )


@query(
    "q_text_readability",
    oracle="""
        WITH base AS (
            SELECT doc_id, string_split(text, ' ') AS ts, text
            FROM documents
        )
        SELECT doc_id,
               CAST(len(ts) AS BIGINT) AS n_words,
               CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT)
                   AS n_syllables,
               CAST(len(regexp_extract_all(text, '[aeiou]+')) AS DOUBLE)
                   / len(ts) AS syllables_per_word,
               CAST(len(list_filter(ts,
                    t -> len(regexp_extract_all(t, '[aeiou]+')) >= 3))
                    AS BIGINT) AS n_polysyllabic,
               CAST(len(list_filter(ts,
                    t -> len(regexp_extract_all(t, '[aeiou]+')) >= 3))
                    AS DOUBLE) / len(ts) AS polysyllabic_frac
        FROM base
    """,
    doc="Readability ingredients: vowel-group syllable proxy per word "
    "and the polysyllabic-word fraction (the SMOG/Flesch inputs) — "
    "deterministic string ops, the complexity signal beside "
    "q_text_gopher's structural rules.",
)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability formulas all reduce to two text-only ingredients —
    syllables per word and the share of polysyllabic words (SMOG
    counts the latter, Flesch weights the former); the grade-level
    constants belong downstream. The syllable proxy is the classic
    vowel-group count (runs of [aeiou]): exact on the fixture's
    lowercase vocabulary and the standard cheap estimator elsewhere.

    Determinism: both measures are integer counts over identical
    regex semantics; the ratios are int/int single divisions (the
    q_text_quality rule — no rounding needed). Whole-text vowel-group
    counting equals the per-token sum because groups cannot span the
    space separator.

    Scale shape: pure map-side regex + array lambda in codegen — no
    shuffle, no UDF."""
    t = load_tables(spark, sf_dir)
    ts = F.col("ts")
    n_words = F.size(ts).cast("bigint")
    n_syll = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("[aeiou]+"), F.lit(0))
    ).cast("bigint")
    poly = F.size(
        F.filter(
            ts,
            lambda tok: F.size(
                F.regexp_extract_all(tok, F.lit("[aeiou]+"), F.lit(0))
            )
            >= 3,
        )
    ).cast("bigint")
    return t["documents"].select(
        "doc_id",
        F.split("text", " ").alias("ts"),
        "text",
    ).select(
        "doc_id",
        n_words.alias("n_words"),
        n_syll.alias("n_syllables"),
        (n_syll.cast("double") / F.size(ts)).alias("syllables_per_word"),
        poly.alias("n_polysyllabic"),
        (poly.cast("double") / F.size(ts)).alias("polysyllabic_frac"),
    )
