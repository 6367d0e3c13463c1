"""Window functions (SURVEY.md §2.5).

Every ORDER BY inside a window carries a unique tie-break key so results
are pure functions of the data (SURVEY.md §4.2). All windows are
partitioned — no global single-partition sorts in declared keys; Spark ≥3.5
rewrites the rank-filter top-k pattern into WindowGroupLimit, pushing the
per-group limit below the shuffle (verified in the plan tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_tables
from ..registry import query


@query(
    "q_win_rownum",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
        WHERE o_orderkey <= 5000
    """,
    doc="row_number with unique tie-break.",
)
def q_win_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        t["orders"]
        .filter(F.col("o_orderkey") <= 5000)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
    )


@query(
    "q_win_rank",
    oracle="""
        SELECT c_nationkey, c_custkey, c_acctbal,
               rank()         OVER w AS rnk,
               dense_rank()   OVER w AS drnk,
               percent_rank() OVER w AS prnk,
               ntile(4)       OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal DESC, c_custkey) AS quartile,
               cume_dist() OVER w AS cdist
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)
    """,
    doc="rank / dense_rank / percent_rank / ntile / cume_dist.",
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rank/percent_rank/cume_dist are tie-stable (equal inputs → equal
    # outputs) so ordering by the value alone is deterministic; ntile is
    # positional and needs the unique tie-break.
    # percent_rank/cume_dist are emitted UNROUNDED: (rank−1)/(n−1) is an
    # exact rational that both engines compute with one identical IEEE
    # division, whereas round(…,6) hits half-boundaries on dyadic values
    # (333/640 = 0.5203125 at sf0.1 — found by the sf0.1 sweep).
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    wt = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return t["customer"].select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.ntile(4).over(wt).alias("quartile"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "q_win_lag",
    oracle="""
        SELECT user_id, event_id, value,
               round(lag(value, 1)  OVER w, 2) AS prev_value,
               round(lead(value, 1) OVER w, 2) AS next_value,
               round(value - coalesce(lag(value, 1) OVER w, 0), 2) AS delta
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="lag / lead over per-user event time.",
)
def q_win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value", 1).over(w)
    return t["events"].select(
        "user_id",
        "event_id",
        "value",
        F.round(prev, 2).alias("prev_value"),
        F.round(F.lead("value", 1).over(w), 2).alias("next_value"),
        F.round(F.col("value") - F.coalesce(prev, F.lit(0)), 2).alias("delta"),
    )


@query(
    "q_win_frame_rows",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice,
               round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                 AS running_spend,
               round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
                 AS avg_last3
        FROM orders
    """,
    doc="Running aggregates over ROWS frames.",
    bench=True,
)
def q_win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Running sums of 2 dp money stay on the 0.01 grid at every prefix, so
    # round(…,2) is grid-center-safe per numerics.py rule 1; the 3-row avg
    # divides a grid sum by ≤3 and rounds with ~1e-12 slack at 4 dp.
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_spend"),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias("avg_last3"),
    )


@query(
    "q_win_frame_range",
    oracle="""
        SELECT c_nationkey, c_custkey, c_acctbal,
               count(*) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
                              RANGE BETWEEN 500 PRECEDING AND CURRENT ROW)
                 AS peers_within_500,
               round(sum(c_acctbal) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
                              RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING), 2)
                 AS neighborhood_bal
        FROM customer
    """,
    doc="Value-based RANGE frames (peer groups by acctbal distance).",
)
def q_win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RANGE frames are value-determined: rows with equal order keys share a
    # frame, so no unique tie-break is needed for determinism.
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal")
    return t["customer"].select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.count("*").over(w.rangeBetween(-500, 0)).alias("peers_within_500"),
        F.round(F.sum("c_acctbal").over(w.rangeBetween(-500, 500)), 2).alias(
            "neighborhood_bal"
        ),
    )


@query(
    "q_win_time_range",
    oracle="""
        SELECT user_id, event_id, ts,
               count(*) OVER w           AS events_last_hour,
               round(sum(value) OVER w, 4) AS value_last_hour
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    doc="Time-interval RANGE frames: rolling 1h per-user count/sum "
    "(ordered on integer epoch-micros so both engines share the exact "
    "frame boundary).",
)
def q_win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark RANGE frames need a numeric order key; DuckDB's INTERVAL frame
    # on raw timestamps would disagree at sub-second boundaries with
    # Spark's second-truncated unix_timestamp — integer MICROSECONDS
    # (unix_micros / epoch_us) give the identical frame on both engines.
    # Per-user partitions keep the window parallel at any scale; frame
    # state is one hour of one user's events.
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return t["events"].select(
        "user_id",
        "event_id",
        "ts",
        F.count("*").over(w).alias("events_last_hour"),
        F.round(F.sum("value").over(w), 4).alias("value_last_hour"),
    )


@query(
    "q_win_firstlast",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice,
               first_value(o_totalprice) OVER w AS first_price,
               last_value(o_totalprice)  OVER w AS latest_price,
               nth_value(o_totalprice, 2) OVER w AS second_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="first_value / last_value / nth_value with explicit full frame.",
)
def q_win_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("latest_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@query(
    "q_topk_group",
    oracle="""
        SELECT nation_name, c_custkey, c_acctbal, rn FROM (
            SELECT n.n_name AS nation_name, c.c_custkey, c.c_acctbal,
                   row_number() OVER (PARTITION BY n.n_name
                                      ORDER BY c.c_acctbal DESC, c.c_custkey) AS rn
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        ) WHERE rn <= 3
    """,
    doc="Top-k per group (rank-filter → WindowGroupLimit pushdown).",
)
def q_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark ≥3.5 rewrites rank+filter into WindowGroupLimit: each map task
    keeps only its local top-k per group BEFORE the shuffle — the same
    state bound that makes this pattern safe on 100 TB facts."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation_name"),
            "c_custkey",
            "c_acctbal",
            F.row_number().over(
                Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), "c_custkey")
            ).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_win_distribution",
    oracle="""
        SELECT c_custkey, c_nationkey, c_acctbal,
               ntile(4)       OVER w AS quartile,
               percent_rank() OVER w AS pct_rank,
               cume_dist()    OVER w AS cum_dist
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    doc="Distribution window functions: ntile / percent_rank / cume_dist "
    "per nation partition.",
)
def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank-distribution family over one partitioned window — the
    building block of per-group quantile bucketing (quartile assignment
    for quality tiers, percentile features). The (c_acctbal, c_custkey)
    order is TOTAL, so ntile's bucket boundaries and both ratios are
    deterministic; percent_rank/cume_dist are int/int divisions of
    identical operands → bit-identical doubles on both engines, no
    rounding needed. One shuffle on the partition key, same scale shape
    as every partitioned window here."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return t["customer"].select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
    )


@query(
    "q_win_median",
    oracle="""
        SELECT event_id, event_type,
               round(median(value) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND CURRENT ROW), 6)
                   AS rolling_median,
               count(*) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND CURRENT ROW) AS n_win
        FROM events
    """,
    doc="Rolling median over a bounded trailing frame per event type.",
)
def q_win_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median — the robust-baseline twin of q_anomaly's rolling
    mean (a median baseline shrugs off the very outliers you're hunting).

    Spark rejects ordered-set aggregates (median/percentile) over a
    window FRAME, so the frame's ≤21 values are collected and sorted
    per row — bounded state, still one window pass, parallel across
    event_type partitions (this is exactly the state a native rolling
    median would keep; at 100 TB the cost is the frame size, never the
    history length). DuckDB uses its native framed median. Even counts
    average the two middle doubles — the same IEEE halving on both
    engines ((x+x)/2 == x keeps odd counts exact); round 6 guards the
    reorder ulp."""
    ev = load_tables(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, 0)
    )
    arr = F.sort_array(F.collect_list("value").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    return ev.select(
        "event_id",
        "event_type",
        F.round((lo + hi) / 2.0, 6).alias("rolling_median"),
        n.alias("n_win"),
    )


@query(
    "q_win_share",
    oracle="""
        WITH per_nation AS (
            SELECT r_name, n_name,
                   CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                        AS BIGINT) AS bal_cents
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1, 2
        )
        SELECT r_name, n_name,
               round(bal_cents / 100.0, 2) AS nation_bal,
               round(CAST(bal_cents AS DOUBLE)
                     / sum(bal_cents) OVER (PARTITION BY r_name), 6)
                   AS share_of_region,
               round(CAST(bal_cents AS DOUBLE)
                     / sum(bal_cents) OVER (), 6) AS share_of_total
        FROM per_nation
    """,
    doc="Share-of-total ratios: each nation's balance as a fraction of "
    "its region and of the grand total (window-over-aggregate).",
)
def q_win_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The percent-of-parent OLAP idiom: aggregate once, then window
    sums over the AGGREGATED relation give each row its denominator —
    never a second scan or a self-join against the totals. The windows
    run over groups-level rows (≤ nations), so the unpartitioned
    grand-total window is a single tiny exchange by construction.
    Balances sum as exact integer cents (numerics rule 2 — c_acctbal is
    2 dp); the share divisions see bit-identical integer operands on
    both engines, rounded at 6."""
    t = load_tables(spark, sf_dir)
    from ..numerics import cents

    per_nation = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum(cents("c_acctbal")).alias("bal_cents"))
    )
    w_region = Window.partitionBy("r_name")
    w_all = Window.partitionBy()
    return per_nation.select(
        "r_name",
        "n_name",
        F.round(F.col("bal_cents") / 100.0, 2).alias("nation_bal"),
        F.round(
            F.col("bal_cents").cast("double") / F.sum("bal_cents").over(w_region), 6
        ).alias("share_of_region"),
        F.round(
            F.col("bal_cents").cast("double") / F.sum("bal_cents").over(w_all), 6
        ).alias("share_of_total"),
    )


@query(
    "q_win_ntile",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(ntile(4) OVER (PARTITION BY l_returnflag
                                   ORDER BY l_extendedprice, l_orderkey,
                                            l_linenumber)
                    AS BIGINT) AS price_quartile,
               l_returnflag
        FROM lineitem WHERE l_orderkey <= 1000
    """,
    doc="ntile(4) quartile bucketing of price within each returnflag — "
    "the equal-frequency binning window (quartile/decile assignment).",
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency bucketing: ntile(n) deals rows of each ordered
    partition into n buckets whose sizes differ by at most one — the
    windowed way to tag quartiles/deciles without computing explicit
    quantile cut points. The ORDER BY carries a full unique tie-break
    (price, orderkey, linenumber): ntile assigns by ROW POSITION, not
    value, so ties at a bucket boundary would otherwise split
    nondeterministically between engines (SURVEY §4.2's total-order
    rule). Partitioned by returnflag — parallel across groups, never a
    global single-partition window; the pushed l_orderkey filter keeps
    the exhibit small at any SF."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") <= 1000)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.ntile(4).over(w).cast("bigint").alias("price_quartile"),
            "l_returnflag",
        )
    )


@query(
    "q_win_cumulative_distinct",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   min(CAST(epoch_us(date_trunc('day', ts))
                            // 86400000000 AS BIGINT)) AS first_dn
            FROM events GROUP BY 1
        ), daily AS (
            SELECT first_dn AS dn, CAST(count(*) AS BIGINT) AS new_users
            FROM firsts GROUP BY 1
        )
        SELECT dn, new_users,
               CAST(sum(new_users) OVER (ORDER BY dn
                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cumulative_users
        FROM daily
    """,
    doc="Cumulative distinct users by day — COUNT(DISTINCT) OVER a "
    "running frame, which no engine's window supports directly, "
    "expressed as the first-activity trick: min-day per user, then a "
    "running sum of daily first-timers.",
)
def q_win_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Total unique users to date' — the growth-curve metric. A naive
    running COUNT(DISTINCT user) window is unsupported (and would hold
    an unbounded set per frame anyway); the scalable identity is that
    a user adds to the cumulative count exactly ONCE, on their first
    active day: distinct-to-date(d) = Σ_{d' ≤ d} first_timers(d').

    Determinism: pure integer counts on exact epoch days.

    Scale shape: one user-keyed aggregate (min day — map-side
    combinable), one day-grain count, then a running sum over the
    calendar-bounded daily table (~|days| rows — the documented small
    exception; for an unbounded key domain this last step is
    ordering.global_running_sum)."""
    t = load_tables(spark, sf_dir)
    dn = (
        F.unix_micros(F.date_trunc("day", F.col("ts"))) / F.lit(86400000000)
    ).cast("bigint")
    firsts = (
        t["events"]
        .select("user_id", dn.alias("dn"))
        .groupBy("user_id")
        .agg(F.min("dn").alias("first_dn"))
    )
    daily = firsts.groupBy(F.col("first_dn").alias("dn")).agg(
        F.count("*").alias("new_users")
    )
    w = Window.orderBy("dn").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "dn", "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    )
