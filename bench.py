#!/usr/bin/env python
"""Headline benchmark: runs the bench-flagged registry queries.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {key: sec, ...}, "sf": <sf>}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default all cores).

Timing excludes SparkSession startup (one session for the whole suite —
the realistic cluster posture, SURVEY.md §6) but includes full query
execution; results are drained to a noop sink (full plan execution, no
driver transfer). Per query the reported number is the min of 2 runs
after a shared warm-up phase — the steady-state posture of a long-lived
cluster session; methodology and measured host noise in BENCHLOG.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from correlationapi_spark.registry import load_registry  # noqa: E402
from correlationapi_spark.session import get_spark  # noqa: E402


def _bench_index_append_phases(spark, sf_dir: str) -> dict:
    """Phase-split timing for q_sim_index_append (r12 verdict item 4:
    the key's single number was 34% one-time KMeans-train + base write,
    so the 2x gate was guarding a cost that does NOT recur — at scale
    only the O(delta) append and the O(n_probe/k_cells) probe run
    daily). Runs the exact same engine calls as the declared fn, but
    times build / append / probe separately; each of the 2 min-runs
    uses a FRESH store directory because ivf_append correctly refuses
    re-admitting ids it already holds. The key's headline number is
    append+probe (the recurring path); build is reported alongside in
    the `phases` field."""
    import time as _time

    from pyspark.sql import functions as F

    from correlationapi_spark.io import load_tables
    from correlationapi_spark.llm.similarity import (
        _ivf_append_dir,
        corpus_view,
        ivf_append,
        ivf_index,
        ivf_probe,
        ivf_read,
        ivf_write,
    )

    t = load_tables(spark, sf_dir)
    emb = corpus_view(t["embeddings"], "vec_id", "embedding")
    best = {"build": float("inf"), "append": float("inf"),
            "probe": float("inf")}
    for _ in range(2):
        path = _ivf_append_dir()
        t0 = _time.time()
        assigned, cents = ivf_index(
            emb.filter(F.col("vec_id") % 5 != 0), n_cells=16
        )
        ivf_write(assigned, cents, path)
        best["build"] = min(best["build"], _time.time() - t0)
        t0 = _time.time()
        ivf_append(spark, path, emb.filter(F.col("vec_id") % 5 == 0))
        best["append"] = min(best["append"], _time.time() - t0)
        t0 = _time.time()
        corpus, cents2 = ivf_read(spark, path)
        probes = corpus.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("probe_id"),
            F.col("v").alias("pv"),
            F.col("na").alias("pna"),
        )
        ivf_probe(corpus, cents2, probes, k=5, n_probe=6).write.format(
            "noop"
        ).mode("overwrite").save()
        best["probe"] = min(best["probe"], _time.time() - t0)
    return {k: round(v, 3) for k, v in best.items()}


def _bench_pq_stored_phases(spark, sf_dir: str) -> dict:
    """Phase-split timing for q_sim_topk_pq (r14 verdict item 2: the
    steady-state stored-code ANN path round 14 built was only bench'd
    by tools/pq_bench.py, which the driver never runs). attach = the
    ONE-TIME pq_attach (train residual book + encode the corpus into a
    new pointer version); probe_stored / probe_ivfpq = the RECURRING
    probes over the stored codes — full-scan ADC + exact refine (the
    declared q_sim_topk_pq shape) and the cell-pruned fused form (the
    declared q_sim_topk_ivfpq shape). The key's headline number is
    probe_stored; attach and probe_ivfpq report alongside in `phases`.
    Fresh store per min-run so the attach is really timed (the
    declared keys memoize their fixture store; a bench that attached
    twice to one store would time a layout-versioned re-attach
    instead)."""
    import time as _time

    from correlationapi_spark.io import load_tables
    from correlationapi_spark.llm.similarity import (
        _ivf_append_dir,
        corpus_view,
        ivf_index,
        ivf_write,
        pq_attach,
        pq_probe_stored,
    )

    emb = corpus_view(
        load_tables(spark, sf_dir)["embeddings"], "vec_id", "embedding"
    )
    best = {"attach": float("inf"), "probe_stored": float("inf"),
            "probe_ivfpq": float("inf")}
    for _ in range(2):
        path = _ivf_append_dir()
        assigned, cents = ivf_index(emb, n_cells=16)
        ivf_write(assigned, cents, path)  # setup, timed as ia `build`
        t0 = _time.time()
        pq_attach(spark, path)
        best["attach"] = min(best["attach"], _time.time() - t0)
        t0 = _time.time()
        pq_probe_stored(
            spark, path, list(range(5)), k=5, refine=25
        ).write.format("noop").mode("overwrite").save()
        best["probe_stored"] = min(
            best["probe_stored"], _time.time() - t0
        )
        t0 = _time.time()
        pq_probe_stored(
            spark, path, list(range(5)), k=5, n_probe=6, refine=25
        ).write.format("noop").mode("overwrite").save()
        best["probe_ivfpq"] = min(
            best["probe_ivfpq"], _time.time() - t0
        )
    return {k: round(v, 3) for k, v in best.items()}


def _bench_scd2_merge_phases(spark, sf_dir: str) -> dict:
    """Phase-split timing for q_scd2_merge — the same reasoning as
    q_sim_index_append (r12 verdict item 4): the declared fn rebuilds
    its base store from the event log every call because the oracle
    demands byte-equality with the full rebuild, but at scale only the
    incremental merge recurs. Build phase = the base store build (no
    staged batch); merge phase = scd2_merge_into of the staged CDC
    batch — the exact cost a daily pipeline pays, same engine calls,
    same delta cohort as the declared key. Fresh store per min-run
    (the CDC append contract forbids re-merging the same batch)."""
    import time as _time

    from pyspark.sql import functions as F

    from correlationapi_spark.io import load_tables
    from correlationapi_spark.operators.analytics import (
        _scd2_store_dir,
        scd2_merge,
        scd2_merge_into,
    )

    ev = load_tables(spark, sf_dir)["events"]
    delta_pred = (
        F.col("ts") >= F.lit("2024-01-28 00:00:00").cast("timestamp")
    ) & (F.col("user_id") % 37 == 0)
    delta = ev.filter(delta_pred).select(
        "user_id", "event_type", "ts", "event_id"
    )
    # SPARSE cohort (r13 verdict item 4): the declared %37 cohort is
    # CDC-realistic but at sf0.1 its user set hashes into all 32
    # buckets, so the declared-phase merge cost ≥ build there and the
    # partition pruning never SHOWS at the declared fixture. A late
    # batch of THREE users is the other realistic shape (a point
    # correction), and touched ≪ total demonstrates at every SF —
    # merge_sparse < build is the pruning exhibit, reported alongside.
    sparse_users = [
        r.user_id
        for r in delta.select("user_id").distinct()
        .orderBy("user_id").limit(3).collect()
    ]
    sparse = delta.filter(F.col("user_id").isin(sparse_users))
    best = {
        "build": float("inf"), "merge": float("inf"),
        "merge_sparse": float("inf"),
    }
    touched: dict = {}
    for _ in range(2):
        path = _scd2_store_dir()
        t0 = _time.time()
        scd2_merge(
            spark, ev.filter(~delta_pred), F.lit(False), _store_path=path
        )
        best["build"] = min(best["build"], _time.time() - t0)
        t0 = _time.time()
        _, st_sparse = scd2_merge_into(spark, path, sparse)
        best["merge_sparse"] = min(
            best["merge_sparse"], _time.time() - t0
        )
        t0 = _time.time()
        _, st = scd2_merge_into(
            spark, path,
            delta.filter(~F.col("user_id").isin(sparse_users)),
        )
        best["merge"] = min(best["merge"], _time.time() - t0)
        touched = {
            "sparse_touched": st_sparse["touched"],
            "touched": st["touched"],
            "total": st["total"],
        }
    return {**{k: round(v, 3) for k, v in best.items()}, **touched}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))
    except ValueError:
        sf = -1.0
    registry = load_registry()
    # FIXED sorted order: registry order changes as driver-verification
    # priorities move (round 2), which silently reshuffled which query
    # paid the first-query warm-up tail — sorted keys keep per-query
    # timings comparable across rounds.
    bench_keys = sorted(k for k, s in registry.items() if s.bench)

    # Round 5 load gate — BEFORE the session/warm-up so the reading is
    # EXTERNAL load only (the warm-up itself drives load1 past any
    # threshold on a 32-core host; measuring after it made the flag
    # self-triggering). Above LOAD1_GATE the timings are known-unusable
    # for round-over-round comparison (BENCHLOG.md r05 threshold
    # derivation), so wait (bounded) for the host to go idle, then stamp
    # `contended` from this pre-warm-up watermark either way.
    LOAD1_GATE = 2.0
    gate_waited = 0.0
    while os.getloadavg()[0] > LOAD1_GATE and gate_waited < 90:
        time.sleep(5)
        gate_waited += 5
    # keep the RAW reading for the contended comparison — rounding first
    # would stamp a run that timed out of the wait at load1 2.004 as
    # clean (2.0 > 2.0 is false); round only for display
    load_gate_raw = os.getloadavg()[0]
    load_gate = round(load_gate_raw, 2)

    spark = get_spark("correlationapi-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM (codegen, parquet reader, shuffle machinery) outside the
    # timed region — session startup is excluded by design (SURVEY.md §6),
    # and the first job otherwise pays one-time init that no steady-state
    # cluster query would. q_tpch_q10 (NOT a bench key) exercises the
    # broadcast-join + shuffle-agg + sort machinery end to end; measured:
    # without it the first bench query absorbs ~1.7 s of one-time cost.
    from correlationapi_spark.io import load_tables

    tables = load_tables(spark, sf_dir)
    tables["region"].count()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    registry["q_tpch_q10"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # q_tpch_q10 touches only TPC-H tables; without these, the first
    # documents/embeddings scan (cold parquet footer read + codec init)
    # lands inside a timed dedup/similarity query (r02: q_dedup_ngram
    # absorbed it, +39% vs its steady state).
    tables["documents"].selectExpr("sum(length(text))").collect()
    tables["embeddings"].selectExpr("sum(size(embedding))").collect()
    # Corr/Covar are ImperativeAggregate paths the TPC-H warm-up never
    # compiles; without this the first corr-family key pays ~1.5 s of JIT
    # (measured: q_agg_corr run-0 2.36 s cold vs 0.84 s after this line).
    from pyspark.sql import functions as F

    tables["lineitem"].join(
        tables["supplier"], F.col("l_suppkey") == F.col("s_suppkey")
    ).groupBy("s_nationkey").agg(
        F.corr("l_quantity", "l_tax"), F.covar_samp("l_quantity", "l_tax")
    ).write.format("noop").mode("overwrite").save()

    # Host-load watermarks: BENCHLOG documents ±25-45% total swings from
    # CONCURRENT JVMs on this shared host with identical plans (r03's
    # "+22% regression" was exactly that). load1_start/end bracket the
    # timed region (they INCLUDE this process's own load — attribution
    # context, not the contention flag); `contended` comes from the
    # pre-warm-up gate reading above.
    load_start = round(os.getloadavg()[0], 2)

    timings: dict[str, float] = {}
    phases: dict[str, dict] = {}
    total = 0.0
    for key in bench_keys:
        # label the jobs (guide §1.5) so a UI/event-log reading of a
        # bench run attributes every stage to its query
        spark.sparkContext.setJobDescription(f"bench:{key}")
        if key == "q_sim_index_append":
            # phase-split (r12 verdict item 4): the headline number is
            # the RECURRING append+probe path; the one-time build is
            # reported alongside in `phases`, outside the total
            ph = _bench_index_append_phases(spark, sf_dir)
            phases[key] = ph
            timings[key] = round(ph["append"] + ph["probe"], 3)
            total += ph["append"] + ph["probe"]
            continue
        if key == "q_scd2_merge":
            # same split for the SCD2 store: headline = the recurring
            # incremental merge; the base-store build reports alongside
            ph = _bench_scd2_merge_phases(spark, sf_dir)
            phases[key] = ph
            timings[key] = ph["merge"]
            total += ph["merge"]
            continue
        if key == "q_sim_topk_pq":
            # same split for the persisted-PQ ANN path (r14 verdict
            # item 2): headline = the recurring stored-code probe;
            # the one-time attach (and the fused ivfpq probe shape)
            # report alongside
            ph = _bench_pq_stored_phases(spark, sf_dir)
            phases[key] = ph
            timings[key] = ph["probe_stored"]
            total += ph["probe_stored"]
            continue
        # noop sink: full execution of the plan, result rows discarded at
        # the executor — a single pass with no driver-transfer skew.
        # min of 2 executions: single-shot wall times on this shared host
        # swing ±25% run-to-run (measured 13.7–17.7 s suite totals with
        # identical plans); the per-query minimum is the steady-state
        # number and makes round-over-round deltas mean something.
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            registry[key].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        timings[key] = round(best, 3)
        total += best
    spark.sparkContext.setJobDescription(None)

    load_end = round(os.getloadavg()[0], 2)
    print(
        json.dumps(
            {
                "metric": "bench_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "phases": phases,
                "sf": sf,
                "load1_gate": load_gate,
                "load1_start": load_start,
                "load1_end": load_end,
                # True when EXTERNAL load still breached the gate after
                # the bounded wait — the run completed but its numbers
                # carry host noise (threshold rationale in BENCHLOG r05)
                "contended": load_gate_raw > LOAD1_GATE,
                "gate_waited_sec": gate_waited,
            }
        )
    )


if __name__ == "__main__":
    main()
