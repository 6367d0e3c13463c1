"""REST adapter: the reference's HTTP service surface over CorrelationAPI.

BigDataGrapes-EU/CorrelationAPI is consumed over HTTP (SURVEY.md §1.1 /
§3.1, capability-level — the reference tree was empty at survey time, so
the route inventory is reconstructed from the capability survey, not from
file:line citations). This module is that listener built ONLY on the
Python standard library (http.server) — no web framework exists in the
container, and none is needed for a JSON-for-JSON contract:

  GET  /health                                → {"status": "ok"}
  GET  /datasets                              → ["name", ...]
  POST /datasets/{name}   {"path","format"}   → {"dataset","columns"}
  GET  /datasets/{name}/variables             → ["numeric_col", ...]
  GET  /correlate?dataset=&x=&y=[&method=pearson|spearman|kendall|bicor][&group_by=]
  GET  /association?dataset=&a=&b=[&method=cramer|theil|mi|eta]
  GET  /distribution?dataset=&var=[&group_by=][&gini=1][&percentiles=0.5,0.9][&method=exact|sketch]
  GET  /compare?dataset=&var=&group_by=&a=&b=  (two-sample KS + Mann-Whitney)
  GET  /anova?dataset=&var=&group_by=[&center=mean|median]
       (k-sample one-way ANOVA F, or Brown-Forsythe W with center=median)
  GET  /tukey?dataset=&var=&group_by=  (Tukey-Kramer HSD pairwise post-hoc)
  GET  /integrity?child=&fk=&parent=&pk=  (FK-edge referential audit)
  GET  /basket?dataset=&basket=&item=[&min_count=10][&limit=50]
       (association rules: support/confidence/lift per item pair)
  GET  /changepoint?dataset=&var=&time=[&grain=day]
       (CUSUM curve + estimated level-shift period)
  GET  /trend?dataset=&var=&time=[&group_by=][&grain=day]
       (per-group OLS trend: slope/intercept/R2 over period totals)
  GET  /decompose?dataset=&var=&time=[&grain=day][&period=7]
       (classical additive decomposition: per-phase seasonal index +
       centered-MA trend mean)
  GET  /weighted_quantile?dataset=&var=&weight=[&group_by=][&quantiles=0.25,0.5,0.75]
       (weighted percentiles via exact integer running-weight cutoffs)
  GET  /gopher?dataset=[&id=doc_id][&text=text][&limit=100]
       (Gopher-rule quality report: per-rule pass counts + failing docs)
  GET  /forecast?dataset=&var=&time=[&group_by=][&grain=day]
       [&method=holt|holtwinters|naive][&season=7][&alpha=0.3][&beta=0.1][&gamma=0.2]
       (Holt level+trend, additive Holt-Winters with weekly season, or
       seasonal-naive WAPE/MAE backtest)
  GET  /knn_graph?dataset=&id=&vector=[&k=5][&limit=100]
       (mutual k-NN cosine graph: totals + strongest edges)
  GET  /pca?dataset=&id=&vector=[&k=8]  (PCA spectrum of an embedding column)
  GET  /drift?dataset=&var=&time=[&grain=day]  (numeric var: per-period
       KS/PSI/KL/JS vs reference; string var: per-period chi-square)
  POST /mixed_matrix {"dataset"[,"variables"]}  (type-appropriate measure per pair)
  GET  /survival?dataset=&start=&end=[&group_by=&a=&b=]  (KM curve [+ log-rank])
  POST /matrix            {"dataset","variables","method"}
  GET  /lagged?dataset=&time=&value=[&lag=][&grain=][&fill_gaps=]
  GET  /rolling?dataset=&time=&value=[&window=][&lag=][&grain=][&fill_gaps=]
  GET  /xcorr?dataset=&time=&x=&y=[&max_lag=][&grain=][&fill_gaps=]
  GET  /acf?dataset=&time=&value=[&max_lag=][&grain=][&fill_gaps=]
       → lags (acf per lag) + pacf (Durbin-Levinson) + significance band
  GET  /partial?dataset=&x=&y=&control=[&group_by=]
       (control may be comma-separated for higher-order partials)
  GET  /similar?dataset=&id=&vector=&probes=1,2[&k=][&method=exact|ivf|pq|ivfpq]
       [&n_cells=][&n_probe=]     → top-k neighbors per probe id (cosine
       for exact/ivf, code-space ADC L2 for pq/ivfpq)
  POST /similar {"dataset","id","vector","query_vectors":[[...],…],…}
       → top-k neighbors of RAW embeddings (keys q0, q1, …)
  POST /index/build  {"dataset","id","vector","path"
       [,"n_cells","train_fraction","where"]}
       → 201 + persisted-IVF status (cell-partitioned corpus + centroids;
         refuses to clobber a non-index directory; 200 on rebuild, with
         "pq_dropped": true when the replaced index had a PQ attachment
         the rebuild discarded — re-run /index/pq-attach)
  POST /index/append {"dataset","id","vector","path"[,"where"]}
       → assign ONLY the (filtered) rows to the frozen centroids, append
         their cell files, return the post-append drift gauge
  GET  /index/status?path=        → cell-balance gauge (recluster
         signal) + pq_attached (will pq/ivfpq probes answer here?)
  POST /index/probe  {"path","probe_ids":[…][,"k","n_probe","method",
         "refine"]}
       → top-k over the persisted index (partition-pruned candidate
         read); method=ivf (exact cosine refine, default) | pq |
         ivfpq (round 14: score the attached store's 6-bit code
         column — no per-call training, neighbors carry adc_l2);
         "refine": R (round 15, pq/ivfpq only) exactly re-ranks the
         ADC top-R per probe — neighbors then carry exact l2
  POST /index/pq_attach {"path"}  → attach product quantization: train
         the residual codebook (v − per-cell anchor, round 15) from
         the stored corpus, rewrite it with the code column, publish
         books + anchors + codes in one atomic pointer swap
  POST /index/delete {"path","ids":[…]}
       → tombstone ids (probes stop answering; compact reclaims bytes)
  POST /index/compact {"path"}    → rewrite dead cells live-only, clear
         tombstones, right-size the id Bloom
  POST /index/recluster {"path"[,"threshold","n_cells","train_fraction"]}
       → re-train the quantizer + rebuild when max/avg cell > threshold
         (round 14: staged as unreferenced versioned objects, committed
         by ONE atomic layout-pointer swap — readers never torn; no-op
         below threshold)
  POST /index/recover {"path"}  → reclaim retired/orphan store objects
         now (round 14: nothing needs a roll-forward anymore;
         recovered=false when there was nothing to reclaim)
  POST /psi/repin {"dataset","time","value","path"[,"start","end","bins"]}
       → pin/rotate a versioned PSI reference over any window
  GET  /psi/status?path=          → the live PSI reference pin
  GET  /psi/drift?dataset=&time=&value=&path=  → per-window PSI vs pin
  POST /scd2/merge {"dataset","user","event","time","order","path"
       [,"n_buckets"]}  → merge a staged CDC batch into an EXISTING
         bucketed SCD2 store (touches only the batch's buckets —
         round 14: per-bucket versioned objects behind one atomic
         pointer swap; n_buckets only for pre-metadata stores — newer
         stores carry their modulus in the layout pointer)
  POST /scd2/recover {"path"}  → heal a pre-pointer interrupted commit
         and reclaim retired/orphan bucket objects (idempotent;
         recovered=false when nothing to do)
  POST /scd2/snapshot {"path","ts"[,"users","limit"]}  → point-in-time
         dimension read (pure read despite POST; bucket-pruned with
         users)
  GET  /dedup?dataset=&id=&text=[&method=exact|keep_best|ngram|minhash][&threshold=]
       [&limit=]                  → duplicate listing + engine-side totals
  GET  /assign?dataset=&id=&vector=&centroids=0,1,2[&limit=]
       → nearest-centroid cosine assignment + per-cell counts
  GET  /kmeans?dataset=&id=&vector=[&k=][&n_iter=][&tol=][&centroids=1]
       → iterative spherical k-means: sizes, mean cosines, objective trace
  GET  /transitions?dataset=&user=&event=&time=&order=
       → first-order Markov transition matrix over per-user chains
  GET  /stationary?dataset=&user=&event=&time=&order=[&n_iter=50]
       → stationary distribution of the chain (long-run event-type share)
  GET  /attribution?dataset=&user=&event=&time=&order=&target=
       → last-touch conversion attribution buckets
  GET  /attribution_multi?dataset=&user=&event=&time=&order=&target=
       [&horizon_days=30] → linear/position/time-decay credit per model
  GET  /bpe?dataset=&id=&text=[&n_merges=24][&vocab_cap=5000]
       → trained BPE merges table + corpus compression totals
  GET  /pagerank?dataset=&src=&dst=[&weight=][&damping=][&n_iter=][&limit=]
       → weighted PageRank over an edge table, top nodes by rank
  GET  /pack?dataset=&id=&text=[&capacity=][&limit=][&tokenizer=ws|bpeish]
       → concat-and-chunk packing layout + corpus token/chunk totals
       (round 6: the LLM operators are parameterized service calls, not
       only canned keys)

Error mapping at the HTTP boundary: KeyError → 404 (unknown dataset /
variable), ValueError|TypeError → 400 (bad method / grain / non-numeric
column), anything else → 500 with the exception class name. Every
response body is one JSON document.

Mutation guard (round 12): the routes that change server or on-disk
state — dataset registration, /index/{build,append,delete,compact,
recluster,pq_attach}, /psi/repin — are gated behind a shared token. With no
token configured the server is READ-ONLY: those routes answer 403 and
name the knob to turn. With ``auth_token`` set (``serve --auth-token``
or the CORRELATIONAPI_AUTH_TOKEN env var), a mutating request must
carry it in ``Authorization: Bearer <token>`` (or ``X-Auth-Token``);
a missing or wrong token answers 401 + WWW-Authenticate. Read routes
stay open — they expose only registered datasets, and the compare is
constant-time (hmac.compare_digest). POST alone is NOT the mutation
signal: /matrix, /mixed_matrix, /similar and /index/probe are pure
reads that ride POST for their body payloads.

Scale note: the handler threads share ONE SparkSession — Spark sessions
are thread-safe and each request is a short driver-side job submission;
the heavy lifting runs on the cluster. ThreadingHTTPServer keeps slow
queries from blocking /health.
"""

from __future__ import annotations

import hmac
import json
import os
import re
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Mapping
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession

from .api import CorrelationAPI

_DATASET_RE = re.compile(r"^/datasets/([A-Za-z0-9_.-]+)$")
_VARIABLES_RE = re.compile(r"^/datasets/([A-Za-z0-9_.-]+)/variables$")

# Routes that mutate server or on-disk state. Everything else —
# including the POST-carrying pure reads (/matrix, /mixed_matrix,
# /similar, /index/probe) — stays open.
_MUTATING_PATHS = frozenset({
    "/index/build", "/index/append", "/index/delete",
    "/index/compact", "/index/recluster", "/index/recover",
    "/index/pq_attach",
    "/psi/repin", "/scd2/merge", "/scd2/recover",
})


def _is_mutation(method: str, path: str) -> bool:
    """True when (method, path) would change server or persisted state."""
    if method != "POST":
        return False
    return path in _MUTATING_PATHS or _DATASET_RE.match(path) is not None


def _presented_token(headers: Mapping[str, str]) -> str | None:
    """Extract the shared token from Authorization: Bearer or X-Auth-Token."""
    auth = headers.get("Authorization") or ""
    if auth.startswith("Bearer "):
        return auth[len("Bearer "):].strip()
    tok = headers.get("X-Auth-Token")
    return tok.strip() if tok else None


def _authorize(method: str, path: str, headers: Mapping[str, str],
               auth_token: str | None) -> tuple[int, Any] | None:
    """Gate mutating routes; None = allowed, else the refusal response.

    No configured token → the server is read-only (403 with the knob
    named). Configured token → constant-time compare against the
    presented header; missing/wrong → 401. Pure function so the policy
    is unit-testable without sockets (mirrors _route)."""
    if not _is_mutation(method, path):
        return None
    if auth_token is None:
        return 403, {"error": (
            "server is read-only: no auth token configured; start serve "
            "with --auth-token (or CORRELATIONAPI_AUTH_TOKEN) to enable "
            f"mutating routes like {method} {path}"
        )}
    presented = _presented_token(headers)
    # compare encoded bytes: compare_digest on str requires ASCII and
    # raises TypeError otherwise — and _authorize runs BEFORE the
    # handler's error-mapping try, so a garbled header would kill the
    # connection with no HTTP response instead of a 401
    if presented is None or not hmac.compare_digest(
        presented.encode("utf-8"), auth_token.encode("utf-8")
    ):
        return 401, {"error": "missing or invalid auth token"}
    return None


def _route(api: CorrelationAPI, method: str, path: str,
           query: dict[str, str], body: dict[str, Any]) -> tuple[int, Any]:
    """Pure routing function (unit-testable without sockets)."""
    if method == "GET" and path == "/health":
        return 200, {"status": "ok"}
    if method == "GET" and path == "/datasets":
        return 200, api.list_datasets()
    m = _VARIABLES_RE.match(path)
    if method == "GET" and m:
        return 200, api.variables(m.group(1))
    m = _DATASET_RE.match(path)
    if method == "POST" and m:
        if "path" not in body:
            raise ValueError('body must contain "path"')
        return 201, api.register_dataset(
            m.group(1), body["path"], fmt=body.get("format", "parquet")
        )
    if method == "GET" and path == "/correlate":
        for req in ("dataset", "x", "y"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.correlate(
            query["dataset"], query["x"], query["y"],
            method=query.get("method", "pearson"),
            group_by=query.get("group_by"),
        )
    if method == "GET" and path == "/association":
        for req in ("dataset", "a", "b"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.association(
            query["dataset"], query["a"], query["b"],
            method=query.get("method", "cramer"),
        )
    if method == "GET" and path == "/compare":
        for req in ("dataset", "var", "group_by", "a", "b"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.compare(
            query["dataset"], query["var"], query["group_by"],
            query["a"], query["b"],
        )
    if method == "GET" and path == "/anova":
        for req in ("dataset", "var", "group_by"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.anova(
            query["dataset"], query["var"], query["group_by"],
            center=query.get("center", "mean"),
        )
    if method == "GET" and path == "/tukey":
        for req in ("dataset", "var", "group_by"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.tukey(
            query["dataset"], query["var"], query["group_by"],
        )
    if method == "GET" and path == "/integrity":
        for req in ("child", "fk", "parent", "pk"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.integrity(
            query["child"], query["fk"], query["parent"], query["pk"],
        )
    if method == "GET" and path == "/basket":
        for req in ("dataset", "basket", "item"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.basket(
            query["dataset"], query["basket"], query["item"],
            min_count=int(query.get("min_count", "10")),
            limit=int(query.get("limit", "50")),
        )
    if method == "GET" and path == "/changepoint":
        for req in ("dataset", "var", "time"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.changepoint(
            query["dataset"], query["var"], query["time"],
            grain=query.get("grain", "day"),
        )
    if method == "GET" and path == "/forecast":
        for req in ("dataset", "var", "time"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.forecast(
            query["dataset"], query["var"], query["time"],
            group_by=query.get("group_by"),
            grain=query.get("grain", "day"),
            method=query.get("method", "holt"),
            season=int(query.get("season", "7")),
            alpha=float(query.get("alpha", "0.3")),
            beta=float(query.get("beta", "0.1")),
            gamma=float(query.get("gamma", "0.2")),
        )
    if method == "GET" and path == "/trend":
        for req in ("dataset", "var", "time"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.trend(
            query["dataset"], query["var"], query["time"],
            group_by=query.get("group_by"),
            grain=query.get("grain", "day"),
        )
    if method == "GET" and path == "/decompose":
        for req in ("dataset", "var", "time"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.decompose(
            query["dataset"], query["var"], query["time"],
            grain=query.get("grain", "day"),
            period=int(query.get("period", "7")),
        )
    if method == "GET" and path == "/weighted_quantile":
        for req in ("dataset", "var", "weight"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.weighted_quantile(
            query["dataset"], query["var"], query["weight"],
            group_by=query.get("group_by"),
            quantiles=query.get("quantiles", "0.25,0.5,0.75"),
        )
    if method == "GET" and path == "/gopher":
        if "dataset" not in query:
            raise ValueError("missing query parameter 'dataset'")
        return 200, api.gopher(
            query["dataset"],
            id_col=query.get("id", "doc_id"),
            text_col=query.get("text", "text"),
            limit=int(query.get("limit", "100")),
        )
    if method == "GET" and path == "/pca":
        for req in ("dataset", "id", "vector"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.pca(
            query["dataset"], query["id"], query["vector"],
            k=int(query.get("k", "8")),
        )
    if method == "GET" and path == "/survival":
        for req in ("dataset", "start", "end"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.survival(
            query["dataset"], query["start"], query["end"],
            group_by=query.get("group_by"),
            group_a=query.get("a"), group_b=query.get("b"),
        )
    if method == "GET" and path == "/drift":
        for req in ("dataset", "var", "time"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.drift(
            query["dataset"], query["var"], query["time"],
            grain=query.get("grain", "day"),
        )
    if method == "GET" and path == "/distribution":
        for req in ("dataset", "var"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.distribution(
            query["dataset"], query["var"],
            group_by=query.get("group_by"),
            gini=query.get("gini", "") in ("1", "true", "yes"),
            percentiles=(
                [float(x) for x in query["percentiles"].split(",") if x]
                if "percentiles" in query else None
            ),
            method=query.get("method", "exact"),
            normality=query.get("normality", "") in ("1", "true", "yes"),
        )
    if method == "POST" and path == "/matrix":
        if "dataset" not in body:
            raise ValueError('body must contain "dataset"')
        return 200, api.correlation_matrix(
            body["dataset"], body.get("variables"),
            method=body.get("method", "pearson"),
        )
    if method == "POST" and path == "/mixed_matrix":
        if "dataset" not in body:
            raise ValueError('body must contain "dataset"')
        return 200, api.mixed_matrix(body["dataset"], body.get("variables"))
    if method == "GET" and path == "/lagged":
        for req in ("dataset", "time", "value"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.lagged_correlation(
            query["dataset"], query["time"], query["value"],
            lag=int(query.get("lag", 1)), grain=query.get("grain", "day"),
            fill_gaps=query.get("fill_gaps", "").lower() in ("1", "true"),
        )
    if method == "GET" and path == "/rolling":
        for req in ("dataset", "time", "value"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.rolling_correlation(
            query["dataset"], query["time"], query["value"],
            window=int(query.get("window", 14)),
            lag=int(query.get("lag", 1)), grain=query.get("grain", "day"),
            fill_gaps=query.get("fill_gaps", "").lower() in ("1", "true"),
        )
    if method == "GET" and path == "/partial":
        for req in ("dataset", "x", "y", "control"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        from .api import parse_control_arg

        return 200, api.partial_correlation(
            query["dataset"], query["x"], query["y"],
            parse_control_arg(query["control"]),
            group_by=query.get("group_by"),
        )
    if method == "GET" and path == "/acf":
        for req in ("dataset", "time", "value"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.acf(
            query["dataset"], query["time"], query["value"],
            max_lag=int(query.get("max_lag", 10)),
            grain=query.get("grain", "day"),
            fill_gaps=query.get("fill_gaps", "").lower() in ("1", "true"),
        )
    if method == "GET" and path == "/similar":
        for req in ("dataset", "id", "vector", "probes"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        try:
            probe_ids = [int(p) for p in query["probes"].split(",") if p.strip()]
        except ValueError:
            raise ValueError("probes must be comma-separated integers") from None
        return 200, api.similar(
            query["dataset"], query["id"], query["vector"], probe_ids,
            k=int(query.get("k", 5)),
            method=query.get("method", "exact"),
            n_cells=int(query.get("n_cells", 16)),
            n_probe=int(query.get("n_probe", 6)),
        )
    if method == "POST" and path == "/similar":
        # raw query vectors don't fit a query string: POST body
        # {"dataset","id","vector","query_vectors":[[...],...],
        #  "k","method","n_cells","n_probe"}
        for req in ("dataset", "id", "vector", "query_vectors"):
            if req not in body:
                raise ValueError(f'body must contain "{req}"')
        return 200, api.similar(
            body["dataset"], body["id"], body["vector"],
            k=int(body.get("k", 5)),
            method=body.get("method", "exact"),
            n_cells=int(body.get("n_cells", 16)),
            n_probe=int(body.get("n_probe", 6)),
            query_vectors=body["query_vectors"],
        )
    if method == "POST" and path == "/index/build":
        for req in ("dataset", "id", "vector", "path"):
            if req not in body:
                raise ValueError(f'body must contain "{req}"')
        res = api.index_build(
            body["dataset"], body["id"], body["vector"], body["path"],
            n_cells=int(body.get("n_cells", 16)),
            train_fraction=float(body.get("train_fraction", 1.0)),
            where=body.get("where"),
        )
        # 201 on first build, 200 when an existing index was replaced
        # in place (advice r10)
        return (200 if res.get("rebuilt") else 201), res
    if method == "POST" and path == "/index/append":
        for req in ("dataset", "id", "vector", "path"):
            if req not in body:
                raise ValueError(f'body must contain "{req}"')
        return 200, api.index_append(
            body["dataset"], body["id"], body["vector"], body["path"],
            where=body.get("where"),
        )
    if method == "GET" and path == "/index/status":
        if "path" not in query:
            raise ValueError("missing query parameter 'path'")
        return 200, api.index_status(query["path"])
    if method == "POST" and path == "/index/probe":
        for req in ("path", "probe_ids"):
            if req not in body:
                raise ValueError(f'body must contain "{req}"')
        return 200, api.index_probe(
            body["path"], [int(p) for p in body["probe_ids"]],
            k=int(body.get("k", 5)), n_probe=int(body.get("n_probe", 6)),
            method=str(body.get("method", "ivf")),
            refine=(
                None if body.get("refine") is None
                else int(body["refine"])
            ),
        )
    if method == "POST" and path == "/index/delete":
        for req in ("path", "ids"):
            if req not in body:
                raise ValueError(f'body must contain "{req}"')
        return 200, api.index_delete(
            body["path"], [int(i) for i in body["ids"]]
        )
    if method == "POST" and path == "/index/compact":
        if "path" not in body:
            raise ValueError('body must contain "path"')
        return 200, api.index_compact(body["path"])
    if method == "POST" and path == "/index/pq_attach":
        if "path" not in body:
            raise ValueError('body must contain "path"')
        return 200, api.index_pq_attach(body["path"])
    if method == "POST" and path == "/index/recover":
        if "path" not in body:
            raise ValueError('body must contain "path"')
        return 200, api.index_recover(body["path"])
    if method == "POST" and path == "/scd2/merge":
        for req in ("dataset", "user", "event", "time", "order", "path"):
            if req not in body:
                raise ValueError(f'body must contain "{req}"')
        nb = body.get("n_buckets")
        return 200, api.scd2_merge(
            body["dataset"], body["user"], body["event"], body["time"],
            body["order"], body["path"],
            n_buckets=None if nb is None else int(nb),
        )
    if method == "POST" and path == "/scd2/snapshot":
        # a pure read despite the body-carrying POST (the /matrix
        # convention) — deliberately NOT in _MUTATING_PATHS
        for req in ("path", "ts"):
            if req not in body:
                raise ValueError(f'body must contain "{req}"')
        users = body.get("users")
        if users is not None and not isinstance(users, list):
            # a scalar string "12" would iterate per-CHARACTER into
            # [1, 2] and silently answer for the wrong users
            raise ValueError('"users" must be a JSON array of ids')
        # ids pass through UNTYPED (advice r13: int(u) here made
        # string-keyed stores unqueryable and silently truncated 1.9
        # to user 1) — scd2_snapshot_at coerces them from the store's
        # own persisted key_type and rejects non-integral numerics
        return 200, api.scd2_snapshot(
            body["path"], body["ts"],
            users=users,
            limit=int(body.get("limit", 1000)),
        )
    if method == "POST" and path == "/scd2/recover":
        if "path" not in body:
            raise ValueError('body must contain "path"')
        return 200, api.scd2_recover_store(body["path"])
    if method == "POST" and path == "/index/recluster":
        if "path" not in body:
            raise ValueError('body must contain "path"')
        return 200, api.index_recluster(
            body["path"],
            threshold=float(body.get("threshold", 3.0)),
            n_cells=(
                int(body["n_cells"]) if "n_cells" in body else None
            ),
            train_fraction=float(body.get("train_fraction", 1.0)),
        )
    if method == "POST" and path == "/psi/repin":
        for req in ("dataset", "time", "value", "path", "end"):
            if req not in body:
                raise ValueError(f'body must contain "{req}"')
        return 201, api.psi_repin(
            body["dataset"], body["time"], body["value"], body["path"],
            end=body["end"], start=body.get("start"),
        )
    if method == "GET" and path == "/psi/status":
        if "path" not in query:
            raise ValueError("missing query parameter 'path'")
        return 200, api.psi_status(query["path"])
    if method == "GET" and path == "/psi/drift":
        for req in ("dataset", "time", "value", "path"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.psi_drift(
            query["dataset"], query["time"], query["value"], query["path"]
        )
    if method == "GET" and path == "/dedup":
        for req in ("dataset", "id", "text"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.dedup(
            query["dataset"], query["id"], query["text"],
            method=query.get("method", "exact"),
            threshold=float(query.get("threshold", 0.5)),
            limit=int(query.get("limit", 1000)),
        )
    if method == "GET" and path == "/assign":
        for req in ("dataset", "id", "vector", "centroids"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.assign(
            query["dataset"], query["id"], query["vector"],
            centroid_ids=[int(x) for x in query["centroids"].split(",") if x],
            limit=int(query.get("limit", 1000)),
        )
    if method == "GET" and path == "/knn_graph":
        for req in ("dataset", "id", "vector"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.knn_graph(
            query["dataset"], query["id"], query["vector"],
            k=int(query.get("k", 5)),
            limit=int(query.get("limit", 100)),
        )
    if method == "GET" and path == "/transitions":
        for req in ("dataset", "user", "event", "time", "order"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.transitions(
            query["dataset"], query["user"], query["event"],
            query["time"], query["order"],
        )
    if method == "GET" and path == "/stationary":
        for req in ("dataset", "user", "event", "time", "order"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.stationary(
            query["dataset"], query["user"], query["event"],
            query["time"], query["order"],
            n_iter=int(query.get("n_iter", "50")),
        )
    if method == "GET" and path == "/attribution":
        for req in ("dataset", "user", "event", "time", "order", "target"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.attribution(
            query["dataset"], query["user"], query["event"],
            query["time"], query["order"], query["target"],
        )
    if method == "GET" and path == "/attribution_multi":
        for req in ("dataset", "user", "event", "time", "order", "target"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.attribution_multi(
            query["dataset"], query["user"], query["event"],
            query["time"], query["order"], query["target"],
            horizon_days=int(query.get("horizon_days", 30)),
        )
    if method == "GET" and path == "/bpe":
        for req in ("dataset", "id", "text"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.bpe_train(
            query["dataset"], query["id"], query["text"],
            n_merges=int(query.get("n_merges", 24)),
            vocab_cap=int(query.get("vocab_cap", 5000)),
        )
    if method == "GET" and path == "/pagerank":
        for req in ("dataset", "src", "dst"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.pagerank(
            query["dataset"], query["src"], query["dst"],
            weight=query.get("weight"),
            damping=float(query.get("damping", 0.85)),
            n_iter=int(query.get("n_iter", 20)),
            limit=int(query.get("limit", 100)),
        )
    if method == "GET" and path == "/kmeans":
        for req in ("dataset", "id", "vector"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.kmeans(
            query["dataset"], query["id"], query["vector"],
            k=int(query.get("k", 8)),
            n_iter=int(query.get("n_iter", 10)),
            tol=float(query.get("tol", 1e-4)),
            include_centroids=query.get("centroids", "0")
            in ("1", "true", "yes"),
        )
    if method == "GET" and path == "/pack":
        for req in ("dataset", "id", "text"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.pack(
            query["dataset"], query["id"], query["text"],
            capacity=int(query.get("capacity", 2048)),
            limit=int(query.get("limit", 1000)),
            tokenizer=query.get("tokenizer", "ws"),
        )
    if method == "GET" and path == "/xcorr":
        for req in ("dataset", "time", "x", "y"):
            if req not in query:
                raise ValueError(f"missing query parameter {req!r}")
        return 200, api.cross_correlation(
            query["dataset"], query["time"], query["x"], query["y"],
            max_lag=int(query.get("max_lag", 3)),
            grain=query.get("grain", "day"),
            fill_gaps=query.get("fill_gaps", "").lower() in ("1", "true"),
        )
    return 404, {"error": f"no route: {method} {path}"}


def make_server(
    api: CorrelationAPI, host: str = "127.0.0.1", port: int = 0,
    auth_token: str | None = None,
) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; port 0 → ephemeral.

    ``auth_token=None`` (the default) serves read-only: mutating routes
    answer 403. Pass a token to enable them for callers presenting it."""

    class Handler(BaseHTTPRequestHandler):
        # quiet by default: the service log is the driver's job log
        def log_message(self, fmt: str, *args: Any) -> None:  # noqa: A002
            pass

        def _respond(self, status: int, payload: Any) -> None:
            raw = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(raw)))
            if status == 401:
                self.send_header("WWW-Authenticate", "Bearer")
            self.end_headers()
            self.wfile.write(raw)

        def _handle(self, method: str) -> None:
            parsed = urlparse(self.path)
            refused = _authorize(method, parsed.path, self.headers, auth_token)
            if refused is not None:
                self._respond(*refused)
                return
            query = {k: v[0] for k, v in parse_qs(parsed.query).items()}
            body: dict[str, Any] = {}
            length = int(self.headers.get("Content-Length") or 0)
            if length:
                try:
                    body = json.loads(self.rfile.read(length))
                except json.JSONDecodeError:
                    self._respond(400, {"error": "request body is not JSON"})
                    return
            try:
                status, payload = _route(api, method, parsed.path, query, body)
            except KeyError as e:
                self._respond(404, {"error": str(e)})
            except (ValueError, TypeError) as e:
                self._respond(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 - service boundary
                self._respond(500, {"error": f"{type(e).__name__}: {str(e)[:300]}"})
            else:
                self._respond(status, payload)

        def do_GET(self) -> None:  # noqa: N802 (http.server API)
            self._handle("GET")

        def do_POST(self) -> None:  # noqa: N802
            self._handle("POST")

    return ThreadingHTTPServer((host, port), Handler)


def serve(spark: SparkSession, host: str = "127.0.0.1", port: int = 8080,
          auth_token: str | None = None) -> None:
    """Blocking entry point: ``python -m correlationapi_spark serve``.

    With no ``--auth-token`` and no CORRELATIONAPI_AUTH_TOKEN env var the
    listener is read-only (mutating routes → 403)."""
    if auth_token is None:
        auth_token = os.environ.get("CORRELATIONAPI_AUTH_TOKEN") or None
    server = make_server(CorrelationAPI(spark), host, port, auth_token=auth_token)
    print(json.dumps({
        "listening": f"http://{host}:{server.server_address[1]}",
        "mutations": "enabled" if auth_token else "read-only",
    }))
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
