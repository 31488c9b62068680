"""Predictive process analytics — the reference's headline "<5 s predictive"
query family (`docs/PRODUCTION_SYSTEM_SUMMARY.md:156`), re-expressed as
oracle-checkable Ray Data pipelines over the events table:

- **next-activity transition model** (`agent/process_mining_queries.py:554-637`
  `predict_next_activity`): the DFG's per-source row-normalized transition
  probabilities — P(next = dst | current = src) = freq(src→dst) / Σ_dst freq.
  The reference computes this per-instance at query time from its dfg_matrix
  table; the full normalized matrix IS that model, materialized once.
- **case-outcome model** (`agent/process_mining_queries.py:628-707`
  `predict_case_outcome`): outcome frequency by variant prefix — for every
  3-activity trace prefix, the fraction of historical traces that END in the
  outcome activity ('purchase').  The reference scores one running case
  against similar completed cases; the grouped conversion table is the
  trainable form of the same signal.
- **similar-case retrieval** (`agent/process_mining_queries.py:759-782`
  `find_similar_cases` / `_levenshtein_similarity`): top-k most similar
  traces to a query trace by TRUE edit distance on the '->'-joined variant
  pattern (the reference's "levenshtein" helper approximates with a set
  overlap; this implements the metric it names, which DuckDB can oracle).
- **resource utilization** (`agent/process_mining_queries.py:340-408`
  `get_resource_utilization`): per-resource event count, active time span,
  events/hour, and the reference's normalized min(rate/10, 1.0) score.

Scale shapes: everything is one bucketed-group or groupby shuffle on
user_id; the DFG and prefix tables are bounded by |event_types|^k, tiny at
any corpus size.  Similar-case distances are map-only against one broadcast
query pattern, with a distributed (distance, user_id) sort for top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .queries import _read, bucketed_groups

OUTCOME_ACTIVITY = "purchase"
PREFIX_LEN = 3
TOP_K_SIMILAR = 20


# ----------------------------------------------- next-activity transitions


def q_next_activity(sf_dir: str):
    """Row-normalized DFG transition probabilities: (src, dst, frequency,
    probability).  Pair counts are combined INSIDE each bucket (map-side),
    so the one re-aggregation shuffle moves <= buckets x |types|^2 partial
    rows; the per-src normalization runs on the driver over the
    |types|^2-bounded DFG (25 rows here — the same bounded-driver-combine
    pattern as executive_kpis).  Measured 4.0 s -> 1.5 s at bench scale."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        prev = g.groupby("user_id")["event_type"].shift(1)
        mask = prev.notna()
        df = pd.DataFrame({"src": prev[mask].to_numpy(),
                           "dst": g["event_type"][mask].to_numpy()})
        return df.groupby(["src", "dst"], sort=False).size().reset_index(name="frequency")

    from .queries import fold_partials

    folded = fold_partials(bucketed_groups(ds, "user_id", pairs),
                           ["src", "dst"], ["frequency"])
    if folded is None:
        return pd.DataFrame({"src": pd.Series(dtype=str),
                             "dst": pd.Series(dtype=str),
                             "frequency": pd.Series(dtype=np.int64),
                             "probability": pd.Series(dtype=np.float64)})
    dfg = folded.to_pandas()
    total = dfg.groupby("src")["frequency"].transform("sum").astype(np.float64)
    dfg["probability"] = dfg["frequency"].astype(np.float64) / total
    return dfg


SQL_NEXT_ACTIVITY = """
WITH s AS (
  SELECT user_id, event_type AS dst,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
  FROM events
), dfg AS (
  SELECT src, dst, count(*) AS frequency FROM s WHERE src IS NOT NULL GROUP BY 1, 2
)
SELECT src, dst, frequency,
       CAST(frequency AS DOUBLE)
         / CAST(sum(frequency) OVER (PARTITION BY src) AS DOUBLE) AS probability
FROM dfg
"""


# ----------------------------------------------------- case-outcome model


def q_case_outcome(sf_dir: str):
    """Outcome frequency by variant prefix: (prefix, n_cases, n_converted,
    conversion_rate) — the per-prefix probability that a trace ends in the
    outcome activity.  One bucketed-group shuffle emits one (prefix,
    converted) row per trace; a tiny prefix aggregate finishes."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])

    def per_case(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        grp = g.groupby("user_id")["event_type"]
        prefix = grp.agg(lambda s: "->".join(s.iloc[:PREFIX_LEN]))
        converted = (grp.agg("last") == OUTCOME_ACTIVITY).astype(np.int64)
        return pd.DataFrame({"prefix": prefix.to_numpy(),
                             "converted": converted.to_numpy()})

    per_case_ds = bucketed_groups(ds, "user_id", per_case)
    agg = per_case_ds.groupby("prefix").aggregate(
        Count(alias_name="n_cases"), Sum("converted", alias_name="n_converted"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "prefix": b["prefix"],
            "n_cases": b["n_cases"],
            "n_converted": b["n_converted"],
            "conversion_rate": pc.divide(
                pc.cast(b["n_converted"], pa.float64()),
                pc.cast(b["n_cases"], pa.float64())),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_CASE_OUTCOME = """
WITH o AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
),
pfx AS (
  SELECT user_id, string_agg(event_type, '->' ORDER BY rn) AS prefix
  FROM o WHERE rn <= 3 GROUP BY user_id
),
lst AS (SELECT user_id, event_type AS last_type FROM o WHERE rn = n)
SELECT prefix, count(*) AS n_cases,
       CAST(sum(CASE WHEN last_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_converted,
       CAST(sum(CASE WHEN last_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS conversion_rate
FROM pfx JOIN lst USING (user_id) GROUP BY prefix
"""


# ------------------------------------------------ similar-case retrieval


def levenshtein(a: str, b: str) -> int:
    """Character-level edit distance (unit costs), matching DuckDB's
    ``levenshtein``.  Two-row DP over the shorter string; variant patterns
    are short (|trace| × ~8 chars), so this is fine inside a batch loop."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    m = len(b) + 1
    prev = np.arange(m, dtype=np.int64)
    cur = np.empty(m, dtype=np.int64)
    idx = np.arange(m, dtype=np.int64)
    bx = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    for i, ca in enumerate(a, 1):
        cur[0] = i
        np.minimum(prev[:-1] + (bx != ord(ca)), prev[1:] + 1, out=cur[1:])
        # insertion chain: cur[j] = min_{k<=j}(cur[k] + (j-k)) — a running
        # minimum of (cur[k] - k), fully vectorized
        np.subtract(cur, idx, out=cur)
        np.minimum.accumulate(cur, out=cur)
        np.add(cur, idx, out=cur)
        prev, cur = cur, prev
    return int(prev[-1])


def levenshtein_banded(a: str, b: str, cutoff: int | None) -> int:
    """Edit distance with an Ukkonen band: exact whenever the true distance
    is <= cutoff, else any value > cutoff (callers only need "too far").
    The DP touches only the |i-j| <= cutoff diagonal band and exits early
    once every band cell exceeds the cutoff — O(min(len) * cutoff) instead
    of O(len_a * len_b) for the corpus-scale long-trace case (VERDICT r3
    #10).  cutoff=None falls back to the exact full DP."""
    if cutoff is None:
        return levenshtein(a, b)
    if cutoff < 0:
        return 1  # any positive value; caller treats > cutoff as pruned
    if abs(len(a) - len(b)) > cutoff:
        return cutoff + 1
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    m = len(b) + 1
    big = cutoff + 1
    prev = np.minimum(np.arange(m, dtype=np.int64), big)
    cur = np.empty(m, dtype=np.int64)
    idx = np.arange(m, dtype=np.int64)
    bx = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    for i, ca in enumerate(a, 1):
        lo = max(1, i - cutoff)
        hi = min(m - 1, i + cutoff)
        if lo > hi:
            return big
        cur[:] = big
        cur[0] = i if i <= cutoff else big
        np.minimum(prev[lo - 1:hi] + (bx[lo - 1:hi] != ord(ca)),
                   prev[lo:hi + 1] + 1, out=cur[lo:hi + 1])
        # insertion chain inside the band: running min of (cur[k] - k)
        seg = cur[lo - 1:hi + 1] - idx[lo - 1:hi + 1]
        np.minimum.accumulate(seg, out=seg)
        np.minimum(cur[lo - 1:hi + 1], seg + idx[lo - 1:hi + 1],
                   out=cur[lo - 1:hi + 1])
        if cur[lo:hi + 1].min() > cutoff:
            return big
        prev, cur = cur, prev
    return int(min(prev[-1], big))


def q_similar_cases(sf_dir: str):
    """Top-k most similar traces to the query trace (the minimum user_id's
    trace, a deterministic stand-in for the reference's instance_id param):
    (user_id, distance) ordered by (distance, user_id).

    FUSED to one events scan (VERDICT r3 #4): the bucketed-group pass builds
    the per-trace pattern table once and materializes it (one short row per
    trace — tiny next to the events it summarizes, and the alternative is
    re-scanning the events for min(user_id) and the query trace); the query
    pattern, the distance map, and the top-k sort all derive from that
    materialized table with no second ReadParquet.  Distances are MAP-ONLY
    against the broadcast query pattern and use the banded DP pruned at the
    batch-local top-k radius: a row whose distance exceeds the k best of its
    OWN batch can never enter the global top-k, so its exact distance is
    never needed."""
    import heapq

    import ray

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])

    def patterns(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        pat = g.groupby("user_id")["event_type"].agg("->".join)
        return pd.DataFrame({"user_id": pat.index.to_numpy(),
                             "pattern": pat.to_numpy()})

    pat_ds = bucketed_groups(ds, "user_id", patterns).materialize()
    umin = int(pat_ds.min("user_id"))
    [qrow] = (pat_ds.map_batches(
        lambda b: b.filter(pc.equal(b["user_id"], pa.scalar(umin))),
        batch_format="pyarrow").take_all())
    qref = ray.put(qrow["pattern"])

    def dist(b: pa.Table) -> pa.Table:
        import ray as _r

        qp = _r.get(qref)
        uid = b["user_id"].to_numpy()
        keep = uid != umin
        pats = b["pattern"].to_pylist()
        out = np.empty(int(keep.sum()), dtype=np.int64)
        heap: list[int] = []  # max-heap (negated) of the k best so far
        j = 0
        for p, kf in zip(pats, keep):
            if not kf:
                continue
            cutoff = -heap[0] if len(heap) == TOP_K_SIMILAR else None
            d = levenshtein_banded(p, qp, cutoff)
            out[j] = d
            j += 1
            if len(heap) < TOP_K_SIMILAR:
                heapq.heappush(heap, -d)
            elif d < -heap[0]:
                heapq.heapreplace(heap, -d)
        return pa.table({"user_id": pa.array(uid[keep], pa.int64()),
                         "distance": pa.array(out, pa.int64())})

    return (pat_ds.map_batches(dist, batch_format="pyarrow")
            .sort(["distance", "user_id"]).limit(TOP_K_SIMILAR))


SQL_SIMILAR_CASES = """
WITH pat AS (
  SELECT user_id, string_agg(event_type, '->' ORDER BY ts, event_id) AS pattern
  FROM events GROUP BY user_id
)
SELECT p.user_id,
       CAST(levenshtein(p.pattern,
         (SELECT pattern FROM pat WHERE user_id = (SELECT min(user_id) FROM pat))
       ) AS BIGINT) AS distance
FROM pat p WHERE p.user_id <> (SELECT min(user_id) FROM pat)
ORDER BY distance, user_id LIMIT 20
"""


# ---------------------------------------------------- resource utilization


def q_resource_utilization(sf_dir: str):
    """Per-resource workload: (user_id, total_events, span_sec,
    events_per_hour, utilization_score) with the reference's normalized
    min(events_per_hour / 10, 1.0) score — one groupby shuffle."""
    from ray.data.aggregate import Count, Max, Min

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    agg = ds.groupby("user_id").aggregate(
        Min("ts", alias_name="first_ts"),
        Max("ts", alias_name="last_ts"),
        Count(alias_name="total_events"),
    )

    def finish(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(pc.subtract(b["last_ts"], b["first_ts"]),
                             pa.int64()), pa.float64())
        span = pc.divide(us, pa.scalar(1_000_000.0))
        n = pc.cast(b["total_events"], pa.float64())
        eph = pc.if_else(
            pc.greater(us, pa.scalar(0.0)),
            pc.divide(pc.multiply(n, pa.scalar(3600.0)), span),
            pa.scalar(0.0),
        )
        score = pc.min_element_wise(pc.divide(eph, pa.scalar(10.0)),
                                    pa.scalar(1.0))
        return pa.table({
            "user_id": b["user_id"],
            "total_events": b["total_events"],
            "span_sec": span,
            "events_per_hour": eph,
            "utilization_score": score,
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_RESOURCE_UTILIZATION = """
SELECT user_id, count(*) AS total_events,
       CAST(date_diff('microsecond', min(ts), max(ts)) / 1000000 AS DOUBLE)
         AS span_sec,
       CASE WHEN date_diff('microsecond', min(ts), max(ts)) > 0
            THEN count(*) * 3600.0
                 / (CAST(date_diff('microsecond', min(ts), max(ts)) / 1000000
                         AS DOUBLE))
            ELSE 0.0 END AS events_per_hour,
       LEAST((CASE WHEN date_diff('microsecond', min(ts), max(ts)) > 0
            THEN count(*) * 3600.0
                 / (CAST(date_diff('microsecond', min(ts), max(ts)) / 1000000
                         AS DOUBLE))
            ELSE 0.0 END) / 10.0, 1.0) AS utilization_score
FROM events GROUP BY user_id
"""


# ---------------------------------------------------- bottleneck analysis


def q_bottlenecks(sf_dir: str, threshold_percentile: int = 90):
    """Activities with long post-activity waiting times — the reference's
    `identify_bottlenecks` (`agent/process_mining_queries.py:285-329`):
    per activity the mean seconds until the NEXT event in the same trace,
    thresholded at the reference's `sorted(avgs)[int(n*pct/100)]` cut,
    severity 'high' when >= 1.5x the threshold, sorted slowest first.

    One bucketed-group shuffle emits (activity, wait_sec) transition rows;
    a |types|-bounded Mean/Count aggregate finishes; the threshold/severity
    pass runs driver-side over that tiny table (same as the reference)."""
    from ray.data.aggregate import Count, Mean

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])

    def waits(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        nxt = g.groupby("user_id")["ts"].shift(-1)
        mask = nxt.notna()
        w = (nxt[mask] - g["ts"][mask]).dt.total_seconds()
        return pd.DataFrame({"activity": g["event_type"][mask].to_numpy(),
                             "wait_sec": w.to_numpy()})

    agg = (bucketed_groups(ds, "user_id", waits)
           .groupby("activity")
           .aggregate(Mean("wait_sec", alias_name="avg_duration_seconds"),
                      Count(alias_name="total_occurrences"))
           .to_pandas())
    if agg.empty:
        return agg.assign(severity=pd.Series(dtype=str))
    avgs = sorted(agg["avg_duration_seconds"].tolist())
    threshold = avgs[min(int(len(avgs) * threshold_percentile / 100),
                         len(avgs) - 1)]
    out = agg[agg["avg_duration_seconds"] >= threshold].copy()
    out["severity"] = np.where(
        out["avg_duration_seconds"] >= threshold * 1.5, "high", "medium")
    out["avg_duration_seconds"] = out["avg_duration_seconds"].round(6)
    return (out.sort_values("avg_duration_seconds", ascending=False)
            .reset_index(drop=True)
            [["activity", "avg_duration_seconds", "total_occurrences",
              "severity"]])


# Selection is RANK-based inside one windowed pass: DuckDB's parallel avg()
# is non-deterministic in the last ulps, so re-aggregating for a
# `avg >= threshold` join can drop the boundary row between runs; ranking
# once and filtering on rn is stable (and FLOOR matches Python int()
# truncation for the k index, where CAST would round half-to-even).
SQL_BOTTLENECKS = """
WITH w AS (
  SELECT event_type AS activity,
         date_diff('microsecond', ts,
                   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   ) / 1000000.0 AS wait_sec
  FROM events
), agg AS (
  SELECT activity, avg(wait_sec) AS avg_duration_seconds,
         count(wait_sec) AS total_occurrences
  FROM w WHERE wait_sec IS NOT NULL GROUP BY activity
), ranked AS (
  SELECT activity, avg_duration_seconds, total_occurrences,
         row_number() OVER (ORDER BY avg_duration_seconds) AS rn,
         count(*) OVER () AS n
  FROM agg
), thr AS (
  SELECT *,
         LEAST(CAST(FLOOR(n * 90.0 / 100) AS INT), n - 1) + 1 AS k1,
         max(CASE WHEN rn = LEAST(CAST(FLOOR(n * 90.0 / 100) AS INT),
                                  n - 1) + 1
                  THEN avg_duration_seconds END) OVER () AS threshold
  FROM ranked
)
SELECT activity, ROUND(avg_duration_seconds, 6) AS avg_duration_seconds,
       total_occurrences,
       CASE WHEN avg_duration_seconds >= threshold * 1.5
            THEN 'high' ELSE 'medium' END AS severity
FROM thr WHERE rn >= k1
ORDER BY avg_duration_seconds DESC
"""


PREDICTIVE_QUERIES = {
    "next_activity": q_next_activity,
    "case_outcome": q_case_outcome,
    "similar_cases": q_similar_cases,
    "resource_utilization": q_resource_utilization,
}

PREDICTIVE_ORACLE_SQL = {
    "next_activity": SQL_NEXT_ACTIVITY,
    "case_outcome": SQL_CASE_OUTCOME,
    "similar_cases": SQL_SIMILAR_CASES,
    "resource_utilization": SQL_RESOURCE_UTILIZATION,
}

# registered past the driver's pinned 50-entry window (__ray_entry__);
# pytest carries the DuckDB oracle (tests/test_verdict_r4.py)
PREDICTIVE_QUERIES_EXTRA = {"bottlenecks": q_bottlenecks}
PREDICTIVE_ORACLE_SQL_EXTRA = {"bottlenecks": SQL_BOTTLENECKS}
