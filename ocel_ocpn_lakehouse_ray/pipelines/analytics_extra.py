"""Event-analytics and curation operators, round 4 second wave: funnel,
cohort retention, day-of-week pivot, and stratified sampling.

Reference parity: the reference's analytics surface computes per-case step
sequences and temporal distributions (`analytics/process_discovery.py`,
`dashboards/executive_dashboard.py` hourly/daily panels); funnels and
cohorts are the same per-entity ordered-event computations expressed over
the `events` table, and stratified sampling is the training-data curation
counterpart of its deterministic spot-check sampling
(`ops/performance_optimization.py` sampled probes).

Scale notes (100 TB design point):
- funnel / cohort: ONE hash shuffle each (bucketed_groups on user_id — every
  row of a user lands in exactly one bucket), vectorized pandas inside the
  bucket, and only O(steps) / O(weeks^2) partial rows leave each bucket.
- pivot: per-batch partial crosstab (combiner) then a groupby-sum over
  |event_type| x 8 tiny partial rows — the pre-aggregate-before-groupby
  pattern; nothing wide moves.
- stratified sample: one shuffle on the stratum key; the per-stratum rank
  key is content-derived (md5 of the row id) so the sample is reproducible
  run-to-run and matches the SQL oracle bit-for-bit.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .queries import _read, bucketed_groups

_FUNNEL_STEPS = ("view", "click", "purchase")


def q_funnel(sf_dir: str):
    """Ordered funnel over events: a user reaches step k+1 only with an
    event STRICTLY AFTER their step-k time (min-time semantics).  One
    user-bucketed shuffle; each bucket emits 3 partial rows."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        counts = []
        # t: per-user timestamp of reaching the previous step
        t = None
        for step in _FUNNEL_STEPS:
            rows = g[g["event_type"] == step]
            if t is not None:
                # NaT (user never reached the previous step) compares False
                prev = pd.to_datetime(rows["user_id"].map(t))
                rows = rows[rows["ts"].to_numpy() > prev.to_numpy()]
            t = rows.groupby("user_id")["ts"].min()
            counts.append(len(t))
        return pd.DataFrame({
            "step_idx": np.arange(1, len(_FUNNEL_STEPS) + 1, dtype=np.int64),
            "step": list(_FUNNEL_STEPS),
            "n_users": pd.array(counts, dtype=np.int64),
        })

    parts = bucketed_groups(ds, "user_id", per_bucket).to_pandas()
    out = (parts.groupby(["step_idx", "step"], as_index=False)["n_users"].sum()
           .sort_values("step_idx").reset_index(drop=True))
    return out


SQL_FUNNEL = """
WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
       (SELECT count(*) FROM s1) AS n_users
UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
"""


def q_cohort_retention(sf_dir: str):
    """Weekly cohort retention: users grouped by the ISO week (Monday
    start) of their first event; n_users = distinct users of that cohort
    active wk weeks later.  One user-bucketed shuffle; each bucket emits
    O(weeks^2) pre-aggregated partials; a bounded groupby-sum finishes."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # W-SUN periods end Sunday => start_time is the Monday, matching
        # DuckDB date_trunc('week', ts)
        week = g["ts"].dt.to_period("W-SUN").dt.start_time
        g = pd.DataFrame({"user_id": g["user_id"], "week": week})
        cohort = g.groupby("user_id")["week"].min().rename("cohort")
        m = (g.drop_duplicates()
             .merge(cohort, left_on="user_id", right_index=True))
        m["wk"] = ((m["week"] - m["cohort"]).dt.days // 7).astype(np.int64)
        part = (m.drop_duplicates(["user_id", "cohort", "wk"])
                .groupby(["cohort", "wk"]).size().rename("n_users")
                .reset_index())
        part["cohort"] = part["cohort"].dt.strftime("%Y-%m-%d")
        return part

    agg = (bucketed_groups(ds, "user_id", per_bucket)
           .groupby(["cohort", "wk"]).aggregate(Sum("n_users", alias_name="n_users")))
    return agg


SQL_COHORT_RETENTION = """
WITH f AS (SELECT user_id, min(date_trunc('week', ts)) AS cohort
           FROM events GROUP BY 1),
a AS (SELECT DISTINCT e.user_id, f.cohort,
             CAST((date_trunc('week', e.ts)::DATE - f.cohort::DATE) // 7
                  AS BIGINT) AS wk
      FROM events e JOIN f USING (user_id))
SELECT strftime(cohort, '%Y-%m-%d') AS cohort, wk,
       CAST(count(*) AS BIGINT) AS n_users
FROM a GROUP BY 1, 2
"""


def q_pivot_dow(sf_dir: str):
    """Pivot (conditional aggregation): events per type x day-of-week as a
    wide table.  Per-batch partial crosstab (combiner) -> groupby-sum over
    |types| x 8 partial rows — the canonical pre-aggregate pattern; the
    shuffle moves only the partials."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])
    cols = [f"dow_{i}" for i in range(7)]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(df["event_type"], df["ts"].dt.dayofweek)
        ct = ct.reindex(columns=range(7), fill_value=0).astype(np.int64)
        ct.columns = cols
        return ct.rename_axis("event_type").reset_index()

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("event_type")
            .aggregate(*[Sum(c, alias_name=c) for c in cols]))


SQL_PIVOT_DOW = """
SELECT event_type,
       CAST(sum(CASE WHEN isodow(ts) = 1 THEN 1 ELSE 0 END) AS BIGINT) AS dow_0,
       CAST(sum(CASE WHEN isodow(ts) = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dow_1,
       CAST(sum(CASE WHEN isodow(ts) = 3 THEN 1 ELSE 0 END) AS BIGINT) AS dow_2,
       CAST(sum(CASE WHEN isodow(ts) = 4 THEN 1 ELSE 0 END) AS BIGINT) AS dow_3,
       CAST(sum(CASE WHEN isodow(ts) = 5 THEN 1 ELSE 0 END) AS BIGINT) AS dow_4,
       CAST(sum(CASE WHEN isodow(ts) = 6 THEN 1 ELSE 0 END) AS BIGINT) AS dow_5,
       CAST(sum(CASE WHEN isodow(ts) = 7 THEN 1 ELSE 0 END) AS BIGINT) AS dow_6
FROM events GROUP BY event_type
"""

STRATIFIED_RATE = 0.1


def q_stratified_sample(sf_dir: str, rate: float = STRATIFIED_RATE):
    """Stratified deterministic sample: ceil(rate * |stratum|) documents per
    language, chosen by md5-of-id rank so the sample is reproducible and
    SQL-checkable.  One shuffle on the stratum key; every stratum is wholly
    inside one bucket, so the per-stratum count and rank are local.  (At
    corpus scale the md5 loop would swap for the vectorized splitmix64 rank
    — md5 is kept here for cross-engine oracle parity, same trade as
    q_hash_sample.)"""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        md5 = hashlib.md5
        out = []
        for _, d in g.groupby("lang", sort=False):
            k = int(np.ceil(rate * len(d)))
            rank = [md5(str(i).encode()).hexdigest() for i in d["doc_id"]]
            out.append(d.assign(__r=rank)
                       .sort_values(["__r", "doc_id"])
                       .head(k)[["doc_id", "lang"]])
        return (pd.concat(out, ignore_index=True) if out
                else g[["doc_id", "lang"]])

    return bucketed_groups(ds, "lang", per_bucket)


SQL_STRATIFIED_SAMPLE = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents) t
WHERE rn <= CAST(ceil(0.1 * n) AS BIGINT)
"""


def q_grouping_sets(sf_dir: str):
    """GROUPING SETS ((event_type), (dow)) in one scan: per-batch partial
    value_counts for BOTH keys (combiner), then one bounded groupby-sum
    over |types| + 7 partial rows."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        by_type = df["event_type"].value_counts()
        by_dow = df["ts"].dt.dayofweek.value_counts()
        return pd.DataFrame({
            "g": ["type"] * len(by_type) + ["dow"] * len(by_dow),
            "k": [str(v) for v in by_type.index] + [str(v) for v in by_dow.index],
            "n": np.concatenate([by_type.to_numpy(), by_dow.to_numpy()]).astype(np.int64),
        })

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby(["g", "k"]).aggregate(Sum("n", alias_name="n")))


SQL_GROUPING_SETS = """
WITH d AS (SELECT event_type, isodow(ts) - 1 AS dow FROM events)
SELECT CASE WHEN GROUPING(event_type) = 0 THEN 'type' ELSE 'dow' END AS g,
       COALESCE(event_type, CAST(dow AS VARCHAR)) AS k,
       CAST(count(*) AS BIGINT) AS n
FROM d GROUP BY GROUPING SETS ((event_type), (dow))
"""


def q_value_delta(sf_dir: str):
    """lag() window: per-user event-over-event value change in time order.
    One user-bucketed shuffle; vectorized grouped shift inside the bucket
    (ties broken by event_id to keep the frame deterministic)."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        prev = g.groupby("user_id", sort=False)["value"].shift(1)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "delta": (g["value"] - prev).to_numpy(),
        })

    return bucketed_groups(ds, "user_id", per_bucket)


SQL_VALUE_DELTA = """
SELECT event_id,
       value - lag(value) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS delta
FROM events
"""


ANALYTICS_EXTRA_QUERIES = {
    "funnel": q_funnel,
    "cohort_retention": q_cohort_retention,
    "pivot_dow": q_pivot_dow,
    "stratified_sample": q_stratified_sample,
    "grouping_sets": q_grouping_sets,
    "value_delta": q_value_delta,
}

ANALYTICS_EXTRA_ORACLE_SQL = {
    "funnel": SQL_FUNNEL,
    "cohort_retention": SQL_COHORT_RETENTION,
    "pivot_dow": SQL_PIVOT_DOW,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "grouping_sets": SQL_GROUPING_SETS,
    "value_delta": SQL_VALUE_DELTA,
}
