"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship tier-rollup cascade on sf0.001; ``queries()``
exposes one callable per implemented operator/pipeline (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent SQL for every SQL-expressible
query (same column names; float aggregates rounded to 6 decimals on BOTH
sides so value hashes are robust to accumulation order).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in pytimetk_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd

# --- helpers ---------------------------------------------------------------

_EV = "events.parquet"


def _events(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, _EV))


def _kmeans_cte(k: int = 8, iters: int = 3, bits: int = 10, d: int = 64) -> str:
    """WITH-chain reproducing pipelines/clustering.kmeans_embed bit-exactly
    (see that module's docstring for the dyadic-exactness argument): q =
    quantized embeddings, c0 = K-smallest-id seeds, per iteration a{i} =
    argmin assignment (ORDER BY dist, cluster == np.argmin first-min) and
    c{i} = COALESCE(sum/count, previous) centroids, af = final assignment.
    The squared-distance chain is left-associated in dim order — the same
    accumulation order as clustering._dists_dimseq."""
    s = float(1 << bits)
    ecols = ", ".join(
        f"floor(CAST(embedding[{j+1}] AS DOUBLE)*{s})/{s} AS e{j}"
        for j in range(d))
    mcols = ", ".join(f"e{j} AS m{j}" for j in range(d))
    dist = " + ".join(f"(q.e{j}-c.m{j})*(q.e{j}-c.m{j})" for j in range(d))
    sums = ", ".join(f"SUM(e{j}) AS s{j}" for j in range(d))
    upd = ", ".join(f"COALESCE(s.s{j}/s.n, p.m{j}) AS m{j}" for j in range(d))
    parts = [f"""q AS MATERIALIZED (
  SELECT vec_id, {ecols} FROM embeddings
),
c0 AS MATERIALIZED (
  SELECT (ROW_NUMBER() OVER (ORDER BY vec_id) - 1) AS cluster, {mcols}
  FROM (SELECT * FROM q ORDER BY vec_id LIMIT {k})
)"""]
    for i in range(1, iters + 1):
        parts.append(f"""a{i} AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT q.vec_id, c.cluster,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {dist}, c.cluster) AS rn
    FROM q CROSS JOIN c{i-1} c) WHERE rn = 1
),
s{i} AS MATERIALIZED (
  SELECT cluster, COUNT(*) AS n, {sums}
  FROM q JOIN a{i} USING (vec_id) GROUP BY cluster
),
c{i} AS MATERIALIZED (
  SELECT p.cluster, {upd} FROM c{i-1} p LEFT JOIN s{i} s USING (cluster)
)""")
    parts.append(f"""af AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT q.vec_id, c.cluster,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {dist}, c.cluster) AS rn
    FROM q CROSS JOIN c{iters} c) WHERE rn = 1
)""")
    return "WITH " + ",\n".join(parts)


def _semdedup_sql(tau: float, k: int = 8, iters: int = 3, bits: int = 10,
                  d: int = 64) -> str:
    """kmeans CTEs + within-cluster greedy prune: keep=0 iff a smaller-id
    vector in the same cluster has cosine >= tau.  dot and squared norms are
    EXACT over the dyadic values (order-free), so the cosine is bit-equal to
    the engine's and compared UNROUNDED."""
    dot = " + ".join(f"a.e{j}*b.e{j}" for j in range(d))
    nrm = " + ".join(f"e{j}*e{j}" for j in range(d))
    return _kmeans_cte(k, iters, bits, d) + f""",
nq AS MATERIALIZED (
  SELECT a.vec_id, a.cluster, q.*, ({nrm}) AS nrm
  FROM af a JOIN q USING (vec_id)
),
hits AS (
  SELECT DISTINCT a.vec_id FROM nq a JOIN nq b
    ON b.cluster = a.cluster AND b.vec_id < a.vec_id
   AND ({dot}) / (sqrt(a.nrm) * sqrt(b.nrm)) >= {tau!r}
)
SELECT n.vec_id, n.cluster,
       CASE WHEN h.vec_id IS NULL THEN 1 ELSE 0 END AS keep
FROM nq n LEFT JOIN hits h USING (vec_id)
"""


def _pq_topk_sql(kk: int = 5, nq: int = 4, m: int = 8, ksub: int = 16,
                 iters: int = 2, bits: int = 10, d: int = 64) -> str:
    """Product-quantization ADC top-k oracle, fully data-derived: M
    independent per-subspace Lloyd chains (same construction as
    _kmeans_cte, dims sliced), per-vector codes = per-subspace argmin,
    queries = the nq smallest-id vectors, dist = the per-subspace
    parenthesized distance chains summed subspace-sequentially — the exact
    association order of clustering.pq_topk's table-gather accumulation,
    so dist is compared UNROUNDED."""
    s = float(1 << bits)
    dsub = d // m
    ecols = ", ".join(
        f"floor(CAST(embedding[{j+1}] AS DOUBLE)*{s})/{s} AS e{j}"
        for j in range(d))
    parts = [
        f"q AS MATERIALIZED (SELECT vec_id, {ecols} FROM embeddings)",
        f"""seed AS MATERIALIZED (
  SELECT *, (ROW_NUMBER() OVER (ORDER BY vec_id) - 1) AS rn
  FROM (SELECT * FROM q ORDER BY vec_id LIMIT {ksub}))""",
        f"qv AS MATERIALIZED (SELECT * FROM q ORDER BY vec_id LIMIT {nq})",
    ]
    for mi in range(m):
        off = mi * dsub
        mcols = ", ".join(f"e{off+j} AS m{j}" for j in range(dsub))
        dist = " + ".join(f"(q.e{off+j}-c.m{j})*(q.e{off+j}-c.m{j})"
                          for j in range(dsub))
        sums = ", ".join(f"SUM(e{off+j}) AS s{j}" for j in range(dsub))
        upd = ", ".join(f"COALESCE(s.s{j}/s.n, p.m{j}) AS m{j}"
                        for j in range(dsub))
        parts.append(f"c{mi}_0 AS MATERIALIZED "
                     f"(SELECT rn AS cluster, {mcols} FROM seed)")
        for i in range(1, iters + 1):
            parts.append(f"""a{mi}_{i} AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT q.vec_id, c.cluster,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {dist}, c.cluster) AS rn
    FROM q CROSS JOIN c{mi}_{i-1} c) WHERE rn = 1),
s{mi}_{i} AS MATERIALIZED (
  SELECT cluster, COUNT(*) AS n, {sums}
  FROM q JOIN a{mi}_{i} USING (vec_id) GROUP BY cluster),
c{mi}_{i} AS MATERIALIZED (
  SELECT p.cluster, {upd}
  FROM c{mi}_{i-1} p LEFT JOIN s{mi}_{i} s USING (cluster))""")
        parts.append(f"""k{mi} AS MATERIALIZED (
  SELECT vec_id, cluster AS code FROM (
    SELECT q.vec_id, c.cluster,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {dist}, c.cluster) AS rn
    FROM q CROSS JOIN c{mi}_{iters} c) WHERE rn = 1)""")
    adc = " + ".join(
        "(" + " + ".join(
            f"(qv.e{mi*dsub+j}-b{mi}.m{j})*(qv.e{mi*dsub+j}-b{mi}.m{j})"
            for j in range(dsub)) + ")"
        for mi in range(m))
    code_joins = " ".join(f"JOIN k{mi} ON k{mi}.vec_id = k0.vec_id"
                          for mi in range(1, m))
    book_joins = " ".join(
        f"JOIN c{mi}_{iters} b{mi} ON b{mi}.cluster = k{mi}.code"
        for mi in range(m))
    return "WITH " + ",\n".join(parts) + f"""
SELECT query_id, vec_id, dist FROM (
  SELECT qv.vec_id AS query_id, k0.vec_id AS vec_id, ({adc}) AS dist,
         ROW_NUMBER() OVER (PARTITION BY qv.vec_id
                            ORDER BY ({adc}), k0.vec_id) AS rn
  FROM qv CROSS JOIN k0 {code_joins} {book_joins}
) WHERE rn <= {kk}
"""


def _round_cols(ds, cols, digits=6, canon_zero=False):
    """Round float columns (both sides of the oracle compare round to the
    same digits) and convert NaN -> null (SQL semantics for hashing).

    ``canon_zero``: also fold -0.0 -> +0.0 (`v + 0.0`); pair with `+ 0` after
    ROUND in the SQL.  The driver's value hash is byte-sensitive, so a -0.0
    on one side only is a deterministic hash-fail even though -0.0 == 0.0."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        for c in cols:
            v = np.round(batch[c].astype(np.float64).to_numpy(), digits)
            if canon_zero:
                v = v + 0.0
            batch[c] = pd.array(v, dtype="Float64")  # NaN -> <NA> -> Arrow null
        return batch

    return ds.map_batches(fn, batch_format="pandas")


def _nan_to_null(ds, cols):
    """NaN/inf -> null for float columns that must NOT be rounded (exact-copy
    semantics, e.g. lag/lead/diff outputs).  Infinities also become null
    because DuckDB float division-by-zero yields NULL, not IEEE inf."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        for c in cols:
            v = batch[c].astype(np.float64).to_numpy()
            v = np.where(np.isfinite(v), v, np.nan)
            batch[c] = pd.array(v, dtype="Float64")
        return batch

    return ds.map_batches(fn, batch_format="pandas")


def _cast_int64(ds, cols):
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        for c in cols:
            batch[c] = batch[c].astype(np.int64)
        return batch

    return ds.map_batches(fn, batch_format="pandas")


def _cast_bucket_us(ds, col="bucket_ts"):
    import pyarrow as pa

    def fn(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index(col)
        return batch.set_column(i, col, batch[col].cast(pa.timestamp("us")))

    return ds.map_batches(fn, batch_format="pyarrow")


# --- entry -----------------------------------------------------------------

def entry() -> Any:
    """Flagship: raw -> 1m -> 1h -> 1d tier cascade over sf0.001 events
    (conv key = user_id), returning the 1h tier with derived mean."""
    import ray.data as rd

    from pytimetk_ray.pipelines.tiers import read_tier, rollup_tiers

    sf_dir = "/root/testdata/sf0.001"
    out = os.path.join(tempfile.mkdtemp(prefix="tiers_entry_"), "tiers")
    # pruned read (only the 3 cascade columns leave storage) + Arrow-native
    # rename — text/props never enter the pipeline (mirrors bench.py)
    ds = rd.read_parquet(
        os.path.join(sf_dir, _EV), columns=["user_id", "ts", "value"]
    ).map_batches(
        lambda b: b.rename_columns(
            ["conv_id" if c == "user_id" else c for c in b.column_names]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    )
    rollup_tiers(
        ds,
        out_dir=out,
        key="conv_id",
        date_column="ts",
        value_column="value",
        num_partitions=16,
        input_fingerprint="entry",
    )
    return read_tier(out, "1h")


# --- queries ---------------------------------------------------------------

def queries() -> dict[str, Callable[[str], Any]]:
    import ray.data as rd

    import pytimetk_ray as tk
    from pytimetk_ray.pipelines.dedup import exact_dedup, minhash_lsh_pairs, simhash_pairs
    from pytimetk_ray.pipelines.similarity import ann_bruteforce, embedding_neardup_pairs
    from pytimetk_ray.pipelines.text_analysis import score_documents, token_counts
    from pytimetk_ray.pipelines.tiers import rollup_tiers

    def summarize_by_time_hour(sf_dir):
        ds = tk.summarize_by_time(
            _events(sf_dir), "ts", "value", freq="1h",
            agg_func=["sum", "count", "min", "max", "mean"], by=["user_id"],
        )
        return _round_cols(_cast_bucket_us(ds), ["value_sum", "value_mean"])

    def summarize_by_time_day_type(sf_dir):
        ds = tk.summarize_by_time(
            _events(sf_dir), "ts", "value", freq="D",
            agg_func=["sum", "count"], by=["event_type"],
        )
        return _round_cols(_cast_bucket_us(ds), ["value_sum"])

    def summarize_by_time_month(sf_dir):
        ds = tk.summarize_by_time(_events(sf_dir), "ts", "value", freq="MS", agg_func=["sum", "count"])
        return _round_cols(_cast_bucket_us(ds), ["value_sum"])

    def filter_by_time(sf_dir):
        return tk.filter_by_time(_events(sf_dir), "ts", "2024-01-05", "2024-01-10")

    def summarize_wide(sf_dir):
        # wide pivot of the (small) aggregate result, fillna=0
        pdf = tk.summarize_by_time(
            _events(sf_dir), "ts", "value", freq="D", agg_func="sum",
            by=["event_type"], wide_format=True, fillna=0,
        )
        for c in pdf.columns:
            if c != "bucket_ts":
                pdf[c] = np.round(pdf[c].to_numpy(np.float64), 6)
        pdf["bucket_ts"] = pdf["bucket_ts"].astype("datetime64[us]")
        return pdf

    def reduce_memory(sf_dir):
        # lossless integer downcast (values unchanged; canon compare casts
        # widths back up, so equality proves losslessness)
        from pytimetk_ray.ops.memory import reduce_memory_usage

        ds = reduce_memory_usage(_events(sf_dir))
        return ds.select_columns(["event_id", "user_id", "value"])

    def augment_lags(sf_dir):
        ds = tk.augment_lags(_events(sf_dir), ["user_id"], ["ts"], "value", lags=2)
        ds = _nan_to_null(ds, ["value_lag_1", "value_lag_2"])
        return ds.select_columns(["event_id", "user_id", "ts", "value", "value_lag_1", "value_lag_2"])

    def augment_leads(sf_dir):
        ds = tk.augment_leads(_events(sf_dir), ["user_id"], ["ts"], "value", leads=1)
        ds = _nan_to_null(ds, ["value_lead_1"])
        return ds.select_columns(["event_id", "user_id", "value", "value_lead_1"])

    def augment_diffs(sf_dir):
        ds = tk.augment_diffs(_events(sf_dir), ["user_id"], ["ts"], "value", periods=1)
        ds = _nan_to_null(ds, ["value_diff_1"])
        return ds.select_columns(["event_id", "user_id", "value", "value_diff_1"])

    def augment_rolling(sf_dir):
        ds = tk.augment_rolling(
            _events(sf_dir), ["user_id"], ["ts"], "value", window=4, window_func=["sum", "mean"]
        )
        ds = _round_cols(ds, ["value_rolling_sum_win_4", "value_rolling_mean_win_4"])
        return ds.select_columns(
            ["event_id", "user_id", "value_rolling_sum_win_4", "value_rolling_mean_win_4"]
        )

    def rolling_quantile(sf_dir):
        # pd_quantile configurable tuples (reference pandas_helpers.py:333)
        # with the midpoint default: (k-th + k2-th order stat)/2 is the SAME
        # expression as DuckDB (quantile_disc+quantile_disc)/2 -> UNROUNDED
        # bit-equal (linear interpolation is NOT: pandas lerp differs in ULP)
        from pytimetk_ray.ops.rolling import pd_quantile

        cols = [f"value_rolling_quantile_{p}_win_10" for p in (75, 50, 30)]
        ds = tk.augment_rolling(
            _events(sf_dir), ["user_id"], ["ts"], "value", window=10,
            window_func=[("quantile_75", pd_quantile(q=0.75)),
                         ("quantile_50", pd_quantile(q=0.5)),
                         ("quantile_30", pd_quantile(q=0.3))],
        )
        ds = _nan_to_null(ds, cols)
        return ds.select_columns(["event_id", "user_id"] + cols)

    def augment_expanding(sf_dir):
        ds = tk.augment_expanding(
            _events(sf_dir), ["user_id"], ["ts"], "value", window_func=["sum", "count"]
        )
        ds = _round_cols(ds, ["value_expanding_sum"])
        return ds.select_columns(["event_id", "user_id", "value_expanding_sum", "value_expanding_count"])

    def augment_ewm(sf_dir):
        # order-sensitive recurrence; SQL oracle = recursive CTE carrying the
        # adjust=True numerator/denominator pair (num_t = x_t + (1-a)num_{t-1})
        ds = tk.augment_ewm(_events(sf_dir), ["user_id"], ["ts"], "value", window_func="mean", alpha=0.3)
        ds = _round_cols(ds, ["value_ewm_mean_alpha_0.3"])
        return ds.select_columns(["event_id", "user_id", "value_ewm_mean_alpha_0.3"])

    def pad_by_time_daily(sf_dir):
        agg = tk.summarize_by_time(_events(sf_dir), "ts", "value", freq="D", agg_func="sum", by=["user_id"])
        agg = _cast_bucket_us(agg)
        padded = tk.pad_by_time(agg, "bucket_ts", freq="D", by=["user_id"], fillna=0)
        return _round_cols(padded, ["value_sum"])

    def pad_by_time_monthly(sf_dir):
        # calendar-frequency pad (vectorized month-index grid) over the
        # multi-year orders table: per-customer monthly sums, gaps zero-filled
        orders = rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_orderdate", "o_totalprice"],
        )
        agg = tk.summarize_by_time(orders, "o_orderdate", "o_totalprice",
                                   freq="MS", agg_func="sum", by=["o_custkey"])
        agg = _cast_bucket_us(agg)
        padded = tk.pad_by_time(agg, "bucket_ts", freq="M", by=["o_custkey"], fillna=0)
        return _round_cols(padded, ["o_totalprice_sum"])

    def ts_summary(sf_dir):
        ds = tk.ts_summary(_events(sf_dir), "ts", by=["user_id"])
        # diff stats are bit-deterministic (exact-µs quantile interpolation +
        # matched op sequence), so no rounding — only NaN -> null
        return _nan_to_null(
            ds, ["diff_min_s", "diff_q25_s", "diff_median_s", "diff_mean_s", "diff_q75_s", "diff_max_s"]
        )

    def future_frame(sf_dir):
        ds = tk.future_frame(
            _events(sf_dir), "ts", by=["user_id"], length_out=5, freq="1h", bind_data=False
        )
        return ds.select_columns(["user_id", "ts"])

    def signature(sf_dir):
        ds = tk.augment_timeseries_signature(_events(sf_dir), "ts")
        ds = _cast_int64(ds, ["ts_year", "ts_half", "ts_quarter", "ts_month", "ts_mday",
                              "ts_yday", "ts_wday", "ts_hour", "ts_minute", "ts_second",
                              "ts_weekend"])
        return ds.select_columns(
            ["event_id", "ts_year", "ts_half", "ts_quarter", "ts_month", "ts_mday",
             "ts_yday", "ts_wday", "ts_hour", "ts_minute", "ts_second", "ts_weekend", "ts_am_pm"]
        )

    def apply_by_time_range(sf_dir):
        ds = tk.apply_by_time(
            _events(sf_dir), "ts", freq="D", by=["user_id"],
            value_range=lambda df: df["value"].max() - df["value"].min(),
        )
        return _round_cols(_cast_bucket_us(ds), ["value_range"])

    def anomalize(sf_dir):
        # model path: rows-only check
        agg = tk.summarize_by_time(_events(sf_dir), "ts", "value", freq="1h", agg_func="sum", by=["user_id"])
        agg = _cast_bucket_us(agg)
        return tk.anomalize(agg, "bucket_ts", "value_sum", by=["user_id"], period=24, trend=96)

    def anomalize_sql(sf_dir):
        # twitter method on a daily grid with period=7 / trend=28 so
        # median_span=1 (block-median trend = per-group median): every stage
        # (MA-7 decompose, numpy-lerp quantiles, verbatim _iqr limits) is
        # SQL-reproducible.  anomaly_score/observed_clean are excluded — their
        # values land exactly on half-µ decimal grid points (2-decimal data /
        # powers of two), so round-6 ties are engine-dependent.
        agg = tk.summarize_by_time(_events(sf_dir), "ts", "value", freq="D",
                                   agg_func="sum", by=["user_id"])
        agg = _cast_bucket_us(agg)
        ds = tk.anomalize(agg, "bucket_ts", "value_sum", by=["user_id"],
                          period=7, trend=28, method="twitter")
        ds = _round_cols(ds, ["observed", "seasonal", "seasadj", "trend",
                              "remainder", "recomposed_l1", "recomposed_l2"])
        ds = _cast_int64(ds, ["anomaly_direction"])
        return ds.select_columns(
            ["user_id", "bucket_ts", "observed", "seasonal", "seasadj", "trend",
             "remainder", "anomaly", "anomaly_direction", "recomposed_l1",
             "recomposed_l2"]
        )

    def anomalize_stl(sf_dir):
        # TRUE loess STL + IQR, oracle-checked end-to-end: one inner pass,
        # non-robust (the 15-round robust loop is not SQL-reproducible; the
        # robust path is covered rows-only by `anomalize` and by unit tests).
        # trend=15 -> STL trend window make_odd(max(15, 9)) = 15.
        agg = tk.summarize_by_time(_events(sf_dir), "ts", "value", freq="D",
                                   agg_func="sum", by=["user_id"])
        agg = _cast_bucket_us(agg)
        ds = tk.anomalize(agg, "bucket_ts", "value_sum", by=["user_id"],
                          period=7, trend=15, method="stl",
                          stl_robust=False, stl_inner=1, stl_outer=0)
        ds = _round_cols(ds, ["observed", "seasonal", "seasadj", "trend",
                              "remainder", "anomaly_score",
                              "recomposed_l1", "recomposed_l2",
                              "observed_clean"], digits=4)
        ds = _cast_int64(ds, ["anomaly_direction"])
        return ds.select_columns(
            ["user_id", "bucket_ts", "observed", "seasonal", "seasadj", "trend",
             "remainder", "anomaly", "anomaly_score", "anomaly_direction",
             "recomposed_l1", "recomposed_l2", "observed_clean"]
        )

    def fourier(sf_dir):
        ds = tk.augment_fourier(_events(sf_dir), ["user_id"], "ts", periods=24, max_order=1)
        ds = _round_cols(ds, ["ts_sin_1_24", "ts_cos_1_24"])
        return ds.select_columns(["event_id", "ts_sin_1_24", "ts_cos_1_24"])

    def tier_rollup_1h(sf_dir):
        out = os.path.join(tempfile.mkdtemp(prefix="tiers_q_"), "tiers")
        ds = _events(sf_dir).map_batches(
            lambda b: b.rename(columns={"user_id": "conv_id"}), batch_format="pandas"
        )
        rollup_tiers(ds, out_dir=out, key="conv_id", date_column="ts", value_column="value",
                     num_partitions=16, input_fingerprint="q", tiers=("1min", "1h"))
        import ray.data as rd2

        t = rd2.read_parquet(os.path.join(out, "tier=1h")).select_columns(
            ["conv_id", "bucket_ts", "value_sum", "value_count", "value_min", "value_max"]
        )
        return _round_cols(_cast_bucket_us(t), ["value_sum"])

    def tier_ingest_1h(sf_dir):
        # incremental ingest == full recompute, proved against the SAME
        # full-data SQL oracle as tier_rollup_1h: rollup the first ~2/3 of
        # January, then fold the rest in via partition-level invalidation
        from pytimetk_ray.pipelines.tiers import ingest_increment

        out = os.path.join(tempfile.mkdtemp(prefix="tiers_i_"), "tiers")
        split = pd.Timestamp("2024-01-20")

        def _rn(b):
            return b.rename(columns={"user_id": "conv_id"})

        ev = _events(sf_dir).map_batches(_rn, batch_format="pandas")
        base = ev.map_batches(lambda b: b[b["ts"] < split], batch_format="pandas")
        inc = ev.map_batches(lambda b: b[b["ts"] >= split], batch_format="pandas")
        rollup_tiers(base, out_dir=out, key="conv_id", date_column="ts",
                     value_column="value", num_partitions=16,
                     input_fingerprint="qi", tiers=("1min", "1h"))
        ingest_increment(base, inc, out_dir=out, key="conv_id",
                         date_column="ts", value_column="value",
                         tiers=("1min", "1h"), num_partitions=16,
                         input_fingerprint="qi")
        import ray.data as rd2

        t = rd2.read_parquet(os.path.join(out, "tier=1h")).select_columns(
            ["conv_id", "bucket_ts", "value_sum", "value_count", "value_min", "value_max"]
        )
        return _round_cols(_cast_bucket_us(t), ["value_sum"])

    def tier_ingest_salted_1h(sf_dir):
        # incremental ingest into a SALTED store (hot-conversation salting
        # by tier-1 bucket hash): stage-A invalidation hashes the
        # (conv, salt) chain, stage-B the plain conv chain; result proved
        # against the SAME full-data SQL oracle
        from pytimetk_ray.pipelines.tiers import ingest_increment_salted

        out = os.path.join(tempfile.mkdtemp(prefix="tiers_is_"), "tiers")
        split = pd.Timestamp("2024-01-20")

        def _rn(b):
            return b.rename(columns={"user_id": "conv_id"})

        ev = _events(sf_dir).map_batches(_rn, batch_format="pandas")
        base = ev.map_batches(lambda b: b[b["ts"] < split], batch_format="pandas")
        inc = ev.map_batches(lambda b: b[b["ts"] >= split], batch_format="pandas")
        rollup_tiers(base, out_dir=out, key="conv_id", date_column="ts",
                     value_column="value", num_partitions=16,
                     input_fingerprint="qs", tiers=("1min", "1h"), salt=4)
        ingest_increment_salted(base, inc, out_dir=out, key="conv_id",
                                date_column="ts", value_column="value",
                                tiers=("1min", "1h"), num_partitions=16,
                                input_fingerprint="qs", salt=4)
        import ray.data as rd2

        t = rd2.read_parquet(os.path.join(out, "tier=1h")).select_columns(
            ["conv_id", "bucket_ts", "value_sum", "value_count", "value_min", "value_max"]
        )
        return _round_cols(_cast_bucket_us(t), ["value_sum"])

    def tier_expire_1h(sf_dir):
        # retention expiry: drop 1h buckets before Jan 10; oracle = the
        # rollup SQL with the cutoff predicate
        from pytimetk_ray.pipelines.tiers import expire_tiers

        out = os.path.join(tempfile.mkdtemp(prefix="tiers_e_"), "tiers")
        ds = _events(sf_dir).map_batches(
            lambda b: b.rename(columns={"user_id": "conv_id"}), batch_format="pandas"
        )
        rollup_tiers(ds, out_dir=out, key="conv_id", date_column="ts",
                     value_column="value", num_partitions=16,
                     input_fingerprint="qe", tiers=("1min", "1h"))
        expire_tiers(out, {"1h": pd.Timestamp("2024-01-10")})
        import ray.data as rd2

        t = rd2.read_parquet(os.path.join(out, "tier=1h")).select_columns(
            ["conv_id", "bucket_ts", "value_sum", "value_count", "value_min", "value_max"]
        )
        return _round_cols(_cast_bucket_us(t), ["value_sum"])

    def tier_query_1h(sf_dir):
        # the retention store's read path: rollup, then query_tiers picks
        # the coarsest tier satisfying resolution='1h', clips the range and
        # derives value_mean at read (mean is never stored)
        from pytimetk_ray.pipelines.tiers import query_tiers

        out = os.path.join(tempfile.mkdtemp(prefix="tiers_qr_"), "tiers")
        ds = _events(sf_dir).map_batches(
            lambda b: b.rename(columns={"user_id": "conv_id"}), batch_format="pandas"
        )
        rollup_tiers(ds, out_dir=out, key="conv_id", date_column="ts",
                     value_column="value", num_partitions=16,
                     input_fingerprint="qq", tiers=("1min", "1h"))
        t = query_tiers(out, start="2024-01-08", end="2024-01-22",
                        resolution="1h").select_columns(
            ["conv_id", "bucket_ts", "value_sum", "value_count", "value_mean"])
        return _round_cols(_cast_bucket_us(t), ["value_sum", "value_mean"])

    def tier_compact_1h(sf_dir):
        # storage maintenance: encode the 1h tier into DELIBERATELY tiny
        # chunks (max 7 points — the many-small-increments store state),
        # compact to full-size chunks, decode — decoded rows must equal the
        # plain hourly SQL (the compaction bit-equality invariant,
        # end-to-end through both codecs)
        from pytimetk_ray.exec import partitioned_group_map
        from pytimetk_ray.pipelines.tiers import rollup_tiers
        from pytimetk_ray.stages.tier_encoder import (
            TierEncoder, compact_chunks, decode_chunks)

        out = os.path.join(tempfile.mkdtemp(prefix="tiers_cp_"), "tiers")
        ds = _events(sf_dir).map_batches(
            lambda b: b.rename(columns={"user_id": "conv_id"}),
            batch_format="pandas")
        rollup_tiers(ds, out_dir=out, key="conv_id", date_column="ts",
                     value_column="value", num_partitions=16,
                     input_fingerprint="cp", tiers=("1min", "1h"))
        chunks = rd.read_parquet(os.path.join(out, "tier=1h")).map_batches(
            TierEncoder,
            fn_constructor_kwargs=dict(tier="auto", max_points_per_chunk=7),
            batch_format="pandas", batch_size=None, concurrency=2)
        compacted = compact_chunks(chunks, max_points_per_chunk=4096,
                                   num_partitions=16)
        decoded = partitioned_group_map(
            compacted, ["conv_id"], decode_chunks,
            sort_by=["conv_id", "tier", "start_ts"], num_partitions=16)
        decoded = _cast_bucket_us(decoded)
        decoded = _round_cols(decoded, ["value_sum"])
        decoded = _cast_int64(decoded, ["value_count"])  # gorilla stores f64
        return decoded.select_columns(
            ["conv_id", "bucket_ts", "value_sum", "value_count",
             "value_min", "value_max"])

    def tpch_q1(sf_dir):
        ds = rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_shipdate"],
        )
        ds = tk.filter_by_time(ds, "l_shipdate", end_date="1998-09-02")
        from ray.data.aggregate import Count, Mean, Sum

        out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Mean("l_quantity", alias_name="avg_qty"),
            Count(on="l_quantity", alias_name="count_order"),
        )
        return _round_cols(out, ["sum_qty", "sum_base_price", "avg_qty"], 4)

    # --- documents / text --------------------------------------------------

    def _docs(sf_dir):
        return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))

    def dedup_exact(sf_dir):
        return exact_dedup(_docs(sf_dir))

    def doc_token_count(sf_dir):
        return token_counts(_docs(sf_dir))

    def doc_fingerprint(sf_dir):
        from pytimetk_ray.kernels.text import md5_fingerprint

        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"doc_id": batch["doc_id"], "fp": md5_fingerprint(batch["text"].tolist())}
            )

        return _docs(sf_dir).map_batches(fn, batch_format="pandas")

    def doc_quality(sf_dir):
        ds = score_documents(_docs(sf_dir), concurrency=2, with_lang=False, with_fingerprint=False)
        ds = _round_cols(ds, ["q_punct_ratio", "q_upper_ratio"])
        return ds.select_columns(["doc_id", "q_n_chars", "q_punct_ratio", "q_upper_ratio"])

    def doc_langid(sf_dir):
        # heuristic; rows-only
        ds = score_documents(_docs(sf_dir), concurrency=2, with_fingerprint=False)
        return ds.select_columns(["doc_id", "lang_pred"])

    # --- corpus training-data ops (pipelines/corpus.py) ---------------------

    def vocab_topk(sf_dir):
        # distributed token frequency with per-batch partial aggregation
        from pytimetk_ray.pipelines.corpus import vocab_topk as _vt

        return _vt(_docs(sf_dir), top_n=50)

    def doc_hash_split(sf_dir):
        # deterministic md5 train/val/test assignment (DuckDB md5 parity)
        from pytimetk_ray.pipelines.corpus import hash_split

        return hash_split(_docs(sf_dir))

    def docs_topk_per_lang(sf_dir):
        # per-group top-k with partial top-k pruning before the shuffle
        from pytimetk_ray.pipelines.corpus import topk_per_group

        return topk_per_group(_docs(sf_dir), k=5)

    def pack_sequences(sf_dir):
        # greedy token-budget context packing, shard = doc_id % 8
        from pytimetk_ray.pipelines.corpus import pack_sequences as _ps

        return _ps(_docs(sf_dir), budget=512, num_shards=8)

    def doc_repetition(sf_dir):
        # Gopher-style duplicate-3-gram fraction per doc (unrounded: ratio
        # of identically-computed ints + one exact subtraction)
        from pytimetk_ray.pipelines.corpus import ngram_repetition

        return ngram_repetition(_docs(sf_dir))

    def decontaminate(sf_dir):
        # cross-split contamination: word-8-gram containment of every test-
        # split doc against the train split (md5 split buckets), distinct
        # shingles hash-partitioned — the decontamination primitive
        from pytimetk_ray.pipelines.corpus import cross_split_contamination

        return cross_split_contamination(_docs(sf_dir), shingle_k=8)

    def decontaminate_bloom(sf_dir):
        # space-bounded variant: blocked Bloom filter broadcast instead of
        # the shingle shuffle; sized so expected false positives << 1 —
        # the oracle is the SAME SQL as `decontaminate` (a mismatch IS a
        # detected false positive)
        from pytimetk_ray.pipelines.corpus import bloom_contamination

        return bloom_contamination(_docs(sf_dir), shingle_k=8)

    def prep_composite(sf_dir):
        # the full training-data prep chain, oracle-checked end to end:
        # quality filter -> exact dedup -> md5-MinHash near-dup components
        # (drop non-representatives) -> deterministic md5 split -> greedy
        # token-budget packing.  Every stage is the distributed pipeline;
        # the oracle is ONE SQL statement over the same definitions.
        from pytimetk_ray.pipelines.corpus import hash_split
        from pytimetk_ray.pipelines.corpus import pack_sequences as _ps
        from pytimetk_ray.pipelines.prep import prepare_training_data

        kept, _stats = prepare_training_data(
            _docs(sf_dir), min_tokens=5, max_punct_ratio=0.5,
            neardup_threshold=0.7, concurrency=2)
        packed = _ps(kept, budget=512, num_shards=8)
        split = hash_split(kept).select_columns(["doc_id", "split"])
        return packed.join(split, join_type="inner", num_partitions=16,
                           on=("doc_id",))

    def doc_unigram_logprob(sf_dir):
        # two-pass unigram LM score: broadcast top-V vocab, stateless scorer
        from pytimetk_ray.pipelines.corpus import unigram_logprob

        return _round_cols(unigram_logprob(_docs(sf_dir), vocab_size=256),
                           ["logprob"])

    def doc_sample_mixture(sf_dir):
        # pretraining data-mixture recipe: per-source deterministic keep
        # rates (group-independent id hash: rate changes never reshuffle
        # other sources); oracle = the same md5 predicate per source
        from pytimetk_ray.pipelines.corpus import sample_mixture

        ds = sample_mixture(
            _docs(sf_dir), group_column="source",
            rates_ppm={"src0": 1_000_000, "src1": 500_000, "src2": 100_000},
            default_ppm=250_000)
        return ds.select_columns(["doc_id", "source", "lang", "n_chars"])

    def doc_ccnet_buckets(sf_dir):
        # CCNet head/middle/tail thirds per language by unigram LM rank;
        # bucket = 3*rank0 // n_lang is exact integer arithmetic, rank key
        # rounds the ln-based score to 6 BEFORE ranking (tie taxonomy)
        from pytimetk_ray.pipelines.corpus import ccnet_buckets

        ds = ccnet_buckets(_docs(sf_dir), vocab_size=256)
        return ds.select_columns(["doc_id", "lang", "n_tokens", "logprob",
                                  "bucket", "bucket_label"])

    def dedup_cluster_reps(sf_dir):
        # keep-longest representative election over the transitive duplicate
        # clusters (the dedup ACTION layer above dedup_clusters)
        from pytimetk_ray.pipelines.dedup import (
            cluster_representatives, dedup_components, jaccard_allpairs)

        pairs = jaccard_allpairs(_docs(sf_dir), threshold=0.2)
        return cluster_representatives(dedup_components(pairs),
                                       _docs(sf_dir))

    def doc_bigram_logprob(sf_dir):
        # CCNet-shaped bigram LM score: top-V vocab broadcast, ONE tokenize
        # pass, bigram-count table joined (never broadcast), per-doc reduce
        from pytimetk_ray.pipelines.corpus import bigram_logprob

        return _round_cols(bigram_logprob(_docs(sf_dir), vocab_size=64),
                           ["logprob"])

    def dedup_jaccard(sf_dir):
        # exact all-pairs word-3-shingle Jaccard via distributed inverted
        # index; unrounded p/q doubles are engine-bit-identical
        from pytimetk_ray.pipelines.dedup import jaccard_allpairs

        return jaccard_allpairs(_docs(sf_dir), threshold=0.2)

    def dedup_jaccard_dfcut(sf_dir):
        # same inverted index with the hot-shingle df-cut ON: shingles shared
        # by > 40 docs are dropped before pair generation, and set sizes count
        # only surviving shingles — mirrored by the oracle's HAVING df <= 40
        from pytimetk_ray.pipelines.dedup import jaccard_allpairs

        return jaccard_allpairs(_docs(sf_dir), threshold=0.2, max_doc_freq=40)

    def dedup_clusters(sf_dir):
        # transitive duplicate clusters over the EXACT-Jaccard pair graph;
        # SQL oracle = recursive reachability closure + min reachable id
        from pytimetk_ray.pipelines.dedup import dedup_components, jaccard_allpairs

        pairs = jaccard_allpairs(_docs(sf_dir), threshold=0.2)
        return dedup_components(pairs)

    def dedup_minhash(sf_dir):
        return minhash_lsh_pairs(_docs(sf_dir), threshold=0.5)

    def dedup_simhash(sf_dir):
        return simhash_pairs(_docs(sf_dir))

    # --- embeddings ---------------------------------------------------------

    def _emb(sf_dir):
        return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))

    def ann_topk(sf_dir):
        emb = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet")).sort_values("vec_id").head(4)
        q = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
        return ann_bruteforce(
            _emb(sf_dir), q, emb["vec_id"].to_numpy(), k=5, round_digits=6
        )

    def _queries4(sf_dir):
        emb = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet")).sort_values("vec_id").head(4)
        qm = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
        return qm, emb["vec_id"].to_numpy()

    def ann_ivf_topk(sf_dir):
        # IVF coarse-quantizer scale path; approximate -> rows-only
        from pytimetk_ray.pipelines.similarity import ann_ivf

        qm, qids = _queries4(sf_dir)
        return ann_ivf(_emb(sf_dir), qm, qids, k=5, nlist=8, nprobe=3,
                       round_digits=6)

    def ann_ivf_full(sf_dir):
        # nprobe == nlist probes every cluster -> exhaustive == brute force,
        # so the exact-SQL oracle applies to the IVF plumbing too
        from pytimetk_ray.pipelines.similarity import ann_ivf

        qm, qids = _queries4(sf_dir)
        return ann_ivf(_emb(sf_dir), qm, qids, k=5, nlist=8, nprobe=8,
                       round_digits=6)

    def embedding_neardup(sf_dir):
        # nbits=0 -> single bucket -> exact all-pairs (SQL-checkable)
        return embedding_neardup_pairs(_emb(sf_dir), dim=64, threshold=0.2, nbits=0, round_digits=6)

    def embedding_neardup_lsh(sf_dir):
        # banded scale path (2 tables x 2 hyperplane bits); oracle joins on
        # "any band's bucket matches" with the same inlined planes
        return embedding_neardup_pairs(_emb(sf_dir), dim=64, threshold=0.2,
                                       nbits=2, bands=2, round_digits=6)

    def kmeans_embed_q(sf_dir):
        # distributed Lloyd's k-means: one combiner map_batches pass +
        # K-row reduce per iteration, centroids broadcast, zero data
        # shuffle; dyadic quantization makes every sum exact so the
        # generated per-iteration CTE oracle is BIT-equal (clustering.py
        # module docstring has the proof sketch)
        from pytimetk_ray.pipelines.clustering import kmeans_embed

        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
        return kmeans_embed(emb, k=8, iters=3, quantize_bits=10)

    def semdedup_q(sf_dir):
        # SemDeDup (Abbas et al. 2023): cluster, then greedy within-cluster
        # cosine prune (drop iff a smaller-id clustermate has cos >= tau).
        # Exact dyadic dots/norms -> cosine compared UNROUNDED vs SQL.
        from pytimetk_ray.pipelines.clustering import semdedup

        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
        return semdedup(emb, k=8, iters=3, tau=0.35, quantize_bits=10)

    def pq_topk_q(sf_dir):
        # product-quantization ADC top-k: M=8 sub-codebooks trained in the
        # same pass (one scan + m*ksub-row reduce per Lloyd iteration),
        # codes are 8 ints per vector, scoring is a per-query lookup-table
        # gather; dist is bit-deterministic -> compared UNROUNDED
        from pytimetk_ray.pipelines.clustering import pq_topk

        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
        return pq_topk(emb, k=5, n_queries=4, m=8, ksub=16, iters=2,
                       quantize_bits=10)

    def multimodal_decode(sf_dir):
        # rows-only: binary media columns through the actor-pool decode stage
        # (deterministic fake decoder — real codec libs absent; the Ray-side
        # schema/batch/actor plumbing is the real thing being exercised)
        from pytimetk_ray.stages.multimodal import decode_images

        def to_media(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "media_id": batch["doc_id"],
                "payload": [t.encode("utf-8") for t in batch["text"]],
            })

        media = _docs(sf_dir).map_batches(to_media, batch_format="pandas")
        decoded = decode_images(media, concurrency=2, batch_size=64)

        def summarize(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "media_id": batch["media_id"],
                "height": batch["height"],
                "width": batch["width"],
                "pixel_sum": [float(np.round(p.sum(), 3)) for p in batch["pixels"]],
            })

        return decoded.map_batches(summarize, batch_format="pandas")

    def multimodal_pipeline(sf_dir):
        # rows-only: the full media chain decode -> nearest-neighbor resize
        # (REAL numpy gather) -> feature extraction (actor-held projection,
        # one BLAS matmul per batch); schema/batch/actor plumbing end to end
        from pytimetk_ray.stages.multimodal import (
            decode_images,
            extract_features,
            resize_images,
        )

        def to_media(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "media_id": batch["doc_id"],
                "payload": [t.encode("utf-8") for t in batch["text"]],
            })

        media = _docs(sf_dir).map_batches(to_media, batch_format="pandas")
        decoded = decode_images(media, concurrency=2, batch_size=64)
        small = resize_images(decoded, concurrency=2, in_shape=(32, 32, 3),
                              out_hw=(16, 16))
        feats = extract_features(small, in_dim=16 * 16 * 3, out_dim=32,
                                 concurrency=2)

        def summarize(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "media_id": batch["media_id"],
                "emb_norm": [float(np.round(np.linalg.norm(e), 3))
                             for e in batch["embedding"]],
            })

        return feats.map_batches(summarize, batch_format="pandas")

    # --- finance / diagnostics / signal ------------------------------------

    from pytimetk_ray.ops import finance as fin
    from pytimetk_ray.ops.correlationfunnel import binarize, correlate
    from pytimetk_ray.ops.diagnostics import acf_diagnostics, stl_diagnostics
    from pytimetk_ray.ops.holiday import augment_holiday_signature
    from pytimetk_ray.ops.signal import augment_hilbert

    def fin_roc_drawdown(sf_dir):
        ds = fin.augment_roc(_events(sf_dir), ["user_id"], ["ts"], "value", periods=3)
        ds = fin.augment_drawdown(ds, ["user_id"], ["ts"], "value")
        ds = _nan_to_null(ds, ["value_roc_0_3", "value_drawdown_pct"])
        return ds.select_columns(
            ["event_id", "user_id", "value", "value_roc_0_3", "value_peak",
             "value_drawdown", "value_drawdown_pct"]
        )

    def fin_bbands(sf_dir):
        ds = fin.augment_bbands(_events(sf_dir), ["user_id"], ["ts"], "value",
                                periods=10, std_dev=2.0)
        ds = _round_cols(ds, ["value_bband_middle_10_2", "value_bband_upper_10_2",
                              "value_bband_lower_10_2"])
        return ds.select_columns(["event_id", "user_id", "value_bband_middle_10_2",
                                  "value_bband_upper_10_2", "value_bband_lower_10_2"])

    def fin_rsi(sf_dir):
        ds = fin.augment_rsi(_events(sf_dir), ["user_id"], ["ts"], "value", periods=14)
        ds = _round_cols(ds, ["value_rsi_14"])
        return ds.select_columns(["event_id", "user_id", "value_rsi_14"])

    def fin_macd(sf_dir):
        # EMA chain; SQL oracle = one recursive CTE carrying (ema_fast,
        # ema_slow, signal) with pandas' adjust=False seeding (sig_1 = line_1)
        ds = fin.augment_macd(_events(sf_dir), ["user_id"], ["ts"], "value")
        ds = _round_cols(ds, ["value_macd_line_12_26_9",
                              "value_macd_signal_line_12_26_9",
                              "value_macd_histogram_12_26_9"])
        return ds.select_columns(
            ["event_id", "user_id", "value_macd_line_12_26_9",
             "value_macd_signal_line_12_26_9", "value_macd_histogram_12_26_9"]
        )

    def _events_hlc(sf_dir):
        # synthetic high/low around the value column (deterministic, same
        # arithmetic in the SQL oracle) for the H/L/C indicators
        def add_hl(batch: pd.DataFrame) -> pd.DataFrame:
            batch["high"] = batch["value"] + 1.5
            batch["low"] = batch["value"] - 2.5
            return batch

        return _events(sf_dir).map_batches(add_hl, batch_format="pandas")

    def fin_cmo(sf_dir):
        ds = fin.augment_cmo(_events(sf_dir), ["user_id"], ["ts"], "value", periods=10)
        # canon_zero: at sf0.1 a window with all-zero deltas rounds to -0.0
        # on one side only (byte-hash hazard; NOTES_r4 tie taxonomy)
        ds = _round_cols(ds, ["value_cmo_10"], canon_zero=True)
        return ds.select_columns(["event_id", "user_id", "value_cmo_10"])

    def fin_atr(sf_dir):
        ds = fin.augment_atr(_events_hlc(sf_dir), ["user_id"], ["ts"],
                             "high", "low", "value", periods=7)
        ds = _round_cols(ds, ["value_tr_7", "value_atr_7"])
        return ds.select_columns(["event_id", "user_id", "value_tr_7", "value_atr_7"])

    def fin_stochastic(sf_dir):
        # %K is exact p/q of grid-exact min/max/close -> UNROUNDED
        # (bit-identical across engines); %D (rolling mean of thirds) rounds
        ds = fin.augment_stochastic_oscillator(
            _events_hlc(sf_dir), ["user_id"], ["ts"], "high", "low", "value",
            k_periods=14, d_periods=3)
        ds = _nan_to_null(ds, ["value_stoch_k_14"])
        ds = _round_cols(ds, ["value_stoch_d_14_3"])
        return ds.select_columns(["event_id", "user_id", "value_stoch_k_14",
                                  "value_stoch_d_14_3"])

    def fin_ppo(sf_dir):
        ds = fin.augment_ppo(_events(sf_dir), ["user_id"], ["ts"], "value")
        ds = _round_cols(ds, ["value_ppo_line_12_26"])
        return ds.select_columns(["event_id", "user_id", "value_ppo_line_12_26"])

    def fin_ewma_vol(sf_dir):
        # pandas ewm skips inf observations with ignore_na=False decayed
        # weights; the SQL oracle's recursive CTE carries (s2, old_wt, count)
        ds = fin.augment_ewma_volatility(_events(sf_dir), ["user_id"], ["ts"],
                                         "value", windows=5, decay_factor=0.94)
        ds = _round_cols(ds, ["value_ewma_vol_5_0.94"])
        ds = _nan_to_null(ds, ["value_ewma_vol_5_0.94"])
        return ds.select_columns(["event_id", "user_id", "value_ewma_vol_5_0.94"])

    def fin_fip(sf_dir):
        # UNROUNDED: the engine's left-fold window product is bit-identical
        # to the oracle's LAG-chain ((((f4*f3)*f2)*f1)*f0, and %neg/%pos are
        # exact ratios of identically-computed ints — even the noise sign of
        # a telescoping window (product exactly 1) reproduces
        ds = fin.augment_fip_momentum(_events(sf_dir), ["user_id"], ["ts"],
                                      "value", window=5)
        ds = _nan_to_null(ds, ["value_fip_momentum_5"])
        return ds.select_columns(["event_id", "user_id", "value_fip_momentum_5"])

    def fin_qsmomentum(sf_dir):
        # UNROUNDED: explicit two-pass window std (left-fold, oldest first)
        # is bit-identical to the oracle's LAG-chain SQL; legs are identical
        # float expressions on both sides
        ds = fin.augment_qsmomentum(_events(sf_dir), ["user_id"], ["ts"], "value",
                                    roc_fast_period=3, roc_slow_period=10,
                                    returns_period=5)
        ds = _nan_to_null(ds, ["value_qsmom_3_10_5"])
        return ds.select_columns(["event_id", "user_id", "value_qsmom_3_10_5"])

    def fin_risk(sf_dir):
        # UNROUNDED: all five metrics are explicit two-pass window formulas
        # mirrored term-for-term (same fold order) by the oracle SQL
        ds = fin.augment_rolling_risk_metrics(_events(sf_dir), ["user_id"], ["ts"],
                                              "value", window=5)
        cols = ["value_sharpe_ratio_5", "value_sortino_ratio_5",
                "value_volatility_annualized_5", "value_omega_ratio_5",
                "value_skewness_5", "value_kurtosis_5"]
        ds = _nan_to_null(ds, cols)
        return ds.select_columns(["event_id", "user_id"] + cols)

    def fin_risk_bench(sf_dir):
        # benchmark-relative metrics (treynor beta from population
        # covariances, information ratio from tracking-error std) vs a
        # deterministic benchmark column b = value + 100
        ds = _events(sf_dir).map_batches(
            lambda b: b.assign(bench=b["value"] + 100.0), batch_format="pandas")
        ds = fin.augment_rolling_risk_metrics(ds, ["user_id"], ["ts"], "value",
                                              window=5, benchmark_column="bench")
        cols = ["value_treynor_ratio_5", "value_information_ratio_5"]
        ds = _nan_to_null(ds, cols)
        return ds.select_columns(["event_id", "user_id"] + cols)

    def fin_risk_log(sf_dir):
        # the current reference's log-return formulation (ln(close/prev),
        # rolling_risk_metrics.py:375-376); round-6 because ln is computed
        # by two different libm implementations
        ds = fin.augment_rolling_risk_metrics(_events(sf_dir), ["user_id"], ["ts"],
                                              "value", window=5, returns="log")
        cols = ["value_sharpe_ratio_5", "value_volatility_annualized_5"]
        ds = _round_cols(_nan_to_null(ds, cols), cols, canon_zero=True)
        return ds.select_columns(["event_id", "user_id"] + cols)

    def fin_hurst(sf_dir):
        # round-6: the oracle recomputes R/S via a pairs self-join (AVG vs
        # numpy pairwise mean differ at ~1e-15; log output is boundary-safe)
        ds = fin.augment_hurst_exponent(_events(sf_dir), ["user_id"], ["ts"],
                                        "value", window=20)
        ds = _round_cols(ds, ["value_hurst_20"])
        ds = _nan_to_null(ds, ["value_hurst_20"])
        return ds.select_columns(["event_id", "user_id", "value_hurst_20"])

    def fin_adx(sf_dir):
        # UNROUNDED: pandas ewm(adjust=False) == the plain Wilder recursion
        # (1-a)*y + a*x bit-for-bit (denominator (1-a)+a is exactly 1.0 for
        # a=1/14), so the oracle's recursive CTE reproduces all three
        # chained smoothings exactly
        ds = fin.augment_adx(_events_hlc(sf_dir), ["user_id"], ["ts"],
                             "high", "low", "value", periods=14)
        cols = ["value_plus_di_14", "value_minus_di_14", "value_adx_14"]
        ds = _nan_to_null(ds, cols)
        return ds.select_columns(["event_id", "user_id"] + cols)

    def fin_regime(sf_dir):
        # rows-only: iterative Baum-Welch EM is not SQL-expressible.  Labels
        # are deterministic (quantile init, mean-ascending canonical order)
        # but depend on the full fit, so only rows+schema are checked.
        ds = fin.augment_regime_detection(
            _events(sf_dir), ["user_id"], ["ts"], "value",
            window=60, n_regimes=2, step_size=10, n_iter=20)
        ds = _nan_to_null(ds, ["value_regime_60"])
        return ds.select_columns(["event_id", "user_id", "value_regime_60"])

    def diag_acf(sf_dir):
        # numpy FFT ACF/PACF; rows-only
        return acf_diagnostics(_events(sf_dir), "ts", "value", by=["user_id"], lags=12)

    def diag_acf_sql(sf_dir):
        # ACF (biased; FFT and the direct lag-sum agree to ~1e-12) plus the
        # first two yw-mle PACF lags, which have closed forms in the same
        # lag sums (pacf1 = s1/s0; pacf2 = (s0*s2 - s1^2)/(s0^2 - s1^2)),
        # all rounded to 6
        ds = acf_diagnostics(_events(sf_dir), "ts", "value", by=["user_id"], lags=4)

        def pick(batch: pd.DataFrame) -> pd.DataFrame:
            keep = (batch["metric"] == "acf") | (
                (batch["metric"] == "pacf") & batch["lag"].isin([1, 2]))
            out = batch[keep][["user_id", "metric", "lag", "value"]].copy()
            out["lag"] = out["lag"].astype(np.int64)
            out["value"] = pd.array(
                np.round(out["value"].to_numpy(np.float64), 6), dtype="Float64")
            return out

        return ds.map_batches(pick, batch_format="pandas")

    def diag_stl(sf_dir):
        # real loess STL (robust); rows-only (iterative fit)
        agg = tk.summarize_by_time(_events(sf_dir), "ts", "value", freq="1h",
                                   agg_func="sum", by=["user_id"])
        return stl_diagnostics(_cast_bucket_us(agg), "bucket_ts", "value_sum",
                               by=["user_id"], period=24)

    def diag_stl_sql(sf_dir):
        # daily grid + period=7 (odd MA -> single parity) so the classical
        # decomposition (centered MA-7 trend, linear edge extrapolation,
        # per-phase seasonal means) is exactly SQL-reproducible
        agg = tk.summarize_by_time(_events(sf_dir), "ts", "value", freq="D",
                                   agg_func="sum", by=["user_id"])
        ds = stl_diagnostics(_cast_bucket_us(agg), "bucket_ts", "value_sum",
                             by=["user_id"], period=7, method="classical")
        return _round_cols(ds, ["observed", "seasonal", "seasadj", "trend", "remainder"])

    def diag_stl_loess(sf_dir):
        # TRUE loess STL, oracle-checked: period=7, seasonal span 7, trend
        # span 15, low-pass 7, degree 1, ONE inner pass, non-robust — the
        # DuckDB oracle reproduces the full Cleveland recurrence
        # (cycle-subseries loess with end extension, 3xMA low-pass + loess,
        # trend loess) via windowed self-joins.  round-4: three chained
        # loess passes accumulate ~1e-10 vs SUM() reordering.
        agg = tk.summarize_by_time(_events(sf_dir), "ts", "value", freq="D",
                                   agg_func="sum", by=["user_id"])
        ds = stl_diagnostics(_cast_bucket_us(agg), "bucket_ts", "value_sum",
                             by=["user_id"], period=7, method="stl",
                             seasonal=7, trend_window=15, robust=False,
                             inner=1, outer=0)
        return _round_cols(ds, ["observed", "seasonal", "seasadj", "trend",
                                "remainder"], digits=4)

    def hilbert(sf_dir):
        # whole-series FFT; rows-only
        ds = augment_hilbert(_events(sf_dir), ["user_id"], ["ts"], "value")
        return ds.select_columns(["event_id", "user_id", "value_hilbert_real",
                                  "value_hilbert_imag"])

    def hilbert_sql(sf_dir):
        # oracle-checked: the SQL recomputes the analytic signal by the
        # O(n^2) DFT definition (trig sums); round-4 absorbs FFT-vs-naive
        # float noise at these magnitudes
        ds = augment_hilbert(_events(sf_dir), ["user_id"], ["ts"], "value")
        ds = _round_cols(ds, ["value_hilbert_real", "value_hilbert_imag"],
                         digits=4, canon_zero=True)
        return ds.select_columns(["event_id", "user_id", "value_hilbert_real",
                                  "value_hilbert_imag"])

    def wavelet_sql(sf_dir):
        # scales 2 and 4 keep the Morlet kernel width (20/40) below every
        # user's series length, so the kernel is a global constant list the
        # SQL convolution can mirror term-for-term
        from pytimetk_ray.ops.signal import augment_wavelet

        ds = augment_wavelet(_events(sf_dir), ["user_id"], ["ts"], "value",
                             scales=(2, 4))
        cols = ["value_wavelet_morlet_scale_2", "value_wavelet_morlet_scale_4"]
        ds = _round_cols(ds, cols)
        return ds.select_columns(["event_id", "user_id"] + cols)

    def holiday_signature(sf_dir):
        ds = augment_holiday_signature(_events(sf_dir), "ts", concurrency=2)
        ds = _cast_int64(ds, ["is_holiday", "before_holiday", "after_holiday"])
        return ds.select_columns(["event_id", "is_holiday", "before_holiday",
                                  "after_holiday"])

    def holiday_signature_multi(sf_dir):
        # UK + DE built-in calendars over a dense 2024-2025 daily grid; the
        # oracle lists the hand-derived public dates (Easter computus etc.)
        import ray.data as rd2

        days = pd.date_range("2024-01-01", "2025-12-31", freq="D").astype(
            "datetime64[us]")
        parts = []
        for ctry in ("UK", "DE"):
            d = rd2.from_pandas(pd.DataFrame({"d": days}))
            t = augment_holiday_signature(d, "d", country=ctry, concurrency=2)
            t = t.map_batches(
                lambda b, c=ctry: b.assign(country=c), batch_format="pandas")
            parts.append(t)
        ds = parts[0].union(parts[1])
        ds = _cast_int64(ds, ["is_holiday", "before_holiday", "after_holiday"])
        return ds.select_columns(["country", "d", "is_holiday",
                                  "before_holiday", "after_holiday",
                                  "holiday_name"])

    def holiday_signature_4ctry(sf_dir):
        # JP (furikae-substitute rules) + MX (Monday-rule + sexennial) +
        # BR + IN builtin calendars over a 2024-2025 daily grid; oracle
        # lists the hand-derived official dates
        import ray.data as rd2

        days = pd.date_range("2024-01-01", "2025-12-31", freq="D").astype(
            "datetime64[us]")
        parts = []
        for ctry in ("JP", "MX", "BR", "IN"):
            d = rd2.from_pandas(pd.DataFrame({"d": days}))
            t = augment_holiday_signature(d, "d", country=ctry, concurrency=2)
            t = t.map_batches(
                lambda b, c=ctry: b.assign(country=c), batch_format="pandas")
            parts.append(t)
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        ds = _cast_int64(ds, ["is_holiday", "before_holiday", "after_holiday"])
        return ds.select_columns(["country", "d", "is_holiday",
                                  "before_holiday", "after_holiday",
                                  "holiday_name"])

    def holiday_signature_kr_cn_za(sf_dir):
        # round-5 calendars: KR (Gregorian subset + 2014/2021/2023
        # substitute-Monday rules), CN (fixed + Qingming solar-term
        # approximation), ZA (Public Holidays Act incl. the Sunday rule);
        # oracle lists the hand-derived official dates
        import ray.data as rd2

        days = pd.date_range("2024-01-01", "2025-12-31", freq="D").astype(
            "datetime64[us]")
        parts = []
        for ctry in ("KR", "CN", "ZA"):
            d = rd2.from_pandas(pd.DataFrame({"d": days}))
            t = augment_holiday_signature(d, "d", country=ctry, concurrency=2)
            t = t.map_batches(
                lambda b, c=ctry: b.assign(country=c), batch_format="pandas")
            parts.append(t)
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        ds = _cast_int64(ds, ["is_holiday", "before_holiday", "after_holiday"])
        return ds.select_columns(["country", "d", "is_holiday",
                                  "before_holiday", "after_holiday",
                                  "holiday_name"])

    def augment_pct_change(sf_dir):
        ds = tk.augment_pct_change(_events(sf_dir), ["user_id"], ["ts"], "value", periods=1)
        ds = _nan_to_null(ds, ["value_pctdiff_1"])
        return ds.select_columns(["event_id", "user_id", "value", "value_pctdiff_1"])

    def week_of_month(sf_dir):
        from pytimetk_ray.ops.sequences import week_of_month as wom

        def fn(batch):
            return pd.DataFrame({"event_id": batch["event_id"], "wom": wom(batch["ts"])})

        return _events(sf_dir).map_batches(fn, batch_format="pandas")

    def weekday_sequence(sf_dir):
        from pytimetk_ray.ops.sequences import make_weekday_sequence

        days = make_weekday_sequence("2024-01-01", "2024-03-31")
        return pd.DataFrame({"d": pd.to_datetime(days).astype("datetime64[us]")})

    def sessions(sf_dir):
        from pytimetk_ray.ops.sessions import augment_sessions

        ds = augment_sessions(_events(sf_dir), ["user_id"], "ts", gap="2 hours",
                              tiebreakers=["event_id"])
        return ds.select_columns(["event_id", "user_id", "session_id"])

    def floor_ceil_dates(sf_dir):
        from pytimetk_ray.ops.frame_utils import ceil_date, floor_date

        ds = floor_date(_events(sf_dir), "ts", "1h", out_column="floor_1h")
        ds = ceil_date(ds, "ts", "1h", out_column="ceil_1h")
        ds = floor_date(ds, "ts", "M", out_column="floor_month")
        ds = ceil_date(ds, "ts", "M", out_column="ceil_month")
        return ds.select_columns(["event_id", "floor_1h", "ceil_1h",
                                  "floor_month", "ceil_month"])

    def filter_by_time_month(sf_dir):
        # end-date granularity expansion: "2024-01" -> end of January
        return tk.filter_by_time(_events(sf_dir), "ts", "2024-01-15", "2024-01")

    def weekend_sequence(sf_dir):
        from pytimetk_ray.ops.sequences import make_weekend_sequence

        days = make_weekend_sequence("2024-01-01", "2024-03-31")
        return pd.DataFrame({"d": pd.to_datetime(days).astype("datetime64[us]")})

    def future_frame_bind(sf_dir):
        ds = tk.future_frame(
            _events(sf_dir), "ts", by=["user_id"], length_out=3, freq="1h",
            bind_data=True,
        )
        return ds.select_columns(["user_id", "ts"])

    def drop_zero_variance_q(sf_dir):
        from pytimetk_ray.ops.frame_utils import drop_zero_variance

        def add_const(batch: pd.DataFrame) -> pd.DataFrame:
            batch["const_col"] = 1
            return batch

        ds = _events(sf_dir).map_batches(add_const, batch_format="pandas")
        return drop_zero_variance(ds)

    def doc_stop_ratio(sf_dir):
        # occurrence counts / word count: ints -> bit-exact division
        ds = score_documents(_docs(sf_dir), concurrency=2, with_lang=False,
                             with_fingerprint=False)
        return ds.select_columns(["doc_id", "q_n_tokens", "q_stop_ratio"])

    def rolling_apply(sf_dir):
        # DataFrame-window UDF (range): max-min of exact doubles is
        # engine-bit-identical -> unrounded oracle
        from pytimetk_ray.ops.apply_window import augment_rolling_apply

        # python-UDF slow path (reference's lambda path is ~3500x slower than
        # builtins too) -> subset of groups keeps the harness fast
        ev = _events(sf_dir).filter(lambda r: r["user_id"] < 30)
        ds = augment_rolling_apply(
            ev, ["user_id"], ["ts"], window=5,
            window_func=[("range", lambda df: df["value"].max() - df["value"].min())],
        )
        ds = _nan_to_null(ds, ["rolling_range_win_5"])
        return ds.select_columns(["event_id", "user_id", "rolling_range_win_5"])

    def expanding_apply(sf_dir):
        from pytimetk_ray.ops.apply_window import augment_expanding_apply

        ev = _events(sf_dir).filter(lambda r: r["user_id"] < 30)
        ds = augment_expanding_apply(
            ev, ["user_id"], ["ts"],
            window_func=[("vrange", lambda df: df["value"].max() - df["value"].min())],
        )
        ds = _nan_to_null(ds, ["expanding_vrange"])
        return ds.select_columns(["event_id", "user_id", "expanding_vrange"])

    def spline(sf_dir):
        # rows-only: numpy Cox-de Boor B-spline basis on the value column
        from pytimetk_ray.ops.spline import augment_spline

        ds = augment_spline(_events(sf_dir), "value", df=5, degree=3)
        cols = [c for c in ds.schema().names if c.startswith("value_spline_")]
        ds = _nan_to_null(ds, cols)
        return ds.select_columns(["event_id"] + cols)

    def spline_sql(sf_dir):
        # explicit interior knots + boundary knots -> fully SQL-reproducible
        # Cox-de Boor recursion (generated CTE chain)
        from pytimetk_ray.ops.spline import augment_spline

        ds = augment_spline(_events(sf_dir), "value", df=5, degree=3,
                            knots=[100.0, 250.0], boundary_knots=(0.0, 500.0))
        cols = [f"value_spline_{i}" for i in range(1, 6)]
        ds = _round_cols(ds, cols, canon_zero=True)
        return ds.select_columns(["event_id"] + cols)

    def wavelet(sf_dir):
        # rows-only: whole-series CWT per group
        from pytimetk_ray.ops.signal import augment_wavelet

        ds = augment_wavelet(_events(sf_dir), ["user_id"], ["ts"], "value",
                             scales=(2, 4))
        cols = [c for c in ds.schema().names if "wavelet" in c]
        ds = _nan_to_null(ds, cols)
        return ds.select_columns(["event_id", "user_id"] + cols)

    def cv_folds(sf_dir):
        # first 3 rolling-origin folds as lazy filter_by_time views
        from itertools import islice

        from pytimetk_ray.ops.cv import TimeSeriesCV

        cv = TimeSeriesCV(frequency="D", train_size=10, forecast_horizon=3,
                          mode="forward")
        frames = []
        for i, (train, test) in enumerate(islice(cv.split(_events(sf_dir), "ts"), 3)):
            tr = train.select_columns(["event_id"]).to_pandas()
            te = test.select_columns(["event_id"]).to_pandas()
            tr["fold"], tr["split"] = i, "train"
            te["fold"], te["split"] = i, "test"
            frames.append(tr)
            frames.append(te)
        return pd.concat(frames, ignore_index=True)

    def cv_folds_backward(sf_dir):
        # reference-default backward mode: last fold's test window ends at
        # the max timestamp (+1us half-open); 3 latest folds, chronological
        from pytimetk_ray.ops.cv import TimeSeriesCV

        cv = TimeSeriesCV(frequency="D", train_size=10, forecast_horizon=3,
                          split_limit=3)
        frames = []
        for i, (train, test) in enumerate(cv.split(_events(sf_dir), "ts")):
            tr = train.select_columns(["event_id"]).to_pandas()
            te = test.select_columns(["event_id"]).to_pandas()
            tr["fold"], tr["split"] = i, "train"
            te["fold"], te["split"] = i, "test"
            frames.append(tr)
            frames.append(te)
        return pd.concat(frames, ignore_index=True)

    def ts_features_q(sf_dir):
        from pytimetk_ray.ops.ts_features import ts_features

        ds = ts_features(
            _events(sf_dir), "ts", "value", by=["user_id"],
            features=["length", "acf1", "crossing_points",
                      "stability", "lumpiness"],
        )
        # mean/var are EXCLUDED: power-of-two group sizes (or n-1) put them
        # on dyadic decimal ties at every rounding width
        ds = _round_cols(ds, ["acf1"])
        # var-of-var cancellation differs ~1e-10 across engines on O(1e3)
        # values -> 3 decimals keeps the compare straddle-free
        ds = _round_cols(ds, ["stability", "lumpiness"], digits=3)
        return _cast_int64(ds, ["crossing_points", "length"])

    def ts_features_full(sf_dir):
        # rows-only: full builtin set (entropy/flat_spots/strengths use FFT,
        # quantile binning and the classical decomposition)
        from pytimetk_ray.ops.ts_features import ts_features

        ds = ts_features(_events(sf_dir), "ts", "value", by=["user_id"])
        return _nan_to_null(ds, ["entropy", "trend_strength", "seasonal_strength",
                                 "acf10", "diff1_acf1", "diff2_acf1"])

    def ts_features_ext(sf_dir):
        # SQL-expressible slice of the round-2 feature set: arch_lm with ONE
        # lag (univariate OLS R^2 == corr^2), KPSS level stat, Phillips-
        # Perron Z_alpha, full-series R/S hurst
        from pytimetk_ray.ops.ts_features import ts_features as tsf

        ds = tsf(_events(sf_dir), "ts", "value", by=["user_id"],
                 features=["length", "arch_lm", "unitroot_kpss",
                           "unitroot_pp", "hurst"], arch_lags=1)
        return _round_cols(ds, ["arch_lm", "unitroot_kpss", "unitroot_pp",
                                "hurst"])

    def ts_features_het(sf_dir):
        # rows-only: GARCH(1,1) heterogeneity quartet (built-in numpy
        # quasi-MLE with variance targeting — iterative optimizer, not
        # SQL-expressible; pytest pins recovery on synthetic GARCH series)
        from pytimetk_ray.ops.ts_features import ts_features as tsf

        ds = tsf(_events(sf_dir), "ts", "value", by=["user_id"],
                 features=["length", "arch_acf", "garch_acf", "arch_r2",
                           "garch_r2"])
        return _nan_to_null(ds, ["arch_acf", "garch_acf", "arch_r2",
                                 "garch_r2"])

    def frequency_summary(sf_dir):
        from pytimetk_ray.ops.frequency import frequency_summary_by

        ds = frequency_summary_by(_events(sf_dir), "ts", by=["user_id"])
        return _round_cols(ds, ["freq_median_scale"])

    def seasonal_diag(sf_dir):
        from pytimetk_ray.ops.diagnostics import seasonal_diagnostics

        ds = seasonal_diagnostics(_events(sf_dir), "ts", "value", by=["user_id"])
        ds = _round_cols(ds, ["value"])
        return ds.select_columns(["user_id", "ts", "value", "feature", "feature_value"])

    def corr_funnel(sf_dir):
        # binarize + distributed pearson; rows-only (driver-side result)
        ev = _events(sf_dir).select_columns(["value", "event_type"])
        b = binarize(ev, n_bins=4)

        def add_target(batch):
            batch["target"] = batch["event_type__purchase"]
            return batch

        b = b.map_batches(add_target, batch_format="pandas")
        out = correlate(b, "target")
        return out

    def corr_funnel_sql(sf_dir):
        # same binning/correlations with SQL-reproducible bin labels
        # (value__b{i} instead of pd.cut interval strings)
        ev = _events(sf_dir).select_columns(["value", "event_type"])
        b = binarize(ev, n_bins=4, numeric_label="index")

        def add_target(batch):
            batch["target"] = batch["event_type__purchase"]
            return batch

        b = b.map_batches(add_target, batch_format="pandas")
        out = correlate(b, "target")
        out["correlation"] = np.round(out["correlation"].to_numpy(np.float64), 6)
        return out

    # --- round-3 additions: PII scrub / tf-idf / conversation analytics -----

    def pii_redact(sf_dir):
        # deterministic PII augmentation (docs carry none) so the redaction
        # has real matches; the SAME construction is inlined in the SQL
        from pytimetk_ray.kernels.text import md5_fingerprint
        from pytimetk_ray.pipelines.scrub import redact_pii

        def aug(batch: pd.DataFrame) -> pd.DataFrame:
            d = batch["doc_id"].to_numpy()
            return batch[["doc_id"]].assign(text=[
                t
                + f" u{x}@ex-{x % 7}.org"
                + f" call 415-555-{x % 10000:04d}" * int(x % 3)
                + f" ip 10.0.{x % 256}.{x % 100}"
                + f" ssn 123-45-{x % 10000:04d}"
                for t, x in zip(batch["text"], d)
            ])

        red = redact_pii(_docs(sf_dir).map_batches(aug, batch_format="pandas"))

        def finish(batch: pd.DataFrame) -> pd.DataFrame:
            texts = batch["text"].tolist()
            return pd.DataFrame({
                "doc_id": batch["doc_id"],
                "n_email": batch["n_email"].astype(np.int64),
                "n_ssn": batch["n_ssn"].astype(np.int64),
                "n_phone": batch["n_phone"].astype(np.int64),
                "n_ipv4": batch["n_ipv4"].astype(np.int64),
                "red_md5": md5_fingerprint(texts),
                "red_len": np.array([len(t) for t in texts], dtype=np.int64),
            })

        return red.map_batches(finish, batch_format="pandas")

    def tfidf_topk_q(sf_dir):
        from pytimetk_ray.pipelines.tfidf import tfidf_topk

        return tfidf_topk(_docs(sf_dir), k=3, num_partitions=16)

    def conv_stats(sf_dir):
        from pytimetk_ray.ops.conv_stats import conversation_stats

        return conversation_stats(_events(sf_dir), ["user_id"], "ts", "value",
                                  session_gap="2 hours")

    def conv_windows(sf_dir):
        from pytimetk_ray.ops.conv_stats import conversation_windows

        return conversation_windows(_events(sf_dir), ["user_id"], "ts",
                                    "value", window=4)

    def doc_hash_sample(sf_dir):
        from pytimetk_ray.pipelines.corpus import hash_sample

        return hash_sample(_docs(sf_dir), rate_ppm=250_000).select_columns(
            ["doc_id", "lang", "n_chars"])

    def quality_quantile_filter(sf_dir):
        from pytimetk_ray.ops.quantiles import filter_by_quantile

        # integer score (n_chars) => the interpolated threshold is exact in
        # double on both engines at any q (ops/quantiles.py parity note)
        kept, _thr = filter_by_quantile(_docs(sf_dir), "n_chars", 0.7)
        return kept.select_columns(["doc_id", "n_chars"])

    def dedup_lines_q(sf_dir):
        from pytimetk_ray.pipelines.linedup import dedup_lines

        return dedup_lines(_docs(sf_dir).select_columns(["doc_id", "text"]),
                           words_per_line=8, min_count=2, keep="first")

    def dedup_spans_q(sf_dir):
        from pytimetk_ray.pipelines.spandup import dedup_spans

        # Lee-et-al-style exact duplicate-substring removal: every 8-word
        # window at every offset; ALL occurrences of duplicated windows go
        return dedup_spans(_docs(sf_dir).select_columns(["doc_id", "text"]),
                           window_words=8, min_count=2)

    def dsir_logweight_q(sf_dir):
        from pytimetk_ray.pipelines.corpus import dsir_logweight

        docs = _docs(sf_dir).select_columns(["doc_id", "text", "lang"])
        target = docs.filter(expr="lang == 'en'").select_columns(
            ["doc_id", "text"])
        return _round_cols(
            dsir_logweight(docs.select_columns(["doc_id", "text"]), target,
                           buckets=256),
            ["logweight"])

    def dsir_resample_q(sf_dir):
        from pytimetk_ray.pipelines.corpus import dsir_resample

        docs = _docs(sf_dir).select_columns(["doc_id", "text", "lang"])
        target = docs.filter(expr="lang == 'en'").select_columns(
            ["doc_id", "text"])
        # key = round6(round6(logweight)/T + md5-derived Gumbel): numpy and
        # DuckDB libm ln differ at the last ulp, so the key is rounded
        # before the cut (round-before-select); rounded ties break by id
        return dsir_resample(docs.select_columns(["doc_id", "text"]), target,
                             k=100, buckets=256)

    def doc_normalize(sf_dir):
        from pytimetk_ray.pipelines.text_analysis import normalize_text

        # the synthetic corpus is already single-spaced ASCII (normalize is
        # the identity on it), so inject deterministic whitespace noise on
        # even doc_ids — the SAME injection runs in the SQL oracle, making
        # the compare exercise collapse/trim for real
        def noisy(batch: pd.DataFrame) -> pd.DataFrame:
            even = (batch["doc_id"].to_numpy() % 2) == 0
            t = batch["text"].tolist()
            batch["text"] = pd.Series(
                ["\t" + s.replace(" ", "  ") + "\n\n" if e else s
                 for s, e in zip(t, even)], dtype=object)
            return batch

        ds = _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
            noisy, batch_format="pandas")
        return normalize_text(ds)

    def interpolate_linear(sf_dir):
        from pytimetk_ray.ops.interpolate import interpolate_by_time

        agg = tk.summarize_by_time(
            _events(sf_dir).select_columns(["user_id", "ts", "value"]),
            "ts", "value", by=["user_id"], freq="h", agg_func="sum")

        def rnd(batch: pd.DataFrame) -> pd.DataFrame:
            # round the observed buckets BEFORE interpolation (the oracle
            # interpolates from identically-rounded inputs)
            batch["value_sum"] = batch["value_sum"].round(6)
            return batch

        out = interpolate_by_time(agg.map_batches(rnd, batch_format="pandas"),
                                  "bucket_ts", "value_sum", freq="h",
                                  by=["user_id"])
        # compare UNROUNDED: the fill expression is bit-equal on both sides
        # (identical expression over identically-rounded inputs), and hour
        # grids make dyadic fracs (1/2, 1/4) whose midpoints end exactly in
        # ...5 at every rounding width — rounding would straddle (NOTES_r1
        # tie taxonomy).  NaN edge gaps -> NULL only.
        return _nan_to_null(out, ["value_sum"])

    def bpe_tokenize(sf_dir):
        from pytimetk_ray.pipelines.tokenizer import bpe_train, bpe_token_counts

        docs = _docs(sf_dir).select_columns(["doc_id", "text"])
        merges = bpe_train(docs, num_merges=60, max_words=5000)
        return bpe_token_counts(docs, merges)

    def summarize_csv_source(sf_dir):
        import tempfile

        from pytimetk_ray.sources.io import read_table, write_table

        # prove the CSV source path end-to-end: parquet -> CSV (string
        # timestamps) -> read_table with ts coercion -> hourly rollup; the
        # oracle is the SAME SQL as a parquet-sourced hourly sum
        out = os.path.join(tempfile.gettempdir(), "pytimetk_ray_csv_src",
                           os.path.basename(os.path.normpath(sf_dir)))
        if not os.path.isdir(out):
            write_table(
                _events(sf_dir).select_columns(["user_id", "ts", "value"]),
                out, format="csv")
        src = read_table(out, format="csv", ts_columns=["ts"])
        agg = tk.summarize_by_time(src, "ts", "value", by=["user_id"],
                                   freq="h", agg_func="sum")
        return _round_cols(agg, ["value_sum"])

    def funnel_stages_q(sf_dir):
        from pytimetk_ray.ops.funnel import funnel_stages

        # earliest-occurrence funnel with a 12h completion window — the
        # window is what makes the stage distribution non-constant on the
        # synthetic events (113/34/3 at sf0.01)
        ev = _events(sf_dir).select_columns(["user_id", "event_type", "ts"])
        return funnel_stages(ev, ["view", "click", "purchase"], within="12h")

    def dedup_editdist(sf_dir):
        from pytimetk_ray.pipelines.dedup import editdist_verify

        docs = _docs(sf_dir).select_columns(["doc_id", "text"])
        pairs = minhash_lsh_pairs(docs, threshold=0.5)
        # norm_dist is a ratio of exact integers — compare unrounded
        return editdist_verify(pairs, docs, max_norm=0.4)

    def docs_cube(sf_dir):
        from pytimetk_ray.ops.grouping import aggregate_grouping_sets, cube_sets

        return aggregate_grouping_sets(
            _docs(sf_dir).select_columns(["lang", "source", "n_chars"]),
            cube_sets(["lang", "source"]), "n_chars")

    def funnel_ttc(sf_dir):
        from pytimetk_ray.ops.funnel import funnel_stages
        from pytimetk_ray.ops.quantiles import column_quantiles

        ev = _events(sf_dir).select_columns(["user_id", "event_type", "ts"])
        st = funnel_stages(ev, ["view", "click", "purchase"], within="12h")
        done = st.filter(expr="stage == 3")

        def ttc(batch: pd.DataFrame) -> pd.DataFrame:
            d = (batch["t_last"].to_numpy().astype("datetime64[us]").astype(np.int64)
                 - batch["t_first"].to_numpy().astype("datetime64[us]").astype(np.int64))
            return pd.DataFrame({"ttc_us": d})

        # dyadic quantiles over integer microseconds are exactly
        # representable, so np.nanquantile == DuckDB quantile_cont bit-for-
        # bit (the lerp-formula difference cancels on exact values)
        q = column_quantiles(done.map_batches(ttc, batch_format="pandas"),
                             ["ttc_us"], [0.25, 0.5, 0.75])
        return pd.DataFrame({"q": q["q"].to_numpy(np.float64),
                             "ttc_us": q["value"].to_numpy(np.float64)})

    def cohort_retention_q(sf_dir):
        from pytimetk_ray.ops.cohort import cohort_retention

        ev = _events(sf_dir).select_columns(["user_id", "ts"])
        return cohort_retention(ev, freq="D")

    def vocab_topk_sketch_q(sf_dir):
        from pytimetk_ray.pipelines.corpus import vocab_topk_sketch

        # exact regime (capacity >> distinct vocabulary): SpaceSaving
        # summaries merge to the exact counts, err == 0 — the oracle is the
        # same SQL as vocab_topk
        return vocab_topk_sketch(
            _docs(sf_dir).select_columns(["doc_id", "text"]),
            top_n=50, capacity=100_000)

    def events_ndistinct(sf_dir):
        from pytimetk_ray.ops.distinct import approx_ndistinct

        # oracled (round 5): the sketch hashes via md5-of-string-repr
        # (md5_number_lower parity) and HLL.estimate sums registers as an
        # exact integer, so DuckDB rebuilds the registers from the same
        # rows and reads off the same estimate.  ROUND 6: the linear-
        # counting branch is ln-based (last-ULP, NOTES_r3); rel_err
        # (1.04/64.0) is a single correctly-rounded division — exact.
        ev = _events(sf_dir).select_columns(["user_id", "event_type"])
        out = approx_ndistinct(ev, "user_id", by=["event_type"])
        return _round_cols(out, ["ndistinct_est"], canon_zero=True)

    def gopher_rules_q(sf_dir):
        from pytimetk_ray.pipelines.text_analysis import gopher_rules

        # min_stop_words=1: the synthetic vocabulary carries one of the 8
        # Gopher required stop words, so at the published 2 the flag would
        # be constant-False; word-count/ratio thresholds still bite
        return gopher_rules(_docs(sf_dir).select_columns(["doc_id", "text"]),
                            min_stop_words=1)

    def m4_downsample_q(sf_dir):
        from pytimetk_ray.ops.downsample import m4_downsample

        ev = rd.read_parquet(os.path.join(sf_dir, _EV),
                             columns=["event_id", "user_id", "ts", "value"])
        # weekly pixel-buckets: ~2.5 events/(user,day) makes hourly buckets
        # trivially full — weeks give a real 4-points-per-bucket reduction
        return m4_downsample(ev, ["user_id"], "ts", "value", freq="1W",
                             tie_breaker="event_id")

    def lttb_downsample_q(sf_dir):
        from pytimetk_ray.ops.downsample import lttb_downsample

        ev = rd.read_parquet(os.path.join(sf_dir, _EV),
                             columns=["event_id", "user_id", "ts", "value"])

        # exact-parity input surface: y = floor(value) — integer-valued
        # doubles sum exactly in any order, so bucket centroids (and thus
        # every triangle area) are bit-identical across engines.  The op
        # itself runs on raw doubles; this query quantizes ONLY so the SQL
        # oracle's float summation order cannot flip an argmax.
        def quantize(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch[["event_id", "user_id", "ts"]].copy()
            out["value_f"] = np.floor(batch["value"].to_numpy())
            return out

        return lttb_downsample(ev.map_batches(quantize, batch_format="pandas"),
                               ["user_id"], "ts", "value_f", n_out=20)

    def quantile_sketch_q(sf_dir):
        # mergeable KLL sketch (kernels/sketch.py): bounded-memory quantiles
        # for continuous columns — rows-only by nature (eps-rank approximate;
        # the exact-histogram twin `quality_quantile_filter` is the oracled
        # path, the envelope is pinned by tests/test_sketch.py)
        import ray.data as rd
        from pytimetk_ray.ops.quantiles import column_quantiles_sketch

        ev = rd.read_parquet(os.path.join(sf_dir, _EV), columns=["value"])
        return column_quantiles_sketch(ev, ["value"],
                                       [0.1, 0.25, 0.5, 0.75, 0.9], k=200)

    def sample_stratified_q(sf_dir):
        import ray.data as rd
        from pytimetk_ray.pipelines.corpus import sample_stratified

        ev = rd.read_parquet(os.path.join(sf_dir, _EV),
                             columns=["event_id", "event_type", "value"])
        return sample_stratified(ev, group_column="event_type",
                                 id_column="event_id", frac_ppm=200_000)

    # --- joins (broadcast / co-partitioned hash / as-of) ---------------------

    def join_broadcast(sf_dir):
        from pytimetk_ray.ops.joins import broadcast_join

        cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                               columns=["c_custkey", "c_name", "c_acctbal"])
        orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                 columns=["o_orderkey", "o_custkey",
                                          "o_totalprice"])
        return broadcast_join(orders, cust, left_on="o_custkey",
                              right_on="c_custkey")

    def join_hash(sf_dir):
        from pytimetk_ray.ops.joins import hash_join

        li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                             columns=["l_orderkey", "l_linenumber",
                                      "l_quantity"])
        orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                 columns=["o_orderkey", "o_orderdate"])
        return hash_join(li, orders, left_on="l_orderkey",
                         right_on="o_orderkey", num_partitions=16)

    def join_asof(sf_dir):
        from pytimetk_ray.ops.joins import asof_join

        ev = _events(sf_dir).select_columns(
            ["event_id", "user_id", "ts", "value"])

        def snap_filter(batch: pd.DataFrame) -> pd.DataFrame:
            keep = batch[batch["event_id"] % 10 == 0]
            return keep[["user_id", "ts", "value"]]

        snap = _events(sf_dir).map_batches(snap_filter, batch_format="pandas")
        return asof_join(ev, snap, by="user_id", on="ts")

    # Round-5 driver window (first 50, reordered at the bottom of this
    # function): slots 1-7 = this round's new/changed code (tier_compact_1h
    # + doc_sample_mixture were oracled-but-never-driver-checked; KR/CN/ZA
    # holidays and the events_ndistinct HLL oracle are new; dedup_minhash /
    # dedup_editdist oracles gained the bucket-cap mirror; tier_ingest_1h
    # now auto-compacts); 8-17 = the ten never-windowed rows-only-by-nature
    # queries so cumulative driver coverage reaches 146/146; 18-50 = the
    # longest-parked greens (last driver-verified in round 2).  augment_leads
    # / augment_diffs stay out (trivial variants of in-window augment_lags);
    # everything else stays regression-guarded by scripts/check_oracle.
    _WINDOW_R5 = [
        "tier_compact_1h", "doc_sample_mixture", "holiday_signature_kr_cn_za",
        "events_ndistinct", "dedup_minhash", "dedup_editdist",
        "tier_ingest_1h",
        "multimodal_pipeline", "fin_regime", "diag_acf", "diag_stl",
        "hilbert", "corr_funnel", "spline", "wavelet", "ts_features_full",
        "ts_features_het",
        "augment_lags", "augment_rolling", "augment_expanding",
        "augment_ewm", "pad_by_time_daily", "pad_by_time_monthly",
        "ts_summary", "future_frame", "signature", "apply_by_time_range",
        "anomalize_sql", "anomalize_stl", "fourier", "tier_rollup_1h",
        "tier_query_1h", "tpch_q1", "dedup_exact", "doc_token_count",
        "doc_fingerprint", "vocab_topk", "doc_hash_split",
        "docs_topk_per_lang", "pack_sequences", "doc_unigram_logprob",
        "prep_composite", "decontaminate", "doc_repetition", "doc_quality",
        "doc_langid", "dedup_jaccard", "dedup_jaccard_dfcut",
        "dedup_clusters", "dedup_simhash",
    ]
    _all = {
        "fin_roc_drawdown": fin_roc_drawdown,
        "fin_bbands": fin_bbands,
        "fin_rsi": fin_rsi,
        "fin_macd": fin_macd,
        "fin_cmo": fin_cmo,
        "fin_atr": fin_atr,
        "fin_stochastic": fin_stochastic,
        "fin_ppo": fin_ppo,
        "fin_ewma_vol": fin_ewma_vol,
        "fin_fip": fin_fip,
        "fin_qsmomentum": fin_qsmomentum,
        "fin_risk": fin_risk,
        "fin_hurst": fin_hurst,
        "fin_adx": fin_adx,
        "holiday_signature": holiday_signature,
        "spline_sql": spline_sql,
        "hilbert_sql": hilbert_sql,
        "wavelet_sql": wavelet_sql,
        "cv_folds": cv_folds,
        "diag_acf_sql": diag_acf_sql,
        "diag_stl_sql": diag_stl_sql,
        "diag_stl_loess": diag_stl_loess,
        "corr_funnel_sql": corr_funnel_sql,
        "sessions": sessions,
        "ts_features": ts_features_q,
        "ts_features_ext": ts_features_ext,
        "seasonal_diag": seasonal_diag,
        "frequency_summary": frequency_summary,
        "floor_ceil_dates": floor_ceil_dates,
        "filter_by_time_month": filter_by_time_month,
        "future_frame_bind": future_frame_bind,
        "rolling_apply": rolling_apply,
        "gopher_rules": gopher_rules_q,
        "m4_downsample": m4_downsample_q,
        "lttb_downsample": lttb_downsample_q,
        "dedup_lines": dedup_lines_q,
        "sample_stratified": sample_stratified_q,
        "decontaminate_bloom": decontaminate_bloom,
        "tier_ingest_salted_1h": tier_ingest_salted_1h,
        "join_broadcast": join_broadcast,
        "join_hash": join_hash,
        "join_asof": join_asof,
        "kmeans_embed": kmeans_embed_q,
        "semdedup": semdedup_q,
        "doc_bigram_logprob": doc_bigram_logprob,
        "pq_topk": pq_topk_q,
        "dedup_spans": dedup_spans_q,
        "dsir_logweight": dsir_logweight_q,
        "doc_normalize": doc_normalize,
        "interpolate_linear": interpolate_linear,
        # --- end of the 50-slot driver window ---
        "fin_risk_bench": fin_risk_bench,
        "fin_risk_log": fin_risk_log,
        "holiday_signature_multi": holiday_signature_multi,
        "holiday_signature_4ctry": holiday_signature_4ctry,
        "holiday_signature_kr_cn_za": holiday_signature_kr_cn_za,
        "cv_folds_backward": cv_folds_backward,
        "bpe_tokenize": bpe_tokenize,
        "dsir_resample": dsir_resample_q,
        "summarize_csv_source": summarize_csv_source,
        "funnel_stages": funnel_stages_q,
        "dedup_editdist": dedup_editdist,
        "docs_cube": docs_cube,
        "funnel_ttc": funnel_ttc,
        "cohort_retention": cohort_retention_q,
        "vocab_topk_sketch": vocab_topk_sketch_q,
        "events_ndistinct": events_ndistinct,
        "tfidf_topk": tfidf_topk_q,
        "pii_redact": pii_redact,
        "conv_stats": conv_stats,
        "conv_windows": conv_windows,
        # --- driver-verified green in r01/r02 (or rows-only by nature),
        # --- plus trivial driver-side sequence generators ---
        "doc_hash_sample": doc_hash_sample,
        "quality_quantile_filter": quality_quantile_filter,
        "week_of_month": week_of_month,
        "drop_zero_variance": drop_zero_variance_q,
        "expanding_apply": expanding_apply,
        "quantile_sketch": quantile_sketch_q,
        "doc_stop_ratio": doc_stop_ratio,
        "weekday_sequence": weekday_sequence,
        "weekend_sequence": weekend_sequence,
        "augment_pct_change": augment_pct_change,
        "embedding_neardup_lsh": embedding_neardup_lsh,
        "tier_ingest_1h": tier_ingest_1h,
        "embedding_neardup": embedding_neardup,
        "ann_ivf_full": ann_ivf_full,
        "tier_expire_1h": tier_expire_1h,
        "ann_topk": ann_topk,
        "summarize_by_time_hour": summarize_by_time_hour,
        "summarize_by_time_day_type": summarize_by_time_day_type,
        "summarize_by_time_month": summarize_by_time_month,
        "filter_by_time": filter_by_time,
        "summarize_wide": summarize_wide,
        "reduce_memory": reduce_memory,
        "augment_lags": augment_lags,
        "augment_leads": augment_leads,
        "augment_diffs": augment_diffs,
        "augment_rolling": augment_rolling,
        "rolling_quantile": rolling_quantile,
        "augment_expanding": augment_expanding,
        "augment_ewm": augment_ewm,
        "pad_by_time_daily": pad_by_time_daily,
        "pad_by_time_monthly": pad_by_time_monthly,
        "ts_summary": ts_summary,
        "future_frame": future_frame,
        "signature": signature,
        "apply_by_time_range": apply_by_time_range,
        "anomalize": anomalize,
        "anomalize_sql": anomalize_sql,
        "anomalize_stl": anomalize_stl,
        "fourier": fourier,
        "tier_rollup_1h": tier_rollup_1h,
        "tier_query_1h": tier_query_1h,
        "tier_compact_1h": tier_compact_1h,
        "tpch_q1": tpch_q1,
        "dedup_exact": dedup_exact,
        "doc_token_count": doc_token_count,
        "doc_fingerprint": doc_fingerprint,
        "vocab_topk": vocab_topk,
        "doc_hash_split": doc_hash_split,
        "docs_topk_per_lang": docs_topk_per_lang,
        "pack_sequences": pack_sequences,
        "doc_unigram_logprob": doc_unigram_logprob,
        "prep_composite": prep_composite,
        "decontaminate": decontaminate,
        "doc_repetition": doc_repetition,
        "doc_quality": doc_quality,
        "doc_langid": doc_langid,
        "dedup_jaccard": dedup_jaccard,
        "dedup_jaccard_dfcut": dedup_jaccard_dfcut,
        "dedup_clusters": dedup_clusters,
        "dedup_cluster_reps": dedup_cluster_reps,
        "doc_ccnet_buckets": doc_ccnet_buckets,
        "doc_sample_mixture": doc_sample_mixture,
        "dedup_minhash": dedup_minhash,
        "dedup_simhash": dedup_simhash,
        "ann_ivf_topk": ann_ivf_topk,
        "multimodal_decode": multimodal_decode,
        "multimodal_pipeline": multimodal_pipeline,
        "fin_regime": fin_regime,
        "diag_acf": diag_acf,
        "diag_stl": diag_stl,
        "hilbert": hilbert,
        "corr_funnel": corr_funnel,
        "spline": spline,
        "wavelet": wavelet,
        "ts_features_full": ts_features_full,
        "ts_features_het": ts_features_het,
    }
    assert len(_WINDOW_R5) == 50 and all(k in _all for k in _WINDOW_R5)
    return {**{k: _all[k] for k in _WINDOW_R5},
            **{k: v for k, v in _all.items() if k not in set(_WINDOW_R5)}}


# --- oracle SQL -------------------------------------------------------------

def _loess_ctes(tag: str, pts: str, ev: str, part: list[str], q: int) -> str:
    """Emit the CTE chain for a degree-1 loess pass in SQL, mirroring
    kernels/stl.loess term-for-term: contiguous window of the qe nearest
    integer positions, tricube weights with the q>n lambda widening, and the
    closed-form weighted regression (same slope guard).  ``pts`` must expose
    (part..., pos, val, m); ``ev`` (part..., t, m).  Produces CTE ``{tag}``
    with (part..., t, fit)."""
    pj = ", ".join(part)
    on = " AND ".join(f"b.{c} = e.{c}" for c in part)
    ep = ", ".join(f"e.{c}" for c in part)
    return f"""
        {tag}_e AS (
            SELECT *, GREATEST(
                       GREATEST(t - ws, ws + qe - 1 - t)
                       + CASE WHEN {q} > m THEN ({q} - m) / 2.0 ELSE 0 END,
                       1e-12) AS lam
            FROM (SELECT *, GREATEST(0, LEAST(m - qe, t - (qe - 1) // 2)) AS ws
                  FROM (SELECT {pj}, t, m, LEAST({q}, m) AS qe FROM {ev}))
        ),
        {tag}_w AS (
            SELECT {ep}, e.t, CAST(b.pos AS DOUBLE) AS x, b.val AS y,
                   POWER(GREATEST(1 - POWER(ABS(b.pos - e.t) / e.lam, 3), 0), 3) AS w
            FROM {tag}_e e JOIN {pts} b
              ON {on} AND b.pos BETWEEN e.ws AND e.ws + e.qe - 1
        ),
        {tag}_s AS (
            SELECT {pj}, t, SUM(w) AS s0, SUM(w * x) AS s1, SUM(w * x * x) AS s2,
                   SUM(w * y) AS sy, SUM(w * x * y) AS sxy
            FROM {tag}_w GROUP BY ALL
        ),
        {tag} AS (
            SELECT {pj}, t, (sy - slope * s1) / s0 + slope * t AS fit
            FROM (SELECT *, CASE WHEN ABS(s0 * s2 - s1 * s1)
                                      > 1e-12 * GREATEST(s0 * s2, 1.0)
                                 THEN (s0 * sxy - s1 * sy) / (s0 * s2 - s1 * s1)
                                 ELSE 0 END AS slope
                  FROM {tag}_s)
        )"""


def _stl_chain_sql(period: int = 7, ns: int = 7, nt: int = 15, nl: int = 7) -> str:
    """CTE chain (after WITH) for ONE inner pass of non-robust degree-1 STL
    over the per-user daily sums of ``events`` (Cleveland 1990; mirrors
    kernels/stl.stl_decompose with inner=1, outer=0).  Steps: cycle-subseries
    loess (span ns) evaluated at -1..m (end extension), low-pass = MA(p) x2 +
    MA(3) + loess (span nl), seasonal = C - L, trend = loess of the
    deseasonalized series (span nt).  Ends with CTE ``stlout``:
    (user_id, bucket_ts, observed, seasonal, seasadj, trend, remainder),
    unrounded."""
    p = period
    return f"""agg AS (
            SELECT user_id, date_trunc('day', ts) AS bucket_ts,
                   CAST(SUM(value) AS DOUBLE) AS y
            FROM events GROUP BY 1, 2
        ),
        base AS (
            SELECT user_id, bucket_ts, y,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY bucket_ts) - 1 AS i,
                   COUNT(*) OVER (PARTITION BY user_id) AS n
            FROM agg
        ),
        sub AS (  -- cycle subseries: pos j within phase, detrended = y (T0=0)
            SELECT user_id, i % {p} AS ph, i // {p} AS pos, y AS val,
                   COUNT(*) OVER (PARTITION BY user_id, i % {p}) AS m
            FROM base
        ),
        gs AS (SELECT UNNEST(generate_series(-1,
                   (SELECT MAX(m) FROM sub))) AS t),
        subev AS (  -- loess evaluated one step beyond each subseries end
            SELECT d.user_id, d.ph, gs.t, d.m
            FROM (SELECT DISTINCT user_id, ph, m FROM sub) d
            JOIN gs ON gs.t <= d.m
        ),
        {_loess_ctes("cs", "sub", "subev", ["user_id", "ph"], ns)},
        c AS (  -- C on slots 0..n+2p-1; slot = ph + (j+1)*p; time i = slot-p
            SELECT user_id, ph + (t + 1) * {p} AS slot, fit AS cv FROM cs
        ),
        ma1 AS (
            SELECT user_id, slot AS k,
                   AVG(cv) OVER w AS v, COUNT(*) OVER w AS cnt
            FROM c WINDOW w AS (PARTITION BY user_id ORDER BY slot
                                ROWS BETWEEN CURRENT ROW AND {p - 1} FOLLOWING)
        ),
        ma1f AS (SELECT user_id, k, v FROM ma1 WHERE cnt = {p}),
        ma2 AS (
            SELECT user_id, k, AVG(v) OVER w AS v, COUNT(*) OVER w AS cnt
            FROM ma1f WINDOW w AS (PARTITION BY user_id ORDER BY k
                                   ROWS BETWEEN CURRENT ROW AND {p - 1} FOLLOWING)
        ),
        ma2f AS (SELECT user_id, k, v FROM ma2 WHERE cnt = {p}),
        ma3 AS (
            SELECT user_id, k, AVG(v) OVER w AS v, COUNT(*) OVER w AS cnt
            FROM ma2f WINDOW w AS (PARTITION BY user_id ORDER BY k
                                   ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING)
        ),
        lppts AS (  -- low-pass input: n values at positions 0..n-1 (= time i)
            SELECT user_id, k AS pos, v AS val,
                   COUNT(*) OVER (PARTITION BY user_id) AS m
            FROM ma3 WHERE cnt = 3
        ),
        lpev AS (SELECT user_id, pos AS t, m FROM lppts),
        {_loess_ctes("lp", "lppts", "lpev", ["user_id"], nl)},
        seasonal AS (  -- S[i] = C[slot i+p] - L[i]
            SELECT b.user_id, b.i, b.bucket_ts, b.y, c.cv - lp.fit AS s
            FROM base b
            JOIN c  ON c.user_id = b.user_id AND c.slot = b.i + {p}
            JOIN lp ON lp.user_id = b.user_id AND lp.t = b.i
        ),
        deseas AS (
            SELECT user_id, i AS pos, y - s AS val, bucket_ts, y, s,
                   COUNT(*) OVER (PARTITION BY user_id) AS m
            FROM seasonal
        ),
        trev AS (SELECT user_id, pos AS t, m FROM deseas),
        {_loess_ctes("tr", "deseas", "trev", ["user_id"], nt)},
        stlout AS (
            SELECT d.user_id, d.bucket_ts,
                   d.y                 AS observed,
                   d.s                 AS seasonal,
                   d.y - d.s           AS seasadj,
                   tr.fit              AS trend,
                   d.y - d.s - tr.fit  AS remainder
            FROM deseas d JOIN tr ON tr.user_id = d.user_id AND tr.t = d.pos
        )"""


def _bspline_sql(knots, lo, hi, degree=3, df=5, digits=6) -> str:
    """DuckDB oracle for augment_spline with EXPLICIT interior knots: expand
    the Cox-de Boor recursion (ops/spline.bspline_basis) symbolically into a
    CTE chain, mirroring the numpy term order (left term, then + right term)
    and the right-closed last nonzero interval."""
    t = [float(lo)] * (degree + 1) + [float(k) for k in knots] + [float(hi)] * (degree + 1)
    nz = [j for j in range(len(t) - 1) if t[j + 1] > t[j]]
    last_nz = nz[-1]
    x = f"LEAST(GREATEST(CAST(value AS DOUBLE), {lo!r}), {hi!r})"
    # level 0: indicators; track identically-zero columns to shrink the SQL
    cols = {}
    zero = set()
    b0 = []
    for j in range(len(t) - 1):
        if t[j + 1] <= t[j]:
            zero.add((0, j))
            continue
        hi_op = "<=" if j == last_nz else "<"
        b0.append(f"CASE WHEN x >= {t[j]!r} AND x {hi_op} {t[j + 1]!r} "
                  f"THEN 1.0 ELSE 0.0 END AS b0_{j}")
        cols[(0, j)] = f"b0_{j}"
    ctes = [f"b0 AS (SELECT event_id, {x} AS x FROM events)",
            f"l0 AS (SELECT event_id, x, {', '.join(b0)} FROM b0)"]
    prev = "l0"
    for d in range(1, degree + 1):
        exprs = []
        nb = len(t) - d - 1
        for j in range(nb):
            terms = []
            left_den = t[j + d] - t[j]
            right_den = t[j + d + 1] - t[j + 1]
            if left_den > 0 and (d - 1, j) not in zero:
                terms.append(f"(x - {t[j]!r}) / {left_den!r} * {cols[(d - 1, j)]}")
            if right_den > 0 and (d - 1, j + 1) not in zero:
                terms.append(f"({t[j + d + 1]!r} - x) / {right_den!r} * "
                             f"{cols[(d - 1, j + 1)]}")
            if not terms:
                zero.add((d, j))
                continue
            exprs.append(f"{' + '.join(terms)} AS b{d}_{j}")
            cols[(d, j)] = f"b{d}_{j}"
        ctes.append(f"l{d} AS (SELECT event_id, x, {', '.join(exprs)} FROM {prev})")
        prev = f"l{d}"
    outs = []
    for i in range(df):
        c = cols.get((degree, i))
        # `+ 0`: fold -0.0 -> +0.0 (basis terms outside support multiply a
        # negative ratio into 0.0); the numpy kernel emits +0.0 there
        outs.append(f"ROUND({c if c else '0.0'}, {digits}) + 0 "
                    f"AS value_spline_{i + 1}")
    return f"WITH {', '.join(ctes)} SELECT event_id, {', '.join(outs)} FROM {prev}"


def _hilbert_sql(digits: int = 4) -> str:
    """DuckDB oracle for the analytic signal by the O(n^2) DFT definition:
    F_k = sum_s x_s e^{-2pi i ks/n}; a_t = (1/n) sum_k h_k F_k e^{2pi i kt/n}
    with the scipy.signal.hilbert h multiplier (1 at DC/Nyquist, 2 on
    positive frequencies, 0 on negative)."""
    return f"""
        WITH ix AS (
            SELECT event_id, user_id, CAST(value AS DOUBLE) AS x,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS i,
                   COUNT(*) OVER (PARTITION BY user_id) AS n
            FROM events
        ),
        ks AS (SELECT UNNEST(generate_series(0,
                   (SELECT MAX(n) FROM ix) - 1)) AS k),
        F AS (
            SELECT a.user_id, ks.k, MAX(a.n) AS n,
                   SUM(a.x * COS(2 * PI() * ks.k * a.i / a.n)) AS fr,
                   SUM(-a.x * SIN(2 * PI() * ks.k * a.i / a.n)) AS fi
            FROM ks, ix a WHERE ks.k < a.n
            GROUP BY 1, 2
        ),
        H AS (
            SELECT user_id, k, n, fr, fi,
                   CASE WHEN k = 0 THEN 1.0
                        WHEN n % 2 = 0 AND k = n // 2 THEN 1.0
                        WHEN n % 2 = 0 AND k < n // 2 THEN 2.0
                        WHEN n % 2 = 1 AND k <= (n - 1) // 2 THEN 2.0
                        ELSE 0.0 END AS h
            FROM F
        )
        SELECT e.event_id, e.user_id,
               ROUND(SUM(H.h * (H.fr * COS(2 * PI() * H.k * e.i / e.n)
                                - H.fi * SIN(2 * PI() * H.k * e.i / e.n)))
                     / MAX(e.n), {digits}) + 0 AS value_hilbert_real,
               ROUND(SUM(H.h * (H.fr * SIN(2 * PI() * H.k * e.i / e.n)
                                + H.fi * COS(2 * PI() * H.k * e.i / e.n)))
                     / MAX(e.n), {digits}) + 0 AS value_hilbert_imag
        FROM ix e JOIN H ON H.user_id = e.user_id
        GROUP BY e.event_id, e.user_id
    """


def _wavelet_sql(scales=(2, 4), w0: float = 5.0, digits: int = 6) -> str:
    """DuckDB oracle for the Morlet CWT magnitude at fixed scales: the
    complex kernel values (ops/signal._morlet) are emitted as literal
    constants and the zero-padded 'same' convolution becomes an offset
    join: out_t = |sum_m w[m] * x[t + (width-1)//2 - m]|."""
    import numpy as np

    parts = []
    for s in scales:
        width = int(10 * s)
        t = np.arange(-(width // 2), width - width // 2) / s
        wave = (np.exp(1j * w0 * t) * np.exp(-(t**2) / 2)) / np.sqrt(s)
        rows = ", ".join(f"({m}, {wave.real[m]!r}, {wave.imag[m]!r})"
                         for m in range(width))
        c = (width - 1) // 2
        parts.append(f"""
        k{s}(m, wr, wi) AS (VALUES {rows}),
        o{s} AS (
            SELECT e.event_id,
                   SQRT(POWER(SUM(k.wr * b.x), 2)
                        + POWER(SUM(k.wi * b.x), 2)) AS mag
            FROM ix e
            JOIN k{s} k ON TRUE
            JOIN ix b ON b.user_id = e.user_id AND b.i = e.i + {c} - k.m
            GROUP BY e.event_id
        )""")
    sel = ", ".join(
        f"ROUND(o{s}.mag, {digits}) AS value_wavelet_morlet_scale_{s}"
        for s in scales)
    joins = " ".join(f"JOIN o{s} ON o{s}.event_id = ix.event_id"
                     for s in scales)
    return f"""
        WITH ix AS (
            SELECT event_id, user_id, CAST(value AS DOUBLE) AS x,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS i
            FROM events
        ),
        {','.join(parts)}
        SELECT ix.event_id, ix.user_id, {sel}
        FROM ix {joins}
    """


def _np_quantile_cte(tag: str, src: str, xcol: str, q: float) -> str:
    """Per-user np.percentile (lerp that switches formula at frac >= 0.5,
    matching numpy's evaluation order) of ``src.{xcol}`` -> CTE ``{tag}``
    with (user_id, val)."""
    return f"""
        {tag} AS (
            SELECT user_id,
                   CASE WHEN frac < 0.5 THEN lo_v + (hi_v - lo_v) * frac
                        ELSE hi_v - (hi_v - lo_v) * (1 - frac) END AS val
            FROM (
                SELECT user_id,
                       MAX(CASE WHEN r2 = flo + 1 THEN x END) AS lo_v,
                       MAX(CASE WHEN r2 = fhi + 1 THEN x END) AS hi_v,
                       ANY_VALUE(frac) AS frac
                FROM (
                    SELECT user_id, {xcol} AS x,
                           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY {xcol}) AS r2,
                           CAST(FLOOR((COUNT(*) OVER (PARTITION BY user_id) - 1) * {q}) AS BIGINT) AS flo,
                           LEAST(CAST(FLOOR((COUNT(*) OVER (PARTITION BY user_id) - 1) * {q}) AS BIGINT) + 1,
                                 COUNT(*) OVER (PARTITION BY user_id) - 1) AS fhi,
                           (COUNT(*) OVER (PARTITION BY user_id) - 1) * {q}
                             - FLOOR((COUNT(*) OVER (PARTITION BY user_id) - 1) * {q}) AS frac
                    FROM {src}
                ) GROUP BY user_id
            )
        )"""


def _stl_loess_sql(digits: int = 4) -> str:
    return f"""
        WITH {_stl_chain_sql()}
        SELECT user_id, bucket_ts,
               ROUND(observed, {digits})  AS observed,
               ROUND(seasonal, {digits})  AS seasonal,
               ROUND(seasadj, {digits})   AS seasadj,
               ROUND(trend, {digits})     AS trend,
               ROUND(remainder, {digits}) AS remainder
        FROM stlout
    """


def _anomalize_stl_sql(digits: int = 4, k: float = 0.15 / 0.05,
                       clean_alpha: float = 0.75) -> str:
    """STL decomposition chain + the reference's verbatim IQR limit formulas
    (anomalize.py:733-784) + min_max clean, all per user."""
    return f"""
        WITH {_stl_chain_sql()},
        {_np_quantile_cte("q1t", "stlout", "remainder", 0.25)},
        {_np_quantile_cte("q3t", "stlout", "remainder", 0.75)},
        lim AS (
            SELECT q1t.user_id,
                   -1 * (q1t.val + {k} * (q3t.val - q1t.val)) AS l1,
                   q3t.val + {k} * (q3t.val - q1t.val) AS l2
            FROM q1t JOIN q3t ON q3t.user_id = q1t.user_id
        )
        SELECT r.user_id, r.bucket_ts,
               ROUND(r.observed, {digits})  AS observed,
               ROUND(r.seasonal, {digits})  AS seasonal,
               ROUND(r.seasadj, {digits})   AS seasadj,
               ROUND(r.trend, {digits})     AS trend,
               ROUND(r.remainder, {digits}) AS remainder,
               CASE WHEN r.remainder > l.l2 OR r.remainder < l.l1
                    THEN 'Yes' ELSE 'No' END AS anomaly,
               ROUND(ABS(r.remainder - (l.l1 + l.l2) / 2), {digits}) AS anomaly_score,
               CASE WHEN r.remainder > l.l2 THEN 1
                    WHEN r.remainder < l.l1 THEN -1 ELSE 0 END AS anomaly_direction,
               ROUND(r.seasonal + r.trend + l.l1, {digits}) AS recomposed_l1,
               ROUND(r.seasonal + r.trend + l.l2, {digits}) AS recomposed_l2,
               ROUND(CASE
                   WHEN r.remainder < l.l1 THEN
                        (r.seasonal + r.trend + l.l1)
                        + (1 - {clean_alpha}) * (l.l2 - l.l1) / 2
                   WHEN r.remainder > l.l2 THEN
                        (r.seasonal + r.trend + l.l2)
                        - (1 - {clean_alpha}) * (l.l2 - l.l1) / 2
                   ELSE r.observed END, {digits}) AS observed_clean
        FROM stlout r JOIN lim l ON l.user_id = r.user_id
    """


def oracle_sql() -> dict[str, str]:
    # Inlined constants for the sketch-dedup / LSH oracles: the MinHash
    # permutation params (minhash_params(64, 1)) and the 4x64 LSH hyperplanes
    # (default_rng(5).normal) are deterministic; embedding them as SQL
    # literals makes the full sketch pipelines DuckDB-reproducible
    # (md5_number_lower == kernels.text.md5_u64; HUGEINT (a*x+b) % (2^61-1)
    # == minhash_signature_exact's Mersenne modmul).
    from pytimetk_ray.kernels.text import minhash_params as _mp

    _a, _b = _mp(64, 1)
    _perm_vals = ",".join(f"({i},{int(_a[i])},{int(_b[i])})" for i in range(64))
    # 4 hyperplanes split into 2 bands of 2 bits (pipeline: nbits=2, bands=2
    # over default_rng(5).normal((4, 64)) — band b uses planes[2b:2b+2]).
    # NOTE: the pipeline normalizes vectors before the sign test; normalizing
    # doesn't change the sign of a dot product, so raw `e` works here.
    _planes = np.random.default_rng(5).normal(size=(4, 64))

    def _band_expr(b):
        return " + ".join(
            "{m}*(CASE WHEN list_dot_product(e, [{p}]) > 0 THEN 1 ELSE 0 END)".format(
                m=1 << i, p=",".join(repr(float(x)) for x in _planes[2 * b + i]))
            for i in range(2)
        )

    _lsh_b0, _lsh_b1 = _band_expr(0), _band_expr(1)
    sql = {
        # PII scrub: same RE2 patterns as pipelines/scrub.DEFAULT_PII_PATTERNS
        # (Arrow and DuckDB both run RE2, so pattern strings are shared
        # verbatim); counts on the original text, replacements in list order
        "pii_redact": r"""
            WITH aug AS (
                SELECT doc_id,
                       text || ' u' || CAST(doc_id AS VARCHAR) || '@ex-'
                            || CAST(doc_id % 7 AS VARCHAR) || '.org'
                            || repeat(' call 415-555-'
                                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                                      CAST(doc_id % 3 AS INTEGER))
                            || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
                            || CAST(doc_id % 100 AS VARCHAR)
                            || ' ssn 123-45-'
                            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
                FROM documents
            ), red AS (
                SELECT doc_id, t,
                       regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
                           '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                           '\b\d{3}-\d{2}-\d{4}\b', '<ID>', 'g'),
                           '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
                           '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS r
                FROM aug
            )
            SELECT doc_id,
                   CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
                   CAST(len(regexp_extract_all(t, '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ssn,
                   CAST(len(regexp_extract_all(t, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT) AS n_phone,
                   CAST(len(regexp_extract_all(t, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ipv4,
                   md5(r) AS red_md5,
                   CAST(length(r) AS BIGINT) AS red_len
            FROM red
        """,

        # tf-idf: same token regex as vocab_topk; score = tf * ln(N/df),
        # rounded 6 BEFORE ranking on both sides (round-before-select)
        "tfidf_topk": r"""
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[\w'']+')) AS token
                FROM documents
            ), tf AS (
                SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
            ), df AS (
                SELECT token, COUNT(*) AS df
                FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY token
            ), n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents)
            SELECT doc_id, rank, token, tfidf FROM (
                SELECT tf.doc_id, tf.token,
                       ROUND(tf.tf * LN(n.n / df.df), 6) AS tfidf,
                       ROW_NUMBER() OVER (
                           PARTITION BY tf.doc_id
                           ORDER BY ROUND(tf.tf * LN(n.n / df.df), 6) DESC,
                                    tf.token) AS rank
                FROM tf JOIN df USING (token) CROSS JOIN n
            ) WHERE rank <= 3
        """,

        # conversation stats: gap math in exact int64 microseconds; sums
        # rounded 6; no means (dyadic-divisor ties — NOTES_r1)
        "conv_stats": """
            WITH d AS (
                SELECT user_id, ts, value,
                       epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts) AS gap_us
                FROM events
            )
            SELECT user_id,
                   COUNT(*) AS n_turns,
                   MIN(ts) AS t_min,
                   MAX(ts) AS t_max,
                   epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
                   CAST(COALESCE(MAX(gap_us), 0) AS BIGINT) AS max_gap_us,
                   CAST(COALESCE(SUM(CASE WHEN gap_us > 7200000000 THEN 1 ELSE 0 END), 0) + 1 AS BIGINT) AS n_sessions,
                   ROUND(SUM(value), 6) AS value_sum
            FROM d GROUP BY user_id
        """,

        # joins: broadcast (dimension), co-partitioned hash (big-big), as-of
        # (point-in-time; DuckDB's native ASOF JOIN is the oracle)
        "join_broadcast": """
            SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_acctbal
            FROM orders JOIN customer ON o_custkey = c_custkey
        """,
        "join_hash": """
            SELECT l_orderkey, l_linenumber, l_quantity, o_orderdate
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        """,
        "join_asof": """
            WITH snap AS (
                SELECT user_id, ts, value FROM events WHERE event_id % 10 = 0
            )
            SELECT e.event_id, e.user_id, e.ts, e.value,
                   s.ts AS ts_r, s.value AS value_r
            FROM events e ASOF LEFT JOIN snap s
                 ON e.user_id = s.user_id AND e.ts >= s.ts
        """,

        # Gopher quality rules (Rae et al. 2021 App. A): every signal is a
        # count/ratio of identically-computed integers — compared UNROUNDED;
        # tokens are the shared \S+ surface, '...' counted non-overlapping
        # (replace-based == str.count), alpha = the same '[A-Za-z]' regex
        "gopher_rules": r"""
            WITH t AS (
                SELECT doc_id, text, regexp_extract_all(text, '\S+') AS ws,
                       string_split(text, chr(10)) AS lines
                FROM documents),
            m AS (
                SELECT doc_id,
                       len(ws) AS n_words,
                       coalesce(list_aggregate(
                           list_transform(ws, w -> length(w)), 'sum'), 0)
                           AS sum_wlen,
                       len(list_filter(ws,
                           w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha,
                       (length(text) - length(replace(text, '#', '')))
                         + (length(text) - length(replace(text, '...', '')))
                           // 3 AS n_sym,
                       len(lines) AS n_lines,
                       len(list_filter(lines, l -> l LIKE '-%'
                           OR l LIKE '*%' OR l LIKE '•%')) AS n_bullet,
                       len(list_filter(lines, l -> l LIKE '%...')) AS n_ellip,
                       len(list_filter(
                           ['the','be','to','of','and','that','have','with'],
                           s -> list_contains(
                               list_transform(ws, w -> lower(w)), s)))
                           AS n_stop
                FROM t)
            SELECT doc_id, n_words,
                   CAST(sum_wlen AS DOUBLE) / greatest(n_words, 1) AS mean_word_len,
                   CAST(n_sym AS DOUBLE) / greatest(n_words, 1) AS symbol_ratio,
                   CAST(n_bullet AS DOUBLE) / greatest(n_lines, 1) AS bullet_ratio,
                   CAST(n_ellip AS DOUBLE) / greatest(n_lines, 1) AS ellipsis_ratio,
                   CAST(n_alpha AS DOUBLE) / greatest(n_words, 1) AS alpha_ratio,
                   n_stop AS n_stop_words,
                   (n_words >= 50 AND n_words <= 100000
                    AND CAST(sum_wlen AS DOUBLE) / greatest(n_words, 1) >= 3.0
                    AND CAST(sum_wlen AS DOUBLE) / greatest(n_words, 1) <= 10.0
                    AND CAST(n_sym AS DOUBLE) / greatest(n_words, 1) < 0.1
                    AND CAST(n_bullet AS DOUBLE) / greatest(n_lines, 1) < 0.9
                    AND CAST(n_ellip AS DOUBLE) / greatest(n_lines, 1) < 0.3
                    AND CAST(n_alpha AS DOUBLE) / greatest(n_words, 1) >= 0.8
                    AND n_stop >= 1) AS keep
            FROM m
        """,

        # M4 downsampling (Jugel et al. VLDB 2014): per (user, week-bucket)
        # the rows achieving first/last time and min/max value survive; all
        # four elections share the (value, ts, event_id) total order
        # (weekly buckets — see the query comment)
        "m4_downsample": """
            WITH b AS (
                SELECT event_id, user_id, ts, value,
                       row_number() OVER (PARTITION BY user_id, date_trunc('week', ts)
                           ORDER BY ts, event_id) AS rn_first,
                       row_number() OVER (PARTITION BY user_id, date_trunc('week', ts)
                           ORDER BY ts DESC, event_id DESC) AS rn_last,
                       row_number() OVER (PARTITION BY user_id, date_trunc('week', ts)
                           ORDER BY value ASC, ts, event_id) AS rn_min,
                       row_number() OVER (PARTITION BY user_id, date_trunc('week', ts)
                           ORDER BY value DESC, ts, event_id) AS rn_max
                FROM events)
            SELECT event_id, user_id, ts, value FROM b
            WHERE rn_first = 1 OR rn_last = 1 OR rn_min = 1 OR rn_max = 1
        """,

        # LTTB (Steinarsson 2013) as a recursive CTE: the per-bucket argmax
        # chain is a recursion over bucket index with a window row_number
        # for exact (area DESC, rk ASC) tie-breaking.  Inputs are quantized
        # (y = floor(value)) and x is the µs offset from the group min, so
        # every centroid sum is exactly representable and the triangle
        # arithmetic — identical expression text — is bit-equal across
        # engines.  n_out = 20, m = 18 interior buckets; groups with
        # n <= 20 pass through whole.
        "lttb_downsample": """
            WITH RECURSIVE base AS MATERIALIZED (
                SELECT event_id, user_id AS g, ts,
                       floor(value) AS value_f,
                       CAST(epoch_us(ts) - min(epoch_us(ts))
                            OVER (PARTITION BY user_id) AS DOUBLE) AS x,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rk,
                       count(*) OVER (PARTITION BY user_id) AS n
                FROM events),
            pts AS MATERIALIZED (
                SELECT *, ((rk - 1) * 18 - 1) // (n - 2) AS k
                FROM base WHERE n > 20 AND rk >= 2 AND rk <= n - 1),
            cent AS MATERIALIZED (
                SELECT g, k, sum(x) / count(*) AS cx,
                       sum(value_f) / count(*) AS cy
                FROM pts GROUP BY g, k),
            lastp AS MATERIALIZED (
                SELECT g, CAST(18 AS BIGINT) AS k, x AS cx, value_f AS cy
                FROM base WHERE n > 20 AND rk = n),
            cnext AS MATERIALIZED (
                SELECT * FROM cent UNION ALL SELECT * FROM lastp),
            rec AS (
                SELECT g, 0 AS k, CAST(1 AS BIGINT) AS sel,
                       x AS ax, value_f AS ay
                FROM base WHERE n > 20 AND rk = 1
                UNION ALL
                SELECT g, k, sel, ax, ay FROM (
                    SELECT p.g AS g, r.k + 1 AS k, p.rk AS sel,
                           p.x AS ax, p.value_f AS ay,
                           row_number() OVER (PARTITION BY p.g ORDER BY
                               abs((r.ax - c.cx) * (p.value_f - r.ay)
                                   - (r.ax - p.x) * (c.cy - r.ay)) DESC,
                               p.rk ASC) AS rn
                    FROM rec r
                    JOIN pts p ON p.g = r.g AND p.k = r.k
                    JOIN cnext c ON c.g = r.g AND c.k = r.k + 1
                    WHERE r.k < 18
                ) WHERE rn = 1),
            keep AS (
                SELECT g, sel AS rk FROM rec WHERE k > 0
                UNION ALL
                SELECT DISTINCT g, CAST(1 AS BIGINT) FROM base WHERE n > 20
                UNION ALL
                SELECT DISTINCT g, n FROM base WHERE n > 20)
            SELECT b.event_id, b.g AS user_id, b.ts, b.value_f
            FROM base b JOIN keep kp ON b.g = kp.g AND b.rk = kp.rk
            UNION ALL
            SELECT event_id, g, ts, value_f FROM base WHERE n <= 20
        """,

        # C4-style corpus line dedup (pipelines/linedup.dedup_lines):
        # 8-word lines, keep the globally-first instance of each duplicated
        # line, rebuild the text from survivors.  The oracle never sees the
        # engine's internal hash — it compares the reconstructed TEXT.
        "dedup_lines": """
            WITH w AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS word,
                       generate_subscripts(string_split(text, ' '), 1) - 1 AS i
                FROM documents),
            lines AS (
                SELECT doc_id, i // 8 AS ln,
                       string_agg(word, ' ' ORDER BY i) AS line
                FROM w GROUP BY doc_id, i // 8),
            marked AS (
                SELECT doc_id, ln, line,
                       count(*) OVER (PARTITION BY line) AS c,
                       row_number() OVER (PARTITION BY line
                                          ORDER BY doc_id, ln) AS rn
                FROM lines),
            kept AS (SELECT doc_id, ln, line FROM marked
                     WHERE c < 2 OR rn = 1),
            nl AS (SELECT doc_id, count(*) AS n_lines FROM lines
                   GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(string_agg(k.line, ' ' ORDER BY k.ln), '')
                       AS text_dedup,
                   nl.n_lines,
                   nl.n_lines - count(k.ln) AS n_removed
            FROM documents d
            JOIN nl USING (doc_id)
            LEFT JOIN kept k ON d.doc_id = k.doc_id
            GROUP BY d.doc_id, nl.n_lines
        """,

        # exact duplicate-SPAN removal (pipelines/spandup.dedup_spans):
        # 8-word windows at EVERY offset, all occurrences of duplicated
        # windows marked, covered tokens dropped, text rebuilt.  The oracle
        # compares reconstructed TEXT, never the engine's window hash.
        "dedup_spans": """
            WITH w AS MATERIALIZED (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            win AS MATERIALIZED (
                SELECT doc_id, i - 1 AS s,
                       array_to_string(list_slice(ws, i, i + 7), ' ') AS wstr
                FROM w, UNNEST(range(1, len(ws) - 8 + 2)) AS t(i)
                WHERE len(ws) >= 8),
            dup AS (SELECT wstr FROM win GROUP BY wstr HAVING count(*) >= 2),
            rem AS (SELECT doc_id, s FROM win JOIN dup USING (wstr)),
            tok AS (SELECT doc_id, unnest(ws) AS word,
                           generate_subscripts(ws, 1) - 1 AS p FROM w),
            cov AS (SELECT DISTINCT t.doc_id, t.p
                    FROM tok t JOIN rem r ON t.doc_id = r.doc_id
                                          AND t.p BETWEEN r.s AND r.s + 7),
            kept AS (SELECT t.doc_id, t.p, t.word FROM tok t
                     LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p = c.p
                     WHERE c.p IS NULL),
            nt AS (SELECT doc_id, len(ws) AS n_tokens FROM w)
            SELECT d.doc_id,
                   coalesce(string_agg(k.word, ' ' ORDER BY k.p), '')
                       AS text_dedup,
                   nt.n_tokens,
                   nt.n_tokens - count(k.p) AS n_removed
            FROM documents d JOIN nt USING (doc_id)
            LEFT JOIN kept k ON d.doc_id = k.doc_id
            GROUP BY d.doc_id, nt.n_tokens
        """,

        # DSIR importance log-weights (corpus.dsir_logweight): hashed
        # unigram+bigram buckets (md5_number_lower parity, B=256), add-one
        # smoothed target(en)/raw log-ratio, per-doc SUM(k*lam).  Identical
        # ln expression text both sides; ROUND 6 (k*lam sums differ at the
        # last ulp only — same contract as doc_bigram_logprob).
        "dsir_logweight": r"""
            WITH w AS MATERIALIZED (
                SELECT doc_id, regexp_extract_all(lower(text), '[\w'']+') AS ws
                FROM documents),
            g AS MATERIALIZED (
                SELECT doc_id, md5_number_lower(g) % 256 AS b FROM (
                    SELECT doc_id, unnest(ws) AS g FROM w
                    UNION ALL
                    SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
                    FROM w, UNNEST(range(1, len(ws))) AS t(i)
                    WHERE len(ws) >= 2)),
            tc AS (SELECT b, count(*) AS ct FROM g
                   JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY b),
            rc AS (SELECT b, count(*) AS cr FROM g GROUP BY b),
            tt AS (SELECT sum(ct) AS t FROM tc),
            rt AS (SELECT sum(cr) AS t FROM rc),
            lam AS (
                SELECT r.b,
                       ln((coalesce(tc.ct, 0) + 1.0) / ((SELECT t FROM tt) + 256))
                     - ln((r.cr + 1.0) / ((SELECT t FROM rt) + 256)) AS lam
                FROM rc r LEFT JOIN tc ON r.b = tc.b),
            dk AS (SELECT doc_id, b, count(*) AS k FROM g GROUP BY doc_id, b)
            SELECT dk.doc_id, CAST(SUM(k) AS BIGINT) AS n_grams,
                   ROUND(SUM(k * lam.lam), 6) AS logweight
            FROM dk JOIN lam USING (b) GROUP BY dk.doc_id
        """,

        # DSIR selection: Gumbel-top-k without replacement over the rounded
        # log-weights; ln differs at the last ulp across engines, so the
        # key is ROUNDED before the top-100 cut (ties -> doc_id)
        "dsir_resample": r"""
            WITH w AS MATERIALIZED (
                SELECT doc_id, regexp_extract_all(lower(text), '[\w'']+') AS ws
                FROM documents),
            g AS MATERIALIZED (
                SELECT doc_id, md5_number_lower(g) % 256 AS b FROM (
                    SELECT doc_id, unnest(ws) AS g FROM w
                    UNION ALL
                    SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
                    FROM w, UNNEST(range(1, len(ws))) AS t(i)
                    WHERE len(ws) >= 2)),
            tc AS (SELECT b, count(*) AS ct FROM g
                   JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY b),
            rc AS (SELECT b, count(*) AS cr FROM g GROUP BY b),
            tt AS (SELECT sum(ct) AS t FROM tc),
            rt AS (SELECT sum(cr) AS t FROM rc),
            lam AS (
                SELECT r.b,
                       ln((coalesce(tc.ct, 0) + 1.0) / ((SELECT t FROM tt) + 256))
                     - ln((r.cr + 1.0) / ((SELECT t FROM rt) + 256)) AS lam
                FROM rc r LEFT JOIN tc ON r.b = tc.b),
            dk AS (SELECT doc_id, b, count(*) AS k FROM g GROUP BY doc_id, b),
            scored AS (
                SELECT dk.doc_id, CAST(SUM(k) AS BIGINT) AS n_grams,
                       ROUND(SUM(k * lam.lam), 6) AS logweight
                FROM dk JOIN lam USING (b) GROUP BY dk.doc_id),
            keyed AS (
                SELECT doc_id, n_grams, logweight,
                       ROUND(logweight / 1.0
                             + (-ln(-ln((md5_number_lower(CAST(doc_id AS VARCHAR))
                                         % 9007199254740992 + 0.5)
                                        / 9007199254740992.0))), 6) AS key
                FROM scored)
            SELECT doc_id, n_grams, logweight, key
            FROM keyed ORDER BY key DESC, doc_id LIMIT 100
        """,

        # CSV-source ingestion proof (sources/io.read_table): the engine
        # result comes from a CSV round-trip of the events table; hourly
        # sums must equal the parquet-sourced SQL exactly
        "summarize_csv_source": """
            SELECT user_id, date_trunc('hour', ts) AS bucket_ts,
                   ROUND(SUM(value), 6) AS value_sum
            FROM events GROUP BY 1, 2
        """,

        # earliest-occurrence funnel with a completion window
        # (ops/funnel.funnel_stages): stage k = earliest step-k event
        # strictly after the matched step k-1 and within 12h of step 1 —
        # exactly the chained MIN(ts) construction below
        "funnel_stages": """
            WITH u AS (SELECT DISTINCT user_id FROM events
                       WHERE event_type IN ('view', 'click', 'purchase')),
            s1 AS (SELECT user_id, MIN(ts) t1 FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (SELECT e.user_id, MIN(e.ts) t2
                   FROM events e JOIN s1 USING (user_id)
                   WHERE e.event_type = 'click' AND e.ts > s1.t1
                     AND e.ts <= s1.t1 + INTERVAL 12 HOUR
                   GROUP BY e.user_id),
            s3 AS (SELECT e.user_id, MIN(e.ts) t3
                   FROM events e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                     AND e.ts <= s1.t1 + INTERVAL 12 HOUR
                   GROUP BY e.user_id)
            SELECT u.user_id,
                   CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
                        WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage,
                   t1 AS t_first, COALESCE(t3, t2, t1) AS t_last
            FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
            LEFT JOIN s3 USING (user_id)
        """,

        # minhash candidates verified by NORMALIZED edit distance
        # (pipelines/dedup.editdist_verify): DuckDB levenshtein == the
        # numpy DP; norm_dist is an exact-integer ratio, unrounded
        "dedup_editdist": r"""
            WITH toks AS (
                SELECT doc_id, regexp_extract_all(lower(text), '[\w'']+') AS ws
                FROM documents
            ),
            idx AS (
                SELECT doc_id, ws, unnest(range(1, len(ws)-1)) AS i
                FROM toks WHERE len(ws) >= 3
            ),
            sh AS (
                SELECT doc_id,
                       md5_number_lower(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS h
                FROM idx
                UNION ALL
                SELECT doc_id, md5_number_lower(array_to_string(ws, ' '))
                FROM toks WHERE len(ws) BETWEEN 1 AND 2
            ),
            perm(pi, a, b) AS (VALUES __PERM_VALS__),
            sig AS (
                SELECT doc_id, pi,
                       MIN((CAST(a AS HUGEINT) * CAST(h AS HUGEINT) + b)
                           % 2305843009213693951) AS mh
                FROM sh, perm GROUP BY doc_id, pi
            ),
            band0 AS (
                SELECT doc_id, pi // 8 AS band_id,
                       string_agg(CAST(mh AS VARCHAR), ',' ORDER BY pi) AS bkey
                FROM sig GROUP BY doc_id, pi // 8
            ),
            -- mirror of minhash_lsh_pairs' max_bucket cap: each band bucket
            -- keeps only its first 100000 members in doc_id order (the
            -- pipeline's deterministic ids-ascending prefix)
            band AS (
                SELECT doc_id, band_id, bkey FROM (
                    SELECT doc_id, band_id, bkey,
                           ROW_NUMBER() OVER (PARTITION BY band_id, bkey
                                              ORDER BY doc_id) AS rn
                    FROM band0)
                WHERE rn <= 100000
            ),
            cand AS (
                SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                FROM band x JOIN band y
                  ON x.band_id = y.band_id AND x.bkey = y.bkey
                 AND x.doc_id < y.doc_id
            ),
            est AS (
                SELECT c.id_a, c.id_b,
                       AVG(CASE WHEN sa.mh = sb.mh THEN 1.0 ELSE 0.0 END) AS est_jaccard
                FROM cand c
                JOIN sig sa ON sa.doc_id = c.id_a
                JOIN sig sb ON sb.doc_id = c.id_b AND sb.pi = sa.pi
                GROUP BY c.id_a, c.id_b
            ),
            v AS (
                SELECT e.id_a, e.id_b,
                       levenshtein(a.text, b.text) AS dist,
                       CAST(levenshtein(a.text, b.text) AS DOUBLE)
                           / GREATEST(GREATEST(length(a.text),
                                               length(b.text)), 1) AS norm_dist
                FROM est e
                JOIN documents a ON a.doc_id = e.id_a
                JOIN documents b ON b.doc_id = e.id_b
                WHERE e.est_jaccard >= 0.5
            )
            SELECT id_a, id_b, dist, norm_dist FROM v WHERE norm_dist <= 0.4
        """.replace("__PERM_VALS__", _perm_vals),

        # CUBE over (lang, source) — engine lowers grouping sets to the
        # same UNION ALL of combiner-prefixed aggregates; exact integers
        "docs_cube": """
            SELECT COALESCE(lang, '(all)') AS lang,
                   COALESCE(source, '(all)') AS source,
                   COUNT(*) AS n_rows,
                   CAST(SUM(n_chars) AS BIGINT) AS n_chars_sum
            FROM documents
            GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
        """,

        # time-to-convert quantiles for funnel completers: integer-us
        # durations make dyadic quantile_cont values exactly representable,
        # so np.nanquantile matches bit-for-bit with no rounding
        "funnel_ttc": """
            WITH s1 AS (SELECT user_id, MIN(ts) t1 FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (SELECT e.user_id, MIN(e.ts) t2
                   FROM events e JOIN s1 USING (user_id)
                   WHERE e.event_type = 'click' AND e.ts > s1.t1
                     AND e.ts <= s1.t1 + INTERVAL 12 HOUR
                   GROUP BY e.user_id),
            s3 AS (SELECT e.user_id, MIN(e.ts) t3
                   FROM events e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                     AND e.ts <= s1.t1 + INTERVAL 12 HOUR
                   GROUP BY e.user_id),
            d AS (SELECT CAST(epoch_us(t3) - epoch_us(t1) AS DOUBLE) AS ttc
                  FROM s3 JOIN s1 USING (user_id))
            SELECT 0.25 AS q, quantile_cont(ttc, 0.25) AS ttc_us FROM d
            UNION ALL
            SELECT 0.5, quantile_cont(ttc, 0.5) FROM d
            UNION ALL
            SELECT 0.75, quantile_cont(ttc, 0.75) FROM d
        """,

        # cohort retention triangle (ops/cohort.cohort_retention): exact
        # integer counts of distinct users per (first-event day, active day)
        "cohort_retention": """
            WITH f AS (SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_ts
                       FROM events GROUP BY user_id),
            a AS (SELECT DISTINCT e.user_id, f.cohort_ts,
                         date_trunc('day', e.ts) AS bucket_ts
                  FROM events e JOIN f USING (user_id))
            SELECT cohort_ts, bucket_ts, count(*) AS n_users
            FROM a GROUP BY cohort_ts, bucket_ts
        """,

        # HLL NDV rebuilt register-for-register: h = md5_number_lower(str)
        # (== kernels.text.md5_u64), idx = h >> 52, rank = 52 - highest set
        # bit of (h & (2^52-1)) (53 when zero) — exactly HLL.update_hashes
        # at p=12.  The register sum is an exact integer (S = sum 2^(53-reg),
        # absent registers contribute 2^53), so the raw estimate is the
        # same term-for-term float expression as HLL.estimate; the linear-
        # counting branch is ln-based => ROUND 6 (NOTES_r3 last-ULP rule).
        # Highest set bit via MAX over a bits table — floor(log2(r)) on
        # doubles is WRONG near powers of two (log2(2^51-1) rounds to 51.0).
        "events_ndistinct": """
            WITH dv AS (
                SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS s
                FROM events
            ),
            ir AS (
                SELECT event_type,
                       CAST(md5_number_lower(s) >> 52 AS BIGINT) AS idx,
                       CAST(md5_number_lower(s) & 4503599627370495 AS BIGINT) AS r
                FROM dv
            ),
            bits AS (SELECT UNNEST(generate_series(0, 51)) AS e),
            rowrank AS (
                SELECT i.event_type, i.idx,
                       CASE WHEN i.r = 0 THEN 53
                            ELSE 52 - MAX(CASE WHEN (CAST(1 AS BIGINT) << b.e) <= i.r
                                               THEN b.e END)
                       END AS rank
                FROM ir i CROSS JOIN bits b
                GROUP BY i.event_type, i.idx, i.r
            ),
            regs AS (
                SELECT event_type, idx, MAX(rank) AS reg
                FROM rowrank GROUP BY event_type, idx
            ),
            st AS (
                SELECT event_type,
                       CAST(4096 - COUNT(*) AS BIGINT) AS zeros,
                       CAST(SUM(CAST(1 AS BIGINT) << (53 - reg))
                            + CAST(4096 - COUNT(*) AS HUGEINT) * 9007199254740992
                            AS DOUBLE) AS s
                FROM regs GROUP BY event_type
            ),
            fin AS (
                SELECT event_type, zeros,
                       0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0
                           * 9007199254740992.0 / s AS e_raw
                FROM st
            )
            SELECT event_type,
                   ROUND(CASE WHEN e_raw <= 10240.0 AND zeros > 0
                              THEN 4096.0 * ln(4096.0 / zeros)
                              ELSE e_raw END, 6) + 0 AS ndistinct_est,
                   1.04 / 64.0 AS rel_err
            FROM fin
        """,

        # SpaceSaving top-50 in the EXACT regime (capacity >= distinct
        # vocabulary => counts exact, err = 0) — same count/tie order as
        # vocab_topk
        "vocab_topk_sketch": r"""
            WITH tok AS (
                SELECT unnest(regexp_extract_all(lower(text), '[\w'']+')) AS token
                FROM documents)
            SELECT token, COUNT(*) AS cnt, CAST(0 AS BIGINT) AS err
            FROM tok GROUP BY token
            ORDER BY cnt DESC, token LIMIT 50
        """,

        # unicode/whitespace normalization (text_analysis.normalize_text):
        # the query injects deterministic whitespace noise on even doc_ids
        # (the corpus itself is already clean) — same injection here, same
        # explicit ASCII whitespace class both sides (never bare \s).
        "doc_normalize": r"""
            WITH noisy AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 2 = 0
                            THEN chr(9) || replace(text, ' ', '  ')
                                 || chr(10) || chr(10)
                            ELSE text END AS text
                FROM documents),
            n AS (
                SELECT doc_id,
                       trim(regexp_replace(
                           regexp_replace(nfc_normalize(text),
                                          '[\x00-\x08\x0e-\x1f\x7f]', '', 'g'),
                           '[ \t\n\r\f\v]+', ' ', 'g'), ' ') AS text_norm,
                       text AS orig
                FROM noisy)
            SELECT doc_id, text_norm, length(text_norm) AS n_chars_norm,
                   text_norm <> orig AS changed
            FROM n
        """,

        # pad-to-hour-grid + exact linear interpolation in timestamp space
        # (ops/interpolate.interpolate_by_time): observed buckets rounded 6
        # BEFORE interpolation on both sides; the fill expression
        # pv + (nv-pv)*((t-pt)/(nt-pt)) divides the time ratio FIRST —
        # identical expression text, bit-equal pre-round.
        "interpolate_linear": """
            WITH agg AS (
                SELECT user_id, date_trunc('hour', ts) AS bucket_ts,
                       ROUND(SUM(value), 6) AS v
                FROM events GROUP BY 1, 2),
            bounds AS (SELECT user_id, MIN(bucket_ts) lo, MAX(bucket_ts) hi
                       FROM agg GROUP BY 1),
            grid AS (SELECT user_id,
                            UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR))
                                AS bucket_ts
                     FROM bounds),
            j AS (SELECT g.user_id, g.bucket_ts, a.v
                  FROM grid g LEFT JOIN agg a USING (user_id, bucket_ts)),
            f AS (
                SELECT user_id, bucket_ts, v,
                       last_value(v IGNORE NULLS) OVER (
                           PARTITION BY user_id ORDER BY bucket_ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                           AS pv,
                       last_value(CASE WHEN v IS NOT NULL THEN bucket_ts END
                                  IGNORE NULLS) OVER (
                           PARTITION BY user_id ORDER BY bucket_ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                           AS pt,
                       first_value(v IGNORE NULLS) OVER (
                           PARTITION BY user_id ORDER BY bucket_ts
                           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                           AS nv,
                       first_value(CASE WHEN v IS NOT NULL THEN bucket_ts END
                                   IGNORE NULLS) OVER (
                           PARTITION BY user_id ORDER BY bucket_ts
                           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                           AS nt
                FROM j)
            SELECT user_id, bucket_ts,
                   CASE WHEN v IS NOT NULL THEN v
                        WHEN pv IS NULL OR nv IS NULL THEN NULL
                        ELSE pv + (nv - pv)
                             * (CAST(epoch_us(bucket_ts) - epoch_us(pt) AS DOUBLE)
                                / CAST(epoch_us(nt) - epoch_us(pt) AS DOUBLE))
                   END AS value_sum
            FROM f
        """,

        # exact-fraction stratified sample: per-group md5 rank election,
        # integer-ceil k — corpus.sample_stratified parity
        "sample_stratified": """
            WITH r AS (
                SELECT event_id, event_type, value,
                       row_number() OVER (
                           PARTITION BY event_type
                           ORDER BY md5_number_lower(CAST(event_id AS VARCHAR)),
                                    event_id) AS rn,
                       count(*) OVER (PARTITION BY event_type) AS n
                FROM events)
            SELECT event_id, event_type, value FROM r
            WHERE rn <= (n * 200000 + 999999) // 1000000
        """,

        # deterministic Bernoulli sample: md5_number_lower parity with
        # pipelines/corpus.hash_sample (same chain as hash_split)
        "doc_hash_sample": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000000 < 250000
        """,

        # quantile-threshold filter: integer score => interpolated quantile
        # exact in double on both engines (ops/quantiles.py parity note)
        "quality_quantile_filter": """
            SELECT doc_id, n_chars FROM documents
            WHERE n_chars >= (SELECT quantile_cont(n_chars, 0.7) FROM documents)
        """,

        # sliding full turn-windows (training-example cut): frame of W rows,
        # only windows entirely inside one conversation survive
        "conv_windows": """
            WITH w AS (
                SELECT user_id, ts AS w_start_ts,
                       SUM(value) OVER f AS s,
                       MAX(value) OVER f AS m,
                       COUNT(*) OVER f AS c
                FROM events
                WINDOW f AS (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
            )
            SELECT user_id, w_start_ts, ROUND(s, 6) AS w_sum, m AS w_max
            FROM w WHERE c = 4
        """,

        "summarize_by_time_hour": """
            SELECT user_id,
                   date_trunc('hour', ts) AS bucket_ts,
                   ROUND(SUM(value), 6)   AS value_sum,
                   COUNT(value)           AS value_count,
                   MIN(value)             AS value_min,
                   MAX(value)             AS value_max,
                   ROUND(AVG(value), 6)   AS value_mean
            FROM events GROUP BY 1, 2
        """,
        "summarize_by_time_day_type": """
            SELECT event_type,
                   date_trunc('day', ts) AS bucket_ts,
                   ROUND(SUM(value), 6)  AS value_sum,
                   COUNT(value)          AS value_count
            FROM events GROUP BY 1, 2
        """,
        "summarize_by_time_month": """
            SELECT date_trunc('month', ts) AS bucket_ts,
                   ROUND(SUM(value), 6)    AS value_sum,
                   COUNT(value)            AS value_count
            FROM events GROUP BY 1
        """,
        "filter_by_time": """
            SELECT * FROM events
            WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
              AND ts <= TIMESTAMP '2024-01-10 23:59:59.999999'
        """,
        "summarize_wide": """
            SELECT date_trunc('day', ts) AS bucket_ts,
                   ROUND(COALESCE(SUM(value) FILTER (event_type = 'click'), 0), 6)    AS value_sum_click,
                   ROUND(COALESCE(SUM(value) FILTER (event_type = 'error'), 0), 6)    AS value_sum_error,
                   ROUND(COALESCE(SUM(value) FILTER (event_type = 'purchase'), 0), 6) AS value_sum_purchase,
                   ROUND(COALESCE(SUM(value) FILTER (event_type = 'signup'), 0), 6)   AS value_sum_signup,
                   ROUND(COALESCE(SUM(value) FILTER (event_type = 'view'), 0), 6)     AS value_sum_view
            FROM events GROUP BY 1
        """,
        "reduce_memory": """
            SELECT event_id, user_id, value FROM events
        """,
        "augment_lags": """
            SELECT event_id, user_id, ts, value,
                   LAG(value, 1) OVER w AS value_lag_1,
                   LAG(value, 2) OVER w AS value_lag_2
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        """,
        "augment_leads": """
            SELECT event_id, user_id, value,
                   LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS value_lead_1
            FROM events
        """,
        "augment_diffs": """
            SELECT event_id, user_id, value,
                   value - LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS value_diff_1
            FROM events
        """,
        "augment_rolling": """
            SELECT event_id, user_id,
                   CASE WHEN ROW_NUMBER() OVER w >= 4
                        THEN ROUND(SUM(value) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6)
                   END AS value_rolling_sum_win_4,
                   CASE WHEN ROW_NUMBER() OVER w >= 4
                        THEN ROUND(AVG(value) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6)
                   END AS value_rolling_mean_win_4
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        """,
        "rolling_quantile": """
            -- midpoint quantile = mean of the two bracketing order stats of
            -- the 10-row window; quantile_disc(p=(k+0.5)/10) selects the
            -- 0-based k-th smallest exactly.  idx=(10-1)*q: q=.75 -> (6,7),
            -- q=.5 -> (4,5), q=.3 -> (2,3).  Same (a+b)/2 expression as the
            -- pandas midpoint kernel -> UNROUNDED bit-equal.
            SELECT event_id, user_id,
                   CASE WHEN ROW_NUMBER() OVER w >= 10
                        THEN (quantile_disc(value, 0.65) OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
                            + quantile_disc(value, 0.75) OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)) / 2
                   END AS value_rolling_quantile_75_win_10,
                   CASE WHEN ROW_NUMBER() OVER w >= 10
                        THEN (quantile_disc(value, 0.45) OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
                            + quantile_disc(value, 0.55) OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)) / 2
                   END AS value_rolling_quantile_50_win_10,
                   CASE WHEN ROW_NUMBER() OVER w >= 10
                        THEN (quantile_disc(value, 0.25) OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
                            + quantile_disc(value, 0.35) OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)) / 2
                   END AS value_rolling_quantile_30_win_10
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        """,
        "augment_expanding": """
            SELECT event_id, user_id,
                   ROUND(SUM(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                       AS value_expanding_sum,
                   COUNT(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS value_expanding_count
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        """,
        "pad_by_time_daily": """
            WITH agg AS (
                SELECT user_id, date_trunc('day', ts) AS bucket_ts, ROUND(SUM(value), 6) AS value_sum
                FROM events GROUP BY 1, 2
            ), bounds AS (
                SELECT user_id, MIN(bucket_ts) lo, MAX(bucket_ts) hi FROM agg GROUP BY 1
            ), grid AS (
                SELECT user_id, UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS bucket_ts
                FROM bounds
            )
            SELECT g.user_id, g.bucket_ts, COALESCE(a.value_sum, 0) AS value_sum
            FROM grid g LEFT JOIN agg a USING (user_id, bucket_ts)
        """,
        "pad_by_time_monthly": """
            WITH agg AS (
                SELECT o_custkey, date_trunc('month', o_orderdate) AS bucket_ts,
                       ROUND(SUM(o_totalprice), 6) AS o_totalprice_sum
                FROM orders GROUP BY 1, 2
            ), bounds AS (
                SELECT o_custkey, MIN(bucket_ts) lo, MAX(bucket_ts) hi
                FROM agg GROUP BY 1
            ), grid AS (
                SELECT o_custkey,
                       UNNEST(generate_series(lo, hi, INTERVAL 1 MONTH)) AS bucket_ts
                FROM bounds
            )
            SELECT g.o_custkey, g.bucket_ts,
                   COALESCE(a.o_totalprice_sum, 0) AS o_totalprice_sum
            FROM grid g LEFT JOIN agg a USING (o_custkey, bucket_ts)
        """,
        "ts_summary": """
            WITH d AS (
                SELECT user_id, ts,
                       epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                           AS diff_us
                FROM events
            )
            SELECT user_id,
                   COUNT(ts) AS date_n,
                   MIN(ts)   AS date_start,
                   MAX(ts)   AS date_end,
                   MIN(diff_us) / 1e6                 AS diff_min_s,
                   quantile_cont(diff_us, 0.25) / 1e6 AS diff_q25_s,
                   quantile_cont(diff_us, 0.5) / 1e6  AS diff_median_s,
                   (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1e6
                       / NULLIF(COUNT(ts) - 1, 0)     AS diff_mean_s,
                   quantile_cont(diff_us, 0.75) / 1e6 AS diff_q75_s,
                   MAX(diff_us) / 1e6                 AS diff_max_s
            FROM d GROUP BY user_id
        """,
        "future_frame": """
            WITH last AS (SELECT user_id, MAX(ts) AS mx FROM events GROUP BY 1)
            SELECT user_id,
                   UNNEST(generate_series(mx + INTERVAL 1 HOUR, mx + INTERVAL 5 HOUR,
                                          INTERVAL 1 HOUR)) AS ts
            FROM last
        """,
        "signature": """
            SELECT event_id,
                   year(ts)                     AS ts_year,
                   CASE WHEN quarter(ts) <= 2 THEN 1 ELSE 2 END AS ts_half,
                   quarter(ts)                  AS ts_quarter,
                   month(ts)                    AS ts_month,
                   day(ts)                      AS ts_mday,
                   dayofyear(ts)                AS ts_yday,
                   isodow(ts)                   AS ts_wday,
                   hour(ts)                     AS ts_hour,
                   minute(ts)                   AS ts_minute,
                   CAST(floor(second(ts)) AS BIGINT) AS ts_second,
                   CASE WHEN isodow(ts) = 7 THEN 1 ELSE 0 END AS ts_weekend,
                   CASE WHEN hour(ts) <= 12 THEN 'am' ELSE 'pm' END AS ts_am_pm
            FROM events
        """,
        "apply_by_time_range": """
            SELECT user_id, date_trunc('day', ts) AS bucket_ts,
                   ROUND(MAX(value) - MIN(value), 6) AS value_range
            FROM events GROUP BY 1, 2
        """,
        "fourier": """
            WITH d AS (
                SELECT event_id, user_id, ts,
                       epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                           AS diff_us
                FROM events
            ), sc AS (
                SELECT user_id, quantile_cont(diff_us, 0.5) / 1e6 AS med_s
                FROM d GROUP BY 1
            )
            SELECT e.event_id,
                   ROUND(sin(2 * pi() * 1 * ((epoch_us(e.ts) * 1000 / 1e9) / sc.med_s) / 24), 6)
                       AS ts_sin_1_24,
                   ROUND(cos(2 * pi() * 1 * ((epoch_us(e.ts) * 1000 / 1e9) / sc.med_s) / 24), 6)
                       AS ts_cos_1_24
            FROM events e JOIN sc USING (user_id)
        """,
        "tier_rollup_1h": """
            SELECT user_id AS conv_id,
                   date_trunc('hour', ts) AS bucket_ts,
                   ROUND(SUM(value), 6)   AS value_sum,
                   COUNT(value)           AS value_count,
                   MIN(value)             AS value_min,
                   MAX(value)             AS value_max
            FROM events GROUP BY 1, 2
        """,
        "tier_ingest_1h": """
            SELECT user_id AS conv_id,
                   date_trunc('hour', ts) AS bucket_ts,
                   ROUND(SUM(value), 6)   AS value_sum,
                   COUNT(value)           AS value_count,
                   MIN(value)             AS value_min,
                   MAX(value)             AS value_max
            FROM events GROUP BY 1, 2
        """,
        "tier_ingest_salted_1h": """
            SELECT user_id AS conv_id,
                   date_trunc('hour', ts) AS bucket_ts,
                   ROUND(SUM(value), 6)   AS value_sum,
                   COUNT(value)           AS value_count,
                   MIN(value)             AS value_min,
                   MAX(value)             AS value_max
            FROM events GROUP BY 1, 2
        """,
        "tier_query_1h": """
            SELECT user_id AS conv_id,
                   date_trunc('hour', ts) AS bucket_ts,
                   ROUND(SUM(value), 6)   AS value_sum,
                   COUNT(value)           AS value_count,
                   ROUND(SUM(value) / COUNT(value), 6) AS value_mean
            FROM events GROUP BY 1, 2
            HAVING date_trunc('hour', ts) >= TIMESTAMP '2024-01-08 00:00:00'
               AND date_trunc('hour', ts) <  TIMESTAMP '2024-01-22 00:00:00'
        """,
        "tier_expire_1h": """
            SELECT user_id AS conv_id,
                   date_trunc('hour', ts) AS bucket_ts,
                   ROUND(SUM(value), 6)   AS value_sum,
                   COUNT(value)           AS value_count,
                   MIN(value)             AS value_min,
                   MAX(value)             AS value_max
            FROM events GROUP BY 1, 2
            HAVING date_trunc('hour', ts) >= TIMESTAMP '2024-01-10 00:00:00'
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 4)      AS sum_qty,
                   ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
                   ROUND(AVG(l_quantity), 4)      AS avg_qty,
                   COUNT(l_quantity)              AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 23:59:59.999999'
            GROUP BY 1, 2
        """,
        "dedup_exact": """
            SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        """,
        "vocab_topk": r"""
            WITH w AS (
                SELECT unnest(regexp_extract_all(lower(text), '[\w'']+')) AS token
                FROM documents
            )
            SELECT token, COUNT(*) AS cnt FROM w
            GROUP BY token ORDER BY cnt DESC, token LIMIT 50
        """,

        "doc_hash_split": r"""
            SELECT doc_id,
                   CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 AS BIGINT) AS bucket,
                   CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 90 THEN 'train'
                        WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 95 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,

        "docs_topk_per_lang": r"""
            SELECT lang, doc_id, n_chars FROM (
                SELECT lang, doc_id, n_chars,
                       ROW_NUMBER() OVER (PARTITION BY lang
                                          ORDER BY n_chars DESC, doc_id) AS rn
                FROM documents
            ) WHERE rn <= 5
        """,

        # greedy first-fit packing as a per-shard recursive recurrence
        # (one doc per recursion step per shard, shards advance in parallel)
        "pack_sequences": r"""
            WITH RECURSIVE d AS (
                SELECT doc_id, doc_id % 8 AS shard,
                       len(regexp_extract_all(text, '\S+')) AS n_tokens,
                       ROW_NUMBER() OVER (PARTITION BY doc_id % 8
                                          ORDER BY doc_id) AS rn
                FROM documents
            ),
            packed AS (
                SELECT shard, rn, doc_id, n_tokens,
                       CAST(0 AS BIGINT) AS bin_id, n_tokens AS fill
                FROM d WHERE rn = 1
                UNION ALL
                SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
                       CASE WHEN p.fill + d.n_tokens <= 512 THEN p.bin_id
                            ELSE p.bin_id + 1 END,
                       CASE WHEN p.fill + d.n_tokens <= 512
                            THEN p.fill + d.n_tokens ELSE d.n_tokens END
                FROM packed p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1
            )
            SELECT doc_id, shard, bin_id, n_tokens FROM packed
        """,

        "doc_repetition": r"""
            WITH toks AS (
                SELECT doc_id, regexp_extract_all(lower(text), '[\w'']+') AS ws
                FROM documents
            ),
            sidx AS (
                SELECT doc_id, ws, unnest(range(1, len(ws)-1)) AS i
                FROM toks WHERE len(ws) >= 3
            ),
            sh AS (
                SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
                FROM sidx
                UNION ALL
                SELECT doc_id, array_to_string(ws, ' ')
                FROM toks WHERE len(ws) BETWEEN 1 AND 2
            )
            SELECT doc_id, COUNT(*) AS n_ngrams,
                   1.0 - (CAST(COUNT(DISTINCT s) AS DOUBLE) / COUNT(*)) AS dup_ratio
            FROM sh GROUP BY doc_id
        """,

        "decontaminate": r"""
            WITH d AS MATERIALIZED (
                SELECT doc_id, regexp_extract_all(lower(text), '[\w'']+') AS ws,
                       md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 AS b
                FROM documents
            ),
            sidx AS (
                SELECT doc_id, b, ws, unnest(range(1, len(ws)-6)) AS i
                FROM d WHERE len(ws) >= 8
            ),
            sh AS MATERIALIZED (
                SELECT DISTINCT doc_id, b,
                       md5_number_lower(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                           || ' ' || ws[i+3] || ' ' || ws[i+4] || ' ' || ws[i+5]
                           || ' ' || ws[i+6] || ' ' || ws[i+7]) AS h
                FROM sidx
                UNION
                SELECT DISTINCT doc_id, b, md5_number_lower(array_to_string(ws, ' '))
                FROM d WHERE len(ws) BETWEEN 1 AND 7
            ),
            train_h AS (SELECT DISTINCT h FROM sh WHERE b < 90),
            test_sh AS (SELECT doc_id, h FROM sh WHERE b >= 95)
            SELECT t.doc_id, COUNT(*) AS n_shingles,
                   COUNT(tr.h) AS n_shared,
                   COUNT(tr.h) > 0 AS contaminated
            FROM test_sh t LEFT JOIN train_h tr USING (h)
            GROUP BY t.doc_id
        """,

        # the whole prep chain in ONE statement: quality filter, exact md5
        # dedup, md5-MinHash-LSH near-dup closure (threshold 0.7), md5
        # split, per-shard greedy packing recurrence
        "prep_composite": r"""
            WITH RECURSIVE q AS MATERIALIZED (
                SELECT doc_id, text FROM documents
                WHERE len(regexp_extract_all(text, '\S+')) >= 5
                  AND length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g'))
                      / GREATEST(1, length(text)) <= 0.5
            ),
            ex AS MATERIALIZED (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)),
            exq AS MATERIALIZED (SELECT q.doc_id, q.text FROM q JOIN ex USING (doc_id)),
            toks AS MATERIALIZED (
                SELECT doc_id, regexp_extract_all(lower(text), '[\w'']+') AS ws
                FROM exq
            ),
            sidx AS MATERIALIZED (
                SELECT doc_id, ws, unnest(range(1, len(ws)-1)) AS i
                FROM toks WHERE len(ws) >= 3
            ),
            sh AS MATERIALIZED (
                SELECT doc_id,
                       md5_number_lower(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS h
                FROM sidx
                UNION ALL
                SELECT doc_id, md5_number_lower(array_to_string(ws, ' '))
                FROM toks WHERE len(ws) BETWEEN 1 AND 2
            ),
            perm(pi, a, b) AS (VALUES __PERM_VALS__),
            sig AS MATERIALIZED (
                SELECT doc_id, pi,
                       MIN((CAST(a AS HUGEINT) * CAST(h AS HUGEINT) + b)
                           % 2305843009213693951) AS mh
                FROM sh, perm GROUP BY doc_id, pi
            ),
            band0 AS MATERIALIZED (
                SELECT doc_id, pi // 8 AS band_id,
                       string_agg(CAST(mh AS VARCHAR), ',' ORDER BY pi) AS bkey
                FROM sig GROUP BY doc_id, pi // 8
            ),
            -- mirror of minhash_lsh_pairs' max_bucket cap: each band bucket
            -- keeps only its first 100000 members in doc_id order (the
            -- pipeline's deterministic ids-ascending prefix)
            band AS (
                SELECT doc_id, band_id, bkey FROM (
                    SELECT doc_id, band_id, bkey,
                           ROW_NUMBER() OVER (PARTITION BY band_id, bkey
                                              ORDER BY doc_id) AS rn
                    FROM band0)
                WHERE rn <= 100000
            ),
            cand AS MATERIALIZED (
                SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                FROM band x JOIN band y
                  ON x.band_id = y.band_id AND x.bkey = y.bkey
                 AND x.doc_id < y.doc_id
            ),
            est AS MATERIALIZED (
                SELECT c.id_a, c.id_b
                FROM cand c
                JOIN sig sa ON sa.doc_id = c.id_a
                JOIN sig sb ON sb.doc_id = c.id_b AND sb.pi = sa.pi
                GROUP BY c.id_a, c.id_b
                HAVING AVG(CASE WHEN sa.mh = sb.mh THEN 1.0 ELSE 0.0 END) >= 0.7
            ),
            edges AS MATERIALIZED (
                SELECT id_a AS node, id_b AS nbr FROM est
                UNION SELECT id_b, id_a FROM est
            ),
            reach AS (
                SELECT node, node AS r FROM (SELECT DISTINCT node FROM edges)
                UNION
                SELECT e.node, reach.r FROM edges e JOIN reach ON reach.node = e.nbr
            ),
            clus AS MATERIALIZED (SELECT node AS doc_id, MIN(r) AS cluster_id
                     FROM reach GROUP BY node),
            surv AS MATERIALIZED (
                SELECT exq.doc_id, exq.text FROM exq LEFT JOIN clus USING (doc_id)
                WHERE clus.doc_id IS NULL OR clus.cluster_id = exq.doc_id
            ),
            d AS MATERIALIZED (
                SELECT doc_id, doc_id % 8 AS shard,
                       len(regexp_extract_all(text, '\S+')) AS n_tokens,
                       ROW_NUMBER() OVER (PARTITION BY doc_id % 8
                                          ORDER BY doc_id) AS rn
                FROM surv
            ),
            packed AS (
                SELECT shard, rn, doc_id, n_tokens,
                       CAST(0 AS BIGINT) AS bin_id, n_tokens AS fill
                FROM d WHERE rn = 1
                UNION ALL
                SELECT d.shard, d.rn, d.doc_id, d.n_tokens,
                       CASE WHEN p.fill + d.n_tokens <= 512 THEN p.bin_id
                            ELSE p.bin_id + 1 END,
                       CASE WHEN p.fill + d.n_tokens <= 512
                            THEN p.fill + d.n_tokens ELSE d.n_tokens END
                FROM packed p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1
            )
            SELECT doc_id, shard, bin_id, n_tokens,
                   CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 90 THEN 'train'
                        WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 95 THEN 'val'
                        ELSE 'test' END AS split
            FROM packed
        """.replace("__PERM_VALS__", _perm_vals),

        "doc_sample_mixture": """
            SELECT doc_id, source, lang, n_chars FROM documents
            WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000000
                  < CASE source WHEN 'src0' THEN 1000000
                                WHEN 'src1' THEN 500000
                                WHEN 'src2' THEN 100000
                                ELSE 250000 END
        """,
        "doc_ccnet_buckets": r"""
            -- CCNet thirds: unigram score (same CTEs as doc_unigram_logprob,
            -- rounded 6 BEFORE ranking), per-language ROW_NUMBER election,
            -- bucket = 3*rank0 // n_lang in exact integer arithmetic
            WITH w AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[\w'']+')) AS token
                FROM documents
            ),
            tot AS (SELECT COUNT(*) AS total FROM w),
            cnts AS (SELECT token, COUNT(*) AS cnt FROM w GROUP BY token),
            topv AS (SELECT token, cnt FROM cnts ORDER BY cnt DESC, token LIMIT 256),
            sc AS (
                SELECT w.doc_id, COUNT(*) AS n_tokens,
                       ROUND(AVG(ln(COALESCE(t.cnt, 1) / (SELECT total FROM tot))), 6) AS logprob
                FROM w LEFT JOIN topv t USING (token)
                GROUP BY w.doc_id
            ),
            r AS (
                SELECT sc.doc_id, d.lang, sc.n_tokens, sc.logprob,
                       ROW_NUMBER() OVER (PARTITION BY d.lang
                                          ORDER BY sc.logprob DESC, sc.doc_id) - 1 AS rk,
                       COUNT(*) OVER (PARTITION BY d.lang) AS nl
                FROM sc JOIN documents d USING (doc_id)
            )
            SELECT doc_id, lang, n_tokens, logprob,
                   CAST(3 * rk // nl AS BIGINT) AS bucket,
                   CASE 3 * rk // nl WHEN 0 THEN 'head'
                        WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket_label
            FROM r
        """,
        "doc_unigram_logprob": r"""
            WITH w AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[\w'']+')) AS token
                FROM documents
            ),
            tot AS (SELECT COUNT(*) AS total FROM w),
            cnts AS (SELECT token, COUNT(*) AS cnt FROM w GROUP BY token),
            topv AS (SELECT token, cnt FROM cnts ORDER BY cnt DESC, token LIMIT 256)
            SELECT w.doc_id, COUNT(*) AS n_tokens,
                   ROUND(AVG(ln(COALESCE(t.cnt, 1) / (SELECT total FROM tot))), 6) AS logprob
            FROM w LEFT JOIN topv t USING (token)
            GROUP BY w.doc_id
        """,

        # add-one-smoothed bigram LM over the top-64 mapped vocab; the ln
        # sums are order-dependent only at the last ulp — ROUND 6 on both
        # sides (same contract as doc_unigram_logprob)
        "doc_bigram_logprob": r"""
            WITH w AS MATERIALIZED (
                SELECT doc_id, regexp_extract_all(lower(text), '[\w'']+') AS ws
                FROM documents
            ),
            tok AS (SELECT doc_id, unnest(ws) AS token FROM w),
            cnts AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
            topv AS MATERIALIZED (
                SELECT token FROM cnts ORDER BY cnt DESC, token LIMIT 64),
            bg AS MATERIALIZED (
                SELECT doc_id,
                       COALESCE(t1.token, '<unk>') AS w1,
                       COALESCE(t2.token, '<unk>') AS w2
                FROM (SELECT doc_id, ws[i] AS a, ws[i+1] AS b
                      FROM w, UNNEST(range(1, len(ws))) AS t(i)
                      WHERE len(ws) >= 2) p
                LEFT JOIN topv t1 ON t1.token = p.a
                LEFT JOIN topv t2 ON t2.token = p.b
            ),
            bc AS MATERIALIZED (
                SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
            c1 AS MATERIALIZED (
                SELECT w1, SUM(c12) AS c1 FROM bc GROUP BY w1),
            dk AS (SELECT doc_id, w1, w2, COUNT(*) AS k
                   FROM bg GROUP BY doc_id, w1, w2)
            SELECT dk.doc_id, CAST(SUM(k) AS BIGINT) AS n_bigrams,
                   ROUND(SUM(k * ln((bc.c12 + 1.0) / (c1.c1 + 65.0)))
                         / SUM(k), 6) AS logprob
            FROM dk JOIN bc USING (w1, w2) JOIN c1 USING (w1)
            GROUP BY dk.doc_id
        """,
        "doc_token_count": r"""
            SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS token_count
            FROM documents
        """,
        "doc_fingerprint": """
            SELECT doc_id, md5(text) AS fp FROM documents
        """,
        "doc_quality": r"""
            SELECT doc_id,
                   length(text) AS q_n_chars,
                   ROUND(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g'))
                         / GREATEST(1, length(text)), 6) AS q_punct_ratio,
                   ROUND(length(regexp_replace(text, '[^A-Z]', '', 'g'))
                         / GREATEST(1, length(text)), 6) AS q_upper_ratio
            FROM documents
        """,
        "dedup_jaccard": r"""
            WITH w AS (
                SELECT doc_id, regexp_extract_all(lower(text), '[\w'']+') AS ws
                FROM documents
            ), sh AS (
                SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
                FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3
                UNION
                SELECT doc_id, array_to_string(ws, ' ')
                FROM w WHERE len(ws) < 3 AND len(ws) > 0
            ), shd AS (
                SELECT DISTINCT doc_id, shingle FROM sh
            ), sizes AS (
                SELECT doc_id, count(*) AS sz FROM shd GROUP BY 1
            ), inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
                FROM shd a JOIN shd b USING (shingle)
                WHERE a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.2
        """,
        "dedup_jaccard_dfcut": r"""
            WITH w AS (
                SELECT doc_id, regexp_extract_all(lower(text), '[\w'']+') AS ws
                FROM documents
            ), sh AS (
                SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
                FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3
                UNION
                SELECT doc_id, array_to_string(ws, ' ')
                FROM w WHERE len(ws) < 3 AND len(ws) > 0
            ), shd AS (
                SELECT DISTINCT doc_id, shingle FROM sh
            ), surv AS (
                SELECT shingle FROM shd GROUP BY shingle HAVING count(*) <= 40
            ), shk AS (
                SELECT doc_id, shingle FROM shd JOIN surv USING (shingle)
            ), sizes AS (
                SELECT doc_id, count(*) AS sz FROM shk GROUP BY 1
            ), inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
                FROM shk a JOIN shk b USING (shingle)
                WHERE a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.2
        """,
        "dedup_clusters": r"""
            WITH RECURSIVE jac AS (
                SELECT id_a, id_b FROM (
            WITH w AS (
                SELECT doc_id, regexp_extract_all(lower(text), '[\w'']+') AS ws
                FROM documents
            ), sh AS (
                SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
                FROM w, UNNEST(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3
                UNION
                SELECT doc_id, array_to_string(ws, ' ')
                FROM w WHERE len(ws) < 3 AND len(ws) > 0
            ), shd AS (
                SELECT DISTINCT doc_id, shingle FROM sh
            ), sizes AS (
                SELECT doc_id, count(*) AS sz FROM shd GROUP BY 1
            ), inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
                FROM shd a JOIN shd b USING (shingle)
                WHERE a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.2
        )
            ), edges AS (
                SELECT id_a AS node, id_b AS nbr FROM jac
                UNION SELECT id_b, id_a FROM jac
            ), nodes AS (
                SELECT DISTINCT node FROM edges
            ), reach AS (
                SELECT node, node AS r FROM nodes
                UNION
                SELECT e.node, reach.r FROM edges e JOIN reach ON reach.node = e.nbr
            )
            SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
        """,

        # full md5 MinHash-LSH sketch in SQL: shingle strings ->
        # md5_number_lower u64 -> HUGEINT (a*x+b) mod Mersenne61 minima ->
        # 8 bands of 8 rows -> banded candidates -> signature-estimated
        # Jaccard (k/64 dyadic exact, safe unrounded) >= 0.5
        "dedup_minhash": r"""
            WITH toks AS (
                SELECT doc_id, regexp_extract_all(lower(text), '[\w'']+') AS ws
                FROM documents
            ),
            idx AS (
                SELECT doc_id, ws, unnest(range(1, len(ws)-1)) AS i
                FROM toks WHERE len(ws) >= 3
            ),
            sh AS (
                SELECT doc_id,
                       md5_number_lower(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS h
                FROM idx
                UNION ALL
                SELECT doc_id, md5_number_lower(array_to_string(ws, ' '))
                FROM toks WHERE len(ws) BETWEEN 1 AND 2
            ),
            perm(pi, a, b) AS (VALUES __PERM_VALS__),
            sig AS (
                SELECT doc_id, pi,
                       MIN((CAST(a AS HUGEINT) * CAST(h AS HUGEINT) + b)
                           % 2305843009213693951) AS mh
                FROM sh, perm GROUP BY doc_id, pi
            ),
            band0 AS (
                SELECT doc_id, pi // 8 AS band_id,
                       string_agg(CAST(mh AS VARCHAR), ',' ORDER BY pi) AS bkey
                FROM sig GROUP BY doc_id, pi // 8
            ),
            -- mirror of minhash_lsh_pairs' max_bucket cap: each band bucket
            -- keeps only its first 100000 members in doc_id order (the
            -- pipeline's deterministic ids-ascending prefix)
            band AS (
                SELECT doc_id, band_id, bkey FROM (
                    SELECT doc_id, band_id, bkey,
                           ROW_NUMBER() OVER (PARTITION BY band_id, bkey
                                              ORDER BY doc_id) AS rn
                    FROM band0)
                WHERE rn <= 100000
            ),
            cand AS (
                SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                FROM band x JOIN band y
                  ON x.band_id = y.band_id AND x.bkey = y.bkey
                 AND x.doc_id < y.doc_id
            ),
            est AS (
                SELECT c.id_a, c.id_b,
                       AVG(CASE WHEN sa.mh = sb.mh THEN 1.0 ELSE 0.0 END) AS est_jaccard
                FROM cand c
                JOIN sig sa ON sa.doc_id = c.id_a
                JOIN sig sb ON sb.doc_id = c.id_b AND sb.pi = sa.pi
                GROUP BY c.id_a, c.id_b
            )
            SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.5
        """.replace("__PERM_VALS__", _perm_vals),

        # full md5 SimHash in SQL: per-word md5 u64 -> 64 bit-votes ->
        # signature -> 4x16-bit bands -> banded pairs with Hamming <= 3
        "dedup_simhash": r"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[\w'']+')) AS w
                FROM documents
            ),
            wh AS (SELECT doc_id, md5_number_lower(w) AS h FROM toks),
            acc AS (
                SELECT doc_id, b,
                       SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS votes
                FROM wh CROSS JOIN generate_series(0, 63) AS t(b)
                GROUP BY doc_id, b
            ),
            sig AS (
                SELECT doc_id,
                       CAST(SUM(CASE WHEN votes > 0
                                THEN CAST(CAST(1 AS UBIGINT) << b AS HUGEINT)
                                ELSE 0 END) AS UBIGINT) AS sh
                FROM acc GROUP BY doc_id
            ),
            band AS (
                SELECT doc_id, bi, (sh >> (bi*16)) & 65535 AS bkey, sh
                FROM sig CROSS JOIN generate_series(0, 3) AS t(bi)
            ),
            cand AS (
                SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
                       x.sh AS ha, y.sh AS hb
                FROM band x JOIN band y
                  ON x.bi = y.bi AND x.bkey = y.bkey AND x.doc_id < y.doc_id
            )
            SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
            FROM cand WHERE bit_count(xor(ha, hb)) <= 3
        """,

        # hyperplane-LSH near-dup: bucket = 4 sign bits of dot(e, plane_i)
        # (planes inlined above), pairs within a bucket with cosine >= 0.2
        "embedding_neardup_lsh": """
            WITH emb AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
            ),
            buck AS (
                SELECT vec_id, e, __B0__ AS b0, __B1__ AS b1 FROM emb
            )
            -- banded LSH: a candidate pair shares ANY band's exact bucket
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_cosine_similarity(a.e, b.e), 6) AS cosine
            FROM buck a JOIN buck b
              ON (a.b0 = b.b0 OR a.b1 = b.b1) AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.e, b.e) >= 0.2
        """.replace("__B0__", _lsh_b0).replace("__B1__", _lsh_b1),

        "doc_langid": r"""
            WITH w AS (
                SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[\w'']+')) AS word
                FROM documents
            ), sc AS (
                SELECT d.doc_id,
                    COUNT(DISTINCT CASE WHEN word IN ('the','and','of','to','a','in','is','it','you','that') THEN word END) AS en,
                    COUNT(DISTINCT CASE WHEN word IN ('der','die','das','und','ist','nicht','ich','ein','zu','mit') THEN word END) AS de,
                    COUNT(DISTINCT CASE WHEN word IN ('le','la','et','les','des','est','un','une','que','pour') THEN word END) AS fr,
                    COUNT(DISTINCT CASE WHEN word IN ('el','la','los','las','es','un','una','que','por','para') THEN word END) AS es,
                    COUNT(DISTINCT CASE WHEN word IN ('il','la','che','di','è','un','una','per','non','sono') THEN word END) AS it
                FROM documents d LEFT JOIN w ON w.doc_id = d.doc_id
                GROUP BY d.doc_id
            )
            -- dict-order tie-break (en<de<fr<es<it): a later language wins
            -- only with a strictly greater score, which the CASE ladder
            -- encodes by falling through earlier >= checks
            SELECT doc_id, CASE
                WHEN en = 0 AND de = 0 AND fr = 0 AND es = 0 AND it = 0 THEN 'und'
                WHEN en >= de AND en >= fr AND en >= es AND en >= it THEN 'en'
                WHEN de >= fr AND de >= es AND de >= it THEN 'de'
                WHEN fr >= es AND fr >= it THEN 'fr'
                WHEN es >= it THEN 'es'
                ELSE 'it' END AS lang_pred
            FROM sc
        """,
        "ann_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings ORDER BY vec_id LIMIT 4
            ), s AS (
                SELECT q.query_id, v.vec_id,
                       ROUND(list_cosine_similarity(q.qe, CAST(v.embedding AS DOUBLE[])), 6)
                           AS cosine
                FROM q, embeddings v
                WHERE v.vec_id <> q.query_id
            ), r AS (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                             ORDER BY cosine DESC, vec_id) AS rn
                FROM s
            )
            SELECT query_id, vec_id, cosine FROM r WHERE rn <= 5
        """,
        "ann_ivf_full": """
            WITH q AS (
                SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings ORDER BY vec_id LIMIT 4
            ), s AS (
                SELECT q.query_id, v.vec_id,
                       ROUND(list_cosine_similarity(q.qe, CAST(v.embedding AS DOUBLE[])), 6)
                           AS cosine
                FROM q, embeddings v
                WHERE v.vec_id <> q.query_id
            ), r AS (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                             ORDER BY cosine DESC, vec_id) AS rn
                FROM s
            )
            SELECT query_id, vec_id, cosine FROM r WHERE rn <= 5
        """,
        "augment_pct_change": """
            SELECT event_id, user_id, value,
                   value / LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts) - 1
                       AS value_pctdiff_1
            FROM events
        """,
        "week_of_month": """
            SELECT event_id, CAST((day(ts) - 1) // 7 + 1 AS BIGINT) AS wom FROM events
        """,
        "weekday_sequence": """
            SELECT d FROM (
                SELECT UNNEST(generate_series(TIMESTAMP '2024-01-01',
                                              TIMESTAMP '2024-03-31', INTERVAL 1 DAY)) AS d
            ) WHERE isodow(d) <= 5
        """,
        "diag_acf_sql": """
            WITH m AS (
                SELECT user_id, AVG(value) AS mu FROM events GROUP BY 1
            ), c AS (
                SELECT e.user_id, e.ts, e.value - m.mu AS xc
                FROM events e JOIN m USING (user_id)
            ), l AS (
                SELECT user_id, ts, xc,
                       LAG(xc, 1) OVER w AS xc1,
                       LAG(xc, 2) OVER w AS xc2,
                       LAG(xc, 3) OVER w AS xc3,
                       LAG(xc, 4) OVER w AS xc4
                FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), s AS (
                SELECT user_id,
                       SUM(xc * xc)  AS s0,
                       SUM(xc * xc1) AS s1,
                       SUM(xc * xc2) AS s2,
                       SUM(xc * xc3) AS s3,
                       SUM(xc * xc4) AS s4
                FROM l GROUP BY user_id
            )
            SELECT user_id, metric, lag, ROUND(v, 6) AS value FROM (
                SELECT user_id, 'acf' AS metric, 0 AS lag, s0 / s0 AS v FROM s
                UNION ALL SELECT user_id, 'acf', 1, s1 / s0 FROM s
                UNION ALL SELECT user_id, 'acf', 2, s2 / s0 FROM s
                UNION ALL SELECT user_id, 'acf', 3, s3 / s0 FROM s
                UNION ALL SELECT user_id, 'acf', 4, s4 / s0 FROM s
                -- yw-mle PACF closed forms (biased autocovariances; the
                -- common 1/n cancels out of both ratios)
                UNION ALL SELECT user_id, 'pacf', 1, s1 / s0 FROM s
                UNION ALL SELECT user_id, 'pacf', 2,
                    (s0 * s2 - s1 * s1) / (s0 * s0 - s1 * s1) FROM s
            )
        """,
        "holiday_signature": """
            -- deterministic US-federal calendar around the events' Jan-2024 span
            WITH h AS (
                SELECT UNNEST(['2023-12-25','2024-01-01','2024-01-15','2024-02-19',
                               '2024-05-27','2024-06-19','2024-07-04']::DATE[]) AS d
            )
            SELECT event_id,
                   CAST(CAST(ts AS DATE) IN (SELECT d FROM h) AS BIGINT) AS is_holiday,
                   CAST(CAST(ts AS DATE) + 1 IN (SELECT d FROM h) AS BIGINT) AS before_holiday,
                   CAST(CAST(ts AS DATE) - 1 IN (SELECT d FROM h) AS BIGINT) AS after_holiday
            FROM events
        """,
        "holiday_signature_multi": """
            -- hand-derived UK (England & Wales) + DE nationwide holidays for
            -- 2024-2025 (Easter 2024-03-31, 2025-04-20), plus 2026-01-01 so
            -- the before_holiday flag is right at the range end
            WITH cal(country, hd, name) AS (
                VALUES
                ('UK', DATE '2024-01-01', 'New Year''s Day'),
                ('UK', DATE '2024-03-29', 'Good Friday'),
                ('UK', DATE '2024-04-01', 'Easter Monday'),
                ('UK', DATE '2024-05-06', 'Early May Bank Holiday'),
                ('UK', DATE '2024-05-27', 'Spring Bank Holiday'),
                ('UK', DATE '2024-08-26', 'Summer Bank Holiday'),
                ('UK', DATE '2024-12-25', 'Christmas Day'),
                ('UK', DATE '2024-12-26', 'Boxing Day'),
                ('UK', DATE '2025-01-01', 'New Year''s Day'),
                ('UK', DATE '2025-04-18', 'Good Friday'),
                ('UK', DATE '2025-04-21', 'Easter Monday'),
                ('UK', DATE '2025-05-05', 'Early May Bank Holiday'),
                ('UK', DATE '2025-05-26', 'Spring Bank Holiday'),
                ('UK', DATE '2025-08-25', 'Summer Bank Holiday'),
                ('UK', DATE '2025-12-25', 'Christmas Day'),
                ('UK', DATE '2025-12-26', 'Boxing Day'),
                ('UK', DATE '2026-01-01', 'New Year''s Day'),
                ('DE', DATE '2024-01-01', 'Neujahr'),
                ('DE', DATE '2024-03-29', 'Karfreitag'),
                ('DE', DATE '2024-04-01', 'Ostermontag'),
                ('DE', DATE '2024-05-01', 'Erster Mai'),
                ('DE', DATE '2024-05-09', 'Christi Himmelfahrt'),
                ('DE', DATE '2024-05-20', 'Pfingstmontag'),
                ('DE', DATE '2024-10-03', 'Tag der Deutschen Einheit'),
                ('DE', DATE '2024-12-25', 'Erster Weihnachtstag'),
                ('DE', DATE '2024-12-26', 'Zweiter Weihnachtstag'),
                ('DE', DATE '2025-01-01', 'Neujahr'),
                ('DE', DATE '2025-04-18', 'Karfreitag'),
                ('DE', DATE '2025-04-21', 'Ostermontag'),
                ('DE', DATE '2025-05-01', 'Erster Mai'),
                ('DE', DATE '2025-05-29', 'Christi Himmelfahrt'),
                ('DE', DATE '2025-06-09', 'Pfingstmontag'),
                ('DE', DATE '2025-10-03', 'Tag der Deutschen Einheit'),
                ('DE', DATE '2025-12-25', 'Erster Weihnachtstag'),
                ('DE', DATE '2025-12-26', 'Zweiter Weihnachtstag'),
                ('DE', DATE '2026-01-01', 'Neujahr')
            ),
            days AS (
                SELECT UNNEST(generate_series(TIMESTAMP '2024-01-01',
                                              TIMESTAMP '2025-12-31',
                                              INTERVAL 1 DAY)) AS d
            ),
            cc(country) AS (VALUES ('UK'), ('DE'))
            SELECT cc.country, days.d,
                   CAST(EXISTS(SELECT 1 FROM cal WHERE cal.country = cc.country
                               AND cal.hd = CAST(days.d AS DATE)) AS BIGINT) AS is_holiday,
                   CAST(EXISTS(SELECT 1 FROM cal WHERE cal.country = cc.country
                               AND cal.hd = CAST(days.d AS DATE) + 1) AS BIGINT) AS before_holiday,
                   CAST(EXISTS(SELECT 1 FROM cal WHERE cal.country = cc.country
                               AND cal.hd = CAST(days.d AS DATE) - 1) AS BIGINT) AS after_holiday,
                   (SELECT name FROM cal WHERE cal.country = cc.country
                    AND cal.hd = CAST(days.d AS DATE)) AS holiday_name
            FROM days CROSS JOIN cc
        """,
        "holiday_signature_kr_cn_za": """
            -- hand-derived official 2024-2025 calendars for the round-5
            -- builtins: KR Gregorian-dated subset (substitute Mondays:
            -- Children's Day 2024-05-05 Sun -> 05-06; Independence Movement
            -- Day 2025-03-01 Sat -> 03-03; lunisolar holidays documented
            -- out of scope), CN fixed + Qingming (2024-04-04, 2025-04-04),
            -- ZA Public Holidays Act incl. Sunday rule (Youth Day
            -- 2024-06-16 Sun -> 06-17; Freedom Day 2025-04-27 Sun -> 04-28);
            -- 2026-01-01 closes the range for before_holiday
            WITH cal(country, hd, name) AS (
                VALUES
                ('KR', DATE '2024-01-01', 'New Year''s Day'),
                ('KR', DATE '2024-03-01', 'Independence Movement Day'),
                ('KR', DATE '2024-05-05', 'Children''s Day'),
                ('KR', DATE '2024-05-06', 'Children''s Day (substitute)'),
                ('KR', DATE '2024-06-06', 'Memorial Day'),
                ('KR', DATE '2024-08-15', 'Liberation Day'),
                ('KR', DATE '2024-10-03', 'National Foundation Day'),
                ('KR', DATE '2024-10-09', 'Hangeul Day'),
                ('KR', DATE '2024-12-25', 'Christmas Day'),
                ('KR', DATE '2025-01-01', 'New Year''s Day'),
                ('KR', DATE '2025-03-01', 'Independence Movement Day'),
                ('KR', DATE '2025-03-03', 'Independence Movement Day (substitute)'),
                ('KR', DATE '2025-05-05', 'Children''s Day'),
                ('KR', DATE '2025-06-06', 'Memorial Day'),
                ('KR', DATE '2025-08-15', 'Liberation Day'),
                ('KR', DATE '2025-10-03', 'National Foundation Day'),
                ('KR', DATE '2025-10-09', 'Hangeul Day'),
                ('KR', DATE '2025-12-25', 'Christmas Day'),
                ('KR', DATE '2026-01-01', 'New Year''s Day'),
                ('CN', DATE '2024-01-01', 'New Year''s Day'),
                ('CN', DATE '2024-04-04', 'Qingming Festival'),
                ('CN', DATE '2024-05-01', 'Labour Day'),
                ('CN', DATE '2024-10-01', 'National Day'),
                ('CN', DATE '2024-10-02', 'National Day'),
                ('CN', DATE '2024-10-03', 'National Day'),
                ('CN', DATE '2025-01-01', 'New Year''s Day'),
                ('CN', DATE '2025-04-04', 'Qingming Festival'),
                ('CN', DATE '2025-05-01', 'Labour Day'),
                ('CN', DATE '2025-10-01', 'National Day'),
                ('CN', DATE '2025-10-02', 'National Day'),
                ('CN', DATE '2025-10-03', 'National Day'),
                ('CN', DATE '2026-01-01', 'New Year''s Day'),
                ('ZA', DATE '2024-01-01', 'New Year''s Day'),
                ('ZA', DATE '2024-03-21', 'Human Rights Day'),
                ('ZA', DATE '2024-03-29', 'Good Friday'),
                ('ZA', DATE '2024-04-01', 'Family Day'),
                ('ZA', DATE '2024-04-27', 'Freedom Day'),
                ('ZA', DATE '2024-05-01', 'Workers'' Day'),
                ('ZA', DATE '2024-06-16', 'Youth Day'),
                ('ZA', DATE '2024-06-17', 'Youth Day (observed)'),
                ('ZA', DATE '2024-08-09', 'National Women''s Day'),
                ('ZA', DATE '2024-09-24', 'Heritage Day'),
                ('ZA', DATE '2024-12-16', 'Day of Reconciliation'),
                ('ZA', DATE '2024-12-25', 'Christmas Day'),
                ('ZA', DATE '2024-12-26', 'Day of Goodwill'),
                ('ZA', DATE '2025-01-01', 'New Year''s Day'),
                ('ZA', DATE '2025-03-21', 'Human Rights Day'),
                ('ZA', DATE '2025-04-18', 'Good Friday'),
                ('ZA', DATE '2025-04-21', 'Family Day'),
                ('ZA', DATE '2025-04-27', 'Freedom Day'),
                ('ZA', DATE '2025-04-28', 'Freedom Day (observed)'),
                ('ZA', DATE '2025-05-01', 'Workers'' Day'),
                ('ZA', DATE '2025-06-16', 'Youth Day'),
                ('ZA', DATE '2025-08-09', 'National Women''s Day'),
                ('ZA', DATE '2025-09-24', 'Heritage Day'),
                ('ZA', DATE '2025-12-16', 'Day of Reconciliation'),
                ('ZA', DATE '2025-12-25', 'Christmas Day'),
                ('ZA', DATE '2025-12-26', 'Day of Goodwill'),
                ('ZA', DATE '2026-01-01', 'New Year''s Day')
            ),
            days AS (
                SELECT UNNEST(generate_series(TIMESTAMP '2024-01-01',
                                              TIMESTAMP '2025-12-31',
                                              INTERVAL 1 DAY)) AS d
            ),
            cc(country) AS (VALUES ('KR'), ('CN'), ('ZA'))
            SELECT cc.country, days.d,
                   CAST(EXISTS(SELECT 1 FROM cal WHERE cal.country = cc.country
                               AND cal.hd = CAST(days.d AS DATE)) AS BIGINT) AS is_holiday,
                   CAST(EXISTS(SELECT 1 FROM cal WHERE cal.country = cc.country
                               AND cal.hd = CAST(days.d AS DATE) + 1) AS BIGINT) AS before_holiday,
                   CAST(EXISTS(SELECT 1 FROM cal WHERE cal.country = cc.country
                               AND cal.hd = CAST(days.d AS DATE) - 1) AS BIGINT) AS after_holiday,
                   (SELECT name FROM cal WHERE cal.country = cc.country
                    AND cal.hd = CAST(days.d AS DATE)) AS holiday_name
            FROM days CROSS JOIN cc
        """,
        "holiday_signature_4ctry": """
            -- hand-derived official 2024-2025 calendars: JP (Public Holiday
            -- Law incl. furikae substitutes; equinoxes 2024-03-20/09-22,
            -- 2025-03-20/09-23), MX (LFT art. 74 Monday rules + 2024-10-01
            -- sexennial transmission), BR (feriados nacionais + Good Friday
            -- 2024-03-29 / 2025-04-18; Consciencia Negra from 2024), IN
            -- (three gazetted national dates); 2026-01-01 closes the range
            WITH cal(country, hd, name) AS (
                VALUES
                ('JP', DATE '2024-01-01', 'New Year''s Day'),
                ('JP', DATE '2024-01-08', 'Coming of Age Day'),
                ('JP', DATE '2024-02-11', 'National Foundation Day'),
                ('JP', DATE '2024-02-12', 'National Foundation Day (observed)'),
                ('JP', DATE '2024-02-23', 'Emperor''s Birthday'),
                ('JP', DATE '2024-03-20', 'Vernal Equinox Day'),
                ('JP', DATE '2024-04-29', 'Showa Day'),
                ('JP', DATE '2024-05-03', 'Constitution Memorial Day'),
                ('JP', DATE '2024-05-04', 'Greenery Day'),
                ('JP', DATE '2024-05-05', 'Children''s Day'),
                ('JP', DATE '2024-05-06', 'Children''s Day (observed)'),
                ('JP', DATE '2024-07-15', 'Marine Day'),
                ('JP', DATE '2024-08-11', 'Mountain Day'),
                ('JP', DATE '2024-08-12', 'Mountain Day (observed)'),
                ('JP', DATE '2024-09-16', 'Respect for the Aged Day'),
                ('JP', DATE '2024-09-22', 'Autumnal Equinox Day'),
                ('JP', DATE '2024-09-23', 'Autumnal Equinox Day (observed)'),
                ('JP', DATE '2024-10-14', 'Sports Day'),
                ('JP', DATE '2024-11-03', 'Culture Day'),
                ('JP', DATE '2024-11-04', 'Culture Day (observed)'),
                ('JP', DATE '2024-11-23', 'Labor Thanksgiving Day'),
                ('JP', DATE '2025-01-01', 'New Year''s Day'),
                ('JP', DATE '2025-01-13', 'Coming of Age Day'),
                ('JP', DATE '2025-02-11', 'National Foundation Day'),
                ('JP', DATE '2025-02-23', 'Emperor''s Birthday'),
                ('JP', DATE '2025-02-24', 'Emperor''s Birthday (observed)'),
                ('JP', DATE '2025-03-20', 'Vernal Equinox Day'),
                ('JP', DATE '2025-04-29', 'Showa Day'),
                ('JP', DATE '2025-05-03', 'Constitution Memorial Day'),
                ('JP', DATE '2025-05-04', 'Greenery Day'),
                ('JP', DATE '2025-05-05', 'Children''s Day'),
                ('JP', DATE '2025-05-06', 'Greenery Day (observed)'),
                ('JP', DATE '2025-07-21', 'Marine Day'),
                ('JP', DATE '2025-08-11', 'Mountain Day'),
                ('JP', DATE '2025-09-15', 'Respect for the Aged Day'),
                ('JP', DATE '2025-09-23', 'Autumnal Equinox Day'),
                ('JP', DATE '2025-10-13', 'Sports Day'),
                ('JP', DATE '2025-11-03', 'Culture Day'),
                ('JP', DATE '2025-11-23', 'Labor Thanksgiving Day'),
                ('JP', DATE '2025-11-24', 'Labor Thanksgiving Day (observed)'),
                ('JP', DATE '2026-01-01', 'New Year''s Day'),
                ('MX', DATE '2024-01-01', 'Ano Nuevo'),
                ('MX', DATE '2024-02-05', 'Dia de la Constitucion'),
                ('MX', DATE '2024-03-18', 'Natalicio de Benito Juarez'),
                ('MX', DATE '2024-05-01', 'Dia del Trabajo'),
                ('MX', DATE '2024-09-16', 'Dia de la Independencia'),
                ('MX', DATE '2024-10-01', 'Transmision del Poder Ejecutivo Federal'),
                ('MX', DATE '2024-11-18', 'Revolucion Mexicana'),
                ('MX', DATE '2024-12-25', 'Navidad'),
                ('MX', DATE '2025-01-01', 'Ano Nuevo'),
                ('MX', DATE '2025-02-03', 'Dia de la Constitucion'),
                ('MX', DATE '2025-03-17', 'Natalicio de Benito Juarez'),
                ('MX', DATE '2025-05-01', 'Dia del Trabajo'),
                ('MX', DATE '2025-09-16', 'Dia de la Independencia'),
                ('MX', DATE '2025-11-17', 'Revolucion Mexicana'),
                ('MX', DATE '2025-12-25', 'Navidad'),
                ('MX', DATE '2026-01-01', 'Ano Nuevo'),
                ('BR', DATE '2024-01-01', 'Confraternizacao Universal'),
                ('BR', DATE '2024-03-29', 'Sexta-feira Santa'),
                ('BR', DATE '2024-04-21', 'Tiradentes'),
                ('BR', DATE '2024-05-01', 'Dia do Trabalhador'),
                ('BR', DATE '2024-09-07', 'Independencia do Brasil'),
                ('BR', DATE '2024-10-12', 'Nossa Senhora Aparecida'),
                ('BR', DATE '2024-11-02', 'Finados'),
                ('BR', DATE '2024-11-15', 'Proclamacao da Republica'),
                ('BR', DATE '2024-11-20', 'Dia Nacional de Zumbi e da Consciencia Negra'),
                ('BR', DATE '2024-12-25', 'Natal'),
                ('BR', DATE '2025-01-01', 'Confraternizacao Universal'),
                ('BR', DATE '2025-04-18', 'Sexta-feira Santa'),
                ('BR', DATE '2025-04-21', 'Tiradentes'),
                ('BR', DATE '2025-05-01', 'Dia do Trabalhador'),
                ('BR', DATE '2025-09-07', 'Independencia do Brasil'),
                ('BR', DATE '2025-10-12', 'Nossa Senhora Aparecida'),
                ('BR', DATE '2025-11-02', 'Finados'),
                ('BR', DATE '2025-11-15', 'Proclamacao da Republica'),
                ('BR', DATE '2025-11-20', 'Dia Nacional de Zumbi e da Consciencia Negra'),
                ('BR', DATE '2025-12-25', 'Natal'),
                ('BR', DATE '2026-01-01', 'Confraternizacao Universal'),
                ('IN', DATE '2024-01-26', 'Republic Day'),
                ('IN', DATE '2024-08-15', 'Independence Day'),
                ('IN', DATE '2024-10-02', 'Gandhi Jayanti'),
                ('IN', DATE '2025-01-26', 'Republic Day'),
                ('IN', DATE '2025-08-15', 'Independence Day'),
                ('IN', DATE '2025-10-02', 'Gandhi Jayanti')
            ),
            days AS (
                SELECT UNNEST(generate_series(TIMESTAMP '2024-01-01',
                                              TIMESTAMP '2025-12-31',
                                              INTERVAL 1 DAY)) AS d
            ),
            cc(country) AS (VALUES ('JP'), ('MX'), ('BR'), ('IN'))
            SELECT cc.country, days.d,
                   CAST(EXISTS(SELECT 1 FROM cal WHERE cal.country = cc.country
                               AND cal.hd = CAST(days.d AS DATE)) AS BIGINT) AS is_holiday,
                   CAST(EXISTS(SELECT 1 FROM cal WHERE cal.country = cc.country
                               AND cal.hd = CAST(days.d AS DATE) + 1) AS BIGINT) AS before_holiday,
                   CAST(EXISTS(SELECT 1 FROM cal WHERE cal.country = cc.country
                               AND cal.hd = CAST(days.d AS DATE) - 1) AS BIGINT) AS after_holiday,
                   (SELECT name FROM cal WHERE cal.country = cc.country
                    AND cal.hd = CAST(days.d AS DATE)) AS holiday_name
            FROM days CROSS JOIN cc
        """,
        "sessions": """
            WITH d AS (
                SELECT event_id, user_id, ts,
                       CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                 > INTERVAL 2 HOUR THEN 1 ELSE 0 END AS brk
                FROM events
            )
            SELECT event_id, user_id,
                   -- CAST: SUM -> HUGEINT -> pandas float64; the driver's
                   -- value hash is type-sensitive (int64 2 != double 2.0)
                   CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS session_id
            FROM d
        """,
        "fin_roc_drawdown": """
            SELECT event_id, user_id, value,
                   (value - LAG(value, 3) OVER w) / LAG(value, 3) OVER w AS value_roc_0_3,
                   MAX(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS value_peak,
                   value - MAX(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS value_drawdown,
                   (value - MAX(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                       / MAX(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS value_drawdown_pct
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        """,
        "fin_bbands": """
            SELECT event_id, user_id,
                   CASE WHEN ROW_NUMBER() OVER w >= 10
                        THEN ROUND(AVG(value) OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6)
                   END AS value_bband_middle_10_2,
                   CASE WHEN ROW_NUMBER() OVER w >= 10
                        THEN ROUND(AVG(value) OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
                             + 2 * stddev_samp(value) OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6)
                   END AS value_bband_upper_10_2,
                   CASE WHEN ROW_NUMBER() OVER w >= 10
                        THEN ROUND(AVG(value) OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
                             - 2 * stddev_samp(value) OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6)
                   END AS value_bband_lower_10_2
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        """,
        "fin_rsi": """
            WITH d AS (
                SELECT event_id, user_id, ts,
                       value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts) AS delta
                FROM events
            ), gl AS (
                SELECT event_id, user_id, ts,
                       CASE WHEN delta > 0 THEN delta ELSE 0 END AS gains,
                       CASE WHEN delta < 0 THEN -delta ELSE 0 END AS losses
                FROM d
            )
            SELECT event_id, user_id,
                   CASE WHEN ROW_NUMBER() OVER w >= 14
                        THEN ROUND(100 - 100 / (1 +
                             (AVG(gains) OVER (w ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
                             / (AVG(losses) OVER (w ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))), 6)
                   END AS value_rsi_14
            FROM gl WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        """,
        "floor_ceil_dates": """
            SELECT event_id,
                   date_trunc('hour', ts) AS floor_1h,
                   CASE WHEN ts = date_trunc('hour', ts) THEN ts
                        ELSE date_trunc('hour', ts) + INTERVAL 1 HOUR END AS ceil_1h,
                   date_trunc('month', ts) AS floor_month,
                   CASE WHEN ts = date_trunc('month', ts) THEN ts
                        ELSE date_trunc('month', ts) + INTERVAL 1 MONTH END AS ceil_month
            FROM events
        """,
        "filter_by_time_month": """
            SELECT * FROM events
            WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
              AND ts <= TIMESTAMP '2024-01-31 23:59:59.999999'
        """,
        "weekend_sequence": """
            SELECT d FROM (
                SELECT UNNEST(generate_series(TIMESTAMP '2024-01-01',
                                              TIMESTAMP '2024-03-31', INTERVAL 1 DAY)) AS d
            ) WHERE isodow(d) >= 6
        """,
        "future_frame_bind": """
            SELECT user_id, ts FROM events
            UNION ALL
            SELECT user_id,
                   UNNEST(generate_series(mx + INTERVAL 1 HOUR, mx + INTERVAL 3 HOUR,
                                          INTERVAL 1 HOUR)) AS ts
            FROM (SELECT user_id, MAX(ts) AS mx FROM events GROUP BY 1)
        """,
        "drop_zero_variance": """
            SELECT event_id, ts, user_id, event_type, value, props FROM events
        """,
        "doc_stop_ratio": r"""
            WITH w AS (
                SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '[\w'']+')) AS word
                FROM documents
            ), c AS (
                SELECT d.doc_id, count(w.word) AS n,
                       count(CASE WHEN w.word IN ('the','and','of','to','a','in',
                                                  'is','it','you','that')
                                  THEN 1 END) AS ns
                FROM documents d LEFT JOIN w ON w.doc_id = d.doc_id
                GROUP BY d.doc_id
            )
            SELECT doc_id, n AS q_n_tokens,
                   CAST(ns AS DOUBLE) / GREATEST(1, n) AS q_stop_ratio
            FROM c
        """,
        "rolling_apply": """
            SELECT event_id, user_id,
                   CASE WHEN ROW_NUMBER() OVER w >= 5 THEN
                       MAX(value) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                       - MIN(value) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                   END AS rolling_range_win_5
            FROM events WHERE user_id < 30
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        """,
        "expanding_apply": """
            SELECT event_id, user_id,
                   MAX(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - MIN(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS expanding_vrange
            FROM events WHERE user_id < 30
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        """,
        "ts_features": """
            WITH o AS (
                SELECT user_id, value,
                       ROW_NUMBER() OVER w AS rn
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), srt AS (
                SELECT user_id, value,
                       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value) AS r2,
                       COUNT(*) OVER (PARTITION BY user_id) AS n
                FROM events
            ), med AS (
                -- np.median: mean of the two middle order statistics
                SELECT user_id,
                       (MAX(CASE WHEN r2 = (n + 1) // 2 THEN value END)
                        + MAX(CASE WHEN r2 = n // 2 + 1 THEN value END)) / 2 AS med
                FROM srt GROUP BY user_id
            ), cp AS (
                SELECT user_id,
                       SUM(CASE WHEN below <> prev THEN 1 ELSE 0 END) AS crossing_points
                FROM (SELECT o.user_id,
                             CASE WHEN o.value <= m.med THEN 1 ELSE 0 END AS below,
                             LAG(CASE WHEN o.value <= m.med THEN 1 ELSE 0 END)
                                 OVER (PARTITION BY o.user_id ORDER BY o.rn) AS prev
                      FROM o JOIN med m USING (user_id))
                WHERE prev IS NOT NULL GROUP BY user_id
            ), c AS (
                SELECT user_id, AVG(value) AS mu FROM events GROUP BY 1
            ), a1pre AS (
                SELECT e.user_id, e.value - c.mu AS xc,
                       LAG(e.value - c.mu) OVER (PARTITION BY e.user_id ORDER BY e.ts) AS xp
                FROM events e JOIN c USING (user_id)
            ), a1 AS (
                SELECT user_id, SUM(xc * xp) / SUM(xc * xc) AS acf1
                FROM a1pre GROUP BY 1
            ), tiles AS (
                SELECT user_id, (rn - 1) // 10 AS tile,
                       AVG(value) AS tmean, var_samp(value) AS tvar
                FROM o GROUP BY 1, 2
            ), sl AS (
                SELECT user_id, var_samp(tmean) AS stability,
                       var_samp(tvar) AS lumpiness
                FROM tiles GROUP BY user_id
            ), base AS (
                SELECT user_id, COUNT(*) AS length FROM events GROUP BY 1
            )
            SELECT b.user_id, b.length,
                   ROUND(a1.acf1, 6) AS acf1,
                   CAST(cp.crossing_points AS BIGINT) AS crossing_points,
                   ROUND(sl.stability, 3) AS stability,
                   ROUND(sl.lumpiness, 3) AS lumpiness
            FROM base b
            JOIN a1 USING (user_id)
            JOIN cp USING (user_id)
            JOIN sl USING (user_id)
        """,
        "cv_folds": """
            WITH t0 AS (SELECT MIN(ts) AS lo FROM events),
            folds AS (
                SELECT i AS fold,
                       lo + i * (INTERVAL 3 DAY) AS tr_s,
                       lo + i * (INTERVAL 3 DAY) + INTERVAL 10 DAY AS tr_e
                FROM t0, (SELECT UNNEST([0, 1, 2]) AS i) AS f(i)
            )
            SELECT e.event_id, f.fold, 'train' AS split
            FROM events e JOIN folds f
              ON e.ts >= f.tr_s AND e.ts < f.tr_e
            UNION ALL
            SELECT e.event_id, f.fold, 'test'
            FROM events e JOIN folds f
              ON e.ts >= f.tr_e AND e.ts < f.tr_e + INTERVAL 3 DAY
        """,
        "spline_sql": _bspline_sql([100.0, 250.0], 0.0, 500.0),
        "hilbert_sql": _hilbert_sql(),
        "wavelet_sql": _wavelet_sql(),
        "ts_features_ext": """
            WITH v AS (
                SELECT user_id, CAST(value AS DOUBLE) AS x,
                       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS i,
                       COUNT(*) OVER (PARTITION BY user_id) AS n,
                       AVG(value) OVER (PARTITION BY user_id) AS mu
                FROM events
            ),
            kp AS (  -- demeaned series, KPSS partial sums, Bartlett lag l
                SELECT user_id, i, n, x, x - mu AS e,
                       SUM(x - mu) OVER (PARTITION BY user_id ORDER BY i) AS S,
                       CAST(TRUNC(4 * POWER(n / 100.0, 0.25)) AS BIGINT) AS l
                FROM v
            ),
            ar AS (  -- arch_lm with 1 lag: R^2 of intercept OLS = corr^2
                SELECT a.user_id, POWER(CORR(a.e * a.e, b.e * b.e), 2) AS arch_lm
                FROM kp a JOIN kp b ON b.user_id = a.user_id AND b.i = a.i - 1
                GROUP BY 1
            ),
            js AS (SELECT UNNEST(generate_series(0,
                       (SELECT MAX(l) FROM kp))) AS j),
            gl AS (  -- autocovariances g_j = sum(e_t e_{t-j}) / n, j = 0..l
                SELECT a.user_id, js.j, MAX(a.l) AS l,
                       SUM(a.e * b.e) / MAX(a.n) AS gj
                FROM js, kp a JOIN kp b
                  ON b.user_id = a.user_id AND b.i = a.i - js.j
                WHERE js.j <= a.l
                GROUP BY 1, 2
            ),
            lrv AS (
                SELECT user_id,
                       SUM(CASE WHEN j = 0 THEN gj
                                ELSE 2 * (1 - j / (l + 1.0)) * gj END) AS s2
                FROM gl GROUP BY 1
            ),
            kpss AS (
                SELECT kp.user_id,
                       SUM(S * S) / (MAX(kp.n) * MAX(kp.n) * MAX(lrv.s2)) AS unitroot_kpss
                FROM kp JOIN lrv ON lrv.user_id = kp.user_id
                GROUP BY 1
            ),
            hs AS (  -- full-series R/S hurst
                SELECT user_id, MAX(n) AS n, MAX(S) - MIN(S) AS r,
                       SQRT(SUM(e * e) / MAX(n)) AS s
                FROM kp GROUP BY 1
            ),
            hurst AS (
                SELECT user_id, LN(r / s) / LN(n) AS hurst FROM hs
            ),
            pp0 AS (  -- (y_t, y_{t-1}) pairs for the PP regression
                SELECT a.user_id, a.i, a.x AS y, b.x AS y1, a.n - 1 AS m
                FROM v a JOIN v b ON b.user_id = a.user_id AND b.i = a.i - 1
            ),
            ppa AS (
                SELECT user_id, AVG(y) AS ybar, AVG(y1) AS y1bar, MAX(m) AS m
                FROM pp0 GROUP BY 1
            ),
            ppr AS (  -- rho / intercept terms, demeaned case
                SELECT p.user_id,
                       SUM((p.y1 - a.y1bar) * (p.y - a.ybar))
                         / SUM((p.y1 - a.y1bar) * (p.y1 - a.y1bar)) AS rho,
                       SUM((p.y1 - a.y1bar) * (p.y1 - a.y1bar)) AS dx,
                       MAX(a.ybar) AS ybar, MAX(a.y1bar) AS y1bar, MAX(p.m) AS m
                FROM pp0 p JOIN ppa a ON a.user_id = p.user_id
                GROUP BY 1
            ),
            ppu AS (  -- regression residuals + Bartlett lag for them
                SELECT p.user_id, p.i,
                       p.y - (r.ybar - r.rho * r.y1bar) - r.rho * p.y1 AS u,
                       r.m, r.rho, r.dx,
                       CAST(TRUNC(4 * POWER(r.m / 100.0, 0.25)) AS BIGINT) AS l
                FROM pp0 p JOIN ppr r ON r.user_id = p.user_id
            ),
            pjs AS (SELECT UNNEST(generate_series(0,
                        (SELECT MAX(l) FROM ppu))) AS j),
            pgl AS (
                SELECT a.user_id, pjs.j, MAX(a.l) AS l, MAX(a.m) AS m,
                       MAX(a.rho) AS rho, MAX(a.dx) AS dx,
                       SUM(a.u * b.u) / MAX(a.m) AS gj
                FROM pjs, ppu a JOIN ppu b
                  ON b.user_id = a.user_id AND b.i = a.i - pjs.j
                WHERE pjs.j <= a.l
                GROUP BY 1, 2
            ),
            pp AS (
                SELECT user_id,
                       MAX(m) * (MAX(rho) - 1)
                       - MAX(m) * MAX(m)
                         * (SUM(CASE WHEN j = 0 THEN gj
                                     ELSE 2 * (1 - j / (l + 1.0)) * gj END)
                            - MAX(CASE WHEN j = 0 THEN gj END))
                         / (2 * MAX(dx)) AS unitroot_pp
                FROM pgl GROUP BY 1
            )
            SELECT v2.user_id, v2.n AS length,
                   ROUND(ar.arch_lm, 6)        AS arch_lm,
                   ROUND(kpss.unitroot_kpss, 6) AS unitroot_kpss,
                   ROUND(pp.unitroot_pp, 6)     AS unitroot_pp,
                   ROUND(hurst.hurst, 6)        AS hurst
            FROM (SELECT DISTINCT user_id, n FROM v) v2
            JOIN ar    ON ar.user_id = v2.user_id
            JOIN kpss  ON kpss.user_id = v2.user_id
            JOIN pp    ON pp.user_id = v2.user_id
            JOIN hurst ON hurst.user_id = v2.user_id
        """,
        "cv_folds_backward": """
            WITH t0 AS (SELECT MAX(ts) AS hi FROM events),
            folds AS (
                SELECT (2 - k) AS fold,
                       hi + INTERVAL 1 MICROSECOND - k * (INTERVAL 3 DAY) AS te_e
                FROM t0, (SELECT UNNEST([0, 1, 2]) AS k) AS f(k)
            )
            SELECT e.event_id, f.fold, 'train' AS split
            FROM events e JOIN folds f
              ON e.ts >= f.te_e - INTERVAL 13 DAY AND e.ts < f.te_e - INTERVAL 3 DAY
            UNION ALL
            SELECT e.event_id, f.fold, 'test'
            FROM events e JOIN folds f
              ON e.ts >= f.te_e - INTERVAL 3 DAY AND e.ts < f.te_e
        """,
        "frequency_summary": """
            WITH d AS (
                SELECT user_id,
                       epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                           AS du
                FROM events
            ), m AS (
                SELECT user_id, quantile_cont(du, 0.5) / 1e6 AS med FROM d GROUP BY 1
            ), u AS (
                SELECT user_id, med,
                       CASE WHEN med IS NULL THEN NULL
                            WHEN med < 60 THEN 'S' WHEN med < 3600 THEN 'T'
                            WHEN med < 86400 THEN 'H' WHEN med < 604800 THEN 'D'
                            WHEN med < 2630016 THEN 'W' WHEN med < 7890048 THEN 'M'
                            WHEN med < 31557600 THEN 'Q' ELSE 'Y' END AS unit,
                       CASE WHEN med < 60 THEN med WHEN med < 3600 THEN med / 60
                            WHEN med < 86400 THEN med / 3600
                            WHEN med < 604800 THEN med / 86400
                            WHEN med < 2630016 THEN med / 604800
                            WHEN med < 7890048 THEN med / (30.44 * 86400)
                            WHEN med < 31557600 THEN med / (3 * 30.44 * 86400)
                            ELSE med / (365.25 * 86400) END AS scale
                FROM m
            )
            SELECT user_id,
                   ROUND(scale, 6) AS freq_median_scale,
                   unit AS freq_median_unit,
                   CASE WHEN unit IS NULL THEN NULL
                        WHEN unit = 'S' THEN '1H' WHEN unit = 'T' THEN '1D'
                        WHEN unit = 'H' THEN '1D' WHEN unit = 'D' THEN '1W'
                        WHEN unit = 'W' THEN '1Q' WHEN unit = 'M' THEN '1Y'
                        WHEN unit = 'Q' THEN '1Y' ELSE '5Y' END AS seasonal_period,
                   CASE WHEN unit IS NULL THEN NULL
                        WHEN unit = 'S' THEN '12H' WHEN unit = 'T' THEN '14D'
                        WHEN unit = 'H' THEN '1M' WHEN unit = 'D' THEN '1Q'
                        WHEN unit = 'W' THEN '1Y' WHEN unit = 'M' THEN '5Y'
                        WHEN unit = 'Q' THEN '10Y' ELSE '30Y' END AS trend_period
            FROM u
        """,
        "seasonal_diag": """
            WITH d AS (
                SELECT user_id, ts,
                       epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                           AS du
                FROM events
            ), m AS (
                SELECT user_id, quantile_cont(du, 0.5) / 1e6 AS med FROM d GROUP BY 1
            ), b AS (
                SELECT user_id,
                       CASE WHEN med IS NULL THEN 1
                            WHEN med < 60 THEN 1
                            WHEN med < 3600 THEN 2
                            WHEN med < 86400 THEN 3
                            WHEN med < 604800 THEN 4
                            WHEN med < 2630016 THEN 5
                            ELSE 6 END AS band
                FROM m
            ), e AS (
                SELECT ev.user_id, ev.ts, ROUND(ev.value, 6) AS value, b.band
                FROM events ev JOIN b USING (user_id)
            )
            SELECT user_id, ts, value, 'second' AS feature,
                   CAST(CAST(floor(second(ts)) AS BIGINT) AS VARCHAR) AS feature_value
            FROM e WHERE band = 1
            UNION ALL SELECT user_id, ts, value, 'minute', CAST(minute(ts) AS VARCHAR)
            FROM e WHERE band IN (1, 2)
            UNION ALL SELECT user_id, ts, value, 'hour', CAST(hour(ts) AS VARCHAR)
            FROM e WHERE band IN (1, 2, 3)
            UNION ALL SELECT user_id, ts, value, 'wday_lbl', dayname(ts)
            FROM e WHERE band IN (2, 3, 4)
            UNION ALL SELECT user_id, ts, value, 'week', CAST(weekofyear(ts) AS VARCHAR)
            FROM e WHERE band IN (3, 4, 5)
            UNION ALL SELECT user_id, ts, value, 'month_lbl', monthname(ts)
            FROM e WHERE band IN (4, 5, 6)
            UNION ALL SELECT user_id, ts, value, 'quarter', CAST(quarter(ts) AS VARCHAR)
            FROM e WHERE band IN (5, 6)
            UNION ALL SELECT user_id, ts, value, 'year', CAST(year(ts) AS VARCHAR)
            FROM e WHERE band = 6
        """,
        "anomalize_sql": """
            WITH agg AS (
                SELECT user_id, date_trunc('day', ts) AS bucket_ts, SUM(value) AS v
                FROM events GROUP BY 1, 2
            ), t AS (
                SELECT user_id, bucket_ts, CAST(v AS DOUBLE) AS v,
                       ROW_NUMBER() OVER w AS rn,
                       COUNT(*) OVER (PARTITION BY user_id) AS n,
                       CASE WHEN ROW_NUMBER() OVER w >= 4
                             AND ROW_NUMBER() OVER w <= COUNT(*) OVER (PARTITION BY user_id) - 3
                            THEN AVG(CAST(v AS DOUBLE)) OVER (w ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                       END AS ma
                FROM agg WINDOW w AS (PARTITION BY user_id ORDER BY bucket_ts)
            ), edge AS (
                SELECT user_id,
                       MAX(CASE WHEN rn = 4 THEN ma END) AS ma_first,
                       MAX(CASE WHEN rn = 5 THEN ma END) - MAX(CASE WHEN rn = 4 THEN ma END) AS slope_lo,
                       MAX(CASE WHEN rn = n - 3 THEN ma END) AS ma_last,
                       MAX(CASE WHEN rn = n - 3 THEN ma END) - MAX(CASE WHEN rn = n - 4 THEN ma END) AS slope_hi
                FROM t GROUP BY user_id
            ), tr AS (
                SELECT t.user_id, t.bucket_ts, t.v, t.rn,
                       CASE WHEN t.rn < 4 THEN e.ma_first - e.slope_lo * (4 - t.rn)
                            WHEN t.rn > t.n - 3 THEN e.ma_last + e.slope_hi * (t.rn - (t.n - 3))
                            ELSE t.ma END AS matrend,
                       (t.rn - 1) % 7 AS phase
                FROM t JOIN edge e USING (user_id)
            ), sm AS (
                SELECT user_id, phase, AVG(v - matrend) AS smean FROM tr GROUP BY 1, 2
            ), ctr AS (
                SELECT user_id, AVG(smean) AS center FROM sm GROUP BY 1
            ), dec AS (
                SELECT tr.user_id, tr.bucket_ts, tr.v AS observed,
                       sm.smean - ctr.center AS seasonal,
                       tr.v - (sm.smean - ctr.center) AS seasadj
                FROM tr JOIN sm ON sm.user_id = tr.user_id AND sm.phase = tr.phase
                JOIN ctr ON ctr.user_id = tr.user_id
            ), med AS (
                SELECT user_id, val AS trend FROM 
                (SELECT user_id,
                        CASE WHEN frac < 0.5 THEN lo_v + (hi_v - lo_v) * frac
                             ELSE hi_v - (hi_v - lo_v) * (1 - frac) END AS val
                 FROM (
                    SELECT user_id,
                           MAX(CASE WHEN r2 = flo + 1 THEN x END) AS lo_v,
                           MAX(CASE WHEN r2 = fhi + 1 THEN x END) AS hi_v,
                           ANY_VALUE(frac) AS frac
                    FROM (
                        SELECT user_id, seasadj AS x,
                               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY seasadj) AS r2,
                               CAST(FLOOR((COUNT(*) OVER (PARTITION BY user_id) - 1) * 0.5) AS BIGINT) AS flo,
                               LEAST(CAST(FLOOR((COUNT(*) OVER (PARTITION BY user_id) - 1) * 0.5) AS BIGINT) + 1,
                                     COUNT(*) OVER (PARTITION BY user_id) - 1) AS fhi,
                               (COUNT(*) OVER (PARTITION BY user_id) - 1) * 0.5
                                 - FLOOR((COUNT(*) OVER (PARTITION BY user_id) - 1) * 0.5) AS frac
                        FROM dec
                    ) GROUP BY user_id
                 ))
            ), rem AS (
                SELECT d.*, m.trend, d.seasadj - m.trend AS remainder
                FROM dec d JOIN med m USING (user_id)
            ), q1t AS (
                SELECT user_id, val AS q1 FROM 
                (SELECT user_id,
                        CASE WHEN frac < 0.5 THEN lo_v + (hi_v - lo_v) * frac
                             ELSE hi_v - (hi_v - lo_v) * (1 - frac) END AS val
                 FROM (
                    SELECT user_id,
                           MAX(CASE WHEN r2 = flo + 1 THEN x END) AS lo_v,
                           MAX(CASE WHEN r2 = fhi + 1 THEN x END) AS hi_v,
                           ANY_VALUE(frac) AS frac
                    FROM (
                        SELECT user_id, remainder AS x,
                               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY remainder) AS r2,
                               CAST(FLOOR((COUNT(*) OVER (PARTITION BY user_id) - 1) * 0.25) AS BIGINT) AS flo,
                               LEAST(CAST(FLOOR((COUNT(*) OVER (PARTITION BY user_id) - 1) * 0.25) AS BIGINT) + 1,
                                     COUNT(*) OVER (PARTITION BY user_id) - 1) AS fhi,
                               (COUNT(*) OVER (PARTITION BY user_id) - 1) * 0.25
                                 - FLOOR((COUNT(*) OVER (PARTITION BY user_id) - 1) * 0.25) AS frac
                        FROM rem
                    ) GROUP BY user_id
                 ))
            ), q3t AS (
                SELECT user_id, val AS q3 FROM 
                (SELECT user_id,
                        CASE WHEN frac < 0.5 THEN lo_v + (hi_v - lo_v) * frac
                             ELSE hi_v - (hi_v - lo_v) * (1 - frac) END AS val
                 FROM (
                    SELECT user_id,
                           MAX(CASE WHEN r2 = flo + 1 THEN x END) AS lo_v,
                           MAX(CASE WHEN r2 = fhi + 1 THEN x END) AS hi_v,
                           ANY_VALUE(frac) AS frac
                    FROM (
                        SELECT user_id, remainder AS x,
                               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY remainder) AS r2,
                               CAST(FLOOR((COUNT(*) OVER (PARTITION BY user_id) - 1) * 0.75) AS BIGINT) AS flo,
                               LEAST(CAST(FLOOR((COUNT(*) OVER (PARTITION BY user_id) - 1) * 0.75) AS BIGINT) + 1,
                                     COUNT(*) OVER (PARTITION BY user_id) - 1) AS fhi,
                               (COUNT(*) OVER (PARTITION BY user_id) - 1) * 0.75
                                 - FLOOR((COUNT(*) OVER (PARTITION BY user_id) - 1) * 0.75) AS frac
                        FROM rem
                    ) GROUP BY user_id
                 ))
            ), lim AS (
                SELECT user_id,
                       -1 * (q1 + (CAST(0.15 AS DOUBLE) / CAST(0.05 AS DOUBLE)) * (q3 - q1)) AS l1,
                       q3 + (CAST(0.15 AS DOUBLE) / CAST(0.05 AS DOUBLE)) * (q3 - q1) AS l2
                FROM q1t JOIN q3t USING (user_id)
            )
            SELECT r.user_id, r.bucket_ts,
                   ROUND(r.observed, 6) AS observed,
                   ROUND(r.seasonal, 6) AS seasonal,
                   ROUND(r.seasadj, 6) AS seasadj,
                   ROUND(r.trend, 6) AS trend,
                   ROUND(r.remainder, 6) AS remainder,
                   CASE WHEN r.remainder > l.l2 OR r.remainder < l.l1 THEN 'Yes' ELSE 'No' END AS anomaly,
                   CASE WHEN r.remainder > l.l2 THEN 1 WHEN r.remainder < l.l1 THEN -1 ELSE 0 END AS anomaly_direction,
                   ROUND(r.seasonal + r.trend + l.l1, 6) AS recomposed_l1,
                   ROUND(r.seasonal + r.trend + l.l2, 6) AS recomposed_l2
            FROM rem r JOIN lim l USING (user_id)
        """,
        "diag_stl_sql": """
            WITH agg AS (
                SELECT user_id, date_trunc('day', ts) AS bucket_ts, SUM(value) AS v
                FROM events GROUP BY 1, 2
            ), t AS (
                SELECT user_id, bucket_ts, CAST(v AS DOUBLE) AS v,
                       ROW_NUMBER() OVER w AS rn,
                       COUNT(*) OVER (PARTITION BY user_id) AS n,
                       CASE WHEN ROW_NUMBER() OVER w >= 4
                             AND ROW_NUMBER() OVER w <= COUNT(*) OVER (PARTITION BY user_id) - 3
                            THEN AVG(CAST(v AS DOUBLE)) OVER (w ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                       END AS ma
                FROM agg WINDOW w AS (PARTITION BY user_id ORDER BY bucket_ts)
            ), edge AS (
                SELECT user_id,
                       MAX(CASE WHEN rn = 4 THEN ma END)     AS ma_first,
                       MAX(CASE WHEN rn = 5 THEN ma END)
                         - MAX(CASE WHEN rn = 4 THEN ma END) AS slope_lo,
                       MAX(CASE WHEN rn = n - 3 THEN ma END) AS ma_last,
                       MAX(CASE WHEN rn = n - 3 THEN ma END)
                         - MAX(CASE WHEN rn = n - 4 THEN ma END) AS slope_hi
                FROM t GROUP BY user_id
            ), tr AS (
                SELECT t.user_id, t.bucket_ts, t.v, t.rn, t.n,
                       CASE WHEN t.rn < 4 THEN e.ma_first - e.slope_lo * (4 - t.rn)
                            WHEN t.rn > t.n - 3 THEN e.ma_last + e.slope_hi * (t.rn - (t.n - 3))
                            ELSE t.ma END AS trend,
                       (t.rn - 1) % 7 AS phase
                FROM t JOIN edge e USING (user_id)
            ), sm AS (
                SELECT user_id, phase, AVG(v - trend) AS smean
                FROM tr GROUP BY 1, 2
            ), ctr AS (
                SELECT user_id, AVG(smean) AS center FROM sm GROUP BY 1
            )
            SELECT tr.user_id, tr.bucket_ts,
                   ROUND(tr.v, 6)                                      AS observed,
                   ROUND(sm.smean - ctr.center, 6)                     AS seasonal,
                   ROUND(tr.v - (sm.smean - ctr.center), 6)            AS seasadj,
                   ROUND(tr.trend, 6)                                  AS trend,
                   ROUND(tr.v - (sm.smean - ctr.center) - tr.trend, 6) AS remainder
            FROM tr JOIN sm ON sm.user_id = tr.user_id AND sm.phase = tr.phase
            JOIN ctr ON ctr.user_id = tr.user_id
        """,
        "diag_stl_loess": _stl_loess_sql(),
        "anomalize_stl": _anomalize_stl_sql(),
        "corr_funnel_sql": """
            WITH e AS (
                SELECT CAST(value AS DOUBLE) AS value, event_type,
                       CAST(event_type = 'purchase' AS DOUBLE) AS target
                FROM events
            ), q AS (
                SELECT quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.5) AS q2,
                       quantile_cont(value, 0.75) AS q3
                FROM e
            ), b AS (
                SELECT e.*, CASE WHEN value <= q.q1 THEN 1 WHEN value <= q.q2 THEN 2
                                 WHEN value <= q.q3 THEN 3 ELSE 4 END AS bin
                FROM e, q
            ), nf AS (
                SELECT 'value__b' || i AS feature,
                       ROUND(corr(CASE WHEN bin = i THEN 1.0 ELSE 0.0 END, target), 6)
                           AS correlation
                FROM b, (SELECT UNNEST([1, 2, 3, 4]) AS i) AS bins(i) GROUP BY i
            ), lv AS (
                SELECT DISTINCT event_type AS lvl FROM e
                UNION ALL SELECT '-OTHER'
            ), cf AS (
                SELECT 'event_type__' || lv.lvl AS feature,
                       ROUND(corr(CASE WHEN b.event_type = lv.lvl THEN 1.0 ELSE 0.0 END,
                                  target), 6) AS correlation
                FROM b, lv GROUP BY lv.lvl
            )
            SELECT * FROM nf UNION ALL SELECT * FROM cf
        """,
        "augment_ewm": """
            WITH RECURSIVE t AS (
                SELECT event_id, user_id, CAST(value AS DOUBLE) AS x,
                       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
                FROM events
            ), r AS (
                SELECT event_id, user_id, rn, x AS num, CAST(1 AS DOUBLE) AS den
                FROM t WHERE rn = 1
                UNION ALL
                SELECT t.event_id, t.user_id, t.rn,
                       t.x + 0.7 * r.num, CAST(1 AS DOUBLE) + 0.7 * r.den
                FROM r JOIN t ON t.user_id = r.user_id AND t.rn = r.rn + 1
            )
            SELECT event_id, user_id,
                   ROUND(num / den, 6) AS "value_ewm_mean_alpha_0.3"
            FROM r
        """,
        "fin_macd": """
            WITH RECURSIVE t AS (
                SELECT event_id, user_id, CAST(value AS DOUBLE) AS x,
                       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
                FROM events
            ), r AS (
                SELECT event_id, user_id, rn, x AS ef, x AS es, CAST(0 AS DOUBLE) AS sig
                FROM t WHERE rn = 1
                UNION ALL
                SELECT t.event_id, t.user_id, t.rn,
                       (CAST(2 AS DOUBLE)/13) * t.x + (1 - CAST(2 AS DOUBLE)/13) * r.ef,
                       (CAST(2 AS DOUBLE)/27) * t.x + (1 - CAST(2 AS DOUBLE)/27) * r.es,
                       0.2 * (((CAST(2 AS DOUBLE)/13) * t.x + (1 - CAST(2 AS DOUBLE)/13) * r.ef)
                              - ((CAST(2 AS DOUBLE)/27) * t.x + (1 - CAST(2 AS DOUBLE)/27) * r.es))
                           + 0.8 * r.sig
                FROM r JOIN t ON t.user_id = r.user_id AND t.rn = r.rn + 1
            )
            SELECT event_id, user_id,
                   ROUND(ef - es, 6)         AS value_macd_line_12_26_9,
                   ROUND(sig, 6)             AS value_macd_signal_line_12_26_9,
                   ROUND((ef - es) - sig, 6) AS value_macd_histogram_12_26_9
            FROM r
        """,
        "fin_cmo": """
            WITH d AS (
                SELECT event_id, user_id, ts,
                       value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts) AS delta
                FROM events
            ), gl AS (
                SELECT event_id, user_id, ts,
                       CASE WHEN delta > 0 THEN delta ELSE 0 END AS gains,
                       CASE WHEN delta < 0 THEN -delta ELSE 0 END AS losses
                FROM d
            )
            SELECT event_id, user_id,
                   CASE WHEN ROW_NUMBER() OVER w >= 10 THEN
                       ROUND(100 * (SUM(gains) OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
                                    - SUM(losses) OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
                                 / (SUM(gains) OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
                                    + SUM(losses) OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)), 6) + 0
                   END AS value_cmo_10
            FROM gl WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        """,
        "fin_atr": """
            WITH hlc AS (
                SELECT event_id, user_id, ts, value AS c,
                       value + 1.5 AS h, value - 2.5 AS l
                FROM events
            ), tr AS (
                SELECT event_id, user_id, ts,
                       GREATEST(h - l, ABS(h - LAG(c) OVER w), ABS(l - LAG(c) OVER w)) AS tr
                FROM hlc WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            )
            SELECT event_id, user_id, ROUND(tr, 6) AS value_tr_7,
                   CASE WHEN ROW_NUMBER() OVER w >= 7
                        THEN ROUND(AVG(tr) OVER (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
                   END AS value_atr_7
            FROM tr WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        """,
        "fin_stochastic": """
            WITH hlc AS (
                SELECT event_id, user_id, ts, value AS c,
                       value + 1.5 AS h, value - 2.5 AS l
                FROM events
            ), k AS (
                SELECT event_id, user_id, ts,
                       CASE WHEN ROW_NUMBER() OVER w >= 14 THEN
                           100 * (c - MIN(l) OVER (w ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
                               / (MAX(h) OVER (w ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
                                  - MIN(l) OVER (w ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
                       END AS sk
                FROM hlc WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            )
            SELECT event_id, user_id, sk AS value_stoch_k_14,
                   CASE WHEN COUNT(sk) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) = 3
                        THEN ROUND(AVG(sk) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
                   END AS value_stoch_d_14_3
            FROM k WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        """,
        "fin_ppo": """
            WITH RECURSIVE t AS (
                SELECT event_id, user_id, CAST(value AS DOUBLE) AS x,
                       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
                FROM events
            ), r AS (
                SELECT event_id, user_id, rn, x AS ef, x AS es FROM t WHERE rn = 1
                UNION ALL
                SELECT t.event_id, t.user_id, t.rn,
                       (CAST(2 AS DOUBLE)/13) * t.x + (1 - CAST(2 AS DOUBLE)/13) * r.ef,
                       (CAST(2 AS DOUBLE)/27) * t.x + (1 - CAST(2 AS DOUBLE)/27) * r.es
                FROM r JOIN t ON t.user_id = r.user_id AND t.rn = r.rn + 1
            )
            SELECT event_id, user_id, ROUND(100 * (ef - es) / es, 6) AS value_ppo_line_12_26
            FROM r
        """,
        "fin_ewma_vol": """
            WITH RECURSIVE t AS (
                SELECT event_id, user_id,
                       ROW_NUMBER() OVER w AS rn,
                       CASE WHEN LAG(value) OVER w IS NULL THEN NULL
                            WHEN value > 0 AND LAG(value) OVER w > 0
                                 THEN POW(LN(value / LAG(value) OVER w), 2)
                            WHEN value = 0 AND LAG(value) OVER w = 0 THEN NULL
                            ELSE 'infinity'::DOUBLE END AS r2
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), r AS (
                SELECT event_id, user_id, rn,
                       CAST(NULL AS DOUBLE) AS s2, CAST(1 AS DOUBLE) AS ow, 0 AS cnt
                FROM t WHERE rn = 1
                UNION ALL
                SELECT t.event_id, t.user_id, t.rn,
                       CASE WHEN t.r2 IS NULL OR isinf(t.r2) THEN r.s2
                            WHEN r.s2 IS NULL THEN t.r2
                            ELSE (r.ow * CAST(0.94 AS DOUBLE) * r.s2
                                  + (1 - CAST(0.94 AS DOUBLE)) * t.r2)
                                 / (r.ow * CAST(0.94 AS DOUBLE) + (1 - CAST(0.94 AS DOUBLE))) END,
                       CASE WHEN t.r2 IS NULL OR isinf(t.r2)
                            THEN r.ow * CAST(0.94 AS DOUBLE) ELSE CAST(1 AS DOUBLE) END,
                       r.cnt + CASE WHEN t.r2 IS NULL THEN 0 ELSE 1 END
                FROM r JOIN t ON t.user_id = r.user_id AND t.rn = r.rn + 1
            )
            SELECT event_id, user_id,
                   CASE WHEN cnt >= 5 AND s2 IS NOT NULL
                        THEN ROUND(SQRT(s2), 6) END AS "value_ewma_vol_5_0.94"
            FROM r
        """,
        "fin_fip": """
            WITH r AS (
                SELECT event_id, user_id, ts, value / LAG(value) OVER w - 1 AS ret,
                       ROW_NUMBER() OVER w AS rn
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), f AS (
                SELECT event_id, user_id, rn, 1.0 + ret AS f0,
                       LAG(1.0 + ret, 1) OVER w AS f1, LAG(1.0 + ret, 2) OVER w AS f2,
                       LAG(1.0 + ret, 3) OVER w AS f3, LAG(1.0 + ret, 4) OVER w AS f4,
                       (CASE WHEN ret < 0 THEN 1 ELSE 0 END
                        + CASE WHEN LAG(ret,1) OVER w < 0 THEN 1 ELSE 0 END
                        + CASE WHEN LAG(ret,2) OVER w < 0 THEN 1 ELSE 0 END
                        + CASE WHEN LAG(ret,3) OVER w < 0 THEN 1 ELSE 0 END
                        + CASE WHEN LAG(ret,4) OVER w < 0 THEN 1 ELSE 0 END) AS nneg,
                       (CASE WHEN ret > 0 THEN 1 ELSE 0 END
                        + CASE WHEN LAG(ret,1) OVER w > 0 THEN 1 ELSE 0 END
                        + CASE WHEN LAG(ret,2) OVER w > 0 THEN 1 ELSE 0 END
                        + CASE WHEN LAG(ret,3) OVER w > 0 THEN 1 ELSE 0 END
                        + CASE WHEN LAG(ret,4) OVER w > 0 THEN 1 ELSE 0 END) AS npos
                FROM r WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            )
            SELECT event_id, user_id,
                   CASE WHEN rn >= 6 THEN
                       sign(((((f4 * f3) * f2) * f1) * f0) - 1) * (nneg / 5.0 - npos / 5.0)
                   END AS value_fip_momentum_5
            FROM f
        """,
        "fin_qsmomentum": """
            WITH r AS (
                SELECT event_id, user_id, ts, value,
                       value / LAG(value) OVER w - 1 AS ret,
                       (LAG(value, 3) OVER w - LAG(value, 10) OVER w)
                           / LAG(value, 10) OVER w AS slow_leg,
                       (value - LAG(value, 3) OVER w) / LAG(value, 3) OVER w AS fast_leg,
                       ROW_NUMBER() OVER w AS rn
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), l AS (
                SELECT event_id, user_id, slow_leg, fast_leg, rn,
                       ret AS r0, LAG(ret,1) OVER w AS r1, LAG(ret,2) OVER w AS r2,
                       LAG(ret,3) OVER w AS r3, LAG(ret,4) OVER w AS r4
                FROM r WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), m AS (
                SELECT event_id, user_id, slow_leg, fast_leg, rn,
                       ((((r4 + r3) + r2) + r1) + r0) / 5.0 AS mu,
                       r0, r1, r2, r3, r4
                FROM l
            ), v AS (
                SELECT event_id, user_id, slow_leg, fast_leg, rn,
                       sqrt((((((r4-mu)*(r4-mu) + (r3-mu)*(r3-mu)) + (r2-mu)*(r2-mu))
                             + (r1-mu)*(r1-mu)) + (r0-mu)*(r0-mu)) / 5.0) AS vol
                FROM m
            )
            SELECT event_id, user_id,
                   CASE WHEN rn >= 11 THEN (slow_leg - fast_leg) / vol END
                       AS value_qsmom_3_10_5
            FROM v
        """,
        "fin_risk": """
            WITH r AS (
                SELECT event_id, user_id, ts, value / LAG(value) OVER w - 1 AS ret,
                       ROW_NUMBER() OVER w AS rn
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), l AS (
                SELECT event_id, user_id, rn,
                       ret AS r0, LAG(ret,1) OVER w AS r1, LAG(ret,2) OVER w AS r2,
                       LAG(ret,3) OVER w AS r3, LAG(ret,4) OVER w AS r4
                FROM r WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), m AS (
                SELECT event_id, user_id, rn, r0, r1, r2, r3, r4,
                       ((((r4 + r3) + r2) + r1) + r0) / 5.0 AS mu,
                       (CASE WHEN r4 < 0 THEN 1 ELSE 0 END + CASE WHEN r3 < 0 THEN 1 ELSE 0 END
                        + CASE WHEN r2 < 0 THEN 1 ELSE 0 END + CASE WHEN r1 < 0 THEN 1 ELSE 0 END
                        + CASE WHEN r0 < 0 THEN 1 ELSE 0 END) AS cnt,
                       ((((CASE WHEN r4 < 0 THEN r4 ELSE 0.0 END
                           + CASE WHEN r3 < 0 THEN r3 ELSE 0.0 END)
                          + CASE WHEN r2 < 0 THEN r2 ELSE 0.0 END)
                         + CASE WHEN r1 < 0 THEN r1 ELSE 0.0 END)
                        + CASE WHEN r0 < 0 THEN r0 ELSE 0.0 END) AS msum,
                       ((((CASE WHEN r4 > 0 THEN r4 ELSE 0.0 END
                           + CASE WHEN r3 > 0 THEN r3 ELSE 0.0 END)
                          + CASE WHEN r2 > 0 THEN r2 ELSE 0.0 END)
                         + CASE WHEN r1 > 0 THEN r1 ELSE 0.0 END)
                        + CASE WHEN r0 > 0 THEN r0 ELSE 0.0 END) AS psum
                FROM l
            ), v AS (
                SELECT event_id, user_id, rn, r0, r1, r2, r3, r4, mu, cnt,
                       msum, psum,
                       msum / cnt AS md
                FROM m
            ), s AS (
                SELECT event_id, user_id, rn, mu, cnt, msum, psum,
                       (((((r4-mu)*(r4-mu) + (r3-mu)*(r3-mu)) + (r2-mu)*(r2-mu))
                        + (r1-mu)*(r1-mu)) + (r0-mu)*(r0-mu)) AS ss,
                       ((((((r4-mu)*(r4-mu))*(r4-mu) + ((r3-mu)*(r3-mu))*(r3-mu))
                          + ((r2-mu)*(r2-mu))*(r2-mu)) + ((r1-mu)*(r1-mu))*(r1-mu))
                        + ((r0-mu)*(r0-mu))*(r0-mu)) AS m3s,
                       ((((((r4-mu)*(r4-mu))*((r4-mu)*(r4-mu))
                           + ((r3-mu)*(r3-mu))*((r3-mu)*(r3-mu)))
                          + ((r2-mu)*(r2-mu))*((r2-mu)*(r2-mu)))
                         + ((r1-mu)*(r1-mu))*((r1-mu)*(r1-mu)))
                        + ((r0-mu)*(r0-mu))*((r0-mu)*(r0-mu))) AS m4s,
                       ((((CASE WHEN r4 < 0 THEN (r4-md)*(r4-md) ELSE 0.0 END
                           + CASE WHEN r3 < 0 THEN (r3-md)*(r3-md) ELSE 0.0 END)
                          + CASE WHEN r2 < 0 THEN (r2-md)*(r2-md) ELSE 0.0 END)
                         + CASE WHEN r1 < 0 THEN (r1-md)*(r1-md) ELSE 0.0 END)
                        + CASE WHEN r0 < 0 THEN (r0-md)*(r0-md) ELSE 0.0 END) AS dss
                FROM v
            )
            SELECT event_id, user_id,
                   CASE WHEN rn >= 6 THEN (mu / sqrt(ss / 4.0)) * sqrt(252.0) END
                       AS value_sharpe_ratio_5,
                   CASE WHEN rn >= 6 AND cnt >= 2
                        THEN (mu / sqrt(dss / (cnt - 1))) * sqrt(252.0) END
                       AS value_sortino_ratio_5,
                   CASE WHEN rn >= 6 THEN sqrt(ss / 4.0) * sqrt(252.0) END
                       AS value_volatility_annualized_5,
                   -- mu IS NULL <=> some window return is NULL (x/0 -> NULL
                   -- in DuckDB, +-inf in pandas -> nulled): the omega CASE
                   -- folds would otherwise coerce NULL terms to 0.0
                   CASE WHEN rn >= 6 AND mu IS NOT NULL
                        THEN psum / NULLIF(-msum, 0) END
                       AS value_omega_ratio_5,
                   CASE WHEN rn >= 6 THEN
                       (sqrt(20.0)/3.0) * ((m3s/5.0) / ((ss/5.0) * sqrt(ss/5.0))) END
                       AS value_skewness_5,
                   CASE WHEN rn >= 6 THEN
                       ((6.0 * (m4s/5.0 / ((ss/5.0) * (ss/5.0)) - 3.0) + 6.0) * 4.0)
                           / (3.0 * 2.0) END
                       AS value_kurtosis_5
            FROM s
        """,
        "fin_risk_log": """
            WITH r AS (
                -- mirror numpy exactly: ln(v/prev) is finite iff the RATIO
                -- is > 0 (both-negative values included); zero/negative
                -- ratios are -inf/NaN in numpy (nulled downstream) and
                -- would ERROR in DuckDB ln, so guard on the ratio (v/0 is
                -- NULL in DuckDB -> NULL > 0 -> NULL -> CASE falls to NULL,
                -- matching numpy's nulled inf)
                SELECT event_id, user_id, ts,
                       CASE WHEN value / LAG(value) OVER w > 0
                            THEN ln(value / LAG(value) OVER w) END AS ret,
                       ROW_NUMBER() OVER w AS rn
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), l AS (
                SELECT event_id, user_id, rn,
                       ret AS r0, LAG(ret,1) OVER w AS r1, LAG(ret,2) OVER w AS r2,
                       LAG(ret,3) OVER w AS r3, LAG(ret,4) OVER w AS r4
                FROM r WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), m AS (
                SELECT event_id, user_id, rn, r0, r1, r2, r3, r4,
                       ((((r4 + r3) + r2) + r1) + r0) / 5.0 AS mu
                FROM l
            ), s AS (
                SELECT event_id, user_id, rn, mu,
                       (((((r4-mu)*(r4-mu) + (r3-mu)*(r3-mu)) + (r2-mu)*(r2-mu))
                        + (r1-mu)*(r1-mu)) + (r0-mu)*(r0-mu)) AS ss
                FROM m
            )
            SELECT event_id, user_id,
                   ROUND(CASE WHEN rn >= 6 THEN (mu / sqrt(ss / 4.0)) * sqrt(252.0) END, 6) + 0
                       AS value_sharpe_ratio_5,
                   ROUND(CASE WHEN rn >= 6 THEN sqrt(ss / 4.0) * sqrt(252.0) END, 6) + 0
                       AS value_volatility_annualized_5
            FROM s
        """,
        "fin_risk_bench": """
            WITH r AS (
                SELECT event_id, user_id, ts,
                       value / LAG(value) OVER w - 1 AS ret,
                       (value + 100.0) / LAG(value + 100.0) OVER w - 1 AS bret,
                       ROW_NUMBER() OVER w AS rn
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), l AS (
                SELECT event_id, user_id, rn,
                       ret AS r0, LAG(ret,1) OVER w AS r1, LAG(ret,2) OVER w AS r2,
                       LAG(ret,3) OVER w AS r3, LAG(ret,4) OVER w AS r4,
                       bret AS b0, LAG(bret,1) OVER w AS b1, LAG(bret,2) OVER w AS b2,
                       LAG(bret,3) OVER w AS b3, LAG(bret,4) OVER w AS b4
                FROM r WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), m AS (
                SELECT event_id, user_id, rn,
                       ((((r4 + r3) + r2) + r1) + r0) / 5.0 AS mu,
                       ((((b4 + b3) + b2) + b1) + b0) / 5.0 AS bmu,
                       ((((r4*b4 + r3*b3) + r2*b2) + r1*b1) + r0*b0) / 5.0 AS prod,
                       ((((b4*b4 + b3*b3) + b2*b2) + b1*b1) + b0*b0) / 5.0 AS b2m,
                       r0, r1, r2, r3, r4, b0, b1, b2, b3, b4
                FROM l
            ), t AS (
                SELECT event_id, user_id, rn, mu, bmu,
                       prod - mu * bmu AS cov,
                       b2m - bmu * bmu AS bvar,
                       (((((r4-b4) + (r3-b3)) + (r2-b2)) + (r1-b1)) + (r0-b0)) / 5.0 AS am,
                       r0, r1, r2, r3, r4, b0, b1, b2, b3, b4
                FROM m
            ), u AS (
                SELECT event_id, user_id, rn, mu, bmu, cov, bvar, am,
                       ((((((r4-b4)-am)*((r4-b4)-am) + ((r3-b3)-am)*((r3-b3)-am))
                          + ((r2-b2)-am)*((r2-b2)-am)) + ((r1-b1)-am)*((r1-b1)-am))
                        + ((r0-b0)-am)*((r0-b0)-am)) AS ass
                FROM t
            )
            SELECT event_id, user_id,
                   CASE WHEN rn >= 6
                        THEN mu / (cov / NULLIF(bvar, 0)) * sqrt(252.0) END
                       AS value_treynor_ratio_5,
                   CASE WHEN rn >= 6
                        THEN (mu - bmu) / NULLIF(sqrt(ass / 4.0), 0) END
                       AS value_information_ratio_5
            FROM u
        """,
        "fin_hurst": """
            WITH r AS (
                SELECT event_id, user_id, value,
                       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
                FROM events
            ), pairs AS (
                SELECT a.event_id, a.user_id, a.rn AS t, b.rn AS i, b.value
                FROM r a JOIN r b
                  ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 19 AND a.rn
                WHERE a.rn >= 20
            ), mu AS (
                SELECT event_id, t, AVG(value) AS m FROM pairs GROUP BY event_id, t
            ), dev AS (
                SELECT p.event_id, p.t, mu.m,
                       SUM(p.value - mu.m) OVER
                           (PARTITION BY p.event_id, p.t ORDER BY p.i) AS cum,
                       (p.value - mu.m) * (p.value - mu.m) AS sq
                FROM pairs p JOIN mu ON p.event_id = mu.event_id AND p.t = mu.t
            ), rs AS (
                SELECT event_id, MAX(cum) - MIN(cum) AS rng,
                       sqrt(SUM(sq) / 20.0) AS s
                FROM dev GROUP BY event_id, t
            )
            SELECT r.event_id, r.user_id,
                   ROUND(ln(NULLIF(rs.rng, 0) / NULLIF(rs.s, 0)) / ln(20.0), 6)
                       AS value_hurst_20
            FROM r LEFT JOIN rs ON r.event_id = rs.event_id
        """,
        "fin_adx": """
            WITH RECURSIVE hlc AS (
                SELECT event_id, user_id, ts, value AS c,
                       value + 1.5 AS h, value - 2.5 AS l,
                       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
                FROM events
            ), base AS (
                SELECT event_id, user_id, rn,
                       CASE WHEN rn = 1 THEN h - l
                            ELSE GREATEST(h - l, ABS(h - LAG(c) OVER w),
                                          ABS(l - LAG(c) OVER w)) END AS tr,
                       CASE WHEN rn = 1 THEN 0.0
                            WHEN (h - LAG(h) OVER w) > (LAG(l) OVER w - l)
                                 THEN GREATEST(h - LAG(h) OVER w, 0.0) ELSE 0.0 END AS pdm,
                       CASE WHEN rn = 1 THEN 0.0
                            WHEN (LAG(l) OVER w - l) > (h - LAG(h) OVER w)
                                 THEN GREATEST(LAG(l) OVER w - l, 0.0) ELSE 0.0 END AS mdm
                FROM hlc WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), rr AS (
                SELECT event_id, user_id, rn, tr AS st, pdm AS sp, mdm AS sm,
                       CAST(NULL AS DOUBLE) AS adx
                FROM base WHERE rn = 1
                UNION ALL
                SELECT b.event_id, b.user_id, b.rn,
                       (1.0 - 1.0/14.0) * rr.st + (1.0/14.0) * b.tr,
                       (1.0 - 1.0/14.0) * rr.sp + (1.0/14.0) * b.pdm,
                       (1.0 - 1.0/14.0) * rr.sm + (1.0/14.0) * b.mdm,
                       CASE WHEN b.rn < 14 THEN NULL
                            WHEN b.rn = 14 THEN
                                100.0 * ABS(100.0 * ((1.0 - 1.0/14.0) * rr.sp + (1.0/14.0) * b.pdm) / ((1.0 - 1.0/14.0) * rr.st + (1.0/14.0) * b.tr)
                                            - 100.0 * ((1.0 - 1.0/14.0) * rr.sm + (1.0/14.0) * b.mdm) / ((1.0 - 1.0/14.0) * rr.st + (1.0/14.0) * b.tr))
                                      / (100.0 * ((1.0 - 1.0/14.0) * rr.sp + (1.0/14.0) * b.pdm) / ((1.0 - 1.0/14.0) * rr.st + (1.0/14.0) * b.tr)
                                         + 100.0 * ((1.0 - 1.0/14.0) * rr.sm + (1.0/14.0) * b.mdm) / ((1.0 - 1.0/14.0) * rr.st + (1.0/14.0) * b.tr))
                            ELSE (1.0 - 1.0/14.0) * rr.adx + (1.0/14.0) *
                                (100.0 * ABS(100.0 * ((1.0 - 1.0/14.0) * rr.sp + (1.0/14.0) * b.pdm) / ((1.0 - 1.0/14.0) * rr.st + (1.0/14.0) * b.tr)
                                             - 100.0 * ((1.0 - 1.0/14.0) * rr.sm + (1.0/14.0) * b.mdm) / ((1.0 - 1.0/14.0) * rr.st + (1.0/14.0) * b.tr))
                                       / (100.0 * ((1.0 - 1.0/14.0) * rr.sp + (1.0/14.0) * b.pdm) / ((1.0 - 1.0/14.0) * rr.st + (1.0/14.0) * b.tr)
                                          + 100.0 * ((1.0 - 1.0/14.0) * rr.sm + (1.0/14.0) * b.mdm) / ((1.0 - 1.0/14.0) * rr.st + (1.0/14.0) * b.tr))) END
                FROM rr JOIN base b ON b.user_id = rr.user_id AND b.rn = rr.rn + 1
            )
            SELECT event_id, user_id,
                   CASE WHEN rn >= 14 THEN 100.0 * sp / st END AS value_plus_di_14,
                   CASE WHEN rn >= 14 THEN 100.0 * sm / st END AS value_minus_di_14,
                   CASE WHEN rn >= 27 THEN adx END AS value_adx_14
            FROM rr
        """,
        # programmatically generated Lloyd-iteration CTE chains; bit-parity
        # argument in pipelines/clustering.py's module docstring
        "kmeans_embed": _kmeans_cte() + "\nSELECT vec_id, cluster FROM af",
        "semdedup": _semdedup_sql(0.35),
        "pq_topk": _pq_topk_sql(),
        "embedding_neardup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 6) AS cosine
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.2
        """,
    }
    # the Bloom variant is bit-equal to the exact operator by construction
    # (filter sized so expected false positives << 1) — SAME oracle; a
    # mismatch IS a detected false positive
    sql["decontaminate_bloom"] = sql["decontaminate"]
    # compaction invariant: decoded rows == the plain hourly rollup — the
    # SAME oracle as tier_rollup_1h (encode -> re-chunk -> decode is the
    # identity on rows)
    sql["tier_compact_1h"] = sql["tier_rollup_1h"]
    # cluster representatives: the dedup_clusters closure, its final SELECT
    # folded into a CTE, plus a keep-longest ROW_NUMBER election
    _cl_final = ("SELECT node AS doc_id, MIN(r) AS cluster_id "
                 "FROM reach GROUP BY node")
    assert _cl_final in sql["dedup_clusters"]
    sql["dedup_cluster_reps"] = sql["dedup_clusters"].replace(
        _cl_final,
        """, cl AS ({})
            SELECT c.doc_id, c.cluster_id, d.n_chars,
                   (ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                       ORDER BY d.n_chars DESC, c.doc_id) = 1)
                       AS keep
            FROM cl c JOIN documents d USING (doc_id)""".format(_cl_final))
    return sql
