"""correlationfunnel: ``binarize`` + ``correlate``.

Reference: src/pytimetk/core/correlationfunnel.py:19-29 (binarize: numeric ->
quantile bins, categorical -> one-hot with infrequent-category lumping) and
:224-251 (correlate: pearson correlation of every binary column vs a target,
sorted by |corr| descending).

Execution shape:
- binarize needs GLOBAL quantile edges + level frequencies -> ONE
  distributed pre-pass: per-batch partial (column, value) count histograms
  (one row per DISTINCT value per batch — the corpus.py combiner idiom) ->
  keyed partition reduce -> tiny merged histogram on the driver, from which
  EXACT np.nanquantile edges are derived by weighted order statistics.  No
  full-table collect anywhere; the driver sees only distinct-value counts.
  (A truly continuous high-cardinality column makes the histogram large —
  there, swap the partial for a mergeable t-digest; the reduce shape stays.)
- correlate = one global aggregation of sums/sumsq/cross-products per column
  (map_batches partials -> tiny reduce), then the correlation formula on the
  driver.  No shuffle of data rows at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from pytimetk_ray.exec import partitioned_group_map


def _weighted_np_quantiles(vals: np.ndarray, cnts: np.ndarray,
                           qs: np.ndarray) -> np.ndarray:
    """np.nanquantile(method='linear') from a (sorted distinct value, count)
    histogram — BIT-EQUAL to numpy on the expanded array: same virtual index
    t = q*(N-1), same order statistics, and numpy's lerp formula switch at
    frac >= 0.5 (lo + d*frac below, hi - d*(1-frac) at/above)."""
    order = np.argsort(vals, kind="mergesort")
    vals, cnts = vals[order], cnts[order]
    n = int(cnts.sum())
    if n == 0:
        return np.array([], dtype=np.float64)
    cum = np.cumsum(cnts)  # rank of the LAST occurrence of each value (1-based)
    out = np.empty(len(qs), dtype=np.float64)
    for k, q in enumerate(qs):
        t = q * (n - 1)
        i = int(np.floor(t))
        frac = t - i
        lo = vals[np.searchsorted(cum, i, side="right")]
        hi = vals[np.searchsorted(cum, min(i + 1, n - 1), side="right")]
        d = hi - lo
        out[k] = lo + d * frac if frac < 0.5 else hi - d * (1 - frac)
    return out


def binarize(
    ds: rd.Dataset,
    *,
    n_bins: int = 4,
    thresh_infreq: float = 0.01,
    name_infreq: str = "-OTHER",
    one_hot: bool = True,
    numeric_label: str = "interval",
) -> rd.Dataset:
    """Bin numeric columns into global-quantile bins; one-hot categoricals
    (infrequent levels lumped into ``{col}__{name_infreq}``).

    ``numeric_label="interval"`` names numeric features with the pd.cut
    interval string (reference-faithful); ``"index"`` names them
    ``{col}__b{i}`` (1-based bin index) — same binning, SQL-reproducible
    labels for the DuckDB oracle."""
    schema = ds.schema()
    import pyarrow as pa

    def _is_num(t):
        if isinstance(t, pa.DataType):
            return pa.types.is_floating(t) or pa.types.is_integer(t)
        return np.issubdtype(np.dtype(t), np.number)

    def _is_str(t):
        if isinstance(t, pa.DataType):
            return pa.types.is_string(t) or pa.types.is_large_string(t)
        return np.dtype(t) == object

    num_cols = [n for n, t in zip(schema.names, schema.types) if _is_num(t)]
    cat_cols = [n for n, t in zip(schema.names, schema.types) if _is_str(t)]

    # DISTRIBUTED pre-pass: per-batch partial (col, value) histograms ->
    # keyed reduce -> driver sees one row per global distinct value
    qs = np.linspace(0, 1, n_bins + 1)
    _ROWS = "__rows__"

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        frames = [pd.DataFrame({"col": [_ROWS], "sval": [""], "nval": [0.0],
                                "cnt": np.array([len(batch)], dtype=np.int64)})]
        for c in num_cols:
            v = batch[c].to_numpy(np.float64)
            v = v[~np.isnan(v)]
            vals, cnts = np.unique(v, return_counts=True)
            frames.append(pd.DataFrame({
                "col": c, "sval": "", "nval": vals,
                "cnt": cnts.astype(np.int64)}))
        for c in cat_cols:
            vc = batch[c].value_counts()  # NaN excluded, like the reference
            frames.append(pd.DataFrame({
                "col": c, "sval": vc.index.astype(object), "nval": 0.0,
                "cnt": vc.to_numpy(np.int64)}))
        return pd.concat(frames, ignore_index=True)

    def reduce_counts(part: pd.DataFrame) -> pd.DataFrame:
        return part.groupby(["col", "sval", "nval"], as_index=False,
                            sort=False)["cnt"].sum()

    merged = partitioned_group_map(
        ds.map_batches(partial, batch_format="pandas"),
        ["col", "sval", "nval"], reduce_counts,
        sort_by=["col", "sval", "nval"], num_partitions=8,
    ).to_pandas()

    n = int(merged.loc[merged["col"] == _ROWS, "cnt"].sum())
    edges, freqs = {}, {}
    for c in num_cols:
        h = merged[merged["col"] == c]
        edges[c] = np.unique(_weighted_np_quantiles(
            h["nval"].to_numpy(np.float64), h["cnt"].to_numpy(np.int64), qs))
    for c in cat_cols:
        h = merged[merged["col"] == c]
        keep = h.loc[(h["cnt"] / n) >= thresh_infreq, "sval"]
        freqs[c] = set(keep)

    def apply(batch: pd.DataFrame) -> pd.DataFrame:
        out = {}
        for c in num_cols:
            e = edges[c]
            if len(e) < 2:
                continue
            binned = pd.cut(batch[c], bins=e, include_lowest=True, duplicates="drop")
            if numeric_label == "index":
                codes = binned.cat.codes
                for i in range(len(binned.cat.categories)):
                    out[f"{c}__b{i + 1}"] = (codes == i).astype(np.int8)
            else:
                labels = binned.astype(str)
                for interval in binned.cat.categories:
                    key = f"{c}__{interval}"
                    out[key] = (labels == str(interval)).astype(np.int8)
        for c in cat_cols:
            keep = freqs.get(c, set())
            vals = batch[c].where(batch[c].isin(keep), name_infreq)
            for level in sorted(keep) + [name_infreq]:
                out[f"{c}__{level}"] = (vals == level).astype(np.int8)
        return pd.DataFrame(out, index=batch.index)

    _ = one_hot
    return ds.map_batches(apply, batch_format="pandas")


def correlate(ds: rd.Dataset, target: str, *, method: str = "pearson") -> pd.DataFrame:
    """Pearson correlation of every column vs ``target`` via one pass of
    distributed sufficient statistics (n, sum, sumsq, cross-product)."""
    if method != "pearson":
        raise NotImplementedError("only pearson is implemented distributed")
    names = [c for c in ds.schema().names]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        y = batch[target].to_numpy(dtype=np.float64)
        rows = []
        for c in names:
            x = batch[c].to_numpy(dtype=np.float64)
            rows.append({
                "feature": c, "n": len(x), "sx": x.sum(), "sxx": (x * x).sum(),
                "sy": y.sum(), "syy": (y * y).sum(), "sxy": (x * y).sum(),
            })
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    agg = parts.groupby("feature", sort=False).sum().reset_index()
    n = agg["n"]
    cov = agg["sxy"] - agg["sx"] * agg["sy"] / n
    vx = agg["sxx"] - agg["sx"] ** 2 / n
    vy = agg["syy"] - agg["sy"] ** 2 / n
    denom = np.sqrt(vx * vy)
    corr = np.where(denom > 0, cov / denom, np.nan)
    out = pd.DataFrame({"feature": agg["feature"], "correlation": corr})
    out = out[out["feature"] != target]
    return out.reindex(out["correlation"].abs().sort_values(ascending=False).index).reset_index(drop=True)
