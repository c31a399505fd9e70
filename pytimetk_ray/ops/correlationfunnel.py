"""correlationfunnel: ``binarize`` + ``correlate``.

Reference: src/pytimetk/core/correlationfunnel.py:19-29 (binarize: numeric ->
quantile bins, categorical -> one-hot with infrequent-category lumping) and
:224-251 (correlate: pearson correlation of every binary column vs a target,
sorted by |corr| descending).

Execution shape:
- binarize needs GLOBAL quantiles -> one small aggregate pass first
  (per-column quantiles via a driver-side collect of per-batch T-digest-less
  exact quantiles — the input here is a FEATURE table, small by construction;
  at 100 TB substitute a sketch), then a stateless vectorized map_batches.
- correlate = one global aggregation of sums/sumsq/cross-products per column
  (map_batches partials -> tiny reduce), then the correlation formula on the
  driver.  No shuffle of data rows at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd


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

    # global quantile pass (small driver-side collect of the numeric columns)
    qs = np.linspace(0, 1, n_bins + 1)
    sample = ds.select_columns(num_cols).to_pandas() if num_cols else pd.DataFrame()
    edges = {c: np.unique(np.nanquantile(sample[c].to_numpy(float), qs)) for c in num_cols}
    # categorical level frequencies
    freqs = {}
    if cat_cols:
        catdf = ds.select_columns(cat_cols).to_pandas()
        n = len(catdf)
        for c in cat_cols:
            vc = catdf[c].value_counts()
            freqs[c] = set(vc.index[(vc / n) >= thresh_infreq])

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
