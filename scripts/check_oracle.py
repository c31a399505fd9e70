"""Driver-mimic: run every queries() entry at a given sf and compare with
oracle_sql() via DuckDB (row count + order-insensitive sorted-column value
compare).  Usage: python scripts/check_oracle.py [sf_dir] [query ...]"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd
import ray

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64)
        elif str(df[c].dtype) == "Float64":
            # nullable float -> numpy float64, <NA> -> NaN (the driver's
            # Arrow compare treats mine-<NA> == oracle-NULL == .df()-NaN)
            df[c] = df[c].to_numpy(dtype=np.float64, na_value=np.nan)
        elif str(df[c].dtype) == "Int64":
            if df[c].isna().any():
                df[c] = df[c].to_numpy(dtype=np.float64, na_value=np.nan)
            else:
                df[c] = df[c].to_numpy(dtype=np.int64)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype(np.int64)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), ignore_index=True, na_position="last")


def compare(name, mine: pd.DataFrame, oracle: pd.DataFrame) -> str:
    """Driver-strict compare: the driver hashes typed VALUE BYTES, so this
    must be at least as strict — dtype KIND must match after canonicalization
    (int64 2 vs double 2.0 is a FAIL: forgot CAST(... AS BIGINT) in the SQL),
    and float columns compare byte-exact with NaN canonicalized (-0.0 vs 0.0
    is a FAIL — round-3 lesson: spline_sql was 'flaky' for exactly this)."""
    if len(mine) != len(oracle):
        return f"ROWS {len(mine)} != {len(oracle)}"
    if sorted(mine.columns) != sorted(oracle.columns):
        return f"COLS {sorted(mine.columns)} != {sorted(oracle.columns)}"
    a, b = canon(mine), canon(oracle)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        ak = a[c].dtype.kind if a[c].dtype != object else "O"
        bk = b[c].dtype.kind if b[c].dtype != object else "O"
        if ak != bk:
            return f"DTYPE mismatch col={c} mine={a[c].dtype} oracle={b[c].dtype}"
        if ak == "f":
            ab = av.copy()
            bb = bv.copy()
            ab[np.isnan(ab)] = np.nan  # canonical quiet-NaN bit pattern
            bb[np.isnan(bb)] = np.nan
            neq = ab.view(np.uint64) != bb.view(np.uint64)
            ok = not neq.any()
            bad = np.flatnonzero(neq)[:3]
        else:
            eqs = (pd.Series(av).fillna("__N__") == pd.Series(bv).fillna("__N__"))
            ok = eqs.all()
            bad = np.flatnonzero(~eqs.to_numpy())[:3]
        if not ok:
            return f"VAL mismatch col={c} rows={bad.tolist()} mine={av[bad[:1]]} oracle={bv[bad[:1]]}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, sqls = e.queries(), e.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            print(f"{name:28s} EXC {type(ex).__name__}: {ex}")
            fails += 1
            continue
        dt = time.time() - t0
        if name in sqls:
            oracle = con.execute(sqls[name]).df()
            verdict = compare(name, mine, oracle)
        else:
            verdict = f"rows-only ({len(mine)} rows)"
        status = verdict if verdict.startswith(("OK", "rows")) else f"FAIL {verdict}"
        if status.startswith("FAIL"):
            fails += 1
        print(f"{name:28s} {status}  [{dt:.1f}s]")
    print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
