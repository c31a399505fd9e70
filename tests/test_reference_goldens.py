"""Golden-value tests mirroring the reference's own test suite
(FIXTURES.md F3; reference tests cited per test).  The reference labels
month buckets at month END ('M'); our engine labels bucket starts (like
date_trunc) — values must match, labels are starts."""

import numpy as np
import pandas as pd
import ray.data as rd

import pytimetk_ray as tk


def _daily60() -> pd.DataFrame:
    # reference tests/core/test_summarize_by_time.py:20-28
    return pd.DataFrame(
        {
            "date": pd.date_range(start="1/1/2020", periods=60).astype("datetime64[us]"),
            "value": np.arange(1, 61, dtype=np.int64),
            "groups": ["Group_1", "Group_2"] * 30,
        }
    )


def test_summarize_monthly_golden_sums():
    # reference expected sums [496, 1334] (test_summarize_by_time.py:50-52)
    out = tk.summarize_by_time(rd.from_pandas(_daily60()), "date", "value",
                               freq="M", agg_func="sum").to_pandas()
    out = out.sort_values("bucket_ts", ignore_index=True)
    assert out["value_sum"].tolist() == [496, 1334]
    assert out["bucket_ts"].tolist() == [
        pd.Timestamp("2020-01-01"), pd.Timestamp("2020-02-01")
    ]


def test_summarize_monthly_grouped_golden():
    out = tk.summarize_by_time(rd.from_pandas(_daily60()), "date", "value",
                               freq="M", agg_func="sum", by=["groups"]).to_pandas()
    out = out.sort_values(["groups", "bucket_ts"], ignore_index=True)
    # odd values (1,3,...) are Group_1; even are Group_2
    jan = _daily60().iloc[:31]
    g1_jan = jan[jan["groups"] == "Group_1"]["value"].sum()
    g2_jan = jan[jan["groups"] == "Group_2"]["value"].sum()
    assert out[out["groups"] == "Group_1"]["value_sum"].iloc[0] == g1_jan
    assert out[out["groups"] == "Group_2"]["value_sum"].iloc[0] == g2_jan
    assert out["value_sum"].sum() == 60 * 61 // 2


def test_pad_by_time_gap_golden():
    # reference tests/core/test_pad_by_time.py:9-70 style: delete rows, pad back
    df = pd.DataFrame(
        {
            "date": pd.to_datetime(
                ["2020-01-01", "2020-01-02", "2020-01-04", "2020-01-05"]
            ).astype("datetime64[us]"),
            "value": [1.0, 2.0, 4.0, 5.0],
        }
    )
    out = tk.pad_by_time(rd.from_pandas(df), "date", freq="D").to_pandas()
    out = out.sort_values("date", ignore_index=True)
    assert len(out) == 5
    assert pd.isna(out.loc[2, "value"])  # the padded 2020-01-03 row
    assert out.loc[2, "date"] == pd.Timestamp("2020-01-03")
    out0 = tk.pad_by_time(rd.from_pandas(df), "date", freq="D", fillna=0).to_pandas()
    assert out0.sort_values("date", ignore_index=True)["value"].tolist() == [1, 2, 0, 4, 5]


def test_rolling_column_naming_template():
    # naming templates are part of the observable contract
    # (reference rolling.py:652,739; expanding.py:586; lags/leads/diffs)
    df = _daily60().rename(columns={"groups": "id"})
    ds = rd.from_pandas(df)
    cols = set(
        tk.augment_rolling(ds, ["id"], ["date"], "value", window=3,
                           window_func=["mean", "quantile"], quantile=0.5)
        .to_pandas().columns
    )
    assert "value_rolling_mean_win_3" in cols
    assert "value_rolling_quantile_50_win_3" in cols
    cols = set(tk.augment_expanding(ds, ["id"], ["date"], "value",
                                    window_func="sum").to_pandas().columns)
    assert "value_expanding_sum" in cols
    cols = set(tk.augment_ewm(ds, ["id"], ["date"], "value", window_func="mean",
                              span=5).to_pandas().columns)
    assert "value_ewm_mean_span_5" in cols


def test_signature_quirks_golden():
    # weekend = Sunday only; am_pm 12:00 -> am (reference quirks, verbatim)
    df = pd.DataFrame(
        {"d": pd.to_datetime(["2024-01-06 12:00", "2024-01-07 13:00"]).astype("datetime64[us]")}
    )  # Saturday noon, Sunday 13:00
    out = tk.augment_timeseries_signature(rd.from_pandas(df), "d").to_pandas()
    out = out.sort_values("d", ignore_index=True)
    assert out["d_weekend"].tolist() == [0, 1]  # Saturday NOT weekend (quirk)
    assert out["d_am_pm"].tolist() == ["am", "pm"]  # hour<=12 -> am (quirk)
    assert out["d_wday"].tolist() == [6, 7]


def test_anomalize_iqr_limits_golden():
    # the verbatim lower-limit formula -1*(q1 + k*iqr) (anomalize.py:759)
    from pytimetk_ray.kernels.decomp import iqr_outliers

    r = np.array([1.0, 2.0, 3.0, 4.0, 100.0])
    anomaly, direction, score, l1, l2 = iqr_outliers(r, alpha=0.05)
    q1, q3 = np.percentile(r, [25, 75])
    iq = q3 - q1
    k = 0.15 / 0.05  # note: 2.9999999999999996 in float64, matching the ref
    assert l1 == -1 * (q1 + k * iq)
    assert l2 == q3 + k * iq
    assert anomaly.tolist() == ["No", "No", "No", "No", "Yes"]
    assert direction.tolist() == [0, 0, 0, 0, 1]
