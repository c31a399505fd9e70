"""pytimetk_ray — a Ray-Data-native time-series rollup / downsample / retention engine.

A from-scratch engine with the query and transform semantics of
business-science/pytimetk (reference studied at /root/reference), re-expressed
Ray-Data-first: ``ray.data.Dataset`` pipelines, zero-copy Arrow batches in
``map_batches``, hash-partitioned per-conversation group kernels, actor pools
for stateful stages (tier codecs, model workers), and streaming execution.

The library NEVER calls ``ray.init()`` — sessions are owned by the caller
(driver, tests' conftest fixture, bench.py).
"""

from pytimetk_ray.ops.summarize_by_time import summarize_by_time
from pytimetk_ray.ops.pad_by_time import pad_by_time
from pytimetk_ray.ops.filter_by_time import filter_by_time
from pytimetk_ray.ops.shifts import augment_lags, augment_leads, augment_diffs, augment_pct_change
from pytimetk_ray.ops.rolling import augment_rolling
from pytimetk_ray.ops.expanding import augment_expanding
from pytimetk_ray.ops.ewm import augment_ewm
from pytimetk_ray.ops.ts_summary import ts_summary
from pytimetk_ray.ops.future_frame import future_frame
from pytimetk_ray.ops.signature import augment_timeseries_signature
from pytimetk_ray.ops.apply_by_time import apply_by_time
from pytimetk_ray.ops.anomalize import anomalize
from pytimetk_ray.ops.fourier import augment_fourier
from pytimetk_ray.ops.apply_window import augment_expanding_apply, augment_rolling_apply
from pytimetk_ray.ops.correlationfunnel import binarize, correlate
from pytimetk_ray.ops.cv import TimeSeriesCV, TimeSeriesCVSplitter
from pytimetk_ray.ops.diagnostics import acf_diagnostics, seasonal_diagnostics, stl_diagnostics
from pytimetk_ray.ops.holiday import augment_holiday_signature
from pytimetk_ray.ops.sequences import (
    make_future_timeseries,
    make_weekday_sequence,
    make_weekend_sequence,
    week_of_month,
)
from pytimetk_ray.ops.signal import augment_hilbert, augment_wavelet
from pytimetk_ray.ops import finance
from pytimetk_ray.ops.frame_utils import (
    ceil_date,
    drop_zero_variance,
    floor_date,
    glimpse,
    sort_dataset,
    transform_columns,
)
from pytimetk_ray.ops.frequency import (
    get_frequency,
    get_frequency_summary,
    get_seasonal_frequency,
    get_trend_frequency,
    time_scale_template,
)
from pytimetk_ray.ops.sessions import augment_sessions
from pytimetk_ray.ops.spline import augment_spline
from pytimetk_ray.ops.ts_features import ts_features
from pytimetk_ray.ops.regime import augment_regime_detection
from pytimetk_ray.ops.finance import (
    augment_adx,
    augment_atr,
    augment_bbands,
    augment_cmo,
    augment_drawdown,
    augment_ewma_volatility,
    augment_fip_momentum,
    augment_hurst_exponent,
    augment_macd,
    augment_ppo,
    augment_qsmomentum,
    augment_roc,
    augment_rolling_risk_metrics,
    augment_rsi,
    augment_stochastic_oscillator,
)

__version__ = "0.1.0"

__all__ = [
    "summarize_by_time",
    "pad_by_time",
    "filter_by_time",
    "augment_lags",
    "augment_leads",
    "augment_diffs",
    "augment_pct_change",
    "augment_rolling",
    "augment_expanding",
    "augment_ewm",
    "ts_summary",
    "future_frame",
    "augment_timeseries_signature",
    "apply_by_time",
    "anomalize",
    "augment_fourier",
]
