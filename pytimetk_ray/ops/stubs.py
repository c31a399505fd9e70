"""Backward-compat re-exports.  Both operators that once lived here as
dependency-gated stubs now have full self-contained implementations:

- ``ts_features`` -> ops/ts_features.py (37-feature builtin set from public
  formulas, incl. the GARCH(1,1) heterogeneity quartet via a built-in numpy
  quasi-MLE — nothing external needed)
- ``augment_regime_detection`` -> ops/regime.py (numpy Gaussian-HMM EM)"""

from __future__ import annotations



def ts_features(ds, date_column, value_column, **kw):
    """Full implementation now lives in ops/ts_features.py (37-feature
    builtin set covering the tsfeatures default surface incl. GARCH(1,1)
    heterogeneity).  Kept here as a re-export."""
    from pytimetk_ray.ops.ts_features import ts_features as impl

    return impl(ds, date_column, value_column, **kw)


def augment_regime_detection(ds, group_keys, order_by, close_column, **kw):
    """Rolling-window HMM regimes — real implementation in ops/regime.py
    (self-contained numpy Gaussian-HMM EM; no hmmlearn needed).  Kept here
    as a re-export for callers that imported the former stub."""
    from pytimetk_ray.ops.regime import augment_regime_detection as impl

    return impl(ds, group_keys, order_by, close_column, **kw)
