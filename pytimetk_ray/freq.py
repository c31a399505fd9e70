"""Frequency parsing and timestamp floor/ceil kernels.

Reimplements (from scratch, numpy-vectorized over int64 timestamps) the
semantics of the reference's frequency helpers:

- ``parse_freq_str`` — regex split ``"3D"`` -> ``(3, "D")``
  (reference: src/pytimetk/utils/string_helpers.py:59-72)
- alias normalization (deprecated pandas aliases ``T``->``min``, ``H``->``h``,
  ``M``->``ME`` treated as month, ``A``->``Y``; reference:
  src/pytimetk/utils/datetime_helpers.py:69-87,180-225)
- human durations ``"15 minutes"`` / ``"3 months"``
  (reference: src/pytimetk/utils/datetime_helpers.py:90-177)
- ``floor_date`` incl. multi-month/quarter/year floors via
  ``((month-1)//q)*q+1`` integer math
  (reference: src/pytimetk/utils/datetime_helpers.py:336-465)

Everything operates on ``numpy int64`` arrays in an explicit time unit so the
kernels run zero-copy inside ``map_batches(batch_format="pyarrow")``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

# ns per unit for fixed-width frequencies.
_NS = {
    "ns": 1,
    "us": 1_000,
    "ms": 1_000_000,
    "s": 1_000_000_000,
    "min": 60 * 1_000_000_000,
    "h": 3_600 * 1_000_000_000,
    "D": 86_400 * 1_000_000_000,
    "W": 7 * 86_400 * 1_000_000_000,
}

# Alias normalization: pandas offset aliases (old + new) -> canonical unit.
_ALIASES = {
    "n": "ns", "ns": "ns",
    "u": "us", "us": "us",
    "l": "ms", "ms": "ms",
    "s": "s", "sec": "s", "second": "s", "seconds": "s",
    "t": "min", "min": "min", "minute": "min", "minutes": "min",
    "h": "h", "hr": "h", "hour": "h", "hours": "h",
    "d": "D", "day": "D", "days": "D",
    "w": "W", "week": "W", "weeks": "W",
    "m": "M", "me": "M", "ms_": "MS", "month": "M", "months": "M", "mo": "M",
    "q": "Q", "qe": "Q", "qs": "Q", "quarter": "Q", "quarters": "Q",
    "y": "Y", "ye": "Y", "ys": "Y", "a": "Y", "year": "Y", "years": "Y",
    "mon": "M",
}

_FREQ_RE = re.compile(r"^\s*(\d*)\s*([A-Za-z_]+)\s*$")

# Calendar (non-fixed-width) units.
CALENDAR_UNITS = {"M", "Q", "Y"}

# Multipliers from a timestamp's storage unit to ns.
UNIT_TO_NS = {"s": 1_000_000_000, "ms": 1_000_000, "us": 1_000, "ns": 1}

# Week floor anchor: 1969-12-29 was a Monday (epoch 1970-01-01 = Thursday).
# DuckDB's date_trunc('week') and pandas W-MON agree on Monday starts.
_MONDAY_ANCHOR_NS = -3 * 86_400 * 1_000_000_000


@dataclass(frozen=True)
class Freq:
    """A parsed frequency: ``n`` repetitions of canonical ``unit``."""

    n: int
    unit: str  # one of ns us ms s min h D W M Q Y

    @property
    def is_calendar(self) -> bool:
        return self.unit in CALENDAR_UNITS

    def step_ns(self) -> int:
        """Fixed-width step in nanoseconds; raises for calendar units."""
        if self.is_calendar:
            raise ValueError(f"calendar unit {self.unit!r} has no fixed ns width")
        return self.n * _NS[self.unit]

    def step(self, unit: str) -> int:
        """Fixed-width step expressed in a storage unit ('s'|'ms'|'us'|'ns')."""
        ns = self.step_ns()
        div = UNIT_TO_NS[unit]
        if ns % div:
            raise ValueError(f"step {self.n}{self.unit} not representable in {unit}")
        return ns // div

    # months represented by this calendar freq (for M/Q/Y floors)
    def months(self) -> int:
        return {"M": 1, "Q": 3, "Y": 12}[self.unit] * self.n


_HUMAN_RE = re.compile(r"^\s*(\d+)\s+([A-Za-z]+)\s*$")


def parse_freq(freq: str | Freq) -> Freq:
    """Parse a frequency string: pandas alias ('D', '3h', 'MS', 'ME', '1min',
    'W'), or human duration ('15 minutes', '3 months')."""
    if isinstance(freq, Freq):
        return freq
    s = str(freq)
    m = _FREQ_RE.match(s)
    if not m:
        m = _HUMAN_RE.match(s)
        if not m:
            raise ValueError(f"unparseable frequency: {freq!r}")
    n_str, unit_raw = m.group(1), m.group(2)
    n = int(n_str) if n_str else 1
    key = unit_raw.lower()
    # Preserve case distinction pandas makes between 'M' (month-end), 'MS'
    # (month-start), 'T'/'min'. For bucketing, month-end and month-start both
    # floor to the month boundary (start label), matching
    # date_trunc('month', ...) and the reference's floor_date month path.
    if unit_raw in ("M", "MS", "ME"):
        unit = "M"
    elif unit_raw in ("Q", "QS", "QE"):
        unit = "Q"
    elif unit_raw in ("Y", "YS", "YE", "A", "AS"):
        unit = "Y"
    elif unit_raw == "T":
        unit = "min"
    elif unit_raw == "S":
        unit = "s"
    elif key in _ALIASES:
        unit = _ALIASES[key]
    else:
        raise ValueError(f"unknown frequency unit: {unit_raw!r}")
    return Freq(n, unit)


def floor_i64(values: np.ndarray, unit: str, freq: str | Freq) -> np.ndarray:
    """Floor int64 timestamps (in storage ``unit``) to the frequency grid.

    Fixed-width units: ``ts - ((ts - anchor) mod step)`` with epoch anchor
    (Monday anchor for weeks).  Calendar units (M/Q/Y): integer year/month
    math, multi-month floors as ``((month-1)//q)*q`` (reference:
    datetime_helpers.py:439-457).  Vectorized; no Python loop.
    """
    f = parse_freq(freq)
    v = np.asarray(values, dtype=np.int64)
    if not f.is_calendar:
        step = f.step(unit)
        anchor = 0
        if f.unit == "W":
            anchor = _MONDAY_ANCHOR_NS // UNIT_TO_NS[unit]
        rel = v - anchor
        out = v - _pos_mod(rel, step)
        return out
    # Calendar path: go through numpy datetime64 month arithmetic.
    dt = v.astype(f"datetime64[{unit}]")
    months = dt.astype("datetime64[M]").astype(np.int64)  # months since 1970-01
    q = f.months()
    floored_months = (months // q) * q if q > 1 else months
    # handle pre-epoch correctly (floor division already floors negatives)
    out_dt = floored_months.astype("datetime64[M]").astype(f"datetime64[{unit}]")
    return out_dt.astype(np.int64)


def ceil_i64(values: np.ndarray, unit: str, freq: str | Freq) -> np.ndarray:
    """Ceil = floor + one step for values not already on the grid
    (reference: datetime_helpers.py:489-547)."""
    f = parse_freq(freq)
    fl = floor_i64(values, unit, freq)
    v = np.asarray(values, dtype=np.int64)
    on_grid = fl == v
    if not f.is_calendar:
        step = f.step(unit)
        return np.where(on_grid, v, fl + step)
    months = fl.astype(f"datetime64[{unit}]").astype("datetime64[M]").astype(np.int64)
    nxt = (months + f.months()).astype("datetime64[M]").astype(f"datetime64[{unit}]").astype(np.int64)
    return np.where(on_grid, v, nxt)


def _pos_mod(a: np.ndarray, m: int) -> np.ndarray:
    """Non-negative modulo (numpy % is already floored for int64)."""
    return a % m


def freq_to_timedelta_ns(freq: str | Freq) -> int:
    """Approximate fixed ns for any unit (months ~= 30.44 days, matching the
    reference's freq_to_timedelta approximation, datetime_helpers.py:614-621).
    Used only for *comparisons/inference*, never for bucket math."""
    f = parse_freq(freq)
    if not f.is_calendar:
        return f.step_ns()
    approx_day = 86_400 * 1_000_000_000
    per_month = int(30.44 * approx_day)
    return f.months() * per_month
