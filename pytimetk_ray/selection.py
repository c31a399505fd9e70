"""Tidy column selectors, resolved driver-side against a schema.

Reference: src/pytimetk/utils/selection.py:22-249 — literal names,
sequences, regex patterns, and the helpers contains / starts_with /
ends_with / matches.  Resolution happens eagerly against the Dataset's
Arrow schema BEFORE any pipeline is built (cheap, driver-side)."""

from __future__ import annotations

import re
from typing import Callable, Sequence


def contains(sub: str) -> Callable[[str], bool]:
    return lambda name: sub in name


def starts_with(prefix: str) -> Callable[[str], bool]:
    return lambda name: name.startswith(prefix)


def ends_with(suffix: str) -> Callable[[str], bool]:
    return lambda name: name.endswith(suffix)


def matches(pattern: str) -> Callable[[str], bool]:
    rx = re.compile(pattern)
    return lambda name: rx.search(name) is not None


def resolve_column_selection(schema_names: Sequence[str], selector) -> list[str]:
    """Resolve a selector (str, list, regex, callable, or mix) to concrete
    column names, preserving schema order; raises on no match."""
    names = list(schema_names)
    if isinstance(selector, str):
        if selector in names:
            return [selector]
        raise KeyError(f"column {selector!r} not in schema {names}")
    if isinstance(selector, re.Pattern):
        out = [n for n in names if selector.search(n)]
    elif callable(selector):
        out = [n for n in names if selector(n)]
    elif isinstance(selector, (list, tuple, set)):
        out = []
        for s in selector:
            for n in resolve_column_selection(names, s):
                if n not in out:
                    out.append(n)
        out = [n for n in names if n in out]
    else:
        raise TypeError(f"unsupported selector: {selector!r}")
    if not out:
        raise KeyError(f"selector {selector!r} matched no columns in {names}")
    return out
