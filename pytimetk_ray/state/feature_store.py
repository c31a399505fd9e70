"""FeatureStore — named, cached, versioned pipeline steps.

Reference behavior (src/pytimetk/feature_store/store.py): registered
transforms (:321-352), sha256 cache keys over (input fingerprint, transform
source, params) (:99-103), parquet artifacts + JSON catalog (:282-420),
cache-hit short-circuit on build (:381-398).

Re-expressed for Ray Data: a registered step is ``fn(Dataset, **params) ->
Dataset``; ``build`` materializes it to partitioned parquet under the store
root keyed by the cache key, writes a catalog entry, and returns a
``read_parquet`` Dataset.  A matching cache key skips the whole pipeline —
this is the operator-level complement of the per-partition tier manifests
(state/manifest.py)."""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import shutil
from typing import Callable

import ray.data as rd


class FeatureStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._transforms: dict[str, Callable] = {}
        self.catalog_path = os.path.join(root, "catalog.json")

    # -- registry -----------------------------------------------------------

    def register(self, name: str, fn: Callable | None = None):
        """Register a transform (usable as a decorator)."""
        if fn is None:
            def deco(f):
                self._transforms[name] = f
                return f
            return deco
        self._transforms[name] = fn
        return fn

    # -- cache keys ---------------------------------------------------------

    def cache_key(self, name: str, input_fingerprint: str, params: dict) -> str:
        fn = self._transforms[name]
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            src = repr(fn)
        h = hashlib.sha256()
        h.update(name.encode())
        h.update(src.encode())
        h.update(input_fingerprint.encode())
        h.update(json.dumps(params, sort_keys=True, default=str).encode())
        return h.hexdigest()[:24]

    # -- build / load -------------------------------------------------------

    def build(self, name: str, ds: rd.Dataset, *, input_fingerprint: str,
              overwrite: bool = False, **params) -> rd.Dataset:
        """Run (or cache-hit) a registered transform; returns the
        materialized Dataset read back from the store."""
        key = self.cache_key(name, input_fingerprint, params)
        path = os.path.join(self.root, name, key)
        done = os.path.join(path, "_SUCCESS")
        if os.path.exists(done) and not overwrite:
            return rd.read_parquet(path)
        if os.path.exists(path):
            shutil.rmtree(path)
        out = self._transforms[name](ds, **params)
        os.makedirs(path, exist_ok=True)
        out.write_parquet(path)
        with open(done, "w") as f:
            f.write("ok")
        self._update_catalog(name, key, input_fingerprint, params, path)
        return rd.read_parquet(path)

    def load(self, name: str, key: str) -> rd.Dataset:
        return rd.read_parquet(os.path.join(self.root, name, key))

    def _update_catalog(self, name, key, fingerprint, params, path):
        catalog = {}
        if os.path.exists(self.catalog_path):
            with open(self.catalog_path) as f:
                catalog = json.load(f)
        catalog.setdefault(name, {})[key] = {
            "input_fingerprint": fingerprint,
            "params": {k: str(v) for k, v in params.items()},
            "path": path,
        }
        tmp = self.catalog_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(catalog, f, indent=1)
        os.replace(tmp, self.catalog_path)
