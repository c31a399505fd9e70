"""Codec round-trip bit-equality (FIXTURES.md `codec_vectors`)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pytimetk_ray.codec import dod_decode, dod_encode, gorilla_decode, gorilla_encode


def roundtrip_f(v):
    v = np.asarray(v, dtype=np.float64)
    out = gorilla_decode(gorilla_encode(v), len(v))
    np.testing.assert_array_equal(v.view(np.uint64), out.view(np.uint64))


def roundtrip_t(t):
    t = np.asarray(t, dtype=np.int64)
    np.testing.assert_array_equal(t, dod_decode(dod_encode(t), len(t)))


def test_gorilla_basic_vectors():
    roundtrip_f([])
    roundtrip_f([0.0])
    roundtrip_f([1.5, 1.5, 1.5, 1.5])                      # constants -> 1 bit each
    roundtrip_f(np.linspace(0, 1, 257))                    # monotone ramp
    roundtrip_f([np.nan, np.inf, -np.inf, 0.0, -0.0, 5e-324, 1.7976931348623157e308])
    rng = np.random.default_rng(3)
    roundtrip_f(rng.normal(size=1000) * 10.0 ** rng.integers(-10, 10, size=1000))


def test_gorilla_nan_payload_preserved():
    weird_nan = np.frombuffer(np.uint64(0x7FF8DEADBEEF0001).tobytes(), dtype=np.float64)
    out = gorilla_decode(gorilla_encode(weird_nan), 1)
    assert out.view(np.uint64)[0] == 0x7FF8DEADBEEF0001


def test_gorilla_compresses_constants():
    v = np.full(10_000, 42.5)
    blob = gorilla_encode(v)
    assert len(blob) < 10_000 / 4  # ~1 bit/point after the first


def test_dod_vectors():
    roundtrip_t([])
    roundtrip_t([17])
    roundtrip_t(np.arange(0, 10_000_000, 60_000_000)[:100])  # regular 60s in us
    base = np.int64(1_700_000_000_000_000)
    rng = np.random.default_rng(4)
    gaps = rng.integers(1, 10**9, size=500)
    roundtrip_t(base + np.cumsum(gaps))
    roundtrip_t([5, 5, 5, 5])                                # repeated timestamps
    roundtrip_t([-(2**62), 0, 2**62])                        # extreme jumps


def test_dod_compresses_regular_grid():
    t = np.arange(0, 60_000_000 * 10_000, 60_000_000, dtype=np.int64)
    blob = dod_encode(t)
    assert len(blob) < 10_000 / 4  # ~1 bit/point on a perfect grid


@settings(max_examples=50, deadline=None)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True, width=64), max_size=60))
def test_gorilla_property(vals):
    roundtrip_f(vals)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=60))
def test_dod_property(vals):
    roundtrip_t(vals)


# --- vectorized multi-segment encoders: byte-identical to the scalar path ---

@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.lists(st.floats(allow_nan=True, allow_infinity=True, width=64),
             min_size=1, max_size=40),
    min_size=1, max_size=8))
def test_gorilla_many_byte_equal(segs):
    from pytimetk_ray.codec.vectorized import gorilla_encode_many

    vals = np.concatenate([np.asarray(s, dtype=np.float64) for s in segs])
    bounds = np.cumsum([0] + [len(s) for s in segs])
    blobs = gorilla_encode_many(vals, bounds)
    for blob, s in zip(blobs, segs):
        assert blob == gorilla_encode(np.asarray(s, dtype=np.float64))


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62),
             min_size=1, max_size=40),
    min_size=1, max_size=8))
def test_dod_many_byte_equal(segs):
    from pytimetk_ray.codec.vectorized import dod_encode_many

    vals = np.concatenate([np.asarray(s, dtype=np.int64) for s in segs])
    bounds = np.cumsum([0] + [len(s) for s in segs])
    blobs = dod_encode_many(vals, bounds)
    for blob, s in zip(blobs, segs):
        assert blob == dod_encode(np.asarray(s, dtype=np.int64))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True, width=64),
                min_size=1, max_size=80))
def test_gorilla_decode_fast_equals_slow(vals):
    from pytimetk_ray.codec.vectorized import gorilla_decode_fast

    v = np.asarray(vals, dtype=np.float64)
    b = gorilla_encode(v)
    a = gorilla_decode(b, len(v)).view(np.uint64)
    c = gorilla_decode_fast(b, len(v)).view(np.uint64)
    assert np.array_equal(a, c)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62),
                min_size=1, max_size=80))
def test_dod_decode_fast_equals_slow(vals):
    from pytimetk_ray.codec.vectorized import dod_decode_fast

    v = np.asarray(vals, dtype=np.int64)
    b = dod_encode(v)
    assert np.array_equal(dod_decode(b, len(v)), dod_decode_fast(b, len(v)))


# --- vectorized decode path (n >= SCALAR_CROSSOVER) + *_decode_many ---------
# ADVICE r4: the property tests above cap inputs at 60-80 values, so they
# only pinned the scalar decoders.  Here we lower SCALAR_CROSSOVER so the
# SAME small hypothesis inputs drive the vectorized bulk-probe/gather path,
# and pin *_decode_many against per-blob scalar decode.

@settings(max_examples=60, deadline=None)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True, width=64),
                min_size=1, max_size=80))
def test_gorilla_decode_vectorized_path(vals):
    from pytimetk_ray.codec import vectorized as vz

    v = np.asarray(vals, dtype=np.float64)
    b = gorilla_encode(v)
    old = vz.SCALAR_CROSSOVER
    try:
        vz.SCALAR_CROSSOVER = 0  # force the vectorized branch
        fast = vz.gorilla_decode_fast(b, len(v)).view(np.uint64)
    finally:
        vz.SCALAR_CROSSOVER = old
    assert np.array_equal(gorilla_decode(b, len(v)).view(np.uint64), fast)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62),
                min_size=1, max_size=80))
def test_dod_decode_vectorized_path(vals):
    from pytimetk_ray.codec import vectorized as vz

    v = np.asarray(vals, dtype=np.int64)
    b = dod_encode(v)
    old = vz.SCALAR_CROSSOVER
    try:
        vz.SCALAR_CROSSOVER = 0
        fast = vz.dod_decode_fast(b, len(v))
    finally:
        vz.SCALAR_CROSSOVER = old
    assert np.array_equal(dod_decode(b, len(v)), fast)


def test_decode_fast_large_inputs_use_vectorized_branch():
    # deterministic >=256-value vectors hit the UNPATCHED vectorized branch,
    # including the bulk-stride-probe backoff (interleaved '10 0 10 0')
    from pytimetk_ray.codec.vectorized import dod_decode_fast, gorilla_decode_fast

    rng = np.random.default_rng(11)
    vecs = [
        rng.normal(size=1000) * 10.0 ** rng.integers(-8, 8, size=1000),
        np.full(512, 3.25),                       # constant run
        np.repeat(rng.normal(size=300), 2),       # alternating 10/0 controls
        np.r_[np.full(256, 1.0), rng.normal(size=256), np.full(256, 1.0)],
    ]
    for v in vecs:
        b = gorilla_encode(v)
        assert np.array_equal(gorilla_decode(b, len(v)).view(np.uint64),
                              gorilla_decode_fast(b, len(v)).view(np.uint64))
    base = np.int64(1_700_000_000_000_000)
    tvecs = [
        base + np.cumsum(rng.integers(1, 10**9, size=1000)),
        np.arange(0, 60_000_000 * 600, 60_000_000, dtype=np.int64),
        base + np.cumsum(np.where(np.arange(600) % 2 == 0, 60, 61)),
    ]
    for t in tvecs:
        b = dod_encode(t)
        assert np.array_equal(dod_decode(b, len(t)), dod_decode_fast(b, len(t)))


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.lists(st.floats(allow_nan=True, allow_infinity=True, width=64),
             min_size=0, max_size=40),
    min_size=1, max_size=8))
def test_gorilla_decode_many_property(segs):
    from pytimetk_ray.codec.vectorized import gorilla_decode_many

    blobs = [gorilla_encode(np.asarray(s, dtype=np.float64)) for s in segs]
    ns = [len(s) for s in segs]
    got = gorilla_decode_many(blobs, ns).view(np.uint64)
    want = np.concatenate(
        [gorilla_decode(b, n).view(np.uint64) for b, n in zip(blobs, ns)]
        or [np.empty(0, dtype=np.uint64)])
    assert np.array_equal(want, got)


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62),
             min_size=0, max_size=40),
    min_size=1, max_size=8))
def test_dod_decode_many_property(segs):
    from pytimetk_ray.codec.vectorized import dod_decode_many

    blobs = [dod_encode(np.asarray(s, dtype=np.int64)) for s in segs]
    ns = [len(s) for s in segs]
    got = dod_decode_many(blobs, ns)
    want = np.concatenate(
        [dod_decode(b, n) for b, n in zip(blobs, ns)]
        or [np.empty(0, dtype=np.int64)])
    assert np.array_equal(want, got)
