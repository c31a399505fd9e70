"""Multimodal (image/audio/video) column stages — Ray-side plumbing.

Media are opaque ``binary`` columns with typed metadata columns alongside
(``media_type``, ``width``/``height`` or ``sample_rate``...).  Decode /
resize / frame-sample run as actor-pool ``map_batches`` stages with SMALL
batch sizes (binary payloads are wide — batch_size x concurrency must fit a
worker heap; let the object store spill, never hold Python lists).

The codec libraries (Pillow / soundfile) are import-guarded: when present,
``use_fake_decode=False`` decodes for real (codec loaded ONCE per actor in
``__init__`` — the actor-pool pattern).  When absent, the real branch
falls back to the stdlib-only codecs in :mod:`.media_codec` (PNG via
zlib-unfilter, WAV via ``wave``) — so real decode is exact-pinned by tests
even in codec-less containers; payloads in other formats raise with the
install fix spelled out.  ``use_fake_decode=True`` (default) produces a
deterministic fake (seeded from the payload hash) with the real output
schema so every surrounding stage stays testable on synthetic payloads.
"""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pandas as pd

import ray.data as rd


def _import_pil():
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


def _import_soundfile():
    try:
        import soundfile
        return soundfile
    except ImportError:
        return None


class ImageDecoder:
    """binary payload -> fixed-size float32 pixel tensor (H*W*C flat).

    ``use_fake_decode=False``: real decode, normalized to [0, 1].  With
    Pillow importable it handles any PIL format (convert + resize); the
    import happens once per actor in ``__init__``.  Without Pillow, PNG
    payloads decode via the stdlib :mod:`.media_codec` path (channel
    conversion with PIL's ITU-R 601-2 luma integers, nearest-neighbor
    resize when dimensions differ) and other formats raise ValueError with
    the install fix.  The fake decoder derives a deterministic array from
    the payload hash."""

    def __init__(self, height: int = 32, width: int = 32, channels: int = 3,
                 use_fake_decode: bool = True):
        self.shape = (height, width, channels)
        self.use_fake_decode = use_fake_decode
        if not use_fake_decode:
            self._pil = _import_pil()

    def _decode_builtin(self, payload: bytes) -> np.ndarray:
        from pytimetk_ray.stages.media_codec import png_decode

        h, w, c = self.shape
        arr = png_decode(payload).astype(np.int64)  # (H0, W0, C0)
        c0 = arr.shape[2]
        if c0 == 2:  # gray+alpha -> gray (alpha dropped, as PIL convert)
            arr = arr[:, :, :1]
            c0 = 1
        elif c0 == 4:  # RGBA -> RGB
            arr = arr[:, :, :3]
            c0 = 3
        if c == 1 and c0 == 3:  # PIL "L": truncated ITU-R 601-2 luma
            arr = ((arr[:, :, 0] * 299 + arr[:, :, 1] * 587
                    + arr[:, :, 2] * 114) // 1000)[:, :, None]
        elif c == 3 and c0 == 1:
            arr = np.repeat(arr, 3, axis=2)
        h0, w0 = arr.shape[:2]
        if (h0, w0) != (h, w):  # nearest-neighbor floor sampling
            arr = arr[np.minimum((np.arange(h) * h0) // h, h0 - 1)][
                :, np.minimum((np.arange(w) * w0) // w, w0 - 1)]
        return (arr.astype(np.float32) / np.float32(255.0)).reshape(-1)

    def _decode_one(self, payload: bytes) -> np.ndarray:
        h, w, c = self.shape
        if not self.use_fake_decode:
            if self._pil is None:
                if bytes(payload[:8]) == b"\x89PNG\r\n\x1a\n":
                    return self._decode_builtin(payload)
                raise ValueError(
                    "real decode of non-PNG payloads requires Pillow "
                    "(pip install Pillow); only the stdlib PNG path is "
                    "available in this environment")
            img = self._pil.open(io.BytesIO(payload))
            img = img.convert("L" if c == 1 else "RGB").resize((w, h))
            arr = np.asarray(img, dtype=np.float32) / np.float32(255.0)
            return arr.reshape(-1)[: h * w * c]
        seed = int.from_bytes(hashlib.blake2b(payload or b"", digest_size=8).digest(), "big")
        rng = np.random.default_rng(seed)
        return rng.random(int(np.prod(self.shape)), dtype=np.float32)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = [self._decode_one(p) for p in batch["payload"]]
        out = pd.DataFrame(
            {
                "media_id": batch["media_id"].to_numpy(),
                "height": self.shape[0],
                "width": self.shape[1],
                "channels": self.shape[2],
            }
        )
        out["pixels"] = feats
        return out


class AudioFrameSampler:
    """binary payload -> per-frame RMS energy over ``n_frames`` equal chunks.

    ``use_fake_decode=False``: real decode (mono-mixed, chunked RMS) —
    soundfile when importable, else the stdlib :mod:`.media_codec` WAV path
    (same float32 convention; non-WAV payloads then raise).  Fake path:
    deterministic energies from the payload hash."""

    def __init__(self, n_frames: int = 16, use_fake_decode: bool = True):
        self.n_frames = n_frames
        self.use_fake_decode = use_fake_decode
        if not use_fake_decode:
            self._sf = _import_soundfile()

    def _energies_one(self, payload: bytes) -> np.ndarray:
        if not self.use_fake_decode:
            if self._sf is not None:
                data, _sr = self._sf.read(io.BytesIO(payload), dtype="float32")
            else:
                if bytes(payload[:4]) != b"RIFF":
                    raise ValueError(
                        "real decode of non-WAV payloads requires soundfile "
                        "(pip install soundfile); only the stdlib WAV path "
                        "is available in this environment")
                from pytimetk_ray.stages.media_codec import wav_decode

                data, _sr = wav_decode(payload)
            if data.ndim > 1:
                data = data.mean(axis=1)
            chunks = np.array_split(data, self.n_frames)
            return np.array(
                [np.sqrt(np.mean(ch * ch)) if len(ch) else 0.0 for ch in chunks],
                dtype=np.float32)
        seed = int.from_bytes(hashlib.blake2b(payload or b"", digest_size=8).digest(), "big")
        rng = np.random.default_rng(seed)
        return rng.random(self.n_frames, dtype=np.float32)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        energies = [self._energies_one(p) for p in batch["payload"]]
        out = pd.DataFrame({"media_id": batch["media_id"].to_numpy()})
        out["frame_energy"] = energies
        return out


class ImageResizer:
    """Decoded pixel tensors -> nearest-neighbor resize.  REAL compute (no
    codec needed once pixels exist): one vectorized numpy gather per batch
    over the stacked (B, H, W, C) tensor.  The index grids are built once
    per actor in ``__init__`` — the canonical stateful-stage pattern."""

    def __init__(self, in_shape=(32, 32, 3), out_hw=(16, 16)):
        self.in_shape = tuple(in_shape)
        self.out_hw = tuple(out_hw)
        ih, iw, _ = self.in_shape
        oh, ow = self.out_hw
        # nearest-neighbor source index per output pixel (floor sampling)
        self.row_idx = np.minimum((np.arange(oh) * ih) // oh, ih - 1)
        self.col_idx = np.minimum((np.arange(ow) * iw) // ow, iw - 1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ih, iw, c = self.in_shape
        oh, ow = self.out_hw
        if len(batch) == 0:
            out = pd.DataFrame({"media_id": [], "height": [], "width": [],
                                "channels": []})
            out["pixels"] = []
            return out
        px = np.stack([np.asarray(p, dtype=np.float32) for p in batch["pixels"]])
        px = px.reshape(len(batch), ih, iw, c)
        small = px[:, self.row_idx][:, :, self.col_idx]  # (B, oh, ow, c)
        out = pd.DataFrame({
            "media_id": batch["media_id"].to_numpy(),
            "height": oh, "width": ow, "channels": c,
        })
        out["pixels"] = list(small.reshape(len(batch), oh * ow * c))
        return out


class FeatureExtractor:
    """Decoded pixels -> embedding via a projection matrix loaded ONCE per
    actor in ``__init__`` (stands in for a model checkpoint load; the
    matmul compute and batching are real, the weights are seeded)."""

    def __init__(self, in_dim: int, out_dim: int = 64, seed: int = 9):
        rng = np.random.default_rng(seed)
        self.W = rng.standard_normal((in_dim, out_dim)).astype(np.float32)
        self.W /= np.sqrt(in_dim)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            out = pd.DataFrame({"media_id": []})
            out["embedding"] = []
            return out
        px = np.stack([np.asarray(p, dtype=np.float32) for p in batch["pixels"]])
        emb = px @ self.W  # (B, out_dim), one BLAS call per batch
        out = pd.DataFrame({"media_id": batch["media_id"].to_numpy()})
        out["embedding"] = list(emb)
        return out


def decode_images(ds: rd.Dataset, *, concurrency: int = 2, batch_size: int = 64,
                  **kw) -> rd.Dataset:
    """Actor-pool decode stage; small batches for wide binary rows."""
    return ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs=kw,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def resize_images(ds: rd.Dataset, *, concurrency: int = 2, batch_size: int = 64,
                  **kw) -> rd.Dataset:
    return ds.map_batches(
        ImageResizer, fn_constructor_kwargs=kw, batch_format="pandas",
        batch_size=batch_size, concurrency=concurrency, num_cpus=1,
    )


def extract_features(ds: rd.Dataset, *, in_dim: int, concurrency: int = 2,
                     batch_size: int = 64, **kw) -> rd.Dataset:
    return ds.map_batches(
        FeatureExtractor, fn_constructor_kwargs=dict(in_dim=in_dim, **kw),
        batch_format="pandas", batch_size=batch_size, concurrency=concurrency,
        num_cpus=1,
    )
