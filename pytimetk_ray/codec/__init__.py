from pytimetk_ray.codec.bits import BitReader, BitWriter
from pytimetk_ray.codec.gorilla import gorilla_decode, gorilla_encode
from pytimetk_ray.codec.dod import dod_decode, dod_encode

__all__ = [
    "BitReader",
    "BitWriter",
    "gorilla_encode",
    "gorilla_decode",
    "dod_encode",
    "dod_decode",
]
