from .codec import decode, encode, phash64, psnr
from .synth import LAT_RANGE, LON_RANGE, gen_batch, gen_images, make_pixels

__all__ = [
    "encode",
    "decode",
    "psnr",
    "phash64",
    "gen_batch",
    "gen_images",
    "make_pixels",
    "LON_RANGE",
    "LAT_RANGE",
]
