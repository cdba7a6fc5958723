"""Self-contained image codecs + perceptual hash for the Lance-shaped corpus.

The sandbox has no PIL / imagehash / lance, so the image payloads in the
``web`` table use three self-implemented formats (FIXTURES.md F1):

- ``raw16``: raw interleaved RGB bytes (lossless).
- ``pngz``:  zlib-compressed raw scanlines (lossless; PNG-filter-0 style).
- ``qnt``:   5-bit uniform quantization (lossy stand-in; decoded PSNR vs the
             source is ~40.7 dB, satisfying the input_hint's PSNR>=40dB gate).

``phash`` is a 64-bit average-hash of the 8x8 block-mean downsampled
grayscale image, row-major, MSB first (documented bit order per FIXTURES).

Real-image decode (jpeg/png via PIL) is gated behind an import-try in
stages/multimodal.py — the Ray-side plumbing is identical either way.
"""

from __future__ import annotations

import zlib

import numpy as np

from cocrawler_ray.hashing import hash64, splitmix64

FORMATS = ("raw16", "pngz", "qnt", "qntz")
# qntz = 5-bit quantization THEN zlib: the quantized plane's entropy is
# ~5 bits/sample, so deflate actually bites — the archive/migration
# target format (qnt alone stores one byte per sample, saving nothing).
# Fixture round-robins index with % 3, so corpora stay three-format;
# qntz appears via pipelines/transcode.py output.


def make_image(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 gradient+noise image seeded by image_id."""
    seed = int(hash64([image_id])[0] & np.uint64(0x7FFFFFFF))
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 255) // max(1, w - 1) + (yy * 255) // max(1, h - 1)) // 2
    img = np.stack(
        [
            (base + rng.integers(0, 64, size=(h, w))) % 256,
            ((255 - base) + rng.integers(0, 64, size=(h, w))) % 256,
            ((base // 2) + rng.integers(0, 64, size=(h, w))) % 256,
        ],
        axis=-1,
    )
    return img.astype(np.uint8)


def encode(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw16":
        return img.tobytes()
    if fmt == "pngz":
        return zlib.compress(img.tobytes(), level=1)
    if fmt == "qnt":
        return (img >> 3).astype(np.uint8).tobytes()
    if fmt == "qntz":
        return zlib.compress((img >> 3).astype(np.uint8).tobytes(), level=1)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    if fmt == "raw16":
        return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    if fmt == "pngz":
        return np.frombuffer(zlib.decompress(data), dtype=np.uint8).reshape(h, w, 3)
    if fmt == "qnt":
        q = np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
        return ((q.astype(np.uint16) << 3) + 4).clip(0, 255).astype(np.uint8)
    if fmt == "qntz":
        q = np.frombuffer(zlib.decompress(data), dtype=np.uint8).reshape(h, w, 3)
        return ((q.astype(np.uint16) << 3) + 4).clip(0, 255).astype(np.uint8)
    raise ValueError(f"unknown fmt {fmt!r}")


def roundtrip_sse(img: np.ndarray, fmt: str) -> tuple[bytes, int]:
    """Encode ``img`` as ``fmt``, decode back, return (encoded bytes,
    integer sum of squared pixel error) — the ONE loss kernel shared by
    the q_transcode_audit measure stage and the transcode migration
    gate, so the two can never drift."""
    enc = encode(img, fmt)
    back = decode(enc, img.shape[1], img.shape[0], fmt)
    d = img.astype(np.int64) - back.astype(np.int64)
    return enc, int((d * d).sum())


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0 / np.sqrt(mse)))


def average_phash(img: np.ndarray) -> int:
    """64-bit average-hash: 8x8 block-mean grayscale, bit=block>mean.

    Bit order: row-major over the 8x8 grid, MSB first (bit 63 = top-left).
    Returned as signed int64 (two's complement) to fit the Arrow column.
    """
    h, w = img.shape[:2]
    gray = img.mean(axis=2) if img.ndim == 3 else img.astype(np.float64)
    # block-mean downsample to 8x8 (pad by edge if not divisible)
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    small = np.empty((8, 8), dtype=np.float64)
    for i in range(8):
        for j in range(8):
            small[i, j] = gray[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    bits = (small > small.mean()).flatten()
    val = np.uint64(0)
    for k, b in enumerate(bits):
        if b:
            val |= np.uint64(1) << np.uint64(63 - k)
    return int(val.astype(np.int64).view(np.int64))


def difference_dhash(img: np.ndarray) -> int:
    """64-bit difference-hash (dhash): 8x9 block-mean grayscale grid,
    bit = right block mean > left block mean — a gradient-direction
    perceptual hash, robust where average-hash fails (uniform brightness
    or contrast shifts cancel in the comparison: (S2+kC2)·C1 > (S1+kC1)·C2
    reduces to S2·C1 > S1·C2).

    Integer-exact: blocks hold gray*3 = r+g+b sums; unequal block sizes
    (w need not divide by 9) compare via cross-multiplication, so the
    SQL oracle can restate every bit. Pixel (y, x) maps to block
    (y*8//h, x*9//w) — the same floor-partition the phash/resize oracles
    use. Bit order: row-major over the 8x8 comparison grid, MSB first.
    """
    h, w = img.shape[:2]
    s3 = img.reshape(h, w, -1).astype(np.int64).sum(axis=2)
    bi = (np.arange(h) * 8) // h
    bj = (np.arange(w) * 9) // w
    flat = (bi[:, None] * 9 + bj[None, :]).ravel()
    # sums stay far below 2^53, so float64 bincount weights are exact
    s = np.bincount(flat, weights=s3.ravel(), minlength=72) \
        .astype(np.int64).reshape(8, 9)
    c = np.bincount(flat, minlength=72).astype(np.int64).reshape(8, 9)
    bits = (s[:, 1:] * c[:, :-1] > s[:, :-1] * c[:, 1:]).ravel()
    val = np.uint64(0)
    for k in np.nonzero(bits)[0]:
        val |= np.uint64(1) << np.uint64(63 - int(k))
    return int(val.astype(np.int64).view(np.int64))


def phash_hamming(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized hamming distance between int64 phash arrays."""
    x = a.astype(np.int64).view(np.uint64) ^ b.astype(np.int64).view(np.uint64)
    # popcount via bit tricks (numpy has no popcount until 2.0)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int32)


def fmt_for(image_id: str) -> str:
    """Deterministic format choice per page (round-robins the three codecs)."""
    return FORMATS[int(splitmix64(hash64([image_id]))[0] % np.uint64(3))]
