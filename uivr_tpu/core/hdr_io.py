"""Radiance RGBE (.hdr) codec — dependency-free.

The paper's environment maps are Radiance HDR files (reference
scene_config.py:102 `textures/gamrig_2k.hdr`); Mitsuba reads them through
its native Bitmap class (N13 in SURVEY.md).  This implements the reader
(both the new-style per-component RLE scanlines and flat RGBE pixels) and
a flat-format writer for round-trip tests.

Format: text header terminated by an empty line, a resolution line
``-Y H +X W``, then H scanlines.  New-RLE scanlines start with bytes
(2, 2, W>>8, W&255) followed by 4 run-length-encoded component planes;
otherwise pixels are raw 4-byte RGBE (with (1,1,1,n) old-style run markers).
Pixel decode: rgb = (mantissa + 0) / 256 * 2^(e - 128).
"""
from __future__ import annotations

import numpy as np


def write_hdr(path: str, img: np.ndarray) -> None:
    """Write (H, W, 3) float32 as flat (non-RLE) RGBE."""
    img = np.asarray(img, np.float32)
    H, W, _ = img.shape
    maxc = img.max(axis=-1)
    valid = maxc > 1e-32
    e = np.zeros((H, W), np.int32)
    mant = np.zeros((H, W), np.float64)
    m, ex = np.frexp(maxc[valid])            # maxc = m * 2^ex, m in [0.5,1)
    e[valid] = ex
    mant[valid] = m / maxc[valid] * 256.0
    rgbe = np.zeros((H, W, 4), np.uint8)
    scaled = np.clip(img * mant[..., None], 0, 255)
    rgbe[..., :3] = scaled.astype(np.uint8)
    rgbe[..., 3] = np.where(valid, e + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {H} +X {W}\n".encode())
        f.write(rgbe.tobytes())


def _decode_rgbe(rgbe: np.ndarray) -> np.ndarray:
    e = rgbe[..., 3].astype(np.int32)
    scale = np.where(e > 0, np.ldexp(1.0, e - 136), 0.0)  # 2^(e-128)/256
    return (rgbe[..., :3].astype(np.float32) * scale[..., None]
            ).astype(np.float32)


def read_hdr(path: str) -> np.ndarray:
    """Read a .hdr file into (H, W, 3) float32 linear radiance."""
    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(b"#?"):
        raise ValueError(f"{path}: not a Radiance file")
    # header: lines until the first empty line, then the resolution line
    pos = 0
    while True:
        nl = data.index(b"\n", pos)
        if nl == pos:                       # empty line ends the header
            pos = nl + 1
            break
        pos = nl + 1
    nl = data.index(b"\n", pos)
    res = data[pos:nl].split()
    pos = nl + 1
    if len(res) != 4 or res[0] != b"-Y" or res[2] != b"+X":
        raise ValueError(f"{path}: unsupported orientation {res}")
    H, W = int(res[1]), int(res[3])
    # native fast path (native/uivr_native.cpp): the per-byte RLE loop over
    # multi-megapixel envmaps belongs in C++, like Mitsuba's Bitmap
    from ..native import hdr_decode_scanlines
    nat = hdr_decode_scanlines(data[pos:], W, H)
    if nat is not None:
        return _decode_rgbe(nat)
    buf = np.frombuffer(data, np.uint8, offset=pos)
    out = np.zeros((H, W, 4), np.uint8)
    i = 0
    for y in range(H):
        if (W >= 8 and W < 32768 and buf[i] == 2 and buf[i + 1] == 2
                and (int(buf[i + 2]) << 8 | int(buf[i + 3])) == W):
            i += 4                          # new-style RLE scanline
            for c in range(4):
                x = 0
                while x < W:
                    n = int(buf[i])
                    if n > 128:             # run of one value
                        out[y, x:x + n - 128, c] = buf[i + 1]
                        x += n - 128
                        i += 2
                    else:                   # literal dump of n values
                        out[y, x:x + n, c] = buf[i + 1:i + 1 + n]
                        x += n
                        i += 1 + n
        else:                               # flat (possibly old-style runs)
            x = 0
            rshift = 0
            while x < W:
                px = buf[i:i + 4]
                if px[0] == 1 and px[1] == 1 and px[2] == 1 and x > 0:
                    # old-style run marker; CONSECUTIVE markers shift the
                    # count 8 bits further each (Radiance color.c rule for
                    # runs longer than 255 pixels)
                    if rshift > 24:       # corrupt: count would overflow W
                        raise ValueError("corrupt old-style RLE run")
                    n = int(px[3]) << rshift
                    if x + n > W:
                        raise ValueError("old-style RLE run exceeds width")
                    out[y, x:x + n] = out[y, x - 1]
                    x += n
                    rshift += 8
                else:
                    out[y, x] = px
                    x += 1
                    rshift = 0
                i += 4
    return _decode_rgbe(out)
