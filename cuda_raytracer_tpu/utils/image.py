"""Image I/O and conversion.

PNG save/load (the analog of PathTracer::save_image's lodepng path,
src/pathtracer.cpp:577-591, without the vertical-flip quirk — our
framebuffers are already top-row-first) plus simple EXR-less HDR
handling for environment maps.
"""

from __future__ import annotations

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    """Clamp [H, W, 3] float radiance to 8-bit sRGB-ish output (the
    reference writes raw clamped floats; parity first, tonemap opt-in)."""
    return (np.clip(np.asarray(img), 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_png(path: str, img: np.ndarray) -> None:
    from PIL import Image

    arr = to_uint8(img)
    Image.fromarray(arr, mode="RGB").save(path)


def load_png(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0


def load_exr(path: str) -> np.ndarray:
    """Minimal scanline EXR loader for environment maps (the reference
    vendors tinyexr; we support uncompressed/ZIP scanline RGB float
    files via a tiny parser).  Raises on unsupported layouts."""
    import zlib
    import struct

    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"\x76\x2f\x31\x01":
        raise ValueError("not an EXR file")
    # header parse
    off = 8
    attrs = {}
    while True:
        end = data.index(b"\x00", off)
        name = data[off:end].decode()
        if not name:
            off = end + 1
            break
        off = end + 1
        end = data.index(b"\x00", off)
        atype = data[off:end].decode()
        off = end + 1
        (size,) = struct.unpack_from("<i", data, off)
        off += 4
        attrs[name] = (atype, data[off : off + size])
        off += size
    _, box = attrs["dataWindow"]
    x0, y0, x1, y1 = struct.unpack("<iiii", box)
    w, h = x1 - x0 + 1, y1 - y0 + 1
    comp = attrs["compression"][1][0]
    _, chan_data = attrs["channels"]
    channels = []
    coff = 0
    while chan_data[coff] != 0:
        cend = chan_data.index(b"\x00", coff)
        cname = chan_data[coff:cend].decode()
        ptype = struct.unpack_from("<i", chan_data, cend + 1)[0]
        channels.append((cname, ptype))
        coff = cend + 1 + 16
    channels_sorted = sorted(c[0] for c in channels)
    nchan = len(channels)
    ptype = channels[0][1]  # 1 = half, 2 = float
    bpp = 2 if ptype == 1 else 4
    dtype = np.float16 if ptype == 1 else np.float32

    # scanline offsets table
    ntables = h if comp == 0 else (h + 15) // 16 if comp == 4 else h
    lines_per_block = 1 if comp == 0 else 16 if comp == 4 else 1
    if comp not in (0, 2, 3, 4):
        raise ValueError(f"unsupported EXR compression {comp}")
    if comp in (2, 3):
        lines_per_block = 1 if comp == 2 else 16
        ntables = (h + lines_per_block - 1) // lines_per_block
    offsets = struct.unpack_from(f"<{ntables}q", data, off)

    img = np.zeros((h, w, nchan), dtype=np.float32)
    for oi, boff in enumerate(offsets):
        (y,) = struct.unpack_from("<i", data, boff)
        (nbytes,) = struct.unpack_from("<i", data, boff + 4)
        raw = data[boff + 8 : boff + 8 + nbytes]
        nlines = min(lines_per_block, h - (y - y0))
        expected = w * nchan * bpp * nlines
        if comp in (2, 3):  # ZIPS/ZIP
            raw = zlib.decompress(raw)
            # EXR zip predictor + interleave
            arr = np.frombuffer(raw, np.uint8).astype(np.int64)
            # delta predictor: r[i] = r[i-1] + raw[i] - 128
            arr = (np.cumsum(arr - 128) + 128) % 256
            arr = arr.astype(np.uint8)
            half = (len(arr) + 1) // 2
            out = np.zeros(len(arr), np.uint8)
            out[0::2] = arr[:half]
            out[1::2] = arr[half:]
            raw = out.tobytes()
        if len(raw) < expected:
            raise ValueError("EXR scanline underrun")
        block = np.frombuffer(raw[:expected], dtype=dtype).astype(np.float32)
        block = block.reshape(nlines, nchan, w)
        for ci, (cname, _) in enumerate(sorted(channels)):
            dst = {"R": 0, "G": 1, "B": 2}.get(cname, ci)
            img[y - y0 : y - y0 + nlines, :, dst] = block[:, ci, :]
    return img[:, :, :3]
