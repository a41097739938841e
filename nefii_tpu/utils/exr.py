"""Minimal OpenEXR 2.0 scanline codec (pure numpy + zlib).

The reference loads/writes EXR via imageio's freeimage plugin
(utils/rend_util.py:13-28, scripts/render.py:407-442); that plugin needs a
binary download unavailable here, and neither cv2 nor imageio in this image
has EXR support — so we implement the subset of the format the pipeline
needs:

  * read:  single-part scanline images, compression NONE / ZIPS / ZIP,
           channel types HALF / FLOAT / UINT, arbitrary channel names
           (returned in R,G,B[,A] order when present).
  * write: RGB(A) scanline images, HALF or FLOAT, ZIP (16-line blocks)
           or NONE.

The ZIP codec applies OpenEXR's byte-deinterleave + delta predictor around
zlib, which is what every OpenEXR implementation emits.
"""

from __future__ import annotations

import struct
import zlib
from typing import Dict, List, Optional, Tuple

import numpy as np

MAGIC = b"\x76\x2f\x31\x01"

PT_UINT, PT_HALF, PT_FLOAT = 0, 1, 2
_DTYPES = {PT_UINT: np.uint32, PT_HALF: np.float16, PT_FLOAT: np.float32}

NO_COMPRESSION, RLE, ZIPS, ZIP, PIZ = 0, 1, 2, 3, 4
_LINES_PER_BLOCK = {NO_COMPRESSION: 1, ZIPS: 1, ZIP: 16}


# ---------------------------------------------------------------------------
# OpenEXR ZIP predictor + byte interleave
# ---------------------------------------------------------------------------

def _unpredict(data: bytes) -> bytes:
    buf = np.frombuffer(data, np.uint8).astype(np.int64)
    # undo delta: t[i] = t[i-1] + t[i] - 128
    buf = np.cumsum(buf - 128) + 128
    buf = (buf % 256).astype(np.uint8)
    # re-interleave the two halves
    n = buf.shape[0]
    half = (n + 1) // 2
    out = np.empty(n, np.uint8)
    out[0::2] = buf[:half]
    out[1::2] = buf[half:]
    return out.tobytes()


def _predict(data: bytes) -> bytes:
    src = np.frombuffer(data, np.uint8)
    n = src.shape[0]
    half = (n + 1) // 2
    tmp = np.empty(n, np.uint8)
    tmp[:half] = src[0::2]
    tmp[half:] = src[1::2]
    t = tmp.astype(np.int64)
    d = np.empty(n, np.int64)
    d[0] = t[0]
    d[1:] = t[1:] - t[:-1] + 128 + 256
    return (d % 256).astype(np.uint8).tobytes()


def _decompress(data: bytes, compression: int, expected: int) -> bytes:
    if compression == NO_COMPRESSION or len(data) == expected:
        return data
    if compression in (ZIP, ZIPS):
        return _unpredict(zlib.decompress(data))
    raise NotImplementedError(f"EXR compression {compression} not supported")


def _compress(data: bytes, compression: int) -> bytes:
    if compression == NO_COMPRESSION:
        return data
    if compression in (ZIP, ZIPS):
        out = zlib.compress(_predict(data))
        return out if len(out) < len(data) else data
    raise NotImplementedError(f"EXR compression {compression} not supported")


# ---------------------------------------------------------------------------
# header parsing
# ---------------------------------------------------------------------------

def _read_cstring(data: bytes, off: int) -> Tuple[str, int]:
    end = data.index(b"\0", off)
    return data[off:end].decode("latin-1"), end + 1


def _parse_header(data: bytes):
    if data[:4] != MAGIC:
        raise ValueError("not an EXR file")
    version = struct.unpack("<i", data[4:8])[0]
    if version & 0x200:
        raise NotImplementedError("tiled EXR not supported")
    off = 8
    attrs: Dict[str, Tuple[str, bytes]] = {}
    while True:
        name, off = _read_cstring(data, off)
        if not name:
            break
        typ, off = _read_cstring(data, off)
        size = struct.unpack("<i", data[off : off + 4])[0]
        off += 4
        attrs[name] = (typ, data[off : off + size])
        off += size
    return attrs, off


def _parse_chlist(raw: bytes) -> List[Tuple[str, int]]:
    chans = []
    i = 0
    while raw[i] != 0:
        name, i = _read_cstring(raw, i)
        pixel_type = struct.unpack("<i", raw[i : i + 4])[0]
        i += 16  # pixelType + pLinear/reserved + xSampling + ySampling
        chans.append((name, pixel_type))
    return chans


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def read(path: str) -> np.ndarray:
    """Read an EXR into float32 [H, W, C]; RGB(A) channel order when named."""
    with open(path, "rb") as f:
        data = f.read()
    attrs, off = _parse_header(data)

    chans = sorted(_parse_chlist(attrs["channels"][1]))  # alphabetical = file order
    compression = attrs["compression"][1][0]
    x_min, y_min, x_max, y_max = struct.unpack("<4i", attrs["dataWindow"][1])
    W = x_max - x_min + 1
    H = y_max - y_min + 1
    lines_per_block = _LINES_PER_BLOCK.get(compression)
    if lines_per_block is None:
        raise NotImplementedError(f"EXR compression {compression} not supported")
    n_blocks = -(-H // lines_per_block)

    # line-offset table
    offsets = struct.unpack(f"<{n_blocks}q", data[off : off + 8 * n_blocks])

    bytes_per_px = sum(np.dtype(_DTYPES[pt]).itemsize for _, pt in chans)
    out = {name: np.empty((H, W), np.float32) for name, _ in chans}

    for bi, boff in enumerate(offsets):
        y, size = struct.unpack("<ii", data[boff : boff + 8])
        y -= y_min
        n_lines = min(lines_per_block, H - y)
        raw = _decompress(
            data[boff + 8 : boff + 8 + size], compression, n_lines * W * bytes_per_px
        )
        pos = 0
        for line in range(n_lines):
            for name, pt in chans:
                dt = _DTYPES[pt]
                nbytes = W * np.dtype(dt).itemsize
                row = np.frombuffer(raw, dt, count=W, offset=pos)
                out[name][y + line] = row.astype(np.float32)
                pos += nbytes

    names = [n for n, _ in chans]
    order = [n for n in ("R", "G", "B", "A") if n in names]
    order += [n for n in names if n not in order]
    return np.stack([out[n] for n in order], axis=-1)


def write(
    path: str,
    img: np.ndarray,
    pixel_type: int = PT_FLOAT,
    compression: int = ZIP,
) -> None:
    """Write [H, W, C<=4] (or [H, W]) float data as an EXR."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    H, W, C = img.shape
    names = {1: ["Y"], 3: ["R", "G", "B"], 4: ["R", "G", "B", "A"]}[C]
    dt = np.dtype(_DTYPES[pixel_type])

    # header ----------------------------------------------------------------
    def attr(name: str, typ: str, val: bytes) -> bytes:
        return (
            name.encode() + b"\0" + typ.encode() + b"\0"
            + struct.pack("<i", len(val)) + val
        )

    chlist = b""
    for n in sorted(names):
        chlist += n.encode() + b"\0" + struct.pack("<i", pixel_type)
        chlist += struct.pack("<BBBB", 0, 0, 0, 0) + struct.pack("<ii", 1, 1)
    chlist += b"\0"

    box = struct.pack("<4i", 0, 0, W - 1, H - 1)
    header = MAGIC + struct.pack("<i", 2)
    header += attr("channels", "chlist", chlist)
    header += attr("compression", "compression", bytes([compression]))
    header += attr("dataWindow", "box2i", box)
    header += attr("displayWindow", "box2i", box)
    header += attr("lineOrder", "lineOrder", b"\0")
    header += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += attr("screenWindowCenter", "v2f", struct.pack("<2f", 0.0, 0.0))
    header += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\0"

    # pixel blocks -----------------------------------------------------------
    lines_per_block = _LINES_PER_BLOCK[compression]
    n_blocks = -(-H // lines_per_block)
    chan_order = sorted(range(C), key=lambda i: names[i])

    blocks = []
    for bi in range(n_blocks):
        y0 = bi * lines_per_block
        n_lines = min(lines_per_block, H - y0)
        parts = []
        for line in range(n_lines):
            for ci in chan_order:
                parts.append(img[y0 + line, :, ci].astype(dt).tobytes())
        raw = b"".join(parts)
        blocks.append((y0, _compress(raw, compression)))

    table_off = len(header)
    data_off = table_off + 8 * n_blocks
    offsets = []
    pos = data_off
    for y0, blk in blocks:
        offsets.append(pos)
        pos += 8 + len(blk)

    with open(path, "wb") as f:
        f.write(header)
        f.write(struct.pack(f"<{n_blocks}q", *offsets))
        for (y0, blk) in blocks:
            f.write(struct.pack("<ii", y0, len(blk)))
            f.write(blk)


# convenience aliases matching common io APIs
imread = read
imwrite = write
