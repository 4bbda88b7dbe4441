"""GIF87a/89a codec in pure numpy + stdlib (no codec library), from the
public GIF specification (W3C/CompuServe GSPEC; LZW per the spec's
variable-code-width variant).

GIF is the third pillar of real web image traffic after JPEG and PNG, so
the crawl pipeline's decode stage should read it natively. The decoder
handles both signatures, global/local color tables, interlaced images
(the 8/8/4/2 four-pass raster), transparency via the Graphic Control
Extension (composited over the background color, since the pipeline's
contract is opaque RGB), and skips application/comment/plain-text
extension blocks. Animated GIFs decode to their FIRST frame — the
convention crawl pipelines use (a thumbnail/dedup feature wants one
representative raster, not a video stream); the frame count is exposed
via ``gif_frame_count`` for anyone who needs to route animations to the
video path.

The encoder exists to make tests self-contained and the sink symmetric:
images with <= 256 distinct colors round-trip EXACTLY (GIF is lossless
within its palette); richer images raise rather than silently
quantizing. Optional interlacing exercises the decoder's four-pass path.

Scale note: like the other codecs this runs inside ``mapInPandas`` Arrow
batches on executors. LZW is a per-symbol loop (inherent to the format,
same shape as the entropy coder in jpeg.py); palette mapping and
interlace reordering are vectorized numpy.
"""

from __future__ import annotations

import struct

import numpy as np

_SIGS = (b"GIF87a", b"GIF89a")

# interlace pass layout: (start row, step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    """Row output order for an interlaced image of height h."""
    return np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE]
    )


# -------------------------------------------------------------------- LZW


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Variable-width LZW per the GIF spec: clear/EOI codes, code width
    grows after the table reaches 2^width, capped at 12 bits."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # bit reader (LSB-first within bytes, per GIF)
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)

    def reset_table():
        return {i: bytes([i]) for i in range(clear)}, clear + 2, min_code_size + 1

    table, next_code, width = reset_table()
    prev: bytes | None = None
    while n_out < n_pixels:
        while nbits < width:
            if pos >= n:
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, next_code, width = reset_table()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW code")
        out[n_out : n_out + len(entry)] = np.frombuffer(entry, dtype=np.uint8)
        n_out += len(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_pixels:
        raise ValueError("GIF pixel data ended early")
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    width = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    seq = b""
    raw = indices.astype(np.uint8).tobytes()
    for byte in raw:
        nxt = seq + bytes([byte])
        if nxt in table:
            seq = nxt
            continue
        emit(table[seq], width)
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            # the decoder adds its table entry one code LATER than the
            # encoder, so it widens one code later too: widen when the
            # decoder's mirror counter (next_code - 1) hits 2^width
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = clear + 2
            width = min_code_size + 1
        seq = bytes([byte])
    if seq:
        emit(table[seq], width)
    # the final data code closes the decoder's one-entry lag: if that
    # entry lands exactly on 2^width the decoder widens before reading EOI
    if next_code == (1 << width) and width < 12:
        width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Wrap raw bytes into <=255-byte counted sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        size = data[pos]
        pos += 1
        if size == 0:
            break
        out += data[pos : pos + size]
        pos += size
    return bytes(out), pos


# ------------------------------------------------------------------ codec


def encode_gif(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """Encode (h, w, 3) uint8 RGB with <= 256 distinct colors as GIF89a.

    Raises ValueError beyond 256 colors — this encoder exists for
    symmetry and tests, not as a quantizer.
    """
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("expected (h, w, 3) uint8")
    flat = pixels.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    n_colors = len(palette)
    if n_colors > 256:
        raise ValueError("GIF encoder supports <= 256 distinct colors")
    # palette size must be a power of two >= 2
    depth = max(1, int(np.ceil(np.log2(max(n_colors, 2)))))
    table_size = 1 << depth
    pal_bytes = np.zeros((table_size, 3), dtype=np.uint8)
    pal_bytes[:n_colors] = palette

    out = bytearray()
    out += b"GIF89a"
    # logical screen descriptor: global color table, depth, background 0
    packed = 0x80 | ((depth - 1) << 4) | (depth - 1)
    out += struct.pack("<HHBBB", w, h, packed, 0, 0)
    out += pal_bytes.tobytes()
    # image descriptor
    idx = inverse.reshape(h, w)
    if interlace:
        idx = idx[_interlace_order(h)]
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    min_code_size = max(2, depth)
    out.append(min_code_size)
    out += _sub_blocks(_lzw_encode(idx.reshape(-1), min_code_size))
    out += b"\x3b"  # trailer
    return bytes(out)


def _parse(data: bytes):
    """Yield (kind, payload) for each block: 'image' -> decoded full-frame
    RGB uint8 (first-frame compositing handled by caller)."""
    if data[:6] not in _SIGS:
        raise ValueError("not a GIF")
    w, h, packed, bg_index, _ = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + size * 3], dtype=np.uint8).reshape(
            size, 3
        )
        pos += size * 3
    transparent_idx = -1
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                payload, pos = _read_sub_blocks(data, pos)
                if len(payload) >= 4 and payload[0] & 0x01:
                    transparent_idx = payload[3]
                else:
                    transparent_idx = -1
            else:  # application / comment / plain text: skip
                _, pos = _read_sub_blocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        ix, iy, iw, ih, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        table = gct
        if ipacked & 0x80:  # local color table
            size = 2 << (ipacked & 0x07)
            table = np.frombuffer(
                data[pos : pos + size * 3], dtype=np.uint8
            ).reshape(size, 3)
            pos += size * 3
        if table is None:
            raise ValueError("GIF image without color table")
        min_code_size = data[pos]
        pos += 1
        lzw, pos = _read_sub_blocks(data, pos)
        idx = _lzw_decode(lzw, min_code_size, iw * ih).reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: invert the four-pass row order
            deint = np.empty_like(idx)
            deint[_interlace_order(ih)] = idx
            idx = deint
        yield (w, h, ix, iy, idx, table, transparent_idx, bg_index, gct)


def decode_gif(data: bytes) -> np.ndarray:
    """Decode the FIRST frame to (h, w, 3) uint8 RGB. Transparent pixels
    composite over the background color (opaque-RGB pipeline contract)."""
    try:
        frames = _parse(data)
        first = next(frames, None)
    except (IndexError, struct.error) as exc:  # truncated mid-structure
        raise ValueError("truncated GIF") from exc
    if first is None:
        raise ValueError("GIF contains no image data")
    for w, h, ix, iy, idx, table, t_idx, bg_index, gct in (first,):
        if gct is not None and bg_index < len(gct):
            bg = gct[bg_index]
        else:
            bg = np.zeros(3, dtype=np.uint8)
        canvas = np.tile(bg, (h, w, 1)).astype(np.uint8)
        rgb = table[np.clip(idx, 0, len(table) - 1)]
        if t_idx >= 0:
            mask = idx != t_idx
            region = canvas[iy : iy + idx.shape[0], ix : ix + idx.shape[1]]
            region[mask] = rgb[mask]
        else:
            canvas[iy : iy + idx.shape[0], ix : ix + idx.shape[1]] = rgb
        return canvas
    raise ValueError("GIF contains no image data")  # pragma: no cover


def gif_frame_count(data: bytes) -> int:
    """Number of image frames (animation detection: route > 1 to the
    video path)."""
    try:
        return sum(1 for _ in _parse(data))
    except (IndexError, struct.error) as exc:
        raise ValueError("truncated GIF") from exc
