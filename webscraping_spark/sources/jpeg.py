"""Baseline JPEG (JFIF) codec in pure numpy + stdlib, from the public
ITU-T T.81 spec.

The engine's image payloads (BASELINE.json ``input_hint``: bytes BINARY +
``fmt``) previously modeled "lossy" with the synthetic ``qnt`` lattice
codec because no JPEG library ships in this container. JPEG is the
dominant format in any real web crawl (and in LAION/DataComp-style
image+caption corpora), so the decode side of the pipeline should be
real: this module implements baseline sequential DCT JPEG — the profile
>99% of web JPEGs use — directly from the spec, with no third-party
codec dependency.

Encoder
    RGB -> JFIF YCbCr -> optional 4:2:0 box-filter subsample -> 8x8
    level-shifted blocks -> 2-D DCT-II (one einsum over all blocks) ->
    quantization with the Annex K.1/K.2 tables scaled by IJG quality ->
    zigzag -> DC-differential + run-length Huffman coding with the Annex
    K.3 typical tables -> SOI/APP0/DQT/SOF0/DHT/SOS/EOI stream with 0xFF
    byte stuffing, optional DRI/RSTn restart intervals. Default quality
    98, 4:4:4: on the white-noise test imagery (the hardest possible JPEG
    input — flat spectrum) the measured worst case is ~43 dB, above the
    input_hint's PSNR >= 40 dB floor with margin (q97 can dip to 39.7);
    on real low-frequency imagery it is far above it.

Decoder
    Full marker parse (multi-table DQT/DHT segments, DRI + restart
    markers, APPn/COM skip), canonical Huffman table reconstruction from
    BITS/HUFFVAL, entropy decode per MCU, dequantize, IDCT, chroma
    upsample (pixel replication), YCbCr -> RGB. Supports 3-component
    4:4:4 / 4:2:2 / 4:2:0 and 1-component grayscale (returned replicated
    to (h, w, 3) per the pipeline's RGB contract). Progressive (SOF2),
    arithmetic coding and 12-bit precision raise ``ValueError`` — they
    are rare on the web and out of the baseline profile.

Scale note: codecs run inside ``mapInPandas`` Arrow batches
(operators/multimodal.py) — per-image numpy work on executors, never
driver-side. The DCT/quantization paths are vectorized across all blocks
of an image; only the entropy coder is a per-symbol Python loop, the
same shape as the zlib calls in the PNG codec.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

# Annex K.1 / K.2 base quantization tables (luminance, chrominance).
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# Zigzag scan order: ZIGZAG[i] = flat (row*8+col) index of the i-th
# zigzag position. Derived, not transcribed, to avoid typo risk.
def _zigzag_order() -> np.ndarray:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[1] if (rc[0] + rc[1]) % 2 else rc[0]),
    )
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.3 "typical" Huffman tables as (BITS[1..16], HUFFVAL).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)[:, None].astype(np.float64)
    n = np.arange(8)[None, :].astype(np.float64)
    mat = np.cos((2 * n + 1) * k * np.pi / 16.0)
    mat[0] *= np.sqrt(1.0 / 8.0)
    mat[1:] *= np.sqrt(2.0 / 8.0)
    return mat


_DCT8 = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), per the T.81 C.2 canonical assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_ENC_DC_LUMA = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
_ENC_DC_CHROMA = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
_ENC_AC_LUMA = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
_ENC_AC_CHROMA = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> scaled table clipped to [1, 255]."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


# ------------------------------------------------------------- colorspace


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ------------------------------------------------------------- block math


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H,W multiples of 8 -> (H//8 * W//8, 8, 8) raster order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _unblockify(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (
        blocks.reshape(h // 8, w // 8, 8, 8).transpose(0, 2, 1, 3).reshape(h, w)
    )


def _fdct_quant(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """All-blocks forward DCT + quantization -> (nblocks, 64) zigzagged."""
    blocks = _blockify(plane.astype(np.float64) - 128.0)
    coeffs = np.einsum("ij,njk,lk->nil", _DCT8, blocks, _DCT8)
    q = np.round(coeffs / quant[None]).astype(np.int32)
    # Standard-table codeable range: AC categories stop at 10 (|v|<=1023),
    # DC differences at 11. Only reachable at quality 100 on adversarial
    # input; clamp rather than emit an uncodeable symbol.
    q = np.clip(q, -1023, 1023)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _dequant_idct(zz: np.ndarray, quant: np.ndarray, h: int, w: int) -> np.ndarray:
    """(nblocks, 64) zigzagged ints -> (h, w) float plane."""
    coeffs = (zz[:, UNZIGZAG].reshape(-1, 8, 8) * quant[None]).astype(np.float64)
    blocks = np.einsum("ji,njk,kl->nil", _DCT8, coeffs, _DCT8) + 128.0
    return _unblockify(blocks, h, w)


# ------------------------------------------------------------- bit writer


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (B.1.1.5)
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (F.1.2.3)
        return bytes(self.out)


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(
    zz: np.ndarray,
    pred: int,
    dc_tab: dict[int, tuple[int, int]],
    ac_tab: dict[int, tuple[int, int]],
    bw: _BitWriter,
) -> int:
    dc = int(zz[0])
    diff = dc - pred
    cat = _category(diff)
    bw.write(*dc_tab[cat])
    if cat:
        bw.write(diff if diff > 0 else diff + (1 << cat) - 1, cat)
    nz = np.nonzero(zz[1:])[0]
    run_from = 1
    for idx in nz:
        k = int(idx) + 1
        run = k - run_from
        while run > 15:
            bw.write(*ac_tab[0xF0])  # ZRL
            run -= 16
        v = int(zz[k])
        cat = _category(v)
        bw.write(*ac_tab[(run << 4) | cat])
        bw.write(v if v > 0 else v + (1 << cat) - 1, cat)
        run_from = k + 1
    if run_from <= 63:
        bw.write(*ac_tab[0x00])  # EOB
    return dc


# ------------------------------------------------------------------- EXIF

# tag name <-> id maps for the subset of IFD0/Exif-IFD tags the pipeline
# extracts (TIFF 6.0 / EXIF 2.3 public specs)
_EXIF_TAGS_IFD0 = {
    "description": (0x010E, 2),  # ImageDescription, ASCII
    "make": (0x010F, 2),
    "model": (0x0110, 2),
    "orientation": (0x0112, 3),  # SHORT
    "software": (0x0131, 2),
    "datetime": (0x0132, 2),  # "YYYY:MM:DD HH:MM:SS"
}
_EXIF_TAGS_SUB = {
    "exif_w": (0xA002, 4),  # PixelXDimension, LONG
    "exif_h": (0xA003, 4),
}
_EXIF_SUBIFD_PTR = 0x8769
_TAG_NAMES = {tid: name for name, (tid, _) in {**_EXIF_TAGS_IFD0, **_EXIF_TAGS_SUB}.items()}


def _build_tiff(exif: dict, little_endian: bool = False) -> bytes:
    """Serialize the supported EXIF subset as a TIFF block (IFD0 + Exif
    sub-IFD + string data area). Offsets are relative to the TIFF header,
    per the EXIF spec."""
    bo = "<" if little_endian else ">"
    ifd0 = [(tid, typ, exif[name]) for name, (tid, typ) in _EXIF_TAGS_IFD0.items() if name in exif]
    sub = [(tid, typ, exif[name]) for name, (tid, typ) in _EXIF_TAGS_SUB.items() if name in exif]
    if sub:
        ifd0.append((_EXIF_SUBIFD_PTR, 4, None))  # pointer patched below
    ifd0.sort(key=lambda e: e[0])  # TIFF requires ascending tag order
    ifd0_at = 8
    ifd0_size = 2 + 12 * len(ifd0) + 4
    sub_at = ifd0_at + ifd0_size
    sub_size = (2 + 12 * len(sub) + 4) if sub else 0
    data_at = sub_at + sub_size

    data_area = bytearray()

    def entry(tid: int, typ: int, value) -> bytes:
        nonlocal data_area
        if tid == _EXIF_SUBIFD_PTR:
            return struct.pack(bo + "HHII", tid, 4, 1, sub_at)
        if typ == 2:  # ASCII, NUL-terminated, count includes the NUL
            raw = str(value).encode("ascii") + b"\x00"
            if len(raw) <= 4:
                return struct.pack(bo + "HHI", tid, 2, len(raw)) + raw.ljust(4, b"\x00")
            off = data_at + len(data_area)
            data_area += raw
            return struct.pack(bo + "HHII", tid, 2, len(raw), off)
        if typ == 3:  # SHORT, inline in the first 2 value bytes
            return struct.pack(bo + "HHI", tid, 3, 1) + struct.pack(bo + "H", int(value)) + b"\x00\x00"
        return struct.pack(bo + "HHII", tid, 4, 1, int(value))  # LONG

    out = bytearray()
    out += (b"II" if little_endian else b"MM") + struct.pack(bo + "HI", 42, ifd0_at)
    out += struct.pack(bo + "H", len(ifd0))
    for tid, typ, value in ifd0:
        out += entry(tid, typ, value)
    out += struct.pack(bo + "I", 0)  # no IFD1
    if sub:
        out += struct.pack(bo + "H", len(sub))
        for tid, typ, value in sorted(sub):
            out += entry(tid, typ, value)
        out += struct.pack(bo + "I", 0)
    out += data_area
    return bytes(out)


def _exif_app1(exif: dict, little_endian: bool = False) -> bytes:
    tiff = b"Exif\x00\x00" + _build_tiff(exif, little_endian)
    return b"\xff\xe1" + struct.pack(">H", len(tiff) + 2) + tiff


def _parse_ifd(tiff: bytes, bo: str, at: int, out: dict) -> None:
    (count,) = struct.unpack_from(bo + "H", tiff, at)
    for i in range(count):
        tid, typ, n = struct.unpack_from(bo + "HHI", tiff, at + 2 + 12 * i)
        val_at = at + 2 + 12 * i + 8
        if tid == _EXIF_SUBIFD_PTR and typ == 4:
            (off,) = struct.unpack_from(bo + "I", tiff, val_at)
            if 0 < off < len(tiff):
                _parse_ifd(tiff, bo, off, out)
            continue
        name = _TAG_NAMES.get(tid)
        if name is None:
            continue  # tags outside the extracted subset are skipped
        if typ == 2:
            size = n
            if size <= 4:
                raw = tiff[val_at : val_at + size]
            else:
                (off,) = struct.unpack_from(bo + "I", tiff, val_at)
                raw = tiff[off : off + size]
            out[name] = raw.split(b"\x00", 1)[0].decode("ascii", "replace")
        elif typ == 3 and n == 1:
            out[name] = struct.unpack_from(bo + "H", tiff, val_at)[0]
        elif typ == 4 and n == 1:
            out[name] = struct.unpack_from(bo + "I", tiff, val_at)[0]


def parse_exif(data: bytes) -> dict:
    """Extract the supported EXIF subset from a JPEG's APP1 segment.
    Returns {} when no EXIF is present; tolerates either TIFF byte order
    and skips tags outside the subset."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            break
        marker = data[pos + 1]
        if marker in (0xD8, 0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xE1 and payload[:6] == b"Exif\x00\x00":
            tiff = payload[6:]
            try:
                if tiff[:2] == b"II":
                    bo = "<"
                elif tiff[:2] == b"MM":
                    bo = ">"
                else:
                    return {}
                magic, ifd0_at = struct.unpack_from(bo + "HI", tiff, 2)
                if magic != 42:
                    return {}
                out: dict = {}
                _parse_ifd(tiff, bo, ifd0_at, out)
                return out
            except (struct.error, IndexError):
                return {}
        if marker == 0xDA:  # entropy data follows; EXIF must precede it
            break
        pos += 2 + seglen
    return {}


def strip_metadata(data: bytes, keep_app0: bool = True) -> bytes:
    """Remove metadata segments from a JPEG without re-encoding: APP1-
    APP15 (EXIF/XMP/ICC/vendor blocks — where GPS and author PII live)
    and COM comments are dropped; the entropy-coded image data, tables
    and structure pass through byte-for-byte, so decoded pixels are
    identical. ``keep_app0`` preserves the plain JFIF APP0 (density
    info, no PII). Everything from SOS onward copies verbatim (metadata
    must precede the scan). Raises ValueError on a non-JPEG."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    out = bytearray(b"\xff\xd8")
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            break
        marker = data[pos + 1]
        if marker in (0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
            out += data[pos : pos + 2]
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if marker == 0xDA:  # SOS: scan + EOI verbatim
            out += data[pos:]
            return bytes(out)
        drop = (0xE1 <= marker <= 0xEF) or marker == 0xFE
        if marker == 0xE0 and not keep_app0:
            drop = True
        if not drop:
            out += data[pos : pos + 2 + seglen]
        pos += 2 + seglen
    return bytes(out)


# ---------------------------------------------------------------- encoder


def _dht_segment(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    payload = bytes([tq]) + bytes(int(v) for v in table.reshape(64)[ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 98,
    subsample: bool = False,
    grayscale: bool = False,
    restart_interval: int = 0,
    exif: dict | None = None,
    exif_little_endian: bool = False,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a baseline JFIF JPEG.

    quality: IJG 1..100 scaling of the Annex K tables. The default 98
    keeps PSNR >= 40 dB (measured worst case ~43 dB) even on white-noise
    imagery (flat spectrum, the adversarial case for a DCT codec);
    typical photos sit far higher.
    subsample: True emits 4:2:0 (2x2 box-filtered chroma), the common
    web layout; False emits 4:4:4 for maximum fidelity.
    grayscale: encode the luma channel only (1-component stream).
    restart_interval: if > 0, emit DRI and an RSTn marker every that
    many MCUs (resynchronization points, common in web encoders).
    exif: optional metadata dict written as an APP1 Exif/TIFF segment —
    supported keys: make, model, software, description, datetime
    ("YYYY:MM:DD HH:MM:SS"), orientation (1-8), exif_w, exif_h.
    exif_little_endian: write the TIFF block as "II" instead of "MM"
    (both byte orders occur in the wild; the parser reads either).
    """
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("expected (h, w, 3) uint8")
    if h < 1 or w < 1 or h > 65535 or w > 65535:
        raise ValueError("bad dimensions")
    ql = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)
    ycc = _rgb_to_ycbcr(pixels)
    y_plane = ycc[..., 0]

    if grayscale:
        comps = [(1, 1, 1, 0)]  # (id, hs, vs, tq)
        planes = [_pad_to(y_plane, 8)]
        quants = [ql]
    elif subsample:
        yp = _pad_to(y_plane, 16)
        ph, pw = yp.shape
        # 2x2 box filter on the 16-padded plane so chroma blocks align to
        # the padded luma grid exactly
        cbp = _pad_to(ycc[..., 1], 16)
        crp = _pad_to(ycc[..., 2], 16)
        cb_ds = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr_ds = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        planes = [yp, cb_ds, cr_ds]
        quants = [ql, qc, qc]
    else:
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        planes = [_pad_to(y_plane, 8), _pad_to(ycc[..., 1], 8), _pad_to(ycc[..., 2], 8)]
        quants = [ql, qc, qc]

    zz = [_fdct_quant(p, q) for p, q in zip(planes, quants)]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    if exif:
        out += _exif_app1(exif, exif_little_endian)
    out += _dqt_segment(0, ql)
    if not grayscale:
        out += _dqt_segment(1, qc)
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs, tq in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0x00, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(0x10, AC_LUMA_BITS, AC_LUMA_VALS)
    if not grayscale:
        out += _dht_segment(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += _dht_segment(0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(comps)])
    for cid, _, _, tq in comps:
        td_ta = 0x00 if tq == 0 else 0x11
        sos += bytes([cid, td_ta])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    # Entropy-coded scan: interleaved MCUs in raster order.
    hmax = max(cp[1] for cp in comps)
    vmax = max(cp[2] for cp in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    bw = _BitWriter()
    preds = [0] * len(comps)
    blocks_per_row = [planes[i].shape[1] // 8 for i in range(len(comps))]
    mcu_idx = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                out += bw.flush()
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * len(comps)
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                dc_tab = _ENC_DC_LUMA if tq == 0 else _ENC_DC_CHROMA
                ac_tab = _ENC_AC_LUMA if tq == 0 else _ENC_AC_CHROMA
                for by in range(vs):
                    for bx in range(hs):
                        bi = (my * vs + by) * blocks_per_row[ci] + (mx * hs + bx)
                        preds[ci] = _encode_block(
                            zz[ci][bi], preds[ci], dc_tab, ac_tab, bw
                        )
            mcu_idx += 1
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy segment."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy segment")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


class _HuffTable:
    """Canonical decode table: per-length min-code/max-code/value pointer
    (the F.2.2.3 DECODE procedure)."""

    __slots__ = ("mincode", "maxcode", "valptr", "vals")

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.vals = vals
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = br.read_bit()
        length = 1
        while code > self.maxcode[length]:
            if length >= 16:
                raise ValueError("invalid Huffman code")
            code = (code << 1) | br.read_bit()
            length += 1
        return self.vals[self.valptr[length] + code - self.mincode[length]]


def _extend(v: int, cat: int) -> int:
    """F.2.2.1 sign extension of a cat-bit magnitude."""
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _decode_block(
    br: _BitReader, dc_tab: _HuffTable, ac_tab: _HuffTable, pred: int
) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int32)
    cat = dc_tab.decode(br)
    diff = _extend(br.read_bits(cat), cat) if cat else 0
    dc = pred + diff
    zz[0] = dc
    k = 1
    while k <= 63:
        sym = ac_tab.decode(br)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run = sym >> 4
        cat = sym & 0x0F
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(br.read_bits(cat), cat)
        k += 1
    return zz, dc


def _split_scan(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff the entropy-coded data from ``start``, splitting at restart
    markers. Returns (segments, position of the terminating marker)."""
    segments: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        nxt = data[i + 1]
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        elif nxt == 0xFF:  # fill byte
            i += 1
        else:
            break
    segments.append(bytes(cur))
    return segments, i


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JFIF JPEG to (h, w, 3) uint8 RGB (grayscale
    streams are replicated across channels)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffTable] = {}
    ac_tabs: dict[int, _HuffTable] = {}
    frame = None  # (h, w, comps) with comps = [(id, hs, vs, tq)]
    restart_interval = 0
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(payload):
                pq = payload[p] >> 4
                tq = payload[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(payload[p : p + 64], dtype=np.uint8).astype(
                        np.int32
                    )
                    p += 64
                else:
                    tbl = np.frombuffer(
                        payload[p : p + 128], dtype=">u2"
                    ).astype(np.int32)
                    p += 128
                out = np.zeros(64, dtype=np.int32)
                out[ZIGZAG] = tbl
                quants[tq] = out.reshape(8, 8)
        elif marker == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(payload):
                tc = payload[p] >> 4
                th = payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                count = sum(bits)
                vals = list(payload[p + 17 : p + 17 + count])
                p += 17 + count
                tab = _HuffTable(bits, vals)
                if tc == 0:
                    dc_tabs[th] = tab
                else:
                    ac_tabs[th] = tab
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline-decodable
            precision = payload[0]
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            fh, fw = struct.unpack(">HH", payload[1:5])
            ncomp = payload[5]
            comps = []
            for ci in range(ncomp):
                cid = payload[6 + ci * 3]
                hv = payload[7 + ci * 3]
                tq = payload[8 + ci * 3]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scan_tabs = {}
            for si in range(ns):
                cid = payload[1 + si * 2]
                tdta = payload[2 + si * 2]
                scan_tabs[cid] = (tdta >> 4, tdta & 0x0F)
            segments, pos = _split_scan(data, pos)
            return _decode_scan(
                frame, scan_tabs, quants, dc_tabs, ac_tabs, segments, restart_interval
            )
        # APPn / COM / others: skipped
    raise ValueError("no SOS marker found")


def _decode_scan(frame, scan_tabs, quants, dc_tabs, ac_tabs, segments, restart_interval):
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)
    n_mcus = mcus_x * mcus_y

    # per-component zigzag coefficient store + plane geometry
    geo = []
    for cid, hs, vs, tq in comps:
        bpr = mcus_x * hs  # blocks per row
        bpc = mcus_y * vs
        geo.append(
            {
                "cid": cid,
                "hs": hs,
                "vs": vs,
                "tq": tq,
                "bpr": bpr,
                "zz": np.zeros((bpr * bpc, 64), dtype=np.int32),
            }
        )

    mcu = 0
    for seg_idx, seg in enumerate(segments):
        br = _BitReader(seg)
        preds = [0] * len(comps)
        end = min(n_mcus, mcu + restart_interval) if restart_interval else n_mcus
        while mcu < end:
            my, mx = divmod(mcu, mcus_x)
            for ci, g in enumerate(geo):
                td, ta = scan_tabs[g["cid"]]
                for by in range(g["vs"]):
                    for bx in range(g["hs"]):
                        zz, preds[ci] = _decode_block(
                            br, dc_tabs[td], ac_tabs[ta], preds[ci]
                        )
                        bi = (my * g["vs"] + by) * g["bpr"] + (mx * g["hs"] + bx)
                        g["zz"][bi] = zz
            mcu += 1
        if mcu >= n_mcus:
            break
    if mcu < n_mcus:
        raise ValueError("truncated JPEG scan")

    planes = []
    for g in geo:
        ph = (g["zz"].shape[0] // g["bpr"]) * 8
        pw = g["bpr"] * 8
        plane = _dequant_idct(g["zz"], quants[g["tq"]], ph, pw)
        # upsample to full padded resolution by pixel replication
        if g["hs"] != hmax or g["vs"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // g["vs"], axis=0), hmax // g["hs"], axis=1
            )
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
