"""Stdlib-only PNG codec (zlib + struct): the Pillow fallback.

The multimodal decode path (extensions/multimodal.py::decode_image) is
Arrow-batched Spark plumbing around a codec; this container ships no
image libraries, so without a fallback the whole path — schema, batch
shape, poisoned-payload handling — could only be exercised where Pillow
happens to be installed (it was an importorskip-gated pytest). PNG is
fully specified by public RFC 2083 / the W3C PNG spec and its payload
compression is stdlib ``zlib``, so a minimal, genuinely-validating
decoder is ~60 lines with no dependencies:

- parses the 8-byte signature and IHDR (width, height, bit depth,
  color type), rejecting malformed headers;
- decompresses the concatenated IDAT stream and VALIDATES its exact
  decompressed length against ``height * (1 + rowbytes)`` (each
  non-interlaced scanline carries one filter byte) — a truncated or
  corrupt payload fails the decode instead of yielding bogus metadata;
- maps color types to Pillow's mode names (0 L, 2 RGB, 3 P, 4 LA,
  6 RGBA) so downstream schemas are codec-independent.

Deliberately out of scope: interlaced (Adam7) images and ancillary
chunks — ``decode_png`` raises ValueError and the caller records
``decode_ok=false``, exactly as for any undecodable payload. Where
Pillow IS installed it takes precedence (full format coverage).

``encode_png`` is the matching writer (filter-0 scanlines, one IDAT),
used by tests to synthesize real image bytes without any image library.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: PNG color type -> (Pillow mode name, samples per pixel).
_COLOR_TYPES = {0: ("L", 1), 2: ("RGB", 3), 3: ("P", 1), 4: ("LA", 2),
                6: ("RGBA", 4)}

#: Legal bit depths per color type (PNG spec §11.2.2, Table 11.1). A
#: crafted IHDR outside this table (e.g. bit_depth=0, which would make
#: the expected decompressed size ``height * 1`` and let a tiny matching
#: IDAT stream "decode" with bogus metadata) must fail the row.
_LEGAL_BIT_DEPTHS = {
    0: frozenset({1, 2, 4, 8, 16}),
    2: frozenset({8, 16}),
    3: frozenset({1, 2, 4, 8}),
    4: frozenset({8, 16}),
    6: frozenset({8, 16}),
}


#: Decode budget: reject images whose DECLARED decompressed size exceeds
#: this (64 MiB). A corpus decode kernel runs on attacker-controlled
#: bytes; a small zlib bomb declaring a huge IHDR (or lying about it)
#: must fail the row, not OOM the executor — so the expected size is
#: bounded BEFORE inflating and the inflater is hard-capped at the
#: expected length (+1 to detect overrun) rather than trusted.
MAX_DECODED_BYTES = 64 * 1024 * 1024


def decode_png(data: bytes) -> tuple[int, int, str]:
    """Decode and validate a non-interlaced PNG; returns
    ``(width, height, mode)`` or raises ValueError."""
    if len(data) < 8 or data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[
            pos + 4 : pos + 8
        ]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            if length != 13:
                raise ValueError("bad IHDR length")
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None or width == 0 or height == 0:
        raise ValueError("missing or empty IHDR")
    if color_type not in _COLOR_TYPES:
        raise ValueError(f"unsupported color type {color_type}")
    if bit_depth not in _LEGAL_BIT_DEPTHS[color_type]:
        raise ValueError(
            f"illegal bit depth {bit_depth} for color type {color_type}"
        )
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    if not idat:
        raise ValueError("no IDAT data")
    mode, samples = _COLOR_TYPES[color_type]
    rowbytes = (width * samples * bit_depth + 7) // 8
    expected = height * (1 + rowbytes)
    if expected > MAX_DECODED_BYTES:
        raise ValueError(
            f"declared decoded size {expected} exceeds the "
            f"{MAX_DECODED_BYTES}-byte decode budget"
        )
    # Cap the inflater at expected+1: a stream that inflates past the
    # declared size is detected at one extra byte of cost, never by
    # materializing the bomb.
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected + 1)
    # d.eof is required outright: a TRUNCATED stream (no zlib end marker)
    # that happens to inflate to exactly `expected` bytes leaves eof
    # False with an empty flush(), and must fail rather than yield
    # plausible metadata from a corrupt payload.
    if len(raw) != expected or not d.eof:
        raise ValueError(
            f"IDAT length {len(raw)}+ != expected {expected}"
        )
    return width, height, mode


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(
    width: int, height: int, pixels: bytes, mode: str = "RGB"
) -> bytes:
    """Write an 8-bit non-interlaced PNG from raw ``pixels`` (row-major,
    ``width*height*samples`` bytes)."""
    by_mode = {m: (ct, s) for ct, (m, s) in _COLOR_TYPES.items() if m != "P"}
    if mode not in by_mode:
        raise ValueError(f"unsupported mode {mode!r}")
    color_type, samples = by_mode[mode]
    if len(pixels) != width * height * samples:
        raise ValueError("pixel buffer size mismatch")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    rowbytes = width * samples
    raw = b"".join(
        b"\x00" + pixels[r * rowbytes : (r + 1) * rowbytes]
        for r in range(height)
    )
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
