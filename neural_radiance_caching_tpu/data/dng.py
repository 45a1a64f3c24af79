"""Minimal from-scratch DNG (TIFF/EP) raw-mosaic reader.

Behavioral parity target: the `rawpy.imread(f).raw_image` call in the
reference's raw loader (internal/raw_utils.py:160-199) — it returns the
un-demosaicked Bayer sensor mosaic `[H, W]`, which `raw_utils` then
demosaics/postprocesses. rawpy (libraw) is unavailable in this environment,
so this module decodes the subset of DNG that RawNeRF-style captures use:

  * TIFF container (II/MM), IFD chains and SubIFDs (tag 0x014A),
  * the raw CFA IFD (PhotometricInterpretation 32803, or the largest
    strip/tile-bearing IFD as fallback),
  * Compression 1 (uncompressed, 8/12/16-bit packed samples) in strips or
    tiles,
  * Compression 7 (lossless JPEG, SOF3 — the DNG spec's mandated process
    14 selection-value-1..7 predictors) in tiles or strips.

Out of scope: lossy/JPEG-XL DNG 1.6 compression, LinearRaw, opcode lists.
`read_dng` returns the mosaic as float32 (raw integer sensor values,
no black-level subtraction — `raw_utils.process_exif` owns that math).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# TIFF tag ids used here.
_T_NEW_SUBFILE = 0x00FE
_T_WIDTH = 0x0100
_T_LENGTH = 0x0101
_T_BITS = 0x0102
_T_COMPRESSION = 0x0103
_T_PHOTOMETRIC = 0x0106
_T_STRIP_OFFSETS = 0x0111
_T_SAMPLES_PER_PIXEL = 0x0115
_T_ROWS_PER_STRIP = 0x0116
_T_STRIP_COUNTS = 0x0117
_T_SUB_IFDS = 0x014A
_T_TILE_WIDTH = 0x0142
_T_TILE_LENGTH = 0x0143
_T_TILE_OFFSETS = 0x0144
_T_TILE_COUNTS = 0x0145

_PHOTOMETRIC_CFA = 32803

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
               11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}


def _read_ifd(data: bytes, offset: int, endian: str) -> Tuple[Dict, int]:
    """One IFD -> ({tag: numpy array of values}, next_ifd_offset)."""
    (count,) = struct.unpack_from(endian + "H", data, offset)
    entries = {}
    for i in range(count):
        base = offset + 2 + 12 * i
        tag, typ, n = struct.unpack_from(endian + "HHI", data, base)
        size = _TYPE_SIZES.get(typ, 1) * n
        voff = base + 8 if size <= 4 else struct.unpack_from(
            endian + "I", data, base + 8
        )[0]
        if typ in (5, 10):  # RATIONAL: pairs of (u)int32
            fmt = "I" if typ == 5 else "i"
            raw = struct.unpack_from(endian + fmt * (2 * n), data, voff)
            vals = np.asarray(raw, np.float64).reshape(n, 2)
            vals = vals[:, 0] / np.maximum(vals[:, 1], 1)
        elif typ == 2:  # ASCII
            vals = data[voff : voff + n]
        else:
            fmt = _TYPE_FMT.get(typ, "B")
            vals = np.asarray(
                struct.unpack_from(endian + fmt * n, data, voff)
            )
        entries[tag] = vals
    (nxt,) = struct.unpack_from(endian + "I", data, offset + 2 + 12 * count)
    return entries, nxt


def _walk_ifds(data: bytes, endian: str, first: int) -> List[Dict]:
    """Flatten the IFD chain plus every SubIFD (depth-first)."""
    out, stack, seen = [], [first], set()
    while stack:
        off = stack.pop()
        if not off or off in seen or off >= len(data):
            continue
        seen.add(off)
        ifd, nxt = _read_ifd(data, off, endian)
        out.append(ifd)
        stack.append(nxt)
        for sub in np.atleast_1d(ifd.get(_T_SUB_IFDS, [])):
            stack.append(int(sub))
    return out


def _pick_raw_ifd(ifds: List[Dict]) -> Dict:
    cfa = [i for i in ifds if int(np.atleast_1d(
        i.get(_T_PHOTOMETRIC, [0]))[0]) == _PHOTOMETRIC_CFA]
    if cfa:
        return cfa[0]
    # Fallback: the largest image-bearing IFD (thumbnails are small).
    with_data = [i for i in ifds if _T_STRIP_OFFSETS in i or _T_TILE_OFFSETS in i]
    if not with_data:
        raise ValueError("DNG contains no strip/tile image data")
    return max(with_data, key=lambda i: int(np.atleast_1d(i[_T_WIDTH])[0])
               * int(np.atleast_1d(i[_T_LENGTH])[0]))


def _unpack_samples(buf: bytes, bits: int, rows: int, row_width: int,
                    endian: str) -> np.ndarray:
    """Unpack packed integer samples -> uint16 [rows, row_width].

    TIFF fill order 1 (MSB-first). Bit-packed (10/12/14-bit) data pads each
    ROW of uncompressed data to a byte boundary (TIFF6 §Compression), so odd
    widths must be decoded per row-stride, not as one continuous bitstream.
    """
    count = rows * row_width
    if bits == 8:
        return np.frombuffer(buf, np.uint8, count).astype(np.uint16).reshape(
            rows, row_width)
    if bits == 16:
        dt = np.dtype(np.uint16).newbyteorder("<" if endian == "<" else ">")
        return np.frombuffer(buf, dt, count).astype(np.uint16).reshape(
            rows, row_width)
    stride = (row_width * bits + 7) // 8
    arr = np.frombuffer(buf, np.uint8, rows * stride).reshape(rows, stride)
    row_bits = np.unpackbits(arr, axis=1)[:, : row_width * bits]
    groups = row_bits.reshape(rows, row_width, bits)
    weights = (1 << np.arange(bits - 1, -1, -1)).astype(np.uint32)
    return (groups.astype(np.uint32) * weights).sum(-1).astype(np.uint16)


# --- lossless JPEG (SOF3) ----------------------------------------------------


class _BitReader:
    """MSB-first bit reader over an entropy-coded JPEG segment (0xFF00
    byte-stuffing removed)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                # Stuffed zero byte follows a literal 0xFF; markers (non-zero)
                # end the scan.
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1
                else:
                    self.pos = len(self.data)
                    b = 0xFF
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def take(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        if self.nbits < n:  # truncated stream: pad with zeros
            self.bitbuf <<= n - self.nbits
            self.nbits = n
        self.nbits -= n
        out = (self.bitbuf >> self.nbits) & ((1 << n) - 1)
        self.bitbuf &= (1 << self.nbits) - 1
        return out


def _build_huffman(counts, symbols):
    """JPEG canonical Huffman: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.take(1)
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in lossless JPEG stream")


def _extend(value: int, ssss: int) -> int:
    """JPEG F.2.2.1 sign extension of an ssss-bit difference magnitude."""
    if ssss == 0:
        return 0
    if ssss == 16:  # special case: difference is exactly 32768
        return 32768
    if value < (1 << (ssss - 1)):
        return value - (1 << ssss) + 1
    return value


def decode_ljpeg(data: bytes) -> np.ndarray:
    """Decode a lossless-JPEG (SOF3) stream -> [rows, cols*components] int32.

    Implements JPEG process 14 as mandated by the DNG spec for
    Compression=7 raw tiles: predictors 1-7 (SOS Ss field), point transform
    Al, interleaved components. Components are re-interleaved column-wise
    (the DNG convention: an N-component scan covers N CFA columns).
    """
    pos = 0
    if data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    huff: Dict[int, Dict] = {}
    precision = height = width = 0
    comps: List[Tuple[int, int]] = []  # (component id, table id)
    predictor, point_transform = 1, 0
    restart_interval = 0
    scan_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc_th = seg[p]
                counts = list(seg[p + 1 : p + 17])
                nsym = sum(counts)
                symbols = list(seg[p + 17 : p + 17 + nsym])
                huff[tc_th & 0x0F] = _build_huffman(counts, symbols)
                p += 17 + nsym
        elif marker == 0xC3:  # SOF3 (lossless)
            precision = seg[0]
            height, width = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            comps = [(seg[6 + 3 * i], 0) for i in range(ncomp)]
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ncomp = seg[0]
            comps = [
                (seg[1 + 2 * i], seg[2 + 2 * i] >> 4) for i in range(ncomp)
            ]
            predictor = seg[1 + 2 * ncomp]
            point_transform = seg[3 + 2 * ncomp] & 0x0F
            scan_start = pos + seglen
            break
        pos += seglen
    if scan_start is None:
        raise ValueError("lossless JPEG stream has no SOS segment")
    if restart_interval:
        # RSTn markers mid-scan require predictor reset + bit realignment;
        # decoding them as a plain stream would silently corrupt the image.
        raise NotImplementedError(
            "lossless JPEG with restart markers (DRI) is not supported"
        )

    ncomp = len(comps)
    reader = _BitReader(data[scan_start:])
    out = np.zeros((height, width, ncomp), np.int32)
    default = 1 << (precision - point_transform - 1)
    for row in range(height):
        for col in range(width):
            for ci, (_, th) in enumerate(comps):
                ssss = _huff_decode(reader, huff[th])
                diff = _extend(reader.take(min(ssss, 16)) if ssss < 16 else 0,
                               ssss)
                if row == 0 and col == 0:
                    pred = default
                elif col == 0:
                    pred = out[row - 1, 0, ci]  # first column: predictor 2
                elif row == 0:
                    pred = out[0, col - 1, ci]  # first row: predictor 1
                else:
                    a = int(out[row, col - 1, ci])
                    b = int(out[row - 1, col, ci])
                    c = int(out[row - 1, col - 1, ci])
                    if predictor == 1:
                        pred = a
                    elif predictor == 2:
                        pred = b
                    elif predictor == 3:
                        pred = c
                    elif predictor == 4:
                        pred = a + b - c
                    elif predictor == 5:
                        pred = a + ((b - c) >> 1)
                    elif predictor == 6:
                        pred = b + ((a - c) >> 1)
                    elif predictor == 7:
                        pred = (a + b) >> 1
                    else:
                        raise ValueError(f"bad predictor {predictor}")
                out[row, col, ci] = (int(pred) + diff) & 0xFFFF
    # Samples are coded at reduced precision under a point transform; scale
    # back up per JPEG annex H / DNG spec.
    if point_transform:
        out <<= point_transform
    return out.reshape(height, width * ncomp)


# --- top level ----------------------------------------------------------------


def read_dng(path_or_bytes) -> np.ndarray:
    """Decode a DNG file's raw CFA mosaic to float32 [H, W]."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    if data[:2] == b"II":
        endian = "<"
    elif data[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("not a TIFF/DNG file")
    magic, first = struct.unpack_from(endian + "HI", data, 2)
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")
    ifd = _pick_raw_ifd(_walk_ifds(data, endian, first))

    width = int(np.atleast_1d(ifd[_T_WIDTH])[0])
    height = int(np.atleast_1d(ifd[_T_LENGTH])[0])
    bits = int(np.atleast_1d(ifd.get(_T_BITS, [16]))[0])
    compression = int(np.atleast_1d(ifd.get(_T_COMPRESSION, [1]))[0])
    mosaic = np.zeros((height, width), np.float32)

    tiled = _T_TILE_OFFSETS in ifd
    if tiled:
        offsets = np.atleast_1d(ifd[_T_TILE_OFFSETS]).astype(np.int64)
        counts = np.atleast_1d(ifd[_T_TILE_COUNTS]).astype(np.int64)
        tw = int(np.atleast_1d(ifd[_T_TILE_WIDTH])[0])
        th = int(np.atleast_1d(ifd[_T_TILE_LENGTH])[0])
        tiles_x = (width + tw - 1) // tw
    else:
        offsets = np.atleast_1d(ifd[_T_STRIP_OFFSETS]).astype(np.int64)
        counts = np.atleast_1d(ifd[_T_STRIP_COUNTS]).astype(np.int64)
        tw, th = width, int(np.atleast_1d(
            ifd.get(_T_ROWS_PER_STRIP, [height]))[0])
        tiles_x = 1

    for k, (off, cnt) in enumerate(zip(offsets, counts)):
        buf = data[off : off + cnt]
        y0 = (k // tiles_x) * th
        x0 = (k % tiles_x) * tw
        # Tiles always carry full tile-sized payloads (TIFF6 pads the edge
        # tiles); the LAST strip carries only the image's remaining rows.
        rows = th if tiled else min(th, height - y0)
        if compression == 1:
            block = _unpack_samples(buf, bits, rows, tw, endian)
        elif compression == 7:
            block = decode_ljpeg(buf).astype(np.uint16)
            if block.shape[1] != tw:  # N-component scans span N columns
                block = block.reshape(th, tw)
        else:
            raise NotImplementedError(
                f"DNG compression {compression} not supported "
                "(supported: 1=uncompressed, 7=lossless JPEG)"
            )
        out_rows = min(rows, height - y0)
        cols = min(tw, width - x0)
        mosaic[y0 : y0 + out_rows, x0 : x0 + cols] = block[:out_rows, :cols]
    return mosaic
