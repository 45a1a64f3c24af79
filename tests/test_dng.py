"""From-scratch DNG reader (data/dng.py) + raw_utils.load_raw_images.

Fixtures are synthesized in-test: a minimal TIFF writer for uncompressed
strips/tiles (16-bit and 12-bit packed) and a lossless-JPEG (SOF3) encoder
for the Compression=7 round-trip — so the raw ingestion path the reference
drives through rawpy (internal/raw_utils.py:160-199) executes end-to-end
here with no binary fixtures checked in.
"""

import json
import struct

import numpy as np
import pytest

from neural_radiance_caching_tpu.data import dng as dng_lib
from neural_radiance_caching_tpu.data import raw_utils


# --- minimal TIFF/DNG writer -------------------------------------------------


def _entry(tag, typ, values):
    values = np.atleast_1d(values)
    fmt = {1: "B", 3: "H", 4: "I"}[typ]
    size = {1: 1, 3: 2, 4: 4}[typ] * len(values)
    packed = struct.pack("<" + fmt * len(values), *[int(v) for v in values])
    return tag, typ, len(values), packed.ljust(4, b"\0"), size


def _write_dng(path, payloads, width, height, bits, compression,
               tile=None, photometric=32803, rows_per_strip=None):
    """One-IFD DNG: strip data (tile=None) or square tiles of size `tile`."""
    entries = [
        _entry(0x00FE, 4, [0]),
        _entry(0x0100, 4, [width]),
        _entry(0x0101, 4, [height]),
        _entry(0x0102, 3, [bits]),
        _entry(0x0103, 3, [compression]),
        _entry(0x0106, 3, [photometric]),
        _entry(0x0115, 3, [1]),
    ]
    # Data blocks start after header(8) + ifd(2 + 12n + 4); offsets patched in.
    data_entries = 2  # offsets + counts
    n = len(entries) + data_entries + (2 if tile else 1)
    ifd_size = 2 + 12 * n + 4
    cursor = 8 + ifd_size
    # Long offset arrays (>4 bytes) must live outside the entry; keep <=1 tile
    # row in tests so offsets fit inline when single, else append after data.
    offsets = []
    for p in payloads:
        offsets.append(cursor)
        cursor += len(p)
    counts = [len(p) for p in payloads]

    def arr_entry(tag, values):
        nonlocal cursor
        if len(values) == 1:
            return _entry(tag, 4, values), b""
        blob = struct.pack("<" + "I" * len(values), *values)
        e = (tag, 4, len(values), struct.pack("<I", cursor), 4)
        cursor += len(blob)
        return e, blob

    if tile:
        entries.append(_entry(0x0142, 4, [tile]))
        entries.append(_entry(0x0143, 4, [tile]))
        off_e, off_blob = arr_entry(0x0144, offsets)
        cnt_e, cnt_blob = arr_entry(0x0145, counts)
    else:
        entries.append(_entry(0x0116, 4, [rows_per_strip or height]))
        off_e, off_blob = arr_entry(0x0111, offsets)
        cnt_e, cnt_blob = arr_entry(0x0117, counts)
    entries += [off_e, cnt_e]
    entries.sort(key=lambda e: e[0])
    assert len(entries) == n

    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<HI", 42, 8))
        f.write(struct.pack("<H", len(entries)))
        for tag, typ, cnt, val, _ in entries:
            f.write(struct.pack("<HHI", tag, typ, cnt) + val)
        f.write(struct.pack("<I", 0))
        for p in payloads:
            f.write(p)
        f.write(off_blob)
        f.write(cnt_blob)


def _pack12(values):
    """MSB-first 12-bit packing (TIFF fill order 1)."""
    bits = np.unpackbits(
        values.astype(">u2").view(np.uint8).reshape(-1, 2), axis=1
    )[:, 4:]
    return np.packbits(bits.reshape(-1)).tobytes()


# --- lossless JPEG encoder (SOF3, predictor 1) --------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self):
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.n = 0, 0
        return bytes(self.out)


def _encode_ljpeg(img, precision=16, ncomp=1, point_transform=0):
    """Encode [H, W] -> SOF3 stream with `ncomp` column-interleaved comps."""
    h, w = img.shape
    img = img.astype(np.int64) >> point_transform
    assert w % ncomp == 0
    width = w // ncomp
    # Huffman table: ssss categories 0..16, canonical codes of length 5
    # except a few — keep it trivial: all 17 symbols at lengths 5/6.
    counts = [0, 0, 0, 0, 16, 1] + [0] * 10
    symbols = list(range(17))
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1

    wr = _BitWriter()
    prev_row = None
    for row in range(h):
        this_row = np.zeros((width, ncomp), np.int64)
        for col in range(width):
            for ci in range(ncomp):
                x = img[row, col * ncomp + ci]
                if row == 0 and col == 0:
                    pred = 1 << (precision - point_transform - 1)
                elif col == 0:
                    pred = prev_row[0, ci]
                else:
                    pred = this_row[col - 1, ci]
                diff = int(x - pred) & 0xFFFF
                if diff >= 32768:
                    diff -= 65536
                if diff == 0:
                    ssss = 0
                elif diff == 32768 or diff == -32768:
                    ssss = 16
                else:
                    ssss = int(np.ceil(np.log2(abs(diff) + 1)))
                ln, cd = table[ssss]
                wr.put(cd, ln)
                if 0 < ssss < 16:
                    v = diff if diff > 0 else diff + (1 << ssss) - 1
                    wr.put(v, ssss)
                this_row[col, ci] = x
        prev_row = this_row
    scan = wr.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    dht = bytes([0x00]) + bytes(counts) + bytes(symbols)
    sof = bytes([precision]) + struct.pack(">HH", h, width) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([1, 0, point_transform])  # predictor 1, Se=0, Ah<<4|Al
    return (b"\xff\xd8" + seg(0xC4, dht) + seg(0xC3, sof) + seg(0xDA, sos)
            + scan + b"\xff\xd9")


# --- tests --------------------------------------------------------------------


@pytest.fixture
def mosaic():
    rng = np.random.RandomState(0)
    return rng.randint(0, 65535, size=(16, 16)).astype(np.uint16)


def test_uncompressed_16bit_strips(tmp_path, mosaic):
    path = tmp_path / "strips16.dng"
    _write_dng(path, [mosaic.astype("<u2").tobytes()], 16, 16, 16, 1)
    out = dng_lib.read_dng(str(path))
    np.testing.assert_array_equal(out, mosaic.astype(np.float32))


def test_uncompressed_12bit_packed(tmp_path):
    rng = np.random.RandomState(1)
    m = rng.randint(0, 4095, size=(8, 8)).astype(np.uint16)
    path = tmp_path / "packed12.dng"
    _write_dng(path, [_pack12(m.reshape(-1))], 8, 8, 12, 1)
    out = dng_lib.read_dng(str(path))
    np.testing.assert_array_equal(out, m.astype(np.float32))


def test_uncompressed_tiles(tmp_path, mosaic):
    tiles = []
    for ty in range(2):
        for tx in range(2):
            t = mosaic[ty * 8 : ty * 8 + 8, tx * 8 : tx * 8 + 8]
            tiles.append(t.astype("<u2").tobytes())
    path = tmp_path / "tiles16.dng"
    _write_dng(path, tiles, 16, 16, 16, 1, tile=8)
    out = dng_lib.read_dng(str(path))
    np.testing.assert_array_equal(out, mosaic.astype(np.float32))


def test_ljpeg_roundtrip_single_component(tmp_path, mosaic):
    stream = _encode_ljpeg(mosaic, precision=16, ncomp=1)
    decoded = dng_lib.decode_ljpeg(stream)
    np.testing.assert_array_equal(decoded & 0xFFFF, mosaic)


def test_ljpeg_roundtrip_two_component(tmp_path, mosaic):
    """DNG's usual layout: a 2-component scan spanning CFA column pairs."""
    stream = _encode_ljpeg(mosaic, precision=16, ncomp=2)
    decoded = dng_lib.decode_ljpeg(stream)
    np.testing.assert_array_equal(decoded & 0xFFFF, mosaic)


def test_ljpeg_compressed_dng(tmp_path, mosaic):
    stream = _encode_ljpeg(mosaic, precision=16, ncomp=2)
    path = tmp_path / "ljpeg.dng"
    _write_dng(path, [stream], 16, 16, 16, 7, tile=16)
    out = dng_lib.read_dng(str(path))
    np.testing.assert_array_equal(out, mosaic.astype(np.float32))


def test_load_raw_images_end_to_end(tmp_path, mosaic):
    """The reference's load path (raw_utils.py:160-199): DNG + exiftool-style
    JSON sidecars -> (raws, exifs) -> process_exif -> demosaic."""
    for i in range(2):
        _write_dng(tmp_path / f"img{i}.dng",
                   [mosaic.astype("<u2").tobytes()], 16, 16, 16, 1)
        sidecar = [{
            "BlackLevel": "64 64 64 64", "WhiteLevel": 65535,
            "AsShotNeutral": "0.5 1 0.6",
            "ColorMatrix2": " ".join(["1", "0", "0", "0", "1", "0",
                                      "0", "0", "1"]),
            "NoiseProfile": "0.001 0.0001",
            "ISO": 100, "ShutterSpeed": "1/60",
        }]
        (tmp_path / f"img{i}.json").write_text(json.dumps(sidecar))
    raws, exifs = raw_utils.load_raw_images(str(tmp_path))
    assert raws.shape == (2, 16, 16) and raws.dtype == np.float32
    assert len(exifs) == 2 and "BlackLevel" in exifs[0]
    np.testing.assert_array_equal(raws[0], mosaic.astype(np.float32))
    # The rest of the reference pipeline consumes these directly.
    rgb = raw_utils.bilinear_demosaic(raws[0] / 65535.0)
    assert rgb.shape == (16, 16, 3) and np.isfinite(rgb).all()


def test_missing_dir_raises():
    with pytest.raises(ValueError, match="does not exist"):
        raw_utils.load_raw_images("/nonexistent/raw/dir")


def test_partial_last_strip_16bit(tmp_path):
    """RowsPerStrip=4, height=10: last strip carries only 2 rows (ADVICE r4)."""
    rng = np.random.RandomState(2)
    m = rng.randint(0, 65535, size=(10, 6)).astype(np.uint16)
    strips = [m[y : y + 4].astype("<u2").tobytes() for y in range(0, 10, 4)]
    path = tmp_path / "partial.dng"
    _write_dng(path, strips, 6, 10, 16, 1, rows_per_strip=4)
    out = dng_lib.read_dng(str(path))
    np.testing.assert_array_equal(out, m.astype(np.float32))


def test_partial_last_strip_12bit_packed(tmp_path):
    """Bit-packed multi-strip with a short last strip decodes exactly."""
    rng = np.random.RandomState(3)
    m = rng.randint(0, 4095, size=(10, 8)).astype(np.uint16)
    strips = [_pack12(m[y : y + 4].reshape(-1)) for y in range(0, 10, 4)]
    path = tmp_path / "partial12.dng"
    _write_dng(path, strips, 8, 10, 12, 1, rows_per_strip=4)
    out = dng_lib.read_dng(str(path))
    np.testing.assert_array_equal(out, m.astype(np.float32))


def test_packed12_odd_width_row_padded(tmp_path):
    """TIFF6 pads each packed row to a byte boundary: odd widths must not
    drift after row 0 (ADVICE r4)."""
    rng = np.random.RandomState(4)
    m = rng.randint(0, 4095, size=(4, 7)).astype(np.uint16)
    payload = b"".join(_pack12(row) for row in m)  # per-row padding
    path = tmp_path / "odd12.dng"
    _write_dng(path, [payload], 7, 4, 12, 1)
    out = dng_lib.read_dng(str(path))
    np.testing.assert_array_equal(out, m.astype(np.float32))


def test_ljpeg_point_transform(tmp_path, mosaic):
    """Al>0 scans code samples at reduced precision; the decoder must scale
    the output back up by 2^Al (ADVICE r4)."""
    stream = _encode_ljpeg(mosaic, precision=16, point_transform=2)
    decoded = dng_lib.decode_ljpeg(stream)
    np.testing.assert_array_equal(
        decoded, (mosaic.astype(np.int64) >> 2) << 2
    )


def test_ljpeg_dri_raises(mosaic):
    """Restart-marker streams must refuse loudly, not decode garbage."""
    stream = _encode_ljpeg(mosaic, precision=16)
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 8)
    soi, rest = stream[:2], stream[2:]
    with pytest.raises(NotImplementedError, match="restart"):
        dng_lib.decode_ljpeg(soi + dri + rest)
