"""Pure-numpy baseline JPEG codec (ITU-T T.81 baseline sequential DCT).

No imaging library in this container, so like the BMP/PNG/WAV codecs in
operators/multimodal.py this implements the public wire format directly:

- :func:`decode_jpeg` — baseline (SOF0/1) AND progressive (SOF2, T.81
  Annex G) decoder: DQT/DHT/SOF/DRI/SOS parsing, canonical Huffman decode
  with byte-unstuffing and restart markers; progressive scans accumulate
  per-component coefficients (DC first/refine, AC spectral bands with EOB
  runs, AC refinement correction bits); dequantize → un-zigzag → IDCT,
  chroma upsampling for any sampling factors (4:4:4 / 4:2:2 / 4:2:0),
  YCbCr→RGB (JFIF/BT.601). Grayscale and 3-component images supported;
  arithmetic coding and lossless/hierarchical modes raise.
- :func:`encode_jpeg` — a minimal spec-compliant baseline encoder for
  round-trip tests: Annex-K quantization tables scaled by ``quality``,
  FIXED-LENGTH canonical Huffman tables declared in DHT (4-bit DC codes,
  8-bit AC codes — valid but unoptimized, which is irrelevant for tests),
  4:4:4 or 4:2:0 chroma, optional grayscale.

Decode is a per-payload Python kernel, same tier as the PNG path: it runs
inside an Arrow-batched UDF where the per-image work dominates, and the
Spark plumbing around it (binary columns, mapInPandas batches) stays
columnar.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: ZIGZAG[k] = raster index of the k-th coefficient
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# corrupt-payload guard: a malformed SOF can declare 65535x65535 (34 GB of
# planes); decoding is for data-pipeline payloads, so cap the allocation
MAX_PIXELS = 64_000_000

# Annex K example quantization tables (public spec constants)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# orthonormal 8-point DCT-II basis: forward Y = C @ X @ C.T, inverse C.T@Y@C
_k = np.arange(8)
_C = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * np.sqrt(2 / 8)
_C[0] *= np.sqrt(0.5)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------


def _build_huffman(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman per T.81 Annex C: {(length, code) → value}."""
    table = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded bytes with 0xFF00 unstuffing;
    stops at any non-RST marker."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self):
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                self.bitbuf = (self.bitbuf << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    self.marker = nxt
                    self.pos += 2
                    continue
            else:
                self.pos += 1
            self.bitbuf = ((self.bitbuf << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self):
        """Consume a pending RSTn marker and realign to a byte boundary.

        The marker may already be latched (``_fill`` ran into it) or still
        sit unread at ``self.pos`` (``_fill`` buffers 4 bytes at a time, so
        an interval whose byte length hits the buffer boundary leaves the
        marker unconsumed) — both cases must advance past it, or the next
        fill latches the marker and pads zeros for the whole next interval.
        """
        self.bitbuf = 0
        self.nbits = 0
        if self.marker is not None:
            if 0xD0 <= self.marker <= 0xD7:
                self.marker = None
            return
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            v = table.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t raw bits to the signed coefficient."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _parse_dqt(seg: bytes, qt: dict) -> None:
    j = 0
    while j < len(seg):
        prec, tid = seg[j] >> 4, seg[j] & 0xF
        if prec == 0:
            tbl = np.frombuffer(seg[j + 1:j + 65], dtype=np.uint8).astype(np.int64)
            j += 65
        else:
            tbl = np.frombuffer(seg[j + 1:j + 129], dtype=">u2").astype(np.int64)
            j += 129
        raster = np.zeros(64, dtype=np.int64)
        raster[ZIGZAG] = tbl
        qt[tid] = raster.reshape(8, 8)


def _parse_dht(seg: bytes, huff_dc: dict, huff_ac: dict) -> None:
    j = 0
    while j < len(seg):
        cls, tid = seg[j] >> 4, seg[j] & 0xF
        bits = list(seg[j + 1:j + 17])
        n = sum(bits)
        vals = list(seg[j + 17:j + 17 + n])
        (huff_ac if cls else huff_dc)[tid] = _build_huffman(bits, vals)
        j += 17 + n


def _check_sampling(comps: list[dict]) -> None:
    """T.81 limits sampling factors to 1..4; 0 would divide by zero in the
    MCU geometry (corrupt-payload guard, same tier as MAX_PIXELS)."""
    for c in comps:
        if not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4):
            raise ValueError(
                f"corrupt JPEG: sampling factors {c['h']}x{c['v']}"
            )


def _planes_to_rgb(out: list) -> np.ndarray:
    """Shared reconstruction tail: 1 plane → replicated gray, 3 planes →
    JFIF YCbCr→RGB, clipped uint8."""
    if len(out) == 1:
        g = np.clip(out[0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    Y, Cb, Cr = out
    R = Y + 1.402 * (Cr - 128)
    G = Y - 0.344136 * (Cb - 128) - 0.714136 * (Cr - 128)
    B = Y + 1.772 * (Cb - 128)
    return np.clip(np.stack([R, G, B], axis=2).round(), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline JPEG bytes → HxWx3 uint8 (grayscale replicates channels)."""
    if b[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    i = 2
    while i < len(b) - 1:
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", b[i:i + 2])[0]
        if seglen < 2:
            raise ValueError("corrupt JPEG: zero-length marker segment")
        seg = b[i + 2:i + seglen]
        if marker == 0xDB:  # DQT
            _parse_dqt(seg, qt)
        elif marker == 0xC4:  # DHT
            _parse_dht(seg, huff_dc, huff_ac)
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            if h * w > MAX_PIXELS or h == 0 or w == 0:
                raise ValueError(f"unreasonable JPEG dimensions {w}x{h}")
            _check_sampling(comps)
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:  # progressive DCT → Annex-G path
            return _decode_progressive(b)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/1) and progressive (SOF2) JPEG supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = seg[0]
            if ns < len(frame["comps"]):
                # spec-legal non-interleaved baseline (one scan per
                # component) — decode via the generic multi-scan walker
                return _decode_multiscan(b, progressive=False)
            scan = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append({"id": cid, "dc": tt >> 4, "ac": tt & 0xF})
            data_start = i + seglen
            return _decode_scan(b, data_start, frame, scan, qt, huff_dc,
                                huff_ac, restart_interval)
        i += seglen
    raise ValueError("no SOS scan found")


def _decode_scan(b, start, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    for s in scan:
        c = by_id[s["id"]]
        c["dc_tbl"], c["ac_tbl"] = huff_dc[s["dc"]], huff_ac[s["ac"]]
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    }
    pred = {c["id"]: 0 for c in comps}
    r = _BitReader(b, start)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.align_restart()
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                q = qt[c["tq"]]
                for vy in range(c["v"]):
                    for vx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        t = r.decode_huff(c["dc_tbl"])
                        if t > 16:
                            raise ValueError("corrupt JPEG: DC category > 16")
                        diff = _extend(r.read_bits(t), t)
                        pred[c["id"]] += diff
                        coef[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = r.decode_huff(c["ac_tbl"])
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coef[k] = _extend(r.read_bits(size), size)
                            k += 1
                        block = np.zeros(64, dtype=np.int64)
                        block[ZIGZAG] = coef
                        px = _idct2(block.reshape(8, 8) * q) + 128
                        y0, x0 = (my * c["v"] + vy) * 8, (mx * c["h"] + vx) * 8
                        planes[c["id"]][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1
    # upsample each component to full size by sample replication
    out = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    return _planes_to_rgb(out)


# ---------------------------------------------------------------------------
# Encoder (tests / fixtures)
# ---------------------------------------------------------------------------

_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]


def _fixed_tables():
    """Valid fixed-length canonical tables: 12 DC syms at 4 bits, 162 AC
    syms at 8 bits (the all-ones code stays unused in both, as T.81
    requires). Codes are just the canonical sequence 0..n-1."""
    dc_bits = [0] * 16
    dc_bits[3] = len(_DC_SYMS)  # length 4
    ac_bits = [0] * 16
    ac_bits[7] = len(_AC_SYMS)  # length 8
    dc_codes = {v: (4, i) for i, v in enumerate(_DC_SYMS)}
    ac_codes = {v: (8, i) for i, v in enumerate(_AC_SYMS)}
    return dc_bits, dc_codes, ac_bits, ac_codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((base * scale + 50) / 100).astype(np.int64)
    return np.clip(q, 1, 255)


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_component(bw, blocks, q, pred, dc_codes, ac_codes):
    for block in blocks:
        coef = np.round(_dct2(block - 128.0) / q).astype(np.int64)
        zz = coef.reshape(64)[ZIGZAG]
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        t = _category(diff)
        length, code = dc_codes[t]
        bw.write(code, length)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                length, code = ac_codes[0xF0]
                bw.write(code, length)
                run -= 16
            s = _category(v)
            length, code = ac_codes[(run << 4) | s]
            bw.write(code, length)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            length, code = ac_codes[0x00]
            bw.write(code, length)
    return pred


def _blocks_of(plane: np.ndarray):
    h, w = plane.shape
    H = (h + 7) // 8 * 8
    W = (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge").astype(np.float64)
    return padded, H // 8, W // 8


def encode_jpeg(img: np.ndarray, quality: int = 85, subsampling: str = "444") -> bytes:
    """HxWx3 (or HxW) uint8 → baseline JFIF bytes. ``subsampling``: "444" or
    "420" (chroma 2x2 box-mean). Grayscale input emits a 1-component scan."""
    img = np.asarray(img)
    gray = img.ndim == 2
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    dc_bits, dc_codes, ac_bits, ac_codes = _fixed_tables()
    if gray:
        h, w = img.shape
        Y = img.astype(np.float64)
    else:
        h, w = img.shape[:2]
        R, G, B = (img[..., c].astype(np.float64) for c in range(3))
        Y = 0.299 * R + 0.587 * G + 0.114 * B
        Cb = -0.168736 * R - 0.331264 * G + 0.5 * B + 128
        Cr = 0.5 * R - 0.418688 * G - 0.081312 * B + 128

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def dqt(tid, q):
        z = q.reshape(64)[ZIGZAG].astype(np.uint8)
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + z.tobytes()

    out += dqt(0, ql)
    if not gray:
        out += dqt(1, qc)

    if gray:
        comps_sof = [(1, 0x11, 0)]
    elif subsampling == "420":
        comps_sof = [(1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)]
    else:
        comps_sof = [(1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1)]
    sof = struct.pack(">BHHB", 8, h, w, len(comps_sof))
    for cid, hv, tq in comps_sof:
        sof += bytes([cid, hv, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(cls, tid, bits, syms):
        payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(syms)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    out += dht(0, 0, dc_bits, _DC_SYMS) + dht(1, 0, ac_bits, _AC_SYMS)
    sos_comps = [(1, 0x00)]
    if not gray:
        out += dht(0, 1, dc_bits, _DC_SYMS) + dht(1, 1, ac_bits, _AC_SYMS)
        sos_comps = [(1, 0x00), (2, 0x11), (3, 0x11)]
    sos = bytes([len(sos_comps)])
    for cid, tt in sos_comps:
        sos += bytes([cid, tt])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    if gray:
        P, nby, nbx = _blocks_of(Y)
        blocks = [P[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                  for by in range(nby) for bx in range(nbx)]
        _encode_component(bw, blocks, ql, 0, dc_codes, ac_codes)
    elif subsampling == "420":
        # pad Y to 16-multiples so MCUs are complete, box-mean the chroma
        H2 = (h + 15) // 16 * 16
        W2 = (w + 15) // 16 * 16
        Yp = np.pad(Y, ((0, H2 - h), (0, W2 - w)), mode="edge")
        Cbs = np.pad(Cb, ((0, H2 - h), (0, W2 - w)), mode="edge")
        Crs = np.pad(Cr, ((0, H2 - h), (0, W2 - w)), mode="edge")
        Cbs = Cbs.reshape(H2 // 2, 2, W2 // 2, 2).mean(axis=(1, 3))
        Crs = Crs.reshape(H2 // 2, 2, W2 // 2, 2).mean(axis=(1, 3))
        pred = {1: 0, 2: 0, 3: 0}
        for my in range(H2 // 16):
            for mx in range(W2 // 16):
                yb = [
                    Yp[my * 16 + vy * 8:my * 16 + vy * 8 + 8,
                       mx * 16 + vx * 8:mx * 16 + vx * 8 + 8]
                    for vy in range(2) for vx in range(2)
                ]
                pred[1] = _encode_component(bw, yb, ql, pred[1], dc_codes, ac_codes)
                cb = [Cbs[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]]
                cr = [Crs[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]]
                pred[2] = _encode_component(bw, cb, qc, pred[2], dc_codes, ac_codes)
                pred[3] = _encode_component(bw, cr, qc, pred[3], dc_codes, ac_codes)
    else:
        Yp, nby, nbx = _blocks_of(Y)
        Cbp, _, _ = _blocks_of(Cb)
        Crp, _, _ = _blocks_of(Cr)
        pred = {1: 0, 2: 0, 3: 0}
        for by in range(nby):
            for bx in range(nbx):
                sl = np.s_[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                pred[1] = _encode_component(bw, [Yp[sl]], ql, pred[1], dc_codes, ac_codes)
                pred[2] = _encode_component(bw, [Cbp[sl]], qc, pred[2], dc_codes, ac_codes)
                pred[3] = _encode_component(bw, [Crp[sl]], qc, pred[3], dc_codes, ac_codes)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive (SOF2) decoding — T.81 Annex G
# ---------------------------------------------------------------------------


def _next_marker_after_scan(b: bytes, start: int) -> int:
    """Index of the 0xFF of the first real marker after entropy data
    (skipping stuffed FF00 and RSTn)."""
    i = start
    while i < len(b) - 1:
        if b[i] == 0xFF:
            nxt = b[i + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                i += 2
                continue
            return i
        i += 1
    return len(b)


def _decode_progressive(b: bytes) -> np.ndarray:
    return _decode_multiscan(b, progressive=True)


def _decode_multiscan(b: bytes, progressive: bool) -> np.ndarray:
    """Generic multi-scan decoding: every SOS accumulates into per-component
    coefficient arrays; reconstruction runs once at the end. Progressive
    scans refine coefficients (Annex G: DC first/refine, AC bands with EOB
    runs and correction bits); sequential scans (non-interleaved baseline,
    one scan per component) decode full blocks."""
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scans = []  # (scan comps, Ss, Se, Ah, Al, data_start, restart_interval)
    i = 2
    while i < len(b) - 1:
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", b[i:i + 2])[0]
        if seglen < 2:
            raise ValueError("corrupt JPEG: zero-length marker segment")
        seg = b[i + 2:i + seglen]
        if marker == 0xDB:
            _parse_dqt(seg, qt)
        elif marker == 0xC4:
            # tables are positional in the scan stream: snapshot per scan
            _parse_dht(seg, huff_dc, huff_ac)
        elif marker in ((0xC2,) if progressive else (0xC0, 0xC1)):
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            if h * w > MAX_PIXELS or h == 0 or w == 0:
                raise ValueError(f"unreasonable JPEG dimensions {w}x{h}")
            _check_sampling(comps)
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in ((0xC0, 0xC1) if progressive else (0xC2,)):
            raise ValueError("frame type does not match multiscan mode")
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scomps.append({"id": cid, "dc": tt >> 4, "ac": tt & 0xF})
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            data_start = i + seglen
            # Huffman tables are mutable between scans — bind copies now
            tables = {
                c["id"]: (huff_dc.get(c["dc"]), huff_ac.get(c["ac"]))
                for c in scomps
            }
            scans.append((scomps, tables, ss, se, ahal >> 4, ahal & 0xF,
                          data_start, restart_interval))
            i = _next_marker_after_scan(b, data_start)
            continue
        i += seglen
    if frame is None or not scans:
        raise ValueError("no frame/scan found")

    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    for c in comps:
        # allocated (MCU-padded) block grid; nominal dims for 1-comp scans
        c["bw_alloc"], c["bh_alloc"] = mcux * c["h"], mcuy * c["v"]
        c["bw"] = (-(-(w * c["h"]) // hmax) + 7) // 8
        c["bh"] = (-(-(h * c["v"]) // vmax) + 7) // 8
    coefs = {
        c["id"]: np.zeros((c["bh_alloc"], c["bw_alloc"], 64), dtype=np.int64)
        for c in comps
    }

    for scomps, tables, ss, se, ah, al, data_start, dri in scans:
        r = _BitReader(b, data_start)
        eobrun = 0
        pred = {sc["id"]: 0 for sc in scomps}
        blocks_done = 0
        if len(scomps) == 1:
            sc = scomps[0]
            c = by_id[sc["id"]]
            dc_tbl, ac_tbl = tables[sc["id"]]
            cf = coefs[sc["id"]]
            for by in range(c["bh"]):
                for bx in range(c["bw"]):
                    if dri and blocks_done and blocks_done % dri == 0:
                        r.align_restart()
                        pred[sc["id"]] = 0
                        eobrun = 0
                    if progressive:
                        eobrun = _decode_block_prog(
                            r, cf[by, bx], dc_tbl, ac_tbl, ss, se, ah, al,
                            pred, sc["id"], eobrun,
                        )
                    else:
                        _decode_block_seq(r, cf[by, bx], dc_tbl, ac_tbl,
                                          pred, sc["id"])
                    blocks_done += 1
        else:
            for my in range(mcuy):
                for mx in range(mcux):
                    if dri and blocks_done and blocks_done % dri == 0:
                        r.align_restart()
                        pred = {sc["id"]: 0 for sc in scomps}
                        eobrun = 0
                    for sc in scomps:
                        c = by_id[sc["id"]]
                        dc_tbl, ac_tbl = tables[sc["id"]]
                        cf = coefs[sc["id"]]
                        for vy in range(c["v"]):
                            for vx in range(c["h"]):
                                blk = cf[my * c["v"] + vy, mx * c["h"] + vx]
                                if progressive:
                                    eobrun = _decode_block_prog(
                                        r, blk, dc_tbl, ac_tbl, ss, se, ah,
                                        al, pred, sc["id"], eobrun,
                                    )
                                else:
                                    _decode_block_seq(r, blk, dc_tbl, ac_tbl,
                                                      pred, sc["id"])
                    blocks_done += 1

    planes = {}
    for c in comps:
        cf = coefs[c["id"]]
        q = qt[c["tq"]]
        plane = np.zeros((c["bh_alloc"] * 8, c["bw_alloc"] * 8), dtype=np.float64)
        for by in range(c["bh_alloc"]):
            for bx in range(c["bw_alloc"]):
                block = np.zeros(64, dtype=np.int64)
                block[ZIGZAG] = cf[by, bx]
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                    _idct2(block.reshape(8, 8) * q) + 128
                )
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes[c["id"]] = plane[:h, :w]
    out = [planes[c["id"]] for c in comps]
    return _planes_to_rgb(out)


def _decode_block_seq(r, coef, dc_tbl, ac_tbl, pred, cid):
    """One full baseline block (DC diff + AC run-length to 63) into the
    block's zigzag coefficient vector."""
    t = r.decode_huff(dc_tbl)
    if t > 16:
        raise ValueError("corrupt JPEG: DC category > 16")
    pred[cid] += _extend(r.read_bits(t), t)
    coef[0] = pred[cid]
    k = 1
    while k < 64:
        rs = r.decode_huff(ac_tbl)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run == 15:
                k += 16
                continue
            break
        k += run
        if k > 63:
            raise ValueError("AC index overflow")
        coef[k] = _extend(r.read_bits(size), size)
        k += 1


def _decode_block_prog(r, coef, dc_tbl, ac_tbl, ss, se, ah, al, pred, cid, eobrun):
    """One block of one progressive scan; ``coef`` is the block's zigzag
    coefficient vector, mutated in place. Returns the new EOB run."""
    if ss == 0:
        if ah == 0:  # DC first
            t = r.decode_huff(dc_tbl)
            if t > 16:
                raise ValueError("corrupt JPEG: DC category > 16")
            diff = _extend(r.read_bits(t), t)
            pred[cid] += diff
            coef[0] = pred[cid] << al
        else:  # DC refinement
            if r.read_bit():
                coef[0] |= 1 << al
        return eobrun
    p1 = 1 << al
    m1 = -1 << al
    if ah == 0:  # AC first
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = r.decode_huff(ac_tbl)
            run, size = rs >> 4, rs & 0xF
            if size == 0:
                if run < 15:
                    eobrun = (1 << run) - 1
                    if run:
                        eobrun += r.read_bits(run)
                    break
                k += 16
                continue
            k += run
            if k > se:
                break
            coef[k] = _extend(r.read_bits(size), size) << al
            k += 1
        return eobrun
    # AC refinement (G.1.2.3 correction-bit walk). NOTE the EOB asymmetry
    # vs the first pass: an EOB here still owes correction bits for the
    # REST of this block's nonzero band, so the run includes this block
    # (decremented by the tail below after those bits are consumed).
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = r.decode_huff(ac_tbl)
            run, size = rs >> 4, rs & 0xF
            if size == 0:
                if run < 15:
                    eobrun = 1 << run
                    if run:
                        eobrun += r.read_bits(run)
                    break
                val = 0  # ZRL: skip 16 zero coefficients
            else:
                val = p1 if r.read_bit() else m1
            while k <= se:
                if coef[k] != 0:
                    if r.read_bit() and (coef[k] & p1) == 0:
                        coef[k] += p1 if coef[k] > 0 else m1
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if coef[k] != 0:
                if r.read_bit() and (coef[k] & p1) == 0:
                    coef[k] += p1 if coef[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun
