"""Minimal FLAC *encoder* used to generate decoder test fixtures.

This image has no FLAC tooling (no libsndfile/ffmpeg/flac/torchaudio), so
the native decoder (native/flac_decode.cpp) is tested against streams
produced by this independent implementation of the FLAC format spec
(https://xiph.org/flac/format.html). It deliberately exercises every
decoder path: CONSTANT / VERBATIM / FIXED(0-4) / LPC subframes, Rice
residual methods 0 and 1 with escape partitions and partition orders > 0,
wasted bits, all stereo decorrelation modes, 8/16/24-bit depths, multi-byte
UTF-8 frame numbers and ragged last frames.

Test-only code: favors clarity over speed.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        value &= (1 << n) - 1
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def utf8_code(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    for nbytes in range(2, 8):
        if n.bit_length() <= 5 * nbytes + 1:
            lead_payload = 7 - nbytes
            shift = 6 * (nbytes - 1)
            lead = ((0xFF00 >> nbytes) & 0xFF) | (n >> shift)
            out = [lead]
            for i in range(nbytes - 1):
                shift -= 6
                out.append(0x80 | ((n >> shift) & 0x3F))
            return bytes(out)
    raise ValueError(n)


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else (-(v << 1) - 1)


def _rice_cost(res: Sequence[int], k: int) -> int:
    return sum((_zigzag(v) >> k) + 1 + k for v in res)


def _best_rice_k(res: Sequence[int], kmax: int) -> int:
    return min(range(kmax + 1), key=lambda k: _rice_cost(res, k))


def _write_residual(bw: BitWriter, res: List[int], blocksize: int, order: int,
                    po: int, method: int, escape_partitions=()) -> None:
    """Residual block: 2-bit method, 4-bit partition order, partitions."""
    assert blocksize % (1 << po) == 0
    plen = 4 if method == 0 else 5
    escape = 0xF if method == 0 else 0x1F
    bw.write(method, 2)
    bw.write(po, 4)
    idx = 0
    for part in range(1 << po):
        cnt = (blocksize >> po) - (order if part == 0 else 0)
        chunk = res[idx:idx + cnt]
        idx += cnt
        if part in escape_partitions:
            raw = max((abs(v).bit_length() + 1 for v in chunk), default=1)
            raw = min(raw, 31)
            bw.write(escape, plen)
            bw.write(raw, 5)
            for v in chunk:
                bw.write_signed(v, raw)
        else:
            k = _best_rice_k(chunk, escape - 1)
            bw.write(k, plen)
            for v in chunk:
                u = _zigzag(v)
                bw.write_unary(u >> k)
                bw.write(u & ((1 << k) - 1), k)


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _subframe_header(bw: BitWriter, type_code: int, wasted: int) -> None:
    bw.write(0, 1)
    bw.write(type_code, 6)
    if wasted:
        bw.write(1, 1)
        bw.write(1, wasted)  # unary(wasted - 1): wasted-1 zeros then a 1
    else:
        bw.write(0, 1)


def encode_subframe(bw: BitWriter, x: Sequence[int], bps: int, kind: str,
                    order: int = 2, po: int = 0, method: int = 0,
                    lpc_coefs: Optional[List[int]] = None,
                    lpc_shift: int = 0, lpc_precision: int = 12,
                    escape_partitions=()) -> None:
    x = [int(v) for v in x]
    blocksize = len(x)

    # wasted bits: shared low zero bits across the subframe
    wasted = 0
    if any(x):
        while wasted < bps - 1 and all((v & ((1 << (wasted + 1)) - 1)) == 0 for v in x):
            wasted += 1
    if kind == "constant" or not any(x):
        wasted = 0  # keep constants simple
    ebps = bps - wasted
    xs = [v >> wasted for v in x]

    if kind == "constant":
        assert all(v == xs[0] for v in xs)
        _subframe_header(bw, 0, wasted)
        bw.write_signed(xs[0], ebps)
    elif kind == "verbatim":
        _subframe_header(bw, 1, wasted)
        for v in xs:
            bw.write_signed(v, ebps)
    elif kind == "fixed":
        coefs = _FIXED_COEFS[order]
        _subframe_header(bw, 8 + order, wasted)
        for v in xs[:order]:
            bw.write_signed(v, ebps)
        res = [xs[i] - sum(c * xs[i - 1 - j] for j, c in enumerate(coefs))
               for i in range(order, blocksize)]
        _write_residual(bw, res, blocksize, order, po, method, escape_partitions)
    elif kind == "lpc":
        coefs = lpc_coefs if lpc_coefs is not None else [3, -1]
        order = len(coefs)
        _subframe_header(bw, 32 + order - 1, wasted)
        for v in xs[:order]:
            bw.write_signed(v, ebps)
        bw.write(lpc_precision - 1, 4)
        bw.write_signed(lpc_shift, 5)
        for c in coefs:
            bw.write_signed(c, lpc_precision)
        res = [xs[i] - (sum(c * xs[i - 1 - j] for j, c in enumerate(coefs)) >> lpc_shift)
               for i in range(order, blocksize)]
        _write_residual(bw, res, blocksize, order, po, method, escape_partitions)
    else:
        raise ValueError(kind)


_BS_CODE = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
            256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12}
_SS_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


def encode_frame(frame_idx: int, channels: List[Sequence[int]], bps: int,
                 stereo_mode: str = "independent", kind: str = "fixed",
                 ss_from_streaminfo: bool = False, **sub_kw) -> bytes:
    """One frame. ``channels`` are the PHYSICAL channel samples (ints)."""
    blocksize = len(channels[0])
    nch = len(channels)
    bw = BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 1)
    bw.write(0, 1)  # fixed blocksize stream: number = frame index
    bs_code = _BS_CODE.get(blocksize)
    explicit = 0
    if bs_code is None:
        bs_code, explicit = (6, 8) if blocksize <= 256 else (7, 16)
    bw.write(bs_code, 4)
    bw.write(0, 4)  # sample rate: from STREAMINFO
    if stereo_mode == "independent":
        bw.write(nch - 1, 4)
        subs = [(list(c), bps) for c in channels]
    else:
        assert nch == 2
        l = [int(v) for v in channels[0]]
        r = [int(v) for v in channels[1]]
        side = [a - b for a, b in zip(l, r)]
        if stereo_mode == "left_side":
            bw.write(8, 4)
            subs = [(l, bps), (side, bps + 1)]
        elif stereo_mode == "right_side":
            bw.write(9, 4)
            subs = [(side, bps + 1), (r, bps)]
        elif stereo_mode == "mid_side":
            bw.write(10, 4)
            mid = [(a + b) >> 1 for a, b in zip(l, r)]
            subs = [(mid, bps), (side, bps + 1)]
        else:
            raise ValueError(stereo_mode)
    bw.write(0 if ss_from_streaminfo else _SS_CODE[bps], 3)
    bw.write(0, 1)
    for b in utf8_code(frame_idx):
        bw.write(b, 8)
    if explicit:
        bw.write(blocksize - 1, explicit)
    hdr = bw.getvalue()  # all fields above are whole bytes
    bw.write(crc8(hdr), 8)
    for samples, sub_bps in subs:
        encode_subframe(bw, samples, sub_bps, kind, **sub_kw)
    bw.align()
    bw.write(crc16(bytes(bw.buf)), 16)
    return bw.getvalue()


def encode_flac(x: np.ndarray, sample_rate: int, bps: int = 16,
                blocksize: int = 1024, stereo_mode: str = "independent",
                kind: str = "fixed", per_frame_kind=None, **sub_kw) -> bytes:
    """Full stream. ``x``: int array (n,) mono or (n, ch). Values must fit bps."""
    x = np.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    assert np.abs(x).max(initial=0) < (1 << (bps - 1))

    out = bytearray(b"fLaC")
    si = BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    for _ in range(16):
        si.write(0, 8)  # md5 unset
    body = si.getvalue()
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body  # last-block

    idx = 0
    for start in range(0, n, blocksize):
        chunk = x[start:start + blocksize]
        k = per_frame_kind(idx) if per_frame_kind else kind
        sm = stereo_mode if nch == 2 else "independent"
        out += encode_frame(idx, [chunk[:, c] for c in range(nch)], bps,
                            stereo_mode=sm, kind=k, **sub_kw)
        idx += 1
    return bytes(out)
