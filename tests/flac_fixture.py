"""Minimal FLAC *encoder* for decoder test fixtures (no ffmpeg in image).

Emits spec-valid streams exercising the decoder paths: CONSTANT, VERBATIM
and FIXED(0-2) subframes with single-partition Rice residuals, mono and
independent-stereo channel assignments, correct CRC-8/CRC-16.
"""
from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def to_bytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i: i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def _rice_encode(w: BitWriter, residuals: np.ndarray, k: int):
    for r in residuals:
        r = int(r)
        v = (r << 1) if r >= 0 else ((-r) << 1) - 1   # zigzag
        q, low = v >> k, v & ((1 << k) - 1)
        w.write(0, q)       # q zeros
        w.write(1, 1)       # stop bit
        if k:
            w.write(low, k)


def _subframe(w: BitWriter, x: np.ndarray, mode: str, bps: int = 16):
    if mode == "constant":
        w.write(0, 1); w.write(0, 6); w.write(0, 1)
        w.write_signed(int(x[0]), bps)
    elif mode == "verbatim":
        w.write(0, 1); w.write(1, 6); w.write(0, 1)
        for v in x:
            w.write_signed(int(v), bps)
    elif mode.startswith("fixed"):
        order = int(mode[-1])
        w.write(0, 1); w.write(8 + order, 6); w.write(0, 1)
        for v in x[:order]:
            w.write_signed(int(v), bps)
        if order == 0:
            res = x.astype(np.int64)
        elif order == 1:
            res = np.diff(x.astype(np.int64))
        else:
            res = np.diff(np.diff(x.astype(np.int64)))
        mean = max(1.0, float(np.abs(res).mean()))
        k = min(14, max(0, int(np.ceil(np.log2(mean + 1)))))
        w.write(0, 2)            # rice method
        w.write(0, 4)            # partition order 0
        w.write(k, 4)
        _rice_encode(w, res, k)
    else:
        raise ValueError(mode)


def encode_flac(
    samples: np.ndarray,   # [n] or [n, ch] int16
    rate: int = 16000,
    blocksize: int = 1024,
    mode: str = "verbatim",
    total_in_streaminfo: bool = True,   # False = unknown-length stream
) -> bytes:
    x = np.asarray(samples, np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    # STREAMINFO
    info = BitWriter()
    info.write(blocksize, 16); info.write(blocksize, 16)
    info.write(0, 24); info.write(0, 24)
    info.write(rate, 20); info.write(nch - 1, 3); info.write(15, 5)  # 16bps
    info.write(n if total_in_streaminfo else 0, 36)
    info.write(0, 128)  # md5
    out = bytearray(b"fLaC")
    body = info.to_bytes()
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    for f, lo in enumerate(range(0, n, blocksize)):
        blk = x[lo: lo + blocksize]
        bs = len(blk)
        h = BitWriter()
        h.write(0b11111111111110, 14)
        h.write(0, 1); h.write(0, 1)
        h.write(7, 4)        # 16-bit blocksize-1 follows
        h.write(0, 4)        # sample rate from STREAMINFO
        h.write(nch - 1, 4)  # independent channels
        h.write(0b100, 3)    # 16 bps
        h.write(0, 1)
        if f < 0x80:         # UTF-8 coded frame number
            h.write(f, 8)
        else:
            assert f < 0x800
            h.write(0b110 << 5 | (f >> 6), 8)
            h.write(0b10 << 6 | (f & 0x3F), 8)
        h.write(bs - 1, 16)
        hdr = h.to_bytes()
        hdr += bytes([crc8(hdr)])

        w = BitWriter()
        for c in range(nch):
            _subframe(w, blk[:, c], mode)
        frame = hdr + w.to_bytes()
        frame += crc16(frame).to_bytes(2, "big")
        out += frame
    return bytes(out)
