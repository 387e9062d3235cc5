"""Minimal FLAC encoder (test fixture only).

Emits spec-conformant streams with verbatim / constant / fixed-order
subframes and zero-order Rice partitions — enough surface to round-trip
test the native C++ decoder. CRC fields are zeroed (the decoder parses
but does not verify them).
"""

from __future__ import annotations

from typing import List

import numpy as np


class BitWriter:
    def __init__(self) -> None:
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        value &= (1 << bits) - 1
        self.acc = (self.acc << bits) | value
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, bits: int) -> None:
        self.write(value & ((1 << bits) - 1), bits)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def _write_rice(bw: BitWriter, value: int, k: int) -> None:
    u = 2 * value if value >= 0 else -2 * value - 1
    q = u >> k
    for _ in range(q):
        bw.write(0, 1)
    bw.write(1, 1)
    if k:
        bw.write(u & ((1 << k) - 1), k)


def _subframe_verbatim(bw: BitWriter, samples: np.ndarray, bps: int) -> None:
    bw.write(0, 1)        # padding
    bw.write(1, 6)        # verbatim
    bw.write(0, 1)        # no wasted bits
    for s in samples:
        bw.write_signed(int(s), bps)


def _subframe_constant(bw: BitWriter, value: int, bps: int) -> None:
    bw.write(0, 1)
    bw.write(0, 6)        # constant
    bw.write(0, 1)
    bw.write_signed(value, bps)


def _subframe_fixed(bw: BitWriter, samples: np.ndarray, bps: int,
                    order: int, k: int = 4) -> None:
    bw.write(0, 1)
    bw.write(8 + order, 6)  # fixed, given order
    bw.write(0, 1)
    for s in samples[:order]:
        bw.write_signed(int(s), bps)
    # residuals under the standard fixed predictors
    x = samples.astype(np.int64)
    if order == 0:
        res = x
    elif order == 1:
        res = x[1:] - x[:-1]
    elif order == 2:
        res = x[2:] - 2 * x[1:-1] + x[:-2]
    else:
        raise ValueError(order)
    bw.write(0, 2)        # rice method 0 (4-bit params)
    bw.write(0, 4)        # partition order 0
    bw.write(k, 4)
    for r in res:
        _write_rice(bw, int(r), k)


def encode_flac(
    channels: List[np.ndarray],
    sample_rate: int,
    bps: int = 16,
    block_size: int = 256,
    subframe_types: str = "verbatim",
) -> bytes:
    """Encode int arrays (one per channel, equal length) as FLAC."""
    n = len(channels[0])
    out = bytearray(b"fLaC")

    info = BitWriter()
    info.write(1, 1)            # last metadata block
    info.write(0, 7)            # STREAMINFO
    info.write(34, 24)
    info.write(block_size, 16)  # min block
    info.write(block_size, 16)  # max block
    info.write(0, 24)
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(len(channels) - 1, 3)
    info.write(bps - 1, 5)
    info.write(n, 36)
    for _ in range(16):
        info.write(0, 8)        # md5
    out += info.getvalue()

    frame_no = 0
    for start in range(0, n, block_size):
        size = min(block_size, n - start)
        bw = BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)          # reserved
        bw.write(0, 1)          # fixed blocking
        bw.write(0b0110, 4)     # 8-bit block size follows
        bw.write(0, 4)          # sample rate from STREAMINFO
        bw.write(len(channels) - 1, 4)  # independent channels
        bw.write(0, 3)          # sample size from STREAMINFO
        bw.write(0, 1)
        assert frame_no < 128
        bw.write(frame_no, 8)   # UTF-8 single byte
        bw.write(size - 1, 8)   # block size - 1
        bw.write(0, 8)          # CRC-8 (unverified)
        for ch in channels:
            seg = np.asarray(ch[start:start + size])
            if subframe_types == "constant" and np.all(seg == seg[0]):
                _subframe_constant(bw, int(seg[0]), bps)
            elif subframe_types.startswith("fixed"):
                order = int(subframe_types[-1])
                _subframe_fixed(bw, seg, bps, order)
            else:
                _subframe_verbatim(bw, seg, bps)
        bw.align()
        bw.write(0, 16)         # CRC-16 (unverified)
        out += bw.getvalue()
        frame_no += 1
    return bytes(out)
