"""Independent FLAC reference decoder pinning multimodal_flac_decode.

Deliberately different formulation than the engine's decoder
(operators/multimodal.py): the payload is expanded to a literal '0'/'1'
bit STRING parsed by slicing an index forward (no bit accumulator), the
CRCs are table-driven (the engine's are bitwise loops), the coded
number is decoded by counting leading ones on the textual bits, and
Rice quotients are read with str.index('1').  The only shared pieces
are the fixture DEFINITIONS (params + sawtooth + encoder), because the
payload bytes are the object under test.  tests/test_round13_ops.py
re-derives the engine/reference agreement on every pytest run.

Layout follows the public FLAC format (RFC 9639): STREAMINFO metadata,
frame sync + header CRC-8 + frame CRC-16, constant/verbatim/fixed/LPC
subframes, Rice/Rice2/escape residual partitions, wasted bits, and the
left/right/mid-side stereo decorrelations.

Run: PYTHONPATH=. python3 scripts/gen_flac_expected.py
Prints per-fixture decoded stats for eyeballing against the oracle.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_table(poly: int, width: int) -> list:
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    table = []
    for b in range(256):
        reg = b << (width - 8)
        for _ in range(8):
            reg = ((reg << 1) ^ poly) & mask if reg & top else (reg << 1) & mask
        table.append(reg)
    return table


_T8 = _make_table(0x07, 8)
_T16 = _make_table(0x8005, 16)


def crc8(data: bytes) -> int:
    reg = 0
    for b in data:
        reg = _T8[reg ^ b]
    return reg


def crc16(data: bytes) -> int:
    reg = 0
    for b in data:
        reg = _T16[((reg >> 8) ^ b) & 0xFF] ^ ((reg << 8) & 0xFFFF)
    return reg


class Bits:
    """Textual bit cursor: the whole payload as a '0'/'1' string."""

    def __init__(self, payload: bytes) -> None:
        self.s = "".join(f"{b:08b}" for b in payload)
        self.i = 0

    def take(self, n: int) -> int:
        if self.i + n > len(self.s):
            raise AssertionError("truncated bitstream")
        v = int(self.s[self.i : self.i + n] or "0", 2) if n else 0
        self.i += n
        return v

    def take_signed(self, n: int) -> int:
        v = self.take(n)
        return v - (1 << n) if n and v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        j = self.s.index("1", self.i)
        q = j - self.i
        self.i = j + 1
        return q

    def align(self) -> None:
        self.i = (self.i + 7) // 8 * 8


_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
          7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _coded_number(bits: Bits) -> int:
    b0 = bits.take(8)
    if b0 < 0x80:
        return b0
    head = f"{b0:08b}"
    ones = len(head) - len(head.lstrip("1"))
    assert 2 <= ones <= 7, "bad coded-number head"
    v = b0 & ((1 << (8 - ones - 1)) - 1) if ones < 7 else 0
    for _ in range(ones - 1):
        c = bits.take(8)
        assert c & 0xC0 == 0x80, "bad coded-number continuation"
        v = (v << 6) | (c & 0x3F)
    return v


def _residuals(bits: Bits, blocksize: int, order: int) -> list:
    method = bits.take(2)
    assert method in (0, 1), "reserved residual method"
    po = bits.take(4)
    pbits = 4 + method
    esc = (1 << pbits) - 1
    plen = blocksize >> po
    out = []
    for p in range(1 << po):
        n = plen - (order if p == 0 else 0)
        k = bits.take(pbits)
        if k == esc:
            w = bits.take(5)
            out += [bits.take_signed(w) if w else 0 for _ in range(n)]
        else:
            for _ in range(n):
                u = (bits.unary() << k) | bits.take(k)
                out.append((u >> 1) ^ -(u & 1))
    return out


def _subframe(bits: Bits, blocksize: int, bps: int) -> list:
    assert bits.take(1) == 0, "subframe pad bit"
    code = bits.take(6)
    wasted = (bits.unary() + 1) if bits.take(1) else 0
    eff = bps - wasted
    if code == 0:
        vals = [bits.take_signed(eff)] * blocksize
    elif code == 1:
        vals = [bits.take_signed(eff) for _ in range(blocksize)]
    elif 8 <= code <= 12:
        order = code - 8
        vals = [bits.take_signed(eff) for _ in range(order)]
        for r in _residuals(bits, blocksize, order):
            pred = sum(c * vals[-1 - j] for j, c in enumerate(_FIXED[order]))
            vals.append(pred + r)
    elif code >= 32:
        order = (code & 31) + 1
        vals = [bits.take_signed(eff) for _ in range(order)]
        prec = bits.take(4) + 1
        shift = bits.take_signed(5)
        coef = [bits.take_signed(prec) for _ in range(order)]
        for r in _residuals(bits, blocksize, order):
            pred = sum(c * vals[-1 - j] for j, c in enumerate(coef)) >> shift
            vals.append(pred + r)
    else:
        raise AssertionError(f"reserved subframe type {code}")
    return [v << wasted for v in vals] if wasted else vals


def ref_decode(payload: bytes):
    """Independent FLAC decode: (rate, [per-channel sample lists])."""
    assert payload[:4] == b"fLaC", "bad magic"
    pos, info, last = 4, None, False
    while not last:
        head = payload[pos]
        last, btype = bool(head & 0x80), head & 0x7F
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        if btype == 0:
            info = payload[pos + 4 : pos + 4 + length]
        pos += 4 + length
    ib = Bits(info)
    ib.take(16), ib.take(16), ib.take(24), ib.take(24)
    si_rate = ib.take(20)
    channels = ib.take(3) + 1
    bps = ib.take(5) + 1
    total = ib.take(36)
    chans = [[] for _ in range(channels)]
    out_rate = None
    while pos < len(payload):
        fb = Bits(payload[pos:])
        assert fb.take(14) == 0b11111111111110, "bad sync"
        assert fb.take(1) == 0
        fb.take(1)
        bs_c, sr_c, ch_c, ss_c = (
            fb.take(4), fb.take(4), fb.take(4), fb.take(3))
        assert fb.take(1) == 0
        _coded_number(fb)
        if bs_c == 6:
            bs = fb.take(8) + 1
        elif bs_c == 7:
            bs = fb.take(16) + 1
        elif bs_c == 1:
            bs = 192
        elif 2 <= bs_c <= 5:
            bs = 576 << (bs_c - 2)
        else:
            bs = 256 << (bs_c - 8)
        if sr_c == 0:
            rate = si_rate
        elif sr_c == 12:
            rate = fb.take(8) * 1000
        elif sr_c == 13:
            rate = fb.take(16)
        elif sr_c == 14:
            rate = fb.take(16) * 10
        else:
            rate = _RATES[sr_c]
        fbps = bps if ss_c == 0 else {1: 8, 2: 12, 4: 16, 5: 20,
                                      6: 24, 7: 32}[ss_c]
        hdr_bytes = fb.i // 8
        assert fb.take(8) == crc8(payload[pos : pos + hdr_bytes]), "crc8"
        if ch_c <= 7:
            nch, side = ch_c + 1, None
        else:
            nch, side = 2, ch_c
        subs = []
        for ch in range(nch):
            extra = 1 if (
                (side == 8 and ch == 1) or (side == 9 and ch == 0)
                or (side == 10 and ch == 1)
            ) else 0
            subs.append(_subframe(fb, bs, fbps + extra))
        fb.align()
        body = fb.i // 8
        assert fb.take(16) == crc16(payload[pos : pos + body]), "crc16"
        pos += body + 2
        if side == 8:
            subs = [subs[0], [a - b for a, b in zip(subs[0], subs[1])]]
        elif side == 9:
            subs = [[a + b for a, b in zip(subs[0], subs[1])], subs[1]]
        elif side == 10:
            m2 = [(m << 1) | (s & 1) for m, s in zip(subs[0], subs[1])]
            subs = [[(a + s) >> 1 for a, s in zip(m2, subs[1])],
                    [(a - s) >> 1 for a, s in zip(m2, subs[1])]]
        for ch in range(channels):
            chans[ch].extend(subs[ch])
        out_rate = rate if out_rate is None else out_rate
    if total:
        assert len(chans[0]) == total, "total sample mismatch"
    return out_rate, chans


def expected_rows():
    """Decode every graded fixture with THIS reference decoder and
    return the stats rows the oracle's closed form must match."""
    import numpy as np

    from dblab_ece_trino_spark.operators.multimodal import (
        _FLAC_PARAMS,
        encode_flac,
    )

    rows = []
    for i, (n, rate, bs, mode, po, step, amp, kw) in enumerate(_FLAC_PARAMS):
        k = np.arange(n, dtype="int64")
        s = (k * step) % (2 * amp) - amp
        payload = encode_flac(
            s, rate, block_size=bs, mode=mode, partition_order=po, **kw
        )
        r, chans = ref_decode(payload)
        mono = chans[0]
        rising = sum(
            1 for a, b in zip(mono, mono[1:]) if a < 0 and b >= 0
        )
        rows.append(
            (i, r, len(mono), sum(mono),
             sum(v * v for v in mono), rising)
        )
    return rows


if __name__ == "__main__":
    for row in expected_rows():
        print(row)
