"""Generate the pinned expected statistics for the multimodal_g711_decode
graded entry — with an INDEPENDENT table-arithmetic G.711 reference
decoder.

This module deliberately re-implements both decode laws from the ITU-T
G.711 segment definitions as 256-entry lookup tables built from the
segment start/step CLOSED FORMS (magnitude = (2m+33)<<(e+2) etc.), a
different formulation than the engine's shift-of-sums expressions in
operators/multimodal.py, and walks the RIFF container itself.  The only
shared pieces are the fixture DEFINITIONS (params + signal + encoder),
because the payload bytes are the object under test.  The engine's
decoder and this one must agree sample-exactly; tests/test_round9_ops.py
asserts exactly that, plus hand-pinned byte vectors from the spec.

Run: PYTHONPATH=. python3 scripts/gen_g711_expected.py
Prints the `_G711_EXPECTED` literal for operators/multimodal.py.
"""
from __future__ import annotations

import struct


def build_ulaw_table() -> list:
    """All 256 mu-law byte decodings via the closed form: for exponent
    e and mantissa m the magnitude is 4*((2m+33) * 2^e) - 132."""
    table = []
    for b in range(256):
        u = (~b) & 0xFF
        e = (u >> 4) & 0x07
        m = u & 0x0F
        mag = 4 * ((2 * m + 33) * (1 << e)) - 132
        table.append(-mag if (u & 0x80) else mag)
    return table


def build_alaw_table() -> list:
    """All 256 A-law byte decodings via the closed form: segment 0 is
    linear (16m + 8); segment e >= 1 is (2m + 33) << (e + 2)."""
    table = []
    for b in range(256):
        a = b ^ 0x55
        e = (a >> 4) & 0x07
        m = a & 0x0F
        mag = 16 * m + 8 if e == 0 else (2 * m + 33) << (e + 2)
        table.append(mag if (a & 0x80) else -mag)
    return table


ULAW_TABLE = build_ulaw_table()
ALAW_TABLE = build_alaw_table()


def ref_decode(payload: bytes) -> tuple:
    """Independent mono G.711 WAV decode: (rate, law, list of ints)."""
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    pos, tag, rate, n_total, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        assert len(body) >= size, "truncated chunk"
        if cid == b"fmt ":
            tag, ch, rate, _abps, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            assert ch == 1 and bits == 8
        elif cid == b"fact":
            (n_total,) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    assert tag in (6, 7) and n_total is not None and data is not None
    table = ULAW_TABLE if tag == 7 else ALAW_TABLE
    return rate, ("ulaw" if tag == 7 else "alaw"), [
        table[b] for b in data[:n_total]
    ]


def expected_rows() -> list:
    from dblab_ece_trino_spark.operators.multimodal import (
        _G711_PARAMS,
        _g711_signal,
        encode_g711_wav,
    )

    rows = []
    for i, (n, rate, law) in enumerate(_G711_PARAMS):
        payload = encode_g711_wav(_g711_signal(i, n), rate, law)
        got_rate, got_law, s = ref_decode(payload)
        assert (got_rate, got_law, len(s)) == (rate, law, n)
        rows.append(
            (
                i, rate, law, n, sum(s), sum(abs(v) for v in s),
                sum(k * v for k, v in enumerate(s)), s[-1],
            )
        )
    return rows


def main() -> None:
    print("_G711_EXPECTED = [")
    for r in expected_rows():
        print(f"    {r!r},")
    print("]")


if __name__ == "__main__":
    main()
