"""Generate the pinned expected statistics for the multimodal_au_decode
graded entry — with an INDEPENDENT Sun AU reference decoder.

Deliberately different formulation than the engine: the mu-law decode
is a 256-entry lookup table built from the G.711 segment closed form
(magnitude = 4*((2m+33)<<e) - 132), not the engine's shift-of-sums
expression; the header is walked with its own struct unpacking; the
linear encodings are decoded with explicit two's-complement arithmetic
on raw bytes (no numpy dtype views).  The only shared pieces are the
fixture DEFINITIONS (params + signal + encoder), because the payload
bytes are the object under test.  tests/test_round12_ops.py re-derives
this agreement on every pytest run.

Run: PYTHONPATH=. python3 scripts/gen_au_expected.py
Prints the `_AU_EXPECTED` literal for operators/multimodal.py.
"""
from __future__ import annotations

import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_ulaw_table() -> list:
    table = []
    for b in range(256):
        u = (~b) & 0xFF
        e = (u >> 4) & 0x07
        m = u & 0x0F
        mag = 4 * ((2 * m + 33) * (1 << e)) - 132
        table.append(-mag if (u & 0x80) else mag)
    return table


ULAW_TABLE = build_ulaw_table()


def ref_decode(payload: bytes) -> tuple:
    """Independent mono AU decode: (rate, codec, list of ints)."""
    assert payload[:4] == b".snd"
    offset, size, enc, rate, channels = struct.unpack(
        ">IIIII", payload[4:24]
    )
    assert channels == 1 and offset >= 24
    body = payload[offset:]
    if size != 0xFFFFFFFF:
        assert len(body) >= size
        body = body[:size]
    if enc == 1:
        return rate, "ulaw", [ULAW_TABLE[b] for b in body]
    if enc == 2:
        return rate, "pcm8", [b - 256 if b >= 128 else b for b in body]
    if enc == 3:
        out = []
        for j in range(0, len(body), 2):
            v = (body[j] << 8) | body[j + 1]
            out.append(v - 65536 if v >= 32768 else v)
        return rate, "pcm16be", out
    raise AssertionError(f"unexpected encoding {enc}")


def expected_rows() -> list:
    from dblab_ece_trino_spark.operators.multimodal import (
        _AU_PARAMS,
        _au_signal,
        encode_au,
    )

    rows = []
    for i, (n_samp, rate, enc) in enumerate(_AU_PARAMS):
        payload = encode_au(_au_signal(i, n_samp, enc), rate, enc)
        r, codec, s = ref_decode(payload)
        ksum = sum(k * v for k, v in enumerate(s))
        rows.append(
            (
                i, r, codec, len(s), sum(s), sum(abs(v) for v in s),
                ksum, s[-1] if s else 0,
            )
        )
    return rows


def main() -> None:
    print("_AU_EXPECTED = [")
    for r in expected_rows():
        print(f"    {r!r},")
    print("]")


if __name__ == "__main__":
    main()
