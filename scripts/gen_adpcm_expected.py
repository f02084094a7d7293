"""Generate the pinned expected statistics for the multimodal_adpcm_decode
graded entry — with an INDEPENDENT scalar IMA-ADPCM reference decoder.

This module deliberately re-implements the RIFF chunk walk and the IMA
nibble loop from the public spec (IMA "Recommended Practices for
Enhancing Digital Audio Compatibility"; step table also in RFC 3551
§4.5.1) without importing any decode code from the engine: the only
shared pieces are the fixture DEFINITIONS (params + signal + encoder),
because the payload bytes are the object under test.  The engine's
decoder and this one must agree bit-exactly; tests/test_round9_ops.py
asserts exactly that, plus a hand-stepped nibble vector pinning this
reference's own arithmetic.

Run: python3 scripts/gen_adpcm_expected.py
Prints the `_ADPCM_EXPECTED` literal for operators/multimodal.py.
"""
from __future__ import annotations

import struct

REF_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
REF_INDEX_ADJUST = [-1, -1, -1, -1, 2, 4, 6, 8]


def ref_step(nibble: int, pred: int, index: int) -> tuple:
    """One reference decode step, written in the spec's ((2m+1)*step)/8
    EXPANDED conditional form (the bit-exact WAV variant)."""
    st = REF_STEPS[index]
    delta = st >> 3
    for bit, shift in ((1, 2), (2, 1), (4, 0)):
        if nibble & bit:
            delta += st >> shift
    if nibble & 8:
        delta = -delta
    pred = pred + delta
    if pred > 32767:
        pred = 32767
    elif pred < -32768:
        pred = -32768
    index = index + REF_INDEX_ADJUST[nibble & 7]
    if index < 0:
        index = 0
    elif index > 88:
        index = 88
    return pred, index


def ref_decode(payload: bytes) -> tuple:
    """Independent mono IMA-ADPCM WAV decode: (rate, list of ints)."""
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    pos = 12
    fmt = fact = data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        assert len(body) == size, f"chunk {cid!r} truncated"
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHHHH", body[:20])
        elif cid == b"fact":
            (fact,) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    tag, ch, rate, _abps, ba, bits, _cb, spb = fmt
    assert tag == 17 and ch == 1 and bits == 4 and fact is not None
    assert spb == (ba - 4) * 2 + 1
    samples: list = []
    bpos = 0
    while len(samples) < fact:
        pred, index, _r = struct.unpack("<hBB", data[bpos : bpos + 4])
        block = [pred]
        for byte in data[bpos + 4 : bpos + ba]:
            for nib in (byte & 0x0F, byte >> 4):
                pred, index = ref_step(nib, pred, index)
                block.append(pred)
        samples.extend(block[: min(spb, fact - len(samples))])
        bpos += ba
    return rate, samples


def expected_rows() -> list:
    from dblab_ece_trino_spark.operators.multimodal import (
        _ADPCM_PARAMS,
        _N_ADPCM,
        _adpcm_signal,
        encode_adpcm_wav,
    )

    rows = []
    for i in range(_N_ADPCM):
        n_samp, ba, rate = _ADPCM_PARAMS[i]
        payload = encode_adpcm_wav(_adpcm_signal(i, n_samp), rate,
                                   block_align=ba)
        drate, s = ref_decode(payload)
        assert drate == rate and len(s) == n_samp
        rows.append(
            (
                i, rate, ba, n_samp, sum(s), sum(abs(v) for v in s),
                sum(k * v for k, v in enumerate(s)), s[-1],
            )
        )
    return rows


if __name__ == "__main__":
    print("_ADPCM_EXPECTED = [")
    for r in expected_rows():
        print(f"    {r},")
    print("]")
