"""Generate the pinned expected statistics for the multimodal_audio_energy
graded entry — with an INDEPENDENT scalar reference.

This module re-implements the PCM WAV read path (its own RIFF chunk
walk) and the windowed energy / zero-crossing / silence computation as
a sample-by-sample pure-Python loop — the engine vectorizes the same
definitions in numpy.  The only shared pieces are the fixture
DEFINITIONS (params + signal + encoder), because the payload bytes are
the object under test.  tests/test_round9_ops.py asserts engine ==
reference on every clip plus the planted silence-layout ground truth.

Run: PYTHONPATH=. python3 scripts/gen_audio_energy_expected.py
Prints the `_AUDIO_E_EXPECTED` literal for operators/multimodal.py.
"""
from __future__ import annotations

import struct


def ref_pcm_decode(payload: bytes) -> tuple:
    """Independent mono PCM WAV parse: (rate, list of ints)."""
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, ch, rate, _abps, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            assert tag == 1 and ch == 1 and bits == 16
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    assert rate is not None and data is not None
    samples = [
        struct.unpack("<h", data[k : k + 2])[0] for k in range(0, len(data), 2)
    ]
    return rate, samples


def ref_stats(payload: bytes, win: int, thr: int) -> tuple:
    rate, s = ref_pcm_decode(payload)
    nw = len(s) // win
    n_silent = energy_sum = energy_max = zc_sum = 0
    first_active = -1
    for wi in range(nw):
        chunk = s[wi * win : (wi + 1) * win]
        e = 0
        zc = 0
        for k, v in enumerate(chunk):
            e += v * v
            if k + 1 < win and v * chunk[k + 1] < 0:
                zc += 1
        energy_sum += e
        if e > energy_max:
            energy_max = e
        if e < thr * win:
            n_silent += 1
        elif first_active < 0:
            first_active = wi
        zc_sum += zc
    return (
        rate, len(s), nw, n_silent, energy_sum,
        energy_max if nw else 0, zc_sum, first_active,
    )


def expected_rows() -> list:
    import numpy as np

    from dblab_ece_trino_spark.operators.multimodal import (
        _AUDIO_E_PARAMS,
        _N_AUDIO_E,
        AUDIO_SILENCE_MSQ,
        AUDIO_WIN,
        _audio_e_signal,
        encode_wav,
    )

    rows = []
    for i in range(_N_AUDIO_E):
        n, rate, layout = _AUDIO_E_PARAMS[i]
        payload = encode_wav(
            np.array(_audio_e_signal(i, n, layout), dtype=np.int16), rate
        )
        rows.append((i,) + ref_stats(payload, AUDIO_WIN, AUDIO_SILENCE_MSQ))
    return rows


def main() -> None:
    print("_AUDIO_E_EXPECTED = [")
    for r in expected_rows():
        print(f"    {r!r},")
    print("]")


if __name__ == "__main__":
    main()
