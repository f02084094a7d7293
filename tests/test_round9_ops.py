"""Round-9 operator tests: IMA-ADPCM codec (hand-stepped vector, engine
vs independent reference decoder, pinned-constant re-derivation,
container robustness) and the non-zero-AC JPEG fixture family."""
from __future__ import annotations

import numpy as np
import pytest


# ------------------------------------------------------------ IMA-ADPCM


def test_adpcm_hand_stepped_vector_pins_both_implementations():
    """Hand-computed decode walk (worked out on paper from the IMA
    practice document) pins the engine's `_adpcm_reconstruct` AND the
    independent `scripts.gen_adpcm_expected.ref_step` — the two
    implementations can't share a complementary bug with this vector
    asserting the arithmetic itself.

    From pred=0, index=0 (step 7):
      nib 7  -> diff 0+1+3+7 = 11, pred 11,  index 0+8  = 8  (step 16)
      nib 15 -> diff 2+4+8+16 = 30 (sign), pred -19, index 16 (step 34)
      nib 0  -> diff 34>>3 = 4, pred -15, index 15 (step 31)
      nib 10 -> diff 3+15 = 18 (sign), pred -33, index 14
    """
    from dblab_ece_trino_spark.operators.multimodal import _adpcm_reconstruct
    from scripts.gen_adpcm_expected import ref_step

    expected = [(11, 8), (-19, 16), (-15, 15), (-33, 14)]
    for impl in (_adpcm_reconstruct, ref_step):
        pred, index = 0, 0
        got = []
        for nib in (7, 15, 0, 10):
            pred, index = impl(nib, pred, index)
            got.append((pred, index))
        assert got == expected, (impl.__module__, got)
    # clamp edges: max step, both directions, index ceiling
    for impl in (_adpcm_reconstruct, ref_step):
        assert impl(7, 32760, 88) == (32767, 88)
        assert impl(15, -32000, 88) == (-32768, 88)
        assert impl(0, 5, 0) == (5, 0)  # index floor


def test_adpcm_engine_decoder_matches_independent_reference():
    """Engine decode (numpy path through the generic audio seam) must be
    sample-exact vs the scripts/ reference decoder on all 12 fixtures."""
    from dblab_ece_trino_spark.operators.multimodal import (
        _ADPCM_PARAMS,
        _N_ADPCM,
        _adpcm_signal,
        decode_audio,
        encode_adpcm_wav,
    )
    from scripts.gen_adpcm_expected import ref_decode

    for i in range(_N_ADPCM):
        n_samp, ba, rate = _ADPCM_PARAMS[i]
        payload = encode_adpcm_wav(
            np.array(_adpcm_signal(i, n_samp), dtype=np.int16), rate,
            block_align=ba,
        )
        er, es = decode_audio(payload)
        rr, rs = ref_decode(payload)
        assert er == rr == rate
        assert list(map(int, es)) == rs, f"clip {i} diverges"


def test_adpcm_expected_constants_rederive():
    """The pinned `_ADPCM_EXPECTED` literal must equal a fresh run of
    the generator — constant drift (stale regeneration after a fixture
    edit) fails here before it fails at the driver."""
    from dblab_ece_trino_spark.operators.multimodal import _ADPCM_EXPECTED
    from scripts.gen_adpcm_expected import expected_rows

    assert expected_rows() == _ADPCM_EXPECTED


def test_adpcm_fixture_family_covers_block_shapes():
    """The clip table must keep covering the block-layout edge cases
    the decoder's trimming logic exists for."""
    from dblab_ece_trino_spark.operators.multimodal import _ADPCM_PARAMS

    shapes = set()
    for n_samp, ba, _rate in _ADPCM_PARAMS:
        spb = (ba - 4) * 2 + 1
        rem = n_samp % spb
        shapes.add(
            "exact" if rem == 0 else ("header_only" if rem == 1 else "partial")
        )
    assert shapes == {"exact", "header_only", "partial"}
    assert {ba for _n, ba, _r in _ADPCM_PARAMS} == {12, 16, 24}


def test_adpcm_roundtrip_fidelity_and_rejection():
    from dblab_ece_trino_spark.operators.multimodal import (
        decode_adpcm_wav,
        decode_audio,
        decode_wav,
        encode_adpcm_wav,
        encode_wav,
    )

    k = np.arange(400)
    s = (3000 * np.sin(k / 25) + 700 * np.sin(k / 6)).astype(np.int16)
    payload = encode_adpcm_wav(s, 8000, block_align=32)
    rate, d = decode_adpcm_wav(payload)
    assert rate == 8000 and len(d) == 400
    err = np.abs(d.astype(np.int64) - s.astype(np.int64))
    # adaptation transient at clip start; steady-state must track tightly
    assert err[50:].max() <= 256 and err.mean() <= 64, (
        err.max(), err.mean()
    )

    # the generic seam dispatches on wFormatTag: PCM -> decode_wav path
    pcm = encode_wav(s, 8000)
    prate, ps = decode_audio(pcm)
    assert prate == 8000 and np.array_equal(ps, decode_wav(pcm)[1])
    # ADPCM through the seam == direct decode
    arate, asamp = decode_audio(payload)
    assert arate == 8000 and np.array_equal(asamp, d)
    # MP3-class stays a loud stub
    with pytest.raises(NotImplementedError, match="audio library"):
        decode_audio(b"ID3\x03\x00" + b"\x00" * 64)

    # container robustness: every corruption class raises ValueError
    with pytest.raises(ValueError, match="truncated"):
        decode_adpcm_wav(payload[:-40])  # cut inside the data chunk
    # size-consistent but fewer blocks than the fact count claims
    import struct as _struct

    dat_at = payload.index(b"data")
    short = bytearray(payload[: dat_at + 8 + 32])  # keep only one block
    _struct.pack_into("<I", short, dat_at + 4, 32)
    with pytest.raises(ValueError, match="fewer blocks than fact"):
        decode_adpcm_wav(bytes(short))
    nofact = payload.replace(b"fact", b"fakt")
    with pytest.raises(ValueError, match="fact chunk"):
        decode_adpcm_wav(nofact)
    bad_tag = bytearray(encode_wav(s, 8000))
    with pytest.raises(ValueError, match="not IMA-ADPCM"):
        decode_adpcm_wav(bytes(bad_tag))
    bad_spb = bytearray(payload)
    at = bad_spb.index(b"fmt ")
    bad_spb[at + 8 + 18] ^= 0xFF  # corrupt samplesPerBlock
    with pytest.raises(ValueError, match="samplesPerBlock"):
        decode_adpcm_wav(bytes(bad_spb))
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_adpcm_wav(b"OggS" + b"\x00" * 64)


# ------------------------------------------- JPEG non-zero-AC family


def test_jpeg_ac_fixtures_exercise_the_ac_path():
    """Every block in the family must carry >= 2 nonzero quantized AC
    coefficients (the whole point of the family), and the cr plane's
    (5,5) basis term must force ZRL symbols: its zigzag index minus the
    preceding nonzero AC's index must exceed 16."""
    from dblab_ece_trino_spark.operators.multimodal import (
        _JPEG_AC_BASIS,
        _JPEG_ZIGZAG,
        _N_JPEG_AC,
        _jpeg_ac_block_coeffs,
    )

    # zigzag index of natural position (u, v): _JPEG_ZIGZAG maps
    # zigzag order -> natural index u + 8*v ... recover the inverse
    inv = {nat: k for k, nat in enumerate(_JPEG_ZIGZAG)}
    for plane, ((u1, v1), (u2, v2)) in _JPEG_AC_BASIS.items():
        assert u1 >= 1 and v1 >= 1 and u2 >= 1 and v2 >= 1
        for i in range(_N_JPEG_AC):
            base, a1, a2 = _jpeg_ac_block_coeffs(i, plane, 0, 0)
            assert a1 >= 2 and a2 >= 2  # both AC coeffs nonzero (4*a)
    z1 = inv[_JPEG_AC_BASIS["cr"][0][0] + 8 * _JPEG_AC_BASIS["cr"][0][1]]
    z2 = inv[_JPEG_AC_BASIS["cr"][1][0] + 8 * _JPEG_AC_BASIS["cr"][1][1]]
    assert abs(z2 - z1) > 16, (z1, z2)  # guarantees a ZRL run


def test_jpeg_ac_engine_decoder_matches_reference_pixel_exact():
    """decode_jpeg (Huffman-AC + matrix IDCT + upsample + YCbCr) must
    reproduce the independent explicit-loop reference reconstruction
    EXACTLY on every fixture — this is the assertion that puts the AC
    half of the decoder under a pinned, independently-derived truth."""
    from dblab_ece_trino_spark.operators.multimodal import (
        _N_JPEG_AC,
        _jpeg_ac_params,
        _jpeg_ac_plane_fn,
        decode_jpeg,
        encode_jpeg,
    )
    from scripts.gen_jpeg_ac_expected import reference_decode

    for i in range(_N_JPEG_AC):
        p = _jpeg_ac_params(i)
        payload = encode_jpeg(
            p["w"], p["h"],
            _jpeg_ac_plane_fn(i, "y"),
            _jpeg_ac_plane_fn(i, "cb"),
            _jpeg_ac_plane_fn(i, "cr"),
            subsample=p["sub"], q_dc=p["q_dc"], restart_interval=p["ri"],
        )
        w, h, arr = decode_jpeg(payload)
        rw, rh, rgb = reference_decode(i)
        assert (w, h) == (rw, rh)
        ref = np.array(rgb, dtype=np.uint8)
        mism = np.argwhere(arr != ref)
        assert mism.size == 0, (
            f"clip {i}: {len(mism)} mismatching samples, first at "
            f"{mism[:3].tolist()}"
        )


def test_jpeg_ac_expected_constants_rederive():
    from dblab_ece_trino_spark.operators.multimodal import _JPEG_AC_EXPECTED
    from scripts.gen_jpeg_ac_expected import expected_rows

    assert expected_rows() == _JPEG_AC_EXPECTED


# ------------------------------------------------- sequence packing


def test_sequence_pack_oracle_matches_pure_python():
    """The DuckDB oracle for llm_sequence_pack vs an independent
    pure-Python packer (hashlib md5 order, manual prefix sums, manual
    window overlap arithmetic) on the sf0.001 corpus — pins the SQL
    itself, complementing the Spark-vs-oracle parity gate at sf0.01."""
    import hashlib
    import re

    import duckdb

    from dblab_ece_trino_spark.operators.registry import oracle_queries

    con = duckdb.connect()
    docs = con.execute(
        "SELECT doc_id, text FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchall()

    CTX = 512
    rows = []
    for doc_id, text in docs:
        tok = len(re.split(r"\s+", text.strip()))
        if tok > 0:
            h = hashlib.md5(f"pack-v1{doc_id}".encode()).hexdigest()
            rows.append((h, doc_id, tok))
    rows.sort()
    chunks: dict = {}
    goff = 0
    for h, doc_id, tok in rows:
        for cid in range(goff // CTX, (goff + tok - 1) // CTX + 1):
            lo = max(cid * CTX, goff)
            hi = min((cid + 1) * CTX, goff + tok)
            c = chunks.setdefault(cid, [0, 0, 0, (goff, doc_id)])
            c[0] += 1
            c[1] += 1 if goff // CTX == cid else 0
            c[2] += hi - lo
            c[3] = min(c[3], (goff, doc_id))
        goff += tok
    expected = {
        cid: (c[0], c[1], c[2], c[3][1]) for cid, c in chunks.items()
    }

    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    got = {
        int(r[0]): (int(r[1]), int(r[2]), int(r[3]), int(r[4]))
        for r in con.execute(oracle_queries()["llm_sequence_pack"]).fetchall()
    }
    assert got == expected
    # structural sanity: every window but the last is exactly full, and
    # the packing covers the whole token stream
    last = max(expected)
    for cid, (_nd, _ns, filled, _fd) in expected.items():
        assert filled == CTX or cid == last
    assert sum(c[2] for c in expected.values()) == goff
