"""Generate pinned expected statistics for multimodal_jpeg_ac_decode —
with an INDEPENDENT explicit-loop reference pipeline.

The fixture family puts exact DCT-basis content in every block, so the
quantized coefficients are known integers in closed form.  This script:

1. re-verifies the closed form against an explicit O(64^2) double-loop
   FDCT of the fixture plane (no reuse of the engine's DCT matrix);
2. reconstructs each plane with an explicit double-loop IDCT
   (T.81 A.3.3 written out literally), floor(x+0.5), [0,255] clamp;
3. asserts every pre-floor sample sits > 1e-6 from a .5 boundary (the
   floor(+0.5) rule is only platform-free away from exact halves);
4. box-replicates chroma at 4:2:0, applies the JFIF YCbCr->RGB
   formulas, and prints per-image channel / weighted sums.

Nothing here imports the engine's decode path; the only shared code is
the fixture DEFINITION (params + coefficient closed form), which is the
object being fixed.  tests/test_round9_ops.py re-runs this pipeline and
asserts decode_jpeg agrees pixel-exactly.

Run: PYTHONPATH=. python3 scripts/gen_jpeg_ac_expected.py
"""
from __future__ import annotations

import math


def _cos(t: int, u: int) -> float:
    return math.cos((2 * t + 1) * u * math.pi / 16.0)


def _cu(u: int) -> float:
    return (1.0 / math.sqrt(2.0)) if u == 0 else 1.0


def explicit_fdct(block) -> list:
    """T.81 A.3.3 forward DCT, written as the literal quadruple loop."""
    out = [[0.0] * 8 for _ in range(8)]
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += block[y][x] * _cos(x, u) * _cos(y, v)
            out[v][u] = 0.25 * _cu(u) * _cu(v) * s
    return out


def explicit_idct(coef) -> list:
    """T.81 A.3.3 inverse DCT, literal quadruple loop (coef[v][u])."""
    out = [[0.0] * 8 for _ in range(8)]
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += _cu(u) * _cu(v) * coef[v][u] * _cos(x, u) * _cos(y, v)
            out[y][x] = 0.25 * s
    return out


def reference_plane(i: int, plane: str, pw: int, ph: int) -> list:
    """Reconstruct one plane (pw x ph, multiples of 8) from the KNOWN
    quantized coefficients via the explicit IDCT."""
    from dblab_ece_trino_spark.operators.multimodal import (
        _JPEG_AC_BASIS,
        _jpeg_ac_block_coeffs,
        _jpeg_ac_params,
        _jpeg_ac_plane_fn,
    )

    p = _jpeg_ac_params(i)
    (u1, v1), (u2, v2) = _JPEG_AC_BASIS[plane]
    fn = _jpeg_ac_plane_fn(i, plane)
    out = [[0] * pw for _ in range(ph)]
    for by in range(ph // 8):
        for bx in range(pw // 8):
            base, a1, a2 = _jpeg_ac_block_coeffs(i, plane, bx, by)
            # closed-form coefficients: DC = 8*(base-128) (exactly
            # divisible by q_dc in {1,2,4}); basis terms -> 4*amp
            dc = 8 * (base - 128)
            assert dc % p["q_dc"] == 0, (i, plane, bx, by)
            coef = [[0.0] * 8 for _ in range(8)]
            coef[v1][u1] = 4.0 * a1
            coef[v2][u2] = 4.0 * a2
            coef[0][0] = float(dc)
            # cross-check the closed form against the explicit FDCT of
            # the actual fixture samples (round like the encoder does)
            block = [
                [fn(bx * 8 + x, by * 8 + y) - 128.0 for x in range(8)]
                for y in range(8)
            ]
            f = explicit_fdct(block)
            for v in range(8):
                for u in range(8):
                    q = p["q_dc"] if (u, v) == (0, 0) else 1
                    got = round(f[v][u] / q) * q
                    want = coef[v][u]
                    assert abs(f[v][u] - want) < 0.25, (i, plane, u, v)
                    assert got == want, (i, plane, u, v, got, want)
            rec = explicit_idct(coef)
            for y in range(8):
                for x in range(8):
                    s = rec[y][x] + 128.0
                    # floor(s + 0.5) is only platform-free away from
                    # exact halves: s + 0.5 must not sit on an integer
                    d = abs((s + 0.5) - round(s + 0.5))
                    assert d > 1e-6, ("half-boundary sample", i, plane, s)
                    out[by * 8 + y][bx * 8 + x] = min(
                        255, max(0, math.floor(s + 0.5))
                    )
    return out


def reference_decode(i: int):
    """(width, height, rgb rows) for fixture i, fully independent of
    the engine decoder."""
    from dblab_ece_trino_spark.operators.multimodal import _jpeg_ac_params

    p = _jpeg_ac_params(i)
    w, h, sub = p["w"], p["h"], p["sub"]
    s = 2 if sub else 1
    yp = reference_plane(i, "y", w, h)
    cbp = reference_plane(i, "cb", w // s, h // s)
    crp = reference_plane(i, "cr", w // s, h // s)
    rgb = [[None] * w for _ in range(h)]
    for y in range(h):
        for x in range(w):
            yy = float(yp[y][x])
            cb = float(cbp[y // s][x // s])
            cr = float(crp[y // s][x // s])
            r = yy + 1.402 * (cr - 128.0)
            g = yy - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
            b = yy + 1.772 * (cb - 128.0)
            rgb[y][x] = tuple(
                min(255, max(0, math.floor(v + 0.5))) for v in (r, g, b)
            )
    return w, h, rgb


def expected_rows() -> list:
    from dblab_ece_trino_spark.operators.multimodal import (
        _N_JPEG_AC,
        _jpeg_ac_params,
    )

    rows = []
    for i in range(_N_JPEG_AC):
        p = _jpeg_ac_params(i)
        w, h, rgb = reference_decode(i)
        sum_r = sum(px[0] for row in rgb for px in row)
        sum_g = sum(px[1] for row in rgb for px in row)
        sum_b = sum(px[2] for row in rgb for px in row)
        ysum_g = sum(y * px[1] for y, row in enumerate(rgb) for px in row)
        xsum_b = sum(x * px[2] for row in rgb for x, px in enumerate(row))
        rows.append(
            (i, w, h, int(p["sub"]), p["q_dc"],
             sum_r, sum_g, sum_b, ysum_g, xsum_b)
        )
    return rows


if __name__ == "__main__":
    print("_JPEG_AC_EXPECTED = [")
    for r in expected_rows():
        print(f"    {r},")
    print("]")
