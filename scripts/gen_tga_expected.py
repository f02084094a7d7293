#!/usr/bin/env python3
"""Independent TGA reference decoder (spec re-implementation).

Deliberately shares NO code with operators/multimodal.py: pure-Python
byte walking (no numpy), pixel-list output, its own header parse and
RLE loop — the anti-symmetry layer that catches an engine encoder and
decoder agreeing on the wrong bytes (the QOI/G.711 discipline).
Run directly to print per-fixture channel sums.
"""

from __future__ import annotations

import struct
import sys

FOOTER = b"\x00" * 8 + b"TRUEVISION-XFILE.\x00"


def ref_decode(payload: bytes):
    """Returns (w, h, channels, pixels) with pixels a top-down
    row-major list of (r, g, b[, a]) tuples."""
    hdr = struct.unpack("<BBBHHBHHHHBB", payload[:18])
    (idlen, cmap, itype, _f, _l, _b, _x0, _y0, w, h, bpp, desc) = hdr
    assert cmap == 0 and itype in (2, 10) and bpp in (24, 32)
    ch = bpp // 8
    body = payload[:-len(FOOTER)] if payload.endswith(FOOTER) else payload
    pos = 18 + idlen
    px = []
    if itype == 2:
        for _ in range(w * h):
            px.append(tuple(body[pos : pos + ch]))
            pos += ch
    else:
        while len(px) < w * h:
            p = body[pos]
            pos += 1
            count = (p & 0x7F) + 1
            if p & 0x80:
                val = tuple(body[pos : pos + ch])
                pos += ch
                px.extend([val] * count)
            else:
                for _ in range(count):
                    px.append(tuple(body[pos : pos + ch]))
                    pos += ch
    assert pos == len(body), "trailing bytes"
    # BGR(A) -> RGB(A)
    px = [(p[2], p[1], p[0]) + p[3:] for p in px]
    rows = [px[r * w : (r + 1) * w] for r in range(h)]
    if not desc & 0x20:
        rows = rows[::-1]
    return w, h, ch, [p for row in rows for p in row]


def main() -> None:
    sys.path.insert(0, ".")
    from dblab_ece_trino_spark.operators.multimodal import (
        _TGA_PARAMS,
        encode_tga,
    )
    import numpy as np

    for i, (w, h, ch, rle, td) in enumerate(_TGA_PARAMS):
        yy, xx = np.mgrid[0:h, 0:w]
        band = (4 * xx) // w
        img = np.empty((h, w, ch), dtype=np.uint8)
        for c in range(min(ch, 3)):
            v = np.select(
                [band == 0, band == 1, band == 2],
                [
                    np.full((h, w), (23 * i + 9 * c) % 256),
                    (xx % 2) * 90 + 14 * c + 5 * i,
                    2 * xx + 3 * yy + 17 * c + 8 * i,
                ],
                default=7 * xx + 31 * c + 13 * i,
            )
            img[:, :, c] = (v % 256).astype(np.uint8)
        if ch == 4:
            img[:, :, 3] = ((9 * xx + 5 * yy + 3 * i) % 256).astype(np.uint8)
        rw, rh, rch, pix = ref_decode(encode_tga(img, rle=rle, topdown=td))
        sums = [sum(p[c] for p in pix) for c in range(rch)]
        print(i, rw, rh, rch, sums)


if __name__ == "__main__":
    main()
