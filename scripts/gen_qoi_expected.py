#!/usr/bin/env python3
"""Independent QOI reference decoder (anti-symmetry layer for
multimodal_qoi_decode — SURVEY §5 item 8: every codec pair needs a
hand vector or an independent reimplementation so complementary
encoder/decoder bugs cannot cancel through a round-trip test).

Written separately from operators/multimodal.decode_qoi, from the
qoiformat.org spec-1.0 text: dict-based color index, tuple pixels,
no numpy — returns (width, height, channels, [(r, g, b, a), ...]) in
raster order.
"""
from __future__ import annotations

import struct


def ref_decode(payload: bytes):
    if payload[0:4] != b"qoif":
        raise ValueError("bad magic")
    width = struct.unpack(">I", payload[4:8])[0]
    height = struct.unpack(">I", payload[8:12])[0]
    channels = payload[12]
    if payload[-8:] != b"\x00" * 7 + b"\x01":
        raise ValueError("bad end marker")
    body = memoryview(payload)[14:-8]
    pixels = []
    total = width * height
    seen: dict = {}
    px = (0, 0, 0, 255)
    i = 0
    while len(pixels) < total:
        if i >= len(body):
            raise ValueError("stream ran out")
        op = body[i]
        i += 1
        if op == 0xFE:
            px = (body[i], body[i + 1], body[i + 2], px[3])
            i += 3
        elif op == 0xFF:
            px = (body[i], body[i + 1], body[i + 2], body[i + 3])
            i += 4
        elif op >> 6 == 0b00:
            px = seen.get(op & 0x3F, (0, 0, 0, 0))
        elif op >> 6 == 0b01:
            px = (
                (px[0] + ((op >> 4) & 0x03) - 2) & 0xFF,
                (px[1] + ((op >> 2) & 0x03) - 2) & 0xFF,
                (px[2] + (op & 0x03) - 2) & 0xFF,
                px[3],
            )
        elif op >> 6 == 0b10:
            dg = (op & 0x3F) - 32
            nxt = body[i]
            i += 1
            px = (
                (px[0] + dg - 8 + ((nxt >> 4) & 0x0F)) & 0xFF,
                (px[1] + dg) & 0xFF,
                (px[2] + dg - 8 + (nxt & 0x0F)) & 0xFF,
                px[3],
            )
        else:  # run
            count = (op & 0x3F) + 1
            key = (px[0] * 3 + px[1] * 5 + px[2] * 7 + px[3] * 11) % 64
            seen[key] = px
            pixels.extend([px] * count)
            continue
        key = (px[0] * 3 + px[1] * 5 + px[2] * 7 + px[3] * 11) % 64
        seen[key] = px
        pixels.append(px)
    if i != len(body):
        raise ValueError("trailing bytes")
    if len(pixels) != total:
        raise ValueError("pixel count mismatch")
    return width, height, channels, pixels
