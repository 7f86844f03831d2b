"""Mapbox Vector Tiles — clean-room encoder/decoder (public spec,
https://github.com/mapbox/vector-tile-spec 2.1: protobuf wire format,
zigzag-delta geometry command streams, layer extent quantization).

The modern web-map output format next to the PNG renderer
(render.py): a tile server would serve these bytes directly. Only the
subset the engine emits is implemented — POINT and LINESTRING
features with integer ids over named layers at extent 4096, codec
null protobuf (no required external libs; the writer IS the spec's
wire bytes).

Everything is driven by integer arithmetic: tile-local coordinates
are quantized as (u - tile_u0) * extent // tile_units — exact floor
division on lattice units, so the round trip is bit-checkable by a
SQL oracle (queries.q_mvt_roundtrip).
"""

from __future__ import annotations

import numpy as np

EXTENT = 4096

_MOVETO, _LINETO, _CLOSEPATH = 1, 2, 7


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    n = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def _zz32(n: int) -> int:
    return (n << 1) ^ (n >> 31)


def _unzz(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _field(num: int, wire: int) -> bytes:
    return _uvarint((num << 3) | wire)


def _len_delim(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _uvarint(len(payload)) + payload


def _packed(nums) -> bytes:
    out = bytearray()
    for n in nums:
        out += _uvarint(int(n))
    return bytes(out)


def encode_point_feature(fid: int, qx: int, qy: int) -> bytes:
    geom = _packed([(_MOVETO | (1 << 3)), _zz32(qx), _zz32(qy)])
    body = (_field(1, 0) + _uvarint(fid)
            + _field(3, 0) + _uvarint(1)          # type POINT
            + _len_delim(4, geom))
    return body


def encode_line_feature(fid: int, qxs: np.ndarray,
                        qys: np.ndarray) -> bytes:
    cmds = [(_MOVETO | (1 << 3)), _zz32(int(qxs[0])), _zz32(int(qys[0]))]
    n = len(qxs)
    if n > 1:
        cmds.append(_LINETO | ((n - 1) << 3))
        px, py = int(qxs[0]), int(qys[0])
        for i in range(1, n):
            cmds += [_zz32(int(qxs[i]) - px), _zz32(int(qys[i]) - py)]
            px, py = int(qxs[i]), int(qys[i])
    body = (_field(1, 0) + _uvarint(fid)
            + _field(3, 0) + _uvarint(2)          # type LINESTRING
            + _len_delim(4, _packed(cmds)))
    return body


def encode_layer(name: str, features: list[bytes],
                 extent: int = EXTENT) -> bytes:
    body = bytearray()
    body += _field(15, 0) + _uvarint(2)           # version 2
    body += _len_delim(1, name.encode())
    for f in features:
        body += _len_delim(2, f)
    body += _field(5, 0) + _uvarint(extent)
    return bytes(body)


def encode_tile(layers: list[bytes]) -> bytes:
    out = bytearray()
    for lay in layers:
        out += _len_delim(3, lay)
    return bytes(out)


def decode_tile(data: bytes) -> list[dict]:
    """Tile bytes → [{name, extent, features: [(fid, type,
    [(x, y), ...])]}] — enough to round-trip what the encoder emits
    (unknown fields are skipped per protobuf rules)."""
    buf = memoryview(data)
    layers = []
    pos = 0
    while pos < len(buf):
        key, pos = _read_uvarint(buf, pos)
        num, wire = key >> 3, key & 7
        if num == 3 and wire == 2:
            ln, pos = _read_uvarint(buf, pos)
            layers.append(_decode_layer(buf[pos:pos + ln]))
            pos += ln
        else:
            pos = _skip(buf, pos, wire)
    return layers


def _skip(buf: memoryview, pos: int, wire: int) -> int:
    if wire == 0:
        _, pos = _read_uvarint(buf, pos)
        return pos
    if wire == 2:
        ln, pos = _read_uvarint(buf, pos)
        return pos + ln
    if wire == 5:
        return pos + 4
    if wire == 1:
        return pos + 8
    raise ValueError(f"unsupported wire type {wire}")


def _decode_layer(buf: memoryview) -> dict:
    name = ""
    extent = EXTENT
    feats = []
    pos = 0
    while pos < len(buf):
        key, pos = _read_uvarint(buf, pos)
        num, wire = key >> 3, key & 7
        if num == 1 and wire == 2:
            ln, pos = _read_uvarint(buf, pos)
            name = bytes(buf[pos:pos + ln]).decode()
            pos += ln
        elif num == 2 and wire == 2:
            ln, pos = _read_uvarint(buf, pos)
            feats.append(_decode_feature(buf[pos:pos + ln]))
            pos += ln
        elif num == 5 and wire == 0:
            extent, pos = _read_uvarint(buf, pos)
        else:
            pos = _skip(buf, pos, wire)
    return {"name": name, "extent": extent, "features": feats}


def _decode_feature(buf: memoryview) -> tuple:
    fid = 0
    gtype = 0
    coords: list[tuple[int, int]] = []
    pos = 0
    while pos < len(buf):
        key, pos = _read_uvarint(buf, pos)
        num, wire = key >> 3, key & 7
        if num == 1 and wire == 0:
            fid, pos = _read_uvarint(buf, pos)
        elif num == 3 and wire == 0:
            gtype, pos = _read_uvarint(buf, pos)
        elif num == 4 and wire == 2:
            ln, pos = _read_uvarint(buf, pos)
            end = pos + ln
            x = y = 0
            while pos < end:
                cmd, pos = _read_uvarint(buf, pos)
                cid, cnt = cmd & 7, cmd >> 3
                if cid in (_MOVETO, _LINETO):
                    for _ in range(cnt):
                        dx, pos = _read_uvarint(buf, pos)
                        dy, pos = _read_uvarint(buf, pos)
                        x += _unzz(dx)
                        y += _unzz(dy)
                        coords.append((x, y))
                elif cid == _CLOSEPATH:
                    pass
                else:
                    raise ValueError(f"unknown geometry command {cid}")
        else:
            pos = _skip(buf, pos, wire)
    return fid, gtype, coords
