"""Minimal protobuf wire-format codec for the KServe-v2 gRPC inference protocol.

The gRPC flavor of the open inference protocol (the transport Triton calls
"grpc", reference `ultralytics/utils/triton.py:9-47` via tritonclient) is a
handful of small messages: ModelMetadataRequest/Response and
ModelInferRequest/Response. Rather than vendoring generated *_pb2 stubs for a
whole .proto tree, this encodes/decodes exactly the fields the client uses with
the (public, stable) protobuf wire rules: varint keys `field<<3|wire`,
length-delimited submessages, packed int64 shapes. Unknown fields are skipped,
so servers may send richer messages than we read.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

# wire types
VARINT, I64, LEN, I32 = 0, 1, 2, 5


def encode_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def key(field: int, wire: int) -> bytes:
    return encode_varint(field << 3 | wire)


def bytes_field(field: int, data: bytes) -> bytes:
    return key(field, LEN) + encode_varint(len(data)) + data


def string_field(field: int, s: str) -> bytes:
    return bytes_field(field, s.encode()) if s else b""


def packed_int64_field(field: int, values) -> bytes:
    payload = b"".join(encode_varint(v & 0xFFFFFFFFFFFFFFFF) for v in values)
    return bytes_field(field, payload) if values else b""


def fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Iterate (field_number, wire_type, value). LEN values are bytes; VARINT
    values are ints; I32/I64 raw bytes. Unknown wire types raise."""
    pos, n = 0, len(buf)
    while pos < n:
        k, pos = decode_varint(buf, pos)
        field, wire = k >> 3, k & 7
        if wire == VARINT:
            v, pos = decode_varint(buf, pos)
        elif wire == LEN:
            ln, pos = decode_varint(buf, pos)
            v = buf[pos : pos + ln]
            pos += ln
        elif wire == I64:
            v = buf[pos : pos + 8]
            pos += 8
        elif wire == I32:
            v = buf[pos : pos + 4]
            pos += 4
        else:  # wire 3/4 (groups) are not used by proto3
            raise ValueError(f"unsupported wire type {wire} for field {field}")
        yield field, wire, v


def unpack_int64(payload: bytes) -> List[int]:
    """Packed repeated int64 payload -> list (two's-complement for negatives)."""
    out, pos = [], 0
    while pos < len(payload):
        v, pos = decode_varint(payload, pos)
        out.append(v - (1 << 64) if v >= 1 << 63 else v)
    return out
