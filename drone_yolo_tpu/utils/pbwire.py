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
    """Encode a non-negative int as a protobuf base-128 varint."""
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
    """Decode a varint at `pos`; returns (value, next_pos). Raises ValueError
    on truncated or over-long (>10 byte / >64 bit) input."""
    result = shift = 0
    n = len(buf)
    while True:
        if pos >= n:
            raise ValueError("truncated message: varint runs past end of buffer")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("malformed message: varint exceeds 64 bits")


def key(field: int, wire: int) -> bytes:
    """Encode a field key varint: `field_number << 3 | wire_type`."""
    return encode_varint(field << 3 | wire)


def bytes_field(field: int, data: bytes) -> bytes:
    """Encode a length-delimited (LEN) field: key + length varint + payload."""
    return key(field, LEN) + encode_varint(len(data)) + data


def string_field(field: int, s: str) -> bytes:
    """Encode a UTF-8 string field; empty strings encode to nothing (proto3 default)."""
    return bytes_field(field, s.encode()) if s else b""


def packed_int64_field(field: int, values) -> bytes:
    """Encode a packed repeated int64 field (two's-complement varints)."""
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
            if pos + ln > n:
                raise ValueError(f"truncated message: LEN field {field} wants {ln} bytes, {n - pos} remain")
            v = buf[pos : pos + ln]
            pos += ln
        elif wire == I64:
            if pos + 8 > n:
                raise ValueError(f"truncated message: I64 field {field} past end of buffer")
            v = buf[pos : pos + 8]
            pos += 8
        elif wire == I32:
            if pos + 4 > n:
                raise ValueError(f"truncated message: I32 field {field} past end of buffer")
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
