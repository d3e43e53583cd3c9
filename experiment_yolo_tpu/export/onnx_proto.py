"""Minimal self-contained ONNX protobuf writer/reader.

The environment ships neither ``onnx`` nor ``protobuf`` codegen for it, so
this module hand-encodes the protobuf wire format (varint / length-delimited
tag-value pairs) for exactly the ONNX message subset the exporter emits:
ModelProto, GraphProto, NodeProto, AttributeProto, TensorProto,
ValueInfoProto, TypeProto(.Tensor), TensorShapeProto, OperatorSetIdProto.

Field numbers follow the public onnx.proto schema (stable since IR v3); any
standard ONNX runtime parses the output. A matching structural decoder
(`parse_model`) backs the round-trip tests.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Sequence, Tuple, Union

import numpy as np

# --- ONNX TensorProto.DataType enum values ---
FLOAT, UINT8, INT8, INT32, INT64, BOOL, FLOAT16, DOUBLE, BFLOAT16 = 1, 2, 3, 6, 7, 9, 10, 11, 16

NP_TO_ONNX = {
    np.dtype(np.float32): FLOAT,
    np.dtype(np.uint8): UINT8,
    np.dtype(np.int8): INT8,
    np.dtype(np.int32): INT32,
    np.dtype(np.int64): INT64,
    np.dtype(np.bool_): BOOL,
    np.dtype(np.float16): FLOAT16,
    np.dtype(np.float64): DOUBLE,
}

# AttributeProto.AttributeType
A_FLOAT, A_INT, A_STRING, A_TENSOR, A_GRAPH, A_FLOATS, A_INTS, A_STRINGS = 1, 2, 3, 4, 5, 6, 7, 8


# ---------------------------------------------------------------------------
# wire-format primitives
# ---------------------------------------------------------------------------

def _varint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64  # two's complement for negative int64
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _f_varint(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v)


def _f_bytes(field: int, b: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(b)) + b


def _f_str(field: int, s: str) -> bytes:
    return _f_bytes(field, s.encode("utf-8"))


def _f_float(field: int, v: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", v)


# ---------------------------------------------------------------------------
# message builders
# ---------------------------------------------------------------------------

def tensor(name: str, arr: np.ndarray) -> bytes:
    """TensorProto: dims=1, data_type=2, name=8, raw_data=9."""
    arr = np.ascontiguousarray(arr)
    if arr.dtype not in NP_TO_ONNX:
        raise TypeError(f"unsupported tensor dtype {arr.dtype}")
    out = b""
    for d in arr.shape:
        out += _f_varint(1, int(d))
    out += _f_varint(2, NP_TO_ONNX[arr.dtype])
    out += _f_str(8, name)
    out += _f_bytes(9, arr.tobytes())
    return out


def _tensor_shape(dims: Sequence[Union[int, str]]) -> bytes:
    out = b""
    for d in dims:
        if isinstance(d, str):
            dim = _f_str(2, d)  # dim_param
        else:
            dim = _f_varint(1, int(d))  # dim_value
        out += _f_bytes(1, dim)
    return out


def value_info(name: str, elem_type: int, dims: Sequence[Union[int, str]]) -> bytes:
    """ValueInfoProto: name=1, type=2{tensor_type=1{elem_type=1, shape=2}}."""
    tt = _f_varint(1, elem_type) + _f_bytes(2, _tensor_shape(dims))
    tp = _f_bytes(1, tt)
    return _f_str(1, name) + _f_bytes(2, tp)


def attribute(name: str, value) -> bytes:
    """AttributeProto with the type inferred from the python value."""
    out = _f_str(1, name)
    if isinstance(value, bool):
        out += _f_varint(3, int(value)) + _f_varint(20, A_INT)
    elif isinstance(value, int):
        out += _f_varint(3, value) + _f_varint(20, A_INT)
    elif isinstance(value, float):
        out += _f_float(2, value) + _f_varint(20, A_FLOAT)
    elif isinstance(value, str):
        out += _f_bytes(4, value.encode()) + _f_varint(20, A_STRING)
    elif isinstance(value, bytes):
        out += _f_bytes(4, value) + _f_varint(20, A_STRING)
    elif isinstance(value, np.ndarray):
        out += _f_bytes(5, tensor(name + "_t", value)) + _f_varint(20, A_TENSOR)
    elif isinstance(value, (list, tuple)):
        if all(isinstance(v, int) for v in value):
            for v in value:
                out += _f_varint(8, v)
            out += _f_varint(20, A_INTS)
        elif all(isinstance(v, float) for v in value):
            for v in value:
                out += _f_float(7, v)
            out += _f_varint(20, A_FLOATS)
        else:
            raise TypeError(f"mixed attribute list for {name}: {value}")
    else:
        raise TypeError(f"unsupported attribute {name}={value!r}")
    return out


def node(op_type: str, inputs: Sequence[str], outputs: Sequence[str],
         name: str = "", **attrs) -> bytes:
    """NodeProto: input=1, output=2, name=3, op_type=4, attribute=5."""
    out = b""
    for i in inputs:
        out += _f_str(1, i)
    for o in outputs:
        out += _f_str(2, o)
    if name:
        out += _f_str(3, name)
    out += _f_str(4, op_type)
    for k, v in attrs.items():
        out += _f_bytes(5, attribute(k, v))
    return out


def graph(name: str, nodes: Sequence[bytes], inputs: Sequence[bytes],
          outputs: Sequence[bytes], initializers: Sequence[bytes]) -> bytes:
    """GraphProto: node=1, name=2, initializer=5, input=11, output=12."""
    out = b""
    for n in nodes:
        out += _f_bytes(1, n)
    out += _f_str(2, name)
    for t in initializers:
        out += _f_bytes(5, t)
    for i in inputs:
        out += _f_bytes(11, i)
    for o in outputs:
        out += _f_bytes(12, o)
    return out


def model(graph_bytes: bytes, opset: int = 17, producer: str = "experiment-yolo-tpu",
          ir_version: int = 8, doc: str = "") -> bytes:
    """ModelProto: ir_version=1, producer_name=2, graph=7, opset_import=8."""
    ops = _f_str(1, "") + _f_varint(2, opset)
    out = _f_varint(1, ir_version)
    out += _f_str(2, producer)
    if doc:
        out += _f_str(6, doc)
    out += _f_bytes(7, graph_bytes)
    out += _f_bytes(8, ops)
    return out


# ---------------------------------------------------------------------------
# structural decoder (for round-trip tests)
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    shift = v = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7


def _fields(buf: bytes) -> List[Tuple[int, int, object]]:
    """Decode a message into (field_number, wire_type, value) triples."""
    out = []
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wire == 5:
            v = struct.unpack("<f", buf[i : i + 4])[0]
            i += 4
        elif wire == 1:
            v = struct.unpack("<d", buf[i : i + 8])[0]
            i += 8
        else:
            raise ValueError(f"wire type {wire}")
        out.append((field, wire, v))
    return out


def parse_model(buf: bytes) -> Dict:
    """Parse a serialized ModelProto into nested dicts (structural subset)."""
    out = {"opset": None, "producer": None, "graph": None, "doc": ""}
    for field, _w, v in _fields(buf):
        if field == 1:
            out["ir_version"] = v
        elif field == 2:
            out["producer"] = v.decode()
        elif field == 6:
            out["doc"] = v.decode()
        elif field == 7:
            out["graph"] = _parse_graph(v)
        elif field == 8:
            for f2, _w2, v2 in _fields(v):
                if f2 == 2:
                    out["opset"] = v2
    return out


def _parse_graph(buf: bytes) -> Dict:
    g = {"nodes": [], "inputs": [], "outputs": [], "initializers": {}, "name": ""}
    for field, _w, v in _fields(buf):
        if field == 1:
            g["nodes"].append(_parse_node(v))
        elif field == 2:
            g["name"] = v.decode()
        elif field == 5:
            t = _parse_tensor(v)
            g["initializers"][t["name"]] = t
        elif field == 11:
            g["inputs"].append(_parse_value_info(v))
        elif field == 12:
            g["outputs"].append(_parse_value_info(v))
    return g


def _parse_node(buf: bytes) -> Dict:
    n = {"inputs": [], "outputs": [], "op_type": "", "name": "", "attrs": {}}
    for field, _w, v in _fields(buf):
        if field == 1:
            n["inputs"].append(v.decode())
        elif field == 2:
            n["outputs"].append(v.decode())
        elif field == 3:
            n["name"] = v.decode()
        elif field == 4:
            n["op_type"] = v.decode()
        elif field == 5:
            a = _parse_attr(v)
            n["attrs"][a[0]] = a[1]
    return n


def _signed(v):
    """Two's-complement varint -> signed int64 (negative attrs like axis=-1)."""
    return v - (1 << 64) if isinstance(v, int) and v >= 1 << 63 else v


def _parse_attr(buf: bytes):
    name, ints, floats, val = "", [], [], None
    for field, wire, v in _fields(buf):
        if field == 1:
            name = v.decode()
        elif field == 2:
            val = v
        elif field == 3:
            val = _signed(v) if val is None else val
        elif field == 4:
            val = v.decode() if isinstance(v, bytes) else v
        elif field == 5:
            val = _parse_tensor(v)
        elif field == 7:
            floats.append(v)
        elif field == 8:
            ints.append(_signed(v))
    if ints:
        val = ints
    elif floats:
        val = floats
    return name, val


ONNX_TO_NP = {v: k for k, v in NP_TO_ONNX.items()}


def _parse_tensor(buf: bytes) -> Dict:
    t = {"name": "", "dims": [], "data_type": None, "array": None}
    raw = None
    for field, _w, v in _fields(buf):
        if field == 1:
            t["dims"].append(v)
        elif field == 2:
            t["data_type"] = v
        elif field == 8:
            t["name"] = v.decode()
        elif field == 9:
            raw = v
    if raw is not None and t["data_type"] in ONNX_TO_NP:
        t["array"] = np.frombuffer(raw, dtype=ONNX_TO_NP[t["data_type"]]).reshape(t["dims"])
    return t


def _parse_value_info(buf: bytes) -> Dict:
    vi = {"name": "", "elem_type": None, "dims": []}
    for field, _w, v in _fields(buf):
        if field == 1:
            vi["name"] = v.decode()
        elif field == 2:
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:  # tensor_type
                    for f3, _w3, v3 in _fields(v2):
                        if f3 == 1:
                            vi["elem_type"] = v3
                        elif f3 == 2:
                            for f4, _w4, v4 in _fields(v3):
                                if f4 == 1:
                                    for f5, _w5, v5 in _fields(v4):
                                        if f5 == 1:
                                            vi["dims"].append(v5)
                                        elif f5 == 2:
                                            vi["dims"].append(v5.decode())
    return vi
