// Standalone C++ ONNX consumer for models exported by experiment_yolo_tpu
// (model.export("onnx")) — the native-code counterpart of the reference's
// examples/YOLOv8-ONNXRuntime-CPP and YOLOv8-CPP-Inference demos.
//
// Zero dependencies: parses the ONNX protobuf wire format directly and
// executes the op subset the framework's exporter emits (the same subset
// covered by experiment_yolo_tpu/export/onnx_runtime_np.py — this file is
// its independent C++ twin). Includes PPM image loading, letterbox
// preprocessing, and class-aware NMS postprocessing: everything a
// deployment consumer needs, in one file.
//
// Build:   g++ -O2 -std=c++17 -o onnx_infer onnx_infer.cpp
// Usage:   ./onnx_infer model.onnx image.ppm [--conf 0.25] [--iou 0.7]
//          ./onnx_infer model.onnx --rand 0 [--dump out.bin]
//          ./onnx_infer model.onnx --raw input.bin [--dump out.bin]
//
// --raw feeds the graph input from a raw byte file (row-major uint8, the
// exact input tensor); --dump writes every graph output as float32 for
// cross-checking against the Python interpreter (tests/test_examples_cpp.py).

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <functional>
#include <map>
#include <numeric>
#include <stdexcept>
#include <string>
#include <vector>

// ---------------------------------------------------------------------------
// protobuf wire format
// ---------------------------------------------------------------------------

struct Cursor {
  const uint8_t* p;
  const uint8_t* end;
};

static uint64_t read_varint(Cursor& c) {
  uint64_t v = 0;
  int shift = 0;
  while (c.p < c.end) {
    uint8_t b = *c.p++;
    v |= uint64_t(b & 0x7F) << shift;
    if (!(b & 0x80)) return v;
    shift += 7;
  }
  throw std::runtime_error("truncated varint");
}

struct Field {
  int num;
  int wire;
  uint64_t v = 0;           // wire 0
  const uint8_t* data = nullptr;  // wire 2
  size_t len = 0;
  float f32 = 0;            // wire 5
  double f64 = 0;           // wire 1
};

// iterate all fields of a length-delimited message
template <class F>
static void for_fields(const uint8_t* buf, size_t len, F cb) {
  Cursor c{buf, buf + len};
  while (c.p < c.end) {
    uint64_t tag = read_varint(c);
    Field f;
    f.num = int(tag >> 3);
    f.wire = int(tag & 7);
    switch (f.wire) {
      case 0:
        f.v = read_varint(c);
        break;
      case 2: {
        uint64_t n = read_varint(c);
        if (n > uint64_t(c.end - c.p)) throw std::runtime_error("truncated length-delimited field");
        f.data = c.p;
        f.len = size_t(n);
        c.p += n;
        break;
      }
      case 5:
        if (c.end - c.p < 4) throw std::runtime_error("truncated fixed32 field");
        std::memcpy(&f.f32, c.p, 4);
        c.p += 4;
        break;
      case 1:
        if (c.end - c.p < 8) throw std::runtime_error("truncated fixed64 field");
        std::memcpy(&f.f64, c.p, 8);
        c.p += 8;
        break;
      default:
        throw std::runtime_error("unsupported wire type " + std::to_string(f.wire));
    }
    cb(f);
  }
}

// ---------------------------------------------------------------------------
// tensors
// ---------------------------------------------------------------------------

// ONNX TensorProto.DataType values used by the exporter
enum OnnxDT { O_FLOAT = 1, O_UINT8 = 2, O_INT8 = 3, O_INT32 = 6, O_INT64 = 7,
              O_BOOL = 9, O_FLOAT16 = 10, O_DOUBLE = 11 };

enum DT { F32, I64, U8, B8 };

struct Tensor {
  DT dt = F32;
  std::vector<int64_t> shape;
  std::vector<float> f;
  std::vector<int64_t> i;
  std::vector<uint8_t> u;  // U8 and B8 storage

  int64_t numel() const {
    int64_t n = 1;
    for (auto d : shape) n *= d;
    return n;
  }
  void alloc() {
    int64_t n = numel();
    if (dt == F32) f.assign(size_t(n), 0.f);
    else if (dt == I64) i.assign(size_t(n), 0);
    else u.assign(size_t(n), 0);
  }
  double get(int64_t k) const {
    if (dt == F32) return f[size_t(k)];
    if (dt == I64) return double(i[size_t(k)]);
    return double(u[size_t(k)]);
  }
  int64_t geti(int64_t k) const {
    if (dt == I64) return i[size_t(k)];
    if (dt == F32) return int64_t(f[size_t(k)]);
    return int64_t(u[size_t(k)]);
  }
  void set(int64_t k, double v) {
    if (dt == F32) f[size_t(k)] = float(v);
    else if (dt == I64) i[size_t(k)] = int64_t(v);
    else if (dt == B8) u[size_t(k)] = (v != 0.0) ? 1 : 0;
    else u[size_t(k)] = uint8_t(v);
  }
};

static float half_to_float(uint16_t h) {
  uint32_t sign = uint32_t(h >> 15) << 31;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t man = h & 0x3FF;
  uint32_t bits;
  if (exp == 0) {
    if (!man) bits = sign;
    else {  // subnormal
      exp = 127 - 15 + 1;
      while (!(man & 0x400)) { man <<= 1; exp--; }
      man &= 0x3FF;
      bits = sign | (exp << 23) | (man << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7F800000 | (man << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
  }
  float out;
  std::memcpy(&out, &bits, 4);
  return out;
}

// ---------------------------------------------------------------------------
// model structures
// ---------------------------------------------------------------------------

struct Attr {
  int64_t i = 0;
  float f = 0;
  std::string s;
  std::vector<int64_t> ints;
  bool present = false;
};

struct Node {
  std::string op, name;
  std::vector<std::string> inputs, outputs;
  std::map<std::string, Attr> attrs;
  int64_t attr_i(const std::string& k, int64_t dflt) const {
    auto it = attrs.find(k);
    return it == attrs.end() ? dflt : it->second.i;
  }
  std::vector<int64_t> attr_ints(const std::string& k, std::vector<int64_t> dflt) const {
    auto it = attrs.find(k);
    return it == attrs.end() ? dflt : it->second.ints;
  }
};

struct ValueInfo {
  std::string name;
  std::vector<int64_t> dims;
  int elem_type = 0;
};

struct Graph {
  std::vector<Node> nodes;
  std::map<std::string, Tensor> inits;
  std::vector<ValueInfo> inputs, outputs;
};

static Tensor parse_tensorproto(const uint8_t* buf, size_t len, std::string* name_out) {
  Tensor t;
  int onnx_dt = 0;
  const uint8_t* raw = nullptr;
  size_t rawlen = 0;
  for_fields(buf, len, [&](const Field& f) {
    if (f.num == 1 && f.wire == 0) t.shape.push_back(int64_t(f.v));
    else if (f.num == 2 && f.wire == 0) onnx_dt = int(f.v);
    else if (f.num == 8 && f.wire == 2 && name_out) name_out->assign((const char*)f.data, f.len);
    else if (f.num == 9 && f.wire == 2) { raw = f.data; rawlen = f.len; }
  });
  int64_t n = t.numel();
  static const int esize[] = {0, 4, 1, 1, 0, 0, 4, 8, 0, 1, 2, 8};
  int64_t need = (onnx_dt >= 1 && onnx_dt <= 11) ? n * esize[onnx_dt] : 0;
  if (raw == nullptr || int64_t(rawlen) < need)
    throw std::runtime_error("initializer raw_data shorter than dims imply");
  switch (onnx_dt) {
    case O_FLOAT:
      t.dt = F32; t.f.resize(size_t(n));
      std::memcpy(t.f.data(), raw, std::min(rawlen, size_t(n) * 4));
      break;
    case O_DOUBLE: {
      t.dt = F32; t.f.resize(size_t(n));
      for (int64_t k = 0; k < n; k++) { double d; std::memcpy(&d, raw + k * 8, 8); t.f[size_t(k)] = float(d); }
      break;
    }
    case O_FLOAT16: {
      t.dt = F32; t.f.resize(size_t(n));
      for (int64_t k = 0; k < n; k++) { uint16_t h; std::memcpy(&h, raw + k * 2, 2); t.f[size_t(k)] = half_to_float(h); }
      break;
    }
    case O_INT64:
      t.dt = I64; t.i.resize(size_t(n));
      std::memcpy(t.i.data(), raw, std::min(rawlen, size_t(n) * 8));
      break;
    case O_INT32: {
      t.dt = I64; t.i.resize(size_t(n));
      for (int64_t k = 0; k < n; k++) { int32_t v; std::memcpy(&v, raw + k * 4, 4); t.i[size_t(k)] = v; }
      break;
    }
    case O_INT8: {
      t.dt = I64; t.i.resize(size_t(n));
      for (int64_t k = 0; k < n; k++) t.i[size_t(k)] = int64_t(int8_t(raw[k]));
      break;
    }
    case O_UINT8:
      t.dt = U8; t.u.assign(raw, raw + n);
      break;
    case O_BOOL:
      t.dt = B8; t.u.assign(raw, raw + n);
      break;
    default:
      throw std::runtime_error("initializer dtype " + std::to_string(onnx_dt));
  }
  return t;
}

static Attr parse_attr(const uint8_t* buf, size_t len, std::string* name_out) {
  Attr a;
  a.present = true;
  for_fields(buf, len, [&](const Field& f) {
    if (f.num == 1 && f.wire == 2) name_out->assign((const char*)f.data, f.len);
    else if (f.num == 2 && f.wire == 5) a.f = f.f32;
    else if (f.num == 3 && f.wire == 0) a.i = int64_t(f.v);
    else if (f.num == 4 && f.wire == 2) a.s.assign((const char*)f.data, f.len);
    else if (f.num == 7 && f.wire == 5) a.ints.push_back(int64_t(f.f32));  // floats unused
    else if (f.num == 8 && f.wire == 0) a.ints.push_back(int64_t(f.v));
    else if (f.num == 8 && f.wire == 2) {
      // packed repeated ints (the proto3 default emitted by standard ONNX
      // serializers; dropping these silently would zero strides/pads/perm)
      Cursor c{f.data, f.data + f.len};
      while (c.p < c.end) a.ints.push_back(int64_t(read_varint(c)));
    }
  });
  return a;
}

static ValueInfo parse_value_info(const uint8_t* buf, size_t len) {
  ValueInfo vi;
  for_fields(buf, len, [&](const Field& f) {
    if (f.num == 1 && f.wire == 2) vi.name.assign((const char*)f.data, f.len);
    else if (f.num == 2 && f.wire == 2) {          // TypeProto
      for_fields(f.data, f.len, [&](const Field& f2) {
        if (f2.num == 1 && f2.wire == 2) {         // tensor_type
          for_fields(f2.data, f2.len, [&](const Field& f3) {
            if (f3.num == 1 && f3.wire == 0) vi.elem_type = int(f3.v);
            else if (f3.num == 2 && f3.wire == 2) {  // shape
              for_fields(f3.data, f3.len, [&](const Field& f4) {
                if (f4.num == 1 && f4.wire == 2) {   // dim
                  for_fields(f4.data, f4.len, [&](const Field& f5) {
                    if (f5.num == 1 && f5.wire == 0) vi.dims.push_back(int64_t(f5.v));
                  });
                }
              });
            }
          });
        }
      });
    }
  });
  return vi;
}

static Graph parse_model(const std::vector<uint8_t>& blob) {
  Graph g;
  for_fields(blob.data(), blob.size(), [&](const Field& f) {
    if (f.num != 7 || f.wire != 2) return;  // ModelProto.graph
    for_fields(f.data, f.len, [&](const Field& gf) {
      if (gf.num == 1 && gf.wire == 2) {  // node
        Node n;
        for_fields(gf.data, gf.len, [&](const Field& nf) {
          if (nf.num == 1) n.inputs.emplace_back((const char*)nf.data, nf.len);
          else if (nf.num == 2) n.outputs.emplace_back((const char*)nf.data, nf.len);
          else if (nf.num == 3) n.name.assign((const char*)nf.data, nf.len);
          else if (nf.num == 4) n.op.assign((const char*)nf.data, nf.len);
          else if (nf.num == 5) {
            std::string aname;
            Attr a = parse_attr(nf.data, nf.len, &aname);
            n.attrs[aname] = a;
          }
        });
        g.nodes.push_back(std::move(n));
      } else if (gf.num == 5 && gf.wire == 2) {  // initializer
        std::string name;
        Tensor t = parse_tensorproto(gf.data, gf.len, &name);
        g.inits[name] = std::move(t);
      } else if (gf.num == 11 && gf.wire == 2) {
        g.inputs.push_back(parse_value_info(gf.data, gf.len));
      } else if (gf.num == 12 && gf.wire == 2) {
        g.outputs.push_back(parse_value_info(gf.data, gf.len));
      }
    });
  });
  return g;
}

// ---------------------------------------------------------------------------
// broadcasting elementwise engine
// ---------------------------------------------------------------------------

static std::vector<int64_t> broadcast_shape(const std::vector<int64_t>& a,
                                            const std::vector<int64_t>& b) {
  size_t nd = std::max(a.size(), b.size());
  std::vector<int64_t> out(nd);
  for (size_t k = 0; k < nd; k++) {
    int64_t da = k < nd - a.size() ? 1 : a[k - (nd - a.size())];
    int64_t db = k < nd - b.size() ? 1 : b[k - (nd - b.size())];
    if (da != db && da != 1 && db != 1)
      throw std::runtime_error("broadcast mismatch");
    out[k] = std::max(da, db);
  }
  return out;
}

// element strides of `shape` aligned (right) to an out rank nd; 0 on size-1 dims
static std::vector<int64_t> aligned_strides(const std::vector<int64_t>& shape, size_t nd) {
  std::vector<int64_t> st(nd, 0);
  int64_t s = 1;
  for (size_t k = shape.size(); k-- > 0;) {
    st[nd - shape.size() + k] = (shape[k] == 1) ? 0 : s;
    s *= shape[k];
  }
  return st;
}

template <class F>
static Tensor ew2(const Tensor& A, const Tensor& B, DT out_dt, F op) {
  Tensor out;
  out.dt = out_dt;
  out.shape = broadcast_shape(A.shape, B.shape);
  out.alloc();
  size_t nd = out.shape.size();
  auto sa = aligned_strides(A.shape, nd), sb = aligned_strides(B.shape, nd);
  int64_t n = out.numel();
  std::vector<int64_t> coord(nd, 0);
  int64_t ia = 0, ib = 0;
  for (int64_t k = 0; k < n; k++) {
    out.set(k, op(A.get(ia), B.get(ib)));
    for (size_t d = nd; d-- > 0;) {
      coord[d]++;
      ia += sa[d];
      ib += sb[d];
      if (coord[d] < out.shape[d]) break;
      coord[d] = 0;
      ia -= sa[d] * out.shape[d];
      ib -= sb[d] * out.shape[d];
    }
  }
  return out;
}

template <class F>
static Tensor ew3(const Tensor& A, const Tensor& B, const Tensor& C, DT out_dt, F op) {
  Tensor out;
  out.dt = out_dt;
  out.shape = broadcast_shape(broadcast_shape(A.shape, B.shape), C.shape);
  out.alloc();
  size_t nd = out.shape.size();
  auto sa = aligned_strides(A.shape, nd), sb = aligned_strides(B.shape, nd),
       sc = aligned_strides(C.shape, nd);
  int64_t n = out.numel();
  std::vector<int64_t> coord(nd, 0);
  int64_t ia = 0, ib = 0, ic = 0;
  for (int64_t k = 0; k < n; k++) {
    out.set(k, op(A.get(ia), B.get(ib), C.get(ic)));
    for (size_t d = nd; d-- > 0;) {
      coord[d]++;
      ia += sa[d]; ib += sb[d]; ic += sc[d];
      if (coord[d] < out.shape[d]) break;
      coord[d] = 0;
      ia -= sa[d] * out.shape[d];
      ib -= sb[d] * out.shape[d];
      ic -= sc[d] * out.shape[d];
    }
  }
  return out;
}

template <class F>
static Tensor ew1(const Tensor& A, F op) {
  Tensor out = A;
  if (out.dt == F32)
    for (auto& v : out.f) v = float(op(double(v)));
  else if (out.dt == I64)
    for (auto& v : out.i) v = int64_t(op(double(v)));
  else
    for (auto& v : out.u) v = uint8_t(op(double(v)));
  return out;
}

// ---------------------------------------------------------------------------
// heavy ops: conv / maxpool / matmul
// ---------------------------------------------------------------------------

static Tensor conv2d(const Tensor& X, const Tensor& W, std::vector<int64_t> strides,
                     std::vector<int64_t> pads, std::vector<int64_t> dils, int64_t group) {
  int64_t N = X.shape[0], C = X.shape[1], H = X.shape[2], Wd = X.shape[3];
  int64_t O = W.shape[0], CG = W.shape[1], KH = W.shape[2], KW = W.shape[3];
  int64_t sh = strides[0], sw = strides[1], dh = dils[0], dw = dils[1];
  int64_t ph0 = pads[0], pw0 = pads[1], ph1 = pads[2], pw1 = pads[3];
  int64_t HP = H + ph0 + ph1, WP = Wd + pw0 + pw1;
  int64_t EH = (KH - 1) * dh + 1, EW = (KW - 1) * dw + 1;
  int64_t OH = (HP - EH) / sh + 1, OW = (WP - EW) / sw + 1;
  int64_t OG = O / group;
  Tensor out;
  out.dt = F32;
  out.shape = {N, O, OH, OW};
  out.alloc();
  for (int64_t n = 0; n < N; n++)
    for (int64_t g = 0; g < group; g++)
      for (int64_t oc = 0; oc < OG; oc++) {
        int64_t o = g * OG + oc;
        const float* wbase = &W.f[size_t(o * CG * KH * KW)];
        for (int64_t oy = 0; oy < OH; oy++)
          for (int64_t ox = 0; ox < OW; ox++) {
            double acc = 0;
            for (int64_t ci = 0; ci < CG; ci++) {
              int64_t c = g * CG + ci;
              const float* xbase = &X.f[size_t(((n * C + c) * H) * Wd)];
              for (int64_t ky = 0; ky < KH; ky++) {
                int64_t iy = oy * sh + ky * dh - ph0;
                if (iy < 0 || iy >= H) continue;
                for (int64_t kx = 0; kx < KW; kx++) {
                  int64_t ix = ox * sw + kx * dw - pw0;
                  if (ix < 0 || ix >= Wd) continue;
                  acc += double(xbase[iy * Wd + ix]) *
                         double(wbase[(ci * KH + ky) * KW + kx]);
                }
              }
            }
            out.f[size_t(((n * O + o) * OH + oy) * OW + ox)] = float(acc);
          }
      }
  return out;
}

static Tensor maxpool2d(const Tensor& X, std::vector<int64_t> kernel,
                        std::vector<int64_t> strides, std::vector<int64_t> pads) {
  int64_t N = X.shape[0], C = X.shape[1], H = X.shape[2], W = X.shape[3];
  int64_t KH = kernel[0], KW = kernel[1], sh = strides[0], sw = strides[1];
  int64_t ph0 = pads[0], pw0 = pads[1], ph1 = pads[2], pw1 = pads[3];
  int64_t OH = (H + ph0 + ph1 - KH) / sh + 1, OW = (W + pw0 + pw1 - KW) / sw + 1;
  Tensor out;
  out.dt = F32;
  out.shape = {N, C, OH, OW};
  out.alloc();
  for (int64_t n = 0; n < N; n++)
    for (int64_t c = 0; c < C; c++) {
      const float* xb = &X.f[size_t((n * C + c) * H * W)];
      for (int64_t oy = 0; oy < OH; oy++)
        for (int64_t ox = 0; ox < OW; ox++) {
          float m = -INFINITY;
          for (int64_t ky = 0; ky < KH; ky++) {
            int64_t iy = oy * sh + ky - ph0;
            if (iy < 0 || iy >= H) continue;
            for (int64_t kx = 0; kx < KW; kx++) {
              int64_t ix = ox * sw + kx - pw0;
              if (ix < 0 || ix >= W) continue;
              m = std::max(m, xb[iy * W + ix]);
            }
          }
          out.f[size_t(((n * C + c) * OH + oy) * OW + ox)] = m;
        }
    }
  return out;
}

static Tensor matmul(const Tensor& A, const Tensor& B) {
  // the exporter emits MatMul on equal-rank tensors with identical batch dims
  size_t nd = A.shape.size();
  if (B.shape.size() != nd || nd < 2) throw std::runtime_error("matmul rank");
  int64_t M = A.shape[nd - 2], K = A.shape[nd - 1], N2 = B.shape[nd - 1];
  if (B.shape[nd - 2] != K) throw std::runtime_error("matmul K mismatch");
  int64_t batch = 1;
  for (size_t k = 0; k + 2 < nd; k++) {
    if (A.shape[k] != B.shape[k]) throw std::runtime_error("matmul batch mismatch");
    batch *= A.shape[k];
  }
  Tensor out;
  out.dt = F32;
  out.shape = A.shape;
  out.shape[nd - 1] = N2;
  out.alloc();
  for (int64_t b = 0; b < batch; b++) {
    const float* a = &A.f[size_t(b * M * K)];
    const float* bb = &B.f[size_t(b * K * N2)];
    float* o = &out.f[size_t(b * M * N2)];
    for (int64_t m = 0; m < M; m++)
      for (int64_t n = 0; n < N2; n++) {
        double acc = 0;
        for (int64_t k = 0; k < K; k++) acc += double(a[m * K + k]) * double(bb[k * N2 + n]);
        o[m * N2 + n] = float(acc);
      }
  }
  return out;
}

// ---------------------------------------------------------------------------
// graph execution
// ---------------------------------------------------------------------------

static DT cast_target(int64_t onnx_to) {
  switch (onnx_to) {
    case O_FLOAT: case O_DOUBLE: case O_FLOAT16: return F32;
    case O_INT64: case O_INT32: case O_INT8: return I64;
    case O_UINT8: return U8;
    case O_BOOL: return B8;
    default: throw std::runtime_error("cast to dtype " + std::to_string(onnx_to));
  }
}

static std::vector<int64_t> as_i64_list(const Tensor& t) {
  std::vector<int64_t> out(size_t(t.numel()));
  for (int64_t k = 0; k < t.numel(); k++) out[size_t(k)] = t.geti(k);
  return out;
}

static std::vector<Tensor> run_graph(const Graph& g,
                                     std::map<std::string, Tensor> env) {
  for (auto& kv : g.inits) env[kv.first] = kv.second;

  for (const Node& nd : g.nodes) {
    std::vector<const Tensor*> ins;
    for (auto& name : nd.inputs) {
      auto it = env.find(name);
      if (it == env.end()) throw std::runtime_error("missing input " + name);
      ins.push_back(&it->second);
    }
    const std::string& op = nd.op;
    Tensor out;

    auto cmp = [&](std::function<bool(double, double)> fn) {
      return ew2(*ins[0], *ins[1], B8, [&](double a, double b) { return fn(a, b) ? 1.0 : 0.0; });
    };

    if (op == "Identity") out = *ins[0];
    else if (op == "Add") out = ew2(*ins[0], *ins[1], ins[0]->dt, [](double a, double b) { return a + b; });
    else if (op == "Sub") out = ew2(*ins[0], *ins[1], ins[0]->dt, [](double a, double b) { return a - b; });
    else if (op == "Mul") out = ew2(*ins[0], *ins[1], ins[0]->dt, [](double a, double b) { return a * b; });
    else if (op == "Div") out = ew2(*ins[0], *ins[1], ins[0]->dt, [](double a, double b) { return a / b; });
    else if (op == "Max") out = ew2(*ins[0], *ins[1], ins[0]->dt, [](double a, double b) { return std::max(a, b); });
    else if (op == "Min") out = ew2(*ins[0], *ins[1], ins[0]->dt, [](double a, double b) { return std::min(a, b); });
    else if (op == "Pow") out = ew2(*ins[0], *ins[1], F32, [](double a, double b) { return std::pow(a, b); });
    else if (op == "Exp") out = ew1(*ins[0], [](double v) { return std::exp(v); });
    else if (op == "Log") out = ew1(*ins[0], [](double v) { return std::log(v); });
    else if (op == "Sqrt") out = ew1(*ins[0], [](double v) { return std::sqrt(v); });
    else if (op == "Reciprocal") out = ew1(*ins[0], [](double v) { return 1.0 / v; });
    else if (op == "Sigmoid") out = ew1(*ins[0], [](double v) { return 1.0 / (1.0 + std::exp(-v)); });
    else if (op == "Tanh") out = ew1(*ins[0], [](double v) { return std::tanh(v); });
    else if (op == "Sin") out = ew1(*ins[0], [](double v) { return std::sin(v); });
    else if (op == "Cos") out = ew1(*ins[0], [](double v) { return std::cos(v); });
    else if (op == "Atan") out = ew1(*ins[0], [](double v) { return std::atan(v); });
    else if (op == "Erf") out = ew1(*ins[0], [](double v) { return std::erf(v); });
    else if (op == "Neg") out = ew1(*ins[0], [](double v) { return -v; });
    else if (op == "Abs") out = ew1(*ins[0], [](double v) { return std::abs(v); });
    else if (op == "Floor") out = ew1(*ins[0], [](double v) { return std::floor(v); });
    else if (op == "Ceil") out = ew1(*ins[0], [](double v) { return std::ceil(v); });
    else if (op == "Sign") out = ew1(*ins[0], [](double v) { return v > 0 ? 1.0 : (v < 0 ? -1.0 : 0.0); });
    else if (op == "Clip") {
      out = *ins[0];
      double lo = ins.size() > 1 && ins[1]->numel() ? ins[1]->get(0) : -INFINITY;
      double hi = ins.size() > 2 && ins[2]->numel() ? ins[2]->get(0) : INFINITY;
      for (auto& v : out.f) v = float(std::min(std::max(double(v), lo), hi));
    } else if (op == "Where") {
      out = ew3(*ins[0], *ins[1], *ins[2], ins[1]->dt,
                [](double c, double a, double b) { return c != 0 ? a : b; });
    } else if (op == "Equal") out = cmp([](double a, double b) { return a == b; });
    else if (op == "Less") out = cmp([](double a, double b) { return a < b; });
    else if (op == "LessOrEqual") out = cmp([](double a, double b) { return a <= b; });
    else if (op == "Greater") out = cmp([](double a, double b) { return a > b; });
    else if (op == "GreaterOrEqual") out = cmp([](double a, double b) { return a >= b; });
    else if (op == "Not") out = ew1(*ins[0], [](double v) { return v == 0 ? 1.0 : 0.0; });
    else if (op == "And") out = ew2(*ins[0], *ins[1], B8, [](double a, double b) { return (a != 0 && b != 0) ? 1.0 : 0.0; });
    else if (op == "Or") out = ew2(*ins[0], *ins[1], B8, [](double a, double b) { return (a != 0 || b != 0) ? 1.0 : 0.0; });
    else if (op == "Cast") {
      DT to = cast_target(nd.attr_i("to", O_FLOAT));
      out.dt = to;
      out.shape = ins[0]->shape;
      out.alloc();
      for (int64_t k = 0; k < out.numel(); k++) {
        double v = ins[0]->get(k);
        if (to == F32) out.f[size_t(k)] = float(v);
        else if (to == I64) out.i[size_t(k)] = ins[0]->dt == F32 ? int64_t(std::trunc(v)) : ins[0]->geti(k);
        else if (to == U8) out.u[size_t(k)] = uint8_t(int64_t(v));
        else out.u[size_t(k)] = v != 0 ? 1 : 0;
      }
    } else if (op == "ReduceSum" || op == "ReduceMax" || op == "ReduceMin") {
      std::vector<int64_t> axes;
      if (ins.size() > 1) axes = as_i64_list(*ins[1]);
      else for (size_t k = 0; k < ins[0]->shape.size(); k++) axes.push_back(int64_t(k));
      for (auto& a : axes) if (a < 0) a += int64_t(ins[0]->shape.size());
      bool keep = nd.attr_i("keepdims", 1) != 0;
      std::vector<bool> red(ins[0]->shape.size(), false);
      for (auto a : axes) red[size_t(a)] = true;
      std::vector<int64_t> oshape;
      for (size_t k = 0; k < ins[0]->shape.size(); k++) {
        if (!red[k]) oshape.push_back(ins[0]->shape[k]);
        else if (keep) oshape.push_back(1);
      }
      if (oshape.empty()) oshape.push_back(1);  // scalar-as-1 for simplicity
      out.dt = ins[0]->dt;
      out.shape = oshape;
      out.alloc();
      double init = op == "ReduceSum" ? 0.0 : (op == "ReduceMax" ? -INFINITY : INFINITY);
      std::vector<double> acc(size_t(out.numel()), init);
      size_t ndim = ins[0]->shape.size();
      std::vector<int64_t> coord(ndim, 0);
      // output strides mapped from input coords
      std::vector<int64_t> ostr(ndim, 0);
      {
        // strides against oshape (non-reduced dims only, in order)
        std::vector<int64_t> kept;
        for (size_t k = 0; k < ndim; k++) if (!red[k]) kept.push_back(ins[0]->shape[k]);
        int64_t s = 1;
        std::vector<int64_t> kstr(kept.size());
        for (size_t k = kept.size(); k-- > 0;) { kstr[k] = s; s *= kept[k]; }
        size_t ki = 0;
        for (size_t k = 0; k < ndim; k++) ostr[k] = red[k] ? 0 : kstr[ki++];
      }
      int64_t n = ins[0]->numel(), oidx = 0;
      for (int64_t k = 0; k < n; k++) {
        double v = ins[0]->get(k);
        if (op == "ReduceSum") acc[size_t(oidx)] += v;
        else if (op == "ReduceMax") acc[size_t(oidx)] = std::max(acc[size_t(oidx)], v);
        else acc[size_t(oidx)] = std::min(acc[size_t(oidx)], v);
        for (size_t d = ndim; d-- > 0;) {
          coord[d]++;
          oidx += ostr[d];
          if (coord[d] < ins[0]->shape[d]) break;
          coord[d] = 0;
          oidx -= ostr[d] * ins[0]->shape[d];
        }
      }
      for (int64_t k = 0; k < out.numel(); k++) out.set(k, acc[size_t(k)]);
    } else if (op == "ArgMax" || op == "ArgMin") {
      int64_t axis = nd.attr_i("axis", 0);
      if (axis < 0) axis += int64_t(ins[0]->shape.size());
      bool keep = nd.attr_i("keepdims", 1) != 0;
      int64_t pre = 1, dim = ins[0]->shape[size_t(axis)], post = 1;
      for (int64_t k = 0; k < axis; k++) pre *= ins[0]->shape[size_t(k)];
      for (size_t k = size_t(axis) + 1; k < ins[0]->shape.size(); k++) post *= ins[0]->shape[k];
      out.dt = I64;
      out.shape.clear();
      for (size_t k = 0; k < ins[0]->shape.size(); k++) {
        if (int64_t(k) == axis) { if (keep) out.shape.push_back(1); }
        else out.shape.push_back(ins[0]->shape[k]);
      }
      out.alloc();
      for (int64_t p = 0; p < pre; p++)
        for (int64_t q = 0; q < post; q++) {
          int64_t best = 0;
          double bv = ins[0]->get((p * dim) * post + q);
          for (int64_t d = 1; d < dim; d++) {
            double v = ins[0]->get((p * dim + d) * post + q);
            if (op == "ArgMax" ? v > bv : v < bv) { bv = v; best = d; }
          }
          out.i[size_t(p * post + q)] = best;
        }
    } else if (op == "Reshape") {
      out = *ins[0];
      out.shape = as_i64_list(*ins[1]);
      for (auto& d : out.shape)
        if (d == -1) {
          int64_t rest = 1;
          for (auto dd : out.shape) if (dd != -1) rest *= dd;
          d = ins[0]->numel() / rest;
        }
    } else if (op == "Squeeze") {
      if (ins.size() < 2)
        throw std::runtime_error("Squeeze with attribute axes (opset<13) unsupported");
      out = *ins[0];
      std::vector<int64_t> axes = as_i64_list(*ins[1]);
      for (auto& a : axes) if (a < 0) a += int64_t(out.shape.size());
      std::sort(axes.rbegin(), axes.rend());
      for (auto a : axes) out.shape.erase(out.shape.begin() + a);
    } else if (op == "Unsqueeze") {
      if (ins.size() < 2)
        throw std::runtime_error("Unsqueeze with attribute axes (opset<13) unsupported");
      out = *ins[0];
      std::vector<int64_t> axes = as_i64_list(*ins[1]);
      std::sort(axes.begin(), axes.end());
      for (auto a : axes) out.shape.insert(out.shape.begin() + a, 1);
    } else if (op == "Transpose") {
      std::vector<int64_t> perm = nd.attr_ints("perm", {});
      size_t ndim = ins[0]->shape.size();
      out.dt = ins[0]->dt;
      out.shape.resize(ndim);
      for (size_t k = 0; k < ndim; k++) out.shape[k] = ins[0]->shape[size_t(perm[k])];
      out.alloc();
      std::vector<int64_t> istr(ndim, 1);
      for (size_t k = ndim - 1; k-- > 0;) istr[k] = istr[k + 1] * ins[0]->shape[k + 1];
      std::vector<int64_t> mapped(ndim);
      for (size_t k = 0; k < ndim; k++) mapped[k] = istr[size_t(perm[k])];
      std::vector<int64_t> coord(ndim, 0);
      int64_t src = 0;
      for (int64_t k = 0; k < out.numel(); k++) {
        out.set(k, ins[0]->get(src));
        for (size_t d = ndim; d-- > 0;) {
          coord[d]++;
          src += mapped[d];
          if (coord[d] < out.shape[d]) break;
          coord[d] = 0;
          src -= mapped[d] * out.shape[d];
        }
      }
    } else if (op == "Expand") {
      Tensor target;
      target.dt = ins[0]->dt;
      target.shape = as_i64_list(*ins[1]);
      out = ew2(*ins[0], [&] {  // zeros of the target shape broadcast against input
        Tensor z; z.dt = ins[0]->dt; z.shape = target.shape; z.alloc(); return z;
      }(), ins[0]->dt, [](double a, double) { return a; });
    } else if (op == "Concat") {
      int64_t axis = nd.attr_i("axis", 0);
      if (axis < 0) axis += int64_t(ins[0]->shape.size());
      out.dt = ins[0]->dt;
      out.shape = ins[0]->shape;
      out.shape[size_t(axis)] = 0;
      for (auto* t : ins) out.shape[size_t(axis)] += t->shape[size_t(axis)];
      out.alloc();
      int64_t pre = 1, post = 1;
      for (int64_t k = 0; k < axis; k++) pre *= out.shape[size_t(k)];
      for (size_t k = size_t(axis) + 1; k < out.shape.size(); k++) post *= out.shape[k];
      int64_t oaxis = out.shape[size_t(axis)], off = 0;
      for (auto* t : ins) {
        int64_t ta = t->shape[size_t(axis)];
        for (int64_t p = 0; p < pre; p++)
          for (int64_t a = 0; a < ta; a++)
            for (int64_t q = 0; q < post; q++)
              out.set((p * oaxis + off + a) * post + q, t->get((p * ta + a) * post + q));
        off += ta;
      }
    } else if (op == "Slice") {
      if (ins.size() < 4)
        throw std::runtime_error("Slice with attribute starts/ends (opset<10) unsupported");
      std::vector<int64_t> starts = as_i64_list(*ins[1]);
      std::vector<int64_t> ends = as_i64_list(*ins[2]);
      std::vector<int64_t> axes = as_i64_list(*ins[3]);
      std::vector<int64_t> steps = ins.size() > 4 ? as_i64_list(*ins[4])
                                                  : std::vector<int64_t>(starts.size(), 1);
      size_t ndim = ins[0]->shape.size();
      // per-dim index lists
      std::vector<std::vector<int64_t>> idx(ndim);
      for (size_t d = 0; d < ndim; d++) {
        idx[d].resize(size_t(ins[0]->shape[d]));
        std::iota(idx[d].begin(), idx[d].end(), 0);
      }
      const int64_t SENT = INT64_MIN + 1;
      for (size_t k = 0; k < starts.size(); k++) {
        int64_t a = axes[k];
        if (a < 0) a += int64_t(ndim);
        int64_t dim = ins[0]->shape[size_t(a)];
        int64_t s = starts[k], e = ends[k], st = steps[k];
        if (s < 0) s += dim;
        std::vector<int64_t> sel;
        if (st > 0) {
          if (e < 0 && e > SENT) e += dim;
          s = std::max<int64_t>(0, std::min(s, dim));
          e = std::max<int64_t>(0, std::min(e, dim));
          for (int64_t v = s; v < e; v += st) sel.push_back(v);
        } else {
          s = std::max<int64_t>(0, std::min(s, dim - 1));
          int64_t stop = (e <= SENT) ? -1 : (e < 0 ? e + dim : std::min(e, dim));
          for (int64_t v = s; v > stop; v += st) sel.push_back(v);
        }
        idx[size_t(a)] = sel;
      }
      out.dt = ins[0]->dt;
      out.shape.resize(ndim);
      for (size_t d = 0; d < ndim; d++) out.shape[d] = int64_t(idx[d].size());
      out.alloc();
      std::vector<int64_t> istr(ndim, 1);
      for (size_t k = ndim - 1; k-- > 0;) istr[k] = istr[k + 1] * ins[0]->shape[k + 1];
      std::vector<int64_t> coord(ndim, 0);
      for (int64_t k = 0; k < out.numel(); k++) {
        int64_t src = 0;
        for (size_t d = 0; d < ndim; d++) src += idx[d][size_t(coord[d])] * istr[d];
        out.set(k, ins[0]->get(src));
        for (size_t d = ndim; d-- > 0;) {
          coord[d]++;
          if (coord[d] < out.shape[d]) break;
          coord[d] = 0;
        }
      }
    } else if (op == "Pad") {
      std::vector<int64_t> pads = as_i64_list(*ins[1]);
      double cval = ins.size() > 2 && ins[2]->numel() ? ins[2]->get(0) : 0.0;
      size_t ndim = ins[0]->shape.size();
      out.dt = ins[0]->dt;
      out.shape.resize(ndim);
      for (size_t d = 0; d < ndim; d++)
        out.shape[d] = ins[0]->shape[d] + pads[d] + pads[d + ndim];
      out.alloc();
      for (int64_t k = 0; k < out.numel(); k++) out.set(k, cval);
      std::vector<int64_t> coord(ndim, 0);
      std::vector<int64_t> ostr(ndim, 1);
      for (size_t k = ndim - 1; k-- > 0;) ostr[k] = ostr[k + 1] * out.shape[k + 1];
      for (int64_t k = 0; k < ins[0]->numel(); k++) {
        int64_t dst = 0;
        for (size_t d = 0; d < ndim; d++) dst += (coord[d] + pads[d]) * ostr[d];
        out.set(dst, ins[0]->get(k));
        for (size_t d = ndim; d-- > 0;) {
          coord[d]++;
          if (coord[d] < ins[0]->shape[d]) break;
          coord[d] = 0;
        }
      }
    } else if (op == "MatMul") out = matmul(*ins[0], *ins[1]);
    else if (op == "Conv")
      out = conv2d(*ins[0], *ins[1], nd.attr_ints("strides", {1, 1}),
                   nd.attr_ints("pads", {0, 0, 0, 0}), nd.attr_ints("dilations", {1, 1}),
                   nd.attr_i("group", 1));
    else if (op == "MaxPool")
      out = maxpool2d(*ins[0], nd.attr_ints("kernel_shape", {1, 1}),
                      nd.attr_ints("strides", {1, 1}), nd.attr_ints("pads", {0, 0, 0, 0}));
    else if (op == "Gather") {
      int64_t axis = nd.attr_i("axis", 0);
      if (axis < 0) axis += int64_t(ins[0]->shape.size());
      int64_t pre = 1, dim = ins[0]->shape[size_t(axis)], post = 1;
      for (int64_t k = 0; k < axis; k++) pre *= ins[0]->shape[size_t(k)];
      for (size_t k = size_t(axis) + 1; k < ins[0]->shape.size(); k++) post *= ins[0]->shape[k];
      out.dt = ins[0]->dt;
      out.shape.clear();
      for (int64_t k = 0; k < axis; k++) out.shape.push_back(ins[0]->shape[size_t(k)]);
      for (auto d : ins[1]->shape) out.shape.push_back(d);
      for (size_t k = size_t(axis) + 1; k < ins[0]->shape.size(); k++) out.shape.push_back(ins[0]->shape[k]);
      out.alloc();
      int64_t ni = ins[1]->numel();
      for (int64_t p = 0; p < pre; p++)
        for (int64_t j = 0; j < ni; j++) {
          int64_t src_d = ins[1]->geti(j);
          if (src_d < 0) src_d += dim;
          for (int64_t q = 0; q < post; q++)
            out.set((p * ni + j) * post + q, ins[0]->get((p * dim + src_d) * post + q));
        }
    } else if (op == "Softmax") {
      int64_t axis = nd.attr_i("axis", -1);
      if (axis < 0) axis += int64_t(ins[0]->shape.size());
      int64_t pre = 1, dim = ins[0]->shape[size_t(axis)], post = 1;
      for (int64_t k = 0; k < axis; k++) pre *= ins[0]->shape[size_t(k)];
      for (size_t k = size_t(axis) + 1; k < ins[0]->shape.size(); k++) post *= ins[0]->shape[k];
      out = *ins[0];
      for (int64_t p = 0; p < pre; p++)
        for (int64_t q = 0; q < post; q++) {
          double m = -INFINITY, s = 0;
          for (int64_t d = 0; d < dim; d++) m = std::max(m, double(ins[0]->f[size_t((p * dim + d) * post + q)]));
          for (int64_t d = 0; d < dim; d++) {
            double e = std::exp(double(ins[0]->f[size_t((p * dim + d) * post + q)]) - m);
            out.f[size_t((p * dim + d) * post + q)] = float(e);
            s += e;
          }
          for (int64_t d = 0; d < dim; d++) out.f[size_t((p * dim + d) * post + q)] /= float(s);
        }
    } else if (op == "GatherElements") {
      // out[coords] = data[coords with coords[axis] := idx[coords]]
      int64_t axis = nd.attr_i("axis", 0);
      size_t ndim = ins[0]->shape.size();
      if (axis < 0) axis += int64_t(ndim);
      const Tensor& I = *ins[1];
      out.dt = ins[0]->dt;
      out.shape = I.shape;
      out.alloc();
      std::vector<int64_t> istr(ndim, 1);
      for (size_t k = ndim - 1; k-- > 0;) istr[k] = istr[k + 1] * ins[0]->shape[k + 1];
      std::vector<int64_t> coord(ndim, 0);
      for (int64_t k = 0; k < out.numel(); k++) {
        int64_t src = 0;
        for (size_t d = 0; d < ndim; d++) {
          int64_t v = (int64_t(d) == axis) ? I.geti(k) : coord[d];
          if (v < 0) v += ins[0]->shape[d];
          src += v * istr[d];
        }
        out.set(k, ins[0]->get(src));
        for (size_t d = ndim; d-- > 0;) {
          coord[d]++;
          if (coord[d] < I.shape[d]) break;
          coord[d] = 0;
        }
      }
    } else if (op == "GatherND") {
      // indices (..., r) over a rank-r operand; output shape = idx.shape[:-1]
      size_t r = ins[0]->shape.size();
      const Tensor& I = *ins[1];
      if (size_t(I.shape.back()) != r) throw std::runtime_error("GatherND depth");
      out.dt = ins[0]->dt;
      out.shape.assign(I.shape.begin(), I.shape.end() - 1);
      if (out.shape.empty()) out.shape.push_back(1);
      out.alloc();
      std::vector<int64_t> istr(r, 1);
      for (size_t k = r - 1; k-- > 0;) istr[k] = istr[k + 1] * ins[0]->shape[k + 1];
      int64_t n = out.numel();
      for (int64_t k = 0; k < n; k++) {
        int64_t src = 0;
        for (size_t d = 0; d < r; d++) {
          int64_t v = I.geti(k * int64_t(r) + int64_t(d));
          if (v < 0) v += ins[0]->shape[d];
          src += v * istr[d];
        }
        out.set(k, ins[0]->get(src));
      }
    } else if (op == "TopK") {
      int64_t kk = ins[1]->geti(0);
      int64_t axis = nd.attr_i("axis", -1);
      if (axis < 0) axis += int64_t(ins[0]->shape.size());
      bool largest = nd.attr_i("largest", 1) != 0;
      int64_t pre = 1, dim = ins[0]->shape[size_t(axis)], post = 1;
      for (int64_t k2 = 0; k2 < axis; k2++) pre *= ins[0]->shape[size_t(k2)];
      for (size_t k2 = size_t(axis) + 1; k2 < ins[0]->shape.size(); k2++) post *= ins[0]->shape[k2];
      Tensor vals, idxs;
      vals.dt = ins[0]->dt;
      idxs.dt = I64;
      vals.shape = ins[0]->shape; vals.shape[size_t(axis)] = kk;
      idxs.shape = vals.shape;
      vals.alloc(); idxs.alloc();
      std::vector<int64_t> order((size_t(dim)));
      for (int64_t p2 = 0; p2 < pre; p2++)
        for (int64_t q = 0; q < post; q++) {
          std::iota(order.begin(), order.end(), 0);
          // stable: ties keep the lowest original index (matches jax top_k)
          std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b2) {
            double va = ins[0]->get((p2 * dim + a) * post + q);
            double vb = ins[0]->get((p2 * dim + b2) * post + q);
            return largest ? va > vb : va < vb;
          });
          for (int64_t j = 0; j < kk; j++) {
            vals.set((p2 * kk + j) * post + q, ins[0]->get((p2 * dim + order[size_t(j)]) * post + q));
            idxs.i[size_t((p2 * kk + j) * post + q)] = order[size_t(j)];
          }
        }
      env[nd.outputs[0]] = std::move(vals);
      if (nd.outputs.size() > 1) env[nd.outputs[1]] = std::move(idxs);
      continue;
    } else {
      throw std::runtime_error("unsupported op " + op);
    }
    env[nd.outputs[0]] = std::move(out);
  }

  std::vector<Tensor> outs;
  for (auto& vi : g.outputs) outs.push_back(env.at(vi.name));
  return outs;
}

// ---------------------------------------------------------------------------
// image IO + pre/post-processing (the deployment-consumer part)
// ---------------------------------------------------------------------------

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // HWC
};

static Image read_ppm(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open " + path);
  std::string magic;
  f >> magic;
  if (magic != "P6") throw std::runtime_error("not a binary PPM (P6): " + path);
  auto skip = [&]() {
    while (f.peek() == '#' || std::isspace(f.peek())) {
      if (f.peek() == '#') { std::string line; std::getline(f, line); }
      else f.get();
    }
  };
  Image im;
  int maxv;
  skip(); f >> im.w;
  skip(); f >> im.h;
  skip(); f >> maxv;
  if (maxv != 255) throw std::runtime_error("only 8-bit PPM (maxval 255) supported");
  if (im.w <= 0 || im.h <= 0) throw std::runtime_error("bad PPM dimensions");
  f.get();  // single whitespace before raster
  im.rgb.resize(size_t(im.w) * im.h * 3);
  f.read((char*)im.rgb.data(), std::streamsize(im.rgb.size()));
  if (size_t(f.gcount()) != im.rgb.size())
    throw std::runtime_error("truncated PPM raster");
  return im;
}

struct LetterboxInfo {
  double ratio;
  int pad_x, pad_y;
};

// bilinear resize + center pad-114 to (size, size); matches the Python
// consumer demo (examples/onnx_inference.py letterbox)
static LetterboxInfo letterbox(const Image& im, int size, std::vector<uint8_t>& out) {
  double r = std::min(double(size) / im.h, double(size) / im.w);
  int nw = int(std::lround(im.w * r)), nh = int(std::lround(im.h * r));
  int top = (size - nh) / 2, left = (size - nw) / 2;
  out.assign(size_t(size) * size * 3, 114);
  for (int y = 0; y < nh; y++) {
    double sy = (y + 0.5) / r - 0.5;
    int y0 = std::max(0, std::min(im.h - 1, int(std::floor(sy))));
    int y1 = std::min(im.h - 1, y0 + 1);
    double fy = std::max(0.0, std::min(1.0, sy - y0));
    for (int x = 0; x < nw; x++) {
      double sx = (x + 0.5) / r - 0.5;
      int x0 = std::max(0, std::min(im.w - 1, int(std::floor(sx))));
      int x1 = std::min(im.w - 1, x0 + 1);
      double fx = std::max(0.0, std::min(1.0, sx - x0));
      for (int ch = 0; ch < 3; ch++) {
        double v00 = im.rgb[(size_t(y0) * im.w + x0) * 3 + ch];
        double v01 = im.rgb[(size_t(y0) * im.w + x1) * 3 + ch];
        double v10 = im.rgb[(size_t(y1) * im.w + x0) * 3 + ch];
        double v11 = im.rgb[(size_t(y1) * im.w + x1) * 3 + ch];
        double v = v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx +
                   v10 * fy * (1 - fx) + v11 * fy * fx;
        out[(size_t(top + y) * size + (left + x)) * 3 + ch] = uint8_t(std::lround(v));
      }
    }
  }
  return {r, left, top};
}

struct Det {
  float x1, y1, x2, y2, conf;
  int cls;
  int64_t anchor;  // source anchor row (indexes coeffs for seg masks)
};

// draw detection rectangles on the original image and write a binary PPM
// (the reference C++ demos' cv::rectangle + imwrite, dependency-free)
static void write_annotated_ppm(const Image& im, const std::vector<Det>& dets,
                                const std::string& path) {
  Image out = im;
  static const uint8_t palette[6][3] = {{255, 56, 56}, {56, 159, 255}, {72, 249, 10},
                                        {255, 178, 29}, {207, 56, 255}, {255, 112, 31}};
  for (auto& d : dets) {
    const uint8_t* c = palette[d.cls % 6];
    int x1 = std::max(0, int(std::lround(d.x1))), y1 = std::max(0, int(std::lround(d.y1)));
    int x2 = std::min(im.w - 1, int(std::lround(d.x2))), y2 = std::min(im.h - 1, int(std::lround(d.y2)));
    if (x2 <= x1 || y2 <= y1) continue;
    auto px = [&](int x, int y) {
      uint8_t* p = &out.rgb[(size_t(y) * im.w + x) * 3];
      p[0] = c[0]; p[1] = c[1]; p[2] = c[2];
    };
    for (int x = x1; x <= x2; x++) { px(x, y1); px(x, y2); }
    for (int y = y1; y <= y2; y++) { px(x1, y); px(x2, y); }
  }
  std::ofstream f(path, std::ios::binary);
  f << "P6\n" << im.w << " " << im.h << "\n255\n";
  f.write((const char*)out.rgb.data(), std::streamsize(out.rgb.size()));
}

// class-aware greedy NMS on (A,4) xywh boxes + (A,nc) scores
static std::vector<Det> postprocess(const Tensor& boxes, const Tensor& scores,
                                    float conf_thres, float iou_thres,
                                    const LetterboxInfo& lb) {
  int64_t A = boxes.shape[1], nc = scores.shape[2];
  std::vector<Det> cand;
  for (int64_t a = 0; a < A; a++) {
    int best = 0;
    float bv = scores.f[size_t(a * nc)];
    for (int c = 1; c < nc; c++) {
      float v = scores.f[size_t(a * nc + c)];
      if (v > bv) { bv = v; best = c; }
    }
    if (bv < conf_thres) continue;
    float cx = boxes.f[size_t(a * 4)], cy = boxes.f[size_t(a * 4 + 1)];
    float w = boxes.f[size_t(a * 4 + 2)], h = boxes.f[size_t(a * 4 + 3)];
    cand.push_back({cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2, bv, best, a});
  }
  std::sort(cand.begin(), cand.end(), [](const Det& a, const Det& b) { return a.conf > b.conf; });
  std::vector<Det> keep;
  for (auto& d : cand) {
    bool ok = true;
    for (auto& k : keep) {
      if (k.cls != d.cls) continue;
      float ix1 = std::max(k.x1, d.x1), iy1 = std::max(k.y1, d.y1);
      float ix2 = std::min(k.x2, d.x2), iy2 = std::min(k.y2, d.y2);
      float iw = std::max(0.f, ix2 - ix1), ih = std::max(0.f, iy2 - iy1);
      float inter = iw * ih;
      float ua = (k.x2 - k.x1) * (k.y2 - k.y1) + (d.x2 - d.x1) * (d.y2 - d.y1) - inter;
      if (ua > 0 && inter / ua > iou_thres) { ok = false; break; }
    }
    if (ok) keep.push_back(d);
    if (keep.size() >= 300) break;
  }
  // map back to original-image coordinates
  for (auto& d : keep) {
    d.x1 = float((d.x1 - lb.pad_x) / lb.ratio);
    d.y1 = float((d.y1 - lb.pad_y) / lb.ratio);
    d.x2 = float((d.x2 - lb.pad_x) / lb.ratio);
    d.y2 = float((d.y2 - lb.pad_y) / lb.ratio);
  }
  return keep;
}

// ---------------------------------------------------------------------------
// main
// ---------------------------------------------------------------------------

int main(int argc, char** argv) {
  try {
    if (argc < 3) {
      std::fprintf(stderr,
                   "usage: %s model.onnx (image.ppm | --rand SEED | --raw input.bin) "
                   "[--conf C] [--iou I] [--dump out.bin]\n",
                   argv[0]);
      return 2;
    }
    std::string model_path = argv[1], src = argv[2];
    float conf = 0.25f, iou = 0.7f;
    std::string dump, raw_path, out_img;
    uint64_t seed = 0;
    bool rand_input = false;
    for (int k = 2; k < argc; k++) {
      std::string a = argv[k];
      if (a == "--conf" && k + 1 < argc) conf = std::stof(argv[++k]);
      else if (a == "--iou" && k + 1 < argc) iou = std::stof(argv[++k]);
      else if (a == "--dump" && k + 1 < argc) dump = argv[++k];
      else if (a == "--out" && k + 1 < argc) out_img = argv[++k];
      else if (a == "--rand" && k + 1 < argc) { rand_input = true; seed = std::stoull(argv[++k]); }
      else if (a == "--raw" && k + 1 < argc) raw_path = argv[++k];
    }

    std::ifstream mf(model_path, std::ios::binary);
    if (!mf) { std::fprintf(stderr, "cannot open %s\n", model_path.c_str()); return 2; }
    std::vector<uint8_t> blob((std::istreambuf_iterator<char>(mf)),
                              std::istreambuf_iterator<char>());
    Graph g = parse_model(blob);
    if (g.inputs.empty()) { std::fprintf(stderr, "model has no inputs\n"); return 2; }
    const ValueInfo& in0 = g.inputs[0];
    int64_t need = 1;
    for (auto d : in0.dims) need *= d;
    std::printf("model: %zu nodes, input %s [", g.nodes.size(), in0.name.c_str());
    for (size_t k = 0; k < in0.dims.size(); k++)
      std::printf("%s%lld", k ? "," : "", (long long)in0.dims[k]);
    std::printf("]\n");

    Tensor input;
    input.dt = U8;
    input.shape = in0.dims;
    LetterboxInfo lb{1.0, 0, 0};
    Image im;  // kept for --out annotation (PPM input path only)
    if (rand_input) {
      input.u.resize(size_t(need));
      uint64_t s = seed * 6364136223846793005ULL + 1442695040888963407ULL;
      for (auto& v : input.u) {
        s = s * 6364136223846793005ULL + 1442695040888963407ULL;
        v = uint8_t(s >> 56);
      }
    } else if (!raw_path.empty()) {
      std::ifstream rf(raw_path, std::ios::binary);
      input.u.assign((std::istreambuf_iterator<char>(rf)), std::istreambuf_iterator<char>());
      if (int64_t(input.u.size()) != need) {
        std::fprintf(stderr, "raw input has %zu bytes, need %lld\n", input.u.size(),
                     (long long)need);
        return 2;
      }
    } else {
      im = read_ppm(src);
      int size = int(in0.dims.size() >= 3 ? in0.dims[1] : 640);  // NHWC
      std::vector<uint8_t> lbimg;
      lb = letterbox(im, size, lbimg);
      input.u = std::move(lbimg);
    }

    std::map<std::string, Tensor> feeds;
    feeds[in0.name] = std::move(input);
    std::vector<Tensor> outs = run_graph(g, std::move(feeds));

    for (size_t k = 0; k < outs.size(); k++) {
      double mx = -INFINITY;
      for (int64_t j = 0; j < outs[k].numel(); j++) mx = std::max(mx, outs[k].get(j));
      std::printf("output %s: shape [", g.outputs[k].name.c_str());
      for (size_t d = 0; d < outs[k].shape.size(); d++)
        std::printf("%s%lld", d ? "," : "", (long long)outs[k].shape[d]);
      std::printf("] max %.4f\n", mx);
    }

    if (!dump.empty()) {
      std::ofstream df(dump, std::ios::binary);
      int32_t n = int32_t(outs.size());
      df.write((char*)&n, 4);
      for (auto& t : outs) {
        int32_t nd2 = int32_t(t.shape.size());
        df.write((char*)&nd2, 4);
        for (auto d : t.shape) df.write((char*)&d, 8);
        for (int64_t j = 0; j < t.numel(); j++) {
          float v = float(t.get(j));
          df.write((char*)&v, 4);
        }
      }
      std::printf("dumped %zu outputs to %s\n", outs.size(), dump.c_str());
    }

    // detect-style postprocess when outputs look like (1,A,4)+(1,A,nc)
    if (outs.size() >= 2 && outs[0].shape.size() == 3 && outs[0].shape[2] == 4 &&
        outs[1].shape.size() == 3 && outs[1].shape[1] == outs[0].shape[1]) {
      std::vector<Det> dets = postprocess(outs[0], outs[1], conf, iou, lb);
      std::printf("%zu detections (conf>=%.2f, iou=%.2f)\n", dets.size(), conf, iou);
      if (!out_img.empty() && im.w > 0) {
        write_annotated_ppm(im, dets, out_img);
        std::printf("annotated image -> %s\n", out_img.c_str());
      }
      // segmentation graphs add coeffs (1,A,nm) + protos (1,Hp,Wp,nm):
      // mask = sigmoid(coeff . protos), cropped to the box (the reference's
      // ops.process_mask, consumed by examples/YOLOv8-Segmentation-*)
      bool seg = outs.size() >= 4 && outs[2].shape.size() == 3 &&
                 outs[2].shape[1] == outs[0].shape[1] && outs[3].shape.size() == 4 &&
                 outs[3].shape[3] == outs[2].shape[2];
      for (size_t di = 0; di < dets.size(); di++) {
        const Det& d = dets[di];
        std::printf("class %d conf %.3f box [%.1f, %.1f, %.1f, %.1f]", d.cls, d.conf,
                    d.x1, d.y1, d.x2, d.y2);
        if (seg) {
          const int64_t best_a = d.anchor;  // carried through NMS
          float cx = float((d.x1 + d.x2) / 2 * lb.ratio) + lb.pad_x;
          float cy = float((d.y1 + d.y2) / 2 * lb.ratio) + lb.pad_y;
          float w = float((d.x2 - d.x1) * lb.ratio), h = float((d.y2 - d.y1) * lb.ratio);
          const Tensor& C = outs[2];
          const Tensor& Pr = outs[3];
          int64_t Hp = Pr.shape[1], Wp = Pr.shape[2], nm = Pr.shape[3];
          // proto grid covers the letterboxed input; crop mask to the box
          double sx = double(Wp), sy = double(Hp);
          double inH = double(in0.dims.size() >= 3 ? in0.dims[1] : 640);
          double inW = double(in0.dims.size() >= 4 ? in0.dims[2] : 640);
          int64_t bx1 = int64_t(std::floor((cx - w / 2) / inW * sx));
          int64_t by1 = int64_t(std::floor((cy - h / 2) / inH * sy));
          int64_t bx2 = int64_t(std::ceil((cx + w / 2) / inW * sx));
          int64_t by2 = int64_t(std::ceil((cy + h / 2) / inH * sy));
          bx1 = std::max<int64_t>(0, bx1); by1 = std::max<int64_t>(0, by1);
          bx2 = std::min(Wp, bx2); by2 = std::min(Hp, by2);
          int64_t area = 0;
          for (int64_t y = by1; y < by2; y++)
            for (int64_t x = bx1; x < bx2; x++) {
              double logit = 0;
              for (int64_t n2 = 0; n2 < nm; n2++)
                logit += double(C.f[size_t(best_a * nm + n2)]) *
                         double(Pr.f[size_t((y * Wp + x) * nm + n2)]);
              if (1.0 / (1.0 + std::exp(-logit)) > 0.5) area++;
            }
          std::printf(" mask_area %lld/%lldpx", (long long)area,
                      (long long)((bx2 - bx1) * (by2 - by1)));
        }
        std::printf("\n");
      }
    }
    return 0;
  } catch (const std::exception& e) {
    std::fprintf(stderr, "error: %s\n", e.what());
    return 1;
  }
}
