// Fast BOP annotation loader (CPython C API extension, no third-party deps).
//
// The reference stack (and our Python fallback) parse BOP scene_gt.json /
// scene_camera.json / scene_gt_info.json into Python dict-of-list-of-dicts;
// for train_pbr-scale sets (50k images x ~20 objects) that is hundreds of MB
// of Python objects and seconds of json.load per sequence.  This module
// parses the three schemas with a single-pass recursive-descent JSON reader
// and emits flat buffers:
//
//   parse_scene_gt(path)     -> (img_ids int64[N], counts int64[N],
//                                obj_ids int32[M], R float32[M,9],
//                                t float32[M,3])
//   parse_scene_camera(path) -> (img_ids int64[N], K float32[N,9],
//                                depth_scale float32[N])
//   parse_scene_gt_info(path)-> (img_ids int64[N], counts int64[N],
//                                bbox_obj float32[M,4],
//                                bbox_visib float32[M,4],
//                                visib_fract float32[M],
//                                px_count_visib int64[M])
//
// Buffers are returned as Python bytes; scflow_tpu.datasets.bop_store wraps
// them into numpy arrays (zero-copy via np.frombuffer) and provides a pure
// Python fallback with identical output.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <stdexcept>
#include <string>
#include <vector>

namespace {

struct Parser {
  const char* p;
  const char* end;

  explicit Parser(const std::string& s) : p(s.data()), end(s.data() + s.size()) {}

  [[noreturn]] void fail(const char* msg) {
    throw std::runtime_error(std::string("BOP json parse error: ") + msg);
  }

  void skip_ws() {
    while (p < end && (*p == ' ' || *p == '\n' || *p == '\t' || *p == '\r')) ++p;
  }

  bool peek(char c) {
    skip_ws();
    return p < end && *p == c;
  }

  void expect(char c) {
    skip_ws();
    if (p >= end || *p != c) fail("unexpected character");
    ++p;
  }

  double number() {
    skip_ws();
    char* q;
    double v = std::strtod(p, &q);
    if (q == p) fail("expected number");
    p = q;
    return v;
  }

  std::string string_key() {
    expect('"');
    const char* start = p;
    while (p < end && *p != '"') {
      if (*p == '\\') ++p;  // BOP keys never contain escapes; be tolerant
      ++p;
    }
    std::string s(start, p - start);
    expect('"');
    return s;
  }

  // skip any JSON value (used for unknown keys)
  void skip_value() {
    skip_ws();
    if (p >= end) fail("eof");
    char c = *p;
    if (c == '{') {
      expect('{');
      if (peek('}')) { expect('}'); return; }
      while (true) {
        string_key();
        expect(':');
        skip_value();
        if (peek(',')) { expect(','); continue; }
        expect('}');
        return;
      }
    } else if (c == '[') {
      expect('[');
      if (peek(']')) { expect(']'); return; }
      while (true) {
        skip_value();
        if (peek(',')) { expect(','); continue; }
        expect(']');
        return;
      }
    } else if (c == '"') {
      string_key();
    } else if (std::strncmp(p, "true", 4) == 0) {
      p += 4;
    } else if (std::strncmp(p, "false", 5) == 0) {
      p += 5;
    } else if (std::strncmp(p, "null", 4) == 0) {
      p += 4;
    } else {
      number();
    }
  }

  // parse a fixed-length numeric array into out[0..n)
  void number_array(double* out, int n) {
    expect('[');
    for (int i = 0; i < n; ++i) {
      out[i] = number();
      if (i + 1 < n) expect(',');
    }
    expect(']');
  }
};

std::string read_file(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) throw std::runtime_error(std::string("cannot open ") + path);
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string s;
  s.resize((size_t)n);
  size_t got = std::fread(s.data(), 1, (size_t)n, f);
  std::fclose(f);
  if ((long)got != n) throw std::runtime_error("short read");
  return s;
}

template <typename T>
PyObject* as_bytes(const std::vector<T>& v) {
  return PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(v.data()),
      (Py_ssize_t)(v.size() * sizeof(T)));
}

// ---- scene_gt.json: { "<img>": [ {obj_id, cam_R_m2c[9], cam_t_m2c[3]} ] }
PyObject* parse_scene_gt(PyObject*, PyObject* args) {
  const char* path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
  try {
    std::string buf;
    Py_BEGIN_ALLOW_THREADS
    buf = read_file(path);
    Py_END_ALLOW_THREADS

    std::vector<int64_t> img_ids, counts;
    std::vector<int32_t> obj_ids;
    std::vector<float> R, t;

    Py_BEGIN_ALLOW_THREADS
    Parser ps(buf);
    ps.expect('{');
    if (!ps.peek('}')) {
      while (true) {
        std::string key = ps.string_key();
        ps.expect(':');
        img_ids.push_back(std::atoll(key.c_str()));
        int64_t count = 0;
        ps.expect('[');
        if (!ps.peek(']')) {
          while (true) {
            ps.expect('{');
            double rr[9] = {0}, tt[3] = {0};
            int32_t oid = 0;
            while (true) {
              std::string k = ps.string_key();
              ps.expect(':');
              if (k == "obj_id") {
                oid = (int32_t)ps.number();
              } else if (k == "cam_R_m2c") {
                ps.number_array(rr, 9);
              } else if (k == "cam_t_m2c") {
                ps.number_array(tt, 3);
              } else {
                ps.skip_value();
              }
              if (ps.peek(',')) { ps.expect(','); continue; }
              ps.expect('}');
              break;
            }
            obj_ids.push_back(oid);
            for (double v : rr) R.push_back((float)v);
            for (double v : tt) t.push_back((float)v);
            ++count;
            if (ps.peek(',')) { ps.expect(','); continue; }
            ps.expect(']');
            break;
          }
        } else {
          ps.expect(']');
        }
        counts.push_back(count);
        if (ps.peek(',')) { ps.expect(','); continue; }
        ps.expect('}');
        break;
      }
    }
    Py_END_ALLOW_THREADS

    return Py_BuildValue(
        "(NNNNN)", as_bytes(img_ids), as_bytes(counts), as_bytes(obj_ids),
        as_bytes(R), as_bytes(t));
  } catch (const std::exception& e) {
    PyErr_SetString(PyExc_ValueError, e.what());
    return nullptr;
  }
}

// ---- scene_camera.json: { "<img>": {cam_K[9], depth_scale} }
PyObject* parse_scene_camera(PyObject*, PyObject* args) {
  const char* path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
  try {
    std::string buf;
    Py_BEGIN_ALLOW_THREADS
    buf = read_file(path);
    Py_END_ALLOW_THREADS

    std::vector<int64_t> img_ids;
    std::vector<float> K, depth_scale;

    Py_BEGIN_ALLOW_THREADS
    Parser ps(buf);
    ps.expect('{');
    if (!ps.peek('}')) {
      while (true) {
        std::string key = ps.string_key();
        ps.expect(':');
        img_ids.push_back(std::atoll(key.c_str()));
        double kk[9] = {0};
        double dscale = 1.0;
        ps.expect('{');
        while (true) {
          std::string k = ps.string_key();
          ps.expect(':');
          if (k == "cam_K") {
            ps.number_array(kk, 9);
          } else if (k == "depth_scale") {
            dscale = ps.number();
          } else {
            ps.skip_value();
          }
          if (ps.peek(',')) { ps.expect(','); continue; }
          ps.expect('}');
          break;
        }
        for (double v : kk) K.push_back((float)v);
        depth_scale.push_back((float)dscale);
        if (ps.peek(',')) { ps.expect(','); continue; }
        ps.expect('}');
        break;
      }
    }
    Py_END_ALLOW_THREADS

    return Py_BuildValue("(NNN)", as_bytes(img_ids), as_bytes(K),
                         as_bytes(depth_scale));
  } catch (const std::exception& e) {
    PyErr_SetString(PyExc_ValueError, e.what());
    return nullptr;
  }
}

// ---- scene_gt_info.json:
// { "<img>": [ {bbox_obj[4], bbox_visib[4], visib_fract, px_count_visib} ] }
PyObject* parse_scene_gt_info(PyObject*, PyObject* args) {
  const char* path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
  try {
    std::string buf;
    Py_BEGIN_ALLOW_THREADS
    buf = read_file(path);
    Py_END_ALLOW_THREADS

    std::vector<int64_t> img_ids, counts, px_count;
    std::vector<float> bbox_obj, bbox_visib, visib;

    Py_BEGIN_ALLOW_THREADS
    Parser ps(buf);
    ps.expect('{');
    if (!ps.peek('}')) {
      while (true) {
        std::string key = ps.string_key();
        ps.expect(':');
        img_ids.push_back(std::atoll(key.c_str()));
        int64_t count = 0;
        ps.expect('[');
        if (!ps.peek(']')) {
          while (true) {
            ps.expect('{');
            double bo[4] = {0}, bv[4] = {0};
            double vf = 1.0, pc = 0.0;
            while (true) {
              std::string k = ps.string_key();
              ps.expect(':');
              if (k == "bbox_obj") {
                ps.number_array(bo, 4);
              } else if (k == "bbox_visib") {
                ps.number_array(bv, 4);
              } else if (k == "visib_fract") {
                vf = ps.number();
              } else if (k == "px_count_visib") {
                pc = ps.number();
              } else {
                ps.skip_value();
              }
              if (ps.peek(',')) { ps.expect(','); continue; }
              ps.expect('}');
              break;
            }
            for (double v : bo) bbox_obj.push_back((float)v);
            for (double v : bv) bbox_visib.push_back((float)v);
            visib.push_back((float)vf);
            px_count.push_back((int64_t)pc);
            ++count;
            if (ps.peek(',')) { ps.expect(','); continue; }
            ps.expect(']');
            break;
          }
        } else {
          ps.expect(']');
        }
        counts.push_back(count);
        if (ps.peek(',')) { ps.expect(','); continue; }
        ps.expect('}');
        break;
      }
    }
    Py_END_ALLOW_THREADS

    return Py_BuildValue("(NNNNNN)", as_bytes(img_ids), as_bytes(counts),
                         as_bytes(bbox_obj), as_bytes(bbox_visib),
                         as_bytes(visib), as_bytes(px_count));
  } catch (const std::exception& e) {
    PyErr_SetString(PyExc_ValueError, e.what());
    return nullptr;
  }
}

PyMethodDef methods[] = {
    {"parse_scene_gt", parse_scene_gt, METH_VARARGS,
     "Parse a BOP scene_gt.json into flat buffers."},
    {"parse_scene_camera", parse_scene_camera, METH_VARARGS,
     "Parse a BOP scene_camera.json into flat buffers."},
    {"parse_scene_gt_info", parse_scene_gt_info, METH_VARARGS,
     "Parse a BOP scene_gt_info.json into flat buffers."},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_bop_annots",
                         "Fast BOP annotation parsing.", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__bop_annots(void) { return PyModule_Create(&moduledef); }
