// Native wire-format codec for the translation response protocol.
//
// Encodes/decodes the little-endian binary layout fixed by the reference's
// shipped client decoders (reference server/to_json.py:65-86 +
// examples/response.cpp / response.rs):
//
//   response := i32 count, count * translation
//   translation := 4*i32 (minX minY maxX maxY), u8 bool is_bulleted_list,
//                  f32 angle, f32 prob, 3*u8 fg, 3*u8 bg,
//                  i32 n_text, n_text * (u32 len + utf8, u32 len + utf8),
//                  u32 len + background bytes
//
// The Python implementation concatenates thousands of small bytes objects
// per batch response; this extension writes a single pre-sized buffer.
// Built with setuptools (see native/setup.py); the Python layer falls back
// to the pure implementation when the extension is absent.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Writer {
  std::string buf;
  void raw(const void* p, size_t n) {
    buf.append(static_cast<const char*>(p), n);
  }
  void i32(int32_t v) { raw(&v, 4); }
  void u32(uint32_t v) { raw(&v, 4); }
  void f32(float v) { raw(&v, 4); }
  void u8(uint8_t v) { raw(&v, 1); }
};

// Extracts a long attribute/key from a dict.
bool get_long(PyObject* d, const char* key, long* out) {
  PyObject* v = PyDict_GetItemString(d, key);
  if (!v) return false;
  *out = PyLong_AsLong(v);
  return !(*out == -1 && PyErr_Occurred());
}

bool get_double(PyObject* d, const char* key, double* out) {
  PyObject* v = PyDict_GetItemString(d, key);
  if (!v) return false;
  *out = PyFloat_AsDouble(v);
  return !(*out == -1.0 && PyErr_Occurred());
}

// encode(list_of_dicts) -> bytes
//
// Each dict: minX/minY/maxX/maxY ints, is_bulleted_list bool, angle float,
// prob float, fg (r,g,b), bg (r,g,b), text {str: str},
// background bytes (raw).
PyObject* encode(PyObject* /*self*/, PyObject* args) {
  PyObject* items;
  if (!PyArg_ParseTuple(args, "O", &items)) return nullptr;
  if (!PyList_Check(items)) {
    PyErr_SetString(PyExc_TypeError, "expected a list of dicts");
    return nullptr;
  }
  Py_ssize_t count = PyList_Size(items);
  Writer w;
  w.buf.reserve(1 << 16);
  w.i32(static_cast<int32_t>(count));

  for (Py_ssize_t i = 0; i < count; ++i) {
    PyObject* d = PyList_GetItem(items, i);
    if (!PyDict_Check(d)) {
      PyErr_SetString(PyExc_TypeError, "list items must be dicts");
      return nullptr;
    }
    long minx, miny, maxx, maxy;
    double angle, prob;
    if (!get_long(d, "minX", &minx) || !get_long(d, "minY", &miny) ||
        !get_long(d, "maxX", &maxx) || !get_long(d, "maxY", &maxy) ||
        !get_double(d, "angle", &angle) || !get_double(d, "prob", &prob)) {
      PyErr_SetString(PyExc_KeyError, "missing numeric field");
      return nullptr;
    }
    w.i32(static_cast<int32_t>(minx));
    w.i32(static_cast<int32_t>(miny));
    w.i32(static_cast<int32_t>(maxx));
    w.i32(static_cast<int32_t>(maxy));
    PyObject* bullet = PyDict_GetItemString(d, "is_bulleted_list");
    w.u8(bullet && PyObject_IsTrue(bullet) ? 1 : 0);
    w.f32(static_cast<float>(angle));
    w.f32(static_cast<float>(prob));

    for (const char* key : {"fg", "bg"}) {
      PyObject* color = PyDict_GetItemString(d, key);
      for (int c = 0; c < 3; ++c) {
        long v = 0;
        if (color && PySequence_Check(color)) {
          PyObject* item = PySequence_GetItem(color, c);
          if (item) {
            v = PyLong_AsLong(item);
            Py_DECREF(item);
          }
        }
        w.u8(static_cast<uint8_t>(v));
      }
    }

    PyObject* text = PyDict_GetItemString(d, "text");
    if (!text || !PyDict_Check(text)) {
      PyErr_SetString(PyExc_KeyError, "missing text dict");
      return nullptr;
    }
    w.i32(static_cast<int32_t>(PyDict_Size(text)));
    PyObject *tk, *tv;
    Py_ssize_t pos = 0;
    while (PyDict_Next(text, &pos, &tk, &tv)) {
      Py_ssize_t klen, vlen;
      const char* ks = PyUnicode_AsUTF8AndSize(tk, &klen);
      const char* vs = PyUnicode_AsUTF8AndSize(tv, &vlen);
      if (!ks || !vs) return nullptr;
      w.u32(static_cast<uint32_t>(klen));
      w.raw(ks, klen);
      w.u32(static_cast<uint32_t>(vlen));
      w.raw(vs, vlen);
    }

    PyObject* bg = PyDict_GetItemString(d, "background");
    if (bg && PyBytes_Check(bg)) {
      Py_ssize_t blen = PyBytes_Size(bg);
      w.u32(static_cast<uint32_t>(blen));
      w.raw(PyBytes_AsString(bg), blen);
    } else {
      w.u32(0);
    }
  }
  return PyBytes_FromStringAndSize(w.buf.data(), w.buf.size());
}

struct Reader {
  const uint8_t* p;
  size_t left;
  bool ok = true;
  bool take(void* out, size_t n) {
    if (left < n) {
      ok = false;
      return false;
    }
    std::memcpy(out, p, n);
    p += n;
    left -= n;
    return true;
  }
  int32_t i32() { int32_t v = 0; take(&v, 4); return v; }
  uint32_t u32() { uint32_t v = 0; take(&v, 4); return v; }
  float f32() { float v = 0; take(&v, 4); return v; }
  uint8_t u8() { uint8_t v = 0; take(&v, 1); return v; }
};

// decode(bytes) -> list of dicts (inverse of encode)
PyObject* decode(PyObject* /*self*/, PyObject* args) {
  const char* data;
  Py_ssize_t size;
  if (!PyArg_ParseTuple(args, "y#", &data, &size)) return nullptr;
  Reader r{reinterpret_cast<const uint8_t*>(data),
           static_cast<size_t>(size)};
  int32_t count = r.i32();
  PyObject* out = PyList_New(0);
  for (int32_t i = 0; i < count && r.ok; ++i) {
    PyObject* d = PyDict_New();
    int32_t minx = r.i32(), miny = r.i32(), maxx = r.i32(), maxy = r.i32();
    uint8_t bullet = r.u8();
    float angle = r.f32(), prob = r.f32();
    uint8_t fg[3], bg3[3];
    r.take(fg, 3);
    r.take(bg3, 3);
    PyDict_SetItemString(d, "minX", PyLong_FromLong(minx));
    PyDict_SetItemString(d, "minY", PyLong_FromLong(miny));
    PyDict_SetItemString(d, "maxX", PyLong_FromLong(maxx));
    PyDict_SetItemString(d, "maxY", PyLong_FromLong(maxy));
    PyDict_SetItemString(d, "is_bulleted_list", PyBool_FromLong(bullet));
    PyDict_SetItemString(d, "angle", PyFloat_FromDouble(angle));
    PyDict_SetItemString(d, "prob", PyFloat_FromDouble(prob));
    PyDict_SetItemString(d, "fg",
        Py_BuildValue("(iii)", fg[0], fg[1], fg[2]));
    PyDict_SetItemString(d, "bg",
        Py_BuildValue("(iii)", bg3[0], bg3[1], bg3[2]));
    int32_t n_text = r.i32();
    PyObject* text = PyDict_New();
    for (int32_t t = 0; t < n_text && r.ok; ++t) {
      uint32_t klen = r.u32();
      std::string key(klen, '\0');
      r.take(key.data(), klen);
      uint32_t vlen = r.u32();
      std::string val(vlen, '\0');
      r.take(val.data(), vlen);
      PyDict_SetItemString(
          text, key.c_str(),
          PyUnicode_FromStringAndSize(val.data(), vlen));
    }
    PyDict_SetItemString(d, "text", text);
    Py_DECREF(text);
    uint32_t blen = r.u32();
    if (r.left < blen) r.ok = false;
    if (r.ok) {
      PyDict_SetItemString(d, "background",
          PyBytes_FromStringAndSize(
              reinterpret_cast<const char*>(r.p), blen));
      r.p += blen;
      r.left -= blen;
    }
    PyList_Append(out, d);
    Py_DECREF(d);
  }
  if (!r.ok) {
    Py_DECREF(out);
    PyErr_SetString(PyExc_ValueError, "truncated wire payload");
    return nullptr;
  }
  return out;
}

PyMethodDef methods[] = {
    {"encode", encode, METH_VARARGS,
     "encode(list_of_translation_dicts) -> bytes"},
    {"decode", decode, METH_VARARGS,
     "decode(bytes) -> list_of_translation_dicts"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "wirecodec",
                      "Native translation wire-format codec", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit_wirecodec() { return PyModule_Create(&module); }
