// Native data-loader core: GIL-free JPEG decode and NPZ (zip+npy) loading.
//
// The reference's input pipeline rides on PyTorch DataLoader worker
// *processes* (Detectron2 build.py; reference train_net.py:143-144 uses 2
// workers). This framework keeps loading in host threads; these C entry
// points release the GIL for the whole read+decode so the thread pool in
// threedod/data/build.py gets true parallelism:
//
//   loaderc.imread_rgb(path)      -> (H, W, 3) uint8
//   loaderc.npz_load(path, key)   -> float32/uint8/... array
//
// Python-side integration with PIL/numpy fallback: threedod/data/native_io.py.
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <jpeglib.h>
#include <zlib.h>

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------- file IO
bool read_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n < 0) {
    std::fclose(f);
    return false;
  }
  out.resize(static_cast<size_t>(n));
  size_t got = n ? std::fread(out.data(), 1, static_cast<size_t>(n), f) : 0;
  std::fclose(f);
  return got == static_cast<size_t>(n);
}

// ---------------------------------------------------------------- JPEG
struct JpegErr {
  jpeg_error_mgr mgr;
  std::jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* e = reinterpret_cast<JpegErr*>(cinfo->err);
  std::longjmp(e->jb, 1);
}

// decode `buf` (a whole JPEG file) into RGB; returns false on error
bool decode_jpeg(const std::vector<uint8_t>& buf, std::vector<uint8_t>& rgb,
                 int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf.data()), buf.size());
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  rgb.resize(static_cast<size_t>(*h) * (*w) * 3);
  size_t stride = static_cast<size_t>(*w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = rgb.data() + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------------------------------------------------------- zip/npz
uint16_t rd16(const uint8_t* p) { return p[0] | (p[1] << 8); }
uint32_t rd32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}

// find "<key>.npy" in the zip central directory; inflate/copy its payload
bool npz_member(const std::vector<uint8_t>& zip, const std::string& key,
                std::vector<uint8_t>& out) {
  const std::string want = key + ".npy";
  if (zip.size() < 22) return false;
  // locate End Of Central Directory (scan backwards, skip comment)
  size_t eocd = std::string::npos;
  size_t lo = zip.size() > (22 + 65536) ? zip.size() - 22 - 65536 : 0;
  for (size_t i = zip.size() - 22 + 1; i-- > lo;) {
    if (zip[i] == 0x50 && zip[i + 1] == 0x4b && zip[i + 2] == 0x05 &&
        zip[i + 3] == 0x06) {
      eocd = i;
      break;
    }
  }
  if (eocd == std::string::npos) return false;
  uint16_t count = rd16(&zip[eocd + 10]);
  size_t cd = rd32(&zip[eocd + 16]);
  for (uint16_t e = 0; e < count; ++e) {
    if (cd + 46 > zip.size() || rd32(&zip[cd]) != 0x02014b50) return false;
    uint16_t method = rd16(&zip[cd + 10]);
    uint32_t csize = rd32(&zip[cd + 20]);
    uint32_t usize = rd32(&zip[cd + 24]);
    uint16_t nlen = rd16(&zip[cd + 28]);
    uint16_t xlen = rd16(&zip[cd + 30]);
    uint16_t clen = rd16(&zip[cd + 32]);
    uint32_t lho = rd32(&zip[cd + 42]);
    std::string name(reinterpret_cast<const char*>(&zip[cd + 46]), nlen);
    cd += 46 + nlen + xlen + clen;
    if (name != want) continue;
    // local header: sizes may be deferred there; name/extra lens differ
    if (lho + 30 > zip.size() || rd32(&zip[lho]) != 0x04034b50) return false;
    uint16_t lnlen = rd16(&zip[lho + 26]);
    uint16_t lxlen = rd16(&zip[lho + 28]);
    size_t data = lho + 30 + lnlen + lxlen;
    if (data + csize > zip.size()) return false;
    out.resize(usize);
    if (method == 0) {  // stored
      if (csize != usize) return false;
      std::memcpy(out.data(), &zip[data], usize);
      return true;
    }
    if (method != 8) return false;  // only deflate
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, -MAX_WBITS) != Z_OK) return false;
    zs.next_in = const_cast<Bytef*>(&zip[data]);
    zs.avail_in = csize;
    zs.next_out = out.data();
    zs.avail_out = usize;
    int rc = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    return rc == Z_STREAM_END && zs.total_out == usize;
  }
  return false;
}

// parse an .npy payload: dtype char ('f'loat/'u'int/'i'nt/'b'ool), itemsize,
// shape; returns pointer to raw data inside `npy`
bool npy_parse(const std::vector<uint8_t>& npy, char* kind, int* itemsize,
               std::vector<npy_intp>& shape, const uint8_t** data,
               size_t* nbytes) {
  if (npy.size() < 10 || std::memcmp(npy.data(), "\x93NUMPY", 6) != 0)
    return false;
  uint8_t major = npy[6];
  size_t hlen, hoff;
  if (major == 1) {
    hlen = rd16(&npy[8]);
    hoff = 10;
  } else {
    hlen = rd32(&npy[8]);
    hoff = 12;
  }
  if (hoff + hlen > npy.size()) return false;
  std::string hdr(reinterpret_cast<const char*>(&npy[hoff]), hlen);
  // descr
  size_t d = hdr.find("'descr'");
  if (d == std::string::npos) return false;
  size_t q1 = hdr.find('\'', d + 7);
  size_t q2 = hdr.find('\'', q1 + 1);
  std::string descr = hdr.substr(q1 + 1, q2 - q1 - 1);  // e.g. <f4, |u1, |b1
  if (descr.size() < 3) return false;
  *kind = descr[1];
  *itemsize = std::atoi(descr.c_str() + 2);
  if (hdr.find("'fortran_order': True") != std::string::npos) return false;
  // shape
  size_t s = hdr.find("'shape'");
  size_t p1 = hdr.find('(', s);
  size_t p2 = hdr.find(')', p1);
  std::string tup = hdr.substr(p1 + 1, p2 - p1 - 1);
  shape.clear();
  const char* c = tup.c_str();
  while (*c) {
    while (*c == ' ' || *c == ',') ++c;
    if (!*c) break;
    shape.push_back(std::strtol(c, const_cast<char**>(&c), 10));
  }
  size_t total = 1;
  for (auto v : shape) total *= static_cast<size_t>(v);
  *nbytes = total * (*itemsize);
  if (hoff + hlen + *nbytes > npy.size()) return false;
  *data = npy.data() + hoff + hlen;
  return true;
}

int npy_typenum(char kind, int itemsize) {
  if (kind == 'f') return itemsize == 8 ? NPY_FLOAT64 : NPY_FLOAT32;
  if (kind == 'u') return itemsize == 1 ? NPY_UINT8 : itemsize == 2 ? NPY_UINT16 : NPY_UINT32;
  if (kind == 'i') return itemsize == 1 ? NPY_INT8 : itemsize == 2 ? NPY_INT16 : itemsize == 4 ? NPY_INT32 : NPY_INT64;
  if (kind == 'b') return NPY_BOOL;
  return -1;
}

// ---------------------------------------------------------------- bindings
PyObject* py_imread_rgb(PyObject*, PyObject* args) {
  const char* path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
  std::vector<uint8_t> buf, rgb;
  int h = 0, w = 0;
  bool ok;
  Py_BEGIN_ALLOW_THREADS;
  ok = read_file(path, buf) && decode_jpeg(buf, rgb, &h, &w);
  Py_END_ALLOW_THREADS;
  if (!ok) {
    PyErr_Format(PyExc_IOError, "loaderc: cannot decode jpeg '%s'", path);
    return nullptr;
  }
  npy_intp dims[3] = {h, w, 3};
  PyObject* arr = PyArray_SimpleNew(3, dims, NPY_UINT8);
  if (!arr) return nullptr;
  std::memcpy(PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr)), rgb.data(),
              rgb.size());
  return arr;
}

PyObject* py_npz_load(PyObject*, PyObject* args) {
  const char* path;
  const char* key;
  if (!PyArg_ParseTuple(args, "ss", &path, &key)) return nullptr;
  std::vector<uint8_t> zip, npy;
  char kind = 0;
  int itemsize = 0;
  std::vector<npy_intp> shape;
  const uint8_t* data = nullptr;
  size_t nbytes = 0;
  bool ok;
  Py_BEGIN_ALLOW_THREADS;
  ok = read_file(path, zip) && npz_member(zip, key, npy) &&
       npy_parse(npy, &kind, &itemsize, shape, &data, &nbytes);
  Py_END_ALLOW_THREADS;
  if (!ok) {
    PyErr_Format(PyExc_IOError, "loaderc: cannot load '%s' from '%s'", key, path);
    return nullptr;
  }
  int tn = npy_typenum(kind, itemsize);
  if (tn < 0) {
    PyErr_Format(PyExc_IOError, "loaderc: unsupported dtype %c%d", kind, itemsize);
    return nullptr;
  }
  PyObject* arr = PyArray_SimpleNew(static_cast<int>(shape.size()),
                                    shape.data(), tn);
  if (!arr) return nullptr;
  std::memcpy(PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr)), data, nbytes);
  return arr;
}

PyMethodDef methods[] = {
    {"imread_rgb", py_imread_rgb, METH_VARARGS,
     "Decode a JPEG file to an (H, W, 3) uint8 RGB array (GIL released)."},
    {"npz_load", py_npz_load, METH_VARARGS,
     "Load one array from an .npz by key (GIL released)."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moddef = {PyModuleDef_HEAD_INIT, "_loaderc",
                      "native data-loader core", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__loaderc(void) {
  import_array();
  return PyModule_Create(&moddef);
}
