// Native evaluation core for threedod (CPython C API, no pybind11).
//
// Role parity: the reference leans on pycocotools' C extensions
// (maskUtils.iou + the COCOeval hot loops, omni3d_evaluation.py:16,1416);
// this module provides the same two hot paths for the TPU framework's
// evaluator:
//   iou2d(dts, gts)            -> (D, G) float64 IoU matrix (XYWH boxes)
//   greedy_match(ious, thrs,   -> (dtm, gtm, dtIg) greedy COCO matching
//                gt_ignore, in_prox)
// Python falls back to the pure-numpy implementation when this extension
// is not built (threedod/evaluation/omni3d_eval.py).
//
// Build: python native/setup.py build_ext --inplace (from repo root), or
//        python -m threedod.utils.native_build

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cmath>
#include <vector>

static PyObject* evalc_iou2d(PyObject* self, PyObject* args) {
  PyObject *dts_obj, *gts_obj;
  if (!PyArg_ParseTuple(args, "OO", &dts_obj, &gts_obj)) return nullptr;

  PyArrayObject* dts = (PyArrayObject*)PyArray_FROM_OTF(
      dts_obj, NPY_FLOAT64, NPY_ARRAY_IN_ARRAY);
  PyArrayObject* gts = (PyArrayObject*)PyArray_FROM_OTF(
      gts_obj, NPY_FLOAT64, NPY_ARRAY_IN_ARRAY);
  if (!dts || !gts) {
    Py_XDECREF(dts);
    Py_XDECREF(gts);
    return nullptr;
  }

  npy_intp D = PyArray_DIM(dts, 0);
  npy_intp G = PyArray_DIM(gts, 0);
  npy_intp dims[2] = {D, G};
  PyArrayObject* out = (PyArrayObject*)PyArray_SimpleNew(2, dims, NPY_FLOAT64);
  double* o = (double*)PyArray_DATA(out);
  const double* d = (const double*)PyArray_DATA(dts);
  const double* g = (const double*)PyArray_DATA(gts);

  for (npy_intp i = 0; i < D; ++i) {
    const double dx = d[i * 4 + 0], dy = d[i * 4 + 1];
    const double dw = d[i * 4 + 2], dh = d[i * 4 + 3];
    const double da = dw * dh;
    for (npy_intp j = 0; j < G; ++j) {
      const double gx = g[j * 4 + 0], gy = g[j * 4 + 1];
      const double gw = g[j * 4 + 2], gh = g[j * 4 + 3];
      const double x1 = std::max(dx, gx);
      const double y1 = std::max(dy, gy);
      const double x2 = std::min(dx + dw, gx + gw);
      const double y2 = std::min(dy + dh, gy + gh);
      const double inter = std::max(0.0, x2 - x1) * std::max(0.0, y2 - y1);
      const double uni = da + gw * gh - inter;
      o[i * G + j] = uni > 0 ? inter / uni : 0.0;
    }
  }
  Py_DECREF(dts);
  Py_DECREF(gts);
  return (PyObject*)out;
}

// greedy_match(ious (D,G) f64, iou_thrs (T,) f64, gt_ignore (G,) int64,
//              in_prox (D,G) uint8 or None, gt_ids (G,) int64,
//              dt_ids (D,) int64)
//   -> (dtm (T,D) f64 holding matched gt id, gtm (T,G) f64 holding dt id,
//       dtIg (T,D) uint8)
// Faithful to Omni3Deval.evaluateImg's matching loop
// (omni3d_evaluation.py:1484-1530).
static PyObject* evalc_greedy_match(PyObject* self, PyObject* args) {
  PyObject *ious_o, *thrs_o, *gtig_o, *prox_o, *gtid_o, *dtid_o;
  if (!PyArg_ParseTuple(args, "OOOOOO", &ious_o, &thrs_o, &gtig_o, &prox_o,
                        &gtid_o, &dtid_o))
    return nullptr;

  PyArrayObject* ious = (PyArrayObject*)PyArray_FROM_OTF(
      ious_o, NPY_FLOAT64, NPY_ARRAY_IN_ARRAY);
  PyArrayObject* thrs = (PyArrayObject*)PyArray_FROM_OTF(
      thrs_o, NPY_FLOAT64, NPY_ARRAY_IN_ARRAY);
  PyArrayObject* gtig = (PyArrayObject*)PyArray_FROM_OTF(
      gtig_o, NPY_INT64, NPY_ARRAY_IN_ARRAY);
  PyArrayObject* gtid = (PyArrayObject*)PyArray_FROM_OTF(
      gtid_o, NPY_INT64, NPY_ARRAY_IN_ARRAY);
  PyArrayObject* dtid = (PyArrayObject*)PyArray_FROM_OTF(
      dtid_o, NPY_INT64, NPY_ARRAY_IN_ARRAY);
  PyArrayObject* prox = nullptr;
  bool has_prox = prox_o != Py_None;
  if (has_prox)
    prox = (PyArrayObject*)PyArray_FROM_OTF(prox_o, NPY_UINT8,
                                            NPY_ARRAY_IN_ARRAY);
  if (!ious || !thrs || !gtig || !gtid || !dtid || (has_prox && !prox)) {
    Py_XDECREF(ious); Py_XDECREF(thrs); Py_XDECREF(gtig);
    Py_XDECREF(gtid); Py_XDECREF(dtid); Py_XDECREF(prox);
    return nullptr;
  }

  const npy_intp D = PyArray_DIM(ious, 0);
  const npy_intp G = PyArray_DIM(ious, 1);
  const npy_intp T = PyArray_DIM(thrs, 0);
  const double* iou = (const double*)PyArray_DATA(ious);
  const double* th = (const double*)PyArray_DATA(thrs);
  const long long* ig = (const long long*)PyArray_DATA(gtig);
  const long long* gid = (const long long*)PyArray_DATA(gtid);
  const long long* did = (const long long*)PyArray_DATA(dtid);
  const unsigned char* px =
      has_prox ? (const unsigned char*)PyArray_DATA(prox) : nullptr;

  npy_intp dtm_dims[2] = {T, D};
  npy_intp gtm_dims[2] = {T, G};
  PyArrayObject* dtm =
      (PyArrayObject*)PyArray_ZEROS(2, dtm_dims, NPY_FLOAT64, 0);
  PyArrayObject* gtm =
      (PyArrayObject*)PyArray_ZEROS(2, gtm_dims, NPY_FLOAT64, 0);
  PyArrayObject* dtIg =
      (PyArrayObject*)PyArray_ZEROS(2, dtm_dims, NPY_UINT8, 0);
  double* dtm_p = (double*)PyArray_DATA(dtm);
  double* gtm_p = (double*)PyArray_DATA(gtm);
  unsigned char* dtig_p = (unsigned char*)PyArray_DATA(dtIg);

  for (npy_intp t = 0; t < T; ++t) {
    for (npy_intp dI = 0; dI < D; ++dI) {
      double best = std::min(th[t], 1.0 - 1e-10);
      npy_intp m = -1;
      for (npy_intp gI = 0; gI < G; ++gI) {
        if (has_prox && !px[dI * G + gI]) continue;
        if (gtm_p[t * G + gI] > 0) continue;
        if (m > -1 && ig[m] == 0 && ig[gI] == 1) break;
        if (iou[dI * G + gI] < best) continue;
        best = iou[dI * G + gI];
        m = gI;
      }
      if (m == -1) continue;
      dtig_p[t * D + dI] = (unsigned char)ig[m];
      dtm_p[t * D + dI] = (double)gid[m];
      gtm_p[t * G + m] = (double)did[dI];
    }
  }

  Py_DECREF(ious); Py_DECREF(thrs); Py_DECREF(gtig);
  Py_DECREF(gtid); Py_DECREF(dtid); Py_XDECREF(prox);
  return Py_BuildValue("(NNN)", dtm, gtm, dtIg);
}

static PyMethodDef EvalcMethods[] = {
    {"iou2d", evalc_iou2d, METH_VARARGS, "XYWH IoU matrix (D,4)x(G,4)->(D,G)"},
    {"greedy_match", evalc_greedy_match, METH_VARARGS,
     "COCO greedy matching over thresholds"},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef evalcmodule = {PyModuleDef_HEAD_INIT, "_evalc",
                                         "native eval core", -1, EvalcMethods};

PyMODINIT_FUNC PyInit__evalc(void) {
  import_array();
  return PyModule_Create(&evalcmodule);
}
