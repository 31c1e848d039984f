// gcmce_* C ABI: the Fortran-GCM-facing coupler boundary.
//
// Reference parity: ModelE's Fortran LISnow code calls C functions
// (gcmce_new, gcmce_set_start_time, gcmce_add_gcm_outpute,
// gcmce_couple_native) implemented in GCMCoupler_ModelE.cpp [U]
// (SURVEY.md sections 2, 3.3, 3.5).  Here the same C ABI embeds CPython and
// forwards to icebin_tpu.models.gcmce_shim, which drives the JAX/TPU
// coupler -- the Fortran GCM links this library exactly as it links the
// reference's, while the runtime underneath is the TPU framework.
//
// Threading: every entry ensures the GIL (a Fortran GCM may call from any
// thread; ctypes test harnesses release the GIL around foreign calls).
//
// Build: native/build_gcmce.sh (needs python3-config --embed flags).

#include <Python.h>

#include <cstdint>
#include <cstdio>

namespace {

PyObject* shim() {
  static PyObject* mod = nullptr;
  if (!mod) {
    mod = PyImport_ImportModule("icebin_tpu.models.gcmce_shim");
    if (!mod) PyErr_Print();
  }
  return mod;
}

struct Gil {
  PyGILState_STATE st;
  bool owned_init = false;
  Gil() {
    if (!Py_IsInitialized()) {
      Py_InitializeEx(0);
      owned_init = true;
    }
    st = PyGILState_Ensure();
  }
  ~Gil() { PyGILState_Release(st); }
};

long call_long(PyObject* r, long fallback) {
  if (!r) {
    PyErr_Print();
    return fallback;
  }
  long v = PyLong_Check(r) ? PyLong_AsLong(r) : fallback;
  Py_DECREF(r);
  return v;
}

}  // namespace

extern "C" {

int gcmce_new(const char* config_json_path) {
  Gil g;
  PyObject* m = shim();
  if (!m) return -1;
  PyObject* r = PyObject_CallMethod(m, "gcmce_new", "s", config_json_path);
  return static_cast<int>(call_long(r, -1));
}

void gcmce_delete(int h) {
  Gil g;
  PyObject* m = shim();
  if (!m) return;
  PyObject* r = PyObject_CallMethod(m, "gcmce_delete", "i", h);
  Py_XDECREF(r);
}

int gcmce_dims(int h, int* im, int* jm, int* nhc) {
  Gil g;
  PyObject* m = shim();
  if (!m) return -1;
  PyObject* r = PyObject_CallMethod(m, "gcmce_dims", "i", h);
  if (!r) {
    PyErr_Print();
    return -1;
  }
  int ok = PyArg_ParseTuple(r, "iii", im, jm, nhc) ? 0 : -1;
  Py_DECREF(r);
  return ok;
}

void gcmce_set_start_time(int h, double t0) {
  Gil g;
  PyObject* m = shim();
  if (!m) return;
  PyObject* r = PyObject_CallMethod(m, "gcmce_set_start_time", "id", h, t0);
  Py_XDECREF(r);
}

// idx: (n,) int64 ModelE ihc-major E indices; vals: (nvar, n) f64.
void gcmce_add_gcm_outpute(int h, const int64_t* idx, const double* vals,
                           int64_t n, int nvar) {
  Gil g;
  PyObject* m = shim();
  if (!m) return;
  PyObject* mv_i = PyMemoryView_FromMemory(
      reinterpret_cast<char*>(const_cast<int64_t*>(idx)), n * 8, PyBUF_READ);
  PyObject* mv_v = PyMemoryView_FromMemory(
      reinterpret_cast<char*>(const_cast<double*>(vals)), n * nvar * 8,
      PyBUF_READ);
  PyObject* r = PyObject_CallMethod(m, "gcmce_add_gcm_outpute", "iOOLi", h,
                                    mv_i, mv_v, (long long)n, nvar);
  if (!r) PyErr_Print();
  Py_XDECREF(r);
  Py_XDECREF(mv_i);
  Py_XDECREF(mv_v);
}

// fhc/elevE: (nhc*jm*im) f64 out; underice: (nhc*jm*im) int32 out.
int gcmce_couple_native(int h, double itime, double* fhc, double* elevE,
                        int32_t* underice, int64_t ncells_e) {
  Gil g;
  PyObject* m = shim();
  if (!m) return -1;
  PyObject* mv_f = PyMemoryView_FromMemory(reinterpret_cast<char*>(fhc),
                                           ncells_e * 8, PyBUF_WRITE);
  PyObject* mv_e = PyMemoryView_FromMemory(reinterpret_cast<char*>(elevE),
                                           ncells_e * 8, PyBUF_WRITE);
  PyObject* mv_u = PyMemoryView_FromMemory(reinterpret_cast<char*>(underice),
                                           ncells_e * 4, PyBUF_WRITE);
  PyObject* r = PyObject_CallMethod(m, "gcmce_couple_native", "idOOO", h,
                                    itime, mv_f, mv_e, mv_u);
  long rc = call_long(r, -1);
  Py_XDECREF(mv_f);
  Py_XDECREF(mv_e);
  Py_XDECREF(mv_u);
  return static_cast<int>(rc);
}

}  // extern "C"
