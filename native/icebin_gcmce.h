/* gcmce_* C ABI: Fortran-GCM-facing coupler boundary (see gcmce.cc).
 * Reference parity: the gcmce_* functions ModelE's LISnow Fortran calls
 * (GCMCoupler_ModelE.cpp [U]). */
#ifndef ICEBIN_GCMCE_H_
#define ICEBIN_GCMCE_H_
#include <stdint.h>
#ifdef __cplusplus
extern "C" {
#endif

/* Create a coupler from a RunConfig JSON; returns handle or -1. */
int gcmce_new(const char* config_json_path);
void gcmce_delete(int handle);
/* Atmosphere grid dims and elevation-class count. */
int gcmce_dims(int handle, int* im, int* jm, int* nhc);
void gcmce_set_start_time(int handle, double t0);
/* Per-rank sparse E-grid contribution: idx (n) int64 ModelE ihc-major
 * indices, vals (nvar, n) f64 row-major. */
void gcmce_add_gcm_outpute(int handle, const int64_t* idx,
                           const double* vals, int64_t n, int nvar);
/* One coupling step; writes ModelE-layout TOPO fields (nhc*jm*im each). */
int gcmce_couple_native(int handle, double itime, double* fhc,
                        double* elevE, int32_t* underice, int64_t ncells_e);

#ifdef __cplusplus
}
#endif
#endif /* ICEBIN_GCMCE_H_ */
