/* Plain-C driver for the gcmce_* ABI -- proves a Fortran/C GCM can link and
 * drive the coupler without any Python in its own source (the reference's
 * ModelE integration shape [U]).
 *
 * Build+run (tests/test_modele_adapter.py does this automatically):
 *   gcc test_gcmce.c -o test_gcmce -L. -licebin_gcmce -Wl,-rpath,$PWD
 *   ./test_gcmce run.json
 */
#include "icebin_gcmce.h"

#include <stdio.h>
#include <stdlib.h>

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s run.json\n", argv[0]);
    return 2;
  }
  int h = gcmce_new(argv[1]);
  if (h <= 0) {
    fprintf(stderr, "gcmce_new failed\n");
    return 1;
  }
  int im, jm, nhc;
  if (gcmce_dims(h, &im, &jm, &nhc) != 0) return 1;
  printf("dims %d %d %d\n", im, jm, nhc);
  gcmce_set_start_time(h, 0.0);

  long long nE = (long long)im * jm * nhc;
  int nvar = 8; /* round-4 input contract: smb_mass, smb_enth, deltah,
                   heat_flux, tsurf, geothermal_flux, rain_mass, rain_enth */
  int64_t* idx = malloc(nE * sizeof(int64_t));
  double* vals = calloc((size_t)(nE * nvar), sizeof(double));
  for (long long k = 0; k < nE; ++k) {
    idx[k] = k;
    vals[k] = 1e-5;          /* smb_mass row */
    vals[4 * nE + k] = -5.0; /* tsurf row */
  }
  double* fhc = calloc((size_t)nE, sizeof(double));
  double* elevE = calloc((size_t)nE, sizeof(double));
  int32_t* under = calloc((size_t)nE, sizeof(int32_t));
  for (int step = 0; step < 2; ++step) {
    gcmce_add_gcm_outpute(h, idx, vals, nE, nvar);
    if (gcmce_couple_native(h, step * 2592000.0, fhc, elevE, under, nE)
        != 0) {
      fprintf(stderr, "couple failed at step %d\n", step);
      return 1;
    }
    /* fhc class sums must be ~1 on iced A cells */
    long long iced = 0;
    for (long long a = 0; a < (long long)im * jm; ++a) {
      double s = 0.0;
      for (int k = 0; k < nhc; ++k) s += fhc[(long long)k * im * jm + a];
      if (s > 0.0) {
        ++iced;
        if (s < 0.999999 || s > 1.000001) {
          fprintf(stderr, "bad fhc sum %f\n", s);
          return 1;
        }
      }
    }
    printf("step %d ok, iced cells %lld\n", step, iced);
  }
  gcmce_delete(h);
  printf("PASS\n");
  return 0;
}
