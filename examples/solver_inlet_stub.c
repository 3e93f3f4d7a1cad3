/* solver_inlet_stub.c — minimal CFD-solver-side integration of the PODFS
 * replay library (the pattern the reference documents for PRECISE-UNS /
 * HYDRA / OpenFOAM / CFX, docs/usage/CFDCodeIntegration.rst:96-115, but
 * never ships).  Demonstrates the full solver loop against a model
 * directory and doubles as the link-level test of the public C API
 * (tests/test_native.py compiles and runs it against a generated model).
 *
 * Build (libpodfs_replay.so built per docs/cfd_integration.md):
 *
 *   cc -O2 solver_inlet_stub.c -o solver_inlet_stub \
 *      -L<libdir> -lpodfs_replay -lm -Wl,-rpath,<libdir>
 *
 * Usage:  ./solver_inlet_stub <model_dir> <nsteps>
 *
 * Prints one line per step:  step time mean(u1) rms(all-vars)
 * and a final "OK np=<np> nvars=<nv> nm=<nm>" on success.
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>

#include "podfs_replay.h"

int main(int argc, char **argv)
{
    const char *dir = argc > 1 ? argv[1] : "PODFS";
    long nsteps = argc > 2 ? strtol(argv[2], NULL, 10) : 8;
    podfs_model *m = podfs_load(dir);
    long np, nv, nm, s, i;
    double period, dt, *u;

    if (!m) {
        fprintf(stderr, "podfs_load failed for %s\n", dir);
        return 1;
    }
    np = podfs_num_points(m);
    nv = podfs_num_vars(m);
    nm = podfs_num_modes(m);
    period = podfs_period(m);
    dt = period / (double)nsteps;

    u = (double *)malloc(sizeof(double) * (size_t)np * (size_t)nv);
    if (!u) { podfs_free(m); return 1; }

    /* the solver loop: evaluate the inlet field every timestep */
    for (s = 0; s < nsteps; s++) {
        double t = fmod((double)s * dt, period);
        double mean_u = 0.0, rms = 0.0;
        if (podfs_eval(m, t, 1.0, u) != 0) {
            fprintf(stderr, "podfs_eval failed at step %ld\n", s);
            free(u); podfs_free(m); return 1;
        }
        for (i = 0; i < np; i++) mean_u += u[i * nv];
        for (i = 0; i < np * nv; i++) rms += u[i] * u[i];
        mean_u /= (double)np;
        rms = sqrt(rms / (double)(np * nv));
        if (!isfinite(mean_u) || !isfinite(rms)) {
            fprintf(stderr, "non-finite field at step %ld\n", s);
            free(u); podfs_free(m); return 1;
        }
        printf("step %ld t=%.6g mean_u=%.6g rms=%.6g\n", s, t, mean_u, rms);
    }
    printf("OK np=%ld nvars=%ld nm=%ld\n", np, nv, nm);
    free(u);
    podfs_free(m);
    return 0;
}
