"""Benchmark: the north-star metric of BASELINE.json —
filtered inlet samples/s/chip (grid-points x steps per second) for the
digital-filter generation hot path (spatial filter + temporal FIR + Lund),
compared against the reference's sequential scipy implementation measured on
this host's CPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def bench_tpu(jma=512, kma=512, nsteps=64, nf=8, ln=4.0, repeats=5):
    import jax
    import jax.numpy as jnp

    from pods_digital_filter_tpu.models import profiles as prof
    from pods_digital_filter_tpu.ops import filters, lund

    dtype = jnp.float32
    U, uu, vv, ww, uw = prof.build_profile(
        "hyperbolic-tangent", "top-hat", 1.0, 0.05, kma)
    fields = prof.fields_1d(U, uu, vv, ww, uw)
    stresses = tuple(jnp.asarray(s, dtype=dtype) for s in fields.stresses())
    means = tuple(jnp.asarray(m, dtype=dtype) for m in fields.means())

    @jax.jit
    def step(key, stresses, means):
        noise = filters.generate_correlated_noise(
            key, 0, nsteps, jma, kma, nf, nf, nf, ln, ln, ln,
            num_components=3, dtype=dtype)
        out = lund.apply_lund_stacked(noise, stresses, means)
        # scalar checksum forces completion even on runtimes whose
        # block_until_ready is effectively async (remote tunnels)
        return out, jnp.sum(out)

    key = jax.random.key(0)
    out, chk = step(key, stresses, means)
    float(chk)                          # compile + warmup + sync

    times = []
    for i in range(repeats):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        out, chk = step(k, stresses, means)
        float(chk)                      # host round-trip = hard sync
        times.append(time.perf_counter() - t0)
    dt = min(times)
    samples = jma * kma * nsteps
    return samples / dt, dt


def bench_cpu_reference(jma=128, kma=128, nsteps=4, nf=8, ln=4.0):
    """Reference-equivalent sequential scipy path (filter3DSciPy1D semantics:
    three 'valid' direct convolutions per component per step + per-point Lund)
    measured on this host, as the baseline the reference would achieve here."""
    import scipy.signal as sig

    k = np.arange(2 * nf + 1) - nf
    b = np.exp(-np.pi * k.astype(np.float64) ** 2 / (2.0 * ln * ln))
    b /= np.sqrt((b * b).sum())
    bx = b[:, None, None]
    by = b[None, :, None]
    bz = b[None, None, :]

    rng = np.random.RandomState(0)
    pdfr = np.sqrt(3.0)
    shape = (2 * nf + 1, jma + 2 * nf, kma + 2 * nf)
    bufs = [rng.uniform(-pdfr, pdfr, shape) for _ in range(3)]

    t0 = time.perf_counter()
    for _ in range(nsteps):
        for c in range(3):
            t1 = sig.convolve(bufs[c], bx, mode="valid", method="direct")
            t2 = sig.convolve(t1, by, mode="valid", method="direct")
            _ = sig.convolve(t2, bz, mode="valid", method="direct")[0]
            bufs[c] = np.roll(bufs[c], -1, axis=0)
            bufs[c][-1] = rng.uniform(-pdfr, pdfr, shape[1:])
    dt = time.perf_counter() - t0
    samples = jma * kma * nsteps
    return samples / dt, dt


def main():
    tpu_rate, tpu_dt = bench_tpu()
    cpu_rate, cpu_dt = bench_cpu_reference()
    result = {
        "metric": "filtered inlet samples/s/chip",
        "value": round(tpu_rate, 1),
        "unit": "grid-points*steps/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
        "detail": {
            "config": "512x512 plane, 64 steps, nf=8, ln=4, f32, filter+Lund",
            "step_wall_s": round(tpu_dt, 4),
            "cpu_reference_rate": round(cpu_rate, 1),
            "cpu_reference_config": "128x128 plane, 4 steps, same filter",
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
