"""Benchmark: j-tiled fused kernel vs the XLA path at planes beyond the
full-slab VMEM guard (round-2 verdict weak #4 / next-step 4).

The round-2 kernel silently fell back to XLA at 1024x1024 (slab working
set ~20 MiB > the 12 MiB guard); the tiled kernel keeps the fused path
available there.  This measures both paths (plus bf16 taps) at the shapes
that matter and prints one JSON line per shape.

Run on the real chip:  python benchmarks/bench_tiled.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NF, LN = 8, 4.0
NSTEPS = 16
REPS = 8


def measure(fn, *args):
    out = fn(*args)
    float(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return sorted(times)[1] / REPS


def bench_shape(jma, kma):
    import jax
    import jax.numpy as jnp

    from pods_digital_filter_tpu.ops import filters, pallas_filter as pf

    num_slabs = NSTEPS + 2 * NF
    bx = filters.gaussian_fir_coeffs(NF, LN, jnp.float32)

    @jax.jit
    def xla_loop(key):
        def body(acc, i):
            y = filters.generate_correlated_noise(
                jax.random.fold_in(key, i), 0, NSTEPS, jma, kma,
                NF, NF, NF, LN, LN, LN, num_components=3,
                dtype=jnp.float32)
            return acc + jnp.sum(y), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(REPS))
        return acc

    def make_tiled(md):
        BzT = filters.toeplitz_band(bx, kma).T.astype(md)
        ByM_loc = filters.toeplitz_band(bx, pf._TILE_J).astype(md)

        @jax.jit
        def tiled_loop(seed0):
            def body(acc, i):
                params = jnp.concatenate(
                    [(seed0 + i)[None],
                     jnp.asarray([0, num_slabs, NF], jnp.int32)])[None, :]
                z = pf._fused_spatial_tiled(
                    params, BzT, ByM_loc, num_slabs=num_slabs, jma=jma,
                    kma=kma, nfy=NF, num_components=3, interpret=False)
                y = filters.filter_temporal(z, bx, axis=-3)
                return acc + jnp.sum(y), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(REPS, dtype=jnp.int32))
            return acc

        return tiled_loop

    samples = jma * kma * NSTEPS
    res = {"shape": f"{jma}x{kma}", "nf": NF,
           "full_kernel_fits": pf.fused_spatial_available(jma, kma, NF, NF),
           "tiled_fits": pf.fused_spatial_tiled_available(jma, kma, NF, NF)}
    dt = measure(xla_loop, jax.random.key(0))
    res["xla_rate"] = round(samples / dt, 1)
    for name, md in (("tiled_f32", jnp.float32), ("tiled_bf16", jnp.bfloat16)):
        try:
            dt = measure(make_tiled(md), jnp.int32(1))
            res[name + "_rate"] = round(samples / dt, 1)
        except Exception as e:
            res[name + "_rate"] = f"failed: {type(e).__name__}: {e}"
    best = max(v for k, v in res.items()
               if k.endswith("_rate") and isinstance(v, float))
    res["tiled_vs_xla"] = round(
        max(res.get("tiled_f32_rate", 0) if isinstance(res.get("tiled_f32_rate"), float) else 0,
            res.get("tiled_bf16_rate", 0) if isinstance(res.get("tiled_bf16_rate"), float) else 0)
        / res["xla_rate"], 3)
    res["best_rate"] = best
    return res


def main():
    for jma, kma in ((1024, 1024), (1024, 512)):
        print(json.dumps(bench_shape(jma, kma)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
