"""Experiment: software-pipeline PRNG (VPU) against the filter GEMMs (MXU)
inside the fused Pallas kernel.

Current production kernel (ops/pallas_filter.py): each grid step is a
dependent chain  PRNG draw -> unpack -> GEMM1 -> cast -> GEMM2, so the MXU
idles during the VPU phases.  Variant here: a 2-deep VMEM scratch ring of
*unpacked* noise; grid step i draws slab i+1's noise into scratch[(i+1)%2]
and GEMMs slab i's noise from scratch[i%2].  The draw for i+1 has no data
dependence on the GEMMs for i, so Mosaic may overlap the instruction
streams.

Run on real TPU:  python benchmarks/exp_pipelined_kernel.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pods_digital_filter_tpu.ops import filters
from pods_digital_filter_tpu.ops import pallas_filter as pf

JMA = KMA = 512
NF = 8
LN = 4.0
NSTEPS = 64
REPS = 8
_SQRT3 = float(np.sqrt(3.0))


def _draw_noise(params_ref, pid, jn, kn, dtype):
    """Seed + draw + unpack one slab of noise as in the production kernel."""
    from jax.experimental.pallas import tpu as pltpu

    num_slabs = params_ref[0, 2]
    comp = pid // num_slabs
    slab = params_ref[0, 1] + pid % num_slabs
    stream = comp * jnp.int32(1 << 22) + slab
    pltpu.prng_seed(params_ref[0, 0] + stream * jnp.int32(-1640531527))
    bits = pltpu.bitcast(pltpu.prng_random_bits((jn, kn // 2)), jnp.int32)
    lo = jnp.bitwise_and(bits, jnp.int32(0xFFFF)) - jnp.int32(32768)
    hi = jax.lax.shift_right_arithmetic(bits, 16)
    v = jnp.concatenate([lo, hi], axis=1)
    x = v.astype(jnp.float32) * jnp.float32(2.0 * _SQRT3 / 65536.0)
    return x.astype(dtype)


def _kernel_pipelined(params_ref, bzT_ref, byM_ref, out_ref, noise_ref):
    from jax.experimental import pallas as pl

    pid = pl.program_id(0)
    total = pl.num_programs(0)
    jn = byM_ref.shape[1]
    kn = bzT_ref.shape[0]
    dt = bzT_ref.dtype

    @pl.when(pid == 0)
    def _prime():
        noise_ref[0] = _draw_noise(params_ref, pid, jn, kn, dt)

    @pl.when(pid + 1 < total)
    def _prefetch():
        noise_ref[(pid + 1) % 2] = _draw_noise(params_ref, pid + 1, jn, kn, dt)

    x = noise_ref[pid % 2]
    t = jnp.dot(x, bzT_ref[:], preferred_element_type=jnp.float32)
    out_ref[0] = jnp.dot(byM_ref[:], t.astype(byM_ref.dtype),
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("num_slabs", "jma", "kma",
                                             "num_components"))
def fused_pipelined(seed_arr, bzT, byM, num_slabs, jma, kma, num_components):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kn = bzT.shape[0]
    jn = byM.shape[1]
    grid = (num_components * num_slabs,)
    out = pl.pallas_call(
        _kernel_pipelined,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((kn, kma), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((jma, jn), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, jma, kma), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (num_components * num_slabs, jma, kma), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, jn, kn), bzT.dtype)],
    )(seed_arr, bzT, byM)
    return out.reshape(num_components, num_slabs, jma, kma)


def make_loop(kernel_fn, BzT, ByM, num_slabs):
    """REPS kernel invocations amortized inside one jitted scan (per-iter
    seed dependence so nothing is hoisted), synced once — removes the ~25 ms
    tunnel round-trip from the measurement (see bench.py)."""

    @jax.jit
    def loop(seed0):
        def body(acc, i):
            params = jnp.stack(
                [seed0 + i, jnp.int32(0), jnp.int32(num_slabs)])[None, :]
            z = kernel_fn(params, BzT, ByM, num_slabs=num_slabs, jma=JMA,
                          kma=KMA, num_components=3)
            return acc + jnp.sum(z), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(REPS, dtype=jnp.int32))
        return acc

    return loop


def timed(fn, *args, label=""):
    float(fn(*args))  # compile + warmup + hard sync
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[2] / REPS
    print(f"{label:28s} {dt * 1e3:8.3f} ms/rep")
    return dt


def main():
    num_slabs = NSTEPS + 2 * NF
    bz = filters.gaussian_fir_coeffs(NF, LN, jnp.float32)
    for md in (jnp.float32, jnp.bfloat16):
        ByM = filters.toeplitz_band(bz, JMA).astype(md)
        BzT = filters.toeplitz_band(bz, KMA).T.astype(md)
        seed_arr = jnp.asarray([[1, 0, num_slabs]], jnp.int32)

        base = pf._fused_spatial(seed_arr, BzT, ByM, num_slabs=num_slabs,
                                 jma=JMA, kma=KMA, num_components=3)
        pipe = fused_pipelined(seed_arr, BzT, ByM, num_slabs=num_slabs,
                               jma=JMA, kma=KMA, num_components=3)
        # same stream ids -> identical noise -> identical output expected
        err = float(jnp.max(jnp.abs(base - pipe)) /
                    jnp.maximum(jnp.max(jnp.abs(base)), 1e-30))
        name = "bf16" if md == jnp.bfloat16 else "f32"
        print(f"--- matmul_dtype={name}  max rel diff vs base: {err:.2e}")
        t0 = timed(make_loop(pf._fused_spatial, BzT, ByM, num_slabs),
                   jnp.int32(1), label=f"baseline ({name})")
        t1 = timed(make_loop(fused_pipelined, BzT, ByM, num_slabs),
                   jnp.int32(1), label=f"pipelined ({name})")
        print(f"speedup: {t0 / t1:.3f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
