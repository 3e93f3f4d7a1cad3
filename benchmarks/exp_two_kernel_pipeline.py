"""Experiment (VERDICT r1 #7 final MFU attack): break the dependent
PRNG(VPU) -> GEMM(MXU) chain of the fused kernel with explicit cross-step
DMA double buffering — but at the *kernel* granularity, where Mosaic's
pipeliner actually overlaps work:

* kernel A (VPU-only): draw + unpack every noise slab, write to HBM — no
  MXU work, so nothing stalls; output blocks are DMA'd out while the next
  slab is drawn (standard Mosaic output pipelining).
* kernel B (MXU-only): the two Toeplitz GEMMs per slab, noise arriving as a
  double-buffered *input* BlockSpec — Mosaic prefetches slab i+1's noise by
  DMA while the MXU runs slab i (the emit_pipeline-style overlap the
  in-body scratch-ring experiment could not get, exp_pipelined_kernel.py).

Cost: one raw-noise HBM round trip (2 * slabs * jn*kn * dtype bytes).  The
round-1 two-kernel split (PRNG+GEMM1 | GEMM2) was 31% slower because kernel
1 kept the dependent chain AND paid the round trip; here the chain itself
is gone.  bf16 noise halves the traffic (the GEMMs run in bf16 anyway).

Variants measured at two plane sizes (512^2, 256^2), REPS amortized in one
scan, median-of-5:

  base      — production fused kernel (ops/pallas_filter._fused_spatial)
  split_f32 — kernel A (f32 noise) -> kernel B
  split_bf16— kernel A (bf16 noise) -> kernel B (bf16 GEMM input directly)
  xla_rng   — XLA Threefry noise -> kernel B (no Pallas PRNG at all)

Run on real TPU:  python benchmarks/exp_two_kernel_pipeline.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# persistent compile cache: repeat invocations (and timeout-split runs)
# reuse compiled executables instead of re-paying tunnel compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from pods_digital_filter_tpu.ops import filters
from pods_digital_filter_tpu.ops import pallas_filter as pf

NF = int(os.environ.get("EXP_NF", "8"))
LN = 4.0
NSTEPS = 64
REPS = 8
_SQRT3 = float(np.sqrt(3.0))


def _kernel_gemms(noise_ref, bzT_ref, byM_ref, out_ref):
    t = jnp.dot(noise_ref[0].astype(bzT_ref.dtype), bzT_ref[:],
                preferred_element_type=jnp.float32)
    out_ref[0] = jnp.dot(byM_ref[:], t.astype(byM_ref.dtype),
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("num_slabs", "jma", "kma",
                                             "num_components", "noise_dtype"))
def split_pipeline(seed_arr, bzT, byM, num_slabs, jma, kma, num_components,
                   noise_dtype=jnp.float32):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kn = bzT.shape[0]
    jn = byM.shape[1]
    total = num_components * num_slabs
    # kernel A: VPU-only noise -> HBM
    noise = pl.pallas_call(
        pf._noise_kernel_body,
        grid=(total,),
        in_specs=[pl.BlockSpec((1, 3), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, jn, kn), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, jn, kn), noise_dtype),
    )(seed_arr)
    # kernel B: MXU-only GEMMs, input double-buffered by Mosaic
    out = pl.pallas_call(
        _kernel_gemms,
        grid=(total,),
        in_specs=[
            pl.BlockSpec((1, jn, kn), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kn, kma), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((jma, jn), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, jma, kma), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, jma, kma), jnp.float32),
    )(noise, bzT, byM)
    return out.reshape(num_components, num_slabs, jma, kma)


def _noise_body_bitcast16(params_ref, out_ref):
    """16-bit unpack WITHOUT the lane-axis concatenate: bitcast a
    (jn/2, kn) uint32 draw straight to (jn, kn) int16 (pltpu.bitcast
    unpacks along the second-minor dim) — the halves land interleaved
    along j (statistically irrelevant) with zero shuffles."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pid = pl.program_id(0)
    num_slabs = params_ref[0, 2]
    comp = pid // num_slabs
    slab = params_ref[0, 1] + pid % num_slabs
    stream = comp * jnp.int32(1 << 22) + slab
    pltpu.prng_seed(params_ref[0, 0] + stream * jnp.int32(-1640531527))
    jn, kn = out_ref.shape[1], out_ref.shape[2]
    v16 = pltpu.bitcast(pltpu.prng_random_bits((jn // 2, kn)), jnp.int16)
    x = v16.astype(jnp.float32) * jnp.float32(2.0 * _SQRT3 / 65536.0)
    out_ref[0] = x.astype(out_ref.dtype)


def _noise_body_full32(params_ref, out_ref):
    """Full 32-bit draw per value (no unpack at all) — isolates whether the
    unpack/concat or the raw PRNG dominates."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pid = pl.program_id(0)
    num_slabs = params_ref[0, 2]
    comp = pid // num_slabs
    slab = params_ref[0, 1] + pid % num_slabs
    stream = comp * jnp.int32(1 << 22) + slab
    pltpu.prng_seed(params_ref[0, 0] + stream * jnp.int32(-1640531527))
    jn, kn = out_ref.shape[1], out_ref.shape[2]
    bits = pltpu.bitcast(pltpu.prng_random_bits((jn, kn)), jnp.int32)
    x = bits.astype(jnp.float32) * jnp.float32(2.0 * _SQRT3 * 2.0 ** -32)
    out_ref[0] = x.astype(out_ref.dtype)


def _noise_body_seed_once(params_ref, out_ref):
    """Seed only on the first grid step (continuous stream thereafter) —
    isolates the per-step cost of pltpu.prng_seed itself.  NOT
    counter-indexed; measurement-only."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _seed():
        pltpu.prng_seed(params_ref[0, 0])

    jn, kn = out_ref.shape[1], out_ref.shape[2]
    bits = pltpu.bitcast(pltpu.prng_random_bits((jn, kn // 2)), jnp.int32)
    lo = jnp.bitwise_and(bits, jnp.int32(0xFFFF)) - jnp.int32(32768)
    hi = jax.lax.shift_right_arithmetic(bits, 16)
    v = jnp.concatenate([lo, hi], axis=1)
    x = v.astype(jnp.float32) * jnp.float32(2.0 * _SQRT3 / 65536.0)
    out_ref[0] = x.astype(out_ref.dtype)


def _noise_body_noprng(params_ref, out_ref):
    """No PRNG at all — same casts/scale/store fed from an iota.  If this
    is as slow as the PRNG bodies the cost is the store/grid machinery;
    if it is fast, the prng_random_bits call itself is the cost."""
    from jax.experimental import pallas as pl

    pid = pl.program_id(0)
    jn, kn = out_ref.shape[1], out_ref.shape[2]
    bits = jax.lax.broadcasted_iota(jnp.int32, (jn, kn), 1) * (pid + 1)
    x = bits.astype(jnp.float32) * jnp.float32(2.0 * _SQRT3 * 2.0 ** -32)
    out_ref[0] = x.astype(out_ref.dtype)


def _noise_body_minimal(params_ref, out_ref):
    """Minimum elementwise work per noise value: bitcast the draw to int16
    and cast once to bf16 (the 2*sqrt(3)/65536 scale folds into the GEMM
    taps — linear, exact).  One cast + one store per element vs the
    production body's cast/mul/cast/store."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pid = pl.program_id(0)
    num_slabs = params_ref[0, 2]
    comp = pid // num_slabs
    slab = params_ref[0, 1] + pid % num_slabs
    stream = comp * jnp.int32(1 << 22) + slab
    pltpu.prng_seed(params_ref[0, 0] + stream * jnp.int32(-1640531527))
    jn, kn = out_ref.shape[1], out_ref.shape[2]
    v16 = pltpu.bitcast(pltpu.prng_random_bits((jn // 2, kn)), jnp.int16)
    out_ref[0] = v16.astype(out_ref.dtype)


def _noise_body_store_only(params_ref, out_ref):
    """Pure constant store — the floor of any per-slab kernel."""
    jn, kn = out_ref.shape[1], out_ref.shape[2]
    out_ref[0] = jnp.full((jn, kn), 0.5, out_ref.dtype)


def _fused_body_noprng(params_ref, bzT_ref, byM_ref, out_ref):
    """The production fused body with the PRNG phase replaced by an iota
    (same unpack-less f32 path, both GEMMs kept): isolates the PRNG+unpack
    cost INSIDE the fused kernel."""
    from jax.experimental import pallas as pl

    pid = pl.program_id(0)
    jn = byM_ref.shape[1]
    kn = bzT_ref.shape[0]
    v = jax.lax.broadcasted_iota(jnp.int32, (jn, kn), 1) * (pid + 1)
    x = v.astype(jnp.float32) * jnp.float32(2.0 * _SQRT3 / 65536.0)
    t = jnp.dot(x.astype(bzT_ref.dtype), bzT_ref[:],
                preferred_element_type=jnp.float32)
    out_ref[0] = jnp.dot(byM_ref[:], t.astype(byM_ref.dtype),
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("num_slabs", "jma", "kma",
                                             "num_components"))
def fused_noprng(seed_arr, bzT, byM, num_slabs, jma, kma, num_components):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kn = bzT.shape[0]
    jn = byM.shape[1]
    total = num_components * num_slabs
    out = pl.pallas_call(
        _fused_body_noprng,
        grid=(total,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((kn, kma), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((jma, jn), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, jma, kma), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, jma, kma), jnp.float32),
    )(seed_arr, bzT, byM)
    return out.reshape(num_components, num_slabs, jma, kma)


def _fused_body_dummy_in(params_ref, dummy_ref, bzT_ref, byM_ref, out_ref):
    """Production fused body + one tiny VMEM input block whose index_map
    cycles with the grid step: probes whether a cycling VMEM input flips
    Mosaic into pipelined (double-buffered) grid execution."""
    _kernel = pf._kernel_body
    _kernel(params_ref, bzT_ref, byM_ref, out_ref)
    out_ref[0, :8, :128] += dummy_ref[0]


@functools.partial(jax.jit, static_argnames=("num_slabs", "jma", "kma",
                                             "num_components"))
def fused_dummy_in(seed_arr, bzT, byM, num_slabs, jma, kma, num_components):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kn = bzT.shape[0]
    jn = byM.shape[1]
    total = num_components * num_slabs
    dummy = jnp.zeros((total, 8, 128), jnp.float32)
    out = pl.pallas_call(
        _fused_body_dummy_in,
        grid=(total,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kn, kma), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((jma, jn), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, jma, kma), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, jma, kma), jnp.float32),
    )(seed_arr, dummy, bzT, byM)
    return out.reshape(num_components, num_slabs, jma, kma)


@functools.partial(jax.jit, static_argnames=("num_slabs", "jma", "kma",
                                             "num_components"))
def gemm_only(seed_arr, bzT, byM, num_slabs, jma, kma, num_components,
              noise=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kn = bzT.shape[0]
    jn = byM.shape[1]
    total = num_components * num_slabs
    if noise is None:
        noise = jnp.zeros((total, jn, kn), bzT.dtype) + seed_arr[0, 0]
    out = pl.pallas_call(
        _kernel_gemms,
        grid=(total,),
        in_specs=[
            pl.BlockSpec((1, jn, kn), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kn, kma), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((jma, jn), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, jma, kma), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, jma, kma), jnp.float32),
    )(noise, bzT, byM)
    return out.reshape(num_components, num_slabs, jma, kma)


def _store2d_body(params_ref, out_ref):
    """Store-only with a 2-D (jma, kma) output block (no leading unit dim):
    probes whether the (1, j, k) block shape itself causes the per-element
    floor."""
    jn, kn = out_ref.shape
    out_ref[...] = jnp.full((jn, kn), 0.5, out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_slabs", "jma", "kma",
                                             "num_components"))
def store2d(seed_arr, bzT, byM, num_slabs, jma, kma, num_components):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    total = num_components * num_slabs
    out = pl.pallas_call(
        _store2d_body,
        grid=(total,),
        in_specs=[pl.BlockSpec((1, 3), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((jma, kma), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((jma, total * kma), jnp.float32),
    )(seed_arr)
    return out[:, ::257] * seed_arr[0, 0]


_NOISE_BODIES = {"noise": pf._noise_kernel_body,
                 "noise16b": _noise_body_bitcast16,
                 "noise32": _noise_body_full32,
                 "noise1seed": _noise_body_seed_once,
                 "noprng": _noise_body_noprng,
                 "noisemin": _noise_body_minimal,
                 "storeonly": _noise_body_store_only}


def _noise_body_batched(params_ref, out_ref):
    """G slabs per grid step, one seed + one big draw: divides any
    per-grid-step fixed cost by G."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pid = pl.program_id(0)
    g, jn, kn = out_ref.shape[1], out_ref.shape[2], out_ref.shape[3]
    num_groups = params_ref[0, 2]
    comp = pid // num_groups
    group = params_ref[0, 1] + pid % num_groups
    stream = comp * jnp.int32(1 << 22) + group
    pltpu.prng_seed(params_ref[0, 0] + stream * jnp.int32(-1640531527))
    bits = pltpu.bitcast(pltpu.prng_random_bits((g, jn, kn // 2)), jnp.int32)
    lo = jnp.bitwise_and(bits, jnp.int32(0xFFFF)) - jnp.int32(32768)
    hi = jax.lax.shift_right_arithmetic(bits, 16)
    v = jnp.concatenate([lo, hi], axis=2)
    x = v.astype(jnp.float32) * jnp.float32(2.0 * _SQRT3 / 65536.0)
    out_ref[0] = x.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_slabs", "jma", "kma",
                                             "num_components", "noise_dtype",
                                             "g"))
def noise_batched(seed_arr, bzT, byM, num_slabs, jma, kma, num_components,
                  noise_dtype=jnp.bfloat16, g=4):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kn = bzT.shape[0]
    jn = byM.shape[1]
    groups = (num_components * num_slabs) // g
    params = jnp.concatenate(
        [seed_arr[:, :2],
         jnp.asarray([[groups // num_components]], jnp.int32)], axis=1)
    noise = pl.pallas_call(
        _noise_body_batched,
        grid=(groups,),
        in_specs=[pl.BlockSpec((1, 3), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, g, jn, kn), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((groups, g, jn, kn), noise_dtype),
    )(params)
    return jnp.sum(noise[:, :, ::64, ::64].astype(jnp.float32),
                   keepdims=True) \
        * jnp.ones((num_components, num_slabs, 1, 1), jnp.float32)


@functools.partial(jax.jit, static_argnames=("num_slabs", "jma", "kma",
                                             "num_components", "noise_dtype",
                                             "body"))
def noise_only(seed_arr, bzT, byM, num_slabs, jma, kma, num_components,
               noise_dtype=jnp.bfloat16, body="noise"):
    """Kernel A alone (plus a cheap reduce so nothing is DCE'd): isolates
    the VPU PRNG + HBM-write cost for the decomposition write-up."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kn = bzT.shape[0]
    jn = byM.shape[1]
    total = num_components * num_slabs
    noise = pl.pallas_call(
        _NOISE_BODIES[body],
        grid=(total,),
        in_specs=[pl.BlockSpec((1, 3), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, jn, kn), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, jn, kn), noise_dtype),
    )(seed_arr)
    return jnp.sum(noise[:, ::64, ::64].astype(jnp.float32), keepdims=True) \
        * jnp.ones((num_components, num_slabs, 1, 1), jnp.float32)


@functools.partial(jax.jit, static_argnames=("num_slabs", "jma", "kma",
                                             "num_components"))
def xla_rng_pipeline(seed_arr, bzT, byM, num_slabs, jma, kma, num_components):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kn = bzT.shape[0]
    jn = byM.shape[1]
    total = num_components * num_slabs
    key = jax.random.fold_in(jax.random.key(seed_arr[0, 0]), seed_arr[0, 1])
    noise = jax.random.uniform(key, (total, jn, kn), jnp.float32,
                               -_SQRT3, _SQRT3).astype(bzT.dtype)
    out = pl.pallas_call(
        _kernel_gemms,
        grid=(total,),
        in_specs=[
            pl.BlockSpec((1, jn, kn), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kn, kma), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((jma, jn), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, jma, kma), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, jma, kma), jnp.float32),
    )(noise, bzT, byM)
    return out.reshape(num_components, num_slabs, jma, kma)


def make_loop(kernel_fn, BzT, ByM, num_slabs, jma, kma, **kw):
    @jax.jit
    def loop(seed0):
        def body(acc, i):
            params = jnp.stack(
                [seed0 + i, jnp.int32(0), jnp.int32(num_slabs)])[None, :]
            z = kernel_fn(params, BzT, ByM, num_slabs=num_slabs, jma=jma,
                          kma=kma, num_components=3, **kw)
            return acc + jnp.sum(z), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(REPS, dtype=jnp.int32))
        return acc

    return loop


def timed(fn, *args, label=""):
    float(fn(*args))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[2] / REPS
    print(f"{label:28s} {dt * 1e3:8.3f} ms/rep", flush=True)
    return dt


def main():
    num_slabs = NSTEPS + 2 * NF
    sizes = tuple(int(s) for s in
                  os.environ.get("EXP_SIZES", "512,256").split(","))
    variants = os.environ.get("EXP_VARIANTS", "base,f32,bf16,xla").split(",")
    for jma in sizes:
        kma = jma
        print(f"=== plane {jma}x{kma}, {num_slabs} slabs x3 comps ===",
              flush=True)
        bz = filters.gaussian_fir_coeffs(NF, LN, jnp.float32)
        ByM = filters.toeplitz_band(bz, jma).astype(jnp.bfloat16)
        BzT = filters.toeplitz_band(bz, kma).T.astype(jnp.bfloat16)
        seed_arr = jnp.asarray([[1, 0, num_slabs]], jnp.int32)

        if "base" in variants and "f32" in variants:
            base = pf._fused_spatial(seed_arr, BzT, ByM, num_slabs=num_slabs,
                                     jma=jma, kma=kma, num_components=3)
            sp32 = split_pipeline(seed_arr, BzT, ByM, num_slabs=num_slabs,
                                  jma=jma, kma=kma, num_components=3,
                                  noise_dtype=jnp.float32)
            # identical stream ids -> f32-noise split must be bitwise-close
            err = float(jnp.max(jnp.abs(base - sp32)))
            print(f"split_f32 max abs diff vs base: {err:.2e}", flush=True)

        ts = {}
        if "base" in variants:
            ts["base"] = timed(make_loop(pf._fused_spatial, BzT, ByM,
                                         num_slabs, jma, kma),
                               jnp.int32(1), label="base (fused)")
        if "f32" in variants:
            ts["f32"] = timed(make_loop(split_pipeline, BzT, ByM, num_slabs,
                                        jma, kma, noise_dtype=jnp.float32),
                              jnp.int32(1), label="split_f32")
        if "bf16" in variants:
            ts["bf16"] = timed(make_loop(split_pipeline, BzT, ByM, num_slabs,
                                         jma, kma, noise_dtype=jnp.bfloat16),
                               jnp.int32(1), label="split_bf16")
        if "xla" in variants:
            ts["xla"] = timed(make_loop(xla_rng_pipeline, BzT, ByM,
                                        num_slabs, jma, kma),
                              jnp.int32(1), label="xla_rng")
        for nb in ("noise", "noise16b", "noise32", "noise1seed", "noprng", "noisemin", "storeonly"):
            if nb in variants:
                ts[nb] = timed(make_loop(noise_only, BzT, ByM, num_slabs,
                                         jma, kma, noise_dtype=jnp.bfloat16,
                                         body=nb),
                               jnp.int32(1), label=f"{nb}_only (bf16)")
        if "store2d" in variants:
            ts["store2d"] = timed(
                make_loop(store2d, BzT, ByM, num_slabs, jma, kma),
                jnp.int32(1), label="store2d (jma, kma) blocks")
        if "fuseddummy" in variants:
            ts["fuseddummy"] = timed(
                make_loop(fused_dummy_in, BzT, ByM, num_slabs, jma, kma),
                jnp.int32(1), label="fused+dummy_vmem_in")
        if "gemmonly" in variants:
            ts["gemmonly"] = timed(
                make_loop(gemm_only, BzT, ByM, num_slabs, jma, kma),
                jnp.int32(1), label="gemm_only (zeros noise)")
        if "fusednoprng" in variants:
            ts["fusednoprng"] = timed(
                make_loop(fused_noprng, BzT, ByM, num_slabs, jma, kma),
                jnp.int32(1), label="fused_noprng")
        if "storef32" in variants:
            ts["storef32"] = timed(
                make_loop(noise_only, BzT, ByM, num_slabs, jma, kma,
                          noise_dtype=jnp.float32, body="storeonly"),
                jnp.int32(1), label="storeonly_f32")
        if "noisebatch" in variants:
            ts["noisebatch"] = timed(
                make_loop(noise_batched, BzT, ByM, num_slabs, jma, kma,
                          noise_dtype=jnp.bfloat16, g=4),
                jnp.int32(1), label="noise_batched_g4 (bf16)")
        if "base" in ts and len(ts) > 1:
            best = min(v for k, v in ts.items() if k != "base")
            print(f"best speedup vs base: {ts['base'] / best:.3f}x",
                  flush=True)
    return 0




# --------------------------------------------------------------------------
# In-kernel temporal FIR: ring buffer of spatially-filtered slabs in VMEM
# --------------------------------------------------------------------------

def _fused_temporal_body(params_ref, bzT_ref, byM_ref, bx_ref, out_ref,
                         ring_ref):
    """Per grid step: draw + both spatial GEMMs (as production), push the
    slab into a 17-deep bf16 VMEM ring, and for steps past the warm-up emit
    the temporally-filtered slab y = sum_i bx[i] * ring[s-16+i].  The
    kernel then outputs only the nsteps valid slabs and the XLA epilogue
    loses its big FIR pass."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pid = pl.program_id(0)
    num_slabs = params_ref[0, 2]
    comp = pid // num_slabs
    s = pid % num_slabs
    stream = comp * jnp.int32(1 << 22) + (params_ref[0, 1] + s)
    pltpu.prng_seed(params_ref[0, 0] + stream * jnp.int32(-1640531527))
    jn = byM_ref.shape[1]
    kn = bzT_ref.shape[0]
    depth = ring_ref.shape[0]

    v16 = pltpu.bitcast(pltpu.prng_random_bits((jn // 2, kn)), jnp.int16)
    x = v16.astype(bzT_ref.dtype)         # scale folded into byM
    t = jnp.dot(x, bzT_ref[:], preferred_element_type=jnp.float32)
    z = jnp.dot(byM_ref[:], t.astype(byM_ref.dtype),
                preferred_element_type=jnp.float32)
    ring_ref[s % depth] = z.astype(ring_ref.dtype)

    @pl.when(s >= depth - 1)
    def _emit():
        def body(i, acc):
            return acc + bx_ref[0, i] * ring_ref[
                (s - (depth - 1) + i) % depth].astype(jnp.float32)

        out_ref[0] = jax.lax.fori_loop(
            0, depth, body, jnp.zeros_like(out_ref[0]))

    @pl.when(s < depth - 1)
    def _warmup():
        out_ref[0] = jnp.zeros_like(out_ref[0])


@functools.partial(jax.jit, static_argnames=("num_slabs", "jma", "kma",
                                             "num_components", "depth"))
def fused_temporal(seed_arr, bzT, byM, bx, num_slabs, jma, kma,
                   num_components, depth):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kn = bzT.shape[0]
    jn = byM.shape[1]
    nsteps = num_slabs - (depth - 1)
    total = num_components * num_slabs

    def out_map(i):
        c = i // num_slabs
        s = i % num_slabs
        return (c, jnp.maximum(s - (depth - 1), 0), 0, 0)

    out = pl.pallas_call(
        _fused_temporal_body,
        grid=(total,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((kn, kma), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((jma, jn), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, depth), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, jma, kma), out_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (num_components, nsteps, jma, kma), jnp.float32),
        scratch_shapes=[pltpu.VMEM((depth, jma, kma), jnp.bfloat16)],
    )(seed_arr, bzT, byM, bx)
    return out


def run_fused_temporal():
    num_slabs = NSTEPS + 2 * NF
    depth = 2 * NF + 1
    jma = kma = int(os.environ.get("EXP_SIZES", "512").split(",")[0])
    bz = filters.gaussian_fir_coeffs(NF, LN, jnp.float32)
    bx = jnp.asarray(bz, jnp.float32)[None, :]
    alpha = jnp.float32(2.0 * _SQRT3 / 65536.0)
    ByM = (filters.toeplitz_band(bz, jma) * alpha).astype(jnp.bfloat16)
    BzT = filters.toeplitz_band(bz, kma).T.astype(jnp.bfloat16)
    seed_arr = jnp.asarray([[1, 0, num_slabs]], jnp.int32)

    y = fused_temporal(seed_arr, BzT, ByM, bx, num_slabs=num_slabs,
                       jma=jma, kma=kma, num_components=3, depth=depth)
    y = np.asarray(y)
    print("fused_temporal out", y.shape, "mean", y.mean(), "var", y.var(),
          flush=True)

    @jax.jit
    def loop(seed0):
        def body(acc, i):
            params = jnp.stack(
                [seed0 + i, jnp.int32(0), jnp.int32(num_slabs)])[None, :]
            z = fused_temporal(params, BzT, ByM, bx, num_slabs=num_slabs,
                               jma=jma, kma=kma, num_components=3,
                               depth=depth)
            return acc + jnp.sum(z), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(REPS, dtype=jnp.int32))
        return acc

    timed(loop, jnp.int32(1), label="fused_temporal (FIR in-kernel)")

    # reference: production kernel + XLA temporal FIR epilogue
    ByM2 = filters.toeplitz_band(bz, jma).astype(jnp.bfloat16)

    @jax.jit
    def loop_base(seed0):
        def body(acc, i):
            params = jnp.stack(
                [seed0 + i, jnp.int32(0), jnp.int32(num_slabs)])[None, :]
            z = pf._fused_spatial(params, BzT, ByM2, num_slabs=num_slabs,
                                  jma=jma, kma=kma, num_components=3)
            yb = filters.filter_temporal(z, bz, axis=-3)
            return acc + jnp.sum(yb), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(REPS, dtype=jnp.int32))
        return acc

    timed(loop_base, jnp.int32(1), label="base + XLA temporal FIR")



if __name__ == "__main__":
    if os.environ.get("EXP_TEMPORAL") == "1":
        run_fused_temporal()
        sys.exit(0)
    sys.exit(main())
