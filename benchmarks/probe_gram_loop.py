"""Time the REAL streamed_gram loop at the flagship plane size (1024x512,
block 512, f32, Pallas) with a reduced snapshot count, decomposed per
column step — reproduces the flagship Gram-pass overhead (~1.64 s/column
measured in round 3 vs ~0.17 s accounted) without paying the full
10,240-step run.  The loop is inlined here so each constituent (generation
dispatch, GEMM dispatch, tile download) is timed inside the loop context —
the isolated-op probe (probe_gram_iter.py) measures the same ops fast,
so the overhead must live in the composition.

Prints one JSON line with per-column timings.

Usage: python benchmarks/probe_gram_loop.py [--nsteps 2048] [--group 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--nsteps", type=int, default=2048)
    ap.add_argument("--group", type=int, default=1)
    args = ap.parse_args()

    from pods_digital_filter_tpu import streaming
    from pods_digital_filter_tpu.config import (
        FilterConfig, PipelineConfig, PlaneConfig, PODFSConfig)
    from pods_digital_filter_tpu.parallel.mesh import to_host
    from pods_digital_filter_tpu.pipeline import resolve_profile

    base = PipelineConfig(
        plane=PlaneConfig(jma=1024, kma=512, res=0.001),
        filt=FilterConfig(length_scale_x=4.0, length_scale_y=4.0,
                          length_scale_z=4.0, fwidth=2.0),
        podfs=PODFSConfig(num_modes=20, energy_target=0.9),
        nsteps=args.nsteps, outdir="/tmp/probe_gram_loop", dtype="float32",
        streaming_block=512, use_pallas=True, gram_group=args.group,
    )
    fields, dt, filt, cfg, rotate = resolve_profile(base)
    block, ns = 512, cfg.nsteps

    import jax.numpy as jnp

    gen0 = streaming.make_centered_generator(
        cfg, fields, filt, block, ns, rotate,
        np.zeros(3 * 1024 * 512, np.float32))
    t0 = time.perf_counter()
    s = None
    for t in range(0, ns, block):
        cs = jnp.sum(gen0(t), axis=1)
        s = cs if s is None else s + cs
    m = (s / ns).block_until_ready()
    _ = to_host(m)
    mean_s = time.perf_counter() - t0

    gen_c = streaming.make_centered_generator(cfg, fields, filt, block, ns,
                                              rotate, m)

    starts = list(range(0, ns, block))
    nb = len(starts)
    C = np.zeros((ns, ns), dtype=np.float64)
    cols = []
    t_all = time.perf_counter()
    for bi in range(nb):
        ti = starts[bi]
        tg = time.perf_counter()
        Ai = gen_c(ti)
        tg = time.perf_counter() - tg            # dispatch only (async)
        for ji in range(bi, nb):
            tj = starts[ji]
            rec = {"bi": bi, "ji": ji}
            t1 = time.perf_counter()
            Aj = Ai if ji == bi else gen_c(tj)
            rec["gen_dispatch_s"] = round(time.perf_counter() - t1, 4)
            t1 = time.perf_counter()
            Cij = streaming._pair_products(Ai, Aj)
            rec["gemm_dispatch_s"] = round(time.perf_counter() - t1, 4)
            t1 = time.perf_counter()
            C[ti:ti + block, tj:tj + block] = to_host(Cij)
            rec["to_host_s"] = round(time.perf_counter() - t1, 4)
            cols.append(rec)
    gram_s = time.perf_counter() - t_all
    print(json.dumps({
        "metric": f"streamed_gram inline decomposition (1024x512 x {ns}, "
                  f"block 512)",
        "value": round(gram_s, 2), "unit": "s",
        "detail": {"mean_pass_s": round(mean_s, 2),
                   "columns": cols,
                   "gram_frob": float(np.linalg.norm(C))}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
