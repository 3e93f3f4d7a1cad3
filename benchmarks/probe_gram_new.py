"""Measure the restructured streamed_gram (device-resident strips) at the
flagship plane size with configurable (nsteps, block, group) — used to pick
the flagship --streaming_block/--gram_group and to record the round-4
before/after decomposition.

Regenerated-sample count scales as Ns^2 / (group*block): wider resident
panels cut generation work, smaller blocks let more of them fit in HBM
(gram_pass_hbm_estimate governs the budget).

Prints one JSON line.  Run twice (or with a warm /tmp/jax_cache) to
separate remote-tunnel compile time from steady state.

Usage: python benchmarks/probe_gram_new.py [--nsteps 2048] [--block 512]
       [--group 1]
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
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--group", type=int, default=1)
    args = ap.parse_args()

    import jax.numpy as jnp

    from pods_digital_filter_tpu import streaming
    from pods_digital_filter_tpu.config import (
        FilterConfig, PipelineConfig, PlaneConfig, PODFSConfig)
    from pods_digital_filter_tpu.pipeline import resolve_profile

    base = PipelineConfig(
        plane=PlaneConfig(jma=1024, kma=512, res=0.001),
        filt=FilterConfig(length_scale_x=4.0, length_scale_y=4.0,
                          length_scale_z=4.0, fwidth=2.0),
        podfs=PODFSConfig(num_modes=20, energy_target=0.9),
        nsteps=args.nsteps, outdir="/tmp/probe_gram_new", dtype="float32",
        streaming_block=args.block, use_pallas=True, gram_group=args.group,
    )
    fields, dt, filt, cfg, rotate = resolve_profile(base)
    block, ns = args.block, cfg.nsteps

    est = streaming.gram_pass_hbm_estimate(
        3 * 1024 * 512, block, args.group, 4, filt.nfx)

    gen0 = streaming.make_centered_generator(
        cfg, fields, filt, block, ns, rotate,
        np.zeros(3 * 1024 * 512, np.float32))
    t0 = time.perf_counter()
    s = None
    for t in range(0, ns, block):
        cs = streaming._colsum(gen0(t))
        s = cs if s is None else s + cs
    m = s / ns
    from pods_digital_filter_tpu.parallel.mesh import hard_sync
    hard_sync(m)
    mean_s = time.perf_counter() - t0

    gen_c = streaming.make_centered_generator(cfg, fields, filt, block, ns,
                                              rotate, m)
    t0 = time.perf_counter()
    C = streaming.streamed_gram(gen_c, ns, block, streaming._pair_products,
                                group=args.group)
    gram_s = time.perf_counter() - t0
    nb = (ns + block - 1) // block
    # regenerated column blocks (panel rows counted once each)
    ncols = sum(nb - min(g0 + args.group, nb)
                for g0 in range(0, nb, args.group)) + nb
    print(json.dumps({
        "metric": f"streamed_gram wall (1024x512 x {ns}, block {block}, "
                  f"group {args.group})",
        "value": round(gram_s, 2), "unit": "s",
        "detail": {"mean_pass_s": round(mean_s, 2),
                   "hbm_estimate_gib": round(est / 2 ** 30, 2),
                   "block_generations": ncols,
                   "gram_frob": float(np.linalg.norm(C))}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
