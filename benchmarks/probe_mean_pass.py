"""Instrument the flagship streaming-POD MEAN pass (raw generator +
jitted column-sum accumulation): per-block dispatch walls + periodic
hard-sync walls, to locate why the pass costs ~2.7 s/block while the SAME
generator streams at ~0.18 s/block inside the Gram pass.

Usage: python benchmarks/probe_mean_pass.py [--nsteps 1280] [--block 128]
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
    ap.add_argument("--nsteps", type=int, default=1280)
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--centered", action="store_true",
                    help="use the centered generator (the Gram pass's)")
    args = ap.parse_args()

    from pods_digital_filter_tpu import streaming
    from pods_digital_filter_tpu.config import (
        FilterConfig, PipelineConfig, PlaneConfig, PODFSConfig)
    from pods_digital_filter_tpu.parallel.mesh import hard_sync
    from pods_digital_filter_tpu.pipeline import make_generator, resolve_profile

    base = PipelineConfig(
        plane=PlaneConfig(jma=1024, kma=512, res=0.001),
        filt=FilterConfig(length_scale_x=4.0, length_scale_y=4.0,
                          length_scale_z=4.0, fwidth=2.0),
        podfs=PODFSConfig(num_modes=20, energy_target=0.9),
        nsteps=args.nsteps, outdir="/tmp/probe_mean", dtype="float32",
        streaming_block=args.block, use_pallas=True,
    )
    fields, dt, filt, cfg, rotate = resolve_profile(base)
    block, ns = args.block, cfg.nsteps

    if args.centered:
        gen = streaming.make_centered_generator(
            cfg, fields, filt, block, ns, rotate,
            np.zeros(3 * 1024 * 512, np.float32))
    else:
        gen_raw = make_generator(cfg, fields, filt, nsteps=block,
                                 rotate=rotate)

        def gen(t0):
            A = gen_raw(t0)
            n = min(block, ns - t0)
            return A[:, :n] if n < block else A

    t_all = time.perf_counter()
    s = None
    rec = []
    for i, t0 in enumerate(range(0, ns, block)):
        t1 = time.perf_counter()
        s = streaming._colsum(gen(t0)) if s is None \
            else streaming._colsum_acc(s, gen(t0))
        d = time.perf_counter() - t1
        t1 = time.perf_counter()
        hard_sync(s)
        rec.append((round(d, 3), round(time.perf_counter() - t1, 3)))
    m = s / ns
    hard_sync(m)
    total = time.perf_counter() - t_all
    # gram-style composition in the SAME process: centered gen + pair GEMM
    gen_c = streaming.make_centered_generator(
        cfg, fields, filt, block, ns, rotate,
        np.asarray(m, dtype=np.float32))
    Ai = gen_c(0)
    hard_sync(Ai)
    t1 = time.perf_counter()
    for i in range(1, 5):
        Cij = streaming._pair_products(Ai, gen_c(i * block))
        hard_sync(Cij)
    gram_style = (time.perf_counter() - t1) / 4
    print(json.dumps({
        "metric": f"mean pass ({'centered' if args.centered else 'raw'} "
                  f"gen, 1024x512 x {ns}, block {block})",
        "value": round(total, 2), "unit": "s",
        "detail": {"per_block_s": round(total * block / ns, 3),
                   "gram_style_per_column_s": round(gram_style, 3),
                   "dispatch_sync_pairs": rec}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
