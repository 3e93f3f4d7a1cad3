"""Decompose one flagship Gram-pass iteration: where do the ~1.6 s/column
go?  Times, at the flagship configuration (1024x512 plane, block 512), the
three constituents of a column step in isolation:

  1. gen_c(t0)            — one centered block generation (Pallas fused)
  2. pair GEMM            — (3*Np, 512)^T @ (3*Np, 512)
  3. to_host(Cij)         — 512x512 tile download + f64 convert

and the composed step as the Gram loop executes it.  Prints one JSON line.
"""

from __future__ import annotations

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

    from pods_digital_filter_tpu import streaming
    from pods_digital_filter_tpu.config import (
        FilterConfig, PipelineConfig, PlaneConfig, PODFSConfig)
    from pods_digital_filter_tpu.pipeline import make_generator, resolve_profile

    base = PipelineConfig(
        plane=PlaneConfig(jma=1024, kma=512, res=0.001),
        filt=FilterConfig(length_scale_x=4.0, length_scale_y=4.0,
                          length_scale_z=4.0, fwidth=2.0),
        podfs=PODFSConfig(num_modes=20, energy_target=0.9),
        nsteps=10240, outdir="/tmp/probe_gram", dtype="float32",
        streaming_block=512, use_pallas=True,
    )
    fields, dt, filt, cfg, rotate = resolve_profile(base)
    block, ns = 512, cfg.nsteps

    gen_raw = make_generator(cfg, fields, filt, nsteps=block, rotate=rotate)
    m = (np.zeros(3 * 1024 * 512, np.float32))
    gen_c = streaming.make_centered_generator(cfg, fields, filt, block, ns,
                                              rotate, m)
    from pods_digital_filter_tpu.parallel.mesh import to_host

    def timed(label, fn, n=5):
        fn(0)  # warm/compile
        t0 = time.perf_counter()
        for i in range(n):
            fn(i)
        return label, (time.perf_counter() - t0) / n

    out = {}

    # 1. generation alone (block_until_ready to isolate)
    lbl, t = timed("gen_c_s", lambda i: gen_c(i * block).block_until_ready())
    out[lbl] = round(t, 4)
    lbl, t = timed("gen_raw_s",
                   lambda i: gen_raw(i * block).block_until_ready())
    out[lbl] = round(t, 4)

    # 2. pair GEMM alone on two resident blocks
    Ai = gen_c(0)
    Aj = gen_c(block)
    Ai.block_until_ready(), Aj.block_until_ready()
    lbl, t = timed("gemm_s", lambda i: streaming._pair_products(
        Ai, Aj).block_until_ready())
    out[lbl] = round(t, 4)

    # 3. tile download
    Cij = streaming._pair_products(Ai, Aj)
    Cij.block_until_ready()
    lbl, t = timed("tile_to_host_s", lambda i: to_host(Cij))
    out[lbl] = round(t, 4)

    # 4. composed column step exactly as streamed_gram runs it
    def col_step(i):
        Aj2 = gen_c((i % 19 + 1) * block)
        Cij2 = streaming._pair_products(Ai, Aj2)
        _ = to_host(Cij2)

    lbl, t = timed("column_step_s", col_step)
    out[lbl] = round(t, 4)

    print(json.dumps({"metric": "flagship gram column-step decomposition",
                      "value": out["column_step_s"], "unit": "s",
                      "detail": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
