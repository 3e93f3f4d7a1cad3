"""Lund/Cholesky Reynolds-stress coloring transform.

Reference: ``adapt1d`` (digitalfilters.py:143-178), ``adapt2prf`` (180-231),
``adapt2d`` (233-485).  All three share the same core: a per-point 3x3
Cholesky factor ``A`` of the target Reynolds-stress tensor

    R = [[uu, uv, uw],
         [uv, vv, vw],
         [uw, vw, ww]]

applied to the unit-variance correlated noise vector ``x`` plus the mean:
``u = A @ x + U``.  The reference clamps negative square-root arguments and
regularizes divisions with ``+1e-20`` (digitalfilters.py:203-223); we
implement those exact clamping semantics branch-free with ``jnp.where`` so the
transform vectorizes over the whole plane on the VPU.

The geometric set-up of the three ``adapt2d`` profile shapes (spline
re-interpolation of 1-D profiles onto the plane) lives in
``models/profiles.py`` — it is trace-time numpy work; only the per-point
coloring below is on the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lund_cholesky(uu, vv, ww, uv, uw, vw):
    """Batched lower-triangular Cholesky factor with the reference's clamping
    semantics (digitalfilters.py:196-223).  Inputs broadcast elementwise;
    returns the six nonzero entries ``(a00, a10, a11, a20, a21, a22)``.

    Clamps: any negative diagonal sqrt argument is clamped to 0, and any
    division by a zero pivot yields 0 (reference guards ``if A[0,0] > 0`` etc.
    plus the ``+1e-20`` regularizer).
    """
    eps = 1e-20
    a00 = jnp.sqrt(jnp.maximum(uu, 0.0))
    a10 = jnp.where(a00 > 0.0, uv / (a00 + eps), 0.0)
    a11sq = vv - a10 * a10
    a11 = jnp.sqrt(jnp.maximum(a11sq, 0.0))
    a20 = jnp.where(a00 > 0.0, uw / (a00 + eps), 0.0)
    a21 = jnp.where(a11 > 0.0, (vw - a10 * a20) / (a11 + eps), 0.0)
    a22sq = ww - a20 * a20 - a21 * a21
    a22 = jnp.sqrt(jnp.maximum(a22sq, 0.0))
    return a00, a10, a11, a20, a21, a22


def apply_lund(
    xu, xv, xw,
    uu, vv, ww, uv, uw, vw,
    mean_u, mean_v, mean_w,
):
    """Color unit-variance noise components with the target stresses and add
    the mean: ``(u, v, w) = A @ (xu, xv, xw) + (U, V, W)``.

    All arguments broadcast against the noise shape ``(..., jma, kma)``:

    * ``adapt1d``  -> stresses/mean are per-k vectors, ``uv = vw = 0``,
      ``mean_v = mean_w = 0`` (digitalfilters.py:143-178);
    * ``adapt2prf`` -> full (jma, kma) fields for all six stresses and all
      three means (digitalfilters.py:180-231);
    * ``adapt2d``  -> shaped (jma, kma) fields built by the profile models,
      ``mean_v = mean_w = 0`` (digitalfilters.py:233-485).
    """
    a00, a10, a11, a20, a21, a22 = lund_cholesky(uu, vv, ww, uv, uw, vw)
    u = a00 * xu + mean_u
    v = a10 * xu + a11 * xv + mean_v
    w = a20 * xu + a21 * xv + a22 * xw + mean_w
    return u, v, w


def apply_lund_stacked(noise, stresses, means):
    """Convenience wrapper over stacked tensors.

    noise:    (3, ..., jma, kma)        unit-variance correlated noise (u,v,w)
    stresses: tuple/list of 6 arrays broadcastable to (..., jma, kma):
              (uu, vv, ww, uv, uw, vw)
    means:    tuple/list of 3 arrays broadcastable to (..., jma, kma)
    returns   (3, ..., jma, kma) colored velocity
    """
    u, v, w = apply_lund(
        noise[0], noise[1], noise[2],
        stresses[0], stresses[1], stresses[2],
        stresses[3], stresses[4], stresses[5],
        means[0], means[1], means[2],
    )
    return jnp.stack([u, v, w], axis=0)
