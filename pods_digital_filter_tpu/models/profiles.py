"""Inlet profile models: synthetic mean/turbulence profiles and the shaped
2-D stress fields for the three ``adapt2d`` inlet families.

Reference:

* ``build_profile`` (digitalfilters.py:1038-1062): tanh mean profile
  ``U = U0/2 * (1 + tanh(10*(-|y| + 0.5)))`` on ``y in [-0.5, 0.5]`` with
  ``top-hat`` (``uu = vv = ww = (TI*U)^2``) or ``none`` turbulence;
* ``adapt2d`` setup geometry (digitalfilters.py:233-485): spline
  re-interpolation of the 1-D profiles over the plane for the
  ``double-hyperbolic-tangent`` (planar jet), ``circular-hyperbolic-tangent``
  (round jet) and ``ring-hyperbolic-tangent`` (annular jet) shapes.

All of this is trace-time host numpy/scipy — the resulting (jma, kma) stress
and mean fields are constants of the jitted generation step.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from scipy import interpolate

MEAN_PROFILES = (
    "hyperbolic-tangent",
    "double-hyperbolic-tangent",
    "circular-hyperbolic-tangent",
    "ring-hyperbolic-tangent",
)
TURB_PROFILES = ("top-hat", "none")


def build_profile(
    mean_profile: str,
    turb_profile: str,
    bulk_velocity: float,
    turbulence_intensity: float,
    kma: int,
):
    """1-D synthetic profiles ``(U, uu, vv, ww, uw)`` of length ``kma``."""
    if mean_profile not in MEAN_PROFILES:
        raise ValueError(
            f"Invalid mean_profile {mean_profile!r}; options: {MEAN_PROFILES}"
        )
    y = np.linspace(-0.5, 0.5, kma)
    U = bulk_velocity / 2 * (1.0 + np.tanh(10.0 * (-np.abs(y) + 0.5)))

    if turb_profile == "top-hat":
        uu = (turbulence_intensity * U) ** 2
        vv = (turbulence_intensity * U) ** 2
        ww = (turbulence_intensity * U) ** 2
        uw = 0.0 * U
    elif turb_profile == "none":
        uu = np.zeros(kma)
        vv = np.zeros(kma)
        ww = np.zeros(kma)
        uw = np.zeros(kma)
    else:
        raise ValueError(
            f"Invalid turb_profile {turb_profile!r}; options: {TURB_PROFILES}"
        )
    return U, uu, vv, ww, uw


def clamp_negative_stresses(uu, vv, ww):
    """main()'s pre-filter clamp of negative normal stresses
    (digitalfilters.py:1347-1354)."""
    return np.maximum(uu, 0.0), np.maximum(vv, 0.0), np.maximum(ww, 0.0)


@dataclass
class PlaneStressFields:
    """Per-point target statistics on the (jma, kma) plane, ready for the
    batched Lund transform.  Entries broadcast against (jma, kma)."""

    mean_u: np.ndarray
    mean_v: np.ndarray
    mean_w: np.ndarray
    uu: np.ndarray
    vv: np.ndarray
    ww: np.ndarray
    uv: np.ndarray
    uw: np.ndarray
    vw: np.ndarray

    def stresses(self):
        return (self.uu, self.vv, self.ww, self.uv, self.uw, self.vw)

    def means(self):
        return (self.mean_u, self.mean_v, self.mean_w)


def fields_1d(U, uu, vv, ww, uw) -> PlaneStressFields:
    """adapt1d layout (digitalfilters.py:143-178): per-k vectors broadcast
    along j; ``uv = vw = 0``; mean enters the u component only."""
    z = np.zeros_like(np.asarray(U, dtype=np.float64))
    return PlaneStressFields(
        mean_u=np.asarray(U, dtype=np.float64),
        mean_v=z, mean_w=z,
        uu=np.asarray(uu, dtype=np.float64),
        vv=np.asarray(vv, dtype=np.float64),
        ww=np.asarray(ww, dtype=np.float64),
        uv=z, uw=np.asarray(uw, dtype=np.float64), vw=z,
    )


def fields_2d_prf(U, V, W, uu, vv, ww, uv, uw, vw) -> PlaneStressFields:
    """adapt2prf layout (digitalfilters.py:180-231): full (jma, kma) fields."""
    f = lambda x: np.asarray(x, dtype=np.float64)
    return PlaneStressFields(
        mean_u=f(U), mean_v=f(V), mean_w=f(W),
        uu=f(uu), vv=f(vv), ww=f(ww), uv=f(uv), uw=f(uw), vw=f(vw),
    )


def _splev_1d(zi, z, vals):
    return interpolate.splev(zi, interpolate.splrep(z, vals, s=0), der=0)


def fields_double_tanh(U, uu, vv, ww, uw, jma: int, kma: int) -> PlaneStressFields:
    """Planar (square) jet: ``double-hyperbolic-tangent``
    (digitalfilters.py:238-307).

    The 1-D profiles are spline-resampled along j; the 2-D fields are the
    geometric means ``R(j,k) = sqrt(p[k] * p_j[j])`` with the reference's
    boundary resets, negative-interpolant clamps, and the signed geometric
    mean for uw.
    """
    zArr = np.linspace(-1.0, 1.0, kma)
    zi = np.linspace(-1.0, 1.0, jma)
    uinj = _splev_1d(zi, zArr, U)
    uuinj = _splev_1d(zi, zArr, uu)
    vvinj = _splev_1d(zi, zArr, vv)
    wwinj = _splev_1d(zi, zArr, ww)
    uwinj = _splev_1d(zi, zArr, uw)
    for arrj, arr in ((uinj, U), (uuinj, uu), (vvinj, vv), (wwinj, ww), (uwinj, uw)):
        arrj[0] = arr[0]
        arrj[-1] = arr[-1]
    uuinj = np.maximum(uuinj, 0.0)
    vvinj = np.maximum(vvinj, 0.0)
    wwinj = np.maximum(wwinj, 0.0)

    J = lambda a: np.asarray(a)[:, None]   # (jma, 1)
    K = lambda a: np.asarray(a)[None, :]   # (1, kma)
    uu2 = np.sqrt(K(uu) * J(uuinj))
    vv2 = np.sqrt(K(vv) * J(vvinj))
    ww2 = np.sqrt(K(ww) * J(wwinj))
    uw2 = np.sign(K(uw) + J(uwinj)) * np.sqrt(np.abs(K(uw) * J(uwinj)))
    mean_u = np.sqrt(K(U) * J(uinj))
    zero = np.zeros((jma, kma))
    return PlaneStressFields(
        mean_u=mean_u, mean_v=zero, mean_w=zero,
        uu=uu2, vv=vv2, ww=ww2, uv=zero, uw=uw2, vw=zero,
    )


def _radial_fields(U, uu, vv, ww, uw, jma, kma, zArr, r_inner_reset, r_inner_vals,
                   inner_zero: float | None):
    """Shared radial machinery for the circular and ring shapes."""
    x = np.linspace(-1.0, 1.0, jma)
    y = np.linspace(-1.0, 1.0, kma)
    tcks = [interpolate.splrep(zArr, v, s=0) for v in (U, uu, vv, ww, uw)]

    r = np.sqrt(x[:, None] ** 2 + y[None, :] ** 2)   # (jma, kma)
    vals = [interpolate.splev(r, t, der=0) for t in tcks]

    # boundary resets (exact floating comparisons as in the reference)
    inner_mask = r == r_inner_reset
    outer_mask = r == 1.0
    for v, (iv, ov) in zip(vals, r_inner_vals):
        v[inner_mask] = iv
        v[outer_mask] = ov
    # outside the outer radius -> zero
    out = r > 1.0
    for v in vals:
        v[out] = 0.0
    if inner_zero is not None:
        inside = r < inner_zero
        for v in vals:
            v[inside] = 0.0

    Ur, uur, vvr, wwr, uwr = vals
    zero = np.zeros((jma, kma))
    return PlaneStressFields(
        mean_u=Ur, mean_v=zero, mean_w=zero,
        uu=uur, vv=vvr, ww=wwr, uv=zero, uw=uwr, vw=zero,
    )


def fields_circular_tanh(U, uu, vv, ww, uw, jma: int, kma: int) -> PlaneStressFields:
    """Round jet: ``circular-hyperbolic-tangent`` (digitalfilters.py:309-393).
    The 1-D profile from its centreline (argmax U) outward becomes a radial
    profile evaluated at ``r = sqrt(x_j^2 + y_k^2)``."""
    ci = int(np.argmax(U))
    zArr = np.linspace(0.0, 1.0, len(U) - ci)
    prof = [np.asarray(p, dtype=np.float64)[ci:] for p in (U, uu, vv, ww, uw)]
    # r==0 resets to the centreline value p[ci]; r==1 resets to p[-1]
    r_inner_vals = [(np.asarray(p)[ci], np.asarray(p)[-1]) for p in (U, uu, vv, ww, uw)]
    return _radial_fields(*prof, jma, kma, zArr, 0.0, r_inner_vals, inner_zero=None)


def fields_ring_tanh(U, uu, vv, ww, uw, jma: int, kma: int, inner_d: float) -> PlaneStressFields:
    """Annular jet: ``ring-hyperbolic-tangent`` (digitalfilters.py:395-485).
    The 1-D profile maps radially onto ``[inner_d, 1]``; zero inside the inner
    radius and outside the outer radius."""
    zArr = np.linspace(inner_d, 1.0, kma)
    prof = [np.asarray(p, dtype=np.float64) for p in (U, uu, vv, ww, uw)]
    r_inner_vals = [(p[0], p[-1]) for p in prof]
    return _radial_fields(*prof, jma, kma, zArr, inner_d, r_inner_vals,
                          inner_zero=inner_d)


def plane_stress_fields(
    mean_profile: str,
    U, uu, vv, ww, uw,
    jma: int, kma: int,
    inner_d: float = 0.5,
) -> PlaneStressFields:
    """Dispatch matching main()'s adapt selection (digitalfilters.py:1444-1451)."""
    if mean_profile == "double-hyperbolic-tangent":
        return fields_double_tanh(U, uu, vv, ww, uw, jma, kma)
    if mean_profile == "circular-hyperbolic-tangent":
        return fields_circular_tanh(U, uu, vv, ww, uw, jma, kma)
    if mean_profile == "ring-hyperbolic-tangent":
        return fields_ring_tanh(U, uu, vv, ww, uw, jma, kma, inner_d)
    return fields_1d(U, uu, vv, ww, uw)
