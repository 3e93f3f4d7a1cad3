"""1-D ASCII turbulence-profile reader.

Reference: ``read_profile`` (digitalfilters.py:487-522).  Input is a
whitespace table with a header row naming columns ``y U uu vv ww uv``
(read via ``np.genfromtxt(names=True)``).  The half-channel profile is
mirrored about y=1 (rows 0..n-3 appended in reverse with ``y -> 2 - y`` and
``uv -> -uv``), y is normalized to [0, 1], every quantity is
spline-resampled to ``kma`` points, and wall values are zeroed.
"""

from __future__ import annotations

import numpy as np
from scipy import interpolate


def read_profile(profile_file: str, kma: int):
    data = np.genfromtxt(profile_file, names=True, autostrip=True, comments="#")
    required = ("y", "U", "uu", "vv", "ww", "uv")
    names = data.dtype.names or ()
    missing = [c for c in required if c not in names]
    if missing:
        raise ValueError(
            f"1-D profile file {profile_file!r} is missing columns {missing}: "
            f"the first row must be a header naming the columns "
            f"'y U uu vv ww uv' (found {list(names)})")
    npoints = data.shape[0]

    y = np.asarray(data["y"], dtype=np.float64)
    U = np.asarray(data["U"], dtype=np.float64)
    uu = np.asarray(data["uu"], dtype=np.float64)
    vv = np.asarray(data["vv"], dtype=np.float64)
    ww = np.asarray(data["ww"], dtype=np.float64)
    uv = np.asarray(data["uv"], dtype=np.float64)

    # mirror rows 0..npoints-3 in reverse order (reference appends
    # ``reversed(profiledata[0:npoints-2])``)
    sel = np.arange(npoints - 3, -1, -1)
    y = np.concatenate([y, 2.0 - y[sel]])
    U = np.concatenate([U, U[sel]])
    uu = np.concatenate([uu, uu[sel]])
    vv = np.concatenate([vv, vv[sel]])
    ww = np.concatenate([ww, ww[sel]])
    uv = np.concatenate([uv, -uv[sel]])

    z = (y - y.min()) / (y.max() - y.min())
    zi = np.linspace(z.min(), z.max(), kma)

    def resample(vals):
        return interpolate.splev(zi, interpolate.splrep(z, vals, s=0), der=0)

    Ur = resample(U)
    uur = resample(uu)
    vvr = resample(vv)
    wwr = resample(ww)
    uwr = resample(uv)
    for arr in (Ur, uur, vvr, wwr, uwr):
        arr[0] = arr[-1] = 0.0
    return Ur, uur, vvr, wwr, uwr
