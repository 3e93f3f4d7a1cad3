"""Profile models: synthetic builders, 1-D reader, 2-D .prf reader."""

import os

import numpy as np
import pytest

from pods_digital_filter_tpu.models import profiles as prof
from pods_digital_filter_tpu.models.profile_1d import read_profile
from pods_digital_filter_tpu.models.prf_reader import read_prf


def test_build_profile_tanh():
    U, uu, vv, ww, uw = prof.build_profile(
        "hyperbolic-tangent", "top-hat", 2.0, 0.1, 21)
    # centreline: U = U0/2*(1+tanh(5)) ~ U0
    assert U[10] == pytest.approx(2.0, rel=1e-3)
    # walls: U = U0/2*(1+tanh(0)) = U0/2
    assert U[0] == pytest.approx(1.0)
    np.testing.assert_allclose(uu, (0.1 * U) ** 2)
    np.testing.assert_allclose(uw, 0.0)


def test_build_profile_none_turb():
    U, uu, vv, ww, uw = prof.build_profile(
        "hyperbolic-tangent", "none", 1.0, 0.1, 11)
    assert np.all(uu == 0) and np.all(vv == 0) and np.all(ww == 0)


def test_build_profile_invalid():
    with pytest.raises(ValueError):
        prof.build_profile("nope", "top-hat", 1.0, 0.1, 11)
    with pytest.raises(ValueError):
        prof.build_profile("hyperbolic-tangent", "nope", 1.0, 0.1, 11)


def test_double_tanh_fields_geometry():
    kma, jma = 15, 13
    U, uu, vv, ww, uw = prof.build_profile(
        "double-hyperbolic-tangent", "top-hat", 1.0, 0.1, kma)
    f = prof.fields_double_tanh(U, uu, vv, ww, uw, jma, kma)
    assert f.mean_u.shape == (jma, kma)
    # geometric mean: centre value = U_max, corner ~ sqrt(U_wall * U_wall)
    cj, ck = jma // 2, kma // 2
    assert f.mean_u[cj, ck] == pytest.approx(U.max(), rel=1e-6)
    assert f.mean_u[0, 0] == pytest.approx(np.sqrt(U[0] * U[0]), rel=1e-6)
    assert np.all(f.uu >= 0)


def test_circular_fields_radial():
    kma = jma = 21
    U, uu, vv, ww, uw = prof.build_profile(
        "circular-hyperbolic-tangent", "top-hat", 1.0, 0.1, kma)
    f = prof.fields_circular_tanh(U, uu, vv, ww, uw, jma, kma)
    # corners (r = sqrt(2) > 1) are zero
    assert f.mean_u[0, 0] == 0.0
    assert f.mean_u[-1, -1] == 0.0
    # centre (r = 0) equals the centreline value
    assert f.mean_u[jma // 2, kma // 2] == pytest.approx(U[np.argmax(U)])
    # axisymmetry: r-reflection along the axes
    np.testing.assert_allclose(f.mean_u[jma // 2, :], f.mean_u[:, kma // 2],
                               rtol=1e-10)


def test_ring_fields_annulus():
    kma = jma = 31
    inner_d = 0.5
    U, uu, vv, ww, uw = prof.build_profile(
        "ring-hyperbolic-tangent", "top-hat", 1.0, 0.1, kma)
    f = prof.fields_ring_tanh(U, uu, vv, ww, uw, jma, kma, inner_d)
    c = jma // 2
    # centre (r=0 < inner_d) is zero; outside r>1 zero
    assert f.mean_u[c, c] == 0.0
    assert f.mean_u[0, 0] == 0.0
    # a point in the annulus is nonzero
    x = np.linspace(-1, 1, jma)
    ann = np.argmin(np.abs(x - 0.75))
    assert f.mean_u[ann, c] > 0.0


def test_read_profile_1d(tmp_path):
    path = tmp_path / "chan.dat"
    y = np.linspace(0, 1, 11)
    U = 1 - (1 - y) ** 2
    uu = 0.01 * U
    with open(path, "w") as fh:
        fh.write("y U uu vv ww uv\n")
        for i in range(11):
            fh.write(f"{y[i]} {U[i]} {uu[i]} {uu[i]} {uu[i]} {0.001 * y[i]}\n")
    Ur, uur, vvr, wwr, uwr = read_profile(str(path), 25)
    assert Ur.shape == (25,)
    assert Ur[0] == Ur[-1] == 0.0
    # mirrored channel: approximately symmetric about the centre (the
    # reference's mirror skips row npoints-2, so the knot grid is slightly
    # irregular near the centreline)
    np.testing.assert_allclose(Ur[1:12], Ur[-2:-13:-1], atol=5e-3)
    # uv approximately antisymmetric
    np.testing.assert_allclose(uwr[1:12], -uwr[-2:-13:-1], atol=5e-3)


def _write_prf(path, normal="x", delimiter=",", use_sdr=False,
               ny=12, nz=14):
    """Synthetic 2-D .prf: a plane grid with parabolic u and uniform k/eps."""
    ys = np.linspace(0.0, 1.1, ny)
    zs = np.linspace(0.0, 1.3, nz)
    rows = []
    for j in range(ny):
        for i in range(nz):
            yv, zv = ys[j], zs[i]
            u = 4.0 * (yv / 1.1) * (1 - yv / 1.1) + 0.5
            kv = 0.01 + 0.001 * yv
            ev = 0.02 + 0.001 * zv
            if normal == "x":
                x, y, z = 0.0, yv, zv
            else:  # tilted: normal (1,1,0)/sqrt2
                x, y, z = -yv / np.sqrt(2), yv / np.sqrt(2), zv
            last = 0.09 * kv * 2.0 if use_sdr else ev  # sdr: eps=0.09*k*sdr
            sdr_or_e = 2.0 if use_sdr else ev
            rows.append((x, y, z, u, 0.1, 0.2, kv, sdr_or_e))
    cols = "data,x,y,z,u,v,w,k," + ("sdr" if use_sdr else "e")
    with open(path, "w") as fh:
        fh.write("# synthetic profile # name\n")
        fh.write("# turbulence model, k_epsilon\n")
        fh.write(cols + "\n")
        for r in rows:
            fh.write(delimiter.join("%.10g" % float(v) for v in r) + "\n")


def test_read_prf_basic(tmp_path):
    path = str(tmp_path / "inlet.prf")
    _write_prf(path)
    r = read_prf(path, res=0.1)
    # spans 1.1 x 1.3 at res 0.1 -> jma=11, kma=13
    assert (r.jma, r.kma) == (11, 13)
    assert r.U.shape == (11, 13)
    np.testing.assert_allclose(r.normal, (1.0, 0.0, 0.0), atol=1e-12)
    np.testing.assert_allclose(r.center, (0.0, 0.55, 0.65), atol=1e-12)
    # normal stresses nonnegative; length scale positive
    assert np.all(r.uu >= 0) and np.all(r.vv >= 0) and np.all(r.ww >= 0)
    assert r.length_scale >= 1
    # interior u close to the analytic profile
    assert abs(r.U[5, 6] - (4.0 * 0.25 * 0.75 + 0.5)) < 0.5


def test_read_prf_sdr_and_whitespace(tmp_path):
    path = str(tmp_path / "inlet_sdr.prf")
    _write_prf(path, delimiter=" ", use_sdr=True)
    r = read_prf(path, res=0.1)
    assert np.all(np.isfinite(r.uu))
    assert r.eps.max() > 0


def test_read_prf_missing_k(tmp_path):
    path = str(tmp_path / "bad.prf")
    with open(path, "w") as fh:
        fh.write("# name\ndata,x,y,z,u,v,w\n")
        for i in range(16):
            fh.write(f"0,{i % 4},{i // 4},1,0,0\n")
    with pytest.raises(ValueError, match="k"):
        read_prf(path, res=1.0)


def test_read_prf_bulk_velocity_scaling(tmp_path):
    path = str(tmp_path / "inlet.prf")
    _write_prf(path)
    r1 = read_prf(path, res=0.1, bulk_velocity=1.0)
    r2 = read_prf(path, res=0.1, bulk_velocity=2.0)
    udotn1 = r1.U.mean()
    udotn2 = r2.U.mean()
    # scaled so mean normal velocity == bulk_velocity
    assert udotn2 == pytest.approx(2.0, rel=1e-6)
    assert udotn1 != pytest.approx(2.0, rel=1e-2)


def test_read_prf_massflow_requires_density(tmp_path):
    path = str(tmp_path / "inlet.prf")
    _write_prf(path)
    with pytest.raises(ValueError, match="density"):
        read_prf(path, res=0.1, mdot=1.0)


def test_pipeline_with_prf(tmp_path):
    from pods_digital_filter_tpu.config import (
        FilterConfig, PipelineConfig, PlaneConfig, PODFSConfig)
    from pods_digital_filter_tpu.pipeline import run_pipeline

    path = str(tmp_path / "inlet.prf")
    _write_prf(path)
    cfg = PipelineConfig(
        plane=PlaneConfig(res=0.1),
        filt=FilterConfig(),
        podfs=PODFSConfig(num_modes=3),
        nsteps=5, profile_file=path, outdir=str(tmp_path / "PODFS"),
        dtype="float64",
    )
    res = run_pipeline(cfg)
    assert np.isfinite(res.A).all()
    assert res.config.plane.jma == 11
    assert os.path.exists(os.path.join(cfg.outdir, "PODFS.dat"))


def test_read_prf_gradient_oracle(tmp_path):
    """The reference's own verification mode (--test_gradients,
    digitalfilters.py:1235-1237, 795-810): U,V,W are overridden with the
    linear fields 1y+2z, 3y+4z, 5y+6z, so every gradient — and hence every
    Boussinesq stress (digitalfilters.py:995-1009) — has an exact value."""
    path = str(tmp_path / "inlet.prf")
    _write_prf(path)
    r = read_prf(path, res=0.1, test_gradients=True)

    # returned fields are orient(a) = flip(a, 0).T of the (kma, jma) grids,
    # so the eps==0 row (z index 0) lands in oriented column kma-1
    y = np.flip(r.y_grid, 0).T
    z = np.flip(r.z_grid, 0).T
    np.testing.assert_allclose(r.U, 1 * y + 2 * z, atol=1e-12)
    np.testing.assert_allclose(r.V, 3 * y + 4 * z, atol=1e-12)
    np.testing.assert_allclose(r.W, 5 * y + 6 * z, atol=1e-12)

    # exact gradients up to the reference's spacing quirk: the grid is built
    # with linspace over jma points spanning res*jma (digitalfilters.py:
    # 712-742) but np.gradient is called with spacing res, so each gradient
    # carries a factor n/(n-1) for its axis
    fy = r.jma / (r.jma - 1)
    fz = r.kma / (r.kma - 1)
    # dUdy=1fy dUdz=2fz dVdy=3fy dVdz=4fz dWdy=5fy dWdz=6fz;
    # dUdx = -dVdy - dWdz; nu_t = 0.09*k^2/eps = 0.09 (k=eps=1)
    interior = np.s_[:, :-1]     # all but the masked z=0 column
    np.testing.assert_allclose(
        r.uu[interior], 2 * 0.09 * (3 * fy + 6 * fz) + 2.0 / 3.0, atol=1e-10)
    np.testing.assert_allclose(
        r.vv[interior], -2 * 0.09 * 3 * fy + 2.0 / 3.0, atol=1e-10)
    np.testing.assert_allclose(r.ww[interior], 0.0, atol=1e-10)   # clamped
    np.testing.assert_allclose(r.uv[interior], -0.09 * fy, atol=1e-10)
    np.testing.assert_allclose(r.uw[interior], -0.09 * 2.0 * fz, atol=1e-10)
    np.testing.assert_allclose(
        r.vw[interior], -0.09 * (4 * fz + 5 * fy), atol=1e-10)
    # masked row: zero k and zeroed gradients -> zero stresses
    np.testing.assert_allclose(r.uu[:, -1], 0.0, atol=1e-12)
    np.testing.assert_allclose(r.vw[:, -1], 0.0, atol=1e-12)


def test_read_prf_massflow_rescale_correct(tmp_path):
    """Scaled velocities must reproduce the target mass flow exactly
    (digitalfilters.py:754-788): mdot = (mean U . n) * area * density with
    area = res^2 * (kma-1) * (jma-1)."""
    path = str(tmp_path / "inlet.prf")
    _write_prf(path)
    mdot, den, res = 3.5, 2.0, 0.1
    r = read_prf(path, res=res, mdot=mdot, den=den)
    area = res ** 2 * (r.kma - 1) * (r.jma - 1)
    udotn = (r.U.mean() * r.normal[0] + r.V.mean() * r.normal[1]
             + r.W.mean() * r.normal[2])
    assert udotn * area * den == pytest.approx(mdot, rel=1e-9)

    # k rescale semantics (digitalfilters.py:770-788): TI^2 = (2/3)k/|U|^2
    # and k_new = TI^2 |U_new|^2, so the 2/3 is absorbed into k —
    # k_new = (2/3) s^2 k (reference quirk, reproduced deliberately)
    r0 = read_prf(path, res=res)
    pos = (r0.eps > 0) & (r.eps > 0)
    udotn0 = (r0.U.mean() * r0.normal[0] + r0.V.mean() * r0.normal[1]
              + r0.W.mean() * r0.normal[2])
    s = mdot / (udotn0 * area * den)
    np.testing.assert_allclose(r.k[pos], (2.0 / 3.0) * s ** 2 * r0.k[pos],
                               rtol=1e-9)
