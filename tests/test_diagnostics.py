"""Diagnostics layer: every plot helper writes a decodable PNG (the
reference's nplotlib equivalents; all off the hot path)."""

import numpy as np

from pods_digital_filter_tpu.diagnostics import plots


def _png_ok(path):
    with open(path, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_all_plot_helpers_write_png(tmp_path, rng):
    t = np.linspace(0, 1, 64)
    y = np.sin(2 * np.pi * 5 * t)
    Y, Z = np.meshgrid(np.linspace(0, 1, 12), np.linspace(0, 1, 13))
    F = np.sin(2 * np.pi * Y) * np.cos(2 * np.pi * Z)
    freqs = np.linspace(0, 32, 33)
    S = 1.0 / (1.0 + freqs**2)

    out = str(tmp_path)
    _png_ok(plots.contourf(Y, Z, F, "f", f"{out}/contourf"))
    _png_ok(plots.timeseries(t, y, f"{out}/ts"))
    _png_ok(plots.psd(freqs, S, f"{out}/psd"))
    _png_ok(plots.eigen_spectrum(np.exp(-np.arange(10.0)), f"{out}/eigs"))
    _png_ok(plots.wns(freqs, S, f"{out}/wns"))
    _png_ok(plots.plot(t, y, f"{out}/plot"))
    _png_ok(plots.bar([1.0, 2.0, 3.0], f"{out}/bar", labels=["a", "b", "c"]))
    _png_ok(plots.hist(rng.standard_normal(500), f"{out}/hist"))
    _png_ok(plots.scatter(t, y, f"{out}/scatter", equal_aspect=True))
    _png_ok(plots.scatter(1 + np.abs(y), 1 + t, f"{out}/logscatter", loglog=True))
    _png_ok(plots.semilogx(1 + freqs, S, f"{out}/semilogx"))
    _png_ok(plots.psd3(freqs, [S, S * 2], f"{out}/psd3", labels=["u", "v"]))
    _png_ok(plots.convergence(np.exp(-np.arange(20.0)), f"{out}/conv"))
    _png_ok(plots.contourf_quiver(Y, Z, F, F, -F, f"{out}/cq"))
    _png_ok(plots.contourf_contour(Y, Z, F, F, f"{out}/cc"))
    _png_ok(plots.scatter_3d(t, y, t * y, f"{out}/s3d", c=y))
    d = 0.01 * rng.standard_normal((2, t.shape[0]))
    _png_ok(plots.arrow_field(y, t, d[0], d[1], f"{out}/arrow"))
    _png_ok(plots.arc_arrow(np.abs(y) + 0.1, 1 + t, d[0], d[1],
                            f"{out}/arc"))
    _png_ok(plots.plot_with_point(t, y, t[::5], y[::5], f"{out}/pwp"))


def test_render_field_variants(tmp_path, rng):
    from pods_digital_filter_tpu.config import PlaneConfig
    from pods_digital_filter_tpu.io.plane import make_inflow_plane

    geom = make_inflow_plane(PlaneConfig(jma=8, kma=9, res=0.1))
    pts = geom.cell_centers
    npts = pts.shape[0]
    out = str(tmp_path)

    _png_ok(plots.render_field(pts, rng.standard_normal(npts), f"{out}/sc"))
    _png_ok(plots.render_field(pts, rng.standard_normal((npts, 3)), f"{out}/vec"))
    _png_ok(plots.render_field(pts, rng.standard_normal(3 * npts),
                               f"{out}/packed", component=0))
