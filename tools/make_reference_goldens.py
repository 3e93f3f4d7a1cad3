"""Generate golden fixtures by EXECUTING the actual reference code
(`/root/reference/digitalfilters.py` et al.) and capturing its outputs.

The reference is Python 2; this tool applies a minimal, reviewable
mechanical conversion (tab expansion per the Python-2 tokenizer rule,
print-statement wrapping, the audited integer divisions ``num_fcs/2``,
and two removed-numpy-alias renames) to a TEMPORARY copy — no reference
code enters the repository.  VTK (not available here) is emulated by the
tiny stub in tools/refgold/ (see its docstring for exactly what is and is
not faithful); everything numeric and every byte of the .prf/.dat/.hdf5
writers is the reference's own code.

Outputs (committed under tests/golden/):

* ``ref_run/`` — the artifacts of a seeded ``digitalfilters.py -n 5 --hdf5``
  run: PODFS.dat, PODFS_mean.prf, PODFS_mode_%04i.prf,
  POD.eigenvalues.dat, PODFS.hdf5;
* ``ref_pod.npz`` — the centered snapshot matrix the run fed to POD(),
  the mean field, and the resulting temporal/spatial modes + Fourier data
  (for value-level A/B of this repo's POD/Fourier against the reference
  implementation on identical input);
* ``ref_unit.npz`` — unit-level in/out pairs from the reference's own
  calccoeff / filter3DSciPy1D / adapt1d / build_profile / rotate_velocity
  on seeded inputs (value-level oracles for ops/filters, ops/lund,
  models/profiles, ops/rotation).

Usage:  python tools/make_reference_goldens.py   (writes tests/golden/)
"""

from __future__ import annotations

import os
import re
import shutil
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
GOLDEN = os.path.join(REPO, "tests", "golden")
SEED = 20260820
REF_FILES = ("digitalfilters.py", "PODFS.py", "nsigproclib_no_mpi.py",
             "HDF5.py")

_PRINT_RE = re.compile(r"^(\s*)print(?:\s+(.+))?\s*$")


def convert_py2(src: str) -> str:
    """Mechanical py2 -> py3 conversion for the reference main path:
    every rule here was audited against the executed code
    (digitalfilters.py main()/build_profile/adapt1d/filter3DSciPy1D,
    PODFS.py POD/fourier_coefficients/pod2prf/write_*, HDF5.py)."""
    out = []
    for line in src.split("\n"):
        # Python 2 tokenizes a tab as advancing to the next multiple of 8;
        # the reference mixes tabs and spaces, which py3 rejects outright.
        line = line.expandtabs(8)
        m = _PRINT_RE.match(line)
        if m:
            body = m.group(2)
            line = (f"{m.group(1)}print({body})" if body
                    else f"{m.group(1)}print()")
        out.append(line)
    s = "\n".join(out)
    # audited true-integer divisions (Fourier index k = n - Ns/2 and the
    # PODFS.dat / HDF5 writers that repeat it; Ns may be odd)
    s = s.replace("num_fcs/2", "num_fcs//2")
    # rotate_velocity point count (digitalfilters.py:1121) — used as a
    # range() bound
    s = s.replace("pts = len(A)/3", "pts = len(A)//3")
    # numpy 2.x removed these aliases
    s = s.replace("dtype=np.int)", "dtype=int)")
    s = s.replace("np.string_", "np.bytes_")
    return s


def prepare(tmp: str) -> None:
    for name in REF_FILES:
        with open(os.path.join(REFERENCE, name)) as f:
            src = f.read()
        with open(os.path.join(tmp, name), "w") as f:
            f.write(convert_py2(src))


def run_reference(tmp: str):
    stub = os.path.join(REPO, "tools", "refgold")
    sys.path.insert(0, stub)     # vtk package + nplotlib no-op
    sys.path.insert(0, tmp)
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        np.random.seed(SEED)
        import digitalfilters as df
        pod = df.pod

        rec = {}
        orig_pod = pod.POD
        orig_fc = pod.fourier_coefficients

        def pod_rec(A, *args):
            rec["A_centered"] = np.array(A)
            rec["mean_field"] = np.array(args[13])
            i_d = args[20]
            out = orig_pod(A, *args)
            rec["temporal_modes"] = np.array(i_d.temporal_modes,
                                             dtype=np.complex128)
            rec["spatial_modes"] = np.array(i_d.spatial_modes)
            rec["num_modes_trunc"] = np.int64(i_d.nm)
            return out

        def fc_rec(i_d):
            out = orig_fc(i_d)
            rec["period"] = np.float64(i_d.period)
            rec["N_FC"] = np.array(i_d.N_FC)
            rec["FC"] = np.array(i_d.FC)
            rec["dt"] = np.float64(i_d.dt)
            return out

        pod.POD = pod_rec
        pod.fourier_coefficients = fc_rec
        sys.argv = ["digitalfilters.py", "-n", "5", "--hdf5"]
        df.main()
        pod.POD = orig_pod
        pod.fourier_coefficients = orig_fc

        # ---- harvest run artifacts ----------------------------------
        run_dir = os.path.join(GOLDEN, "ref_run")
        os.makedirs(run_dir, exist_ok=True)
        podfs = os.path.join(tmp, "PODFS")
        for name in sorted(os.listdir(podfs)):
            if name.endswith((".dat", ".prf", ".hdf5")):
                shutil.copy(os.path.join(podfs, name),
                            os.path.join(run_dir, name))
        np.savez_compressed(os.path.join(GOLDEN, "ref_pod.npz"), **rec)

        # ---- unit-level oracles --------------------------------------
        make_unit_goldens(df)
    finally:
        os.chdir(cwd)


def make_unit_goldens(df):
    rng_seed = SEED + 1
    np.random.seed(rng_seed)
    unit = {"seed": np.int64(rng_seed)}

    # calccoeff: Klein filter taps (digitalfilters.py:73-89)
    for nf, ln in ((4, 2.0), (6, 3.0), (9, 4.5)):
        a = np.zeros(2 * nf + 1)
        unit[f"calccoeff_{nf}_{ln}"] = np.array(df.calccoeff(a, nf, ln))

    # filter3DSciPy1D: the production separable filter on seeded noise
    jma, kma, nf, ln = 7, 9, 3, 1.5
    a3 = np.zeros((1, 2 * nf + 1, 2 * nf + 1, 2 * nf + 1))
    df.coeff3D(a3, nf, nf, nf, ln, ln, ln)
    x = np.random.uniform(-np.sqrt(3.0), np.sqrt(3.0),
                          (2 * nf + 1, 2 * nf + jma, 2 * nf + kma))
    y = np.zeros((jma, kma))
    df.filter3DSciPy1D(x, y, a3, jma, kma, ln, ln, ln, nf, nf, nf)
    unit["filter_x"] = x
    unit["filter_y"] = y
    unit["filter_a3"] = a3
    unit["filter_dims"] = np.array([jma, kma, nf], dtype=np.int64)
    unit["filter_ln"] = np.float64(ln)

    # build_profile + adapt1d: Lund coloring of seeded fields
    U, uu, vv, ww, uw = df.build_profile(
        "hyperbolic-tangent", "top-hat", 1.0, 0.02, kma)
    unit["prof_U"], unit["prof_uu"], unit["prof_vv"] = U, uu, vv
    unit["prof_ww"], unit["prof_uw"] = ww, uw
    yu = np.random.standard_normal((jma, kma))
    yv = np.random.standard_normal((jma, kma))
    yw = np.random.standard_normal((jma, kma))
    unit["adapt_in"] = np.stack([yu, yv, yw])
    yu2, yv2, yw2 = yu.copy(), yv.copy(), yw.copy()
    df.adapt1d(yu2, yv2, yw2, U, uu, vv, ww, uw, jma, kma)
    unit["adapt_out"] = np.stack([yu2, yv2, yw2])

    # rotate_velocity for a non-trivial normal (digitalfilters:1119-1131)
    nvec = np.array([1.0, 2.0, -0.5])
    nvec = nvec / np.linalg.norm(nvec)
    col = np.random.standard_normal(3 * jma * kma)
    unit["rot_normal"] = nvec
    unit["rot_in"] = col
    unit["rot_out"] = np.array(
        df.rotate_velocity(col.copy(), nvec[0], nvec[1], nvec[2]))

    np.savez_compressed(os.path.join(GOLDEN, "ref_unit.npz"), **unit)


def main():
    os.makedirs(GOLDEN, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="refgold_")
    try:
        prepare(tmp)
        run_reference(tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(f"goldens written to {GOLDEN}")


if __name__ == "__main__":
    main()
