"""End-to-end parity against the ACTUAL reference implementation.

Runs `/root/reference/main.py` (unmodified, with a tifffile shim) and this
framework's pipeline on identical CSV+mask inputs, then compares the NPZ
field outputs. This is the ground-truth parity check for the whole
interpolation pipeline: loader conventions, domain handling, mask
resampling, interpolation math, mask zeroing, and divergence cleaning.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIM = os.path.join(REPO, "tools", "tifffile_shim")

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from ptv_interpolation_tpu.datasets import sphere_pack
    d = tmp_path_factory.mktemp("ref_parity")
    csv = str(d / "pts.csv")
    tif = str(d / "mask.tif")
    sphere_pack.generate(n_points=3000, size=32, filename=csv, maskname=tif,
                         voxel_units=True)
    return d, csv, tif


def _run_reference(csv, tif, npz, method, extra=()):
    env = dict(os.environ)
    env["PYTHONPATH"] = SHIM + os.pathsep + env.get("PYTHONPATH", "")
    env["MPLBACKEND"] = "Agg"
    cmd = [sys.executable, os.path.join(REFERENCE, "main.py"),
           "--input", csv, "--mask", tif, "--invert-mask",
           "--method", method, "--output-npz", npz, "--no-plot", *extra]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                          cwd=REFERENCE, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    return proc.stdout


def _run_ours(csv, tif, npz, method, **cfg):
    from ptv_interpolation_tpu.pipeline import PipelineConfig, run_pipeline
    config = PipelineConfig(input=csv, mask=tif, invert_mask=True,
                            method=method, output_npz=npz, verbose=False,
                            **cfg)
    return run_pipeline(config)


def _rel_l2(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)


@pytest.mark.parametrize("method,extra_ref,cfg", [
    ("idw", (), {}),
    ("sibson", (), {}),
    ("linear", (), {}),
    # the reference's most complex pipeline mode: chunked RBFInterpolator
    # evaluation + NaN fill + mask zeroing (`interpolator.py:157-195`)
    ("rbf", (), {}),
])
def test_field_parity_vs_reference(dataset, tmp_path, method, extra_ref, cfg):
    d, csv, tif = dataset
    ref_npz = str(tmp_path / f"ref_{method}.npz")
    our_npz = str(tmp_path / f"our_{method}.npz")
    _run_reference(csv, tif, ref_npz, method, extra_ref)
    _run_ours(csv, tif, our_npz, method, **cfg)

    ref = np.load(ref_npz)
    ours = np.load(our_npz)
    np.testing.assert_allclose(ours["x"], ref["x"], rtol=1e-6)
    assert (np.asarray(ours["mask"]) == np.asarray(ref["mask"])).mean() > 0.999
    for f in ("u", "v", "w"):
        err = _rel_l2(ours[f], ref[f])
        assert err < 2e-3, f"{method} field {f}: rel L2 {err:.2e}"


def test_cleaned_field_parity_vs_reference(dataset, tmp_path):
    """Full pipeline incl. projection divergence cleaning."""
    d, csv, tif = dataset
    ref_npz = str(tmp_path / "ref_clean.npz")
    our_npz = str(tmp_path / "our_clean.npz")
    _run_reference(csv, tif, ref_npz, "idw",
                   ("--divergence-free", "--iter", "2"))
    _run_ours(csv, tif, our_npz, "idw", divergence_free=True, iterations=2)

    ref = np.load(ref_npz)
    ours = np.load(our_npz)
    # initial fields must match tightly; cleaned fields to solver tolerance
    for f in ("u_init", "v_init", "w_init"):
        assert _rel_l2(ours[f], ref[f]) < 2e-3, f
    scale = float(np.abs(ref["w"]).mean()) + 1e-30
    for f in ("u", "v", "w"):
        err = float(np.abs(np.asarray(ours[f]) - np.asarray(ref[f])).mean())
        assert err / scale < 2e-2, f"cleaned {f}: {err / scale:.3e}"


# NOTE: the reference's variational path cannot run in this image — its
# `scipy.sparse.linalg.cg(..., tol=1e-8)` call (reference physics.py:485,
# 337) uses the `tol` kwarg that scipy 1.17 removed (renamed `rtol`), so
# `main.py --cleaning-method variational` crashes upstream. Variational
# parity is instead verified against a scipy sparse assembly of the same
# system in tests/test_physics.py::test_variational_cleaning_parity_vs_scipy.
