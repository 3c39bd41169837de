"""End-to-end pipeline tests: generator → CLI → artifacts → analysis →
post-hoc tools (the reference's `test_pipeline.py` tier, fixed and extended)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from ptv_interpolation_tpu.analyze import AnalyzeConfig, run_analysis
from ptv_interpolation_tpu.datasets import sphere_pack
from ptv_interpolation_tpu.io import load_velocity_field
from ptv_interpolation_tpu.io.tiff import read_tiff
from ptv_interpolation_tpu.pipeline import PipelineConfig, run_pipeline


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("sphere_pack")
    csv = str(d / "pts.csv")
    tif = str(d / "mask.tif")
    sphere_pack.generate(n_points=4000, size=48, filename=csv, maskname=tif,
                         voxel_units=True)
    return d, csv, tif


def test_run_pipeline_idw_with_cleaning(dataset):
    d, csv, tif = dataset
    npz = str(d / "out.npz")
    out_tif = str(d / "out.tif")
    config = PipelineConfig(
        input=csv, mask=tif, invert_mask=True,  # generator writes solid=1
        method="idw", idw_neighbors=20, divergence_free=True, iterations=2,
        output_npz=npz, output_tif=out_tif, filter_outliers=True,
        boundary_particles=True, boundary_sampling=10, verbose=False)
    result = run_pipeline(config)
    assert result.u.shape == (48, 48, 48)
    assert result.has_dual
    # solid cells are zero
    solid = ~np.asarray(result.mask)
    assert np.abs(result.u[solid]).max() == 0
    # artifacts exist and honor the contract
    back = load_velocity_field(npz)
    assert back.has_dual and back.u.shape == (48, 48, 48)
    stack = read_tiff(out_tif)
    assert stack.shape == (48, 3, 48, 48)
    # w should be ~1 in the pore space (constant flow synthetic field)
    fluid = np.asarray(result.mask)
    assert 0.7 < result.w_init[fluid].mean() < 1.1


def test_cli_subprocess(dataset):
    """The reference smoke test (`test_pipeline.py:43-69`), against the real
    CLI with current flags."""
    d, csv, tif = dataset
    npz = str(d / "cli_out.npz")
    out_tif = str(d / "cli_out.tif")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, "-m", "ptv_interpolation_tpu.cli.main",
           "--input", csv, "--mask", tif, "--invert-mask",
           "--method", "sibson", "--sibson-neighbors", "15",
           "--divergence-free", "--cleaning-method", "variational",
           "--cleaning-lambda", "100",
           "--output-npz", npz, "--output-tif", out_tif, "--no-plot"]
    # 1200 s: the subprocess pays a fresh jax import + CPU compiles on a
    # single-core host whose speed varies ~2x with ambient load — 600 s
    # flaked while the same run passed in ~300 s on a quiet host
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert os.path.exists(npz) and os.path.exists(out_tif)
    assert "VARIATIONAL CLEANING COMPLETE" in proc.stdout


def test_analysis_pipeline_on_result(dataset, tmp_path):
    d, csv, tif = dataset
    npz = str(d / "out.npz")  # written by the first test
    if not os.path.exists(npz):
        pytest.skip("pipeline artifact missing")
    os.chdir(tmp_path)
    config = AnalyzeConfig(input=npz, voxel_size=1e-5, dt=2.0,
                           drag_method="mesh", verbose=False,
                           output_npz=str(tmp_path / "analysis.npz"),
                           output_tif_strain=str(tmp_path / "custom_strain.tif"),
                           flow_type=True)
    results, log = run_analysis(config)
    for key in ("strain_rate", "dissipation", "vorticity_magnitude",
                "pressure", "permeability_dissipation",
                "permeability_pressure", "drag", "flow_type"):
        assert key in results, key
    assert results["permeability_dissipation"] > 0
    assert 1 in results["drag"]
    assert np.isfinite(results["drag"][1]["Fz"])
    # artifacts
    assert os.path.exists(tmp_path / "analysis.npz")
    assert os.path.exists(tmp_path / "out_stats.txt")
    # --output-tif-strain redirect honored; the others fall back to
    # <basename>_<field>.tif (`/root/reference/analyze_flow.py:210-213`)
    assert os.path.exists(tmp_path / "custom_strain.tif")
    assert not os.path.exists(tmp_path / "out_strain.tif")
    assert os.path.exists(tmp_path / "out_vorticity.tif")
    assert any("porosity" in line.lower() for line in log)


def test_posthoc_tools(dataset, tmp_path, monkeypatch):
    d, csv, tif = dataset
    npz = str(d / "out.npz")
    if not os.path.exists(npz):
        pytest.skip("pipeline artifact missing")
    from ptv_interpolation_tpu.cli.tools import plot_flux, view_divergence
    monkeypatch.chdir(tmp_path)
    m_init, m_clean = view_divergence([npz, "--no-plot"])
    assert m_clean < m_init
    stats = plot_flux([npz, "--no-show", "-o", str(tmp_path / "flux.png")])
    assert os.path.exists(tmp_path / "flux.png")
    assert "XY (Z-flux)" in stats


def test_pipeline_no_mask_databounds(dataset):
    _, csv, _ = dataset
    config = PipelineConfig(input=csv, method="nearest", verbose=False)
    result = run_pipeline(config)
    assert result.u.shape == (64, 64, 64)  # base_res fallback
    assert not result.has_dual


def test_auto_align_recovers_offset(dataset):
    from ptv_interpolation_tpu.align import find_best_offset
    from ptv_interpolation_tpu.io import load_mask, load_ptv_data
    d, csv, tif = dataset
    cloud = load_ptv_data(csv)   # already in voxel units (fixture)
    solid = np.asarray(load_mask(tif))
    fluid = ~solid
    shift = np.asarray([3.0, -2.0, 4.0], np.float32)
    shifted = type(cloud)(cloud.points + shift, cloud.values)
    best, score = find_best_offset(shifted, fluid, initial_offset=(0, 0, 0),
                                   verbose=False)
    # recovered offset should undo the shift to within a voxel or two
    np.testing.assert_allclose(best, -shift, atol=2.0)


def test_compare_results_tool(dataset, tmp_path, monkeypatch):
    """PTV-vs-simulation comparator: normalization + shape truncation."""
    d, csv, tif = dataset
    npz = str(d / "out.npz")
    if not os.path.exists(npz):
        pytest.skip("pipeline artifact missing")
    from ptv_interpolation_tpu.cli.tools import compare_results
    from ptv_interpolation_tpu.io import load_velocity_field
    from ptv_interpolation_tpu.io.tiff import write_tiff

    f = load_velocity_field(npz)
    # fabricate a "simulation" = 2x-scaled, slightly larger field
    for name, arr in (("u", f.u), ("v", f.v), ("w", f.w)):
        big = np.pad(np.asarray(arr, np.float32) * 2.0,
                     ((0, 2), (0, 2), (0, 2)))
        write_tiff(str(tmp_path / f"ref_{name}.tif"), big)

    l2 = compare_results([
        "--ptv", npz,
        "--ref-u", str(tmp_path / "ref_u.tif"),
        "--ref-v", str(tmp_path / "ref_v.tif"),
        "--ref-w", str(tmp_path / "ref_w.tif"),
        "--no-plot"])
    # mean-speed normalization divides out the 2x factor -> near-zero L2
    assert l2 < 1e-5
