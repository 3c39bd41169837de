"""Viewer construction smoke tests (Agg backend) — every viewer class and
facade from the reference's visualizer surface."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest


@pytest.fixture(scope="module")
def field():
    rng = np.random.default_rng(0)
    shape = (8, 10, 12)
    u, v, w = (rng.normal(size=shape) for _ in range(3))
    x, y, z = np.arange(12.0), np.arange(10.0), np.arange(8.0)
    mask = rng.random(shape) > 0.3
    return u, v, w, x, y, z, mask


def test_slice_viewer(field):
    from ptv_interpolation_tpu.viz import SliceViewer
    u, v, w, x, y, z, mask = field
    viewer = SliceViewer(u, v, w, x, y, z, mask=mask)
    bg, qh, qv, m = viewer.slice_data()
    assert bg.shape == (10, 12) and m.shape == (10, 12)
    # plane switching reshapes the slice
    viewer._on_plane("YZ")
    bg, *_ = viewer.slice_data()
    assert bg.shape == (8, 10)
    # background switching
    viewer._on_background("w")
    bg2, *_ = viewer.slice_data()
    assert bg2.shape == (8, 10)


def test_slice_viewer_dual_toggle(field):
    from ptv_interpolation_tpu.viz import SliceViewer
    u, v, w, x, y, z, mask = field
    viewer = SliceViewer((u, u * 2), (v, v * 2), (w, w * 2), x, y, z)
    assert viewer.has_dual
    a = viewer.slice_data()[0]
    viewer._on_toggle(None)
    b = viewer.slice_data()[0]
    np.testing.assert_allclose(b, 2 * a, rtol=1e-6)


def test_comparison_and_side_by_side(field):
    from ptv_interpolation_tpu.viz import compare, side_by_side
    u, v, w, x, y, z, mask = field
    v1 = side_by_side((u, v, w), (u * 2, v, w), x, y, z, mask=mask,
                      block=False)
    assert v1.ax2 is not None
    v2 = compare((u, v, w), (u * 2, v, w), x, y, z, mask=mask, block=False)
    assert v2.ax3 is not None


def test_scalar_viewers(field):
    from ptv_interpolation_tpu.viz import compare_scalars, show_scalar
    u, v, w, x, y, z, mask = field
    s = np.abs(u)
    v1 = show_scalar(s, x, y, z, mask=mask, block=False)
    assert v1.slice_data()[0].shape == (10, 12)
    v2 = compare_scalars(s, s * 2, x, y, z, mask=mask, block=False)
    assert v2.ax2 is not None


def test_show_scalar_field_tri_panel(field):
    import matplotlib.pyplot as plt
    from ptv_interpolation_tpu.viz import show_scalar_field
    u, v, w, x, y, z, mask = field
    fig = plt.figure()
    out = show_scalar_field(np.abs(u), x, y, z, mask=mask, fig=fig,
                            interactive=True, log_scale=True)
    assert len(out.axes) >= 3
    # slider update path
    out._sliders[0].set_val(3)
    plt.close("all")


def test_show_facade_with_input_points(field):
    from ptv_interpolation_tpu.io.csvio import PointCloud
    from ptv_interpolation_tpu.viz import show
    u, v, w, x, y, z, mask = field
    cloud = PointCloud.from_arrays(
        np.array([1.0, 2.0]), np.array([1.0, 2.0]), np.array([4.0, 4.0]),
        np.array([0.1, 0.2]), np.array([0.0, 0.0]), np.array([1.0, 1.0]))
    viewer = show(u, v, w, x, y, z, mask=mask, input_df=cloud, block=False,
                  fig=matplotlib.pyplot.figure())
    assert viewer.input_points is not None


def test_pre_viewer(field):
    from ptv_interpolation_tpu.cli.pre_viewer import PreViewer
    from ptv_interpolation_tpu.io.csvio import PointCloud
    u, v, w, x, y, z, mask = field
    cloud = PointCloud.from_arrays(
        np.array([1.0, 5.0]), np.array([2.0, 6.0]), np.array([4.0, 4.0]),
        *(np.zeros(2),) * 3)
    pv = PreViewer(cloud, mask, offset=(1.0, 0.0, 0.0))
    m, h, v_ = pv.slice_selection()
    assert m.shape == (10, 12)
    pv.sliders["x"].set_val(2.0)
    assert pv.offset[0] == 2.0
    matplotlib.pyplot.close("all")
