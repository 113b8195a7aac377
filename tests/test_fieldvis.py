"""VIS_FIELD family: colorscales, volumetric field raycast, embedded slice
(reference kernel.cpp:112-156 colorscales, :2786-2888 field_rt,
:2890-2950 field_slice)."""

import numpy as np
import pytest

from latticeurbanwind_tpu.run.fieldvis import (
    auto_scale, colorscale_iron, colorscale_rainbow, colorscale_twocolor,
    field_color, field_weight, raycast_field, slice_plane)
from latticeurbanwind_tpu.run.render import Camera, _camera_rays


def _blob(n=24):
    zz, yy, xx = np.meshgrid(*(np.arange(n),) * 3, indexing="ij")
    r2 = (xx - n / 2) ** 2 + (yy - n / 2) ** 2 + (zz - n / 2) ** 2
    return np.exp(-r2 / (n * 1.2)).astype(np.float32)


def test_colorscale_endpoints_match_reference_ramps():
    # rainbow: x=1 -> red, x=0 -> black-ish violet end (kernel.cpp:112-135)
    assert np.allclose(colorscale_rainbow(np.array(1.0)), [1, 0, 0])
    assert colorscale_rainbow(np.array(0.0)).sum() < 0.1
    # mid: x=0.5 -> t=3.0 -> green-cyan boundary (g=1, b=1)
    mid = colorscale_rainbow(np.array(0.5))
    assert mid[1] == pytest.approx(1.0) and mid[2] == pytest.approx(1.0)
    # iron: x=1 -> white, x=0 -> black (kernel.cpp:136-152)
    assert np.allclose(colorscale_iron(np.array(1.0)), [1, 1, 1])
    assert np.allclose(colorscale_iron(np.array(0.0)), [0, 0, 0])
    # twocolor: 0 -> 0x0080FF blue, 1 -> 0xFFAA00 orange, 0.5 -> background
    tc = colorscale_twocolor(np.array([0.0, 0.5, 1.0]), background=(0, 0, 0))
    assert np.allclose(tc[0], [0.0, 0.5, 1.0])
    assert np.allclose(tc[1], [0, 0, 0])
    assert np.allclose(tc[2], [1.0, 2 / 3, 0.0], atol=1e-6)


def test_colorscales_vectorize_and_clip():
    x = np.linspace(-0.5, 1.5, 101)
    for fn in (colorscale_rainbow, colorscale_iron, colorscale_twocolor):
        rgb = fn(x)
        assert rgb.shape == (101, 3)
        assert rgb.min() >= 0.0 and rgb.max() <= 1.0


def test_field_color_modes_dispatch():
    v = np.array([0.0, 0.5, 1.0], np.float32)
    assert field_color(v, "u", 1.0).shape == (3, 3)
    assert field_color(v, "rho", 1.0).shape == (3, 3)
    assert field_color(v, "T", 1.0, t_avg=0.5).shape == (3, 3)
    with pytest.raises(ValueError):
        field_color(v, "vorticity", 1.0)


def test_field_weight_deviation_semantics():
    # velocity: weight vanishes at u = 0 AND at u = 0.5/scale
    w = field_weight(np.array([0.0, 0.5, 1.0]), "u", 1.0)
    assert w[0] == 0.0 and w[1] == 0.0 and w[2] > 0
    # rho: weight is |rho - 1|
    assert field_weight(np.array([1.0]), "rho", 1.0)[0] == 0.0
    # T: squared deviation from t_avg
    assert field_weight(np.array([2.0]), "T", 1.0, t_avg=2.0)[0] == 0.0


def test_raycast_blob_is_opaque_center_transparent_edge():
    speed = _blob()
    cam = Camera(width=64, height=48)
    origins, d, _ = _camera_rays(speed.shape, cam)
    rgb, alpha = raycast_field(speed, origins, d, mode="u")
    a = alpha.reshape(48, 64)
    assert a[24, 32] > a[2, 2]          # blob center vs empty corner
    assert a.max() > 0.05 and a.min() == 0.0
    assert rgb.shape == (64 * 48, 3)


def test_raycast_respects_exclude_and_geometry_depth():
    speed = _blob()
    cam = Camera(width=48, height=36)
    origins, d, _ = _camera_rays(speed.shape, cam)
    _, a_free = raycast_field(speed, origins, d, mode="u")
    solid = np.ones(speed.shape, bool)          # exclude everything
    _, a_solid = raycast_field(speed, origins, d, mode="u", exclude=solid)
    assert a_solid.max() == 0.0 and a_free.max() > 0.0
    # a zero depth buffer occludes the whole volume
    _, a_occ = raycast_field(speed, origins, d, mode="u",
                             geom_depth=np.zeros(len(origins), np.float32))
    assert a_occ.max() == 0.0


def test_raycast_perspective_rays():
    speed = _blob()
    cam = Camera(width=48, height=36, fov=70.0)
    origins, dirs, _ = _camera_rays(speed.shape, cam)
    assert dirs.ndim == 2
    rgb, alpha = raycast_field(speed, origins, dirs, mode="u")
    assert alpha.max() > 0.0


def test_slice_plane_samples_the_right_layer():
    n = 20
    field = np.zeros((n, n, n), np.float32)
    field[7] = 1.0                              # hot z-layer
    cam = Camera(width=64, height=48, elevation=70.0)
    origins, d, _ = _camera_rays(field.shape, cam)
    hit7, _, rgb7 = slice_plane(field, 0, 7, origins, d, mode="u", scale=1.0)
    hit3, _, rgb3 = slice_plane(field, 0, 3, origins, d, mode="u", scale=1.0)
    assert hit7.sum() > 0 and hit3.sum() > 0
    # layer 7 is hot -> rainbow(1) = red; layer 3 cold -> near black
    assert rgb7[hit7][:, 0].mean() > 0.9
    assert rgb3[hit3].sum(axis=1).mean() < 0.2


def test_slice_plane_axes_and_bounds():
    speed = _blob()
    cam = Camera(width=48, height=36)
    origins, d, _ = _camera_rays(speed.shape, cam)
    for axis in (0, 1, 2):
        hit, t, rgb = slice_plane(speed, axis, 12, origins, d, mode="u")
        assert hit.any()
        assert np.isfinite(t[hit]).all()
        assert (t[hit] > 0).all()


def test_auto_scale_modes():
    u = np.abs(np.random.default_rng(0).normal(0.1, 0.02, 1000))
    s = auto_scale(u, "u")
    assert 0.99 <= s * np.percentile(u, 99.5) <= 1.01
    rho = 1.0 + np.random.default_rng(1).normal(0, 0.01, 1000)
    assert auto_scale(rho, "rho") > 0
    assert auto_scale(np.array([]), "u") == 1.0
