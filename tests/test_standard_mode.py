"""Standard .luw mode: BC interpolators + end-to-end run on a synthetic case.

The reference examples ship no generated SurfData CSV, so these tests
synthesize one following the documented contract (X,Y,Z,u,v,w[,T][,patch]).
"""

import shutil
from pathlib import Path

import numpy as np
import pytest

from latticeurbanwind_tpu.bc.high_order import KNNInterpolatorHD
from latticeurbanwind_tpu.bc.nearest import nearest_neighbor_eval
from latticeurbanwind_tpu.bc.patch2d import PatchField2D
from latticeurbanwind_tpu.bc.samples import read_surfdata_csv
from latticeurbanwind_tpu.lbm.state import TYPE_E, TYPE_S, TYPE_T


def test_read_surfdata_named_and_positional(tmp_path):
    named = tmp_path / "named.csv"
    named.write_text("X,Y,Z,u,v,w,T,patch\n0,0,10,1,2,0,290,2\n100,0,10,2,1,0,295,3\n")
    s = read_surfdata_csv(named)
    assert s.has_temperature and s.has_patch
    assert s.max_speed == pytest.approx(np.sqrt(5))
    assert s.temperature_range() == (290.0, 295.0)
    legacy = tmp_path / "legacy.csv"
    legacy.write_text("x,y,z,u,v,w\n0,0,10,1,0,0\n")
    s2 = read_surfdata_csv(legacy)
    assert not s2.has_temperature and not s2.has_patch


def test_nearest_neighbor_matmul_matches_bruteforce():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 100, (500, 3))
    vals = rng.standard_normal((500, 3))
    q = rng.uniform(0, 100, (200, 3))
    got = nearest_neighbor_eval(pts, vals, q, use_jax=False)
    d2 = ((q[:, None, :] - pts[None]) ** 2).sum(axis=2)
    expect = vals[d2.argmin(axis=1)]
    np.testing.assert_allclose(got, expect)


def test_hd_interpolator_reproduces_smooth_plane_field():
    """Quadratic LSQ must reproduce a linear field on a plane exactly."""
    rng = np.random.default_rng(1)
    # samples on the x-min plane (x=0), linear in (y, z)
    n = 400
    y = rng.uniform(0, 100, n)
    z = rng.uniform(0, 50, n)
    pts = np.stack([np.zeros(n), y, z], axis=1)
    vals = np.stack([2.0 + 0.03 * y + 0.05 * z, 0.1 * z, np.zeros(n)], axis=1)
    interp = KNNInterpolatorHD(pts, vals)
    q = np.array([[0.0, 50.0, 25.0], [0.0, 20.0, 10.0]])
    got = interp.eval(q)
    expect = np.stack([2.0 + 0.03 * q[:, 1] + 0.05 * q[:, 2],
                       0.1 * q[:, 2], np.zeros(2)], axis=1)
    np.testing.assert_allclose(got, expect, rtol=5e-3, atol=1e-3)


def test_hd_exact_hit_returns_sample():
    pts = np.array([[0.0, 1.0, 2.0], [0.0, 5.0, 6.0], [0.0, 9.0, 3.0],
                    [0.0, 2.0, 8.0], [0.0, 7.0, 7.0], [0.0, 4.0, 4.0],
                    [0.0, 3.0, 1.0]])
    vals = np.arange(7, dtype=np.float64)[:, None]
    interp = KNNInterpolatorHD(pts, vals)
    got = interp.eval(np.array([[0.0, 5.0, 6.0]]))
    assert got[0, 0] == pytest.approx(1.0)


def test_patch_field_bilinear_structured():
    # structured 4x5 grid on patch "south" (a=x, b=z), values linear in (a, b)
    a, b = np.meshgrid(np.arange(4) * 10.0, np.arange(5) * 5.0, indexing="ij")
    vals = (2 * a + 3 * b).ravel()[:, None]
    f = PatchField2D(a.ravel(), b.ravel(), vals)
    got = f.eval(np.array([15.0]), np.array([7.5]))
    assert got[0, 0] == pytest.approx(2 * 15 + 3 * 7.5)
    # clamping outside the domain
    assert f.eval(np.array([-5.0]), np.array([0.0]))[0, 0] == pytest.approx(0.0)
    assert f.eval(np.array([35.0]), np.array([25.0]))[0, 0] == pytest.approx(2 * 30 + 3 * 20)
    # below-support detection
    assert not f.below_sample_support(np.array([15.0]), np.array([0.0]))[0]
    assert f.below_sample_support(np.array([15.0]), np.array([-1.0]))[0]


def _write_synthetic_case(case: Path, *, with_patch: bool, with_T: bool,
                          high_order: bool):
    from latticeurbanwind_tpu.geometry import Mesh, write_stl
    from tests.test_geometry import box_mesh

    case.mkdir(parents=True, exist_ok=True)
    (case / "proj_temp").mkdir(exist_ok=True)
    si = 400.0
    # deck
    deck_text = f"""// Project
casename = synth
datetime = 20250101120000

// Domain
cut_lon_manual = [120.0, 120.00415]
cut_lat_manual = [30.0, 30.0036]
si_x_cfd = [0.0, {si}]
si_y_cfd = [0.0, {si}]
si_z_cfd = [0.0, 200.0]
base_height = 20

// Generated
downstream_bc = "+y"

// CFD Controls
n_gpu = [1, 1, 1]
mesh_control = "cell_size"
cell_size = 20.0
high_order = {'true' if high_order else 'false'}
flux_correction = true
run_nstep = 30

// Output & Probes
purge_avg = 10
purge_avg_stride = 2

// Physics
coriolis_term = true
buoyancy = true
"""
    (case / "conf.luw").write_text(deck_text)
    # geometry: one tower on a base
    m1 = box_mesh((0, 0, 0), (si, si, 20.0))            # base pedestal
    m2 = box_mesh((150, 150, 0), (250, 250, 80.0))
    mesh = Mesh(tris=np.concatenate([m1.tris, m2.tris]))
    write_stl(case / "proj_temp" / "synth_DG.stl", mesh)
    # SurfData: boundary shell samples, log-ish profile along +x wind
    rows = ["X,Y,Z,u,v,w" + (",T" if with_T else "") + (",patch" if with_patch else "")]
    rng = np.random.default_rng(0)

    def emit(x, y, z, patch):
        zz = max(z - 20.0, 0.0)
        spd = 6.0 * np.log1p(zz / 10.0) / np.log1p(18.0)
        row = f"{x},{y},{z},{spd:.3f},0,0"
        if with_T:
            row += f",{290.0 + 8.0 * zz / 180.0:.2f}"
        if with_patch:
            row += f",{patch}"
        rows.append(row)

    zs = np.linspace(0, 200, 11)
    xy = np.linspace(0, si, 9)
    for z in zs:
        for v in xy:
            emit(0.0, v, z, 4)     # west
            emit(si, v, z, 5)      # east
            emit(v, 0.0, z, 2)     # south
            emit(v, si, z, 3)      # north
    for x in xy:
        for y in xy:
            emit(x, y, 200.0, 1)   # top
            if with_patch:
                emit(x, y, 20.0 + 3.0 * np.sin(x / 60), 0)  # ground
    (case / "proj_temp" / "SurfData_20250101120000.csv").write_text("\n".join(rows) + "\n")


@pytest.mark.parametrize("variant", ["nearest", "high_order", "patch"])
def test_standard_mode_end_to_end(tmp_path, variant):
    from latticeurbanwind_tpu.io import read_structured_points
    from latticeurbanwind_tpu.run.standard import run_standard_mode

    case = tmp_path / f"case_{variant}"
    _write_synthetic_case(case, with_patch=(variant == "patch"),
                          with_T=True, high_order=(variant == "high_order"))
    results = run_standard_mode(case / "conf.luw", quiet=True)
    assert len(results) == 1
    r = results[0]
    assert r.total_steps == 30
    avg = [f for f in r.files if "_avg-" in f.name]
    assert avg, r.files
    meta, fields = read_structured_points(avg[0])
    u = fields["u_avg"]
    fluid = fields["fluid"] > 0.5
    # wind roughly +x a few m/s
    assert u[0][fluid].mean() > 0.5
    assert "T_avg" in fields
    T = fields["T_avg"]
    assert 285.0 < T[fluid].mean() < 303.0       # SI Kelvin restored by affine map
    assert np.isfinite(u).all()
