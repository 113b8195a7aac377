"""Preprocessing + postprocessing tools: UTM math, terrain interpolation,
CLI pipeline stages, NetCDF export."""

import numpy as np
import pytest

from latticeurbanwind_tpu.pre.terrain import (
    TerrainConfig, idw_interpolate, interpolate_terrain_grid, kriging_interpolate,
)
from latticeurbanwind_tpu.pre.utm import (
    lonlat_to_utm, utm_epsg_for, utm_to_lonlat, utm_zone_for,
)


def test_utm_zone_and_epsg():
    assert utm_zone_for(121.5) == 51
    assert utm_epsg_for(121.5, 31.2) == 32651
    assert utm_epsg_for(121.5, -31.2) == 32751
    assert utm_zone_for(-74.0) == 18


def test_utm_known_point():
    # Published reference: (lon 121.5, lat 31.25) -> UTM 51N
    e, n = lonlat_to_utm(np.array([121.5]), np.array([31.25]))
    # zone 51 central meridian 123E; computed with independent tooling
    assert 350000 < e[0] < 370000
    assert 3455000 < n[0] < 3465000
    # round trip to sub-millimeter
    lon, lat = utm_to_lonlat(e, n, zone=51)
    assert abs(lon[0] - 121.5) < 1e-8
    assert abs(lat[0] - 31.25) < 1e-8


def test_utm_round_trip_grid():
    lon = np.linspace(120.5, 122.5, 7)
    lat = np.linspace(30.0, 32.0, 7)
    glon, glat = np.meshgrid(lon, lat)
    e, n = lonlat_to_utm(glon.ravel(), glat.ravel(), zone=51)
    lon2, lat2 = utm_to_lonlat(e, n, zone=51)
    np.testing.assert_allclose(lon2, glon.ravel(), atol=1e-8)
    np.testing.assert_allclose(lat2, glat.ravel(), atol=1e-8)


def test_idw_and_kriging_reproduce_plane():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1000, (300, 2))
    z = 5.0 + 0.01 * pts[:, 0] + 0.02 * pts[:, 1]
    targets = rng.uniform(100, 900, (50, 2))
    expect = 5.0 + 0.01 * targets[:, 0] + 0.02 * targets[:, 1]
    got_idw = idw_interpolate(pts, z, targets, neighbors=12)
    np.testing.assert_allclose(got_idw, expect, atol=0.8)
    got_k = kriging_interpolate(pts, z, targets, neighbors=12, use_jax=False)
    np.testing.assert_allclose(got_k, expect, atol=0.25)
    # kriging should beat IDW on a linear trend
    assert np.abs(got_k - expect).mean() <= np.abs(got_idw - expect).mean() + 1e-6


def test_terrain_grid_exact_at_samples():
    pts = np.array([[0.0, 0.0], [100.0, 0.0], [0.0, 100.0], [100.0, 100.0],
                    [50.0, 50.0]])
    z = np.array([10.0, 20.0, 30.0, 40.0, 25.0])
    cfg = TerrainConfig(approach="idw", grid_resolution=50, idw_sigma=0.0,
                        neighbors=4)
    grid = interpolate_terrain_grid(pts, z, np.array([0.0, 50.0, 100.0]),
                                    np.array([0.0, 50.0, 100.0]), cfg)
    assert grid.shape == (3, 3)
    assert grid[0, 0] == pytest.approx(10.0, abs=1e-6)
    assert grid[2, 2] == pytest.approx(40.0, abs=1e-6)
    assert grid[1, 1] == pytest.approx(25.0, abs=1e-6)


def test_transform_model_round_trip():
    from latticeurbanwind_tpu.deck import parse_deck_text
    from latticeurbanwind_tpu.post.transform import TransformModel

    deck = parse_deck_text("""
    cut_lon_manual = [121.3, 121.7]
    cut_lat_manual = [31.1, 31.4]
    utm_crs = "EPSG:32651"
    rotate_deg = 12.5
    """)
    model = TransformModel.from_deck(deck, (30000.0, 25000.0))
    x = np.array([1000.0, 15000.0, 29000.0])
    y = np.array([2000.0, 12500.0, 24000.0])
    lon, lat = model.local_to_lonlat(x, y)
    x2, y2 = model.lonlat_to_local(lon, lat)
    np.testing.assert_allclose(x2, x, atol=1e-4)
    np.testing.assert_allclose(y2, y, atol=1e-4)
    # derotation preserves speed
    ue, vn = model.derotate_winds(np.array([3.0]), np.array([4.0]))
    assert np.hypot(ue, vn)[0] == pytest.approx(5.0, rel=1e-6)


def test_prerun_validation_pass_and_fail(tmp_path):
    from latticeurbanwind_tpu.cli.validate import main as luwval
    from latticeurbanwind_tpu.deck import load_deck
    from latticeurbanwind_tpu.geometry import write_stl
    from tests.test_geometry import box_mesh

    case = tmp_path / "case"
    (case / "proj_temp").mkdir(parents=True)
    (case / "conf.luw").write_text(
        "casename = t\ndatetime = 20250101000000\n"
        "cut_lon_manual = [1,2]\ncut_lat_manual = [3,4]\n")
    write_stl(case / "proj_temp" / "t.stl", box_mesh((0, 0, 0), (1000, 800, 100)))
    csv = case / "proj_temp" / "SurfData_20250101000000.csv"
    csv.write_text("X,Y,Z,u,v,w\n0,0,10,1,0,0\n1000,800,10,1,0,0\n")
    assert luwval([str(case / "conf.luw")]) == 0
    deck = load_deck(case / "conf.luw")
    assert deck.get_text("validation") == "pass"
    assert deck.get_int("gpu_memory") is not None
    # now break the extents
    csv.write_text("X,Y,Z,u,v,w\n0,0,10,1,0,0\n1500,800,10,1,0,0\n")
    luwval([str(case / "conf.luw")])
    assert load_deck(case / "conf.luw").get_text("validation") == "error"


def test_voxelization_stage_outputs(tmp_path):
    from latticeurbanwind_tpu.pre.voxelization import main as luwvox
    from latticeurbanwind_tpu.geometry import read_stl

    case = tmp_path / "vox"
    (case / "proj_temp").mkdir(parents=True)
    (case / "conf.luw").write_text(
        "casename = vx\nsi_x_cfd = [0, 1000]\nsi_y_cfd = [0, 800]\n"
        "si_z_cfd = [0, 300]\nbase_height = 20\n"
        "terr_voxel_grid_resolution = 100\nterr_voxel_approach = idw\n")
    rng = np.random.default_rng(2)
    pts = np.stack([rng.uniform(0, 1000, 200), rng.uniform(0, 800, 200),
                    10 * np.sin(rng.uniform(0, 6, 200))], axis=1)
    np.savetxt(case / "proj_temp" / "dem_points.csv", pts, delimiter=",",
               header="x,y,elevation", comments="")
    (case / "proj_temp" / "buildings.csv").write_text(
        "id,x,y,height\n0,100,100,50\n0,200,100,50\n0,200,200,50\n0,100,200,50\n")
    assert luwvox([str(case / "conf.luw")]) == 0
    stl = read_stl(case / "proj_temp" / "vx_DG.stl")
    assert len(stl.tris) > 100
    np.testing.assert_allclose(stl.pmin[:2], [0, 0], atol=1e-3)
    np.testing.assert_allclose(stl.pmax[:2], [1000, 800], atol=1e-3)
    assert stl.pmax[2] > 50  # building above terrain
    dem = np.loadtxt(case / "proj_temp" / "interpolated_dem.csv",
                     delimiter=",", skiprows=1)
    assert dem.shape[1] == 3


def test_netcdf_export_round_trip(tmp_path):
    from scipy.io import netcdf_file

    from latticeurbanwind_tpu.post.vtk2nc import write_netcdf

    lon = np.linspace(121, 122, 5)
    lat = np.linspace(31, 32, 4)
    z = np.array([10.0, 50.0])
    u = np.arange(2 * 4 * 5, dtype=np.float32).reshape(2, 4, 5)
    path = write_netcdf(tmp_path / "t.nc", lon, lat, z, {"ue": u})
    with netcdf_file(str(path), "r", mmap=False) as nc:
        np.testing.assert_allclose(nc.variables["ue"][:], u)
        np.testing.assert_allclose(nc.variables["lon"][:], lon)
