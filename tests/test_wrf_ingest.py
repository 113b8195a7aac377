"""WRF NetCDF-3 ingestion (scipy fallback path) -> SurfData CSV."""

from pathlib import Path

import numpy as np
import pytest


def _write_wrf_nc3(path, *, nz=6, ny=8, nx=9):
    """Synthetic WRF-like file: staggered U/V/W, PH/PHB geopotential, HGT."""
    from scipy.io import netcdf_file

    f = netcdf_file(str(path), "w")
    f.createDimension("Time", 1)
    f.createDimension("bottom_top", nz)
    f.createDimension("bottom_top_stag", nz + 1)
    f.createDimension("south_north", ny)
    f.createDimension("south_north_stag", ny + 1)
    f.createDimension("west_east", nx)
    f.createDimension("west_east_stag", nx + 1)

    lon1 = 121.3 + 0.01 * np.arange(nx)
    lat1 = 31.1 + 0.01 * np.arange(ny)
    lon2, lat2 = np.meshgrid(lon1, lat1)

    def var(name, dims, data):
        v = f.createVariable(name, "f", dims)
        v[:] = data.astype(np.float32)

    var("XLONG", ("Time", "south_north", "west_east"), lon2[None])
    var("XLAT", ("Time", "south_north", "west_east"), lat2[None])
    # log-profile-ish U, staggered in x; V staggered in y; W staggered in z
    zlev = np.arange(1, nz + 1, dtype=np.float64)
    prof = 4.0 + 2.0 * np.log1p(zlev)[:, None, None]
    var("U", ("Time", "bottom_top", "south_north", "west_east_stag"),
        np.broadcast_to(prof, (nz, ny, nx + 1))[None])
    var("V", ("Time", "bottom_top", "south_north_stag", "west_east"),
        np.full((1, nz, ny + 1, nx), 1.0))
    var("W", ("Time", "bottom_top_stag", "south_north", "west_east"),
        np.zeros((1, nz + 1, ny, nx)))
    # geopotential: z_full = (PH+PHB)/g; make AGL = 40*k + 20 over HGT=100
    hgt = np.full((ny, nx), 100.0)
    z_stag = 100.0 + 40.0 * np.arange(nz + 1)[:, None, None] + hgt[None]
    var("PH", ("Time", "bottom_top_stag", "south_north", "west_east"),
        np.zeros((1, nz + 1, ny, nx)))
    var("PHB", ("Time", "bottom_top_stag", "south_north", "west_east"),
        (z_stag * 9.81)[None])
    var("HGT", ("Time", "south_north", "west_east"), hgt[None])
    var("T2", ("Time", "south_north", "west_east"),
        np.full((1, ny, nx), 288.15))
    f.close()


def test_luwbc_wrf_nc3_ingest(tmp_path):
    from latticeurbanwind_tpu.deck import load_deck
    from latticeurbanwind_tpu.pre.buildbc import main as luwbc_main

    case = tmp_path / "case"
    (case / "wind_bc").mkdir(parents=True)
    (case / "conf.luw").write_text(
        "// LUW deck\ncasename = nwp\ndatetime = 20251010120000\n"
        "base_height = 20.0\nz_limit = 200\n")
    _write_wrf_nc3(case / "wind_bc" / "nwp_20251010120000.nc")

    rc = luwbc_main([str(case / "conf.luw")])
    assert rc == 0

    csv = case / "proj_temp" / "SurfData_20251010120000.csv"
    assert csv.exists()
    with open(csv) as fh:
        header = fh.readline().strip().split(",")
    assert header[:6] == ["X", "Y", "Z", "u", "v", "w"]
    data = np.loadtxt(csv, delimiter=",", skiprows=1)
    assert len(data) > 100
    assert np.isfinite(data).all()
    speed = np.hypot(data[:, 3], data[:, 4])
    assert 3.0 < speed.max() < 12.0         # log profile magnitudes
    assert data[:, 2].min() >= 0.0           # AGL heights

    # deck writebacks (reference 1_buildBC.py:1822-1826 contract)
    deck = load_deck(case / "conf.luw")
    for key in ("si_x_cfd", "si_y_cfd", "si_z_cfd"):
        rng = deck.get_float_list(key)
        assert rng and len(rng) == 2 and rng[1] > rng[0]
    assert deck.get_text("downstream_bc")


def test_buildbc_patch_faces_and_rotation(tmp_path):
    """The structured path emits the patch column (bottom=0..east=5,
    reference 1_buildBC.py:2164-2400), applies the grid-convergence
    rotation of the cut-window bottom edge (:999-1058), and writes the
    downstream yaw as the signed angle off the face normal (:2413-2438)."""
    from latticeurbanwind_tpu.deck import load_deck
    from latticeurbanwind_tpu.pre.buildbc import main as luwbc_main

    case = tmp_path / "case"
    (case / "wind_bc").mkdir(parents=True)
    (case / "conf.luw").write_text(
        "// LUW deck\ncasename = nwp\ndatetime = 20251010120000\n"
        "base_height = 20.0\nz_limit = 200\nmidmesh_basesize = 50\n"
        "cut_lon_manual = [121.31, 121.36]\ncut_lat_manual = [31.11, 31.16]\n")
    _write_wrf_nc3(case / "wind_bc" / "nwp_20251010120000.nc")
    assert luwbc_main([str(case / "conf.luw")]) == 0

    csv = case / "proj_temp" / "SurfData_20251010120000.csv"
    with open(csv) as fh:
        header = fh.readline().strip().split(",")
    assert header[-1] == "patch"
    data = np.loadtxt(csv, delimiter=",", skiprows=1)
    patch = data[:, -1].astype(int)
    assert set(patch) == {0, 1, 2, 3, 4, 5}
    z = data[:, 2]
    w = data[:, 5]
    # bottom face hugs the ground (base_height + eps); w kept
    assert np.allclose(z[patch == 0], z[patch == 0].min(), atol=0.2)
    # top face is the flat global cap with w = 0
    assert np.allclose(z[patch == 1], z.max())
    assert np.all(w[patch == 1] == 0.0)
    # sides stack from the ground upward with w = 0
    for p in (2, 3, 4, 5):
        assert z[patch == p].min() <= z[patch == 0].min() + 0.2
        assert np.all(w[patch == p] == 0.0)

    deck = load_deck(case / "conf.luw")
    rot = deck.get_float("rotate_deg")
    # UTM grid convergence at ~121.3E (zone 51, ~0.6 deg west of the central
    # meridian) is well under a degree — NOT a wind-aligned rotation
    assert abs(rot) < 2.0
    # downstream yaw: wind is mostly +x with a small +y component
    assert deck.get_text("downstream_bc") == "+x"
    yaw = deck.get_float("downstream_bc_yaw")
    um = deck.get_float_list("um_vol")
    import math
    expect = math.degrees(math.atan2(abs(um[1]), abs(um[0])))
    assert abs(yaw - expect) < 0.5
    assert deck.get_float_list("um_bc")


def test_buildbc_dem_terrain_sampling(tmp_path):
    """With a DEM point shapefile in terrain_db/, boundary samples follow
    the terrain: bottom-face Z varies by the local relief and si_z_cfd
    gains the max elevation (reference :559-685, :1790-1810)."""
    from latticeurbanwind_tpu.deck import load_deck
    from latticeurbanwind_tpu.pre.buildbc import main as luwbc_main
    from latticeurbanwind_tpu.pre.shp_reader import write_point_shp

    case = tmp_path / "case"
    (case / "wind_bc").mkdir(parents=True)
    (case / "terrain_db").mkdir()
    (case / "conf.luw").write_text(
        "// LUW deck\ncasename = nwp\ndatetime = 20251010120000\n"
        "base_height = 20.0\nz_limit = 200\nmidmesh_basesize = 50\n")
    _write_wrf_nc3(case / "wind_bc" / "nwp_20251010120000.nc")
    # ramp terrain: 0 m in the west rising to 60 m in the east
    lon = 121.3 + 0.01 * np.arange(9)
    lat = 31.1 + 0.01 * np.arange(8)
    pts, elevs = [], []
    for la in lat:
        for lo in lon:
            pts.append((lo, la))
            elevs.append(60.0 * (lo - lon[0]) / (lon[-1] - lon[0]))
    write_point_shp(case / "terrain_db" / "dem.shp", pts, values=elevs)

    assert luwbc_main([str(case / "conf.luw")]) == 0
    data = np.loadtxt(case / "proj_temp" / "SurfData_20251010120000.csv",
                      delimiter=",", skiprows=1)
    patch = data[:, -1].astype(int)
    zb = data[patch == 0, 2]
    assert zb.max() - zb.min() > 40.0        # bottom face follows the ramp
    deck = load_deck(case / "conf.luw")
    z_hi = deck.get_float_list("si_z_cfd")[1]
    assert z_hi > 200.0 + 20.0 + 40.0        # cap lifted above max terrain
