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


def test_buildbc_rotation_consistency_with_transform(tmp_path):
    """The geographic contract: buildBC's rotated local frame and
    post/transform.TransformModel must agree EXACTLY (SW cut corner at
    local (0,0), winds derotating back to east/north) — pinned after the
    round-2 convention fix."""
    from latticeurbanwind_tpu.deck import load_deck, parse_deck_text
    from latticeurbanwind_tpu.post.transform import TransformModel
    from latticeurbanwind_tpu.pre.buildbc import build_structured

    case = tmp_path / "case"
    (case / "proj_temp").mkdir(parents=True)
    deck = parse_deck_text(
        "// LUW deck\ncasename = t\ndatetime = 20250101000000\n"
        "base_height = 20\nz_limit = 200\nmidmesh_basesize = 100\n"
        "cut_lon_manual = [17.00, 17.20]\ncut_lat_manual = [59.00, 59.10]\n")
    deck.save(case / "conf.luw")
    ny, nx = 8, 9
    lon, lat = np.meshgrid(np.linspace(16.95, 17.25, nx),
                           np.linspace(58.97, 59.13, ny))
    z = np.array([10.0, 50.0, 100.0, 150.0, 220.0])
    shape3 = (len(z), ny, nx)
    u = np.full(shape3, 5.0)
    v = np.full(shape3, 2.0)
    build_structured(case / "conf.luw", lon, lat, z, u, v, np.zeros(shape3))

    deck = load_deck(case / "conf.luw")
    rot = deck.get_float("rotate_deg")
    assert abs(rot) > 0.5            # high latitude: real convergence angle
    tm = TransformModel.from_deck(deck)
    # SW cut corner lands exactly at local (0, 0)
    x0, y0 = tm.lonlat_to_local(np.array([17.00]), np.array([59.00]))
    assert abs(float(x0[0])) < 1e-6 and abs(float(y0[0])) < 1e-6
    # round-trip identity at sub-mm
    lo, la = tm.local_to_lonlat(np.array([1234.5]), np.array([987.6]))
    xb, yb = tm.lonlat_to_local(lo, la)
    assert abs(float(xb[0]) - 1234.5) < 1e-3
    assert abs(float(yb[0]) - 987.6) < 1e-3
    # CSV winds are rotated-frame; derotation recovers east/north exactly
    data = np.loadtxt(case / "proj_temp" / "SurfData_20250101000000.csv",
                      delimiter=",", skiprows=1)
    ue, vn = tm.derotate_winds(data[:, 3], data[:, 4])
    assert np.allclose(ue, 5.0, atol=1e-3)
    assert np.allclose(vn, 2.0, atol=1e-3)


def test_buildbc_vectorized_sampler_matches_scalar_rule():
    """The vectorized column sampler must reproduce the scalar inverse-
    distance-between-bracketing-levels rule (reference :1899-1928)."""
    from latticeurbanwind_tpu.pre.buildbc import _idw_interp_1d

    rng = np.random.default_rng(0)
    nz, dz = 9, 25.0
    z_new = np.arange(nz) * dz
    col = rng.standard_normal(nz)
    # replicate the vectorized math from build_structured.sample_many
    zq = np.concatenate([rng.uniform(0, (nz - 1) * dz, 200),
                         z_new, [0.0, (nz - 1) * dz]])
    k_lo = np.clip((zq // dz).astype(np.int64), 0, nz - 2)
    d_lo = zq - k_lo * dz
    d_up = (k_lo + 1) * dz - zq
    w_lo = 1.0 / np.maximum(d_lo, 1e-12)
    w_up = 1.0 / np.maximum(d_up, 1e-12)
    snap_lo = d_lo < 1e-6
    snap_up = (d_up < 1e-6) & ~snap_lo
    w_lo = np.where(snap_lo, 1.0, np.where(snap_up, 0.0, w_lo))
    w_up = np.where(snap_lo, 0.0, np.where(snap_up, 1.0, w_up))
    vec = (w_lo * col[k_lo] + w_up * col[k_lo + 1]) / (w_lo + w_up)
    ref = np.array([_idw_interp_1d(col, float(q), z_new) for q in zq])
    np.testing.assert_allclose(vec, ref, atol=1e-9)
