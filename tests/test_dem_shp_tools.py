"""visdem / shptester tools + pure-python shapefile reader."""

import struct

import numpy as np
import pytest

from latticeurbanwind_tpu.cli.dem_shp_tools import shptester_main, visdem_main
from latticeurbanwind_tpu.pre.shp_reader import polygon_defects, read_shp, ring_area


def _write_polygon_shp(path, polygons):
    """Minimal polygon shapefile: list of rings, each [(x, y), ...]."""
    records = b""
    for i, ring in enumerate(polygons):
        xs = [p[0] for p in ring] or [0.0]
        ys = [p[1] for p in ring] or [0.0]
        content = struct.pack("<i4d", 5, min(xs), min(ys), max(xs), max(ys))
        content += struct.pack("<ii", 1, len(ring))
        content += struct.pack("<i", 0)
        for x, y in ring:
            content += struct.pack("<2d", x, y)
        records += struct.pack(">ii", i + 1, len(content) // 2) + content
    xs = [p[0] for ring in polygons for p in ring] or [0.0]
    ys = [p[1] for ring in polygons for p in ring] or [0.0]
    header = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
    header += struct.pack(">i", (100 + len(records)) // 2)
    header += struct.pack("<ii", 1000, 5)
    header += struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
    header += struct.pack("<4d", 0, 0, 0, 0)
    path.write_bytes(header + records)


SQUARE = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)]
OPEN_RING = [(0.0, 0.0), (0.0, 5.0), (5.0, 5.0), (5.0, 0.0)]   # not closed
DEGENERATE = [(1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (1.0, 1.0)]  # zero area


def test_shp_reader_round_trip(tmp_path):
    shp = tmp_path / "b.shp"
    _write_polygon_shp(shp, [SQUARE, OPEN_RING, DEGENERATE])
    f = read_shp(shp)
    assert f.shape_name == "Polygon" and len(f.records) == 3
    assert f.records[0].parts[0] == SQUARE
    assert abs(ring_area(SQUARE)) == 100.0
    assert polygon_defects(f.records[0]) == []
    assert any("ring_not_closed" in d for d in polygon_defects(f.records[1]))
    assert any("zero_area" in d for d in polygon_defects(f.records[2]))


def test_shptester_cli(tmp_path, capsys):
    shp = tmp_path / "b.shp"
    _write_polygon_shp(shp, [SQUARE, DEGENERATE])
    rc = shptester_main([str(shp)])
    out = capsys.readouterr().out
    assert rc == 1           # defects present
    assert "ok" in out and "zero_area" in out
    _write_polygon_shp(shp, [SQUARE])
    assert shptester_main([str(shp)]) == 0


def test_visdem_from_csv(tmp_path, capsys):
    xs, ys = np.meshgrid(np.arange(20.0), np.arange(15.0))
    z = 5.0 + 2.0 * np.sin(xs / 3.0) + ys * 0.1
    rows = np.column_stack([xs.ravel(), ys.ravel(), z.ravel()])
    csv = tmp_path / "interpolated_dem.csv"
    np.savetxt(csv, rows, delimiter=",", header="x,y,z", comments="")
    out = tmp_path / "dem.png"
    rc = visdem_main([str(csv), str(out)])
    assert rc == 0 and out.exists() and out.stat().st_size > 5000
    assert "z range" in capsys.readouterr().out


def test_luwtkeviz(tmp_path, capsys):
    from latticeurbanwind_tpu.io.vtk import write_structured_points
    from latticeurbanwind_tpu.post.tke_viz import main as tkeviz_main

    Z, Y, X = 12, 24, 32
    rng = np.random.default_rng(0)
    u = rng.normal(3.0, 0.5, (3, Z, Y, X)).astype(np.float32)
    tke = np.abs(rng.normal(0.2, 0.05, (Z, Y, X))).astype(np.float32)
    vtk = tmp_path / "case_avg-000000100.vtk"
    write_structured_points(vtk, {"u_avg": u, "tke": tke}, spacing=10.0)
    rc = tkeviz_main([str(vtk), "--out", str(tmp_path / "viz"),
                      "--base-height", "0", "--layer-step", "10",
                      "--heights", "15", "35", "55", "75", "95"])
    out = capsys.readouterr().out
    assert rc == 0
    pngs = sorted((tmp_path / "viz").glob("*.png"))
    assert len(pngs) == 2 and all(p.stat().st_size > 10000 for p in pngs)
    assert "wind_layers" in out and "tke_layers" in out

    # batch (--deck) mode over RESULTS/vtk
    case = tmp_path / "case"
    (case / "RESULTS" / "vtk").mkdir(parents=True)
    write_structured_points(case / "RESULTS" / "vtk" / "x_avg-000000050.vtk",
                            {"u_avg": u, "tke": tke}, spacing=10.0)
    (case / "conf.luw").write_text("casename = x\n")
    rc = tkeviz_main(["--deck", str(case / "conf.luw"),
                      "--base-height", "0"])
    assert rc == 0
    assert list((case / "RESULTS" / "tke_viz").glob("*.png"))


def test_dem_ingest_csv(tmp_path, capsys):
    from latticeurbanwind_tpu.pre.dem_ingest import ingest_dem

    case = tmp_path / "case"
    (case / "database").mkdir(parents=True)
    (case / "conf.luw").write_text(
        "casename = d\nmanual_lon = [139.0, 139.02]\nmanual_lat = [37.9, 37.92]\n")
    # geographic DEM points: some inside the 120% bbox, some far away
    rng = np.random.default_rng(1)
    lon = np.concatenate([rng.uniform(138.99, 139.03, 400),
                          rng.uniform(150.0, 151.0, 100)])
    lat = np.concatenate([rng.uniform(37.89, 37.93, 400),
                          rng.uniform(20.0, 21.0, 100)])
    elev = rng.uniform(0, 80, 500)
    np.savetxt(case / "database" / "site_dem.csv",
               np.column_stack([lon, lat, elev]), delimiter=",",
               header="lon,lat,elev", comments="")
    out = ingest_dem(case / "conf.luw")
    assert out is not None and out.name == "dem_points.csv"
    pts = np.loadtxt(out, delimiter=",", skiprows=1)
    # 120% bbox covers 0.6 of the sampled lon span and 0.6 of lat ->
    # ~0.36 * 400 = 144 kept; all far-away (lon 150+) points clipped
    assert 100 <= len(pts) <= 200
    # local UTM metres, anchored at the SW corner; ~0.04 deg lon ~ 3.5 km
    assert pts[:, 0].min() == 0.0 and 1000 < pts[:, 0].max() < 6000
    assert np.all((pts[:, 2] >= 0) & (pts[:, 2] <= 80))


def _write_dbf(path, field, values, flen=10):
    """Minimal dBase III with one numeric column."""
    n = len(values)
    hdr_size = 32 + 32 + 1
    rec_size = 1 + flen
    hdr = bytearray(32)
    hdr[0] = 3
    hdr[1:4] = bytes([96, 1, 1])
    hdr[4:8] = struct.pack("<i", n)
    hdr[8:10] = struct.pack("<h", hdr_size)
    hdr[10:12] = struct.pack("<h", rec_size)
    fd = bytearray(32)
    fd[:11] = field.encode().ljust(11, b"\x00")
    fd[11] = ord("N")
    fd[16] = flen
    body = b""
    for v in values:
        body += b" " + (f"{v:.2f}".rjust(flen)).encode()
    path.write_bytes(bytes(hdr) + bytes(fd) + b"\x0d" + body + b"\x1a")


def test_luwcut_pure_python_shapefile(tmp_path, capsys):
    from latticeurbanwind_tpu.pre.shpcutter import main as luwcut_main

    case = tmp_path / "case"
    (case / "building_db").mkdir(parents=True)
    (case / "conf.luw").write_text(
        "casename = c\ncut_lon_manual = [139.0, 139.02]\n"
        "cut_lat_manual = [37.9, 37.92]\n"
        "si_x_cfd = [0.0, 1760.0]\nsi_y_cfd = [0.0, 2220.0]\n"
        'utm_crs = "EPSG:32654"\nrotate_deg = 0.0\n')
    # inside bbox / outside bbox / degenerate (zero area)
    d = 0.0005
    def sq(cx, cy):
        return [(cx-d, cy-d), (cx-d, cy+d), (cx+d, cy+d), (cx+d, cy-d), (cx-d, cy-d)]
    polys = [sq(139.01, 37.91), sq(139.30, 37.60),
             [(139.011, 37.911)] * 4]
    _write_polygon_shp(case / "building_db" / "b.shp", polys)
    _write_dbf(case / "building_db" / "b.dbf", "height", [25.0, 30.0, 40.0])

    rc = luwcut_main([str(case / "conf.luw")])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "1 footprints" in out and "2 dropped" in out
    rows = np.loadtxt(case / "proj_temp" / "buildings.csv",
                      delimiter=",", skiprows=1)
    assert rows.shape == (5, 4)
    assert np.all(rows[:, 3] == 25.0)                      # dbf height used
    assert 0 <= rows[:, 0].min() and rows[:, 0].max() <= 1760   # local frame
    assert 0 <= rows[:, 1].min() and rows[:, 1].max() <= 2220
