"""vtk2nc — solver VTK output -> geographic NetCDF.

Clean-room equivalent of tools_core/vtk2nc_new.py: discover the case's VTK
files, parse the binary STRUCTURED_POINTS, inverse-transform the local
rotated-UTM grid to lon/lat (post/transform.py), regrid the winds (de-rotated
to east/north) onto a regular lon/lat target grid, and write NetCDF into
RESULTS/.  NetCDF written as classic NetCDF-3 via scipy (no netCDF4
dependency needed).
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import List, Optional

import numpy as np

from ..deck import load_deck
from ..io.vtk import read_structured_points
from .transform import TransformModel


def discover_case_vtk_files(home: Path, datetime_tag: str) -> List[Path]:
    vtk_dir = home / "RESULTS" / "vtk"
    if not vtk_dir.exists():
        return []
    return sorted(p for p in vtk_dir.glob(f"*{datetime_tag}*.vtk"))


def _regrid_nearest(src_lon, src_lat, values, lon_t, lat_t):
    """Nearest-sample regrid of (Z, ny, nx) values onto target lon/lat axes."""
    pts = np.stack([src_lon.ravel(), src_lat.ravel()], axis=1)
    glon, glat = np.meshgrid(lon_t, lat_t)
    tq = np.stack([glon.ravel(), glat.ravel()], axis=1)
    # scale lat/lon to comparable metric before NN
    scale = np.array([np.cos(np.radians(glat.mean())), 1.0])
    from ..pre.terrain import _knn

    idx, _ = _knn(pts * scale, tq * scale, 1)
    idx = idx[:, 0]
    out = values.reshape(values.shape[0], -1)[:, idx]
    return out.reshape(values.shape[0], len(lat_t), len(lon_t))


def write_netcdf(path: Path, lon, lat, z, fields: dict) -> Path:
    from scipy.io import netcdf_file

    path.parent.mkdir(parents=True, exist_ok=True)
    with netcdf_file(str(path), "w") as nc:
        nc.createDimension("lon", len(lon))
        nc.createDimension("lat", len(lat))
        nc.createDimension("z", len(z))
        vlon = nc.createVariable("lon", "f", ("lon",))
        vlat = nc.createVariable("lat", "f", ("lat",))
        vz = nc.createVariable("z", "f", ("z",))
        vlon[:] = np.asarray(lon, np.float32)
        vlat[:] = np.asarray(lat, np.float32)
        vz[:] = np.asarray(z, np.float32)
        vlon.units = b"degrees_east"
        vlat.units = b"degrees_north"
        vz.units = b"m"
        for name, data in fields.items():
            var = nc.createVariable(name, "f", ("z", "lat", "lon"))
            var[:] = np.asarray(data, np.float32)
            var.units = b"m s-1" if name in ("u", "v", "w", "ue", "vn") else b""
    return path


def convert_vtk_to_nc(deck_path: Path, vtk_path: Path, *,
                      target_points: int = 120) -> Optional[Path]:
    deck = load_deck(deck_path)
    meta, fields = read_structured_points(vtk_path)
    nx, ny, nz = meta["dims"]
    sp = meta["spacing"][0]
    origin = meta["origin"]

    # local cell-center coordinates spanning [0, N*sp]
    x = (np.arange(nx) + 0.5) * sp
    y = (np.arange(ny) + 0.5) * sp
    z = origin[2] + np.arange(nz) * sp

    gx, gy = np.meshgrid(x, y)
    if deck.get_pair("cut_lon_manual") and deck.get_pair("cut_lat_manual"):
        model = TransformModel.from_deck(deck, (nx * sp, ny * sp))
        lon_g, lat_g = model.local_to_lonlat(gx, gy)
        derotate = model.derotate_winds
    else:
        # geography-free decks (profile/dataset-gen modes): export on the
        # local meter grid with an identity wind transform
        model = None
        lon_g, lat_g = gx, gy

        def derotate(u, v):
            return u, v
    lon_t = np.linspace(lon_g.min(), lon_g.max(), target_points)
    lat_t = np.linspace(lat_g.min(), lat_g.max(), target_points)

    out_fields = {}
    uname = next((k for k in fields
                  if k.lower().startswith("u") or fields[k].ndim == 4), None)
    if uname and fields[uname].ndim == 4:
        u, v, w = fields[uname]
        ue, vn = derotate(u, v)
        out_fields["ue"] = _regrid_nearest(lon_g, lat_g, ue, lon_t, lat_t)
        out_fields["vn"] = _regrid_nearest(lon_g, lat_g, vn, lon_t, lat_t)
        out_fields["w"] = _regrid_nearest(lon_g, lat_g, w, lon_t, lat_t)
    for name, arr in fields.items():
        if arr.ndim == 3 and name.lower() not in ("fluid",):
            out_fields[name] = _regrid_nearest(lon_g, lat_g, arr, lon_t, lat_t)
    if not out_fields:
        return None
    out = vtk_path.parent.parent / (vtk_path.stem + ".nc")
    return write_netcdf(out, lon_t, lat_t, z, out_fields)


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) != 1:
        print("Usage: vtk2nc <deck file>")
        return 2
    deck_path = Path(argv[0]).expanduser().resolve()
    deck = load_deck(deck_path)
    dt = deck.get_text("datetime") or ""
    files = discover_case_vtk_files(deck_path.parent, dt)
    if not files:
        print(f"vtk2nc: no VTK files found for datetime {dt}")
        return 1
    written = 0
    for f in files:
        try:
            out = convert_vtk_to_nc(deck_path, f)
        except Exception as e:
            print(f"vtk2nc: {f.name}: {type(e).__name__}: {e}")
            continue
        if out is not None:
            print(f"vtk2nc: {f.name} -> {out.name}")
            written += 1
    print(f"vtk2nc: wrote {written} NetCDF file(s)")
    return 0 if written else 1


if __name__ == "__main__":
    sys.exit(main())
