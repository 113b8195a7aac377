"""Averaged VTK -> UTM/ASL NetCDF export.

Clean-room equivalent of tools_core/vtk_avg_to_utm_asl_nc.py: strips the base
pedestal rows below `base_height`, de-rotates winds to east/north components,
and writes a NetCDF on UTM easting/northing axes with above-sea-level heights.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

from ..deck import load_deck
from ..io.vtk import read_structured_points
from .transform import TransformModel
from .vtk2nc import discover_case_vtk_files, write_netcdf


def convert(deck_path: Path, vtk_path: Path) -> Path:
    from scipy.io import netcdf_file

    deck = load_deck(deck_path)
    meta, fields = read_structured_points(vtk_path)
    nx, ny, nz = meta["dims"]
    sp = meta["spacing"][0]
    base_h = deck.get_float("base_height", 50.0) or 50.0
    k0 = int(np.ceil(base_h / sp))           # strip pedestal rows

    model = TransformModel.from_deck(deck, (nx * sp, ny * sp))
    # 1-D UTM axes for the (small-residual-rotation) grid: the local frame
    # shifted by the rotated-window origin (the residual convergence angle
    # is recorded as metadata — reference :436 behavior)
    x = (np.arange(nx) + 0.5) * sp
    y = (np.arange(ny) + 0.5) * sp
    easting = model.origin_rot[0] + x
    northing = model.origin_rot[1] + y
    z_asl = (np.arange(k0, nz) + 0.5) * sp - base_h

    out_fields = {}
    uname = next((k for k in fields if fields[k].ndim == 4), None)
    if uname:
        u, v, w = fields[uname][:, k0:]
        ue, vn = model.derotate_winds(u, v)
        out_fields["ue"] = ue
        out_fields["vn"] = vn
        out_fields["w"] = w
    for name, arr in fields.items():
        if arr.ndim == 3:
            out_fields[name] = arr[k0:]

    out = vtk_path.parent.parent / (vtk_path.stem + "_utm_asl.nc")
    out.parent.mkdir(parents=True, exist_ok=True)
    with netcdf_file(str(out), "w") as nc:
        nc.rotate_deg_residual = float(model.rotate_deg)
        nc.createDimension("easting", nx)
        nc.createDimension("northing", ny)
        nc.createDimension("z", len(z_asl))
        for dim, vals, unit in (("easting", easting, b"m"),
                                ("northing", northing, b"m"),
                                ("z", z_asl, b"m ASL")):
            var = nc.createVariable(dim, "f", (dim,))
            var[:] = np.asarray(vals, np.float32)
            var.units = unit
        for name, data in out_fields.items():
            var = nc.createVariable(name, "f", ("z", "northing", "easting"))
            var[:] = np.asarray(data, np.float32)
    return out


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) != 1:
        print("Usage: vtk_avg_to_utm_asl_nc <deck file>")
        return 2
    deck_path = Path(argv[0]).expanduser().resolve()
    deck = load_deck(deck_path)
    dt = deck.get_text("datetime") or ""
    files = [f for f in discover_case_vtk_files(deck_path.parent, dt)
             if "_avg-" in f.name]
    if not files:
        print("vtk_avg_to_utm_asl_nc: no averaged VTK found")
        return 1
    out = convert(deck_path, files[-1])
    print(f"vtk_avg_to_utm_asl_nc: wrote {out.name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
