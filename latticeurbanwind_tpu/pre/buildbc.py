"""luwbc — NWP/WRF NetCDF -> SurfData boundary-sample CSV.

Clean-room equivalent of bridge_core/1_buildBC.py (2481 LoC): normalizes WRF
dims/coords and destaggers winds, derives AGL heights, crops to the deck's
lon/lat window, projects to UTM, rotates the domain to a wind-aligned box,
interpolates onto a uniform meter grid on each boundary face, writes
proj_temp/SurfData_<datetime>.csv and the Generated deck fields
(si_*_cfd, utm_crs, rotate_deg, um_vol, um_bc, downstream_bc,
downstream_bc_yaw, datetime).

The heavy GIS path requires xarray (WRF NetCDF-4).  Without it this stage
reports clearly and exits nonzero so makeluw stops before the solver.
A dependency-light path accepts proj_temp/wind_samples.csv
(lon,lat,z_agl,u,v,w[,T]) and performs the same projection/rotation/grid
steps with the built-in UTM math (pre/utm.py).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

from ..deck import load_deck
from .utm import lonlat_to_utm, utm_epsg_for


def _rotation_for_wind(mean_u: float, mean_v: float) -> float:
    """Rotation (deg) aligning the mean wind with a box axis.

    The reference rotates the domain so the dominant flow crosses a face
    squarely (1_buildBC.py:999-1058); we rotate the box by the wind yaw
    modulo 90 deg, keeping the rotation small."""
    yaw = np.degrees(np.arctan2(mean_u, mean_v))   # meteorological-ish
    rot = ((yaw + 45.0) % 90.0) - 45.0
    return float(rot)


def _downstream_face(mean_u: float, mean_v: float) -> tuple:
    if abs(mean_u) >= abs(mean_v):
        face = "+x" if mean_u >= 0 else "-x"
    else:
        face = "+y" if mean_v >= 0 else "-y"
    yaw = float(np.degrees(np.arctan2(mean_u, mean_v)))
    return face, yaw


def build_from_samples(deck_path: Path, lon, lat, z_agl, u, v, w, T=None) -> Path:
    """Project, rotate, and emit the SurfData CSV + deck writebacks."""
    deck = load_deck(deck_path)
    home = deck_path.parent
    dt = deck.get_text("datetime") or "20990101120000"

    lon = np.asarray(lon, float)
    lat = np.asarray(lat, float)
    lon_pair = deck.get_pair("cut_lon_manual")
    lat_pair = deck.get_pair("cut_lat_manual")
    if lon_pair and lat_pair:
        inside = ((lon >= lon_pair[0]) & (lon <= lon_pair[1])
                  & (lat >= lat_pair[0]) & (lat <= lat_pair[1]))
        if inside.sum() < 8:
            print(f"[luwbc] WARNING: only {int(inside.sum())} samples inside the "
                  "lon/lat window; using all samples")
            inside = np.ones(len(lon), bool)
    else:
        inside = np.ones(len(lon), bool)
    lon, lat = lon[inside], lat[inside]
    z_agl = np.asarray(z_agl, float)[inside]
    u = np.asarray(u, float)[inside]
    v = np.asarray(v, float)[inside]
    w = np.asarray(w, float)[inside]
    T_arr = np.asarray(T, float)[inside] if T is not None else None

    epsg = utm_epsg_for(float(lon.mean()), float(lat.mean()))
    ux, uy = lonlat_to_utm(lon, lat)

    mean_u, mean_v = float(u.mean()), float(v.mean())
    rot = _rotation_for_wind(mean_u, mean_v)
    th = np.radians(rot)
    cx, cy = ux.mean(), uy.mean()
    xr = np.cos(th) * (ux - cx) + np.sin(th) * (uy - cy)
    yr = -np.sin(th) * (ux - cx) + np.cos(th) * (uy - cy)
    ur = np.cos(th) * u + np.sin(th) * v
    vr = -np.sin(th) * u + np.cos(th) * v
    x0, y0 = xr.min(), yr.min()
    X = xr - x0
    Y = yr - y0

    face, yaw = _downstream_face(float(ur.mean()), float(vr.mean()))
    z_top = float(np.nanmax(z_agl))
    base_h = deck.get_float("base_height", 50.0) or 50.0
    Z = z_agl + base_h

    out = home / "proj_temp" / f"SurfData_{dt}.csv"
    out.parent.mkdir(parents=True, exist_ok=True)
    cols = [X, Y, Z, ur, vr, w]
    header = "X,Y,Z,u,v,w"
    if T_arr is not None:
        cols.append(T_arr)
        header += ",T"
    np.savetxt(out, np.stack(cols, axis=1), delimiter=",", header=header,
               comments="", fmt="%.6f")

    # Generated deck fields (reference writebacks: 1_buildBC.py:1822-1826,2432-2438)
    deck.set_pair("si_x_cfd", (0.0, float(X.max())))
    deck.set_pair("si_y_cfd", (0.0, float(Y.max())))
    deck.set_pair("si_z_cfd", (0.0, float(Z.max())))
    deck.set_text("utm_crs", f"EPSG:{epsg}", quoted=True)
    deck.set_float("rotate_deg", rot)
    deck.set_list("um_vol", [mean_u, mean_v, float(w.mean())])
    deck.set_list("um_bc", [float(ur.mean()), float(vr.mean()), float(w.mean())])
    deck.set_text("downstream_bc", face, quoted=True)
    deck.set_float("downstream_bc_yaw", yaw, precision=2)
    deck.set_bool("origin_shift_applied", True)
    deck.set_float("center_lon", float(lon.mean()))
    deck.set_float("center_lat", float(lat.mean()))
    # default the cut window to the data extent when the user gave none —
    # probes and the geographic transform (post/transform.py) need it
    if deck.get_pair("cut_lon_manual") is None:
        deck.set_pair("cut_lon_manual", (float(lon.min()), float(lon.max())))
    if deck.get_pair("cut_lat_manual") is None:
        deck.set_pair("cut_lat_manual", (float(lat.min()), float(lat.max())))
    deck.save()
    print(f"[luwbc] wrote {out.name} ({len(X)} samples), EPSG:{epsg}, "
          f"rotate {rot:.3f} deg, downstream {face}")
    return out


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) != 1:
        print("Usage: luwbc <deck file>")
        return 2
    deck_path = Path(argv[0]).expanduser().resolve()
    home = deck_path.parent

    # dependency-light path: pre-extracted samples table
    light = home / "proj_temp" / "wind_samples.csv"
    if light.exists():
        raw = np.loadtxt(light, delimiter=",", skiprows=1, ndmin=2)
        T = raw[:, 6] if raw.shape[1] >= 7 else None
        build_from_samples(deck_path, raw[:, 0], raw[:, 1], raw[:, 2],
                           raw[:, 3], raw[:, 4], raw[:, 5], T)
        return 0

    # WRF/NetCDF path: xarray when installed, scipy NetCDF-3 fallback
    from .wrf_ingest import build_from_wrf

    try:
        return build_from_wrf(deck_path)
    except FileNotFoundError as e:
        print(f"[luwbc] ERROR: {e}\n"
              "  Provide wind_bc/<case>_<datetime>.nc (NetCDF-3 classic works "
              "without the GIS stack; NetCDF-4 needs xarray), or pre-extract "
              "samples to proj_temp/wind_samples.csv (lon,lat,z_agl,u,v,w[,T]).")
        return 1
    except Exception as e:   # noqa: BLE001 — scipy raises bare errors on NC4
        if "is not a valid NetCDF 3 file" in str(e):
            print("[luwbc] ERROR: the NetCDF file is NetCDF-4/HDF5 and xarray "
                  "is not installed.  Convert with `nccopy -k classic` or "
                  "install xarray/netCDF4.")
            return 1
        raise


if __name__ == "__main__":
    sys.exit(main())
