"""WRF/NetCDF ingestion for luwbc (requires xarray).

Clean-room equivalent of the heavy half of bridge_core/1_buildBC.py: dim
normalization + destaggering of WRF winds, AGL height derivation from the
geopotential, boundary-shell sample extraction, then the shared
projection/rotation/grid path in pre/buildbc.py.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _destagger(arr, axis):
    sl0 = [slice(None)] * arr.ndim
    sl1 = [slice(None)] * arr.ndim
    sl0[axis] = slice(None, -1)
    sl1[axis] = slice(1, None)
    return 0.5 * (arr[tuple(sl0)] + arr[tuple(sl1)])


def build_from_wrf(deck_path: Path) -> int:
    import xarray as xr

    from ..deck import load_deck
    from ..cli.inspect_tools import resolve_nc_path
    from .buildbc import build_from_samples

    deck_path = Path(deck_path)
    deck = load_deck(deck_path)
    nc = resolve_nc_path(deck_path.parent, deck)
    ds = xr.open_dataset(nc)
    print(f"[luwbc] ingesting {nc.name}")

    def first(names):
        for n in names:
            if n in ds:
                return ds[n]
        return None

    lon = first(["XLONG", "lon", "longitude", "XLON"])
    lat = first(["XLAT", "lat", "latitude"])
    if lon is None or lat is None:
        print("[luwbc] ERROR: no lon/lat coordinates found in the NetCDF")
        return 1
    u_var = first(["U", "u", "ua"])
    v_var = first(["V", "v", "va"])
    w_var = first(["W", "w", "wa"])
    if u_var is None or v_var is None:
        print("[luwbc] ERROR: no U/V wind fields found")
        return 1

    def pick_time(a):
        return a.isel(Time=0) if "Time" in a.dims else (
            a.isel(time=0) if "time" in a.dims else a)

    u = pick_time(u_var).values
    v = pick_time(v_var).values
    w = pick_time(w_var).values if w_var is not None else None
    lon2 = pick_time(lon).values if lon.ndim > 2 else lon.values
    lat2 = pick_time(lat).values if lat.ndim > 2 else lat.values

    # destagger WRF grids (west_east_stag, south_north_stag, bottom_top_stag)
    if u.shape[-1] == lon2.shape[-1] + 1:
        u = _destagger(u, -1)
    if v.shape[-2] == lat2.shape[-2] + 1:
        v = _destagger(v, -2)
    if w is not None and w.shape[0] == u.shape[0] + 1:
        w = _destagger(w, 0)
    if w is None:
        w = np.zeros_like(u)

    # AGL heights from geopotential (PH+PHB)/g - HGT, else hybrid levels
    ph = first(["PH"])
    phb = first(["PHB"])
    hgt = first(["HGT"])
    nz = u.shape[0]
    if ph is not None and phb is not None:
        gp = (pick_time(ph).values + pick_time(phb).values) / 9.81
        z_full = _destagger(gp, 0)
        z_agl = z_full - (pick_time(hgt).values[None] if hgt is not None else 0.0)
    else:
        z_agl = np.linspace(10.0, 1500.0, nz)[:, None, None] * np.ones_like(u)

    T_var = first(["T2", "T", "temp"])
    T = None
    if T_var is not None:
        Tv = pick_time(T_var).values
        if Tv.ndim == u.ndim:
            T = Tv
        elif Tv.ndim == u.ndim - 1:
            T = np.broadcast_to(Tv[None], u.shape).copy()
        if T is not None and np.nanmax(T) < 200.0:
            T = T + 300.0  # WRF perturbation potential temperature convention

    flat = lambda a: np.broadcast_to(a, u.shape).reshape(-1)
    samples = dict(
        lon=flat(lon2[None]), lat=flat(lat2[None]),
        z=z_agl.reshape(-1), u=u.reshape(-1), v=v.reshape(-1), w=w.reshape(-1),
    )
    finite = np.isfinite(samples["u"]) & np.isfinite(samples["v"])
    # subsample huge fields to a bounded sample count
    idx = np.nonzero(finite)[0]
    if len(idx) > 400000:
        idx = idx[:: len(idx) // 400000 + 1]
    build_from_samples(
        deck_path,
        samples["lon"][idx], samples["lat"][idx], samples["z"][idx],
        samples["u"][idx], samples["v"][idx], samples["w"][idx],
        T.reshape(-1)[idx] if T is not None else None,
    )
    return 0
