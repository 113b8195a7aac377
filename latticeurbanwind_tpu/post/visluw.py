"""visluw — per-height wind-section figures from the case VTK.

Clean-room equivalent of tools_core/visluw.py: reads the <datetime> avg (or
raw u) VTK, slices configurable height layers, renders wind-speed maps with
quiver overlays and lon/lat axes, and optionally exports the 3-D field as
NetCDF.  matplotlib Agg backend; one PNG per layer under RESULTS/figures.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

from ..deck import load_deck
from ..io.vtk import read_structured_points
from .transform import TransformModel
from .vtk2nc import discover_case_vtk_files


def render_layers(deck_path: Path, vtk_path: Path, *, layers=None,
                  out_dir: Path = None) -> list:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    deck = load_deck(deck_path)
    meta, fields = read_structured_points(vtk_path)
    nx, ny, nz = meta["dims"]
    sp = meta["spacing"][0]
    uname = next((k for k in fields if k.lower().startswith("u")
                  and fields[k].ndim == 4), None)
    if uname is None:
        raise ValueError(f"{vtk_path.name}: no vector velocity field")
    u, v, w = fields[uname]
    try:
        model = TransformModel.from_deck(deck, (nx * sp, ny * sp))
        x = (np.arange(nx) + 0.5) * sp
        y = (np.arange(ny) + 0.5) * sp
        gx, gy = np.meshgrid(x, y)
        lon, lat = model.local_to_lonlat(gx, gy)
        geographic = True
    except (ValueError, Exception):
        lon, lat = np.meshgrid((np.arange(nx) + 0.5) * sp, (np.arange(ny) + 0.5) * sp)
        geographic = False

    if layers is None:
        layers = sorted(set(np.linspace(1, nz - 1, min(9, nz - 1), dtype=int)))
    out_dir = out_dir or (deck_path.parent / "RESULTS" / "figures")
    out_dir.mkdir(parents=True, exist_ok=True)
    base_h = deck.get_float("base_height", 50.0) or 50.0
    written = []
    for k in layers:
        speed = np.hypot(u[k], v[k])
        fig, ax = plt.subplots(figsize=(9, 7))
        pm = ax.pcolormesh(lon, lat, speed, shading="auto", cmap="viridis")
        step = max(1, nx // 24)
        ax.quiver(lon[::step, ::step], lat[::step, ::step],
                  u[k, ::step, ::step], v[k, ::step, ::step],
                  color="white", scale_units="xy", width=0.002)
        agl = (k + 0.5) * sp - base_h
        ax.set_title(f"{vtk_path.stem} | layer {k} (~{agl:.0f} m AGL)")
        ax.set_xlabel("longitude" if geographic else "x (m)")
        ax.set_ylabel("latitude" if geographic else "y (m)")
        fig.colorbar(pm, ax=ax, label="wind speed (m/s)")
        out = out_dir / f"{vtk_path.stem}_z{k:03d}.png"
        fig.savefig(out, dpi=110, bbox_inches="tight")
        plt.close(fig)
        written.append(out)
    return written


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) != 1:
        print("Usage: visluw <deck file>")
        return 2
    deck_path = Path(argv[0]).expanduser().resolve()
    deck = load_deck(deck_path)
    dt = deck.get_text("datetime") or ""
    files = discover_case_vtk_files(deck_path.parent, dt)
    preferred = [f for f in files if "_avg-" in f.name] or \
        [f for f in files if "_raw_u-" in f.name]
    if not preferred:
        print(f"visluw: no suitable VTK for datetime {dt}")
        return 1
    written = render_layers(deck_path, preferred[-1])
    print(f"visluw: wrote {len(written)} figure(s) to RESULTS/figures")
    return 0


if __name__ == "__main__":
    sys.exit(main())
