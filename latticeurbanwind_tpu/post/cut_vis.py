"""luwcutvis — cropped multi-altitude wind quiver + TKE heatmap figures.

Clean-room equivalent of tools_core/cut_vis.py / tke_viz.py /
batch_tke_geo_viz.py: crop the averaged VTK to a sub-box (deck keys or
explicit bounds), render a 3x3 grid of altitude layers with wind quivers,
and a matching TKE heatmap grid.
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

from ..deck import load_deck
from ..io.vtk import read_structured_points
from .vtk2nc import discover_case_vtk_files


def crop_fields(meta, fields, crop_xy: Optional[Tuple[float, float, float, float]]):
    """Crop all fields to [x0, x1, y0, y1] in SI meters (grid-local)."""
    nx, ny, nz = meta["dims"]
    sp = meta["spacing"][0]
    if crop_xy is None:
        return fields, (0, nx, 0, ny)
    x0, x1, y0, y1 = crop_xy
    i0 = max(0, int(x0 / sp))
    i1 = min(nx, int(np.ceil(x1 / sp)))
    j0 = max(0, int(y0 / sp))
    j1 = min(ny, int(np.ceil(y1 / sp)))
    out = {k: v[..., j0:j1, i0:i1] for k, v in fields.items()}
    return out, (i0, i1, j0, j1)


def nine_layer_figure(fields, spacing: float, base_h: float, out_path: Path,
                      kind: str = "wind") -> Path:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    uname = next((k for k in fields if fields[k].ndim == 4), None)
    nz = fields[uname].shape[1] if uname else next(iter(fields.values())).shape[0]
    layers = sorted(set(np.linspace(1, nz - 1, 9, dtype=int)))
    fig, axes = plt.subplots(3, 3, figsize=(15, 12))
    for ax, k in zip(axes.ravel(), layers):
        agl = (k + 0.5) * spacing - base_h
        if kind == "wind" and uname:
            u, v = fields[uname][0, k], fields[uname][1, k]
            speed = np.hypot(u, v)
            pm = ax.pcolormesh(speed, shading="auto", cmap="viridis")
            step = max(1, speed.shape[1] // 16)
            ax.quiver(np.arange(speed.shape[1])[::step],
                      np.arange(speed.shape[0])[::step],
                      u[::step, ::step], v[::step, ::step], color="w", width=0.003)
            label = "speed (m/s)"
        else:
            tke = fields.get("tke")
            pm = ax.pcolormesh(tke[k], shading="auto", cmap="inferno")
            label = "tke (m2/s2)"
        ax.set_title(f"~{agl:.0f} m AGL")
        fig.colorbar(pm, ax=ax, label=label)
    fig.suptitle(f"{out_path.stem}")
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return out_path


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 1:
        print("Usage: luwcutvis <deck file> [x0 x1 y0 y1]")
        return 2
    deck_path = Path(argv[0]).expanduser().resolve()
    crop = tuple(float(v) for v in argv[1:5]) if len(argv) >= 5 else None
    deck = load_deck(deck_path)
    dt = deck.get_text("datetime") or ""
    files = [f for f in discover_case_vtk_files(deck_path.parent, dt)
             if "_avg-" in f.name]
    if not files:
        print("luwcutvis: no averaged VTK found")
        return 1
    meta, fields = read_structured_points(files[-1])
    fields, _ = crop_fields(meta, fields, crop)
    base_h = deck.get_float("base_height", 50.0) or 50.0
    fig_dir = deck_path.parent / "RESULTS" / "figures"
    w = nine_layer_figure(fields, meta["spacing"][0], base_h,
                          fig_dir / f"{files[-1].stem}_wind9.png", "wind")
    print(f"luwcutvis: wrote {w.name}")
    if "tke" in fields:
        t = nine_layer_figure(fields, meta["spacing"][0], base_h,
                              fig_dir / f"{files[-1].stem}_tke9.png", "tke")
        print(f"luwcutvis: wrote {t.name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
