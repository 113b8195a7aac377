"""luwseason — windrose-weighted seasonal synthesis of directional averages.

Clean-room equivalent of tools_core/season_average.py: combines the per-angle
averaged VTKs of a dataset-generation / profile batch into one seasonal mean
field, weighting each direction by its windrose frequency and scaling by a
speed-bin profile, with optional resampling to a target spacing.

Inputs: a weights CSV `angle,weight[,speed_scale]` (frequencies normalized
internally) and the batch's `ANG_<a>_...` / `DG_<u>_<a>_...` avg VTKs.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..deck import load_deck
from ..io.vtk import read_structured_points, write_structured_points

_ANGLE_RE = re.compile(r"(?:ANG|DG_[0-9.+-]+)_([0-9.+-]+)_")


def discover_directional_avgs(home: Path, datetime_tag: str) -> Dict[float, Path]:
    out: Dict[float, Path] = {}
    vtk_dir = home / "RESULTS" / "vtk"
    if not vtk_dir.exists():
        return out
    for f in sorted(vtk_dir.glob(f"*{datetime_tag}_avg-*.vtk")):
        m = _ANGLE_RE.search(f.name)
        if m:
            out[float(m.group(1))] = f
    return out


def load_weights(path: Path) -> List[tuple]:
    rows = []
    for line in Path(path).read_text().splitlines():
        parts = [p.strip() for p in line.split(",")]
        if not parts or not parts[0] or parts[0].lower().startswith("angle"):
            continue
        angle = float(parts[0])
        weight = float(parts[1]) if len(parts) > 1 else 1.0
        scale = float(parts[2]) if len(parts) > 2 else 1.0
        rows.append((angle, weight, scale))
    return rows


def _resample(arr: np.ndarray, factor: int) -> np.ndarray:
    """Block-average coarsening by an integer factor on the trailing 2 axes."""
    if factor <= 1:
        return arr
    *lead, Y, X = arr.shape
    Yc, Xc = Y // factor, X // factor
    a = arr[..., : Yc * factor, : Xc * factor]
    a = a.reshape(*lead, Yc, factor, Xc, factor)
    return a.mean(axis=(-3, -1))


def synthesize(home: Path, datetime_tag: str, weights_path: Path,
               *, out_name: Optional[str] = None,
               resample_factor: int = 1) -> Path:
    weights = load_weights(weights_path)
    if not weights:
        raise ValueError(f"no weights parsed from {weights_path}")
    avgs = discover_directional_avgs(home, datetime_tag)
    missing = [a for a, _, _ in weights if a not in avgs]
    if missing:
        print(f"luwseason: WARNING missing directional avgs for angles {missing}")
    usable = [(a, w, s) for a, w, s in weights if a in avgs]
    if not usable:
        raise FileNotFoundError("no directional averaged VTKs match the weights")
    wsum = sum(w for _, w, _ in usable)

    acc: Dict[str, np.ndarray] = {}
    meta0 = None
    for angle, w, scale in usable:
        meta, fields = read_structured_points(avgs[angle])
        if meta0 is None:
            meta0 = meta
        frac = w / wsum
        for name, arr in fields.items():
            arr = arr.astype(np.float64)
            if name == "u_avg":
                arr = arr * scale
            elif name in ("tke",):
                arr = arr * scale * scale
            contrib = arr * frac
            acc[name] = contrib if name not in acc else acc[name] + contrib

    # fluid mask: cells fluid in all directions
    if "fluid" in acc:
        acc["fluid"] = (acc["fluid"] > 0.999).astype(np.float32)
    out_fields = {k: _resample(v, resample_factor).astype(np.float32)
                  for k, v in acc.items()}
    sp = meta0["spacing"][0] * resample_factor
    out = home / "RESULTS" / "vtk" / (out_name or f"SEASON_{datetime_tag}_avg.vtk")
    write_structured_points(out, out_fields, spacing=sp,
                            origin=meta0["origin"])
    return out


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 2:
        print("Usage: luwseason <deck file> <weights.csv> [resample_factor]")
        return 2
    deck_path = Path(argv[0]).expanduser().resolve()
    weights = Path(argv[1]).expanduser().resolve()
    factor = int(argv[2]) if len(argv) > 2 else 1
    deck = load_deck(deck_path)
    dt = deck.get_text("datetime") or ""
    try:
        out = synthesize(deck_path.parent, dt, weights, resample_factor=factor)
    except (FileNotFoundError, ValueError) as e:
        print(f"luwseason: ERROR: {e}")
        return 1
    print(f"luwseason: wrote {out.name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
