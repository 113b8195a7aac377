"""luwseason — windrose-weighted seasonal synthesis of directional averages.

Clean-room equivalent of tools_core/season_average.py: combines the per-angle
averaged VTKs of a dataset-generation / profile batch into one seasonal mean
field, weighting each direction by its windrose frequency and scaling by a
speed-bin profile, with optional resampling to a target spacing.

Weight sources, in order:
  * DERIVED (the reference's native path, season_average.py:432-660): a
    `wind_bc/windrose_<H>m.csv` joint direction x speed-bin probability
    table — 16 compass rows (N, NNE, ... or degree labels snapped to the
    22.5-degree set) x `C<id>_<lo>_<hi>` speed-bin columns ('p' decimal
    marker, 'inf' upper bound, % or fraction cells).  The reference speed is
    the `wind_bc/profile.dat` value at height H.  Per direction:
      probability      = sum(joint)
      velocity_weight  = sum(joint * v_bin / v_ref)
      tke_weight       = sum(joint * (v_bin / v_ref)^2)
    u_avg combines with velocity weights, tke with tke weights.
  * EXPLICIT: a weights CSV `angle,weight[,speed_scale]`.
"""

from __future__ import annotations

import math
import re
import sys
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..deck import load_deck
from ..io.vtk import read_structured_points, write_structured_points

_ANGLE_RE = re.compile(r"(?:ANG|DG_[0-9.+-]+)_([0-9.+-]+)_")

# the 22.5-degree compass sequence (reference ANGLE_SEQUENCE)
ANGLE_SEQUENCE = [i * 22.5 for i in range(16)]
COMPASS = ["N", "NNE", "NE", "ENE", "E", "ESE", "SE", "SSE",
           "S", "SSW", "SW", "WSW", "W", "WNW", "NW", "NNW"]
_COMPASS_TO_ANGLE = {c: a for c, a in zip(COMPASS, ANGLE_SEQUENCE)}
_SPEED_BIN_RE = re.compile(
    r"^C(?P<cid>\d+)_(?P<lo>[-+]?[0-9]+(?:[p.][0-9]+)?)"
    r"_(?P<hi>[-+]?[0-9]+(?:[p.][0-9]+)?|inf)$", re.IGNORECASE)


def _custom_float(text: str) -> float:
    t = str(text).strip().lower().replace("%", "").replace("m/s", "")
    t = t.replace(" ", "").replace("p", ".").replace(",", ".")
    if t in ("inf", "+inf", "infinity"):
        return float("inf")
    return float(t)


def parse_windrose_height(path: Path) -> float:
    """Reference height in meters from `windrose_<H>m.csv`."""
    m = re.findall(r"([0-9]+(?:[p.][0-9]+)?)m", path.stem, re.IGNORECASE)
    if not m:
        raise ValueError(f"cannot parse height from windrose name {path.name}")
    return _custom_float(m[-1])


def parse_windrose_csv(path: Path):
    """-> (bin_target_speeds (B,), {angle: probs (B,)}, total_probability).

    Locates the header row by its `C<id>_<lo>_<hi>` speed-bin columns;
    direction labels may be compass names or degree values snapped to the
    22.5-degree set; percentage tables (total > 1.5) scale by 0.01."""
    import csv as _csv

    rows = None
    for enc in ("utf-8-sig", "utf-8", "latin-1"):
        try:
            with path.open("r", encoding=enc, newline="") as fh:
                rows = [[c.strip() for c in r] for r in _csv.reader(fh)]
            break
        except UnicodeDecodeError:
            continue
    if rows is None:
        raise ValueError(f"cannot read {path}")

    header_idx = None
    bins: List[Tuple[int, float, Optional[float]]] = []
    for ri, row in enumerate(rows):
        found = []
        for ci, cell in enumerate(row):
            m = _SPEED_BIN_RE.match(cell)
            if m:
                hi = m.group("hi")
                found.append((ci, _custom_float(m.group("lo")),
                              None if hi.lower() == "inf" else _custom_float(hi)))
        if found:
            header_idx, bins = ri, found
            break
    if header_idx is None:
        raise ValueError("no C<id>_<lo>_<hi> speed-bin columns found")

    widths = [hi - lo for _, lo, hi in bins if hi is not None]
    if not widths:
        raise ValueError("windrose has no finite speed bins")
    inf_half = 0.5 * sum(widths)
    targets = np.array([(0.5 * (lo + hi)) if hi is not None else lo + inf_half
                        for _, lo, hi in bins])

    min_col = min(ci for ci, _, _ in bins)
    table = {a: np.zeros(len(bins)) for a in ANGLE_SEQUENCE}
    for row in rows[header_idx + 1:]:
        if not any(c for c in row):
            continue
        angle = None
        for cell in row[:min_col]:
            label = re.sub(r"[^A-Z0-9.]+", "", cell.upper())
            if label in _COMPASS_TO_ANGLE:
                angle = _COMPASS_TO_ANGLE[label]
                break
            m = re.search(r"[-+]?\d+(?:\.\d+)?", cell)
            if m and angle is None:
                wrapped = float(m.group(0)) % 360.0
                best = min(ANGLE_SEQUENCE, key=lambda c: abs(c - wrapped))
                if abs(best - wrapped) <= 0.51:
                    angle = best
        if angle is None:
            continue
        for bi, (ci, _, _) in enumerate(bins):
            if ci < len(row) and row[ci] and row[ci].lower() not in ("-", "nan", "na"):
                try:
                    v = _custom_float(row[ci])
                except ValueError:
                    continue
                if math.isfinite(v):
                    table[angle][bi] += v

    total = float(sum(v.sum() for v in table.values()))
    if total <= 0:
        raise ValueError("windrose table has no probability mass")
    if total > 1.5:          # percentage table
        for a in table:
            table[a] = table[a] * 0.01
        total *= 0.01
    return targets, table, total


def derive_direction_weights(home: Path) -> List[tuple]:
    """[(angle, velocity_weight, tke_weight, probability)] from
    wind_bc/windrose_<H>m.csv + profile.dat (reference :546-660)."""
    wind_bc = home / "wind_bc"
    roses = sorted(wind_bc.glob("windrose_*m.csv"))
    if not roses:
        raise FileNotFoundError(f"no windrose_*m.csv under {wind_bc}")
    if len(roses) > 1:
        raise ValueError("expected exactly one windrose_*m.csv, found "
                         + ", ".join(p.name for p in roses))
    rose = roses[0]
    href = parse_windrose_height(rose)
    from ..bc.profile import _hermite_cubic, load_profile_dat

    z, u = load_profile_dat(wind_bc / "profile.dat")
    v_ref = float(_hermite_cubic(z, u, np.array([href]))[0])
    if v_ref <= 0:
        raise ValueError(f"profile speed at windrose height {href} m is "
                         f"{v_ref}; must be positive")
    targets, table, total = parse_windrose_csv(rose)
    ratios = targets / v_ref
    out = []
    print(f"luwseason: windrose {rose.name}, ref height {href:g} m, "
          f"ref speed {v_ref:.3f} m/s, total probability {total:.4f}")
    for angle in ANGLE_SEQUENCE:
        joint = table[angle] / total
        p = float(joint.sum())
        vw = float(joint @ ratios)
        tw = float(joint @ (ratios * ratios))
        out.append((angle, vw, tw, p))
    return out


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


def _combine(avgs: Dict[float, Path], triples: List[tuple]):
    """triples: [(case_angle, vel_weight, tke_weight, prob_weight)] summed
    per field with the field-appropriate weight."""
    acc: Dict[str, np.ndarray] = {}
    meta0 = None
    for angle, vw, tw, pw in triples:
        meta, fields = read_structured_points(avgs[angle])
        if meta0 is None:
            meta0 = meta
        for name, arr in fields.items():
            arr = arr.astype(np.float64)
            if name.lower().startswith(("u", "velocity")):
                contrib = arr * vw
            elif name.lower() in ("tke", "ti", "tls"):
                contrib = arr * tw
            else:
                contrib = arr * pw
            acc[name] = contrib if name not in acc else acc[name] + contrib
    return meta0, acc


def synthesize(home: Path, datetime_tag: str, weights_path: Optional[Path],
               *, out_name: Optional[str] = None,
               resample_factor: int = 1) -> Path:
    avgs = discover_directional_avgs(home, datetime_tag)
    if not avgs:
        raise FileNotFoundError("no directional averaged VTKs found")

    if weights_path is None:
        # derive from the windrose + profile (reference native path), mapping
        # each 22.5-degree rose direction onto the nearest available case
        derived = derive_direction_weights(home)
        case_angles = sorted(avgs)
        per_case: Dict[float, List[float]] = {a: [0.0, 0.0, 0.0] for a in case_angles}
        for angle, vw, tw, p in derived:
            if p <= 0 and vw <= 0:
                continue
            near = min(case_angles,
                       key=lambda c: min(abs(c - angle), 360 - abs(c - angle)))
            per_case[near][0] += vw
            per_case[near][1] += tw
            per_case[near][2] += p
        triples = [(a, v[0], v[1], v[2]) for a, v in per_case.items()]
        summary = home / "RESULTS" / "season_weights.csv"
        summary.parent.mkdir(parents=True, exist_ok=True)
        summary.write_text(
            "angle,velocity_weight,tke_weight,probability\n"
            + "\n".join(f"{a},{v:.6f},{t:.6f},{p:.6f}" for a, v, t, p in triples)
            + "\n")
        print(f"luwseason: derived weights -> {summary.name}")
    else:
        weights = load_weights(weights_path)
        if not weights:
            raise ValueError(f"no weights parsed from {weights_path}")
        missing = [a for a, _, _ in weights if a not in avgs]
        if missing:
            print(f"luwseason: WARNING missing directional avgs for angles {missing}")
        usable = [(a, w, s) for a, w, s in weights if a in avgs]
        if not usable:
            raise FileNotFoundError("no directional averaged VTKs match the weights")
        wsum = sum(w for _, w, _ in usable)
        triples = [(a, w / wsum * s, w / wsum * s * s, w / wsum)
                   for a, w, s in usable]

    meta0, acc = _combine(avgs, triples)

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
    if len(argv) < 1:
        print("Usage: luwseason <deck file> [weights.csv] [resample_factor]")
        print("  without weights.csv the direction weights derive from")
        print("  wind_bc/windrose_<H>m.csv x wind_bc/profile.dat")
        return 2
    deck_path = Path(argv[0]).expanduser().resolve()
    weights = None
    factor = 1
    for arg in argv[1:]:
        if arg.replace(".", "").isdigit() and "." not in arg:
            factor = int(arg)
        else:
            weights = Path(arg).expanduser().resolve()
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
