"""luwspectra — turbulence energy-spectrum diagnostics.

Clean-room equivalent of tools_core/les_spectra.py: computes 1-D streamwise
energy spectra from probe CSV time series and/or radially-binned 3-D spectra
from an unsteady velocity VTK, overlays the Kolmogorov k^-5/3 slope, and
saves figures + a spectra CSV.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

from ..deck import load_deck
from ..io.vtk import read_structured_points
from .vtk2nc import discover_case_vtk_files


def spectrum_from_series(u: np.ndarray, dt: float):
    """One-sided energy spectrum of a velocity time series."""
    u = np.asarray(u, float)
    u = u - u.mean()
    n = len(u)
    if n < 8:
        return None
    freq = np.fft.rfftfreq(n, dt)[1:]
    amp = np.fft.rfft(u * np.hanning(n))[1:]
    E = (np.abs(amp) ** 2) * 2.0 * dt / n
    return freq, E


def spectrum_3d(u: np.ndarray, spacing: float, nbins: int = 40):
    """Radially-binned 3-D energy spectrum E(k) of one velocity component."""
    u = np.asarray(u, float)
    u = u - u.mean()
    Z, Y, X = u.shape
    uk = np.fft.fftn(u)
    Ek3 = np.abs(uk) ** 2 / (X * Y * Z) ** 2
    kz = np.fft.fftfreq(Z, spacing)
    ky = np.fft.fftfreq(Y, spacing)
    kx = np.fft.fftfreq(X, spacing)
    kmag = np.sqrt(kz[:, None, None] ** 2 + ky[None, :, None] ** 2
                   + kx[None, None, :] ** 2)
    kmax = kmag.max()
    bins = np.linspace(0, kmax, nbins + 1)
    which = np.digitize(kmag.ravel(), bins) - 1
    E = np.bincount(which, weights=Ek3.ravel(), minlength=nbins)[:nbins]
    kc = 0.5 * (bins[:-1] + bins[1:])
    return kc[1:], E[1:]


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) != 1:
        print("Usage: luwspectra <deck file>")
        return 2
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    deck_path = Path(argv[0]).expanduser().resolve()
    deck = load_deck(deck_path)
    dt_tag = deck.get_text("datetime") or ""
    home = deck_path.parent
    fig_dir = home / "RESULTS" / "figures"
    fig_dir.mkdir(parents=True, exist_ok=True)
    wrote = 0

    raw_files = [f for f in discover_case_vtk_files(home, dt_tag)
                 if "_raw_u-" in f.name]
    if raw_files:
        meta, fields = read_structured_points(raw_files[-1])
        uname = next(k for k in fields if fields[k].ndim == 4)
        k, E = spectrum_3d(fields[uname][0], meta["spacing"][0])
        good = E > 0
        fig, ax = plt.subplots(figsize=(7, 5))
        ax.loglog(k[good], E[good], label="E(k) from u")
        kref = k[good][len(k[good]) // 4: len(k[good]) * 3 // 4]
        if len(kref):
            anchor = np.interp(kref[0], k[good], E[good])
            ax.loglog(kref, anchor * (kref / kref[0]) ** (-5.0 / 3.0), "--",
                      label="k^-5/3")
        ax.set_xlabel("k (1/m)")
        ax.set_ylabel("E(k)")
        ax.legend()
        out = fig_dir / f"{raw_files[-1].stem}_spectrum.png"
        fig.savefig(out, dpi=110, bbox_inches="tight")
        plt.close(fig)
        np.savetxt(fig_dir / f"{raw_files[-1].stem}_spectrum.csv",
                   np.stack([k, E], axis=1), delimiter=",", header="k,E",
                   comments="")
        print(f"luwspectra: wrote {out.name}")
        wrote += 1

    # probe CSV time-series spectra (RESULTS/<lon>_<lat>*.csv contract)
    for probe_csv in sorted((home / "RESULTS").glob("*.csv")):
        try:
            lines = probe_csv.read_text().splitlines()
            if not lines or not lines[0].startswith("height"):
                continue
            times = np.asarray([float(v) for v in lines[0].split(",")[1:]])
            if len(times) < 8:
                continue
            row = lines[len(lines) // 2].split(",")
            u_series = np.asarray([float(c.split(":")[0]) for c in row[1:]])
            sp = spectrum_from_series(u_series, float(np.diff(times).mean()))
            if sp is None:
                continue
            freq, E = sp
            fig, ax = plt.subplots(figsize=(7, 5))
            ax.loglog(freq, E, label=f"probe {probe_csv.stem} @ {row[0]} m")
            ax.loglog(freq, E[0] * (freq / freq[0]) ** (-5.0 / 3.0), "--",
                      label="f^-5/3")
            ax.set_xlabel("f (Hz)")
            ax.set_ylabel("E(f)")
            ax.legend()
            out = fig_dir / f"{probe_csv.stem}_spectrum.png"
            fig.savefig(out, dpi=110, bbox_inches="tight")
            plt.close(fig)
            print(f"luwspectra: wrote {out.name}")
            wrote += 1
        except (ValueError, IndexError):
            continue
    if not wrote:
        print("luwspectra: no inputs found (need raw u VTK or probe CSVs)")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
