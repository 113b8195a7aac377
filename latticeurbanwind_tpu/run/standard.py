"""Standard .luw mode: NWP-coupled boundary conditions from SurfData CSV.

Placeholder entry point — the interpolating BC builders (nearest-neighbor,
high-order KNN, patch-2D) land in the bc/ package next; this module wires
them into the common driver.  (reference: setup.cpp:4931-5641)
"""

from __future__ import annotations

from pathlib import Path


def run_standard_mode(deck_path: Path | str, **kw):
    raise NotImplementedError(
        "standard .luw mode wiring is under construction; "
        "use profile (.luwpf) or dataset-gen (.luwdg) modes")
