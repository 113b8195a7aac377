"""Solver checkpoint/resume — a capability the reference lacks entirely
(SURVEY.md §5: a killed run restarts from step 0).

Serializes the complete lattice state (DDFs, fields, flags, thermal arrays),
the Welford accumulator, probe time-series buffers, and the run cursor to a
single compressed .npz under proj_temp/checkpoints/.  Restore rebuilds the
exact LBMState/AvgState (and refills probe sample buffers), so a run
continues bit-exactly from the saved step.  Loading validates the saved grid
shape against the current case and raises a clear ValueError on mismatch
(the driver falls back to a fresh start).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ..lbm.state import LBMState
from .welford import AvgState

FORMAT_VERSION = 1


def checkpoint_path(parent: Path, datetime_tag: str, prefix: str = "") -> Path:
    return (Path(parent) / "proj_temp" / "checkpoints"
            / f"{prefix}{datetime_tag}.ckpt.npz")


_FBC_FIELDS = ("uw", "ue", "us", "un", "ut", "ub", "tt")


def save_checkpoint(path: Path, state: LBMState, *, step: int,
                    avg: Optional[AvgState] = None,
                    avg_samples: int = 0,
                    probes: Optional[list] = None,
                    meta: Optional[dict] = None,
                    fbc=None) -> Path:
    """`fbc`: the runner's loop-carried FaceBC (nudge/sponge face targets,
    refreshed in-loop by the VK inlet).  Without it a resumed VK+nudge run
    nudges toward the INITIAL face values for up to update_stride steps
    until the next anchor refresh — serializing it makes resume bit-exact."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "fi": np.asarray(state.fi),
        "rho": np.asarray(state.rho),
        "u": np.asarray(state.u),
        "flags": np.asarray(state.flags),
    }
    if fbc is not None:
        for k in _FBC_FIELDS:
            v = getattr(fbc, k)
            if v is not None:
                payload[f"fbc_{k}"] = np.asarray(v)
    if state.gi is not None:
        payload["gi"] = np.asarray(state.gi)
        payload["T"] = np.asarray(state.T)
    if avg is not None:
        payload["avg_mean_u"] = np.asarray(avg.mean_u)
        payload["avg_m2_u"] = np.asarray(avg.m2_u)
        payload["avg_mean_rho"] = np.asarray(avg.mean_rho)
        if avg.mean_T is not None:
            payload["avg_mean_T"] = np.asarray(avg.mean_T)
        payload["avg_count"] = np.asarray(int(avg.count))
    n_probes = 0
    if probes:
        for i, p in enumerate(probes):
            payload[f"probe{i}_times"] = np.asarray(p.times_si, dtype=np.float64)
            payload[f"probe{i}_series"] = (
                np.stack(p.series) if p.series
                else np.zeros((0, len(p.heights_si), 3), dtype=np.float64))
        n_probes = len(probes)
    header = {
        "version": FORMAT_VERSION,
        "step": int(step),
        "avg_samples": int(avg_samples),
        "thermal": state.gi is not None,
        "shape": list(state.rho.shape),
        "n_probes": n_probes,
        "meta": meta or {},
    }
    payload["header"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8)
    tmp = path.with_suffix(".tmp.npz")
    np.savez_compressed(tmp, **payload)
    tmp.replace(path)
    return path


def load_checkpoint(path: Path, *, expect_shape=None, probes: Optional[list] = None,
                    ) -> Tuple[LBMState, int, Optional[AvgState], int, dict]:
    """Returns (state, step, avg_or_None, avg_samples, meta).

    `expect_shape`: current case grid (Z, Y, X) — a saved checkpoint for a
    different grid raises ValueError instead of a cryptic jit shape error.
    `probes`: GridProbe list to refill with the saved sample buffers.
    """
    import jax.numpy as jnp

    with np.load(path) as z:
        header = json.loads(bytes(z["header"].tobytes()).decode())
        if header.get("version") != FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version: {header.get('version')}")
        saved_shape = tuple(header.get("shape") or z["rho"].shape)
        if expect_shape is not None and tuple(expect_shape) != saved_shape:
            raise ValueError(
                f"checkpoint grid {saved_shape} does not match case grid "
                f"{tuple(expect_shape)} — the deck changed since the save")
        thermal = header["thermal"]
        state = LBMState(
            fi=jnp.asarray(z["fi"]),
            rho=jnp.asarray(z["rho"]),
            u=jnp.asarray(z["u"]),
            flags=jnp.asarray(z["flags"]),
            gi=jnp.asarray(z["gi"]) if thermal else None,
            T=jnp.asarray(z["T"]) if thermal else None,
        )
        avg = None
        if "avg_count" in z:
            avg = AvgState(
                count=jnp.asarray(int(z["avg_count"]), jnp.int32),
                mean_u=jnp.asarray(z["avg_mean_u"]),
                m2_u=jnp.asarray(z["avg_m2_u"]),
                mean_rho=jnp.asarray(z["avg_mean_rho"]),
                mean_T=jnp.asarray(z["avg_mean_T"]) if "avg_mean_T" in z else None,
            )
        if probes is not None and header.get("n_probes"):
            n = min(len(probes), int(header["n_probes"]))
            for i in range(n):
                p = probes[i]
                p.times_si = list(np.asarray(z[f"probe{i}_times"]))
                p.series = [s for s in np.asarray(z[f"probe{i}_series"])]
        return state, header["step"], avg, header["avg_samples"], header["meta"]


def load_fbc(path: Path):
    """Restore the saved FaceBC carried targets, or None if absent."""
    import jax.numpy as jnp

    from ..ops.stream_collide import FaceBC

    with np.load(path) as z:
        if "fbc_uw" not in z:
            return None
        vals = {k: (jnp.asarray(z[f"fbc_{k}"]) if f"fbc_{k}" in z else None)
                for k in _FBC_FIELDS}
    return FaceBC(**vals)
