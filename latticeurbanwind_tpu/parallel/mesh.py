"""Spatial domain decomposition over a 3-D TPU device mesh.

The reference splits the lattice into Dx x Dy x Dz per-GPU subdomains with
1-cell halos and hand-rolled pack/PCIe/unpack halo exchange every step
(reference: lbm.cpp:1067-1125, 1864-1958; kernel.cpp:2259-2378).  On TPU the
whole layer collapses into GSPMD: lattice arrays are sharded over a
`jax.sharding.Mesh` with axes ('z','y','x'), the step function is `jit`ed
with sharding annotations, and XLA inserts the halo `collective-permute`s for
the shifted reads over ICI automatically — including compute/communication
overlap the reference never attempts.

The deck key `n_gpu = [Dx, Dy, Dz]` maps directly to the mesh shape.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..lbm.state import LBMState


def domain_mesh(split: Tuple[int, int, int], devices=None) -> Mesh:
    """Mesh over ('z','y','x') from the deck's [Dx, Dy, Dz] split triple.

    Note the deck order is (Dx, Dy, Dz); arrays are indexed [z, y, x].
    """
    dx, dy, dz = split
    devices = devices if devices is not None else jax.devices()
    n = dx * dy * dz
    if len(devices) < n:
        raise ValueError(f"need {n} devices for split {split}, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(dz, dy, dx)
    return Mesh(dev, axis_names=("z", "y", "x"))


def _scalar_spec() -> P:
    return P("z", "y", "x")


def _vector_spec() -> P:
    return P(None, "z", "y", "x")


def state_sharding(mesh: Mesh, thermal: bool) -> LBMState:
    """Pytree of NamedShardings matching LBMState's layout."""
    s = NamedSharding(mesh, _scalar_spec())
    v = NamedSharding(mesh, _vector_spec())
    return LBMState(
        fi=v, rho=s, u=v, flags=s,
        gi=v if thermal else None,
        T=s if thermal else None,
    )


def shard_state(state: LBMState, mesh: Mesh) -> LBMState:
    """Place a (host or single-device) state onto the mesh."""
    shardings = state_sharding(mesh, thermal=state.gi is not None)
    return jax.tree.map(
        lambda x, sh: jax.device_put(x, sh) if x is not None else None,
        state, shardings,
        is_leaf=lambda x: x is None,
    )
