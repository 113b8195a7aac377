"""Axis-permutation transforms: run the z-plane Pallas kernel along any axis.

The Pallas kernel marches grid planes along the leading (z) axis and holds one
full (Y, X) plane working-set in VMEM.  Urban decks are typically wide and
flat (Nz ~ tens, Nx/Ny ~ thousands — reference setup.cpp sizes the domain
from the GIS footprint), so the natural (Z, Y, X) orientation can exceed the
VMEM plane budget while the transposed (Y, Z, X) orientation fits easily.

The D3Q19/D3Q7 lattices, collision operators, and LES closure are isotropic,
so a coordinate transposition P: (z, y, x) -> (y, z, x) maps a lattice
simulation to an exactly equivalent one:

  * spatial arrays transpose their z/y axes,
  * vector components swap y/z (component order is [ux, uy, uz]),
  * DDF channels permute by sigma(k) = index of P(C[k]) in C,
  * the Coriolis rotation vector additionally flips sign — P is improper
    (det = -1), so cross products transform as P(a x b) = -(Pa x Pb),
  * nudge face ids remap (canonical south/north/top faces become the
    permuted bottom/top/north faces), and the top-sponge profile becomes a
    profile along the permuted sublane (y) axis — handled by the kernel's
    `sponge_axis="y"` variant (ops/stream_collide.py).

All transforms here are involutions: applying one twice is the identity.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..lbm.lattice import C19, C7
from ..lbm.state import DynParams, Forcing, LBMState

# component permutation for the z<->y transposition (order [x, y, z])
_COMP_PERM = np.array([0, 2, 1], dtype=np.int32)


def _dir_perm(C: np.ndarray) -> np.ndarray:
    """sigma[k] = index d with C[d] == P(C[k]) (swap cy/cz)."""
    sig = np.empty(len(C), dtype=np.int32)
    for k, c in enumerate(C):
        target = (int(c[0]), int(c[2]), int(c[1]))
        (d,) = np.where((C == np.array(target)).all(axis=1))[0]
        sig[k] = d
    assert np.array_equal(sig[sig], np.arange(len(C)))  # involution
    return sig


SIGMA19 = _dir_perm(C19)
SIGMA7 = _dir_perm(C7)

# nudge face-id remap: faces are defined on canonical axes
# (0=w x0, 1=e xmax, 2=s y0, 3=n ymax, 4=top zmax, 5=bottom z0); under
# z<->y, y-faces become marching-axis (z') faces and vice versa.
FACE_PERM = np.array([0, 1, 5, 4, 3, 2], dtype=np.uint8)


def permute_shape(shape):
    Z, Y, X = shape
    return (Y, Z, X)


def _t(a):
    """Transpose the z/y axes of a (..., Z, Y, X) array."""
    return jnp.swapaxes(a, -3, -2)


def permute_state(state: LBMState) -> LBMState:
    return LBMState(
        fi=_t(state.fi[SIGMA19]),
        rho=_t(state.rho),
        u=_t(state.u[_COMP_PERM]),
        flags=_t(state.flags),
        gi=None if state.gi is None else _t(state.gi[SIGMA7]),
        T=None if state.T is None else _t(state.T),
    )


unpermute_state = permute_state  # involution


def permute_dyn(dyn: DynParams) -> DynParams:
    return DynParams(
        force=dyn.force[_COMP_PERM],
        # improper transform: pseudovectors pick up a sign flip
        omega_coriolis=-dyn.omega_coriolis[_COMP_PERM],
    )


def permute_forcing(forcing: Forcing) -> Forcing:
    """Permuted forcing fields.  The sponge profile array is reused verbatim
    — in permuted coordinates it runs along the sublane (y) axis, which the
    kernel expresses via `sponge_axis="y"` rather than a data transform."""
    nudge_sigma = forcing.nudge_sigma
    nudge_face = forcing.nudge_face
    if nudge_sigma is not None:
        nudge_sigma = _t(jnp.asarray(nudge_sigma))
        face_tab = jnp.asarray(FACE_PERM)
        nudge_face = _t(face_tab[jnp.asarray(forcing.nudge_face).astype(jnp.int32)])
    return Forcing(
        nudge_sigma=nudge_sigma,
        nudge_face=nudge_face,
        nudge_vertical=forcing.nudge_vertical,
        sponge_sigma_z=forcing.sponge_sigma_z,
    )


def make_permuted_pallas_step(config, forcing: Forcing, shape, *, vk=None):
    """Pallas step operating on PERMUTED-layout SplitStates.

    `shape` is the CANONICAL grid shape; the returned step expects/returns
    split states in the transposed (Y, Z, X) orientation.  The stepper
    (lbm/stepper.py) permutes once per scan chunk — outside the step loop —
    so the per-step cost is identical to the canonical kernel.  `vk` is the
    PERMUTED inlet kernel spec (the VK hook's ddf_permuted.kernel_spec —
    its sites/masks are already expressed in the transposed frame).
    """
    from .stream_collide import make_pallas_step

    return make_pallas_step(
        config, permute_forcing(forcing), permute_shape(shape),
        vertical_comp=1, sponge_axis="y", vk=vk,
    )
