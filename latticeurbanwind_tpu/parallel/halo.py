"""Sharded Pallas stepping: shard_map over z-slabs with explicit halo exchange.

The GSPMD path (parallel/mesh.py) lets XLA infer halo collectives for the
jnp reference tier.  This module runs the *Pallas* kernel under shard_map:
the lattice is split into z-slabs, each step ppermutes the single boundary
plane of the cz=+1/-1 DDF groups (and flags) to the neighbor shards — the
TPU analog of the reference's pack/PCIe/unpack halo pipeline
(reference: lbm.cpp:1864-1958), except it is 3 collective_permutes on ICI.

Exchange contract per step (pull streaming):
  * shard s needs fp[z_last of s-1]  (cz=+1 pulls from z-1)
  * shard s needs fm[z_first of s+1] (cz=-1 pulls from z+1)
  * shard s needs flags[z_last of s-1] and flags[z_first of s+1]
The halo planes are passed to a kernel variant whose z-neighbor index maps
read from halo-extended arrays instead of wrapping modularly.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..lbm.state import DynParams, Forcing, LBMState, StepConfig
from ..ops.stream_collide import SplitState, make_pallas_step, merge_state, split_state


def _shift_up(x, axis_name):
    """Receive the neighbor-below's slab (z - 1 direction); wraps at the ends
    (periodic, matching the reference's modular domain indexing)."""
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)


def _shift_down(x, axis_name):
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i - 1) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)


def make_sharded_pallas_runner(config: StepConfig, forcing: Forcing,
                               shape: Tuple[int, int, int], mesh: Mesh,
                               *, n_inner: int = 1, pre_step=None):
    """Jitted sharded `run(state, dyn, t0) -> state` using the Pallas kernel
    per z-slab.  `mesh` must have a 'z' axis; Z must divide evenly."""
    Z, Y, X = shape
    nz_shards = mesh.shape["z"]
    if Z % nz_shards:
        raise ValueError(f"Z={Z} not divisible by z shards {nz_shards}")
    zs = Z // nz_shards
    local_shape = (zs, Y, X)
    has_nudge = forcing.nudge_sigma is not None
    has_sponge = forcing.sponge_sigma_z is not None
    has_forcing = has_nudge or has_sponge
    thermal = config.thermal
    # The kernel closure only keys presence off the Forcing arg; actual values
    # are fed per shard through `forcing_loc`.  Hand it local-shape zeros.
    placeholder = Forcing(
        nudge_sigma=jnp.zeros(local_shape, jnp.float32) if has_nudge else None,
        nudge_face=jnp.zeros(local_shape, jnp.int8) if has_nudge else None,
        nudge_vertical=forcing.nudge_vertical,
        sponge_sigma_z=(jnp.zeros(zs, jnp.float32) if has_sponge else None),
    )
    step_local = make_pallas_step(config, placeholder, local_shape,
                                  halo_mode=True)

    # global forcing arrays, passed through shard_map with z-sharded specs
    nsig_g = (jnp.asarray(forcing.nudge_sigma, jnp.float32) if has_nudge
              else jnp.zeros((Z, 1, 1), jnp.float32))
    nface_g = (jnp.asarray(forcing.nudge_face).astype(jnp.uint8) if has_nudge
               else jnp.zeros((Z, 1, 1), jnp.uint8))
    spz_g = (jnp.asarray(forcing.sponge_sigma_z, jnp.float32).reshape(Z, 1)
             if has_sponge else jnp.zeros((Z, 1), jnp.float32))

    def sharded_step(s: SplitState, dyn: DynParams,
                     nsig, nface, spz) -> SplitState:
        # halo planes: fp needs z-1 (from shard below), fm needs z+1 (above)
        fp_halo = _shift_up(s.fp[:, -1:], "z")       # (5, 1, Y, X)
        fm_halo = _shift_down(s.fm[:, :1], "z")
        flb_halo = _shift_up(s.flags[-1:], "z")      # (1, Y, X)
        fla_halo = _shift_down(s.flags[:1], "z")
        halos = dict(fp_halo=fp_halo, fm_halo=fm_halo,
                     flb_halo=flb_halo, fla_halo=fla_halo)
        if s.gp is not None:
            halos["gp_halo"] = _shift_up(s.gp[:, -1:], "z")
            halos["gm_halo"] = _shift_down(s.gm[:, :1], "z")
        if has_forcing:
            # nudge/sponge reference targets live on the GLOBAL top plane;
            # gather local tops along z and take the topmost shard's
            fl = dict(sponge_z=spz)
            if has_nudge:
                fl["nudge_sigma"] = jnp.broadcast_to(nsig, local_shape)
                fl["nudge_face"] = jnp.broadcast_to(nface, local_shape)
            tops = jax.lax.all_gather(s.u[:, -1, :, :], "z")  # (nz, 3, Y, X)
            fl["top_u"] = tops[-1]
            if thermal and has_sponge:
                fl["top_T"] = jax.lax.all_gather(s.T[-1], "z")[-1]
            halos["forcing_loc"] = fl
        return step_local(s, dyn, **halos)

    def body(state: LBMState, dyn: DynParams, t0, n_steps,
             nsig, nface, spz) -> LBMState:
        s = split_state(state)
        t0 = jnp.asarray(t0, jnp.int32)

        def inner(i, st):
            if pre_step is not None:
                st = pre_step(st, t0 + i)
            return sharded_step(st, dyn, nsig, nface, spz)

        out = jax.lax.fori_loop(0, n_steps, inner, s)
        return merge_state(out)

    spec_v = P(None, "z", None, None)
    spec_s = P("z", None, None)
    from jax.experimental.shard_map import shard_map

    in_state_specs = LBMState(
        fi=spec_v, rho=spec_s, u=spec_v, flags=spec_s,
        gi=spec_v if thermal else None, T=spec_s if thermal else None)
    smapped = shard_map(
        body, mesh=mesh,
        in_specs=(in_state_specs, P(), P(), P(), spec_s, spec_s, P("z", None)),
        out_specs=in_state_specs,
        check_rep=False,
    )
    jitted = jax.jit(smapped, donate_argnums=(0,))

    def run(state: LBMState, dyn: DynParams, t0, n_steps=None) -> LBMState:
        n = jnp.asarray(n_inner if n_steps is None else n_steps, jnp.int32)
        return jitted(state, dyn, jnp.asarray(t0, jnp.int32), n,
                      nsig_g, nface_g, spz_g)

    return run
