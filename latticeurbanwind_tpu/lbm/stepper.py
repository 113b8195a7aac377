"""Step-function dispatch: reference (jnp) tier vs Pallas performance tier.

`make_runner` picks the fastest available implementation for the current
backend and wraps it in a scan-chunked jitted multi-step.  The pallas tier
keeps DDFs in a cz-split internal layout across the scan; conversion happens
once per runner call, amortized over n_inner steps.
"""

from __future__ import annotations

from typing import Tuple

import jax

from .state import DynParams, Forcing, LBMState, StepConfig
from .reference import make_step as make_reference_step


def _pallas_ok(shape, config: StepConfig) -> bool:
    import os
    import warnings

    if os.environ.get("LUW_DISABLE_PALLAS"):
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
        from ..ops.stream_collide import pallas_reject_reason

        reason = pallas_reject_reason(shape, config)
        if reason is not None:
            # loud fallback: the jnp tier is correct but ~40x slower — a
            # deck that falls off the fast tier must say why, not surface
            # as an unexplained slowdown
            warnings.warn(
                f"grid {tuple(shape)} falls back to the jnp reference tier "
                f"(~40x slower than the Pallas kernel): {reason}",
                RuntimeWarning, stacklevel=3)
            return False
        return True
    except Exception:
        return False


def make_runner(config: StepConfig, forcing: Forcing = Forcing(), *,
                shape: Tuple[int, int, int] = None, n_inner: int = 1,
                impl: str = "auto", donate: bool = True, pre_step=None):
    """Jitted `run(state, dyn, t0) -> state` advancing n_inner steps from
    global step index t0 (t0 feeds per-step hooks like the VK inlet).

    Returns (runner, impl_name) with runner(state, dyn, t0[, n_steps]).
    impl: "auto" | "reference" | "pallas".
    `pre_step(state, t) -> state` runs before each step inside the loop.

    The step loop is a `lax.fori_loop` with a TRACED trip count: one
    compilation serves every chunk length (the run driver stops at output/
    averaging events at irregular strides — with a static scan length each
    distinct chunk size would recompile the kernel, minutes per variant on
    large grids).

    Dispatch for "auto" on TPU: the y-tiled pallas kernel serves any plane
    a legal tiling exists for (run/sizing.apply_fast_tier pads deck grids so
    one always does); else the jnp reference tier.
    """
    import jax.numpy as jnp

    def loop(step_fn, state0, dyn, t0, n_steps, hook=pre_step, post=False):
        """post=False: hook runs before each step — the reference tier's VK
        hook presets the u field the kernel reads, and the pallas tiers' ddf
        hook refreshes the FaceBC targets the kernel's in-kernel inlet sites
        consume (the kernel at step t then emits feq(realization t), which
        neighbors stream during t+1 — reference timing, setup.cpp:4869).
        post=True is retained for hooks that rewrite state after a step."""
        def body(i, st):
            t = t0 + i
            if hook is not None and not post:
                st = hook(st, t)
            st = step_fn(st, dyn)
            if hook is not None and post:
                st = hook(st, t)
            return st

        return jax.lax.fori_loop(0, n_steps, body, state0)

    has_forcing = (forcing.nudge_sigma is not None
                   or forcing.sponge_sigma_z is not None)
    # the pallas tiers step pure DDFs and need the DDF-writing inlet hook;
    # a hook without one (reference-tier-only) forces the reference tier
    pre_step_ddf = getattr(pre_step, "ddf", None)
    use_pallas = (impl == "pallas" or (
        impl == "auto" and shape is not None and _pallas_ok(shape, config))
    ) and (pre_step is None or pre_step_ddf is not None)

    if use_pallas:
        from ..ops.stream_collide import (
            build_face_bc, make_pallas_step, merge_state, split_state,
        )

        vk_spec = getattr(pre_step_ddf, "kernel_spec", None)
        step = make_pallas_step(config, forcing, shape, vk=vk_spec)

        # Large forcing fields ride the jit as TRACED arguments (the same
        # forcing_loc override the sharded runner uses), never as closure
        # constants: baked (Z,Y,X) constants are serialized into the HLO, and
        # at production grids nudge_sigma alone is O(100s of MB) — enough to
        # blow remote-compile payload limits (axon HTTP 413) and bloat the
        # compile cache.  sponge_z is (Z,1) and stays a closure constant.
        floc_args = {}
        if forcing.nudge_sigma is not None:
            nf = (forcing.nudge_face if forcing.nudge_face is not None
                  else jnp.zeros(shape, jnp.uint8))
            floc_args["nudge_sigma"] = jnp.asarray(forcing.nudge_sigma)
            floc_args["nudge_face"] = jnp.asarray(nf).astype(jnp.uint8)
        # sponge-only forcing takes step()'s lazy path instead: in-trace
        # jnp.zeros for the nudge slots cost nothing resident and nothing
        # in the HLO payload, vs ~5 B/cell of pinned HBM if materialized
        # here (sponge_z itself is (Z,1) and rides as a closure constant)

        def body(state: LBMState, dyn: DynParams, t0, n_steps, fbc, floc):
            s = split_state(state)._replace(fbc=fbc)
            if step.uses_rows:   # y-tiled kernel: seed the carried rows
                rl, rh = step.init_rows(s)
                s = s._replace(rows_lo=rl, rows_hi=rh)
            if pre_step_ddf is not None and hasattr(pre_step_ddf, "init_aux"):
                s = s._replace(aux=pre_step_ddf.init_aux(s, t0))
            stepf = (lambda st, d: step(st, d, forcing_loc=floc)) \
                if floc else step
            out = loop(stepf, s, dyn, jnp.asarray(t0, jnp.int32), n_steps,
                       hook=pre_step_ddf, post=False)
            return merge_state(out), out.fbc

        def init_fbc(state: LBMState):
            if not (has_forcing or vk_spec):
                return None
            return build_face_bc(state.u, state.T)

        impl_name = "pallas"
    else:
        step = make_reference_step(config, forcing)

        floc_args = {}

        def body(state: LBMState, dyn: DynParams, t0, n_steps, fbc, floc):
            return (loop(step, state, dyn, jnp.asarray(t0, jnp.int32), n_steps),
                    None)

        def init_fbc(state: LBMState):
            return None

        impl_name = "reference"

    jitted = jax.jit(body, donate_argnums=(0,) if donate else ())
    fbc_cell = [None, False]      # [carried FaceBC, initialized?]

    def run(state, dyn, t0, n_steps=None):
        # traced trip count: every chunk length reuses the one compilation.
        # The FaceBC (nudge/sponge targets, VK-refreshed in-loop) is carried
        # ACROSS chunks so inlet targets never revert to the initial values
        # at chunk boundaries.  One runner therefore serves ONE simulation:
        # call run.reset() (or build a new runner) before reusing it with a
        # re-initialized state, else the previous run's targets leak in.
        if not fbc_cell[1]:
            fbc_cell[0] = init_fbc(state)
            fbc_cell[1] = True
        out, fbc_cell[0] = jitted(
            state, dyn, t0,
            jnp.asarray(n_inner if n_steps is None else n_steps, jnp.int32),
            fbc_cell[0], floc_args)
        return out

    def reset():
        """Forget the carried FaceBC; the next run() rebuilds it from the
        state it receives (use when reusing one runner across simulations)."""
        fbc_cell[0] = None
        fbc_cell[1] = False

    run.reset = reset

    def memory_analysis(state, dyn, t0, n_steps=None):
        """XLA memory analysis of the chunk executable for these inputs
        (AOT: compiles without executing) — the sizing tool for HBM
        budgets: .temp_size_in_bytes is the program's transient peak on
        top of the (donated) arguments/outputs."""
        if not fbc_cell[1]:
            fbc_cell[0] = init_fbc(state)
            fbc_cell[1] = True
        ns = jnp.asarray(n_inner if n_steps is None else n_steps, jnp.int32)
        return jitted.lower(state, dyn, jnp.asarray(t0, jnp.int32), ns,
                            fbc_cell[0], floc_args).compile().memory_analysis()

    run.memory_analysis = memory_analysis
    # checkpoint/resume access to the carried targets (run/checkpoint.py)
    run.get_fbc = lambda: fbc_cell[0]

    def set_fbc(fbc):
        # Mirror the sharded runner's checks (parallel/halo.py set_fbc):
        # a checkpoint written under a different grid/thermal config must
        # fail HERE with a clear message, not later as an opaque jit shape
        # error inside the step.
        if fbc is not None and shape is not None:
            Z, Y, X = shape
            want = {"uw": (Z, 3, Y), "ue": (Z, 3, Y),
                    "us": (Z, 3, X), "un": (Z, 3, X),
                    "ut": (3, Y, X), "ub": (3, Y, X)}
            for k, shp in want.items():
                arr = getattr(fbc, k)
                if arr is None:
                    raise ValueError(f"restored FaceBC is missing face '{k}'")
                if tuple(arr.shape) != shp:
                    raise ValueError(
                        f"restored FaceBC {k} shape {tuple(arr.shape)} does "
                        f"not match this runner's grid (want {shp}) — "
                        "checkpoint written under a different decomposition?")
            if config.thermal and has_forcing and fbc.tt is None:
                raise ValueError("restored FaceBC has no thermal target 'tt' "
                                 "but this runner is thermal (config mismatch)")
            if fbc.tt is not None and tuple(fbc.tt.shape) != (Y, X):
                raise ValueError(
                    f"restored FaceBC tt shape {tuple(fbc.tt.shape)} does not "
                    f"match this runner's grid (want {(Y, X)})")
        fbc_cell[0] = fbc
        fbc_cell[1] = True

    run.set_fbc = set_fbc

    # pallas tiers step pure DDFs: rho/u/T in the returned state are stale
    # until lbm.fields.update_fields refreshes them (driver does, at events)
    run.fields_stale = impl_name.startswith("pallas")
    return run, impl_name


def make_bench_runner(config: StepConfig, *, shape, n_inner: int, impl: str = "auto"):
    return make_runner(config, Forcing(), shape=shape, n_inner=n_inner, impl=impl)
