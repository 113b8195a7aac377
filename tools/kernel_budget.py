"""Per-stage cost budget for the stream_collide kernel (dev tool).

VERDICT r4 weak-point 4: the bf16 kernel reaches 82 % of the measured copy
bandwidth while the f32 kernel (double traffic, same arithmetic) reaches
~92 % — i.e. bf16 is partially VPU-bound and the remaining plateau needs a
measured per-stage budget, not an assertion.  This tool measures the
flagship step under a toggle matrix that isolates each stage's cost
(reference roofline model: lbm.cpp:121-142):

  storage x {LES on/off}     -> Smagorinsky stage cost per tier
  f32 {LES on/off}           -> confirms the BW-bound tier doesn't care
  bf16 TRT                   -> collision-variant delta
  bf16 wall model            -> specular+Schumann stage delta
  fp16c/f16 codec probes     -> decode vs encode split (codec_lab variants)

Usage:  python tools/kernel_budget.py [rows...]
Env:    LUW_BENCH_SHAPE / LUW_BENCH_STEPS / LUW_BENCH_REPS as bench.py.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def measure_cfg(config, shape, steps: int, reps: int) -> float:
    """bench.measure with an explicit StepConfig (same protocol: in-trace
    state build, warm-up, best-of-N timed batches, hard readback sync)."""
    import jax
    import jax.numpy as jnp

    from latticeurbanwind_tpu.lbm import (
        DynParams, TYPE_E, TYPE_S, equilibrium_state,
    )
    from latticeurbanwind_tpu.lbm.stepper import make_bench_runner

    Z, Y, X = shape

    def build_state():
        flags = jnp.zeros(shape, jnp.uint8)
        flags = flags.at[0].set(TYPE_S)
        flags = flags.at[-1].set(TYPE_E)
        flags = flags.at[:, 0, :].set(TYPE_E)
        flags = flags.at[:, -1, :].set(TYPE_E)
        flags = flags.at[:, :, 0].set(TYPE_E)
        flags = flags.at[:, :, -1].set(TYPE_E)
        u = jnp.zeros((3, Z, Y, X), jnp.float32).at[0].set(0.05)
        return equilibrium_state(shape, config=config, u=u, flags=flags)

    state = jax.jit(build_state)()
    dyn = DynParams(force=jnp.zeros(3), omega_coriolis=jnp.zeros(3))
    want = os.environ.get("LUW_BENCH_IMPL", "auto")
    run, impl = make_bench_runner(config, shape=shape, n_inner=steps,
                                  impl=want)
    if want == "auto":
        assert impl == "pallas", impl   # the budget is for the fast tier

    def sync(s):
        return float(jnp.asarray(s.fi[0, 1, 1, 1]).astype(jnp.float32))

    state = run(state, dyn, 0)
    sync(state)
    best = float("inf")
    t = steps
    for _ in range(max(1, reps)):
        t0 = time.perf_counter()
        state = run(state, dyn, t)
        sync(state)
        best = min(best, time.perf_counter() - t0)
        t += steps
    return Z * Y * X * steps / best / 1e6


def rows_all():
    from latticeurbanwind_tpu.lbm import StepConfig, omega_from_nu

    base = dict(omega=omega_from_nu(1e-4), collision="srt",
                volume_force=False)
    mk = lambda **kw: StepConfig(**{**base, **kw})
    return {
        "bf16+les": mk(subgrid=True, storage="bf16"),
        "bf16-les": mk(subgrid=False, storage="bf16"),
        "f32+les": mk(subgrid=True, storage="f32"),
        "f32-les": mk(subgrid=False, storage="f32"),
        "bf16+les+trt": mk(subgrid=True, storage="bf16", collision="trt"),
        "bf16+les+wall": dataclasses.replace(
            mk(subgrid=True, storage="bf16"),
            wall_model=True, wall_cd=0.0134, volume_force=True),
        "fp16c+les": mk(subgrid=True, storage="fp16c"),
        "f16+les": mk(subgrid=True, storage="f16"),
    }


def main() -> int:
    import jax

    jax.devices()
    shape = tuple(int(v) for v in os.environ.get(
        "LUW_BENCH_SHAPE", "256,256,256").split(","))
    steps = int(os.environ.get("LUW_BENCH_STEPS", "100"))
    reps = int(os.environ.get("LUW_BENCH_REPS", "2"))
    rows = rows_all()
    names = sys.argv[1:] or list(rows)
    out = {}
    for name in names:
        mlups = measure_cfg(rows[name], shape, steps, reps)
        ns_cell = 1e3 / mlups
        out[name] = mlups
        print(f"{name:16s} {mlups:8.1f} MLUPs   {ns_cell:6.3f} ns/cell",
              flush=True)
    # stage deltas when both sides measured
    def delta(a, b, label):
        if a in out and b in out:
            d = 1e3 / out[b] - 1e3 / out[a]
            print(f"  stage {label:14s} {d:+6.3f} ns/cell "
                  f"({out[a]:.0f} -> {out[b]:.0f})")
    delta("bf16-les", "bf16+les", "LES(bf16)")
    delta("f32-les", "f32+les", "LES(f32)")
    delta("bf16+les", "bf16+les+trt", "TRT-SRT")
    delta("bf16+les", "bf16+les+wall", "wall+force")
    delta("bf16+les", "fp16c+les", "fp16c codec")
    delta("bf16+les", "f16+les", "f16 codec")
    return 0


if __name__ == "__main__":
    sys.exit(main())
