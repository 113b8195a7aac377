#!/usr/bin/env bash
# Stage 4: solver smoke test (reference: installer/4_testrun.cmd is a
# placeholder; this analog actually runs 20 LBM steps on a tiny grid).
set -u
LUW_HOME=$(cd "$(dirname "$0")/.." && pwd)
PYTHONPATH="$LUW_HOME${PYTHONPATH:+:$PYTHONPATH}" python3 - <<'PY'
import numpy as np
from latticeurbanwind_tpu.lbm import (
    DynParams, StepConfig, TYPE_S, make_initial_state, make_multi_step,
    omega_from_nu,
)
import jax.numpy as jnp
shape = (8, 16, 32)
flags = np.zeros(shape, np.uint8); flags[0] = flags[-1] = TYPE_S
cfg = StepConfig(omega=omega_from_nu(0.02), storage="f32")
state = make_initial_state(shape, config=cfg, flags=flags)
run = make_multi_step(cfg, n_inner=20)
out = run(state, DynParams(force=jnp.array([1e-5, 0, 0]), omega_coriolis=jnp.zeros(3)))
umax = float(jnp.max(jnp.abs(out.u)))
assert 0 < umax < 0.1, umax
print(f"smoke test OK: 20 steps, max |u| = {umax:.2e} (backend: ", end="")
import jax; print(jax.default_backend() + ")")
PY
