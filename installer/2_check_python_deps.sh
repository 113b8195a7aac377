#!/usr/bin/env bash
# Stage 2: dependency check (reference: installer/2_setup_python.sh +
# requirements.txt).  This stack ships with jax/flax/numpy preinstalled;
# the stage verifies imports instead of pip-installing.
set -u
python3 - <<'PY'
import importlib, sys
required = ["jax", "jax.numpy", "numpy", "scipy", "matplotlib", "pandas"]
optional = ["xarray", "geopandas", "trimesh", "rasterio", "netCDF4"]
bad = []
for m in required:
    try:
        importlib.import_module(m)
        print(f"  ok       {m}")
    except ImportError:
        bad.append(m); print(f"  MISSING  {m}")
for m in optional:
    try:
        importlib.import_module(m)
        print(f"  ok       {m} (optional)")
    except ImportError:
        print(f"  absent   {m} (optional — tools degrade gracefully)")
sys.exit(1 if bad else 0)
PY
