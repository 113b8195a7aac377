"""Accelerator environment probing — TPU analog of core/accelerator_runtime.py.

The reference probes/repairs CUDA wheel layouts for numba and checks OpenCL
ICDs; here we probe the JAX backend, TPU topology/memory/bandwidth, the
persistent compilation cache, and the native toolchain, emitting the same
style of JSON environment report the pipeline logs.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
from typing import Optional


def probe_tpu_environment() -> dict:
    report = {
        "python": sys.version.split()[0],
        "jax": None,
        "backend": None,
        "devices": [],
        "tpu": None,
        "compilation_cache": os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or "unset",
        "native_toolchain": {
            "g++": shutil.which("g++"),
            "cmake": shutil.which("cmake"),
            "ninja": shutil.which("ninja"),
        },
        "errors": [],
    }
    try:
        import jax

        report["jax"] = jax.__version__
        report["backend"] = jax.default_backend()
        report["devices"] = [str(d) for d in jax.devices()]
    except Exception as e:
        report["errors"].append(f"jax: {type(e).__name__}: {e}")
        return report
    if report["backend"] == "tpu":
        try:
            from jax.experimental.pallas import tpu as pltpu

            info = pltpu.get_tpu_info()
            report["tpu"] = {
                "chip": str(info.chip_version),
                "cores": info.num_cores,
                "hbm_gib": round(info.hbm_capacity_bytes / 2**30, 1),
                "vmem_mib": round(info.vmem_capacity_bytes / 2**20),
                "nominal_bw_gbps": round(info.mem_bw_bytes_per_second / 1e9),
                "bf16_tops": round(info.bf16_ops_per_second / 1e12),
            }
        except Exception as e:
            report["errors"].append(f"tpu info: {type(e).__name__}: {e}")
    try:
        from ..utils.native import load

        report["native_library"] = "loaded" if load() is not None else "unavailable"
    except Exception as e:
        report["errors"].append(f"native: {type(e).__name__}: {e}")
    return report


def apply_runtime_environment(cache_dir: Optional[str] = None) -> dict:
    """Set up the recommended runtime env (persistent compile cache)."""
    if cache_dir:
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
        try:
            import jax

            jax.config.update("jax_compilation_cache_dir", cache_dir)
        except Exception:
            pass
    return probe_tpu_environment()


def main(argv=None) -> int:
    print(json.dumps(probe_tpu_environment(), indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
