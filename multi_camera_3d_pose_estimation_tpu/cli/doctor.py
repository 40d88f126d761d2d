"""Environment health check: `python -m multi_camera_3d_pose_estimation_tpu doctor`.

Verifies, in order of how often they bite (no reference counterpart —
the reference assumes a working local OpenCV/torch install; a TPU
framework's failure modes are remoter and quieter):

1. core imports + versions (jax, flax, optax, numpy, cv2, yaml);
2. the native media runtime (`native/libmediadec.so` via ctypes);
3. the device backend, probed in a KILLABLE subprocess with a hard
   timeout — during a device-tunnel outage an in-process
   ``jax.devices()`` blocks ~25 minutes before raising UNAVAILABLE
   (observed 2026-08-17), so a naive check reports nothing for half an
   hour; the probe reports DOWN in ``--probe_timeout`` seconds instead;
4. a tiny jit on a virtual multi-device CPU mesh (the configuration the
   test suite and `dryrun_multichip` rely on).

Exit code 0 when everything REQUIRED passes; the device probe is
advisory (a CPU-only machine is a supported configuration) unless
``--require_device`` is given.
"""

from __future__ import annotations

import argparse
import subprocess
import sys

_OK = "ok"
_FAIL = "FAIL"


def _check_imports(report):
    required = ("jax", "flax", "optax", "numpy")
    optional = ("cv2", "yaml")
    good = True
    for name in required + optional:
        try:
            mod = __import__(name)
            ver = getattr(mod, "__version__", "?")
            report.append((f"import {name}", _OK, ver))
        except Exception as e:  # pragma: no cover - broken env path
            report.append((f"import {name}", _FAIL, str(e)[:60]))
            if name in required:
                good = False
    return good


def _check_native(report):
    try:
        from ..native import load_mediadec

        lib = load_mediadec()
    except Exception as e:  # pragma: no cover - build-failure path
        report.append(("native mediadec", _FAIL, str(e)[:60]))
        return False
    if lib is None:
        report.append(("native mediadec", _FAIL,
                       "libmediadec.so unavailable (build or libav missing)"))
        return False
    report.append(("native mediadec", _OK, "demux/decode/audio/remux loaded"))
    return True


def _probe_device(report, timeout_s: float):
    """Advisory: what does an unconstrained child process see?"""
    code = ("import jax; d = jax.devices(); "
            "print(d[0].platform, len(d), sep=',')")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        report.append(("device backend", _FAIL,
                       f"init still blocked after {timeout_s:.0f}s — device "
                       f"tunnel DOWN or badly degraded"))
        return False
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()
        report.append(("device backend", _FAIL,
                       tail[-1][:70] if tail else "init failed"))
        return False
    platform, n = r.stdout.strip().split(",")
    report.append(("device backend", _OK, f"{platform} × {n}"))
    return True


def _check_cpu_mesh(report, n_devices: int = 4, timeout_s: float = 240.0):
    """Required: the virtual CPU mesh the tests/dryrun path uses."""
    code = f"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count={n_devices}"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np
mesh = Mesh(np.array(jax.devices()), ("data",))
x = jax.device_put(jnp.arange({n_devices} * 4.0).reshape({n_devices}, 4),
                   NamedSharding(mesh, P("data")))
y = jax.jit(lambda a: (a * 2).sum())(x)
assert float(y) == float(np.arange({n_devices} * 4.0).sum() * 2)
print("mesh-ok")
"""
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:  # pragma: no cover - hang path
        report.append((f"virtual {n_devices}-device CPU mesh", _FAIL,
                       f"timed out after {timeout_s:.0f}s"))
        return False
    if r.returncode != 0 or "mesh-ok" not in r.stdout:
        tail = (r.stderr or "").strip().splitlines()
        report.append((f"virtual {n_devices}-device CPU mesh", _FAIL,
                       tail[-1][:70] if tail else "failed"))
        return False
    report.append((f"virtual {n_devices}-device CPU mesh", _OK,
                   "sharded jit executes"))
    return True


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="doctor", description="environment health check")
    p.add_argument("--probe_timeout", type=float, default=60.0,
                   help="seconds before declaring the device backend DOWN")
    p.add_argument("--no_device", action="store_true",
                   help="skip the device-backend probe (fast, CPU-only)")
    p.add_argument("--require_device", action="store_true",
                   help="fail (exit 1) if the device probe fails")
    args = p.parse_args(argv)

    report: list[tuple[str, str, str]] = []
    good = _check_imports(report)
    good &= _check_native(report)
    good &= _check_cpu_mesh(report)
    if not args.no_device:
        dev_ok = _probe_device(report, args.probe_timeout)
        if args.require_device:
            good &= dev_ok

    width = max(len(name) for name, _, _ in report)
    for name, status, detail in report:
        print(f"{name:<{width}}  {status:<4}  {detail}")
    print("doctor:", "healthy" if good else "PROBLEMS FOUND")
    raise SystemExit(0 if good else 1)


if __name__ == "__main__":
    main()
