"""Hardware probe for Pallas kernel execution.

All three Pallas kernels in this repo (ops/pallas/{self_similarity,
se_gating,warp}.py) are equivalence-tested in interpreter mode, but real
execution hangs through some TPU access paths (this image's axon relay
dispatches the kernel and never returns the result — even for a trivial
x*2 kernel; see BASELINE.md). This probe answers "can THIS host actually
execute a pallas_call?" safely:

  * it runs a minimal pallas_call in a SUBPROCESS with a hard timeout, so a
    relay hang cannot wedge the caller
  * run it BEFORE the caller touches the TPU — concurrent TPU sessions
    serialize through the relay, and a probe queued behind a live session
    would misreport a hang

bench.py uses the verdict to either benchmark the Pallas kernels against
their XLA twins or record an explicit "relay-blocked" result per kernel
(no silent shelf-ware). The reference has no analog (100% stock torch ops).
"""

from __future__ import annotations

import os
import subprocess
import sys
from typing import Dict

_PROBE_SRC = r"""
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

def kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0

x = jnp.ones((8, 128), jnp.float32)
y = pl.pallas_call(
    kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
total = float(jax.device_get(y).sum())
print("PALLAS_PROBE_OK", total, jax.devices()[0].platform, flush=True)
"""

_cached: Dict[str, object] = {}


def _probe_once(timeout_s: float) -> Dict[str, object]:
    env = dict(os.environ)
    env.setdefault("FFRNET_PALLAS_PROBE_CHILD", "1")
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC], env=env,
            capture_output=True, text=True, timeout=timeout_s)
        out = proc.stdout.strip().splitlines()
        ok_lines = [l for l in out if l.startswith("PALLAS_PROBE_OK")]
        if proc.returncode == 0 and ok_lines:
            parts = ok_lines[-1].split()
            return {"available": parts[1] == "2048.0",
                    "verdict": "ok" if parts[1] == "2048.0"
                    else f"error: wrong result {parts[1]}",
                    "platform": parts[2] if len(parts) > 2 else None}
        tail = (proc.stderr or proc.stdout or "").strip()[-400:]
        return {"available": False,
                "verdict": f"error: rc={proc.returncode} {tail}",
                "platform": None}
    except subprocess.TimeoutExpired:
        return {"available": False, "verdict": "relay-blocked-timeout",
                "platform": None}


def probe_pallas(timeout_s: float = 120.0, *, force: bool = False,
                 attempts: int = 2) -> Dict[str, object]:
    """Try one trivial pallas_call on the default backend in a subprocess.

    Returns {'available': bool, 'verdict': str, 'platform': str|None}.
    Verdicts: 'ok', 'relay-blocked-timeout' (dispatched but never returned
    within timeout_s — the documented relay failure mode), or 'error:...'
    (compile/runtime failure). A timeout is retried up to `attempts` total
    tries: a *stale relay session* (e.g. an earlier TPU process that died
    uncleanly) makes session acquisition exceed the timeout once and then
    recover, which is indistinguishable from the true relay hang on the
    first try (observed round 3). Result is cached per process.
    """
    if _cached and not force:
        return dict(_cached)
    result = _probe_once(timeout_s)
    for _ in range(max(attempts, 1) - 1):
        if result["verdict"] != "relay-blocked-timeout":
            break
        result = _probe_once(timeout_s)
    _cached.clear()
    _cached.update(result)
    return dict(result)


def main() -> None:
    import json

    res = probe_pallas(timeout_s=float(sys.argv[1]) if len(sys.argv) > 1
                       else 120.0)
    print(json.dumps(res))
    sys.exit(0 if res["available"] else 1)


if __name__ == "__main__":
    main()
