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

Round-2 hardening (VERDICT r1 #2 — the round-1 driver bench recorded
'relay-blocked-timeout' and never ran the flagship kernel): a *stale relay
session* (an earlier TPU process that died uncleanly) delays the NEXT
session's acquisition by ~90-240 s, which a 120 s pallas timeout
misreports as the pallas hang. The probe now runs in phases:

  1. WARM: a plain-XLA child with a generous timeout absorbs any
     stale-session delay and proves the relay itself is healthy. If this
     times out, the verdict is 'relay-unavailable-timeout' — the relay,
     not Pallas, is the problem.
  2. PALLAS: with acquisition known-healthy, a pallas-child timeout IS the
     pallas failure mode. A timeout is retried after a reap pause (the
     killed child is itself a fresh stale session).
  3. SWEEP: after a failed pallas attempt, another plain-XLA child absorbs
     the stale session our killed child left, so the CALLER's subsequent
     TPU acquisition starts clean.

bench.py uses the verdict to either benchmark the Pallas kernels against
their XLA twins or record an explicit per-phase result (no silent
shelf-ware). The reference has no analog (100% stock torch ops).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from typing import Dict

_WARM_SRC = r"""
import jax
import jax.numpy as jnp

x = jnp.ones((8, 128), jnp.float32)
total = float(jax.device_get((x * 2.0).sum()))
print("RELAY_WARM_OK", total, jax.devices()[0].platform, flush=True)
"""

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


def _run_child(src: str, ok_tag: str, expect: str,
               timeout_s: float) -> Dict[str, object]:
    env = dict(os.environ)
    env.setdefault("FFRNET_PALLAS_PROBE_CHILD", "1")
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", src], env=env,
            capture_output=True, text=True, timeout=timeout_s)
        dt = time.perf_counter() - t0
        out = proc.stdout.strip().splitlines()
        ok_lines = [l for l in out if l.startswith(ok_tag)]
        if proc.returncode == 0 and ok_lines:
            parts = ok_lines[-1].split()
            ok = parts[1] == expect
            return {"available": ok,
                    "verdict": "ok" if ok
                    else f"error: wrong result {parts[1]}",
                    "platform": parts[2] if len(parts) > 2 else None,
                    "seconds": round(dt, 1)}
        tail = (proc.stderr or proc.stdout or "").strip()[-400:]
        return {"available": False,
                "verdict": f"error: rc={proc.returncode} {tail}",
                "platform": None, "seconds": round(dt, 1)}
    except subprocess.TimeoutExpired:
        return {"available": False, "verdict": "relay-blocked-timeout",
                "platform": None,
                "seconds": round(time.perf_counter() - t0, 1)}


def _warm(timeout_s: float) -> Dict[str, object]:
    return _run_child(_WARM_SRC, "RELAY_WARM_OK", "2048.0", timeout_s)


def _probe_once(timeout_s: float) -> Dict[str, object]:
    return _run_child(_PROBE_SRC, "PALLAS_PROBE_OK", "2048.0", timeout_s)


def probe_pallas(timeout_s: float = 120.0, *, force: bool = False,
                 attempts: int = 2, warm_timeout_s: float = 300.0,
                 reap_pause_s: float = 20.0) -> Dict[str, object]:
    """Three-phase pallas-availability probe (see module docstring).

    Returns {'available': bool, 'verdict': str, 'platform': str|None,
    'warm_s': float, 'attempts': int[, 'sweep': str]}. Verdicts: 'ok',
    'relay-unavailable-timeout' (even plain XLA could not run — relay or
    stale-session problem, NOT a pallas signal), 'relay-blocked-timeout'
    (XLA ran fine, pallas dispatched and never returned — the documented
    pallas relay hang), or 'error:...'. Result is cached per process.
    Env overrides: FFRNET_PALLAS_PROBE_TIMEOUT, FFRNET_PALLAS_WARM_TIMEOUT.
    """
    if _cached and not force:
        return dict(_cached)

    warm_timeout_s = float(os.environ.get("FFRNET_PALLAS_WARM_TIMEOUT",
                                          warm_timeout_s))
    warm = _warm(warm_timeout_s)
    if not warm["available"]:
        result = {"available": False,
                  "verdict": ("relay-unavailable-timeout"
                              if warm["verdict"] == "relay-blocked-timeout"
                              else f"relay-unavailable ({warm['verdict']})"),
                  "platform": warm["platform"],
                  "warm_s": warm["seconds"], "attempts": 0}
        _cached.clear()
        _cached.update(result)
        return dict(result)

    result: Dict[str, object] = {}
    used = 0
    for attempt in range(max(attempts, 1)):
        used = attempt + 1
        result = _probe_once(timeout_s)
        if result["verdict"] != "relay-blocked-timeout":
            break
        # our killed child is now the stale session; give the relay a
        # moment to reap it before retrying
        time.sleep(reap_pause_s)
    result["warm_s"] = warm["seconds"]
    result["attempts"] = used
    if result["verdict"] == "relay-blocked-timeout":
        # absorb the stale session we just created so the CALLER's own
        # TPU acquisition (e.g. the bench pipeline) starts clean
        sweep = _warm(warm_timeout_s)
        result["sweep"] = sweep["verdict"]
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
