#!/usr/bin/env python
"""Block (bounded) until the remote-TPU tunnel is healthy; exit 0/1.

The axon tunnel wedges for ~30 min at a time (CLAUDE.md), and an
in-process ``jax.devices()`` during a wedge hangs indefinitely.  Every
hardware script therefore wants the same preamble: probe the tunnel in a
SUBPROCESS (a wedge becomes a subprocess timeout, not a hang), wait for a
healthy phase, give up after a budget.  ``bench.py`` carries its own
inline copy of this gate (it must stay dependency-free for the driver);
this is the reusable form for hardware queues:

  python scripts/wait_tpu.py --budget 7200 && python scripts/...

Prints one status line per probe to stderr and a final JSON line
({"state": ..., "sync_ms": ..., "waited_s": ...}) to stdout.

Exit codes: 0 = healthy TPU (or a CPU backend — nothing to gate),
1 = budget exhausted while wedged/slow.
"""

import argparse
import json
import subprocess
import sys
import time

PROBE_SRC = (
    "import json, time\n"
    "import jax, jax.numpy as jnp\n"
    "b = jax.default_backend()\n"
    "x = jax.device_put(jnp.arange(128, dtype=jnp.int32))\n"
    "f = jax.jit(jnp.sum)\n"
    "_ = int(f(x))\n"
    "ts = []\n"
    "for _ in range(5):\n"
    "    t0 = time.perf_counter(); _ = int(f(x))\n"
    "    ts.append(1e3 * (time.perf_counter() - t0))\n"
    "ts.sort()\n"
    "print(json.dumps({'backend': b, 'sync_ms': round(ts[2], 1)}))\n")


def probe(timeout_s: float = 240.0) -> dict | None:
    """One subprocess probe; None if it hung, crashed, or printed junk."""
    try:
        r = subprocess.run([sys.executable, "-c", PROBE_SRC],
                           capture_output=True, text=True,
                           timeout=timeout_s)
    except (subprocess.TimeoutExpired, OSError):
        return None
    if r.returncode != 0:
        return None
    for line in reversed(r.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                d = json.loads(line)
            except ValueError:
                continue
            if "backend" in d and "sync_ms" in d:
                return d
    return None


def wait_tpu(budget_s: float, healthy_sync_ms: float = 1500.0,
             interval_s: float = 120.0) -> dict:
    t0 = time.time()
    last = {}
    while True:
        d = probe()
        waited = time.time() - t0
        if d is not None:
            last = d
            if d["backend"] != "tpu":
                return {"state": "cpu", **d, "waited_s": round(waited, 1)}
            if d["sync_ms"] <= healthy_sync_ms:
                return {"state": "healthy", **d,
                        "waited_s": round(waited, 1)}
            state = "slow"
        else:
            state = "wedged"
        if waited >= budget_s:
            return {"state": state, **last, "waited_s": round(waited, 1)}
        print(f"[wait_tpu] {state} ({last or 'no probe'}); "
              f"waited {waited:.0f}s of {budget_s:.0f}s", file=sys.stderr)
        time.sleep(interval_s)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--budget", type=float, default=7200.0,
                    help="max seconds to wait (default 7200)")
    ap.add_argument("--healthy-ms", type=float, default=1500.0,
                    help="median per-sync latency that counts as healthy")
    ap.add_argument("--interval", type=float, default=120.0,
                    help="seconds between probes")
    args = ap.parse_args()
    res = wait_tpu(args.budget, args.healthy_ms, args.interval)
    print(json.dumps(res))
    sys.exit(0 if res["state"] in ("healthy", "cpu") else 1)


if __name__ == "__main__":
    main()
