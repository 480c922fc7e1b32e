"""Device preflight: fail fast on libtpu client/terminal version skew.

Over the remote-TPU ("axon") tunnel, the client AOT-compiles against its
own libtpu while the terminal runs another; when the builds differ, the
very first ``device_put``/compile fails with ``FAILED_PRECONDITION:
libtpu version mismatch`` — historically deep inside a long soak or bench
run after minutes of setup (MULTICHIP_r01.json).  ``device_preflight()``
runs a trivial transfer+compute up front and converts that failure (or a
wedged tunnel) into an immediate, self-describing error.
"""

from __future__ import annotations

import json


def backend_versions() -> dict:
    """Collect the client-side version facts (cheap, no device traffic)."""
    import jax
    info = {"jax": jax.__version__}
    try:
        import jaxlib
        info["jaxlib"] = jaxlib.__version__
    except Exception:  # pragma: no cover - jaxlib always present with jax
        pass
    try:
        from jax.extend import backend as jeb
        b = jeb.get_backend()
    except Exception:
        b = None
    if b is not None:
        info["platform"] = getattr(b, "platform", None)
        pv = getattr(b, "platform_version", None)
        if pv:
            info["platform_version"] = str(pv).replace("\n", " ")
    return info


def device_preflight(raise_on_error: bool = True) -> dict:
    """Run one tiny transfer + jitted op; return the version dict on
    success.  On failure, raise (or return) a RuntimeError whose message
    carries both libtpu builds when the cause is version skew.

    Call this at the top of every long hardware run (bench.py, the soak,
    autotune) so a mid-flight libtpu upgrade costs seconds, not a session.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    info = backend_versions()
    try:
        x = jax.device_put(np.arange(8, dtype=np.int32))
        total = int(jax.jit(jnp.sum)(x))
        if total != 28:
            raise RuntimeError(f"preflight compute wrong: {total} != 28")
        info["ok"] = True
        return info
    except Exception as e:  # noqa: BLE001 — every failure mode must report
        msg = str(e)
        tag = ("libtpu version skew (client/terminal build mismatch)"
               if "libtpu version mismatch" in msg else
               "device preflight failed")
        err = RuntimeError(
            f"{tag}: {msg.splitlines()[-1] if msg else e!r}\n"
            f"client versions: {json.dumps(info)}")
        if raise_on_error:
            raise err from e
        info["ok"] = False
        info["error"] = str(err)
        return info
