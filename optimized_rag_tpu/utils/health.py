"""Device / runtime health checks.

Failure-detection subsystem (SURVEY.md §5: the reference has none beyond
tenacity retries; a TPU framework needs an answer for "is the chip
usable?"). Used by ``cli.py info`` and suitable for serving readiness
probes.
"""

from __future__ import annotations

import concurrent.futures
import time
from typing import Dict


def check_device_health(timeout_s: float = 60.0,
                        matmul_dim: int = 256) -> Dict:
    """Run a tiny device computation under a timeout.

    Returns {healthy, backend, device_count, latency_s} or
    {healthy: False, error}. The timeout matters: a wedged or claimed
    device hangs the first op rather than erroring.
    """
    def probe():
        import jax
        import jax.numpy as jnp
        import numpy as np
        t0 = time.perf_counter()
        x = jnp.ones((matmul_dim, matmul_dim), jnp.float32)
        y = float(np.asarray((x @ x).sum()))
        assert y == matmul_dim ** 3, y
        return {
            "healthy": True,
            "backend": jax.default_backend(),
            "device_count": jax.device_count(),
            "latency_s": round(time.perf_counter() - t0, 3),
        }

    pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
    try:
        return pool.submit(probe).result(timeout=timeout_s)
    except concurrent.futures.TimeoutError:
        return {"healthy": False,
                "error": f"device did not respond within {timeout_s}s "
                         "(wedged or claimed by another process)"}
    except Exception as exc:
        return {"healthy": False, "error": f"{type(exc).__name__}: {exc}"}
    finally:
        pool.shutdown(wait=False)
