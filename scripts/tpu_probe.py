"""Tiny TPU health probe for the axon tunnel.

The tunnel intermittently wedges after heavy compile bursts (CLAUDE.md);
this runs one trivial matmul with a host readback so callers can gate
long TPU jobs on `timeout 120 python scripts/tpu_probe.py`.
Exit 0 = healthy, nonzero = wedged/unavailable.

``--fresh`` additionally compiles a UNIQUE shape (derived from the
clock) so the probe exercises the REMOTE-COMPILE path, not just cached
execution: the tunnel has a degraded mode where cached tiny ops succeed
in seconds while fresh compiles hang for many minutes — the state that
matters to anything about to compile a train step.
"""

import sys
import time


def main(fresh: bool = False) -> int:
    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    if not devs or devs[0].platform == "cpu":
        print(f"no accelerator: {devs}")
        return 2
    x = jnp.ones((256, 256), jnp.bfloat16)
    val = (x @ x).sum().item()
    if fresh:
        # unique static shape -> guaranteed compile-cache miss
        k = 128 + 8 * (int(time.time() // 7) % 997)
        t0 = time.perf_counter()
        y = jnp.ones((8, k), jnp.bfloat16)
        w = jnp.ones((k, 128), jnp.bfloat16)
        fval = (y @ w).sum().item()
        dt = time.perf_counter() - t0
        print(
            f"TPU OK: {devs[0]} matmul-> {val}; "
            f"fresh compile k={k} -> {fval} in {dt:.1f}s"
        )
        return 0
    print(f"TPU OK: {devs[0]} matmul-> {val}")
    return 0


if __name__ == "__main__":
    sys.exit(main(fresh="--fresh" in sys.argv[1:]))
