"""Tiny TPU health probe for the axon tunnel.

The tunnel intermittently wedges after heavy compile bursts (CLAUDE.md);
this runs one trivial matmul with a host readback so callers can gate
long TPU jobs on `timeout 120 python scripts/tpu_probe.py`.
Exit 0 = healthy, nonzero = wedged/unavailable.
"""

import sys


def main() -> int:
    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    if not devs or devs[0].platform == "cpu":
        print(f"no accelerator: {devs}")
        return 2
    x = jnp.ones((256, 256), jnp.bfloat16)
    val = (x @ x).sum().item()
    print(f"TPU OK: {devs[0]} matmul-> {val}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
