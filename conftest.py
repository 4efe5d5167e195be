"""Pytest bootstrap: force the CPU backend with 8 virtual devices.

Must run before jax initializes. Multi-chip sharding tests use the virtual
device mesh (the TPU-world answer to testing multi-node without a cluster);
numeric golden tests are deterministic on CPU. Benchmarks (bench.py) run on
the real TPU chip outside pytest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize may have imported jax already (and pinned
# the hardware backend); override the live config too so the env vars
# actually take effect.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: golden tests touch many distinct shapes; repeat
# runs skip recompilation entirely.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_pytest")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
