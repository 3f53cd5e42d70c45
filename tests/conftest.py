import os

# Run the whole test suite on a simulated 8-device CPU mesh so multi-chip
# sharding paths are exercised without TPU hardware (force-override: the
# ambient environment may point JAX_PLATFORMS at real TPU hardware).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent XLA compilation cache: repeat suite runs skip recompilation.
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.abspath(_cache))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# A sitecustomize hook may have force-registered a hardware backend and
# overridden jax_platforms after env parsing — override it back, before any
# backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
