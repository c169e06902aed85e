"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-chip benchmarks go through bench.py; tests validate numerics and
sharding on host CPU so they run anywhere (the driver validates the
multi-chip path separately via __graft_entry__.dryrun_multichip).

Note: a sitecustomize in this image pins JAX_PLATFORMS=axon, so the env
var alone is not enough — force the platform through jax.config before
the backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the device entropy/transform programs take
# ~10s each to compile on this 1-core CPU; cache hits load in ~1s.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jaxcache-cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_ROOT = "/root/reference"
TESTPATT = os.path.join(REFERENCE_ROOT, "data", "testpatt.pgm")
