import os

# Run the suite on CPU with 8 virtual devices so sharding paths are testable
# without TPU hardware. Must be set before jax is imported anywhere.
# Hard override: the session environment exports JAX_PLATFORMS=axon (the
# tunneled TPU); unit tests must be hermetic and fast on CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# A pytest plugin may have imported jax before this conftest ran, in which
# case the env var is too late — force the platform through the config too.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the solver graphs are large and dominate suite
# time; repeat runs hit the cache. Overridable so a suite run can't share a
# dir with a concurrently-running TPU job (concurrent cross-platform
# writers segfaulted the cache serializer once).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MPMVS_TEST_CACHE", "/tmp/mpmvs_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


# Serializing certain multi-device CPU SPMD executables into the
# persistent compile cache segfaults inside XLA's cache writer
# (jax compilation_cache.put_executable_and_time — observed repeatedly in
# round 4 whenever the sharded-pipeline programs were compiled cold).
# Tests marked `nocache` compile without the persistent cache.
import pytest


@pytest.fixture(autouse=True)
def _no_persistent_cache_for_marked(request):
    if request.node.get_closest_marker("nocache") is None:
        yield
        return
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        yield
    finally:
        jax.config.update("jax_enable_compilation_cache", True)
