import os

# Test on a virtual 8-device CPU mesh; the one real TPU chip is reserved for
# bench.py (SURVEY.md §6 implication (b)).  NOTE: the axon sitecustomize in
# this image imports jax and pins JAX_PLATFORMS=axon before user code runs,
# so the env var alone is not enough — use jax.config, which wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
