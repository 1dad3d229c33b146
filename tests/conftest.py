import os

# Run the test suite on a virtual 8-device CPU mesh so multi-chip sharding is
# exercised without TPU hardware (SURVEY.md §4 point 4).  The ambient
# environment pins jax to the 'axon' TPU tunnel via sitecustomize, which sets
# the jax_platforms *config* (env vars alone don't win) — override the config
# after import.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
