import os

# Force tests onto a virtual 8-device CPU mesh.  The environment pins every
# interpreter to the remote TPU (axon sitecustomize registers the backend and
# sets jax_platforms via jax.config, overriding the JAX_PLATFORMS env var),
# so we must override through jax.config as well — backends are not yet
# initialized at conftest-import time.
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REF_TEST = "/root/reference/test"
