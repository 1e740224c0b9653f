import os

# Tests run on a virtual CPU mesh so they work without TPU hardware; the
# driver benches on the real chip separately.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip(),
)

REF_TEST = "/root/reference/test"
