"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU analogue of "multi-node without a cluster" (SURVEY.md §4):
sharding/pjit logic is validated on host devices; kernels run in interpret
mode where needed. Must be set before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TRANSFORMERS_VERBOSITY", "error")
os.environ.setdefault("HF_HUB_OFFLINE", "1")

# The axon sitecustomize registers the TPU backend at interpreter start and
# overrides platform selection; jax.config wins over it.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
