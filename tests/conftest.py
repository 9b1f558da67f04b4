import os
import sys

# Tests run on a virtual 8-device CPU mesh — the TPU-native analogue of
# "multi-node without a cluster" (see SURVEY.md §4).  The axon sitecustomize
# registers the TPU backend and forces jax_platforms, so we must override via
# jax.config (env vars alone are not enough).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
