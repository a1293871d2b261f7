"""Test configuration: force an 8-virtual-device CPU platform so sharding /
collective paths (DP/TP/SP) are testable without a TPU pod, per the survey's
test strategy (SURVEY.md §4).

Note: this environment's axon sitecustomize pins JAX_PLATFORMS=axon, so the
env var alone is not enough — jax.config must be updated explicitly before
any backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# build the native library if absent (csrc/libmaskops.so is a build artifact,
# compiled with -march=native, so it is not checked in)
import subprocess  # noqa: E402

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if not os.path.exists(os.path.join(_root, "csrc", "libmaskops.so")):
    subprocess.run(["make", "-C", os.path.join(_root, "csrc")], check=False)
