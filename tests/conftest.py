"""Test configuration: force an 8-virtual-device CPU platform so sharding /
collective paths (DP/TP/SP) are testable without a TPU pod, per the survey's
test strategy (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
