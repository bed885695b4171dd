"""Test harness: run every test on a virtual 8-device CPU mesh.

This is the standard JAX trick for exercising pod-style sharding without TPU
hardware (SURVEY.md §4 "Implication for the new build"). bench.py and the CLI
do NOT import this — they run on the real chip.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
