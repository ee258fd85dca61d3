"""Test config: run everything on a virtual 8-device CPU mesh.

This is the standard way to exercise pjit/shard_map logic without a TPU pod
(SURVEY.md §4). The container's sitecustomize pre-imports jax with the TPU
('axon') platform, so the env-var route is too late — force the platform via
jax.config before any backend is instantiated.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
