"""Test config: run everything on a virtual 8-device CPU mesh.

SURVEY.md §4 "distributed-without-cluster": JAX fakes meshes on one host via
--xla_force_host_platform_device_count, exercising pjit sharding + psum grads
in CI with no TPU. NOTE: the axon TPU plugin overrides the JAX_PLATFORMS env
var, so the platform must be forced through jax.config before first use.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
