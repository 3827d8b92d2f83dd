"""Test configuration.

Tests run on CPU with 8 virtual devices (the TPU-world analogue of the
reference's run.pl-instead-of-queue.pl local mode, SURVEY.md §4) and with
x64 enabled so numeric golden tests against the float64 CPU reference are
exact. TPU execution is covered by bench.py / __graft_entry__.py which the
driver runs on real hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The container's sitecustomize imports jax with JAX_PLATFORMS=axon (remote
# TPU) before conftest runs, so set the platform through the live config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

# The suite is jit-compile-bound (one CPU core in CI): persist compiled
# executables so reruns skip XLA compilation entirely.
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".cache", "jax",
)
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_FEATGEN = "/root/reference/src/featgen"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_FEATGEN)
