"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes. Multi-chip sharding tests use the
8 virtual devices (the driver separately dry-runs the multi-chip path).
"""

import os
import sys

# Force CPU: the environment presets JAX_PLATFORMS=axon (the tunneled TPU),
# and the baked sitecustomize.py registers the axon backend at interpreter
# start, overriding the env var via jax.config. Setting the env var is not
# enough — re-update the config before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.default_backend()
)
assert jax.device_count() == 8, "expected 8 virtual CPU devices"

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def import_reference(module: str):
    """Import a module from the read-only reference tree (for golden tests).

    Only pure-NumPy reference modules are usable (no CUDA in this image).
    Returns None if the reference tree or its deps are unavailable, letting
    golden tests skip gracefully.
    """
    import importlib

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        return importlib.import_module(module)
    except Exception:
        return None
