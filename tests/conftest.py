"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Device-path tests validate sharding/multi-chip logic on CPU; the real TPU
chip is only used by bench.py.
"""

import os

# NOTE: the 'axon' TPU plugin in this image ignores the JAX_PLATFORMS env
# var; jax.config.update is required to actually pin the CPU backend.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
REFDATA = pathlib.Path("/root/reference/testdata")


@pytest.fixture(scope="session")
def refdata():
    return REFDATA
