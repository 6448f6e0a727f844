"""Test configuration: force an 8-device virtual CPU mesh.

This is the TPU-native analog of "multi-node testing without a cluster"
(SURVEY.md section 4): all sharding/collective tests run against 8 virtual
CPU devices. The harness environment pins JAX_PLATFORMS to the remote TPU
("axon") platform, so the env var alone is not enough - we must override
jax_platforms through the config API before any computation runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(1234)


@pytest.fixture(scope="session")
def sample_wav_path():
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.join(here, "fixtures", "f62-S-v2swA_200000_210000.wav")
