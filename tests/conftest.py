"""Test config: run JAX on a virtual 8-device CPU mesh (multi-chip sharding
is validated without TPU hardware, per SURVEY.md §4's multi-host strategy)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# no persistent compile cache under pytest: CPU compiles are fast, and
# the cache's zstd writer has segfaulted under heavy co-located memory
# pressure (observed twice while Gbp-scale runs shared the host)
os.environ.setdefault("JAX_ENABLE_COMPILATION_CACHE", "false")

# jax may already be imported (site customization registers a TPU plugin and
# pins JAX_PLATFORMS before conftest runs), so env vars alone are too late:
# force the platform through the live config before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def random_genome(rng, n):
    return rng.integers(0, 4, size=n).astype(np.uint8)


@pytest.fixture(scope="session")
def small_index():
    """A small FM index over a random 20kb genome, session-cached."""
    from hisat2_tpu.io.reference import reference_from_seqs
    from hisat2_tpu.index.fm_index import build_fm_index
    from hisat2_tpu.utils import alphabet

    r = np.random.default_rng(7)
    seq = alphabet.decode(r.integers(0, 4, size=20000).astype(np.uint8))
    ref = reference_from_seqs({"chrT": seq})
    return build_fm_index(ref, ftab_k=6)
