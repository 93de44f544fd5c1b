"""Test config: force CPU backend with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (see driver dryrun contract)."""

import os

# NOTE: this environment pre-registers an "axon" TPU backend via
# sitecustomize and exports JAX_PLATFORMS=axon, so a plain setdefault is
# not enough — force the CPU backend through jax.config (effective even
# after jax import, as long as no backend has initialized yet).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

REFERENCE = "/root/reference"
EXAMPLE_FASTA = (
    REFERENCE + "/example/data/human_g1k_v37_20_42220611-42542245.fasta"
)
HTSLIB_TEST = REFERENCE + "/src/samtools-1.3.1/htslib-1.3.1/test"


@pytest.fixture(scope="session")
def example_fasta():
    return EXAMPLE_FASTA


@pytest.fixture(scope="session")
def htslib_test_dir():
    return HTSLIB_TEST
