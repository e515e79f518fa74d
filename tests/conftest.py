"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding paths (Mesh/pjit/shard_map) are exercised without TPU
hardware.

The harness boot hook (sitecustomize) registers the single-TPU 'axon' backend
and sets jax_platforms='axon,cpu' via jax.config — which overrides the
JAX_PLATFORMS env var — so we must force CPU through jax.config here, before
any backend is initialized."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"
# silence XLA:CPU AOT-cache machine-feature chatter (harmless, very loud)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The persistent XLA:CPU compilation cache is DISABLED for the suite: on
# this host, deserializing cached executables intermittently SEGFAULTS the
# process (faulthandler stacks end in compilation_cache
# get/put_executable_and_time; observed in five separate `-n 2` suite runs
# across three different test files, surfacing as "[gwN] node down").
# Mitigations tried and insufficient: CPU-fingerprinted cache dirs
# (cross-host blobs), per-xdist-worker dirs (concurrent access), and
# --xla_cpu_max_isa=AVX512 (AMX XSTATE permission theory) — the crash
# reproduced with all three, on freshly-written same-process entries.
# NOTE: this must be set HERE, before any compilation: jax latches
# cache-enablement per process on first use (compilation_cache.is_cache_used
# caches its verdict), so a later disable is a silent no-op.
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8
    yield


@pytest.fixture(scope="module", autouse=True)
def _lean_worker():
    """Drop compiled-executable caches at module boundaries. Long-lived
    xdist workers accumulate hundreds of XLA:CPU JIT executables across test
    modules; the rare worker segfaults on this host always strike a heavy
    compile late in a worker's life (plain backend_compile_and_load — not
    the persistent cache, which is already disabled). Cross-module
    executable reuse is minimal, so this costs little and keeps the LLVM
    JIT state small."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.RandomState(0)
