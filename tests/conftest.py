"""Test harness config.

Multi-device-on-CPU testing (SURVEY §4 'Implication for the rebuild'): we
fake an 8-device host platform so sharding/collective correctness is tested
without TPU hardware — the capability the reference approximated with
--world-size/--rank overrides (reference tools/test_tfds_loader.py:119-122).

NOTE: this environment force-registers a TPU-like 'axon' platform via
sitecustomize, so tests explicitly build meshes from jax.devices('cpu').
"""
import os

# must be set before jax initializes its backends
os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
# The suite runs entirely on the host CPU backend (no test uses the TPU
# platform). Pinning jax_platforms keeps jax from *initializing* the remote
# 'axon' TPU backend at all — initialization blocks indefinitely (retry
# sleep loop) when the TPU tunnel is down, which would otherwise hang
# collection of every test. Two subtleties: (1) the driver exports
# JAX_PLATFORMS=axon globally, so this must override, not setdefault;
# (2) this image's sitecustomize imports jax at interpreter start to
# register the axon PJRT plugin, so jax has ALREADY read JAX_PLATFORMS
# from the env by the time conftest runs — the pin must go through
# jax.config.update, which works any time before backend initialization.
# Set VTX_TEST_TPU=1 to lift the pin for ad-hoc on-chip runs.
if not os.environ.get("VTX_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"  # for subprocesses the tests spawn

import jax  # noqa: E402

if not os.environ.get("VTX_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# This image routes default-backend compiles through a remote TPU compile
# service with high per-program latency; unit tests run on the host CPU
# backend (compiled locally) instead. TPU-specific tests opt in explicitly.
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--full-zoo", action="store_true", default=False,
        help="run the exhaustive model-zoo sweeps (all 1248 registry names; "
             "~30 min on this 1-core box). Default runs published anchors + "
             "a deterministic sample.")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "full_zoo: exhaustive zoo sweep, needs --full-zoo (or VTX_FULL_ZOO=1)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--full-zoo") or os.environ.get("VTX_FULL_ZOO"):
        return
    skip = pytest.mark.skip(reason="needs --full-zoo (or VTX_FULL_ZOO=1)")
    for item in items:
        if "full_zoo" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, "conftest failed to fake 8 host devices"
    return devs


@pytest.fixture(scope="session")
def tiny_model_kwargs():
    """Small enough to compile fast on the 1-core test host."""
    return dict(img_size=32, patch_size=16, embed_dim=64, depth=2,
                num_heads=2, num_classes=10)
