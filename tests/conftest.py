"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(``xla_force_host_platform_device_count=8``) because only one physical TPU
chip is reachable from CI; the driver separately dry-runs the multi-chip
path via ``__graft_entry__.dryrun_multichip``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# Hard override: this image's sitecustomize registers the axon TPU plugin
# and pins jax_platforms via jax.config, which BEATS the env var — the env
# assignment above alone silently leaves tests on the single tunneled TPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert len(jax.devices()) >= 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}")


def pytest_configure(config):
    """Build the native loaders when absent so their parity tests and
    load-time known-answer self-tests actually run in CI (the binaries are
    not committed; the build is a few seconds of g++)."""
    import pathlib
    import subprocess

    native = pathlib.Path(__file__).resolve().parent.parent / "native"
    libs = [native / "libptvcsv.so", native / "libptvtiff.so"]
    if native.is_dir() and not all(p.exists() for p in libs):
        try:
            subprocess.run(["sh", str(native / "build.sh")], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # tests that need the libs will skip/fail
            print(f"warning: native build failed: {e}")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
