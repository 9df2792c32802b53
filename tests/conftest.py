"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding (parallel/) is validated without TPU hardware via
xla_force_host_platform_device_count, mirroring how the driver dry-runs the
multi-chip path.

If the interpreter was started under the axon TPU tunnel (PALLAS_AXON_POOL_IPS
set), its sitecustomize routes *every* XLA compile — including CPU — through a
remote compile service, making each of the test suite's many small compiles a
network round trip (~20-30s each). Tests are CPU-only, so we re-exec once with
the tunnel variables stripped to get local compiles.
"""

import os
import sys

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("_DPGO_TPU_TESTS_REEXEC") != "1"
):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["_DPGO_TPU_TESTS_REEXEC"] = "1"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
