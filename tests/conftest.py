"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding is tested without TPU hardware the standard JAX way
(SURVEY.md §4e): xla_force_host_platform_device_count=8 on the CPU backend.

The container's sitecustomize (PYTHONPATH entry /root/.axon_site) registers
the real-TPU "axon" PJRT plugin at interpreter startup and pins JAX to it;
neither env vars nor in-process os.environ edits can undo that once the
interpreter is up.  So at configure time (before any test module imports
jax) the test process re-execs itself ONCE with that sitecustomize stripped
from PYTHONPATH and the CPU mesh flags set.
"""

import os
import sys

_AXON_SITE = ".axon_site"
_FLAG = "--xla_force_host_platform_device_count=8"


def _cpu_env() -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and _AXON_SITE not in p)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " " + _FLAG).strip()
    env["JAX_ENABLE_X64"] = "0"
    # Persistent compilation cache: the suite is compile-bound (full-frame
    # programs take 5-15 s each to build on CPU); repeat runs load from disk.
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache_cpu")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    env["SRT_TESTS_REEXECED"] = "1"
    return env


def pytest_configure(config):
    if os.environ.get("SRT_TESTS_REEXECED") == "1":
        return
    if _AXON_SITE not in os.environ.get("PYTHONPATH", ""):
        # No axon sitecustomize in play — just pin the CPU mesh in-process.
        os.environ["JAX_PLATFORMS"] = "cpu"
        if "xla_force_host_platform_device_count" not in os.environ.get(
                "XLA_FLAGS", ""):
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "") + " " + _FLAG).strip()
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                              "/root/.jax_cache_cpu")
        os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                              "1")
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest", *sys.argv[1:]], _cpu_env())
