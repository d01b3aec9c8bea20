"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding logic can
be exercised without TPU hardware (the TPU-world analogue of testing
multi-node code without a cluster).

Note: this environment pre-imports jax at interpreter startup (axon plugin
hook), so JAX_PLATFORMS in os.environ is read *before* conftest runs —
``jax.config.update`` is the only reliable override. XLA_FLAGS is read at
backend initialization, which has not happened yet, so setting it here works.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: repeated jit compiles (many tiny trainers
# across tests) hit disk instead of recompiling, cutting suite time ~10x.
# SUITE-PRIVATE dir (not the generic /tmp/vsr_tpu_jax_cache_cpu): CPU-jax
# processes with different XLA machine-feature flags poison a shared cache
# into entries that abort/hang later runs (CLAUDE.md round-3 gotcha, hit
# twice) — only 8-virtual-device suite processes may write here.
#
# CRASH SELF-HEAL: a run that dies mid-cache-write (SIGABRT) can leave a
# corrupt entry that every later run of the same program deserializes and
# aborts on — observed round 3 (a previously-green test aborting until the
# dir was removed). Every session drops a pid marker and removes it on
# clean exit; a leftover marker whose pid is DEAD means the previous
# session crashed mid-run — start from an empty cache. A marker with a
# LIVE pid is a concurrently-running session: never wipe under it (the
# wipe itself would corrupt that session).
_CACHE_DIR = "/tmp/vsr_tpu_jax_cache_cpu_suite8"


def _pid_is_pytest(pid: int) -> bool:
    """True only if ``pid`` is alive AND still looks like a pytest session.

    The liveness probe alone is wrong under pid reuse: a stale marker whose
    pid was recycled to an unrelated long-lived process would block the
    self-heal wipe forever (and the poisoned cache would keep aborting every
    run). /proc is authoritative on this platform; if it is unavailable,
    fall back to the bare liveness check.
    """
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except Exception:
        pass  # exists but not ours / unknown — check cmdline below
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            cmdline = f.read().replace(b"\0", b" ")
        return b"pytest" in cmdline or b"py.test" in cmdline
    except OSError:
        return True  # no /proc view — conservatively assume a live session


if os.path.isdir(_CACHE_DIR):
    import glob as _glob

    _markers = _glob.glob(os.path.join(_CACHE_DIR, ".inflight.*"))
    _live = [m for m in _markers
             if _pid_is_pytest(int(m.rsplit(".", 1)[-1]))]
    _dead = [m for m in _markers if m not in _live]
    if _dead and not _live:
        import shutil

        shutil.rmtree(_CACHE_DIR, ignore_errors=True)
    elif _live:
        # CONCURRENT pytest session detected: writing into the same dir
        # from two interpreters is exactly how the cache gets poisoned
        # into deadlocking/SIGABRT entries (CLAUDE.md round-3/5 gotcha) —
        # this session takes a PRIVATE throwaway dir instead. Slower
        # (cold cache) but never corrupts the shared one.
        _CACHE_DIR = f"/tmp/vsr_tpu_jax_cache_cpu_suite8_pid{os.getpid()}"
        print(f"[conftest] concurrent pytest session holds the shared "
              f"compile cache; using private {_CACHE_DIR}", flush=True)
os.makedirs(_CACHE_DIR, exist_ok=True)
_MARKER = os.path.join(_CACHE_DIR, f".inflight.{os.getpid()}")
with open(_MARKER, "w") as _f:
    _f.write("running\n")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionfinish(session, exitstatus):
    try:
        os.remove(_MARKER)
    except OSError:
        pass
    if _CACHE_DIR.endswith(f"_pid{os.getpid()}"):
        # Private throwaway dir (concurrent-session fallback above):
        # nothing else reads it — don't leave GBs in /tmp.
        import shutil

        shutil.rmtree(_CACHE_DIR, ignore_errors=True)


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
