"""Advisory lock serializing access to the axon TPU tunnel.

Two JAX processes dialing the tunnel concurrently deadlock the chip's
remote claim (both hang with frozen CPU time; recovery requires killing
both and waiting ~30 min for the claim to expire — round-5 operational
finding, NEXT.md "Operational gotchas"). Every long-running tool that
executes on the TPU (bench.py, tools/trace_r5.py, tools/hw_smoke.py)
takes this lock around its device work so a second launch *waits* at the
lock instead of wedging the tunnel.

flock-based: kernel-released on process exit (even SIGKILL), so a dead
holder never strands the lock. CPU-backend runs skip it.
"""

from __future__ import annotations

import contextlib
import fcntl
import os
import sys

LOCK_PATH = "/tmp/aid_tpu_tpu.lock"


def backend_is_tpu() -> bool:
    """True when jax's default backend talks to real TPU hardware
    (axon tunnel or native). Imports jax lazily; never initializes a
    backend on its own ahead of the caller."""
    import jax

    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


@contextlib.contextmanager
def tpu_lock(path: str = LOCK_PATH, announce: bool = True):
    """Hold the tunnel lock for the duration of the block.

    Blocks until the current holder exits. No-op when the default
    backend is CPU (tests / AID_BENCH_CPU smoke runs must not serialize
    against a real bench)."""
    if not backend_is_tpu():
        yield
        return
    fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o666)
    try:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except BlockingIOError:
            if announce:
                print(
                    f"[aid_tpu] TPU tunnel lock {path} held by another "
                    "process; waiting (two concurrent tunnel dialers "
                    "deadlock the chip claim)...",
                    file=sys.stderr, flush=True)
            fcntl.flock(fd, fcntl.LOCK_EX)
        os.ftruncate(fd, 0)
        os.write(fd, str(os.getpid()).encode())
        yield
    finally:
        os.close(fd)  # releases the flock
