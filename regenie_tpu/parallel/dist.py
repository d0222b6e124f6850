"""Multi-host distributed runtime.

Replaces the reference's multi-machine story — the split-L0 shared-
filesystem job protocol (write_l0_master, /root/reference/src/
Data.cpp:244-309) and the documented manual per-chromosome step-2
sharding (docs/docs/recommendations.md:128) — with jax.distributed:
every host runs the SAME CLI invocation, the global device mesh spans
all hosts, collectives ride ICI within a slice and DCN across slices,
and only the output host writes files.

Activation (before any other JAX call):
- On a TPU pod slice, `jax.distributed.initialize()` auto-detects the
  topology — set REGENIE_TPU_DIST=1 to opt in.
- Anywhere else (including CPU multi-process testing with Gloo
  collectives), set:
      REGENIE_TPU_COORDINATOR=host0:port
      REGENIE_TPU_NUM_PROCESSES=N
      REGENIE_TPU_PROCESS_ID=i

Each host decodes its own shard of the genotype stream (variant axis in
step 2, full block + local sample rows in step 1); global arrays are
assembled per-process with jax.make_array_from_callback, so the
single-host shard_map kernels run unchanged.
"""

from __future__ import annotations

import os

_STATE = {"initialized": False}


def maybe_init_distributed(log=print) -> bool:
    """Initialize jax.distributed from the environment (idempotent).
    Must run before the backend is touched. Returns True when this run
    is multi-process."""
    if _STATE["initialized"]:
        return process_count() > 1
    coord = os.environ.get("REGENIE_TPU_COORDINATOR")
    auto = os.environ.get("REGENIE_TPU_DIST")
    if not coord and not auto:
        return False
    import jax

    # honor the platform override BEFORE initializing the distributed
    # runtime — an unreachable PJRT plugin registered at interpreter
    # start would otherwise hang/kill the coordinator handshake
    plat = (os.environ.get("REGENIE_TPU_PLATFORM")
            or os.environ.get("JAX_PLATFORMS"))
    if plat:
        jax.config.update("jax_platforms", plat.lower())
    if coord:
        nproc = int(os.environ["REGENIE_TPU_NUM_PROCESSES"])
        pid = int(os.environ["REGENIE_TPU_PROCESS_ID"])
        jax.distributed.initialize(coord, num_processes=nproc,
                                   process_id=pid)
    else:
        jax.distributed.initialize()  # TPU pod auto-detection
    _STATE["initialized"] = True
    log(f" * distributed: process {jax.process_index()} of "
        f"{jax.process_count()} ({len(jax.local_devices())} local / "
        f"{len(jax.devices())} global devices)")
    return jax.process_count() > 1


def process_index() -> int:
    if not _STATE["initialized"]:
        return 0
    import jax

    return jax.process_index()


def process_count() -> int:
    if not _STATE["initialized"]:
        return 1
    import jax

    return jax.process_count()


def is_output_host() -> bool:
    """Only one host writes output files (host-0-ordered merge: every
    host holds identical gathered results, host 0 renders them)."""
    return process_index() == 0


class _NullSink:
    """Write-discarding text/binary sink for non-output hosts."""

    def write(self, s):
        return len(s)

    def flush(self):
        pass

    def close(self):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def allgather_py(obj):
    """Gather one picklable object per process, ordered by process id
    (the transport for the ordered multi-host output merge — replaces
    the reference's per-machine output files users had to concatenate,
    docs/recommendations.md:128). Single-process: [obj]."""
    if process_count() == 1:
        return [obj]
    import pickle

    import numpy as np
    from jax.experimental import multihost_utils

    buf = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([buf.size], dtype=np.int64), tiled=True)
    m = int(sizes.max())
    pad = np.zeros(m, np.uint8)
    pad[: buf.size] = buf
    gathered = multihost_utils.process_allgather(pad[None], tiled=True)
    return [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes())
        for i in range(process_count())
    ]
