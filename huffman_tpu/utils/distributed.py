"""Multi-host initialization helpers.

The reference has no distributed runtime at all (SURVEY §2.7): its
multi-GPU path is a single-process ``cudaSetDevice`` loop with host-staged
gathers (`gpuhd/multigpu_demo.cc:176-314`).  The TPU-native equivalent is
``jax.distributed`` + one global mesh: every host calls
:func:`init_multihost` (idempotent), after which ``jax.devices()`` spans the
whole slice and the sharded codec entry points in ``huffman_tpu.parallel``
run unchanged — XLA routes the psum/all-gather collectives over ICI within
a slice and DCN across slices.

Typical pod-slice launch (same program on every host)::

    from huffman_tpu.utils.distributed import init_multihost
    from huffman_tpu.parallel import data_mesh, make_ils_sharded_roundtrip

    init_multihost()                      # no-op on single-host
    mesh = data_mesh()                    # all chips, data axis
    step = make_ils_sharded_roundtrip(mesh, k=2048, max_len=16,
                                      tiles_per_device=TPD)
    ...

There is no multi-host hardware in CI; the logic is exercised on the
virtual 8-device CPU mesh (tests/) and via the driver's multi-chip dry run.
"""

from __future__ import annotations

import os

import jax

__all__ = ["init_multihost", "is_multihost"]

_INITIALIZED = False


def is_multihost() -> bool:
    return jax.process_count() > 1


def init_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed once, from env or explicit args.

    Safe to call unconditionally: a no-op when already initialized or when
    no multi-host environment is detected (no coordinator configured).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    workers = [
        w for w in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if w
    ]
    if coordinator_address is None and len(workers) < 2:
        return  # single-host
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
