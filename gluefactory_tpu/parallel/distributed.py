"""Multi-host initialization.

Counterpart of the reference's NCCL process-group setup (train.py:241-246):
single-controller JAX — call `init_distributed()` once per host before any
jax computation; jax.distributed wires the coordinator over DCN and
jax.devices() then spans all hosts' chips. The mesh/sharding code
(parallel/mesh.py) is host-count agnostic: data is sharded over the global
device list, gradient psums ride ICI within a host and DCN across hosts.

Environment-driven (standard TPU pod env vars) with explicit overrides.
Single-host runs skip initialization (the default everywhere in this repo;
multi-host hardware is not available in this environment — SURVEY note).
"""

from __future__ import annotations

import os

import jax

from .. import logger


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when running multi-host; returns True if
    distributed mode is active."""
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("PROCESS_ID")

    if coordinator_address is None and num_processes is None:
        # single-host: TPU pods auto-configure via the TPU runtime when
        # available; jax.distributed.initialize() with no args handles that.
        try:
            if os.environ.get("TPU_WORKER_HOSTNAMES", "localhost") != "localhost":
                jax.distributed.initialize()
                logger.info(
                    "jax.distributed initialized: process %d/%d, %d global devices",
                    jax.process_index(), jax.process_count(), jax.device_count(),
                )
                return True
        except Exception as e:  # noqa: BLE001
            logger.warning("jax.distributed auto-init failed: %s", e)
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "jax.distributed initialized: process %d/%d, %d global devices",
        jax.process_index(), jax.process_count(), jax.device_count(),
    )
    return True


def _int_env(name: str):
    v = os.environ.get(name)
    return int(v) if v is not None else None


__all__ = ["init_distributed"]
