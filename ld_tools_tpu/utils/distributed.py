"""Multi-host initialization helpers.

The reference has no distributed story (SURVEY.md §2b).  Here multi-host
runs use jax.distributed: every host calls ``initialize_if_needed()``
before building a mesh over ``jax.devices()``; bands of the variant axis
then span all hosts (parallel/sweep.py), with collectives riding ICI
within a slice and DCN across slices.
"""

from __future__ import annotations

import os

import jax

from ld_tools_tpu.utils.logging import get_logger

log = get_logger("utils.distributed")

_initialized = False


def initialize_if_needed(
    coordinator_address=None, num_processes=None, process_id=None
) -> bool:
    """Initialize jax.distributed when running under a multi-host launcher.

    Reads the standard JAX coordination env vars when args are omitted;
    no-ops (returns False) in single-process runs so all code paths work
    unchanged on one host.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None
    provided = {
        "JAX_COORDINATOR_ADDRESS": coordinator_address,
        "JAX_NUM_PROCESSES": num_processes,
        "JAX_PROCESS_ID": process_id,
    }
    missing = [k for k, v in provided.items() if v in (None, "")]
    if missing:
        if len(missing) < len(provided):
            # SOME coordination vars set clearly signals multi-host
            # intent; silently degrading to N independent full runs
            # (each host doing ALL the work) must not look like a
            # deliberate single-host run
            log.warning(
                "partial jax.distributed configuration: %s missing — "
                "running single-process; set all three (or none) of "
                "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
                "JAX_PROCESS_ID",
                ", ".join(missing),
            )
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    log.info(
        "jax.distributed initialized: process %d/%d via %s; %d global devices",
        process_id,
        num_processes,
        coordinator_address,
        len(jax.devices()),
    )
    return True
