"""Multi-chromosome batch scheduling across hosts.

The reference fans source files over a local process pool
(ld_area.py:336-339).  The pod-scale analogue is chromosome-level data
parallelism across HOSTS: each jax process takes a round-robin slice of
the chromosome list and runs its sweeps on its local devices, with no
inter-host traffic (results land in per-chromosome files, exactly like
the reference's per-file output dirs).  Within a host, the variant axis
of each chromosome is sharded over the local mesh (parallel/sweep.py).
"""

from __future__ import annotations

import jax

from ld_tools_tpu.utils.logging import get_logger

log = get_logger("parallel.batch")


def chromosomes_for_this_process(chroms) -> list:
    """Round-robin slice of the chromosome list for this jax process.

    Single-process runs get the whole list; under jax.distributed the
    work splits by process_index.  Round-robin (not contiguous split)
    balances the wildly different chromosome sizes.
    """
    chroms = list(chroms)
    n = jax.process_count()
    if n <= 1:
        return chroms
    k = jax.process_index()
    mine = chroms[k::n]
    log.info("process %d/%d takes chromosomes %s", k, n, mine)
    return mine
