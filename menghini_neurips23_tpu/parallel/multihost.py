"""Multi-host SPMD helpers.

Replaces the reference's `accelerate launch` process group (reference
methods_config/accelerate_config.yml: 4 single-node GPU processes) with the
JAX multi-controller model: `jax.distributed.initialize()` once per host, one
global mesh over all chips (ICI within a slice, DCN across slices), and
per-host file-list sharding for data loading (each host decodes only its own
shard; the global batch is assembled by device placement, not collectives).
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Tuple

import jax

log = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX process group (no-op on a single host)."""
    if num_processes is None or num_processes <= 1:
        return
    import os

    from menghini_neurips23_tpu.utils.logging import set_process_rank

    if process_id is not None:
        # known before init: set it now so records logged DURING
        # jax.distributed.initialize are already rank-0-filtered
        set_process_rank(process_id)
    # Ranks reach the coordination-service SHUTDOWN barrier as they finish;
    # on oversubscribed hosts (N ranks time-slicing few cores - e.g. the
    # 8-rank CPU test matrix on one core) end-of-run skew can exceed jax's
    # 300 s default, killing an otherwise-complete run at exit.  Overridable
    # for genuinely slow fleets.
    shutdown_s = int(os.environ.get("MNT_SHUTDOWN_TIMEOUT", "1200") or 1200)
    heartbeat_s = int(os.environ.get("MNT_HEARTBEAT_TIMEOUT", "300") or 300)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        heartbeat_timeout_seconds=heartbeat_s,
        shutdown_timeout_seconds=shutdown_s,
    )
    set_process_rank(jax.process_index())
    log.info(
        "distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    _establish_collectives()


def _establish_collectives() -> None:
    """Open the full-mesh cross-host communicator NOW, while every rank is
    still aligned from the coordinator handshake it just left.

    XLA's CPU gloo rendezvous has a hardcoded 30 s key-value deadline
    ("GetKeyValue() timed out with key: cpu:gloo/...").  If the run's FIRST
    cross-host collective sits behind a long, rank-skewed compile (N ranks
    time-slicing an oversubscribed host), ranks can reach the rendezvous
    more than 30 s apart and the whole group aborts.  One tiny allgather
    here - sub-second compile, microseconds after jax.distributed.initialize
    released all ranks together - establishes the all-devices communicator
    once; XLA caches it per clique, so every later (arbitrarily skewed)
    program whose collectives run over the FULL mesh reuses it instead of
    re-rendezvousing.  Collectives over a sub-clique (e.g. the dp-only or
    tp-only axis of a dp x tp mesh) still rendezvous lazily on first use -
    warm_axis_collectives() covers those once the mesh shape is known."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("mnt:establish-collectives")
    log.info("full-mesh collective context established")


def warm_axis_collectives(mesh) -> None:
    """Establish the per-axis sub-clique communicators a multi-axis mesh
    will use (the dp-only and tp-only collectives of a dp x tp mesh).

    XLA caches gloo communicators PER CLIQUE: the full-mesh warmup in
    _establish_collectives() does not cover a later psum over just 'data' or
    just 'model', whose first execution still rendezvouses lazily and can
    hit the hardcoded 30 s key-value deadline behind rank-skewed compiles.
    Called at runtime construction while ranks are still aligned from mesh
    setup.  No-op outside a process group or on a 1-axis mesh (already
    covered by the full-mesh warmup)."""
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    if jax.process_count() <= 1 or len(mesh.axis_names) <= 1:
        return
    for ax in mesh.axis_names:
        if mesh.shape[ax] <= 1:
            continue
        f = jax.jit(
            jax.shard_map(
                lambda x, ax=ax: jax.lax.psum(x, ax),
                mesh=mesh, in_specs=P(), out_specs=P(),
            )
        )
        np.asarray(f(jnp.zeros((1,), jnp.float32)))  # force execution
    log.info("per-axis collective contexts established: %s", dict(mesh.shape))


def initialize_from_env(env=None) -> bool:
    """Initialize the process group from launcher env vars, the multi-host
    replacement for `accelerate launch`'s process spawning (reference
    scripts/run_prompts_ssl.sh:20-21 + accelerate_config.yml:8-9):

        JAX_COORDINATOR_ADDRESS=host:port JAX_NUM_PROCESSES=N \\
        JAX_PROCESS_ID=i python run_main_ssl.py ...

    Returns True when a multi-process group was initialized.  Must run before
    any JAX backend is touched."""
    import os

    env = os.environ if env is None else env
    addr = env.get("JAX_COORDINATOR_ADDRESS", "")
    num = int(env.get("JAX_NUM_PROCESSES", "1") or 1)
    if not addr or num <= 1:
        return False
    initialize_distributed(addr, num, int(env.get("JAX_PROCESS_ID", "0")))
    return True


def replicate_tree(mesh, tree):
    """Host pytree -> mesh-replicated global arrays.  In a multi-process
    group, single-device jnp arrays cannot feed a global-mesh jit; every
    process calls this with the same host values instead."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    host = jax.tree.map(np.asarray, tree)
    return jax.device_put(host, NamedSharding(mesh, P()))


def shard_filelist_for_batch(
    batch_files: Sequence[str],
    per_host: int,
    process_index: Optional[int] = None,
) -> List[str]:
    """This host's contiguous slice of ONE global batch's file list.

    The global batch row-block layout is host-major (host i owns rows
    [i*per_host, (i+1)*per_host) of the data-sharded device array), so the
    slice must be the fixed-size block at that offset - NOT an equalized
    remainder split - to line up with make_array_from_process_local_data.
    A short final batch simply truncates; the caller zero-pads its slice.

    This is THE per-host IO sharding used in production
    (ClipRuntime._batched_pass_multihost), replacing the reference's DDP
    sampler + gather + drop_duplicates dedup (textual_prompt.py:294)."""
    pi = jax.process_index() if process_index is None else process_index
    lo = min(pi * per_host, len(batch_files))
    hi = min(lo + per_host, len(batch_files))
    return list(batch_files[lo:hi])


def is_main_process() -> bool:
    """Rank-0 IO guard (replaces accelerator.is_local_main_process)."""
    return jax.process_index() == 0
