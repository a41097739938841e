"""Multi-host (multi-process) execution support.

TPU-native replacement for the reference's multi-process path —
`torch.distributed.launch` + NCCL process groups
(training/idr_train.py:28-40, training_scripts/robot/run_s2.sh:13),
rank-0-only filesystem writes (idr_train.py:94,695) and per-rank data
scatter (datasets/scene_dataset.py:260-279):

  * `initialize()` wraps `jax.distributed.initialize` (idempotent; no-op for
    a single process). After it, `jax.devices()` spans every process and
    `make_mesh()` builds one global ray mesh — the same SPMD step then runs
    unchanged, with psums riding ICI within a host and DCN across hosts.
  * Every host draws the SAME epoch sample (shared seed, the reference's
    shared-sampler scheme) and materialises only its addressable shard of
    the global batch via `jax.make_array_from_callback` — the analogue of
    `scatter_sampling_idx`, but derived from the mesh instead of hand-rolled
    rank slicing.
  * `is_main()` guards filesystem writes (checkpoints, vis, tensorboard,
    code backup) exactly like the reference's rank-0 checks.
  * `to_host()` fetches a (possibly non-addressable) global array to every
    host for host-side logic (secondary-point selection, image assembly) —
    the fixed-shape replacement for the reference's pickled
    `dist.gather_object` (idr_train.py:443-447).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[str] = None,
    initialization_timeout: Optional[int] = None,
) -> None:
    """Idempotent `jax.distributed.initialize`.

    With no arguments, relies on the environment (TPU pod metadata or the
    JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID variables) —
    the moral equivalent of torch.distributed.launch's env:// init
    (reference idr_train.py:32). Call before any other jax API touches the
    backend."""
    global _initialized
    if _initialized:
        return
    kwargs: Dict[str, Any] = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    if local_device_ids:
        kwargs["local_device_ids"] = [
            int(d) for d in str(local_device_ids).split(",")
        ]
    if initialization_timeout is not None:
        kwargs["initialization_timeout"] = int(initialization_timeout)
    jax.distributed.initialize(**kwargs)
    _initialized = True


def warmup_collectives(mesh: Mesh) -> None:
    """Run one trivial collective over `mesh` while processes are in lockstep.

    Gloo (the CPU-cluster collectives backend) establishes its TCP context
    lazily at the FIRST collective, with a hard 30 s rendezvous deadline
    baked into XLA. If that first collective sits behind a long XLA compile
    or a stalled cache deserialization, processes can enter it more than
    30 s apart and context init fails (`Gloo context initialization failed:
    DEADLINE_EXCEEDED`) even though the cluster is healthy — exactly how the
    2-process real-trainer test died under a foreign compile cache (VERDICT
    r4 weak #7). One tiny all-reduce right after `initialize()` pins the
    context while desynchronization is impossible; later collectives over
    the same devices reuse it. No-op single-process."""
    if jax.process_count() == 1:
        return
    axis = mesh.axis_names[0]
    arr = jax.device_put(
        jnp.arange(mesh.devices.size, dtype=jnp.float32),
        NamedSharding(mesh, P(axis)),
    )
    rep = jax.jit(
        lambda a: a.sum(), out_shardings=NamedSharding(mesh, P())
    )(arr)
    np.asarray(rep.addressable_data(0))  # block until the collective ran


def process_count() -> int:
    return jax.process_count()


def is_main() -> bool:
    """True on the process that owns filesystem writes (rank 0)."""
    return jax.process_index() == 0


def make_global_array(mesh: Mesh, value, pspec: P):
    """Build a globally-sharded array from a host-replicated numpy value.

    Single-process: a plain device_put with the target sharding. Multi-host:
    every process holds the full `value` (all hosts draw the same sample)
    and contributes exactly the shards its addressable devices own via
    `jax.make_array_from_callback` — no cross-host data movement."""
    sharding = NamedSharding(mesh, pspec)
    arr = np.asarray(value)
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(arr), sharding)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def make_global_batch(mesh: Mesh, batch: Dict[str, Any], specs: Dict[str, P]):
    """Place a dict batch on the global mesh with per-key partition specs."""
    return {
        k: make_global_array(mesh, v, specs[k]) for k, v in batch.items()
    }


_replicators: Dict[Any, Any] = {}


def _replicator(mesh: Mesh):
    """Per-mesh cached jitted identity with replicated output sharding.

    A fresh `jax.jit(lambda a: a, ...)` per call would miss the pjit cache
    and re-trace the all-gather on every fetch; one cached callable per mesh
    lets jit's own cache handle the different shapes/dtypes."""
    fn = _replicators.get(mesh)
    if fn is None:
        fn = jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))
        _replicators[mesh] = fn
    return fn


def to_host(x) -> np.ndarray:
    """Fetch an array (possibly sharded across processes) as host numpy.

    Fully-addressable arrays come back directly; fully-replicated global
    arrays read their local replica (no communication). Genuinely
    cross-host-sharded arrays are resharded to replicated through a jitted
    identity (XLA inserts the all-gather over whatever axes were sharded —
    correct for any partition spec, unlike a leading-axis-only gather) —
    that program is a COLLECTIVE, so every process of the mesh must call
    to_host on the same array; for rank-0-only host logic on replicated
    pytrees use `local_replica` instead."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        if x.is_fully_replicated:
            return np.asarray(x.addressable_data(0))
        rep = _replicator(x.sharding.mesh)(x)
        return np.asarray(rep.addressable_data(0))
    return np.asarray(x)


def local_replica(tree):
    """Host-local numpy copy of a REPLICATED pytree, collective-free.

    Safe to call from a subset of processes (vis/checkpoint code that runs
    under an `is_main()` gate), unlike `to_host`'s all-gather: every device
    of a replicated array holds the full value, so the local shard IS the
    value. Raises on an actually-sharded array rather than silently
    returning a partial shard."""
    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            if not x.is_fully_replicated:
                raise ValueError(
                    "local_replica on a cross-host SHARDED array; use to_host "
                    "(from every process) instead"
                )
            return np.asarray(x.addressable_data(0))
        return np.asarray(x)

    return jax.tree_util.tree_map(fetch, tree)
