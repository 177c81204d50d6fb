"""Multi-host (DCN) execution: one JAX process per host, all hosts running
the same flow graph as a single global SPMD program.

The reference's distributed architecture is one OS process per block wired
by UNIX socketpairs on one machine (/root/reference/radio/core/
composite.lua:568-636, pipe.lua:59-65).  The TPU-native replacement scales
the other axis: every host runs the SAME program, the device mesh spans all
processes, and XLA moves data over ICI within a pod and DCN between hosts —
there is no bespoke wire protocol to write at all.

Ingest follows the standard pod pattern: every host reads the full input
stream from its own copy/mount of the source, keeps only the slice its
local devices own, and commits it with
``jax.make_array_from_process_local_data`` — local file reads are cheap and
replicated; only the owned bytes cross the host->device link.  Egress is
the mirror image: each host fetches only its addressable shards, so sinks
on each host receive that host's contiguous block of every chunk (per-host
output sharding).

Helpers here are pure bookkeeping over shardings; the Runner integration
lives in core/runtime.py.
"""

from __future__ import annotations

import numpy as np


def initialize(coordinator_address: str, num_processes: int,
               process_id: int):
    """Join the process group (thin wrapper over jax.distributed.initialize;
    on real pods with auto-detection the arguments may be omitted by
    calling jax.distributed.initialize() directly)."""
    import jax
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_multihost(mesh) -> bool:
    """True when ``mesh`` spans devices of more than one process."""
    if mesh is None:
        return False
    import jax
    pid = jax.process_index()
    return any(d.process_index != pid for d in np.asarray(mesh.devices).flat)


def local_slices(sharding, shape) -> tuple:
    """This process's contiguous block of a global array of ``shape`` under
    ``sharding``, as a tuple of slices (one per axis).

    Requires the process's devices to cover a contiguous hyper-rectangle —
    true for meshes built from process-ordered device lists (the default
    jax.devices() order on pods and in multi-process CPU tests)."""
    import jax
    pid = jax.process_index()
    imap = sharding.devices_indices_map(tuple(shape))
    mine = [idx for d, idx in imap.items() if d.process_index == pid]
    if not mine:
        raise ValueError("this process owns no shard of the array")
    out = []
    for ax, n in enumerate(shape):
        starts = [s[ax].start if s[ax].start is not None else 0
                  for s in mine]
        stops = [s[ax].stop if s[ax].stop is not None else n for s in mine]
        out.append(slice(min(starts), max(stops)))
    # contiguity check: the union of my blocks must fill the bounding box
    box = int(np.prod([s.stop - s.start for s in out]))
    mine_unique = {tuple((sl.start or 0,
                          sl.stop if sl.stop is not None else n)
                         for sl, n in zip(idx, shape)) for idx in mine}
    covered = 0
    for idx in mine_unique:
        covered += int(np.prod([hi - lo for lo, hi in idx]))
    if covered != box:
        raise ValueError(
            "process's shards are not a contiguous block under this "
            "sharding; build the mesh from process-ordered devices")
    return tuple(out)


def local_block(arr):
    """Fetch this process's contiguous block of a global jax.Array.

    Returns (ndarray, last_axis_start): the assembled local block and the
    global index its LAST axis starts at (for translating global
    valid-sample counts to local ones at EOF)."""
    sls = local_slices(arr.sharding, arr.shape)
    base = tuple(s.start for s in sls)
    out = np.empty(tuple(s.stop - s.start for s in sls), dtype=arr.dtype)
    for sh in arr.addressable_shards:
        dst = tuple(
            slice((sl.start if sl.start is not None else 0) - b,
                  (sl.stop if sl.stop is not None else n) - b)
            for sl, b, n in zip(sh.index, base, arr.shape))
        out[dst] = np.asarray(sh.data)
    return out, base[-1]


def from_local(sharding, local_block_arr):
    """Commit this process's local block as its part of a global array."""
    import jax
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_block_arr))


def replicate(mesh, arr):
    """A fully-replicated global array over ``mesh`` from an identical
    per-process host array (device-resident ingest rings: every host
    decoded the same file — the replicated-read side of the standard pod
    ingest pattern).  Works on process-spanning meshes, where a plain
    device_put of host data cannot."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec
    sh = NamedSharding(mesh, PartitionSpec())
    if not is_multihost(mesh):
        # accepts device arrays too: stays device-to-device, no host trip
        return jax.device_put(arr, sh)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])


__all__ = ["initialize", "is_multihost", "local_slices", "local_block",
           "from_local", "replicate"]
