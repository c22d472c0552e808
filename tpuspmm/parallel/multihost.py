"""Multi-host initialization and mesh construction.

The reference has no distributed backend at all (SURVEY.md §5 — single
process, hard-coded GPU).  On TPU pods, multi-host execution is
coordinator-based: every host runs the same program, calls
``jax.distributed.initialize``, and sees the global device set; ICI
carries intra-slice collectives and DCN the inter-slice tier, both
transparent behind the mesh.

Typical pod usage::

    from tpuspmm.parallel import multihost
    multihost.initialize()                  # env-driven (TPU pods: automatic)
    mesh = multihost.pod_mesh(("rows",))    # all global devices, 1-D
    C = spmm_row_sharded(A, B, mesh)        # same code as single-host

Under a single process (this machine, tests) ``initialize`` is a no-op and
``pod_mesh`` degrades to the local-device mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed across hosts.

    With no arguments, relies on the TPU pod environment (megascale /
    GKE metadata) the way ``jax.distributed.initialize()`` documents.
    Returns True if distributed mode is active, False when running
    single-process (arguments absent and no pod environment).
    """
    global _initialized
    import jax

    if _initialized:
        return True
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception as e:
            # Distinguishable failures (coordinator briefly unreachable on a
            # real pod) must not silently degrade to divergent per-host
            # sub-meshes — surface the reason.
            import warnings

            warnings.warn(
                f"jax.distributed.initialize() failed ({type(e).__name__}: {e}); "
                "continuing single-process. If this host is part of a pod, "
                "pass coordinator_address explicitly.")
            return False
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    _initialized = True
    return True


def pod_mesh(axis_names: Sequence[str] = ("rows",),
             shape: Optional[Tuple[int, ...]] = None):
    """Mesh over the GLOBAL device set (all hosts).

    1-D by default; pass ``shape`` for 2-D (e.g. ``(num_hosts,
    devices_per_host)`` to align the ring axis with ICI neighbours so the
    ppermute panels never cross DCN).
    """
    import jax

    from tpuspmm.parallel.mesh import make_mesh

    devices = jax.devices()  # global across processes after initialize()
    if shape is None:
        shape = (len(devices),)
    return make_mesh(shape, axis_names if len(axis_names) >= len(shape)
                     else tuple(axis_names) + ("cols",), devices=devices)


def process_info() -> dict:
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
