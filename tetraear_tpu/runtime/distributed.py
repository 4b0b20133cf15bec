"""Multi-host (DCN) initialization and the pod-scale mesh story.

Single-host multi-chip needs nothing from this module: ``jax.devices()``
already sees every chip on the host and ICI carries all collectives
(runtime.sharding).  Crossing hosts (BASELINE configs 4-5, e.g. a
v5e-16 pod slice) additionally needs the JAX distributed runtime so all
processes agree on the global device set; this module wraps that
initialization and documents how the TETRA mesh maps onto ICI vs DCN.

DCN story (how the sharded demod scales across hosts)
-----------------------------------------------------
The mesh axes are ``carrier`` x ``time`` (runtime.sharding.make_mesh):

  * The **carrier** axis is communication-free — each device owns a
    carrier slice end to end.  Lay it along DCN (outer mesh dimension,
    i.e. across hosts): zero cross-host traffic in steady state.
  * The **time** axis exchanges one overlap-save halo per segment with
    the left neighbour (``ppermute``) — keep it *inside* a host/slice so
    halos ride ICI.  ``make_host_mesh`` below builds exactly this
    layout: mesh shape (n_hosts * c_per_host, t_local) with the time
    axis mapped to intra-host device order.
  * The only cross-host collective left is the scalar ``psum`` of sync/
    CRC statistics — latency-insensitive.

Host IQ ingestion shards naturally: each host reads (or receives from
its SDR front-ends) only the band slice its carriers need, so input
bandwidth also scales with hosts.

Environment contract (mirrors jax.distributed defaults): set
``TETRAEAR_COORDINATOR`` (host:port of process 0),
``TETRAEAR_NUM_PROCESSES`` and ``TETRAEAR_PROCESS_ID`` — or rely on the
TPU pod auto-detection built into jax.distributed.initialize (no env
needed on Cloud TPU).
"""

from __future__ import annotations

import logging
import os

import numpy as np

logger = logging.getLogger(__name__)

_initialized = False


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize the JAX distributed runtime for multi-host meshes.

    Arguments default to the TETRAEAR_* environment variables; with none
    set (and not on an auto-detectable TPU pod), this is a no-op and the
    process stays single-host.  Returns True when the distributed
    runtime is (already or newly) initialized.
    """
    global _initialized
    import jax

    if _initialized:
        return True
    coordinator = coordinator or os.environ.get("TETRAEAR_COORDINATOR")
    num_processes = num_processes if num_processes is not None else \
        _int_env("TETRAEAR_NUM_PROCESSES")
    process_id = process_id if process_id is not None else \
        _int_env("TETRAEAR_PROCESS_ID")

    if coordinator is None and num_processes is None:
        # Cloud TPU pods self-describe; elsewhere stay single-host.
        if os.environ.get("TPU_WORKER_HOSTNAMES") \
                and jax.default_backend() == "tpu":
            try:
                jax.distributed.initialize()
            except RuntimeError as e:
                # single-process TPU attach (e.g. a relay-backed chip)
                logger.debug("auto distributed init unavailable: %s", e)
                return False
            _initialized = True
            logger.info("jax.distributed initialized from TPU metadata: "
                        "process %d/%d", jax.process_index(),
                        jax.process_count())
            return True
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id)
    _initialized = True
    logger.info("jax.distributed initialized: process %d/%d via %s",
                jax.process_index(), jax.process_count(), coordinator)
    return True


def _int_env(name: str) -> int | None:
    v = os.environ.get(name)
    return int(v) if v else None


def make_host_mesh(carriers_per_host: int = 1):
    """Mesh laid out so the time axis stays on ICI (see module docstring).

    Devices are ordered host-major by jax.devices(); reshaping to
    (n_hosts * carriers_per_host, devices_per_host // carriers_per_host)
    puts each time row inside one host.  Works identically on a
    single-host virtual mesh (n_hosts = 1).
    """
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    n_local = max(1, len(devices) // max(1, _process_count()))
    t_local = max(1, n_local // carriers_per_host)
    n_c = len(devices) // t_local
    dev = np.asarray(devices[:n_c * t_local]).reshape(n_c, t_local)
    return Mesh(dev, axis_names=("carrier", "time"))


def _process_count() -> int:
    import jax
    try:
        return jax.process_count()
    except Exception:
        return 1
