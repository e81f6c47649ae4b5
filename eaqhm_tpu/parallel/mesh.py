"""Device mesh construction for corpus-scale runs.

The reference is strictly single-process (SURVEY.md §2.2); the TPU-native
scaling model is: utterance batches data-parallel over mesh axis 'data',
frame/solve work sharded over axis 'model' within each utterance, SRER and
convergence statistics reduced with XLA collectives over ICI (no hand-written
transport — jax.sharding + jit insert the collectives).
"""
from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "model")


def make_mesh(n_devices: int | None = None, model_parallel: int | None = None
              ) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    model_parallel defaults to 2 when the device count is even, else 1.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if model_parallel is None:
        model_parallel = 2 if n % 2 == 0 and n >= 2 else 1
    data = n // model_parallel
    arr = np.array(devs[:data * model_parallel]).reshape(data, model_parallel)
    return Mesh(arr, AXES)


def data_sharding(mesh: Mesh, *trailing) -> NamedSharding:
    """Batch-of-utterances sharding: leading axis over 'data'."""
    return NamedSharding(mesh, P("data", *trailing))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """[batch, frame, ...] sharding: batch over 'data', frames over 'model'."""
    return NamedSharding(mesh, P("data", "model"))


def multihost_init(required: bool = False) -> bool:
    """Initialize multi-host JAX; returns True when a cluster was joined.

    On a real pod slice this is `jax.distributed.initialize()`; corpora are
    sharded host-locally and cross-host stats ride DCN collectives.

    Failure policy: a genuine initialization error (coordinator configured
    via env/TPU metadata but unreachable, version mismatch, ...) RAISES —
    silently proceeding single-host would double-process the corpus stride.
    Only the benign "no cluster configured at all" case degrades to
    single-host (unless required=True).
    """
    if jax.process_count() > 1:
        return True           # already initialized
    configured = required or any(
        k in os.environ for k in (
            "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
            "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"))
    try:
        jax.distributed.initialize()
        return True
    except Exception as e:  # noqa: BLE001 — classified below
        if configured:
            raise RuntimeError(
                "multi-host init failed with a coordinator configured — "
                "refusing to silently fall back to single-host (corpus "
                f"striding would be wrong): {type(e).__name__}: {e}") from e
        return False          # no cluster anywhere: benign single-host
