"""Process-wide serving mesh: multi-chip data-parallel inference.

This wires `parallel/mesh.py` + `parallel/encode.py` into the PRODUCT
serving path (VERDICT r2 item 2): when the process sees more than one
accelerator chip, every loaded `EmbeddingModel` places its params over a
(dp, tp) `jax.sharding.Mesh` and batch-shards encode inputs across dp, so
`vectorise()` / `add_documents` / `search` transparently use the whole
slice. This replaces the reference's single-device torch encode loop
(s2_inference.py:123-158) with XLA-partitioned batches over ICI
(SURVEY.md §2.3 D2/D7).

Activation:
  - auto: >1 device on a non-cpu platform;
  - MARQO_TPU_SERVING_MESH=TRUE forces it on (tests: virtual CPU mesh);
  - MARQO_TPU_SERVING_MESH=FALSE forces single-device serving.
Mesh shape comes from MARQO_TPU_MESH_SHAPE ("dp,tp"), default all-dp.
"""

import threading
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from marqo_tpu.api import configs
from marqo_tpu.logging import get_logger
from marqo_tpu.parallel.mesh import AXIS_DP, create_mesh, encoder_param_specs

logger = get_logger(__name__)

_mesh_lock = threading.Lock()
_mesh: Optional[Mesh] = None
_mesh_resolved = False


def serving_mesh() -> Optional[Mesh]:
    """The process-wide serving mesh, or None for single-device serving."""
    global _mesh, _mesh_resolved
    if _mesh_resolved:
        return _mesh
    with _mesh_lock:
        if _mesh_resolved:
            return _mesh
        _mesh = _build_mesh()
        _mesh_resolved = True
        return _mesh


def _build_mesh() -> Optional[Mesh]:
    forced = configs.read_env_vars_and_defaults("MARQO_TPU_SERVING_MESH")
    if forced is not None and str(forced).upper() == "FALSE":
        return None
    devices = jax.devices()
    if len(devices) < 2:
        return None
    if devices[0].platform == "cpu" and not (
            forced is not None and str(forced).upper() == "TRUE"):
        # virtual CPU devices: only shard when a test explicitly asks
        return None
    mesh = create_mesh(devices)
    logger.info(f"Serving mesh active: {dict(mesh.shape)} over "
                f"{len(devices)} {devices[0].platform} devices")
    return mesh


def reset_serving_mesh() -> None:
    """Drop the cached mesh (tests toggle MARQO_TPU_SERVING_MESH)."""
    global _mesh, _mesh_resolved
    with _mesh_lock:
        _mesh = None
        _mesh_resolved = False


def dp_size(mesh: Mesh) -> int:
    return mesh.shape[AXIS_DP]


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for encode inputs/outputs."""
    return NamedSharding(mesh, P(AXIS_DP))


def place_params(params, mesh: Mesh):
    """Place a model's param pytree on the mesh.

    BERT-family pytrees get the Megatron-style TP layout
    (mesh.encoder_param_specs); any other architecture replicates — with
    the default all-dp mesh that is exactly the right layout (pure data
    parallelism), and replication is always correct under tp because XLA
    partitions the batch-sharded activations regardless.
    """
    try:
        specs = encoder_param_specs(params)
        return jax.tree.map(
            lambda arr, spec: jax.device_put(arr, NamedSharding(mesh, spec)),
            params, specs,
            is_leaf=lambda x: not isinstance(x, dict))
    except (KeyError, TypeError, ValueError):
        replicated = NamedSharding(mesh, P())
        return jax.tree.map(lambda arr: jax.device_put(arr, replicated),
                            params)


_UNRESOLVED = object()


def model_mesh(model) -> Optional[Mesh]:
    """Resolve (and cache on the model) the serving mesh for any wrapper:
    the process mesh applies when it spans the model's device. Lets every
    model family join multi-chip serving without each __init__ knowing
    about meshes."""
    mesh = getattr(model, "_mesh", _UNRESOLVED)
    if mesh is _UNRESOLVED:
        mesh = serving_mesh()
        jdevice = getattr(model, "_jdevice", None)
        if mesh is not None and not any(d == jdevice
                                        for d in mesh.devices.flat):
            mesh = None
        try:
            model._mesh = mesh
        except AttributeError:
            pass
    return mesh


def put_params(model, params):
    """Param placement for a wrapper: sharded over the serving mesh when
    active (BERT layout where the pytree matches, replicated otherwise),
    else the model's single device."""
    mesh = model_mesh(model)
    if mesh is not None:
        return place_params(params, mesh)
    return jax.device_put(params, model._jdevice)


def round_up_to_dp(bucket: int, mesh: Optional[Mesh]) -> int:
    """Batch buckets must divide across dp. Buckets are powers of two, and
    so are real TPU dp degrees, so any bucket ≥ dp already divides; smaller
    buckets (query path, batch 1) round up to one row per chip."""
    if mesh is None:
        return bucket
    dp = dp_size(mesh)
    if bucket % dp == 0:
        return bucket
    return ((bucket + dp - 1) // dp) * dp
