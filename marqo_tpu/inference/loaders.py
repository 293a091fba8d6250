"""Embedding-model classes: the JAX replacements for the reference's torch
model wrappers (clip_utils.py / hugging_face_model.py / sbert_utils.py /
random_utils.py / no_model_utils.py).

Every model exposes:
  load()                       — materialize params on the target device
  encode(contents, normalize)  — list of content → (n, dims) float32 numpy
  memory_bytes()               — HBM footprint for cache eviction
"""

import hashlib
import os
from abc import ABC, abstractmethod
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from marqo_tpu.core.exceptions import (InvalidArgumentError, ModelLoadError,
                                       VectoriseError)
from marqo_tpu.inference.batching import pick_batch_bucket, pick_seq_bucket
from marqo_tpu.inference.types import Device, Modality
from marqo_tpu.logging import get_logger
from marqo_tpu.models.bert import (TextEncoderConfig, config_from_hf,
                                   encode_tokens_jit, init_params,
                                   params_from_torch_state_dict)
from marqo_tpu.models.tokenizer import TextTokenizer

logger = get_logger(__name__)


def _jax_device(device: Device):
    platform = "cpu" if device == Device.CPU else None
    try:
        if platform is None:
            return jax.devices()[0]
        return jax.devices(platform)[0]
    except RuntimeError:
        return jax.devices()[0]


class EmbeddingModel(ABC):
    """Base model wrapper (role of reference AbstractEmbeddingModel,
    core/inference/embedding_models/abstract_embedding_model.py)."""

    def __init__(self, model_name: str, properties: dict, device: Device,
                 model_auth: Optional[Any] = None):
        self.model_name = model_name
        self.properties = dict(properties or {})
        self.device = device
        self.model_auth = model_auth
        self.loaded = False

    @property
    def dimensions(self) -> int:
        return int(self.properties.get("dimensions", 0))

    @abstractmethod
    def load(self) -> None:
        ...

    @abstractmethod
    def encode(self, contents: List[Any], normalize: bool = True,
               modality: Modality = Modality.TEXT) -> np.ndarray:
        ...

    def encode_async(self, contents: List[Any], normalize: bool = True,
                     modality: Modality = Modality.TEXT):
        """Dispatch the encode now; return ``resolve() -> np.ndarray``.

        Callers that interleave host work (the next sub-batch's
        tokenization, the engine feed) between dispatch and resolve hide
        device compute + the host-device fetch behind it (the ingest
        pipeline, core/add_documents.py). Default: synchronous — model
        families without a deferred-fetch path compute eagerly and resolve
        returns the stored result."""
        result = self.encode(contents, normalize=normalize, modality=modality)
        return lambda: result

    def memory_bytes(self) -> int:
        return 0


class JaxHFTextModel(EmbeddingModel):
    """BERT/RoBERTa-family text encoder on TPU (replaces reference
    HuggingFaceModel, hugging_face_model.py:24, and SBERT wrapper).

    Checkpoint sources, in order:
      1. ``model_properties["localpath"]`` — local HF-format directory
      2. the HF hub via transformers (when cached / network available)
      3. deterministic random-init when ``model_properties["random_init"]``
         is set (test/bench mode: identical compute graph, synthetic weights)
    """

    compute_dtype = jnp.bfloat16

    def __init__(self, model_name, properties, device, model_auth=None):
        super().__init__(model_name, properties, device, model_auth)
        self.config: Optional[TextEncoderConfig] = None
        self.params = None
        self.tokenizer: Optional[TextTokenizer] = None
        self._jdevice = _jax_device(device)
        self._param_bytes = 0
        # multi-chip serving (parallel/serving.py): when the process mesh
        # spans this model's device, params shard over it and encode
        # batches split across dp — vectorise()/add_documents/search get
        # the whole slice transparently (VERDICT r2 item 2)
        from marqo_tpu.parallel.serving import serving_mesh
        mesh = serving_mesh()
        self._mesh = (mesh if mesh is not None and
                      any(d == self._jdevice for d in mesh.devices.flat)
                      else None)

    def _place_params(self, params):
        """Param placement: sharded over the serving mesh, else one device."""
        if self._mesh is not None:
            from marqo_tpu.parallel.serving import place_params
            return place_params(params, self._mesh)
        return jax.device_put(params, self._jdevice)

    def _put(self, arr):
        """Input placement: batch-sharded across dp when the leading dim
        divides the mesh; replicated otherwise (odd warmup shapes)."""
        arr = jnp.asarray(arr)
        if self._mesh is not None:
            from marqo_tpu.parallel.serving import data_sharding, dp_size
            from jax.sharding import NamedSharding, PartitionSpec
            if arr.ndim >= 1 and arr.shape[0] % dp_size(self._mesh) == 0:
                return jax.device_put(arr, data_sharding(self._mesh))
            return jax.device_put(
                arr, NamedSharding(self._mesh, PartitionSpec()))
        return jax.device_put(arr, self._jdevice)

    # --- loading ---------------------------------------------------------

    def _hf_repo(self) -> str:
        return self.properties.get("name", self.model_name)

    def load(self) -> None:
        # validate custom model_properties through the reference-shaped
        # schema (hf_model_properties.py); resolves pooling inference and
        # camelCase aliases, and rejects url+model_location conflicts
        if self.properties.get("type") in ("hf", "hf_stella"):
            import pydantic

            from marqo_tpu.exceptions import InvalidArgumentError
            from marqo_tpu.inference.hf_model_properties import \
                HuggingFaceModelProperties
            try:
                validated = HuggingFaceModelProperties(**self.properties)
            except pydantic.ValidationError as e:
                raise InvalidArgumentError(
                    f"Invalid model_properties for model "
                    f"`{self.model_name}`: {e}") from e
            if "pooling_method" not in self.properties and \
                    "poolingMethod" not in self.properties:
                self.properties["pooling_method"] = \
                    validated.pooling_method.value
        max_len = int(self.properties.get("tokens", 128))
        localpath = self.properties.get("localpath")
        location = self.properties.get("model_location")
        if location and not localpath:
            # private checkpoint via s3/HF auth (reference ModelLocation)
            from marqo_tpu.inference.model_download import (
                auth_for_location, download_model)
            localpath = download_model(
                repo_location=location,
                auth=auth_for_location(location, self.model_auth))
        elif self.properties.get("url") and not localpath:
            # public checkpoint URL (reference custom-model "url" flow,
            # model_download.py:102-140; zips extract to a directory)
            from marqo_tpu.inference.model_download import \
                download_pretrained_from_url
            localpath = download_pretrained_from_url(self.properties["url"])
        if localpath:
            self._load_from_dir(localpath, max_len)
        elif self.properties.get("random_init"):
            self._load_random_init(max_len)
        else:
            try:
                self._load_from_hub(self._hf_repo(), max_len)
            except Exception as e:
                raise ModelLoadError(
                    f"Could not load model `{self.model_name}` from "
                    f"`{self._hf_repo()}`: {e}. If running offline, provide "
                    f"model_properties.localpath or a model_location.",
                    cause=e)
        self.loaded = True
        self._param_bytes = sum(
            a.size * a.dtype.itemsize for a in jax.tree.leaves(self.params))

    def _pooling(self) -> str:
        return str(self.properties.get("pooling_method", "mean")).lower()

    def _load_from_dir(self, path: str, max_len: int) -> None:
        from transformers import AutoConfig
        hf_cfg = AutoConfig.from_pretrained(path)
        self.config = self._finalize_config(config_from_hf(hf_cfg))
        state_dict = _load_state_dict(path)
        self.params = self._place_params(self._maybe_quantize(
            params_from_torch_state_dict(state_dict, self.config,
                                         dtype=self.compute_dtype)))
        self.tokenizer = TextTokenizer.from_pretrained(path, max_length=max_len)

    def _load_from_hub(self, repo: str, max_len: int) -> None:
        from transformers import AutoConfig, AutoModel
        hf_cfg = AutoConfig.from_pretrained(repo)
        self.config = self._finalize_config(config_from_hf(hf_cfg))
        cached = _load_param_cache(repo, self.config)
        if cached is not None:
            params = cached
        else:
            torch_model = AutoModel.from_pretrained(repo)
            params = params_from_torch_state_dict(
                torch_model.state_dict(), self.config,
                dtype=self.compute_dtype)
            del torch_model
            _save_param_cache(repo, self.config, params)
        self.params = self._place_params(self._maybe_quantize(params))
        self.tokenizer = TextTokenizer.from_pretrained(repo, max_length=max_len)

    def _load_random_init(self, max_len: int) -> None:
        """Deterministic synthetic weights with the real architecture."""
        arch = self.properties.get("architecture", {})
        self.config = self._finalize_config(TextEncoderConfig(
            vocab_size=int(arch.get("vocab_size", 30522)),
            hidden_size=int(arch.get("hidden_size", 768)),
            num_layers=int(arch.get("num_layers", 12)),
            num_heads=int(arch.get("num_heads", 12)),
            intermediate_size=int(arch.get("intermediate_size", 3072)),
        ))
        seed = int.from_bytes(
            hashlib.sha256(self.model_name.encode()).digest()[:4], "little")
        params = self._maybe_quantize(
            init_params(self.config, jax.random.PRNGKey(seed),
                        dtype=self.compute_dtype))
        self.params = self._place_params(params)
        self.tokenizer = TextTokenizer.build_test_wordpiece(max_length=max_len)

    def _finalize_config(self, config: TextEncoderConfig) -> TextEncoderConfig:
        from dataclasses import replace
        return replace(config, pooling=self._pooling(), normalize=False,
                       quantize=self._use_quantization())

    def _use_quantization(self) -> bool:
        """int8 W8A8 opt-in: model_properties.quantize or
        MARQO_TPU_QUANTIZE=int8 (ops/quant.py; ~0.99+ cosine vs fp)."""
        if "quantize" in self.properties:
            return bool(self.properties["quantize"])
        from marqo_tpu.api import configs
        return str(configs.read_env_vars_and_defaults("MARQO_TPU_QUANTIZE")
                   or "").lower() == "int8"

    def _maybe_quantize(self, params: dict) -> dict:
        if self.config is not None and self.config.quantize:
            from marqo_tpu.models.bert import quantize_encoder_params
            return quantize_encoder_params(params)
        return params

    # --- encoding --------------------------------------------------------

    # pack when real tokens fill less than this fraction of the padded grid
    PACKING_THRESHOLD = 0.75

    def encode(self, contents: List[Any], normalize: bool = True,
               modality: Modality = Modality.TEXT) -> np.ndarray:
        return self.encode_async(contents, normalize=normalize,
                                 modality=modality)()

    def encode_async(self, contents: List[Any], normalize: bool = True,
                     modality: Modality = Modality.TEXT):
        """Tokenize + dispatch NOW; the returned ``resolve()`` performs the
        one batched device fetch (+ normalize). Dispatch is eager on this
        backend, so host work done between dispatch and resolve — the next
        sub-batch's tokenization, the engine feed — overlaps both device
        compute and the ~35-40 ms tunnel fetch (BENCH_NOTES round-3
        ceiling analysis; VERDICT r3 item 2)."""
        if modality != Modality.TEXT:
            raise VectoriseError(
                f"Model `{self.model_name}` only supports text content")
        texts = [c if isinstance(c, str) else str(c) for c in contents]
        if not texts:
            empty = np.zeros((0, self.dimensions or self.config.hidden_size),
                             dtype=np.float32)
            return lambda: empty
        # Chunk-first pipeline: tokenize chunk i+1 WHILE the device runs
        # chunk i (dispatch is eager on this backend — measured: a fetch
        # after host work returns in one roundtrip, the compute already
        # done), then drain all fetches. Tokenization is the top host cost
        # of ingest on 1-core hosts; this hides most of it.
        from marqo_tpu.inference.batching import batch_buckets
        max_seqs = batch_buckets()[-1]
        pending = []  # (device_array, n_valid)
        for start in range(0, len(texts), max_seqs):
            chunk = texts[start:start + max_seqs]
            batch = self.tokenizer.encode_batch(chunk)
            seq_bucket = pick_seq_bucket(
                min(max(batch["lengths"]), self.tokenizer.max_length))
            width = batch["input_ids"].shape[1]
            if width < seq_bucket:
                pad = seq_bucket - width
                batch["input_ids"] = np.pad(
                    batch["input_ids"], ((0, 0), (0, pad)),
                    constant_values=self.tokenizer.pad_id)
                batch["attention_mask"] = np.pad(
                    batch["attention_mask"], ((0, 0), (0, pad)))
            elif width > seq_bucket:  # can't happen (bucket ≥ max length)
                batch["input_ids"] = batch["input_ids"][:, :seq_bucket]
                batch["attention_mask"] = \
                    batch["attention_mask"][:, :seq_bucket]
            n = len(chunk)
            density = sum(batch["lengths"]) / (n * seq_bucket)
            if n > 1 and density < self.PACKING_THRESHOLD:
                pending.extend(self._dispatch_packed(batch, seq_bucket))
            else:
                pending.extend(self._dispatch_padded(batch, seq_bucket, n))
        def resolve() -> np.ndarray:
            # ONE batched fetch for all pending device arrays: each separate
            # np.asarray pays the fixed tunnel roundtrip (~19ms extra per
            # array measured); jax.device_get amortizes it
            fetched = jax.device_get([emb for emb, _ in pending])
            result = np.concatenate(
                [arr[:size] for arr, (_, size) in zip(fetched, pending)],
                axis=0)
            if normalize:
                norms = np.linalg.norm(result, axis=-1, keepdims=True)
                result = result / np.maximum(norms, 1e-12)
            return result.astype(np.float32)

        return resolve

    def _dispatch_padded(self, batch, seq_bucket: int, n: int):
        """Dispatch padded device batches WITHOUT fetching; encode() drains
        all fetches after all dispatches (fetches serialize on the slow
        host-device link, and dispatch is eager, so later host work —
        tokenization of the next chunk — overlaps device compute)."""
        from marqo_tpu.parallel.serving import round_up_to_dp
        batch_bucket = round_up_to_dp(pick_batch_bucket(n), self._mesh)
        pending = []
        start = 0
        while start < n:
            size = min(batch_bucket, n - start)
            ids = np.zeros((batch_bucket, seq_bucket), dtype=np.int32)
            mask = np.zeros((batch_bucket, seq_bucket), dtype=np.int32)
            ids[:size] = batch["input_ids"][start:start + size]
            mask[:size] = batch["attention_mask"][start:start + size]
            # pad rows must still be valid: give them one real token so
            # mean-pool denominators never hit zero
            mask[size:, 0] = 1
            pending.append((self._forward(ids, mask), size))
            start += size
        return pending

    def _forward(self, ids: np.ndarray, mask: np.ndarray):
        """One padded device batch → pooled embeddings (overridden by
        architectures with their own forward, e.g. stella)."""
        return encode_tokens_jit(
            self.params, self._put(ids), self._put(mask),
            self.config, compute_dtype=self.compute_dtype)

    def _dispatch_packed(self, batch, seq_bucket: int):
        """Sequence-packed dispatch (ops/packing.py): ~1/density fewer rows
        through the MXU at identical numerics. Returns (device_array,
        n_sequences) pairs WITHOUT fetching — see _dispatch_padded. The
        sequence COUNT per packed call must fit the segment-sum bucket, so
        oversized inputs are chunked here too (defensive; encode() already
        chunks to the top batch bucket)."""
        from marqo_tpu.inference.batching import batch_buckets, row_buckets
        from marqo_tpu.models.bert import encode_tokens_packed_jit
        from marqo_tpu.ops.packing import pack_sequences

        ids, lengths = batch["input_ids"], batch["lengths"]
        # numpy row views, not python lists — pack_sequences is
        # array-agnostic and the 512 tolist() calls cost ~12ms/batch
        sequences = [ids[i, :lengths[i]] for i in range(len(lengths))]
        max_seqs = batch_buckets()[-1]
        pending = []
        for start in range(0, len(sequences), max_seqs):
            chunk = sequences[start:start + max_seqs]
            from marqo_tpu.parallel.serving import round_up_to_dp
            # under a serving mesh, packed rows + pooled outputs must split
            # across dp, so both ladders round up to dp multiples
            ladder = [round_up_to_dp(b, self._mesh) for b in row_buckets()]
            packed = pack_sequences(chunk, seq_len=seq_bucket,
                                    pad_id=self.tokenizer.pad_id,
                                    row_buckets=ladder)
            n_bucket = round_up_to_dp(pick_batch_bucket(packed.n_sequences),
                                      self._mesh)
            emb = encode_tokens_packed_jit(
                self.params,
                self._put(packed.input_ids),
                self._put(packed.segment_ids),
                self._put(packed.positions),
                self._put(packed.seq_index),
                n_bucket, self.config, compute_dtype=self.compute_dtype)
            pending.append((emb, packed.n_sequences))
        return pending

    def memory_bytes(self) -> int:
        return self._param_bytes

    def warmup(self, shapes: Optional[List[List[int]]] = None) -> int:
        """Pre-compile the hot (batch, seq) buckets so serving latency never
        pays a first-hit XLA compile (reference CacheModels runs timed
        warmup vectorise at startup, on_start_script.py:124-195; on TPU the
        compile cache is the thing to warm). Returns #shapes compiled."""
        if shapes is None:
            from marqo_tpu.api import configs
            raw = configs.read_env_vars_and_defaults("MARQO_TPU_WARMUP_SHAPES")
            if raw:
                import json as _json
                shapes = _json.loads(raw) if isinstance(raw, str) else raw
            else:
                # query path (batch 1, all seq buckets) + the ingest shape
                from marqo_tpu.inference.batching import seq_buckets
                shapes = [[1, s] for s in seq_buckets()[:4]] + [[256, 128]]
        count = 0
        for batch, seq in shapes:
            seq = min(seq, self.tokenizer.max_length)
            ids = np.zeros((batch, seq), dtype=np.int32)
            mask = np.ones((batch, seq), dtype=np.int32)
            out = self._forward(ids, mask)  # subclass-correct graph
            np.asarray(out[:1, :1])  # force compile+execute
            count += 1
        return count


class JaxStellaModel(JaxHFTextModel):
    """Stella (GTE-v1.5 "NewModel" arch) text encoder — reference type
    `hf_stella` (HuggingFaceStellaModel, trust_remote_code). The JAX arch
    lives in models/stella.py; weights load from a local checkpoint dir
    (`model_properties.localpath`, remote code can't be fetched offline)
    or random-init for tests. Packing is disabled: RoPE + the projection
    head use the plain padded path."""

    PACKING_THRESHOLD = -1.0  # never pack

    def load(self) -> None:
        from marqo_tpu.models.stella import (StellaConfig, init_params,
                                             params_from_torch_state_dict,
                                             stella_400m_config)
        max_len = int(self.properties.get("tokens", 512))
        arch = self.properties.get("architecture", {})
        proj = int(self.properties.get("dimensions", 1024))
        if arch:
            self.config = StellaConfig(
                vocab_size=int(arch.get("vocab_size", 30528)),
                hidden_size=int(arch.get("hidden_size", 1024)),
                num_layers=int(arch.get("num_layers", 24)),
                num_heads=int(arch.get("num_heads", 16)),
                intermediate_size=int(arch.get("intermediate_size", 4096)),
                rope_theta=float(arch.get("rope_theta", 160000.0)),
                projection_dim=proj, normalize=False)
        else:
            from dataclasses import replace
            self.config = replace(stella_400m_config(proj), normalize=False)
        localpath = self.properties.get("localpath")
        if localpath:
            state_dict = _load_state_dict(localpath)
            head = None
            import os as _os
            head_path = _os.path.join(localpath, f"2_Dense_{proj}")
            if _os.path.isdir(head_path):
                head_sd = _load_state_dict(head_path)
                head = {"weight": head_sd.get("linear.weight",
                                              head_sd.get("weight")),
                        "bias": head_sd.get("linear.bias",
                                            head_sd.get("bias"))}
            self.params = self._place_params(
                params_from_torch_state_dict(state_dict, self.config,
                                             dtype=self.compute_dtype,
                                             vector_linear=head))
            self.tokenizer = TextTokenizer.from_pretrained(
                localpath, max_length=max_len)
        elif self.properties.get("random_init"):
            seed = int.from_bytes(
                hashlib.sha256(self.model_name.encode()).digest()[:4],
                "little")
            self.params = self._place_params(
                init_params(self.config, jax.random.PRNGKey(seed),
                            dtype=self.compute_dtype))
            self.tokenizer = TextTokenizer.build_test_wordpiece(
                max_length=max_len)
        else:
            raise ModelLoadError(
                f"Stella model `{self.model_name}` needs its checkpoint on "
                "disk: the architecture ships as hub remote code, which "
                "cannot be fetched in this offline environment. Provide "
                "model_properties.localpath (HF checkpoint directory, "
                "optionally with the 2_Dense_<dims> head).")
        self.loaded = True
        self._param_bytes = sum(
            a.size * a.dtype.itemsize for a in jax.tree.leaves(self.params))

    def _forward(self, ids, mask):
        from marqo_tpu.models.stella import encode_tokens_jit as stella_jit
        return stella_jit(
            self.params, self._put(ids), self._put(mask),
            self.config, compute_dtype=self.compute_dtype)


class TestModel(JaxHFTextModel):
    """Tiny real JAX encoder for orchestration tests (reference ships
    `test`/sbert-test, model_registry.py:976): full TPU compute path,
    milliseconds to load."""

    def load(self) -> None:
        self.properties.setdefault("random_init", True)
        self.properties.setdefault("architecture", {
            "vocab_size": 128, "hidden_size": 16, "num_layers": 2,
            "num_heads": 2, "intermediate_size": 32,
        })
        self.properties.setdefault("dimensions", 16)
        super().load()


class RandomModel(EmbeddingModel):
    """Deterministic content-hash random vectors (reference
    s2_inference/random_utils.py): same content → same vector, no device work.
    """

    def load(self) -> None:
        self.loaded = True

    def encode(self, contents: List[Any], normalize: bool = True,
               modality: Modality = Modality.TEXT) -> np.ndarray:
        dims = self.dimensions or 384
        out = np.zeros((len(contents), dims), dtype=np.float32)
        for i, content in enumerate(contents):
            key = hashlib.sha256(
                repr(content).encode("utf-8", "ignore")).digest()
            seed = int.from_bytes(key[:8], "little") % (2 ** 31)
            rng = np.random.default_rng(seed)
            vec = rng.standard_normal(dims).astype(np.float32)
            out[i] = vec
        if normalize:
            out /= np.maximum(np.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        return out


class NoModel(EmbeddingModel):
    """Storage-only indexes / custom vectors (reference no_model_utils.py:
    vectorise must never be called)."""

    def load(self) -> None:
        self.loaded = True

    def encode(self, contents, normalize=True, modality=Modality.TEXT):
        raise VectoriseError(
            "Cannot vectorise anything with 'no_model'. This model is "
            "intended for adding documents and searching with custom vectors "
            "only. If vectorisation is needed, please use a different model ")


def _param_cache_path(repo: str, config) -> str:
    """Converted-checkpoint disk cache (role of the reference's on-disk
    ModelCache, core/inference/model_download.py): one .npz of the JAX
    pytree per (repo, architecture) so reloads skip torch conversion."""
    from marqo_tpu.inference.model_download import CACHE_DIR
    key = hashlib.sha256(
        f"{repo}|{config.hidden_size}|{config.num_layers}".encode()
    ).hexdigest()[:16]
    return os.path.join(CACHE_DIR, "jax_params", f"{key}.npz")


def _save_param_cache(repo: str, config, params: dict) -> None:
    try:
        path = _param_cache_path(repo, config)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        flat = {}
        for key, value in params["embeddings"].items():
            flat[f"embeddings.{key}"] = np.asarray(value)
        for key, value in params["layers"].items():
            flat[f"layers.{key}"] = np.asarray(value)
        np.savez(path + ".tmp.npz", **flat)
        os.replace(path + ".tmp.npz", path)
    except Exception as e:
        logger.warning(f"Could not write param cache for {repo}: {e}")


def _load_param_cache(repo: str, config) -> Optional[dict]:
    path = _param_cache_path(repo, config)
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as data:
            params = {"embeddings": {}, "layers": {}}
            for key in data.files:
                section, name = key.split(".", 1)
                params[section][name] = jnp.asarray(data[key])
        logger.info(f"Loaded converted params for {repo} from disk cache")
        return params
    except Exception as e:
        logger.warning(f"Corrupt param cache for {repo} ({e}); reconverting")
        return None


def _load_state_dict(path: str) -> dict:
    """Load torch weights from an HF-format directory (.safetensors or .bin)."""
    st_path = os.path.join(path, "model.safetensors")
    if os.path.isfile(st_path):
        from safetensors.torch import load_file
        return load_file(st_path)
    bin_path = os.path.join(path, "pytorch_model.bin")
    if os.path.isfile(bin_path):
        from marqo_tpu.inference.checkpoint_load import load_torch_checkpoint
        return load_torch_checkpoint(bin_path, family="hf")
    raise ModelLoadError(f"No model weights found under `{path}`")


def resolve_model_class(model_name: str, properties: dict):
    """Dispatch a registry entry to its model class WITHOUT loading
    weights (reference model_registry.py:2133-2145
    _get_model_load_mappings). Raises ModelLoadError for honestly-gated
    architectures (EVA02, NLLB-SigLIP) and InvalidArgumentError for
    unknown types — every registry entry must resolve to exactly one of
    these three outcomes (tested over the full registry)."""
    model_type = str(properties.get("type", "hf")).lower()
    if model_type == "hf_stella":
        cls = JaxStellaModel
    elif model_type in ("hf", "sbert"):
        cls = JaxHFTextModel
    elif model_type == "multilingual_clip":
        # M-CLIP: XLM-R text tower + linear projection, paired with an
        # openai CLIP image tower (models/hf_clip.py)
        from marqo_tpu.models.hf_clip import JaxHFCLIPModel
        cls = JaxHFCLIPModel
    elif model_type in ("clip", "open_clip", "fp16_clip"):
        name = str(properties.get("name", model_name))
        if "coca_" in name.lower():
            # CoCa checkpoints carry a different text tower (appended CLS),
            # an attentional pooler, and the caption decoder (models/coca.py)
            from marqo_tpu.models.coca import JaxCoCaModel
            cls = JaxCoCaModel
        elif "nllb" in name.lower():
            # M2M-100 text tower (transformers-verified math) + SigLIP
            # trunk; real open_clip checkpoints load behind
            # MARQO_ALLOW_UNVERIFIED_CONVERSION (models/nllb_siglip.py)
            from marqo_tpu.models.nllb_siglip import JaxNLLBSigLIPModel
            cls = JaxNLLBSigLIPModel
        elif "siglip" in name.lower():
            # SigLIP: timm vision trunk (no class token, latent attention
            # pool) + non-causal last-token text tower (models/siglip.py)
            from marqo_tpu.models.siglip import JaxSigLIPModel
            cls = JaxSigLIPModel
        elif any(t in name for t in ("RN50", "RN101")):
            # ResNet-CLIP: ModifiedResNet vision tower (attention-pool 2d
            # head, avgpool downsampling) — models/resnet_clip.py
            from marqo_tpu.models.resnet_clip import JaxResNetCLIPModel
            cls = JaxResNetCLIPModel
        elif "convnext" in name.lower():
            # ConvNeXt-CLIP: timm ConvNeXt trunk + avg-pool/linear head —
            # models/convnext_clip.py
            from marqo_tpu.models.convnext_clip import JaxConvNextCLIPModel
            cls = JaxConvNextCLIPModel
        elif "roberta" in name.lower():
            # roberta/xlm-roberta text tower + ViT composites
            # (open_clip custom-text models) — models/hf_clip.py
            from marqo_tpu.models.hf_clip import JaxHFCLIPModel
            cls = JaxHFCLIPModel
        elif "eva02" in name.lower():
            # RoPE + SwiGLU vision trunk (torch-mirror-verified math) +
            # CLIP text tower; real checkpoints load behind
            # MARQO_ALLOW_UNVERIFIED_CONVERSION (models/eva02.py)
            from marqo_tpu.models.eva02 import JaxEVA02Model
            cls = JaxEVA02Model
        else:
            from marqo_tpu.models.clip import JaxCLIPModel
            cls = JaxCLIPModel
    elif model_type == "languagebind":
        from marqo_tpu.models.languagebind import JaxLanguageBindModel
        cls = JaxLanguageBindModel
    elif model_type == "random":
        cls = RandomModel
    elif model_type == "test":
        cls = TestModel
    elif model_type == "no_model":
        cls = NoModel
    else:
        raise InvalidArgumentError(
            f"Unknown model type `{model_type}` for model `{model_name}`")
    return cls


def load_model(model_name: str, properties: dict, device: Device,
               model_auth=None) -> EmbeddingModel:
    """Resolve + construct + load (weights on device)."""
    cls = resolve_model_class(model_name, properties)
    model = cls(model_name, properties, device, model_auth)
    model.load()
    return model
