"""LanguageBind-class multimodal model: text / image / audio / video towers
embedding into one space.

Parity: reference s2_inference/languagebind/ (~3,100 LoC vendored torch:
per-modality CLIP-ViT towers bound to one text encoder,
multimodal_model_load.py:52,204). Rebuilt as JAX towers sharing the CLIP
block machinery (models/clip.py):

  - text:  CLIP text transformer
  - image: CLIP ViT
  - audio: ViT over on-device log-mel spectrograms (ops/audio_ops.py) —
    CLAP/LanguageBind-audio shape
  - video: frame-sampled ViT, mean-pooled over frames (frames arrive from
    the ffmpeg chunker, or pre-decoded arrays)

Real LanguageBind checkpoints require hub access; offline deployments use
random-init (tests) or local converted checkpoints.
"""

import hashlib
from dataclasses import dataclass
from functools import partial
from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np

from marqo_tpu.parallel.serving import put_params

from marqo_tpu.core.exceptions import VectoriseError
from marqo_tpu.inference.types import Device, Modality
from marqo_tpu.models.clip import (CLIPTextConfig, CLIPVisionConfig,
                                   _init_blocks, _run_blocks,
                                   encode_clip_image_jit,
                                   encode_clip_text_jit, init_clip_params)
from marqo_tpu.ops.audio_ops import (N_MELS, load_wav,
                                     log_mel_spectrogram, mel_filterbank)
from marqo_tpu.ops.image_ops import CLIP_MEAN, CLIP_STD
from marqo_tpu.ops.common import layer_norm


@dataclass(frozen=True)
class AudioTowerConfig:
    n_mels: int = N_MELS
    n_frames: int = 1000  # 10 s at 10 ms hop
    patch_size: int = 16
    channels: int = 1     # LanguageBind audio ckpts patch 3-channel spectrograms
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    projection_dim: int = 768
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5

    @property
    def n_tokens(self) -> int:
        return (self.n_mels // self.patch_size) * \
            (self.n_frames // self.patch_size)


@dataclass(frozen=True)
class VideoTowerConfig:
    """LanguageBind video tower (reference languagebind/video/
    modeling_video.py): a CLIP ViT whose every encoder layer first runs
    TEMPORAL attention — tokens reshaped (B·T, N, D) → (B·N, T, D), a
    per-layer temporal position embedding added, a dedicated pre-LN
    attention over the frame axis, residual — then the standard spatial
    CLIP block. Pooled output is the per-frame CLS after post-LN, meaned
    over frames (modeling_video.py:768-771)."""
    image_size: int = 224
    patch_size: int = 14      # LanguageBind_Video is ViT-L/14
    num_frames: int = 8
    add_time_attn: bool = True
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    projection_dim: int = 768
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5


def init_video_tower(config: VideoTowerConfig, rng,
                     dtype=jnp.float32) -> dict:
    keys = jax.random.split(rng, 6)
    std = 0.02
    H, L = config.hidden_size, config.num_layers
    n_patches = (config.image_size // config.patch_size) ** 2
    params = {
        "patch_embedding": (jax.random.normal(
            keys[0], (config.patch_size ** 2 * 3, H)) * std).astype(dtype),
        "class_embedding": (jax.random.normal(keys[1], (H,)) * std).astype(dtype),
        "position_embedding": (jax.random.normal(
            keys[2], (n_patches + 1, H)) * std).astype(dtype),
        "pre_ln_scale": jnp.ones((H,), dtype),
        "pre_ln_bias": jnp.zeros((H,), dtype),
        "layers": _init_blocks(keys[3], L, H, config.intermediate_size,
                               dtype),
        "post_ln_scale": jnp.ones((H,), dtype),
        "post_ln_bias": jnp.zeros((H,), dtype),
        "projection": (jax.random.normal(
            keys[4], (H, config.projection_dim)) * std).astype(dtype),
    }
    if config.add_time_attn:
        tk = jax.random.split(keys[5], 5)

        def norm(key, shape):
            return (jax.random.normal(key, shape) * std).astype(dtype)

        params["temporal"] = {
            "embedding": (jax.random.normal(
                tk[4], (L, config.num_frames, H)) * H ** -0.5).astype(dtype),
            "q_w": norm(tk[0], (L, H, H)), "q_b": jnp.zeros((L, H), dtype),
            "k_w": norm(tk[1], (L, H, H)), "k_b": jnp.zeros((L, H), dtype),
            "v_w": norm(tk[2], (L, H, H)), "v_b": jnp.zeros((L, H), dtype),
            "o_w": norm(tk[3], (L, H, H)), "o_b": jnp.zeros((L, H), dtype),
            "ln_scale": jnp.ones((L, H), dtype),
            "ln_bias": jnp.zeros((L, H), dtype),
        }
    return params


def _attention(x, q_w, q_b, k_w, k_b, v_w, v_b, o_w, o_b, num_heads):
    """Plain multi-head self-attention on (B, S, H)."""
    B, S, H = x.shape
    D = H // num_heads

    def proj(w, b):
        return (jnp.einsum("bsh,hd->bsd", x, w) + b).reshape(
            B, S, num_heads, D).transpose(0, 2, 1, 3)

    q, k, v = proj(q_w, q_b), proj(k_w, k_b), proj(v_w, v_b)
    scale = 1.0 / jnp.sqrt(D).astype(q.dtype)
    scores = (jnp.einsum("bnsd,bntd->bnst", q, k) * scale).astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    ctx = jnp.einsum("bnst,bntd->bnsd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, H)
    return jnp.einsum("bsh,hd->bsd", ctx, o_w) + o_b


def encode_video_tower(params: dict, frames_u8: jax.Array,
                       config: VideoTowerConfig,
                       compute_dtype=jnp.bfloat16) -> jax.Array:
    """(B, T, size, size, 3) uint8 → (B, projection_dim) fp32.

    Matches the reference CLIPEncoderLayer.forward (modeling_video.py:
    191-260): per-layer temporal embedding + temporal attention over the
    frame axis, then the spatial pre-LN CLIP block; pooling is per-frame
    CLS → post-LN → mean over frames → visual projection."""
    B, T = frames_u8.shape[0], frames_u8.shape[1]
    size, patch = config.image_size, config.patch_size
    n_side = size // patch
    H, NH = config.hidden_size, config.num_heads

    x = frames_u8.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    x = x.reshape(B * T, n_side, patch, n_side, patch, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B * T, n_side * n_side,
                                              patch * patch * 3)
    x = x.astype(compute_dtype)
    x = jnp.einsum("bnp,ph->bnh", x,
                   params["patch_embedding"].astype(compute_dtype))
    cls = jnp.broadcast_to(params["class_embedding"].astype(compute_dtype),
                           (B * T, 1, H))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"].astype(compute_dtype)[None]
    x = layer_norm(x, params["pre_ln_scale"], params["pre_ln_bias"],
                   config.layer_norm_eps).astype(compute_dtype)
    N = x.shape[1]

    layers = jax.tree.map(lambda a: a.astype(compute_dtype),
                          params["layers"])
    temporal = (jax.tree.map(lambda a: a.astype(compute_dtype),
                             params["temporal"])
                if config.add_time_attn else None)

    def spatial_block(h, lp):
        from marqo_tpu.models.clip import _prenorm_block
        return _prenorm_block(h, lp, NH, config.hidden_act,
                              config.layer_norm_eps, False, None)

    def body(carry, per_layer):
        h = carry
        lp, tp = per_layer
        if tp is not None:
            # (B·T, N, D) → (B·N, T, D): attend across frames per position
            ht = h.reshape(B, T, N, H).transpose(0, 2, 1, 3).reshape(
                B * N, T, H)
            ht = ht + tp["embedding"][None, :T, :]
            residual = ht
            normed = layer_norm(ht, tp["ln_scale"], tp["ln_bias"],
                                config.layer_norm_eps)
            attn = _attention(normed, tp["q_w"], tp["q_b"], tp["k_w"],
                              tp["k_b"], tp["v_w"], tp["v_b"], tp["o_w"],
                              tp["o_b"], NH)
            ht = residual + attn
            h = ht.reshape(B, N, T, H).transpose(0, 2, 1, 3).reshape(
                B * T, N, H)
        return spatial_block(h, lp), None

    if temporal is None:
        def body_no_t(carry, lp):
            return spatial_block(carry, lp), None
        x, _ = jax.lax.scan(body_no_t, x, layers)
    else:
        x, _ = jax.lax.scan(body, x, (layers, temporal))

    pooled = layer_norm(x[:, 0], params["post_ln_scale"],
                        params["post_ln_bias"],
                        config.layer_norm_eps).astype(jnp.float32)
    pooled = pooled.reshape(B, T, H).mean(axis=1)
    return pooled @ params["projection"].astype(jnp.float32)


@partial(jax.jit, static_argnames=("config", "compute_dtype"))
def encode_video_tower_jit(params, frames_u8, config,
                           compute_dtype=jnp.bfloat16):
    return encode_video_tower(params, frames_u8, config, compute_dtype)


def params_from_languagebind_video(state_dict, config: VideoTowerConfig,
                                   dtype=jnp.float32) -> dict:
    """Convert a LanguageBindVideo state dict (HF CLIP vision naming plus
    per-layer `temporal_attn`/`temporal_layer_norm1`/`temporal_embedding`,
    reference modeling_video.py:170-190) to our video-tower pytree."""
    sd = {}
    for key, value in state_dict.items():
        for prefix in ("vision_model.", "model.vision_model."):
            if key.startswith(prefix):
                key = key[len(prefix):]
                break
        sd[key] = np.asarray(value.detach().cpu().numpy()
                             if hasattr(value, "detach") else value)
    L, H = config.num_layers, config.hidden_size

    conv = sd["embeddings.patch_embedding.weight"]
    if conv.ndim == 5:  # 3D tube conv (tube_size 1): (H, 3, 1, p, p)
        conv = conv[:, :, 0]
    patch_w = conv.transpose(2, 3, 1, 0).reshape(-1, H)

    def stack(fmt, transpose=False):
        arrs = []
        for i in range(L):
            a = sd[fmt.format(i=i)]
            arrs.append(a.T if transpose else a)
        return jnp.asarray(np.stack(arrs), dtype)

    p = "encoder.layers.{i}."
    layers = {
        "q_w": stack(p + "self_attn.q_proj.weight", True),
        "q_b": stack(p + "self_attn.q_proj.bias"),
        "k_w": stack(p + "self_attn.k_proj.weight", True),
        "k_b": stack(p + "self_attn.k_proj.bias"),
        "v_w": stack(p + "self_attn.v_proj.weight", True),
        "v_b": stack(p + "self_attn.v_proj.bias"),
        "o_w": stack(p + "self_attn.out_proj.weight", True),
        "o_b": stack(p + "self_attn.out_proj.bias"),
        "ln1_scale": stack(p + "layer_norm1.weight"),
        "ln1_bias": stack(p + "layer_norm1.bias"),
        "mlp_w1": stack(p + "mlp.fc1.weight", True),
        "mlp_b1": stack(p + "mlp.fc1.bias"),
        "mlp_w2": stack(p + "mlp.fc2.weight", True),
        "mlp_b2": stack(p + "mlp.fc2.bias"),
        "ln2_scale": stack(p + "layer_norm2.weight"),
        "ln2_bias": stack(p + "layer_norm2.bias"),
    }
    params = {
        "patch_embedding": jnp.asarray(patch_w, dtype),
        "class_embedding": jnp.asarray(
            sd["embeddings.class_embedding"].reshape(-1)[:H], dtype),
        "position_embedding": jnp.asarray(
            sd["embeddings.position_embedding.weight"], dtype),
        "pre_ln_scale": jnp.asarray(
            sd.get("pre_layrnorm.weight", sd.get("pre_layernorm.weight")),
            dtype),
        "pre_ln_bias": jnp.asarray(
            sd.get("pre_layrnorm.bias", sd.get("pre_layernorm.bias")), dtype),
        "layers": layers,
        "post_ln_scale": jnp.asarray(sd["post_layernorm.weight"], dtype),
        "post_ln_bias": jnp.asarray(sd["post_layernorm.bias"], dtype),
        "projection": jnp.asarray(
            np.asarray(state_dict["visual_projection.weight"].detach().numpy()
                       if hasattr(state_dict.get("visual_projection.weight"),
                                  "detach")
                       else state_dict["visual_projection.weight"]).T, dtype),
    }
    if config.add_time_attn:
        params["temporal"] = {
            "embedding": stack(p + "temporal_embedding")[:, 0],
            "q_w": stack(p + "temporal_attn.q_proj.weight", True),
            "q_b": stack(p + "temporal_attn.q_proj.bias"),
            "k_w": stack(p + "temporal_attn.k_proj.weight", True),
            "k_b": stack(p + "temporal_attn.k_proj.bias"),
            "v_w": stack(p + "temporal_attn.v_proj.weight", True),
            "v_b": stack(p + "temporal_attn.v_proj.bias"),
            "o_w": stack(p + "temporal_attn.out_proj.weight", True),
            "o_b": stack(p + "temporal_attn.out_proj.bias"),
            "ln_scale": stack(p + "temporal_layer_norm1.weight"),
            "ln_bias": stack(p + "temporal_layer_norm1.bias"),
        }
    return params


def init_audio_tower(config: AudioTowerConfig, rng,
                     dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    std = 0.02
    H = config.hidden_size
    return {
        "patch_embedding": (jax.random.normal(
            k1, (config.patch_size ** 2 * config.channels, H)) * std
        ).astype(dtype),
        "class_embedding": (jax.random.normal(k2, (H,)) * std).astype(dtype),
        "position_embedding": (jax.random.normal(
            k3, (config.n_tokens + 1, H)) * std).astype(dtype),
        "layers": _init_blocks(k4, config.num_layers, H,
                               config.intermediate_size, dtype),
        "post_ln_scale": jnp.ones((H,), dtype),
        "post_ln_bias": jnp.zeros((H,), dtype),
        "projection": (jax.random.normal(
            jax.random.fold_in(k4, 1),
            (H, config.projection_dim)) * std).astype(dtype),
    }


def encode_audio_tower(params: dict, logmels: jax.Array,
                       config: AudioTowerConfig,
                       compute_dtype=jnp.bfloat16) -> jax.Array:
    """(B, n_mels, n_frames) log-mel → (B, projection_dim) fp32. With
    ``channels=3`` (LanguageBind audio checkpoints treat the spectrogram as
    a 3-channel image) the mel map is repeated across channels."""
    B = logmels.shape[0]
    p = config.patch_size
    gm, gf = config.n_mels // p, config.n_frames // p
    x = logmels[:, :gm * p, :gf * p]
    x = x.reshape(B, gm, p, gf, p).transpose(0, 1, 3, 2, 4).reshape(
        B, gm * gf, p * p)
    if config.channels == 3:
        x = jnp.concatenate(
            [x.reshape(B, gm * gf, p, p, 1)] * 3, axis=-1
        ).reshape(B, gm * gf, p * p * 3)
    x = x.astype(compute_dtype)
    x = jnp.einsum("bnp,ph->bnh", x,
                   params["patch_embedding"].astype(compute_dtype))
    cls = jnp.broadcast_to(params["class_embedding"].astype(compute_dtype),
                           (B, 1, config.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"].astype(compute_dtype)[None]
    layers = jax.tree.map(lambda a: a.astype(compute_dtype), params["layers"])
    x = _run_blocks(x, layers, config.num_heads, config.hidden_act,
                    config.layer_norm_eps, causal=False)
    pooled = layer_norm(x[:, 0], params["post_ln_scale"],
                        params["post_ln_bias"],
                        config.layer_norm_eps).astype(jnp.float32)
    return pooled @ params["projection"].astype(jnp.float32)


@partial(jax.jit, static_argnames=("config", "compute_dtype"))
def encode_audio_tower_jit(params, logmels, config,
                           compute_dtype=jnp.bfloat16):
    return encode_audio_tower(params, logmels, config, compute_dtype)


class JaxLanguageBindModel:
    """Multi-tower wrapper (loader type ``languagebind``)."""

    compute_dtype = jnp.bfloat16

    def __init__(self, model_name: str, properties: dict, device: Device,
                 model_auth=None):
        self.model_name = model_name
        self.properties = dict(properties or {})
        self.device = device
        self.model_auth = model_auth
        self.loaded = False
        self.supported = set(self.properties.get(
            "supported_modalities",
            ["language", "image", "audio", "video"]))
        platform = "cpu" if device == Device.CPU else None
        try:
            self._jdevice = (jax.devices(platform)[0] if platform
                             else jax.devices()[0])
        except RuntimeError:
            self._jdevice = jax.devices()[0]
        self._param_bytes = 0

    @property
    def dimensions(self) -> int:
        return int(self.properties.get("dimensions", 768))

    def load(self) -> None:
        if self.properties.get("localpaths"):
            self._load_from_checkpoints(self.properties["localpaths"])
            return
        if not self.properties.get("random_init"):
            from marqo_tpu.core.exceptions import ModelLoadError
            raise ModelLoadError(
                f"LanguageBind checkpoints for `{self.model_name}` require "
                f"HF hub access, unavailable in this deployment. Provide "
                f"model_properties.localpaths "
                f"({{'image'|'video'|'audio': checkpoint dir}}) or "
                f"random_init for synthetic-weight mode.")
        arch = self.properties.get("architecture", {})
        proj = self.dimensions
        hidden = int(arch.get("hidden_size", 64))
        layers = int(arch.get("num_layers", 2))
        heads = int(arch.get("num_heads", 2))
        inter = int(arch.get("intermediate_size", 128))
        seed = int.from_bytes(
            hashlib.sha256(self.model_name.encode()).digest()[:4], "little")
        keys = jax.random.split(jax.random.PRNGKey(seed), 3)
        self.text_config = CLIPTextConfig(
            vocab_size=int(arch.get("vocab_size", 1024)),
            hidden_size=hidden, num_layers=layers, num_heads=heads,
            intermediate_size=inter, projection_dim=proj,
            eos_token_id=int(arch.get("vocab_size", 1024)) - 1)
        self.vision_config = CLIPVisionConfig(
            image_size=int(self.properties.get("image_size", 224)),
            patch_size=int(arch.get("patch_size", 32)),
            hidden_size=hidden, num_layers=layers, num_heads=heads,
            intermediate_size=inter, projection_dim=proj)
        self.audio_config = AudioTowerConfig(
            n_frames=int(arch.get("audio_frames", 992)),
            patch_size=int(arch.get("audio_patch", 16)),
            hidden_size=hidden, num_layers=layers, num_heads=heads,
            intermediate_size=inter, projection_dim=proj)
        clip_params = init_clip_params(self.text_config, self.vision_config,
                                       keys[0], dtype=self.compute_dtype)
        self.params = put_params(self, {
            "text": clip_params["text"],
            "vision": clip_params["vision"],
            "audio": init_audio_tower(self.audio_config, keys[1],
                                      dtype=self.compute_dtype),
        })
        self._mel_fb = jnp.asarray(mel_filterbank())
        from marqo_tpu.models.tokenizer import TextTokenizer
        self.tokenizer = TextTokenizer.build_test_wordpiece(
            max_length=self.text_config.max_positions)
        self.loaded = True
        self._param_bytes = sum(
            a.size * a.dtype.itemsize for a in jax.tree.leaves(self.params))

    def _load_from_checkpoints(self, localpaths: dict) -> None:
        """Load converted LanguageBind per-modality checkpoints (each dir is
        one vendored-model HF checkpoint: LanguageBind_Image / _Video /
        _Audio — reference multimodal_model_load.py loads the same set).
        The text tower ships inside every modality checkpoint; the first
        one provided supplies it."""
        from transformers import AutoConfig

        from marqo_tpu.inference.loaders import _load_state_dict
        from marqo_tpu.models.clip import params_from_hf_clip
        proj = self.dimensions
        params = {}
        text_loaded = False
        for modality, path in localpaths.items():
            hf_cfg = AutoConfig.from_pretrained(path)
            vision_cfg = getattr(hf_cfg, "vision_config", hf_cfg)
            text_cfg = getattr(hf_cfg, "text_config", None)
            state = _load_state_dict(path)
            if modality == "video":
                self.video_config = VideoTowerConfig(
                    image_size=vision_cfg.image_size,
                    patch_size=vision_cfg.patch_size,
                    num_frames=getattr(vision_cfg, "num_frames", 8),
                    add_time_attn=getattr(vision_cfg, "add_time_attn", True),
                    hidden_size=vision_cfg.hidden_size,
                    num_layers=vision_cfg.num_hidden_layers,
                    num_heads=vision_cfg.num_attention_heads,
                    intermediate_size=vision_cfg.intermediate_size,
                    projection_dim=proj)
                params["video"] = params_from_languagebind_video(
                    state, self.video_config, dtype=self.compute_dtype)
            elif modality == "audio":
                mels = int(getattr(vision_cfg, "num_mel_bins", 112) or 112)
                frames = int(getattr(vision_cfg, "target_length", 1008)
                             or 1008)
                self.audio_config = AudioTowerConfig(
                    n_mels=mels, n_frames=frames,
                    patch_size=vision_cfg.patch_size, channels=3,
                    hidden_size=vision_cfg.hidden_size,
                    num_layers=vision_cfg.num_hidden_layers,
                    num_heads=vision_cfg.num_attention_heads,
                    intermediate_size=vision_cfg.intermediate_size,
                    projection_dim=proj)
                # audio ckpt = CLIP-vision naming over spectrogram "images"
                audio_cfg = VideoTowerConfig(
                    image_size=vision_cfg.image_size,
                    patch_size=vision_cfg.patch_size, add_time_attn=False,
                    hidden_size=vision_cfg.hidden_size,
                    num_layers=vision_cfg.num_hidden_layers,
                    num_heads=vision_cfg.num_attention_heads,
                    intermediate_size=vision_cfg.intermediate_size,
                    projection_dim=proj)
                converted = params_from_languagebind_video(
                    state, audio_cfg, dtype=self.compute_dtype)
                converted.pop("pre_ln_scale", None)
                converted.pop("pre_ln_bias", None)
                params["audio"] = converted
            else:  # image (plain CLIP tower)
                self.vision_config = CLIPVisionConfig(
                    image_size=vision_cfg.image_size,
                    patch_size=vision_cfg.patch_size,
                    hidden_size=vision_cfg.hidden_size,
                    num_layers=vision_cfg.num_hidden_layers,
                    num_heads=vision_cfg.num_attention_heads,
                    intermediate_size=vision_cfg.intermediate_size,
                    projection_dim=proj)
            if text_cfg is not None and not text_loaded:
                self.text_config = CLIPTextConfig(
                    vocab_size=text_cfg.vocab_size,
                    hidden_size=text_cfg.hidden_size,
                    num_layers=text_cfg.num_hidden_layers,
                    num_heads=text_cfg.num_attention_heads,
                    intermediate_size=text_cfg.intermediate_size,
                    max_positions=text_cfg.max_position_embeddings,
                    projection_dim=proj,
                    eos_token_id=text_cfg.eos_token_id)
                vc = getattr(self, "vision_config", None) or CLIPVisionConfig(
                    image_size=vision_cfg.image_size,
                    patch_size=vision_cfg.patch_size,
                    hidden_size=vision_cfg.hidden_size,
                    num_layers=vision_cfg.num_hidden_layers,
                    num_heads=vision_cfg.num_attention_heads,
                    intermediate_size=vision_cfg.intermediate_size,
                    projection_dim=proj)
                if modality == "image":
                    both = params_from_hf_clip(state, self.text_config, vc,
                                               dtype=self.compute_dtype)
                    params["text"] = both["text"]
                    params["vision"] = both["vision"]
                else:  # text tower only from an a/v checkpoint
                    text_only = {k: v for k, v in state.items()
                                 if k.startswith(("text_model.",
                                                  "text_projection."))}
                    both = params_from_hf_clip(
                        {**text_only,
                         # satisfy the converter's vision keys with the
                         # checkpoint's own vision tower
                         **{k: v for k, v in state.items()
                            if k.startswith(("vision_model.",
                                             "visual_projection."))}},
                        self.text_config, vc, dtype=self.compute_dtype)
                    params["text"] = both["text"]
                text_loaded = True
        self.params = put_params(self, params)
        first = next(iter(localpaths.values()))
        try:
            from transformers import CLIPTokenizerFast
            self.tokenizer = CLIPTokenizerFast.from_pretrained(first)
            self._hf_tokenizer = True
        except Exception as e:
            from marqo_tpu.logging import get_logger
            get_logger(__name__).warning(
                f"Checkpoint dir has no usable tokenizer assets ({e}); "
                "falling back to the built-in wordpiece — text embeddings "
                "will NOT match the original checkpoint's tokenizer")
            from marqo_tpu.models.tokenizer import TextTokenizer
            self.tokenizer = TextTokenizer.build_test_wordpiece(
                max_length=self.text_config.max_positions)
            self._hf_tokenizer = False
        self._mel_fb = jnp.asarray(mel_filterbank(n_mels=getattr(
            self, "audio_config", AudioTowerConfig()).n_mels))
        self.loaded = True
        self._param_bytes = sum(
            a.size * a.dtype.itemsize for a in jax.tree.leaves(self.params))

    # -- encoding -----------------------------------------------------------

    def encode(self, contents: List[Any], normalize: bool = True,
               modality: Modality = Modality.TEXT) -> np.ndarray:
        if modality == Modality.TEXT:
            out = self._encode_text([str(c) for c in contents])
        elif modality == Modality.IMAGE and "image" in self.supported:
            out = self._encode_images(contents)
        elif modality == Modality.AUDIO and "audio" in self.supported:
            out = self._encode_audio(contents)
        elif modality == Modality.VIDEO and "video" in self.supported:
            out = self._encode_video(contents)
        else:
            raise VectoriseError(
                f"Model `{self.model_name}` does not support modality "
                f"{modality.value}")
        if normalize:
            out = out / np.maximum(
                np.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        return out.astype(np.float32)

    def _encode_text(self, texts: List[str]) -> np.ndarray:
        max_len = self.text_config.max_positions
        if getattr(self, "_hf_tokenizer", False):
            enc = self.tokenizer(texts, padding="max_length", truncation=True,
                                 max_length=max_len, return_tensors="np")
            ids = enc["input_ids"].astype(np.int32)
        else:
            batch = self.tokenizer.encode_batch(texts, pad_to=max_len)
            ids = (batch["input_ids"] %
                   self.text_config.vocab_size).astype(np.int32)
            for i, L in enumerate(batch["lengths"]):
                ids[i, min(L, max_len) - 1] = self.text_config.eos_token_id
        emb = encode_clip_text_jit(self.params,
                                   jax.device_put(jnp.asarray(ids),
                                                  self._jdevice),
                                   self.text_config,
                                   compute_dtype=self.compute_dtype)
        return np.asarray(emb)

    def _encode_images(self, contents: List[Any]) -> np.ndarray:
        from marqo_tpu.ops.image_ops import host_decode
        from PIL import Image
        size = self.vision_config.image_size
        pixels = []
        for c in contents:
            arr = host_decode(c)
            img = Image.fromarray(arr).resize((size, size), Image.BICUBIC)
            pixels.append(np.asarray(img, dtype=np.uint8))
        emb = encode_clip_image_jit(
            self.params, jax.device_put(jnp.asarray(np.stack(pixels)),
                                        self._jdevice),
            self.vision_config, compute_dtype=self.compute_dtype)
        return np.asarray(emb)

    def _prep_audio(self, content) -> np.ndarray:
        """content: waveform ndarray / wav bytes / path → (mels, frames)."""
        if isinstance(content, np.ndarray) and content.ndim == 1:
            wav = content.astype(np.float32)
        elif isinstance(content, (str, bytes)):
            wav = load_wav(content)
        else:
            raise VectoriseError(
                f"Unsupported audio content type {type(content)}")
        logmel = log_mel_spectrogram(
            jnp.asarray(wav), self._mel_fb, self.audio_config.n_frames)
        return np.asarray(logmel)

    def _encode_audio(self, contents: List[Any]) -> np.ndarray:
        mels = np.stack([self._prep_audio(c) for c in contents])
        emb = encode_audio_tower_jit(
            self.params["audio"],
            jax.device_put(jnp.asarray(mels), self._jdevice),
            self.audio_config, compute_dtype=self.compute_dtype)
        return np.asarray(emb)

    def _encode_video(self, contents: List[Any]) -> np.ndarray:
        """Video embedding. With converted LanguageBind weights the
        temporal-attention tower runs (encode_video_tower); the random-init
        multi-tower fallback means frame embeddings (close ordering, no
        temporal weights to honor)."""
        use_tower = isinstance(self.params, dict) and "video" in self.params
        outs = []
        for frames in contents:
            if isinstance(frames, np.ndarray) and frames.ndim == 3:
                frames = [frames]
            if not isinstance(frames, (list, tuple)) or not frames:
                raise VectoriseError(
                    "Video content must be a non-empty list of frames")
            if use_tower:
                from PIL import Image
                size = self.video_config.image_size
                T = self.video_config.num_frames
                frames = list(frames)[:T]
                while len(frames) < T:  # pad by repeating the last frame
                    frames.append(frames[-1])
                pixels = np.stack([
                    np.asarray(Image.fromarray(np.asarray(f)).resize(
                        (size, size), Image.BICUBIC), dtype=np.uint8)
                    for f in frames])
                emb = encode_video_tower_jit(
                    self.params["video"],
                    jax.device_put(jnp.asarray(pixels[None]), self._jdevice),
                    self.video_config, compute_dtype=self.compute_dtype)
                outs.append(np.asarray(emb)[0])
            else:
                frame_embs = self._encode_images(list(frames))
                outs.append(frame_embs.mean(axis=0))
        return np.stack(outs)

    def memory_bytes(self) -> int:
        return self._param_bytes
