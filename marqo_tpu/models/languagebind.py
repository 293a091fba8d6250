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

from marqo_tpu.core.exceptions import VectoriseError
from marqo_tpu.inference.types import Device, Modality
from marqo_tpu.models.clip import (CLIPTextConfig, CLIPVisionConfig,
                                   _init_blocks, _run_blocks,
                                   encode_clip_image_jit,
                                   encode_clip_text_jit, init_clip_params)
from marqo_tpu.ops.audio_ops import (N_MELS, load_wav,
                                     log_mel_spectrogram, mel_filterbank)
from marqo_tpu.ops.common import layer_norm


@dataclass(frozen=True)
class AudioTowerConfig:
    n_mels: int = N_MELS
    n_frames: int = 1000  # 10 s at 10 ms hop
    patch_size: int = 16
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


def init_audio_tower(config: AudioTowerConfig, rng,
                     dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    std = 0.02
    H = config.hidden_size
    return {
        "patch_embedding": (jax.random.normal(
            k1, (config.patch_size ** 2, H)) * std).astype(dtype),
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
    """(B, n_mels, n_frames) log-mel → (B, projection_dim) fp32."""
    B = logmels.shape[0]
    p = config.patch_size
    gm, gf = config.n_mels // p, config.n_frames // p
    x = logmels[:, :gm * p, :gf * p]
    x = x.reshape(B, gm, p, gf, p).transpose(0, 1, 3, 2, 4).reshape(
        B, gm * gf, p * p).astype(compute_dtype)
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
        if not self.properties.get("random_init"):
            from marqo_tpu.core.exceptions import ModelLoadError
            raise ModelLoadError(
                f"LanguageBind checkpoints for `{self.model_name}` require "
                f"HF hub access, unavailable in this deployment. Pass "
                f"model_properties.random_init for synthetic-weight mode.")
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
        self.params = jax.device_put({
            "text": clip_params["text"],
            "vision": clip_params["vision"],
            "audio": init_audio_tower(self.audio_config, keys[1],
                                      dtype=self.compute_dtype),
        }, self._jdevice)
        self._mel_fb = jnp.asarray(mel_filterbank())
        from marqo_tpu.models.tokenizer import TextTokenizer
        self.tokenizer = TextTokenizer.build_test_wordpiece(
            max_length=self.text_config.max_positions)
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
        batch = self.tokenizer.encode_batch(texts, pad_to=max_len)
        ids = (batch["input_ids"] % self.text_config.vocab_size).astype(np.int32)
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
        """Video = mean of frame embeddings (frames: list of (H,W,3) arrays
        per clip; the ffmpeg chunker supplies decoded frames)."""
        outs = []
        for frames in contents:
            if isinstance(frames, np.ndarray) and frames.ndim == 3:
                frames = [frames]
            if not isinstance(frames, (list, tuple)) or not frames:
                raise VectoriseError(
                    "Video content must be a non-empty list of frames")
            frame_embs = self._encode_images(list(frames))
            outs.append(frame_embs.mean(axis=0))
        return np.stack(outs)

    def memory_bytes(self) -> int:
        return self._param_bytes
