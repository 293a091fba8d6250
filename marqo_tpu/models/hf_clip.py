"""HF-text CLIP composites: roberta-ViT-B-32, xlm-roberta-base-ViT-B-32,
xlm-roberta-large-ViT-H-14 (open_clip custom-text models; reference serves
them via open_clip — registry model_registry.py open_clip section).

open_clip pairs an HF RoBERTa/XLM-R encoder (HFTextEncoder with
mean_pooler and a bias-free 2-layer MLP projection, hf_model.py) with a
standard CLIP ViT vision tower. Both halves already exist here — the
scan-stacked BERT-family encoder (models/bert.py, torch-parity-tested) and
the ViT tower (models/clip.py) — so this wrapper is conversion + pooling +
the MLP projection head.
"""

import hashlib
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from marqo_tpu.core.exceptions import ModelLoadError, VectoriseError

from marqo_tpu.inference.types import Device, Modality
from marqo_tpu.models.clip import _model_put
from marqo_tpu.parallel.serving import put_params
from marqo_tpu.models.bert import (TextEncoderConfig, encode_tokens,
                                   init_params as init_bert_params,
                                   params_from_torch_state_dict)
from marqo_tpu.models.clip import (CLIPVisionConfig, encode_clip_image_jit,
                                   init_clip_params)

from functools import partial


@partial(jax.jit, static_argnames=("config", "compute_dtype"))
def encode_hf_clip_text_jit(params, input_ids, attention_mask, config,
                            compute_dtype=jnp.bfloat16):
    """BERT-family encoder (mean pool) → projection head. Two layouts:
    bias-free 2-layer MLP (open_clip HFTextEncoder proj_type='mlp') or a
    single biased Linear (M-CLIP LinearTransformation)."""
    pooled = encode_tokens(params["text"], input_ids, attention_mask,
                           config, compute_dtype=compute_dtype)
    if "proj_w1" in params:
        h = jax.nn.gelu(pooled @ params["proj_w1"].astype(jnp.float32),
                        approximate=False)
        return h @ params["proj_w2"].astype(jnp.float32)
    return pooled @ params["proj_w"].astype(jnp.float32) + \
        params["proj_b"].astype(jnp.float32)


# vision tower configs per composite (open_clip model_configs; the M-CLIP
# entries pair with openai towers → quick_gelu)
_VISION = {
    "ViT-H-14": CLIPVisionConfig(image_size=224, patch_size=14,
                                 hidden_size=1280, num_layers=32,
                                 num_heads=16, intermediate_size=5120,
                                 projection_dim=1024, hidden_act="gelu"),
    "ViT-B-32": CLIPVisionConfig(image_size=224, patch_size=32,
                                 hidden_size=768, num_layers=12,
                                 num_heads=12, intermediate_size=3072,
                                 projection_dim=512, hidden_act="gelu"),
    "Vit-L-14": CLIPVisionConfig(image_size=224, patch_size=14,
                                 hidden_size=1024, num_layers=24,
                                 num_heads=16, intermediate_size=4096,
                                 projection_dim=768,
                                 hidden_act="quick_gelu"),
    "Vit-B/32": CLIPVisionConfig(image_size=224, patch_size=32,
                                 hidden_size=768, num_layers=12,
                                 num_heads=12, intermediate_size=3072,
                                 projection_dim=512,
                                 hidden_act="quick_gelu"),
    "Vit-B/16+": CLIPVisionConfig(image_size=240, patch_size=16,
                                  hidden_size=896, num_layers=12,
                                  num_heads=14, intermediate_size=3584,
                                  projection_dim=640, hidden_act="gelu"),
}


class JaxHFCLIPModel:
    """Composite wrapper: HF RoBERTa/XLM-R text + CLIP ViT vision."""

    compute_dtype = jnp.bfloat16

    def __init__(self, model_name: str, properties: dict, device: Device,
                 model_auth=None):
        self.model_name = model_name
        self.properties = dict(properties or {})
        self.device = device
        self.model_auth = model_auth
        self.loaded = False
        self.params = None
        self.text_config: Optional[TextEncoderConfig] = None
        self.vision_config: Optional[CLIPVisionConfig] = None
        self.tokenizer = None
        self._param_bytes = 0
        platform = "cpu" if device == Device.CPU else None
        try:
            self._jdevice = (jax.devices(platform)[0] if platform
                             else jax.devices()[0])
        except RuntimeError:
            self._jdevice = jax.devices()[0]

    @property
    def dimensions(self) -> int:
        return int(self.properties.get("dimensions", 0)) or \
            (self.vision_config.projection_dim if self.vision_config else 0)

    def _vision_token(self) -> str:
        name = self.properties.get("name", self.model_name)
        for token in ("ViT-H-14", "Vit-L-14", "Vit-B/16+", "Vit-B/32"):
            if token in name:
                return token
        return "ViT-B-32"

    def load(self) -> None:
        if self.properties.get("localpath"):
            self._load_from_checkpoint(self.properties["localpath"])
        elif self.properties.get("random_init"):
            self._load_random_init()
        else:
            raise ModelLoadError(
                f"HF-text CLIP model `{self.model_name}` requires an "
                "open_clip checkpoint: provide model_properties.localpath "
                "or a model_location.")
        self.loaded = True
        self._param_bytes = sum(
            a.size * a.dtype.itemsize for a in jax.tree.leaves(self.params))

    def _load_from_checkpoint(self, path: str) -> None:
        import os

        import torch
        if os.path.isdir(path):
            for fname in ("open_clip_pytorch_model.bin", "pytorch_model.bin",
                          "model.pt"):
                cand = os.path.join(path, fname)
                if os.path.isfile(cand):
                    path = cand
                    break
        from marqo_tpu.inference.checkpoint_load import load_torch_checkpoint
        state = load_torch_checkpoint(path, family="multilingual_clip")
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        state = {k[len("module."):] if k.startswith("module.") else k: v
                 for k, v in state.items()}
        sd_np = {k: np.asarray(v.detach().cpu().numpy()
                               if hasattr(v, "detach") else v)
                 for k, v in state.items()}
        arch = self.properties.get("architecture", {})
        self.vision_config = _VISION[self._vision_token()]

        if "LinearTransformation.weight" in sd_np:
            # M-CLIP layout (reference MULTILINGUAL_CLIP, clip_utils.py:521):
            # transformer.<xlmr keys> + LinearTransformation Linear w/ bias.
            # The image tower ships separately (an openai CLIP checkpoint) —
            # model_properties.vision_localpath.
            hf_sd = {k[len("transformer."):]: v for k, v in sd_np.items()
                     if k.startswith("transformer.")}
            self.text_config = self._text_config_from_weights(hf_sd, arch)
            text = params_from_torch_state_dict(hf_sd, self.text_config,
                                                dtype=self.compute_dtype)
            proj = {"proj_w": jnp.asarray(
                        sd_np["LinearTransformation.weight"].T,
                        self.compute_dtype),
                    "proj_b": jnp.asarray(
                        sd_np["LinearTransformation.bias"],
                        self.compute_dtype)}
            vision = self._load_vision_checkpoint()
        else:
            # open_clip composite layout: text.transformer.<hf keys> +
            # text.proj.{0,2}.weight + visual.* in one state dict
            hf_sd = {k[len("text.transformer."):]: v
                     for k, v in sd_np.items()
                     if k.startswith("text.transformer.")}
            self.text_config = self._text_config_from_weights(hf_sd, arch)
            text = params_from_torch_state_dict(hf_sd, self.text_config,
                                                dtype=self.compute_dtype)
            proj = {"proj_w1": jnp.asarray(sd_np["text.proj.0.weight"].T,
                                           self.compute_dtype),
                    "proj_w2": jnp.asarray(sd_np["text.proj.2.weight"].T,
                                           self.compute_dtype)}
            vision = self._convert_vision(sd_np, self.vision_config)

        self.params = put_params(self, 
            dict({"text": text, "vision": vision}, **proj))
        self._init_tokenizer(checkpoint=path)

    def _load_vision_checkpoint(self) -> dict:
        """Load the separate image-tower checkpoint for M-CLIP models:
        an openai/open_clip state dict (visual.*) or an HF CLIPModel dir."""
        import os

        import torch
        vpath = self.properties.get("vision_localpath")
        if not vpath:
            raise ModelLoadError(
                f"M-CLIP model `{self.model_name}` pairs a separate CLIP "
                "image tower: provide model_properties.vision_localpath "
                "(openai/open_clip checkpoint or HF CLIPModel directory).")
        if os.path.isdir(vpath):
            from marqo_tpu.models.clip import (CLIPTextConfig,
                                               params_from_hf_clip)
            from transformers import CLIPConfig, CLIPModel
            hf_config = CLIPConfig.from_pretrained(vpath)
            torch_model = CLIPModel.from_pretrained(vpath)
            dummy_text = CLIPTextConfig(
                vocab_size=hf_config.text_config.vocab_size,
                hidden_size=hf_config.text_config.hidden_size,
                num_layers=hf_config.text_config.num_hidden_layers,
                num_heads=hf_config.text_config.num_attention_heads,
                intermediate_size=hf_config.text_config.intermediate_size,
                projection_dim=hf_config.projection_dim)
            vision = params_from_hf_clip(
                torch_model.state_dict(), dummy_text, self.vision_config,
                dtype=self.compute_dtype)["vision"]
            del torch_model
            return vision
        from marqo_tpu.inference.checkpoint_load import load_torch_checkpoint
        state = load_torch_checkpoint(vpath, family="clip", weights_only=False)
        if hasattr(state, "state_dict"):
            state = state.state_dict()
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        sd_np = {k: np.asarray(v.detach().cpu().numpy()
                               if hasattr(v, "detach") else v)
                 for k, v in state.items()}
        return self._convert_vision(sd_np, self.vision_config)

    def _convert_vision(self, sd: dict, cfg: CLIPVisionConfig) -> dict:
        """open_clip ViT vision half (visual.conv1/class_embedding/
        positional_embedding/ln_pre/transformer.resblocks/ln_post/proj) —
        same layout as params_from_open_clip's vision branch."""
        dtype = self.compute_dtype
        from marqo_tpu.models.clip import convert_open_clip_resblocks
        layers = convert_open_clip_resblocks(
            sd, "visual.transformer.resblocks", cfg.num_layers, dtype)
        conv = sd["visual.conv1.weight"]
        H = conv.shape[0]
        return {
            "patch_embedding": jnp.asarray(
                conv.transpose(2, 3, 1, 0).reshape(-1, H), dtype),
            "class_embedding": jnp.asarray(sd["visual.class_embedding"],
                                           dtype),
            "position_embedding": jnp.asarray(
                sd["visual.positional_embedding"], dtype),
            "pre_ln_scale": jnp.asarray(sd["visual.ln_pre.weight"], dtype),
            "pre_ln_bias": jnp.asarray(sd["visual.ln_pre.bias"], dtype),
            "layers": layers,
            "post_ln_scale": jnp.asarray(sd["visual.ln_post.weight"], dtype),
            "post_ln_bias": jnp.asarray(sd["visual.ln_post.bias"], dtype),
            "visual_projection": jnp.asarray(sd["visual.proj"], dtype),
        }

    def _text_config_from_weights(self, hf_sd: dict,
                                  arch: dict) -> TextEncoderConfig:
        """Infer the RoBERTa/XLM-R shape from the converted weights."""
        vocab, hidden = hf_sd["embeddings.word_embeddings.weight"].shape
        n_layers = 0
        while f"encoder.layer.{n_layers}.attention.self.query.weight" in \
                hf_sd:
            n_layers += 1
        inter = hf_sd["encoder.layer.0.intermediate.dense.weight"].shape[0]
        max_pos = hf_sd["embeddings.position_embeddings.weight"].shape[0]
        return TextEncoderConfig(
            vocab_size=vocab, hidden_size=hidden, num_layers=n_layers,
            num_heads=int(arch.get("text_heads", max(1, hidden // 64))),
            intermediate_size=inter, max_position_embeddings=max_pos,
            type_vocab_size=1, hidden_act="gelu",
            position_offset=2,  # RoBERTa/XLM-R: padding_idx(1) + 1
            pooling="mean", normalize=False)

    def _load_random_init(self) -> None:
        arch = self.properties.get("architecture", {})
        dims = int(self.properties.get("dimensions", 32))
        self.text_config = TextEncoderConfig(
            vocab_size=int(arch.get("vocab_size", 1024)),
            hidden_size=int(arch.get("text_hidden_size", 32)),
            num_layers=int(arch.get("text_layers", 2)),
            num_heads=int(arch.get("text_heads", 2)),
            intermediate_size=int(arch.get("text_intermediate", 64)),
            position_offset=2, pooling="mean", normalize=False)
        self.vision_config = CLIPVisionConfig(
            image_size=int(self.properties.get("image_size", 32)),
            patch_size=int(arch.get("patch_size", 16)),
            hidden_size=int(arch.get("vision_hidden_size", 32)),
            num_layers=int(arch.get("vision_layers", 2)),
            num_heads=int(arch.get("vision_heads", 2)),
            intermediate_size=int(arch.get("vision_intermediate", 64)),
            projection_dim=dims, hidden_act="gelu")
        seed = int.from_bytes(
            hashlib.sha256(self.model_name.encode()).digest()[:4], "little")
        rng = jax.random.PRNGKey(seed)
        text = init_bert_params(self.text_config, rng,
                                dtype=self.compute_dtype)
        H = self.text_config.hidden_size
        mid = (H + dims) // 2
        k1, k2, k3 = jax.random.split(jax.random.fold_in(rng, 3), 3)
        from marqo_tpu.models.clip import CLIPTextConfig
        vision = init_clip_params(
            CLIPTextConfig(vocab_size=8, hidden_size=8, num_layers=1,
                           num_heads=2, intermediate_size=16,
                           projection_dim=dims),
            self.vision_config, k3, dtype=self.compute_dtype)["vision"]
        self.params = put_params(self, {
            "text": text,
            "proj_w1": (0.02 * jax.random.normal(k1, (H, mid))).astype(
                self.compute_dtype),
            "proj_w2": (0.02 * jax.random.normal(k2, (mid, dims))).astype(
                self.compute_dtype),
            "vision": vision,
        })
        self._init_tokenizer()

    def _init_tokenizer(self, checkpoint: str = None) -> None:
        from marqo_tpu.models.tokenizer import resolve_model_tokenizer
        self.tokenizer = resolve_model_tokenizer(
            self.properties, max_length=int(self.properties.get("tokens",
                                                                128)),
            checkpoint_path=checkpoint,
            allow_test=bool(self.properties.get("random_init")))

    # -- encoding -------------------------------------------------------------

    def encode(self, contents: List[Any], normalize: bool = True,
               modality: Modality = Modality.TEXT) -> np.ndarray:
        if modality == Modality.TEXT:
            out = self._encode_text([str(c) for c in contents])
        elif modality == Modality.IMAGE:
            out = self._encode_images(contents)
        else:
            raise VectoriseError(
                f"Model `{self.model_name}` does not support modality "
                f"{modality.value}")
        if normalize:
            out = out / np.maximum(
                np.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
        return out.astype(np.float32)

    def _encode_text(self, texts: List[str]) -> np.ndarray:
        batch = self.tokenizer.encode_batch(texts)
        ids = (batch["input_ids"] % self.text_config.vocab_size).astype(
            np.int32)
        mask = batch["attention_mask"].astype(np.int32)
        # ids and mask travel together: stack along a new axis so the
        # shared batched dispatcher pads them as one array
        both = np.stack([ids, mask], axis=1)  # (n, 2, S)

        def forward(padded):
            pid, pmask = padded[:, 0], padded[:, 1].copy()
            # bucket-padding rows have an all-zero mask: give them one
            # real position so mean-pool denominators never hit zero
            pmask[pmask.sum(axis=1) == 0, 0] = 1
            return encode_hf_clip_text_jit(
                self.params,
                jax.device_put(jnp.asarray(pid), self._jdevice),
                jax.device_put(jnp.asarray(pmask), self._jdevice),
                self.text_config, compute_dtype=self.compute_dtype)

        from marqo_tpu.inference.batching import batched_device_encode
        return batched_device_encode(both, forward)

    def _encode_images(self, contents: List[Any]) -> np.ndarray:
        from marqo_tpu.models.clip import JaxCLIPModel
        pixels = np.stack([
            JaxCLIPModel._preprocess_host(self, c) for c in contents])
        from marqo_tpu.inference.batching import batched_device_encode
        return batched_device_encode(
            pixels, lambda padded: encode_clip_image_jit(
                {"vision": self.params["vision"]},
                _model_put(self, padded),
                self.vision_config, compute_dtype=self.compute_dtype))

    def memory_bytes(self) -> int:
        return self._param_bytes
