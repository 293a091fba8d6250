"""EVA02 tower: torch-mirror block parity + published-config shape goldens.

The mirror reimplements the EVA02 block (RoPE q/k rotation skipping the
class token, no-k-bias attention, SwiGLU-with-inner-LN FFN) in torch from
the paper/timm semantics, independently of the JAX code — agreement
validates the math. The CHECKPOINT KEY MAPPING remains flagged unverified
(timm/open_clip absent); loading real weights needs
MARQO_ALLOW_UNVERIFIED_CONVERSION=TRUE, which is also tested here.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from marqo_tpu.models.eva02 import (EVA02_ARCHS, EVA02VisionConfig,
                                    JaxEVA02Model, _eva_block,
                                    encode_eva02_image,
                                    init_eva02_params, rope_2d_freqs)
from marqo_tpu.models.clip import CLIPTextConfig


def torch_rot(x):
    x0 = x[..., 0::2]
    x1 = x[..., 1::2]
    return torch.stack([-x1, x0], dim=-1).reshape(x.shape)


def torch_eva_block(x, lp, rope_sin, rope_cos, num_heads, eps):
    """Independent torch mirror of one EVA02 block."""
    B, S, H = x.shape
    D = H // num_heads
    h = torch.nn.functional.layer_norm(
        x, (H,), weight=lp["ln1_scale"], bias=lp["ln1_bias"], eps=eps)
    q = h @ lp["q_w"] + lp["q_b"]
    k = h @ lp["k_w"]
    v = h @ lp["v_w"] + lp["v_b"]
    qh = q.reshape(B, S, num_heads, D).permute(0, 2, 1, 3)
    kh = k.reshape(B, S, num_heads, D).permute(0, 2, 1, 3)
    vh = v.reshape(B, S, num_heads, D).permute(0, 2, 1, 3)

    def rope(t):
        rotated = t[:, :, 1:] * rope_cos + torch_rot(t[:, :, 1:]) * rope_sin
        return torch.cat([t[:, :, :1], rotated], dim=2)

    qh, kh = rope(qh), rope(kh)
    s = (qh @ kh.transpose(-2, -1)) / np.sqrt(D)
    p = torch.softmax(s, dim=-1)
    a = (p @ vh).permute(0, 2, 1, 3).reshape(B, S, H)
    x = x + a @ lp["o_w"] + lp["o_b"]

    h = torch.nn.functional.layer_norm(
        x, (H,), weight=lp["ln2_scale"], bias=lp["ln2_bias"], eps=eps)
    gate = torch.nn.functional.silu(h @ lp["w1_gate"] + lp["b1_gate"])
    val = h @ lp["w1_val"] + lp["b1_val"]
    inner = torch.nn.functional.layer_norm(
        gate * val, (gate.shape[-1],), weight=lp["ffn_ln_scale"],
        bias=lp["ffn_ln_bias"], eps=eps)
    return x + inner @ lp["w2"] + lp["b2"]


class TestEVA02BlockParity:
    def test_block_matches_torch_mirror(self):
        H, heads, I, grid = 32, 4, 48, 3
        D = H // heads
        S = grid * grid + 1
        rng = np.random.default_rng(0)
        mk = lambda *shape: rng.normal(size=shape).astype(np.float32) * 0.1
        lp = {
            "q_w": mk(H, H), "q_b": mk(H), "k_w": mk(H, H),
            "v_w": mk(H, H), "v_b": mk(H),
            "o_w": mk(H, H), "o_b": mk(H),
            "ln1_scale": np.ones(H, np.float32) + mk(H),
            "ln1_bias": mk(H),
            "ln2_scale": np.ones(H, np.float32) + mk(H),
            "ln2_bias": mk(H),
            "w1_gate": mk(H, I), "b1_gate": mk(I),
            "w1_val": mk(H, I), "b1_val": mk(I),
            "ffn_ln_scale": np.ones(I, np.float32) + mk(I),
            "ffn_ln_bias": mk(I),
            "w2": mk(I, H), "b2": mk(H),
        }
        x = mk(2, S, H)
        table = rope_2d_freqs(grid, D)
        sin, cos = table[:, :D], table[:, D:]

        jout = np.asarray(_eva_block(
            jnp.asarray(x), {k: jnp.asarray(v) for k, v in lp.items()},
            jnp.asarray(sin), jnp.asarray(cos), heads, 1e-6))
        tout = torch_eva_block(
            torch.from_numpy(x),
            {k: torch.from_numpy(v) for k, v in lp.items()},
            torch.from_numpy(sin), torch.from_numpy(cos), heads,
            1e-6).numpy()
        np.testing.assert_allclose(jout, tout, atol=2e-5)

    def test_rope_properties(self):
        """Rotation preserves norms and is position-dependent."""
        D, grid = 16, 4
        table = rope_2d_freqs(grid, D)
        sin, cos = jnp.asarray(table[:, :D]), jnp.asarray(table[:, D:])
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 2, grid * grid, D))
                        .astype(np.float32))
        from marqo_tpu.models.eva02 import _apply_rope
        rotated = _apply_rope(x, sin, cos)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(rotated), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1), atol=1e-5)
        # position 0 is identity (angle 0); later positions are not
        np.testing.assert_allclose(np.asarray(rotated)[:, :, 0],
                                   np.asarray(x)[:, :, 0], atol=1e-6)
        assert not np.allclose(np.asarray(rotated)[:, :, 5],
                               np.asarray(x)[:, :, 5])


class TestEVA02ShapesAndWrapper:
    def test_published_config_shapes(self):
        """Golden param shapes for the published EVA02-CLIP configs."""
        for token, (vis, txt) in EVA02_ARCHS.items():
            w, L, h, patch, swiglu, embed = vis
            assert w % h == 0
            config = EVA02VisionConfig(
                image_size=336 if "336" in token else 224,
                patch_size=patch, hidden_size=w, num_layers=L, num_heads=h,
                swiglu_hidden=swiglu, embed_dim=embed)
            n_patches = (config.image_size // patch) ** 2
            params = __import__(
                "marqo_tpu.models.eva02", fromlist=["x"]
            ).init_eva02_vision_params(config, jax.random.PRNGKey(0))
            assert params["position_embedding"].shape == (n_patches + 1, w)
            assert params["layers"]["w1_gate"].shape == (L, w, swiglu)
            assert params["layers"]["k_w"].shape == (L, w, w)
            assert "k_b" not in params["layers"]  # EVA: no k bias
            assert params["head_w"].shape == (w, embed)
            assert params["rope_table"].shape == (n_patches, (w // h) * 2)

    def test_wrapper_encode_text_and_image(self):
        from marqo_tpu.inference.types import Device, Modality
        props = {"name": "eva02-test", "dimensions": 24, "type": "open_clip",
                 "random_init": True, "image_size": 32}
        model = JaxEVA02Model("eva02-test", props, Device.CPU)
        model.load()
        out = model.encode(["a cat", "two dogs"], modality=Modality.TEXT)
        assert out.shape == (2, 24)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0,
                                   atol=1e-5)
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)
                for _ in range(2)]
        out = model.encode(imgs, modality=Modality.IMAGE)
        assert out.shape == (2, 24)
        assert np.isfinite(out).all()

    def test_real_checkpoint_requires_flag(self, tmp_path, monkeypatch):
        from marqo_tpu.core.exceptions import ModelLoadError
        from marqo_tpu.inference.types import Device
        ckpt = tmp_path / "open_clip_pytorch_model.bin"
        torch.save({}, str(ckpt))
        props = {"name": "open_clip/EVA02-B-16/merged2b_s8b_b131k",
                 "dimensions": 512, "type": "open_clip",
                 "localpath": str(tmp_path)}
        model = JaxEVA02Model("eva02", props, Device.CPU)
        monkeypatch.delenv("MARQO_ALLOW_UNVERIFIED_CONVERSION",
                           raising=False)
        with pytest.raises(ModelLoadError) as e:
            model.load()
        assert "MARQO_ALLOW_UNVERIFIED_CONVERSION" in str(e.value)
        # with the flag, the loader proceeds into conversion (and fails
        # later on the EMPTY checkpoint, proving the gate opened)
        monkeypatch.setenv("MARQO_ALLOW_UNVERIFIED_CONVERSION", "TRUE")
        model2 = JaxEVA02Model("eva02", props, Device.CPU)
        with pytest.raises(Exception) as e2:
            model2.load()
        assert "MARQO_ALLOW_UNVERIFIED_CONVERSION" not in str(e2.value)

# heavy model/parity suite - excluded from the fast subset (pytest -m 'not slow')
pytestmark = pytest.mark.slow
