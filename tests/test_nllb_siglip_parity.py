"""NLLB-SigLIP: REAL transformers parity for the M2M-100 text encoder
(transformers ships M2M100, so the text-tower conversion is verified
offline — unlike EVA02/open_clip pairing layouts, which stay flagged),
plus wrapper behavior and the unverified-conversion gate."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from marqo_tpu.models.nllb_siglip import (JaxNLLBSigLIPModel,
                                          NLLBTextConfig,
                                          encode_nllb_text,
                                          params_from_m2m100_encoder,
                                          sinusoidal_positions)


@pytest.fixture(scope="module")
def m2m_pair():
    from transformers import M2M100Config, M2M100Model
    hf_config = M2M100Config(
        vocab_size=128, d_model=32, encoder_layers=2, decoder_layers=1,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_position_embeddings=64, scale_embedding=True,
        encoder_layerdrop=0.0, decoder_layerdrop=0.0, dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0, pad_token_id=1)
    torch.manual_seed(0)
    model = M2M100Model(hf_config).eval()
    config = NLLBTextConfig(
        vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_positions=64, embed_dim=32)
    params = params_from_m2m100_encoder(model.state_dict(), config,
                                        prefix="encoder.",
                                        dtype=jnp.float32)
    return model, config, params


class TestM2M100TextParity:
    def test_sinusoidal_table_matches_transformers(self):
        from transformers.models.m2m_100.modeling_m2m_100 import \
            M2M100SinusoidalPositionalEmbedding
        emb = M2M100SinusoidalPositionalEmbedding(16, 8, padding_idx=1)
        ours = sinusoidal_positions(18, 8, padding_idx=1)
        theirs = emb.weights.detach().numpy()
        np.testing.assert_allclose(ours[:theirs.shape[0]], theirs,
                                   atol=1e-6)

    def test_encoder_matches_transformers(self, m2m_pair):
        model, config, params = m2m_pair
        rng = np.random.default_rng(0)
        ids = rng.integers(2, 128, (3, 10)).astype(np.int64)
        # ragged padding like real batches
        ids[0, 7:] = 1
        ids[2, 4:] = 1
        mask = (ids != 1).astype(np.int64)
        with torch.no_grad():
            ref = model.encoder(input_ids=torch.from_numpy(ids),
                                attention_mask=torch.from_numpy(mask)
                                ).last_hidden_state.numpy()
        # compare the pre-projection hidden states: run our encoder with
        # an identity projection and first-token pooling removed by
        # checking ALL positions via a probe projection per position
        out = encode_nllb_text(
            {"text": params}, jnp.asarray(ids.astype(np.int32)), config,
            compute_dtype=jnp.float32)
        # our function pools token 0 with identity proj ⇒ equals ref[:, 0]
        np.testing.assert_allclose(np.asarray(out), ref[:, 0], atol=2e-5)

    def test_padding_invariance(self, m2m_pair):
        """Extra padding must not change the pooled embedding."""
        _, config, params = m2m_pair
        rng = np.random.default_rng(1)
        ids = rng.integers(2, 128, (1, 6)).astype(np.int32)
        short = encode_nllb_text({"text": params}, jnp.asarray(ids),
                                 config, compute_dtype=jnp.float32)
        padded = np.full((1, 12), 1, np.int32)
        padded[:, :6] = ids
        long = encode_nllb_text({"text": params}, jnp.asarray(padded),
                                config, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(short), np.asarray(long),
                                   atol=2e-5)


class TestNLLBSigLIPWrapper:
    def test_wrapper_encode_text_and_image(self):
        from marqo_tpu.inference.types import Device, Modality
        props = {"name": "nllb-test", "dimensions": 24,
                 "type": "open_clip", "random_init": True, "image_size": 32}
        model = JaxNLLBSigLIPModel("nllb-test", props, Device.CPU)
        model.load()
        out = model.encode(["hello world", "bonjour le monde"],
                           modality=Modality.TEXT)
        assert out.shape == (2, 24)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0,
                                   atol=1e-5)
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)]
        out = model.encode(imgs, modality=Modality.IMAGE)
        assert out.shape == (1, 24)
        assert np.isfinite(out).all()

    def test_real_checkpoint_requires_flag(self, tmp_path, monkeypatch):
        from marqo_tpu.core.exceptions import ModelLoadError
        from marqo_tpu.inference.types import Device
        ckpt = tmp_path / "open_clip_pytorch_model.bin"
        torch.save({}, str(ckpt))
        props = {"name": "open_clip/nllb-clip-base-siglip/v1",
                 "dimensions": 768, "type": "open_clip",
                 "localpath": str(tmp_path)}
        monkeypatch.delenv("MARQO_ALLOW_UNVERIFIED_CONVERSION",
                           raising=False)
        model = JaxNLLBSigLIPModel("nllb", props, Device.CPU)
        with pytest.raises(ModelLoadError) as e:
            model.load()
        assert "MARQO_ALLOW_UNVERIFIED_CONVERSION" in str(e.value)
        monkeypatch.setenv("MARQO_ALLOW_UNVERIFIED_CONVERSION", "TRUE")
        model2 = JaxNLLBSigLIPModel("nllb", props, Device.CPU)
        with pytest.raises(Exception) as e2:
            model2.load()
        assert "MARQO_ALLOW_UNVERIFIED_CONVERSION" not in str(e2.value)

    def test_published_config_shapes(self):
        from marqo_tpu.models.nllb_siglip import NLLB_SIGLIP_ARCHS
        for token, (txt, vis) in NLLB_SIGLIP_ARCHS.items():
            th, tL, theads, tmlp, embed = txt
            w, L, h, mlp, patch, image = vis
            assert th % theads == 0 and w % h == 0
            assert embed in (768, 1152)  # registry dimensions

# heavy model/parity suite - excluded from the fast subset (pytest -m 'not slow')
pytestmark = pytest.mark.slow
