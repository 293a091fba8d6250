"""OWL-ViT JAX vs transformers torch parity (random-init, fp32) — the
image reranker's detector (reference cross_encoders.py:341-461 runs
google/owlvit checkpoints through transformers; our JAX arch must match
that module's logits and boxes)."""

import numpy as np
import torch

from marqo_tpu.models.owl_vit import (OwlViTConfig, compute_box_bias,
                                      detect, init_owl_params,
                                      params_from_hf_owlvit)
from marqo_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig

torch.manual_seed(0)

TINY = OwlViTConfig(
    text=CLIPTextConfig(vocab_size=64, hidden_size=32, num_layers=2,
                        num_heads=2, intermediate_size=64, max_positions=12,
                        projection_dim=32, eos_token_id=63,
                        hidden_act="quick_gelu"),
    vision=CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=32,
                            num_layers=2, num_heads=2, intermediate_size=64,
                            projection_dim=32, hidden_act="quick_gelu"))


def _torch_tiny():
    from transformers import OwlViTConfig as HFConfig
    from transformers import OwlViTForObjectDetection
    cfg = HFConfig(
        text_config={"vocab_size": 64, "hidden_size": 32,
                     "num_hidden_layers": 2, "num_attention_heads": 2,
                     "intermediate_size": 64, "max_position_embeddings": 12,
                     "eos_token_id": 63},
        vision_config={"hidden_size": 32, "num_hidden_layers": 2,
                       "num_attention_heads": 2, "intermediate_size": 64,
                       "image_size": 32, "patch_size": 8},
        projection_dim=32)
    return OwlViTForObjectDetection(cfg)


class TestOwlViTParity:
    def test_logits_and_boxes_match_torch(self):
        """Semantics note: transformers groups input_ids per image
        (num_queries = ids.shape[0] // image_batch); our detect() shares
        the query set across the image batch — the reranking shape (one
        query, many images). Equivalence is checked by repeating the
        queries per image on the torch side."""
        import jax.numpy as jnp
        model = _torch_tiny().eval()
        params = params_from_hf_owlvit(model.state_dict(), TINY,
                                       dtype=jnp.float32)
        rng = np.random.default_rng(0)
        n_images = 2
        pixels = rng.integers(0, 256,
                              (n_images, 32, 32, 3)).astype(np.uint8)
        # two queries ending with EOS (=63) before pads
        ids = np.zeros((2, 12), dtype=np.int32)
        ids[0, :4] = [1, 9, 17, 63]
        ids[1, :3] = [5, 30, 63]
        torch_ids = np.tile(ids, (n_images, 1))  # same queries per image
        with torch.no_grad():
            pt = torch.from_numpy(
                ((pixels.astype(np.float32) / 255.0 -
                  np.array([0.48145466, 0.4578275, 0.40821073])) /
                 np.array([0.26862954, 0.26130258, 0.27577711]))
            ).permute(0, 3, 1, 2).float()
            out = model(input_ids=torch.from_numpy(torch_ids).long(),
                        pixel_values=pt,
                        attention_mask=torch.from_numpy(
                            (torch_ids != 0).astype(np.int64)))
        logits, boxes = detect(params, jnp.asarray(pixels),
                               jnp.asarray(ids), TINY,
                               compute_dtype=jnp.float32)
        assert out.logits.shape == (n_images, 16, 2)
        np.testing.assert_allclose(np.asarray(logits),
                                   out.logits.numpy(), atol=3e-4)
        np.testing.assert_allclose(np.asarray(boxes),
                                   out.pred_boxes.numpy(), atol=3e-5)

    def test_box_bias_anchors_grid(self):
        bias = np.asarray(compute_box_bias(4))
        assert bias.shape == (16, 4)
        # centers should sigmoid back to ~(i+1)/4 grid positions
        centers = 1.0 / (1.0 + np.exp(-bias[:, :2]))
        assert abs(centers[0, 0] - 0.25) < 1e-3
        assert abs(centers[-1, 1] - 1.0) < 1e-3

    def test_random_init_runs(self):
        import jax
        import jax.numpy as jnp
        params = init_owl_params(TINY, jax.random.PRNGKey(0))
        pixels = jnp.zeros((1, 32, 32, 3), dtype=jnp.uint8)
        ids = jnp.zeros((1, 12), dtype=jnp.int32).at[0, 2].set(63)
        logits, boxes = detect(params, pixels, ids, TINY,
                               compute_dtype=jnp.float32)
        assert logits.shape == (1, 16, 1)
        assert boxes.shape == (1, 16, 4)
        assert np.all(np.asarray(boxes) >= 0) and np.all(np.asarray(boxes) <= 1)

# heavy model/parity suite - excluded from the fast subset (pytest -m 'not slow')
import pytest  # noqa: E402
pytestmark = pytest.mark.slow
