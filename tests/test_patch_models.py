"""Detector/attention patch models (reference processing/image.py:46:
simple, overlap, frcnn, marqo-yolo, yolox, dino-v1, dino-v2) — JAX DINO
attention maps + YOLOX-S with the reference's box pipeline."""

import numpy as np
import pytest

from marqo_tpu.core.exceptions import InvalidArgumentError, ModelLoadError
from marqo_tpu.inference.image_patching import (_filter_boxes, _nms,
                                                _process_boxes,
                                                _replace_small_boxes,
                                                chunk_image, clear_patchers)


@pytest.fixture(autouse=True)
def random_init_patchers(monkeypatch):
    monkeypatch.setenv("MARQO_PATCH_MODELS_RANDOM_INIT", "TRUE")
    # full-width resnet-50 at 384^2 is too slow for a 1-core CPU test box
    monkeypatch.setenv("MARQO_FRCNN_WIDTH", "0.125")
    clear_patchers()
    yield
    clear_patchers()


def _image(seed=0, h=180, w=300):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)


class TestBoxPipeline:
    def test_filter_boxes_area_and_aspect(self):
        boxes = [(0, 0, 100, 100),   # keep
                 (0, 0, 10, 10),     # too small
                 (0, 0, 400, 80)]    # aspect 5 > 4
        assert _filter_boxes(boxes, min_area=3600, max_aspect=4) == [0]

    def test_replace_small_boxes_centered(self):
        out = _replace_small_boxes([(10, 10, 20, 20)], min_area=3600,
                                   new_size=(100, 100))
        x1, y1, x2, y2 = out[0]
        assert (x2 - x1, y2 - y1) == (100, 100)
        assert (x1 + x2) / 2 == 15 and (y1 + y2) / 2 == 15

    def test_nms_suppresses_overlaps(self):
        boxes = [(0, 0, 100, 100), (5, 5, 105, 105), (150, 150, 250, 250)]
        keep = _nms(boxes, [0.9, 0.8, 0.7], iou_thresh=0.6)
        assert keep == [0, 2]

    def test_process_caps_top_k(self):
        boxes = [(i * 5, 0, i * 5 + 90, 90) for i in range(40)]
        scores = [1.0 - i * 0.01 for i in range(40)]
        kept = _process_boxes(boxes, scores, (240, 240))
        assert len(kept) <= 10


class TestDetectorPatchers:
    @pytest.mark.parametrize("method", ["dino-v1", "dino-v2", "marqo-yolo",
                                        "yolox", "frcnn"])
    def test_method_produces_valid_patches(self, method):
        image = _image(1)
        patches, chunks = chunk_image(image, method)
        assert len(patches) >= 1
        assert len(patches) <= 11  # full image + top-10 boxes
        assert len(patches) == len(chunks)
        # first patch is the full image
        assert patches[0].shape == image.shape
        assert chunks[0] == str([0, 0, 300, 180])
        for patch, chunk in zip(patches, chunks):
            left, top, right, bottom = eval(chunk)
            assert 0 <= left < right <= 300
            assert 0 <= top < bottom <= 180
            assert patch.shape == (bottom - top, right - left, 3)

    def test_deterministic(self):
        image = _image(2)
        first = chunk_image(image, "dino-v2")[1]
        second = chunk_image(image, "dino-v2")[1]
        assert first == second

    def test_frcnn_weights_gated_without_random_init(self, monkeypatch):
        monkeypatch.setenv("MARQO_PATCH_MODELS_RANDOM_INIT", "FALSE")
        clear_patchers()
        with pytest.raises(ModelLoadError, match="fasterrcnn_resnet50_fpn"):
            chunk_image(_image(), "frcnn")

    def test_unknown_method_rejected(self):
        with pytest.raises(InvalidArgumentError, match="Unknown patch"):
            chunk_image(_image(), "blob-detector")

    def test_weights_gated_without_random_init(self, monkeypatch):
        monkeypatch.setenv("MARQO_PATCH_MODELS_RANDOM_INIT", "FALSE")
        clear_patchers()
        with pytest.raises(ModelLoadError, match="yolox_s.onnx"):
            chunk_image(_image(), "marqo-yolo")
        with pytest.raises(ModelLoadError, match="MARQO_DINO_WEIGHTS_PATH"):
            chunk_image(_image(), "dino-v1")


class TestYoloxDecode:
    def test_decode_matches_reference_math(self):
        """decode_outputs must equal the reference demo_postprocess
        (yolox_utils.py:90-121) re-implemented here from its published
        form."""
        from marqo_tpu.models.yolox import decode_outputs
        size = (64, 64)
        n = sum((size[0] // s) * (size[1] // s) for s in (8, 16, 32))
        rng = np.random.default_rng(0)
        outputs = rng.standard_normal((1, n, 6)).astype(np.float32)

        # independent re-derivation of the reference decode
        grids, strides = [], []
        for s in (8, 16, 32):
            hs, ws = size[0] // s, size[1] // s
            xv, yv = np.meshgrid(np.arange(ws), np.arange(hs))
            grids.append(np.stack((xv, yv), 2).reshape(1, -1, 2))
            strides.append(np.full((1, grids[-1].shape[1], 1), s))
        grid = np.concatenate(grids, 1)
        stride = np.concatenate(strides, 1)
        expected = outputs.copy()
        expected[..., :2] = (expected[..., :2] + grid) * stride
        expected[..., 2:4] = np.exp(expected[..., 2:4]) * stride

        got = decode_outputs(outputs, size)
        np.testing.assert_allclose(got, expected, rtol=1e-6)
        # decode must not mutate its input
        assert not np.allclose(outputs[..., :2], got[..., :2])

    def test_forward_shapes(self):
        import jax
        import jax.numpy as jnp

        from marqo_tpu.models.yolox import YoloxConfig, forward, init_params
        config = YoloxConfig(input_size=128)
        params = init_params(config, jax.random.PRNGKey(0))
        out = forward(params, jnp.zeros((1, 128, 128, 3), jnp.float32),
                      config)
        n = sum((128 // s) ** 2 for s in (8, 16, 32))
        assert out.shape == (1, n, 85)
        obj = np.asarray(out[..., 4])
        assert np.all(obj >= 0) and np.all(obj <= 1)  # sigmoided


class TestDinoAttention:
    def test_attention_shape_and_softmax(self):
        import jax
        import jax.numpy as jnp

        from marqo_tpu.models.dino_vit import (DinoViTConfig, init_params,
                                               last_selfattention)
        config = DinoViTConfig(image_size=64, patch_size=16, hidden_size=32,
                               num_layers=2, num_heads=4)
        params = init_params(config, jax.random.PRNGKey(0))
        pixels = jnp.zeros((2, 64, 64, 3), dtype=jnp.uint8)
        attn = last_selfattention(params, pixels, config,
                                  compute_dtype=jnp.float32)
        assert attn.shape == (2, 4, 4, 4)
        # rows of the full softmax sum to 1; the CLS->patch slice must sum
        # to less than 1 (CLS->CLS mass removed) but stay positive
        total = np.asarray(attn).sum(axis=(2, 3))
        assert np.all(total > 0) and np.all(total < 1 + 1e-5)

    def test_dino_torch_parity(self):
        """Conversion + forward vs a torch mirror of the facebookresearch
        /dino ViT (packed qkv, pre-LN, CLS+pos embeddings)."""
        import math

        import jax.numpy as jnp
        import torch

        from marqo_tpu.models.dino_vit import (DinoViTConfig,
                                               last_selfattention,
                                               params_from_dino_state_dict)
        config = DinoViTConfig(image_size=64, patch_size=16, hidden_size=32,
                               num_layers=2, num_heads=4)
        torch.manual_seed(0)
        H, L = 32, 2
        sd = {
            "cls_token": torch.randn(1, 1, H) * 0.02,
            "pos_embed": torch.randn(1, 17, H) * 0.02,
            "patch_embed.proj.weight": torch.randn(H, 3, 16, 16) * 0.02,
            "patch_embed.proj.bias": torch.zeros(H),
            "norm.weight": torch.ones(H), "norm.bias": torch.zeros(H),
        }
        for i in range(L):
            p = f"blocks.{i}."
            sd[p + "norm1.weight"] = torch.ones(H)
            sd[p + "norm1.bias"] = torch.zeros(H)
            sd[p + "attn.qkv.weight"] = torch.randn(3 * H, H) * 0.1
            sd[p + "attn.qkv.bias"] = torch.randn(3 * H) * 0.02
            sd[p + "attn.proj.weight"] = torch.randn(H, H) * 0.1
            sd[p + "attn.proj.bias"] = torch.zeros(H)
            sd[p + "norm2.weight"] = torch.ones(H)
            sd[p + "norm2.bias"] = torch.zeros(H)
            sd[p + "mlp.fc1.weight"] = torch.randn(4 * H, H) * 0.1
            sd[p + "mlp.fc1.bias"] = torch.zeros(4 * H)
            sd[p + "mlp.fc2.weight"] = torch.randn(H, 4 * H) * 0.1
            sd[p + "mlp.fc2.bias"] = torch.zeros(H)
        params = params_from_dino_state_dict(sd, config)

        # torch mirror forward up to the last block's attention
        rng = np.random.default_rng(0)
        pixels = rng.integers(0, 256, (1, 64, 64, 3)).astype(np.uint8)
        mean = torch.tensor([0.485, 0.456, 0.406])
        std = torch.tensor([0.229, 0.224, 0.225])
        x = (torch.from_numpy(pixels).float() / 255.0 - mean) / std
        x = x.permute(0, 3, 1, 2)
        patches = torch.nn.functional.conv2d(
            x, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"],
            stride=16)
        x = patches.flatten(2).transpose(1, 2)
        x = torch.cat([sd["cls_token"].expand(1, -1, -1), x], dim=1)
        x = x + sd["pos_embed"]

        def block(x, i, return_attn=False):
            p = f"blocks.{i}."
            h = torch.nn.functional.layer_norm(
                x, (H,), sd[p + "norm1.weight"], sd[p + "norm1.bias"],
                eps=config.layer_norm_eps)
            qkv = h @ sd[p + "attn.qkv.weight"].T + sd[p + "attn.qkv.bias"]
            q, k, v = qkv.chunk(3, dim=-1)
            B, S, _ = q.shape
            nh, d = 4, H // 4
            q = q.view(B, S, nh, d).transpose(1, 2)
            k = k.view(B, S, nh, d).transpose(1, 2)
            v = v.view(B, S, nh, d).transpose(1, 2)
            attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(d), -1)
            if return_attn:
                return attn
            ctx = (attn @ v).transpose(1, 2).reshape(B, S, H)
            x = x + ctx @ sd[p + "attn.proj.weight"].T + \
                sd[p + "attn.proj.bias"]
            h = torch.nn.functional.layer_norm(
                x, (H,), sd[p + "norm2.weight"], sd[p + "norm2.bias"],
                eps=config.layer_norm_eps)
            h = torch.nn.functional.gelu(
                h @ sd[p + "mlp.fc1.weight"].T + sd[p + "mlp.fc1.bias"])
            return x + h @ sd[p + "mlp.fc2.weight"].T + \
                sd[p + "mlp.fc2.bias"]

        with torch.no_grad():
            x = block(x, 0)
            attn = block(x, 1, return_attn=True)
            expected = attn[0, :, 0, 1:].reshape(4, 4, 4).numpy()

        got = np.asarray(last_selfattention(
            params, jnp.asarray(pixels), config,
            compute_dtype=jnp.float32))[0]
        np.testing.assert_allclose(got, expected, atol=1e-5)


class TestMethodUrlOptions:
    """Reference method 'urls': simple?hn=2&wn=3 selects the grid shape
    (image_utils.py:281 _process_patch_method; test_chunk_image_simple
    asserts (2*3)+1 patches)."""

    def test_simple_with_grid_params(self):
        img = np.random.default_rng(0).integers(
            0, 255, size=(120, 90, 3)).astype(np.uint8)
        patches, chunks = chunk_image(img, "simple?hn=2&wn=3")
        assert len(patches) == 2 * 3 + 1
        assert patches[0].shape == img.shape
        patches, _ = chunk_image(img, "simple")
        assert len(patches) == 3 * 3 + 1

    def test_overlap_with_grid_params(self):
        img = np.random.default_rng(1).integers(
            0, 255, size=(120, 120, 3)).astype(np.uint8)
        patches, _ = chunk_image(img, "overlap?hn=2&wn=2")
        # full + 2x2 grid + 1x1 shifted
        assert len(patches) == 1 + 4 + 1


class TestGridBoxGoldens:
    """Ported reference goldens (tests/processing/test_image_utils.py
    test_generate_boxes / test_generate_boxes_overlap /
    test_process_patch_method). Our _grid_boxes prepends the full image
    (the reference adds it at PatchifySimple level), so grid goldens are
    checked on boxes[1:]."""

    @pytest.mark.parametrize("size,hn,wn", [
        ((100, 100), 4, 4), ((100, 100), 3, 2), ((150, 120), 3, 6)])
    def test_generate_boxes_goldens(self, size, hn, wn):
        from marqo_tpu.inference.image_patching import _grid_boxes
        width, height = size
        grid = _grid_boxes(width, height, hn=hn, wn=wn)[1:]
        assert len(grid) == hn * wn
        assert grid[0] == (0, 0, width // wn, height // hn)
        cell_w, cell_h = width // wn, height // hn
        last = grid[-1]
        # last box anchors at the final cell and reaches the image edge
        # within rounding
        assert abs(last[0] - cell_w * (wn - 1)) <= 1
        assert abs(last[1] - cell_h * (hn - 1)) <= 1
        assert abs(last[2] - width) <= 1 and abs(last[3] - height) <= 1

    @pytest.mark.parametrize("size,hn,wn", [
        ((100, 100), 2, 2), ((150, 100), 2, 2), ((150, 100), 3, 2),
        ((240, 240), 3, 3), ((240, 240), 4, 3), ((240, 240), 3, 4)])
    def test_generate_boxes_overlap_counts(self, size, hn, wn):
        from marqo_tpu.inference.image_patching import _grid_boxes
        width, height = size
        boxes = _grid_boxes(width, height, hn=hn, wn=wn, overlap=True)
        grid = [b for b in boxes if b != (0, 0, width, height)]
        assert len(set(grid)) == hn * wn + (hn - 1) * (wn - 1)

    @pytest.mark.parametrize("url,path,params", [
        ("simple", "simple", {}),
        ("overlap", "overlap", {}),
        ("simple?hn=3", "simple", {"hn": "3"}),
        ("overlap?hn=3", "overlap", {"hn": "3"}),
        ("simple?wn=3", "simple", {"wn": "3"}),
        ("simple?hn=3&wn=4", "simple", {"hn": "3", "wn": "4"}),
        ("overlap?hn=3&wn=4", "overlap", {"hn": "3", "wn": "4"}),
    ])
    def test_process_patch_method(self, url, path, params):
        from marqo_tpu.inference.image_patching import _parse_patch_method
        path_out, params_out = _parse_patch_method(url)
        assert path_out == path
        assert params_out == params

    def test_str2bool(self):
        from marqo_tpu.inference.image_patching import _str2bool
        for s in ("true", "True", "1", "yes"):
            assert _str2bool(s)
        for s in ("false", "0", "no", ""):
            assert not _str2bool(s)

    def test_patchify_patch_sizes(self):
        """Each returned patch has its bbox's exact size (reference
        test_patchify); chunk strings are the original-coordinate bboxes."""
        from marqo_tpu.inference.image_patching import chunk_image
        img = np.random.randint(0, 255, size=(200, 250, 3), dtype=np.uint8)
        patches, chunks = chunk_image(img, method="simple?hn=2&wn=2")
        assert len(patches) == len(chunks) == 5  # full image + 2x2 grid
        assert patches[0].shape[:2] == (200, 250)
        for patch, chunk in zip(patches[1:], chunks[1:]):
            import json
            left, top, right, bottom = json.loads(chunk)
            assert patch.shape[0] == bottom - top
            assert patch.shape[1] == right - left

# heavy model/parity suite - excluded from the fast subset (pytest -m 'not slow')
pytestmark = pytest.mark.slow


class TestChunkImageCounts:
    """Reference tests/processing/test_image_chunking.py residuals:
    chunk_image patch counts per method, first patch = whole image
    (:232-320 test_chunk_image_simple/overlap/pytorch/yolox/dino,
    PatchifySimple/Patchify* invariants :27-120)."""

    def _img(self, h=256, w=384):
        rng = np.random.default_rng(0)
        return rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)

    def test_chunk_image_simple(self):
        from marqo_tpu.inference.image_patching import chunk_image
        img = self._img()
        patches, bboxes = chunk_image(img, "simple")
        assert len(patches) == 3 * 3 + 1
        assert len(patches) == len(bboxes)
        assert patches[0].shape == img.shape  # first patch = whole image
        np.testing.assert_array_equal(patches[0], img)

        patches, bboxes = chunk_image(img, "simple?hn=2&wn=3")
        assert len(patches) == 2 * 3 + 1
        assert patches[0].shape == img.shape

    def test_chunk_image_overlap(self):
        from marqo_tpu.inference.image_patching import chunk_image
        img = self._img()
        patches, bboxes = chunk_image(img, "overlap")
        assert len(patches) == 3 * 3 + (3 - 1) * (3 - 1) + 1
        assert patches[0].shape == img.shape

        patches, bboxes = chunk_image(img, "overlap?wn=4&hn=2")
        assert len(patches) == 4 * 2 + (4 - 1) * (2 - 1) + 1
        assert patches[0].shape == img.shape

    @pytest.mark.parametrize("method", ["frcnn", "yolox", "dino-v1",
                                        "dino-v2"])
    def test_chunk_image_detectors(self, method, monkeypatch):
        monkeypatch.setenv("MARQO_PATCH_MODELS_RANDOM_INIT", "TRUE")
        from marqo_tpu.inference.image_patching import chunk_image
        img = self._img()
        patches, bboxes = chunk_image(img, method)
        assert len(patches) >= 1
        assert len(patches) == len(bboxes)
        assert patches[0].shape == img.shape

    def test_patches_match_bboxes(self):
        """Every patch slices exactly its bbox string (PatchifySimple
        invariant len(patches)==len(bboxes), patch == crop)."""
        import ast

        from marqo_tpu.inference.image_patching import chunk_image
        img = self._img(120, 150)
        patches, bboxes = chunk_image(img, "simple?hn=2&wn=2")
        for patch, bbox in zip(patches, bboxes):
            left, top, right, bottom = ast.literal_eval(bbox)
            np.testing.assert_array_equal(patch, img[top:bottom,
                                                     left:right])


class TestAttentionToBboxes:
    """Reference tests/processing/test_image_DINO_utils.py
    test_attention_to_boxes golden: two binary squares -> two exact
    boxes (DINO_utils.py:146-173 attention_to_bboxs)."""

    def test_attention_to_boxes(self):
        from marqo_tpu.inference.image_patching import _DinoPatcher
        attention = np.zeros((224, 224))
        attention[100:120, 100:120] = 1
        attention[20:40, 20:40] = 1
        boxes = _DinoPatcher._attention_to_bboxes(attention)
        assert len(boxes) == 2
        assert set(boxes) == {(100, 100, 120, 120), (20, 20, 40, 40)}
