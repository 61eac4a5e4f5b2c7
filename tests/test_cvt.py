"""CvT encoder parity vs the HF torch implementation (randomly initialised)."""

import numpy as np
import pytest

from cxrmate_tpu.ckpt.hf_convert import convert_cvt_encoder
from cxrmate_tpu.configs import CvtConfig, cvt21_384
from cxrmate_tpu.models.cvt import cvt_encode, cvt_forward, init_cvt_variables

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _small_cfg():
    return CvtConfig(
        patch_sizes=(7, 3, 3),
        patch_stride=(4, 2, 2),
        patch_padding=(2, 1, 1),
        embed_dim=(16, 32, 48),
        num_heads=(1, 2, 3),
        depth=(1, 2, 3),
        projection_size=64,
    )


def _torch_encoder(cfg: CvtConfig, projection: bool = True):
    import sys

    sys.path.insert(0, "/root/repo")
    hf_cfg = transformers.CvtConfig(
        num_channels=cfg.num_channels,
        patch_sizes=list(cfg.patch_sizes),
        patch_stride=list(cfg.patch_stride),
        patch_padding=list(cfg.patch_padding),
        embed_dim=list(cfg.embed_dim),
        num_heads=list(cfg.num_heads),
        depth=list(cfg.depth),
        mlp_ratio=list(cfg.mlp_ratio),
        attention_drop_rate=list(cfg.attention_drop_rate),
        drop_rate=list(cfg.drop_rate),
        drop_path_rate=list(cfg.drop_path_rate),
        qkv_bias=list(cfg.qkv_bias),
        cls_token=list(cfg.cls_token),
        qkv_projection_method=list(cfg.qkv_projection_method),
        kernel_qkv=list(cfg.kernel_qkv),
        padding_kv=list(cfg.padding_kv),
        stride_kv=list(cfg.stride_kv),
        padding_q=list(cfg.padding_q),
        stride_q=list(cfg.stride_q),
    )

    # The reference's encoder wrapper: CvtModel + LayerNorm + bias-free Linear
    # (modelling_single.py:25-78).
    class Head(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.cvt = transformers.CvtModel(hf_cfg, add_pooling_layer=False)
            self.projection_head = torch.nn.Module()
            self.projection_head.layer_norm = torch.nn.LayerNorm(cfg.embed_dim[-1], eps=cfg.layer_norm_eps)
            self.projection_head.projection = torch.nn.Linear(cfg.embed_dim[-1], cfg.projection_size, bias=False)

        def forward(self, x):
            out = self.cvt(x).last_hidden_state
            tokens = torch.flatten(out, 2).permute(0, 2, 1)
            return self.projection_head.projection(self.projection_head.layer_norm(tokens))

    torch.manual_seed(0)
    model = Head().eval()
    # randomise BN running stats so inference parity actually exercises them
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.7, 1.3)
    return model


@pytest.fixture(scope="module")
def small():
    cfg = _small_cfg()
    model = _torch_encoder(cfg)
    variables = convert_cvt_encoder(model.state_dict(), cfg)
    return cfg, model, variables


def test_cvt_forward_parity(small):
    cfg, model, variables = small
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        expected = model(torch.from_numpy(x)).numpy()
    got, _ = cvt_encode(variables["params"], variables["batch_stats"], x, cfg)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=2e-5)


def test_cvt_grid_and_cls(small):
    cfg, model, variables = small
    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        out = model.cvt(torch.from_numpy(x))
        grid = out.last_hidden_state.numpy()  # [B, C, H, W]
        cls = out.cls_token_value.numpy()
    tokens, cls_got, _ = cvt_forward(variables["params"], variables["batch_stats"], x, cfg)
    b, c, h, w = grid.shape
    expected_tokens = grid.reshape(b, c, h * w).transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(tokens), expected_tokens, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cls_got), cls, rtol=2e-4, atol=2e-5)


def test_init_tree_matches_converted(small):
    import jax

    cfg, _, variables = small
    init = init_cvt_variables(jax.random.PRNGKey(0), cfg)

    def treedef(t):
        return jax.tree_util.tree_structure(t)

    assert treedef(init["params"]) == treedef(variables["params"])
    assert treedef(init["batch_stats"]) == treedef(variables["batch_stats"])
    shapes_init = jax.tree_util.tree_map(lambda a: a.shape, init["params"])
    shapes_conv = jax.tree_util.tree_map(lambda a: a.shape, variables["params"])
    assert shapes_init == shapes_conv


@pytest.mark.slow
def test_cvt21_full_parity():
    cfg = cvt21_384()
    model = _torch_encoder(cfg)
    variables = convert_cvt_encoder(model.state_dict(), cfg)
    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, 384, 384).astype(np.float32)
    with torch.no_grad():
        expected = model(torch.from_numpy(x)).numpy()
    got, _ = cvt_encode(variables["params"], variables["batch_stats"], x, cfg)
    assert got.shape == (1, 576, 768)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=5e-4, atol=5e-4)
