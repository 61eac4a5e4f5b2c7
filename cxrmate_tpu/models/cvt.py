"""CvT (Convolutional vision Transformer) encoder, TPU-first and functional.

Re-implements the behaviour of HF ``CvtModel`` + the reference's projection head
(`/root/reference/modules/transformers/single_model/modelling_single.py:25-78`):
three stages of conv token embedding + conv-projection attention, cls token in the
last stage only, followed by LayerNorm + bias-free projection to the decoder width.

Layout is NHWC end-to-end (TPU-native); the public entry accepts NCHW pixel values
for API parity with the reference and transposes once. All parameters live in plain
nested dicts; BatchNorm running statistics live in a separate ``batch_stats`` tree
(only consulted in eval mode, only updated in train mode — torch semantics).

HF quirks intentionally reproduced (needed for checkpoint parity):
  * attention scale is ``embed_dim ** -0.5`` (the full stage width, not head_dim);
  * internal LayerNorms use eps 1e-5 (torch default), the projection head uses the
    config eps (1e-12);
  * stochastic depth rate is ``linspace(0, rate_s, depth_s)[s]`` for every layer of
    stage ``s`` (HF indexes the schedule by stage);
  * the second residual connection is taken *inside* drop-path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cxrmate_tpu.configs import CvtConfig
from cxrmate_tpu.ops.layers import (
    attention,
    batch_norm_infer,
    batch_norm_train,
    conv2d,
    dropout,
    gelu,
    layer_norm,
    linear,
    merge_heads,
    split_heads,
)


# --------------------------------------------------------------------------- init
def _linear_init(rng, fan_in, fan_out, std=0.02, bias=True):
    k1, _ = jax.random.split(rng)
    p = {"w": jax.random.normal(k1, (fan_in, fan_out)) * std}
    if bias:
        p["b"] = jnp.zeros((fan_out,))
    return p


def _ln_init(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def init_cvt_variables(rng, config: CvtConfig):
    """Initialise {'params', 'batch_stats'} for the encoder + projection head."""
    params, stats = {"stages": []}, {"stages": []}
    in_ch = config.num_channels
    for s in range(config.num_stages):
        rng, *ks = jax.random.split(rng, 8)
        dim = config.embed_dim[s]
        k = config.kernel_qkv[s]
        stage_p = {
            "embed": {
                "w": jax.random.normal(ks[0], (config.patch_sizes[s], config.patch_sizes[s], in_ch, dim)) * 0.02,
                "b": jnp.zeros((dim,)),
                "ln": _ln_init(dim),
            },
            "layers": [],
        }
        stage_s = {"layers": []}
        if config.cls_token[s]:
            stage_p["cls_token"] = jax.random.normal(ks[1], (1, 1, config.embed_dim[-1])) * 0.02
        for _ in range(config.depth[s]):
            rng, *kl = jax.random.split(rng, 10)
            layer_p = {
                "ln_before": _ln_init(dim),
                "ln_after": _ln_init(dim),
                "attn": {
                    "conv_q": {"w": jax.random.normal(kl[0], (k, k, 1, dim)) * 0.02},
                    "conv_k": {"w": jax.random.normal(kl[1], (k, k, 1, dim)) * 0.02},
                    "conv_v": {"w": jax.random.normal(kl[2], (k, k, 1, dim)) * 0.02},
                    "bn_q": _ln_init(dim),
                    "bn_k": _ln_init(dim),
                    "bn_v": _ln_init(dim),
                    "q": _linear_init(kl[3], dim, dim, bias=config.qkv_bias[s]),
                    "k": _linear_init(kl[4], dim, dim, bias=config.qkv_bias[s]),
                    "v": _linear_init(kl[5], dim, dim, bias=config.qkv_bias[s]),
                    "out": _linear_init(kl[6], dim, dim),
                },
                "mlp": {
                    "fc1": _linear_init(kl[7], dim, int(dim * config.mlp_ratio[s])),
                    "fc2": _linear_init(kl[8], int(dim * config.mlp_ratio[s]), dim),
                },
            }
            layer_s = {
                "bn_q": {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))},
                "bn_k": {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))},
                "bn_v": {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))},
            }
            stage_p["layers"].append(layer_p)
            stage_s["layers"].append(layer_s)
        params["stages"].append(stage_p)
        stats["stages"].append(stage_s)
        in_ch = dim
    rng, kp = jax.random.split(rng)
    params["projection_head"] = {
        "ln": _ln_init(config.embed_dim[-1]),
        "proj": {"w": jax.random.normal(kp, (config.embed_dim[-1], config.projection_size)) * 0.02},
    }
    return {"params": params, "batch_stats": stats}


# ------------------------------------------------------------------------ forward
def _drop_path(x, rate, train, rng):
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, shape, dtype=x.dtype))
    return x / keep * mask


def _stage_drop_path_rate(config: CvtConfig, s: int) -> float:
    # HF quirk: linspace over depth, indexed by the *stage* number.
    import numpy as np

    depth = config.depth[s]
    sched = np.linspace(0, config.drop_path_rate[s], depth)
    return float(sched[s]) if s < depth else float(sched[-1])


def _attention_block(p, stats, tokens, hw, config, s, train, rng,
                     use_flash=False, flash_interpret=False):
    """CvT self-attention on [B, T(+cls), D] tokens with a 2-D conv projection."""
    h, w = hw
    dim = config.embed_dim[s]
    heads = config.num_heads[s]
    with_cls = config.cls_token[s]
    new_stats = {}

    if with_cls:
        cls, grid_tokens = tokens[:, :1], tokens[:, 1:]
    else:
        cls, grid_tokens = None, tokens
    b = grid_tokens.shape[0]
    grid = grid_tokens.reshape(b, h, w, dim)

    def project(name, stride, padding):
        y = conv2d(p[f"conv_{name}"]["w"], grid, stride=stride, padding=padding, groups=dim)
        if train:
            y, ns = batch_norm_train(
                p[f"bn_{name}"], stats[f"bn_{name}"], y, config.batch_norm_eps, config.batch_norm_momentum
            )
            new_stats[f"bn_{name}"] = ns
        else:
            y = batch_norm_infer(p[f"bn_{name}"], stats[f"bn_{name}"], y, config.batch_norm_eps)
            new_stats[f"bn_{name}"] = stats[f"bn_{name}"]
        return y.reshape(b, -1, dim)

    k_tok = project("k", config.stride_kv[s], config.padding_kv[s])
    q_tok = project("q", config.stride_q[s], config.padding_q[s])
    v_tok = project("v", config.stride_kv[s], config.padding_kv[s])

    if with_cls:
        q_tok = jnp.concatenate([cls, q_tok], axis=1)
        k_tok = jnp.concatenate([cls, k_tok], axis=1)
        v_tok = jnp.concatenate([cls, v_tok], axis=1)

    q = split_heads(linear(p["q"], q_tok), heads)
    k = split_heads(linear(p["k"], k_tok), heads)
    v = split_heads(linear(p["v"], v_tok), heads)

    if use_flash and not (train and config.attention_drop_rate[s] > 0.0):
        from cxrmate_tpu.ops.flash_attention import flash_attention, flash_attention_grad

        bq, hq, lq, dh = q.shape
        lk = k.shape[2]
        if train:
            # differentiable variant: FlashAttention-2 backward via custom_vjp
            # (recomputed score blocks; no materialised score matrix in either pass)
            ctx = flash_attention_grad(
                q.reshape(bq * hq, lq, dh), k.reshape(bq * hq, lk, dh),
                v.reshape(bq * hq, lk, dh), dim ** -0.5,
                512, 512, flash_interpret,
            ).reshape(bq, hq, lq, dh)
        else:
            ctx = flash_attention(
                q.reshape(bq * hq, lq, dh), k.reshape(bq * hq, lk, dh),
                v.reshape(bq * hq, lk, dh), scale=dim ** -0.5,
                interpret=flash_interpret,
            ).reshape(bq, hq, lq, dh)
    else:
        ctx = attention(
            q, k, v, scale=dim ** -0.5,
            probs_dropout=config.attention_drop_rate[s], train=train, rng=rng,
        )
    out = merge_heads(ctx)
    out = linear(p["out"], out)
    if train and config.drop_rate[s] > 0.0 and rng is not None:
        out = dropout(out, config.drop_rate[s], jax.random.fold_in(rng, 1))
    return out, new_stats


def cvt_forward(
    params,
    batch_stats,
    pixel_values: jnp.ndarray,
    config: CvtConfig,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    use_flash: bool = False,
    flash_interpret: bool = False,
    remat: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], dict]:
    """Run the CvT trunk.

    Args:
      pixel_values: [B, C, H, W] (NCHW, API parity with the reference).
      remat: rematerialise each transformer layer in the backward pass
        (training only) — trades recompute for not storing the stage-0/1
        attention intermediates.
    Returns:
      (grid tokens [B, H*W, D_last], cls token [B, 1, D_last] or None, new batch_stats)
    """
    x = jnp.transpose(pixel_values, (0, 2, 3, 1))  # NCHW -> NHWC
    cls_out = None
    new_stats = {"stages": []}
    for s in range(config.num_stages):
        sp = params["stages"][s]
        x = conv2d(
            sp["embed"]["w"], x, stride=config.patch_stride[s],
            padding=config.patch_padding[s], b=sp["embed"]["b"],
        )
        b, h, w, dim = x.shape
        tokens = x.reshape(b, h * w, dim)
        tokens = layer_norm(sp["embed"]["ln"], tokens, config.internal_layer_norm_eps)
        if train and config.drop_rate[s] > 0.0 and rng is not None:
            rng, kd = jax.random.split(rng)
            tokens = dropout(tokens, config.drop_rate[s], kd)
        if config.cls_token[s]:
            cls = jnp.broadcast_to(sp["cls_token"].astype(tokens.dtype), (b, 1, dim))
            tokens = jnp.concatenate([cls, tokens], axis=1)

        dp_rate = _stage_drop_path_rate(config, s)
        stage_new_stats = {"layers": []}

        def layer_body(tokens, lp, lstats, k_attn, k_dp1, k_dp2, kd):
            attn_in = layer_norm(lp["ln_before"], tokens, config.internal_layer_norm_eps)
            attn_out, ns = _attention_block(
                lp["attn"], lstats, attn_in, (h, w), config, s, train, k_attn,
                use_flash=use_flash, flash_interpret=flash_interpret,
            )
            tokens = _drop_path(attn_out, dp_rate, train, k_dp1) + tokens

            y = layer_norm(lp["ln_after"], tokens, config.internal_layer_norm_eps)
            y = gelu(linear(lp["mlp"]["fc1"], y))
            y = linear(lp["mlp"]["fc2"], y)
            if kd is not None:
                y = dropout(y, config.drop_rate[s], kd)
            # HF quirk: the residual is added before drop-path is applied.
            return _drop_path(y + tokens, dp_rate, train, k_dp2), ns

        if remat and train:
            # memory knob: recompute each layer in the backward instead of
            # storing its intermediates. At the reference batch this measured
            # SLOWER (140 vs 121 ms/step, v5e) — XLA does not materialise the
            # stage-0 scores wholesale anyway — so it stays opt-in
            # (CXRMATE_REMAT_ENCODER=1) for memory-bound larger batches.
            layer_body = jax.checkpoint(layer_body)

        for li, lp in enumerate(sp["layers"]):
            lstats = batch_stats["stages"][s]["layers"][li]
            if rng is not None:
                rng, k_attn, k_dp1, k_dp2 = jax.random.split(rng, 4)
            else:
                k_attn = k_dp1 = k_dp2 = None
            if train and config.drop_rate[s] > 0.0 and rng is not None:
                rng, kd = jax.random.split(rng)
            else:
                kd = None
            tokens, ns = layer_body(tokens, lp, lstats, k_attn, k_dp1, k_dp2, kd)
            stage_new_stats["layers"].append(ns)

        if config.cls_token[s]:
            cls_out, tokens = tokens[:, :1], tokens[:, 1:]
        x = tokens.reshape(b, h, w, dim)
        new_stats["stages"].append(stage_new_stats)

    return tokens, cls_out, new_stats


def cvt_encode(
    params,
    batch_stats,
    pixel_values: jnp.ndarray,
    config: CvtConfig,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    use_flash: bool = False,
    flash_interpret: bool = False,
    remat: bool = False,
) -> Tuple[jnp.ndarray, dict]:
    """Full encoder: CvT trunk + projection head → [B, H*W, projection_size].

    Mirrors ``CvtWithProjectionHead.forward`` (modelling_single.py:53-78): the 2-D
    grid is flattened to tokens and projected; the cls token is unused.

    ``use_flash`` routes the attention through the Pallas flash kernel (no
    materialised scores — the fast path for long stage-0/1 sequences)."""
    tokens, _, new_stats = cvt_forward(
        params, batch_stats, pixel_values, config, train=train, rng=rng,
        use_flash=use_flash, flash_interpret=flash_interpret, remat=remat,
    )
    y = layer_norm(params["projection_head"]["ln"], tokens, config.layer_norm_eps)
    y = linear(params["projection_head"]["proj"], y)
    return y, new_stats
