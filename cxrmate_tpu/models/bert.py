"""BERT LM-head decoder with cross-attention, functional and cache-aware.

Re-implements the behaviour of HF ``BertLMHeadModel`` as used by the reference
(`/root/reference/modules/transformers/single_model/modelling_single.py:119`:
``BertConfig(is_decoder=True, add_cross_attention=True)``, eager attention), plus:

  * optional LoRA adapters on the self-attention query/key projections, matching the
    PEFT wrapping of the longitudinal checkpoints
    (`modelling_longitudinal.py:163-170`: r=8, alpha=32, dropout 0.1);
  * a static-shape KV cache (per-layer ``k/v`` of width ``max_len``) for
    ``lax.while_loop`` decoding: ``bert_prefill`` writes positions ``[0, P)`` and
    ``bert_step`` inserts one token at a dynamic index. Cross-attention K/V are
    computed once at prefill, exactly like HF's EncoderDecoderCache.

Numerics follow HF eager order: scores = q·kᵀ/√d + additive mask → softmax → ·v;
additive masks use ``(1 - m) * finfo.min``.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from cxrmate_tpu.configs import BertDecoderConfig, LoraConfig
from cxrmate_tpu.ops.layers import (
    attention,
    dropout,
    gelu,
    layer_norm,
    linear,
    lora_linear,
    merge_heads,
    split_heads,
)

NEG = float(jnp.finfo(jnp.float32).min)


# --------------------------------------------------------------------------- init
def _linear_init(rng, fan_in, fan_out, std=0.02):
    return {
        "w": jax.random.normal(rng, (fan_in, fan_out)) * std,
        "b": jnp.zeros((fan_out,)),
    }


def _ln_init(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def init_bert_params(rng, config: BertDecoderConfig, lora: Optional[LoraConfig] = None):
    d = config.hidden_size
    rng, k1, k2, k3 = jax.random.split(rng, 4)
    word = jax.random.normal(k1, (config.vocab_size, d)) * 0.02
    word = word.at[config.pad_token_id].set(0.0)  # torch padding_idx semantics
    params = {
        "embeddings": {
            "word": word,
            "position": jax.random.normal(k2, (config.max_position_embeddings, d)) * 0.02,
            "token_type": jax.random.normal(k3, (config.type_vocab_size, d)) * 0.02,
            "ln": _ln_init(d),
        },
        "layers": [],
    }
    for _ in range(config.num_hidden_layers):
        rng, *ks = jax.random.split(rng, 12)
        layer = {
            "self": {
                "q": _linear_init(ks[0], d, d),
                "k": _linear_init(ks[1], d, d),
                "v": _linear_init(ks[2], d, d),
                "out": _linear_init(ks[3], d, d),
                "ln": _ln_init(d),
            },
            "mlp": {
                "fc1": _linear_init(ks[4], d, config.intermediate_size),
                "fc2": _linear_init(ks[5], config.intermediate_size, d),
                "ln": _ln_init(d),
            },
        }
        if config.add_cross_attention:
            ce = config.cross_attention_hidden_size
            layer["cross"] = {
                "q": _linear_init(ks[6], d, d),
                "k": _linear_init(ks[7], ce, d),
                "v": _linear_init(ks[8], ce, d),
                "out": _linear_init(ks[9], d, d),
                "ln": _ln_init(d),
            }
        if lora is not None:
            for name, kk in (("q", ks[10]), ("k", rng)):
                layer["self"][name]["lora_a"] = jax.random.normal(kk, (d, lora.r)) * (1.0 / math.sqrt(d))
                layer["self"][name]["lora_b"] = jnp.zeros((lora.r, d))
        params["layers"].append(layer)
    rng, k4, k5 = jax.random.split(rng, 3)
    decoder_head = {"b": jnp.zeros((config.vocab_size,))}
    if not config.tie_word_embeddings:
        decoder_head["w"] = jax.random.normal(k5, (d, config.vocab_size)) * 0.02
    params["lm_head"] = {
        "transform": _linear_init(k4, d, d),
        "ln": _ln_init(d),
        # tied head: the projection reuses embeddings.word (see bert_lm_head)
        "decoder": decoder_head,
    }
    return params


# ---------------------------------------------------------------------- embeddings
def bert_embed(
    params,
    config: BertDecoderConfig,
    input_ids: jnp.ndarray,
    token_type_ids: Optional[jnp.ndarray],
    position_ids: jnp.ndarray,
    *,
    train: bool = False,
    rng=None,
    dtype=None,
) -> jnp.ndarray:
    e = params["embeddings"]
    x = jnp.take(e["word"], input_ids, axis=0)
    if dtype is not None:
        x = x.astype(dtype)
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    x = x + jnp.take(e["token_type"], token_type_ids, axis=0).astype(x.dtype)
    x = x + jnp.take(e["position"], position_ids, axis=0).astype(x.dtype)
    x = layer_norm(e["ln"], x, config.layer_norm_eps)
    if train:
        x = dropout(x, config.hidden_dropout_prob, rng)
    return x


def _self_attention(
    p,
    hidden,
    additive_mask,
    config: BertDecoderConfig,
    lora: Optional[LoraConfig],
    *,
    kv_hidden=None,
    train=False,
    rng=None,
):
    """Self-attention sublayer on full sequences (teacher forcing)."""
    rngs = jax.random.split(rng, 4) if rng is not None else [None] * 4
    if lora is not None:
        q = lora_linear(p["q"], hidden, lora.scaling, dropout_rate=lora.dropout, train=train, rng=rngs[0])
        k = lora_linear(p["k"], hidden, lora.scaling, dropout_rate=lora.dropout, train=train, rng=rngs[1])
    else:
        q = linear(p["q"], hidden)
        k = linear(p["k"], hidden)
    v = linear(p["v"], hidden)
    ctx = attention(
        split_heads(q, config.num_attention_heads),
        split_heads(k, config.num_attention_heads),
        split_heads(v, config.num_attention_heads),
        scale=1.0 / math.sqrt(config.head_dim),
        additive_mask=additive_mask,
        probs_dropout=config.attention_probs_dropout_prob,
        train=train,
        rng=rngs[2],
    )
    out = linear(p["out"], merge_heads(ctx))
    if train:
        out = dropout(out, config.hidden_dropout_prob, rngs[3])
    return layer_norm(p["ln"], out + hidden, config.layer_norm_eps)


def _cross_attention(p, hidden, enc_hidden, additive_mask, config, *, train=False, rng=None):
    rngs = jax.random.split(rng, 2) if rng is not None else [None, None]
    q = linear(p["q"], hidden)
    k = linear(p["k"], enc_hidden)
    v = linear(p["v"], enc_hidden)
    ctx = attention(
        split_heads(q, config.num_attention_heads),
        split_heads(k, config.num_attention_heads),
        split_heads(v, config.num_attention_heads),
        scale=1.0 / math.sqrt(config.head_dim),
        additive_mask=additive_mask,
        probs_dropout=config.attention_probs_dropout_prob,
        train=train,
        rng=rngs[0],
    )
    out = linear(p["out"], merge_heads(ctx))
    if train:
        out = dropout(out, config.hidden_dropout_prob, rngs[1])
    return layer_norm(p["ln"], out + hidden, config.layer_norm_eps)


def _mlp(p, hidden, config, *, train=False, rng=None):
    y = gelu(linear(p["fc1"], hidden))
    y = linear(p["fc2"], y)
    if train:
        y = dropout(y, config.hidden_dropout_prob, rng)
    return layer_norm(p["ln"], y + hidden, config.layer_norm_eps)


def bert_lm_head(params, hidden) -> jnp.ndarray:
    h = linear(params["lm_head"]["transform"], hidden)
    h = gelu(h)
    h = layer_norm(params["lm_head"]["ln"], h, 1e-12)
    head = params["lm_head"]["decoder"]
    if "w" in head:
        return linear(head, h)
    # tied projection: share the word-embedding matrix (HF tie_word_embeddings),
    # so embedding gradients include the LM-head term exactly like torch
    w = params["embeddings"]["word"]
    logits = jnp.matmul(h, w.T, preferred_element_type=jnp.float32)
    return (logits + head["b"].astype(jnp.float32)).astype(h.dtype)


def causal_additive_mask(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """[B, L] padding mask → [B, 1, L, L] additive causal+padding mask
    (torch ``get_extended_attention_mask`` for decoders)."""
    b, l = attention_mask.shape
    causal = jnp.tril(jnp.ones((l, l), dtype=jnp.float32))
    combined = causal[None, :, :] * attention_mask[:, None, :].astype(jnp.float32)
    return ((1.0 - combined) * NEG)[:, None, :, :]


def padding_additive_mask(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """[B, K] key padding mask → [B, 1, 1, K] additive mask."""
    m = attention_mask.astype(jnp.float32)
    return ((1.0 - m) * NEG)[:, None, None, :]


def bert_forward(
    params,
    config: BertDecoderConfig,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    token_type_ids: Optional[jnp.ndarray] = None,
    position_ids: Optional[jnp.ndarray] = None,
    encoder_hidden_states: Optional[jnp.ndarray] = None,
    encoder_attention_mask: Optional[jnp.ndarray] = None,
    *,
    lora: Optional[LoraConfig] = None,
    train: bool = False,
    rng=None,
) -> jnp.ndarray:
    """Full-sequence (teacher-forcing) forward → logits [B, L, V]."""
    b, l = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((b, l), dtype=jnp.int32)
    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(l), (b, l))
    self_mask = causal_additive_mask(attention_mask)
    cross_mask = None
    if encoder_hidden_states is not None and encoder_attention_mask is not None:
        cross_mask = padding_additive_mask(encoder_attention_mask)

    rngs = jax.random.split(rng, config.num_hidden_layers * 3 + 1) if rng is not None else None
    hidden = bert_embed(
        params, config, input_ids, token_type_ids, position_ids,
        train=train, rng=rngs[0] if rngs is not None else None,
        dtype=encoder_hidden_states.dtype if encoder_hidden_states is not None else None,
    )
    for i, layer in enumerate(params["layers"]):
        r = rngs[1 + 3 * i : 4 + 3 * i] if rngs is not None else [None] * 3
        hidden = _self_attention(layer["self"], hidden, self_mask, config, lora, train=train, rng=r[0])
        if encoder_hidden_states is not None and "cross" in layer:
            hidden = _cross_attention(layer["cross"], hidden, encoder_hidden_states, cross_mask, config, train=train, rng=r[1])
        hidden = _mlp(layer["mlp"], hidden, config, train=train, rng=r[2])
    return bert_lm_head(params, hidden)


# ------------------------------------------------------------------ cached decode
@dataclasses.dataclass
class DecodeCache:
    """Static-shape KV cache: per-layer tuples of [B, H, T, Dh] (T = max sequence
    length) for self-attention and [B, H, S, Dh] for cross-attention (computed once
    at prefill). Per-layer arrays keep the fused decode kernel's in-place aliasing
    natural and avoid leading-dim dynamic slices."""

    self_k: Tuple[jnp.ndarray, ...]
    self_v: Tuple[jnp.ndarray, ...]
    cross_k: Tuple[jnp.ndarray, ...]
    cross_v: Tuple[jnp.ndarray, ...]


jax.tree_util.register_dataclass(
    DecodeCache, data_fields=["self_k", "self_v", "cross_k", "cross_v"], meta_fields=[]
)


def init_cache(
    config: BertDecoderConfig, batch: int, max_len: int, enc_len: int, dtype=jnp.float32
) -> DecodeCache:
    l, h, dh = config.num_hidden_layers, config.num_attention_heads, config.head_dim
    return DecodeCache(
        self_k=tuple(jnp.zeros((batch, h, max_len, dh), dtype) for _ in range(l)),
        self_v=tuple(jnp.zeros((batch, h, max_len, dh), dtype) for _ in range(l)),
        cross_k=tuple(jnp.zeros((batch, h, enc_len, dh), dtype) for _ in range(l)),
        cross_v=tuple(jnp.zeros((batch, h, enc_len, dh), dtype) for _ in range(l)),
    )


def quantize_cross_cache(cache: DecodeCache):
    """Int8-quantise the (prefill-computed, loop-invariant) cross-KV cache for
    the ``cross-rowgroup-q8`` serving decode.

    Returns ``(cache', cross_q8)`` where ``cross_q8`` is a per-layer tuple of
    ``(kq int8, kscale f32 [B,H,1,S], vq int8, vscale f32)`` (see
    ``ops.decode_attention.quantize_kv_rowwise``) and ``cache'`` carries
    ZERO-WIDTH cross tensors ([B, H, 0, Dh] — batch dim and dtype preserved
    for the places that read them). The decode while-loop bodies close over
    ``cross_q8`` as loop-invariant constants instead of carrying ~2× the bytes
    (bf16 + int8) through the carry; ``bert_step`` requires ``cross_q8`` when
    the resolved spec is ``cross-rowgroup-q8``. Serving-only numerics — the
    parity/golden-CSV paths keep the exact bf16 cache."""
    from cxrmate_tpu.ops.decode_attention import quantize_kv_rowwise

    cross_q8 = tuple(
        quantize_kv_rowwise(ck) + quantize_kv_rowwise(cv)
        for ck, cv in zip(cache.cross_k, cache.cross_v)
    )
    return (
        DecodeCache(
            self_k=cache.self_k,
            self_v=cache.self_v,
            cross_k=tuple(x[:, :, :0, :] for x in cache.cross_k),
            cross_v=tuple(x[:, :, :0, :] for x in cache.cross_v),
        ),
        cross_q8,
    )


def maybe_quantize_cross_cache(cache: DecodeCache, decode_kernel):
    """``quantize_cross_cache`` iff the resolved ``decode_kernel`` spec is
    ``cross-rowgroup-q8[:G]``; otherwise ``(cache, None)``. The single home of
    the q8-spec check for the three decode loops (greedy / beam / SCST
    rollout) — ``bert_step`` re-validates the pairing at trace time."""
    if decode_kernel and decode_kernel.startswith("cross-rowgroup-q8"):
        return quantize_cross_cache(cache)
    return cache, None


def bert_prefill(
    params,
    config: BertDecoderConfig,
    cache: DecodeCache,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    token_type_ids: jnp.ndarray,
    position_ids: jnp.ndarray,
    encoder_hidden_states: jnp.ndarray,
    encoder_attention_mask: jnp.ndarray,
    *,
    lora: Optional[LoraConfig] = None,
) -> Tuple[jnp.ndarray, DecodeCache]:
    """Process the prompt (positions [0, P)) and fill the cache.

    Returns (logits [B, P, V], cache)."""
    b, p_len = input_ids.shape
    heads = config.num_attention_heads
    self_mask = causal_additive_mask(attention_mask)
    cross_mask = padding_additive_mask(encoder_attention_mask)
    hidden = bert_embed(
        params, config, input_ids, token_type_ids, position_ids, dtype=encoder_hidden_states.dtype
    )
    self_k, self_v = list(cache.self_k), list(cache.self_v)
    cross_k, cross_v = list(cache.cross_k), list(cache.cross_v)
    for i, layer in enumerate(params["layers"]):
        sp = layer["self"]
        if lora is not None:
            q = lora_linear(sp["q"], hidden, lora.scaling)
            k = lora_linear(sp["k"], hidden, lora.scaling)
        else:
            q = linear(sp["q"], hidden)
            k = linear(sp["k"], hidden)
        v = linear(sp["v"], hidden)
        qh, kh, vh = (split_heads(t, heads) for t in (q, k, v))
        self_k[i] = jax.lax.dynamic_update_slice(self_k[i], kh.astype(self_k[i].dtype), (0, 0, 0, 0))
        self_v[i] = jax.lax.dynamic_update_slice(self_v[i], vh.astype(self_v[i].dtype), (0, 0, 0, 0))
        ctx = attention(qh, kh, vh, 1.0 / math.sqrt(config.head_dim), self_mask)
        hidden = layer_norm(sp["ln"], linear(sp["out"], merge_heads(ctx)) + hidden, config.layer_norm_eps)

        cp = layer["cross"]
        ck = split_heads(linear(cp["k"], encoder_hidden_states), heads)
        cv = split_heads(linear(cp["v"], encoder_hidden_states), heads)
        cross_k[i] = ck.astype(cross_k[i].dtype)
        cross_v[i] = cv.astype(cross_v[i].dtype)
        cq = split_heads(linear(cp["q"], hidden), heads)
        cctx = attention(cq, ck, cv, 1.0 / math.sqrt(config.head_dim), cross_mask)
        hidden = layer_norm(cp["ln"], linear(cp["out"], merge_heads(cctx)) + hidden, config.layer_norm_eps)

        hidden = _mlp(layer["mlp"], hidden, config)
    logits = bert_lm_head(params, hidden)
    return logits, DecodeCache(tuple(self_k), tuple(self_v), tuple(cross_k), tuple(cross_v))


def bert_step(
    params,
    config: BertDecoderConfig,
    cache: DecodeCache,
    input_id: jnp.ndarray,
    token_type_id: jnp.ndarray,
    position_id: jnp.ndarray,
    index: jnp.ndarray,
    key_mask: jnp.ndarray,
    encoder_attention_mask: jnp.ndarray,
    *,
    lora: Optional[LoraConfig] = None,
    use_fused: bool = False,
    fused_prepared: Optional[list] = None,
    deferred_write: bool = False,
    decode_kernel: Optional[str] = None,
    cross_q8: Optional[tuple] = None,
) -> Tuple[jnp.ndarray, DecodeCache]:
    """One decode step: token at dynamic position ``index``.

    Args:
      input_id/token_type_id/position_id: [B] current-token ids.
      index: scalar int32, the cache slot to write (== number of tokens so far).
      key_mask: [B, T] 1 for attendable cache positions ≤ index (the caller builds
        this from its running sequence: pads masked for the longitudinal variant,
        all-ones-up-to-index for single/multi — HF semantics).
      use_fused: route each layer through the fused Pallas kernel
        (ops/fused_decode.py) when supported.
      deferred_write: do NOT write this step's K/V into the cache. Attention
        instead reads ``where(col == index, new_kv, cache)`` — the select fuses
        into the score/context reductions, so the logits are bit-identical to
        the written-cache path with no materialised cache update. Returns
        ``(logits, (new_k_tuple, new_v_tuple))`` (each entry [B, H, Dh]) instead
        of an updated cache; the caller owns folding the new column into its
        cache carry. Beam search uses this to fuse the per-step cache write
        into its beam-reorder pass (generate/beam.py) — a separate
        dynamic-update-slice on the beam-reordered cache layout cost ~4.5 ms per
        step at batch 32 (sub-tile read-modify-writes).
      decode_kernel: resolved Pallas decode-attention routing spec (see
        ``ops.decode_attention.resolve_decode_kernel``; "" = XLA everywhere).
        ``None`` reads ``CXRMATE_DECODE_KERNEL`` at TRACE time — the public
        decode loops resolve it at call time and pass it through as a static
        jit arg so env changes between calls take effect.
      cross_q8: per-layer ``(kq, kscale, vq, vscale)`` tuples from
        ``quantize_cross_cache`` — REQUIRED (and only meaningful) when the
        resolved spec is ``cross-rowgroup-q8[:G]``; the cache's own cross
        tensors are then zero-width placeholders and cross-attention runs the
        int8 Pallas kernel. Loop-invariant: callers close their while bodies
        over it instead of carrying it.
    Returns (logits [B, V], updated cache) — or (logits, new-kv tuples) when
    ``deferred_write`` is set.
    """
    heads = config.num_attention_heads
    hidden = bert_embed(
        params, config, input_id[:, None], token_type_id[:, None], position_id[:, None],
        dtype=cache.cross_k[0].dtype,
    )
    from cxrmate_tpu.ops.decode_attention import (
        decode_attention,
        decode_attention_rowgrid,
        decode_attention_rowgroup,
        decode_attention_rowgroup_q8,
        parse_group,
        resolve_decode_kernel,
    )

    decode_kernel = resolve_decode_kernel(decode_kernel)
    if use_fused and lora is None and not deferred_write:
        if decode_kernel:
            import warnings

            warnings.warn(
                "CXRMATE_DECODE_KERNEL=%r is ignored on the fused decode path "
                "(use_fused=True routes whole layers through ops/fused_decode.py, "
                "which has no per-module attention routing) — unset one of the two "
                "knobs" % decode_kernel,
                RuntimeWarning,
            )
        from cxrmate_tpu.ops.fused_decode import fused_layer_step_v2

        h = hidden[:, 0, :]
        self_k, self_v = list(cache.self_k), list(cache.self_v)
        for i, layer in enumerate(params["layers"]):
            h, self_k[i], self_v[i] = fused_layer_step_v2(
                h, layer, self_k[i], self_v[i], cache.cross_k[i], cache.cross_v[i],
                index, key_mask, encoder_attention_mask, eps=config.layer_norm_eps,
                # per-layer head-major views, built ONCE per generate call by
                # the caller (fused_decode's contract) — not rebuilt per step
                prepared=fused_prepared[i] if fused_prepared is not None else None,
            )
        logits = bert_lm_head(params, h[:, None, :])
        return logits[:, 0, :], DecodeCache(
            tuple(self_k), tuple(self_v), cache.cross_k, cache.cross_v
        )
    is_q8 = decode_kernel.startswith("cross-rowgroup-q8")
    if is_q8 != (cross_q8 is not None):
        raise ValueError(
            "cross-rowgroup-q8 requires the caller to pass quantize_cross_cache's "
            "cross_q8 tuples (and cross_q8 is only valid with that spec); got "
            f"decode_kernel={decode_kernel!r}, cross_q8={'set' if cross_q8 else 'None'}"
        )
    q8_group = parse_group(decode_kernel) if is_q8 else None
    self_mask2d = ((1.0 - key_mask.astype(jnp.float32)) * NEG)  # [B, T] additive
    cross_mask2d = ((1.0 - encoder_attention_mask.astype(jnp.float32)) * NEG)
    self_mask = self_mask2d[:, None, None, :]  # [B,1,1,T]
    cross_mask = cross_mask2d[:, None, None, :]
    bsz = hidden.shape[0]
    # Beam search shares one cross-KV cache per study across its beams (the KV is
    # identical for every beam; tiling it K× would K× the dominant HBM traffic of
    # the decode step). When the cross cache batch is B/K, fold the K beams into
    # the matmul M dimension: q [B, H, K, Dh] @ k [B, H, S, Dh]ᵀ — exactly the
    # same math as the tiled form, with K× less KV streaming and an MXU-friendlier
    # M=K tile.
    groups = cache.cross_k[0].shape[0]
    beams = bsz // groups
    scale = 1.0 / math.sqrt(config.head_dim)
    # the Pallas decode-attention kernel avoids XLA's HBM-materialised
    # multiply-reduce lowering of M=1 attention (see ops/decode_attention.py)
    interpret = jax.default_backend() != "tpu"

    use_blockdiag = os.environ.get("CXRMATE_BLOCKDIAG_ATTN", "0") == "1"

    def attn_blockdiag(qh, kh, vh, mask2d):
        """M=1 attention with all heads folded into the matmul M dimension.

        scores[b,h,s] = q[b,h]·k[b,h,s] is expressed as a single dot per batch
        row by expanding q to a block-diagonal [B, H, H, dh] (zeros off the
        h==h' block): contracting (h', dh) against k [B, h', S, dh] yields the
        same per-head products plus exact zeros — an MXU dot (M=H) instead of
        XLA's VPU multiply_reduce lowering of the M=1 einsum. Adds exact zeros
        to each f32 reduction, so values can differ from the einsum path by
        reduction order only (~1 ulp). Measured NEUTRAL on the axon v5e
        (greedy-96: 44.0 vs 45.0 studies/s — the expanded block-diagonal
        operands cost what the dot saves), so it stays opt-in
        (CXRMATE_BLOCKDIAG_ATTN=1) as groundwork for backends with faster dot
        emitters."""
        b_, h_, _, dh_ = qh.shape
        eye = jnp.eye(h_, dtype=qh.dtype)
        qbd = qh[:, :, 0, None, :] * eye[None, :, :, None]  # [B, H, H', dh]
        scores = jax.lax.dot_general(
            qbd, kh, (((2, 3), (1, 3)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [B, H, S]
        scores = scores * scale + mask2d[:, None, :]
        probs = jax.nn.softmax(scores, axis=-1).astype(qh.dtype)
        pbd = probs[:, :, None, :] * eye[None, :, :, None]  # [B, H, H', S]
        ctx = jax.lax.dot_general(
            pbd, vh, (((2, 3), (1, 2)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [B, H, dh]
        return ctx.astype(qh.dtype)[:, :, None, :]

    def attn(qh, kh, vh, mask4d, mask2d, is_cross=False):
        # a "cross-" prefix routes ONLY the cross-attention (the large
        # encoder-length KV stream, where per-call overhead amortises over
        # MB-scale blocks) through the kernel, keeping XLA's fused lowering
        # for the small segmented self-attention
        spec = decode_kernel
        if spec.startswith("cross-"):
            spec = spec[len("cross-"):] if is_cross else ""
        if spec == "rowgrid":
            return decode_attention_rowgrid(qh, kh, vh, mask2d, scale, interpret=interpret)
        if spec.startswith("vpu-rowgroup"):  # "vpu-rowgroup" or "vpu-rowgroup:<G>"
            from cxrmate_tpu.ops.decode_attention import decode_attention_rowgroup_vpu

            return decode_attention_rowgroup_vpu(qh, kh, vh, mask2d, scale,
                                                 group=parse_group(spec),
                                                 interpret=interpret)
        if spec.startswith("rowgroup"):  # "rowgroup" or "rowgroup:<G>"
            return decode_attention_rowgroup(qh, kh, vh, mask2d, scale,
                                             group=parse_group(spec),
                                             interpret=interpret)
        if spec:
            return decode_attention(qh, kh, vh, mask2d, scale, interpret=interpret)
        # the single shared XLA fallback (both the kernel-off default and the
        # self-attention side of a "cross-" routing land here)
        if use_blockdiag and qh.shape[2] == 1:
            return attn_blockdiag(qh, kh, vh, mask2d)
        return attention(qh, kh, vh, scale, mask4d)

    def cross_attn(cqh, i):
        # the q8 path bypasses attn(): its operands are the int8 tensors +
        # scales (the cache's own cross entries are zero-width placeholders)
        if cross_q8 is not None:
            kq, ks, vq, vs = cross_q8[i]
            return decode_attention_rowgroup_q8(
                cqh, kq, ks, vq, vs, cross_mask2d, scale,
                group=q8_group, interpret=interpret,
            )
        return attn(cqh, cache.cross_k[i], cache.cross_v[i], cross_mask,
                    cross_mask2d, is_cross=True)

    self_k, self_v = list(cache.self_k), list(cache.self_v)
    pend_k, pend_v = [], []
    t_cols = jnp.arange(cache.self_k[0].shape[2])
    for i, layer in enumerate(params["layers"]):
        sp = layer["self"]
        if lora is not None:
            q = lora_linear(sp["q"], hidden, lora.scaling)
            k = lora_linear(sp["k"], hidden, lora.scaling)
        else:
            q = linear(sp["q"], hidden)
            k = linear(sp["k"], hidden)
        v = linear(sp["v"], hidden)
        qh, kh, vh = (split_heads(t, heads) for t in (q, k, v))  # [B,H,1,Dh]
        if deferred_write:
            # virtual write: the select fuses into the attention reductions —
            # same values at every column as the written cache, nothing stored
            is_new = (t_cols == index)[None, None, :, None]
            k_read = jnp.where(is_new, kh.astype(self_k[i].dtype), self_k[i])
            v_read = jnp.where(is_new, vh.astype(self_v[i].dtype), self_v[i])
            pend_k.append(kh.astype(self_k[i].dtype)[:, :, 0, :])
            pend_v.append(vh.astype(self_v[i].dtype)[:, :, 0, :])
        else:
            self_k[i] = jax.lax.dynamic_update_slice(self_k[i], kh.astype(self_k[i].dtype), (0, 0, index, 0))
            self_v[i] = jax.lax.dynamic_update_slice(self_v[i], vh.astype(self_v[i].dtype), (0, 0, index, 0))
            k_read, v_read = self_k[i], self_v[i]
        ctx = attn(qh, k_read, v_read, self_mask, self_mask2d)
        hidden = layer_norm(sp["ln"], linear(sp["out"], merge_heads(ctx)) + hidden, config.layer_norm_eps)

        cp = layer["cross"]
        cq = linear(cp["q"], hidden)  # [B, 1, D]
        if beams == 1:
            cctx = merge_heads(cross_attn(split_heads(cq, heads), i))
        else:
            cqh = cq.reshape(groups, beams, heads, config.head_dim).transpose(0, 2, 1, 3)
            gctx = cross_attn(cqh, i)
            cctx = gctx.transpose(0, 2, 1, 3).reshape(bsz, 1, heads * config.head_dim)
        hidden = layer_norm(cp["ln"], linear(cp["out"], cctx) + hidden, config.layer_norm_eps)

        hidden = _mlp(layer["mlp"], hidden, config)
    logits = bert_lm_head(params, hidden)
    if deferred_write:
        return logits[:, 0, :], (tuple(pend_k), tuple(pend_v))
    return logits[:, 0, :], DecodeCache(tuple(self_k), tuple(self_v), cache.cross_k, cache.cross_v)
