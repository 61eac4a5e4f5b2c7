"""Static-shape beam search in a single ``lax.while_loop``.

A faithful JAX port of the HF (transformers 4.57) `_beam_search` semantics the
reference relies on for its test-time decoding (`num_test_beams: 4`,
`config/train/single_tf.yaml:24`): 2K candidate continuations per step, finished-beam
finalisation restricted to the top-K candidates, length penalty applied at
finalisation, the early-stop heuristic of ``early_stopping=False``, and pad-filled
static sequence buffers. Token-identity vs HF is asserted in tests/test_generate_beam.py.

Unlike HF we run the prompt prefill once per batch item and tile the KV cache across
beams (identical numerics, K× less prefill compute)."""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cxrmate_tpu.configs import EncoderDecoderConfig
from cxrmate_tpu.generate.decode import (
    GenerationConfig,
    grow_cache,
    resolve_cache_segments,
    segment_bounds,
    segmented_while,
)
from cxrmate_tpu.models import bert as bert_mod
from cxrmate_tpu.models import encoder_decoder as ed

NEG = -1.0e9


def _gather_beams(tensor, beam_indices):
    """[B, K_src, ...] gathered along dim 1 by [B, K_out] indices."""
    idx = beam_indices
    while idx.ndim < tensor.ndim:
        idx = idx[..., None]
    return jnp.take_along_axis(tensor, idx.astype(jnp.int32), axis=1)


def resolve_write_mode(write_mode: Optional[str]) -> str:
    """Resolve the beam self-KV write strategy (trace-time static): explicit
    value, else ``CXRMATE_BEAM_WRITE`` (default 'fused' — the measured-fastest
    formulation, DEVNOTES round 3)."""
    if write_mode is None:
        import os

        write_mode = os.environ.get("CXRMATE_BEAM_WRITE", "fused")
    assert write_mode in ("fused", "dus", "pallas"), write_mode
    return write_mode


def beam_search(
    variables,
    config: EncoderDecoderConfig,
    gen_cfg: GenerationConfig,
    encoder_hidden: jnp.ndarray,
    encoder_mask: jnp.ndarray,
    prompt_ids: jnp.ndarray,
    prompt_mask: jnp.ndarray,
    prompt_logits_col: Optional[int] = None,
    write_mode: Optional[str] = None,
    cache_segments: Optional[int] = None,
    decode_kernel: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Public entry for beam-search decode — see ``_beam_search`` for the full
    argument docs. Resolves the env-dependent static knobs (``write_mode`` →
    ``CXRMATE_BEAM_WRITE``, ``cache_segments`` → ``CXRMATE_CACHE_SEGMENTS``,
    ``decode_kernel`` → ``CXRMATE_DECODE_KERNEL``) at CALL time, outside jit,
    so the jit cache is keyed on the RESOLVED values: changing the env between
    calls in one process takes effect instead of silently reusing the trace
    cached under ``None``."""
    from cxrmate_tpu.ops.decode_attention import resolve_decode_kernel

    return _beam_search(
        variables, config, gen_cfg, encoder_hidden, encoder_mask,
        prompt_ids, prompt_mask, prompt_logits_col,
        write_mode=resolve_write_mode(write_mode),
        cache_segments=resolve_cache_segments(cache_segments),
        decode_kernel=resolve_decode_kernel(decode_kernel),
    )


# prompt_logits_col is NOT static — see generate(): a static column would
# recompile per distinct true prompt width despite the width bucketing
@partial(jax.jit, static_argnames=("config", "gen_cfg", "write_mode", "cache_segments",
                                   "decode_kernel"))
def _beam_search(
    variables,
    config: EncoderDecoderConfig,
    gen_cfg: GenerationConfig,
    encoder_hidden: jnp.ndarray,
    encoder_mask: jnp.ndarray,
    prompt_ids: jnp.ndarray,
    prompt_mask: jnp.ndarray,
    prompt_logits_col: Optional[int] = None,
    write_mode: Optional[str] = None,
    cache_segments: Optional[int] = None,
    decode_kernel: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam-search decode → (sequences [B, P + max_new], scores [B]).

    Sequences are the best finished hypothesis per batch item (HF
    ``num_return_sequences=1``), pad-filled to the static width.

    ``write_mode`` selects how the per-step self-KV column lands in the cache —
    both produce IDENTICAL values (same numbers, different data movement):
      * 'fused' (default): ``bert_step(deferred_write=True)`` — attention reads a
        virtual ``where(col==i, new, cache)``; the column is folded into the
        beam-reorder one-hot dot.
      * 'dus': ``bert_step`` writes the column with dynamic_update_slice before
        attention, and the reorder dot runs without the fused write. With the
        reorder as a dot (not the round-2 gather that forced a T-minor layout),
        the DUS is tile-aligned — this skips the virtual-read select pass that
        XLA materialises at ~full cache size per step. (Measured 40-50% slower
        than 'fused' on the axon v5e — DEVNOTES round 3.)
      * 'pallas': attention reads the virtual column like 'fused', but the
        reorder + column write is the IN-PLACE Pallas kernel
        (ops/beam_reorder.py, ``input_output_aliases``) — no while-carry
        double-buffer copy of the cache (~1.6 ms/step at longitudinal b24).
    The public ``beam_search`` wrapper resolves ``CXRMATE_BEAM_WRITE`` at call
    time, so env changes between calls take effect (no stale cached trace).

    ``cache_segments``: segmented cache growth — decode in N phases with a
    narrower self-KV cache early, zero-padding it up between phases
    (bit-identical; see ``decode.segment_bounds``). Every cache-width-scaled
    step cost (reorder dot, virtual-read select, while-carry copies) shrinks
    to the phase width. None reads ``CXRMATE_CACHE_SEGMENTS`` (default
    "4:32" — measured best, DEVNOTES round 3)."""
    if write_mode is None:
        import os

        write_mode = os.environ.get("CXRMATE_BEAM_WRITE", "fused")
    assert write_mode in ("fused", "dus", "pallas"), write_mode
    params = variables["params"]["decoder"]
    dcfg = config.decoder
    k = gen_cfg.num_beams
    b, p_len = prompt_ids.shape
    max_new = gen_cfg.max_new_tokens
    t_total = p_len + max_new
    bounds = segment_bounds(p_len, max_new, *resolve_cache_segments(cache_segments))
    keep = 2 * k  # beams_to_keep with one EOS token
    vocab = dcfg.vocab_size
    masked_pads = gen_cfg.mask_token_id is not None
    penalty = gen_cfg.length_penalty
    early_stopping = gen_cfg.early_stopping

    # ---- prefill once per batch item ----
    prompt_types = ed.token_ids_to_token_type_ids(
        prompt_ids, gen_cfg.special_token_ids, gen_cfg.sections()
    )
    if masked_pads:
        attn_prompt = (prompt_ids != gen_cfg.mask_token_id).astype(jnp.int32)
        prompt_pos = ed.cumulative_position_ids(attn_prompt)
    else:
        attn_prompt = jnp.ones((b, p_len), dtype=jnp.int32)
        prompt_pos = jnp.broadcast_to(jnp.arange(p_len), (b, p_len))
    cache = bert_mod.init_cache(dcfg, b, bounds[0], encoder_hidden.shape[1], dtype=encoder_hidden.dtype)
    with jax.named_scope("prefill"):
        prefill_logits, cache = bert_mod.bert_prefill(
            params, dcfg, cache, prompt_ids, attn_prompt, prompt_types, prompt_pos,
            encoder_hidden, encoder_mask, lora=config.lora,
        )

    # tile the SELF cache to B*K (beam-major within batch); the cross cache and
    # encoder mask stay at B — beams of a study share them, and bert_step folds
    # the K beam queries into the cross-attention matmul's M dimension (K× less
    # KV streaming per step than HF's expand_inputs_for_generation tiling,
    # identical numerics)
    def tile(x, axis=0):
        return jnp.repeat(x, k, axis=axis)

    cache = bert_mod.DecodeCache(
        self_k=tuple(tile(x) for x in cache.self_k),
        self_v=tuple(tile(x) for x in cache.self_v),
        cross_k=cache.cross_k,
        cross_v=cache.cross_v,
    )
    # int8 serving decode (see decode._generate): quantise the loop-invariant
    # B-shaped cross cache once (shared across a study's beams like the bf16
    # cache); the while bodies close over the q8 tensors
    cache, cross_q8 = bert_mod.maybe_quantize_cross_cache(cache, decode_kernel)
    enc_mask_flat = encoder_mask

    # ---- state ----
    seq = jnp.pad(
        prompt_ids[:, None, :].repeat(k, axis=1),
        ((0, 0), (0, 0), (0, max_new)),
        constant_values=gen_cfg.pad_token_id,
    )
    running_scores = jnp.full((b, k), NEG, jnp.float32).at[:, 0].set(0.0)
    fin_seq = seq
    fin_scores = jnp.full((b, k), NEG, jnp.float32)
    is_fin = jnp.zeros((b, k), bool)
    early_unsat = jnp.ones((b, 1), bool)
    top_k_mask = jnp.arange(keep) < k  # only top-K candidates may finalise

    cols = jnp.arange(t_total)

    def select_and_update(log_probs_flat, state, pending=None, write_idx=None):
        """One beam step given per-beam next-token log-probs [B*K, V].

        ``pending`` carries the step's new self-KV columns (from
        ``bert_step(deferred_write=True)``); they are folded into the cache
        during the beam-reorder pass below, so the cache is streamed exactly
        once per step (no separate dynamic-update-slice)."""
        seq, running_scores, fin_seq, fin_scores, is_fin, early_unsat, cache, cur = state
        log_probs = log_probs_flat.reshape(b, k, vocab) + running_scores[:, :, None]
        flat = log_probs.reshape(b, k * vocab)
        topk_log_probs, topk_idx = jax.lax.top_k(flat, keep)
        beam_idx = topk_idx // vocab
        tok = (topk_idx % vocab).astype(seq.dtype)
        topk_seq = _gather_beams(seq, beam_idx)
        topk_seq = jax.lax.dynamic_update_slice(topk_seq, tok[:, :, None], (0, 0, cur))

        # stopping criteria per candidate: EOS or max length reached
        hits = (tok == gen_cfg.eos_token_id) | (cur + 1 >= t_total)

        # finalisation (HF _update_finished_beams)
        gen_len = (cur + 1 - p_len).astype(jnp.float32)
        lp_scores = topk_log_probs / (gen_len ** penalty)
        can_finalise = hits & top_k_mask[None, :]
        lp_scores = lp_scores + jnp.where(can_finalise, 0.0, NEG)
        lp_scores = lp_scores + jnp.where(early_unsat, 0.0, NEG)
        if early_stopping:
            # HF: once a batch's beams are all finished, no further additions
            beams_full = jnp.all(is_fin, axis=-1, keepdims=True)
            lp_scores = lp_scores + jnp.where(beams_full, NEG, 0.0)
        merged_seq = jnp.concatenate([fin_seq, topk_seq], axis=1)
        merged_scores = jnp.concatenate([fin_scores, lp_scores], axis=1)
        merged_fin = jnp.concatenate([is_fin, can_finalise], axis=1)
        best = jax.lax.top_k(merged_scores, k)[1]
        fin_seq = _gather_beams(merged_seq, best)
        fin_scores = _gather_beams(merged_scores, best)
        is_fin = _gather_beams(merged_fin, best)

        # next running beams (finished candidates demoted)
        running_log_probs = topk_log_probs + hits.astype(jnp.float32) * NEG
        nxt = jax.lax.top_k(running_log_probs, k)[1]
        seq = _gather_beams(topk_seq, nxt)
        running_scores = _gather_beams(running_log_probs, nxt)
        sel_beam = _gather_beams(beam_idx, nxt)  # [B, K] source beam per new beam
        # Reorder the self-KV cache by source beam as a one-hot matmul rather
        # than a gather — exact (each output row is 1.0 × one source row) — and
        # fold this step's pending new-KV column into the same pass, so the
        # cache is read and written exactly once per step. The previous
        # take-then-dynamic-update-slice formulation cost ~8 ms/step at batch
        # 32: the gather forced a T-minor cache layout under which the
        # one-column cache write was a sub-tile read-modify-write over half the
        # tiles (~4.5 ms) on top of gather+select passes (~3.3 ms).
        dtype = cache.self_k[0].dtype
        onehot = jax.nn.one_hot(sel_beam, k, dtype=dtype)  # [B,K,Ksrc]
        # block-diagonal [B*K, B*K] row-selection matrix: one dot with M=B*K
        # keeps the output in the standard matmul tiling (a per-group M=K dot
        # emitted a T(4,128)-tiled output that cost a full re-layout copy of
        # the cache every step)
        oh_full = (onehot[:, :, None, :] * jnp.eye(b, dtype=dtype)[:, None, :, None]
                   ).reshape(b * k, b * k)

        def mix(x):
            """[B*K, ...] → rows mixed by the block-diagonal one-hot (exact)."""
            return jax.lax.dot_general(
                oh_full, x, (((1,), (0,)), ((), ())), preferred_element_type=x.dtype
            )

        def reorder(x, new_col):
            y = mix(x)
            if new_col is not None:  # fused write of the step's new KV column
                # column mask over the cache's OWN width (= the current phase's
                # t_cap under segmented growth, not the full t_total)
                cache_cols = jnp.arange(x.shape[2])
                y = jnp.where(cache_cols[None, None, :, None] == write_idx,
                              mix(new_col)[:, :, None, :], y)
            return y

        pend_k, pend_v = pending if pending is not None else (None, None)
        if write_mode == "pallas":
            # in-place row-permutation + column-write kernel
            # (ops/beam_reorder.py): the cache buffers are donated, so the
            # while carry needs no double-buffer copy. Pure copies — exact.
            from cxrmate_tpu.ops.beam_reorder import beam_reorder_write

            sel_local = sel_beam.reshape(b * k).astype(jnp.int32)
            widx = write_idx if write_idx is not None else jnp.asarray(-1, jnp.int32)
            interp = jax.default_backend() != "tpu"
            sk, sv = list(cache.self_k), list(cache.self_v)
            for li in range(len(sk)):
                nk = pend_k[li] if pend_k else jnp.zeros(sk[li].shape[:2] + sk[li].shape[3:], sk[li].dtype)
                nv = pend_v[li] if pend_v else jnp.zeros(sv[li].shape[:2] + sv[li].shape[3:], sv[li].dtype)
                sk[li], sv[li] = beam_reorder_write(
                    sk[li], sv[li], nk, nv, sel_local, widx, beams=k, interpret=interp
                )
            cache = bert_mod.DecodeCache(
                self_k=tuple(sk), self_v=tuple(sv),
                cross_k=cache.cross_k, cross_v=cache.cross_v,
            )
        else:
            cache = bert_mod.DecodeCache(
                self_k=tuple(reorder(x, pend_k[i] if pend_k else None)
                             for i, x in enumerate(cache.self_k)),
                self_v=tuple(reorder(x, pend_v[i] if pend_v else None)
                             for i, x in enumerate(cache.self_v)),
                cross_k=cache.cross_k,
                cross_v=cache.cross_v,
            )

        cur = cur + 1
        # early-stop heuristic (HF _check_early_stop_heuristic, early_stopping False/True
        # both use the current generated length as the best hypothetical length)
        best_possible = running_scores[:, :1] / ((cur - p_len).astype(jnp.float32) ** penalty)
        worst_fin = jnp.where(is_fin, jnp.min(fin_scores, axis=1, keepdims=True), NEG)
        early_unsat = early_unsat & jnp.any(best_possible > worst_fin, axis=-1, keepdims=True)
        all_hit = jnp.all(hits)
        if early_stopping:
            # exists_open_beam: stop once every batch item has all beams finished
            all_hit = all_hit | jnp.all(is_fin)
        return (seq, running_scores, fin_seq, fin_scores, is_fin, early_unsat, cache, cur), all_hit

    # ---- first step from prefill logits ----
    first_col = p_len - 1 if prompt_logits_col is None else prompt_logits_col
    lp0 = jax.nn.log_softmax(prefill_logits[:, first_col, :].astype(jnp.float32), axis=-1)
    lp0 = tile(lp0, 0)
    state0 = (seq, running_scores, fin_seq, fin_scores, is_fin, early_unsat, cache, jnp.asarray(p_len, jnp.int32))
    state, all_hit0 = select_and_update(lp0, state0)

    def cond(carry):
        state, all_hit = carry
        seq, running_scores, fin_seq, fin_scores, is_fin, early_unsat, cache, cur = state
        # the cache width caps this phase; the final phase's width is t_total,
        # so the overall stopping rule is unchanged
        t_cap = cache.self_k[0].shape[2]
        return jnp.any(early_unsat) & ~all_hit & (cur < t_cap)

    @jax.named_scope("decode_step")
    def body(carry):
        state, _ = carry
        seq, running_scores, fin_seq, fin_scores, is_fin, early_unsat, cache, cur = state
        seq_flat = seq.reshape(b * k, t_total)
        i = cur - 1
        q_tok = jnp.take_along_axis(seq_flat, jnp.full((b * k, 1), 0, jnp.int32) + i, axis=1)[:, 0]
        before = cols[None, :] < i
        present = jnp.stack(
            [jnp.any((seq_flat == sp) & before, axis=1) for sp in gen_cfg.special_token_ids],
            axis=1,
        )
        sections = gen_cfg.sections()
        ttype = jnp.full((b * k,), sections[0], jnp.int32)
        for si in range(len(gen_cfg.special_token_ids)):
            ttype = jnp.where(present[:, si], sections[si + 1], ttype)
        upto = cols[None, :] <= i
        if masked_pads:
            key_mask = ((seq_flat != gen_cfg.mask_token_id) & upto).astype(jnp.int32)
            pos = jnp.maximum(jnp.sum(key_mask, axis=1) - 1, 0)
        else:
            key_mask = upto.astype(jnp.int32) * jnp.ones((b * k, 1), jnp.int32)
            pos = jnp.zeros((b * k,), jnp.int32) + i
        t_cap = cache.self_k[0].shape[2]  # current phase's cache width
        if write_mode == "dus":
            # write-then-read: the column lands via dynamic_update_slice before
            # attention (tile-aligned under the reorder dot's layout), attention
            # reads the real cache — no virtual-read select to materialise
            logits, cache = bert_mod.bert_step(
                params, dcfg, cache, q_tok, ttype, pos, i, key_mask[:, :t_cap],
                enc_mask_flat, lora=config.lora, deferred_write=False,
                decode_kernel=decode_kernel, cross_q8=cross_q8,
            )
            pending = None
        else:
            logits, pending = bert_mod.bert_step(
                params, dcfg, cache, q_tok, ttype, pos, i, key_mask[:, :t_cap],
                enc_mask_flat, lora=config.lora, deferred_write=True,
                decode_kernel=decode_kernel, cross_q8=cross_q8,
            )
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        new_state, all_hit = select_and_update(
            lp, (seq, running_scores, fin_seq, fin_scores, is_fin, early_unsat, cache, cur),
            pending=pending, write_idx=i,
        )
        return (new_state, all_hit)

    # NOTE (profiled, batch 32): the beam-reorder dot's output is copied back
    # into the while-carry buffer every step (~1.9 ms/step of same-layout
    # copies). A 2-step unroll with a cond-guarded second half-step did NOT
    # remove them (XLA still places the conditional's outputs in fresh buffers)
    # and ballooned compile time ~4× through the remote-compile tunnel — keep
    # the single-step loop.
    carry = segmented_while(
        cond, body, (state, all_hit0), bounds,
        lambda c, nb: (c[0][:6] + (grow_cache(c[0][6], nb), c[0][7]), c[1]),
    )
    state, _ = carry
    seq, running_scores, fin_seq, fin_scores, is_fin, early_unsat, cache, cur = state
    return fin_seq[:, 0, :], fin_scores[:, 0]


# jit-cache introspection passthrough (the compile-count regression tests key
# on it; the public wrapper is a plain function)
beam_search._cache_size = _beam_search._cache_size
