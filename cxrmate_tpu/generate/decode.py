"""On-device autoregressive decoding with a static-shape KV cache.

One ``jax.lax.while_loop`` per generation mode (greedy/sample here, beam in
``beam.py``); everything — token-type tracking, cumulative position ids, mask-token
attention semantics, EOS bookkeeping — runs on device with static shapes.

Semantics mirror HF ``generate`` as driven by the reference models:

  * single/multi (`modelling_single.py:217-248`): decoder attention mask is all ones
    (even over post-EOS padding — HF's BertLMHeadModel default), position ids are
    absolute ``arange``, token types switch sections at the first occurrence of each
    special token.
  * longitudinal (`modelling_longitudinal.py:251-295`): attention mask is
    ``ids != mask_token_id`` (prompt padding and post-EOS pads are masked), position
    ids are ``relu(cumsum(mask)-1)``, sections are ``[0, 1, 0, 1]``.
  * HF prepends ``decoder_start_token_id`` and the reference strips it
    (`gt_prompt.py:293-294`); we never prepend, so our sequences equal the
    reference's *post-strip* sequences.

The returned sequences have static width ``prompt_len + max_new_tokens``, padded
with ``pad_token_id`` after EOS — exactly HF's padding, just to a fixed width.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cxrmate_tpu.configs import EncoderDecoderConfig
from cxrmate_tpu.generate.logits_process import warp_logits
from cxrmate_tpu.models import bert as bert_mod
from cxrmate_tpu.models import encoder_decoder as ed


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int
    bos_token_id: int = 1
    eos_token_id: int = 2
    pad_token_id: int = 4
    # longitudinal mask-token semantics; None → all-ones attention (single/multi)
    mask_token_id: Optional[int] = None
    special_token_ids: Tuple[int, ...] = (3,)  # section boundaries for token types
    token_type_sections: Optional[Tuple[int, ...]] = None
    num_beams: int = 1
    do_sample: bool = False
    top_k: int = 0
    top_p: float = 1.0
    temperature: float = 1.0
    length_penalty: float = 1.0
    early_stopping: bool = False

    def sections(self) -> Tuple[int, ...]:
        if self.token_type_sections is not None:
            return tuple(self.token_type_sections)[: len(self.special_token_ids) + 1]
        return tuple(range(len(self.special_token_ids) + 1))


def _specials_present(seq_prefix: jnp.ndarray, gen_cfg: GenerationConfig) -> jnp.ndarray:
    """[B, L] prefix → [B, n_specials] presence flags."""
    return jnp.stack(
        [jnp.any(seq_prefix == s, axis=1) for s in gen_cfg.special_token_ids], axis=1
    )


def resolve_cache_segments(cache_segments) -> Tuple[int, int]:
    """Resolve the segmented-cache-growth spec (trace-time, static) →
    ``(segments, round_to)``.

    Accepts an int (phase count), a string ``"N"`` or ``"N:round"`` (phase
    count plus width-rounding granularity, for tests whose tiny shapes would
    otherwise collapse under the default 64), or ``None`` to read
    ``CXRMATE_CACHE_SEGMENTS``. The default is ``"4:32"`` — measured best on
    the v5e (DEVNOTES round 3: beam-4 b24 23.9 → 29.6 studies/s, 8 phases no
    better); set ``1`` for the single full-width loop. Segmentation is
    bit-exact, so the default needs no accuracy caveat (inertness tests in
    tests/test_generate_{greedy,beam}.py, test_scst.py).
    See ``segment_bounds`` for what segmentation buys."""
    if isinstance(cache_segments, tuple):  # already resolved (idempotent)
        assert len(cache_segments) == 2, cache_segments
        return cache_segments
    if cache_segments is None:
        import os

        cache_segments = os.environ.get("CXRMATE_CACHE_SEGMENTS", "4:32")
    round_to = 64
    if isinstance(cache_segments, str):
        if ":" in cache_segments:
            seg_s, round_s = cache_segments.split(":")
            cache_segments, round_to = int(seg_s), int(round_s)
        else:
            cache_segments = int(cache_segments)
    assert cache_segments >= 1 and round_to >= 1, (cache_segments, round_to)
    return cache_segments, round_to


def segmented_while(cond, body, carry, bounds, grow):
    """Phase-capped decode loop over each segment width — the shared epilogue
    of ``generate`` / ``scst_rollout_decode`` / ``beam_search`` (one place, so
    the phase rule cannot drift between the three loops).

    ``cond`` must cap on the CURRENT cache width in ``carry``, so each
    ``while_loop`` exhausts its phase; ``grow(carry, new_bound)`` widens the
    cache to the next phase's static width (exact — the new columns are
    key-masked zeros, see ``grow_cache``) and the SAME body re-enters at the
    larger width. If decoding already stopped, the re-entered loop no-ops and
    only the boundary pad copy is paid (~one step's cache traffic)."""
    carry = jax.lax.while_loop(cond, body, carry)
    for nb in bounds[1:]:
        carry = jax.lax.while_loop(cond, body, grow(carry, nb))
    return carry


def segment_bounds(p_len: int, max_new: int, segments: int, round_to: int = 64) -> Tuple[int, ...]:
    """Cache widths for segmented cache growth (ascending, last = p_len+max_new).

    The decode-step cost that scales with the cache width T — self-KV streaming
    reads, the beam reorder one-hot dot, and XLA's while-carry double-buffer
    copies (together ~55% of the longitudinal beam step, DEVNOTES round 3) —
    covers the FULL padded T every step, even though the live prefix averages
    only ~(p_len + max_new/2). Decoding in ``segments`` phases, each a separate
    while_loop over a cache of width T_s (padded up with zeros between phases),
    cuts that traffic to the average phase width. Values are bit-identical to
    the single-phase loop: dead columns carry an additive -1e9 mask, so their
    softmax weights underflow to exactly 0.0f and contribute exact zeros to
    every reduction, and zero-padding the cache is pure data movement.

    Widths are rounded up to multiples of 64 (sublane-tile friendly, fewer
    distinct loop shapes); duplicates collapse, so the effective phase count
    can be smaller than requested.
    """
    t_total = p_len + max_new
    bounds = []
    for s in range(1, segments):
        cap = p_len + (max_new * s + segments - 1) // segments
        cap = min(-(-cap // round_to) * round_to, t_total)
        if cap > p_len and (not bounds or cap > bounds[-1]):
            bounds.append(cap)
    if not bounds or bounds[-1] < t_total:
        bounds.append(t_total)
    return tuple(bounds)


def grow_cache(cache, new_t: int):
    """Zero-pad the self-KV cache's T axis to ``new_t`` (exact: dead columns
    are masked everywhere they are read)."""
    pad = new_t - cache.self_k[0].shape[2]
    assert pad >= 0

    def widen(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))

    return bert_mod.DecodeCache(
        self_k=tuple(widen(x) for x in cache.self_k),
        self_v=tuple(widen(x) for x in cache.self_v),
        cross_k=cache.cross_k,
        cross_v=cache.cross_v,
    )


def _type_from_present(present: jnp.ndarray, gen_cfg: GenerationConfig) -> jnp.ndarray:
    """Reference `token_ids_to_token_type_ids_past` rule: iterate specials in order,
    last one present wins (modelling_single.py:294-318)."""
    sections = gen_cfg.sections()
    b = present.shape[0]
    out = jnp.full((b,), sections[0], dtype=jnp.int32)
    for i in range(len(gen_cfg.special_token_ids)):
        out = jnp.where(present[:, i], sections[i + 1], out)
    return out


def generate(
    variables,
    config: EncoderDecoderConfig,
    gen_cfg: GenerationConfig,
    encoder_hidden: jnp.ndarray,
    encoder_mask: jnp.ndarray,
    prompt_ids: jnp.ndarray,
    prompt_mask: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    *,
    max_new_tokens_pad: Optional[int] = None,
    return_scores: bool = False,
    use_fused: bool = False,
    prompt_logits_col: Optional[int] = None,
    cache_segments: Optional[int] = None,
    decode_kernel: Optional[str] = None,
):
    """Public entry for greedy/sampled decoding — see ``_generate`` for the full
    argument docs. Resolves the env-dependent static knobs (``cache_segments`` →
    ``CXRMATE_CACHE_SEGMENTS``, ``decode_kernel`` → ``CXRMATE_DECODE_KERNEL``)
    at CALL time, outside jit, so the jit cache is keyed on the RESOLVED
    values: changing the env between calls in one process takes effect instead
    of silently reusing the trace cached under ``None``."""
    from cxrmate_tpu.ops.decode_attention import resolve_decode_kernel

    return _generate(
        variables, config, gen_cfg, encoder_hidden, encoder_mask,
        prompt_ids, prompt_mask, rng,
        max_new_tokens_pad=max_new_tokens_pad, return_scores=return_scores,
        use_fused=use_fused, prompt_logits_col=prompt_logits_col,
        cache_segments=resolve_cache_segments(cache_segments),
        decode_kernel=resolve_decode_kernel(decode_kernel),
    )


@functools.partial(
    jax.jit,
    # prompt_logits_col is deliberately NOT static: the CLI test stage buckets
    # prompt widths to multiples of 32 but pins the first-token column to the
    # batch's true longest width — a static column would recompile per distinct
    # true width, defeating the bucketing (one program per bucket, not per batch)
    static_argnames=(
        "config", "gen_cfg", "max_new_tokens_pad", "return_scores", "use_fused",
        "cache_segments", "decode_kernel",
    ),
)
def _generate(
    variables,
    config: EncoderDecoderConfig,
    gen_cfg: GenerationConfig,
    encoder_hidden: jnp.ndarray,
    encoder_mask: jnp.ndarray,
    prompt_ids: jnp.ndarray,
    prompt_mask: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    *,
    max_new_tokens_pad: Optional[int] = None,
    return_scores: bool = False,
    use_fused: bool = False,
    prompt_logits_col: Optional[int] = None,
    cache_segments: Optional[int] = None,
    decode_kernel: Optional[str] = None,
):
    """Greedy or sampled decoding (num_beams == 1).

    Args:
      encoder_hidden/encoder_mask: from ``encoder_decoder.encode_images``.
      prompt_ids/prompt_mask: [B, P] — for single/multi pass a [B, 1] BOS column.
      return_scores: also return per-step pre-softmax logits [B, max_new, V]
        (the SCST sample path needs them, scst/gt_prompt.py:189).
      prompt_logits_col: column of the prefill logits that issues the first token.
        Defaults to the last prompt column (HF semantics, where the batch-longest
        row's query is its final real token). When the prompt is bucket-padded
        beyond the batch-longest width, pass the true longest width - 1 so results
        are identical to the unbucketed batch.
      cache_segments: segmented cache growth — decode in N phases with a
        narrower self-KV cache early, zero-padding it up between phases
        (bit-identical values; see ``segment_bounds``). None reads
        CXRMATE_CACHE_SEGMENTS (default "4:32").
      decode_kernel: resolved Pallas decode-attention routing spec
        (``ops.decode_attention.resolve_decode_kernel``; "" = XLA, the
        default). Static, so each spec compiles its own program.
    Returns:
      sequences [B, P + max_new] (+ scores if requested).
    """
    assert gen_cfg.num_beams == 1
    params = variables["params"]["decoder"]
    dcfg = config.decoder
    fused_prepared = None
    if use_fused and config.lora is None:
        # head-major weight views for the fused kernel, built ONCE here; the
        # while-loop body closes over them as loop-invariant inputs instead of
        # re-transposing every layer's q/k/v weights each decode step
        from cxrmate_tpu.ops.fused_decode import prepare_fused_params

        fused_prepared = prepare_fused_params(params, dcfg.num_attention_heads)
    b, p_len = prompt_ids.shape
    max_new = gen_cfg.max_new_tokens if max_new_tokens_pad is None else max_new_tokens_pad
    t_total = p_len + max_new
    bounds = segment_bounds(p_len, max_new, *resolve_cache_segments(cache_segments))
    masked_pads = gen_cfg.mask_token_id is not None

    # ---- prompt-side ids ----
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
    # int8 serving decode: quantise the loop-invariant cross cache ONCE here;
    # the while bodies close over the q8 tensors (not carried) and the cache's
    # cross entries become zero-width placeholders (bert.quantize_cross_cache)
    if use_fused and config.lora is None:
        cross_q8 = None  # the fused path ignores decode_kernel (warns)
    else:
        cache, cross_q8 = bert_mod.maybe_quantize_cross_cache(cache, decode_kernel)

    seq = jnp.concatenate(
        [prompt_ids, jnp.full((b, max_new), gen_cfg.pad_token_id, dtype=prompt_ids.dtype)], axis=1
    )
    key_mask = jnp.concatenate([attn_prompt, jnp.zeros((b, max_new), jnp.int32)], axis=1)
    # specials seen in seq[:, :cur-1] (excludes the current query token — HF drops
    # the last column in token_ids_to_token_type_ids_past)
    present = _specials_present(prompt_ids, gen_cfg)
    real_count = jnp.sum(attn_prompt, axis=1)

    def select_token(logits, step_rng):
        if gen_cfg.do_sample:
            warped = warp_logits(
                logits.astype(jnp.float32), gen_cfg.temperature, gen_cfg.top_k, gen_cfg.top_p
            )
            return jax.random.categorical(step_rng, warped, axis=-1).astype(seq.dtype), warped
        logits32 = logits.astype(jnp.float32)
        return jnp.argmax(logits32, axis=-1).astype(seq.dtype), logits32

    # first next-token from the prefill logits at the last prompt column
    rng0 = rng if rng is not None else jax.random.PRNGKey(0)
    first_rng, loop_rng = jax.random.split(rng0)
    first_col = p_len - 1 if prompt_logits_col is None else prompt_logits_col
    tok0, logits0 = select_token(prefill_logits[:, first_col, :], first_rng)
    finished0 = tok0 == gen_cfg.eos_token_id
    seq = jax.lax.dynamic_update_slice(seq, tok0[:, None], (0, p_len))
    new_mask0 = (tok0 != gen_cfg.mask_token_id).astype(jnp.int32) if masked_pads else jnp.ones((b,), jnp.int32)
    key_mask = jax.lax.dynamic_update_slice(key_mask, new_mask0[:, None], (0, p_len))
    real_count = real_count + new_mask0

    scores = None
    if return_scores:
        scores = jnp.zeros((b, max_new, dcfg.vocab_size), jnp.float32)
        scores = scores.at[:, 0].set(logits0)

    state = {
        "seq": seq,
        "key_mask": key_mask,
        "present": present,
        "real_count": real_count,
        "cur": jnp.asarray(p_len + 1, jnp.int32),  # tokens so far
        "finished": finished0,
        "cache": cache,
        "rng": loop_rng,
        "scores": scores,
    }

    def cond(s):
        # the cache width caps this phase's loop; the last phase's width is
        # t_total, so the final stopping rule is unchanged
        t_cap = s["cache"].self_k[0].shape[2]
        return (s["cur"] < t_cap) & ~jnp.all(s["finished"])

    @jax.named_scope("decode_step")
    def body(s):
        t_cap = s["cache"].self_k[0].shape[2]
        i = s["cur"] - 1  # query index = last appended token
        q_tok = jax.lax.dynamic_slice(s["seq"], (0, i), (b, 1))[:, 0]
        # fold tokens [0, i) into presence: the token at i-1 was not folded yet
        prev_tok = jax.lax.dynamic_slice(s["seq"], (0, i - 1), (b, 1))[:, 0]
        present = s["present"] | jnp.stack(
            [prev_tok == sp for sp in gen_cfg.special_token_ids], axis=1
        )
        ttype = _type_from_present(present, gen_cfg)
        if masked_pads:
            pos = jnp.maximum(s["real_count"] - 1, 0)
        else:
            pos = jnp.full((b,), 0, jnp.int32) + i
        logits, cache = bert_mod.bert_step(
            params, dcfg, s["cache"], q_tok, ttype, pos, i,
            s["key_mask"][:, :t_cap], encoder_mask,
            lora=config.lora, use_fused=use_fused, fused_prepared=fused_prepared,
            decode_kernel=decode_kernel, cross_q8=cross_q8,
        )
        rng_step, rng_next = jax.random.split(s["rng"])
        tok, step_scores = select_token(logits, rng_step)
        tok = jnp.where(s["finished"], gen_cfg.pad_token_id, tok)
        finished = s["finished"] | (tok == gen_cfg.eos_token_id)
        seq = jax.lax.dynamic_update_slice(s["seq"], tok[:, None], (0, s["cur"]))
        if masked_pads:
            nm = (tok != gen_cfg.mask_token_id).astype(jnp.int32)
        else:
            nm = jnp.ones((b,), jnp.int32)
        key_mask = jax.lax.dynamic_update_slice(s["key_mask"], nm[:, None], (0, s["cur"]))
        out = {
            "seq": seq,
            "key_mask": key_mask,
            "present": present,
            "real_count": s["real_count"] + nm,
            "cur": s["cur"] + 1,
            "finished": finished,
            "cache": cache,
            "rng": rng_next,
            "scores": s["scores"],
        }
        if return_scores:
            out["scores"] = jax.lax.dynamic_update_slice(
                s["scores"], step_scores[:, None, :], (0, s["cur"] - p_len, 0)
            )
        return out

    state = segmented_while(
        cond, body, state, bounds,
        lambda s, nb: dict(s, cache=grow_cache(s["cache"], nb)),
    )
    if return_scores:
        return state["seq"], state["scores"]
    return state["seq"]


def scst_rollout_decode(
    variables,
    config: EncoderDecoderConfig,
    cfg_sample: GenerationConfig,
    cfg_base: GenerationConfig,
    encoder_hidden: jnp.ndarray,
    encoder_mask: jnp.ndarray,
    prompt_ids: jnp.ndarray,
    prompt_mask: jnp.ndarray,
    rng: jax.Array,
    cache_segments=None,
    prompt_logits_col=None,
    decode_kernel: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Public entry for the fused SCST rollout — see ``_scst_rollout_decode``.
    Resolves ``cache_segments`` (env ``CXRMATE_SCST_CACHE_SEGMENTS`` handling
    lives in train/scst.py; ``None`` here reads ``CXRMATE_CACHE_SEGMENTS``)
    and ``decode_kernel`` (``CXRMATE_DECODE_KERNEL``) at call time so the jit
    cache keys on the resolved values."""
    from cxrmate_tpu.ops.decode_attention import resolve_decode_kernel

    return _scst_rollout_decode(
        variables, config, cfg_sample, cfg_base, encoder_hidden, encoder_mask,
        prompt_ids, prompt_mask, rng,
        cache_segments=resolve_cache_segments(cache_segments),
        prompt_logits_col=prompt_logits_col,
        decode_kernel=resolve_decode_kernel(decode_kernel),
    )


@functools.partial(
    jax.jit,
    static_argnames=("config", "cfg_sample", "cfg_base", "cache_segments", "decode_kernel"),
)
def _scst_rollout_decode(
    variables,
    config: EncoderDecoderConfig,
    cfg_sample: GenerationConfig,
    cfg_base: GenerationConfig,
    encoder_hidden: jnp.ndarray,
    encoder_mask: jnp.ndarray,
    prompt_ids: jnp.ndarray,
    prompt_mask: jnp.ndarray,
    rng: jax.Array,
    cache_segments=None,
    prompt_logits_col=None,
    decode_kernel: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SCST rollout: sampled sequences + greedy baselines in ONE decode loop.

    The reference decodes the sampled rollout and the greedy baseline
    separately off one encoder pass (`scst/gt_prompt.py:94-112,162-178`); both
    loops stream the full decoder weights every step, so at the reference's
    SCST microbatch (1, `longitudinal_gen_prompt_cxr-bert.yaml:8`) the two
    loops are weight-streaming-bound. Here the baseline rows are folded into
    the same while_loop as extra batch rows (rows [B, 2B)), halving the
    per-step fixed cost. Both halves are bit-identical to the separate
    ``generate`` calls: the greedy half is row-local compute, and the sample
    half slices its rows out of the batched logits before ``categorical`` and
    mirrors ``generate``'s per-step RNG split sequence exactly (asserted in
    tests/test_scst.py::test_fused_rollout_matches_separate_decodes).

    Requirements (the SCST configuration): both configs use mask-token
    attention with the same special ids for pad/bos/eos/mask; they may differ
    in special_token_ids / token_type_sections (the reference samples with
    ``(BOS, SEP)`` but decodes the baseline with the full prompt special set,
    `scst/gt_prompt.py:165`) and in sampling parameters.

    Returns (sampled [B, P + max_new], baseline [B, P + max_new]).
    """
    assert cfg_sample.do_sample and not cfg_base.do_sample
    assert cfg_sample.mask_token_id is not None
    assert cfg_sample.mask_token_id == cfg_base.mask_token_id
    assert cfg_sample.max_new_tokens == cfg_base.max_new_tokens
    for f in ("bos_token_id", "eos_token_id", "pad_token_id"):
        assert getattr(cfg_sample, f) == getattr(cfg_base, f)
    params = variables["params"]["decoder"]
    dcfg = config.decoder
    b, p_len = prompt_ids.shape
    max_new = cfg_sample.max_new_tokens
    t_total = p_len + max_new
    bounds = segment_bounds(p_len, max_new, *resolve_cache_segments(cache_segments))
    mask_id = cfg_sample.mask_token_id

    # ---- prompt-side ids per half (the halves differ only in token types) ----
    types_a = ed.token_ids_to_token_type_ids(
        prompt_ids, cfg_sample.special_token_ids, cfg_sample.sections()
    )
    types_b = ed.token_ids_to_token_type_ids(
        prompt_ids, cfg_base.special_token_ids, cfg_base.sections()
    )
    prompt2 = jnp.concatenate([prompt_ids, prompt_ids], axis=0)
    ptypes2 = jnp.concatenate([types_a, types_b], axis=0)
    attn2 = (prompt2 != mask_id).astype(jnp.int32)
    pos2 = ed.cumulative_position_ids(attn2)

    rows = 2 * b
    enc2 = jnp.concatenate([encoder_hidden, encoder_hidden], axis=0)
    encm2 = jnp.concatenate([encoder_mask, encoder_mask], axis=0)
    cache = bert_mod.init_cache(dcfg, rows, bounds[0], enc2.shape[1], dtype=enc2.dtype)
    with jax.named_scope("prefill"):
        prefill_logits, cache = bert_mod.bert_prefill(
            params, dcfg, cache, prompt2, attn2, ptypes2, pos2, enc2, encm2,
            lora=config.lora,
        )
    # int8 serving decode (see _generate): quantise the loop-invariant cross
    # cache once; the while bodies close over the q8 tensors
    cache, cross_q8 = bert_mod.maybe_quantize_cross_cache(cache, decode_kernel)

    seq = jnp.concatenate(
        [prompt2, jnp.full((rows, max_new), cfg_sample.pad_token_id, prompt2.dtype)], axis=1
    )
    key_mask = jnp.concatenate([attn2, jnp.zeros((rows, max_new), jnp.int32)], axis=1)
    present_a = _specials_present(prompt_ids, cfg_sample)
    present_b = _specials_present(prompt_ids, cfg_base)
    real_count = jnp.sum(attn2, axis=1)

    def select_token(logits, step_rng):
        """Sample rows [0, b) (generate's exact select), argmax rows [b, 2b)."""
        la = logits[:b].astype(jnp.float32)
        warped = warp_logits(la, cfg_sample.temperature, cfg_sample.top_k, cfg_sample.top_p)
        tok_a = jax.random.categorical(step_rng, warped, axis=-1)
        tok_b = jnp.argmax(logits[b:].astype(jnp.float32), axis=-1)
        return jnp.concatenate([tok_a, tok_b], axis=0).astype(seq.dtype)

    rng0 = rng
    first_rng, loop_rng = jax.random.split(rng0)
    # prompt_logits_col: as in ``_generate`` — when the prompt is bucket-padded
    # beyond the batch-longest width, the first token must issue from the true
    # longest column (the longest row's real BOS query, not a pad/mask query).
    # Traced, not static, for the same one-program-per-bucket reason.
    first_col = p_len - 1 if prompt_logits_col is None else prompt_logits_col
    tok0 = select_token(prefill_logits[:, first_col, :], first_rng)
    finished0 = tok0 == cfg_sample.eos_token_id
    seq = jax.lax.dynamic_update_slice(seq, tok0[:, None], (0, p_len))
    new_mask0 = (tok0 != mask_id).astype(jnp.int32)
    key_mask = jax.lax.dynamic_update_slice(key_mask, new_mask0[:, None], (0, p_len))
    real_count = real_count + new_mask0

    state = {
        "seq": seq, "key_mask": key_mask,
        "present_a": present_a, "present_b": present_b,
        "real_count": real_count,
        "cur": jnp.asarray(p_len + 1, jnp.int32),
        "finished": finished0, "cache": cache, "rng": loop_rng,
    }

    def cond(s):
        # the cache width caps this phase (segmented growth); the final phase's
        # width is t_total, so the overall stopping rule is unchanged
        t_cap = s["cache"].self_k[0].shape[2]
        return (s["cur"] < t_cap) & ~jnp.all(s["finished"])

    @jax.named_scope("decode_step")
    def body(s):
        t_cap = s["cache"].self_k[0].shape[2]
        i = s["cur"] - 1
        q_tok = jax.lax.dynamic_slice(s["seq"], (0, i), (rows, 1))[:, 0]
        prev_tok = jax.lax.dynamic_slice(s["seq"], (0, i - 1), (rows, 1))[:, 0]
        present_a = s["present_a"] | jnp.stack(
            [prev_tok[:b] == sp for sp in cfg_sample.special_token_ids], axis=1
        )
        present_b = s["present_b"] | jnp.stack(
            [prev_tok[b:] == sp for sp in cfg_base.special_token_ids], axis=1
        )
        ttype = jnp.concatenate(
            [_type_from_present(present_a, cfg_sample),
             _type_from_present(present_b, cfg_base)], axis=0
        )
        pos = jnp.maximum(s["real_count"] - 1, 0)
        logits, cache = bert_mod.bert_step(
            params, dcfg, s["cache"], q_tok, ttype, pos, i,
            s["key_mask"][:, :t_cap], encm2, lora=config.lora,
            decode_kernel=decode_kernel, cross_q8=cross_q8,
        )
        rng_step, rng_next = jax.random.split(s["rng"])
        tok = select_token(logits, rng_step)
        tok = jnp.where(s["finished"], cfg_sample.pad_token_id, tok)
        finished = s["finished"] | (tok == cfg_sample.eos_token_id)
        seq = jax.lax.dynamic_update_slice(s["seq"], tok[:, None], (0, s["cur"]))
        nm = (tok != mask_id).astype(jnp.int32)
        key_mask = jax.lax.dynamic_update_slice(s["key_mask"], nm[:, None], (0, s["cur"]))
        return {
            "seq": seq, "key_mask": key_mask,
            "present_a": present_a, "present_b": present_b,
            "real_count": s["real_count"] + nm,
            "cur": s["cur"] + 1, "finished": finished, "cache": cache, "rng": rng_next,
        }

    state = segmented_while(
        cond, body, state, bounds,
        lambda s, nb: dict(s, cache=grow_cache(s["cache"], nb)),
    )
    return state["seq"][:b], state["seq"][b:]
