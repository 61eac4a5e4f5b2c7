"""Self-critical sequence training (SCST / REINFORCE).

Reference semantics (`/root/reference/modules/lightning_modules/longitudinal/scst/
gt_prompt.py:62-246`):
  1. tokenize the previous-report prompt (+BOS);
  2. run the (frozen) encoder once, reuse its outputs for sampling and baseline;
  3. sample with top-k 50 / top-p 1.0 / temperature 1.0, keeping the per-step
     *warped* logits;
  4. greedy baseline with the same encoder outputs;
  5. reward both with CXR-BERT cosine similarity; advantage = sample − baseline;
  6. loss = Σ_t NLL(sampled_t | warped logits) · advantage, pad-ignored, batch mean.

TPU-native structure: sampling and the greedy baseline run as compiled while_loops
without gradients; the gradient comes from ONE teacher-forced re-forward over the
sampled sequences whose logits are re-warped with the same top-k/top-p masks —
numerically identical to the reference's grad-through-generate trick (our cached
decode equals the full forward, asserted in tests), with far better TPU utilisation.
Strings for the reward cross the host once per step (WordPiece retokenisation),
exactly like the reference."""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cxrmate_tpu.configs import EncoderDecoderConfig
from cxrmate_tpu.generate import GenerationConfig
from cxrmate_tpu.generate.decode import scst_rollout_decode
from cxrmate_tpu.generate.logits_process import warp_logits
from cxrmate_tpu.models import encoder_decoder as ed
from cxrmate_tpu.train.optim import zero_frozen_grads
from cxrmate_tpu.train.tf_trainer import TrainState


def reinforce_loss(
    warped_logits: jnp.ndarray,  # [B, T_new, V] (already temperature/top-k/top-p warped)
    sampled_ids: jnp.ndarray,  # [B, T_new]
    reward: jnp.ndarray,  # [B] advantage
    pad_id: int,
) -> jnp.ndarray:
    """Σ_t NLL(sampled_t)·advantage, mean over batch (scst/gt_prompt.py:211-246)."""
    logp = jax.nn.log_softmax(warped_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, sampled_ids[..., None].astype(jnp.int32), axis=-1)[..., 0]
    mask = (sampled_ids != pad_id).astype(jnp.float32)
    seq_nll = jnp.sum(nll * mask, axis=-1)
    return jnp.mean(seq_nll * reward)


def make_scst_step(
    config: EncoderDecoderConfig,
    gen_cfg_sample: GenerationConfig,
    gen_cfg_baseline: GenerationConfig,
    tx: optax.GradientTransformation,
    trainable_mask: Optional[dict] = None,
    pad_id: int = 4,
    compute_dtype=None,
):
    """Returns (rollout_fn, grad_fn):

    rollout_fn(variables, pixels, prompt, rng) → (sampled_seq, baseline_seq,
    enc_hidden, enc_mask): compiled, no gradients.

    grad_fn(state, enc_hidden, enc_mask, prompt, sampled_seq, advantage, ...) →
    (new_state, loss): one TF re-forward with re-warped logits + AdamW update.

    ``compute_dtype`` (bf16) mirrors the reference's fp16 SCST: rollouts and the
    gradient re-forward run in the compute dtype, fp32 master params/moments."""

    def _cast(tree):
        if compute_dtype is None:
            return tree
        from cxrmate_tpu.utils.precision import cast_floats

        return cast_floats(tree, compute_dtype)

    # resolve the env knob HERE, outside jit, so it is a concrete static value
    # when the trace is built (an os.environ read inside the jitted body would
    # be frozen into the first trace and silently ignore later env changes)
    from cxrmate_tpu.generate.decode import resolve_cache_segments

    scst_cache_segments = resolve_cache_segments(
        os.environ.get("CXRMATE_SCST_CACHE_SEGMENTS", "1")
    )

    @jax.jit
    def rollout(variables, pixels, prompt_ids, prompt_mask, rng):
        variables = _cast(variables)
        if compute_dtype is not None:
            pixels = pixels.astype(compute_dtype)
        enc_hidden, enc_mask, _ = ed.encode_images(variables, pixels, config)
        enc_hidden = jax.lax.stop_gradient(enc_hidden)
        # one fused while_loop decodes the sampled rollout AND the greedy
        # baseline (baseline rows folded into the batch) — bit-identical to
        # two separate `generate` calls but with one weight-streaming pass per
        # step instead of two (the dominant cost at the reference's SCST
        # microbatch of 1): full-size SCST step 269 → 184 ms on v5e.
        # cache_segments defaults to 1 here (NOT the serving "4:32"): the SCST
        # rollout is weight-streaming-bound, not cache-width-bound, and at the
        # reference's mbatch 1 segmentation measured 16% SLOWER (167.7 →
        # 193.9 ms; neutral at b8 — DEVNOTES round 3). Override with
        # CXRMATE_SCST_CACHE_SEGMENTS for large-batch SCST.
        sampled, baseline = scst_rollout_decode(
            variables, config, gen_cfg_sample, gen_cfg_baseline,
            enc_hidden, enc_mask, prompt_ids, prompt_mask,
            rng if rng is not None else jax.random.PRNGKey(0),
            cache_segments=scst_cache_segments,
        )
        return sampled, baseline, enc_hidden, enc_mask

    def loss_fn(params, batch_stats, enc_hidden, enc_mask, prompt_len, seq, advantage):
        params = _cast(params)
        batch_stats = _cast(batch_stats)
        b, t = seq.shape
        masked_pads = gen_cfg_sample.mask_token_id is not None
        if masked_pads:
            attn = (seq != gen_cfg_sample.mask_token_id).astype(jnp.int32)
            pos = ed.cumulative_position_ids(attn)
        else:
            attn = jnp.ones((b, t), jnp.int32)
            pos = jnp.broadcast_to(jnp.arange(t), (b, t))
        types = ed.token_ids_to_token_type_ids(
            seq, gen_cfg_sample.special_token_ids, gen_cfg_sample.sections()
        )
        logits, _ = ed.forward(
            {"params": params, "batch_stats": batch_stats},
            None, seq, config,
            decoder_attention_mask=attn,
            decoder_token_type_ids=types,
            decoder_position_ids=pos,
            encoder_outputs=(enc_hidden, enc_mask),
        )
        # logits[:, prompt_len-1 : t-1] generated tokens seq[:, prompt_len:]
        gen_logits = logits[:, prompt_len - 1 : t - 1, :]
        warped = warp_logits(
            gen_logits.astype(jnp.float32),
            gen_cfg_sample.temperature, gen_cfg_sample.top_k, gen_cfg_sample.top_p,
        )
        sampled_ids = seq[:, prompt_len:]
        return reinforce_loss(warped, sampled_ids, advantage, pad_id)

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("prompt_len",))
    def grad_step(state: TrainState, enc_hidden, enc_mask, prompt_len, seq, advantage):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, state.batch_stats, enc_hidden, enc_mask, prompt_len, seq, advantage
        )
        if trainable_mask is not None:
            grads = zero_frozen_grads(grads, trainable_mask)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, batch_stats=state.batch_stats, opt_state=opt_state, step=state.step + 1),
            loss,
        )

    return rollout, grad_step


@dataclasses.dataclass
class SCSTTrainer:
    """Host-side orchestration of one SCST step (the reward round-trip).

    reward_fn: (predictions, labels) → np.ndarray[B], e.g. reward.cxrbert.CXRBERTReward.
    split_fn: token_ids → (prev, findings, impression) strings, e.g. a closure over
    encoder_decoder.split_and_decode_sections."""

    config: EncoderDecoderConfig
    rollout: Callable
    grad_step: Callable
    reward_fn: Callable
    split_fn: Callable

    def step(
        self,
        state: TrainState,
        pixels: jnp.ndarray,
        prompt_ids: np.ndarray,
        prompt_mask: np.ndarray,
        findings,
        impression,
        rng,
    ) -> Tuple[TrainState, Dict[str, float], Tuple]:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        sampled, baseline, enc_hidden, enc_mask = self.rollout(
            variables, pixels, jnp.asarray(prompt_ids), jnp.asarray(prompt_mask), rng
        )
        sampled_np, baseline_np = np.asarray(sampled), np.asarray(baseline)
        _, s_f, s_i = self.split_fn(sampled_np)
        _, b_f, b_i = self.split_fn(baseline_np)
        labels = [[f"{f} {i}"] for f, i in zip(findings, impression)]
        r_sample = self.reward_fn([f"{f} {i}" for f, i in zip(s_f, s_i)], labels)
        r_base = self.reward_fn([f"{f} {i}" for f, i in zip(b_f, b_i)], labels)
        advantage = jnp.asarray(r_sample - r_base, jnp.float32)
        state, loss = self.grad_step(
            state, enc_hidden, enc_mask, int(prompt_ids.shape[1]), sampled, advantage
        )
        logs = {
            "scst_loss": float(loss),
            "reward": float(np.mean(r_sample - r_base)),
            "baseline": float(np.mean(r_base)),
        }
        return state, logs, (b_f, b_i)
