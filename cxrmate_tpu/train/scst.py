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
    decode_kernel: Optional[str] = None,
):
    """Returns (rollout_fn, grad_fn):

    rollout_fn(variables, pixels, prompt, rng) → (sampled_seq, baseline_seq,
    enc_hidden, enc_mask): compiled, no gradients.

    grad_fn(state, enc_hidden, enc_mask, prompt, sampled_seq, advantage, ...) →
    (new_state, loss): one TF re-forward with re-warped logits + AdamW update.

    ``compute_dtype`` (bf16) mirrors the reference's fp16 SCST: rollouts and the
    gradient re-forward run in the compute dtype, fp32 master params/moments.

    ``decode_kernel``: Pallas decode-attention routing for the ROLLOUT
    (``ops.decode_attention.resolve_decode_kernel``; None reads
    ``CXRMATE_DECODE_KERNEL`` HERE, at make time, so the resolved value is a
    concrete static when the rollout trace is built). SCST rollouts are not a
    parity path — the sampled half is exploration and the REINFORCE gradient
    re-forwards the SAMPLED sequences with the exact XLA path either way (the
    log-probs in the loss are always the exact policy's) — so the q8 serving
    kernel (``cross-rowgroup-q8[:G]``) is admissible here where exactness is
    not contractual; the fused loop routes BOTH halves (sample + baseline)
    through it. The hardware verdict lives in DEVNOTES round 5."""

    def _cast(tree):
        if compute_dtype is None:
            return tree
        from cxrmate_tpu.utils.precision import cast_floats

        return cast_floats(tree, compute_dtype)

    # resolve the env knob HERE, outside jit, so it is a concrete static value
    # when the trace is built (an os.environ read inside the jitted body would
    # be frozen into the first trace and silently ignore later env changes)
    from cxrmate_tpu.generate.decode import resolve_cache_segments
    from cxrmate_tpu.ops.decode_attention import resolve_decode_kernel

    scst_cache_segments = resolve_cache_segments(
        os.environ.get("CXRMATE_SCST_CACHE_SEGMENTS", "1")
    )
    scst_decode_kernel = resolve_decode_kernel(decode_kernel)

    @jax.jit
    def rollout(variables, pixels, prompt_ids, prompt_mask, rng, prompt_logits_col=None):
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
            prompt_logits_col=prompt_logits_col,
            decode_kernel=scst_decode_kernel,
        )
        return sampled, baseline, enc_hidden, enc_mask

    def loss_fn(params, batch_stats, enc_hidden, enc_mask, prompt_len, first_col, seq, advantage):
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
        # The query issuing generated token seq[:, prompt_len + k] sits at
        # column prompt_len + k - 1 for k >= 1; the FIRST token was issued by
        # the prefill at ``first_col`` (= prompt_len - 1 for batch-longest
        # padding; the true-longest column when the prompt is bucket-padded —
        # the rollout's exactness rule, generate/decode.py:prompt_logits_col).
        first = jax.lax.dynamic_slice_in_dim(logits, first_col, 1, axis=1)
        gen_logits = jnp.concatenate([first, logits[:, prompt_len : t - 1, :]], axis=1)
        warped = warp_logits(
            gen_logits.astype(jnp.float32),
            gen_cfg_sample.temperature, gen_cfg_sample.top_k, gen_cfg_sample.top_p,
        )
        sampled_ids = seq[:, prompt_len:]
        return reinforce_loss(warped, sampled_ids, advantage, pad_id)

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("prompt_len",))
    def grad_step(state: TrainState, enc_hidden, enc_mask, prompt_len, first_col, seq, advantage):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, state.batch_stats, enc_hidden, enc_mask, prompt_len, first_col,
            seq, advantage
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
    encoder_decoder.split_and_decode_sections.

    Multi-process (``mesh`` + ``row_range`` set — cli/stages.py:fit_scst): the
    rollout/grad programs are global SPMD over the mesh; ``step`` receives this
    process's row stripe of the host batch fields, pulls the same stripe out of
    the rollout outputs for the host reward round-trip, and re-assembles the
    advantage on the mesh. Logged reward/baseline means are allgathered so every
    rank logs the GLOBAL means (identical to the single-process run)."""

    config: EncoderDecoderConfig
    rollout: Callable
    grad_step: Callable
    reward_fn: Callable
    split_fn: Callable
    mesh: Optional[object] = None
    row_range: Optional[Tuple[int, int]] = None

    def _local_rows(self, arr) -> np.ndarray:
        """This process's row stripe of a P('data')-sharded global array."""
        if self.mesh is None:
            return np.asarray(arr)
        shards = sorted(arr.addressable_shards, key=lambda s: s.index[0].start or 0)
        rows = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
        assert rows.shape[0] == self.row_range[1] - self.row_range[0], (
            rows.shape, self.row_range
        )
        return rows

    def _global_batch(self, stripe: np.ndarray):
        """Assemble a per-process row stripe into a global mesh array."""
        if self.mesh is None:
            return jnp.asarray(stripe)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.make_array_from_process_local_data(
            NamedSharding(self.mesh, P("data")), stripe
        )

    def step(
        self,
        state: TrainState,
        pixels: jnp.ndarray,
        prompt_ids: np.ndarray,
        prompt_mask: np.ndarray,
        findings,
        impression,
        rng,
        prompt_logits_col: Optional[int] = None,
    ) -> Tuple[TrainState, Dict[str, float], Tuple]:
        """``prompt_logits_col``: true-longest column when the prompt is
        bucket-padded beyond the batch longest (cli/stages.py buckets SCST
        prompts to bound compile count); None = batch-longest padding."""
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        p_len = int(prompt_ids.shape[1])
        first_col = np.int32(p_len - 1 if prompt_logits_col is None else prompt_logits_col)
        sampled, baseline, enc_hidden, enc_mask = self.rollout(
            variables, pixels, jnp.asarray(prompt_ids), jnp.asarray(prompt_mask), rng,
            first_col,
        )
        # host round-trip on THIS process's rows only (the stripe the loader
        # materialised; `findings`/`impression` are already that stripe)
        sampled_np, baseline_np = self._local_rows(sampled), self._local_rows(baseline)
        _, s_f, s_i = self.split_fn(sampled_np)
        _, b_f, b_i = self.split_fn(baseline_np)
        labels = [[f"{f} {i}"] for f, i in zip(findings, impression)]
        r_sample = self.reward_fn([f"{f} {i}" for f, i in zip(s_f, s_i)], labels)
        r_base = self.reward_fn([f"{f} {i}" for f, i in zip(b_f, b_i)], labels)
        advantage = self._global_batch(np.asarray(r_sample - r_base, np.float32))
        state, loss = self.grad_step(
            state, enc_hidden, enc_mask, p_len, first_col, sampled, advantage
        )
        adv_np, base_np = np.asarray(r_sample - r_base), np.asarray(r_base)
        if self.mesh is not None and jax.process_count() > 1:
            # log the GLOBAL means (ranks gather in rank order, so the mean sums
            # the same values in the same order as the single-process run)
            from jax.experimental import multihost_utils

            adv_np = multihost_utils.process_allgather(adv_np).reshape(-1)
            base_np = multihost_utils.process_allgather(base_np).reshape(-1)
        logs = {
            "scst_loss": float(loss),
            "reward": float(np.mean(adv_np)),
            "baseline": float(np.mean(base_np)),
        }
        return state, logs, (b_f, b_i)
