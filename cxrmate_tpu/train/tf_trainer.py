"""Teacher-forcing training: loss, train step, and the host-side batch builder.

Semantics match the reference steps exactly:
  * single/multi (single.py:449-475, multi.py:182-210): CE over logits with
    ``ignore_index=pad`` on the shift-one labels; token types from the SEP rule.
  * gt-prompt (gt_prompt.py:186-249): prompt+report concatenation, cumulative
    position ids, [0,1,0,1] section types split at [PMT-SEP]/BOS/SEP, labels
    left-padded to the prompt length.

The compiled step is one ``jax.jit`` with donated state; data parallelism comes from
sharding the batch on the mesh 'data' axis (gradients reduce over ICI via GSPMD),
tensor parallelism from the decoder param specs in ``parallel/mesh.py``."""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cxrmate_tpu.configs import EncoderDecoderConfig
from cxrmate_tpu.models import encoder_decoder as ed
from cxrmate_tpu.train.optim import zero_frozen_grads


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: dict
    batch_stats: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def create_train_state(variables: Dict, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def cross_entropy_ignore_pad(logits: jnp.ndarray, labels: jnp.ndarray, pad_id: int) -> jnp.ndarray:
    """torch ``F.cross_entropy(..., ignore_index=pad)``: mean NLL over non-pad labels."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    mask = (labels != pad_id).astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_train_step(
    config: EncoderDecoderConfig,
    tx: optax.GradientTransformation,
    trainable_mask: Optional[dict] = None,
    pad_id: int = 4,
    compute_dtype=None,
):
    """Build the jitted TF train step.

    batch: dict with 'pixel_values', 'decoder_input_ids', 'decoder_attention_mask',
    'decoder_token_type_ids', optional 'decoder_position_ids', 'label_ids'.

    ``compute_dtype`` (e.g. bf16) enables mixed precision — the reference trains
    fp16 (`config/train/single_tf.yaml:21`): master params and optimizer moments
    stay fp32, the forward/backward runs with params/activations cast to the
    compute dtype (gradients flow through the cast back to fp32), and the CE loss
    is computed from fp32-upcast logits. Deviation: BatchNorm running-stat
    momentum updates execute in the compute dtype and are stored back as fp32
    (torch AMP exempts BN; the ~2⁻⁸ relative step noise is negligible and the
    longitudinal stages freeze the encoder anyway)."""

    def loss_fn(params, batch_stats, batch, rng):
        if compute_dtype is not None:
            from cxrmate_tpu.utils.precision import cast_floats

            params_c = cast_floats(params, compute_dtype)
            stats_c = cast_floats(batch_stats, compute_dtype)
            batch = {
                k: v.astype(compute_dtype)
                if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating)
                else v
                for k, v in batch.items()
            }
        else:
            params_c, stats_c = params, batch_stats
        logits, new_stats = ed.forward(
            {"params": params_c, "batch_stats": stats_c},
            batch["pixel_values"],
            batch["decoder_input_ids"],
            config,
            decoder_attention_mask=batch["decoder_attention_mask"],
            decoder_token_type_ids=batch["decoder_token_type_ids"],
            decoder_position_ids=batch.get("decoder_position_ids"),
            train=True,
            rng=rng,
            remat_encoder=os.environ.get("CXRMATE_REMAT_ENCODER", "0") == "1",
        )
        if compute_dtype is not None:
            from cxrmate_tpu.utils.precision import cast_floats

            new_stats = cast_floats(new_stats, jnp.float32)
        loss = cross_entropy_ignore_pad(logits, batch["label_ids"], pad_id)
        return loss, new_stats

    @functools.partial(jax.jit, donate_argnums=(0,))
    @jax.named_scope("train_step")
    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, jnp.ndarray]:
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng
        )
        if trainable_mask is not None:
            grads = zero_frozen_grads(grads, trainable_mask)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, batch_stats=new_stats, opt_state=opt_state, step=state.step + 1),
            loss,
        )

    return train_step


# --------------------------------------------------------------- batch assembly
def build_tf_batch(
    tokenizer,
    config: EncoderDecoderConfig,
    images: np.ndarray,
    findings: Sequence[str],
    impression: Sequence[str],
    previous_findings: Optional[Sequence[Optional[str]]] = None,
    previous_impression: Optional[Sequence[Optional[str]]] = None,
    pad_report_to: Optional[int] = None,
    pad_prompt_to: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Host-side batch assembly replicating the reference training_steps.

    ``pad_report_to``/``pad_prompt_to`` optionally bucket the dynamic 'longest'
    padding up to fixed widths so XLA compiles a handful of shapes instead of one
    per batch."""
    tok = ed.tokenize_report_teacher_forcing(findings, impression, tokenizer, config.decoder_max_len)
    ids, mask, labels = tok["decoder_input_ids"], tok["decoder_attention_mask"], tok["label_ids"]
    if pad_report_to:
        ids = _pad_np(ids, pad_report_to, tokenizer.pad_token_id)
        mask = _pad_np(mask, pad_report_to, 0)
        labels = _pad_np(labels, pad_report_to, tokenizer.pad_token_id)

    if config.variant != "longitudinal":
        sep = tokenizer.sep_token_id
        types = np.asarray(
            ed.token_ids_to_token_type_ids(jnp.asarray(ids), [sep])
        )
        return {
            "pixel_values": images,
            "decoder_input_ids": ids,
            "decoder_attention_mask": mask,
            "decoder_token_type_ids": types,
            "label_ids": labels,
        }

    prompt = ed.tokenize_prompt(
        previous_findings, previous_impression, tokenizer, config.prompt_max_len
    )
    p_ids, p_mask = prompt["input_ids"], prompt["attention_mask"]
    if pad_prompt_to:
        p_ids = _pad_np(p_ids, pad_prompt_to, tokenizer.pad_token_id)
        p_mask = _pad_np(p_mask, pad_prompt_to, 0)
    full_ids = np.concatenate([p_ids, ids], axis=1)
    full_mask = np.concatenate([p_mask, mask], axis=1)
    pos = np.maximum(np.cumsum(full_mask, axis=1) - 1, 0)
    pmt_sep = tokenizer.vocab["[PMT-SEP]"]
    types = np.asarray(
        ed.token_ids_to_token_type_ids(
            jnp.asarray(full_ids),
            [pmt_sep, tokenizer.bos_token_id, tokenizer.sep_token_id],
            [0, 1, 0, 1],
        )
    )
    # left-pad labels to cover the prompt region (gt_prompt.py:233-238)
    full_labels = np.full(full_ids.shape, tokenizer.pad_token_id, dtype=labels.dtype)
    full_labels[:, p_ids.shape[1] :] = labels
    return {
        "pixel_values": images,
        "decoder_input_ids": full_ids,
        "decoder_attention_mask": full_mask,
        "decoder_token_type_ids": types,
        "decoder_position_ids": pos,
        "label_ids": full_labels,
    }


def _pad_np(a: np.ndarray, width: int, fill) -> np.ndarray:
    if a.shape[1] >= width:
        return a
    out = np.full((a.shape[0], width), fill, dtype=a.dtype)
    out[:, : a.shape[1]] = a
    return out
