"""Optimizers and trainable-parameter masking.

The reference trains with ``torch.optim.AdamW(lr)`` (single.py:426-431, defaults:
betas (0.9, 0.999), eps 1e-8, weight_decay 0.01) with Lightning-managed gradient
accumulation (``accumulated_mbatch_size`` 32, single_tf.yaml:16-17). Freezing rules:

  * single/multi TF: everything trains;
  * gt-prompt TF: encoder frozen + decoder frozen except LoRA (PEFT semantics,
    modelling_longitudinal.py:159-170);
  * SCST: encoder frozen, full decoder (incl. LoRA) trains (scst/gt_prompt.py:35-40).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import optax


def adamw(lr: float, weight_decay: float = 0.01, accumulate_steps: int = 1,
          trainable_mask=None) -> optax.GradientTransformation:
    """AdamW with optional freezing and gradient accumulation.

    Freezing must happen in the optimizer (``optax.masked``), not by zeroing
    gradients alone: AdamW's decoupled weight decay would still move frozen params
    (torch's requires_grad=False leaves them untouched entirely)."""
    tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay)
    if trainable_mask is not None:
        tx = optax.masked(tx, trainable_mask)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def _map_with_path(fn: Callable, tree):
    return jax.tree_util.tree_map_with_path(fn, tree)


def mask_all(params) -> dict:
    return jax.tree_util.tree_map(lambda _: True, params)


def mask_none(params) -> dict:
    return jax.tree_util.tree_map(lambda _: False, params)


def _path_contains(path, needle: str) -> bool:
    return any(
        getattr(k, "key", None) == needle or getattr(k, "name", None) == needle
        for k in path
    )


def mask_lora_only(params) -> dict:
    """gt-prompt TF: only lora_a/lora_b leaves train."""
    return _map_with_path(
        lambda path, _: _path_contains(path, "lora_a") or _path_contains(path, "lora_b"),
        params,
    )


def mask_decoder_only(params) -> dict:
    """SCST: decoder (incl. LoRA) trains, encoder frozen."""
    return _map_with_path(lambda path, _: _path_contains(path, "decoder"), params)


def mask_for_stage(params, stage: str) -> dict:
    if stage in ("single", "multi"):
        return mask_all(params)
    if stage == "gt_prompt":
        return _map_with_path(
            lambda path, _: _path_contains(path, "lora_a") or _path_contains(path, "lora_b"),
            params,
        )
    if stage in ("scst", "scst_gt", "gen_prompt"):
        return mask_decoder_only(params)
    raise ValueError(stage)


def zero_frozen_grads(grads, mask):
    """Zero out gradients of frozen leaves (keeps optimizer masks simple under
    MultiSteps accumulation)."""
    return jax.tree_util.tree_map(
        lambda g, m: g if m else jax.numpy.zeros_like(g), grads, mask
    )
