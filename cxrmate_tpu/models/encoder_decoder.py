"""CXRMate encoder-decoder variants: single, multi, longitudinal.

The public surface mirrors what the reference exposes through its HF Hub checkpoints
(`/root/reference/modules/transformers/*/modelling_*.py` and the notebooks in
`/root/reference/examples/`):

  * ``encode`` / ``forward(pixel_values, decoder_input_ids, ...)``
  * ``tokenize_report_teacher_forcing`` (modelling_single.py:320)
  * ``tokenize_prompt`` (modelling_longitudinal.py:459)
  * ``token_ids_to_token_type_ids`` / ``..._past`` (modelling_single.py:251,294) —
    implemented as vectorised device fns (no per-row Python loops)
  * ``split_and_decode_sections`` (modelling_single.py:367)

Model semantics per variant:
  * single: pixel_values [B, 3, H, W]; no encoder attention mask
    (modelling_single.py:176-177).
  * multi: pixel_values [B, N, 3, H, W]; images whose [0,0,0] pixel is exactly 0 are
    padding → cross-attention mask repeated per spatial token
    (modelling_multi.py:80).
  * longitudinal: multi + previous-report prompt, LoRA on decoder q/k, mask-token
    attention and cumulative position ids at generation time
    (modelling_longitudinal.py:251-295).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cxrmate_tpu.configs import EncoderDecoderConfig
from cxrmate_tpu.models import bert as bert_mod
from cxrmate_tpu.models.cvt import cvt_encode


# ------------------------------------------------------------------------- encoder
@jax.named_scope("encode")
def encode_images(
    variables: Dict,
    pixel_values: jnp.ndarray,
    config: EncoderDecoderConfig,
    *,
    train: bool = False,
    rng=None,
    remat: bool = False,
    use_flash: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """Encode pixel values → (encoder_hidden [B, T_enc, P], encoder_mask [B, T_enc],
    new_batch_stats).

    single: T_enc = tokens_per_image, mask all ones.
    multi/longitudinal: images folded into the batch, projected, then concatenated
    per study; mask derives from the all-zero-padding convention.

    ``use_flash`` (default: ``CXRMATE_FLASH_ENCODE=1``, read at trace time)
    routes stage attention through the Pallas flash kernel — an accuracy-mode
    knob: online softmax matches exact attention to reassociation tolerance
    (tests/test_flash_attention.py), NOT bit-exactly, so parity runs keep the
    XLA path (the default). Training composes with it through the FlashAttention
    custom_vjp."""
    if use_flash is None:
        import os

        use_flash = os.environ.get("CXRMATE_FLASH_ENCODE", "0") == "1"
    # the Mosaic kernel only lowers on TPU; everywhere else (the CPU dev/test
    # box) fall back to interpret mode so the env knob never crashes a run
    flash_interpret = use_flash and jax.default_backend() != "tpu"
    params, stats = variables["params"]["encoder"], variables["batch_stats"]
    if config.variant == "single":
        if pixel_values.ndim == 5:
            # the CLI collate stacks every variant to [B, N, 3, H, W]; the
            # single variant's dataset yields exactly one real image per
            # example (any extra slots are all-zero padding) — take slot 0
            pixel_values = pixel_values[:, 0]
        hidden, new_stats = cvt_encode(
            params, stats, pixel_values, config.encoder, train=train, rng=rng, remat=remat,
            use_flash=use_flash, flash_interpret=flash_interpret,
        )
        mask = jnp.ones(hidden.shape[:2], dtype=jnp.int32)
        return hidden, mask, new_stats
    b, n = pixel_values.shape[:2]
    flat = pixel_values.reshape((b * n,) + pixel_values.shape[2:])
    hidden, new_stats = cvt_encode(
        params, stats, flat, config.encoder, train=train, rng=rng, remat=remat,
        use_flash=use_flash, flash_interpret=flash_interpret,
    )
    tokens_per = hidden.shape[1]
    hidden = hidden.reshape(b, n * tokens_per, hidden.shape[-1])
    # modelling_multi.py:80 — an image is padding iff pixel [0,0,0] == 0.0.
    img_mask = (pixel_values[:, :, 0, 0, 0] != 0.0).astype(jnp.int32)
    mask = jnp.repeat(img_mask, tokens_per, axis=1)
    return hidden, mask, new_stats


def forward(
    variables: Dict,
    pixel_values: Optional[jnp.ndarray],
    decoder_input_ids: jnp.ndarray,
    config: EncoderDecoderConfig,
    *,
    decoder_attention_mask: Optional[jnp.ndarray] = None,
    decoder_token_type_ids: Optional[jnp.ndarray] = None,
    decoder_position_ids: Optional[jnp.ndarray] = None,
    encoder_outputs: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    train: bool = False,
    rng=None,
    remat_encoder: bool = False,
) -> Tuple[jnp.ndarray, Dict]:
    """Teacher-forcing forward → (logits [B, L, V], new_batch_stats)."""
    rng_enc = rng_dec = None
    if rng is not None:
        rng_enc, rng_dec = jax.random.split(rng)
    if encoder_outputs is None:
        enc_hidden, enc_mask, new_stats = encode_images(
            variables, pixel_values, config, train=train, rng=rng_enc,
            remat=remat_encoder,
        )
    else:
        enc_hidden, enc_mask = encoder_outputs
        new_stats = variables["batch_stats"]
    if config.variant == "single":
        enc_mask = None  # modelling_single.py:176 — no encoder mask for single
        cross_mask_arg = jnp.ones(enc_hidden.shape[:2], dtype=jnp.int32)
    else:
        cross_mask_arg = enc_mask
    logits = bert_mod.bert_forward(
        variables["params"]["decoder"],
        config.decoder,
        decoder_input_ids,
        attention_mask=decoder_attention_mask,
        token_type_ids=decoder_token_type_ids,
        position_ids=decoder_position_ids,
        encoder_hidden_states=enc_hidden,
        encoder_attention_mask=cross_mask_arg,
        lora=config.lora,
        train=train,
        rng=rng_dec,
    )
    return logits, new_stats


# ------------------------------------------------------- token-type computation
def token_ids_to_token_type_ids(
    token_ids: jnp.ndarray,
    special_token_ids: Sequence[int],
    token_type_id_sections: Optional[Sequence[int]] = None,
) -> jnp.ndarray:
    """Vectorised port of modelling_single.py:251-292.

    For each special token (in order), positions strictly after its first occurrence
    are overwritten with the next section's type id."""
    sections = (
        list(token_type_id_sections)
        if token_type_id_sections is not None
        else list(range(len(special_token_ids) + 1))
    )
    b, l = token_ids.shape
    cols = jnp.arange(l)
    out = jnp.full((b, l), sections[0], dtype=jnp.int32)
    for i, sid in enumerate(special_token_ids):
        hit = token_ids == sid
        first = jnp.argmax(hit.astype(jnp.int32), axis=1)  # 0 when absent
        # reference: cols = first+1; rows kept iff cols != 1 and cols < seq_len —
        # a boundary at index 0 (or an absent token, argmax 0) is ignored.
        exists = (first != 0) & (first + 1 < l)
        after = cols[None, :] > first[:, None]
        out = jnp.where(exists[:, None] & after, sections[i + 1], out)
    return out


def token_ids_to_token_type_ids_past(
    token_ids: jnp.ndarray,
    special_token_ids: Sequence[int],
    token_type_id_sections: Optional[Sequence[int]] = None,
) -> jnp.ndarray:
    """Vectorised port of modelling_single.py:294-318: type id of the *next* token,
    given everything decoded so far (the last column is excluded, matching HF's
    convention of passing the not-yet-embedded current token)."""
    sections = (
        list(token_type_id_sections)
        if token_type_id_sections is not None
        else list(range(len(special_token_ids) + 1))
    )
    b, l = token_ids.shape
    past = token_ids[:, : l - 1]
    out = jnp.full((b,), sections[0], dtype=jnp.int32)
    for i, sid in enumerate(special_token_ids):
        exists = jnp.any(past == sid, axis=1)
        out = jnp.where(exists, sections[i + 1], out)
    return out


# ---------------------------------------------------------------- host-side helpers
def tokenize_report_teacher_forcing(
    findings: Sequence[str], impression: Sequence[str], tokenizer, max_len: int
) -> Dict[str, np.ndarray]:
    """[BOS]findings[SEP]impression[EOS] → shifted decoder inputs/labels
    (modelling_single.py:320-365)."""
    reports = [
        f"{tokenizer.bos_token}{f}{tokenizer.sep_token}{i}{tokenizer.eos_token}"
        for f, i in zip(findings, impression)
    ]
    tok = tokenizer(reports, padding="longest", truncation=True, max_length=max_len + 1)
    return {
        "label_ids": tok["input_ids"][:, 1:].copy(),
        "decoder_input_ids": tok["input_ids"][:, :-1],
        "decoder_attention_mask": tok["attention_mask"][:, 1:],
    }


def tokenize_prompt(
    previous_findings: Sequence[Optional[str]],
    previous_impression: Sequence[Optional[str]],
    tokenizer,
    max_len: int,
    add_bos_token_id: bool = False,
) -> Dict[str, np.ndarray]:
    """[PMT]prev_f[PMT-SEP]prev_i([BOS]) with [NPF]/[NPI] placeholders
    (modelling_longitudinal.py:459-513)."""
    previous_findings = ["[NPF]" if not f else f for f in previous_findings]
    previous_impression = ["[NPI]" if not i else i for i in previous_impression]
    if add_bos_token_id:
        texts = [
            f"[PMT]{f}[PMT-SEP]{i}{tokenizer.bos_token}"
            for f, i in zip(previous_findings, previous_impression)
        ]
    else:
        texts = [f"[PMT]{f}[PMT-SEP]{i}" for f, i in zip(previous_findings, previous_impression)]
    tok = tokenizer(texts, padding="longest", truncation=True, max_length=max_len)
    input_ids, attention_mask = tok["input_ids"], tok["attention_mask"]
    if input_ids.shape[1] == max_len:
        # force BOS into the final slot of truncated rows — the reference applies this
        # unconditionally, not only when add_bos_token_id (modelling_longitudinal.py:503-509)
        last_real = attention_mask[:, -1] == 1
        input_ids[last_real, -1] = tokenizer.bos_token_id
    return {"input_ids": input_ids, "attention_mask": attention_mask}


def split_and_decode_sections(
    token_ids: np.ndarray, special_token_ids: Sequence[int], tokenizer
) -> Tuple[List[str], ...]:
    """Split each row at the first occurrence of each boundary special token and
    decode (modelling_single.py:367-411)."""
    token_ids = np.asarray(token_ids)
    _, seq_len = token_ids.shape
    sections: List[List[str]] = [[] for _ in special_token_ids]
    for row in token_ids:
        prev_col = 0
        for j, k in enumerate(special_token_ids):
            if prev_col >= seq_len:
                sections[j].append("")
                continue
            hits = np.flatnonzero(row == k)
            col = int(hits[0]) if hits.size else 0
            if col == 0:  # not found (or found at 0, impossible for well-formed rows)
                col = seq_len
            sections[j].append(tokenizer.decode(row[prev_col:col], skip_special_tokens=True))
            prev_col = col
    return tuple(sections)


def bucket_prompt(input_ids: np.ndarray, attention_mask: np.ndarray, pad_id: int,
                  bucket: int = 32, max_len: Optional[int] = None):
    """Right-pad a tokenised prompt to the next width bucket.

    Distinct prompt widths compile distinct decode programs; bucketing bounds the
    number of compilations. Extra right padding is semantically inert under the
    longitudinal mask-token attention (pad columns are masked, the final query
    column is a PAD/mask query either way — identical logits)."""
    width = input_ids.shape[1]
    target = -(-width // bucket) * bucket
    if max_len is not None:
        target = min(max(target, width), max_len) if width <= max_len else width
    if target <= width:
        return input_ids, attention_mask
    pad = target - width
    input_ids = np.pad(input_ids, ((0, 0), (0, pad)), constant_values=pad_id)
    attention_mask = np.pad(attention_mask, ((0, 0), (0, pad)), constant_values=0)
    return input_ids, attention_mask


def cumulative_position_ids(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """relu(cumsum(mask) - 1) — the longitudinal position rule
    (modelling_longitudinal.py:275-277)."""
    return jnp.maximum(jnp.cumsum(attention_mask.astype(jnp.int32), axis=1) - 1, 0)
