"""Sampled decoding: warped-score structure and sampled-token validity."""

import numpy as np

import jax
import jax.numpy as jnp

from cxrmate_tpu.configs import BertDecoderConfig, CvtConfig, EncoderDecoderConfig
from cxrmate_tpu.generate import GenerationConfig, generate
from cxrmate_tpu.models import bert as bert_mod
from cxrmate_tpu.models import encoder_decoder as ed
from cxrmate_tpu.models.cvt import init_cvt_variables

BOS, EOS, SEP, PAD = 1, 2, 3, 4


def test_sampled_tokens_respect_top_k():
    cfg = EncoderDecoderConfig(
        encoder=CvtConfig(embed_dim=(8, 12, 16), num_heads=(1, 2, 2), depth=(1, 1, 3),
                          drop_path_rate=(0.0, 0.0, 0.0), projection_size=16),
        decoder=BertDecoderConfig(
            vocab_size=64, hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=32, max_position_embeddings=64, cross_attention_hidden_size=16,
        ),
        variant="multi", image_size=32,
    )
    enc = init_cvt_variables(jax.random.PRNGKey(0), cfg.encoder)
    dec = bert_mod.init_bert_params(jax.random.PRNGKey(1), cfg.decoder)
    variables = {"params": {"encoder": enc["params"], "decoder": dec},
                 "batch_stats": enc["batch_stats"]}
    pixels = jnp.asarray(np.random.RandomState(0).randn(3, 2, 3, 32, 32), jnp.float32)
    enc_hidden, enc_mask, _ = ed.encode_images(variables, pixels, cfg)
    k = 5
    gen_cfg = GenerationConfig(
        max_new_tokens=10, bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
        special_token_ids=(SEP,), do_sample=True, top_k=k, temperature=0.8,
    )
    prompt = jnp.full((3, 1), BOS, jnp.int32)
    seqs, scores = generate(
        variables, cfg, gen_cfg, enc_hidden, enc_mask, prompt, jnp.ones_like(prompt),
        jax.random.PRNGKey(3), return_scores=True,
    )
    seqs, scores = np.asarray(seqs), np.asarray(scores)
    gen = seqs[:, 1:]
    for b in range(3):
        for t in range(gen.shape[1]):
            row = scores[b, t]
            if not np.isfinite(row).any():
                break  # finished rows stop writing scores
            finite = np.isfinite(row) & (row > -1e29)
            assert finite.sum() <= k, (b, t, finite.sum())
            tok = gen[b, t]
            if tok == PAD and row[PAD] <= -1e29:
                continue  # post-finish padding, not a sampled token
            assert finite[tok], (b, t, tok)

    # different seeds draw different sequences; same seed reproduces
    seqs2 = np.asarray(
        generate(variables, cfg, gen_cfg, enc_hidden, enc_mask, prompt,
                 jnp.ones_like(prompt), jax.random.PRNGKey(3))
    )
    np.testing.assert_array_equal(seqs, seqs2)
    seqs3 = np.asarray(
        generate(variables, cfg, gen_cfg, enc_hidden, enc_mask, prompt,
                 jnp.ones_like(prompt), jax.random.PRNGKey(4))
    )
    assert (seqs3 != seqs).any()
