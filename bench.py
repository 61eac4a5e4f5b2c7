"""Benchmark: end-to-end study report generation throughput on one chip.

Flagship path (multi-image variant): CvT-21@384 encode of a 2-image study +
256-token report decode with the static-KV-cache while_loop, bfloat16. Two
decode modes are measured:

  * greedy, batch 96 — the throughput-serving configuration (the primary metric,
    comparable across rounds);
  * beam-4, batch 24 — the reference's actual test-time decode configuration
    (`/root/reference/config/train/single_tf.yaml:23-24`, num_test_beams 4) at
    its throughput batch, with the cross-KV cache shared across beams and the
    per-step cache write folded into the beam-reorder matmul (generate/beam.py).
    The reference's own test batch (mbatch_size 8) is also reported as
    ``beam4_ref_batch_studies_per_sec``;
  * longitudinal prompted beam-4 — the FLAGSHIP configuration (the released
    aehrc/cxrmate checkpoint's test path): LoRA q/k decoder, previous-report
    prompt prefill at bucketed widths 64/128/256, mask-token attention, beam-4.
    Reported as ``longitudinal_beam4_studies_per_sec`` (equal-weight mean over
    the width buckets; per-bucket numbers in ``config``).

Prints ONE JSON line:
  {"metric": "studies/sec/chip (encode + 256-token greedy decode)",
   "value": ..., "unit": "studies/sec", "vs_baseline": ...,
   "beam4_studies_per_sec": ..., "config": {...}}

vs_baseline = TPU studies/sec ÷ single-process CPU studies/sec (the reference's
torch pipeline is CPU/GPU-bound per study; the driver's north star is ≥20× the CPU
baseline). The CPU baseline is one full single-study pipeline run at fp32, measured
once on this machine and cached in .bench_cpu_baseline.json.
"""

import json
import os
import sys
import time

import numpy as np

BATCH = 96
BEAM_BATCH = 24       # beam-4 throughput batch: 24 studies × 4 beams = 96 rows,
                      # the same row count as the greedy sweet spot (sweep in DEVNOTES.md)
BEAM_REF_BATCH = 8    # the reference's test mbatch_size (single_tf.yaml:16)
NUM_BEAMS = 4
# flagship longitudinal decode: prompt-prefill width buckets (the CLI test stage
# buckets prompts to multiples of 32 up to decoder_max_len=256; these sample the
# short/typical/maximal cases)
LONGITUDINAL_PROMPT_BUCKETS = (64, 128, 256)
N_IMAGES = 2
DECODE_TOKENS = 255  # + BOS = 256 total, matching decoder_max_len
CACHE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cpu_baseline.json")


def build(config, dtype=None, rng_seed=0):
    import jax
    import jax.numpy as jnp

    from cxrmate_tpu.models import bert as bert_mod
    from cxrmate_tpu.models.cvt import init_cvt_variables
    from cxrmate_tpu.utils.precision import cast_floats

    enc = init_cvt_variables(jax.random.PRNGKey(0), config.encoder)
    dec = bert_mod.init_bert_params(jax.random.PRNGKey(1), config.decoder, lora=config.lora)
    variables = cast_floats(
        {"params": {"encoder": enc["params"], "decoder": dec}, "batch_stats": enc["batch_stats"]},
        dtype or jnp.bfloat16,
    )
    return variables


def make_pipeline(config, variables, batch, decode_tokens):
    import jax
    import jax.numpy as jnp

    from cxrmate_tpu.generate import GenerationConfig, generate
    from cxrmate_tpu.models import encoder_decoder as ed

    gen_cfg = GenerationConfig(
        max_new_tokens=decode_tokens,
        bos_token_id=1, eos_token_id=2, pad_token_id=4,
        special_token_ids=(3,),
    )

    # fused decode kernel compiles correctly but Mosaic compile time through the
    # remote-compile tunnel is prohibitive (>25 min); off by default pending a
    # grid-over-heads restructure
    use_fused = os.environ.get("CXRMATE_BENCH_FUSED", "0") == "1"
    cache_segments = os.environ.get("CXRMATE_CACHE_SEGMENTS", "4:32")

    @jax.jit
    def pipeline(variables, pixels):
        enc_hidden, enc_mask, _ = ed.encode_images(variables, pixels, config)
        prompt = jnp.full((pixels.shape[0], 1), gen_cfg.bos_token_id, jnp.int32)
        seqs = generate(
            variables, config, gen_cfg, enc_hidden, enc_mask, prompt,
            jnp.ones_like(prompt), use_fused=use_fused, cache_segments=cache_segments,
        )
        return seqs

    return pipeline


def make_beam_pipeline(config, decode_tokens, num_beams=NUM_BEAMS):
    import jax
    import jax.numpy as jnp

    from cxrmate_tpu.generate import GenerationConfig
    from cxrmate_tpu.generate.beam import beam_search
    from cxrmate_tpu.models import encoder_decoder as ed

    gen_cfg = GenerationConfig(
        max_new_tokens=decode_tokens,
        bos_token_id=1, eos_token_id=2, pad_token_id=4,
        special_token_ids=(3,), num_beams=num_beams,
    )
    # resolve the KV-write strategy HERE (explicit static arg) so env changes
    # between run() calls are honoured despite jit caching
    write_mode = os.environ.get("CXRMATE_BEAM_WRITE", "fused")
    cache_segments = os.environ.get("CXRMATE_CACHE_SEGMENTS", "4:32")

    @jax.jit
    def pipeline(variables, pixels):
        enc_hidden, enc_mask, _ = ed.encode_images(variables, pixels, config)
        prompt = jnp.full((pixels.shape[0], 1), gen_cfg.bos_token_id, jnp.int32)
        seqs, _ = beam_search(
            variables, config, gen_cfg, enc_hidden, enc_mask, prompt, jnp.ones_like(prompt),
            write_mode=write_mode, cache_segments=cache_segments,
        )
        return seqs

    return pipeline


def make_longitudinal_beam_pipeline(config, decode_tokens, prompt_width,
                                    num_beams=NUM_BEAMS):
    """The FLAGSHIP decode configuration (the released ``aehrc/cxrmate``
    checkpoint's test path): longitudinal variant — LoRA q/k decoder, prompt
    prefill of the previous study's report ([PMT]-section token types, mask-token
    attention, cumsum positions), beam-4 (reference
    `config/test_huggingface/longitudinal_gen_prompt_cxr-bert.yaml`,
    `gt_prompt.py:270-288`). ``prompt_width`` is the bucketed prompt length
    (models/encoder_decoder.py:bucket_prompt); the first-token logits column is
    pinned to it like the CLI test stage does."""
    import jax
    import jax.numpy as jnp

    from cxrmate_tpu.generate import GenerationConfig
    from cxrmate_tpu.generate.beam import beam_search
    from cxrmate_tpu.models import encoder_decoder as ed

    gen_cfg = GenerationConfig(
        max_new_tokens=decode_tokens,
        bos_token_id=1, eos_token_id=2, pad_token_id=4, mask_token_id=4,
        special_token_ids=(5, 1, 3), token_type_sections=(0, 1, 0, 1),
        num_beams=num_beams,
    )

    write_mode = os.environ.get("CXRMATE_BEAM_WRITE", "fused")
    cache_segments = os.environ.get("CXRMATE_CACHE_SEGMENTS", "4:32")

    @jax.jit
    def pipeline(variables, pixels, prompt_ids, prompt_mask):
        enc_hidden, enc_mask, _ = ed.encode_images(variables, pixels, config)
        seqs, _ = beam_search(
            variables, config, gen_cfg, enc_hidden, enc_mask, prompt_ids, prompt_mask,
            prompt_logits_col=prompt_width - 1, write_mode=write_mode,
            cache_segments=cache_segments,
        )
        return seqs

    return pipeline


def run(platform=None, batch=BATCH, decode_tokens=DECODE_TOKENS, iters=3, dtype=None,
        beam=False, longitudinal_prompt_width=None):
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    from cxrmate_tpu.configs import longitudinal_config, multi_tf_config

    if longitudinal_prompt_width is not None:
        config = longitudinal_config(vocab_size=30000)
    else:
        config = multi_tf_config(vocab_size=30000)
    dtype = dtype or jnp.bfloat16
    variables = build(config, dtype=dtype)
    pixels = jnp.asarray(
        np.random.RandomState(0).randn(batch, N_IMAGES, 3, 384, 384), dtype
    )
    prompt_args = ()
    if longitudinal_prompt_width is not None:
        w = longitudinal_prompt_width
        rs = np.random.RandomState(2)
        ids = np.concatenate(
            [np.full((batch, 1), 1, np.int32),  # BOS (tokenize_prompt forces it)
             rs.randint(6, 30000, size=(batch, w - 1)).astype(np.int32)], axis=1
        )
        prompt_args = (jnp.asarray(ids), jnp.ones((batch, w), jnp.int32))
        pipeline = make_longitudinal_beam_pipeline(config, decode_tokens, w)
    elif beam:
        pipeline = make_beam_pipeline(config, decode_tokens)
    else:
        pipeline = make_pipeline(config, variables, batch, decode_tokens)
    # NOTE: synchronise via host transfer — on the axon backend block_until_ready
    # returns before execution finishes; fetching the (tiny) token output is the
    # only reliable fence. Dispatch is async, so queueing `iters` executions and
    # fencing the last amortises the host↔device round-trip (~30 ms) across the
    # batch of iterations (single stream, executed back-to-back on device).
    np.asarray(pipeline(variables, pixels, *prompt_args))  # compile + warm
    profile_dir = os.environ.get("CXRMATE_BENCH_PROFILE_DIR")
    if profile_dir:
        from cxrmate_tpu.utils.tracing import profile as profile_ctx
    else:
        import contextlib

        profile_ctx = lambda _d: contextlib.nullcontext()  # noqa: E731
    t0 = time.perf_counter()
    with profile_ctx(profile_dir):
        outs = [pipeline(variables, pixels, *prompt_args) for _ in range(iters)]
        np.asarray(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, dt


def run_train(iters=10):
    """Reference multi TF train-step timing (mbatch 4×5 images, grad-accum 8,
    bf16 compute / fp32 masters — `config/train/multi_tf.yaml:8`,
    `single_tf.yaml:16-17,21`): ms/step and studies/sec/chip. Round-3 healthy:
    ~113-116 ms (dropout-mask materialisation; DEVNOTES)."""
    import jax
    import jax.numpy as jnp

    from cxrmate_tpu.configs import multi_tf_config
    from cxrmate_tpu.train import tf_trainer
    from cxrmate_tpu.train.optim import adamw

    mb, n_img, t = 4, 5, 256
    config = multi_tf_config(vocab_size=30000)
    variables = build(config, dtype=jnp.float32)
    tx = adamw(5e-5, accumulate_steps=8)
    state = tf_trainer.create_train_state(variables, tx)
    step = tf_trainer.make_train_step(config, tx, compute_dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    batch = {
        "pixel_values": jnp.asarray(rng.randn(mb, n_img, 3, 384, 384), jnp.float32),
        "decoder_input_ids": jnp.asarray(rng.randint(5, 29000, (mb, t)), jnp.int32),
        "decoder_attention_mask": jnp.ones((mb, t), jnp.int32),
        "decoder_token_type_ids": jnp.zeros((mb, t), jnp.int32),
        "label_ids": jnp.asarray(rng.randint(5, 29000, (mb, t)), jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    state, loss = step(state, batch, key)  # compile + warm
    np.asarray(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, batch, key)
    np.asarray(loss)  # fence (axon: block_until_ready returns early)
    dt = (time.perf_counter() - t0) / iters
    return dt, mb / dt


def cpu_baseline():
    """Measure (or load) the CPU studies/sec baseline: one full study at fp32."""
    if os.path.exists(CACHE_FILE):
        with open(CACHE_FILE) as f:
            return json.load(f)["studies_per_sec"]
    import subprocess

    # full single-study pipeline on CPU, fp32 (the dtype a CPU deployment of the
    # reference would use), measured once and cached
    code = (
        "import json,sys,jax.numpy as jnp;sys.path.insert(0,%r);import bench;"
        "sps,dt=bench.run(platform='cpu',batch=1,decode_tokens=bench.DECODE_TOKENS,"
        "iters=1,dtype=jnp.float32);"
        "print(json.dumps({'studies_per_sec':sps}))"
        % os.path.dirname(os.path.abspath(__file__))
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    line = out.stdout.strip().splitlines()[-1]
    data = json.loads(line)
    with open(CACHE_FILE, "w") as f:
        json.dump(data, f)
    return data["studies_per_sec"]


def main():
    if "--profile" in sys.argv:
        # dump a jax.profiler trace of the timed loop (perfetto/tensorboard format)
        os.environ.setdefault("CXRMATE_BENCH_PROFILE_DIR", "/tmp/cxrmate_trace")
        print(
            f"profiling to {os.environ['CXRMATE_BENCH_PROFILE_DIR']}", file=sys.stderr
        )
    sps, dt = run()
    p50 = dt / BATCH
    try:
        cpu_sps = cpu_baseline()
        vs = sps / cpu_sps
    except Exception as e:  # noqa: BLE001 - baseline is best-effort
        print(f"cpu baseline failed: {e}", file=sys.stderr)
        vs = None
    print(
        f"greedy: batch={BATCH} studies, {N_IMAGES} images/study, {DECODE_TOKENS + 1}-token "
        f"reports; batch latency {dt * 1e3:.1f} ms ({p50 * 1e3:.2f} ms/study)",
        file=sys.stderr,
    )
    errors = []
    beam_sps = beam_ref_sps = None
    if os.environ.get("CXRMATE_BENCH_SKIP_BEAM", "0") != "1":
        for name, bb in (("beam", BEAM_BATCH), ("beam_ref", BEAM_REF_BATCH)):
            try:
                sps_b, beam_dt = run(batch=bb, beam=True)
                print(
                    f"beam-{NUM_BEAMS}: batch={bb} studies; batch latency "
                    f"{beam_dt * 1e3:.1f} ms ({beam_dt / bb * 1e3:.2f} ms/study)",
                    file=sys.stderr,
                )
                if name == "beam":
                    beam_sps = sps_b
                else:
                    beam_ref_sps = sps_b
            except Exception as e:  # noqa: BLE001 - recorded + nonzero exit below
                print(f"{name} bench failed: {e}", file=sys.stderr)
                errors.append(f"{name}: {type(e).__name__}: {e}")
    # flagship config: longitudinal prompted beam-4 over bucketed prompt widths
    long_by_width = {}
    long_sps = None
    if os.environ.get("CXRMATE_BENCH_SKIP_LONGITUDINAL", "0") != "1":
        for w in LONGITUDINAL_PROMPT_BUCKETS:
            try:
                sps_l, dt_l = run(batch=BEAM_BATCH, beam=True, iters=2,
                                  longitudinal_prompt_width=w)
                long_by_width[str(w)] = round(sps_l, 3)
                print(
                    f"longitudinal beam-{NUM_BEAMS}: prompt {w} tok, batch={BEAM_BATCH}; "
                    f"batch latency {dt_l * 1e3:.1f} ms "
                    f"({dt_l / BEAM_BATCH * 1e3:.2f} ms/study incl. prefill)",
                    file=sys.stderr,
                )
            except Exception as e:  # noqa: BLE001 - recorded + nonzero exit below
                print(f"longitudinal[{w}] bench failed: {e}", file=sys.stderr)
                errors.append(f"longitudinal[{w}]: {type(e).__name__}: {e}")
        if long_by_width:
            # headline: equal-weight mean over the width buckets (the MIMIC prompt
            # distribution is unavailable offline; per-bucket numbers are in config)
            vals = list(long_by_width.values())
            long_sps = sum(vals) / len(vals)
    train_ms = train_sps = None
    if os.environ.get("CXRMATE_BENCH_SKIP_TRAIN", "0") != "1":
        try:
            train_dt, train_sps = run_train()
            train_ms = train_dt * 1e3
            print(
                f"train: multi TF step mbatch 4x5 images, accum 8, bf16; "
                f"{train_ms:.1f} ms/step ({train_sps:.1f} studies/s)",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001 - recorded + nonzero exit below
            print(f"train bench failed: {e}", file=sys.stderr)
            errors.append(f"train: {type(e).__name__}: {e}")
    print(
        json.dumps(
            {
                "metric": "studies/sec/chip (encode + 256-token greedy decode)",
                "value": round(sps, 3),
                "unit": "studies/sec",
                "vs_baseline": round(vs, 2) if vs is not None else None,
                "p50_study_latency_ms": round(p50 * 1e3, 3),
                "beam4_studies_per_sec": (
                    round(beam_sps, 3) if beam_sps is not None else None
                ),
                "beam4_ref_batch_studies_per_sec": (
                    round(beam_ref_sps, 3) if beam_ref_sps is not None else None
                ),
                "longitudinal_beam4_studies_per_sec": (
                    round(long_sps, 3) if long_sps is not None else None
                ),
                "train_step_ms": round(train_ms, 1) if train_ms is not None else None,
                "train_studies_per_sec": (
                    round(train_sps, 2) if train_sps is not None else None
                ),
                "config": {
                    "greedy_batch": BATCH,
                    "beam_batch": BEAM_BATCH,
                    "beam_ref_batch": BEAM_REF_BATCH,
                    "num_beams": NUM_BEAMS,
                    "images_per_study": N_IMAGES,
                    "report_tokens": DECODE_TOKENS + 1,
                    "longitudinal_prompt_buckets": LONGITUDINAL_PROMPT_BUCKETS,
                    "longitudinal_beam4_by_prompt_width": long_by_width or None,
                },
                **({"errors": errors} if errors else {}),
            }
        )
    )
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
