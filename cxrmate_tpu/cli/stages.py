"""Train/test stage orchestration.

The TPU-native counterpart of `/root/reference/tools/stages.py`: resolve warm-start
(explicit checkpoint, best checkpoint of another experiment, HF checkpoint dir, or
fresh init), fit with per-epoch validation + checkpoint selection on the monitored
metric, and test with beam search + the full metric battery."""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cxrmate_tpu import configs as model_configs
from cxrmate_tpu.ckpt import orbax_io
from cxrmate_tpu.ckpt.hf_convert import convert_encoder_decoder
from cxrmate_tpu.cli.config import TaskConfig
from cxrmate_tpu.data import image as image_mod
from cxrmate_tpu.data.datasets import DicomDataset, PreviousReportDataset, StudyDataset
from cxrmate_tpu.data.index import build_merged_index, filter_split
from cxrmate_tpu.data.pipeline import Prefetcher, batch_iterator
from cxrmate_tpu.generate import GenerationConfig, generate
from cxrmate_tpu.generate.beam import beam_search
from cxrmate_tpu.models import bert as bert_mod
from cxrmate_tpu.models import encoder_decoder as ed
from cxrmate_tpu.models.cvt import init_cvt_variables
from cxrmate_tpu.tokenizer import ByteLevelBPETokenizer
from cxrmate_tpu.train import optim
from cxrmate_tpu.train.tf_trainer import build_tf_batch, create_train_state, make_train_step
from cxrmate_tpu.utils.tracing import annotate

VARIANT_TO_MODEL = {
    "single": "single",
    "multi": "multi",
    "gt_prompt": "longitudinal",
    "gen_prompt": "longitudinal",
    "scst": "longitudinal",
    "scst_gt": "longitudinal",
}


def build_model_config(task: TaskConfig, vocab_size: int) -> model_configs.EncoderDecoderConfig:
    variant = VARIANT_TO_MODEL[task.variant]
    if task.model_preset == "tiny":
        return model_configs.EncoderDecoderConfig(
            encoder=model_configs.CvtConfig(
                embed_dim=(8, 12, 16), num_heads=(1, 2, 2), depth=(1, 1, 3),
                drop_path_rate=(0.0, 0.0, 0.0), projection_size=16,
            ),
            decoder=model_configs.BertDecoderConfig(
                vocab_size=vocab_size, hidden_size=16, num_hidden_layers=2,
                num_attention_heads=2, intermediate_size=32,
                max_position_embeddings=max(2 * task.decoder_max_len, 64),
                cross_attention_hidden_size=16,
            ),
            variant=variant,
            lora=model_configs.LoraConfig() if variant == "longitudinal" else None,
            image_size=task.image_size,
            decoder_max_len=task.decoder_max_len,
            max_images_per_study=task.max_images_per_study,
        )
    if variant == "single":
        cfg = model_configs.single_tf_config(vocab_size)
    elif variant == "multi":
        cfg = model_configs.multi_tf_config(vocab_size)
    else:
        cfg = model_configs.longitudinal_config(vocab_size)
    # thread the task's data-shape fields through (the tiny preset already
    # does): otherwise a YAML decoder_max_len/image_size override would apply
    # to the task's decode budgets but not the model config's TF tokenisation,
    # silently training and testing under different length budgets
    return dataclasses.replace(
        cfg, image_size=task.image_size, decoder_max_len=task.decoder_max_len,
        max_images_per_study=task.max_images_per_study,
    )


def mesh_from_task(task: TaskConfig):
    """Build the dp×tp device mesh when the config asks for one
    (``mesh_data``/``mesh_model``; the reference's `devices`/`strategy: ddp`,
    config/train/single_tf.yaml:8-9). Returns None for the single-device default.

    This is the EVAL-side resolution: in multi-process runs it returns None —
    evaluation is embarrassingly parallel (each process decodes its rank-strided
    share on its local devices with a host copy of the replicated params; metric
    rows are gathered with ``process_allgather``, eval/metrics.py). Generated-
    prompt datasets stride by LANE instead of by row (a subject's history
    thread must stay on one rank in step order — see evaluate()). Training stages
    use ``_fit_mesh``, which in multi-process runs builds the global
    data-parallel mesh instead."""
    from cxrmate_tpu.parallel.mesh import make_mesh

    if task.mesh_data is None and task.mesh_model <= 1:
        return None
    if jax.process_count() > 1:
        return None
    mesh = make_mesh(task.mesh_data, task.mesh_model)
    if mesh.devices.size == 1:
        return None  # 1x1 mesh is the single-device path
    return mesh


def _fit_mesh(task: TaskConfig):
    """Mesh for the training stages. Single-process: the configured dp×tp mesh.
    Multi-process: a global data-parallel mesh over EVERY device of every
    process — the reference's DDP (`config/train/single_tf.yaml:8`) at pod
    scale, TPU-natively: each process loads its row stripe of the global batch
    (``local_row_range`` + the loader's ``row_shard``), ``place_batch``
    assembles the global array, and the gradient reduction is the GSPMD psum
    over ICI/DCN. Without the mesh, multi-process fit would silently train
    divergent replicas — nothing else synchronises gradients."""
    if jax.process_count() == 1:
        return mesh_from_task(task)
    from cxrmate_tpu.parallel.mesh import make_mesh

    assert task.mesh_model <= 1, (
        "tensor parallelism is single-process (the ~100M model never needs TP "
        "across hosts); multi-process runs are data-parallel only"
    )
    n = len(jax.devices())
    assert task.mesh_data is None or task.mesh_data == n, (
        f"multi-process fit shards over ALL {n} global devices; got "
        f"mesh_data={task.mesh_data} (leave it unset or set it to {n})"
    )
    return make_mesh(n, 1)


def shard_for_mesh(variables: Dict, mesh, task: TaskConfig) -> Dict:
    from cxrmate_tpu.parallel.mesh import shard_variables

    if mesh is None:
        return variables
    return shard_variables(variables, mesh, tp=task.mesh_model > 1)


def load_tokenizer(task: TaskConfig) -> ByteLevelBPETokenizer:
    path = task.tokenizer_dir or os.path.join(task.ckpt_zoo_dir, "mimic-cxr-tokenizers", "bpe_prompt")
    return ByteLevelBPETokenizer.from_file(path)


def init_variables(task: TaskConfig, config) -> Dict:
    enc = init_cvt_variables(jax.random.PRNGKey(task.trial), config.encoder)
    dec = bert_mod.init_bert_params(jax.random.PRNGKey(task.trial + 1), config.decoder, lora=config.lora)
    return {
        "params": {"encoder": enc["params"], "decoder": dec},
        "batch_stats": enc["batch_stats"],
    }


def _load_orbax_variables(path: str, variables: Dict) -> Dict:
    """Load {'params','batch_stats'} from a saved TrainState checkpoint; the tree
    structure must match the current model (strict, like Lightning's
    ``load_from_checkpoint``)."""
    state = orbax_io.restore_checkpoint(path, None)
    restored = {"params": state["params"], "batch_stats": state["batch_stats"]}
    want = jax.tree_util.tree_structure(variables)
    got = jax.tree_util.tree_structure(restored)
    if want != got:
        raise ValueError(
            f"checkpoint at {path} has an incompatible parameter structure for this "
            f"variant (did you warm-start across model families?)"
        )
    return restored


def resolve_warm_start(task: TaskConfig, config, variables: Dict) -> Dict:
    """The reference's four warm-start modes in priority order
    (`tools/stages.py:52-85`): explicit checkpoint path, best checkpoint of another
    experiment's trial dir, HF checkpoint (dir or torch file), fresh init."""
    if task.warm_start_ckpt_path:
        if not os.path.exists(task.warm_start_ckpt_path):
            raise FileNotFoundError(f"warm_start_ckpt_path not found: {task.warm_start_ckpt_path}")
        return _load_orbax_variables(task.warm_start_ckpt_path, variables)
    if task.warm_start_exp_dir:
        # the other experiment's trial dir (tools/stages.py:63)
        exp_dir_trial = os.path.join(task.warm_start_exp_dir, f"trial_{task.trial}")
        path = orbax_io.get_test_ckpt_path(
            exp_dir_trial, task.warm_start_monitor_mode, task.test_epoch, task.test_ckpt_path
        )
        if path is None:
            raise FileNotFoundError(f"no checkpoint to warm-start from under {exp_dir_trial}")
        return _load_orbax_variables(path, variables)
    name = task.warm_start_name or task.multi_ckpt_name
    # HF Hub ids ('aehrc/cxrmate') resolve under the offline checkpoint zoo —
    # the same convention the metric/reward models use (ckpt_zoo_dir/<org>/<name>);
    # explicit paths win when they exist
    if name and not os.path.exists(name):
        zoo_name = os.path.join(task.ckpt_zoo_dir, name)
        if os.path.exists(zoo_name):  # dir (HF export) or file (torch .ckpt)
            name = zoo_name
    if name and os.path.isdir(name):
        sd = orbax_io.load_hf_pretrained_dir(name)
        return convert_encoder_decoder(sd, config.encoder, config.decoder)
    if name and os.path.isfile(name):
        sd = orbax_io.load_torch_checkpoint(name)
        return convert_encoder_decoder(sd, config.encoder, config.decoder)
    if name:
        # never fall through to a fresh init when a checkpoint was requested
        # (the reference's from_pretrained fails loudly too)
        raise FileNotFoundError(
            f"warm_start_name/test_ckpt_name {name!r} is neither a checkpoint "
            f"dir/file nor present under the zoo ({task.ckpt_zoo_dir})"
        )
    return variables


def make_datasets(task: TaskConfig, split: str, train: bool):
    df = build_merged_index(task.dataset_dir)
    sub = filter_split(df, split, task.max_images_per_study)
    mimic_dir = os.path.join(
        task.dataset_dir, "physionet.org", "files", "mimic-cxr-jpg", "2.0.0", "files"
    )
    cache_dir = task.resolved_image_cache_dir
    load = (
        image_mod.make_train_loader_transform(
            size=task.image_size, seed=task.trial, cache_dir=cache_dir)
        if train
        else image_mod.make_eval_loader_transform(
            size=task.image_size, cache_dir=cache_dir)
    )
    # num_workers threads decode JPEGs concurrently (reference uses 5 loader workers)
    if task.variant == "single":
        return DicomDataset(sub, mimic_dir, load)
    if task.variant in ("multi",):
        return StudyDataset(sub, mimic_dir, load)
    history = df.loc[df["split"] == split]
    # gt_prompt: ground-truth prompts; gen_prompt/scst: model-generated prompts
    # (train-time SCST additionally bin-packs subjects onto lanes — prompt.py:75-80)
    ds = PreviousReportDataset(
        sub, history, mimic_dir, load,
        use_generated=task.variant in ("gen_prompt", "scst"),
        scst_generated=task.variant == "scst" and train and split == "train",
        mbatch_size=task.mbatch_size,
        # lanes are always GLOBAL: generated-prompt datasets are never
        # ROW-strided (eval strides by lane; SCST training iterates the global
        # lane schedule and stripes each batch by row —
        # docs/ARCHITECTURE.md 'Multi-host'). The reference's DDP instead
        # rank-strides with world-sized lane packs (data/prompt.py:142-213);
        # world 1 here makes multi-process runs reproduce the single-process
        # batch schedule exactly.
        world_size=1,
    )
    # eval-lane packing (VERDICT r4 item 6): generated-prompt EVAL decodes at
    # the lane count, so allocate ~eval_decode_rows//num_beams lanes (capped at
    # the subject count) instead of mbatch_size — token-identical at any lane
    # count (allocate_eval_lanes docstring). Train keeps the parity allocator.
    if ds.use_generated and not ds.scst_generated and not train \
            and split != "train" and task.eval_decode_rows:
        beams = task.num_test_beams if split == "test" else 1
        ds.allocate_eval_lanes(
            max(task.mbatch_size, task.eval_decode_rows // max(1, beams))
        )
    return ds


def _start_cache_warmer(task: TaskConfig, *datasets):
    """Background decoded-image-cache warmer over the given datasets' images —
    iff the cache is enabled (``image_cache_dir``, default-on "auto"). Started
    right before a stage's main loop so the daemon threads decode the epoch's
    JPEGs WHILE the first XLA programs compile (minutes through the axon
    tunnel); by first-batch time most entropy decodes are already paid and
    even epoch 1 runs at the warm input rate (VERDICT r4 item 3; the reference
    instead re-decodes in 5 loader workers every epoch,
    `/root/reference/modules/lightning_modules/single.py:376-387`). Returns a
    CacheWarmer (stop() it in a finally) or None. ``CXRMATE_CACHE_WARMER=0``
    disables the warmer without disabling the cache."""
    if task.resolved_image_cache_dir is None:
        return None
    if os.environ.get("CXRMATE_CACHE_WARMER", "1") == "0":
        return None
    from cxrmate_tpu.data.image import CacheWarmer

    jobs = [(ds.load_image, ds.image_paths()) for ds in datasets]
    if jax.process_index() == 0:
        # the default-on cache silently materialises ~150-180 KB/image under
        # exp_dir; say where and roughly how big so a quota-limited volume
        # isn't a surprise (image_cache_dir: null disables)
        n = sum(len(p) for _, p in jobs)
        print(
            f"decoded-image cache: {task.resolved_image_cache_dir} "
            f"({n} images, ~{n * 0.17 / 1024:.1f} GB when warm; "
            "set image_cache_dir: null to disable)"
        )
    return CacheWarmer(jobs)


def make_metrics(task: TaskConfig, split: str, reward_fn=None, chexbert_fn=None,
                 bertscorer=None):
    from cxrmate_tpu.eval.bertscore import BERTScoreMetric
    from cxrmate_tpu.eval.metrics import COCONLGMetrics, CheXbertMetrics, CXRBERTMetric

    accumulate = task.variant == "single"
    # The METEOR synonym module (the jar's third stage) is ON by default so a
    # plain --test runs the jar's full English module stack exact→stem→synonym
    # (/root/reference/tools/metrics/coco.py:59): the nltk WordNet corpus when
    # installed, else the vendored table (eval/data/synonyms_en.txt).
    meteor_syn = None
    meteor_para = None
    meteor_fw = None
    if split == "test":
        from cxrmate_tpu.eval.meteor import (default_synonyms,
                                             load_function_words,
                                             load_paraphrase_table)

        meteor_syn = default_synonyms()
        # the jar's paraphrase module is file-gated like the SPICE adapter:
        # point CXRMATE_METEOR_PARAPHRASES at METEOR-1.5's data/paraphrase-en.gz
        para_path = os.environ.get("CXRMATE_METEOR_PARAPHRASES")
        if para_path:
            meteor_para = load_paraphrase_table(para_path)
        # likewise, the jar's exact function.words file (δ-weighting list)
        fw_path = os.environ.get("CXRMATE_METEOR_FUNCTION_WORDS")
        if fw_path:
            meteor_fw = load_function_words(fw_path)
    out = {}
    for section in task.sections_to_evaluate:
        out[f"{split}_{section}_nlg"] = COCONLGMetrics(
            f"{split}_{section}", task.exp_dir_trial, accumulate,
            metrics=("bleu", "cider", "rouge") + (("meteor",) if split == "test" else ()),
            meteor_synonyms=meteor_syn,
            meteor_paraphrases=meteor_para,
            meteor_function_words=meteor_fw,
        )
        if chexbert_fn is not None:
            out[f"{split}_{section}_chexbert"] = CheXbertMetrics(
                f"{split}_{section}", task.exp_dir_trial, accumulate, chexbert_fn, task.mbatch_size
            )
        if reward_fn is not None and split == "test":
            out[f"{split}_{section}_cxr-bert"] = CXRBERTMetric(
                f"{split}_{section}", task.exp_dir_trial, accumulate, reward_fn, task.mbatch_size
            )
        if bertscorer is not None and split == "test":
            out[f"{split}_{section}_bertscore"] = BERTScoreMetric(
                f"{split}_{section}", task.exp_dir_trial, accumulate, bertscorer, task.mbatch_size
            )
    return out


def _decode_step_outputs(task, config, tokenizer, variables, batch, num_beams: int,
                         mesh=None, pad_rows: int = 0):
    """Greedy (val) or beam (test) decode of one batch → findings/impression.

    The batch axis is padded (repeating the last study) up to ``pad_rows`` when
    set — ragged tail batches reuse the full-size compiled decode program
    instead of compiling a second one (evaluate()'s eval_decode_rows packing) —
    and, under a mesh, up to a multiple of the 'data' axis; outputs are sliced
    back to the true batch either way. Row padding is exact: every decode path
    is row-independent (per-row logits/caches; the while-loop stop condition
    only ever runs MORE steps for the padded rows)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    true_b = batch["images"].shape[0]
    images = np.asarray(batch["images"], np.float32)
    prev_f, prev_i = batch.get("previous_findings"), batch.get("previous_impression")
    target = max(true_b, pad_rows or 0)
    if mesh is not None:
        dp = mesh.shape["data"]
        target += (-target) % dp
        _place = lambda a: jax.device_put(np.asarray(a), NamedSharding(mesh, P("data")))
    else:
        _place = jnp.asarray
    if target > true_b:
        pad = target - true_b
        images = np.concatenate([images, np.repeat(images[-1:], pad, axis=0)], axis=0)
        if prev_f is not None:
            prev_f = list(prev_f) + [prev_f[-1]] * pad
            prev_i = list(prev_i) + [prev_i[-1]] * pad
    pixels = _place(images)
    enc_hidden, enc_mask, _ = ed.encode_images(variables, pixels, config)
    longitudinal = VARIANT_TO_MODEL[task.variant] == "longitudinal"
    if longitudinal:
        prompt = ed.tokenize_prompt(
            prev_f, prev_i, tokenizer,
            task.decoder_max_len, add_bos_token_id=True,
        )
        # bucket prompt widths so XLA compiles a handful of decode programs; the
        # first-token logits column is pinned to the true batch-longest width so
        # outputs equal the unbucketed batch exactly
        true_width = prompt["input_ids"].shape[1]
        ids_b, mask_b = ed.bucket_prompt(
            prompt["input_ids"], prompt["attention_mask"], tokenizer.pad_token_id,
            bucket=32, max_len=task.decoder_max_len,
        )
        prompt_ids = _place(ids_b.astype(np.int32))
        prompt_mask = _place(mask_b.astype(np.int32))
        prompt_logits_col = true_width - 1
        pmt_sep = tokenizer.vocab["[PMT-SEP]"]
        specials = (pmt_sep, tokenizer.bos_token_id, tokenizer.sep_token_id)
        gen_cfg = GenerationConfig(
            max_new_tokens=task.decoder_max_len - 1,
            bos_token_id=tokenizer.bos_token_id, eos_token_id=tokenizer.eos_token_id,
            pad_token_id=tokenizer.pad_token_id, mask_token_id=tokenizer.pad_token_id,
            special_token_ids=specials, token_type_sections=(0, 1, 0, 1),
            num_beams=num_beams,
        )
        split_specials = [tokenizer.bos_token_id, tokenizer.sep_token_id, tokenizer.eos_token_id]
    else:
        b = pixels.shape[0]
        prompt_ids = _place(np.full((b, 1), tokenizer.bos_token_id, np.int32))
        prompt_mask = _place(np.ones((b, 1), np.int32))
        prompt_logits_col = None
        if task.variant == "single":
            enc_mask = jnp.ones_like(enc_mask)
        gen_cfg = GenerationConfig(
            max_new_tokens=task.decoder_max_len - 1,
            bos_token_id=tokenizer.bos_token_id, eos_token_id=tokenizer.eos_token_id,
            pad_token_id=tokenizer.pad_token_id,
            special_token_ids=(tokenizer.sep_token_id,),
            num_beams=num_beams,
        )
        split_specials = [tokenizer.sep_token_id, tokenizer.eos_token_id]

    if num_beams > 1:
        seqs, _ = beam_search(variables, config, gen_cfg, enc_hidden, enc_mask,
                              prompt_ids, prompt_mask, prompt_logits_col=prompt_logits_col)
    else:
        seqs = generate(variables, config, gen_cfg, enc_hidden, enc_mask, prompt_ids,
                        prompt_mask, prompt_logits_col=prompt_logits_col)
    seqs = np.asarray(seqs)[:true_b]
    sections = ed.split_and_decode_sections(seqs, split_specials, tokenizer)
    if longitudinal:
        _, findings, impression = sections
    else:
        findings, impression = sections
    return seqs, findings, impression



def _collate_max_images(task: TaskConfig):
    """Image-slot count for the collate pad. The single variant is per-DICOM
    (exactly one image per example — [B, 1, 3, H, W], squeezed at the model
    boundary). For the study-level variants ``task.pad_images`` selects:

      * "batch" (default): pad to the batch's own max image count — the
        reference's ``pad_sequence`` semantics (multi.py:155-164). Encoder conv
        FLOPs and the cross-KV cache width (the decode step's dominant
        streaming cost, DEVNOTES round 3) scale with the slot count, so
        1-2-image studies stop paying the 5-slot price; each distinct count
        compiles its own XLA program (≤ max_images_per_study of them).
      * "max": pad to max_images_per_study — one static shape per stage.

    Trimming is exact — padded slots are all-zero images whose cross columns
    carry additive -1e9 masks → exactly-0.0 softmax weights (the same
    inertness argument as segmented cache growth; tests
    test_image_pad_is_inert / test_image_pad_is_inert_beam)."""
    if task.variant == "single":
        return None
    assert task.pad_images in ("batch", "max"), (
        f"pad_images must be 'batch' or 'max', got {task.pad_images!r}"
    )
    return None if task.pad_images == "batch" else task.max_images_per_study

def evaluate(task, config, tokenizer, variables, dataset, split: str, metrics: Dict,
             num_beams: int, epoch: int, loggers=(), mesh=None):
    if getattr(dataset, "use_generated", False):
        # generated-prompt datasets read history written back during consumption —
        # never prefetch or parallel-decode them (reference: num_workers=0,
        # gen_prompt.py:66-82), and never ROW-stride them (a subject's earlier
        # study must be decoded before its later one is prompted, on one rank).
        # Multi-process: stride by LANE instead — the dataset order is the
        # allocator's step-major lane interleave (index = step·lanes + lane)
        # and a subject occupies ONE lane, so rank r decoding lanes r::world
        # in step order preserves every subject's history thread; the metric
        # layer gathers the disjoint per-rank row sets.
        # the decode batch IS the allocator's lane count — eval-lane packing
        # (make_datasets) may have allocated more lanes than mbatch_size
        order, batch_rows, pad_rows = None, dataset.mbatch_size or task.mbatch_size, 0
        if jax.process_count() > 1:
            # The striding below is only sound under the allocator invariants
            # (dataset order IS the lane interleave, every lane fully
            # populated); fail loudly rather than silently splitting a
            # subject's history thread across ranks or floor-dropping rows.
            lanes = dataset.mbatch_size
            assert lanes and len(dataset) % lanes == 0, (
                f"lane-strided eval needs an allocator-interleaved dataset: "
                f"mbatch_size={lanes!r}, len={len(dataset)}")
            my_lanes = range(jax.process_index(), lanes, jax.process_count())
            steps = len(dataset) // lanes
            order = [s * lanes + j for s in range(steps) for j in my_lanes]
            batch_rows = max(1, len(my_lanes))
        it = batch_iterator(dataset, batch_rows, order=order,
                            max_images=_collate_max_images(task))
    else:
        # rank-strided like the train loader: each process decodes its share
        # and _gather_rows reassembles (single-process runs are unaffected).
        # Under the per-batch collate pad, iterate in image-count order so
        # batches are slot-homogeneous (a lone 5-image study no longer widens
        # its whole batch's cross-KV cache); per-study outputs are
        # iteration-order-invariant, and the metric/CSV layer keys on study_id.
        sort_key = None
        if (task.eval_sort_by_images and task.variant != "single"
                and _collate_max_images(task) is None
                and hasattr(dataset, "image_counts")):
            sort_key = dataset.image_counts()
        # decode-batch packing (eval_decode_rows): decode in programs of ~96
        # beam rows — the measured v5e throughput peak for greedy (batch 96)
        # AND beam-4 (24×4) — instead of at mbatch_size (the reference decodes
        # its test set at the train micro-batch, ~22% slower at b8, DEVNOTES).
        # Pure batching: per-study outputs are batch-size-invariant
        # (token-identity test at both batchings, tests/test_cli_end_to_end.py).
        # Ragged tails are padded to the compiled shape inside
        # _decode_step_outputs; capped at the per-rank share so tiny datasets
        # don't decode mostly padding.
        batch_rows, pad_rows = task.mbatch_size, 0
        if task.eval_decode_rows:
            per_rank = -(-len(dataset) // jax.process_count())
            batch_rows = max(1, min(task.eval_decode_rows // max(1, num_beams),
                                    per_rank))
            pad_rows = batch_rows
        it = Prefetcher(
            batch_iterator(dataset, batch_rows, max_images=_collate_max_images(task),
                           num_workers=task.num_workers, sort_key=sort_key,
                           rank=jax.process_index(), world_size=jax.process_count())
        )
    for batch in it:
        with annotate("decode"):
            seqs, findings, impression = _decode_step_outputs(
                task, config, tokenizer, variables, batch, num_beams, mesh=mesh,
                pad_rows=pad_rows,
            )
        kw = {"study_ids": batch["study_ids"]}
        if task.variant == "single":
            kw["dicom_ids"] = batch["dicom_ids"]
        for logger in loggers:
            if logger.__class__.__name__ == "ReportTokenIdentifiersLogger":
                logger.update(seqs, **kw)
            else:
                logger.update(findings, impression, **kw)
        if hasattr(dataset, "use_generated") and dataset.use_generated:
            for sid, f, i in zip(batch["study_ids"], findings, impression):
                dataset.record_generated(sid, f, i)
        for name, metric in metrics.items():
            if "findings" in name:
                metric.update(findings, [[j] for j in batch["findings"]], **kw)
            elif "impression" in name:
                metric.update(impression, [[j] for j in batch["impression"]], **kw)
            else:
                metric.update(
                    [f"{f} {i}" for f, i in zip(findings, impression)],
                    [[f"{f} {i}"] for f, i in zip(batch["findings"], batch["impression"])],
                    **kw,
                )
    scores = {}
    for logger in loggers:
        logger.compute(epoch)
        logger.reset()
    for name, metric in metrics.items():
        out = metric.compute(epoch)
        if isinstance(out, dict):
            scores.update({f"{name}_{k}": v for k, v in out.items()})
        metric.reset()
    return scores


def resolve_monitor(scores: Dict, monitor: str) -> Tuple[Optional[float], Optional[str]]:
    """Resolve the checkpoint-selection value: the configured monitor if computed,
    else an explicit surrogate NLG score (mode 'max', like the reference's
    CheXbert-F1 monitor) with a loud warning — never silently save unranked
    checkpoints (reference behaviour: `tools/stages.py:103-105` always has the
    monitor because the CheXbert weights ship with the checkpoint zoo)."""
    import warnings

    if monitor in scores:
        return scores[monitor], monitor
    split = monitor.split("_", 1)[0]
    surrogates = [
        f"{split}_report_nlg_cider",
        f"{split}_report_nlg_bleu_4",
        f"{split}_report_nlg_bleu_1",
    ] + sorted(k for k in scores if "_nlg_" in k)
    for key in surrogates:
        if key in scores:
            warnings.warn(
                f"monitor {monitor!r} not in computed scores (CheXbert weights "
                f"missing from the checkpoint zoo?) — falling back to surrogate "
                f"{key!r} for checkpoint selection",
                RuntimeWarning,
                stacklevel=2,
            )
            return scores[key], key
    warnings.warn(
        f"monitor {monitor!r} not in computed scores and no NLG surrogate found; "
        "checkpoints will be saved UNRANKED (no top-k pruning, best=latest)",
        RuntimeWarning,
        stacklevel=2,
    )
    return None, None


def _log_scalars(task: TaskConfig, record: Dict) -> None:
    """Append a JSON line to the trial's metrics log (the reference's log_dict
    stream, without the Lightning logger). Rank-0 only: in multi-process runs
    every rank computes the same gathered scores, and each would otherwise
    append a duplicate line to the shared file."""
    if jax.process_index() != 0:
        return
    import json
    from pathlib import Path

    Path(task.exp_dir_trial).mkdir(parents=True, exist_ok=True)
    with open(os.path.join(task.exp_dir_trial, "metrics.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")


def _resolve_fit_resume(task: TaskConfig, state, mesh=None):
    """Restore the trainer position for fit/fit_scst (reference: Lightning
    ``trainer.fit(ckpt_path=...)`` via `tools/stages.py:88`, which resumes EVERY
    fit — SCST included — and restarts mid-epoch checkpoints inside the same
    epoch). Returns (state, start_epoch, skip_batches, global_step, resume_path).

    Mid-epoch checkpoints (``epoch=E-step=S`` tags from ``val_check_interval``)
    resume into epoch E with the loader fast-forwarded to the saved in-epoch
    batch count; legacy markerless ones restart epoch E from its beginning
    (never ``E+1`` — that silently dropped the untrained remainder)."""
    resume_path = orbax_io.resolve_resume(
        task.exp_dir_trial, task.resume_last, task.resume_epoch, task.resume_ckpt_path
    )
    if not resume_path:
        return state, 0, 0, 0, None
    info = orbax_io.checkpoint_resume_info(resume_path)
    if info["step"] is not None:  # mid-epoch save — validate BEFORE the restore
        # the saved in-epoch batch count is measured in the SAVING run's loader
        # schedule; fast-forwarding under a different mbatch_size/world_size
        # would silently skip (or re-train) the wrong samples. Checkpoints from
        # mesh runs mark `global_schedule`: their position is counted in GLOBAL
        # batches, so the process count may change across the resume (the same
        # global batches just land on a different device layout).
        checks = [("mbatch_size", task.mbatch_size)]
        if not info.get("global_schedule"):
            checks.append(("world_size", jax.process_count()))
        for field, current in checks:
            saved = info.get(field)
            if saved is not None and saved != current:
                raise ValueError(
                    f"cannot resume mid-epoch checkpoint {resume_path}: it was "
                    f"saved with {field}={saved} but this run has {field}="
                    f"{current}; restart with the saving run's {field} (or "
                    f"resume an epoch-end checkpoint instead)"
                )
    if jax.process_count() > 1:
        # multi-process: every process restores the rank-0-written host
        # checkpoint from the shared filesystem into a host template, then the
        # (all-replicated, data-parallel-only) state is re-placed on the global
        # mesh — no cross-process checkpoint coordination needed
        from cxrmate_tpu.parallel.mesh import host_copy, replicate_tree

        assert mesh is not None, "multi-process fit always trains on the global mesh"
        host_state = orbax_io.restore_checkpoint(resume_path, host_copy(state))
        state = replicate_tree(host_state, mesh)
    else:
        state = orbax_io.restore_checkpoint(resume_path, state)
    epoch = info["epoch"]
    if epoch is None:
        epoch = orbax_io.last_checkpoint_epoch(task.exp_dir_trial)
    if epoch is None:
        return state, 0, 0, 0, resume_path
    gstep = info["global_step"] or 0
    if info["step"] is not None:
        return state, epoch, info["n_batches"] or 0, gstep, resume_path
    return state, epoch + 1, 0, gstep, resume_path


def _mid_epoch_schedule(task: TaskConfig, dataset_len: int):
    """(val_every, total_batches) for Lightning's fractional val_check_interval;
    (None, total) when validation is epoch-end only. Positions are counted in
    GLOBAL batches (``mbatch_size`` is the global batch; every fit — mesh,
    multi-process, or single-device — iterates the same global schedule)."""
    total_batches = max(1, dataset_len // task.mbatch_size)  # drop_last
    if task.val_check_interval and task.val_check_interval < 1.0:
        return max(1, int(task.val_check_interval * total_batches)), total_batches
    return None, total_batches


def _train_base_rng(trial: int):
    """Base RNG key for the per-step fold_in(base, global_step) chains.

    CXRMATE_TRAIN_RNG_IMPL selects the generator: "threefry" (default — JAX's
    counter-based default; with jax_threefry_partitionable its dropout masks
    are identical under any mesh layout, which the dp/tp loss-identity tests
    rely on) or "rbg"/"unsafe_rbg" (XLA's hardware RngBitGenerator: reference
    multi train step 111.3-112.9 vs 122.3 ms, DEVNOTES round 3 — but mask bits are
    NOT guaranteed invariant across mesh layouts or compiler versions, so
    cross-mesh loss identity does not hold; the stream is still deterministic
    for a fixed program, preserving crash-resume reproducibility)."""
    impl = os.environ.get("CXRMATE_TRAIN_RNG_IMPL", "threefry")
    if impl == "threefry":
        return jax.random.PRNGKey(trial)
    return jax.random.key(trial, impl=impl)


def _checkpoint_state(task: TaskConfig, state, epoch, monitor_value, **kw) -> None:
    """Save a fit checkpoint. Multi-process runs save a host-numpy copy — the
    train state is fully replicated (multi-process mode is data-parallel only),
    so no gather is needed; EVERY rank enters ``save_checkpoint`` (orbax's
    internal cross-process barriers require all processes, and only the primary
    host writes — the plain-file metadata is rank-0-gated inside)."""
    if jax.process_count() > 1:
        from cxrmate_tpu.parallel.mesh import host_copy

        state = host_copy(state)
    orbax_io.save_checkpoint(task.exp_dir_trial, state, epoch, monitor_value, **kw)


def fit(task: TaskConfig, chexbert_fn=None) -> None:
    from cxrmate_tpu.parallel.mesh import host_copy, local_row_range, place_batch

    tokenizer = load_tokenizer(task)
    config = build_model_config(task, len(tokenizer))
    mesh = _fit_mesh(task)
    multiprocess = jax.process_count() > 1
    variables = resolve_warm_start(task, config, init_variables(task, config))
    mask = optim.mask_for_stage(variables["params"], task.variant)
    tx = optim.adamw(task.lr, accumulate_steps=task.accumulate_steps, trainable_mask=mask)
    if mesh is not None:
        dp = mesh.shape["data"]
        assert task.mbatch_size % dp == 0, (
            f"mbatch_size {task.mbatch_size} not divisible by mesh data axis {dp}"
        )
        variables = shard_for_mesh(variables, mesh, task)
        # init the optimizer state under jit so mu/nu inherit the param shardings
        state = jax.jit(lambda v: create_train_state(v, tx))(variables)
    else:
        state = create_train_state(variables, tx)
    # mixed precision per the config (the reference's `precision: 16`)
    compute_dtype = jnp.bfloat16 if str(task.precision) in ("bf16", "16") else None
    step = make_train_step(config, tx, trainable_mask=mask, pad_id=tokenizer.pad_token_id,
                           compute_dtype=compute_dtype)

    state, start_epoch, skip_batches, global_step, _ = _resolve_fit_resume(task, state, mesh)

    train_set = make_datasets(task, "train", train=True)
    val_set = make_datasets(task, "validate", train=False)
    metrics = make_metrics(task, "val", chexbert_fn=chexbert_fn)
    # per-step keys via fold_in(base, global_step): the dropout stream of a
    # resumed run equals the uninterrupted run's by construction
    base_rng = _train_base_rng(task.trial)

    def run_validation(state, epoch, step=None, n_batches=None, gstep=None):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if multiprocess:
            # eval is embarrassingly parallel: each process decodes its
            # rank-strided share locally with a host copy of the replicated
            # params; metric rows are gathered in eval/metrics.py
            variables = host_copy(variables)
        if getattr(val_set, "use_generated", False):
            val_set.reset_generated()  # each validation pass starts prompt history clean
        scores = evaluate(task, config, tokenizer, variables, val_set, "val", metrics, 1,
                          epoch, mesh=None if multiprocess else mesh)
        record = {"epoch": epoch, **{k: float(v) for k, v in scores.items()}}
        if step is not None:
            record["step"] = step
        _log_scalars(task, record)
        monitor_value, monitor_key = resolve_monitor(scores, task.monitor)
        _checkpoint_state(
            task, state, epoch, monitor_value,
            monitor=monitor_key or task.monitor, mode=task.monitor_mode,
            keep_top_k=task.save_top_k, step=step,
            n_batches=n_batches, global_step=gstep,
            mbatch_size=task.mbatch_size, world_size=jax.process_count(),
            global_schedule=mesh is not None,
        )

    # Multi-process: every process iterates the SAME global batch schedule and
    # materialises only its device-owned row stripe; widths/slot counts must be
    # the static budgets so all stripes of one global batch agree on shape
    # (bit-identical either way — pad keys/labels/slots are masked).
    row_shard = local_row_range(mesh, task.mbatch_size) if multiprocess else None
    static_pad = task.static_tf_pad or multiprocess
    pad_report_to = config.decoder_max_len if static_pad else None
    pad_prompt_to = (
        config.prompt_max_len if static_pad and config.variant == "longitudinal" else None
    )
    collate_max = _collate_max_images(task)
    if multiprocess and collate_max is None and task.variant != "single":
        collate_max = task.max_images_per_study

    # Lightning's val_check_interval < 1: validate + checkpoint every fraction of
    # the epoch (the reference's SCST configs use 0.1; its released SCST
    # checkpoint is mid-epoch — epoch 0, step 1567). The schedule counts GLOBAL
    # batches (same on every process).
    val_every, total_batches = _mid_epoch_schedule(task, len(train_set))
    warmer = _start_cache_warmer(task, train_set, val_set)
    try:
        for epoch in range(start_epoch, task.max_epochs):
            if hasattr(train_set.load_image, "set_epoch"):
                train_set.load_image.set_epoch(epoch)
            skip = skip_batches if epoch == start_epoch else 0
            it = Prefetcher(
                batch_iterator(
                    train_set, task.mbatch_size, shuffle=True, seed=epoch,
                    max_images=collate_max, drop_last=True, row_shard=row_shard,
                    num_workers=task.num_workers, skip_batches=skip,
                )
            )
            n_batches = skip
            fresh = 0
            for batch in it:
                tf_batch = build_tf_batch(
                    tokenizer, config, batch["images"].astype(np.float32),
                    batch["findings"], batch["impression"],
                    batch.get("previous_findings"), batch.get("previous_impression"),
                    pad_report_to=pad_report_to, pad_prompt_to=pad_prompt_to,
                )
                k = jax.random.fold_in(base_rng, global_step)
                with annotate("train_step"):
                    state, loss = step(state, place_batch(tf_batch, mesh), k)
                n_batches += 1
                fresh += 1
                global_step += 1
                if n_batches % 50 == 0 or n_batches == skip + 1:
                    # skip+1, not 1: a mid-epoch resume starts counting at `skip`,
                    # and the operator still wants a first-step liveness line
                    _log_scalars(task, {"epoch": epoch, "step": n_batches, "train_loss": float(loss)})
                if val_every and n_batches % val_every == 0 and n_batches < total_batches:
                    run_validation(state, epoch, step=global_step, n_batches=n_batches,
                                   gstep=global_step)
                if task.fast_dev_run and fresh >= 1:
                    break
            it.close()
            # ModelCheckpoint every_n_epochs / check_val_every_n_epoch
            if (epoch + 1) % task.every_n_epochs == 0 or task.fast_dev_run:
                run_validation(state, epoch, gstep=global_step)
            if task.fast_dev_run:
                break
    finally:
        if warmer is not None:
            warmer.stop()


def fit_scst(task: TaskConfig, reward_fn, chexbert_fn=None) -> None:
    """SCST training: sampled rollouts + greedy baseline + CXR-BERT reward.

    variant 'scst' (reference scst/gen_prompt.py:146-259): self-generated prompts
    with per-epoch subject re-allocation and generated-history threading.
    variant 'scst_gt' (reference scst/gt_prompt.py:8-255, GTPromptCXRBERT):
    ground-truth prompts, ordinary shuffled batching, no history writes."""
    from cxrmate_tpu.parallel.mesh import host_copy, local_row_range, place_batch
    from cxrmate_tpu.parallel.multihost import global_max_int
    from cxrmate_tpu.train.scst import SCSTTrainer, make_scst_step

    tokenizer = load_tokenizer(task)
    config = build_model_config(task, len(tokenizer))
    # Multi-process SCST mirrors multi-process `fit`: ONE global data-parallel
    # mesh; every process iterates the SAME global batch schedule (allocator
    # lanes are GLOBAL — world 1) and materialises only its device-owned row
    # stripe. A subject's whole lane is one fixed row of every global batch, so
    # its generated-prompt history stays on one rank (docs/ARCHITECTURE.md
    # 'Multi-host').
    mesh = _fit_mesh(task)
    multiprocess = jax.process_count() > 1
    variables = resolve_warm_start(task, config, init_variables(task, config))
    mask = optim.mask_for_stage(variables["params"], "scst")
    tx = optim.adamw(task.lr, accumulate_steps=task.accumulate_steps, trainable_mask=mask)
    if mesh is not None:
        assert task.mbatch_size % mesh.shape["data"] == 0, (
            f"mbatch_size {task.mbatch_size} not divisible by mesh data axis {mesh.shape['data']}"
        )
        variables = shard_for_mesh(variables, mesh, task)
        state = jax.jit(lambda v: create_train_state(v, tx))(variables)
    else:
        state = create_train_state(variables, tx)

    pmt_sep = tokenizer.vocab["[PMT-SEP]"]
    gen_sample = GenerationConfig(
        max_new_tokens=task.decoder_max_len - 1,
        bos_token_id=tokenizer.bos_token_id, eos_token_id=tokenizer.eos_token_id,
        pad_token_id=tokenizer.pad_token_id, mask_token_id=tokenizer.pad_token_id,
        special_token_ids=(tokenizer.bos_token_id, tokenizer.sep_token_id),
        token_type_sections=(0, 1, 0, 1),
        do_sample=True, top_k=50, top_p=1.0, temperature=1.0,
    )
    gen_base = GenerationConfig(
        max_new_tokens=task.decoder_max_len - 1,
        bos_token_id=tokenizer.bos_token_id, eos_token_id=tokenizer.eos_token_id,
        pad_token_id=tokenizer.pad_token_id, mask_token_id=tokenizer.pad_token_id,
        special_token_ids=(pmt_sep, tokenizer.bos_token_id, tokenizer.sep_token_id),
        token_type_sections=(0, 1, 0, 1),
    )
    scst_dtype = jnp.bfloat16 if str(task.precision) in ("bf16", "16") else None
    rollout, grad_step = make_scst_step(config, gen_sample, gen_base, tx, trainable_mask=mask,
                                        pad_id=tokenizer.pad_token_id,
                                        compute_dtype=scst_dtype)

    def split_fn(token_ids):
        return ed.split_and_decode_sections(
            token_ids,
            [tokenizer.bos_token_id, tokenizer.sep_token_id, tokenizer.eos_token_id],
            tokenizer,
        )

    # multi-process: the trainer extracts this process's row stripe of the
    # rollout outputs for the host reward round-trip and re-assembles the
    # advantage on the global mesh
    row_shard = local_row_range(mesh, task.mbatch_size) if multiprocess else None
    trainer = SCSTTrainer(config, rollout, grad_step, reward_fn, split_fn,
                          mesh=mesh if multiprocess else None, row_range=row_shard)
    train_set = make_datasets(task, "train", train=True)  # global lanes (world 1)
    val_set = make_datasets(task, "validate", train=False)
    metrics = make_metrics(task, "val", chexbert_fn=chexbert_fn)
    base_rng = _train_base_rng(task.trial)
    gen_prompt_scst = task.variant == "scst"

    # Resume (VERDICT r2 item 2; reference `tools/stages.py:88` resumes every
    # fit, SCST included). Mid-epoch saves restart inside the same epoch with
    # the loader fast-forwarded; the generated-prompt history written back
    # earlier in that epoch is restored from the checkpoint sidecar, and the
    # epoch's subject→lane allocation is reconstructed from its seed.
    state, start_epoch, skip_batches, global_step, resume_path = _resolve_fit_resume(
        task, state, mesh
    )
    # per-rank sidecar: in multi-process runs every rank writes into the same
    # checkpoint dir, and each rank's generated-prompt history covers only ITS
    # row stripe's lanes — a shared filename would keep the last writer's only
    history_sidecar = f"scst_history.rank{jax.process_index()}.json"
    resume_history = None
    if resume_path and skip_batches and gen_prompt_scst:
        import json as _json

        # union over ALL ranks' sidecars: lanes are global, so the union equals
        # the single-process history, and a resume may change the process count
        # (each rank's record_generated touches only its own stripe's subjects)
        resume_history = {}
        for name in sorted(os.listdir(resume_path)):
            if name.startswith("scst_history.rank") and name.endswith(".json"):
                blob = orbax_io.checkpoint_extra_file(resume_path, name)
                if blob is not None:
                    resume_history.update(_json.loads(blob))
        if not resume_history:
            # legacy (pre-per-rank) single-process checkpoints
            blob = orbax_io.checkpoint_extra_file(resume_path, "scst_history.json")
            resume_history = _json.loads(blob) if blob is not None else None

    def run_validation(state, epoch, step=None, n_batches=None, gstep=None):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if multiprocess:
            # eval is embarrassingly parallel (see fit.run_validation)
            variables = host_copy(variables)
        if getattr(val_set, "use_generated", False):
            val_set.reset_generated()
        scores = evaluate(task, config, tokenizer, variables, val_set, "val", metrics, 1,
                          epoch, mesh=None if multiprocess else mesh)
        record = {"epoch": epoch, **{k: float(v) for k, v in scores.items()}}
        if step is not None:
            record["step"] = step
        _log_scalars(task, record)
        monitor_value, monitor_key = resolve_monitor(scores, task.monitor)
        extra_files = None
        if gen_prompt_scst and step is not None:
            import json as _json

            extra_files = {history_sidecar: _json.dumps(train_set.export_generated())}
        _checkpoint_state(
            task, state, epoch, monitor_value,
            monitor=monitor_key or task.monitor, mode=task.monitor_mode,
            keep_top_k=task.save_top_k, step=step,
            n_batches=n_batches, global_step=gstep, extra_files=extra_files,
            mbatch_size=task.mbatch_size, world_size=jax.process_count(),
            global_schedule=mesh is not None,
        )

    # multi-process: image-slot counts must agree across the ranks' stripes of
    # one global batch (same rule as fit)
    collate_max = _collate_max_images(task)
    if multiprocess and collate_max is None and task.variant != "single":
        collate_max = task.max_images_per_study

    warmer = _start_cache_warmer(task, train_set, val_set)
    try:
        for epoch in range(start_epoch, task.max_epochs):
            if hasattr(train_set.load_image, "set_epoch"):
                train_set.load_image.set_epoch(epoch)
            skip = skip_batches if epoch == start_epoch else 0
            if gen_prompt_scst:
                # per-epoch subject→lane reallocation + history reset (scst/gen_prompt.py:152-158)
                train_set.allocate_subjects_to_rank(
                    seed=(epoch + task.trial + 1) * (task.trial + 1)
                )
                train_set.reset_generated()
                if skip and resume_history is not None:
                    train_set.import_generated(resume_history)
                # Sequential in allocator order (scst/gen_prompt.py:118); lanes were
                # packed per global mbatch slot, so batch t row j is lane j.
                # No prefetch: __getitem__ reads history written back after each step
                # (the reference's num_workers=0 loaders, gen_prompt.py:66-82).
                # Multi-process: every process iterates the same global schedule and
                # materialises only its row stripe (lane j → fixed global row j →
                # one rank owns the subject's whole history).
                it = batch_iterator(train_set, task.mbatch_size, max_images=collate_max,
                                    drop_last=True, row_shard=row_shard, skip_batches=skip)
            else:
                # scst_gt inherits GTPrompt's ordinary shuffled loader (gt_prompt.py via
                # scst/gt_prompt.py:8 — no sampler/history overrides)
                it = Prefetcher(
                    batch_iterator(train_set, task.mbatch_size, shuffle=True, seed=epoch,
                                   max_images=collate_max, drop_last=True,
                                   row_shard=row_shard, skip_batches=skip)
                )
            # len(train_set) can change per epoch (the allocator oversamples to lane
            # divisibility) — recompute the fractional-validation schedule each epoch
            val_every, total_batches = _mid_epoch_schedule(task, len(train_set))
            n_batches = skip
            fresh = 0
            for batch in it:
                prompt = ed.tokenize_prompt(
                    batch["previous_findings"], batch["previous_impression"], tokenizer,
                    task.decoder_max_len, add_bos_token_id=True,
                )
                # bucket prompt widths like the eval path above: SCST prompt widths
                # vary every batch (histories grow as training writes them back),
                # and every distinct width compiles a fresh rollout + grad program.
                # Bit-exact — the first token issues from the true batch-longest
                # column and the extra pad columns are mask-inert
                # (tests/test_scst.py::test_scst_prompt_bucketing_is_inert).
                true_width = prompt["input_ids"].shape[1]
                if multiprocess:
                    # ranks must agree on the width AND the first-token column: the
                    # true longest is the GLOBAL batch's (what the single-process
                    # run would pad to), so stripes whose own longest is shorter
                    # pad up to it before bucketing
                    g_width = global_max_int(true_width)
                    if g_width > true_width:
                        pad = g_width - true_width
                        prompt["input_ids"] = np.pad(
                            prompt["input_ids"], ((0, 0), (0, pad)),
                            constant_values=tokenizer.pad_token_id,
                        )
                        prompt["attention_mask"] = np.pad(
                            prompt["attention_mask"], ((0, 0), (0, pad)), constant_values=0
                        )
                    true_width = g_width
                p_ids, p_mask = ed.bucket_prompt(
                    prompt["input_ids"], prompt["attention_mask"], tokenizer.pad_token_id,
                    bucket=32, max_len=task.decoder_max_len,
                )
                k = jax.random.fold_in(base_rng, global_step)
                placed = place_batch(
                    {
                        "images": np.asarray(batch["images"], np.float32),
                        "prompt_ids": p_ids.astype(np.int32),
                        "prompt_mask": p_mask.astype(np.int32),
                    },
                    mesh,
                )
                state, logs, (b_f, b_i) = trainer.step(
                    state, placed["images"], placed["prompt_ids"], placed["prompt_mask"],
                    batch["findings"], batch["impression"], k,
                    prompt_logits_col=true_width - 1,
                )
                _log_scalars(task, {"epoch": epoch, **logs})
                if gen_prompt_scst:
                    # baseline outputs feed the history for later studies of the subject
                    for sid, f, i in zip(batch["study_ids"], b_f, b_i):
                        train_set.record_generated(sid, f, i)
                n_batches += 1
                fresh += 1
                global_step += 1
                if val_every and n_batches % val_every == 0 and n_batches < total_batches:
                    run_validation(state, epoch, step=global_step, n_batches=n_batches,
                                   gstep=global_step)
                if task.fast_dev_run and fresh >= 1:
                    break
            if hasattr(it, "close"):
                it.close()
            if (epoch + 1) % task.every_n_epochs == 0 or task.fast_dev_run:
                run_validation(state, epoch, gstep=global_step)
            if task.fast_dev_run:
                break
    finally:
        if warmer is not None:
            warmer.stop()



def test(task: TaskConfig, chexbert_fn=None, reward_fn=None, bertscorer=None) -> Dict:
    from cxrmate_tpu.eval.metrics import ReportLogger, ReportTokenIdentifiersLogger

    tokenizer = load_tokenizer(task)
    config = build_model_config(task, len(tokenizer))
    mesh = mesh_from_task(task)
    variables = init_variables(task, config)
    if task.test_ckpt_name:
        # dataclasses.replace, NOT TaskConfig(**task.__dict__): parse_args sets
        # non-field attributes (_train/_test) on the instance and __dict__
        # would feed them back into __init__
        variables = resolve_warm_start(
            dataclasses.replace(task, warm_start_name=task.test_ckpt_name,
                                warm_start_ckpt_path=None, warm_start_exp_dir=None),
            config, variables,
        )
    elif task.fast_dev_run:
        pass  # fresh init, no checkpoint resolution (tools/stages.py:97-99)
    else:
        # explicit path > specific epoch > best-by-monitor (tools/stages.py:103-105)
        path = orbax_io.get_test_ckpt_path(
            task.exp_dir_trial, task.monitor_mode, task.test_epoch, task.test_ckpt_path
        )
        if not path:
            # never silently score random weights (the reference's
            # load_from_checkpoint(None) errors here too); fast_dev_run is the
            # sanctioned no-checkpoint smoke path
            raise FileNotFoundError(
                f"--test found no checkpoint under {task.exp_dir_trial} "
                f"(train first, pass test_ckpt_path/test_ckpt_name, or use "
                f"fast_dev_run for an untrained smoke run)"
            )
        state = orbax_io.restore_checkpoint(path, None)
        variables = {"params": state["params"], "batch_stats": state["batch_stats"]}
    variables = shard_for_mesh(variables, mesh, task)
    test_set = make_datasets(task, "test", train=False)
    metrics = make_metrics(task, "test", reward_fn=reward_fn, chexbert_fn=chexbert_fn,
                           bertscorer=bertscorer)
    loggers = (
        ReportLogger("test_reports", task.exp_dir_trial, task.variant == "single"),
        ReportTokenIdentifiersLogger("test_report_ids", task.exp_dir_trial, task.variant == "single"),
    )
    # decode the test images into the cache while the beam program compiles —
    # a fresh `--test` on a new host no longer pays the cold input rate for its
    # whole (only) pass (VERDICT r4 item 3)
    warmer = _start_cache_warmer(task, test_set)
    try:
        return evaluate(
            task, config, tokenizer, variables, test_set, "test", metrics,
            task.num_test_beams, 0, loggers, mesh=mesh,
        )
    finally:
        if warmer is not None:
            warmer.stop()


def build_cxrbert_reward(task: TaskConfig):
    """Load the CXR-BERT reward model from the checkpoint zoo
    (`microsoft/BiomedVLP-CXR-BERT-specialized` dir with weights + vocab.txt).

    The architecture is inferred from the state-dict shapes (the released
    checkpoint resolves to BERT-base: 768 wide, 12 layers); the head count —
    not recoverable from shapes — comes from config.json when present, else
    the 64-dim-head convention. This lets the synthetic zoo's tiny CXR-BERT
    (`data.synthetic.build_synthetic_cxrbert`) drive the identical code path
    in dry runs."""
    from cxrmate_tpu.configs import BertDecoderConfig
    from cxrmate_tpu.reward.cxrbert import CXRBERTReward, convert_cxrbert
    from cxrmate_tpu.tokenizer.wordpiece import WordPieceTokenizer

    path = os.path.join(task.ckpt_zoo_dir, "microsoft", "BiomedVLP-CXR-BERT-specialized")
    sd = orbax_io.load_hf_pretrained_dir(path)
    word = sd["bert.embeddings.word_embeddings.weight"]
    hidden = int(word.shape[1])
    heads = None
    cfg_json = os.path.join(path, "config.json")
    if os.path.exists(cfg_json):
        import json

        with open(cfg_json) as f:
            heads = json.load(f).get("num_attention_heads")
    cfg = BertDecoderConfig(
        vocab_size=int(word.shape[0]),
        hidden_size=hidden,
        num_hidden_layers=1 + max(
            int(k.split(".")[3]) for k in sd if k.startswith("bert.encoder.layer.")
        ),
        num_attention_heads=heads or max(1, hidden // 64),
        intermediate_size=int(sd["bert.encoder.layer.0.intermediate.dense.weight"].shape[0]),
        max_position_embeddings=int(sd["bert.embeddings.position_embeddings.weight"].shape[0]),
        type_vocab_size=int(sd["bert.embeddings.token_type_embeddings.weight"].shape[0]),
        pad_token_id=0, add_cross_attention=False,
    )
    params = convert_cxrbert(sd, cfg)
    tok = WordPieceTokenizer.from_file(os.path.join(path, "vocab.txt"))
    return CXRBERTReward(params, cfg, tok)


def build_bertscorer(task: TaskConfig):
    """Load the BERTScore encoder from the checkpoint zoo.

    The reference unconditionally registers ``BERTScoreRoBERTaLarge`` for every
    test section (`modules/lightning_modules/single.py:157-169`): roberta-large,
    hidden layer 17, ``rescale_with_baseline=True``
    (`tools/metrics/bertscore.py:84-94`). Offline, the model lives in the zoo as
    an HF checkpoint dir (``roberta-large`` or ``FacebookAI/roberta-large``) and
    the rescale baseline as bert-score's ``roberta-large.tsv`` next to the
    weights. A missing baseline warns and reports RAW scores with every emitted
    key/CSV column suffixed ``_unrescaled`` (eval/bertscore.py:compute) so raw
    and rescaled numbers can never be silently compared across runs."""
    import warnings

    from cxrmate_tpu.eval.bertscore import (
        BERTScorer, RobertaBPETokenizer, convert_roberta, load_rescale_baseline,
    )

    candidates = [
        os.path.join(task.ckpt_zoo_dir, "roberta-large"),
        os.path.join(task.ckpt_zoo_dir, "FacebookAI", "roberta-large"),
    ]
    path = next((p for p in candidates if os.path.isdir(p)), None)
    if path is None:
        raise FileNotFoundError(
            f"no roberta-large checkpoint dir under {task.ckpt_zoo_dir} "
            f"(looked for {candidates})"
        )
    heads = None
    cfg_json = os.path.join(path, "config.json")
    if os.path.exists(cfg_json):
        import json

        with open(cfg_json) as f:
            heads = json.load(f).get("num_attention_heads")
    params, cfg = convert_roberta(orbax_io.load_hf_pretrained_dir(path),
                                  num_attention_heads=heads)
    tok = RobertaBPETokenizer.from_dir(path)
    num_layers = min(17, cfg.num_hidden_layers)  # roberta-large: layer 17
    baseline = None
    for bl in (os.path.join(path, "roberta-large.tsv"),
               os.path.join(path, "rescale_baseline.tsv")):
        if os.path.exists(bl):
            baseline = load_rescale_baseline(bl, num_layers)
            break
    if baseline is None:
        warnings.warn(
            "BERTScore rescale baseline file not found next to the roberta-large "
            "weights — reporting raw (unrescaled) scores; the reference rescales "
            "(tools/metrics/bertscore.py:93)",
            RuntimeWarning,
            stacklevel=2,
        )
    return BERTScorer(
        params, cfg, tok, num_layers=num_layers, roberta_positions=True,
        baseline=baseline, max_length=cfg.max_position_embeddings - 2,
    )


def build_chexbert_fn(task: TaskConfig):
    """Load the CheXbert labeler (Stanford checkpoint + bert-base-uncased vocab)."""
    from cxrmate_tpu.eval.chexbert import BERT_BASE, chexbert_predict, convert_chexbert
    from cxrmate_tpu.tokenizer.wordpiece import WordPieceTokenizer

    ckpt = os.path.join(task.ckpt_zoo_dir, "stanford", "chexbert", "chexbert.pth")
    vocab = os.path.join(task.ckpt_zoo_dir, "bert-base-uncased", "vocab.txt")
    params = convert_chexbert(orbax_io.load_torch_checkpoint(ckpt))
    tok = WordPieceTokenizer.from_file(vocab)
    return lambda reports: chexbert_predict(params, BERT_BASE, tok, reports)


def _optional(builder, task):
    """Build an optional metric model (CheXbert / CXR-BERT); on failure, warn
    LOUDLY about the degradation instead of silently dropping the metric."""
    import warnings

    try:
        return builder(task)
    except (FileNotFoundError, AssertionError, KeyError) as e:
        warnings.warn(
            f"{builder.__name__} unavailable ({type(e).__name__}: {e}) — the "
            "corresponding metrics are skipped and checkpoint selection falls back "
            "to an NLG surrogate (see resolve_monitor)",
            RuntimeWarning,
            stacklevel=2,
        )
        return None


def main(argv=None):
    from cxrmate_tpu.cli.config import parse_args
    from cxrmate_tpu.parallel.multihost import initialize_if_needed

    # must run before anything touches the jax backend: a multi-host launch
    # (JAX_COORDINATOR_ADDRESS set) joins the cluster here; single-host no-op
    initialize_if_needed()
    task = parse_args(argv)
    if task.resolved_xla_cache_dir is not None:
        # persistent XLA compile cache (opt-in — see the TaskConfig comment:
        # a measured LOSS on the axon tunnel, a standard win on direct hosts)
        jax.config.update("jax_compilation_cache_dir", task.resolved_xla_cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    chexbert_fn = _optional(build_chexbert_fn, task)
    if getattr(task, "_train", False):
        if task.variant == "gen_prompt":
            # the reference's GeneratedPrompt is test-only (gen_prompt.py:33-34
            # raises 'Only testing can be performed'): its dataset prompts from
            # history generated DURING evaluation; training it is undefined
            # (the trainable generated-prompt task is `scst`)
            raise ValueError(
                "variant 'gen_prompt' is test-only (the reference raises the "
                "same); train with 'gt_prompt' (teacher-forced) or 'scst' "
                "(self-generated prompts + CXR-BERT reward) instead"
            )
        if task.variant in ("scst", "scst_gt"):
            fit_scst(task, build_cxrbert_reward(task), chexbert_fn=chexbert_fn)
        else:
            fit(task, chexbert_fn=chexbert_fn)
    if getattr(task, "_test", False):
        scores = test(task, chexbert_fn=chexbert_fn,
                      reward_fn=_optional(build_cxrbert_reward, task),
                      bertscorer=_optional(build_bertscorer, task))
        for k, v in sorted(scores.items()):
            print(f"{k}: {v}")


if __name__ == "__main__":
    main()
