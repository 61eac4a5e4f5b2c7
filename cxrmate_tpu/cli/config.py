"""Config system: YAML with ``defaults:`` composition + CLI overrides.

Mirrors the reference's dlhpcstarter behaviour (hydra-style ``defaults:`` lists
composing onto a base YAML, e.g. `/root/reference/config/train/multi_tf.yaml:1-3`,
flattened into a namespace whose keys parameterise the task)."""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Any, Dict, List, Optional

import yaml


def load_config(path: str, _seen: Optional[set] = None) -> Dict[str, Any]:
    """Load a YAML config, recursively composing its ``defaults:`` list. ``_self_``
    marks where the file's own keys apply (later wins)."""
    _seen = _seen or set()
    path = os.path.abspath(path)
    assert path not in _seen, f"config cycle at {path}"
    _seen.add(path)
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    defaults: List[str] = raw.pop("defaults", ["_self_"])
    if "_self_" not in defaults:
        defaults = defaults + ["_self_"]
    merged: Dict[str, Any] = {}
    for item in defaults:
        if item == "_self_":
            merged.update(raw)
        else:
            base = os.path.join(os.path.dirname(path), f"{item}.yaml")
            merged.update(load_config(base, _seen))
    return merged


def apply_overrides(config: Dict[str, Any], overrides: List[str]) -> Dict[str, Any]:
    """key=value overrides (YAML-parsed values)."""
    out = dict(config)
    for ov in overrides:
        key, _, val = ov.partition("=")
        parsed = yaml.safe_load(val)
        if isinstance(parsed, str):
            # YAML 1.1 doesn't parse '1e-4' as a float; accept scientific notation
            try:
                parsed = float(parsed) if any(c in parsed for c in ".eE") else parsed
            except ValueError:
                pass
        out[key.strip()] = parsed
    return out


@dataclasses.dataclass
class TaskConfig:
    """Flat task configuration (the union of keys the reference configs use).

    Unknown keys in a YAML are accepted and ignored (``from_dict`` filters) —
    this covers the reference's Lightning-cosmetic flags (``deterministic``,
    ``enable_progress_bar``, ``weights_summary``, ``module``, ``definition``)
    which have no TPU-side counterpart."""

    task: str = "mimic_cxr"
    variant: str = "multi"  # single | multi | gt_prompt | gen_prompt | scst | scst_gt
    exp_dir: str = "experiments"
    dataset_dir: str = "datasets"
    ckpt_zoo_dir: str = "checkpoints"
    tokenizer_dir: Optional[str] = None
    trial: int = 0

    max_images_per_study: int = 5
    # image-slot padding for the collate: "batch" pads each batch to its own max
    # image count (the reference's pad_sequence semantics, multi.py:155-164 —
    # fewer encoder FLOPs and a narrower cross-KV cache, the decode step's
    # dominant streaming cost); "max" pads every batch to max_images_per_study
    # (one static shape → one XLA program per stage, for compile-count-sensitive
    # runs). Exactness: padded slots are all-zero images whose cross columns are
    # masked to exactly-0.0 softmax weights, so outputs are identical either way
    # (tests/test_generate_{greedy,beam}.py::test_image_pad*_is_inert).
    pad_images: str = "batch"
    # iterate eval/test splits in image-count order (stable sort) so batches are
    # image-slot homogeneous under pad_images: "batch"; per-study outputs are
    # iteration-order-invariant. False restores dataset order. (Never applied to
    # generated-prompt datasets — their history threading fixes the order.)
    eval_sort_by_images: bool = True
    # eval/test DECODE batch packing: decode in programs of ~this many beam
    # rows regardless of mbatch_size (decode batch = eval_decode_rows //
    # num_beams, capped at the per-rank dataset size; ragged tails are padded
    # up to the compiled shape and sliced back). 96 rows is the measured
    # throughput peak on the v5e for BOTH greedy (batch 96) and beam-4
    # (24×4 — DEVNOTES round 2/3 sweeps); the reference's own test decode runs
    # at task.mbatch_size (batch 8 → ~22% slower, BENCH_r03). Pure batching —
    # per-study outputs are batch-size-invariant (token-identity test at both
    # batchings, tests/test_cli_end_to_end.py). 0 disables (decode at
    # mbatch_size). Generated-prompt datasets can't be re-batched at decode
    # time (their decode batch IS the allocator's lane count), so for them this
    # knob instead sizes the lane allocation itself: make_datasets packs
    # subjects onto eval_decode_rows // num_beams lanes
    # (PreviousReportDataset.allocate_eval_lanes; 0 keeps mbatch_size lanes).
    eval_decode_rows: int = 96
    decoder_max_len: int = 256
    num_test_beams: int = 4
    sections_to_evaluate: tuple = ("report",)

    lr: float = 5e-5
    max_epochs: int = 32
    mbatch_size: int = 8
    accumulated_mbatch_size: int = 32
    every_n_epochs: int = 1  # validate + checkpoint every N epochs
    # fraction of the epoch between mid-epoch validations (Lightning semantics;
    # the reference's SCST configs use 0.1 and its released SCST checkpoint is
    # mid-epoch: epoch 0, step 1567)
    val_check_interval: Optional[float] = None
    monitor: str = "val_report_chexbert_f1_macro"
    monitor_mode: str = "max"
    # checkpoints retained per monitored metric (Lightning ModelCheckpoint
    # save_top_k: reference trainer default 1; <=0 keeps every checkpoint)
    save_top_k: int = 1
    precision: str = "bf16"
    num_workers: int = 5

    # warm-start modes (reference tools/stages.py:52-85, priority order:
    # explicit ckpt path > other experiment dir > HF checkpoint > fresh init)
    warm_start_ckpt_path: Optional[str] = None
    warm_start_exp_dir: Optional[str] = None
    warm_start_monitor: str = "val_report_chexbert_f1_macro"
    warm_start_monitor_mode: str = "max"
    warm_start_name: Optional[str] = None
    multi_ckpt_name: Optional[str] = None
    # test-time checkpoint selection (reference tools/stages.py:93-105)
    test_ckpt_name: Optional[str] = None
    test_epoch: Optional[int] = None
    test_ckpt_path: Optional[str] = None
    # resume modes (reference tools/stages.py:88)
    resume_last: bool = False
    resume_epoch: Optional[int] = None
    resume_ckpt_path: Optional[str] = None
    fast_dev_run: bool = False  # 1-batch/1-epoch dry run (stages.py:97-99 analogue)

    # TPU parallelism
    mesh_data: Optional[int] = None
    mesh_model: int = 1
    # pad every TF batch to the static decoder/prompt budgets instead of the
    # batch longest (one XLA program per stage). Pad keys/labels are masked:
    # for fixed dropout masks, losses/updates agree to fp32 ulp-level
    # reduction-order noise
    # (tests/test_cli_end_to_end.py::test_static_tf_pad_is_loss_inert); under
    # live dropout the mask DRAWS are shape-dependent, so a static-pad run is
    # distributionally — not bitwise — equivalent to a dynamic-pad run
    # (docs/ARCHITECTURE.md "Static TF padding × dropout"). Forced on in
    # multi-process runs, where every process must tokenize ITS row stripe to
    # the same global widths.
    static_tf_pad: bool = False

    # model preset: "cxrmate" (CvT-21@384 + 6L BERT) or "tiny" (smoke tests)
    model_preset: str = "cxrmate"
    image_size: int = 384
    # On-disk decoded-image cache shared by the train and eval loaders
    # (data/image.py "decoded-image cache"): JPEG entropy decode is the host
    # loaders' irreducible ~30-45 ms/image cost and every epoch/run re-decodes
    # the same files; the cache stores each transform's own deterministic uint8
    # intermediate (~150-180 KB/image), so cached outputs are byte-identical to
    # uncached per path (the PIL-exact eval path stays PIL-exact) and warm
    # epochs load at ~0.1-3 ms/image. DEFAULT ON ("auto" → <exp_dir>/.image_cache,
    # write-through; a background CacheWarmer overlaps epoch-1 decodes with the
    # first XLA compile — cli/stages.py). Set explicitly to null/None for the
    # reference's re-decode-every-epoch behaviour (data/dicom_id.py:78-95).
    image_cache_dir: Optional[str] = "auto"
    # JAX persistent XLA compilation cache (jax_compilation_cache_dir): caches
    # compiled executables on disk so repeat runs skip the minutes-long first
    # compile. OFF by default: on the axon remote-TPU tunnel this box uses,
    # executable DESERIALIZATION is pathologically slower than recompiling
    # (measured: 27 s cold compile vs 486 s+ cache load — DEVNOTES round 5), so
    # only enable it ("auto" → <exp_dir>/.xla_cache, or an explicit path) on
    # direct-attached TPU hosts, where it is a standard large win.
    xla_cache_dir: Optional[str] = None

    @property
    def resolved_xla_cache_dir(self) -> Optional[str]:
        if not self.xla_cache_dir:
            return None
        if self.xla_cache_dir == "auto":
            return os.path.join(self.exp_dir, ".xla_cache")
        return self.xla_cache_dir

    @property
    def resolved_image_cache_dir(self) -> Optional[str]:
        """``image_cache_dir`` with "auto" resolved under ``exp_dir`` (shared
        across tasks/variants/trials of one experiments root) and falsy values
        normalised to None (cache off)."""
        if not self.image_cache_dir:
            return None
        if self.image_cache_dir == "auto":
            return os.path.join(self.exp_dir, ".image_cache")
        return self.image_cache_dir

    @property
    def exp_dir_trial(self) -> str:
        return os.path.join(self.exp_dir, self.task, self.variant, f"trial_{self.trial}")

    @property
    def accumulate_steps(self) -> int:
        return max(1, self.accumulated_mbatch_size // self.mbatch_size)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TaskConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in fields}
        if "sections_to_evaluate" in kwargs and isinstance(kwargs["sections_to_evaluate"], list):
            kwargs["sections_to_evaluate"] = tuple(kwargs["sections_to_evaluate"])
        return cls(**kwargs)


VALID_VARIANTS = ("single", "multi", "gt_prompt", "gen_prompt", "scst", "scst_gt")


def parse_args(argv=None) -> TaskConfig:
    p = argparse.ArgumentParser("cxrmate_tpu")
    p.add_argument("--config", "-c", required=True)
    p.add_argument("--train", action="store_true")
    p.add_argument("--test", action="store_true")
    p.add_argument("--trial", type=int, default=0)
    p.add_argument("overrides", nargs="*", help="key=value overrides")
    args = p.parse_args(argv)
    if not os.path.exists(args.config):
        p.error(f"config file not found: {args.config}")
    cfg = apply_overrides(load_config(args.config), args.overrides)
    cfg["trial"] = args.trial
    if cfg.get("variant") not in VALID_VARIANTS:
        p.error(f"variant must be one of {VALID_VARIANTS}, got {cfg.get('variant')!r}")
    task = TaskConfig.from_dict(cfg)
    task._train = args.train  # type: ignore[attr-defined]
    task._test = args.test  # type: ignore[attr-defined]
    return task
