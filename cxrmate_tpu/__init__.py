"""cxrmate_tpu — a TPU-native chest X-ray report-generation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of aehrc/cxrmate:
CvT-21 image encoder + BERT cross-attention decoder, single/multi-image and
longitudinal-prompt variants, teacher-forcing + LoRA + SCST training, on-device
greedy/beam/sampled decoding with a static KV cache, and the full evaluation stack.
"""

__version__ = "0.1.0"

from cxrmate_tpu import configs  # noqa: E402,F401

__all__ = ["configs"]
