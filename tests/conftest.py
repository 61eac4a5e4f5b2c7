import os
import sys

# Tests run on CPU with a virtual 8-device mesh (the TPU-world analogue of a fake
# backend); the real-TPU path is exercised by bench.py / __graft_entry__.py.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")
# Parity tests compare against torch fp32; force exact fp32 matmul/conv (XLA:CPU's
# default uses oneDNN fast-math, TPU's default uses bf16 passes).
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU explicitly so
# tests run on the virtual 8-device host mesh, not through the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
