"""Device mesh + sharding rules.

The reference's only strategy is DDP over GPUs (`config/train/single_tf.yaml:8`,
NCCL all-reduce hidden inside Lightning). Here parallelism is expressed TPU-natively:
a ``jax.sharding.Mesh`` with a ``data`` axis (batch sharding; gradient reductions
become XLA ``psum`` over ICI) and an optional ``model`` axis for tensor parallelism
of the decoder (vocab-sharded embedding/LM head, head-sharded attention, intermediate-
sharded MLP). The ~100M-parameter model fits comfortably on one chip, so ``model=1``
(pure DP) is the production default; the TP rules exist to scale batch-of-one latency
and are exercised by the multi-chip dry run."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    return Mesh(devices.reshape(data, model), ("data", "model"))


def batch_spec() -> P:
    return P("data")


def _decoder_layer_specs(layer: dict) -> dict:
    """TP specs for one decoder layer: attention q/k/v sharded on the head (output)
    dim, attention out on the input dim; MLP fc1 on output, fc2 on input."""

    def lin(out_axis):
        spec = {"w": P(None, "model") if out_axis else P("model", None)}
        spec["b"] = P("model") if out_axis else P(None)
        return spec

    def maybe_lora(base, params):
        if "lora_a" in params:
            base = dict(base)
            base["lora_a"] = P(None, None)
            base["lora_b"] = P(None, "model")
        return base

    specs = {
        "self": {
            "q": maybe_lora(lin(True), layer["self"]["q"]),
            "k": maybe_lora(lin(True), layer["self"]["k"]),
            "v": lin(True),
            "out": lin(False),
            "ln": {"scale": P(None), "bias": P(None)},
        },
        "mlp": {
            "fc1": lin(True),
            "fc2": lin(False),
            "ln": {"scale": P(None), "bias": P(None)},
        },
    }
    if "cross" in layer:
        specs["cross"] = {
            "q": lin(True),
            "k": lin(True),
            "v": lin(True),
            "out": lin(False),
            "ln": {"scale": P(None), "bias": P(None)},
        }
    return specs


def decoder_param_specs(params: dict) -> dict:
    """PartitionSpec tree for the decoder params (TP over the 'model' axis)."""
    return {
        "embeddings": {
            "word": P("model", None),  # vocab-sharded
            "position": P(None, None),
            "token_type": P(None, None),
            "ln": {"scale": P(None), "bias": P(None)},
        },
        "layers": [_decoder_layer_specs(l) for l in params["layers"]],
        "lm_head": {
            "transform": {"w": P(None, None), "b": P(None)},
            "ln": {"scale": P(None), "bias": P(None)},
            "decoder": (
                {"w": P(None, "model"), "b": P("model")}
                if "w" in params["lm_head"]["decoder"]
                else {"b": P("model")}  # tied head: projection = embeddings.word
            ),
        },
    }


def replicated_specs(tree) -> dict:
    return jax.tree_util.tree_map(lambda _: P(), tree)


def variables_specs(variables: dict, tp: bool = True) -> dict:
    """PartitionSpec tree for the full {'params': {'encoder','decoder'},
    'batch_stats'} bundle. The CvT encoder is replicated (its convolutional widths
    are small and batch-bound); the decoder is TP-sharded when ``tp``."""
    specs = {
        "params": {
            "encoder": replicated_specs(variables["params"]["encoder"]),
            "decoder": decoder_param_specs(variables["params"]["decoder"])
            if tp
            else replicated_specs(variables["params"]["decoder"]),
        },
        "batch_stats": replicated_specs(variables["batch_stats"]),
    }
    return specs


def shard_variables(variables: dict, mesh: Mesh, tp: bool = True) -> dict:
    specs = variables_specs(variables, tp=tp)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), variables, specs
    )
