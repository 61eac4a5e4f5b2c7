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
    """dp×tp mesh over ``data*model`` devices (the first ones, if fewer than all
    are requested — lets a 4-device job run on an 8-device host)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    assert model >= 1, f"mesh model axis must be >= 1, got {model}"
    if data is None:
        data = n // model
    assert data >= 1, (
        f"mesh {data}x{model} is empty — model={model} exceeds the {n} available devices?"
    )
    assert data * model <= n, f"mesh {data}x{model} needs {data * model} devices, have {n}"
    return Mesh(devices[: data * model].reshape(data, model), ("data", "model"))


def batch_spec() -> P:
    return P("data")


def _global_from_host(x, sharding: NamedSharding):
    """Place a host value every process holds IN FULL onto a (possibly
    multi-process) sharding. Single-process: plain device_put. Multi-process:
    device_put cannot target non-addressable devices, so the global array is
    assembled shard-by-shard from the identical host copy (deterministic init,
    shared-filesystem checkpoint loads, replicated scalars)."""
    a = np.asarray(x)
    if jax.process_count() > 1:
        return jax.make_array_from_callback(a.shape, sharding, lambda idx, a=a: a[idx])
    return jax.device_put(a, sharding)


def place_batch(batch: dict, mesh: Optional[Mesh]) -> dict:
    """Place a host batch dict on the mesh, sharded along the 'data' axis (the
    DDP analogue: each device gets its slice; gradient reductions become psum
    over ICI via GSPMD). With no mesh, plain device transfer.

    When the mesh spans processes (multi-host), each process passes only its
    OWN row stripe of the global batch — the rows its local devices own
    (``local_row_range``; the loader's ``row_shard``) — and the global array is
    assembled from the per-process stripes."""
    import jax.numpy as jnp

    if mesh is None:
        return {k: jnp.asarray(v) for k, v in batch.items()}
    multiprocess = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        arr = np.asarray(v)
        spec = P("data") if arr.ndim else P()
        sharding = NamedSharding(mesh, spec)
        if multiprocess and arr.ndim:
            # each process passes only its row stripe
            out[k] = jax.make_array_from_process_local_data(sharding, arr)
        else:  # scalars are replicated: every process passes the same value
            out[k] = _global_from_host(arr, sharding)
    return out


def local_row_range(mesh: Mesh, global_rows: int):
    """The contiguous ``[start, stop)`` rows of a ``P('data')``-sharded global
    batch owned by THIS process's devices. Multi-process loaders materialise
    only this stripe (``data.pipeline.batch_iterator(row_shard=...)``) and
    ``place_batch`` reassembles the global batch. Derived from the sharding's
    own index map, so it holds for whatever device order jax reports."""
    sharding = NamedSharding(mesh, P("data"))
    imap = sharding.addressable_devices_indices_map((global_rows,))
    spans = []
    for idx in imap.values():
        sl = idx[0]
        spans.append((sl.start or 0, global_rows if sl.stop is None else sl.stop))
    lo = min(s for s, _ in spans)
    hi = max(e for _, e in spans)
    assert sum(e - s for s, e in spans) == hi - lo, (
        "this process's rows on the mesh data axis are not contiguous "
        f"(spans {sorted(spans)}); multi-process loading needs a process-major "
        "device order along 'data'"
    )
    return lo, hi


def host_copy(tree):
    """Host-numpy copy of a tree of (fully-replicated) arrays. In multi-process
    runs every process holds complete values of replicated global arrays, so
    rank 0 can checkpoint (and every rank can run local eval) without a gather."""

    def one(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            assert x.is_fully_replicated, (
                "host_copy needs fully-replicated arrays (multi-process mode is "
                f"data-parallel only); got sharding {x.sharding}"
            )
            return np.asarray(x.addressable_shards[0].data)
        return np.asarray(x)

    return jax.tree_util.tree_map(one, tree)


def replicate_tree(tree, mesh: Mesh):
    """Place a host tree fully-replicated on the (possibly multi-process) mesh.
    Every process must pass identical values (deterministic init / checkpoint
    restore from the shared filesystem)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: _global_from_host(x, sharding), tree)


def pad_to_multiple(arr: np.ndarray, multiple: int) -> np.ndarray:
    """Pad the leading (batch) axis up to a multiple by repeating the last row —
    keeps eval batches divisible by the mesh 'data' axis with static shapes."""
    b = arr.shape[0]
    pad = (-b) % multiple
    if pad == 0:
        return arr
    return np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)], axis=0)


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


def _feasible_spec(x, spec: P, mesh: Mesh) -> P:
    """Drop sharded axes whose dimension doesn't divide the mesh axis size
    (e.g. a tiny test vocab that doesn't split 4 ways) — replicate those dims."""
    dims = []
    for i, name in enumerate(spec):
        if name is None or i >= x.ndim:
            dims.append(None)
            continue
        size = int(np.prod([mesh.shape[a] for a in ((name,) if isinstance(name, str) else name)]))
        dims.append(name if x.shape[i] % size == 0 else None)
    return P(*dims)


def shard_variables(variables: dict, mesh: Mesh, tp: bool = True) -> dict:
    specs = variables_specs(variables, tp=tp)

    def place(x, s):
        # every process holds the full host value (deterministic init /
        # shared-FS load), so _global_from_host covers multi-process placement
        return _global_from_host(x, NamedSharding(mesh, _feasible_spec(x, s, mesh)))

    return jax.tree_util.tree_map(place, variables, specs)
