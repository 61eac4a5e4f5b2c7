"""In-place beam-reorder + KV-column-write Pallas kernel.

The beam-search step must, per decoder layer, (1) permute the self-KV cache
rows by each new beam's source beam and (2) write the step's new KV column.
Round 2 expressed this as one block-diagonal one-hot matmul with a fused
``where`` (generate/beam.py) — bit-exact and MXU-tiled, but XLA runs it as a
read+write pass over the cache AND (profiled, round 3) copies the dot's output
back into the while-carry buffer every step at another full read+write: at
longitudinal batch 24 the carry copies are ~1.6 ms of the 6.35 ms step and the
reorder/select fusions another ~1.7 ms.

This kernel does the permutation + column write as pure data movement with
``input_output_aliases`` — the cache is updated IN PLACE, so the while body's
output is the same buffer as its input and XLA has nothing to double-buffer.
Bit-exact by construction: every output element is a copy of an input element
(no arithmetic).

Safety of in-place permutation: the grid runs one study group (``beams`` rows)
per cell; the kernel snapshots the group's block into VMEM scratch before any
write, so row collisions within a group cannot read overwritten data, and
groups never touch each other's rows (the selection matrix is block-diagonal).

Reference behaviour being reimplemented: HF beam search's
``_reorder_cache``/past-key-values gather (the reference decodes through HF
``generate``; see /root/reference/modules/transformers/*/modelling_*.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reorder_kernel(scal_ref, ck_ref, cv_ref, nk_ref, nv_ref, ok_ref, ov_ref,
                    sk, sv, *, beams: int, n_rows: int, t_len: int):
    g = pl.program_id(0)
    idx = scal_ref[n_rows]  # the column to overwrite (-1 → no write)
    # snapshot the group's blocks before any (possibly aliased) write
    sk[...] = ck_ref[...]
    sv[...] = cv_ref[...]
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, t_len, 1), 2)
    is_new = t_iota == idx
    for j in range(beams):  # static unroll (beams is 4)
        src = scal_ref[g * beams + j]  # source beam within the group, 0..beams-1
        row_k = sk[pl.ds(src, 1)]      # [1, H, T, dh]
        row_v = sv[pl.ds(src, 1)]
        new_k = nk_ref[pl.ds(src, 1)]  # [1, H, 1, dh]
        new_v = nv_ref[pl.ds(src, 1)]
        ok_ref[pl.ds(j, 1)] = jnp.where(is_new, new_k, row_k)
        ov_ref[pl.ds(j, 1)] = jnp.where(is_new, new_v, row_v)


@functools.partial(jax.jit, static_argnames=("beams", "interpret", "vmem_mb"))
def beam_reorder_write(cache_k, cache_v, new_k, new_v, sel_local, index, *,
                       beams: int, interpret: bool = False, vmem_mb: int = 100):
    """Permute cache rows within beam groups and write the new KV column.

    cache_k/cache_v: [R, H, T, dh] (R = groups × beams, beam-major per group);
    new_k/new_v: [R, H, dh] — this step's KV column per SOURCE row;
    sel_local: [R] int32 — source beam index (0..beams-1) within each group;
    index: scalar int32 — the cache column to write (-1 skips the write).
    Returns the updated (cache_k, cache_v); the inputs are donated (in-place)."""
    r, h, t, dh = cache_k.shape
    assert r % beams == 0
    groups = r // beams
    scal = jnp.concatenate([
        sel_local.astype(jnp.int32),
        jnp.full((1,), index, jnp.int32),
    ])
    nk = new_k[:, :, None, :]
    nv = new_v[:, :, None, :]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(groups,),
        in_specs=[
            pl.BlockSpec((beams, h, t, dh), lambda g, s: (g, 0, 0, 0)),
            pl.BlockSpec((beams, h, t, dh), lambda g, s: (g, 0, 0, 0)),
            pl.BlockSpec((beams, h, 1, dh), lambda g, s: (g, 0, 0, 0)),
            pl.BlockSpec((beams, h, 1, dh), lambda g, s: (g, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((beams, h, t, dh), lambda g, s: (g, 0, 0, 0)),
            pl.BlockSpec((beams, h, t, dh), lambda g, s: (g, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((beams, h, t, dh), cache_k.dtype),
            pltpu.VMEM((beams, h, t, dh), cache_v.dtype),
        ],
    )
    out_k, out_v = pl.pallas_call(
        functools.partial(_reorder_kernel, beams=beams, n_rows=r, t_len=t),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ],
        # args: (scal, cache_k, cache_v, nk, nv) → cache_k/v alias the outputs
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_mb * 2**20,
        ),
        interpret=interpret,
    )(scal, cache_k, cache_v, nk, nv)
    return out_k, out_v
