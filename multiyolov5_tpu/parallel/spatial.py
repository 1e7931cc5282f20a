"""Spatial (H-axis) model parallelism for serving large frames.

The reference has no tensor/pipeline/sequence parallelism (SURVEY.md §2.9 —
a 7-21M-param CNN doesn't need weight sharding), and batch data-parallelism
cannot reduce the LATENCY of one frame.  The model axis that does exist for
a CNN is SPATIAL — the 2-D analog of sequence parallelism: shard the
activation H axis across the mesh's ``model`` axis and let XLA GSPMD
partition every convolution, inserting the halo exchanges (collective
permutes of the kernel-overlap rows between neighbouring shards) and the
all-gathers for the global ops (SPP pools, interpolation matmuls, detect
decode) automatically.  Params stay replicated — at this model scale the
weights are ~14 MB bf16, the activations at megapixel inputs are the
memory/latency problem.

This is intentionally expressed as sharding annotations on a jit boundary
(the "How to Scale Your Model" recipe: pick a mesh, annotate, let XLA
insert collectives) rather than a hand-written shard_map + ppermute halo
pipeline — GSPMD's conv spatial partitioner handles stride/dilation edge
cases that a manual halo implementation would have to re-derive.

The Pallas fast paths (stem/conv/mask kernels) are custom calls that GSPMD
cannot partition, so the spatial path forces the pure-XLA lowering
(``forward(..., sever=False)``) and materialized NHWC seg logits.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelSpec
from ..models.model import forward


def spatial_forward(spec: ModelSpec, params, state, mesh: Mesh,
                    compute_dtype=jnp.bfloat16, fused: bool = True,
                    decode: bool = True):
    """Jitted eval forward with inputs sharded (batch→``data``, H→``model``).

    Returns ``fn(x)`` for NHWC uint8/float frames in [0, 255]; outputs are
    fully replicated (decoded detections + NHWC seg logits at input res).
    H must keep every stride-32 feature row count divisible by the model
    axis for an even shard (GSPMD still compiles otherwise, with padding).
    """
    in_sh = NamedSharding(mesh, P("data", "model", None, None))
    out_sh = NamedSharding(mesh, P())

    @functools.partial(jax.jit, in_shardings=(in_sh,),
                       out_shardings=out_sh)
    def fn(x):
        xn = x.astype(compute_dtype) / 255.0
        det, seg, _ = forward(spec, params, state, xn, train=False,
                              fused=fused, decode=decode, sever=False)
        return (det[0] if decode else det), seg

    return fn


def spatial_sharding_ok(h: int, n_model: int, max_stride: int = 32) -> bool:
    """True when H shards evenly at every pyramid level (no GSPMD padding)."""
    return (h % (max_stride * n_model)) == 0
