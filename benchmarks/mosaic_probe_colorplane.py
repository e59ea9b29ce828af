"""Probe which lane-manipulation primitives Mosaic lowers on this image —
the feasibility question for the color-plane (checkerboard) smoother
layout (ROADMAP #1).  Each probe compiles a minimal kernel; run ON TPU.

Usage: python benchmarks/mosaic_probe_colorplane.py
"""
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, body, shapes):
    try:
        args = [jnp.ones(s, jnp.float32) for s in shapes]
        out = jax.jit(lambda *a: pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((shapes[0][0], shapes[0][1] // 2),
                                           jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(shapes),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a))(*args)
        jax.block_until_ready(out)
        print(json.dumps({"probe": name, "ok": True}))
    except Exception as e:
        print(json.dumps({"probe": name, "ok": False,
                          "err": f"{type(e).__name__}: {str(e)[:160]}"}))


N = 256

def lane_stride(x_ref, o_ref):
    o_ref[:] = x_ref[:][:, 0::2]

def reshape_split(x_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = x.reshape(x.shape[0], x.shape[1] // 2, 2)[:, :, 0]

def roll_select(x_ref, o_ref):
    # deinterleave even lanes via roll+mask then matmul-free compaction?
    # (no compaction primitive — this just checks masked select + reshape)
    x = x_ref[:]
    jj = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    even = jnp.where(jj % 2 == 0, x, 0.0)
    o_ref[:] = even.reshape(x.shape[0], x.shape[1] // 2, 2).sum(2)


if __name__ == "__main__":
    probe("lane_strided_slice", lane_stride, [(N, N)])
    probe("reshape_lane_split", reshape_split, [(N, N)])
    probe("mask_reshape_sum", roll_select, [(N, N)])
