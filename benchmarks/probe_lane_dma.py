#!/usr/bin/env python
"""Probe: can Mosaic DMA an (8, 64) lane-sliced block from an HBM ref
into a lane half of a VMEM scratch buffer?

Three variants:
  a) static lane offset (0 / 64) on src, static dst half
  b) dynamic lane offset pl.ds(h*64, 64) on src (h from SMEM)
  c) full-block DMA control (sanity)

Run on TPU; prints PASS/FAIL per variant.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make(variant):
    def kernel(src_ref, meta_ref, out_ref, buf, sem0, sem1):
        # copy half A: src block b0, lane half h0 -> buf lanes 0:64
        b0 = meta_ref[0]
        h0 = meta_ref[1]
        b1 = meta_ref[2]
        h1 = meta_ref[3]
        if variant == "a":
            # static halves under pl.when
            @pl.when(h0 == 0)
            def _():
                pltpu.make_async_copy(
                    src_ref.at[pl.ds(b0 * 8, 8), 0:64],
                    buf.at[:, 0:64], sem0).start()

            @pl.when(h0 == 1)
            def _():
                pltpu.make_async_copy(
                    src_ref.at[pl.ds(b0 * 8, 8), 64:128],
                    buf.at[:, 0:64], sem0).start()

            @pl.when(h1 == 0)
            def _():
                pltpu.make_async_copy(
                    src_ref.at[pl.ds(b1 * 8, 8), 0:64],
                    buf.at[:, 64:128], sem1).start()

            @pl.when(h1 == 1)
            def _():
                pltpu.make_async_copy(
                    src_ref.at[pl.ds(b1 * 8, 8), 64:128],
                    buf.at[:, 64:128], sem1).start()

            @pl.when(h0 == 0)
            def _():
                pltpu.make_async_copy(
                    src_ref.at[pl.ds(b0 * 8, 8), 0:64],
                    buf.at[:, 0:64], sem0).wait()

            @pl.when(h0 == 1)
            def _():
                pltpu.make_async_copy(
                    src_ref.at[pl.ds(b0 * 8, 8), 64:128],
                    buf.at[:, 0:64], sem0).wait()

            @pl.when(h1 == 0)
            def _():
                pltpu.make_async_copy(
                    src_ref.at[pl.ds(b1 * 8, 8), 0:64],
                    buf.at[:, 64:128], sem1).wait()

            @pl.when(h1 == 1)
            def _():
                pltpu.make_async_copy(
                    src_ref.at[pl.ds(b1 * 8, 8), 64:128],
                    buf.at[:, 64:128], sem1).wait()
        elif variant == "b":
            cpy0 = pltpu.make_async_copy(
                src_ref.at[pl.ds(b0 * 8, 8), pl.ds(h0 * 64, 64)],
                buf.at[:, 0:64], sem0)
            cpy1 = pltpu.make_async_copy(
                src_ref.at[pl.ds(b1 * 8, 8), pl.ds(h1 * 64, 64)],
                buf.at[:, 64:128], sem1)
            cpy0.start(); cpy1.start()
            cpy0.wait(); cpy1.wait()
        else:
            cpy = pltpu.make_async_copy(
                src_ref.at[pl.ds(b0 * 8, 8), :], buf.at[:, :], sem0)
            cpy.start(); cpy.wait()
        out_ref[...] = buf[...] * 2.0

    return kernel


def run(variant, meta_np):
    nblk = 4
    src = jnp.arange(nblk * 8 * 128, dtype=jnp.float32).reshape(nblk * 8, 128)
    meta = jnp.asarray(meta_np, jnp.int32)
    out = pl.pallas_call(
        make(variant),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda p: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )(src, meta)
    return np.asarray(out)


def expect(meta_np):
    src = np.arange(4 * 8 * 128, dtype=np.float32).reshape(4, 8, 128)
    b0, h0, b1, h1 = meta_np
    out = np.zeros((8, 128), np.float32)
    out[:, 0:64] = src[b0, :, h0 * 64:h0 * 64 + 64]
    out[:, 64:128] = src[b1, :, h1 * 64:h1 * 64 + 64]
    return out * 2.0


if __name__ == "__main__":
    meta = [2, 1, 0, 0]
    for v in ("c", "a", "b"):
        try:
            got = run(v, meta)
            if v == "c":
                ok = np.array_equal(
                    got, np.arange(4 * 8 * 128, dtype=np.float32)
                    .reshape(4, 8, 128)[2] * 2.0)
            else:
                ok = np.array_equal(got, expect(meta))
            print(f"variant {v}: {'PASS' if ok else 'WRONG RESULT'}")
        except Exception as e:
            print(f"variant {v}: FAIL {type(e).__name__}: {str(e)[:300]}")
