"""HBM streaming-bandwidth probe: does outstanding-DMA depth move the ceiling?

Context (STATUS.md / perf map): the decode loop's fused cross-attention
kernel is DMA-bound — a stream-only variant times the same as the full
kernel — and the measured effective pallas streaming bandwidth on this chip
swings 150-300 GB/s vs the 819 GB/s HBM spec. Pallas's automatic grid
pipelining keeps ~1 block in flight; if the gap is queue depth (multiple
HBM DMA engines idle), a manually multi-buffered kernel with N outstanding
async copies should stream faster, and the decode kernel should adopt the
same structure. If depth changes nothing, the ceiling is the
tunnel-shared chip itself and the decode kernel stays as is.

Measures, over a ~0.5-1 GB int8 buffer:
  xla      - jnp.sum reduce (the ~62 GB/s XLA baseline)
  auto     - pallas grid-pipelined stream (what the decode kernel does)
  manual-N - one kernel invocation, N-deep manual DMA ring (N in 2,4,8)

Usage (real TPU): python tools/probe_dma.py [--mb 512] [--chunk-kb 1024]
CPU smoke:        python tools/probe_dma.py --cpu --mb 8 --chunk-kb 256
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

LANES = 128  # int8 row width: Mosaic only lowers the ring's dynamic
# sublane slices (consumer reads at a traced slot offset) on exactly
# 128-lane vectors — wider rows turn the slice into an unsupported gather


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=512, help="buffer size, MB")
    ap.add_argument("--chunk-kb", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.default_backend() != "tpu"

    rows = args.mb * (1 << 20) // LANES
    chunk_rows = args.chunk_kb * (1 << 10) // LANES
    rows = rows // chunk_rows * chunk_rows
    n_chunks = rows // chunk_rows
    nbytes = rows * LANES
    x = jnp.asarray(
        np.random.default_rng(0).integers(-127, 127, (rows, LANES), np.int8))

    def timed(fn, label):
        r = fn(x)
        jax.tree.map(np.asarray, r)  # compile + first run
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            r = fn(x)
            jax.tree.map(np.asarray, r)
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"{label:10s} best {best * 1e3:8.2f} ms  "
              f"{nbytes / best / 1e9:7.1f} GB/s  "
              f"all {[round(t * 1e3, 1) for t in times]}")

    # ---- xla reduce baseline -------------------------------------------- #
    timed(jax.jit(lambda a: jnp.sum(a, dtype=jnp.int32)), "xla")

    # ---- auto-pipelined grid stream ------------------------------------- #
    def auto_kernel(a_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)
        o_ref[...] += jnp.sum(
            a_ref[: 8 * (1 << 10) // LANES].astype(jnp.int32),
            axis=0, keepdims=True)[:, :128]

    @jax.jit
    def auto(a):
        return pl.pallas_call(
            auto_kernel,
            grid=(n_chunks,),
            in_specs=[pl.BlockSpec((chunk_rows, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
            interpret=interpret,
        )(a)

    timed(auto, "auto")

    # ---- manual N-deep DMA ring ----------------------------------------- #
    # ring slots stacked along sublanes of a 2D scratch: a traced leading
    # index of a 3D ref lowers to a gather Mosaic rejects ("Only 2D gather
    # is supported"); pl.ds sublane slices are plain dynamic slices
    def manual_kernel(a_hbm, o_ref, buf, sem, *, nbuf):
        def get_dma(slot, chunk):
            return pltpu.make_async_copy(
                a_hbm.at[pl.ds(chunk * chunk_rows, chunk_rows)],
                buf.at[pl.ds(slot * chunk_rows, chunk_rows)], sem.at[slot])

        for s in range(min(nbuf, n_chunks)):
            get_dma(s, s).start()

        def body(i, acc):
            slot = jax.lax.rem(i, nbuf)
            get_dma(slot, i).wait()
            # touch a sliver so the stream has a consumer; the kernel is
            # DMA-bound, this VPU add is noise
            acc += jnp.sum(buf[pl.ds(slot * chunk_rows,
                                     8 * (1 << 10) // LANES)]
                           .astype(jnp.int32), axis=0)[None, :128]

            @pl.when(i + nbuf < n_chunks)
            def _():
                get_dma(slot, i + nbuf).start()

            return acc

        o_ref[...] = jax.lax.fori_loop(
            0, n_chunks, body, jnp.zeros((1, 128), jnp.int32))

    for nbuf in (2, 4, 8):

        @jax.jit
        def manual(a, nbuf=nbuf):
            return pl.pallas_call(
                functools.partial(manual_kernel, nbuf=nbuf),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
                scratch_shapes=[
                    pltpu.VMEM((nbuf * chunk_rows, LANES), jnp.int8),
                    pltpu.SemaphoreType.DMA((nbuf,)),
                ],
                interpret=interpret,
            )(a)

        timed(manual, f"manual-{nbuf}")


if __name__ == "__main__":
    main()
