"""Per-kernel rfft epilogue measurement vs its own HBM floor (round-4).

Round-3 left the epilogue kernels' individual costs unmeasured: the rfft_perf
A/B showed untangle+retangle = ~1.6 ms and (by arithmetic) pack+interleave =
~1.2 ms at N=2^20/b=16, each ~5-6x over a ~0.15 ms floor, but nothing says
WHERE.  This experiment chain_compares two layout-stationary roundtrips
against aliased passthrough copy kernels of the same array shapes:

  pack_rt      pack_split -> interleave_split     on (B, 2M) real
  untangle_rt  untangle_fwd -> retangle_inv       on (B, M) planes

Tunables exposed as process args (ONE measurement per process — the journal
discipline for this tunnel): --lane-tile (matmul granularity), --block-target
(big-block lanes per grid step), --stack-rows (stacked matmul row cap).
Module constants are overridden BEFORE any trace, so jit caches stay honest.

Usage: python benchmarks/exp_rfft_kernels.py --which pack_rt --n 1048576 --batch 16
Prints one JSON line.
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", required=True,
                    choices=["pack_rt", "untangle_rt"])
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--precision", default="bfloat16")
    ap.add_argument("--lane-tile", type=int, default=None)
    ap.add_argument("--block-target", type=int, default=None)
    ap.add_argument("--stack-rows", type=int, default=None)
    args = ap.parse_args()

    from tensorfft_tpu.ops import rfft_pallas

    if args.block_target is not None:
        rfft_pallas.LANE_BLOCK_TARGET = args.block_target
    if args.stack_rows is not None:
        rfft_pallas.MAX_STACK_ROWS = args.stack_rows
    lt_kw = {}
    if args.lane_tile is not None:
        lt_kw["lane_tile"] = args.lane_tile

    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tensorfft_tpu.plan import Precision
    from tensorfft_tpu.testing.timer import chain_compare
    from tensorfft_tpu.utils.device import KERNEL_VMEM_LIMIT_BYTES

    n, b = args.n, args.batch
    m = n // 2
    storage = Precision(args.precision).storage_dtype
    rng = np.random.default_rng(0)

    def copy_step(*shapes_arrays):
        """Aliased passthrough Pallas copy over the given 2D arrays —
        the achievable one-read-one-write floor for those shapes."""
        arrays = shapes_arrays
        lanes = 512

        def kern(*refs):
            half = len(refs) // 2
            for i in range(half):
                refs[half + i][:] = refs[i][:]

        specs = [
            pl.BlockSpec((a.shape[0], lanes), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
            for a in arrays
        ]
        f = pl.pallas_call(
            kern,
            grid=(arrays[0].shape[1] // lanes,),
            in_specs=specs,
            out_specs=tuple(specs),
            out_shape=tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                            for a in arrays),
            input_output_aliases={i: i for i in range(len(arrays))},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES),
        )
        out = jax.jit(lambda *xs: f(*xs))
        return out

    if args.which == "pack_rt":
        x = jnp.asarray(rng.standard_normal((b, n)), storage)
        operands = (x,)

        def step(xx):
            re, im = rfft_pallas.pack_split(xx, **lt_kw)
            return (rfft_pallas.interleave_split(re, im, **lt_kw),)

        floor = copy_step(x)
        floor_step = lambda xx: floor(xx)
        bytes_rt = 2 * (2 * b * n * x.dtype.itemsize)  # 2 kernels x r+w
    else:
        z_re = jnp.asarray(rng.standard_normal((b, m)), storage)
        z_im = jnp.asarray(rng.standard_normal((b, m)), storage)
        operands = (z_re, z_im)

        def step(zr, zi):
            o_re, o_im = rfft_pallas.untangle_fwd(zr, zi, n=n, scale=0.25,
                                                  **lt_kw)
            return rfft_pallas.retangle_inv(o_re, o_im, n=n, scale=1.0,
                                            out_dtype=storage, **lt_kw)

        floor = copy_step(z_re, z_im)
        floor_step = lambda zr, zi: floor(zr, zi)
        bytes_rt = 2 * (4 * b * m * z_re.dtype.itemsize)

    r_step, r_floor = chain_compare(step, floor_step, operands)
    t_us = r_step.average_time_ns / 1e3
    f_us = r_floor.average_time_ns / 1e3
    print(json.dumps({
        "which": args.which, "n": n, "batch": b,
        "precision": args.precision,
        "lane_tile": args.lane_tile,
        "block_target": args.block_target,
        "stack_rows": args.stack_rows,
        "roundtrip_us": round(t_us, 1),
        "sigma_us": round(r_step.std_deviation_ns / 1e3, 1),
        "copy_floor_us": round(f_us, 1),
        "x_floor": round(t_us / f_us, 2) if f_us > 0 else None,
        "gbps_effective": round(bytes_rt / r_step.average_time_ns, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
