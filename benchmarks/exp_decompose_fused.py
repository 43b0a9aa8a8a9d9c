"""Decompose the public fused path's cost at (N, batch) configs.

Measures, with the calibrated chain timer (CV ~0.3%, see testing/timer.py):
  public   — the dispatched path: XLA (B,N)->(N,B) transposes + fused kernel
  kernel   — fused_fft alone on pre-transposed (N, B) planes
  batchmaj — fused_fft_batch_major on (B, N) planes (in-VMEM transpose)
  bm_bf16  — batch-major with bf16 inter-stage state
  floor    — aliased batch-major DMA passthrough kernel (the copy floor)

The difference public - kernel is what the two XLA HBM transposes cost;
batchmaj vs kernel is what the in-VMEM sublane transpose costs; floor is the
achievable DMA bound for any one-pass kernel on this data.  Round-1 chose
transform-major from a noisy tie (VERDICT weak #2) — this re-decides it.
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _floor_kernel(b, n, dtype):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tensorfft_tpu.utils.device import KERNEL_VMEM_LIMIT_BYTES

    rt = 1
    while rt * 2 <= 128 and b % (rt * 2) == 0:
        rt *= 2
    spec = pl.BlockSpec((rt, n), lambda ib: (ib, 0), memory_space=pltpu.VMEM)

    def kernel(re_ref, im_ref, out_re_ref, out_im_ref):
        out_re_ref[:] = re_ref[:]
        out_im_ref[:] = im_ref[:]

    @jax.jit
    def run(re, im):
        return pl.pallas_call(
            kernel,
            grid=(b // rt,),
            in_specs=[spec, spec],
            out_specs=(spec, spec),
            out_shape=(
                jax.ShapeDtypeStruct((b, n), dtype),
                jax.ShapeDtypeStruct((b, n), dtype),
            ),
            input_output_aliases={0: 0, 1: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
            ),
        )(re, im)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ns", type=int, nargs="*", default=[4096, 8192, 16384])
    args = ap.parse_args()

    import jax.numpy as jnp

    import tensorfft_tpu as tfft
    from tensorfft_tpu.fft import _fft_split_jit, stage_scales
    from tensorfft_tpu.ops import four_step_pallas, fused_pallas
    from tensorfft_tpu.testing.timer import chain_measure

    rng = np.random.default_rng(0)
    for n in args.ns:
        plan = tfft.create_plan(n, precision="bfloat16", tuning="auto",
                                batch_hint=args.batch)
        b = args.batch
        re = jnp.asarray(rng.standard_normal((b, n)), jnp.bfloat16)
        im = jnp.asarray(rng.standard_normal((b, n)), jnp.bfloat16)
        re_t = jnp.asarray(np.asarray(re, np.float32).T, jnp.bfloat16)
        im_t = jnp.asarray(np.asarray(im, np.float32).T, jnp.bfloat16)
        scales = stage_scales(plan.radices, plan.scaling, True)
        kw = dict(radices=plan.radices, scales=scales,
                  algorithm=plan.precision.dot_algorithm, grouped=plan.grouped,
                  complex_mult=plan.complex_mult)

        variants = {
            "public": ((re, im),
                       lambda x, y: _fft_split_jit(x, y, plan, True)),
            "kernel": ((re_t, im_t),
                       lambda x, y: fused_pallas.fused_fft(
                           x, y, lane_tile=plan.lane_tile,
                           state_dtype=plan.state_dtype,
                           kloop_width=plan.kloop_width, **kw)),
            "batchmaj": ((re, im),
                         lambda x, y: four_step_pallas.fused_fft_batch_major(
                             x, y, state_dtype=plan.state_dtype, **kw)),
            "bm_bf16": ((re, im),
                        lambda x, y: four_step_pallas.fused_fft_batch_major(
                            x, y, state_dtype="bfloat16", **kw)),
            "floor": ((re, im), _floor_kernel(b, n, re.dtype)),
        }
        row = {"n": n, "batch": b, "radices": list(plan.radices)}
        for name, (data, fn) in variants.items():
            try:
                r = chain_measure(fn, data)
                row[name + "_us"] = round(r.average_time_ns / 1e3, 1)
                row[name + "_sigma_us"] = round(r.std_deviation_ns / 1e3, 1)
            except Exception as e:
                row[name + "_us"] = None
                row[name + "_err"] = repr(e)[:120]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
