"""Pipeline/scheduling variants of the fused kernel at the headline configs.

The decomposition experiment (exp_decompose_fused.py) showed the fused kernel
runs at 2.0-2.6x its own aliased copy floor with the HBM side healthy, i.e.
the gap is in-kernel compute/VMEM scheduling.  This measures the knobs that
change scheduling without changing the math:

  incumbent — the tuned config as dispatched
  parallel  — dimension_semantics=("parallel",) instead of "arbitrary"
  noalias   — drop input_output_aliases (separate out buffers)
  bf16state — state_dtype=bfloat16 (halves inter-stage VMEM traffic)
  kw256     — kloop_width=256 (pack 2 twiddled slices per stage matmul)

All chain_measure with calibrated spans (CV < 2%).
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ns", type=int, nargs="*", default=[4096, 16384])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import tensorfft_tpu as tfft
    from tensorfft_tpu.fft import stage_scales
    from tensorfft_tpu.ops import fused_pallas
    from tensorfft_tpu.ops.fused_pallas import (
        fused_fft_kernel_body, stage_table_arrays,
    )
    from tensorfft_tpu.testing.timer import chain_measure
    from tensorfft_tpu.utils.device import KERNEL_VMEM_LIMIT_BYTES

    def custom_fused(plan, scales, *, semantics="arbitrary", alias=True,
                     state_dtype=None, kloop_width=None):
        n = plan.fft_length
        t = plan.lane_tile
        sd = jnp.dtype(state_dtype or plan.state_dtype)
        kw = kloop_width or plan.kloop_width
        tables = stage_table_arrays(plan.radices, scales, -1,
                                    plan.precision.dot_algorithm, plan.grouped)
        data_spec = pl.BlockSpec((n, t), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
        table_specs = [
            pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
            for a in tables
        ]
        kernel = lambda *refs: fused_fft_kernel_body(
            refs, plan.radices, plan.precision.dot_algorithm, plan.grouped,
            state_dtype=sd, kloop_width=kw, complex_mult=plan.complex_mult)

        @jax.jit
        def run(re, im):
            b = re.shape[1]
            return pl.pallas_call(
                kernel,
                grid=(b // t,),
                in_specs=[data_spec, data_spec] + table_specs,
                out_specs=(data_spec, data_spec),
                out_shape=(
                    jax.ShapeDtypeStruct(re.shape, re.dtype),
                    jax.ShapeDtypeStruct(im.shape, im.dtype),
                ),
                input_output_aliases={0: 0, 1: 1} if alias else {},
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
                    dimension_semantics=(semantics,),
                ),
            )(re, im, *tables)

        return run

    rng = np.random.default_rng(0)
    for n in args.ns:
        plan = tfft.create_plan(n, precision="bfloat16", tuning="auto",
                                batch_hint=args.batch)
        scales = stage_scales(plan.radices, plan.scaling, True)
        b = args.batch
        re = jnp.asarray(rng.standard_normal((n, b)), jnp.bfloat16)
        im = jnp.asarray(rng.standard_normal((n, b)), jnp.bfloat16)

        variants = {
            "incumbent": custom_fused(plan, scales),
            "parallel": custom_fused(plan, scales, semantics="parallel"),
            "noalias": custom_fused(plan, scales, alias=False),
            "bf16state": custom_fused(plan, scales, state_dtype="bfloat16"),
            "kw256": custom_fused(plan, scales, kloop_width=256),
        }
        row = {"n": n, "batch": b, "radices": list(plan.radices),
               "state_dtype": plan.state_dtype,
               "kloop_width": plan.kloop_width}
        for name, fn in variants.items():
            try:
                r = chain_measure(fn, (re, im))
                row[name + "_us"] = round(r.average_time_ns / 1e3, 1)
                row[name + "_sigma_us"] = round(r.std_deviation_ns / 1e3, 1)
            except Exception as e:
                row[name + "_us"] = None
                row[name + "_err"] = repr(e)[:120]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
