"""Decompose the fused kernel's time at the headline config.

Variants (all (N, B) transform-major, bf16 storage, chain_compare pairs):
  copy      — read block, cast fp32, cast back, write (DMA + cast floor)
  stage1    — first stage matmul only
  full      — the production fused_fft kernel
  full_par  — same but grid dim marked 'parallel' instead of 'arbitrary'
  full_noalias — without input_output_aliases

Prints one JSON line per A/B pair.
"""
import argparse
import functools
import json

import numpy as np

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import tensorfft_tpu as tfft
    from tensorfft_tpu.fft import stage_scales
    from tensorfft_tpu.ops import fused_pallas
    from tensorfft_tpu.testing.timer import chain_compare
    from tensorfft_tpu.utils.device import KERNEL_VMEM_LIMIT_BYTES

    n, b = args.n, args.batch
    plan = tfft.create_plan(n, precision="bfloat16", tuning="auto")
    radices = plan.radices
    scales = stage_scales(radices, plan.scaling, True)
    t = 128

    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((n, b)), jnp.bfloat16)
    im = jnp.asarray(rng.standard_normal((n, b)), jnp.bfloat16)

    data_spec = pl.BlockSpec((n, t), lambda i: (0, i), memory_space=pltpu.VMEM)

    def call(kernel, tables, semantics="arbitrary", alias=True):
        table_specs = [
            pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
            for a in tables
        ]
        f = pl.pallas_call(
            kernel,
            grid=(b // t,),
            in_specs=[data_spec, data_spec] + table_specs,
            out_specs=(data_spec, data_spec),
            out_shape=(
                jax.ShapeDtypeStruct((n, b), jnp.bfloat16),
                jax.ShapeDtypeStruct((n, b), jnp.bfloat16),
            ),
            input_output_aliases={0: 0, 1: 1} if alias else {},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
                dimension_semantics=(semantics,),
            ),
        )
        return jax.jit(lambda a, c: f(a, c, *tables))

    def copy_kernel(re_ref, im_ref, o_re, o_im):
        o_re[:] = re_ref[:].astype(jnp.float32).astype(o_re.dtype)
        o_im[:] = im_ref[:].astype(jnp.float32).astype(o_im.dtype)

    tables_full = fused_pallas.stage_table_arrays(
        radices, scales, -1, "bf16", plan.grouped)
    tables_s1 = fused_pallas.stage_table_arrays(
        (radices[0],), (scales[0],), -1, "bf16", False)

    def stage1_kernel(*refs):
        re_ref, im_ref = refs[0], refs[1]
        o_re, o_im = refs[-2], refs[-1]
        table_refs = refs[2:-2]
        state = jnp.stack([re_ref[:].astype(jnp.float32),
                           im_ref[:].astype(jnp.float32)])
        state, _ = fused_pallas.stage_loop(
            state, table_refs, (radices[0],), "bf16", n, t)
        o_re[:] = state[0].reshape(n, t).astype(o_re.dtype)
        o_im[:] = state[1].reshape(n, t).astype(o_im.dtype)

    def full_kernel(*refs):
        fused_pallas.fused_fft_kernel_body(refs, radices, "bf16",
                                           plan.grouped)

    variants = {
        "copy": call(copy_kernel, []),
        "stage1": call(stage1_kernel, tables_s1),
        "full": call(full_kernel, tables_full),
        "full_par": call(full_kernel, tables_full, semantics="parallel"),
        "full_noalias": call(full_kernel, tables_full, alias=False),
    }

    flops = 5.0 * n * float(np.log2(n)) * b
    base = variants["full"]
    for name, fn in variants.items():
        if name == "full":
            continue
        r_full, r_v = chain_compare(base, fn, (re, im))
        print(json.dumps({
            "pair": ["full", name],
            "full_us": round(r_full.average_time_ns / 1e3, 1),
            f"{name}_us": round(r_v.average_time_ns / 1e3, 1),
            "full_gflops": round(flops / r_full.average_time_ns, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
