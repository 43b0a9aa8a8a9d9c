"""Fused whole-transform Pallas TPU kernel.

TPU-native replacement for the reference's device kernels: where the reference
runs one WMMA base kernel (TensorFFT256.cu:20-306 / TensorFFT4096.cu:22-413)
plus log16(N)-2 separate TensorRadix16 launches each round-tripping all data
through global memory (ComputeFFT.h:89-120), this kernel holds an entire
(N, lane_tile) transform panel in VMEM and runs ALL Cooley-Tukey stages in one
pass — one HBM read and one HBM write per element, total.  The reference's
Mode_4096 three-stage fusion (cross-warp smem exchange, TensorFFT4096.cu:
296-359) is the same idea limited by 32 KiB of shared memory; VMEM is ~3
orders of magnitude larger, so fusion covers the whole transform for
N <= max_fused_length and the Bailey four-step composes two such passes for
anything bigger.

Grid: one program per lane tile of the batch.  Each program:
  load (N, T) RE/IM panels -> fp32 -> stage loop (sublane shuffle + twiddle
  VPU multiply + complex MXU matmul, see ops/stages_jax.py for the math) ->
  store (N, T).

DFT matrices and twiddle tables are precomputed fp32 kernel inputs pinned to
block (0, 0) (resident in VMEM across grid steps) — replacing the reference's
per-element cosf/sinf transcendentals in the hot loop
(TensorRadix16.cu:104-145).
"""
from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorfft_tpu import dft
from tensorfft_tpu.ops import dots
from tensorfft_tpu.ops.stages_jax import stage_tables

__all__ = ["fused_fft", "fused_fft_kernel_body"]


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def fused_fft_kernel_body(refs, radices: Sequence[int], algorithm: str):
    """Shared kernel body: refs = (re_ref, im_ref, *tables, out_re, out_im)."""
    re_ref, im_ref = refs[0], refs[1]
    out_re_ref, out_im_ref = refs[-2], refs[-1]
    table_refs = refs[2:-2]

    n, t = re_ref.shape
    re = re_ref[:].astype(jnp.float32)
    im = im_ref[:].astype(jnp.float32)

    ti = 0
    k = 1
    m = n
    for j, radix in enumerate(radices):
        m //= radix
        d_re = table_refs[ti][:]
        d_im = table_refs[ti + 1][:]
        ti += 2
        z_re = re.reshape(k, radix, m * t).swapaxes(0, 1)
        z_im = im.reshape(k, radix, m * t).swapaxes(0, 1)
        if j > 0:
            w_re = table_refs[ti][:][:, :, None]
            w_im = table_refs[ti + 1][:][:, :, None]
            ti += 2
            z_re, z_im = (
                z_re * w_re - z_im * w_im,
                z_re * w_im + z_im * w_re,
            )
        z_re = z_re.reshape(radix, k * m * t)
        z_im = z_im.reshape(radix, k * m * t)
        # 4-multiply complex matmul.  Karatsuba (3 matmuls) is a LOSS here:
        # its two extra full-panel VPU adds cost more than the saved matmul,
        # whose contraction dim (<=128) leaves the MXU underutilized anyway
        # (measured: 360us 4-mult vs 885us Karatsuba at N=4096, B=4096).
        re, im = (
            dots.dot(d_re, z_re, algorithm) - dots.dot(d_im, z_im, algorithm),
            dots.dot(d_re, z_im, algorithm) + dots.dot(d_im, z_re, algorithm),
        )
        k *= radix
        re = re.reshape(k, m * t)
        im = im.reshape(k, m * t)

    out_re_ref[:] = re.reshape(n, t).astype(out_re_ref.dtype)
    out_im_ref[:] = im.reshape(n, t).astype(out_im_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("radices", "scales", "sign", "lane_tile", "algorithm",
                     "interpret"),
)
def fused_fft(
    re,
    im,
    *,
    radices: Tuple[int, ...],
    scales: Tuple[float, ...],
    sign: int = dft.FORWARD,
    lane_tile: int = 128,
    algorithm: str = "bf16",
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Whole-transform FFT on transform-major (N, B) planes via one Pallas pass.

    Output dtype matches input dtype (storage rounding at the HBM boundary);
    all in-kernel compute is fp32 with ``algorithm`` matmul operands.
    """
    if interpret is None:
        interpret = _interpret_default()
    n, b = re.shape
    assert math.prod(radices) == n, (radices, n)

    t = int(lane_tile)
    pad = (-b) % t
    if pad:
        re = jnp.pad(re, ((0, 0), (0, pad)))
        im = jnp.pad(im, ((0, 0), (0, pad)))
    b_padded = b + pad
    grid = (b_padded // t,)

    tables = stage_tables(radices, scales, sign, dtype=np.float32)
    # DFT matrices are matmul operands: pre-round to bf16 for the plain-bf16
    # algorithm (saves the in-kernel cast); twiddles stay fp32 (VPU multiply).
    d_dtype = jnp.bfloat16 if algorithm == "bf16" else jnp.float32
    table_arrays = []
    for j, (d_re, d_im, _d_sum, w_re, w_im) in enumerate(tables):
        table_arrays += [
            jnp.asarray(d_re, d_dtype), jnp.asarray(d_im, d_dtype)
        ]
        if j > 0:
            table_arrays += [jnp.asarray(w_re), jnp.asarray(w_im)]

    data_spec = pl.BlockSpec((n, t), lambda i: (0, i), memory_space=pltpu.VMEM)
    table_specs = [
        pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)
        for a in table_arrays
    ]

    kernel = lambda *refs: fused_fft_kernel_body(refs, radices, algorithm)

    out_re, out_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[data_spec, data_spec] + table_specs,
        out_specs=(data_spec, data_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n, b_padded), re.dtype),
            jax.ShapeDtypeStruct((n, b_padded), im.dtype),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * n * sum(radices) * (b_padded // t) * t,
            bytes_accessed=2 * 2 * n * b_padded * re.dtype.itemsize,
            transcendentals=0,
        ),
    )(re, im, *table_arrays)

    if pad:
        out_re = out_re[:, :b]
        out_im = out_im[:, :b]
    return out_re, out_im
