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

Key MXU trick — block-complex matmul: where the reference issues 4 fp16 WMMA
mma_syncs per complex tile (TensorRadix16.cu:166-176), each stage here is ONE
real matmul with the 2R x 2R block matrix

    BD = [[D_re, -D_im],
          [D_im,  D_re]]      applied to stacked Z = [Z_re; Z_im].

At radix 64 the block matrix is exactly the 128x128 MXU tile, so M and K are
both fully utilized — 4x fewer padded MACs than issuing four R x R matmuls
(see plan.optimal_radices for the resulting radix cost model).

Grid: one program per lane tile of the batch.  DFT block matrices and twiddle
tables are precomputed kernel inputs pinned to block (0, 0) (resident in VMEM
across grid steps) — replacing the reference's per-element cosf/sinf
transcendentals in the hot loop (TensorRadix16.cu:104-145).
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

__all__ = ["fused_fft", "fused_fft_kernel_body", "block_dft_tables"]


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def block_dft_tables(
    radices: Sequence[int],
    scales: Sequence[float],
    sign: int,
    d_dtype=np.float32,
):
    """Per-stage (BD, W_re, W_im) numpy tables (W is None at stage 0).

    BD is the 2R x 2R block-complex DFT matrix with the stage's progressive
    scale folded in; W is the (R, prior_length) twiddle table in fp32.
    """
    tables = []
    k = 1
    for j, (r, s) in enumerate(zip(radices, scales)):
        d_re, d_im = dft.dft_matrix(r, dtype=np.float64, sign=sign, scale=s)
        bd = np.block([[d_re, -d_im], [d_im, d_re]]).astype(d_dtype)
        if j == 0:
            w_re = w_im = None
        else:
            w_re, w_im = dft.stage_twiddle(r, k, dtype=np.float32, sign=sign)
        tables.append((bd, w_re, w_im))
        k *= r
    return tables


# Stages whose accumulated sub-transform count K exceeds this fall back from
# the per-K-slice loop to one big matmul behind a sublane transpose (the loop
# unrolls K matmuls at trace time; past ~128 the code size outweighs the win).
_MAX_KLOOP = 128


def fused_fft_kernel_body(refs, radices: Sequence[int], algorithm: str):
    """Shared kernel body: refs = (re_ref, im_ref, *tables, out_re, out_im).

    State: stacked (2, K, M*T) fp32 — plane 0 RE, plane 1 IM.  Twiddles run in
    fp32 on the VPU; stage matmuls under ``algorithm`` (ops/dots.py) with fp32
    accumulation.

    Stage structure per radix R (K = transforms built so far):
      * K == 1 (first stage): Z = [re; im] read straight from the inputs —
        a pure reshape, no twiddle, one block matmul.
      * K <= _MAX_KLOOP: loop over the K sub-transform slices.  Each slice
        (2, R, M*T) has its (2, R) rows ADJACENT, so the block matmul needs
        no data movement; the twiddle column W[:, k] is applied per slice.
        This replaces the Stockham sublane transpose, which Mosaic lowers
        ~40% slower than K small matmuls (measured 745us vs 510us at
        N=4096, B=4096).
      * otherwise: twiddle on the unswapped view, one sublane swap, one
        matmul (the transpose-based formulation).
    """
    re_ref, im_ref = refs[0], refs[1]
    out_re_ref, out_im_ref = refs[-2], refs[-1]
    table_refs = refs[2:-2]

    n, t = re_ref.shape
    state = None  # lazily formed; stage 0 reads straight from the input refs

    ti = 0
    k = 1
    m = n
    for j, radix in enumerate(radices):
        m //= radix
        bd = table_refs[ti][:]
        ti += 1
        if j == 0:
            z2 = jnp.concatenate(
                [re_ref[:].reshape(radix, m * t), im_ref[:].reshape(radix, m * t)],
                axis=0,
            )
            out = dots.dot(bd, z2, algorithm)
            state = out.reshape(2, radix, m * t)
        elif k <= _MAX_KLOOP:
            w_re = table_refs[ti][:]
            w_im = table_refs[ti + 1][:]
            ti += 2
            zv = state.reshape(2, k, radix, m * t)
            outs = []
            for kk in range(k):
                sr = zv[0, kk]
                si = zv[1, kk]
                wr = w_re[:, kk][:, None]
                wi = w_im[:, kk][:, None]
                zk = jnp.concatenate([sr * wr - si * wi, sr * wi + si * wr], axis=0)
                outs.append(
                    dots.dot(bd, zk, algorithm).reshape(2, radix, m * t)
                )
            out = jnp.stack(outs, axis=2)  # (2, R, K, M*T)
            state = out.reshape(2, radix * k, m * t)
        else:
            w_re = table_refs[ti][:].T[None, :, :, None]  # (1, K, R, 1)
            w_im = table_refs[ti + 1][:].T[None, :, :, None]
            ti += 2
            zv = state.reshape(2, k, radix, m * t)
            zr, zi = zv[0], zv[1]
            tw = jnp.stack([zr * w_re[0] - zi * w_im[0],
                            zr * w_im[0] + zi * w_re[0]])
            z2 = tw.swapaxes(1, 2).reshape(2 * radix, k * m * t)
            out = dots.dot(bd, z2, algorithm)
            state = out.reshape(2, radix * k, m * t)
        k *= radix

    out_re_ref[:] = state[0].reshape(n, t).astype(out_re_ref.dtype)
    out_im_ref[:] = state[1].reshape(n, t).astype(out_im_ref.dtype)


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
    in-kernel compute is fp32 with ``algorithm`` matmul operands.
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

    # Block matrices are matmul operands: pre-round to bf16 for the plain-bf16
    # algorithm (saves an in-kernel cast); twiddles stay fp32 (VPU multiply).
    d_dtype = np.dtype("bfloat16") if algorithm == "bf16" else np.dtype("float32")
    tables = block_dft_tables(radices, scales, sign, d_dtype=np.float32)
    table_arrays = []
    for j, (bd, w_re, w_im) in enumerate(tables):
        table_arrays.append(jnp.asarray(bd, jnp.bfloat16 if algorithm == "bf16" else jnp.float32))
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
        # Aliasing the data inputs onto the outputs halves effective HBM
        # pressure (measured 501us -> 236us at N=4096, B=4096); XLA inserts
        # copies if the caller still needs the inputs, but inside the jitted
        # pipeline they are dead temporaries.
        input_output_aliases={0: 0, 1: 1},
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * sum(4 * max(2 * r, 128) ** 2 * (n // r) for r in radices)
            * b_padded // 4,
            bytes_accessed=2 * 2 * n * b_padded * re.dtype.itemsize,
            transcendentals=0,
        ),
    )(re, im, *table_arrays)

    if pad:
        out_re = out_re[:, :b]
        out_im = out_im[:, :b]
    return out_re, out_im
