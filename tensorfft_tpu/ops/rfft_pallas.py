"""Pallas epilogue kernels for the R2C/C2R path (BASELINE config 4).

The reference is C2C-only; R2C/C2R is this repo's config-4 extension built on
the classic half-length packing (rfft.py).  Round-3 hardware measurement
(results/RESULTS.md S10/S11) attributed 94% roundtrip overhead at N=2^20 to
XLA *materialized structural ops*: the (B, M, 2) stack/reshape pack costs
~2.9 ms and the roll/flip/concat untangle ~3.6 ms — each 5-10x over its HBM
floor — and both "layout-friendly" XLA rewrites (static strided lane slices,
``lax.pad`` interior dilation) wedge the axon backend mid-compile.  The fix,
queued there and implemented here, is to do pack and untangle inside Pallas
kernels where every structural movement is either a constant permutation
matmul on the (otherwise idle) MXU or a DMA-blocked store:

  * pack:       (B, 2M) real -> even/odd planes (B, M).  Lane deinterleave
                via two (2L, L) 0/1 selection matrices per lane tile.
  * untangle:   half-length spectrum Z (B, M) -> R2C spectrum X (B, M+1).
                The spectral reversal V[k] = conj(Z[(M-k) mod M]) is resolved
                per output lane block j from three block streams of Z —
                block j (U), block (Mb-j) % Mb (contributes lane 0 of V) and
                block (Mb-j-1) % Mb (contributes lanes 1..L-1, reversed) —
                so the lane flip is one constant (L, L) exchange-with-shift
                matmul and the lane-0 injection one one-hot matmul; no roll,
                no gather, no concat.  The Nyquist bin M is a closed form of
                Z[0] written by the final (partial) grid block.
  * retangle:   X (B, M+1) -> Z (B, M), the inverse pairing (same three-
                stream structure; the reversal reads X[M - jL - l], reaching
                the partial block M/L only through its lane 0).
  * interleave: even/odd planes (B, M) -> (B, 2M) real (transpose of pack).

Permutation matmuls are EXACT: bf16 operands pass through the MXU unrounded
(0/1 matrix, one nonzero per column, fp32 accumulate), and fp32 operands use
the 3-term bitmask split (ops/dots.split_bf16 — 8+8+8 mantissa bits covers
fp32's 24), each term again exact under the 0/1 matrix.  Upcasts commute
with permutations, so results are bit-identical to the plain-XLA
formulations in rfft.py, which remain the fallback for tiny shapes and
non-TPU backends.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorfft_tpu.ops import dots
from tensorfft_tpu.utils.device import KERNEL_VMEM_LIMIT_BYTES

__all__ = ["pack_split", "interleave_split", "untangle_fwd", "retangle_inv",
           "epilogue_supported"]


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def epilogue_supported(m: int, lane_tile: int = 512) -> bool:
    """Whether the Pallas epilogue kernels can handle half-length ``m``."""
    lt = min(lane_tile, m)
    return m >= 128 and m % lt == 0


def _permute_dot(x, p):
    """x @ p for a 0/1 permutation-like matrix p — exact in x's values.

    bf16 x: one MXU pass (bf16 operands are consumed unrounded, fp32
    accumulate).  fp32 x: 4-term bitmask split of the DATA side (each mask
    step clears the residual's top 7 explicit mantissa bits exactly, so four
    terms cover fp32's 24-bit significand; the matrix side is exact in
    bf16), partial products summed in fp32 — each partial permutes one exact
    term, so the sum reconstructs the fp32 value bit-exactly.
    """
    pb = p.astype(jnp.bfloat16)
    if x.dtype == jnp.bfloat16:
        return jax.lax.dot(x, pb, preferred_element_type=jnp.float32)
    parts = dots.split_bf16(x.astype(jnp.float32), 4)
    out = jax.lax.dot(parts[0], pb, preferred_element_type=jnp.float32)
    for t in parts[1:]:
        out = out + jax.lax.dot(t, pb, preferred_element_type=jnp.float32)
    return out


@functools.lru_cache(maxsize=None)
def _even_odd_tables(lt: int):
    """(2L, L) selection matrices: P_e picks even lanes, P_o odd lanes."""
    pe = np.zeros((2 * lt, lt), np.float32)
    po = np.zeros((2 * lt, lt), np.float32)
    idx = np.arange(lt)
    pe[2 * idx, idx] = 1.0
    po[2 * idx + 1, idx] = 1.0
    return pe, po


@functools.lru_cache(maxsize=None)
def _rev_tables(lt: int):
    """(L, L) matrices for the shifted lane reversal (see module docstring).

    JP[L - l, l] = 1 for l = 1..L-1 (column 0 empty): B_blk @ JP places
    B_blk[:, L - l] at lane l.  E[0, 0] = 1: A_blk @ E places A_blk[:, 0]
    at lane 0.  Their sum is the reversed stream V for one output block.
    """
    jp = np.zeros((lt, lt), np.float32)
    l = np.arange(1, lt)
    jp[lt - l, l] = 1.0
    e = np.zeros((lt, lt), np.float32)
    e[0, 0] = 1.0
    return jp, e


def _batch_pad(arrs, dtype):
    """Pad leading (batch) dim to the Mosaic sublane multiple."""
    b = arrs[0].shape[0]
    mult = 16 if jnp.dtype(dtype) == jnp.bfloat16 else 8
    pad = (-b) % mult
    if pad:
        arrs = [jnp.pad(a, ((0, pad), (0, 0))) for a in arrs]
    return arrs, b, b + pad


def _batch_tile(b_padded: int) -> int:
    bt = b_padded
    while bt > 256 and bt % 2 == 0:
        bt //= 2
    return bt


def _table_spec(a):
    return pl.BlockSpec(a.shape, lambda i, j, nd=a.ndim: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _pack_kernel(x_ref, pe_ref, po_ref, re_ref, im_ref):
    x = x_ref[:]
    re_ref[:] = _permute_dot(x, pe_ref[:]).astype(re_ref.dtype)
    im_ref[:] = _permute_dot(x, po_ref[:]).astype(im_ref.dtype)


@functools.partial(jax.jit, static_argnames=("lane_tile", "interpret"))
def pack_split(x, *, lane_tile: int = 512, interpret: bool | None = None
               ) -> Tuple[jax.Array, jax.Array]:
    """(B, 2M) real -> even/odd planes (B, M), each in x's dtype.

    Kernel replacement for rfft._deinterleave (measured ~2.9 ms of XLA
    stack/reshape at N=2^20/b=16 vs a ~0.1 ms HBM floor).
    """
    if interpret is None:
        interpret = _interpret_default()
    b0, n = x.shape
    m = n // 2
    lt = min(lane_tile, m)
    (x,), b0, b = _batch_pad([x], x.dtype)
    bt = _batch_tile(b)
    pe, po = _even_odd_tables(lt)
    tables = [jnp.asarray(pe), jnp.asarray(po)]
    grid = (b // bt, m // lt)
    out_spec = pl.BlockSpec((bt, lt), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    re, im = pl.pallas_call(
        _pack_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bt, 2 * lt), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)]
        + [_table_spec(a) for a in tables],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((b, m), x.dtype),
                   jax.ShapeDtypeStruct((b, m), x.dtype)),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * m * lt,
            bytes_accessed=4 * b * m * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, *tables)
    if b != b0:
        re, im = re[:b0], im[:b0]
    return re, im


def _interleave_kernel(re_ref, im_ref, te_ref, to_ref, x_ref):
    x_ref[:] = (_permute_dot(re_ref[:], te_ref[:])
                + _permute_dot(im_ref[:], to_ref[:])).astype(x_ref.dtype)


@functools.partial(jax.jit, static_argnames=("lane_tile", "interpret"))
def interleave_split(re, im, *, lane_tile: int = 512,
                     interpret: bool | None = None) -> jax.Array:
    """Even/odd planes (B, M) -> (B, 2M) real; transpose of pack_split."""
    if interpret is None:
        interpret = _interpret_default()
    b0, m = re.shape
    lt = min(lane_tile, m)
    (re, im), b0, b = _batch_pad([re, im], re.dtype)
    bt = _batch_tile(b)
    pe, po = _even_odd_tables(lt)
    tables = [jnp.asarray(pe.T.copy()), jnp.asarray(po.T.copy())]
    grid = (b // bt, m // lt)
    in_spec = pl.BlockSpec((bt, lt), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    x = pl.pallas_call(
        _interleave_kernel,
        grid=grid,
        in_specs=[in_spec, in_spec] + [_table_spec(a) for a in tables],
        out_specs=pl.BlockSpec((bt, 2 * lt), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2 * m), re.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * m * lt,
            bytes_accessed=4 * b * m * re.dtype.itemsize,
            transcendentals=0,
        ),
    )(re, im, *tables)
    return x[:b0] if b != b0 else x


def _untangle_kernel(u_re_ref, u_im_ref, a_re_ref, a_im_ref,
                     b_re_ref, b_im_ref, w_re_ref, w_im_ref,
                     jp_ref, e_ref, o_re_ref, o_im_ref, *, mb, scale):
    j = pl.program_id(1)
    # Reversed stream V[k] = conj(Z[(M-k) mod M]) for this block's lanes
    # (exact permutes on the storage values, then upcast — commutes).
    v_re = (_permute_dot(b_re_ref[:], jp_ref[:])
            + _permute_dot(a_re_ref[:], e_ref[:]))
    v_im = -(_permute_dot(b_im_ref[:], jp_ref[:])
             + _permute_dot(a_im_ref[:], e_ref[:]))
    u_re = u_re_ref[:].astype(jnp.float32)
    u_im = u_im_ref[:].astype(jnp.float32)
    w_re = w_re_ref[:]
    w_im = w_im_ref[:]
    a_re, a_im = u_re + v_re, u_im + v_im          # U + V
    b_re, b_im = u_re - v_re, u_im - v_im          # U - V
    # -i * w * b
    c_re = w_re * b_im + w_im * b_re
    c_im = -(w_re * b_re - w_im * b_im)
    out_re = (a_re + c_re) * scale
    out_im = (a_im + c_im) * scale
    # Final (partial) block: bin M = 2*scale*(Re Z0 - Im Z0) in lane 0.
    # Its A stream is block (mb - mb) % mb = 0, so A[:, 0] = Z[:, 0].
    nyq = 2.0 * scale * (a_re_ref[:, 0:1].astype(jnp.float32)
                         - a_im_ref[:, 0:1].astype(jnp.float32))
    lane0 = jax.lax.broadcasted_iota(jnp.int32, out_re.shape, 1) == 0
    is_last = j == mb
    out_re = jnp.where(is_last, jnp.where(lane0, nyq, 0.0), out_re)
    out_im = jnp.where(is_last, 0.0, out_im)
    o_re_ref[:] = out_re.astype(o_re_ref.dtype)
    o_im_ref[:] = out_im.astype(o_im_ref.dtype)


def _pack_phase_tables(n: int, sign: int, lt: int, blocks: int):
    """fp32 cos/sin of sign*2*pi*k/n, padded to ``blocks`` lane blocks."""
    k = np.arange(blocks * lt, dtype=np.float64)
    phase = sign * 2.0 * np.pi * k / n
    return (jnp.asarray(np.cos(phase)[None], jnp.float32),
            jnp.asarray(np.sin(phase)[None], jnp.float32))


@functools.partial(jax.jit,
                   static_argnames=("n", "scale", "lane_tile", "interpret"))
def untangle_fwd(z_re, z_im, *, n: int, scale: float, lane_tile: int = 512,
                 interpret: bool | None = None
                 ) -> Tuple[jax.Array, jax.Array]:
    """Half-length spectrum Z (B, M) -> R2C spectrum X (B, M+1).

    Kernel replacement for rfft._untangle_fwd (measured ~3.6 ms of XLA
    roll/flip/concat at N=2^20/b=16 vs a ~0.2 ms HBM floor); outputs in Z's
    dtype, bit-identical to the XLA formulation.
    """
    if interpret is None:
        interpret = _interpret_default()
    b0, m = z_re.shape
    assert n == 2 * m
    lt = min(lane_tile, m)
    mb = m // lt
    (z_re, z_im), b0, b = _batch_pad([z_re, z_im], z_re.dtype)
    bt = _batch_tile(b)
    w_re, w_im = _pack_phase_tables(n, -1, lt, mb + 1)
    jp, e = _rev_tables(lt)
    tables = [jnp.asarray(jp), jnp.asarray(e)]

    grid = (b // bt, mb + 1)
    u_spec = pl.BlockSpec((bt, lt),
                          lambda i, j: (i, jnp.minimum(j, mb - 1)),
                          memory_space=pltpu.VMEM)
    a_spec = pl.BlockSpec((bt, lt), lambda i, j: (i, (mb - j) % mb),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((bt, lt), lambda i, j: (i, (mb - j - 1) % mb),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, lt), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bt, lt), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_untangle_kernel, mb=mb, scale=float(scale))
    o_re, o_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[u_spec, u_spec, a_spec, a_spec, b_spec, b_spec,
                  w_spec, w_spec] + [_table_spec(a) for a in tables],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((b, m + 1), z_re.dtype),
                   jax.ShapeDtypeStruct((b, m + 1), z_im.dtype)),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * m * lt,
            bytes_accessed=8 * b * m * z_re.dtype.itemsize,
            transcendentals=0,
        ),
    )(z_re, z_im, z_re, z_im, z_re, z_im, w_re, w_im, *tables)
    if b != b0:
        o_re, o_im = o_re[:b0], o_im[:b0]
    return o_re, o_im


def _retangle_kernel(u_re_ref, u_im_ref, a_re_ref, a_im_ref,
                     b_re_ref, b_im_ref, w_re_ref, w_im_ref,
                     jp_ref, e_ref, o_re_ref, o_im_ref, *, scale):
    # Reversed stream conj(X[M - jL - l]): lane 0 from block (mb - j)'s
    # lane 0 (block mb is the partial Nyquist block), lanes 1.. from block
    # (mb - j - 1) reversed.  The A block's lanes past 0 are unused — and at
    # block mb they are OUT OF BOUNDS (pad garbage, NaN in interpret mode),
    # which would poison the 0-weighted matmul columns (NaN * 0 = NaN) —
    # so they are select-masked to zero before the dot.
    a_lane0 = jax.lax.broadcasted_iota(jnp.int32, a_re_ref.shape, 1) == 0
    a_re = jnp.where(a_lane0, a_re_ref[:], 0).astype(a_re_ref.dtype)
    a_im = jnp.where(a_lane0, a_im_ref[:], 0).astype(a_im_ref.dtype)
    r_re = (_permute_dot(b_re_ref[:], jp_ref[:])
            + _permute_dot(a_re, e_ref[:]))
    r_im = -(_permute_dot(b_im_ref[:], jp_ref[:])
             + _permute_dot(a_im, e_ref[:]))
    x_re = u_re_ref[:].astype(jnp.float32)
    x_im = u_im_ref[:].astype(jnp.float32)
    w_re = w_re_ref[:]
    w_im = w_im_ref[:]
    a_re, a_im = x_re + r_re, x_im + r_im
    b_re, b_im = x_re - r_re, x_im - r_im
    # i * w * b
    c_re = -(w_re * b_im + w_im * b_re)
    c_im = w_re * b_re - w_im * b_im
    o_re_ref[:] = ((a_re + c_re) * scale).astype(o_re_ref.dtype)
    o_im_ref[:] = ((a_im + c_im) * scale).astype(o_im_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n", "scale", "out_dtype", "lane_tile",
                                    "interpret"))
def retangle_inv(re, im, *, n: int, scale: float, out_dtype,
                 lane_tile: int = 512, interpret: bool | None = None
                 ) -> Tuple[jax.Array, jax.Array]:
    """R2C spectrum X (B, M+1) -> half-length spectrum Z (B, M).

    Inverse pairing of untangle_fwd (rfft._retangle_inv), same three-stream
    block structure; the A stream's block mb read is the partial Nyquist
    block, consumed only through its lane 0.
    """
    if interpret is None:
        interpret = _interpret_default()
    b0, m_plus = re.shape
    m = m_plus - 1
    assert n == 2 * m
    lt = min(lane_tile, m)
    mb = m // lt
    (re, im), b0, b = _batch_pad([re, im], re.dtype)
    bt = _batch_tile(b)
    w_re, w_im = _pack_phase_tables(n, +1, lt, mb)
    jp, e = _rev_tables(lt)
    tables = [jnp.asarray(jp), jnp.asarray(e)]

    grid = (b // bt, mb)
    u_spec = pl.BlockSpec((bt, lt), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
    a_spec = pl.BlockSpec((bt, lt), lambda i, j: (i, mb - j),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((bt, lt), lambda i, j: (i, mb - j - 1),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, lt), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bt, lt), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_retangle_kernel, scale=float(scale))
    o_re, o_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[u_spec, u_spec, a_spec, a_spec, b_spec, b_spec,
                  w_spec, w_spec] + [_table_spec(a) for a in tables],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((b, m), jnp.dtype(out_dtype)),
                   jax.ShapeDtypeStruct((b, m), jnp.dtype(out_dtype))),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * m * lt,
            bytes_accessed=8 * b * m * re.dtype.itemsize,
            transcendentals=0,
        ),
    )(re, im, re, im, re, im, w_re, w_im, *tables)
    if b != b0:
        o_re, o_im = o_re[:b0], o_im[:b0]
    return o_re, o_im
