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
from tensorfft_tpu.utils.device import KERNEL_VMEM_LIMIT_BYTES

__all__ = ["fused_fft", "fused_fft_kernel_body", "block_dft_tables",
           "planar_stage_tables", "stage_loop_planar"]


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

# Target lane width of one kloop stage matmul: twiddled slices can be packed
# along the lane dim until the matmul is this wide (see stage_loop).  Measured
# v5e (chain_compare, b=4096): widening to 512 LOSES 7-14% at N=8192/16384
# and gains only 3% at N=4096 — the lane concatenations cost more than the
# narrow (128-lane) matmuls do — so the default keeps g=1; the plan knob
# kloop_width remains for per-length tuning.
_KLOOP_WIDTH = 128


def _stage_kinds(radices, grouped: bool):
    """Static per-stage dispatch shared by table builders and kernel bodies.

    Yields (kind, radix, k, p): kind in {'first', 'grouped', 'kloop', 'big'},
    k = sub-transforms accumulated before the stage, p = slices packed per
    block-diagonal matmul (grouped only).

    'grouped' packs p = 128/(2R) sub-transform slices into ONE matmul with a
    constant block-diagonal matrix: the MXU streams one input column per
    cycle regardless of its height, so a (2R, 2R) @ (2R, C) matmul with
    2R < 128 wastes (1 - 2R/128) of the array — packing cuts a radix-8
    stage's MXU cycles 8x.  The stage twiddle (diagonal) and the output-row
    reorder (a permutation) fold into the same constant matrix, eliminating
    the per-slice VPU twiddle multiplies as a bonus.

    For radix >= 64 the packing degenerates to p = 1, but the FOLD still
    pays: each slice's twiddle-times-DFT product becomes one per-slice
    constant matrix G_kk = BD @ W_kk, so the kloop's VPU twiddle multiplies
    and wide_re/wide_im/concat intermediates disappear entirely.  The MXU
    streams weights through the systolic array per matmul either way, so
    per-slice constants cost the same MXU time as the shared BD; the price
    is the resident table, k * (2pR)^2 / p entries — worst case among the
    tuner's candidates is N=16384 radices (64, 256): 64 * 512^2 = 16.7M
    entries (33.5 MiB bf16).  Grouping is gated at 2^24 entries so larger
    combinations fall back to the kloop instead of relying on a Mosaic
    VMEM-exhaustion failure to knock them out of the sweep.
    """
    k = 1
    for radix in radices:
        p = max(1, 128 // (2 * radix))
        p = min(p, k)
        if k == 1:
            yield ("first", radix, k, 1)
        elif (grouped and k % p == 0 and (k // p) <= _MAX_KLOOP
              and (p >= 2 or radix >= 64)
              and 4 * k * p * radix * radix <= (1 << 24)):
            yield ("grouped", radix, k, p)
        elif k <= _MAX_KLOOP:
            yield ("kloop", radix, k, 1)
        else:
            yield ("big", radix, k, 1)
        k *= radix


def stage_table_bytes(radices, grouped: bool, algorithm: str,
                      engine: str = "stacked", complex_mult: str = "block",
                      first_dot: str = "default") -> int:
    """Resident bytes of one kernel's stage tables, without materializing.

    Mirrors stage_table_arrays / planar_stage_tables entry-for-entry so
    plan_works_on_device can budget the twiddle-fold tables alongside the
    data planes (round-4 verdict: the grouped (64,256) float32 fold table
    is ~67 MiB ALONE and must be rejected before compilation instead of
    relying on a Mosaic VMEM-exhaustion failure).  Matmul tables are bf16
    only under the plain 'bf16' algorithm (split-compensated policies keep
    fp32 originals); VPU twiddle planes are always fp32.
    """
    d_bytes = 2 if algorithm == "bf16" else 4
    total = 0
    if engine in ("planar", "planar_vpu"):
        fold = engine == "planar"
        k = 1
        for r in radices:
            stage_fold = fold and k > 1 and k <= _MAX_KLOOP
            db = 4 if (k == 1 and first_dot != "default") else d_bytes
            total += (k if stage_fold else 1) * 2 * r * r * db
            if k > 1 and not stage_fold:
                total += 2 * r * k * 4  # fp32 (R, K) twiddle planes
            k *= r
        return total
    for kind, radix, k, p in _stage_kinds(radices, grouped):
        if kind == "grouped":
            if _grouped_mult3(kind, radix, p, complex_mult):
                total += k * 3 * radix * radix * d_bytes
            else:
                total += (k // p) * (2 * p * radix) ** 2 * d_bytes
            continue
        db = 4 if (kind == "first" and first_dot != "default") else d_bytes
        total += (2 * radix) ** 2 * db
        if kind != "first":
            total += 2 * radix * k * 4  # fp32 (R, K) twiddle planes
    return total


def _grouped_mult3(kind: str, radix: int, p: int, complex_mult: str) -> bool:
    """Whether a grouped stage runs as three real matmuls (Gauss trick).

    Only p == 1 twiddle-folds qualify: packed groups (radix <= 32) have
    p*radix = 64, below the 128-wide MXU contraction pad, so three padded
    matmuls cost MORE than the one exact 128x128 block matmul.  At p == 1,
    radix >= 128, the trick cuts the stage's padded MACs 25% — exactly the
    regime where the grouped radix-256 stage is MXU-bound (the N=16384
    headline: stage-2 block matmuls ~700 us of the 829 us HBM floor).
    """
    return (kind == "grouped" and complex_mult == "mult3"
            and p == 1 and radix >= 128)


@functools.lru_cache(maxsize=None)
def _grouped_g3_table(radix: int, k: int, scale: float, sign: int):
    """(k, 3R, R) twiddle-folded mult3 stage tables (p == 1 grouped stages).

    Slice kk stacks [Re(M_kk); Im(M_kk); Re(M_kk)+Im(M_kk)] for the folded
    complex matrix M_kk[r_o, r_i] = D[r_o, r_i] * W[r_i, kk] — the three
    operand matrices of the Gauss 3-multiplication complex product
    (see _mult3).  vs the (k, 2R, 2R) block table this is 25% fewer MACs
    AND 25% less resident table (3R*R vs 4R*R entries per slice); the sum
    plane is built in fp64 before the storage rounding.
    """
    d_re, d_im = dft.dft_matrix(radix, dtype=np.float64, sign=sign,
                                scale=scale)
    d_cplx = d_re + 1j * d_im
    w_re, w_im = dft.stage_twiddle(radix, k, dtype=np.float64, sign=sign)
    w_cplx = w_re + 1j * w_im  # (R, K); column kk scales input digit r_i
    out = np.empty((k, 3 * radix, radix), dtype=np.float64)
    for kk in range(k):
        m = d_cplx * w_cplx[None, :, kk]
        out[kk, :radix] = m.real
        out[kk, radix:2 * radix] = m.imag
        out[kk, 2 * radix:] = m.real + m.imag
    return out.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _grouped_g_table(radix: int, k: int, p: int, scale: float, sign: int):
    """(k//p, 2pR, 2pR) fp64->fp32 block-diagonal twiddle-folded stage matrices.

    Group g packs slices kk = g*p .. g*p+p-1.  Input rows are ordered
    (complex, kk, r) — exactly the contiguous layout of state[:, g*p:(g+1)*p]
    — and output rows are PRE-PERMUTED to (complex, r_out, kk) so that
    stacking groups along a new axis and flattening yields the next stage's
    required row order r*K + kk with no data movement.
    """
    d_re, d_im = dft.dft_matrix(radix, dtype=np.float64, sign=sign, scale=scale)
    d_cplx = d_re + 1j * d_im
    w_re, w_im = dft.stage_twiddle(radix, k, dtype=np.float64, sign=sign)
    w_cplx = w_re + 1j * w_im  # (R, K); column kk scales input digit r
    pr = p * radix
    out = np.zeros((k // p, 2 * pr, 2 * pr), dtype=np.float64)
    r_ids = np.arange(radix)
    for g in range(k // p):
        for kk in range(p):
            m = d_cplx * w_cplx[None, :, g * p + kk]  # M[r_o, r_i]
            rows = r_ids * p + kk          # permuted out rows (r_o, kk)
            cols = kk * radix + r_ids      # in cols (kk, r_i)
            for co, ci, blk in ((0, 0, m.real), (0, 1, -m.imag),
                                (1, 0, m.imag), (1, 1, m.real)):
                out[g][np.ix_(co * pr + rows, ci * pr + cols)] = blk
    return out.astype(np.float32)


def epilogue_twiddle_tables(radices, sign):
    """Per-stage epilogue twiddle tables for pretwiddle mode.

    Stage s's output rows are the NEXT stage's (kk, j)-indexed input: row
    kk = r_s*K_s + kk_s, lane-group j = the next stage's input digit.  The
    next stage's twiddle W[j, kk] therefore applies to stage s's output as
    ONE broadcast elementwise multiply on the contiguous (rows, R_next,
    m*t) view — measured ~600 us cheaper at N=16384/b=4096 than the same
    multiplies issued per-slice inside the next stage's kloop (the
    round-3 stage-breakdown finding: the per-slice twiddle pass, not the
    matmuls, dominated the in-kernel gap).

    Returns [(T_re, T_im) or None per stage]: T has shape (K_next, R_next)
    = W.T; None for the last stage (no next twiddle).
    """
    out = []
    k = 1
    for i, radix in enumerate(radices):
        k *= radix
        if i + 1 < len(radices):
            w_re, w_im = dft.stage_twiddle(radices[i + 1], k,
                                           dtype=np.float32, sign=sign)
            out.append((w_re.T.copy(), w_im.T.copy()))
        else:
            out.append(None)
    return out


def stage_table_arrays(radices, scales, sign, algorithm, grouped: bool,
                       first_dot: str = "default",
                       pretwiddle: bool = False,
                       complex_mult: str = "block"):
    """The jnp table operands for one kernel, in stage_loop consumption order.

    Matmul operands (BD / grouped G) are pre-rounded to bf16 under the plain
    'bf16' algorithm (split algorithms need the fp32 originals); twiddle
    tables stay fp32 (VPU multiply).  A compensated ``first_dot`` keeps the
    FIRST stage's matrix fp32 so the kernel can split it (ops/dots.py
    'bf16ax2').  ``complex_mult='mult3'`` swaps qualifying grouped stages'
    block tables for the (k, 3R, R) mult3 fold (_grouped_mult3) — the gate
    here must match stage_loop's consumption exactly.
    """
    d_dtype = jnp.bfloat16 if algorithm == "bf16" else jnp.float32
    arrays = []
    plain = block_dft_tables(radices, scales, sign, d_dtype=np.float64)
    epi = epilogue_twiddle_tables(radices, sign) if pretwiddle else None
    for i, ((kind, radix, k, p), (bd, w_re, w_im), scale) in enumerate(zip(
        _stage_kinds(radices, grouped and not pretwiddle), plain, scales
    )):
        if kind == "grouped":
            if _grouped_mult3(kind, radix, p, complex_mult):
                arrays.append(
                    jnp.asarray(_grouped_g3_table(radix, k, float(scale),
                                                  sign), d_dtype))
                continue
            arrays.append(
                jnp.asarray(_grouped_g_table(radix, k, p, float(scale), sign),
                            d_dtype)
            )
            continue
        dt = (jnp.float32 if (kind == "first" and first_dot != "default")
              else d_dtype)
        arrays.append(jnp.asarray(bd, dt))
        if kind != "first" and not pretwiddle:
            arrays += [jnp.asarray(w_re), jnp.asarray(w_im)]
        if pretwiddle and epi[i] is not None:
            arrays += [jnp.asarray(epi[i][0]), jnp.asarray(epi[i][1])]
    return arrays


@functools.lru_cache(maxsize=None)
def _planar_a_table(radix: int, k: int, scale: float, sign: int, fold: bool):
    """(K, 2R, R) twiddle-folded stage matrices for the planar engine.

    Slice kk holds A_kk = [[Re(M_kk)], [Im(M_kk)]] with
    M_kk[r_o, r_i] = D[r_o, r_i] * W[r_i, kk] — the same twiddle-into-DFT
    fold as _grouped_g_table but in SEPARATE-PLANE form: one A_kk @ re and
    one A_kk @ im matmul yield all four real products (U = [D_re@re;
    D_im@re], V likewise), combined by two VPU ops.  With fold=False the
    table is the shared (1, 2R, R) un-twiddled [D_re; D_im].
    """
    d_re, d_im = dft.dft_matrix(radix, dtype=np.float64, sign=sign,
                                scale=scale)
    d_cplx = d_re + 1j * d_im
    if not fold or k == 1:
        return np.concatenate([d_re, d_im], axis=0)[None].astype(np.float64)
    w_re, w_im = dft.stage_twiddle(radix, k, dtype=np.float64, sign=sign)
    w_cplx = w_re + 1j * w_im  # (R, K); column kk scales input digit r_i
    out = np.empty((k, 2 * radix, radix), dtype=np.float64)
    for kk in range(k):
        m = d_cplx * w_cplx[None, :, kk]
        out[kk, :radix] = m.real
        out[kk, radix:] = m.imag
    return out


def planar_stage_tables(radices, scales, sign, algorithm, fold: bool = True,
                        first_dot: str = "default"):
    """jnp table operands for the planar engine, in consumption order.

    Per stage: the (K, 2R, R) A table; with fold=False, later stages
    additionally carry the fp32 (R, K) twiddle planes for the VPU multiply.
    A compensated ``first_dot`` keeps stage 0's table fp32 for the in-kernel
    matrix split.
    """
    d_dtype = jnp.bfloat16 if algorithm == "bf16" else jnp.float32
    arrays = []
    k = 1
    for radix, scale in zip(radices, scales):
        stage_fold = fold and k > 1 and k <= _MAX_KLOOP
        dt = (jnp.float32 if (k == 1 and first_dot != "default")
              else d_dtype)
        arrays.append(jnp.asarray(
            _planar_a_table(radix, k, float(scale), sign, stage_fold), dt
        ))
        if k > 1 and not stage_fold:
            w_re, w_im = dft.stage_twiddle(radix, k, dtype=np.float32,
                                           sign=sign)
            arrays += [jnp.asarray(w_re), jnp.asarray(w_im)]
        k *= radix
    return arrays


def stage_loop_planar(state_re, state_im, table_refs, radices, algorithm,
                      n, t, ti=0, fold: bool = True,
                      state_dtype=jnp.float32, first_dot: str = "default"):
    """Planar stage engine: re/im stay SEPARATE (N, T)-shaped planes.

    The stacked engine (stage_loop) pays, per stage, an entry stack, a
    per-slice re/im gather into the (2R, cols) block operand, and (kloop) a
    cast+twiddle VPU pass with fp32 intermediates.  Here each slice runs two
    matmuls against the merged [D_re; D_im] (or twiddle-folded A_kk)
    constant — U = A@re, V = A@im — and two VPU combines (U[:R] - V[R:],
    U[R:] + V[:R]); no stacked-state reshapes, no concatenations, no
    separate twiddle pass when folded.  MAC count equals the block form for
    R >= 128 (the first stage pads K = R up to the 128-lane MXU).

    Returns (state_re, state_im, ti).
    """
    sd = state_dtype
    m = n
    k = 1
    for radix in radices:
        m //= radix
        stage_fold = fold and k > 1 and k <= _MAX_KLOOP
        if k == 1:
            alg0 = (first_dot
                    if (first_dot != "default" and algorithm == "bf16")
                    else algorithm)
            a = table_refs[ti][0]
            ti += 1
            u = dots.dot(a, state_re.reshape(radix, m * t), alg0)
            v = dots.dot(a, state_im.reshape(radix, m * t), alg0)
            state_re = (u[:radix] - v[radix:]).astype(sd)
            state_im = (u[radix:] + v[:radix]).astype(sd)
        elif k <= _MAX_KLOOP:
            a_tab = table_refs[ti]
            if stage_fold:
                ti += 1
            else:
                w_re = table_refs[ti + 1][:]
                w_im = table_refs[ti + 2][:]
                ti += 3
            re_v = state_re.reshape(k, radix, m * t)
            im_v = state_im.reshape(k, radix, m * t)
            outs_re, outs_im = [], []
            for kk in range(k):
                if stage_fold:
                    a = a_tab[kk]
                    zr, zi = re_v[kk], im_v[kk]
                else:
                    a = a_tab[0]
                    sr = re_v[kk].astype(jnp.float32)
                    si = im_v[kk].astype(jnp.float32)
                    wr = w_re[:, kk][:, None]
                    wi = w_im[:, kk][:, None]
                    zr = sr * wr - si * wi
                    zi = sr * wi + si * wr
                u = dots.dot(a, zr, algorithm)
                v = dots.dot(a, zi, algorithm)
                outs_re.append((u[:radix] - v[radix:]).astype(sd))
                outs_im.append((u[radix:] + v[:radix]).astype(sd))
            state_re = jnp.stack(outs_re, axis=1).reshape(radix * k, m * t)
            state_im = jnp.stack(outs_im, axis=1).reshape(radix * k, m * t)
        else:  # big: VPU twiddle on the unswapped view, one sublane swap
            a = table_refs[ti][0]
            w_re = table_refs[ti + 1][:].T[:, :, None]  # (K, R, 1)
            w_im = table_refs[ti + 2][:].T[:, :, None]
            ti += 3
            re_v = state_re.reshape(k, radix, m * t).astype(jnp.float32)
            im_v = state_im.reshape(k, radix, m * t).astype(jnp.float32)
            tw_re = (re_v * w_re - im_v * w_im).swapaxes(0, 1)
            tw_im = (re_v * w_im + im_v * w_re).swapaxes(0, 1)
            u = dots.dot(a, tw_re.reshape(radix, k * m * t), algorithm)
            v = dots.dot(a, tw_im.reshape(radix, k * m * t), algorithm)
            o_re = (u[:radix] - v[radix:]).astype(sd)
            o_im = (u[radix:] + v[:radix]).astype(sd)
            state_re = o_re.reshape(radix, k, m * t).reshape(radix * k, m * t)
            state_im = o_im.reshape(radix, k, m * t).reshape(radix * k, m * t)
        k *= radix
    return state_re, state_im, ti


def _mult3(bd, z_re, z_im, radix, algorithm, sd):
    """Complex matmul via 3 real matmuls (Karatsuba / Gauss trick).

    For radix >= 128 the (2R, 2R) block-complex matmul costs 4R padded
    MACs/element while three (R, R) matmuls cost 3R — a 25% MXU saving
    exactly where the fused kernel is MXU-bound (radix-128 stages at
    N >= 8192).  Below R=128 the three matmuls each pad K up to the
    128-wide systolic array and the trick loses; callers gate on the radix.

      t1 = D_re @ re;  t2 = D_im @ im;  t3 = (D_re + D_im) @ (re + im)
      out_re = t1 - t2;  out_im = t3 - t1 - t2

    D_re/D_im are sliced from the same BD table the block path uses (BD =
    [[D_re, -D_im], [D_im, D_re]]), so table formats are unchanged.
    """
    d_re = bd[:radix, :radix]
    d_im = bd[radix:, :radix]
    t1 = dots.dot(d_re, z_re, algorithm)
    t2 = dots.dot(d_im, z_im, algorithm)
    t3 = dots.dot((d_re.astype(jnp.float32) + d_im.astype(jnp.float32))
                  .astype(bd.dtype), z_re + z_im, algorithm)
    return jnp.stack([(t1 - t2).astype(sd), (t3 - t1 - t2).astype(sd)])


def stage_loop(state, table_refs, radices, algorithm, n, t, ti=0,
               grouped: bool = False, state_dtype=jnp.float32,
               kloop_width: int = _KLOOP_WIDTH, complex_mult: str = "block",
               first_dot: str = "default", pretwiddle: bool = False,
               emit_slices: bool = False, out_dtype=None):
    """Run the whole stage sequence on a stacked (2, n, t) state.

    The shared in-VMEM engine behind every kernel (whole-transform fused,
    four-step passes, 2D row/column passes).  Dispatch per stage follows
    _stage_kinds; see fused_fft_kernel_body for the math of each branch.

    ``state_dtype`` is the dtype the state is held in BETWEEN stages: fp32
    by default; bf16 halves in-VMEM state traffic (the analog of the
    reference storing fp16 between stages, TensorRadix16.cu:195-213) at the
    cost of one extra rounding per stage — matmuls still accumulate fp32.

    ``complex_mult='mult3'`` runs radix >= 128 stages as three R x R real
    matmuls instead of one 2R x 2R block matmul (see _mult3); smaller radices
    keep the block form either way.

    ``emit_slices=True`` (the gridslice engine) returns the LAST stage's
    per-slice outputs as a list of K arrays of shape (2, R, m*t) — row order
    within each slice is r, slice kk holds output rows r*K + kk — instead of
    materializing the sublane-interleaved (2, n, t) state.  The interleave
    (a K-way jnp.stack Mosaic lowers as a full sublane shuffle, measured
    ~615 us of the N=16384/b=4096 kernel) is then done by the output DMA
    engine via per-slice grid-blocked HBM stores.  The last stage must be a
    kloop (g forced to 1) or a p==1 grouped stage.

    ``out_dtype`` (the interleave_downcast knob) casts the LAST stage's
    outputs to the kernel's output dtype BEFORE the K-way interleave stack
    instead of after it.  astype-then-permute is elementwise-identical to
    permute-then-astype, so results are bit-identical — but when the output
    is bf16 and the state fp32, the sublane shuffle moves half the bytes.
    This buys the interleave half of the bf16-state win without bf16
    state's per-stage rounding (which lost its retune challenges).  Only
    the final output may be downcast; callers whose stage_loop output feeds
    further math (four-step twiddles) must leave it None.
    """
    sd = state_dtype
    alg0 = (first_dot if (first_dot != "default" and algorithm == "bf16")
            else algorithm)
    m = n
    # pretwiddle hoists each stage's twiddle into the PREVIOUS stage's
    # epilogue as one broadcast multiply on the contiguous output view —
    # measured ~600 us cheaper than per-slice twiddles at the headline
    # config (round-3 stage breakdown); incompatible with 'grouped' (whose
    # constant-fold IS the twiddle), so grouping is disabled under it.
    kinds = list(_stage_kinds(radices, grouped and not pretwiddle))
    last_i = len(kinds) - 1
    for i, (kind, radix, k, p) in enumerate(kinds):
        m //= radix
        use3 = complex_mult == "mult3" and radix >= 128
        # od: dtype of THIS stage's output — sd between stages, out_dtype
        # (when set) on the last stage so the interleave moves output-width
        # data.  Identical values either way (astype commutes with stack).
        od = out_dtype if (i == last_i and out_dtype is not None) else sd
        if kind == "first":
            bd = table_refs[ti][:]
            ti += 1
            if use3:
                zv = state.reshape(2, radix, m * t)
                state = _mult3(bd, zv[0], zv[1], radix, alg0, od)
            else:
                z2 = state.reshape(2 * radix, m * t)
                out = dots.dot(bd, z2, alg0).astype(od)
                state = out.reshape(2, radix, m * t)
        elif kind == "grouped":
            g_tab = table_refs[ti][:]
            ti += 1
            zv = state.reshape(2, k, radix, m * t)
            use3g = _grouped_mult3(kind, radix, p, complex_mult)
            outs = []
            for g in range(k // p):
                if use3g:
                    # Gauss 3-matmul form on the folded per-slice tables:
                    # 25% fewer padded MACs than the (2R, 2R) block matmul
                    # at radix >= 128 — AND no stacked re/im operand gather
                    # (the planes feed the three matmuls separately).
                    m_re = g_tab[g, :radix]
                    m_im = g_tab[g, radix:2 * radix]
                    m_sum = g_tab[g, 2 * radix:]
                    zr, zi = zv[0, g], zv[1, g]
                    t1 = dots.dot(m_re, zr, algorithm)
                    t2 = dots.dot(m_im, zi, algorithm)
                    t3 = dots.dot(m_sum, zr + zi, algorithm)
                    o = jnp.stack([(t1 - t2).astype(od),
                                   (t3 - t1 - t2).astype(od)])
                    outs.append(o)
                    continue
                zg = zv[:, g * p:(g + 1) * p].reshape(2 * p * radix, m * t)
                o = dots.dot(g_tab[g], zg, algorithm).astype(od)
                # p == 1 keeps slices 3D — a trailing singleton pack axis
                # makes Mosaic lower the interleave stack measurably slower
                # (same finding as the kloop branch: 1939 vs 1516 us at
                # N=16384/b=4096 for shape-identical math).
                outs.append(o.reshape(2, radix, m * t) if p == 1
                            else o.reshape(2, radix, p, m * t))
            if emit_slices and i == last_i and p == 1:
                return outs, ti
            out = outs[0] if len(outs) == 1 else jnp.stack(outs, axis=2)
            state = out.reshape(2, radix * k, m * t)
        elif kind == "kloop":
            bd = table_refs[ti][:]
            zv = state.reshape(2, k, radix, m * t)
            if pretwiddle:
                ti += 1
                tw_re, tw_im = zv[0], zv[1]
            else:
                # ONE broadcast twiddle on the whole 4D view, NOT per-slice
                # 2D multiplies inside the slice loop: Mosaic fuses the
                # broadcast into one traversal, while the per-slice form
                # (k separate cast+multiply pairs) compiled ~420 us slower
                # at N=16384/b=4096 (round-3 stage breakdown: 1516 vs 1938
                # us whole-kernel).  Same math, same fp32 multiply.
                w_re = table_refs[ti + 1][:]
                w_im = table_refs[ti + 2][:]
                ti += 3
                w4r = w_re.T[:, :, None]  # (K, R, 1) fp32
                w4i = w_im.T[:, :, None]
                tw_re = (zv[0] * w4r - zv[1] * w4i).astype(sd)
                tw_im = (zv[0] * w4i + zv[1] * w4r).astype(sd)
            # Group g twiddled slices into ONE wide matmul by concatenating
            # along the LANE dim (free — no transpose): the DFT block matrix
            # is identical across slices.  A lone (2R, m*t) slice with
            # m*t = 128 feeds only one MXU column tile; MXU-bound stages
            # (2R = 256) run ~4x under peak without the widening — but the
            # matmuls are ~5% of this kernel's time, so g defaults to 1
            # (_KLOOP_WIDTH); the plan knob remains for per-length tuning.
            g = 1
            if not (emit_slices and i == last_i):
                while (g * 2 <= k and g * m * t < kloop_width
                       and k % (g * 2) == 0):
                    g *= 2
            outs = []
            for gi in range(k // g):
                if g == 1:
                    wide_re, wide_im = tw_re[gi], tw_im[gi]
                else:
                    wide_re = jnp.concatenate(
                        [tw_re[gi * g + j] for j in range(g)], 1)
                    wide_im = jnp.concatenate(
                        [tw_im[gi * g + j] for j in range(g)], 1)
                if use3:
                    out_g = _mult3(bd, wide_re, wide_im, radix, algorithm, od)
                else:
                    z_wide = jnp.concatenate([wide_re, wide_im], axis=0)
                    out_g = dots.dot(bd, z_wide, algorithm).astype(od)
                # Slices stay 3D in ALL width modes: a g > 1 wide matmul's
                # output lanes are SPLIT back into g (2, R, m*t) slices
                # (lane slicing at m*t multiples is free — no relayout)
                # instead of parking a trailing group axis.  The 4D/5D-pack
                # form lost every hardware measurement (round-3: 1939 vs
                # 1516 us; round-4 S1c: kloop_width=256/512 at 2749/2418 vs
                # 1250 us full — the 5D stack's sublane shuffle swamps the
                # weight-fill saving), while the lane-split keeps the proven
                # 64-way 3D interleave AND the per-weight-fill column width.
                og = out_g.reshape(2, radix, g * m * t)
                if g == 1:
                    outs.append(og)
                else:
                    outs.extend(og[:, :, j * m * t:(j + 1) * m * t]
                                for j in range(g))
            if emit_slices and i == last_i:
                return outs, ti
            out = outs[0] if len(outs) == 1 else jnp.stack(outs, axis=2)
            # (2, R, K/g[, g], M*T) -> row index kk = gi*g + j, matching the
            # pre-grouping stack order exactly.
            state = out.reshape(2, radix * k, m * t)
        else:  # big
            bd = table_refs[ti][:]
            if pretwiddle:
                ti += 1
                zv = state.reshape(2, k, radix, m * t).astype(jnp.float32)
                tw_re, tw_im = zv[0], zv[1]
            else:
                w_re = table_refs[ti + 1][:].T[None, :, :, None]  # (1,K,R,1)
                w_im = table_refs[ti + 2][:].T[None, :, :, None]
                ti += 3
                zv = state.reshape(2, k, radix, m * t).astype(jnp.float32)
                tw_re = zv[0] * w_re[0] - zv[1] * w_im[0]
                tw_im = zv[0] * w_im[0] + zv[1] * w_re[0]
            if use3:
                out = _mult3(
                    bd,
                    tw_re.swapaxes(0, 1).reshape(radix, k * m * t),
                    tw_im.swapaxes(0, 1).reshape(radix, k * m * t),
                    radix, algorithm, od,
                )
            else:
                tw = jnp.stack([tw_re, tw_im])
                z2 = tw.swapaxes(1, 2).reshape(2 * radix, k * m * t)
                out = dots.dot(bd, z2, algorithm).astype(od)
            state = out.reshape(2, radix * k, m * t)
        if pretwiddle and i < last_i:
            # Epilogue: apply the NEXT stage's twiddle W[j, kk] on this
            # stage's contiguous output — rows kk = r*K + kk_prev, lane
            # groups j = next input digit.  T = W.T, shape (rows, R_next).
            t_re = table_refs[ti][:][None, :, :, None]
            t_im = table_refs[ti + 1][:][None, :, :, None]
            ti += 2
            rows = radix * k
            r_next = radices[i + 1]
            sv = state.reshape(2, rows, r_next, (m // r_next) * t)
            o_re = sv[0] * t_re[0] - sv[1] * t_im[0]
            o_im = sv[0] * t_im[0] + sv[1] * t_re[0]
            state = jnp.stack([o_re, o_im]).astype(sd).reshape(
                2, rows, m * t)
    return state, ti


def fused_fft_kernel_body(refs, radices: Sequence[int], algorithm: str,
                          grouped: bool = False, state_dtype=jnp.float32,
                          kloop_width: int = _KLOOP_WIDTH,
                          complex_mult: str = "block",
                          engine: str = "stacked",
                          first_dot: str = "default",
                          interleave_downcast: bool = False):
    """Shared kernel body: refs = (re_ref, im_ref, *tables, out_re, out_im).

    State: stacked (2, K, M*T) fp32 — plane 0 RE, plane 1 IM.  Twiddles run in
    fp32 on the VPU (or are folded into grouped stage matrices); stage
    matmuls under ``algorithm`` (ops/dots.py) with fp32 accumulation.

    Stage structure per radix R (K = transforms built so far), _stage_kinds:
      * 'first' (K == 1): Z = [re; im] — a pure reshape, no twiddle, one
        block matmul.
      * 'grouped' (2R <= 64): pack 128/(2R) slices per block-diagonal
        matmul with twiddle and output reorder folded into the constant.
      * 'kloop' (K <= _MAX_KLOOP): loop over the K sub-transform slices.
        Each slice (2, R, M*T) has its (2, R) rows ADJACENT, so the block
        matmul needs no data movement; the twiddle column W[:, k] is
        applied per slice.  This replaces the Stockham sublane transpose,
        which Mosaic lowers ~40% slower than K small matmuls (measured
        745us vs 510us at N=4096, B=4096).
      * 'big': twiddle on the unswapped view, one sublane swap, one
        matmul (the transpose-based formulation).
    """
    re_ref, im_ref = refs[0], refs[1]
    out_re_ref, out_im_ref = refs[-2], refs[-1]
    table_refs = refs[2:-2]

    n, t = re_ref.shape
    if engine in ("planar", "planar_vpu"):
        # Planar engine: re/im never stacked; the first stage's matmuls read
        # the input refs' storage dtype directly (dots.dot casts operands).
        s_re, s_im, _ = stage_loop_planar(
            re_ref[:], im_ref[:], table_refs, radices, algorithm, n, t,
            fold=(engine == "planar"), state_dtype=state_dtype,
            first_dot=first_dot,
        )
        out_re_ref[:] = s_re.reshape(n, t).astype(out_re_ref.dtype)
        out_im_ref[:] = s_im.reshape(n, t).astype(out_im_ref.dtype)
        return
    state = jnp.stack([re_ref[:], im_ref[:]])
    # Under the plain bf16 algorithm the first stage's matmul consumes bf16
    # operands, so upcasting bf16 storage to the fp32 state first would only
    # add a full-panel fp32 write+read (the dot casts back down); feed the
    # raw planes instead.  mult3's first stage sums re+im pre-matmul, where
    # the upcast buys an exact sum — keep it there.
    if not (
        algorithm == "bf16"
        and state.dtype == jnp.bfloat16
        and not (complex_mult == "mult3" and radices[0] >= 128)
    ):
        state = state.astype(state_dtype)
    state, _ = stage_loop(state, table_refs, radices, algorithm, n, t,
                          grouped=grouped, state_dtype=state_dtype,
                          kloop_width=kloop_width, complex_mult=complex_mult,
                          first_dot=first_dot,
                          pretwiddle=(engine == "pretwiddle"),
                          out_dtype=(out_re_ref.dtype if interleave_downcast
                                     else None))
    out_re_ref[:] = state[0].reshape(n, t).astype(out_re_ref.dtype)
    out_im_ref[:] = state[1].reshape(n, t).astype(out_im_ref.dtype)


def gridslice_layout(radices, grouped: bool):
    """Static gate for engine='gridslice'.

    Returns S, the last stage's slice count (= N / R_last), or None when the
    plan shape cannot use grid-blocked slice stores: the last stage must be
    a kloop or a p==1 grouped stage (each emitting S whole (2, R, t)
    slices), and S must be a sublane multiple so the in-kernel
    (R, S, t) -> (N, t) input collapse is layout-free.
    """
    kind, radix, k, p = list(_stage_kinds(radices, grouped))[-1]
    if kind == "kloop" or (kind == "grouped" and p == 1):
        if k % 8 == 0:
            return k
    return None


def gridslice_kernel_body(refs, scratch, radices, algorithm, grouped,
                          state_dtype, kloop_width, complex_mult, first_dot,
                          slice_block=1):
    """Gridslice engine body: grid = (lane_tiles, S/C), slice dim innermost.

    Step s == 0 runs the whole stage sequence (stage_loop with
    emit_slices=True) and parks the S last-stage slices CONTIGUOUSLY in
    scratch — leading-dim writes, no sublane interleave.  Every step then
    copies C = ``slice_block`` slices to their grid-blocked output block
    (R, C, t) at position (0, s, i) of the (R, S, B) output; the strided
    placement that interleaves rows r*S + s in HBM is done by the output
    DMA engine, not by a K-way in-VMEM jnp.stack (measured ~615 us of the
    N=16384/b=4096 kernel).  C = 1 stores single-sublane-strided blocks
    (partial HBM tiles); C = 8/16 stores tile-aligned blocks at the cost of
    a small per-step C-way interleave that overlaps with the outbound DMA
    pipeline.  Inputs and tables keep constant block indices across s, so
    they are fetched once per lane tile.
    """
    re_ref, im_ref = refs[0], refs[1]
    out_re_ref, out_im_ref = refs[-2], refs[-1]
    table_refs = refs[2:-2]
    scr_re, scr_im = scratch
    r_last, s_total, t = re_ref.shape
    n = r_last * s_total
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _compute():
        state = jnp.stack([re_ref[:].reshape(n, t), im_ref[:].reshape(n, t)])
        if not (
            algorithm == "bf16"
            and state.dtype == jnp.bfloat16
            and not (complex_mult == "mult3" and radices[0] >= 128)
        ):
            state = state.astype(state_dtype)
        slices, _ = stage_loop(state, table_refs, radices, algorithm, n, t,
                               grouped=grouped, state_dtype=state_dtype,
                               kloop_width=kloop_width,
                               complex_mult=complex_mult,
                               first_dot=first_dot, emit_slices=True)
        for kk, sl in enumerate(slices):
            scr_re[kk] = sl[0].astype(scr_re.dtype)
            scr_im[kk] = sl[1].astype(scr_im.dtype)

    c = slice_block
    out_re_ref[...] = gridslice_block(scr_re, s, c)
    out_im_ref[...] = gridslice_block(scr_im, s, c)


def gridslice_block(scr_ref, s, c, i=None):
    """Shared gridslice store epilogue: the (R, C, t) block of C parked
    slices for grid step ``s`` (``i`` selects the batch element of the
    four-step pass kernels' 4D scratch).

    The two forms are perf-sensitive measured layouts — C == 1 stores a
    single-sublane-strided block, C > 1 a small C-way interleave that
    overlaps the outbound DMA pipeline; keep every engine on this exact
    shape rather than re-deriving it per kernel.
    """
    get = (lambda k: scr_ref[k]) if i is None else (lambda k: scr_ref[i, k])
    if c == 1:
        return get(s)[:, None, :]
    return jnp.stack([get(s * c + j) for j in range(c)], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("radices", "scales", "sign", "lane_tile", "algorithm",
                     "interpret", "grouped", "state_dtype", "kloop_width",
                     "complex_mult", "engine", "first_dot",
                     "interleave_downcast"),
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
    grouped: bool = False,
    state_dtype: str = "float32",
    kloop_width: int = _KLOOP_WIDTH,
    complex_mult: str = "block",
    engine: str = "stacked",
    first_dot: str = "default",
    interleave_downcast: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Whole-transform FFT on transform-major (N, B) planes via one Pallas pass.

    Output dtype matches input dtype (storage rounding at the HBM boundary);
    in-kernel compute is fp32 with ``algorithm`` matmul operands.

    ``interleave_downcast`` casts the last stage's slices to the output
    dtype BEFORE the K-way interleave stack (bit-identical results — see
    stage_loop).  Only the stacked/pretwiddle engines consume it; planar
    has no stacked interleave and gridslice already parks slices in the
    output dtype.
    """
    if interpret is None:
        interpret = _interpret_default()
    if re.ndim != 2 or re.shape != im.shape:
        raise ValueError(
            f"fused_fft expects matching (N, B) planes, got re {re.shape} "
            f"im {im.shape}"
        )
    n, b = re.shape
    if math.prod(radices) != n:
        raise ValueError(f"radices {radices} do not multiply to N={n}")

    t = int(lane_tile)
    pad = (-b) % t
    if pad:
        re = jnp.pad(re, ((0, 0), (0, pad)))
        im = jnp.pad(im, ((0, 0), (0, pad)))
    b_padded = b + pad
    grid = (b_padded // t,)

    if engine in ("planar", "planar_vpu"):
        table_arrays = planar_stage_tables(radices, scales, sign, algorithm,
                                           fold=(engine == "planar"),
                                           first_dot=first_dot)
    else:
        table_arrays = stage_table_arrays(radices, scales, sign, algorithm,
                                          grouped, first_dot=first_dot,
                                          pretwiddle=(engine == "pretwiddle"),
                                          complex_mult=complex_mult)

    if engine.startswith("gridslice"):
        s_total = gridslice_layout(radices, grouped)
        # C = 8 minimum: Mosaic requires the last two block dims divisible
        # by (8, 128), so single-slice (R, 1, t) output blocks cannot lower.
        slice_block = int(engine[len("gridslice"):] or 8)
        if s_total is None or s_total % slice_block != 0:
            raise ValueError(
                f"engine={engine!r} unsupported for radices {radices} "
                f"(grouped={grouped}): last stage must emit whole slices "
                f"with a sublane-multiple slice count divisible by the "
                f"slice block")
        r_last = radices[-1]
        sd = jnp.dtype(state_dtype)
        grid = (b_padded // t, s_total // slice_block)
        data_spec3 = pl.BlockSpec((r_last, s_total, t),
                                  lambda i, s: (0, 0, i),
                                  memory_space=pltpu.VMEM)
        out_spec3 = pl.BlockSpec((r_last, slice_block, t),
                                 lambda i, s: (0, s, i),
                                 memory_space=pltpu.VMEM)
        table_specs = [
            pl.BlockSpec(a.shape, lambda i, s, nd=a.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
            for a in table_arrays
        ]
        kernel = lambda *r: gridslice_kernel_body(
            r[:-2], r[-2:], radices, algorithm, grouped, sd, kloop_width,
            complex_mult, first_dot, slice_block=slice_block)
        out_re, out_im = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[data_spec3, data_spec3] + table_specs,
            out_specs=(out_spec3, out_spec3),
            out_shape=(
                jax.ShapeDtypeStruct((r_last, s_total, b_padded), re.dtype),
                jax.ShapeDtypeStruct((r_last, s_total, b_padded), im.dtype),
            ),
            scratch_shapes=[
                pltpu.VMEM((s_total, r_last, t), re.dtype),
                pltpu.VMEM((s_total, r_last, t), im.dtype),
            ],
            interpret=interpret,
            input_output_aliases={0: 0, 1: 1},
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * sum(4 * max(2 * r, 128) ** 2 * (n // r)
                              for r in radices) * b_padded // 4,
                bytes_accessed=2 * 2 * n * b_padded * re.dtype.itemsize,
                transcendentals=0,
            ),
        )(re.reshape(r_last, s_total, b_padded),
          im.reshape(r_last, s_total, b_padded),
          *table_arrays)
        out_re = out_re.reshape(n, b_padded)
        out_im = out_im.reshape(n, b_padded)
        if pad:
            out_re = out_re[:, :b]
            out_im = out_im[:, :b]
        return out_re, out_im

    data_spec = pl.BlockSpec((n, t), lambda i: (0, i), memory_space=pltpu.VMEM)
    table_specs = [
        pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for a in table_arrays
    ]

    sd = jnp.dtype(state_dtype)
    kernel = lambda *refs: fused_fft_kernel_body(
        refs, radices, algorithm, grouped, state_dtype=sd,
        kloop_width=kloop_width, complex_mult=complex_mult, engine=engine,
        first_dot=first_dot, interleave_downcast=interleave_downcast)

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
            vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
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
