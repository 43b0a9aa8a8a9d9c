"""Round-3 diagnostic: attribute the fused kernel's in-kernel time.

The round-2 verdict: the fused kernel runs ~2.3x its own aliased copy floor
and the gap is in-kernel ("VMEM data movement around the stage matmuls" was a
hypothesis class, not a diagnosis).  This experiment times kernel VARIANTS
that successively strip mechanisms, all chain_compare'd (decision-grade,
interleaved) against the production kernel, so the in-kernel time decomposes
per stage and per mechanism:

  copy         aliased passthrough (the floor)
  s1           first stage only (no stage 2 at all)
  notwiddle    full, but stage 2's VPU twiddle pass skipped     -> twiddle cost
  movement     full, but stage 2's matmul skipped (data paths
               kept: slice, cast, twiddle, concat, stack)       -> matmul cost
  nostack      full, but stage-2 outputs concatenated slice-
               contiguous (kk-major, mathematically wrong order)-> interleave cost
  s2big        stage 2 via the transpose-based 'big' form
               (one sublane swap + ONE wide matmul)             -> kloop-vs-big
  full_bf16st  production kernel with bf16 in-VMEM state
  grouped      production kernel, twiddle-folded block constants
  planar       NEW planar engine (separate re/im planes,
               twiddle-folded [D_re; D_im] constants)
  planar_b16   planar with bf16 state
  planar_vpu   planar with shared DFT matrix + VPU twiddles

Custom-variant bodies only support two-stage factorizations (the headline
configs 4096=(64,64), 8192=(64,128), 16384=(64,256) all are).

Usage: python benchmarks/exp_stage_breakdown.py --n 16384 --batch 4096
Prints one JSON line per pair.  Reference anchor: the whole point of
TensorFFT4096.cu:296-359 is doing more per memory pass; this locates where
our pass's time goes.
"""
import argparse
import json

import numpy as np

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--variants", type=str, default="",
                    help="comma list; default all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import tensorfft_tpu as tfft
    from tensorfft_tpu.fft import stage_scales
    from tensorfft_tpu.ops import dots, fused_pallas
    from tensorfft_tpu.testing.timer import chain_compare
    from tensorfft_tpu.utils.device import KERNEL_VMEM_LIMIT_BYTES

    n, b = args.n, args.batch
    plan = tfft.create_plan(n, precision="bfloat16", tuning="auto",
                            batch_hint=b)
    radices = plan.radices
    assert len(radices) == 2, f"two-stage only, got {radices}"
    r1, r2 = radices
    k = r1
    scales = stage_scales(radices, plan.scaling, True)
    t = 128
    mt = (n // (r1 * r2)) * t

    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((n, b)), jnp.bfloat16)
    im = jnp.asarray(rng.standard_normal((n, b)), jnp.bfloat16)

    data_spec = pl.BlockSpec((n, t), lambda i: (0, i), memory_space=pltpu.VMEM)

    def call(kernel, tables):
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
            input_output_aliases={0: 0, 1: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
                dimension_semantics=("arbitrary",),
            ),
        )
        return jax.jit(lambda a, c: f(a, c, *tables))

    def copy_kernel(re_ref, im_ref, o_re, o_im):
        o_re[:] = re_ref[:].astype(jnp.float32).astype(o_re.dtype)
        o_im[:] = im_ref[:].astype(jnp.float32).astype(o_im.dtype)

    tables_s1 = fused_pallas.stage_table_arrays(
        (r1,), (scales[0],), -1, "bf16", False)
    tables_full = fused_pallas.stage_table_arrays(
        radices, scales, -1, "bf16", False)
    tables_g = fused_pallas.stage_table_arrays(
        radices, scales, -1, "bf16", True)
    tables_g3 = fused_pallas.stage_table_arrays(
        radices, scales, -1, "bf16", True, complex_mult="mult3")

    def s1_kernel(*refs):
        re_ref, im_ref = refs[0], refs[1]
        o_re, o_im = refs[-2], refs[-1]
        state = jnp.stack([re_ref[:], im_ref[:]]).astype(jnp.float32)
        state, _ = fused_pallas.stage_loop(
            state, refs[2:-2], (r1,), "bf16", n, t)
        # Timing-only output order: state is (2, r1, (n//r1)*t); a direct
        # reshape to (n, t) is a full-panel lane->sublane relayout that
        # Mosaic compiles pathologically (wedges the backend).  The
        # transpose-of-lane-tiles form below moves whole (r1, t) tiles
        # (bookkeeping, no intra-tile movement); row order becomes
        # j2*r1 + r, irrelevant for a store-traffic measurement.
        s3 = state.reshape(2, r1, n // r1, t)
        o_re[:] = s3[0].transpose(1, 0, 2).reshape(n, t).astype(o_re.dtype)
        o_im[:] = s3[1].transpose(1, 0, 2).reshape(n, t).astype(o_im.dtype)

    def make_custom4d(state_dtype=jnp.float32, slicestore=False):
        """Correct-math stage-2 restructure: ONE broadcast twiddle on the 4D
        relayouted view (instead of per-slice 2D multiplies — lets Mosaic
        fuse the multiply into the relayout traversal), optional direct
        per-slice stores into a 3D (r2, k, t) output ref (instead of
        building the interleaved tensor in VMEM via jnp.stack)."""

        def kernel(*refs):
            re_ref, im_ref = refs[0], refs[1]
            o_re, o_im = refs[-2], refs[-1]
            bd1 = refs[2]
            bd2, w_re_r, w_im_r = refs[3], refs[4], refs[5]
            state = jnp.stack([re_ref[:], im_ref[:]]).astype(jnp.float32)
            state, _ = fused_pallas.stage_loop(
                state, [bd1], (r1,), "bf16", n, t, state_dtype=state_dtype)
            bd = bd2[:]
            w4r = w_re_r[:].T[:, :, None]  # (K, R, 1)
            w4i = w_im_r[:].T[:, :, None]
            zv = state.reshape(2, k, r2, mt)
            tw_re = (zv[0] * w4r - zv[1] * w4i).astype(state_dtype)
            tw_im = (zv[0] * w4i + zv[1] * w4r).astype(state_dtype)
            outs = []
            for kk in range(k):
                z_wide = jnp.concatenate([tw_re[kk], tw_im[kk]], axis=0)
                out_g = dots.dot(bd, z_wide, "bf16")
                if slicestore:
                    o_re[:, kk, :] = out_g[:r2].astype(o_re.dtype)
                    o_im[:, kk, :] = out_g[r2:].astype(o_im.dtype)
                else:
                    outs.append(out_g.reshape(2, r2, mt))
            if not slicestore:
                out = jnp.stack(outs, axis=2)
                state = out.reshape(2, r2 * k, mt)
                o_re[:] = state[0].reshape(n, t).astype(o_re.dtype)
                o_im[:] = state[1].reshape(n, t).astype(o_im.dtype)

        return kernel

    def call3d(kernel, tables):
        # In/out as (r2, k, b): tile-layout-identical to (n, b) with rows
        # j2*k + kk (k % 8 == 0 keeps (8, 128) tiles aligned), so the
        # (n, b) <-> 3D reshapes are free metadata changes, the chain stays
        # shape-stationary, and the kernel can store per-slice (r2, 1, t)
        # blocks directly instead of materializing the interleave in VMEM.
        table_specs = [
            pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
            for a in tables
        ]
        spec3 = pl.BlockSpec((r2, k, t), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)
        f = pl.pallas_call(
            kernel,
            grid=(b // t,),
            in_specs=[spec3, spec3] + table_specs,
            out_specs=(spec3, spec3),
            out_shape=(
                jax.ShapeDtypeStruct((r2, k, b), jnp.bfloat16),
                jax.ShapeDtypeStruct((r2, k, b), jnp.bfloat16),
            ),
            input_output_aliases={0: 0, 1: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
                dimension_semantics=("arbitrary",),
            ),
        )

        def run(a, c):
            o_re, o_im = f(a.reshape(r2, k, b), c.reshape(r2, k, b), *tables)
            return o_re.reshape(n, b), o_im.reshape(n, b)

        return jax.jit(run)

    def make_gridslice(state_dtype=jnp.float32, g8=8):
        """Kill the stage-2 output interleave by DMA: grid (b/t, k/g8), each
        group of g8 slices is its own (r2, g8, t) OUTPUT BLOCK into a
        (r2, k, b) HBM array (== (n, b) row-major, free reshape).  The big
        (r2, k) interleave becomes HBM addressing done by the output DMA
        engine plus tiny per-group (r2, g8) stacks that never cross an
        8-sublane tile (Mosaic rejects blocks whose dim -2 isn't a multiple
        of 8, so g8 >= 8; the jnp.stack relayout, ~615 us, and the
        slicestore masked-store variant, +700 us, both happened in VMEM).
        Stage 1 + the broadcast twiddle run once per batch tile (kg == 0)
        into a VMEM scratch that persists across the k/g8 inner grid steps."""
        bd1_a, bd2_a, w_re_a, w_im_a = tables_full
        w4r_a = np.ascontiguousarray(np.asarray(w_re_a).T)[:, :, None]
        w4i_a = np.ascontiguousarray(np.asarray(w_im_a).T)[:, :, None]
        tabs = [bd1_a, bd2_a, jnp.asarray(w4r_a), jnp.asarray(w4i_a)]

        def kernel(re_ref, im_ref, bd1, bd2, w4r, w4i, o_re, o_im, scr):
            kg = pl.program_id(1)

            @pl.when(kg == 0)
            def _stage1():
                state = jnp.stack(
                    [re_ref[:].reshape(n, t), im_ref[:].reshape(n, t)])
                state = state.astype(jnp.float32)
                state, _ = fused_pallas.stage_loop(
                    state, [bd1], (r1,), "bf16", n, t,
                    state_dtype=state_dtype)
                zv = state.reshape(2, k, r2, mt)
                tw_re = (zv[0] * w4r[:] - zv[1] * w4i[:]).astype(state_dtype)
                tw_im = (zv[0] * w4i[:] + zv[1] * w4r[:]).astype(state_dtype)
                scr[0] = tw_re
                scr[1] = tw_im

            chunk_re = scr[0, pl.ds(kg * g8, g8)]  # (g8, r2, mt)
            chunk_im = scr[1, pl.ds(kg * g8, g8)]
            outs = []
            for j in range(g8):
                z_wide = jnp.concatenate([chunk_re[j], chunk_im[j]], axis=0)
                outs.append(dots.dot(bd2[:], z_wide, "bf16"))
            out = jnp.stack(outs, axis=1)  # (2*r2, g8, t)
            o_re[:] = out[:r2].astype(o_re.dtype)
            o_im[:] = out[r2:].astype(o_im.dtype)

        table_specs = [
            pl.BlockSpec(np.asarray(a).shape,
                         lambda i, kg, nd=np.asarray(a).ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
            for a in tabs
        ]
        in3 = pl.BlockSpec((r2, k, t), lambda i, kg: (0, 0, i),
                           memory_space=pltpu.VMEM)
        out3 = pl.BlockSpec((r2, g8, t), lambda i, kg: (0, kg, i),
                            memory_space=pltpu.VMEM)
        f = pl.pallas_call(
            kernel,
            grid=(b // t, k // g8),
            in_specs=[in3, in3] + table_specs,
            out_specs=(out3, out3),
            out_shape=(
                jax.ShapeDtypeStruct((r2, k, b), jnp.bfloat16),
                jax.ShapeDtypeStruct((r2, k, b), jnp.bfloat16),
            ),
            scratch_shapes=[pltpu.VMEM((2, k, r2, mt), state_dtype)],
            input_output_aliases={0: 0, 1: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=KERNEL_VMEM_LIMIT_BYTES,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )

        def run(a, c):
            o_re, o_im = f(a.reshape(r2, k, b), c.reshape(r2, k, b), *tabs)
            return o_re.reshape(n, b), o_im.reshape(n, b)

        return jax.jit(run)

    def make_custom(mode):
        # Stage 1 production, stage 2 in `mode`.
        def kernel(*refs):
            re_ref, im_ref = refs[0], refs[1]
            o_re, o_im = refs[-2], refs[-1]
            bd1 = refs[2]
            bd2, w_re_r, w_im_r = refs[3], refs[4], refs[5]
            state = jnp.stack([re_ref[:], im_ref[:]]).astype(jnp.float32)
            state, _ = fused_pallas.stage_loop(
                state, [bd1], (r1,), "bf16", n, t)
            bd = bd2[:]
            w_re = w_re_r[:]
            w_im = w_im_r[:]
            zv = state.reshape(2, k, r2, mt)
            if mode == "s2big":
                wrb = w_re.T[None, :, :, None]  # (1, K, R, 1)
                wib = w_im.T[None, :, :, None]
                tw_re = zv[0] * wrb[0] - zv[1] * wib[0]
                tw_im = zv[0] * wib[0] + zv[1] * wrb[0]
                tw = jnp.stack([tw_re, tw_im])
                z2 = tw.swapaxes(1, 2).reshape(2 * r2, k * mt)
                out = dots.dot(bd, z2, "bf16")
                state = out.reshape(2, r2 * k, mt)
            else:
                outs = []
                for kk in range(k):
                    sr = zv[0, kk]
                    si = zv[1, kk]
                    if mode == "notwiddle":
                        zr, zi = sr, si
                    else:
                        wr = w_re[:, kk][:, None]
                        wi = w_im[:, kk][:, None]
                        zr = sr * wr - si * wi
                        zi = sr * wi + si * wr
                    z_wide = jnp.concatenate([zr, zi], axis=0)
                    if mode == "movement":
                        out_g = z_wide
                    else:
                        out_g = dots.dot(bd, z_wide, "bf16")
                    outs.append(out_g.reshape(2, r2, mt))
                if mode == "nostack":
                    out = jnp.concatenate(outs, axis=1)  # kk-major: timing only
                else:
                    out = jnp.stack(outs, axis=2)
                state = out.reshape(2, r2 * k, mt)
            o_re[:] = state[0].reshape(n, t).astype(o_re.dtype)
            o_im[:] = state[1].reshape(n, t).astype(o_im.dtype)

        return kernel

    def make_grouped_custom(mode, mult3=False):
        """Attribution variants under the GROUPED stage-2 structure (the
        round-3 headline winner): stage 1 production, stage 2 via the
        twiddle-folded per-slice tables with a mechanism stripped.

          g_movement    matmuls skipped, data paths kept (slice gather,
                        output stack)                      -> matmul cost
          g_nostack     outputs concatenated kk-major (timing-only order)
                        instead of the K-way interleave    -> interleave cost
        With mult3=True the stage-2 tables/ops are the (3R, R) mult3 fold.
        """

        def kernel(*refs):
            re_ref, im_ref = refs[0], refs[1]
            o_re, o_im = refs[-2], refs[-1]
            bd1, g_tab_r = refs[2], refs[3]
            state = jnp.stack([re_ref[:], im_ref[:]])
            state, _ = fused_pallas.stage_loop(
                state, [bd1], (r1,), "bf16", n, t)
            g_tab = g_tab_r[:]
            zv = state.reshape(2, k, r2, mt)
            outs = []
            for g in range(k):
                if mult3:
                    zr, zi = zv[0, g], zv[1, g]
                    if mode == "movement":
                        out_g = jnp.stack([zr + zi, zr - zi])
                    else:
                        m_re = g_tab[g, :r2]
                        m_im = g_tab[g, r2:2 * r2]
                        m_sum = g_tab[g, 2 * r2:]
                        t1 = dots.dot(m_re, zr, "bf16")
                        t2 = dots.dot(m_im, zi, "bf16")
                        t3 = dots.dot(m_sum, zr + zi, "bf16")
                        out_g = jnp.stack([t1 - t2, t3 - t1 - t2])
                else:
                    zg = zv[:, g].reshape(2 * r2, mt)
                    if mode == "movement":
                        out_g = zg
                    else:
                        out_g = dots.dot(g_tab[g], zg, "bf16")
                    out_g = out_g.reshape(2, r2, mt)
                outs.append(out_g)
            if mode == "nostack":
                out = jnp.concatenate(outs, axis=1)  # kk-major: timing only
            else:
                out = jnp.stack(outs, axis=2)
            state = out.reshape(2, r2 * k, mt)
            o_re[:] = state[0].reshape(n, t).astype(o_re.dtype)
            o_im[:] = state[1].reshape(n, t).astype(o_im.dtype)

        return kernel

    def make_kloop_wide(g):
        """Wide shared-weight stage 2 + LANE-SPLIT back to 3D slices.

        The production kloop's width packing appends 4D (2, R, g, mt) slices
        and pays the measured ~25% 5D-stack interleave penalty; here the
        wide matmul's output lanes are split back into g 3D slices first, so
        the interleave runs in the proven 64-way 3D form (~139 us, S1
        attribution) while each (2R, 2R) weight stream feeds g*128 data
        columns (fill amortization — the S1-attributed ~307 us matmul cost
        is fill-bound at 128 columns).  Trades the grouped twiddle fold for
        a broadcast VPU twiddle pass.
        """

        def kernel(*refs):
            re_ref, im_ref = refs[0], refs[1]
            o_re, o_im = refs[-2], refs[-1]
            bd1, bd2, w_re_r, w_im_r = refs[2], refs[3], refs[4], refs[5]
            state = jnp.stack([re_ref[:], im_ref[:]])
            state, _ = fused_pallas.stage_loop(
                state, [bd1], (r1,), "bf16", n, t)
            bd = bd2[:]
            w4r = w_re_r[:].T[:, :, None]  # (K, R, 1)
            w4i = w_im_r[:].T[:, :, None]
            zv = state.reshape(2, k, r2, mt)
            tw_re = (zv[0] * w4r - zv[1] * w4i).astype(jnp.float32)
            tw_im = (zv[0] * w4i + zv[1] * w4r).astype(jnp.float32)
            outs = []
            for gi in range(k // g):
                wide_re = jnp.concatenate(
                    [tw_re[gi * g + j] for j in range(g)], 1)
                wide_im = jnp.concatenate(
                    [tw_im[gi * g + j] for j in range(g)], 1)
                z_wide = jnp.concatenate([wide_re, wide_im], axis=0)
                out_g = dots.dot(bd, z_wide, "bf16")
                for j in range(g):
                    outs.append(out_g[:, j * mt:(j + 1) * mt]
                                .reshape(2, r2, mt))
            out = jnp.stack(outs, axis=2)
            state2 = out.reshape(2, r2 * k, mt)
            o_re[:] = state2[0].reshape(n, t).astype(o_re.dtype)
            o_im[:] = state2[1].reshape(n, t).astype(o_im.dtype)

        return kernel

    import functools

    def prod(**kw):
        base = dict(radices=radices, scales=scales, sign=-1, lane_tile=t,
                    algorithm="bf16", grouped=plan.grouped,
                    state_dtype=plan.state_dtype,
                    kloop_width=plan.kloop_width,
                    complex_mult=plan.complex_mult)
        base.update(kw)
        return functools.partial(fused_pallas.fused_fft, **base)

    variants = {
        "copy": lambda: call(copy_kernel, []),
        "s1": lambda: call(s1_kernel, tables_s1),
        "notwiddle": lambda: call(make_custom("notwiddle"), tables_full),
        "movement": lambda: call(make_custom("movement"), tables_full),
        "nostack": lambda: call(make_custom("nostack"), tables_full),
        "s2big": lambda: call(make_custom("s2big"), tables_full),
        "full_bf16st": lambda: prod(state_dtype="bfloat16"),
        "grouped": lambda: prod(grouped=True),
        "planar": lambda: prod(engine="planar"),
        "planar_b16": lambda: prod(engine="planar", state_dtype="bfloat16"),
        "planar_vpu": lambda: prod(engine="planar_vpu"),
        "pretwid": lambda: prod(engine="pretwiddle"),
        "pretwid_b16": lambda: prod(engine="pretwiddle",
                                    state_dtype="bfloat16"),
        "pretwid_m3": lambda: prod(engine="pretwiddle", complex_mult="mult3"),
        "pretwid_128": lambda: prod(engine="pretwiddle",
                                    radices=(128, 128),
                                    scales=stage_scales((128, 128),
                                                        plan.scaling, True)),
        "kloop4d": lambda: call(make_custom4d(), tables_full),
        "kloop4d_b16": lambda: call(make_custom4d(jnp.bfloat16),
                                    tables_full),
        "kloop4d_ss": lambda: call3d(make_custom4d(slicestore=True),
                                     tables_full),
        "kloop4d_b16_ss": lambda: call3d(
            make_custom4d(jnp.bfloat16, slicestore=True), tables_full),
        "gridslice": lambda: make_gridslice(),
        "gridslice_b16": lambda: make_gridslice(jnp.bfloat16),
        "gridslice16": lambda: make_gridslice(g8=16),
        # Grouped-structure attribution (round-4: the winner is grouped).
        "g_block": lambda: prod(complex_mult="block", grouped=True),
        "g_m3": lambda: prod(complex_mult="mult3", grouped=True),
        "g_full": lambda: call(make_grouped_custom("full"), tables_g),
        "g_movement": lambda: call(make_grouped_custom("movement"), tables_g),
        "g_nostack": lambda: call(make_grouped_custom("nostack"), tables_g),
        "g_m3_full": lambda: call(make_grouped_custom("full", True),
                                  tables_g3),
        "g_m3_movement": lambda: call(make_grouped_custom("movement", True),
                                      tables_g3),
        "g_m3_nostack": lambda: call(make_grouped_custom("nostack", True),
                                     tables_g3),
        "g_gridslice": lambda: prod(engine="gridslice", grouped=True),
        "g_gridslice16": lambda: prod(engine="gridslice16", grouped=True),
        "g_m3_gridslice": lambda: prod(engine="gridslice", grouped=True,
                                       complex_mult="mult3"),
        # Wider lane panels: the grouped stage-2 matmuls feed only t=128
        # data columns per (2R, 2R) weight stream — ~20% MXU utilization at
        # R=256 (g_movement vs g_full says the matmuls cost ~300 us of
        # UNHIDDEN time).  t=256 doubles the columns per weight stream and
        # halves the grid.  VMEM is tight (state+tables+blocks ~84-100 MiB),
        # hence the bf16-state twin; a Mosaic stall here costs one timeout.
        "g_block_t256": lambda: prod(grouped=True, complex_mult="block",
                                     lane_tile=256),
        "g_block_t256_b16": lambda: prod(grouped=True, complex_mult="block",
                                         lane_tile=256,
                                         state_dtype="bfloat16"),
        "g_gs_t256": lambda: prod(engine="gridslice", grouped=True,
                                  complex_mult="block", lane_tile=256,
                                  state_dtype="bfloat16"),
        # UNGROUPED t256 (round-4 S1b3): the grouped t256 probes all die in
        # the Mosaic allocator even at 120 MiB — the k x (2R, 2R) fold
        # tables (~32-64 MiB) push past the cap.  The broadcast-twiddle
        # kloop's tables are tiny (one (2R, 2R) block + (K, R) twiddles), so
        # t256 fits with bf16 state: 256 data columns per weight fill AND
        # half the grid steps, at the cost of the VPU twiddle pass.
        "kloop_t256_b16": lambda: prod(grouped=False, complex_mult="block",
                                       lane_tile=256,
                                       state_dtype="bfloat16"),
        "kloop_t256_b16_w512": lambda: prod(grouped=False,
                                            complex_mult="block",
                                            lane_tile=256,
                                            state_dtype="bfloat16",
                                            kloop_width=512),
        # Column widening WITHOUT doubling VMEM: the non-grouped kloop packs
        # w/128 slices' lanes through ONE shared-BD weight stream (the
        # grouped fold cannot — per-slice weights).  Trades the ~170 us
        # twiddle-fold win for 2-4x fewer weight fills on the stage-2 MXU.
        "kloop_w256": lambda: prod(grouped=False, complex_mult="block",
                                   kloop_width=256),
        "kloop_w512": lambda: prod(grouped=False, complex_mult="block",
                                   kloop_width=512),
        "kloop_w1024": lambda: prod(grouped=False, complex_mult="block",
                                    kloop_width=1024),
        "kloop_w512_m3": lambda: prod(grouped=False, complex_mult="mult3",
                                      kloop_width=512),
        "kws2": lambda: call(make_kloop_wide(2), tables_full),
        "kws4": lambda: call(make_kloop_wide(4), tables_full),
        "kws8": lambda: call(make_kloop_wide(8), tables_full),
        "kws16": lambda: call(make_kloop_wide(16), tables_full),
    }
    if args.variants:
        keep = set(args.variants.split(","))
        variants = {kk: v for kk, v in variants.items() if kk in keep}

    base = prod()
    flops = 5.0 * n * float(np.log2(n)) * b
    for name, mk in variants.items():
        try:
            fn = mk()
            r_full, r_v = chain_compare(base, fn, (re, im))
            print(json.dumps({
                "n": n, "batch": b, "radices": list(radices),
                "pair": ["full", name],
                "full_us": round(r_full.average_time_ns / 1e3, 1),
                f"{name}_us": round(r_v.average_time_ns / 1e3, 1),
                "full_gflops": round(flops / r_full.average_time_ns, 1),
                f"{name}_gflops": round(flops / r_v.average_time_ns, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"pair": ["full", name],
                              "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
