"""Attribute the rfft roundtrip overhead to its components (config 4).

The round-3 measurement (results/rfft_perf.dat) showed the aligned-M
untangle rewrite did NOT move the 94% overhead, and the shared C2C arm
itself runs ~4x the bare FFT cost — so BOTH the pack/unpack and the
untangle/retangle are suspect, and the suspects differ in mechanism:

- pack/unpack: ``reshape(…, m, 2)`` / ``stack(axis=-1)`` materialize a
  tiny-minormost-dim (2 of 128 lanes) layout — 64x tile padding if XLA
  materializes it.  Both layout-friendly challengers (strided lane slices
  and lax.pad interior dilation) WEDGED the axon backend inside calibrated
  timing chains at this size (client CPU frozen mid-compile, two attempts
  each) — the production pack keeps the stack formulation and this probe
  measures it against a plain copy.
- untangle: fp32 roll/flip/concat structural ops (2-3 materialized 32 MB
  passes per plane) + the elementwise chain.

This probe chain-measures each component in isolation at N=2^20, b=16:
  pack          x -> production _deinterleave -> _interleave -> x
  untangle      (zr, zi) -> _untangle_fwd -> _retangle_inv -> (zr', zi')

Usage: python benchmarks/exp_rfft_breakdown.py [--n 1048576 --batch 16]
Prints one JSON line; use under the campaign run_one2.sh harness.
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax.numpy as jnp

    from tensorfft_tpu.rfft import (_deinterleave, _interleave, _retangle_inv,
                                    _untangle_fwd)
    from tensorfft_tpu.testing.timer import chain_compare, chain_measure

    n, b = args.n, args.batch
    m = n // 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n)), jnp.bfloat16)
    zr = jnp.asarray(rng.standard_normal((b, m)), jnp.bfloat16)
    zi = jnp.asarray(rng.standard_normal((b, m)), jnp.bfloat16)

    def copy_baseline(xx):
        return (xx + 0,)

    def pack(xx):
        a, c = _deinterleave(xx)
        return (_interleave(a + 0, c + 0).astype(xx.dtype),)

    def untangle(ar, ai):
        fr, fi = _untangle_fwd(ar, ai, n, 0.25, jnp.bfloat16)
        br, bi = _retangle_inv(fr.astype(jnp.float32),
                               fi.astype(jnp.float32), n, 1.0)
        return br.astype(ar.dtype), bi.astype(ai.dtype)

    r_copy, r_new = chain_compare(copy_baseline, pack, (x,))
    r_unt = chain_measure(untangle, (zr, zi))
    row = {
        "n": n, "batch": b,
        "copy_us": round(r_copy.average_time_ns / 1e3, 1),
        "pack_us": round(r_new.average_time_ns / 1e3, 1),
        "untangle_roundtrip_us": round(r_unt.average_time_ns / 1e3, 1),
        "hbm_floor_us_pack": round(2 * 2 * b * n * 2 / 819e3, 1),
    }
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
