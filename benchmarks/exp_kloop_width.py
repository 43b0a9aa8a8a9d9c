"""A/B: narrow (round-1) vs wide kloop stage matmuls at several N.

The kloop packs g twiddled slices per matmul along the LANE dim (width
g*m*t); kloop_width=128 reproduces the round-1 narrow behavior (g=1 at
m*t=128).  Each pair is an interleaved chain_compare at batch=4096 bf16.
"""
import json

import numpy as np

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax.numpy as jnp

    import tensorfft_tpu as tfft
    from tensorfft_tpu.fft import _fft_split_jit
    from tensorfft_tpu.testing.timer import chain_compare

    rng = np.random.default_rng(0)
    batch = 4096
    for n in (16384, 8192, 4096):
        base = tfft.create_plan(n, precision="bfloat16", tuning="auto")
        tun = {"strategy": base.resolve_strategy().value,
               "lane_tile": base.lane_tile,
               "radices": base.radices,
               **({"grouped": True} if base.grouped else {})}
        p_narrow = tfft.create_plan(
            n, precision="bfloat16", tuning={**tun, "kloop_width": 128})
        p_wide = tfft.create_plan(
            n, precision="bfloat16", tuning={**tun, "kloop_width": 512})
        re = jnp.asarray(rng.standard_normal((batch, n)), jnp.bfloat16)
        im = jnp.asarray(rng.standard_normal((batch, n)), jnp.bfloat16)
        narrow = lambda a, b: _fft_split_jit(a, b, p_narrow, True)
        wide = lambda a, b: _fft_split_jit(a, b, p_wide, True)
        ra, rb = chain_compare(narrow, wide, (re, im))
        flops = 5.0 * n * float(np.log2(n)) * batch
        print(json.dumps({
            "n": n, "radices": list(base.radices),
            "narrow_us": round(ra.average_time_ns / 1e3, 1),
            "wide_us": round(rb.average_time_ns / 1e3, 1),
            "narrow_gflops": round(flops / ra.average_time_ns, 1),
            "wide_gflops": round(flops / rb.average_time_ns, 1),
            "speedup": round(ra.average_time_ns / rb.average_time_ns, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
