"""Per-stage error budget (SURVEY hard-part 1): each stage's output compared
against the exact fp64 stage pipeline, not just end-to-end — catches a stage
whose error is masked by later rescaling."""
import numpy as np
import pytest

from tensorfft_tpu.ops.stages_jax import apply_stages


@pytest.mark.parametrize("algorithm,budget", [("bf16", 6e-3), ("bf16x3", 2e-5)])
def test_per_stage_relative_error(algorithm, budget):
    import jax.numpy as jnp

    n, b = 4096, 4
    radices = (64, 64)
    scales = (1 / 64.0, 1 / 64.0)
    rng = np.random.default_rng(0)
    re = rng.standard_normal((n, b))
    im = rng.standard_normal((n, b))

    exact = apply_stages(
        jnp.asarray(re), jnp.asarray(im), radices, scales, -1,
        algorithm="exact", return_intermediates=True,
    )
    approx = apply_stages(
        jnp.asarray(re, jnp.float32), jnp.asarray(im, jnp.float32),
        radices, scales, -1, algorithm=algorithm, return_intermediates=True,
    )
    for j, ((er, ei), (ar, ai)) in enumerate(zip(exact, approx)):
        ex = np.asarray(er, np.float64) + 1j * np.asarray(ei, np.float64)
        ap = np.asarray(ar, np.float64) + 1j * np.asarray(ai, np.float64)
        scale = np.abs(ex).max()
        rel = np.abs(ap - ex).max() / scale
        assert rel < budget, f"stage {j}: rel err {rel:.2e} > {budget}"
