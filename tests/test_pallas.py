"""Pallas kernel tests (run in fallback mode on CPU; the TPU path is
exercised by the bench / driver runs)."""

import jax
import jax.numpy as jnp
import numpy as np

from nksr_tpu.ops.pallas import window_and_grad_fused
from nksr_tpu.fields.support import window_and_grad


def test_window_fused_matches_reference():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1.4, 1.4, (500, 8, 3)), jnp.float32)
    w_ref, dw_ref = window_and_grad(x)
    w, dw = window_and_grad_fused(x)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-5, atol=1e-6)
