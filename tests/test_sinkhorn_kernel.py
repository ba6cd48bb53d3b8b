"""Fused correlation+Sinkhorn kernel vs the XLA matching path (interpret)."""
import numpy as np
import jax.numpy as jnp
import pytest

from s2m2_tpu.models.matching import optimal_transport
from s2m2_tpu.ops.sinkhorn import fused_correlation_ot


@pytest.mark.parametrize("use_positivity", [True, False])
def test_fused_ot_matches_xla(rng, use_positivity):
    b, h, w, c = 1, 4, 32, 16
    f0 = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))

    cv_ref = jnp.einsum("bhic,bhjc->bhij", f0, f1)
    tri = jnp.triu(jnp.ones((w, w), bool), k=1) if use_positivity \
        else jnp.zeros((w, w), bool)
    cv_masked = jnp.where(tri, jnp.asarray(-1e4, jnp.float32), cv_ref)
    prob_ref = jnp.where(tri, 0.0, optimal_transport(cv_masked, 3))

    prob, cv = fused_correlation_ot(f0, f1, ot_iter=3,
                                    use_positivity=use_positivity,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(cv), np.asarray(cv_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(prob), np.asarray(prob_ref),
                               rtol=1e-4, atol=1e-6)
