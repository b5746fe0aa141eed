"""Matrix-square-root trace for FID, eigh-based, on device.

The reference calls scipy.linalg.sqrtm on Σr·Σf (evaluation.py:38-41,465).
FID only needs tr((Σr·Σf)^{1/2}); for PSD Σr that equals the sum of square
roots of the eigenvalues of the symmetric product Σr^{1/2}·Σf·Σr^{1/2}, so
everything reduces to two symmetric eigendecompositions — no Schur solver
needed, and it runs under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psd_sqrt(mat: jnp.ndarray) -> jnp.ndarray:
    """Symmetric PSD square root via eigh (eigenvalues clipped at 0)."""
    w, v = jnp.linalg.eigh(mat)
    w = jnp.maximum(w, 0.0)
    return (v * jnp.sqrt(w)[None, :]) @ v.T


def trace_sqrt_product(cov_a: jnp.ndarray, cov_b: jnp.ndarray) -> jnp.ndarray:
    """tr((cov_a @ cov_b)^{1/2}) for PSD inputs."""
    sa = psd_sqrt(cov_a)
    inner = sa @ cov_b @ sa
    w = jnp.linalg.eigvalsh(inner)
    return jnp.sum(jnp.sqrt(jnp.maximum(w, 0.0)))


def frechet_distance(
    mu_a: jnp.ndarray, cov_a: jnp.ndarray,
    mu_b: jnp.ndarray, cov_b: jnp.ndarray,
) -> jnp.ndarray:
    """||mu_a - mu_b||^2 + tr(cov_a + cov_b - 2 (cov_a cov_b)^{1/2})
    (reference evaluation.py:461-468; same 1e-6 diagonal jitter is applied
    by the caller)."""
    diff = mu_a - mu_b
    return diff @ diff + jnp.trace(cov_a) + jnp.trace(cov_b) - 2.0 * trace_sqrt_product(cov_a, cov_b)
