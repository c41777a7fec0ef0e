"""Principal component analysis.

Role of the reference ``PCA.py``: covariance (:13), eigen-decomposition PCA
with standardization (``basic_pca``, :22-40) and mean-centering only
(``PCA``, :63-87).

The eigenproblem is small (nch x nch) and runs in host LAPACK (float64);
the data projection — the only O(N) work — is a device matmul when the
input is large.
"""
from __future__ import annotations

import numpy as np

__all__ = ["cov", "basic_pca", "PCA", "test_data"]


def cov(data):
    """Covariance of mean-centered data normalized by N
    (reference ``cov``, :13-19; NumPy's ``cov`` uses N-1)."""
    data = np.asarray(data)
    return np.dot(data.T, data) / data.shape[0]


def _project(data, evecs):
    """Device matmul for the projection when worthwhile, else host."""
    if data.size >= 1 << 16:
        import jax.numpy as jnp
        import jax
        out = jax.jit(lambda a, b: jnp.dot(a, b,
                                           precision="highest"))(
            jnp.asarray(data, dtype=jnp.float32),
            jnp.asarray(evecs, dtype=jnp.float32))
        return np.asarray(out, dtype=np.float64)
    return np.dot(data, evecs)


def basic_pca(data, pc_count=None):
    """PCA of standardized data via ``eigh`` of the covariance
    (reference ``basic_pca``, :22-40).  Mean-centers and auto-scales the
    input in place, matching the reference's semantics.

    Returns ``(U, E, V)``: projected data, eigenvalues, eigenvectors.
    """
    data = np.asarray(data, dtype=np.float64)
    data -= np.mean(data, 0)
    data /= np.std(data, 0)
    C = cov(data)
    E, V = np.linalg.eigh(C)
    key = np.argsort(E)[::-1][:pc_count]
    E, V = E[key], V[:, key]
    U = _project(data, V)
    return U, E, V


def PCA(data, dims_rescaled_data=2):
    """Mean-centering PCA (reference ``PCA``, :63-87).

    Returns ``(transformed, evals, evecs)`` with the data projected onto
    the leading ``dims_rescaled_data`` eigenvectors.
    """
    data = np.asarray(data, dtype=np.float64)
    data = data - data.mean(axis=0)
    R = np.cov(data, rowvar=False)
    evals, evecs = np.linalg.eigh(R)
    idx = np.argsort(evals)[::-1]
    evecs = evecs[:, idx]
    evals = evals[idx]
    evecs = evecs[:, :dims_rescaled_data]
    return _project(data, evecs), evals, evecs


def test_data(rng=None):
    """Two-cluster random test data (reference ``test_data``, :139-145)."""
    if rng is None:
        rng = np.random.default_rng()
    data = rng.standard_normal((150, 8))
    data[:50, 2:4] += 5
    data[50:, 2:5] += 5
    return data
