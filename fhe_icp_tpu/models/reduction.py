"""Dimension reduction 768 -> 128 on TPU via jnp SVD.

Re-implements the reference's `DimensionReducer`
(/root/reference/dimension_reduction.py:12-122): PCA / truncated-SVD /
Gaussian random projection with deterministic seeding (random_state=42),
explained-variance and similarity-preservation metrics, and npz-based
persistence (replacing the reference's pickle).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class DimensionReducer:
    def __init__(self, target_dim: int = 128, method: str = "pca",
                 random_state: int = 42):
        if method not in ("pca", "svd", "random"):
            raise ValueError(f"unknown method {method!r}")
        self.target_dim = target_dim
        self.method = method
        self.random_state = random_state
        self.mean_: Optional[np.ndarray] = None
        self.components_: Optional[np.ndarray] = None   # (in_dim, target_dim)
        self.explained_variance_ratio_: Optional[np.ndarray] = None
        self.fitted = False

    def fit(self, x: np.ndarray) -> "DimensionReducer":
        x = jnp.asarray(x, dtype=jnp.float32)
        k = self.target_dim
        if self.method == "random":
            key = jax.random.PRNGKey(self.random_state)
            w = jax.random.normal(key, (x.shape[1], k)) / np.sqrt(k)
            self.mean_ = np.zeros(x.shape[1], dtype=np.float32)
            self.components_ = np.asarray(w, dtype=np.float32)
            self.explained_variance_ratio_ = None
        else:
            center = self.method == "pca"
            mean = jnp.mean(x, axis=0) if center else jnp.zeros(x.shape[1])
            xc = x - mean
            # Economy SVD on device; components = top-k right singular vectors.
            _, s, vt = jnp.linalg.svd(xc, full_matrices=False)
            self.mean_ = np.asarray(mean, dtype=np.float32)
            self.components_ = np.asarray(vt[:k].T, dtype=np.float32)
            var = np.asarray(s) ** 2
            self.explained_variance_ratio_ = (var[:k] / var.sum()).astype(
                np.float32)
        self.fitted = True
        return self

    def transform(self, x: np.ndarray) -> np.ndarray:
        if not self.fitted:
            raise RuntimeError("reducer not fitted")
        x = np.atleast_2d(np.asarray(x, dtype=np.float32))
        out = (x - self.mean_) @ self.components_
        return out.astype(np.float32)

    def fit_transform(self, x: np.ndarray) -> np.ndarray:
        return self.fit(x).transform(x)

    # -- metrics (reference dimension_reduction.py:125-250) ----------------
    def similarity_preservation(self, x: np.ndarray, n_pairs: int = 200) -> float:
        """Correlation between original and reduced cosine similarities."""
        rng = np.random.default_rng(self.random_state)
        x = np.asarray(x, dtype=np.float32)
        r = self.transform(x)

        def cos(m):
            n = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-9)
            return n @ n.T

        c_full, c_red = cos(x), cos(r)
        idx = np.triu_indices(len(x), k=1)
        if len(idx[0]) > n_pairs:
            sel = rng.choice(len(idx[0]), n_pairs, replace=False)
            idx = (idx[0][sel], idx[1][sel])
        return float(np.corrcoef(c_full[idx], c_red[idx])[0, 1])

    def reconstruction_error(self, x: np.ndarray) -> float:
        if self.method == "random":
            return float("nan")
        x = np.asarray(x, dtype=np.float32)
        r = self.transform(x)
        back = r @ self.components_.T + self.mean_
        return float(np.mean((x - back) ** 2))

    # -- persistence -------------------------------------------------------
    def save(self, path) -> None:
        np.savez(
            path,
            target_dim=self.target_dim,
            method=self.method,
            random_state=self.random_state,
            mean=self.mean_,
            components=self.components_,
            evr=(self.explained_variance_ratio_
                 if self.explained_variance_ratio_ is not None else np.zeros(0)),
        )

    @classmethod
    def load(cls, path) -> "DimensionReducer":
        z = np.load(path, allow_pickle=False)
        r = cls(int(z["target_dim"]), str(z["method"]), int(z["random_state"]))
        r.mean_ = z["mean"]
        r.components_ = z["components"]
        evr = z["evr"]
        r.explained_variance_ratio_ = evr if evr.size else None
        r.fitted = True
        return r
