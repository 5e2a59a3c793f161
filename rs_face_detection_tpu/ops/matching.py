"""Embedding matching: 1:1 verification and 1:N gallery identification.

The reference stops at producing the 512-d feature (its thresholds for 1:1
comparison live in the eKYC config: same_person 0.4, same_ekyc 0.3 —
ekyc_pipeline/config.rs:37-38); matching itself was left to the caller.
This module completes the capability TPU-first: cosine scoring is one
(Q, D) x (D, N) matmul — pure MXU work — so identifying a batch of probes
against a million-row gallery is a single jit dispatch.

Embeddings are assumed L2-normalized per row (the pipeline emits them so);
`normalize_rows` is provided for external vectors.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def normalize_rows(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize each row."""
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def cosine_scores(probes: jnp.ndarray, gallery: jnp.ndarray) -> jnp.ndarray:
    """(Q, D) x (N, D) -> (Q, N) cosine similarities (rows pre-normalized)."""
    return jnp.matmul(
        probes, gallery.T, preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("k",))
def search(
    probes: jnp.ndarray, gallery: jnp.ndarray, k: int = 1
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k gallery matches per probe: (scores (Q, k), indices (Q, k))."""
    scores = cosine_scores(probes, gallery)
    return jax.lax.top_k(scores, k)


def verify(
    embedding_a: np.ndarray,
    embedding_b: np.ndarray,
    threshold: float = 0.4,
) -> Tuple[bool, float]:
    """1:1 comparison (default threshold = the eKYC same-person 0.4)."""
    a = np.asarray(embedding_a, np.float32).reshape(-1)
    b = np.asarray(embedding_b, np.float32).reshape(-1)
    a = a / max(np.linalg.norm(a), 1e-12)
    b = b / max(np.linalg.norm(b), 1e-12)
    sim = float(np.dot(a, b))
    return sim >= threshold, sim


class Gallery:
    """Identity gallery over L2-normalized embeddings.

    Enrollment is host-side bookkeeping; identification runs on device.  The
    matrix is kept device-resident and rebuilt lazily after enrollment
    changes.
    """

    def __init__(self, embedding_dim: int = 512) -> None:
        self.embedding_dim = embedding_dim
        self._labels: list = []
        self._rows: list = []
        self._matrix = None  # device copy, rebuilt lazily

    def __len__(self) -> int:
        return len(self._labels)

    def enroll(self, label, embedding: np.ndarray) -> None:
        vec = np.asarray(embedding, np.float32).reshape(-1)
        if vec.shape[0] != self.embedding_dim:
            raise ValueError(
                f"embedding dim {vec.shape[0]} != gallery dim {self.embedding_dim}"
            )
        vec = vec / max(np.linalg.norm(vec), 1e-12)
        self._labels.append(label)
        self._rows.append(vec)
        self._matrix = None

    def remove(self, label) -> int:
        """Remove all enrollments with this label; returns how many."""
        keep = [(l, r) for l, r in zip(self._labels, self._rows) if l != label]
        removed = len(self._labels) - len(keep)
        self._labels = [l for l, _ in keep]
        self._rows = [r for _, r in keep]
        self._matrix = None
        return removed

    def identify(
        self, embeddings: np.ndarray, threshold: float = 0.4, k: int = 1
    ):
        """Identify (Q, D) probes; returns a list of per-probe match lists.

        Each match is (label, score); below-threshold candidates are dropped
        (an empty list means "unknown").
        """
        if not self._labels:
            return [[] for _ in range(np.atleast_2d(embeddings).shape[0])]
        probes = np.atleast_2d(np.asarray(embeddings, np.float32))
        probes = probes / np.maximum(
            np.linalg.norm(probes, axis=1, keepdims=True), 1e-12
        )
        if self._matrix is None:
            self._matrix = jnp.asarray(np.stack(self._rows))
        kk = min(k, len(self._labels))
        scores, idx = jax.device_get(
            search(jnp.asarray(probes), self._matrix, k=kk)
        )
        out = []
        for q in range(probes.shape[0]):
            out.append(
                [
                    (self._labels[int(i)], float(s))
                    for s, i in zip(scores[q], idx[q])
                    if s >= threshold
                ]
            )
        return out
