"""Closed-form similarity transform for 5-point face alignment.

The reference estimates the landmark->template similarity with OpenCV's
estimate_affine_partial_2d under LMEDS with 2000 refinement iterations
(/root/reference/src/pipeline/module/face_alignment.rs:50-59).  For exactly 5
clean detector landmarks, LMEDS's robust subset search is redundant — both
estimators converge to the least-squares non-reflective similarity
[[a, -b, tx], [b, a, ty]] — so we solve it in closed form via the normal
equations: after mean-centering,

    a = sum(src_c . dst_c) / sum|src_c|^2
    b = sum(cross(src_c, dst_c)) / sum|src_c|^2

This is algebraically the Umeyama (1991) solution restricted to det(R) = +1
(a 2x2 similarity of this form cannot reflect), needs no SVD or iteration, is
precise in float32, and is trivially jit-able and batch-vmappable.

Documented deviation: on grossly corrupted landmarks LMEDS could reject an
outlier point where least squares averages it in; detector keypoints are
jointly regressed so this case does not arise in the pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def umeyama_similarity(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Least-squares similarity transform mapping (N, 2) src -> dst.

    Returns the 2x3 matrix [[a, -b, tx], [b, a, ty]] minimizing
    ||dst - (M @ [src, 1])||^2 — the analog of estimate_affine_partial_2d.
    """
    src = jnp.asarray(src, dtype=jnp.float32)
    dst = jnp.asarray(dst, dtype=jnp.float32)

    mu_src = src.mean(axis=0)
    mu_dst = dst.mean(axis=0)
    src_c = src - mu_src
    dst_c = dst - mu_dst

    denom = (src_c**2).sum()
    denom = jnp.where(denom < 1e-12, 1e-12, denom)
    a = (src_c * dst_c).sum() / denom
    b = (src_c[:, 0] * dst_c[:, 1] - src_c[:, 1] * dst_c[:, 0]).sum() / denom

    rot = jnp.array([[1.0, 0.0], [0.0, 1.0]]) * a + jnp.array(
        [[0.0, -1.0], [1.0, 0.0]]
    ) * b
    t = mu_dst - rot @ mu_src
    return jnp.concatenate([rot, t[:, None]], axis=1)


def umeyama_similarity_np(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Host/numpy version of :func:`umeyama_similarity` (same math, f64)."""
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)

    mu_src = src.mean(axis=0)
    mu_dst = dst.mean(axis=0)
    src_c = src - mu_src
    dst_c = dst - mu_dst

    denom = max((src_c**2).sum(), 1e-12)
    a = (src_c * dst_c).sum() / denom
    b = (src_c[:, 0] * dst_c[:, 1] - src_c[:, 1] * dst_c[:, 0]).sum() / denom

    rot = np.array([[a, -b], [b, a]])
    t = mu_dst - rot @ mu_src
    return np.concatenate([rot, t[:, None]], axis=1).astype(np.float32)
