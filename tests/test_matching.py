"""1:1 verification and 1:N gallery identification."""

import jax.numpy as jnp
import numpy as np
import pytest

from rs_face_detection_tpu.ops.matching import (
    Gallery,
    cosine_scores,
    normalize_rows,
    search,
    verify,
)


def _unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


def test_verify_thresholds():
    a = _unit(np.ones(8))
    ok, sim = verify(a, a)
    assert ok and sim == pytest.approx(1.0)
    b = _unit(np.concatenate([np.ones(4), -np.ones(4)]))
    ok, sim = verify(a, b, threshold=0.4)
    assert not ok and sim == pytest.approx(0.0, abs=1e-6)


def test_search_topk():
    rng = np.random.default_rng(0)
    gallery = normalize_rows(jnp.asarray(rng.normal(size=(50, 16)).astype(np.float32)))
    probes = gallery[jnp.asarray([7, 33])]
    scores, idx = search(probes, gallery, k=3)
    assert idx.shape == (2, 3)
    assert int(idx[0, 0]) == 7 and int(idx[1, 0]) == 33
    assert float(scores[0, 0]) == pytest.approx(1.0, abs=1e-5)
    # Scores descend.
    assert (np.diff(np.asarray(scores), axis=1) <= 1e-6).all()


def test_gallery_lifecycle():
    rng = np.random.default_rng(1)
    g = Gallery(embedding_dim=16)
    people = {name: _unit(rng.normal(size=16)) for name in ("ana", "bo", "kim")}
    for name, vec in people.items():
        g.enroll(name, vec)
    assert len(g) == 3

    # Identify a noisy probe of 'bo'.
    probe = _unit(people["bo"] + rng.normal(0, 0.05, 16).astype(np.float32))
    matches = g.identify(probe, threshold=0.5)
    assert matches[0][0][0] == "bo"
    assert matches[0][0][1] > 0.9

    # Unknown probe (orthogonalized against all enrollments) -> empty.
    q = rng.normal(size=16).astype(np.float32)
    for v in people.values():
        q -= np.dot(q, v) * v
    assert g.identify(_unit(q), threshold=0.4) == [[]]

    # Removal works and invalidates the device matrix.
    assert g.remove("bo") == 1
    matches = g.identify(probe, threshold=0.0)
    assert matches[0][0][0] != "bo"

    # Dim mismatch errors.
    with pytest.raises(ValueError):
        g.enroll("x", np.ones(8, np.float32))

    # Empty gallery.
    g2 = Gallery(16)
    assert g2.identify(probe) == [[]]


def test_gallery_batch_probes():
    rng = np.random.default_rng(2)
    g = Gallery(8)
    for i in range(5):
        g.enroll(i, _unit(rng.normal(size=8)))
    probes = np.stack([_unit(rng.normal(size=8)) for _ in range(4)])
    out = g.identify(probes, threshold=-1.0, k=2)
    assert len(out) == 4
    assert all(len(m) == 2 for m in out)
