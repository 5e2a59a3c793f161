"""NMS parity: jit-safe mask variants vs the reference-semantics host oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from rs_face_detection_tpu.ops.nms import (
    nms_mask_fixpoint,
    nms_mask_greedy,
    nms_numpy,
)


def _golden_case():
    # The reference's own smoke case (processing/nms.rs:74-87), thresh 0.4.
    dets = np.array(
        [
            [100.0, 100.0, 210.0, 210.0, 0.72],
            [250.0, 250.0, 420.0, 420.0, 0.8],
            [220.0, 220.0, 320.0, 330.0, 0.92],
            [100.0, 100.0, 210.0, 210.0, 0.6],
        ],
        dtype=np.float32,
    )
    return dets, 0.4, [2, 1, 0]


def test_nms_numpy_golden():
    dets, thresh, expected = _golden_case()
    assert nms_numpy(dets, thresh) == expected


def _sorted_inputs(dets):
    order = np.argsort(-dets[:, 4], kind="stable")
    boxes = dets[order, :4]
    valid = np.ones(len(order), dtype=bool)
    return order, boxes, valid


def _mask_to_keep_indices(order, keep_mask):
    return [int(order[i]) for i in range(len(order)) if keep_mask[i]]


@pytest.mark.parametrize("fn", [nms_mask_greedy, nms_mask_fixpoint])
def test_mask_nms_matches_golden(fn):
    dets, thresh, expected = _golden_case()
    order, boxes, valid = _sorted_inputs(dets)
    keep = np.asarray(fn(jnp.asarray(boxes), jnp.asarray(valid), thresh))
    assert _mask_to_keep_indices(order, keep) == expected


@pytest.mark.parametrize("fn", [nms_mask_greedy, nms_mask_fixpoint])
@pytest.mark.parametrize("seed", range(8))
def test_mask_nms_matches_oracle_random(fn, seed):
    rng = np.random.default_rng(seed)
    n = 64
    ctr = rng.uniform(0, 300, size=(n, 2)).astype(np.float32)
    wh = rng.uniform(5, 120, size=(n, 2)).astype(np.float32)
    dets = np.concatenate(
        [
            ctr - wh / 2,
            ctr + wh / 2,
            rng.uniform(0, 1, size=(n, 1)).astype(np.float32),
        ],
        axis=1,
    )
    for thresh in (0.2, 0.45, 0.7):
        expected = nms_numpy(dets, thresh)
        order, boxes, valid = _sorted_inputs(dets)
        keep = np.asarray(fn(jnp.asarray(boxes), jnp.asarray(valid), thresh))
        assert _mask_to_keep_indices(order, keep) == expected


def test_fixpoint_handles_suppression_chains():
    # Adversarial chain: each box overlaps only its neighbour, so greedy keeps
    # every other box; suppression-DAG depth equals chain length.
    n = 32
    dets = np.zeros((n, 5), dtype=np.float32)
    for i in range(n):
        dets[i] = [i * 6.0, 0.0, i * 6.0 + 12.0, 12.0, 1.0 - i * 0.01]
    expected = nms_numpy(dets, 0.3)
    order, boxes, valid = _sorted_inputs(dets)
    keep = np.asarray(nms_mask_fixpoint(jnp.asarray(boxes), jnp.asarray(valid), 0.3))
    assert _mask_to_keep_indices(order, keep) == expected
    assert expected == list(range(0, n, 2))


@pytest.mark.parametrize("fn", [nms_mask_greedy, nms_mask_fixpoint])
def test_mask_nms_respects_validity_padding(fn):
    dets, thresh, expected = _golden_case()
    order, boxes, valid = _sorted_inputs(dets)
    # Pad with garbage rows marked invalid: results must not change.
    pad = np.tile(boxes[:1], (4, 1))
    boxes_p = np.concatenate([boxes, pad], axis=0)
    valid_p = np.concatenate([valid, np.zeros(4, dtype=bool)])
    keep = np.asarray(fn(jnp.asarray(boxes_p), jnp.asarray(valid_p), thresh))
    assert not keep[4:].any()
    assert _mask_to_keep_indices(order, keep[:4]) == expected
