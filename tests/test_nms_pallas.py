"""Pallas NMS kernel parity vs the host oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rs_face_detection_tpu.ops.nms import nms_numpy
from rs_face_detection_tpu.ops.nms_pallas import nms_mask_pallas


def _sorted_inputs(dets):
    order = np.argsort(-dets[:, 4], kind="stable")
    return order, dets[order, :4], np.ones(len(order), dtype=bool)


def _keep_indices(order, mask):
    return [int(order[i]) for i in range(len(order)) if mask[i]]


def test_pallas_golden_case():
    dets = np.array(
        [
            [100.0, 100.0, 210.0, 210.0, 0.72],
            [250.0, 250.0, 420.0, 420.0, 0.8],
            [220.0, 220.0, 320.0, 330.0, 0.92],
            [100.0, 100.0, 210.0, 210.0, 0.6],
        ],
        dtype=np.float32,
    )
    order, boxes, valid = _sorted_inputs(dets)
    keep = np.asarray(
        nms_mask_pallas(jnp.asarray(boxes), jnp.asarray(valid), 0.4, interpret=True)
    )
    assert _keep_indices(order, keep) == [2, 1, 0]


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("n", [16, 130, 256])
def test_pallas_matches_oracle_random(seed, n):
    rng = np.random.default_rng(seed)
    ctr = rng.uniform(0, 400, size=(n, 2)).astype(np.float32)
    wh = rng.uniform(5, 150, size=(n, 2)).astype(np.float32)
    dets = np.concatenate(
        [ctr - wh / 2, ctr + wh / 2, rng.uniform(0, 1, size=(n, 1)).astype(np.float32)],
        axis=1,
    )
    expected = nms_numpy(dets, 0.45)
    order, boxes, valid = _sorted_inputs(dets)
    keep = np.asarray(
        nms_mask_pallas(jnp.asarray(boxes), jnp.asarray(valid), 0.45, interpret=True)
    )
    assert _keep_indices(order, keep) == expected


def test_pallas_suppression_chain():
    n = 40
    dets = np.zeros((n, 5), dtype=np.float32)
    for i in range(n):
        dets[i] = [i * 6.0, 0.0, i * 6.0 + 12.0, 12.0, 1.0 - i * 0.01]
    order, boxes, valid = _sorted_inputs(dets)
    keep = np.asarray(
        nms_mask_pallas(jnp.asarray(boxes), jnp.asarray(valid), 0.3, interpret=True)
    )
    assert _keep_indices(order, keep) == list(range(0, n, 2))


def test_pallas_validity_padding():
    dets = np.array(
        [[0, 0, 10, 10, 0.9], [1, 1, 11, 11, 0.8], [50, 50, 60, 60, 0.7]],
        dtype=np.float32,
    )
    order, boxes, valid = _sorted_inputs(dets)
    valid[1] = False  # pretend padded
    keep = np.asarray(
        nms_mask_pallas(jnp.asarray(boxes), jnp.asarray(valid), 0.45, interpret=True)
    )
    assert keep[0] and not keep[1] and keep[2]
