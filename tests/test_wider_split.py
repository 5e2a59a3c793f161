"""Official WIDER easy/medium/hard protocol (ops/wider_split) + batched eval.

No WIDER data ships in this environment, so the tests synthesize the .mat
side files (scipy.io.savemat in the official MATLAB cell layout) and
known-answer prediction sets, then validate parsing, ignore semantics, and
per-difficulty AP.  The batched DetectionServer eval path is checked for
parity against the serial runner on the generated fixture tree.
"""

import os

import numpy as np
import pytest

scipy_io = pytest.importorskip("scipy.io")

from rs_face_detection_tpu.ops.wider_split import (
    evaluate_predictions,
    evaluate_wider_official,
    find_split_mats,
    image_eval,
    load_gt_mat,
    load_split_mat,
    voc_ap,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _cell(entries):
    """Column cell array (N, 1) of arbitrary objects, MATLAB-style."""
    out = np.empty((len(entries), 1), dtype=object)
    for i, e in enumerate(entries):
        out[i, 0] = e
    return out


def _write_mats(tmp_path):
    """Two events, three images, official layout.

    GT (x y w h):
      0--Ev/img_a: three 10x10 faces at x = 0, 20, 40 (y=0)
      0--Ev/img_b: one 20x20 face at (5, 5)
      1--Ev/img_c: one 10x10 face at (0, 0)
    Keep lists (1-based, per official convention):
      easy:   img_a [1],       img_b [],    img_c [1]
      medium: img_a [1, 2],    img_b [1],   img_c [1]
      hard:   img_a [1, 2, 3], img_b [1],   img_c [1]
    """
    ev_files = [["img_a", "img_b"], ["img_c"]]
    ev_boxes = [
        [
            np.array([[0, 0, 10, 10], [20, 0, 10, 10], [40, 0, 10, 10]], float),
            np.array([[5, 5, 20, 20]], float),
        ],
        [np.array([[0, 0, 10, 10]], float)],
    ]
    gt_mat = str(tmp_path / "wider_face_val.mat")
    scipy_io.savemat(
        gt_mat,
        {
            "event_list": _cell(["0--Ev", "1--Ev"]),
            "file_list": _cell([_cell(f) for f in ev_files]),
            "face_bbx_list": _cell([_cell(b) for b in ev_boxes]),
        },
    )
    keeps = {
        "easy": [[[1.0], []], [[1.0]]],
        "medium": [[[1.0, 2.0], [1.0]], [[1.0]]],
        "hard": [[[1.0, 2.0, 3.0], [1.0]], [[1.0]]],
    }
    split_mats = {}
    for difficulty, ev_keeps in keeps.items():
        path = str(tmp_path / f"wider_{difficulty}_val.mat")
        scipy_io.savemat(
            path,
            {
                "event_list": _cell(["0--Ev", "1--Ev"]),
                "file_list": _cell([_cell(f) for f in ev_files]),
                "gt_list": _cell(
                    [
                        _cell([np.array(k, float).reshape(-1, 1) for k in ev])
                        for ev in ev_keeps
                    ]
                ),
            },
        )
        split_mats[difficulty] = path
    return gt_mat, split_mats


def _perfect_predictions():
    """x1y1x2y2+score detections exactly matching every GT face."""
    return {
        "0--Ev/img_a": np.array(
            [
                [0, 0, 9, 9, 0.9],
                [20, 0, 29, 9, 0.8],
                [40, 0, 49, 9, 0.7],
            ],
            np.float32,
        ),
        "0--Ev/img_b": np.array([[5, 5, 24, 24, 0.95]], np.float32),
        "1--Ev/img_c": np.array([[0, 0, 9, 9, 0.85]], np.float32),
    }


def test_mat_parsing_roundtrip(tmp_path):
    gt_mat, split_mats = _write_mats(tmp_path)
    gt = load_gt_mat(gt_mat)
    assert set(gt) == {"0--Ev/img_a", "0--Ev/img_b", "1--Ev/img_c"}
    # x y w h -> x2 = x + w (official eval_tools arithmetic; the +1 area
    # convention then scores GT as (w+1)(h+1), matching published numbers)
    np.testing.assert_allclose(
        gt["0--Ev/img_a"],
        [[0, 0, 10, 10], [20, 0, 30, 10], [40, 0, 50, 10]],
    )
    easy = load_split_mat(split_mats["easy"])
    np.testing.assert_array_equal(easy["0--Ev/img_a"], [0])  # 1-based -> 0-based
    assert easy["0--Ev/img_b"].size == 0
    hard = load_split_mat(split_mats["hard"])
    np.testing.assert_array_equal(hard["0--Ev/img_a"], [0, 1, 2])
    assert find_split_mats(str(tmp_path)) == split_mats


def test_perfect_predictions_ap_one_all_difficulties(tmp_path):
    gt_mat, split_mats = _write_mats(tmp_path)
    gt = load_gt_mat(gt_mat)
    splits = {d: load_split_mat(p) for d, p in split_mats.items()}
    res = evaluate_predictions(_perfect_predictions(), gt, splits)
    assert res["easy"]["num_kept_faces"] == 2.0
    assert res["medium"]["num_kept_faces"] == 4.0
    assert res["hard"]["num_kept_faces"] == 5.0
    for difficulty in ("easy", "medium", "hard"):
        # Detections on non-kept faces are IGNORED (not false positives),
        # so every difficulty scores a clean 1.0.
        assert res[difficulty]["ap"] == pytest.approx(1.0, abs=2e-3), (
            difficulty,
            res,
        )


def test_high_scoring_false_positive_lowers_ap(tmp_path):
    gt_mat, split_mats = _write_mats(tmp_path)
    gt = load_gt_mat(gt_mat)
    splits = {d: load_split_mat(p) for d, p in split_mats.items()}
    preds = _perfect_predictions()
    preds["0--Ev/img_a"] = np.vstack(
        [preds["0--Ev/img_a"], [[100, 100, 120, 120, 0.99]]]
    ).astype(np.float32)
    res = evaluate_predictions(preds, gt, splits)
    clean = evaluate_predictions(_perfect_predictions(), gt, splits)
    for difficulty in ("easy", "medium", "hard"):
        assert res[difficulty]["ap"] < clean[difficulty]["ap"] - 0.01


def test_missed_kept_face_caps_recall(tmp_path):
    gt_mat, split_mats = _write_mats(tmp_path)
    gt = load_gt_mat(gt_mat)
    splits = {d: load_split_mat(p) for d, p in split_mats.items()}
    preds = _perfect_predictions()
    preds["0--Ev/img_a"] = preds["0--Ev/img_a"][:1]  # drop faces 2 and 3
    res = evaluate_predictions(preds, gt, splits)
    # easy keeps only face 1 of img_a -> unaffected; hard loses 2 of 5.
    assert res["easy"]["ap"] == pytest.approx(1.0, abs=2e-3)
    assert res["hard"]["ap"] == pytest.approx(3.0 / 5.0, abs=0.02)


def test_single_event_mat_parses_all_images(tmp_path):
    """A 1-event mat must not collapse into its per-image cell (each image
    would otherwise be treated as an event and only the first parsed)."""
    gt_mat = str(tmp_path / "one_event.mat")
    scipy_io.savemat(
        gt_mat,
        {
            "event_list": _cell(["0--Solo"]),
            "file_list": _cell([_cell(["img_x", "img_y"])]),
            "face_bbx_list": _cell(
                [
                    _cell(
                        [
                            np.array([[0, 0, 10, 10]], float),
                            np.array([[5, 5, 8, 8], [30, 30, 6, 6]], float),
                        ]
                    )
                ]
            ),
        },
    )
    gt = load_gt_mat(gt_mat)
    assert set(gt) == {"0--Solo/img_x", "0--Solo/img_y"}
    assert gt["0--Solo/img_y"].shape == (2, 4)


def test_split_mat_without_event_list_is_loud(tmp_path):
    path = str(tmp_path / "broken.mat")
    scipy_io.savemat(
        path,
        {
            "file_list": _cell([_cell(["img_a"])]),
            "gt_list": _cell([_cell([np.array([[1.0]])])]),
        },
    )
    with pytest.raises(ValueError, match="event_list"):
        load_split_mat(path)


def test_zero_gt_images_do_not_count_detections_as_fp(tmp_path):
    """Official semantics: images with no GT faces are skipped entirely."""
    gt_mat, split_mats = _write_mats(tmp_path)
    gt = load_gt_mat(gt_mat)
    splits = {d: load_split_mat(p) for d, p in split_mats.items()}
    # Give img_b zero GT boxes and a high-scoring detection: the detection
    # must be invisible to the curve, not a false positive.
    gt["0--Ev/img_b"] = np.zeros((0, 4), np.float32)
    for keep in splits.values():
        keep["0--Ev/img_b"] = np.zeros((0,), np.int64)
    preds = _perfect_predictions()
    preds["0--Ev/img_b"] = np.array([[50, 50, 60, 60, 0.99]], np.float32)
    res = evaluate_predictions(preds, gt, splits)
    assert res["easy"]["ap"] == pytest.approx(1.0, abs=2e-3)
    assert res["hard"]["ap"] == pytest.approx(1.0, abs=2e-3)


def test_image_eval_ignore_semantics():
    gt = np.array([[0, 0, 9, 9], [20, 0, 29, 9]], np.float32)
    keep = np.array([False, True])
    pred = np.array(
        [[0, 0, 9, 9, 0.9], [20, 0, 29, 9, 0.8], [50, 50, 59, 59, 0.7]],
        np.float32,
    )
    pred_recall, proposal = image_eval(pred, gt, keep, 0.5)
    # pred 0 hits an ignored face: not a proposal, recalls nothing.
    np.testing.assert_array_equal(proposal, [-1, 1, 1])
    np.testing.assert_array_equal(pred_recall, [0, 1, 1])


def test_voc_ap_known_values():
    assert voc_ap(np.array([1.0]), np.array([1.0])) == pytest.approx(1.0)
    assert voc_ap(np.array([0.5]), np.array([1.0])) == pytest.approx(0.5)
    # Precision envelope: late high precision lifts earlier recalls.
    ap = voc_ap(np.array([0.5, 1.0]), np.array([0.5, 1.0]))
    assert ap == pytest.approx(1.0)


def test_evaluate_wider_official_end_to_end(tmp_path):
    """Driver over a real directory tree with a stub batched detector."""
    import cv2

    gt_mat, split_mats = _write_mats(tmp_path)
    images_root = tmp_path / "images"
    preds = _perfect_predictions()
    for key in preds:
        p = images_root / f"{key}.jpg"
        p.parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(p), np.zeros((64, 64, 3), np.uint8))

    seen_paths = []

    def detect_many(paths):
        seen_paths.extend(paths)
        for path in paths:
            key = os.path.splitext(os.path.relpath(path, images_root))[0]
            yield preds[key.replace(os.sep, "/")], np.zeros((0, 5, 2))

    res = evaluate_wider_official(
        detect_many, str(images_root), gt_mat, split_mats
    )
    assert len(seen_paths) == 3  # one detection pass scores all difficulties
    for difficulty in ("easy", "medium", "hard"):
        assert res[difficulty]["ap"] == pytest.approx(1.0, abs=2e-3)


def test_batched_eval_parity_with_serial(tmp_path):
    """evaluate_wider_batched via DetectionServer == evaluate_wider serial."""
    from test_wider import _build_wider_tree

    from rs_face_detection_tpu.configs import FaceDetectionConfig
    from rs_face_detection_tpu.ops.wider import (
        evaluate_wider,
        evaluate_wider_batched,
    )
    from rs_face_detection_tpu.parallel.serving import DetectionServer
    from rs_face_detection_tpu.utils.fixtures import load_trained_detector

    images_root, gt_path = _build_wider_tree(tmp_path)
    cfg = FaceDetectionConfig(
        image_size=(64, 64),
        confidence_threshold=0.3,
        max_candidates=64,
        max_detections=8,
    )
    det = load_trained_detector(os.path.join(FIXTURES, "trained_mnet64.npz"), cfg)

    def detector(img):
        boxes, kps = det(img)
        return np.asarray(boxes, np.float32).reshape(-1, 5), kps

    serial = evaluate_wider(detector, images_root, gt_path)

    server = DetectionServer(det, batch_size=4)

    def detect_many(paths):
        def payloads():
            for p in paths:
                with open(p, "rb") as f:
                    yield f.read()

        for batch in server.detect_stream(payloads()):
            yield from batch

    batched = evaluate_wider_batched(detect_many, images_root, gt_path)
    assert batched["num_images"] == serial["num_images"]
    assert batched["ap"] == pytest.approx(serial["ap"], abs=1e-6)


def test_dump_predictions_roundtrip_and_rescore(tmp_path):
    """The official submission-tree writer is lossless for scoring: the
    dumped eval_tools-format files read back to the same corner boxes
    (+1 w/h convention both ways) and re-score to identical APs — so the
    external eval_tools / widerface_evaluate scorers see exactly the
    sweep the in-tree protocol scored."""
    from rs_face_detection_tpu.ops.wider_split import (
        dump_predictions,
        load_dumped_predictions,
    )

    gt_mat, split_mats = _write_mats(tmp_path)
    predictions = _perfect_predictions()
    direct = evaluate_predictions(
        predictions,
        load_gt_mat(gt_mat),
        {d: load_split_mat(p) for d, p in split_mats.items()},
    )

    out = str(tmp_path / "submission")
    assert dump_predictions(predictions, out) == len(predictions)
    # official layout: one <event>/<image>.txt per image, header lines
    path = os.path.join(out, "0--Ev", "img_a.txt")
    lines = open(path).read().splitlines()
    assert lines[0] == "img_a" and lines[1] == "3"
    # +1 convention: the 10px-wide face at x1=0,x2=9 dumps as w=10
    assert lines[2].split()[:4] == ["0.000", "0.000", "10.000", "10.000"]

    loaded = load_dumped_predictions(out)
    assert set(loaded) == set(predictions)
    for k in predictions:
        np.testing.assert_allclose(loaded[k], predictions[k], atol=1e-3)

    rescored = evaluate_predictions(
        loaded,
        load_gt_mat(gt_mat),
        {d: load_split_mat(p) for d, p in split_mats.items()},
    )
    for d in direct:
        assert rescored[d]["ap"] == pytest.approx(direct[d]["ap"], abs=1e-6)


def test_dump_predictions_empty_image(tmp_path):
    from rs_face_detection_tpu.ops.wider_split import (
        dump_predictions,
        load_dumped_predictions,
    )

    dump_predictions({"0--Ev/empty": np.zeros((0, 5), np.float32)}, str(tmp_path))
    lines = open(tmp_path / "0--Ev" / "empty.txt").read().splitlines()
    assert lines == ["empty", "0"]
    loaded = load_dumped_predictions(str(tmp_path))
    assert loaded["0--Ev/empty"].shape == (0, 5)
