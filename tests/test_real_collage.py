"""Real-pixel multi-face golden set: official WIDER protocol end to end.

Generates a miniature WIDER-format validation tree of REAL-pixel collages
(tools/make_collage_set.py: the verified grace_hopper face composited at
multiple scales with edge-flush and partially occluded instances, JPEG
re-encoded) and drives `tools/eval_wider.py --split all [--tta]` — the
full official path: image tree -> detector -> ops/wider_split eval_tools
scoring — with the real-pixel-trained fixture detector
(tests/fixtures/trained_real64.npz, tools/make_real_fixture.py).

This hardens what synthetic-square fixtures cannot: multi-face NMS and
selection on real textures, occlusion recall, edge-anchored boxes, the
easy/medium/hard keep-list arithmetic on non-trivial assignments, and the
TTA voting protocol on real pixels (VERDICT r3 next #5; the reference
ships no fixtures at all — face_detection.rs:580-629's oracle flows are
manual).
"""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

pytest.importorskip("scipy.io")
pytest.importorskip("cv2")

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
CKPT = os.path.join(FIXTURES, "trained_real64.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT),
    reason="real-face fixtures not built (tools/make_real_fixture.py)",
)


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(TOOLS, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def collage_tree(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("collage_wider"))
    make = _load_tool("make_collage_set")
    images_root, gt_mat, split_dir = make.build_collage_set(
        out, FIXTURES, seed=0, n_images=20
    )
    return out, images_root, gt_mat, split_dir


def _run_eval_wider(root, *extra_args, capsys=None, ckpt=CKPT, size=64):
    ev = _load_tool("eval_wider")
    argv = [
        "eval_wider.py",
        "--root", root,
        "--backbone", "mobilenet025",
        "--checkpoint", ckpt,
        "--size", str(size),
        "--split", "all",
        *extra_args,
    ]
    old = sys.argv
    sys.argv = argv
    try:
        rc = ev.main()
    finally:
        sys.argv = old
    assert rc == 0
    text = capsys.readouterr().out.strip().splitlines()
    return json.loads(text[-1])


def test_collage_tree_shape(collage_tree):
    _, images_root, gt_mat, split_dir = collage_tree
    from rs_face_detection_tpu.ops.wider_split import (
        find_split_mats,
        load_gt_mat,
        load_split_mat,
    )

    gt = load_gt_mat(gt_mat)
    assert len(gt) == 20
    total = sum(len(b) for b in gt.values())
    assert total == sum(1 + i % 4 for i in range(20))  # 1..4 faces per image
    splits = find_split_mats(split_dir)
    assert set(splits) == {"easy", "medium", "hard"}
    hard = load_split_mat(splits["hard"])
    easy = load_split_mat(splits["easy"])
    n_hard = sum(len(k) for k in hard.values())
    n_easy = sum(len(k) for k in easy.values())
    assert n_hard == total  # hard keeps everything
    assert 0 < n_easy < n_hard  # easy is a strict, non-empty subset
    # every image file exists
    for key in gt:
        assert os.path.exists(os.path.join(images_root, key + ".jpg"))


def test_official_eval_real_collages_single_scale(collage_tree, capsys):
    root = collage_tree[0]
    res = _run_eval_wider(root, "--no-batched", capsys=capsys)
    assert set(res) == {"easy", "medium", "hard"}
    # Gates calibrated to the committed fixture detector on the PURIFIED
    # background tree — measured at seed 0 (2026-08-21): single-scale
    # easy/medium/hard AP = 0.986/0.992/0.927.  (The pre-purification
    # 2026-08-19 numbers, 0.750/0.768/0.678, were depressed by a GT flaw:
    # background patches could legally contain most of the portrait face,
    # so the detector's CORRECT finds scored as false positives —
    # make_collage_set.background_pool docstring.)  Margins absorb
    # jit/codec jitter; a regression in NMS, selection, letterbox, or the
    # keep-list arithmetic lands far below them.
    assert res["easy"]["ap"] >= 0.90, res
    assert res["medium"]["ap"] >= 0.90, res
    assert res["hard"]["ap"] >= 0.80, res
    # sanity: the keep-list arithmetic saw every face in hard and a strict
    # subset in easy
    total_faces = sum(1 + i % 4 for i in range(20))
    assert res["hard"]["num_kept_faces"] == total_faces
    assert 0 < res["easy"]["num_kept_faces"] < total_faces


def test_official_eval_real_collages_tta(collage_tree, capsys):
    """TTA must not silently lose to single-scale (VERDICT r4 #3).

    History: the round-4 "TTA trades easy AP for hard AP" story was an
    artifact of corrupted ground truth — background patches legally
    contained most of the portrait face, and the extra TTA views found
    those unlabeled faces (scored FP) while also recovering mislabeled
    "hard" ones.  On the purified tree (round 5) single-scale is near
    ceiling (0.986/0.992/0.927), and the two TTA mechanisms measure
    separately as:

    - multi-scale (64+96, no flip): 0.917/0.962/0.940 — the 96 view
      genuinely adds hard recall (+0.013 over single) at a small easy
      cost from off-distribution duplicates.
    - mirrored views: easy 0.986 -> 0.688 with flip alone.  The fixture
      detector is trained on ONE unmirrored face with no flip
      augmentation, so mirrored views emit sloppy duplicate boxes.  This
      is a fixture property, not a protocol bug: flip_detections maps
      coordinates exactly (test_tta.py mirror-invariance), and production
      RetinaFace checkpoints are flip-trained.

    Gates: the no-flip multi-scale run must hold near single-scale (the
    mechanism TTA exists for), and the full default protocol (with flip)
    must hold its measured floor on this fixture (0.733/0.862/0.906)."""
    root = collage_tree[0]
    single = _run_eval_wider(root, "--no-batched", capsys=capsys)
    assert single["hard"]["ap"] >= 0.80, single
    ms = _run_eval_wider(
        root, "--tta", "--tta-sizes", "64,96", "--tta-no-flip",
        capsys=capsys,
    )
    assert set(ms) == {"easy", "medium", "hard"}
    # multi-scale recall must not lose hard AP vs single-scale (jitter
    # margin only; measured +0.013)
    assert ms["hard"]["ap"] >= single["hard"]["ap"] - 0.02, (ms, single)
    assert ms["easy"]["ap"] >= 0.85, (ms, single)
    assert ms["medium"]["ap"] >= 0.90, (ms, single)

    full = _run_eval_wider(
        root, "--tta", "--tta-sizes", "64,96", capsys=capsys
    )
    assert full["easy"]["ap"] >= 0.65, (full, single)
    assert full["medium"]["ap"] >= 0.80, (full, single)
    assert full["hard"]["ap"] >= 0.85, (full, single)


def test_tta_vote_merge_still_functional(collage_tree, capsys):
    """The many-view voting protocol stays available and sane (opt-in)."""
    root = collage_tree[0]
    res = _run_eval_wider(
        root, "--tta", "--tta-sizes", "64,96", "--tta-merge", "vote",
        capsys=capsys,
    )
    # measured 0.786/0.893/0.924 on the purified tree (2026-08-21)
    assert res["hard"]["ap"] >= 0.85, res
    assert res["easy"]["ap"] >= 0.70, res


def test_approx_topk_ap_parity_on_real_collages(collage_tree, capsys):
    """AP evidence for the opt-in approx top-k (+2.7% throughput,
    tools/ab_tail.py): on the real-pixel collage protocol, approx_max_k
    (recall 0.95) must land within a small AP delta of exact lax.top_k.

    The cap is pinned BELOW the anchor count so the top-k truncation is
    real: mnet025 at 64x64 has (8^2+4^2+2^2)*2 = 168 anchors, and at the
    protocol's 256-candidate default k == n, where approx_max_k (with its
    aggregate-to-topk pass) degenerates to exact top-k and the gate would
    be vacuous.  At k=64 < 168 approx genuinely drops near-cutoff
    candidates — the regime the DEPLOY.md claim is about.  If this ever
    drifts, the knob needs re-measuring."""
    from rs_face_detection_tpu.configs import RPN_ANCHOR_CFG
    from rs_face_detection_tpu.ops.anchors import generate_anchors_fpn

    n_anchors = sum(
        (64 // s) ** 2 * a.shape[0]
        for s, a in generate_anchors_fpn(RPN_ANCHOR_CFG).items()
    )
    cap = 64
    assert cap < n_anchors, (cap, n_anchors)  # truncation must be real

    root = collage_tree[0]
    exact = _run_eval_wider(
        root, "--no-batched", "--max-candidates", str(cap), capsys=capsys
    )
    approx = _run_eval_wider(
        root, "--no-batched", "--max-candidates", str(cap),
        "--candidate-selection", "approx",
        capsys=capsys,
    )
    # the truncated exact run must still find the faces (cap 64 >> 4/scene)
    assert exact["hard"]["ap"] >= 0.35, exact
    for split in ("easy", "medium", "hard"):
        assert abs(approx[split]["ap"] - exact[split]["ap"]) <= 0.02, (
            split, exact[split]["ap"], approx[split]["ap"],
        )


CKPT640 = os.path.join(FIXTURES, "trained_real640.npz")


@pytest.mark.skipif(
    not os.path.exists(CKPT640),
    reason="production-shape fixture not built (tools/make_fixture_640.py)",
)
def test_official_eval_production_shape(tmp_path_factory, capsys):
    """Production-shape accuracy gate (VERDICT r4 #8).

    Every other AP gate runs the 64px toy config; this one runs the REAL
    serving geometry — 640x640 input, the full 80/40/20 anchor pyramid
    (anchor sides 16-512 px, face_detection.rs:56-80), production decode
    and NMS paths — with a detector trained at that shape on real pixels
    (tools/make_fixture_640.py; the 64-trained fixture measurably does
    NOT transfer: AP ~ 0 with saturated false positives).  The collage
    tree itself is 640-native (no letterbox downscale to a toy canvas),
    so stride-8 through stride-32 anchors all carry scored detections
    through the official WIDER keep-list arithmetic.

    Gates are calibrated to the committed fixture (seed-7 tree, measured
    at freeze time — see tools/make_fixture_640.py output recorded in the
    commit); margins absorb jit/codec jitter.
    """
    make640 = _load_tool("make_fixture_640")
    mc = _load_tool("make_collage_set")
    out = str(tmp_path_factory.mktemp("collage640"))
    mc.build_collage_set(
        out,
        FIXTURES,
        seed=7,
        n_images=12,
        canvas=640,
        face_px=make640.COLLAGE_FACE_PX,
        easy_min=make640.COLLAGE_EASY_MIN,
        medium_min=make640.COLLAGE_MEDIUM_MIN,
    )
    res = _run_eval_wider(
        out, "--no-batched", capsys=capsys, ckpt=CKPT640, size=640
    )
    assert set(res) == {"easy", "medium", "hard"}
    # Measured 1.0/1.0/1.0 with the committed fixture (TPU-trained
    # 2026-08-21, 1500 steps, purified backgrounds + label-mirrored flip
    # augmentation) on the purified-background tree; the pre-purification
    # tree scored 0.546/0.630/0.725 because upscaled background patches
    # contained whole unlabeled faces the detector correctly found
    # (make_collage_set.background_pool docstring).
    assert res["easy"]["ap"] >= 0.90, res
    assert res["medium"]["ap"] >= 0.90, res
    assert res["hard"]["ap"] >= 0.85, res
    total_faces = sum(1 + i % 4 for i in range(12))
    assert res["hard"]["num_kept_faces"] == total_faces
    assert 0 < res["easy"]["num_kept_faces"] < total_faces

    # Flip-TTA at the production shape: the fixture is flip-augmented, so
    # the mirrored view must NOT cost AP (measured 1.0/1.0/1.0 — the
    # production-checkpoint story the 64-fixture can't tell, since that
    # one is frozen without flip training and loses 0.3 easy AP to its
    # flip view; see test_official_eval_real_collages_tta).
    flip = _run_eval_wider(
        out, "--tta", "--tta-sizes", "640",
        capsys=capsys, ckpt=CKPT640, size=640,
    )
    for split in ("easy", "medium", "hard"):
        assert flip[split]["ap"] >= res[split]["ap"] - 0.03, (flip, res)
