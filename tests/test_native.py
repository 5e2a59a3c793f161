"""Native C++ runtime: NMS parity and JPEG decode/letterbox correctness."""

import numpy as np
import pytest

from rs_face_detection_tpu.ops.nms import nms_numpy
from rs_face_detection_tpu.runtime import native

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


@pytest.mark.parametrize("seed", range(4))
def test_native_nms_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 200
    ctr = rng.uniform(0, 500, size=(n, 2)).astype(np.float32)
    wh = rng.uniform(5, 150, size=(n, 2)).astype(np.float32)
    dets = np.concatenate(
        [ctr - wh / 2, ctr + wh / 2, rng.uniform(0, 1, (n, 1)).astype(np.float32)],
        axis=1,
    )
    for thresh in (0.3, 0.45, 0.6):
        assert native.nms(dets, thresh) == nms_numpy(dets, thresh)


def test_native_nms_golden():
    dets = np.array(
        [
            [100.0, 100.0, 210.0, 210.0, 0.72],
            [250.0, 250.0, 420.0, 420.0, 0.8],
            [220.0, 220.0, 320.0, 330.0, 0.92],
            [100.0, 100.0, 210.0, 210.0, 0.6],
        ],
        dtype=np.float32,
    )
    assert native.nms(dets, 0.4) == [2, 1, 0]


def test_native_decode_letterbox_matches_host():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(200, 320, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    payload = buf.tobytes()

    out, scale = native.decode_letterbox(payload, 640, 640)
    assert out.shape == (640, 640, 3)
    new_h = int(640 * 200 / 320)
    assert scale == pytest.approx(new_h / 200)
    # Pad region is zero.
    assert (out[new_h:, :] == 0).all()

    # Pixel parity vs the cv2-based host path on the same decoded image.
    from rs_face_detection_tpu.parallel.serving import letterbox_host

    decoded = cv2.imdecode(np.frombuffer(payload, np.uint8), cv2.IMREAD_UNCHANGED)
    expected, escale = letterbox_host(decoded, 640, 640)
    assert escale == pytest.approx(scale)
    diff = np.abs(out.astype(int) - expected.astype(int))
    # Decoders may differ by a few LSBs (IDCT variants); stay tight.
    assert np.mean(diff) < 2.0
    assert np.percentile(diff, 99) <= 6


def test_native_decode_batch_threaded():
    rng = np.random.default_rng(1)
    payloads = []
    for i in range(6):
        img = rng.integers(0, 255, size=(100 + 10 * i, 150, 3), dtype=np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        payloads.append(buf.tobytes())
    payloads.append(b"not a jpeg")

    imgs, scales, ok = native.decode_letterbox_batch(payloads, 320, 320, num_threads=4)
    assert imgs.shape == (7, 320, 320, 3)
    assert ok[:6].all() and not ok[6]
    # Each valid image individually matches the single-image path.
    for i in range(6):
        single, scale = native.decode_letterbox(payloads[i], 320, 320)
        np.testing.assert_array_equal(imgs[i], single)
        assert scales[i] == pytest.approx(scale)


def test_native_decode_garbage_raises():
    with pytest.raises(ValueError):
        native.decode_letterbox(b"garbage", 64, 64)


def test_native_s2d_batch_matches_numpy():
    from rs_face_detection_tpu.ops.image import s2d_layout_host
    from rs_face_detection_tpu.runtime import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    imgs = np.random.default_rng(0).integers(0, 256, (3, 8, 6, 3), dtype=np.uint8)
    np.testing.assert_array_equal(native.s2d_batch(imgs), s2d_layout_host(imgs))


def test_native_s4d_batch_matches_numpy():
    from rs_face_detection_tpu.ops.image import s4d_layout_host
    from rs_face_detection_tpu.runtime import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    imgs = np.random.default_rng(1).integers(0, 256, (3, 16, 8, 3), dtype=np.uint8)
    np.testing.assert_array_equal(native.s4d_batch(imgs), s4d_layout_host(imgs))
