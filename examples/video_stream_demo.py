"""Streaming video pipeline demo: decode -> batched detect -> track-by-IoU.

    python examples/video_stream_demo.py

BASELINE.json config 4 end to end on real pixels: a synthetic "video" is
made by panning the verified real-face fixture across a larger scene, the
frames stream through DetectionServer.detect_stream (producer-thread
staging + double-buffered batched detection — the host<->HBM overlap), and
pipeline.tracking.VideoPipeline associates detections frame to frame with
the IoU tracker (track birth after min_hits, death after max_age).

Runs on the CPU backend with the committed real-pixel fixture detector
(tests/fixtures/trained_real64.npz); the identical code path serves the
full 640x640 graphs on TPU.  Expected output: one DOMINANT track id whose
box follows the face across the whole pan; the toy detector also fires
occasional background false positives, which the tracker correctly
quarantines into short-lived tracks that die by max_age — the reason a
tracker sits behind the detector at all.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if not os.environ.get("RSFD_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def make_pan_frames(face_bgr, n_frames=24, size=96):
    """Pan a face crop across a textured scene: one (size, size, 3) frame
    per step, face sliding left->right along a shallow diagonal."""
    # Smooth gradient background: pixel noise makes a real-pixel-trained
    # detector fire sporadic false positives, muddying the tracking story.
    ramp = np.linspace(40, 90, size, dtype=np.float32)
    scene = np.clip(ramp[None, :, None] + ramp[:, None, None] * 0.3, 0, 255)
    scene = np.repeat(scene.astype(np.uint8), 3, axis=2)
    fh, fw = face_bgr.shape[:2]
    frames = []
    for i in range(n_frames):
        f = scene.copy()
        x = int(round((size - fw - 1) * i / (n_frames - 1)))
        y = int(round((size - fh - 1) * (0.25 + 0.5 * i / (n_frames - 1))))
        f[y : y + fh, x : x + fw] = face_bgr
        frames.append(f)
    return frames


def main() -> int:
    import cv2

    from rs_face_detection_tpu.configs import FaceDetectionConfig
    from rs_face_detection_tpu.parallel.serving import DetectionServer
    from rs_face_detection_tpu.pipeline.tracking import IouTracker, VideoPipeline
    from rs_face_detection_tpu.utils.fixtures import load_trained_detector

    fixtures = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
    ckpt = os.path.join(fixtures, "trained_real64.npz")
    if not os.path.exists(ckpt):
        print("fixture detector missing; run tools/make_real_fixture.py first")
        return 1

    # The fixture detector was trained at 64x64 on the grace_hopper face;
    # crop the labeled face region and shrink it to a trackable size.
    face = cv2.imread(os.path.join(fixtures, "real_face.jpg"))
    face = cv2.resize(face[90:390, 150:420], (42, 48), interpolation=cv2.INTER_LINEAR)

    cfg = FaceDetectionConfig(
        image_size=(64, 64),
        confidence_threshold=0.65,
        max_candidates=64,
        max_detections=8,
    )
    det = load_trained_detector(ckpt, cfg)
    server = DetectionServer(det, batch_size=4)
    pipeline = VideoPipeline(server, IouTracker(min_hits=3, max_age=4))

    frames = make_pan_frames(face, n_frames=24, size=96)
    print(f"streaming {len(frames)} frames (96x96, batch 4)...")
    t0 = time.perf_counter()
    frames_per_id: dict = {}
    for idx, tracks in pipeline.run(iter(frames)):
        for t in tracks:
            frames_per_id[t.track_id] = frames_per_id.get(t.track_id, 0) + 1
        desc = ", ".join(
            f"id={t.track_id} box=({t.box[0]:.0f},{t.box[1]:.0f},"
            f"{t.box[2]:.0f},{t.box[3]:.0f})"
            for t in tracks
        )
        print(f"frame {idx:2d}: {desc or 'no confirmed tracks yet'}")
    dt = time.perf_counter() - t0
    print(
        f"\n{len(frames)} frames in {dt:.2f}s ({len(frames) / dt:.1f} fps "
        f"incl. compile); frames per track id: {frames_per_id}"
    )
    if not frames_per_id:
        print("no confirmed tracks — detector/fixture mismatch?")
        return 1
    dominant, covered = max(frames_per_id.items(), key=lambda kv: kv[1])
    transients = [i for i in frames_per_id if i != dominant]
    # min_hits=3 means the face can confirm at frame 2 at the earliest.
    if covered >= len(frames) - 4:
        print(
            f"OK: id={dominant} held the face for {covered}/{len(frames)} "
            f"frames; {len(transients)} transient false-positive track(s) "
            f"died by max_age"
        )
        return 0
    print(
        f"identity fragmented: dominant id={dominant} covered only "
        f"{covered}/{len(frames)} frames"
    )
    return 1


if __name__ == "__main__":
    sys.exit(main())
