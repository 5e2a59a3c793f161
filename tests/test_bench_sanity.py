"""Degraded-relay guards in bench.py (CLAUDE.md 2026-08-19 incident).

The tunneled TPU relay has a failure mode where cached executables are
"served" instantly from a replay cache without executing — observed as
physically impossible rates (ViT-L/14 at 148,000 img/s, MFU 122-243).
bench brackets the run with _relay_sanity and refuses to report fields
flagged by _implausible_fields.  These tests cover the pure logic on the
CPU backend (where _relay_sanity is a no-op by design).
"""

import os
import time

import bench


def test_implausible_fields_pass_on_real_numbers():
    # The round-3 hardware-measured numbers — all plausible by construction.
    result = {
        "r50_b8_img_s": 1003.0,
        "r50_b16_img_s": 1050.0,
        "r50_b32_img_s": 980.0,
        "mnet025_b8_img_s": 2817.0,
        "mnet025_b32_img_s": 3494.0,
        "vit_l14_b8_img_s": 608.7,
        "iresnet50_embed_b32_img_s": 7249.0,
        "r50_b8_mfu_raw_graph": 0.47,
        "vit_l14_mfu": 0.50,
    }
    assert bench._implausible_fields(result) == []


def test_implausible_fields_flags_replayed_rates():
    # The degraded-mode numbers actually observed on 2026-08-19 ~12:04Z.
    result = {
        "vit_l14_b8_img_s": 148074.7,   # graph "0.054 ms"
        "vit_l14_fused_attn_stock_b8_img_s": 280361.5,
        "mnet025_b8_img_s": 2817.0,      # measured pre-wedge, fine
    }
    bad = bench._implausible_fields(result)
    assert "vit_l14_b8_img_s" in bad
    assert "vit_l14_fused_attn_stock_b8_img_s" in bad
    assert "mnet025_b8_img_s" not in bad


def test_implausible_fields_flags_impossible_mfu():
    # Rate passes the graph-time floor but XLA's FLOP count says >peak:
    # the first degraded sample (2,073 img/s, "mfu 1.711") looked
    # half-plausible by wall-clock alone.
    result = {"vit_l14_b8_img_s": 2073.0, "vit_l14_mfu": 1.711}
    assert bench._implausible_fields(result) == ["vit_l14_b8_img_s"]


def test_implausible_fields_ignores_none_and_missing():
    assert bench._implausible_fields({}) == []
    assert bench._implausible_fields({"r50_b8_img_s": None}) == []


def test_relay_sanity_noop_off_tpu():
    # conftest pins the CPU backend; the sanity probe must not burn time
    # or fail there (it guards the relay, not XLA itself).
    t0 = time.perf_counter()
    assert bench._relay_sanity() is None
    assert time.perf_counter() - t0 < 30.0


def test_with_timeout_paths():
    status, payload = bench._with_timeout(lambda: 42, 5.0, "t")
    assert (status, payload) == ("ok", 42)

    def boom():
        raise ValueError("nope")

    status, payload = bench._with_timeout(boom, 5.0, "t")
    assert status == "error" and "nope" in payload

    status, payload = bench._with_timeout(
        lambda: time.sleep(3.0), 0.2, "probe"
    )
    assert status == "timeout" and "probe" in payload


def test_probe_src_passes_on_cpu():
    """The subprocess probe (_PROBE_SRC, the wait-and-retry loop's unit of
    work) must pass standalone on the CPU backend — a broken probe string
    would turn every healthy run into a 15-minute retry stall."""
    import subprocess
    import sys

    # The sitecustomize overrides JAX_PLATFORMS at interpreter start
    # (CLAUDE.md); force CPU in-process so the test never rides the relay.
    src = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        + bench._PROBE_SRC
    )
    sub = subprocess.run(
        [sys.executable, "-c", src],
        capture_output=True,
        timeout=120,
        text=True,
    )
    assert sub.returncode == 0 and "probe ok" in sub.stdout, (
        sub.stdout,
        sub.stderr,
    )


def test_product_device_chains_tiny():
    """extract_device_chain / ekyc_device_chain (VERDICT r4 #4) produce
    positive timings and run the real 2-dispatch / verify graph sets —
    exercised at tiny shapes so the CPU suite stays fast; bench calls the
    same helpers at production shapes on hardware."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_ekyc import _tiny_registry

    from rs_face_detection_tpu.configs import (
        FaceDetectionConfig,
        FacePipelineConfig,
    )
    from rs_face_detection_tpu.pipeline.ekyc_pipeline import EKYCPipeline
    from rs_face_detection_tpu.pipeline.face_pipeline import FacePipeline

    pipe = FacePipeline(
        FacePipelineConfig(
            detection=FaceDetectionConfig(
                image_size=(64, 64), confidence_threshold=0.0
            )
        )
    )
    ms, img_s = bench.extract_device_chain(pipe, batch=2, chain_b=2,
                                           chain_reps=2)
    assert ms > 0 and img_s > 0

    ek = EKYCPipeline(registry=_tiny_registry(), detector_image_size=(96, 96))
    assert bench.ekyc_device_chain(ek, vb=1, v_reps=2, det_hw=96) > 0


def test_probe_retry_fail_path_e2e():
    """bench.py must emit the structured 0.0 failure record (rc 3) when
    the device probe cannot pass within the retry budget — driven end to
    end through the CLI with a sub-second probe timeout, so no real
    backend can answer in time.  Guards the wait-and-retry loop's
    fall-back contract (VERDICT r4 #1): the failure line still carries
    last_good if present, and the error names the probe."""
    import json
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        RSFD_BENCH_PROBE_TIMEOUT_S="0.2",
        RSFD_BENCH_PROBE_RETRY_S="5",
    )
    sub = subprocess.run(
        [sys.executable, os.path.join(root, "bench.py"), "--smoke"],
        capture_output=True,
        timeout=300,
        text=True,
        env=env,
        cwd=root,
    )
    assert sub.returncode == 3, (sub.returncode, sub.stderr[-300:])
    line = sub.stdout.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["value"] == 0.0
    assert "device probe failed" in payload["error"]
