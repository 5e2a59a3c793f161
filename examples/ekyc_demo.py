"""eKYC demo: ID-document vs selfie verification, in-process and over gRPC.

    python examples/ekyc_demo.py [card.jpg selfie.jpg]

Without arguments, the committed real photograph doubles as card and
selfie (similarity ~1.0) with SMALL models (fast CPU jit) — structurally
the production flow; swap in real weights via tools/import_checkpoint.py +
$RSFD_CHECKPOINT_DIR to make the numbers meaningful (registry builders
pick them up by model name: scrfd, face_id, face_attribute,
face_quality_vp, face_anti_spoofing_{crop,fi}_l14).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def small_registry():
    """Small-model registry for a fast demo (mirrors the production names;
    the default registry builds the full-size architectures)."""
    from rs_face_detection_tpu.models.registry import ModelRegistry, ModelSpec

    reg = ModelRegistry()

    def scrfd():
        from rs_face_detection_tpu.models.scrfd import init_scrfd

        model, variables = init_scrfd((160, 160), width=8, seed=0)
        return ModelSpec("scrfd", (160, 160, 3), "maps"), model, variables

    def face_id():
        from rs_face_detection_tpu.models.arcface import init_arcface

        model, variables = init_arcface("iresnet18", 512, (112, 112), seed=0)
        return ModelSpec("face_id", (112, 112, 3), "emb"), model, variables

    def head(name, outs, size):
        def build():
            from rs_face_detection_tpu.models.heads import init_small_cnn

            model, variables = init_small_cnn(
                outs, (size, size), widths=(8, 16)
            )
            return ModelSpec(name, (size, size, 3), "probs"), model, variables

        return build

    def fas(name):
        def build():
            from rs_face_detection_tpu.models.vit import init_vit

            model, variables = init_vit(
                "clip_tiny_test", 2, (224, 224), seed=0
            )
            return ModelSpec(name, (224, 224, 3), "probs"), model, variables

        return build

    reg.register_builder("scrfd", scrfd)
    reg.register_builder("face_id", face_id)
    reg.register_builder("face_attribute", head("face_attribute", 2, 128))
    reg.register_builder("face_quality_vp", head("face_quality_vp", 2, 112))
    reg.register_builder(
        "face_anti_spoofing_crop_l14", fas("face_anti_spoofing_crop_l14")
    )
    reg.register_builder(
        "face_anti_spoofing_fi_l14", fas("face_anti_spoofing_fi_l14")
    )
    return reg


def main() -> int:
    from rs_face_detection_tpu.pipeline.ekyc_pipeline import EKYCPipeline

    fixtures = os.path.join(
        os.path.dirname(__file__), "..", "tests", "fixtures"
    )
    if len(sys.argv) > 2:
        card = open(sys.argv[1], "rb").read()
        selfie = open(sys.argv[2], "rb").read()
    else:
        real = os.path.join(fixtures, "real_face.jpg")
        card = selfie = open(real, "rb").read()

    print("== EKYCPipeline.verify (in-process) ==")
    reg = small_registry()
    ekyc = EKYCPipeline(registry=reg, detector_image_size=(160, 160))
    r = ekyc.verify(card, selfie)
    print(f"  card_face_found   = {r.card_face_found}")
    print(f"  selfie_face_found = {r.selfie_face_found}")
    print(f"  similarity        = {r.similarity:.4f}")
    print(f"  same_person       = {r.same_person}")
    print(f"  selfie_mask       = {r.selfie_mask}")
    print(f"  selfie_quality    = {r.selfie_quality}")
    print(f"  live (crop/full)  = {r.selfie_live_crop}/{r.selfie_live_full}")

    print("== EkycVerify over gRPC ==")
    try:
        from rs_face_detection_tpu.runtime.server import (
            FacePipelineClient,
            serve,
        )

        # serve() is what raises when grpcio is missing (the module imports
        # fine — it guards grpc behind a flag), so it must sit in the try.
        server = serve(None, reg, port=0, ekyc_pipeline=ekyc)
    except RuntimeError:
        print("  (grpcio not available; skipped)")
        return 0
    try:
        client = FacePipelineClient("localhost", server._rsfd_port)
        wire = client.ekyc_verify(card, selfie)
        print(f"  wire similarity   = {wire['similarity']:.4f} "
              f"(same_person={wire['same_person']})")
        client.close()
    finally:
        server.stop(0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
