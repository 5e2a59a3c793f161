"""rs_face_detection_tpu — TPU-native face detection & face-ID pipeline.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the Rust
crate okieraised/rs-face-detection (reference mounted at /root/reference): a
face-ID/eKYC inference stack — RetinaFace detection, heuristic face selection,
5-point landmark alignment, face-quality classification, ArcFace embedding
extraction, multi-scale anti-spoofing, and scalar quality assessment.

Where the reference shipped tensors to a Triton GPU server over gRPC and
post-processed on host with ndarray/OpenCV, this framework runs everything
in-process: preprocessing, backbone+FPN+SSH forward, anchor decode, and NMS
fuse into a single jit'd detect(), with shard_map data-parallel serving across
a TPU slice.
"""

from .configs import (
    FaceAlignmentConfig,
    FaceAntiSpoofingConfig,
    FaceDetectionConfig,
    FaceIdentificationConfig,
    FacePipelineConfig,
    FaceQualityAssessmentConfig,
    FaceQualityClass,
    FaceQualityConfig,
    FaceSelectionConfig,
)

__version__ = "0.1.0"

__all__ = [
    "FaceAlignmentConfig",
    "FaceAntiSpoofingConfig",
    "FaceDetectionConfig",
    "FaceIdentificationConfig",
    "FacePipelineConfig",
    "FaceQualityAssessmentConfig",
    "FaceQualityClass",
    "FaceQualityConfig",
    "FaceSelectionConfig",
    "FacePipeline",
    "FaceExtractionResult",
]


def __getattr__(name):
    # Lazy imports keep `import rs_face_detection_tpu` light; the pipeline
    # pulls in jax/flax model definitions only when actually used.
    if name in ("FacePipeline", "FaceExtractionResult"):
        from .pipeline.face_pipeline import FaceExtractionResult, FacePipeline

        return {"FacePipeline": FacePipeline, "FaceExtractionResult": FaceExtractionResult}[name]
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
