"""Pipeline modules (the reference's L3/L4): detection through extraction."""

from .alignment import FaceAlignment
from .antispoofing import FaceAntiSpoofing
from .detection import PaddedDetections, RetinaFaceDetection
from .extraction import FaceExtraction
from .face_pipeline import EKYCPipeline, FaceExtractionResult, FacePipeline
from .quality import FaceQuality
from .quality_assessment import FaceQualityAssessment
from .selection import FaceSelection

__all__ = [
    "FaceAlignment",
    "FaceAntiSpoofing",
    "PaddedDetections",
    "RetinaFaceDetection",
    "FaceExtraction",
    "EKYCPipeline",
    "FaceExtractionResult",
    "FacePipeline",
    "FaceQuality",
    "FaceQualityAssessment",
    "FaceSelection",
]
