"""Pipeline modules (the reference's L3/L4): detection through extraction."""

from .alignment import FaceAlignment
from .antispoofing import FaceAntiSpoofing
from .detection import PaddedDetections, RetinaFaceDetection
from .ekyc_pipeline import EKYCPipeline, EKYCResult, SCRFDDetection
from .extraction import FaceExtraction
from .face_pipeline import FaceExtractionResult, FacePipeline
from .multiscale import MultiScaleDetection
from .quality import FaceQuality
from .quality_assessment import FaceQualityAssessment
from .selection import FaceSelection
from .tracking import IouTracker, VideoPipeline
from .tta import TTADetection, bbox_vote

__all__ = [
    "FaceAlignment",
    "FaceAntiSpoofing",
    "PaddedDetections",
    "RetinaFaceDetection",
    "EKYCPipeline",
    "EKYCResult",
    "SCRFDDetection",
    "FaceExtraction",
    "FaceExtractionResult",
    "FacePipeline",
    "MultiScaleDetection",
    "FaceQuality",
    "FaceQualityAssessment",
    "FaceSelection",
    "IouTracker",
    "VideoPipeline",
    "TTADetection",
    "bbox_vote",
]
