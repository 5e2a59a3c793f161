"""Model zoo: RetinaFace detector, IResNet embeddings, classifier heads.

In-process flax replacements for the networks the reference reached over gRPC
(SURVEY.md §2), plus the registry/checkpoint layer replacing Triton's model
repository.
"""

from .arcface import IResNet, init_arcface
from .checkpoint_maps import (
    iresnet_map,
    load_iresnet_state_dict,
    load_retinaface_state_dict,
    retinaface_mobilenet025_map,
    retinaface_resnet50_map,
    strip_module_prefix,
)
from .classifiers import (
    ResNet18Classifier,
    init_resnet18_classifier,
    load_resnet18_classifier_state_dict,
)
from .heads import SmallCNN, init_small_cnn
from .import_weights import (
    apply_mapping,
    torch_bn_to_flax,
    torch_conv_to_flax,
    torch_dense_to_flax,
)
from .minifas import (
    MiniFASNet,
    MiniFASNetSpec,
    default_minifas_spec,
    init_minifasnet,
    load_minifasnet_state_dict,
    minifasnet_spec_from_state_dict,
)
from .scrfd import SCRFD, init_scrfd
from .vit import ViT, init_vit
from .registry import (
    ModelRegistry,
    ModelSpec,
    ModelStats,
    default_registry,
    load_variables,
    save_variables,
)
from .retinaface import RetinaFace, init_retinaface

__all__ = [
    "IResNet",
    "init_arcface",
    "SmallCNN",
    "init_small_cnn",
    "ModelRegistry",
    "ModelSpec",
    "ModelStats",
    "default_registry",
    "load_variables",
    "save_variables",
    "RetinaFace",
    "init_retinaface",
    "apply_mapping",
    "torch_bn_to_flax",
    "torch_conv_to_flax",
    "torch_dense_to_flax",
    "SCRFD",
    "init_scrfd",
    "ViT",
    "init_vit",
    "iresnet_map",
    "load_iresnet_state_dict",
    "load_retinaface_state_dict",
    "retinaface_mobilenet025_map",
    "retinaface_resnet50_map",
    "strip_module_prefix",
    "ResNet18Classifier",
    "init_resnet18_classifier",
    "load_resnet18_classifier_state_dict",
    "MiniFASNet",
    "MiniFASNetSpec",
    "default_minifas_spec",
    "init_minifasnet",
    "load_minifasnet_state_dict",
    "minifasnet_spec_from_state_dict",
]
