"""Test harness config: force the CPU backend with an 8-device virtual mesh.

Tests never require the real TPU: multi-chip sharding paths run on
xla_force_host_platform_device_count=8 virtual CPU devices.  The environment's
sitecustomize registers the remote `axon` TPU platform and overrides
JAX_PLATFORMS at interpreter start (every op would round-trip through the
tunnel), so the platform must be forced via jax.config here, before any
backend initializes.  Set RSFD_TEST_TPU=1 to run the suite against the real
chip instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if not os.environ.get("RSFD_TEST_TPU") and "xla_backend_optimization_level" not in flags:
    # CPU-backend test compiles don't need LLVM -O3: level 1 compiles the
    # deep model graphs ~3x faster (SCRFD init 21.7s -> 6.6s) with identical
    # op semantics — the parity/exactness suite passes at either level.
    # Real-TPU runs (RSFD_TEST_TPU=1) keep the default level.
    flags = (flags + " --xla_backend_optimization_level=1").strip()
os.environ["XLA_FLAGS"] = flags

# Persistent compilation cache: amortizes CPU jit compiles across test runs.
# NOTE: env vars are NOT enough here — the environment's sitecustomize imports
# jax at interpreter start, so jax._src.config already snapshotted the
# environment before this file runs.  The cache dir must be set through
# jax.config.update (in-process, before first compile) or it silently stays
# None and every ~20s model-init compile is paid on every run.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
os.makedirs(_cache_dir, exist_ok=True)

import jax  # noqa: E402  (must configure before backends initialize)

jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

if not os.environ.get("RSFD_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")


def attach_fast_head_builders(registry):
    """Override quality/FQA/FAS builders with SmallCNN test doubles.

    Pipeline-MECHANICS tests don't need the real MiniFASNet/ResNet18
    architectures (those have their own import-parity tests:
    test_minifas.py, test_classifiers.py) — SmallCNN keeps CPU jit compiles
    to seconds.  Call AFTER _attach_standard_builders and BEFORE any get().
    """
    from rs_face_detection_tpu.configs import (
        FaceAntiSpoofingConfig,
        FaceQualityAssessmentConfig,
        FaceQualityConfig,
    )
    from rs_face_detection_tpu.models.registry import ModelSpec

    def small(name, outs, size, softmax=True):
        def builder():
            from rs_face_detection_tpu.models.heads import init_small_cnn

            model, variables = init_small_cnn(
                outs, size, softmax=softmax, widths=(8, 16)
            )
            return (
                ModelSpec(name, (size[1], size[0], 3), "test double"),
                model,
                variables,
            )

        return builder

    qcfg = FaceQualityConfig()
    registry.register_builder(
        qcfg.model_name, small(qcfg.model_name, qcfg.num_classes, qcfg.image_size)
    )
    fqa_cfg = FaceQualityAssessmentConfig()
    registry.register_builder(
        fqa_cfg.model_name,
        small(fqa_cfg.model_name, 1, fqa_cfg.image_size, softmax=False),
    )
    fas_cfg = FaceAntiSpoofingConfig()
    for model_name, size in zip(fas_cfg.model_names, fas_cfg.image_sizes):
        registry.register_builder(model_name, small(model_name, 3, size))
    return registry
