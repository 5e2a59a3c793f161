"""Aux subsystem coverage: debug sink, profiling, registry thread safety."""

import os
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_face_detection_tpu.utils import (
    Coord2D,
    Timer,
    disable_debug,
    dump,
    enable_debug,
    image_to_rgb_array,
)


def test_debug_sink_lifecycle(tmp_path):
    sink = enable_debug(str(tmp_path / "dbg"))
    dump("scores", np.arange(4.0))
    sink.dump_image("frame", np.zeros((4, 4, 3)))
    files = sorted(os.listdir(sink.directory))
    assert len(files) == 2
    assert files[0].endswith("scores.npy")
    disable_debug()
    dump("after", np.zeros(2))  # no-op
    assert sorted(os.listdir(sink.directory)) == files


def test_timer_spans():
    t = Timer()
    with t.span("a"):
        pass
    with t.span("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["total_s"] >= 0


def test_coordinate_helpers():
    c = Coord2D(1.0, 2.0)
    assert (c.x, c.y) == (1.0, 2.0)
    bgr = np.zeros((2, 2, 3), np.uint8)
    bgr[..., 0] = 255  # blue channel
    rgb = image_to_rgb_array(bgr)
    assert (rgb[..., 2] == 255).all() and (rgb[..., 0] == 0).all()
    with pytest.raises(ValueError):
        image_to_rgb_array(np.zeros((2, 2), np.uint8))


def test_registry_concurrent_load_and_record():
    from rs_face_detection_tpu.models.heads import init_small_cnn
    from rs_face_detection_tpu.models.registry import ModelRegistry, ModelSpec

    reg = ModelRegistry()

    def builder():
        model, variables = init_small_cnn(2, (16, 16), widths=(4,))
        return ModelSpec("toy", (16, 16, 3), "p"), model, variables

    reg.register_builder("toy", builder)

    errors = []

    def worker(i):
        try:
            reg.load("toy")
            reg.record("toy", 1, 0.001)
            reg.statistics("toy")
            reg.index()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    stats = reg.statistics("toy")
    assert stats.execution_count == 16
    assert stats.inference_count == 16


def test_profiler_trace_smoke(tmp_path):
    from rs_face_detection_tpu.utils.profiling import trace

    f = jax.jit(lambda x: x * 2)
    jax.block_until_ready(f(jnp.ones(8)))
    with trace(str(tmp_path / "prof")):
        jax.block_until_ready(f(jnp.ones(8)))
    produced = []
    for root, _, files in os.walk(tmp_path / "prof"):
        produced.extend(files)
    assert produced  # a trace artifact exists
