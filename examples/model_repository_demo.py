"""Triton on-disk model repository, served over protobuf wire + HTTP.

The reference delegates its model lifecycle to a Triton server's
repository (`repository_model_load` / `unload` / `repository_index`,
/root/reference/src/triton_client/client.rs:127-146); operators describe
each model with a `config.pbtxt` and versioned weight directories.  This
demo builds that exact layout on disk — including a `dynamic_batching {}`
scheduler block and a `platform: "ensemble"` DAG — then serves it and
drives all three client surfaces against one process:

    python examples/model_repository_demo.py

  1. write  <repo>/face_quality/{config.pbtxt, 1/model.npz}   (writer API)
  2. append dynamic_batching (honored: concurrent ModelInfer coalesces)
  3. write  <repo>/quality_chain/config.pbtxt                 (ensemble)
  4. serve(model_repository=...) -> scan + lazy builders
  5. TritonWireClient: repository_index, load (pulls ensemble members),
     ModelInfer against model AND ensemble, model_statistics
  6. TritonHTTPClient: the same state over KServe-v2 REST
"""

import os
import sys
import tempfile
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    from rs_face_detection_tpu.models.classifiers import (
        init_resnet18_classifier,
    )
    from rs_face_detection_tpu.models.registry import ModelRegistry
    from rs_face_detection_tpu.runtime.repository import (
        attach_repository_builders,
        write_repository_entry,
    )
    from rs_face_detection_tpu.runtime.server import serve
    from rs_face_detection_tpu.runtime.wire import TritonWireClient

    # -- 1. a self-describing checkpoint + repository entry --------------
    root = tempfile.mkdtemp(prefix="triton_repo_")
    model, variables = init_resnet18_classifier(3, (32, 32), softmax=True)
    meta = {
        "family": "resnet18",
        "num_outputs": 3,
        "image_size": [32, 32],
        "softmax": True,
    }
    write_repository_entry(
        root, "face_quality", variables, meta, max_batch_size=4
    )
    # -- 2. Triton scheduler config, honored at serve time ---------------
    with open(os.path.join(root, "face_quality", "config.pbtxt"), "a") as f:
        f.write("dynamic_batching { max_queue_delay_microseconds: 20000 }\n")

    # -- 3. an ensemble DAG over the repository model --------------------
    ens_dir = os.path.join(root, "quality_chain")
    os.makedirs(ens_dir, exist_ok=True)
    with open(os.path.join(ens_dir, "config.pbtxt"), "w") as f:
        f.write(
            'name: "quality_chain"\n'
            'platform: "ensemble"\n'
            "max_batch_size: 0\n"
            'input { name: "IMAGE" data_type: TYPE_FP32 dims: [1, 3, 32, 32] }\n'
            'output { name: "PROBS" data_type: TYPE_FP32 dims: [1, 3] }\n'
            "ensemble_scheduling {\n"
            "  step {\n"
            '    model_name: "face_quality"\n'
            "    model_version: -1\n"
            '    input_map { key: "data" value: "IMAGE" }\n'
            '    output_map { key: "output" value: "PROBS" }\n'
            "  }\n"
            "}\n"
        )

    # -- 4. scan + serve --------------------------------------------------
    registry = ModelRegistry()
    names = attach_repository_builders(registry, root)
    print(f"repository scan: {sorted(names)}")
    server = serve(None, registry, port=0, http_port=0)
    port = server._rsfd_port
    print(f"serving wire + JSON on :{port}, HTTP on :{server._rsfd_http_port}")

    client = TritonWireClient(f"localhost:{port}", timeout_s=600)
    try:
        # -- 5. lifecycle + inference over genuine protobuf --------------
        index = client.repository_index()
        print("repository_index:", [(e["name"], e["state"]) for e in index])
        client.repository_model_load("quality_chain")  # loads members too
        assert registry.model_ready("face_quality"), "ensemble pulls members"

        x = np.random.default_rng(0).random((1, 3, 32, 32), np.float32)
        ((name, shape, direct),) = client.model_infer("face_quality", x)
        print(f"model_infer face_quality -> {name} {shape}")
        ((name, shape, chained),) = client.model_infer(
            "quality_chain", x, input_name="IMAGE"
        )
        print(f"model_infer quality_chain -> {name} {shape}")
        # direct goes through the dynamic batcher (padded batch-4 graph);
        # the ensemble member runs the unpadded batch-1 graph — different
        # XLA fusions, float-level agreement only
        np.testing.assert_allclose(chained, direct, rtol=5e-3, atol=1e-4)

        # dynamic batching: a concurrent burst coalesces on device
        xs = [
            np.random.default_rng(i).random((1, 3, 32, 32), np.float32)
            for i in range(6)
        ]
        with ThreadPoolExecutor(max_workers=6) as pool:
            list(pool.map(lambda a: client.model_infer("face_quality", a), xs))
        stats = registry.statistics("face_quality")
        print(
            f"dynamic batching: {stats.inference_count} inferences in "
            f"{stats.execution_count} device executions "
            f"(batch sizes {dict(stats.batch_size_counts)})"
        )
        assert stats.execution_count < stats.inference_count

        # -- 6. the same state over KServe-v2 REST ------------------------
        from rs_face_detection_tpu.runtime.http import TritonHTTPClient

        http = TritonHTTPClient(port=server._rsfd_http_port)
        cfg = http.model_config("quality_chain")
        print(
            "HTTP /v2 config platform:", cfg["platform"],
            "steps:", [s["model_name"]
                       for s in cfg["ensemble_scheduling"]["step"]],
        )
        ((name, shape, via_http),) = http.infer(
            "quality_chain", x, input_name="IMAGE"
        )
        np.testing.assert_allclose(via_http, chained, rtol=1e-6)
        print("HTTP infer parity: ok")
    finally:
        client.close()
        server.stop(0)
    print("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
