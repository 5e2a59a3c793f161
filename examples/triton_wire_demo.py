"""Drop-in Triton wire parity demo: the reference crate's exact RPC flow.

The reference pipeline talks to its Triton server with 3x ModelConfig at
init and then ModelInfer per stage (fp32_contents in, raw_output_contents
out — /root/reference/src/pipeline/face_pipeline/pipeline.rs:89-116).
This demo replays that flow in genuine protobuf against the in-repo
server, then host-decodes the detection maps the same way the reference
does (permute/slice — face_detection.rs:296-345):

    python examples/triton_wire_demo.py

Everything runs on one machine/port; a stock Triton gRPC client — or the
reference crate itself pointed at localhost:<port> — speaks the same
bytes.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    from rs_face_detection_tpu.models.registry import default_registry
    from rs_face_detection_tpu.runtime.server import serve
    from rs_face_detection_tpu.runtime.wire import TritonWireClient

    registry = default_registry()
    server = serve(None, registry, port=0)
    port = server._rsfd_port
    print(f"serving JSON facade + inference.GRPCInferenceService on :{port}")

    client = TritonWireClient(f"localhost:{port}", timeout_s=600)
    try:
        # -- the reference's init sequence -------------------------------
        assert client.server_live()
        cfg = client.model_config("face_detection_retina")
        (inp,) = cfg["input"]
        out_names = [o["name"] for o in cfg["output"]]
        print(f"model_config: input {inp['name']} dims={inp['dims']}, "
              f"{len(out_names)} outputs")

        # -- one ModelInfer, reference-normalized ------------------------
        _, c, h, w = inp["dims"]
        rng = np.random.default_rng(0)
        bgr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        # (pixel/scale - mean) / std with BGR->RGB flip, NCHW — exactly
        # face_detection.rs:222-229's loop
        rgb = bgr[..., ::-1].astype(np.float32)
        x = (rgb / 1.0 - 0.0) / 1.0  # detector config: scale 1, mean 0, std 1
        x_nchw = np.transpose(x, (2, 0, 1))[None]

        outs = client.model_infer(
            "face_detection_retina", x_nchw,
            input_name=inp["name"], requested_outputs=out_names,
        )
        # -- the reference's host decode shape-checks --------------------
        a = 2
        for name, shape, arr in outs:
            if "cls_prob" in name:
                scores = arr[:, a:, :, :].transpose(0, 2, 3, 1).reshape(-1)
                print(f"  {name}: {shape} -> {scores.size} anchor scores, "
                      f"max {scores.max():.3f}")

        stats = client.model_statistics("face_detection_retina")
        print(f"statistics: {stats[0]['inference_count']} inferences, "
              f"{stats[0]['memory_usage'][0]['byte_size']/1e6:.1f} MB params")
        return 0
    finally:
        client.close()
        server.stop(0)


if __name__ == "__main__":
    sys.exit(main())
