"""OpenAI CLIP visual-encoder import map (VERDICT r2 #5a).

The reference's eKYC anti-spoofing stages are CLIP ViT-L/14 models
(/root/reference/src/pipeline/ekyc_pipeline/config.rs:95-138:
`face_anti_spoofing_crop_l14` / `face_anti_spoofing_fi_l14` @ 224 with
ImageNet normalization).  Public CLIP checkpoints carry the visual tower
under `visual.`:

    visual.conv1.weight                    (W, 3, P, P), no bias
    visual.class_embedding                 (W,)
    visual.positional_embedding            (N+1, W)
    visual.ln_pre.{weight,bias}
    visual.transformer.resblocks.{i}.ln_1.{weight,bias}
    visual.transformer.resblocks.{i}.attn.in_proj_{weight,bias}  packed qkv
    visual.transformer.resblocks.{i}.attn.out_proj.{weight,bias}
    visual.transformer.resblocks.{i}.ln_2.{weight,bias}
    visual.transformer.resblocks.{i}.mlp.c_fc.{weight,bias}
    visual.transformer.resblocks.{i}.mlp.c_proj.{weight,bias}
    visual.ln_post.{weight,bias}
    visual.proj                            (W, embed_dim)

plus the text tower / logit_scale, which a visual-only import ignores.  A
FAS fine-tune additionally carries a classifier `head.{weight,bias}` on the
projected embedding; absent that, the head keeps its seeded init (the
fine-tuned head is the only part with no public source).

The packed qkv and the (heads, head_dim) factorization are the only
non-trivial conversions — handled here directly rather than through
import_weights.apply_mapping kinds.  Forward parity against a torch mirror
in the OpenAI layout is proven by tests/test_clip_import.py.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Mapping, Tuple

import numpy as np

from .vit import _CONFIGS


def clip_config_from_state_dict(sd: Mapping[str, np.ndarray]) -> str:
    """Pick the ViT `clip_*` config matching a CLIP visual state_dict."""
    conv = np.asarray(sd["visual.conv1.weight"])
    width, _, patch, _ = conv.shape
    depth = 0
    while f"visual.transformer.resblocks.{depth}.ln_1.weight" in sd:
        depth += 1
    proj_dim = int(np.asarray(sd["visual.proj"]).shape[1])
    for name, cfg in _CONFIGS.items():
        if (
            name.startswith("clip_")
            and cfg.patch == patch
            and cfg.width == width
            and cfg.depth == depth
            and cfg.proj_dim == proj_dim
        ):
            return name
    raise ValueError(
        f"no clip_* config matches patch={patch} width={width} "
        f"depth={depth} proj_dim={proj_dim}"
    )


def load_clip_visual_state_dict(
    variables: Mapping[str, Any],
    state_dict: Mapping[str, np.ndarray],
    config: str,
    strict: bool = True,
) -> Dict[str, Any]:
    """Import a CLIP state_dict's visual tower into ViT(config) variables.

    strict=True requires every `visual.*` tensor to be consumed; non-visual
    keys (text tower, token embeddings, logit_scale) are always ignored.
    An optional fine-tuned `head.{weight,bias}` is imported when present.
    """
    cfg = _CONFIGS[config]
    if not cfg.pre_ln:
        raise ValueError(
            f"config {config!r} is not CLIP-structured (use a clip_* config)"
        )
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params = copy.deepcopy(
        {k: _to_np(v) for k, v in variables["params"].items()}
    )
    consumed = set()

    def take(key: str) -> np.ndarray:
        consumed.add(key)
        return sd[key]

    def set_ln(dst: Dict, key: str) -> None:
        dst["scale"] = take(f"{key}.weight").astype(np.float32)
        dst["bias"] = take(f"{key}.bias").astype(np.float32)

    width, heads = cfg.width, cfg.heads
    head_dim = width // heads

    # Embeddings.
    conv = take("visual.conv1.weight")  # (W, 3, P, P) OIHW
    params["patchify"]["kernel"] = np.transpose(conv, (2, 3, 1, 0)).astype(
        np.float32
    )
    params["cls"] = take("visual.class_embedding").reshape(1, 1, width).astype(
        np.float32
    )
    params["pos_embed"] = take("visual.positional_embedding")[None].astype(
        np.float32
    )
    set_ln(params["ln_pre"], "visual.ln_pre")

    # Transformer blocks.
    for i in range(cfg.depth):
        t = f"visual.transformer.resblocks.{i}"
        blk = params[f"block{i}"]
        set_ln(blk["ln1"], f"{t}.ln_1")
        set_ln(blk["ln2"], f"{t}.ln_2")
        # Packed qkv: in_proj_weight (3W, W) rows ordered q, k, v; torch
        # computes x @ W^T, flax computes x @ kernel -> kernel = W^T, then
        # factor the output dim into (heads, head_dim).
        in_w = take(f"{t}.attn.in_proj_weight")
        in_b = take(f"{t}.attn.in_proj_bias")
        for j, name in enumerate(("query", "key", "value")):
            w_j = in_w[j * width : (j + 1) * width]  # (W, W)
            b_j = in_b[j * width : (j + 1) * width]
            blk["attn"][name]["kernel"] = (
                w_j.T.reshape(width, heads, head_dim).astype(np.float32)
            )
            blk["attn"][name]["bias"] = b_j.reshape(heads, head_dim).astype(
                np.float32
            )
        out_w = take(f"{t}.attn.out_proj.weight")  # (W, W), out = attn @ W^T
        blk["attn"]["out"]["kernel"] = (
            out_w.T.reshape(heads, head_dim, width).astype(np.float32)
        )
        blk["attn"]["out"]["bias"] = take(f"{t}.attn.out_proj.bias").astype(
            np.float32
        )
        blk["fc1"]["kernel"] = take(f"{t}.mlp.c_fc.weight").T.astype(np.float32)
        blk["fc1"]["bias"] = take(f"{t}.mlp.c_fc.bias").astype(np.float32)
        blk["fc2"]["kernel"] = take(f"{t}.mlp.c_proj.weight").T.astype(np.float32)
        blk["fc2"]["bias"] = take(f"{t}.mlp.c_proj.bias").astype(np.float32)

    set_ln(params["ln_final"], "visual.ln_post")
    # visual.proj is (W, embed_dim) applied as x @ proj — already kernel layout.
    params["proj"]["kernel"] = take("visual.proj").astype(np.float32)

    # Optional fine-tuned classifier head on the projected embedding.
    if "head.weight" in sd:
        params["head"]["kernel"] = take("head.weight").T.astype(np.float32)
        params["head"]["bias"] = take("head.bias").astype(np.float32)

    _check_shapes(variables["params"], params)
    if strict:
        unconsumed = [
            k for k in sd if k.startswith("visual.") and k not in consumed
        ]
        if unconsumed:
            raise ValueError(f"unconsumed visual keys: {unconsumed[:8]}...")
    return {**dict(variables), "params": params}


def _to_np(tree):
    if isinstance(tree, Mapping):
        return {k: _to_np(v) for k, v in tree.items()}
    return np.asarray(tree)


def _check_shapes(template: Any, got: Any, path: str = "") -> None:
    if isinstance(template, Mapping):
        for k in template:
            _check_shapes(template[k], got[k], f"{path}/{k}")
        return
    if tuple(np.shape(template)) != tuple(np.shape(got)):
        raise ValueError(
            f"{path}: imported shape {np.shape(got)} != model "
            f"{np.shape(template)}"
        )


def import_clip_visual(
    state_dict: Mapping[str, np.ndarray],
    num_classes: int = 2,
    image_size: Tuple[int, int] = (224, 224),
    softmax: bool = True,
    strict: bool = True,
):
    """Build + import: returns (model, variables, meta) for checkpoint_io."""
    import jax
    import jax.numpy as jnp

    from .vit import ViT, init_vit

    config = clip_config_from_state_dict(state_dict)
    model, variables = init_vit(config, num_classes, image_size)
    new_vars = load_clip_visual_state_dict(
        variables, state_dict, config, strict=strict
    )
    if not softmax:
        model = ViT(config=config, num_classes=num_classes, softmax=False)
    meta = {
        "family": "clip_vit",
        "config": config,
        "num_classes": num_classes,
        "softmax": bool(softmax),
        "image_size": list(image_size),
    }
    return model, jax.tree.map(jnp.asarray, new_vars), meta
