"""Import trained PyTorch checkpoints into the flax model zoo.

The reference consumed pre-trained weights from Triton's model repository
(SURVEY.md §5 — checkpoint/resume was "delegated to Triton"); public
RetinaFace/ArcFace weights circulate as PyTorch state_dicts, so this module
owns the layout conversion:

  - `torch_conv_to_flax`: OIHW -> HWIO kernels (grouped/depthwise included:
    torch (O, I/g, kH, kW) -> flax (kH, kW, I/g, O));
  - `torch_bn_to_flax`: weight/bias/running stats -> scale/bias + batch_stats;
  - `torch_dense_to_flax`: (out, in) -> (in, out) + bias;
  - `apply_mapping`: write converted tensors into a flax variables tree by
    explicit {flax_path: (torch_key_prefix, kind)} mapping, validating every
    shape and reporting unconsumed torch keys.

Numerics of every primitive are verified against torch CPU forwards in
tests/test_import_weights.py.  Mappings for specific public checkpoints are
data (dicts), decoupled from the conversion machinery.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, MutableMapping, Sequence, Tuple

import numpy as np


def torch_conv_to_flax(weight: np.ndarray) -> np.ndarray:
    """Torch conv weight (O, I/g, kH, kW) -> flax kernel (kH, kW, I/g, O)."""
    w = np.asarray(weight)
    if w.ndim != 4:
        raise ValueError(f"conv weight must be 4-D, got {w.shape}")
    return np.transpose(w, (2, 3, 1, 0))


def torch_dense_to_flax(weight: np.ndarray) -> np.ndarray:
    """Torch Linear weight (out, in) -> flax Dense kernel (in, out)."""
    w = np.asarray(weight)
    if w.ndim != 2:
        raise ValueError(f"dense weight must be 2-D, got {w.shape}")
    return np.transpose(w, (1, 0))


def torch_bn_to_flax(
    weight: np.ndarray,
    bias: np.ndarray,
    running_mean: np.ndarray,
    running_var: np.ndarray,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Torch BatchNorm tensors -> flax {params: {scale, bias}, batch_stats: {mean, var}}."""
    return {
        "params": {"scale": np.asarray(weight), "bias": np.asarray(bias)},
        "batch_stats": {
            "mean": np.asarray(running_mean),
            "var": np.asarray(running_var),
        },
    }


def stem_to_s2d(kernel_hwio: np.ndarray) -> np.ndarray:
    """Exactly convert a (K, K)/stride-2 stem kernel to space-to-depth form.

    Input: (K, K, C, F) HWIO kernel (K odd) applied with stride 2 and
    symmetric padding K//2 — the torch Conv2d convention, which is what every
    public checkpoint (torchvision ResNet, biubug6 RetinaFace, insightface
    iresnet) was trained with and what layers.ConvBN's default "TORCH"
    padding reproduces.  Output: (KK, KK, 4C, F) kernel for a stride-1 conv
    on the 2x2 space-to-depth input whose channel k = (bi*2 + bj)*C + c,
    applied with block-space padding `s2d_stem_padding(K)` (((2,1),(2,1))
    for K=7, ((1,0),(1,0)) for K=3).  The two convs produce identical
    outputs (tests/test_models.py::test_s2d_stem_equivalence).

    Derivation: with left pad p = K//2, output o reads input i = 2o - p + k;
    in 2x2 block space that is block m = floor(i/2) = o + floor((k-p)/2) at
    phase (k-p) mod 2, so tap k lands in s2d kernel row floor((k-p)/2) - m_min
    at block-phase channel offset.
    """
    kh, kw, c, f = kernel_hwio.shape
    assert kh == kw and kh % 2 == 1, kernel_hwio.shape
    p = kh // 2
    offs = [(u - p) // 2 for u in range(kh)]  # python floor division
    m_min = min(offs)
    kk = max(offs) - m_min + 1
    out = np.zeros((kk, kk, 4 * c, f), dtype=kernel_hwio.dtype)
    for u in range(kh):
        a, bi = (u - p) // 2 - m_min, (u - p) % 2
        for v in range(kw):
            b, bj = (v - p) // 2 - m_min, (v - p) % 2
            out[a, b, (bi * 2 + bj) * c : (bi * 2 + bj + 1) * c] = kernel_hwio[u, v]
    return out


def s2d_stem_padding(k: int) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Block-space conv padding for the s2d form of an odd-K, pad-K//2,
    stride-2 stem (see stem_to_s2d): ((2,1),(2,1)) for K=7, ((1,0),(1,0))
    for K=3."""
    assert k % 2 == 1, k
    p = k // 2
    offs = [(u - p) // 2 for u in range(k)]
    pl = -min(offs)
    pr = max(offs) - min(offs) - pl
    return ((pl, pr), (pl, pr))


#: Backwards-compatible alias (the 7x7 ResNet stem case).
stem7x7_to_s2d = stem_to_s2d


def _set_path(tree: MutableMapping, path: Sequence[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        if p not in node:
            raise KeyError(f"path {'/'.join(path)}: missing node {p!r}")
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        raise KeyError(f"path {'/'.join(path)}: missing leaf {leaf!r}")
    expected = np.shape(node[leaf])
    if tuple(expected) != tuple(value.shape):
        raise ValueError(
            f"path {'/'.join(path)}: shape {value.shape} != expected {expected}"
        )
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)


def apply_mapping(
    variables: Mapping[str, Any],
    state_dict: Mapping[str, np.ndarray],
    mapping: Mapping[str, Tuple],
) -> Tuple[Dict[str, Any], list]:
    """Write torch tensors into a copy of `variables` per the mapping.

    mapping: {"params/body/conv1/Conv_0/kernel": ("body.conv1.0", "conv"), ...}
    kinds:
      - "conv": conv weight only (OIHW -> HWIO); path at the kernel leaf.
      - "conv_s2d": stride-2 stem into a space-to-depth model (stem_to_s2d).
      - "conv_bias": conv weight + bias; path at the conv MODULE directory
        (kernel and bias leaves are filled) — used for head convs.
      - "dense": Linear weight (+ bias when present).
      - "dense_nchw": Linear applied after a torch NCHW flatten; mapping value
        is (torch_key, "dense_nchw", (C, H, W)) and the weight's input dim is
        permuted from c*H*W+h*W+w to (h*W+w)*C+c to match an NHWC flatten.
        Path at the Dense MODULE directory.
      - "bn": BatchNorm; path at the module directory (params + batch_stats).
      - "raw": verbatim copy; torch_key is the FULL state_dict key.

    Returns (new_variables, unconsumed_torch_keys).
    """
    import copy

    new_vars = copy.deepcopy(
        {k: _to_mutable(v) for k, v in variables.items()}
    )
    consumed = set()

    for flax_path, spec in mapping.items():
        torch_key, kind = spec[0], spec[1]
        parts = flax_path.split("/")
        if kind == "conv":
            value = torch_conv_to_flax(state_dict[f"{torch_key}.weight"])
            consumed.add(f"{torch_key}.weight")
            _set_path(new_vars, parts, value)
        elif kind == "conv_s2d":
            # Stride-2 stem conv into a space-to-depth model: OIHW -> HWIO,
            # then the exact s2d re-expression (stem_to_s2d).
            value = stem_to_s2d(torch_conv_to_flax(state_dict[f"{torch_key}.weight"]))
            consumed.add(f"{torch_key}.weight")
            _set_path(new_vars, parts, value)
        elif kind == "conv_bias":
            value = torch_conv_to_flax(state_dict[f"{torch_key}.weight"])
            consumed.add(f"{torch_key}.weight")
            _set_path(new_vars, parts + ["kernel"], value)
            consumed.add(f"{torch_key}.bias")
            _set_path(
                new_vars, parts + ["bias"], np.asarray(state_dict[f"{torch_key}.bias"])
            )
        elif kind == "dense":
            value = torch_dense_to_flax(state_dict[f"{torch_key}.weight"])
            consumed.add(f"{torch_key}.weight")
            _set_path(new_vars, parts + ["kernel"] if parts[-1] != "kernel" else parts, value)
            bias_key = f"{torch_key}.bias"
            if bias_key in state_dict:
                consumed.add(bias_key)
                bias_path = parts[:-1] + ["bias"] if parts[-1] == "kernel" else parts + ["bias"]
                _set_path(new_vars, bias_path, np.asarray(state_dict[bias_key]))
        elif kind == "dense_nchw":
            c, h, w = spec[2]
            weight = np.asarray(state_dict[f"{torch_key}.weight"])  # (out, C*H*W)
            out_f = weight.shape[0]
            if weight.shape[1] != c * h * w:
                raise ValueError(
                    f"{flax_path}: dense_nchw expects input dim {c * h * w}, "
                    f"got {weight.shape}"
                )
            # torch flattens NCHW (c*H*W + h*W + w); our model flattens NHWC.
            value = (
                weight.reshape(out_f, c, h, w)
                .transpose(0, 2, 3, 1)
                .reshape(out_f, h * w * c)
                .T
            )
            consumed.add(f"{torch_key}.weight")
            _set_path(new_vars, parts + ["kernel"], value)
            bias_key = f"{torch_key}.bias"
            if bias_key in state_dict:
                consumed.add(bias_key)
                _set_path(new_vars, parts + ["bias"], np.asarray(state_dict[bias_key]))
        elif kind == "bn":
            conv = torch_bn_to_flax(
                state_dict[f"{torch_key}.weight"],
                state_dict[f"{torch_key}.bias"],
                state_dict[f"{torch_key}.running_mean"],
                state_dict[f"{torch_key}.running_var"],
            )
            for suffix in ("weight", "bias", "running_mean", "running_var"):
                consumed.add(f"{torch_key}.{suffix}")
            # flax_path addresses the module under params; batch_stats mirrors it.
            assert parts[0] == "params", "bn mapping paths start at params/"
            module_path = parts[1:]
            _set_path(new_vars, ["params"] + module_path + ["scale"], conv["params"]["scale"])
            _set_path(new_vars, ["params"] + module_path + ["bias"], conv["params"]["bias"])
            _set_path(new_vars, ["batch_stats"] + module_path + ["mean"], conv["batch_stats"]["mean"])
            _set_path(new_vars, ["batch_stats"] + module_path + ["var"], conv["batch_stats"]["var"])
        elif kind == "raw":
            value = np.asarray(state_dict[torch_key])
            consumed.add(torch_key)
            _set_path(new_vars, parts, value)
        else:
            raise ValueError(f"unknown kind {kind!r} for {flax_path}")

    ignored_suffixes = ("num_batches_tracked",)
    unconsumed = [
        k
        for k in state_dict
        if k not in consumed and not k.endswith(ignored_suffixes)
    ]
    return new_vars, unconsumed


def _to_mutable(tree):
    if isinstance(tree, Mapping):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return np.asarray(tree)
