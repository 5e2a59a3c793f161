"""Triton-style model repository on disk: config.pbtxt + versioned weights.

The reference operates against a Triton server whose models live in a
*model repository* — a directory tree of

    <repository>/
      <model_name>/
        config.pbtxt          # text-format inference.ModelConfig
        1/model.npz           # numeric version dirs, highest wins
        2/model.npz

(the repository verbs it wraps: repository_index / repository_model_load /
repository_model_unload, /root/reference/src/triton_client/client.rs:127-146;
the config contract: /root/reference/triton_proto/model_config.proto:1104+).
This module gives the rebuild the same operational workflow, TPU-first:
weights are the self-describing .npz checkpoints of
models/checkpoint_io.py (architecture rebuilt from embedded meta — the
role Triton's backend field plays), and `config.pbtxt` is parsed with a
small protobuf *text-format* reader so existing Triton-tooling habits
(editing max_batch_size, inspecting dims) carry over.

    registry = ModelRegistry()
    attach_repository_builders(registry, "/models")
    serve(None, registry)                      # or: runtime CLI
    python -m rs_face_detection_tpu.runtime --model-repository /models

`tools/import_checkpoint.py --repository /models` writes entries in this
layout directly from public .pth checkpoints.

The text-format subset understood here covers what model repositories use
in practice: scalar fields (`key: value` with string/number/bool/enum
values), message fields (`key { ... }`, colon optional), repeated fields
by key repetition, and bracket lists of scalars or messages
(`dims: [1, 3, 640, 640]`, `input [ { ... }, { ... } ]`).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

__all__ = [
    "parse_pbtxt",
    "scan_repository",
    "attach_repository_builders",
    "write_repository_entry",
    "RepositoryModel",
]


# ---------------------------------------------------------------------------
# protobuf text-format (subset) parser
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    \s+                                   # whitespace (skipped)
  | \#[^\n]*                              # comment (skipped)
  | (?P<string>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')  # quoted string
  | (?P<punct>[{}\[\]:,;])                # structure (; is a separator)
  | (?P<scalar>[^\s{}\[\]:,;"'#]+)        # number / bool / enum / ident
    """,
    re.VERBOSE,
)


def _tokenize(text: str) -> List[Tuple[str, str]]:
    tokens: List[Tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise ValueError(
                f"config.pbtxt: cannot tokenize at offset {pos}: "
                f"{text[pos:pos + 20]!r}"
            )
        pos = m.end()
        if m.lastgroup == "string":
            tokens.append(("string", m.group("string")))
        elif m.lastgroup == "punct":
            tokens.append(("punct", m.group("punct")))
        elif m.lastgroup == "scalar":
            tokens.append(("scalar", m.group("scalar")))
        # whitespace/comments fall through
    return tokens


def _scalar_value(tok: str) -> Any:
    if tok == "true":
        return True
    if tok == "false":
        return False
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        pass
    return tok  # enum / identifier, kept as string


_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", "\\": "\\", '"': '"', "'": "'",
    "a": "\a", "b": "\b", "f": "\f", "v": "\v", "0": "\0",
}


def _unquote(tok: str) -> str:
    """Resolve backslash escapes without mangling non-ASCII text (a
    unicode_escape round trip would mojibake UTF-8 model names)."""
    return re.sub(
        r"\\(.)", lambda m: _ESCAPES.get(m.group(1), m.group(1)), tok[1:-1]
    )


class _Parser:
    def __init__(self, tokens: List[Tuple[str, str]]):
        self.tokens = tokens
        self.i = 0

    def _peek(self) -> Optional[Tuple[str, str]]:
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def _next(self) -> Tuple[str, str]:
        tok = self._peek()
        if tok is None:
            raise ValueError("config.pbtxt: unexpected end of input")
        self.i += 1
        return tok

    def _expect(self, value: str) -> None:
        kind, tok = self._next()
        if kind != "punct" or tok != value:
            raise ValueError(f"config.pbtxt: expected {value!r}, got {tok!r}")

    def message(self, *, top_level: bool = False) -> Dict[str, Any]:
        """Parse fields until '}' (or end of input at top level).  Repeated
        keys accumulate into lists; single occurrences stay scalar."""
        msg: Dict[str, Any] = {}
        while True:
            tok = self._peek()
            if tok is None:
                if top_level:
                    return msg
                raise ValueError("config.pbtxt: unterminated message")
            if tok == ("punct", "}"):
                if top_level:
                    raise ValueError("config.pbtxt: unmatched '}'")
                self.i += 1
                return msg
            if tok[0] == "punct" and tok[1] in (",", ";"):  # separators
                self.i += 1
                continue
            kind, key = self._next()
            if kind != "scalar":
                raise ValueError(f"config.pbtxt: expected field name, got {key!r}")
            values = self._field_value()
            for v in values:
                if key in msg:
                    if not isinstance(msg[key], list):
                        msg[key] = [msg[key]]
                    msg[key].append(v)
                else:
                    msg[key] = v

    def _field_value(self) -> List[Any]:
        """Values for one field occurrence (a bracket list yields several)."""
        tok = self._peek()
        if tok == ("punct", ":"):
            self.i += 1
            tok = self._peek()
        if tok is None:
            raise ValueError("config.pbtxt: field without a value")
        kind, val = tok
        if tok == ("punct", "{"):
            self.i += 1
            return [self.message()]
        if tok == ("punct", "["):
            self.i += 1
            out: List[Any] = []
            while True:
                tok = self._peek()
                if tok is None:
                    raise ValueError("config.pbtxt: unterminated list")
                if tok == ("punct", "]"):
                    self.i += 1
                    return out
                if tok == ("punct", ","):
                    self.i += 1
                    continue
                if tok == ("punct", "{"):
                    self.i += 1
                    out.append(self.message())
                    continue
                kind, val = self._next()
                out.append(
                    _unquote(val) if kind == "string" else _scalar_value(val)
                )
        if kind == "string":
            self.i += 1
            # adjacent string literals concatenate (proto text format)
            parts = [_unquote(val)]
            while self._peek() is not None and self._peek()[0] == "string":
                parts.append(_unquote(self._next()[1]))
            return ["".join(parts)]
        if kind == "scalar":
            self.i += 1
            return [_scalar_value(val)]
        raise ValueError(f"config.pbtxt: unexpected token {val!r}")


def parse_pbtxt(text: str) -> Dict[str, Any]:
    """Parse protobuf text format (the subset above) into plain dicts.

    Repeated fields appear as lists when they occur more than once or use
    bracket-list syntax; use `as_list` to normalize.
    """
    return _Parser(_tokenize(text)).message(top_level=True)


def as_list(value: Any) -> List[Any]:
    """Normalize a possibly-singular parsed field to a list."""
    if value is None:
        return []
    return value if isinstance(value, list) else [value]


# ---------------------------------------------------------------------------
# repository scan
# ---------------------------------------------------------------------------


@dataclass
class RepositoryModel:
    """One scanned `<repository>/<name>` entry."""

    name: str
    path: str  # model directory
    version: int
    weights_path: str
    config: Dict[str, Any] = field(default_factory=dict)


def _version_dirs(model_dir: str) -> List[int]:
    out = []
    for entry in os.listdir(model_dir):
        if entry.isdigit() and os.path.isdir(os.path.join(model_dir, entry)):
            out.append(int(entry))
    return sorted(out)


#: config.pbtxt fields this loader reads as SINGULAR — a duplicate (which
#: protoc's text parser rejects for non-repeated fields) parses into a list
#: and must be diagnosed at scan time, not as a TypeError at load time.
_SINGULAR_FIELDS = ("name", "max_batch_size", "default_model_filename")


def _scan_one(root: str, entry: str) -> Optional[RepositoryModel]:
    model_dir = os.path.join(root, entry)
    cfg_path = os.path.join(model_dir, "config.pbtxt")
    config: Dict[str, Any] = {}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            config = parse_pbtxt(f.read())
    for key in _SINGULAR_FIELDS:
        if isinstance(config.get(key), list):
            raise ValueError(
                f"{cfg_path}: field {key!r} appears more than once "
                f"(it is singular in model_config.proto)"
            )
    cfg_name = config.get("name", entry)
    if cfg_name != entry:
        raise ValueError(
            f"{cfg_path}: name {cfg_name!r} does not match the model "
            f"directory {entry!r} (Triton requires them equal)"
        )
    filename = config.get("default_model_filename", "model.npz")
    versions = _version_dirs(model_dir)
    for v in reversed(versions):
        candidate = os.path.join(model_dir, str(v), filename)
        if os.path.exists(candidate):
            return RepositoryModel(
                name=entry,
                path=model_dir,
                version=v,
                weights_path=candidate,
                config=config,
            )
    return None  # not a servable model dir (no weights) — skip quietly


def scan_repository(
    root: str, errors: Optional[List[Tuple[str, str]]] = None
) -> List[RepositoryModel]:
    """Scan a repository tree; returns one entry per valid model directory.

    Triton semantics preserved: the model name is the directory name, and a
    `name` field inside config.pbtxt must match it (Triton refuses the
    mismatch too); the served version is the highest numeric subdirectory
    that contains the weights file (`default_model_filename`, default
    `model.npz`).

    errors: when given, a malformed model directory is recorded there as
    (name, message) and the scan continues — Triton likewise marks the
    broken model UNAVAILABLE and serves the rest; when None, the first
    malformed entry raises.
    """
    if not os.path.isdir(root):
        raise ValueError(f"model repository {root!r} is not a directory")
    models: List[RepositoryModel] = []
    for entry in sorted(os.listdir(root)):
        if not os.path.isdir(os.path.join(root, entry)):
            continue
        try:
            scanned = _scan_one(root, entry)
        except ValueError as e:
            if errors is None:
                raise
            errors.append((entry, str(e)))
            continue
        if scanned is not None:
            models.append(scanned)
    return models


# ---------------------------------------------------------------------------
# spec derivation + config validation
# ---------------------------------------------------------------------------

def _family_output() -> Dict[str, Tuple[str, str]]:
    """(output_spec, preprocessing note) per checkpoint family.  The
    detection contract string is imported from the registry so the two
    serving surfaces cannot drift."""
    from ..models.registry import DETECTION_OUTPUT_SPEC

    return {
        "retinaface": (DETECTION_OUTPUT_SPEC, "letterbox, BGR->RGB, raw 0-255"),
        "scrfd": (
            "per-stride score/bbox/landmark maps",
            "letterbox, BGR->RGB, (px-127.5)/128",
        ),
        "iresnet": ("embedding", "BGR->RGB, (px-127.5)*0.0078125"),
        "minifas": ("logits", "raw 0-255, channel-reversed"),
        "resnet18": ("logits", "BGR->RGB, (px-mean)*std"),
        "clip_vit": ("logits", "BGR->RGB, ImageNet mean/std"),
    }


def _input_shape_from_meta(meta: Dict[str, Any]) -> Tuple[int, int, int]:
    if "input_hw" in meta:  # minifas stores (h, w)
        h, w = meta["input_hw"]
        return (int(h), int(w), 3)
    w, h = meta["image_size"]  # others store (w, h)
    return (int(h), int(w), 3)


def _dims_compatible(
    dims: List[int], hwc: Tuple[int, int, int], max_batch_size: int
) -> bool:
    """Do config.pbtxt input dims describe this model's (H, W, C)?

    Accepts CHW / HWC with -1 wildcards.  Triton's batch-dim convention is
    enforced: when max_batch_size > 0 the dims must OMIT the batch dim
    (3 entries); only max_batch_size == 0 carries it explicitly (4 entries,
    also accepted as 3 for batchless models) — a config Triton would
    reject must not validate here either.
    """
    h, w, c = hwc
    dims = [int(d) for d in dims]
    if len(dims) == 4:
        if max_batch_size > 0:
            return False  # batch dim must be omitted when batching is on
        dims = dims[1:]
    if len(dims) != 3:
        return False

    def match(got: List[int], want: Tuple[int, int, int]) -> bool:
        return all(g == -1 or g == t for g, t in zip(got, want))

    return match(dims, (c, h, w)) or match(dims, (h, w, c))


def _validate_config(
    model: RepositoryModel, input_shape: Tuple[int, int, int]
) -> None:
    max_batch_size = int(model.config.get("max_batch_size", 0))
    inputs = as_list(model.config.get("input"))
    for spec in inputs:
        dims = spec.get("dims")
        if dims is None:
            continue
        dims = as_list(dims)
        if not _dims_compatible(dims, input_shape, max_batch_size):
            raise ValueError(
                f"{model.path}/config.pbtxt: input dims {dims} do not "
                f"describe the checkpoint's input shape {input_shape} "
                f"(HWC, from the .npz meta) under "
                f"max_batch_size={max_batch_size} (Triton omits the batch "
                f"dim when max_batch_size > 0)"
            )
        dt = spec.get("data_type")
        if dt not in (None, "TYPE_FP32"):
            raise ValueError(
                f"{model.path}/config.pbtxt: data_type {dt} unsupported "
                f"(the serving surface is fp32, like the reference's "
                f"fp32_contents requests)"
            )


# ---------------------------------------------------------------------------
# registry attachment
# ---------------------------------------------------------------------------


def attach_repository_builders(registry, root: str) -> List[str]:
    """Register a lazy builder per repository model; returns the names.

    Each builder loads the picked version's .npz with
    checkpoint_io.load_imported_model (architecture from embedded meta),
    validates config.pbtxt dims/data_type against it, and derives the
    ModelSpec Triton would synthesize from the config.

    A malformed model directory does NOT abort the scan: like Triton, the
    broken model is still registered (so repository_index lists it) with a
    builder that raises its scan error on load — every other model serves
    normally.
    """
    from ..models.registry import ModelSpec

    errors: List[Tuple[str, str]] = []
    models = scan_repository(root, errors=errors)

    def make_failing_builder(name: str, message: str):
        def builder():
            raise ValueError(message)

        return builder

    def make_builder(m: RepositoryModel):
        def builder():
            from ..models.checkpoint_io import load_imported_model

            model_obj, variables, meta = load_imported_model(
                m.weights_path, return_meta=True
            )
            input_shape = _input_shape_from_meta(meta)
            _validate_config(m, input_shape)
            family = meta.get("family", "?")
            output_spec, preprocessing = _family_output().get(
                family, ("unknown", "unknown")
            )
            if family == "iresnet":
                output_spec = f"(B, {meta['embedding_dim']}) embedding"
            spec = ModelSpec(
                name=m.name,
                input_shape=input_shape,
                output_spec=output_spec,
                max_batch_size=int(m.config.get("max_batch_size", 0)) or 1,
                preprocessing=preprocessing,
            )
            return spec, model_obj, variables

        return builder

    for m in models:
        registry.register_builder(m.name, make_builder(m))
    for name, message in errors:
        registry.register_builder(name, make_failing_builder(name, message))
    return [m.name for m in models] + [name for name, _ in errors]


# ---------------------------------------------------------------------------
# repository writer (import_checkpoint --repository / tests)
# ---------------------------------------------------------------------------


def _render_pbtxt(
    name: str, input_shape: Tuple[int, int, int], max_batch_size: int
) -> str:
    h, w, c = input_shape
    return (
        f'name: "{name}"\n'
        f'backend: "rs_face_detection_tpu"\n'
        f"max_batch_size: {max_batch_size}\n"
        "input [\n"
        "  {\n"
        '    name: "data"\n'
        "    data_type: TYPE_FP32\n"
        f"    dims: [ {c}, {h}, {w} ]\n"
        "  }\n"
        "]\n"
        "output [\n"
        "  {\n"
        '    name: "output"\n'
        "    data_type: TYPE_FP32\n"
        "    dims: [ -1 ]\n"
        "  }\n"
        "]\n"
    )


def write_repository_entry(
    root: str,
    name: str,
    variables: Any,
    meta: Dict[str, Any],
    version: int = 1,
    max_batch_size: int = 1,
) -> str:
    """Write `<root>/<name>/config.pbtxt` + `<root>/<name>/<version>/model.npz`.

    Returns the weights path.  The generated config round-trips through
    parse_pbtxt/scan_repository and matches what _validate_config expects.
    An EXISTING config.pbtxt is left untouched — publishing a new version
    into an entry whose config an operator has hand-tuned (max_batch_size
    etc.) must not revert those edits.
    """
    from ..models.checkpoint_io import save_imported

    model_dir = os.path.join(root, name)
    version_dir = os.path.join(model_dir, str(version))
    os.makedirs(version_dir, exist_ok=True)
    input_shape = _input_shape_from_meta(dict(meta))
    cfg_path = os.path.join(model_dir, "config.pbtxt")
    if not os.path.exists(cfg_path):
        with open(cfg_path, "w") as f:
            f.write(_render_pbtxt(name, input_shape, max_batch_size))
    weights_path = os.path.join(version_dir, "model.npz")
    save_imported(weights_path, variables, meta)
    return weights_path
