"""Checkpoint conversion and native pytree checkpoints.

Converts the reference's two-file torch checkpoints — the OpenAI Whisper `.pt`
(dims + model_state_dict) and the TL-TR head `.pth` with `at_model.*` keys
(whisper_at/__init__.py:160-191) — into our stacked-pytree layout:

* torch Linear [out, in] -> w [in, out]
* torch Conv1d [out, in, k] -> w [k, in, out] (WIO)
* LayerNorm weight/bias -> scale/bias
* per-layer blocks.{i}.* -> one stacked array per leaf, leading layer axis

Native checkpoints are plain .npz flatten/unflatten of the same pytree.
"""

import io
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .models.dims import ModelDimensions


def _t(x) -> np.ndarray:
    """torch tensor -> numpy (fp16 weights upcast to fp32 before re-casting)."""
    arr = x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)
    if arr.dtype == np.float16:
        arr = arr.astype(np.float32)
    return arr


def _convert_linear(sd: Dict, prefix: str) -> dict:
    params = {"w": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        params["b"] = _t(sd[f"{prefix}.bias"])
    return params


def _convert_ln(sd: Dict, prefix: str) -> dict:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _convert_mha(sd: Dict, prefix: str) -> dict:
    return {
        "query": _convert_linear(sd, f"{prefix}.query"),
        "key": _convert_linear(sd, f"{prefix}.key"),
        "value": _convert_linear(sd, f"{prefix}.value"),
        "out": _convert_linear(sd, f"{prefix}.out"),
    }


def _convert_block(sd: Dict, prefix: str, cross: bool) -> dict:
    params = {
        "attn": _convert_mha(sd, f"{prefix}.attn"),
        "attn_ln": _convert_ln(sd, f"{prefix}.attn_ln"),
        "mlp": {
            "fc1": _convert_linear(sd, f"{prefix}.mlp.0"),
            "fc2": _convert_linear(sd, f"{prefix}.mlp.2"),
        },
        "mlp_ln": _convert_ln(sd, f"{prefix}.mlp_ln"),
    }
    if cross:
        params["cross_attn"] = _convert_mha(sd, f"{prefix}.cross_attn")
        params["cross_attn_ln"] = _convert_ln(sd, f"{prefix}.cross_attn_ln")
    return params


def _stack_layers(blocks: list) -> dict:
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *blocks)


def convert_torch_state_dict(
    state_dict: Dict,
    dims: ModelDimensions,
    at_low_compute: bool = False,
    dtype=jnp.float32,
) -> dict:
    """Merged (whisper + at head) torch state dict -> our params pytree."""
    sd = state_dict

    enc_blocks = [
        _convert_block(sd, f"encoder.blocks.{i}", cross=False)
        for i in range(dims.n_audio_layer)
    ]
    encoder = {
        "conv1": {
            "w": _t(sd["encoder.conv1.weight"]).transpose(2, 1, 0),
            "b": _t(sd["encoder.conv1.bias"]),
        },
        "conv2": {
            "w": _t(sd["encoder.conv2.weight"]).transpose(2, 1, 0),
            "b": _t(sd["encoder.conv2.bias"]),
        },
        "positional_embedding": _t(sd["encoder.positional_embedding"]),
        "blocks": _stack_layers(enc_blocks),
        "ln_post": _convert_ln(sd, "encoder.ln_post"),
    }

    dec_blocks = [
        _convert_block(sd, f"decoder.blocks.{i}", cross=True)
        for i in range(dims.n_text_layer)
    ]
    decoder = {
        "token_embedding": _t(sd["decoder.token_embedding.weight"]),
        "positional_embedding": _t(sd["decoder.positional_embedding"]),
        "blocks": _stack_layers(dec_blocks),
        "ln": _convert_ln(sd, "decoder.ln"),
    }

    if "at_model.mlp_layer.1.weight" in sd:
        at_model = {
            "time_tr": _convert_block(sd, "at_model.time_tr", cross=False),
            "layer_tr": _convert_block(sd, "at_model.layer_tr", cross=False),
            "mlp_ln": _convert_ln(sd, "at_model.mlp_layer.0"),
            "mlp": _convert_linear(sd, "at_model.mlp_layer.1"),
        }
        if at_low_compute:
            at_model["down_ln"] = _convert_ln(sd, "at_model.down_layer.0")
            at_model["down"] = _convert_linear(sd, "at_model.down_layer.1")
    else:
        # vanilla OpenAI Whisper checkpoint without a TL-TR head (.pt only):
        # ASR works; tagging needs a trained head (load one via at_checkpoint)
        import warnings

        import jax as _jax

        warnings.warn(
            "checkpoint has no at_model.* keys — initializing a RANDOM "
            "TL-TR head; audio tags will be meaningless until a trained "
            "head checkpoint is loaded.",
            stacklevel=2,
        )
        from .models.at_head import init_at_head

        mode = "tl_down_tr_512_1_8" if at_low_compute else "tl_tr_1_8"
        at_model = init_at_head(
            _jax.random.PRNGKey(0), dims.n_audio_layer, dims.n_audio_state,
            mode, dtype=dtype,
        )

    import jax

    params = {"encoder": encoder, "decoder": decoder, "at_model": at_model}
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), params)


def load_torch_checkpoint(
    whisper_ckpt,
    at_ckpt,
    at_low_compute: bool = False,
    dtype=jnp.float32,
) -> Tuple[ModelDimensions, dict]:
    """Load & merge the reference two-file checkpoint into (dims, params).

    Accepts file paths or bytes (in_memory mode), mirroring
    whisper_at/__init__.py:172-191.
    """
    import torch

    def _load(obj):
        if isinstance(obj, bytes):
            return torch.load(io.BytesIO(obj), map_location="cpu")
        return torch.load(obj, map_location="cpu")

    checkpoint = _load(whisper_ckpt)
    dims = ModelDimensions(**checkpoint["dims"])
    combined = dict(checkpoint["model_state_dict"])
    if at_ckpt is not None:
        combined.update(_load(at_ckpt))
    return dims, convert_torch_state_dict(
        combined, dims, at_low_compute=at_low_compute, dtype=dtype
    )


def convert_head_state_dict(state_dict: Dict, at_low_compute: bool = False) -> dict:
    """Convert a TL-TR head torch checkpoint (.pth) alone into our at_model
    pytree. Accepts the released `at_model.*` namespace or raw training-run
    `module.*` keys (the reference's rename_state_dict.py:21-31 mapping)."""
    sd = {}
    for key, value in state_dict.items():
        if key.startswith("module."):
            key = "at_model." + key[len("module."):]
        elif not key.startswith("at_model."):
            key = "at_model." + key
        sd[key] = value

    at_model = {
        "time_tr": _convert_block(sd, "at_model.time_tr", cross=False),
        "layer_tr": _convert_block(sd, "at_model.layer_tr", cross=False),
        "mlp_ln": _convert_ln(sd, "at_model.mlp_layer.0"),
        "mlp": _convert_linear(sd, "at_model.mlp_layer.1"),
    }
    if at_low_compute or "at_model.down_layer.0.weight" in sd:
        at_model["down_ln"] = _convert_ln(sd, "at_model.down_layer.0")
        at_model["down"] = _convert_linear(sd, "at_model.down_layer.1")
    return at_model


def rename_head_state_dict(state_dict: Dict) -> Dict:
    """Rename trained-head torch keys `module.*` -> `at_model.*` so they merge
    with a Whisper checkpoint at load (utilities/rename_state_dict.py:21-31)."""
    return {
        ("at_model." + k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


# --------------------------------------------------------------------------- #
# native checkpoint format (.npz of the flattened pytree)
# --------------------------------------------------------------------------- #


def _flatten(tree: dict, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    for key, value in tree.items():
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(value, dict):
            flat.update(_flatten(value, path))
        else:
            flat[path] = np.asarray(value)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def save_params(path: str, params: dict, dims: Optional[ModelDimensions] = None):
    flat = _flatten(params)
    flat = {k: np.asarray(v) for k, v in flat.items()}
    meta = {}
    if dims is not None:
        meta = {f"__dims__/{k}": np.asarray(v) for k, v in dims.__dict__.items()}
    np.savez(path, **flat, **meta)


def load_params(path: str, dtype=None) -> Tuple[Optional[ModelDimensions], dict]:
    with np.load(path) as data:
        flat = {}
        dims_kwargs = {}
        for key in data.files:
            if key.startswith("__dims__/"):
                dims_kwargs[key.split("/", 1)[1]] = int(data[key])
            else:
                flat[key] = data[key]
    params = _unflatten(flat)
    if dtype is not None:
        import jax

        params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
    dims = ModelDimensions(**dims_kwargs) if dims_kwargs else None
    return dims, params


def export_torch_state_dict(params: dict, at_low_compute: bool = False) -> Dict:
    """Our pytree -> reference-layout torch state dict (for interop).

    Inverse of convert_torch_state_dict; head keys use the at_model.*
    namespace the reference merges at load (rename_state_dict.py:21-31).
    """
    import torch

    sd: Dict = {}

    def _t_copy(x):
        # contiguous owned copy: torch warns on non-writable numpy views
        return torch.from_numpy(np.ascontiguousarray(np.asarray(x, np.float32)))

    def put_linear(prefix, p):
        sd[f"{prefix}.weight"] = _t_copy(np.asarray(p["w"], np.float32).T)
        if "b" in p:
            sd[f"{prefix}.bias"] = _t_copy(p["b"])

    def put_ln(prefix, p):
        sd[f"{prefix}.weight"] = _t_copy(p["scale"])
        sd[f"{prefix}.bias"] = _t_copy(p["bias"])

    def put_block(prefix, p, cross):
        for name in ("query", "key", "value", "out"):
            put_linear(f"{prefix}.attn.{name}", p["attn"][name])
        put_ln(f"{prefix}.attn_ln", p["attn_ln"])
        put_linear(f"{prefix}.mlp.0", p["mlp"]["fc1"])
        put_linear(f"{prefix}.mlp.2", p["mlp"]["fc2"])
        put_ln(f"{prefix}.mlp_ln", p["mlp_ln"])
        if cross:
            for name in ("query", "key", "value", "out"):
                put_linear(f"{prefix}.cross_attn.{name}", p["cross_attn"][name])
            put_ln(f"{prefix}.cross_attn_ln", p["cross_attn_ln"])

    import jax

    enc = params["encoder"]
    sd["encoder.conv1.weight"] = _t_copy(
        np.asarray(enc["conv1"]["w"], np.float32).transpose(2, 1, 0)
    )
    sd["encoder.conv1.bias"] = _t_copy(enc["conv1"]["b"])
    sd["encoder.conv2.weight"] = _t_copy(
        np.asarray(enc["conv2"]["w"], np.float32).transpose(2, 1, 0)
    )
    sd["encoder.conv2.bias"] = _t_copy(enc["conv2"]["b"])
    sd["encoder.positional_embedding"] = _t_copy(enc["positional_embedding"])
    n_enc = np.asarray(enc["blocks"]["attn_ln"]["scale"]).shape[0]
    for i in range(n_enc):
        put_block(
            f"encoder.blocks.{i}", jax.tree.map(lambda a: np.asarray(a)[i], enc["blocks"]), False
        )
    put_ln("encoder.ln_post", enc["ln_post"])

    dec = params["decoder"]
    sd["decoder.token_embedding.weight"] = _t_copy(dec["token_embedding"])
    sd["decoder.positional_embedding"] = _t_copy(dec["positional_embedding"])
    n_dec = np.asarray(dec["blocks"]["attn_ln"]["scale"]).shape[0]
    for i in range(n_dec):
        put_block(
            f"decoder.blocks.{i}", jax.tree.map(lambda a: np.asarray(a)[i], dec["blocks"]), True
        )
    put_ln("decoder.ln", dec["ln"])

    at = params["at_model"]
    put_block("at_model.time_tr", at["time_tr"], False)
    put_block("at_model.layer_tr", at["layer_tr"], False)
    put_ln("at_model.mlp_layer.0", at["mlp_ln"])
    put_linear("at_model.mlp_layer.1", at["mlp"])
    if at_low_compute:
        put_ln("at_model.down_layer.0", at["down_ln"])
        put_linear("at_model.down_layer.1", at["down"])

    return sd


# --------------------------------------------------------------------------- #
# orbax backend (optional; production-grade async/large-scale checkpoints)
# --------------------------------------------------------------------------- #


def save_params_orbax(path: str, params: dict, dims: Optional[ModelDimensions] = None):
    """Save the pytree with orbax (directory checkpoint; atomic, shard-aware).

    The .npz format (save_params) stays the default for single-host use;
    orbax is the multi-host / very-large-model option (SURVEY §5).
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    payload = dict(params)
    if dims is not None:
        payload = {"params": params, "dims": dict(dims.__dict__)}
    ckptr.save(path, payload)


def load_params_orbax(path: str) -> Tuple[Optional[ModelDimensions], dict]:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(path)
    if "dims" in payload and "params" in payload:
        dims = ModelDimensions(**{k: int(v) for k, v in payload["dims"].items()})
        return dims, payload["params"]
    return None, payload
