"""Import reference PyTorch-Lightning checkpoints into flax variables.

The released bflow checkpoints are PL ``.ckpt`` files whose state dict
keys live under ``net.*`` (the LightningModule attribute, reference
modules/raft_spline.py:24): ``net.fnet_ev.conv1.weight``,
``net.cnet.layer2.0.downsample.1.running_mean``,
``net.update_block.gru.convz1.bias``, ...

Conversion rules:
  * conv weights OIHW -> HWIO (NHWC flax layout); biases copied.
  * BatchNorm/GroupNorm weight/bias -> scale/bias params; BatchNorm
    running_mean/var -> the ``batch_stats`` collection;
    ``num_batches_tracked`` dropped. InstanceNorm has no state.
  * torch ``layerN.K`` / ``downsample.{0,1}`` / ``mask.{0,2}`` sequential
    indices map to our explicit names ``layerN_K`` / ``ds_conv``/
    ``ds_norm`` / ``mask_0``/``mask_2``.

The importer is strict: it fails loudly on unknown source keys and on
flax leaves that were never filled, so architecture drift cannot load
silently.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _to_numpy(tensor) -> np.ndarray:
    try:
        import torch

        if isinstance(tensor, torch.Tensor):
            return tensor.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(tensor)


def _map_key(torch_key: str) -> Tuple[Tuple[str, ...], str, str]:
    """torch state-dict key -> (flax module path, leaf name, collection).

    collection is 'params' or 'batch_stats'.
    """
    parts = torch_key.split(".")
    assert parts[0] == "net", torch_key
    parts = parts[1:]
    leaf = parts[-1]
    mods = parts[:-1]

    out: list[str] = []
    i = 0
    while i < len(mods):
        m = mods[i]
        if m.startswith("layer") and i + 1 < len(mods) and mods[i + 1].isdigit():
            out.append(f"{m}_{mods[i + 1]}")
            i += 2
        elif m == "downsample":
            idx = mods[i + 1]
            out.append("ds_conv" if idx == "0" else "ds_norm")
            i += 2
        elif m == "mask":
            out.append(f"mask_{mods[i + 1]}")
            i += 2
        else:
            out.append(m)
            i += 1

    is_norm_leaf = leaf in ("running_mean", "running_var", "num_batches_tracked")

    if is_norm_leaf:
        name = {"running_mean": "mean", "running_var": "var"}.get(leaf, leaf)
        return tuple(out), name, "batch_stats"
    if leaf == "weight" and (out[-1].startswith("norm") or out[-1] == "ds_norm"):
        return tuple(out), "scale", "params"
    if leaf == "bias" and (out[-1].startswith("norm") or out[-1] == "ds_norm"):
        return tuple(out), "bias", "params"
    if leaf == "weight":
        return tuple(out), "kernel", "params"
    if leaf == "bias":
        return tuple(out), "bias", "params"
    raise KeyError(f"unrecognized torch key: {torch_key}")


def _set_path(tree: Dict[str, Any], path: Tuple[str, ...], leaf: str, value):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf] = value


def _norm_wrapper_name(path: Tuple[str, ...], params: Mapping) -> str:
    """Our Norm module wraps the concrete flax norm as a child; resolve
    whether the target tree calls it BatchNorm_0 or GroupNorm_0."""
    node = params
    for p in path:
        node = node[p]
    for cand in ("BatchNorm_0", "GroupNorm_0"):
        if cand in node:
            return cand
    raise KeyError(f"no norm wrapper under {path}: {list(node)}")


def convert_state_dict(
    state_dict: Mapping[str, Any],
    target_variables: Mapping[str, Any],
) -> Dict[str, Any]:
    """Convert a torch ``net.*`` state dict into flax variables matching
    ``target_variables``'s structure (from ``model.init``)."""
    import jax

    params_tpl = target_variables["params"]

    new_vars: Dict[str, Dict] = {"params": {}, "batch_stats": {}}
    for tkey, tval in state_dict.items():
        if not tkey.startswith("net."):
            continue
        if tkey.endswith("num_batches_tracked"):
            continue
        if ".norm3." in tkey:
            # The reference ResidualBlock registers the downsample norm
            # twice — as `norm3` AND inside `downsample.1` (the same
            # module object, reference models/raft_utils/extractor.py:
            # 19,43-44) — so real state dicts carry aliased duplicates.
            # The downsample.1 copy is the one we map.
            continue
        path, leaf, coll = _map_key(tkey)
        arr = _to_numpy(tval)
        if leaf == "kernel":
            assert arr.ndim == 4, (tkey, arr.shape)
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        if leaf in ("scale", "mean", "var") or (
            coll == "params"
            and leaf == "bias"
            and (path[-1].startswith("norm") or path[-1] == "ds_norm")
        ):
            path = path + (_norm_wrapper_name(path, params_tpl),)
        _set_path(new_vars[coll], path, leaf, np.asarray(arr, np.float32))

    # Structural validation against the init template.
    def flat(tree, prefix=()):
        for k, v in tree.items():
            if isinstance(v, (dict,)):
                yield from flat(v, prefix + (k,))
            else:
                yield prefix + (k,), v

    tpl_flat = dict(flat(params_tpl))
    got_flat = dict(flat(new_vars["params"]))
    missing = set(tpl_flat) - set(got_flat)
    extra = set(got_flat) - set(tpl_flat)
    if missing or extra:
        raise ValueError(
            f"param mismatch: missing={sorted(missing)[:8]} "
            f"extra={sorted(extra)[:8]}"
        )
    for k, v in got_flat.items():
        want = tpl_flat[k].shape
        if tuple(v.shape) != tuple(want):
            raise ValueError(f"shape mismatch at {k}: {v.shape} vs {want}")

    out = {
        "params": jax.tree_util.tree_map(lambda x: x, new_vars["params"]),
    }
    if "batch_stats" in target_variables:
        bs_tpl = dict(flat(target_variables["batch_stats"]))
        bs_got = dict(flat(new_vars["batch_stats"]))
        if set(bs_tpl) != set(bs_got):
            raise ValueError(
                f"batch_stats mismatch: missing={sorted(set(bs_tpl) - set(bs_got))[:8]} "
                f"extra={sorted(set(bs_got) - set(bs_tpl))[:8]}"
            )
        out["batch_stats"] = new_vars["batch_stats"]
    return out


def load_torch_checkpoint(path: str, target_variables: Mapping[str, Any]):
    """Load a PL .ckpt (or raw state dict) and convert it."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    state_dict = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return convert_state_dict(state_dict, target_variables)
