"""Checkpoint IO for flat TF-named parameter dicts.

The reference's canonical weight format is a ``.npy`` file holding a python
dict ``{var_name: ndarray}`` written by ``SaveHelper.save_vars`` and fed back
through per-variable assign ops (reference ``utils/utils.py:10-49``).  Our
params ARE a flat dict keyed by the same TF variable names (sans ``:0``), so
checkpointing is a direct ``np.save``/``np.load`` with optional name filters.

Also provides the TF1-checkpoint converter shim: reads variable values from a
TF checkpoint (``model.index`` + ``model.data-*``) when TensorFlow is
importable, so reference checkpoints load directly.
"""

from __future__ import annotations

import os
from typing import Callable, Mapping, Optional

import numpy as np

# Name fragments excluded when restoring weights, mirroring
# SemanticNetwork.OPT_FILTER / OP_FILTER (reference SemanticNetwork.py:25-26):
# optimizer slots and graph-plumbing variables never ship in a checkpoint.
OPT_FILTER = ("Adam", "Momentum")
OP_FILTER = ("image_cache", "global_step")


def default_filter(name: str) -> Optional[str]:
    """Reference restore filter (SemanticNetwork.py:154-156)."""
    clean = name[:-2] if name.endswith(":0") else name
    if any(k in clean for k in OPT_FILTER) or clean in OP_FILTER:
        return None
    return name


def strip_suffix(name: str) -> str:
    return name[:-2] if name.endswith(":0") else name


def save_params(path: str, params: Mapping[str, np.ndarray]) -> None:
    """Save a flat name->array dict as a reference-compatible .npy dict."""
    host = {k: np.asarray(v) for k, v in params.items()}
    np.save(path, host, allow_pickle=True)


def load_params(path: str,
                name_filter: Callable[[str], Optional[str]] = default_filter,
                ) -> dict:
    """Load a .npy dict checkpoint; keys normalized to suffix-less names."""
    raw = np.load(path, allow_pickle=True).item()
    out = {}
    for k, v in raw.items():
        if name_filter is not None and name_filter(k) is None:
            continue
        out[strip_suffix(k)] = np.asarray(v)
    return out


def merge_restore(params: dict, restored: Mapping[str, np.ndarray]) -> dict:
    """Overlay ``restored`` values onto ``params`` (restore_vars semantics).

    Keys present in the checkpoint but absent from the model are ignored
    after filtering, as in SaveHelper.restore_vars.
    """
    out = dict(params)
    matched = 0
    for k, v in restored.items():
        k = strip_suffix(k)
        if k in out:
            v = np.asarray(v)
            if tuple(v.shape) != tuple(np.shape(out[k])):
                raise ValueError(
                    f"shape mismatch for {k}: ckpt {v.shape} vs model "
                    f"{np.shape(out[k])}")
            out[k] = v
            matched += 1
    if restored and not matched:
        # a checkpoint whose keys match NOTHING is the wrong checkpoint
        # (e.g. a student .npy passed as the teacher): returning the base
        # unchanged would silently run on random init
        sample = sorted(restored)[:3]
        raise ValueError(
            "checkpoint matches none of the model's %d variables "
            "(checkpoint keys look like %s) — wrong checkpoint?"
            % (len(out), sample))
    if restored and matched < len(out):
        # every call site restores a FULL snapshot; a partial overlay
        # (e.g. scope-name drift for a subset of layers) leaves the rest
        # at random init — plausible-looking garbage with no signal
        restored_keys = {strip_suffix(k) for k in restored}
        missing = sorted(k for k in out if k not in restored_keys)
        print("WARNING: checkpoint covers %d/%d model variables; %d keep "
              "their initialization (e.g. %s)"
              % (matched, len(out), len(missing), missing[:3]), flush=True)
    return out


def load_tf_checkpoint(prefix: str) -> dict:
    """Read a TF1 checkpoint (model.index/.data) into a flat name->array dict.

    Used to convert the reference's shipped student checkpoints
    (checkpoints/deeplabv3_mobilenetv2_*/model) without any graph surgery:
    the variable names in the TF checkpoint are exactly our param keys.
    Requires TensorFlow at call time (conversion is offline tooling, the
    runtime never needs TF).
    """
    from tensorflow.python.training import py_checkpoint_reader  # lazy

    reader = py_checkpoint_reader.NewCheckpointReader(prefix)
    shape_map = reader.get_variable_to_shape_map()
    out = {}
    for name in shape_map:
        if default_filter(name) is None:
            continue
        out[name] = np.asarray(reader.get_tensor(name))
    return out


def save_orbax(path: str, params: Mapping[str, np.ndarray]) -> None:
    """Production checkpointing via Orbax (async-capable, atomic renames).

    The reference has only .npy dict snapshots; orbax adds durable,
    versioned checkpoints for long-running multi-video servers.
    """
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), dict(params), force=True)


def load_orbax(path: str) -> dict:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path))
    return {strip_suffix(k): np.asarray(v) for k, v in restored.items()}


def load_any(path_or_prefix: str) -> dict:
    """Dispatch: .npy dict / .npz / TF checkpoint prefix."""
    if path_or_prefix.endswith(".npy"):
        return load_params(path_or_prefix)
    if path_or_prefix.endswith(".npz"):
        with np.load(path_or_prefix) as z:
            return {strip_suffix(k): z[k] for k in z.files
                    if default_filter(k) is not None}
    if os.path.exists(path_or_prefix + ".npy"):
        return load_params(path_or_prefix + ".npy")
    if os.path.exists(path_or_prefix + ".npz"):
        return load_any(path_or_prefix + ".npz")
    if os.path.exists(path_or_prefix + ".index"):
        return load_tf_checkpoint(path_or_prefix)
    if os.path.isdir(path_or_prefix):
        return load_orbax(path_or_prefix)
    raise FileNotFoundError(path_or_prefix)
