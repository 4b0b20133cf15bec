"""Streaming-state checkpoint/resume.

The reference has no compute checkpointing — only replayable JSONL/bin
dumps (SURVEY.md section 5.4).  Here the carried demod state (NCO cycles,
filter halos, timing phase, previous symbols) is a pytree of real arrays,
so a checkpoint is a flat .npz; restoring it resumes a stream mid-capture
with zero warmup loss.
"""

from __future__ import annotations

import json

import jax
import numpy as np


def _flatten(state) -> dict:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    return arrays, treedef


def save_state(path, state, extra: dict | None = None,
               aux: dict | None = None) -> None:
    """aux: named numpy arrays saved alongside the state pytree (host
    tails, voice decoder states, ...) — optional pieces whose presence
    can vary by configuration, so they stay out of the validated
    treedef."""
    arrays, treedef = _flatten(state)
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    if extra:
        arrays["__extra__"] = np.frombuffer(
            json.dumps(extra, default=str).encode(), dtype=np.uint8)
    for k, v in (aux or {}).items():
        arrays[f"aux_{k}"] = np.asarray(v)
    np.savez(path, **arrays)


def load_state(path) -> tuple:
    """Returns (state_leaves_as_list, extra_dict, aux_dict).

    Leaves come back in flatten order; the caller's current state template
    is used to unflatten.  The saved treedef string travels along as
    ``extra['__treedef__']`` so restore_into can verify the checkpoint was
    produced by an identically-configured pipeline.
    """
    data = np.load(path, allow_pickle=False)
    leaves = []
    i = 0
    while f"leaf_{i}" in data:
        leaves.append(data[f"leaf_{i}"])
        i += 1
    extra = {}
    if "__extra__" in data:
        extra = json.loads(bytes(data["__extra__"]).decode())
    if "__treedef__" in data:
        extra["__treedef__"] = bytes(data["__treedef__"]).decode()
    aux = {k[4:]: data[k] for k in data.files if k.startswith("aux_")}
    return leaves, extra, aux


def restore_into(template, leaves, saved_treedef: str | None = None):
    """Unflatten checkpoint leaves into the template's tree structure.

    Validates leaf count, the saved treedef string (when available) and
    per-leaf shapes/dtypes against the template, so a checkpoint from a
    differently-configured pipeline fails with a descriptive error
    instead of mis-restoring state."""
    flat, treedef = jax.tree_util.tree_flatten(template)
    if len(flat) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, pipeline state has "
            f"{len(flat)} — configuration mismatch")
    if saved_treedef is not None and saved_treedef != str(treedef):
        raise ValueError(
            "checkpoint tree structure does not match this pipeline "
            f"configuration:\n  saved:    {saved_treedef}\n"
            f"  expected: {treedef}")
    for i, (tmpl, leaf) in enumerate(zip(flat, leaves)):
        t = np.asarray(tmpl)
        l = np.asarray(leaf)
        if t.shape != l.shape or t.dtype != l.dtype:
            raise ValueError(
                f"checkpoint leaf {i}: saved {l.dtype}{list(l.shape)} vs "
                f"expected {t.dtype}{list(t.shape)} — configuration "
                "mismatch (carrier count / frontend / block size differ?)")
    import jax.numpy as jnp
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(leaf) for leaf in leaves])
