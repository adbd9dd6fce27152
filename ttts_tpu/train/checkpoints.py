"""Checkpointing: one Orbax tree with step metadata, keep-N rotation, and a
half-precision weights-only release export.

Replaces the reference's three coexisting formats (SURVEY §5.4):
  1. Accelerate `{'step', 'model'}` .pt files with mtime-sorted keep-3
     rotation (gpt/train.py:70-77, utils/utils.py clean_checkpoints:67-86);
  2. VITS G_/D_ checkpoints with optimizer state (vc_utils.save_checkpoint);
  3. fp16 generator-only release export (vqvae/process_ckpt.py savee:14).
"""

from __future__ import annotations

import pathlib
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Keep-N rotating checkpoints of arbitrary pytrees."""

    def __init__(self, directory: str | pathlib.Path, keep: int = 3):
        self.directory = pathlib.Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
        )

    def save(self, step: int, tree: Any, wait: bool = True):
        """wait=False → async save (Orbax background write); the trainer
        overlaps checkpoint IO with compute and finalizes on exit."""
        self._mgr.save(step, args=ocp.args.StandardSave(tree))
        if wait:
            self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None, None
        if template is not None:
            tree = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        else:
            tree = self._mgr.restore(step)
        return step, tree

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.wait_until_finished()  # finalize any in-flight async save
        self._mgr.close()


SEP = "\x1f"  # key separator for release exports (see export_release)


def export_release(params: Any, path: str | pathlib.Path, drop_prefixes=("enc_q",),
                   config: Optional[dict] = None):
    """Weights-only half-precision export, dropping training-only submodules
    (process_ckpt.savee semantics: fp16, enc_q stripped, config embedded).
    Stored as an .npz with flattened keys joined by an ASCII unit separator
    (0x1f) + a JSON config blob. NOT '/', because flax param NAMES can
    contain literal slashes (WeightNorm's "Conv_0/kernel/scale") which a
    '/'-joined flatten would split into spurious nesting on reload."""
    import json

    flat = {}

    def visit(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                visit(v, f"{prefix}{k}{SEP}")
        else:
            key = prefix[:-1]
            # the reference's savee drops keys that START with the prefix as a
            # module path (process_ckpt.py:14); substring matching would also
            # drop any key merely containing it
            segs = key.split(SEP)
            if any(s == p for s in segs[:2] for p in drop_prefixes):
                return
            arr = np.asarray(tree)
            flat[key] = arr.astype(np.float16) if arr.dtype == np.float32 else arr

    # struct dataclasses (RVQState codebooks) flatten to plain dicts so the
    # visitor can walk them; load_model rehydrates on restore
    from flax import serialization

    visit(serialization.to_state_dict(
        jax.tree_util.tree_map(np.asarray, params)))
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    meta = json.dumps(config or {})
    np.savez_compressed(path, __config__=np.frombuffer(meta.encode(), np.uint8), **flat)


def load_release(path: str | pathlib.Path):
    """Load an export back into a nested dict of float32 arrays + config."""
    import json

    data = np.load(path)
    cfg = json.loads(bytes(data["__config__"]).decode()) if "__config__" in data else {}
    tree: dict = {}
    for k in data.files:
        if k == "__config__":
            continue
        # pre-r3 exports were '/'-joined; read them too (slash-named params
        # from such files stay split — those exports were already broken)
        parts = k.split(SEP) if SEP in k else k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        arr = data[k]
        node[parts[-1]] = arr.astype(np.float32) if arr.dtype == np.float16 else arr
    return tree, cfg
