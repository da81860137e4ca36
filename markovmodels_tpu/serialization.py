"""Persistence for host FSMs and compiled graphs.

The reference persists graphs via Julia ``Serialization``/JLD2 plus a
portable JSON format (reference src/fsm.jl:73-82,
examples/prepare-lfmmi-graphs.jl:122-125, misc/benchmark/benchmark.jl:12-14).
Here:

* portable JSON (fsm.to_json / from_json) — reference-compatible;
* fast binary ``.npz`` for host FSMs (arrays, no pickling);
* ``.npz`` checkpoints of *compiled* device graphs (orbax-style: a flat
  array tree + static metadata), so production serving can skip host
  compilation entirely.
"""
from __future__ import annotations

import json

import numpy as np

from . import hostsparse as hs
from .fsm import FSM
from .labels import Label
from .semiring import get_semiring

__all__ = ["save_fsm", "load_fsm", "save_compiled", "load_compiled"]


def save_fsm(path: str, fsm: FSM, state_pdf=None) -> None:
    """Binary snapshot of a host FSM (+ optional state→pdf map)."""
    labels_json = json.dumps([list(l) for l in fsm.labels])
    arrays = dict(
        semiring=np.array(fsm.sr.name),
        alpha_hat=fsm.alpha_hat,
        indptr=fsm.T_hat.indptr,
        indices=fsm.T_hat.indices,
        data=np.asarray(fsm.T_hat.data, dtype=np.float64),
        labels=np.array(labels_json),
    )
    if state_pdf is not None:
        arrays["state_pdf"] = np.asarray(state_pdf, dtype=np.int32)
    np.savez_compressed(path, **arrays)


def load_fsm(path: str):
    """Returns (fsm, state_pdf or None)."""
    z = np.load(path, allow_pickle=False)
    sr = get_semiring(str(z["semiring"]))
    S1 = len(z["alpha_hat"])
    T_hat = hs.SpMat(
        (S1, S1),
        z["indptr"].astype(np.int64),
        z["indices"].astype(np.int64),
        z["data"].astype(np.float64),
    )
    labels = [Label(*l) for l in json.loads(str(z["labels"]))]
    fsm = FSM(sr, z["alpha_hat"].astype(np.float64), T_hat, labels)
    spdf = z["state_pdf"] if "state_pdf" in z.files else None
    return fsm, spdf


def _meta_of(cf) -> dict:
    import jax

    leaves_with_paths = jax.tree_util.tree_flatten_with_path(cf)[0]
    paths = ["".join(str(p) for p in kp) for kp, _ in leaves_with_paths]
    return dict(
        num_states=cf.num_states,
        num_pdfs=cf.num_pdfs,
        strategy=cf.strategy,
        batched=cf.batched,
        precision=cf.precision,
        domain=cf.domain,
        block_fwd_offsets=cf.block_fwd_offsets,
        block_bwd_offsets=cf.block_bwd_offsets,
        leaf_paths=paths,
    )


def save_compiled(path: str, cf) -> None:
    """Checkpoint a CompiledFSM: flat array tree + static metadata (the leaf
    paths are stored so the exact pytree is reconstructed on load)."""
    import jax

    leaves = jax.tree.leaves(cf)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["meta"] = np.array(json.dumps(_meta_of(cf)))
    np.savez_compressed(path, **arrays)


def load_compiled(path: str):
    import jax
    import jax.numpy as jnp

    from .inference import CompiledFSM
    from .ops.blocked import BlockOperator

    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    for k in ("block_fwd_offsets", "block_bwd_offsets"):
        meta[k] = _detuple(meta[k])
    n = len([k for k in z.files if k.startswith("leaf_")])
    leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
    paths = meta["leaf_paths"]

    placeholder = object()

    def field(name, default=None):
        return placeholder if any(p.startswith(f".{name}") for p in paths) else default

    def block_op(prefix, meta_dir):
        if not any(p.startswith(f".{prefix}") for p in paths):
            return None
        ntiers = len(meta_dir[1])
        return BlockOperator(
            band_w=field(f"{prefix}.band_w"),
            tiers=tuple(
                (placeholder, placeholder, placeholder) for _ in range(ntiers)
            ),
            res_src=field(f"{prefix}.res_src"),
            res_dst=field(f"{prefix}.res_dst"),
            res_w=field(f"{prefix}.res_w"),
        )

    # Build a skeleton whose tree structure matches exactly: every present
    # leaf becomes `placeholder`, absent optional fields become None.
    fld = field

    skeleton = CompiledFSM(
        alpha_hat=placeholder,
        final_state=placeholder,
        state_pdf=placeholder,
        fwd_src=placeholder,
        fwd_dst=placeholder,
        fwd_w=placeholder,
        bwd_src=placeholder,
        bwd_dst=placeholder,
        bwd_w=placeholder,
        ell_fwd_src=fld("ell_fwd_src"),
        ell_fwd_w=fld("ell_fwd_w"),
        ell_bwd_src=fld("ell_bwd_src"),
        ell_bwd_w=fld("ell_bwd_w"),
        dense_fwd_exp=fld("dense_fwd_exp"),
        dense_fwd_max=fld("dense_fwd_max"),
        dense_bwd_exp=fld("dense_bwd_exp"),
        dense_bwd_max=fld("dense_bwd_max"),
        pdf_onehot=fld("pdf_onehot"),
        block_fwd=block_op("block_fwd", meta["block_fwd_offsets"]),
        block_bwd=block_op("block_bwd", meta["block_bwd_offsets"]),
        num_states=meta["num_states"],
        num_pdfs=meta["num_pdfs"],
        strategy=meta["strategy"],
        batched=meta["batched"],
        precision=meta["precision"],
        domain=meta["domain"],
        block_fwd_offsets=meta["block_fwd_offsets"],
        block_bwd_offsets=meta["block_bwd_offsets"],
    )
    treedef = jax.tree.structure(skeleton)
    if treedef.num_leaves != n:
        raise ValueError(
            f"checkpoint has {n} leaves but reconstructed structure expects "
            f"{treedef.num_leaves}"
        )
    return jax.tree.unflatten(treedef, leaves)


def _detuple(x):
    """JSON round-trips tuples as lists; restore nested tuples."""
    if isinstance(x, list):
        return tuple(_detuple(v) for v in x)
    return x
