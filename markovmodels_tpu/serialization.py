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
from . import native
from .fsm import FSM
from .labels import Label
from .semiring import get_semiring

__all__ = [
    "save_fsm",
    "load_fsm",
    "save_compiled",
    "load_compiled",
    "read_openfst_text",
    "load_openfst_lfmmi",
]


def read_openfst_text(path: str) -> dict:
    """Parse an OpenFST-style text graph into raw arrays.

    Grammar (the format the reference benchmark emits,
    misc/benchmark/generatefsm.jl:42-57): arc lines
    ``src dst ilabel olabel [weight]`` and final lines ``state [weight]``.
    Returns arrays ``src dst ilabel olabel weight final_state final_weight``
    exactly as written (1-based ids, negated weights and all — interpretation
    is the caller's). Uses the C++ parser when available.
    """
    res = native.parse_fst_text(path)
    if res is not None:
        return res
    src, dst, ilab, olab, w, fstate, fw = [], [], [], [], [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 4:
                src.append(int(parts[0]))
                dst.append(int(parts[1]))
                ilab.append(int(parts[2]))
                olab.append(int(parts[3]))
                w.append(float(parts[4]) if len(parts) == 5 else 0.0)
            elif parts:
                fstate.append(int(parts[0]))
                fw.append(float(parts[1]) if len(parts) == 2 else 0.0)
    return {
        "src": np.asarray(src, np.int64),
        "dst": np.asarray(dst, np.int64),
        "ilabel": np.asarray(ilab, np.int64),
        "olabel": np.asarray(olab, np.int64),
        "weight": np.asarray(w, np.float64),
        "final_state": np.asarray(fstate, np.int64),
        "final_weight": np.asarray(fw, np.float64),
    }


def load_openfst_lfmmi(path: str, num_pdfs: int | None = None):
    """Load a reference LF-MMI graph from OpenFST text into (FSM, state_pdf,
    num_pdfs), fully vectorized.

    Conventions of the reference's emitter (misc/benchmark/generatefsm.jl:
    42-57): 1-based state ids with the start state as id 0's successors
    (arcs from state 0 are the initial weights), weights stored negated
    (tropical-convention positive costs), ``ilabel`` = 1-based pdf id of the
    *destination* state. Log semiring.
    """
    from .semiring import LOG

    raw = read_openfst_text(path)
    src, dst, w = raw["src"], raw["dst"], -raw["weight"]
    ilab = raw["ilabel"]
    S = int(max(raw["dst"].max(initial=0), raw["src"].max(initial=0),
                raw["final_state"].max(initial=0)))
    # per-state pdf from destination ilabels (0-based)
    state_pdf_s = np.zeros(S, dtype=np.int64)
    state_pdf_s[dst - 1] = ilab - 1
    init = src == 0
    alpha = LOG.zeros(S)
    alpha[dst[init] - 1] = w[init]
    rows, cols, data = src[~init] - 1, dst[~init] - 1, w[~init]
    omega = LOG.zeros(S)
    omega[raw["final_state"] - 1] = -raw["final_weight"]
    T = hs.spmat_from_coo(rows, cols, data, (S, S), LOG)
    if num_pdfs is None:
        num_pdfs = int(state_pdf_s.max()) + 1
    labels = [Label(int(p)) for p in state_pdf_s]
    fsm = FSM.from_parts(alpha, T, omega, labels, LOG)
    spdf = np.append(state_pdf_s, num_pdfs).astype(np.int32)
    return fsm, spdf, num_pdfs


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
        pdf_group=cf.pdf_group,
        ov_layout=cf.ov_layout,
        multi_pdf=cf.multi_pdf,
        banded_offsets=cf.banded_offsets,
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
        nov = len(meta_dir[3]) if len(meta_dir) > 3 else 0
        return BlockOperator(
            band_w=field(f"{prefix}.band_w"),
            tiers=tuple(
                (placeholder, placeholder, placeholder) for _ in range(ntiers)
            ),
            res_src=field(f"{prefix}.res_src"),
            res_dst=field(f"{prefix}.res_dst"),
            res_w=field(f"{prefix}.res_w"),
            ov_w=tuple(placeholder for _ in range(nov)),
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
        omega_prob=fld("omega_prob"),
        orig_state=fld("orig_state"),
        banded_fwd=fld("banded_fwd"),
        banded_bwd=fld("banded_bwd"),
        num_states=meta["num_states"],
        num_pdfs=meta["num_pdfs"],
        strategy=meta["strategy"],
        batched=meta["batched"],
        precision=meta["precision"],
        domain=meta["domain"],
        block_fwd_offsets=meta["block_fwd_offsets"],
        block_bwd_offsets=meta["block_bwd_offsets"],
        pdf_group=_detuple(meta.get("pdf_group", ())),
        ov_layout=_detuple(meta.get("ov_layout", ())),
        multi_pdf=meta.get("multi_pdf", False),
        banded_offsets=_detuple(meta.get("banded_offsets", ())),
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
